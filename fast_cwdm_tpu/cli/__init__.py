"""CLI layer (L5): flag-compatible entry points mirroring the reference's
`scripts/` (`/root/reference/scripts/*.py`, run.sh)."""
