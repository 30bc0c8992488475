"""Optional Orbax checkpoint backend.

The default framework format is single-file msgpack
(`training/checkpoints.py`) — simple, dependency-light, and compatible with
the reference's best-checkpoint naming. For large-scale multi-host training
Orbax adds sharded, async, fault-tolerant checkpointing; this module wraps
it behind the same payload convention. Import is gated so environments
without orbax still work.
"""

from __future__ import annotations

import os
from typing import Any


def available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False


def save(path: str, payload: dict[str, Any]) -> None:
    """Save a pytree payload to an Orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load(path: str, template: dict[str, Any]) -> dict[str, Any]:
    """Restore a payload saved by :func:`save` using a matching template."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def restore_any(path: str) -> dict[str, Any]:
    """Templateless restore (structure read from the checkpoint metadata).

    Used by the CLI loaders to discover how many EMA shadows a checkpoint
    carries without probing templates; tuples come back as lists."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def is_orbax_checkpoint(path: str) -> bool:
    """True when ``path`` is an Orbax checkpoint directory."""
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(path, "_METADATA"))
    )
