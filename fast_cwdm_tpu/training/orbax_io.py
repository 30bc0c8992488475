"""Optional Orbax checkpoint backend.

The default framework format is single-file msgpack
(`training/checkpoints.py`) — simple, dependency-light, and compatible with
the reference's best-checkpoint naming. Orbax adds sharded, async,
fault-tolerant checkpointing; this module wraps it behind the same payload
convention. Import is gated so environments without orbax still work.

Multi-host contract: the framework's checkpoint layer is single-writer —
`TrainLoop.save*` gates on rank 0 and payloads are host-replicated numpy
(`checkpoints._to_host`). Orbax's default save is a COLLECTIVE (its first
action is `sync_global_processes('Checkpointer:save_start')`, which every
process must enter), so a rank-0-only call would deadlock the pod: rank 0
blocks in the barrier, the other ranks block in the next train-step
collective. `_checkpointer()` therefore restricts the barrier set to the
calling process (`active_processes={process_index}`), making every
save/load here a local, barrier-free operation on any rank.
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


def _checkpointer():
    """A StandardCheckpointer whose collectives span ONLY this process
    (see module docstring — single-writer, host-replicated payloads)."""
    import jax
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me,
                active_processes={me},
                barrier_sync_key_prefix=f"fastcwdm_p{me}",
            )
        )
    return ocp.StandardCheckpointer()


def save(path: str, payload: dict[str, Any]) -> None:
    """Save a pytree payload to an Orbax checkpoint directory."""
    with _checkpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load(path: str, template: dict[str, Any]) -> dict[str, Any]:
    """Restore a payload saved by :func:`save` using a matching template."""
    with _checkpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def restore_any(path: str) -> dict[str, Any]:
    """Templateless restore (structure read from the checkpoint metadata).

    Used by the CLI loaders to discover how many EMA shadows a checkpoint
    carries without probing templates; tuples come back as lists."""
    with _checkpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def is_orbax_checkpoint(path: str) -> bool:
    """True when ``path`` is an Orbax checkpoint directory."""
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(path, "_METADATA"))
    )
