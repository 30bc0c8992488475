"""Checkpointing: best-per-modality persistence + ledger.

Parity surface for `/root/reference/guided_diffusion/train_util.py:120-145,
315-362,476-537`:

* best-only regime: ``brats_{contr}_BEST_{sample_schedule}_{steps}.ckpt``
  (+ ``opt_best_{contr}.ckpt``), previous best deleted;
* ``best_losses.txt`` ledger with ``{modality}:{loss}`` lines;
* legacy step-stamped names ``brats_{contr}_{step:06d}_{schedule}_{steps}``.

Improvement over the reference (documented deviation): the full config dict
is serialized INSIDE the checkpoint (msgpack) and as a JSON sidecar, so
nothing needs to be re-parsed out of filenames (the reference scrapes
hyperparameters from checkpoint FILENAMES, `complete_dataset.py:107-127`).
The filename convention is still honored for discovery parity.
"""

from __future__ import annotations

import json
import os
import re
from glob import glob
from typing import Any

import jax
import numpy as np
from flax import serialization


# ---------------------------------------------------------------------------
# Ledger (`train_util.py:120-145`)
# ---------------------------------------------------------------------------


def load_best_losses(ckpt_dir: str) -> dict[str, float]:
    path = os.path.join(ckpt_dir, "best_losses.txt")
    best: dict[str, float] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if ":" in line:
                    k, v = line.split(":", 1)
                    best[k.strip()] = float(v)
    return best


def save_best_losses(ckpt_dir: str, best: dict[str, float]) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "best_losses.txt")
    with open(path, "w") as f:
        for k, v in sorted(best.items()):
            f.write(f"{k}:{v}\n")


# ---------------------------------------------------------------------------
# Save / load
# ---------------------------------------------------------------------------


def _to_host(tree):
    # Issue every device→host copy asynchronously FIRST so the transfers
    # pipeline: a plain leaf-by-leaf ``np.asarray`` blocks on each array
    # before starting the next, paying one full transfer round-trip per
    # leaf (hundreds of leaves per checkpoint — pathological over a
    # high-latency link, and still serialized on PCIe).
    for leaf in jax.tree.leaves(tree):
        copy_async = getattr(leaf, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
    return jax.tree.map(lambda x: np.asarray(x), tree)


class _AsyncWriter:
    """One-in-flight background checkpoint writer: the device→host copy
    happens on the caller's thread (the arrays may be donated by the next
    train step), but msgpack serialization + disk IO overlap with compute
    (the reference blocks the step loop on torch.save,
    `train_util.py:343-356`)."""

    def __init__(self):
        import threading

        self._threading = threading
        self._thread = None
        self._error: BaseException | None = None

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, fn, *args):
        self.wait()

        def run():
            try:
                fn(*args)
            except BaseException as e:  # surfaced on the next wait/submit
                self._error = e

        self._thread = self._threading.Thread(target=run, daemon=True)
        self._thread.start()


_async_writer = _AsyncWriter()


def wait_for_pending_saves():
    """Block until any in-flight async checkpoint write completes."""
    _async_writer.wait()


def checkpoint_ext() -> str:
    """Active checkpoint format: ``.ckpt`` (single-file msgpack, default)
    or ``.orbax`` (sharded Orbax directory; select with
    ``FAST_CWDM_CKPT_BACKEND=orbax`` — the multi-host-scale backend)."""
    return (
        ".orbax"
        if os.environ.get("FAST_CWDM_CKPT_BACKEND") == "orbax"
        else ".ckpt"
    )


def _write_blob(
    path: str, host_payload: dict[str, Any], config: dict[str, Any] | None
) -> None:
    if path.endswith(".orbax"):
        from fast_cwdm_tpu.training import orbax_io

        orbax_io.save(path, host_payload)
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = serialization.to_bytes(host_payload)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    if config is not None:
        with open(path + ".json", "w") as f:
            json.dump(config, f, indent=2, default=str)


def save_checkpoint(
    path: str,
    payload: dict[str, Any],
    config: dict[str, Any] | None = None,
    *,
    async_write: bool = False,
) -> None:
    """msgpack-serialize a pytree payload (+ config sidecar JSON).

    ``async_write=True`` copies to host synchronously, then serializes and
    writes on a background thread (one in flight at a time; a failed write
    raises on the next checkpoint operation)."""
    host_payload = _to_host(payload)

    if async_write:
        _async_writer.submit(_write_blob, path, host_payload, config)
    else:
        _async_writer.wait()
        _write_blob(path, host_payload, config)


def load_checkpoint(path: str, template: dict[str, Any]) -> dict[str, Any]:
    _async_writer.wait()  # the file may still be in flight
    from fast_cwdm_tpu.training import orbax_io

    if path.endswith(".orbax") or orbax_io.is_orbax_checkpoint(path):
        return orbax_io.load(path, template)
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(template, blob)


def _deser_errors() -> tuple:
    try:
        from msgpack.exceptions import UnpackException
    except ImportError:  # pragma: no cover
        UnpackException = ValueError
    return (ValueError, TypeError, KeyError, IndexError, UnpackException)


def load_with_ema_probe(
    path: str, params_template, prefer_arity: int | None = None
) -> dict[str, Any]:
    """Load a ``{params, ema_params, step}`` checkpoint whose EMA-shadow
    count is unknown (a convert_checkpoint import carries 0 shadows; an
    ema_rate change between runs shifts the tuple arity, and flax
    ``from_bytes`` is tuple-length-strict): probe arities 0-3,
    ``prefer_arity`` first. Single shared implementation for
    ``TrainLoop._apply_resume`` and ``cli.common.load_params`` — the two
    previously carried diverging copies (one missed msgpack's
    UnpackException, so a truncated file surfaced as a raw ExtraData).

    IO problems (missing file, permissions) surface as themselves, not as
    a bogus "incompatible layout" error: the blob is read ONCE before the
    template probes."""
    _async_writer.wait()
    from fast_cwdm_tpu.training import orbax_io

    is_orbax = path.endswith(".orbax") or orbax_io.is_orbax_checkpoint(path)
    blob = None
    if not is_orbax:
        with open(path, "rb") as f:
            blob = f.read()

    arities = list(range(4))
    if prefer_arity is not None:
        arities = [prefer_arity] + [n for n in arities if n != prefer_arity]
    errors = _deser_errors()
    last_err: Exception | None = None
    for n_ema in arities:
        template = {
            "params": params_template,
            "ema_params": (params_template,) * n_ema,
            "step": 0,
        }
        try:
            if is_orbax:
                return orbax_io.load(path, template)
            return serialization.from_bytes(template, blob)
        except errors as e:
            last_err = e  # layout mismatch / corrupt msgpack — keep probing
            continue
    raise ValueError(
        f"could not deserialize {path} with 0-3 EMA shadows — "
        "incompatible checkpoint layout"
    ) from last_err


def load_checkpoint_config(path: str) -> dict[str, Any] | None:
    side = path + ".json"
    if os.path.exists(side):
        with open(side) as f:
            return json.load(f)
    return None


# ---------------------------------------------------------------------------
# Filename conventions
# ---------------------------------------------------------------------------


def best_checkpoint_name(
    contr: str,
    sample_schedule: str,
    diffusion_steps: int,
    dataset: str = "brats",
    ext: str | None = None,
) -> str:
    """(`train_util.py:339-341`)"""
    ext = checkpoint_ext() if ext is None else ext
    return f"{dataset}_{contr}_BEST_{sample_schedule}_{diffusion_steps}{ext}"


def step_checkpoint_name(
    contr: str,
    step: int,
    sample_schedule: str,
    diffusion_steps: int,
    dataset: str = "brats",
    ext: str | None = None,
) -> str:
    """Legacy step-stamped name (`train_util.py:476-514`)."""
    ext = checkpoint_ext() if ext is None else ext
    return (
        f"{dataset}_{contr}_{step:06d}_{sample_schedule}_{diffusion_steps}{ext}"
    )


def opt_checkpoint_name(
    contr: str,
    step: int,
    sample_schedule: str,
    diffusion_steps: int,
    dataset: str = "brats",
    ext: str | None = None,
) -> str:
    """Optimizer blob paired with a step-stamped checkpoint. The reference
    writes bare ``opt{step:06d}.pt`` (`train_util.py:505-513`) — but this
    framework's designed layout is ONE shared checkpoint_dir for all four
    modalities AND schedules (opt_best is contr-qualified, BEST names are
    schedule-qualified), so an under-qualified stem would collide across
    concurrently trained runs and a resume could silently restore another
    run's Adam moments. Deviation: the stem carries dataset+contr+schedule
    +steps, mirroring `step_checkpoint_name`; bare reference names and the
    older contr-only stem are still recognized on load
    (`TrainLoop._apply_resume`)."""
    ext = checkpoint_ext() if ext is None else ext
    return (
        f"opt_{dataset}_{contr}_{step:06d}"
        f"_{sample_schedule}_{diffusion_steps}{ext}"
    )


def prune_step_checkpoints(
    ckpt_dir: str,
    contr: str,
    keep_step: int,
    sample_schedule: str,
    diffusion_steps: int,
    dataset: str = "brats",
) -> list[str]:
    """Delete step-stamped model/optimizer blobs for THIS run — same
    dataset, contr, schedule, and step count — that are OLDER than
    ``keep_step`` (BEST checkpoints and other runs' files are untouched,
    including a same-modality run with a different schedule sharing the
    checkpoint_dir). A preemption-save regime otherwise accumulates one
    full model+Adam state (~1 GB at production size) per preemption,
    forever. Returns the removed paths."""
    import shutil

    _async_writer.wait()
    removed: list[str] = []
    run_tag = f"_{sample_schedule}_{diffusion_steps}"
    stems = [
        os.path.join(ckpt_dir, f"{dataset}_{contr}_*{run_tag}"),
        os.path.join(ckpt_dir, f"opt_{dataset}_{contr}_*{run_tag}"),
    ]
    for stem in stems:
        for p in glob(stem + ".ckpt") + glob(stem + ".orbax"):
            base = os.path.basename(p)
            if "_BEST_" in base:
                continue
            m = re.search(r"_(\d{6,})(?:_|\.)", base)
            if not m or int(m.group(1)) >= keep_step:
                continue
            for q in (p, p + ".json"):
                if os.path.isdir(q):
                    shutil.rmtree(q, ignore_errors=True)
                    removed.append(q)
                elif os.path.exists(q):
                    os.remove(q)
                    removed.append(q)
    return removed


def find_best_checkpoint(ckpt_dir: str, contr: str, dataset: str = "brats"):
    """Discovery parity with `complete_dataset.py:75-104`: newest
    ``{dataset}_{contr}_BEST_*`` (either backend format); returns
    (path, sample_schedule, steps)."""
    stem = os.path.join(ckpt_dir, f"{dataset}_{contr}_BEST_*")
    matches = sorted(
        glob(stem + ".ckpt") + glob(stem + ".orbax"), key=os.path.getmtime
    )
    if not matches:
        return None
    path = matches[-1]
    cfg = load_checkpoint_config(path)
    if cfg and "sample_schedule" in cfg:
        return path, cfg["sample_schedule"], int(cfg["diffusion_steps"])
    m = re.match(
        rf".*{re.escape(dataset)}_{re.escape(contr)}"
        r"_BEST_(\w+?)_(\d+)\.(?:ckpt|orbax)$",
        path,
    )
    if m:
        return path, m.group(1), int(m.group(2))
    return path, "direct", 1000


def parse_resume_step_from_filename(filename: str) -> int:
    """Step extraction from step-stamped names
    (``brats_{contr}_{step:06d}_{schedule}_{steps}``). The reference
    scrapes TRAILING digits (`train_util.py:517-537`) which, applied to
    these names, would return diffusion_steps — here the zero-padded step
    field is matched explicitly; BEST checkpoints (no step field) and
    unknown names return 0 (the authoritative step also rides INSIDE the
    checkpoint payload and overrides this on load)."""
    stem = os.path.basename(filename).rsplit(".", 1)[0]
    # {step:06d} widens past 6 digits at step 1e6 — match 6-or-more so a long
    # run's checkpoints still resume (contr tokens contain no 6-digit runs)
    m = re.search(r"_(\d{6,})_", stem)  # brats_{contr}_{step:06d}_{sched}_{T}
    if m:
        return int(m.group(1))
    m = re.fullmatch(r"opt(\d{6,})", stem)  # legacy opt{step:06d}
    if m:
        return int(m.group(1))
    return 0


def save_if_best(
    ckpt_dir: str,
    contr: str,
    loss: float,
    payload: dict[str, Any],
    opt_payload: dict[str, Any] | None,
    *,
    sample_schedule: str,
    diffusion_steps: int,
    dataset: str = "brats",
    config: dict[str, Any] | None = None,
    async_write: bool = False,
) -> bool:
    """Keep ONE best checkpoint per modality (`train_util.py:315-362`),
    deleting the previous best. Returns True if saved."""
    # drain any in-flight best-save FIRST: its ledger entry commits inside the
    # async job, so reading the ledger before the join could compare against a
    # stale best and let a worse loss overwrite a better checkpoint
    _async_writer.wait()
    if not np.isfinite(loss):
        # a NaN loss would pass an inverted ">=" guard, overwrite the
        # genuine best with diverged params, and poison the ledger (every
        # later "x >= nan" is False too). The reference's "loss < best"
        # direction is NaN-safe (`train_util.py:321`); rejecting non-finite
        # outright also covers the first save of a diverged run.
        return False
    best = load_best_losses(ckpt_dir)
    prev = best.get(contr)
    # a non-finite ledger entry (poisoned by an older run) counts as absent
    # so the first finite loss heals it
    if prev is not None and np.isfinite(prev) and not (loss < prev):
        return False
    name = best_checkpoint_name(contr, sample_schedule, diffusion_steps, dataset)
    new_main = os.path.abspath(os.path.join(ckpt_dir, name))
    stem = os.path.join(ckpt_dir, f"{dataset}_{contr}_BEST_*")
    old_files = [
        old
        for old in glob(stem + ".ckpt") + glob(stem + ".orbax")
        if os.path.abspath(old) != new_main
    ]
    # device→host copies happen on the caller's thread (the arrays may be
    # donated by the next step); everything else runs in ONE job that only
    # deletes the previous best and commits the ledger AFTER the new files
    # are durably on disk — a failed write can no longer lose the old best
    # or record a phantom loss
    host_payload = _to_host(payload)
    host_opt = _to_host(opt_payload) if opt_payload is not None else None

    def job():
        import shutil

        if host_opt is not None:
            ext = checkpoint_ext()
            _write_blob(
                os.path.join(ckpt_dir, f"opt_best_{contr}{ext}"),
                host_opt,
                None,
            )
            # drop a sibling-format opt file from before a backend switch
            # so resume can never pair new params with stale Adam moments
            other = os.path.join(
                ckpt_dir,
                f"opt_best_{contr}{'.ckpt' if ext == '.orbax' else '.orbax'}",
            )
            if os.path.isdir(other):
                shutil.rmtree(other, ignore_errors=True)
            elif os.path.exists(other):
                os.remove(other)
        _write_blob(new_main, host_payload, config)
        for old in old_files:
            for p in (old, old + ".json"):
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                elif os.path.exists(p):
                    os.remove(p)
        cur = load_best_losses(ckpt_dir)
        cur[contr] = float(loss)
        save_best_losses(ckpt_dir, cur)

    if async_write:
        _async_writer.submit(job)
    else:
        job()
    return True


def get_blob_logdir() -> str:
    """Checkpoint root (`train_util.py:540-545`): $DIFFUSION_BLOB_LOGDIR or
    ./checkpoints (the reference hard-codes /data/checkpoints)."""
    return os.environ.get("DIFFUSION_BLOB_LOGDIR", "checkpoints")
