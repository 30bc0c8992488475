"""Training loop (parity surface for `TrainLoop`,
`/root/reference/guided_diffusion/train_util.py:32-362`).

TPU-first structure:

* the whole optimizer step is ONE donated jit (`training/train.py`); the
  loop only feeds sharded batches and occasionally pulls metrics — no
  per-step `.item()` syncs (the reference does ≥8, SURVEY §3.1);
* metrics are fetched every ``log_interval`` via a single device→host
  transfer of the last step's metric dict;
* per-phase wall-clock accumulators print the reference's ``[PROFILE]``
  line (`train_util.py:302-309`);
* `DIFFUSION_TRAINING_TEST` env hook returns after the first save
  (`train_util.py:297-298`);
* best-checkpoint persistence per modality with the `best_losses.txt`
  ledger (`train_util.py:315-362`).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Iterator

import jax
import numpy as np

from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
from fast_cwdm_tpu.diffusion.resample import UniformSampler
from fast_cwdm_tpu.parallel import mesh as pmesh
from fast_cwdm_tpu.training import checkpoints as ckpt
from fast_cwdm_tpu.training.state import TrainState
from fast_cwdm_tpu.training.train import (
    IMAGE_METRIC_KEYS,
    make_optimizer,
    make_train_step,
)
from fast_cwdm_tpu.utils import logger

SUBBAND_NAMES = ("lll", "llh", "lhl", "lhh", "hll", "hlh", "hhl", "hhh")


def _infinite(iterable_factory: Callable[[], Iterable]) -> Iterator:
    """Infinite-epoch iterator (`train_util.py:190-197`'s StopIteration
    restart, without the exception control flow). Raises on an empty epoch
    — a one-shot iterator passed instead of a factory would otherwise
    busy-spin forever."""
    epoch = 0
    while True:
        count = 0
        for item in iterable_factory():
            count += 1
            yield item
        if count == 0:
            if epoch == 0:
                # a proper factory can legitimately produce zero batches:
                # fewer usable cases than one (global) batch under
                # drop_last, or an empty/mis-pointed data dir
                raise ValueError(
                    "data source yielded no batches in its first epoch — "
                    "is the dataset empty, or smaller than one batch "
                    "(drop_last discards the ragged tail; multi-host "
                    "sharding needs a full GLOBAL batch)?"
                )
            raise ValueError(
                "data source yielded no items after a non-empty epoch — "
                "pass a CALLABLE factory (a bare iterator is exhausted "
                "after its first epoch)"
            )
        epoch += 1


class TrainLoop:
    # True iff the last run_loop exited early on a trapped SIGTERM —
    # callers must treat that as "resume me", never as completion
    preempted = False

    def __init__(
        self,
        *,
        model,
        diffusion: GaussianDiffusion,
        data: Callable[[], Iterable] | Iterable,
        batch_size: int,
        lr: float = 1e-5,
        ema_rate: str | float = "0.9999",
        log_interval: int = 100,
        save_interval: int = 50,
        resume_checkpoint: str = "",
        resume_step: int = 0,
        weight_decay: float = 0.0,
        lr_anneal_steps: int = 0,
        mode: str = "i2i",
        contr: str = "t1n",
        sample_schedule: str = "direct",
        diffusion_steps: int = 1000,
        dataset: str = "brats",
        schedule_sampler=None,
        seed: int = 0,
        mesh=None,
        checkpoint_dir: str | None = None,
        config: dict | None = None,
        prefetch: int = 2,
        microbatch: int = -1,
        lesion_weight: float = 0.0,
        lesion_core_weight: float = 0.0,
        lesion_t_power: float = 0.0,
    ):
        self.model = model
        self.diffusion = diffusion
        self.data_factory = data if callable(data) else (lambda: data)
        self.batch_size = batch_size
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.lr_anneal_steps = lr_anneal_steps
        self.mode = mode
        self.contr = contr
        self.sample_schedule = sample_schedule
        self.diffusion_steps = diffusion_steps
        self.dataset = dataset
        self.resume_step = resume_step
        self.checkpoint_dir = checkpoint_dir or ckpt.get_blob_logdir()
        self.config = config or {}
        self.mesh = mesh
        self.prefetch = prefetch

        ema_rates = tuple(
            float(x)
            for x in (
                str(ema_rate).split(",") if ema_rate not in ("", None) else []
            )
        )
        self.tx = make_optimizer(
            lr, weight_decay=weight_decay, lr_anneal_steps=lr_anneal_steps
        )
        self.sampler = schedule_sampler or UniformSampler(
            diffusion.num_timesteps
        )
        # norms every step: measured FREE on the production model (651.8 ms
        # with vs 650.7 without — XLA overlaps the two abs-max passes), so
        # one compiled program beats two (PERF.md session 2)
        # reference flag semantics (`train_util.py:73`): microbatch<=0 or
        # >=batch_size → no accumulation; otherwise the PER-DEVICE batch
        # is split into batch_size/microbatch sequential grad-accum chunks
        # (the reference stores the flag but dropped the loop — here it
        # works; see make_train_step)
        if 0 < microbatch < batch_size:
            if batch_size % microbatch != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"microbatch {microbatch}"
                )
            accum_steps = batch_size // microbatch
        else:
            accum_steps = 1
        self.step_fn = make_train_step(
            model,
            diffusion,
            self.tx,
            contr=contr,
            mode=mode,
            sampler=self.sampler,
            donate=True,
            accum_steps=accum_steps,
            lesion_weight=lesion_weight,
            lesion_core_weight=lesion_core_weight,
            lesion_t_power=lesion_t_power,
        )
        self.key = jax.random.PRNGKey(seed)
        self.state: TrainState | None = None
        self._ema_rates = ema_rates
        if resume_checkpoint:
            self._load(resume_checkpoint)

    # ------------------------------------------------------------------
    def _init_state(self, batch) -> TrainState:
        import jax.numpy as jnp

        from fast_cwdm_tpu.ops import wavelet as wv

        key_init, self.key = jax.random.split(self.key)
        # ONE jitted program for DWT+init: run eagerly these are hundreds
        # of op-by-op tunnel dispatches (~minutes at production shape on
        # axon — PERF.md "host-side dispatch pathologies")
        if self.mode == "i2i":
            from fast_cwdm_tpu.diffusion.gaussian import condition_order

            x = batch[self.contr]
            # the CONDITION modalities only — the batch dict may carry
            # extra keys (e.g. "seg" for the lesion-weighted loss) that
            # must not leak into the model's input-channel count
            others = [batch[m] for m in condition_order(self.contr)]

            @jax.jit
            def init_i2i(key, x, others):
                sample_in = jnp.concatenate(
                    [wv.dwt_normalized(x)]
                    + [wv.dwt_normalized(o) for o in others],
                    axis=-1,
                )
                t0 = jnp.zeros((sample_in.shape[0],), jnp.int32)
                return self.model.init(key, sample_in, t0)

            variables = init_i2i(key_init, jnp.asarray(x), others)
        else:

            @jax.jit
            def init_plain(key, x):
                sample_in = wv.dwt_normalized(x)
                t0 = jnp.zeros((sample_in.shape[0],), jnp.int32)
                return self.model.init(key, sample_in, t0)

            variables = init_plain(key_init, jnp.asarray(batch))
        params = variables["params"]
        n_params = sum(p.size for p in jax.tree.leaves(params))
        logger.log(f"creating model: {n_params/1e6:.2f}M params")
        sampler_state = (
            self.sampler.init_state()
            if hasattr(self.sampler, "init_state")
            else ()
        )
        return TrainState.create(
            params,
            self.tx,
            ema_rates=self._ema_rates,
            sampler_state=sampler_state,
        )

    def _load(self, path: str) -> None:
        if not os.path.exists(path):
            logger.log(f"resume checkpoint {path} not found; fresh start")
            return
        self._pending_resume = path
        if not self.resume_step:
            self.resume_step = ckpt.parse_resume_step_from_filename(path)

    def _apply_resume(self) -> None:
        path = getattr(self, "_pending_resume", None)
        if not path:
            return
        # the checkpoint's EMA-shadow count may differ from this run's
        # ema_rate config — shared probe with cli.common.load_params,
        # live arity first
        live_ema = self.state.ema_params
        loaded = ckpt.load_with_ema_probe(
            path, self.state.params, prefer_arity=len(live_ema)
        )
        got = tuple(loaded.get("ema_params") or ())
        if len(got) != len(live_ema):
            logger.log(
                f"resume: checkpoint has {len(got)} EMA shadow(s), run "
                f"wants {len(live_ema)} — missing shadows start from the "
                "loaded params"
            )
        ema = tuple(
            got[i] if i < len(got) else loaded["params"]
            for i in range(len(live_ema))
        )
        self.state = self.state.replace(
            params=loaded["params"], ema_params=ema
        )
        # the step INSIDE the checkpoint is authoritative (filename parsing
        # is a fallback for reference-style names without a payload step)
        if int(loaded.get("step", 0) or 0) > 0:
            self.resume_step = int(loaded["step"])
        # optimizer state: a step-stamped (preemption) checkpoint has a
        # matching opt blob written by save(); prefer it — pairing
        # step-N params with the LAST BEST save's Adam moments (possibly
        # tens of thousands of steps stale, with the anneal count jumped
        # back) spikes the LR onto mismatched moments. Fall back to
        # opt_best only with a warning. Both backend formats may coexist
        # after a backend switch — load the NEWEST, not a fixed-extension
        # preference (a stale .ckpt would silently restore old moments).
        ckpt_dir = os.path.dirname(path)
        stems = []
        # a BEST checkpoint's matching state IS opt_best (written together)
        is_best = "_BEST_" in os.path.basename(path)
        if self.resume_step and not is_best:
            # fully qualified stem first (this framework's save()), then
            # the pre-schedule-qualification contr-only stem (older runs
            # of this framework), then the reference's bare opt{step:06d}
            # for imported checkpoint dirs
            stems.append(
                ckpt.opt_checkpoint_name(
                    self.contr,
                    self.resume_step,
                    self.sample_schedule,
                    self.diffusion_steps,
                    self.dataset,
                    ext="",
                )
            )
            stems.append(
                f"opt_{self.dataset}_{self.contr}_{self.resume_step:06d}"
            )
            stems.append(f"opt{self.resume_step:06d}")
        stems.append(f"opt_best_{self.contr}")
        opt_path = stale_fallback = None
        for stem in stems:
            candidates = [
                p
                for p in (
                    os.path.join(ckpt_dir, f"{stem}{ext}")
                    for ext in (".ckpt", ".orbax")
                )
                if os.path.exists(p)
            ]
            if candidates:
                opt_path = max(candidates, key=os.path.getmtime)
                stale_fallback = stem.startswith("opt_best") and len(stems) > 1
                break
        if opt_path:
            if stale_fallback:
                logger.log(
                    f"WARNING: no step-{self.resume_step} opt blob next to "
                    f"{path}; "
                    f"restoring {os.path.basename(opt_path)} — Adam moments "
                    "and the LR-anneal count come from the last BEST save, "
                    "not from the resumed step"
                )
            opt = ckpt.load_checkpoint(
                opt_path, {"opt_state": self.state.opt_state}
            )
            self.state = self.state.replace(opt_state=opt["opt_state"])
        else:
            logger.log(
                f"WARNING: no optimizer state found next to {path}; "
                "resuming with a FRESH optimizer (Adam moments reset)"
            )
        logger.log(f"resumed from {path} at step {loaded['step']}")
        self._pending_resume = None

    # ------------------------------------------------------------------
    def _fetch_metrics(self, metrics):
        """Metrics → host. Multi-host: per-sample leaves (loss_per_sample,
        t) are data-sharded ACROSS processes, so a plain device_get raises
        on non-addressable shards; allgather them instead. Collective —
        every rank reaches this at the same log/save steps."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return jax.tree.map(
                np.asarray,
                multihost_utils.process_allgather(metrics, tiled=True),
            )
        return jax.device_get(metrics)

    # ------------------------------------------------------------------
    def _put(self, batch):
        """Host batch → device (sharded over the mesh if present).

        Multi-host: the data factory yields only this process's rows
        (`local_batch_rows`); `shard_batch(global_batch=...)` assembles
        the global array from the per-process shards.
        """
        if self.mesh is not None:
            gb = self.batch_size if jax.process_count() > 1 else None
            return pmesh.shard_batch(self.mesh, batch, global_batch=gb)
        return jax.tree.map(jax.device_put, batch)

    def run_loop(self) -> TrainState:
        # Preemption safety: TPU pods get SIGTERM'd (spot reclaim, pod
        # reschedule). Trap it, finish the in-flight step, write a
        # step-stamped checkpoint, and exit cleanly — `--resume_checkpoint`
        # continues from it. The reference loses all progress since the
        # last best-save on preemption. Handler installs only in the main
        # thread and the previous disposition is restored on exit.
        import signal

        # harness-visible outcome: True iff the loop exited early on
        # SIGTERM (callers must NOT treat that return as run completion)
        self.preempted = False
        preempted = []
        prev_handler = None
        installed = False  # signal.signal may legitimately RETURN None
        try:
            prev_handler = signal.signal(
                signal.SIGTERM,
                lambda signum, frame: preempted.append(signum),
            )
            installed = True
        except ValueError:  # not the main thread — run unguarded
            pass
        try:
            return self._run_loop(preempted)
        finally:
            if installed:
                # restore even when the previous disposition was None (a
                # handler installed from C): leaving OUR handler in place
                # would silently swallow every later SIGTERM
                signal.signal(signal.SIGTERM, prev_handler or signal.SIG_DFL)

    @staticmethod
    def _preempt_agreed(preempted) -> bool:
        """Cross-process agreement on the preemption flag. SIGTERM delivery
        is asynchronous and per-process: without agreement, a signaled rank
        exits while the others hang forever in the next gradient psum — and
        if only a non-rank-0 rank is signaled, the rank-0-gated `save()`
        writes NOTHING before that rank dies. One tiny allgather per step
        makes every rank exit (and rank 0 save) at the same step boundary,
        whichever subset of ranks the scheduler signaled."""
        if jax.process_count() == 1:
            return bool(preempted)
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(bool(preempted))
        )
        return bool(np.any(flags))

    def _run_loop(self, preempted) -> TrainState:
        data_iter = _infinite(self.data_factory)
        if self.prefetch > 0:
            # keep `prefetch` batches already on device (sharded) while the
            # current step computes — the H2D copy of 4×(224,224,160)
            # volumes overlaps compute instead of stalling the step
            from fast_cwdm_tpu.data.loader import prefetch_to_device

            data_iter = prefetch_to_device(
                data_iter, size=self.prefetch, put=self._put
            )
            put = lambda b: b  # noqa: E731 — already on device
        else:
            put = self._put
        t_data = t_step = t_log = t_save = 0.0
        last_metrics = None
        step = self.resume_step

        while not self.lr_anneal_steps or step < self.lr_anneal_steps:
            t0 = time.time()
            batch = put(next(data_iter))
            if self.state is None:
                self.state = self._init_state(batch)
                self._apply_resume()
                step = self.resume_step  # may be updated from the payload
            t1 = time.time()
            t_data += t1 - t0

            self.key, sub = jax.random.split(self.key)
            self.state, metrics = self.step_fn(self.state, batch, sub)
            last_metrics = metrics
            t2 = time.time()
            t_step += t2 - t1

            step += 1

            # one metric fetch per step even when log and save coincide —
            # on multi-host each fetch is a cross-process allgather. The
            # image-panel leaves (sample_slice/subband_slices, ~2 MB per
            # sample) ride along ONLY on image-log steps; save-only and
            # odd log windows fetch just the scalar/vector metrics.
            m = None
            # image panels go every other log window (`train_util.py:
            # 226-284` logs every 200 steps); the SAME predicate decides
            # what the fetch includes and whether the log block renders
            # panels — keep them in lockstep or the log block KeyErrors
            image_step = step % (2 * self.log_interval) == 0
            if (
                step % self.log_interval == 0
                or step % self.save_interval == 0
            ):
                if image_step:
                    want = dict(last_metrics)
                    # the source-modality mid-planes ride in the SAME
                    # fetch: on multi-host each fetch is a separate
                    # collective barrier, so everything an image-log step
                    # needs goes through one allgather
                    if self.mode == "i2i" and isinstance(batch, dict):
                        for mod in sorted(batch):
                            if mod == self.contr or getattr(
                                batch[mod], "ndim", 0
                            ) != 5:
                                continue
                            # row 0 lives on process 0's devices only when
                            # the batch is data-sharded across processes —
                            # a plain device_get would raise on
                            # non-addressable shards
                            want[f"source/{mod}"] = batch[mod][
                                0, :, :, batch[mod].shape[3] // 2, 0
                            ]
                else:
                    want = {
                        k: v
                        for k, v in last_metrics.items()
                        if k not in IMAGE_METRIC_KEYS
                    }
                m = self._fetch_metrics(want)

            if step % self.log_interval == 0:
                loss = float(m["loss"])
                if not np.isfinite(loss):
                    # failure detection (`train_util.py:377-383` warns or
                    # breakpoints; here: warn, or raise under
                    # FAST_CWDM_STRICT_FINITE for CI/production)
                    logger.log(f"Encountered non-finite loss {loss}")
                    if os.environ.get("FAST_CWDM_STRICT_FINITE"):
                        raise FloatingPointError(
                            f"non-finite loss {loss} at step {step}"
                        )
                logger.logkv("step", step)
                logger.logkv("loss", loss)
                logger.logkv("loss/MSE", loss)
                # per-window phase seconds (the reference logs time/load,
                # time/forward, time/total scalars, `train_util.py:221-232`)
                logger.logkv("time/load", round(t_data, 4))
                logger.logkv("time/forward", round(t_step, 4))
                logger.logkv("time/total", round(t_data + t_step, 4))
                logger.logkv("norm/grad_max", float(m["grad_max"]))
                logger.logkv("norm/param_max", float(m["param_max"]))
                for i, name in enumerate(SUBBAND_NAMES):
                    logger.logkv(f"loss/mse_wav_{name}", float(m["mse_wav"][i]))
                if "mse_lesion" in m:
                    logger.logkv("loss/mse_lesion", float(m["mse_lesion"]))
                if "mse_lesion_core" in m:
                    logger.logkv(
                        "loss/mse_lesion_core", float(m["mse_lesion_core"])
                    )
                # per-quartile loss binning by t (`log_loss_dict`,
                # `train_util.py:554-560`)
                T = self.diffusion.num_timesteps
                for ls, ti in zip(
                    np.atleast_1d(m["loss_per_sample"]),
                    np.atleast_1d(m["t"]),
                ):
                    quartile = int(4 * int(ti) / T)
                    logger.logkv_mean(f"loss_q{quartile}", float(ls))
                logger.dumpkvs()
                # x0 mid-plane, the 8 predicted subband mid-planes, and
                # the source modalities (fetched above iff image_step)
                if image_step:
                    from fast_cwdm_tpu.utils import visualize

                    imgs = {"sample/x_0": visualize(m["sample_slice"][0])}
                    for i, name in enumerate(SUBBAND_NAMES):
                        imgs[f"sample/{name.upper()}"] = visualize(
                            m["subband_slices"][0, :, :, i]
                        )
                    for k in sorted(m):
                        if k.startswith("source/"):
                            imgs[k] = visualize(np.asarray(m[k]))
                    logger.log_images(imgs, step)
                t3 = time.time()
                t_log += t3 - t2
                total = t_data + t_step + t_log + t_save
                print(
                    f"[PROFILE] Step {step}: Data={t_data:.2f}s "
                    f"Step={t_step:.2f}s Log={t_log:.2f}s Save={t_save:.2f}s "
                    f"Total={total:.2f}s"
                )
                t_data = t_step = t_log = t_save = 0.0

            if step % self.save_interval == 0:
                t3 = time.time()
                loss = float(m["loss"])
                self.save_if_best(loss, step)
                t_save += time.time() - t3
                if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                    logger.log("DIFFUSION_TRAINING_TEST: early exit")
                    ckpt.wait_for_pending_saves()
                    return self.state

            if self._preempt_agreed(preempted):
                logger.log(
                    f"SIGTERM at step {step}: writing preemption "
                    "checkpoint and exiting"
                )
                self.preempted = True
                self.save(step)
                ckpt.wait_for_pending_saves()
                return self.state

        # the final annealed steps are typically the lowest-loss weights of
        # the run: when the anneal boundary isn't a save step, offer them to
        # save_if_best like the reference's post-loop save
        # (`train_util.py:311-313`)
        if (
            self.lr_anneal_steps
            and step
            and step % self.save_interval != 0
            and last_metrics is not None
        ):
            loss = float(self._fetch_metrics(last_metrics["loss"]))
            self.save_if_best(loss, step)
        ckpt.wait_for_pending_saves()
        return self.state

    # ------------------------------------------------------------------
    def save_if_best(self, loss: float, step: int) -> bool:
        """(`train_util.py:315-362`)"""
        if jax.process_index() != 0:
            # params/EMA are replicated across the data axis: rank 0 owns
            # the (shared-filesystem) checkpoint files and best-loss
            # ledger; concurrent writers would race
            return False
        payload = {
            "params": self.state.params,
            "ema_params": self.state.ema_params,
            "step": step,
        }
        saved = ckpt.save_if_best(
            self.checkpoint_dir,
            self.contr,
            loss,
            payload,
            {"opt_state": self.state.opt_state},
            sample_schedule=self.sample_schedule,
            diffusion_steps=self.diffusion_steps,
            dataset=self.dataset,
            async_write=True,
            config={
                **self.config,
                "sample_schedule": self.sample_schedule,
                "diffusion_steps": self.diffusion_steps,
                "contr": self.contr,
                "step": step,
                "loss": loss,
            },
        )
        if saved:
            logger.log(
                f"saved new best for {self.contr} at step {step} "
                f"(loss {loss:.6f})"
            )
        return saved

    def save(self, step: int, prune_previous: bool = True) -> None:
        """Legacy step-stamped save (`train_util.py:476-514`), including the
        paired optimizer blob (`train_util.py:505-513`) so a preemption
        resume restores the true Adam moments + anneal count. The opt stem
        is dataset/contr-qualified (see `ckpt.opt_checkpoint_name`) —
        concurrent modality runs share one checkpoint_dir here, and the
        reference's bare ``opt{step:06d}`` would collide across them.
        ``prune_previous`` removes this run's OLDER step-stamped blobs
        after the new pair is on disk (deviation from the reference's
        keep-everything regime: this loop step-saves only on preemption,
        where history is dead weight — ~1 GB per preemption)."""
        if jax.process_index() != 0:
            return  # rank 0 owns checkpoint files (see save_if_best)
        name = ckpt.step_checkpoint_name(
            self.contr,
            step,
            self.sample_schedule,
            self.diffusion_steps,
            self.dataset,
        )
        ckpt.save_checkpoint(
            os.path.join(self.checkpoint_dir, name),
            {
                "params": self.state.params,
                "ema_params": self.state.ema_params,
                "step": step,
            },
            config=self.config,
        )
        ckpt.save_checkpoint(
            os.path.join(
                self.checkpoint_dir,
                ckpt.opt_checkpoint_name(
                    self.contr,
                    step,
                    self.sample_schedule,
                    self.diffusion_steps,
                    self.dataset,
                ),
            ),
            {"opt_state": self.state.opt_state},
        )
        if prune_previous:
            ckpt.prune_step_checkpoints(
                self.checkpoint_dir,
                self.contr,
                step,
                self.sample_schedule,
                self.diffusion_steps,
                self.dataset,
            )
