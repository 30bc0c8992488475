"""Shared CLI plumbing: config → model/params/diffusion, conditioning,
jitted synthesis (parity helpers used by sample / sample_auto /
complete_dataset — the reference duplicates this logic per script,
`complete_dataset.py:130-179` vs `run.sh:41-135`, a drift risk this module
removes).
"""

from __future__ import annotations

import os


import jax
import jax.numpy as jnp
import numpy as np

from fast_cwdm_tpu.diffusion.gaussian import condition_order
from fast_cwdm_tpu.models import create_model_and_diffusion
from fast_cwdm_tpu.ops import wavelet as wv
from fast_cwdm_tpu.training import checkpoints as ckpt

PRODUCTION_OVERRIDES = dict(
    image_size=112,
    num_channels=64,
    num_res_blocks=2,
    channel_mult="1,2,2,4,4",
    attention_resolutions="",
    in_channels=32,
    out_channels=8,
    dims=3,
    num_groups=32,
    bottleneck_attention=False,
    resample_2d=False,
    use_scale_shift_norm=False,
    additive_skips=False,
    # the training objective is ALWAYS x0-prediction wavelet MSE
    # (`gaussian_diffusion.py:1084-1166`); sampling must interpret model
    # output as x_start — the reference's run.sh:134 sets this too
    predict_xstart=True,
    mode="i2i",
    # production inference runs bf16 compute (fp32 GroupNorm stats and
    # fp32 params — models/nn.py); every published PERF.md number is
    # measured at this setting. `--dtype float32` restores full fp32.
    dtype="bfloat16",
)


def str2bool(s) -> bool:
    """Shared falsy convention: ``0/false/no/off/none/""`` (any case) are
    False, everything else True — matches ``FAST_CWDM_COMPILE_CACHE``."""
    if isinstance(s, bool):
        return s
    return str(s).lower() not in ("0", "false", "no", "off", "none", "")


def default_compile_cache_dir() -> str:
    """Repo-local ``.xla_cache/tpu`` — ONE warm cache shared by the CLIs,
    bench.py, __graft_entry__.py and the probe scripts, derived from this
    file's location so it works wherever the repo lives."""
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo, ".xla_cache", "tpu")


def enable_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a durable directory.

    The production sampling scan takes ~10-15 min to compile through the
    axon remote compiler (see PERF.md); with the cache on, every later
    process-start reuses the serialized executable. The reference pays
    no such cost (torch eager) so this is the TPU-native answer to its
    instant warm-up. ``FAST_CWDM_COMPILE_CACHE`` overrides the location;
    set it to ``0``/``off`` to disable (e.g. on read-only filesystems).
    """
    loc = os.environ.get("FAST_CWDM_COMPILE_CACHE", "")
    if loc and not str2bool(loc):
        return
    if not loc:
        loc = default_compile_cache_dir()
    try:
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        # 1s threshold: through the axon tunnel even "small" compiles cost
        # seconds; caching them all is what makes warm starts warm
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        print(f"[cache] compile cache disabled: {e}")


def production_config(**overrides) -> dict:
    """run.sh production flag bundle (`run.sh:41-135`) as a config dict."""
    cfg = dict(PRODUCTION_OVERRIDES)
    cfg.update(overrides)
    return cfg


def build_model_and_diffusion(cfg: dict):
    return create_model_and_diffusion(**cfg)


def init_params(model, key=None, batch: int = 1):
    """Initialize params at a minimal valid latent (shapes don't affect
    parameter shapes — conv nets are size-polymorphic)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    depth = max(
        16, 2 ** (len(tuple(model.channel_mult)) - 1) * 2
    )
    x = jnp.zeros((batch, depth, depth, depth, model.in_channels))
    t = jnp.zeros((batch,), jnp.int32)
    # jitted: eager init is minutes of op-by-op tunnel dispatch on axon
    return jax.jit(model.init)(key, x, t)["params"]


def param_template(model, batch: int = 1):
    """Parameter STRUCTURE only (ShapeDtypeStruct leaves), via
    `jax.eval_shape` — zero compute, zero device traffic. Eagerly running
    `model.init` instead costs ~2 min of op-by-op tunnel dispatches on
    axon (measured; see `load_params`), for values a deserialization
    template immediately throws away."""
    depth = max(16, 2 ** (len(tuple(model.channel_mult)) - 1) * 2)
    x = jax.ShapeDtypeStruct(
        (batch, depth, depth, depth, model.in_channels), jnp.float32
    )
    t = jax.ShapeDtypeStruct((batch,), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.eval_shape(model.init, key, x, t)["params"]


def load_params(path: str, model, *, use_ema: bool = False):
    """Load sampling params from a framework ``.ckpt`` or reference-format
    torch ``.pt``. ``use_ema`` that cannot be honored (no EMA shadows in
    the file) is reported, never silently ignored."""
    return load_params_ex(path, model, use_ema=use_ema)[0]


def load_params_ex(path: str, model, *, use_ema: bool = False):
    """Like :func:`load_params` but returns ``(params, ema_applied)`` so
    callers can SKIP or relabel an EMA leg instead of silently recording
    raw-weight results under an ``+ema`` label (round-3 advisor finding:
    a quality row that reads "EMA makes no difference" when the truth is
    "EMA absent" is a measurement bug)."""
    if path.endswith(".pt"):
        from fast_cwdm_tpu.training import bridge

        if use_ema:
            print(
                f"[load_params] WARNING: {path} is a torch state_dict with "
                "no EMA shadows; using the raw parameters"
            )
        return bridge.load_torch_unet(path, model), False
    from fast_cwdm_tpu.training import orbax_io

    # settle in-flight async saves BEFORE sniffing the format: a
    # half-written orbax directory (no committed metadata yet) would
    # otherwise be misclassified as a msgpack blob
    ckpt.wait_for_pending_saves()
    if path.endswith(".orbax") or orbax_io.is_orbax_checkpoint(path):
        loaded = orbax_io.restore_any(path)  # structure from metadata
        ema = tuple(loaded.get("ema_params") or ())
        if use_ema:
            if ema:
                return ema[0], True
            print(
                f"[load_params] WARNING: {path} has no EMA shadows; "
                "using the raw parameters"
            )
        return loaded["params"], False
    # checkpoints may carry 0..N EMA shadows — shared probe with
    # TrainLoop._apply_resume (checkpoints.load_with_ema_probe); IO
    # problems (missing file, permissions) surface as themselves
    loaded = ckpt.load_with_ema_probe(path, param_template(model))
    if use_ema:
        if loaded.get("ema_params"):
            return loaded["ema_params"][0], True
        print(
            f"[load_params] WARNING: {path} has no EMA shadows; "
            "using the raw parameters"
        )
    return loaded["params"], False


_COND_JIT: dict[str, object] = {}


def prepare_condition(
    batch: dict[str, np.ndarray | jax.Array], contr: str, wavelet: str = "haar"
) -> jax.Array:
    """3 known modalities → 24-channel wavelet condition in the reference's
    concat order (`scripts/sample.py:92-97`, order `gd.py:1102-1126`).
    One jitted program per wavelet — eager DWTs cost seconds of op-by-op
    tunnel dispatch on axon."""
    if wavelet not in _COND_JIT:
        _COND_JIT[wavelet] = jax.jit(
            lambda cs: jnp.concatenate(
                [wv.dwt_normalized(c, wavelet) for c in cs], axis=-1
            )
        )
    conds = tuple(jnp.asarray(batch[m]) for m in condition_order(contr))
    return _COND_JIT[wavelet](conds)


def load_best_synthesis(
    checkpoint_dir: str,
    contr: str,
    *,
    dataset: str = "brats",
    base_cfg: dict | None = None,
    dtype: str | None = None,
    use_ema: bool = True,
    mesh=None,
    tag: str = "synth",
    clip_denoised: bool = True,
    sampler: str = "ddpm",
    sampler_steps: int | None = None,
):
    """Discover the BEST checkpoint for ``contr`` and build its jitted
    synthesis fn: find → merge the checkpoint's stored config → construct
    model/diffusion → load params → `make_synthesis_fn`.

    One definition for sample_auto and complete_dataset (their per-script
    copies had already drifted — exactly the duplication this module
    exists to remove). ``base_cfg`` is the starting flag bundle (CLI args
    for sample_auto); ``None`` means the run.sh production preset. The
    stored config wins over the base for every model/diffusion key EXCEPT
    ``dtype``: compute dtype is a runtime choice (params are always f32),
    so only an explicit ``dtype`` argument overrides the base default.
    """
    from fast_cwdm_tpu.models import model_and_diffusion_defaults

    found = ckpt.find_best_checkpoint(checkpoint_dir, contr, dataset)
    if found is None:
        raise FileNotFoundError(
            f"no BEST checkpoint for {contr} in {checkpoint_dir}"
        )
    path, schedule, steps = found
    # config rides with the checkpoint (unlike the reference, which
    # re-parses hyperparameters from the FILENAME,
    # `complete_dataset.py:107-127`)
    stored = ckpt.load_checkpoint_config(path) or {}
    cfg = (
        dict(base_cfg)
        if base_cfg is not None
        else production_config(
            sample_schedule=schedule, diffusion_steps=steps
        )
    )
    schema = set(model_and_diffusion_defaults())
    cfg.update(
        {k: v for k, v in stored.items() if k in schema and k != "dtype"}
    )
    if dtype:
        cfg["dtype"] = dtype
    cfg.update(mode="i2i", sample_schedule=schedule, diffusion_steps=steps)
    if sampler == "ddim" and sampler_steps:
        # same contract as sample.py: DDIM shortens the chain by respacing
        # the process (dpm++ subsamples its own index schedule instead)
        cfg["timestep_respacing"] = f"ddim{sampler_steps}"
    model, diffusion = build_model_and_diffusion(cfg)
    params = load_params(path, model, use_ema=use_ema)
    fn = make_synthesis_fn(
        model, params, diffusion, mesh=mesh, clip_denoised=clip_denoised,
        sampler=sampler, sampler_steps=sampler_steps,
    )
    print(
        f"[{tag}] {contr}: {os.path.basename(path)} "
        f"({schedule}, {steps} steps, sampler={sampler})"
    )
    return fn


def make_synthesis_fn(model, params, diffusion, *, crop_z: int = 155,
                      mesh=None, chunk: int | str | None = "auto",
                      sampler: str = "ddpm", sampler_steps: int | None = None,
                      clip_denoised: bool = True):
    """One jitted program: scan the full reverse chain, IDWT, clamp [0,1],
    zero non-brain voxels via the first condition volume
    (`scripts/sample.py:104-125`).

    ``params`` are a jit ARGUMENT, not a closure constant — closed-over
    params get embedded in the HLO (hundreds of MB for the production
    model), bloating compiles.

    ``mesh``: optional `jax.sharding.Mesh` — batched multi-chip serving:
    the condition/mask batch is sharded over the ``data`` axis (one volume
    per chip group), params replicated. As in the unsharded path, ONE key
    drives the whole batch, so a volume's noise depends on its batch
    position (not on the mesh shape — sharded == unsharded, tested).
    """

    # very long schedules run as chunked segment scans: a monolithic
    # 1000-iteration scan program faults the device on this setup, and
    # chunking measures zero overhead (PERF.md "1000-step classic DDPM").
    # params stay jit ARGS in the chunked path too (a closure would embed
    # them as HLO constants), and the chunk loop runs on the host so each
    # segment is its own device program.
    if sampler not in ("ddpm", "ddim", "dpm++"):
        raise ValueError(
            f"sampler must be ddpm, ddim or dpm++, got {sampler!r}"
        )
    if chunk == "auto":
        # BOTH samplers chunk long chains: without a respacing, a DDIM run
        # still walks all num_timesteps steps, and a monolithic >200-step
        # scan program is exactly the shape that faults the device here
        chunk = 100 if diffusion.num_timesteps > 200 else None

    @jax.jit
    def postprocess(sample, mask_vol):
        img = wv.idwt_normalized(sample, channels=1, wavelet=diffusion.wavelet)
        img = jnp.clip(img, 0.0, 1.0)
        return jnp.where(mask_vol == 0, 0.0, img)

    if sampler == "dpm++":
        # DPM-Solver++ walks its OWN subsampled index schedule
        # (``sampler_steps`` model evaluations spread over the full
        # process) — short chains by construction, never chunked
        steps = sampler_steps or min(50, diffusion.num_timesteps)

        @jax.jit
        def synth(params, cond, mask_vol, key):
            def model_fn(x, t):
                return model.apply({"params": params}, x, t)

            b = cond.shape[0]
            shape = (b, *cond.shape[1:-1], diffusion.target_channels)
            sample = diffusion.dpm_solver_pp_loop(
                model_fn, shape, key, cond=cond, steps=steps,
                clip_denoised=clip_denoised,
            )
            return postprocess(sample, mask_vol)

    elif chunk is None:

        @jax.jit
        def synth(params, cond, mask_vol, key):
            def model_fn(x, t):
                return model.apply({"params": params}, x, t)

            b = cond.shape[0]
            shape = (b, *cond.shape[1:-1], diffusion.target_channels)
            loop = (
                diffusion.ddim_sample_loop
                if sampler == "ddim"
                else diffusion.p_sample_loop
            )
            sample = loop(
                model_fn, shape, key, cond=cond, clip_denoised=clip_denoised
            )
            return postprocess(sample, mask_vol)

    else:

        @jax.jit
        def sample_chunk(params, img, ts_c, keys_c, cond):
            def model_fn(x, t):
                return model.apply({"params": params}, x, t)

            scan = (
                diffusion.ddim_scan_steps
                if sampler == "ddim"
                else diffusion.scan_steps
            )
            return scan(
                model_fn,
                img,
                ts_c,
                keys_c,
                cond=cond,
                clip_denoised=clip_denoised,
            )

        def synth(params, cond, mask_vol, key):
            t_total = diffusion.num_timesteps
            key_init, key_loop = jax.random.split(key)
            b = cond.shape[0]
            shape = (b, *cond.shape[1:-1], diffusion.target_channels)
            img = jax.random.normal(key_init, shape, jnp.float32)
            ts = jnp.arange(t_total - 1, -1, -1)
            keys = jax.random.split(key_loop, t_total)
            for s in range(0, t_total, chunk):
                img = sample_chunk(
                    params, img, ts[s : s + chunk], keys[s : s + chunk], cond
                )
            return postprocess(img, mask_vol)

    if mesh is None:
        device_params = jax.device_put(params)

        def run(cond, mask_vol, key) -> np.ndarray:
            img = synth(
                device_params, jnp.asarray(cond), jnp.asarray(mask_vol), key
            )
            img = np.array(img)[..., 0]  # writable host copy, drop channel
            return img[:, :, :, :crop_z]

        return run

    from fast_cwdm_tpu.parallel import batch_sharding, replicated

    device_params = jax.device_put(params, replicated(mesh))

    def run_sharded(cond, mask_vol, key) -> np.ndarray:
        cond = jax.device_put(jnp.asarray(cond), batch_sharding(mesh))
        mask_vol = jax.device_put(jnp.asarray(mask_vol), batch_sharding(mesh))
        img = synth(device_params, cond, mask_vol, key)
        img = np.array(img)[..., 0]
        return img[:, :, :, :crop_z]

    return run_sharded


def subject_id_from_path(path: str) -> str:
    """`sample.py:62`-style subject id: the case directory name."""
    d = os.path.dirname(path)
    return os.path.basename(d) if d else os.path.basename(path)[:19]


class AsyncWriter:
    """Small write-behind pool: NIfTI gzip encodes cost ~0.5-3 s of host
    CPU per volume and must overlap the next case's device sampling
    (mirrors the input-side ThreadedLoader prefetch).

    The backlog is BOUNDED (``max_pending``): when sampling outpaces the
    writers, ``submit`` blocks on the oldest job instead of queueing every
    ~31 MB volume until the end of the run. ``drain()`` waits for the rest
    and returns the total number of failed jobs (printing each error).
    """

    def __init__(
        self, max_workers: int = 2, max_pending: int = 8, label: str = "write"
    ):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._pending: list = []
        self._max_pending = max_pending
        self._label = label
        self._failed_tags: list[str] = []

    def _resolve(self, tag, fut) -> None:
        try:
            fut.result()
        except Exception as e:  # noqa: BLE001 — per-case resilience
            print(f"[{self._label}] FAILED {tag}: {e}")
            self._failed_tags.append(tag)

    def submit(self, tag: str, fn, *args, **kwargs) -> None:
        while len(self._pending) >= self._max_pending:
            self._resolve(*self._pending.pop(0))
        self._pending.append((tag, self._pool.submit(fn, *args, **kwargs)))

    def drain(self) -> int:
        return len(self.drain_failed())

    def drain_failed(self) -> list[str]:
        """Wait for all jobs; return the tags of the failed ones (so callers
        can do per-case accounting instead of double-counting a case whose
        write and copy both fail)."""
        for tag, fut in self._pending:
            self._resolve(tag, fut)
        self._pending.clear()
        self._pool.shutdown(wait=True)
        failed, self._failed_tags = self._failed_tags, []
        return failed
