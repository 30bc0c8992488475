"""Headline benchmark: conditional cWDM sampling throughput on one chip.

Measures the north-star config (BASELINE.json): 100-step t1c synthesis at
the production wavelet latent (8×112×112×80, 24-channel condition) with the
production U-Net (64ch, mult (1,2,2,4,4), ~81.5M params).

Two execution modes on the SAME chip:

* ``fused``  — the framework's `p_sample_loop`: the entire 100-step reverse
  chain (UNet + per-step IDWT→clamp→DWT x0 projection) is ONE `lax.scan`
  XLA program.
* ``faithful`` (the headline baseline) — the reference's per-STEP execution
  shape: fp32 model, full-spatial IDWT→clamp→DWT x0 projection every step
  (no fused block-local form — `gaussian_diffusion.py:335-354` round-trips
  the whole 224³ volume), one jitted `p_sample` dispatch per step with a
  host sync each iteration (`gaussian_diffusion.py:668-719` iterates in
  Python under torch eager). Host-side overheads the reference also pays
  (rebuilding DWT banded matrices per call, `DWT_IDWT_layer.py:520-529`)
  are NOT simulated — the leg reproduces the device math + dispatch shape,
  so the recorded speedup still UNDERSTATES the true gap to the reference.
* ``refstyle`` — per-step dispatch of the FRAMEWORK's step (bf16, fused
  projection): isolates the win from whole-chain compilation alone.

NOTE: both per-step legs include 100 host-sync round trips through the
axon tunnel (3-40 ms each, variable across sessions) — their absolute
seconds drift run-to-run by several seconds; that is the leg's point (the
reference pays per-step sync) and explains the r01 21.0 s vs 17.2 s
refstyle discrepancy (PERF.md).

Prints ONE JSON line:
  {"metric": "volumes_per_hour_100step_t1c", "value": ..., "unit":
   "vol/h/chip", "vs_baseline": fused_over_faithful_speedup, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# persistent compile cache: repeat bench runs (e.g. the driver's) skip the
# ~10-minute production-scan compiles. Repo-local (gitignored) because
# /tmp is wiped between driver sessions while the repo persists; honors
# FAST_CWDM_COMPILE_CACHE like every CLI (round-3 advisor: one cache, not
# one per entry point).
from fast_cwdm_tpu.cli.common import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def build(steps: int, dtype, fused: bool = False):
    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion

    # ONE flagship definition: the benchmark measures exactly the model the
    # driver compile-checks (`__graft_entry__.entry`), with runtime choices
    # (dtype, fused conv) passed as overrides
    from __graft_entry__ import _flagship

    model = _flagship(fuse_conv=fused, dtype=dtype)
    diffusion = GaussianDiffusion.named(
        "linear", steps, "sampled", mode="i2i"
    )
    return model, diffusion


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--spatial", type=int, nargs=3, default=(112, 112, 80))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--fused", action="store_true",
                    help="route ResBlock GN+SiLU+conv through the fused Pallas kernel")
    ap.add_argument("--chunk", type=int, default=0,
                    help="split the reverse chain into chunks of N steps "
                         "(separate device programs; for very long schedules)")
    ap.add_argument("--baseline", default="both",
                    choices=["faithful", "refstyle", "both", "none"],
                    help="faithful: fp32 + full-spatial per-step clip "
                         "projection + per-step dispatch (the reference's "
                         "execution shape); refstyle: per-step dispatch of "
                         "the framework's bf16 fused step")
    ap.add_argument("--skip-baseline", action="store_true",
                    help="alias for --baseline=none")
    ap.add_argument("--dpm", type=int, default=10, metavar="N",
                    help="also time the DPM-Solver++(2M) sampler at N model "
                         "evaluations (default 10 — QUALITY.md measured the "
                         "frontier FLAT down to 10 evals on the phantom "
                         "benchmark, so this is the matched-quality "
                         "operating point; 0 disables; fresh ~4-min compile "
                         "on a cold cache)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to host CPU (orchestration validation only — "
                         "numbers are meaningless). In-process pin because "
                         "the axon plugin ignores JAX_PLATFORMS=cpu, and a "
                         "second process on the chip silently starves a "
                         "running one (verify-skill gotcha)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.skip_baseline:
        args.baseline = "none"

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, diffusion = build(args.steps, dtype, fused=args.fused)

    b = args.batch
    sx, sy, sz = args.spatial
    lat = (b, sx, sy, sz, 8)
    key = jax.random.PRNGKey(0)
    k_init, k_cond, k_noise, k_loop = jax.random.split(key, 4)
    cond = jax.random.normal(k_cond, (b, sx, sy, sz, 24), jnp.float32)
    noise = jax.random.normal(k_noise, lat, jnp.float32)
    # jitted init: ONE program instead of minutes of eager op-by-op
    # tunnel dispatches (PERF.md "host-side dispatch pathologies")
    params = jax.jit(model.init)(
        k_init, jnp.zeros((b, 16, 16, 16, 32)), jnp.zeros((b,), jnp.int32)
    )["params"]

    # params are jit ARGS (closure params would be embedded in the HLO —
    # hundreds of MB shipped to the compiler)
    # ---------------- fused: whole chain = one lax.scan program ----------
    if args.chunk:
        # chunked: ceil(T/chunk) dispatches of one jitted segment scan;
        # params/cond stay jit ARGS (closure constants overflow the remote
        # compiler at 81M params)
        @jax.jit
        def sample_chunk(params, img, ts, keys, cond):
            def model_fn(x, t):
                return model.apply({"params": params}, x, t)

            return diffusion.scan_steps(model_fn, img, ts, keys, cond=cond)

        def sample_fused(params, noise, cond, key):
            t_total = diffusion.num_timesteps
            ts = jnp.arange(t_total - 1, -1, -1)
            # match p_sample_loop's convention (key -> (init, loop); step
            # keys from loop) so chunked == unchunked bit-for-bit
            _, key_loop = jax.random.split(key)
            keys = jax.random.split(key_loop, t_total)
            img = noise
            for s in range(0, t_total, args.chunk):
                img = sample_chunk(
                    params, img, ts[s:s + args.chunk],
                    keys[s:s + args.chunk], cond,
                )
            return img
    else:
        @jax.jit
        def sample_fused(params, noise, cond, key):
            def model_fn(x, t):
                return model.apply({"params": params}, x, t)

            return diffusion.p_sample_loop(
                model_fn, lat, key, cond=cond, noise=noise
            )

    # force completion with a tiny D2H fetch of a value that depends on
    # the result: block_until_ready returns EARLY through the axon tunnel
    # (verify-skill gotcha) and once silently timed dispatch-only
    # (5 ms "per volume"); a dependent fetch cannot lie
    def force(x):
        return float(np.asarray(jnp.sum(x[..., :1, :1, :1])))

    out = sample_fused(params, noise, cond, k_loop)
    force(out)  # compile
    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        out = sample_fused(params, noise, cond, jax.random.fold_in(k_loop, i))
        force(out)
        times.append(time.perf_counter() - t0)
    fused_s = min(times)
    vol_per_hour = 3600.0 / fused_s * b

    # ------------- per-step baseline legs (one dispatch + sync / step) ---
    def run_per_step(model_, diffusion_):
        @jax.jit
        def one_step(params, x, t, k, cond):
            def model_fn(xx, tt):
                return model_.apply({"params": params}, xx, tt)

            return diffusion_.p_sample(model_fn, x, t, k, cond=cond)["sample"]

        def sample(noise, cond, key):
            x = noise
            for i in range(diffusion_.num_timesteps - 1, -1, -1):
                key, sub = jax.random.split(key)
                t = jnp.full((b,), i, jnp.int32)
                x = one_step(params, x, t, sub, cond)
                np.asarray(x[0, 0, 0, 0, 0])  # per-step host sync (ref-style)
            return x

        sample(noise, cond, k_loop)  # compile
        # min-of-repeats like the fused leg: each run carries 100 variable
        # 3-40 ms tunnel syncs, so a single run swings vs_baseline by tens
        # of percent across sessions (PERF.md "refstyle drift")
        leg_times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            x = sample(noise, cond, jax.random.fold_in(k_loop, 99 + i))
            np.asarray(x)
            leg_times.append(time.perf_counter() - t0)
        return min(leg_times)

    # ------------- optional DPM-Solver++ leg (beyond-reference) ----------
    dpm_s = None
    if args.dpm:
        @jax.jit
        def sample_dpm(params, noise, cond, key):
            def model_fn(x, t):
                return model.apply({"params": params}, x, t)

            return diffusion.dpm_solver_pp_loop(
                model_fn, lat, key, cond=cond, noise=noise, steps=args.dpm
            )

        force(sample_dpm(params, noise, cond, k_loop))  # compile
        dpm_times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            out = sample_dpm(
                params, noise, cond, jax.random.fold_in(k_loop, 50 + i)
            )
            force(out)
            dpm_times.append(time.perf_counter() - t0)
        dpm_s = min(dpm_times)

    refstyle_s = faithful_s = plus_host_s = None
    if args.baseline in ("refstyle", "both"):
        refstyle_s = run_per_step(model, diffusion)
    if args.baseline in ("faithful", "both"):
        # the reference's device math: fp32 end to end, full-spatial
        # IDWT→clamp→DWT x0 projection (`gaussian_diffusion.py:335-354`)
        model_f32, _ = build(args.steps, jnp.float32, fused=False)
        faithful_s = run_per_step(
            model_f32, diffusion.replace(fuse_clip_projection=False)
        )
        # faithful_plus_host: add the MEASURED host cost of the
        # banded-matrix rebuild the reference performs on EVERY wavelet
        # forward (`get_matrix` inside forward, `DWT_IDWT_layer.py:520-529`)
        # — per step: one IDWT + one DWT, 3 axes each, uncached assembly
        # at the image-space sizes. The faithful leg deliberately omits
        # this (device math + dispatch shape only), so this secondary
        # figure bounds the true reference gap from the other side.
        from fast_cwdm_tpu.ops.wavelet import _banded_matrices

        rebuild = _banded_matrices.__wrapped__  # bypass the lru cache
        sizes = [2 * s for s in args.spatial]  # 224, 224, 160 image-space
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            for n in sizes:
                rebuild(n, "haar")  # DWT matrices
                rebuild(n, "haar")  # IDWT builds its own set
        per_step_host = (time.perf_counter() - t0) / reps
        plus_host_s = faithful_s + args.steps * per_step_host
    base_s = faithful_s if faithful_s is not None else refstyle_s
    vs_baseline = base_s / fused_s if base_s is not None else None

    result = {
        "metric": "volumes_per_hour_100step_t1c",
        "value": round(vol_per_hour, 3),
        "unit": "vol/h/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {
            "steps": args.steps,
            "latent": list(lat),
            "dtype": args.dtype,
            "fused_conv": args.fused,
            "fused_s_per_volume": round(fused_s / b, 3),
            "refstyle_s_per_volume": (
                round(refstyle_s / b, 3) if refstyle_s else None
            ),
            "faithful_s_per_volume": (
                round(faithful_s / b, 3) if faithful_s else None
            ),
            "faithful_plus_host_s_per_volume": (
                round(plus_host_s / b, 3) if plus_host_s else None
            ),
            "vs_baseline_plus_host": (
                round(plus_host_s / fused_s, 3) if plus_host_s else None
            ),
            "dpm_s_per_volume": round(dpm_s / b, 3) if dpm_s else None,
            "dpm_steps": args.dpm or None,
            # the matched-quality operating point: QUALITY.md (2026-08-20
            # chip run) measured SSIM 0.9923/PSNR 41.2 IDENTICAL from
            # 1000 evals down to dpm++-10 on the production model, so
            # this ratio is the honest matched-quality speedup vs the
            # faithful reference leg
            "dpm_vs_baseline": (
                round(base_s / dpm_s, 3) if dpm_s and base_s else None
            ),
            "matched_quality_evidence": (
                "QUALITY.md: direct-1000 frontier flat at SSIM 0.9923 "
                "from ddpm-full(1000) to dpm++-10"
            ),
            "device": str(jax.devices()[0]),
            "baseline_mode": (
                "faithful: reference execution shape (fp32, full-spatial "
                "per-step clip projection, per-step dispatch + host sync), "
                "same chip"
                if faithful_s is not None
                else "reference-style per-step dispatch, same chip"
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
