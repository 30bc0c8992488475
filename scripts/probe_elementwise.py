"""Measure the elementwise wall (VERDICT r3 #4): does the fused Pallas
GN-apply+SiLU kernel close any of the ~34 ms elementwise line in the
production forward (PERF.md "True budget": 81 ms convs + ~34 ms
elementwise + ~6 ms other = 131 ms)?

Three measurements, all device-time (`utils/devtime` — wall clock is
meaningless through the tunnel):

  A. standalone: XLA silu(gn_apply(x)) vs the Pallas kernel at the L0
     production shape (1, 112, 112, 80, 64) — the pure-bandwidth
     question (full 128 lanes on the flat view vs C=64-minor tiling).
  B. full forward: flagship UNet fuse_gn_silu=False vs True.
  C. (if B wins) 10-step sampling scan with the flag on, vs the
     BENCH_r03 12.88 s/vol reference point.

Run ON THE CHIP (exclusively — no other JAX process):
    python scripts/probe_elementwise.py [--skip_c]
Results go to stdout; record the verdict in PERF.md either way.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_c", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from fast_cwdm_tpu.cli.common import enable_compile_cache
    from fast_cwdm_tpu.utils.devtime import devtime

    enable_compile_cache()
    print("devices:", jax.devices())

    # ---------------- A: standalone apply+silu at the L0 shape ----------
    from fast_cwdm_tpu.ops import elementwise_pallas as ep

    shape = (1, 112, 112, 80, 64)
    nbytes = int(np.prod(shape)) * 2  # bf16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.bfloat16)
    a = jnp.linspace(0.5, 1.5, 64, dtype=jnp.float32)[None]
    b = jnp.linspace(-0.2, 0.2, 64, dtype=jnp.float32)[None]

    def xla_version(x, a, b):
        bc = (1, 1, 1, 1, 64)
        u = x.astype(jnp.float32) * a.reshape(bc) + b.reshape(bc)
        return (u * jax.nn.sigmoid(u)).astype(x.dtype)

    assert ep.supported(shape), "kernel must tile the production L0 shape"
    fns = {
        "A/xla_affine_silu": jax.jit(xla_version),
        "A/pallas_affine_silu": jax.jit(ep.affine_silu),
    }
    for name, fn in fns.items():
        ms = devtime(fn, x, a, b, iters=args.iters)["total_ms"]
        gbs = 2 * nbytes / ms / 1e6
        print(f"{name}: {ms:.3f} ms  ({gbs:.0f} GB/s effective)")

    # ---------------- B: full flagship forward --------------------------
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship

    latent = jax.random.normal(key, (1, 112, 112, 80, 32), jnp.float32)
    t = jnp.array([500], jnp.int32)
    results = {}
    for flag in (False, True):
        model = _flagship(dtype=jnp.bfloat16, fuse_gn_silu=flag)
        params = jax.jit(model.init)(jax.random.PRNGKey(1), latent, t)[
            "params"
        ]

        def fwd(params, latent, t):
            return model.apply({"params": params}, latent, t)

        ms = devtime(jax.jit(fwd), params, latent, t, iters=args.iters)[
            "total_ms"
        ]
        results[flag] = ms
        print(f"B/forward fuse_gn_silu={flag}: {ms:.2f} ms device")
    delta = results[False] - results[True]
    print(f"B/delta: {delta:+.2f} ms ({delta / results[False] * 100:+.1f}%)")

    # ---------------- C: sampling throughput with the flag --------------
    if args.skip_c or delta <= 0:
        print("C: skipped" + (" (no forward win)" if delta <= 0 else ""))
        return
    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion

    model = _flagship(dtype=jnp.bfloat16, fuse_gn_silu=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), latent, t)["params"]
    diffusion = GaussianDiffusion.named("linear", 1000, "direct", mode="i2i")
    import time

    from fast_cwdm_tpu.diffusion.respace import SpacedDiffusion, space_timesteps

    spaced = SpacedDiffusion.create(
        space_timesteps(1000, "100"), "linear", 1000, "direct", mode="i2i"
    )
    cond = jax.random.normal(key, (1, 112, 112, 80, 24), jnp.bfloat16)
    mask = np.ones((1, 224, 224, 160, 1), np.float32)
    synth = common.make_synthesis_fn(model, params, spaced, crop_z=155)
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        out = synth(cond, mask, jax.random.fold_in(key, i))
        float(np.asarray(jnp.sum(jnp.asarray(out)[..., :1, :1])))
        walls.append(time.perf_counter() - t0)
    print(f"C/100-step s_per_volume (fused elementwise): min {min(walls):.3f}"
          f" walls={['%.2f' % w for w in walls]}")


if __name__ == "__main__":
    main()
