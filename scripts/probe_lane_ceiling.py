"""Direct probe of the Cout=64 MXU lane ceiling (VERDICT r2 item 3).

Round-2 closed the conv-performance roadmap with "fundamental Cout=64
lane ceiling at L0" — inferred from Mosaic dot-rate measurements, never
from control experiments on the convs themselves. This probe measures:

(a) the SAME L0 convolution at C=64 vs C=128 in/out (device time via
    `utils.devtime`): if achieved TFLOP/s at C=128 is ~2x the C=64 rate,
    the ceiling is confirmed and quantified;
(b) one semantics-preserving channel-packing transform THROUGH XLA:
    space-to-depth fold along X (112,112,80,64) -> (56,112,80,128) with an
    exactly-equivalent folded kernel (parity-asserted). The folded conv
    runs at N=128 lanes but its dense kernel carries structural zeros —
    2x the FLOPs — so it wins only if the N=64 rate is BELOW HALF the
    N=128 rate. Honest negatives welcome (PERF.md gets the numbers either
    way).

Run on the chip: python scripts/probe_lane_ceiling.py
(~10 min of compiles on a cold cache).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from fast_cwdm_tpu.utils.devtime import devtime

DN = ("NDHWC", "DHWIO", "NDHWC")
L0 = (112, 112, 80)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=DN,
    )


def fold_x(x):
    """(B, X, Y, Z, C) -> (B, X/2, Y, Z, 2C): adjacent-X pairs to channels."""
    b, xs, ys, zs, c = x.shape
    return x.reshape(b, xs // 2, 2, ys, zs, c).transpose(
        0, 1, 3, 4, 2, 5
    ).reshape(b, xs // 2, ys, zs, 2 * c)


def unfold_x(y):
    b, xs, ys, zs, c2 = y.shape
    c = c2 // 2
    return y.reshape(b, xs, ys, zs, 2, c).transpose(
        0, 1, 4, 2, 3, 5
    ).reshape(b, xs * 2, ys, zs, c)


def fold_kernel(w):
    """3x3x3 (Ci,Co) kernel -> exactly-equivalent 3x3x3 (2Ci,2Co) kernel on
    the X-folded layout. Entry map (derivation in the module docstring of
    the probe): Wf[fx, ky, kz, cp*Ci+c, q*Co+o] = W[dx, ky, kz, c, o] with
    dx = 2*fx + cp - q - 1 when 0 <= dx < 3, else 0."""
    kx, ky, kz, ci, co = w.shape
    assert kx == 3
    wf = np.zeros((3, ky, kz, 2 * ci, 2 * co), w.dtype)
    for fx in range(3):
        for cp in range(2):
            for q in range(2):
                dx = 2 * fx + cp - q - 1
                if 0 <= dx < 3:
                    wf[fx, :, :, cp * ci:(cp + 1) * ci,
                       q * co:(q + 1) * co] = w[dx]
    return wf


def main() -> None:
    dev = jax.devices()[0]
    print("device:", dev)
    key = jax.random.PRNGKey(0)
    results = {}

    # ---- (a) conv rate vs channel width at the L0 spatial shape --------
    for ci, co in [(64, 64), (128, 128), (64, 128), (128, 64),
                   (64, 192), (192, 192)]:
        x = jax.random.normal(key, (1, *L0, ci), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, ci, co), jnp.bfloat16)
        f = jax.jit(conv)
        ms = devtime(f, x, w)["total_ms"]
        flops = 2 * np.prod(L0) * 27 * ci * co
        tfs = flops / (ms * 1e-3) / 1e12
        results[f"conv_{ci}->{co}"] = {
            "ms": round(ms, 3), "tflops_s": round(tfs, 1)
        }
        print(f"conv {ci:>3}->{co:<3} @112x112x80 bf16: {ms:7.3f} ms "
              f"= {tfs:6.1f} TF/s")

    # ---- (b) space-to-depth folded equivalent at 64->64 ----------------
    # parity first, on a small f32 shape
    xs = jax.random.normal(key, (1, 16, 8, 8, 64), jnp.float32)
    ws = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 64, 64),
                           jnp.float32) * 0.1
    ref = conv(xs, ws)
    folded = unfold_x(conv(fold_x(xs), jnp.asarray(fold_kernel(np.asarray(ws)))))
    err = float(jnp.abs(ref - folded).max())
    print(f"fold parity max|err| (f32, small): {err:.2e}")
    assert err < 1e-3, "folded conv is not equivalent"
    results["fold_parity_err"] = err

    x = jax.random.normal(key, (1, *L0, 64), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 64, 64), jnp.bfloat16)
    wf = jnp.asarray(fold_kernel(np.asarray(w)))

    @jax.jit
    def folded_conv(x, wf):
        return unfold_x(conv(fold_x(x), wf))

    @jax.jit
    def folded_conv_nofold(xf, wf):
        # steady-state variant: layout stays folded across the network,
        # fold/unfold amortized away
        return conv(xf, wf)

    ms_plain = devtime(jax.jit(conv), x, w)["total_ms"]
    ms_folded = devtime(folded_conv, x, wf)["total_ms"]
    xf = fold_x(x)
    ms_folded_ss = devtime(folded_conv_nofold, xf, wf)["total_ms"]
    flops = 2 * np.prod(L0) * 27 * 64 * 64
    print(f"plain   64->64: {ms_plain:7.3f} ms "
          f"({flops/(ms_plain*1e-3)/1e12:5.1f} TF/s effective)")
    print(f"folded  (incl. fold/unfold): {ms_folded:7.3f} ms")
    print(f"folded  steady-state:        {ms_folded_ss:7.3f} ms "
          f"(2x MACs at N=128; wins only if < plain)")
    results["fold_plain_ms"] = round(ms_plain, 3)
    results["fold_full_ms"] = round(ms_folded, 3)
    results["fold_steady_ms"] = round(ms_folded_ss, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
