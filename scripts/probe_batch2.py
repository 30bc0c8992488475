"""Single-chip batch-2 training probe (VERDICT r2 item 4).

The reference's production config trains at batch 2 (`run.sh:146`); here
the true batch-2 fwd+bwd graph previously crashed the remote compiler and
the documented answer was "DP over 2 chips". This probe records the
measured single-chip answers:

(a) grad-accumulation step time at batch 2 / microbatch 1 (the
    `--microbatch` path, numerics-tested in tests/test_parallel.py) —
    production shapes, device time;
(b) one fresh attempt to fit/compile the TRUE batch-2 graph, at the
    current remat default (ds<=1) and at remat-ALL, each under a bounded
    timeout — outcome recorded either way;
(c) the batch-1 step as the reference point.

Run on the chip: python scripts/probe_batch2.py  (long compiles: launch
in the background with a generous outer timeout).
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("FAST_CWDM_COMPILE_CACHE", "/root/repo/.xla_cache/tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from fast_cwdm_tpu.diffusion.gaussian import MODALITIES, GaussianDiffusion
from fast_cwdm_tpu.training import TrainState, make_optimizer, make_train_step
from fast_cwdm_tpu.utils.devtime import devtime

S = (224, 224, 160)  # image space (latent 112x112x80 after DWT)


def build(remat_max_ds: int = 1):
    # remat_max_ds: 0 = remat ALL ResBlocks; K = only blocks at ds <= K
    # (models/unet.py:431-446); 1 is the production default
    from __graft_entry__ import _flagship

    model = _flagship(
        use_checkpoint=True, dtype=jnp.bfloat16, remat_max_ds=remat_max_ds
    )
    diffusion = GaussianDiffusion.named("linear", 1000, "direct", mode="i2i")
    tx = make_optimizer(1e-5, lr_anneal_steps=5000)
    return model, diffusion, tx


def make_batch(b: int):
    rng = np.random.default_rng(0)
    return {
        m: jnp.asarray(rng.random((b, *S, 1), np.float32))
        for m in MODALITIES
    }


def init_state(model, tx):
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 16, 32)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    return TrainState.create(params, tx, ema_rates=(0.9999,))


def time_step(label: str, model, diffusion, tx, b: int, accum: int = 1):
    step = make_train_step(
        model, diffusion, tx, contr="t1c", mode="i2i",
        accum_steps=accum,
    )
    state = init_state(model, tx)
    batch = make_batch(b)
    key = jax.random.PRNGKey(1)
    print(f"[{label}] compiling + first step ...", flush=True)
    new_state, metrics = step(state, batch, key)
    loss = float(jax.device_get(metrics["loss"]))
    print(f"[{label}] first step OK, loss={loss:.5f}", flush=True)
    # free the first step's buffers BEFORE building the profiling state:
    # at production shapes two live states + the compiled step's workspace
    # exceed HBM (observed RESOURCE_EXHAUSTED on the batch-1 leg)
    import gc

    del state, new_state, metrics
    gc.collect()
    state2 = init_state(model, tx)
    ms = devtime(step, state2, batch, key)["total_ms"]
    print(f"[{label}] device time: {ms:.1f} ms/step", flush=True)
    return {"label": label, "ms_per_step": round(ms, 1), "loss": loss}


def main() -> None:
    print("device:", jax.devices()[0])
    results = []

    model, diffusion, tx = build()
    results.append(time_step("batch1", model, diffusion, tx, 1))
    results.append(
        time_step("batch2_accum", model, diffusion, tx, 2, 2)
    )

    for remat, label in ((0, "batch2_true_remat_all"),
                         (1, "batch2_true_remat_ds1")):
        try:
            m2, d2, tx2 = build(remat_max_ds=remat)
            r = time_step(label, m2, d2, tx2, 2)
            results.append(r)
        except Exception as e:  # noqa: BLE001 — outcome IS the datum
            print(f"[{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            traceback.print_exc(limit=2)
            results.append({"label": label, "error": str(e)[:300]})

    print(json.dumps(results))


if __name__ == "__main__":
    main()
