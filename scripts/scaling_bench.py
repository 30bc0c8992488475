"""Weak-scaling readiness harness on the virtual CPU mesh.

The production environment exposes ONE real chip, so multi-chip serving and
training cannot be wall-clock-benchmarked here. What CAN be produced — and
what this harness records — is the evidence that the sharded paths are
ready to scale:

* **correctness**: `make_synthesis_fn(mesh=)` and the jitted train step
  produce the same numerics sharded over ``data = 1/2/4/8`` as unsharded,
  at every width (weak scaling: one volume per device);
* **per-device program identity**: the compiled SPMD train step's
  per-device cost (XLA `cost_analysis` flops/bytes) stays constant as the
  mesh widens — each device runs the same local program on the same local
  work, so real-chip throughput scales linearly with chips (the only
  cross-device traffic is the gradient psum / halo exchange XLA inserts).

Run: ``python scripts/scaling_bench.py`` (self-provisions an 8-device CPU
child when needed, like `__graft_entry__.dryrun_multichip`). Prints one
JSON line per width plus a summary line. Reference contract being scaled:
the DP scaffolding the reference hard-codes to world_size=1
(`dist_util.py:44`, `train_util.py:96`).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTHS = (1, 2, 4, 8)


def _reexec(n_devices: int) -> None:
    env = dict(os.environ)
    env["_FAST_CWDM_SCALING_CHILD"] = "1"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; sys.path.insert(0, '.'); "
        "from scripts.scaling_bench import main; main()"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=here)
    raise SystemExit(proc.returncode)


def main() -> None:
    import jax

    if os.environ.get("_FAST_CWDM_SCALING_CHILD") != "1":
        # cold parent: never touch the default backend (the axon TPU plugin
        # hangs during tunnel outages); always run in a CPU child
        _reexec(max(WIDTHS))
        return

    import jax.numpy as jnp
    import numpy as np

    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.diffusion.gaussian import (
        MODALITIES,
        GaussianDiffusion,
    )
    from fast_cwdm_tpu.models import UNetModel
    from fast_cwdm_tpu.parallel import make_mesh, replicated, shard_batch
    from fast_cwdm_tpu.training import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    assert len(jax.devices()) >= max(WIDTHS)

    model = UNetModel(
        image_size=8, in_channels=32, model_channels=16, out_channels=8,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, num_groups=8, resblock_updown=True,
        bottleneck_attention=False, resample_2d=False,
    )
    diffusion = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")
    tx = make_optimizer(1e-4)
    step = make_train_step(model, diffusion, tx, contr="t1c", mode="i2i")
    params = common.init_params(model)
    key = jax.random.PRNGKey(0)
    s = 16  # image space; latent 8^3
    rows = []
    for n in WIDTHS:
        rng = np.random.default_rng(42)
        batch = {
            m: rng.random((n, s, s, s, 1), np.float32) for m in MODALITIES
        }
        cond = common.prepare_condition(batch, "t1c")
        mask = jnp.asarray(batch["t1n"])
        mesh = make_mesh(data=n, sp=1)

        # ---- synthesis: sharded == unsharded at this width --------------
        synth_ref = common.make_synthesis_fn(
            model, params, diffusion, crop_z=s
        )
        out_ref = synth_ref(cond, mask, key)
        synth_sh = common.make_synthesis_fn(
            model, params, diffusion, crop_z=s, mesh=mesh
        )
        out_sh = synth_sh(cond, mask, key)  # compile
        synth_diff = float(np.abs(out_sh - out_ref).max())
        t0 = time.perf_counter()
        out_sh = synth_sh(cond, mask, key)
        float(np.asarray(out_sh).sum())  # dependent fetch
        synth_wall = time.perf_counter() - t0

        # ---- train step: sharded == unsharded, per-device cost ----------
        kstep = jax.random.PRNGKey(5)
        state_ref = TrainState.create(params, tx)
        _, m_ref = step(state_ref, jax.tree.map(jnp.asarray, batch), kstep)
        state_sh = jax.device_put(TrainState.create(params, tx),
                                  replicated(mesh))
        sharded_batch = shard_batch(mesh, batch)
        compiled = step.lower(state_sh, sharded_batch, kstep).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
        _, m_sh = step(state_sh, sharded_batch, kstep)  # executes compiled
        loss_ref = float(jax.device_get(m_ref["loss"]))
        loss_sh = float(jax.device_get(m_sh["loss"]))
        t0 = time.perf_counter()
        state2, m2 = step(
            jax.device_put(TrainState.create(params, tx), replicated(mesh)),
            sharded_batch, kstep,
        )
        float(jax.device_get(m2["loss"]))
        step_wall = time.perf_counter() - t0

        row = {
            "data": n,
            "global_batch": n,
            "synth_max_abs_diff": synth_diff,
            "synth_wall_s": round(synth_wall, 3),
            "train_loss_unsharded": loss_ref,
            "train_loss_sharded": loss_sh,
            "train_step_wall_s": round(step_wall, 3),
            # per-DEVICE program cost: constant across widths = weak scaling
            "per_device_gflops": round(cost.get("flops", 0.0) / 1e9, 3),
            "per_device_gbytes": round(
                cost.get("bytes accessed", 0.0) / 1e9, 3
            ),
        }
        ok = (
            synth_diff < 1e-5
            and abs(loss_sh - loss_ref) < 2e-5 * max(1.0, abs(loss_ref))
        )
        row["ok"] = bool(ok)
        rows.append(row)
        print(json.dumps(row))

    flops = [r["per_device_gflops"] for r in rows]
    summary = {
        "harness": "weak_scaling_cpu_mesh",
        "widths": list(WIDTHS),
        "all_ok": all(r["ok"] for r in rows),
        # per-device work ratio widest/narrowest: ~1.0 = weak-scaling-clean
        "per_device_flops_ratio_8_over_1": (
            round(flops[-1] / flops[0], 4) if flops[0] else None
        ),
    }
    print(json.dumps(summary))
    if not summary["all_ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
