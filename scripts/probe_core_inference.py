"""Probe: does the trained model INFER the core enhancement from the
condition, or only COPY it from x_t? (round-5 diagnosis, after the W=0.3
from-scratch run left synthesized ET at the no-enhancement base).

Mechanism under test (exposure bias on an inferable component): during
training the model denoises x_t = q(x0_real), which already CONTAINS the
enhancement for all but the largest t — so the lesion aux loss can fall
(it did: train mse_lesion 0.022 → <0.004) while the model merely learns
to copy the core out of x_t. At sampling time the chain starts from pure
noise; whether a core ever appears is decided by the x0-prediction at
HIGH t, where the only source of core information is the condition.

The probe measures, per timestep t, the ET/NCR/edema region means of the
model's x0-prediction (`p_mean_variance(...)["pred_xstart"]`, the exact
quantity every sampler integrates — DDPM ancestral, DDIM, and DPM++ all
step on it) under two input regimes:

  teacher — x_t = q_sample(x0_real, t): the training distribution.
            Copying suffices; region means should track GT at low t.
  blind   — x_t = pure noise scaled to the t-marginal: the sampling
            start. Any core here can ONLY come from cond.

Verdict rule: if the teacher rows recover the core at low t but the
blind high-t rows sit at the no-enhancement base, the model never
learned cond→core inference and the binding constraint is the TRAINING
SIGNAL (fix: t-weighted lesion aux); if blind high-t rows show the core
while sampled volumes don't, the integration loses it (fix: sampler).

Run (chip, ~minutes):
  python scripts/probe_core_inference.py \
      --checkpoint_dir .qb/ckpt_w03 --val_dir .qb/val \
      --out PROBE_core_inference_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RAW_REGIONS = {4: "et", 1: "ncr", 2: "edema"}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--val_dir", required=True)
    ap.add_argument("--contr", default="t1c")
    ap.add_argument("--timesteps", type=int, nargs="+",
                    default=[999, 900, 800, 600, 400, 200, 50])
    ap.add_argument("--out", default="PROBE_core_inference_r05.json")
    ap.add_argument("--quick", action="store_true")
    a = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if a.quick:
        jax.config.update("jax_platforms", "cpu")

    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.cli.common import (
        build_model_and_diffusion,
        load_params,
        production_config,
    )
    from fast_cwdm_tpu.data.brats import load_preprocessed, load_seg
    from fast_cwdm_tpu.diffusion.gaussian import condition_order
    from fast_cwdm_tpu.ops import wavelet as wv
    from fast_cwdm_tpu.training import checkpoints as ckpt

    common.enable_compile_cache()

    found = ckpt.find_best_checkpoint(a.checkpoint_dir, a.contr, "brats")
    if found is None:
        raise SystemExit(f"no BEST checkpoint in {a.checkpoint_dir}")
    path, schedule, steps = found
    stored = ckpt.load_checkpoint_config(path) or {}
    from fast_cwdm_tpu.models import model_and_diffusion_defaults

    cfg = production_config(sample_schedule=schedule, diffusion_steps=steps)
    schema = set(model_and_diffusion_defaults())
    cfg.update(
        {k: v for k, v in stored.items() if k in schema and k != "dtype"}
    )
    cfg.update(mode="i2i", sample_schedule=schedule, diffusion_steps=steps)
    model, diffusion = build_model_and_diffusion(cfg)
    params = load_params(path, model, use_ema=False)
    print(f"[probe] {os.path.basename(path)} ({schedule}, {steps} steps)")

    import functools

    @functools.partial(jax.jit, static_argnames=("blind",))
    def x0_pred(params, x0_wav, cond, noise_wav, t, *, blind: bool):
        def model_fn(x, tt, **kw):
            return model.apply({"params": params}, x, tt, **kw).astype(
                jnp.float32
            )

        if blind:
            x_t = noise_wav  # the t=T marginal is (≈) standard normal
        else:
            x_t = diffusion.q_sample(x0_wav, t, noise_wav)
        out = diffusion.p_mean_variance(
            model_fn, x_t, t, cond=cond, clip_denoised=True
        )
        img = wv.idwt_normalized(
            out["pred_xstart"], channels=1, wavelet=diffusion.wavelet
        )
        return jnp.clip(img, 0.0, 1.0)

    rows = []
    key = jax.random.PRNGKey(0)
    cases = sorted(
        d for d in os.listdir(a.val_dir)
        if os.path.isdir(os.path.join(a.val_dir, d))
    )
    for case in cases:
        cdir = os.path.join(a.val_dir, case)

        def find(tag):
            for f in sorted(os.listdir(cdir)):
                if f"-{tag}." in f:
                    return os.path.join(cdir, f)
            return None

        vols = {
            m: load_preprocessed(find(m))[None]
            for m in ("t1n", "t1c", "t2w", "t2f")
        }
        seg = load_seg(find("seg"))[..., 0]
        x0_wav = wv.dwt_normalized(jnp.asarray(vols[a.contr]))
        cond = jnp.concatenate(
            [
                wv.dwt_normalized(jnp.asarray(vols[m]))
                for m in condition_order(a.contr)
            ],
            axis=-1,
        )
        key, sub = jax.random.split(key)
        noise_img = jax.random.normal(sub, vols[a.contr].shape)
        noise_wav = wv.dwt3_flat(noise_img, diffusion.wavelet)
        real = vols[a.contr][0, ..., 0]

        for t_int in a.timesteps:
            t = jnp.full((1,), t_int, jnp.int32)
            for blind in (False, True):
                if blind and t_int != max(a.timesteps):
                    continue  # blind regime only meaningful at chain start
                img = np.asarray(
                    x0_pred(params, x0_wav, cond, noise_wav, t, blind=blind)
                )[0, ..., 0]
                row = {
                    "case": case,
                    "t": t_int,
                    "regime": "blind" if blind else "teacher",
                }
                for lbl, name in RAW_REGIONS.items():
                    m = seg == lbl
                    row[name] = float(img[m].mean()) if m.any() else None
                healthy = (real > 0) & (seg == 0)
                row["healthy_mae"] = float(
                    np.abs(img - real)[healthy].mean()
                )
                rows.append(row)
                print(
                    f"[probe] {case} t={t_int} {row['regime']}: "
                    f"et={row['et']:.4f} ncr={row['ncr']:.4f} "
                    f"edema={row['edema']:.4f} mae={row['healthy_mae']:.4f}"
                    if row["et"] is not None
                    else f"[probe] {case} t={t_int}: no lesion"
                )

    # GT anchors for the same cases
    gt = []
    for case in cases:
        cdir = os.path.join(a.val_dir, case)

        def find(tag):
            for f in sorted(os.listdir(cdir)):
                if f"-{tag}." in f:
                    return os.path.join(cdir, f)
            return None

        x = load_preprocessed(find(a.contr))[..., 0]
        seg = load_seg(find("seg"))[..., 0]
        row = {"case": case}
        for lbl, name in RAW_REGIONS.items():
            m = seg == lbl
            row[name] = float(x[m].mean()) if m.any() else None
        gt.append(row)

    with open(a.out, "w") as f:
        json.dump({"rows": rows, "gt": gt}, f, indent=2)
    print(f"[probe] wrote {a.out}")


if __name__ == "__main__":
    main()
