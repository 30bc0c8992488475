"""Probe: can the ARCHITECTURE learn the sharp inverse at all, or does
the diffusion OBJECTIVE dilute it? (round-5 follow-up to the "binding
constraint" conclusion, QUALITY.md "The binding constraint, named and
bounded".)

Round 5 established that at the production budget the diffusion-trained
denoiser never synthesizes the core-localized enhancement contrast the
downstream segmenter keys on (ET−edema ≤ ~0.03 vs GT ~0.11), across
sampler, schedule, aux-loss dose and 2.4× step budget. Two readings
remain:

  (a) OBJECTIVE: the x0-MSE-at-every-t training signal dilutes the
      cond→core gradient (each step most of the core is already visible
      in x_t, so the denoiser learns to copy, not infer — the exposure-
      bias mechanism PROBE_core_inference_r05 measured), and the
      architecture could fit the inverse if asked directly;
  (b) ARCHITECTURE/BUDGET: the 64-channel UNet at 5000 steps cannot
      express/reach the sharp nonlinear inverse C = f(E) at the core's
      spatial scale regardless of objective.

This probe separates them with the cheapest possible decisive
experiment: train the IDENTICAL production UNet (same factory config,
same param count; the x_t input slot is fed zeros, t = 0) as a PURE
REGRESSOR cond → x0 wavelet coefficients — the deterministic limit of
x0-prediction, total gradient signal per step, no noising — then run the
exact downstream chain (`scripts/downstream_bench.py` stages:
prepare_nnunet → segment → per-label Dice + region means) on its val
completions.

  Regression Dice in the control band (≥ ~0.67)  → reading (a): the
      constraint is the diffusion objective; a distillation/consistency
      or regression-initialised training is the indicated fix.
  Regression Dice floored with flat core          → reading (b): the
      constraint is model class/budget; no training-signal engineering
      at this scale will close it.

On the near-deterministic phantom task the regression target equals the
posterior mean ≈ the truth, so this comparison is apples-to-apples with
the diffusion model's x0-prediction (the quantity every sampler
integrates — DDPM/DDIM/DPM++ all step on `pred_xstart`).

Run (chip; ~60-90 min for 5000 steps + minutes of eval):
  python scripts/probe_regression.py --workdir .qb40/regression \
      --data_dir .qb40/train --val_dir .qb40/val \
      --out PROBE_regression_r05.json
CPU harness smoke (tiny model + tiny phantoms, minutes):
  python scripts/probe_regression.py --quick --workdir /tmp/prq \
      --out /tmp/prq/report.json

Reference contracts exercised: training budget `train_util.py:177-313`
(same step count/lr/batch as run.sh:138-147), eval tail
`scripts/evaluate_synthesis.py:121-225`.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import sys
import time
from types import SimpleNamespace

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--data_dir", default="",
                    help="train tree (generated when --quick and absent)")
    ap.add_argument("--val_dir", default="",
                    help="val tree (generated when --quick and absent)")
    ap.add_argument("--contr", default="t1c")
    ap.add_argument("--train_steps", type=int, default=5000)
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="regression default 1e-4: the probe asks CAN the "
                    "architecture fit f, so the optimizer gets favorable "
                    "settings; --lr 1e-5 reproduces the production value")
    ap.add_argument("--weight_decay", type=float, default=0.0)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--lesion_weight", type=float, default=0.0)
    ap.add_argument("--lesion_core_weight", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_interval", type=int, default=100)
    ap.add_argument("--save_interval", type=int, default=1000)
    ap.add_argument("--resume", default="",
                    help="checkpoint written by a previous (preempted) run")
    ap.add_argument("--out", default="PROBE_regression_r05.json")
    ap.add_argument("--quick", action="store_true",
                    help="tiny model + tiny phantoms on CPU: validates the "
                    "harness end-to-end; numbers are NOT evidence")
    ap.add_argument("--stages", default="train,eval")
    return ap.parse_args(argv)


def model_config(a) -> dict:
    from fast_cwdm_tpu.cli.common import production_config

    if a.quick:
        return dict(
            num_channels=16, num_res_blocks=1, channel_mult="1,2",
            attention_resolutions="", num_groups=8,
            bottleneck_attention=False, image_size=8, in_channels=32,
            out_channels=8, dims=3, resample_2d=False, mode="i2i",
            predict_xstart=True, dtype="float32",
            sample_schedule="direct", diffusion_steps=1000,
        )
    # the production model, production memory discipline (full remat so
    # the pinned dataset fits HBM — cli/train --remat_max_ds=0)
    return production_config(
        sample_schedule="direct", diffusion_steps=1000,
        use_checkpoint=True, remat_max_ds=0,
    )


def _find(case_dir: str, tag: str) -> str | None:
    for f in sorted(os.listdir(case_dir)):
        if f"-{tag}." in f and not f.startswith("."):
            return os.path.join(case_dir, f)
    return None


def _load_tree(a, root: str, with_seg: bool):
    """Stack every case's 4 preprocessed modalities (+seg) and pin them on
    device: imgs ``(N,X,Y,Z,4)`` in bfloat16 (halves HBM vs f32; the
    quantization RMS is orders below the measured loss floor), segs
    ``(N,X,Y,Z)`` uint8 — the same pin-once/zero-H2D discipline as
    ``--device_cache`` training (PERF.md round 3)."""
    import jax.numpy as jnp

    from fast_cwdm_tpu.data.brats import MODALITIES, load_preprocessed, load_seg

    cases = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    imgs, segs = [], []
    for c in cases:
        cdir = os.path.join(root, c)
        vols = [load_preprocessed(_find(cdir, m))[..., 0] for m in MODALITIES]
        imgs.append(np.stack(vols, axis=-1))
        if with_seg:
            segs.append(load_seg(_find(cdir, "seg"))[..., 0])
    imgs = jnp.asarray(np.stack(imgs), jnp.bfloat16)
    segs = (
        jnp.asarray(np.stack(segs), jnp.uint8)
        if with_seg
        else jnp.zeros((len(cases),) + imgs.shape[1:4], jnp.uint8)
    )
    print(f"[regression] {len(cases)} cases from {root}: imgs {imgs.shape}")
    return cases, imgs, segs


def stage_train(a, cfg: dict, model) -> str:
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.cli.common import init_params
    from fast_cwdm_tpu.data.brats import MODALITIES
    from fast_cwdm_tpu.diffusion.gaussian import condition_order
    from fast_cwdm_tpu.ops import wavelet as wv
    from fast_cwdm_tpu.training import checkpoints as ckpt
    from fast_cwdm_tpu.training.state import TrainState
    from fast_cwdm_tpu.training.train import make_optimizer

    ckpt_path = os.path.join(a.workdir, "regression.ckpt")
    done = os.path.join(a.workdir, ".train_done")
    if os.path.exists(done):
        print("[regression] train: complete (marker), skipping")
        return ckpt_path

    lesion_on = bool(a.lesion_weight) or bool(a.lesion_core_weight)
    _, imgs, segs = _load_tree(a, a.data_dir, with_seg=lesion_on)
    n_cases = imgs.shape[0]
    ti = MODALITIES.index(a.contr)
    ci = [MODALITIES.index(m) for m in condition_order(a.contr)]
    compute_dtype = (
        jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
    )

    tx = make_optimizer(
        a.lr, weight_decay=a.weight_decay, lr_anneal_steps=a.train_steps
    )
    params = init_params(model)
    state = TrainState.create(params, tx)
    start_step = 0
    resume = a.resume or (ckpt_path if os.path.exists(ckpt_path) else "")
    if resume:
        blob = ckpt.load_checkpoint(
            resume, {"params": params, "step": np.zeros((), np.int32)}
        )
        state = state.replace(
            params=blob["params"],
            step=jnp.asarray(blob["step"]),
        )
        start_step = int(blob["step"])
        print(f"[regression] resumed {resume} at step {start_step}")

    def loss_fn(params, vols, seg, key_drop):
        target = vols[..., ti : ti + 1].astype(jnp.float32)
        cond = jnp.concatenate(
            [
                wv.dwt_normalized(vols[..., c : c + 1].astype(jnp.float32))
                for c in ci
            ],
            axis=-1,
        )
        x0_wav = wv.dwt_normalized(target)
        # the x_t slot of the production input layout, fed zeros: the
        # deterministic limit of x0-prediction (identical architecture +
        # param count to every diffusion run this probe is compared to)
        x = jnp.concatenate([jnp.zeros_like(x0_wav), cond], axis=-1)
        t0 = jnp.zeros((x.shape[0],), jnp.int32)
        out = model.apply(
            {"params": params},
            x.astype(compute_dtype),
            t0,
            train=True,
            rngs={"dropout": key_drop},
        ).astype(jnp.float32)
        sq = (x0_wav - out) ** 2
        mse_wav = sq.mean(axis=tuple(range(1, sq.ndim - 1))).mean(axis=0)
        loss = mse_wav.mean()
        terms = {"mse_wav_mean": mse_wav.mean()}
        if lesion_on:
            out_img = wv.idwt_normalized(out, channels=1)
            diff2 = (out_img - target) ** 2
            axes = tuple(range(1, diff2.ndim))

            def masked_aux(mask):
                s = (diff2 * mask).sum(axes)
                c = mask.sum(axes)
                return (s / jnp.maximum(c, 1.0)).mean()

            if a.lesion_weight:
                aux = masked_aux((seg > 0).astype(jnp.float32)[..., None])
                loss = loss + a.lesion_weight * aux
                terms["mse_lesion"] = aux
            if a.lesion_core_weight:
                aux_c = masked_aux((seg == 4).astype(jnp.float32)[..., None])
                loss = loss + a.lesion_core_weight * aux_c
                terms["mse_lesion_core"] = aux_c
        return loss, terms

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, imgs, segs, key):
        key_i, key_drop = jax.random.split(key)
        idx = jax.random.randint(key_i, (a.batch_size,), 0, n_cases)
        vols = jnp.take(imgs, idx, axis=0)
        seg = jnp.take(segs, idx, axis=0)
        (loss, terms), grads = grad_fn(state.params, vols, seg, key_drop)
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = jax.tree.map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=opt_state
        )
        terms["loss"] = loss
        return new_state, terms

    stop = {"sig": 0}

    def _onterm(signum, frame):
        stop["sig"] = signum

    signal.signal(signal.SIGTERM, _onterm)

    key = jax.random.PRNGKey(a.seed)
    key = jax.random.fold_in(key, start_step)
    t0 = time.perf_counter()
    for i in range(start_step, a.train_steps):
        key, sub = jax.random.split(key)
        state, terms = step(state, imgs, segs, sub)
        if (i + 1) % a.log_interval == 0 or i == start_step:
            vals = {k: float(v) for k, v in terms.items()}
            dt = (time.perf_counter() - t0) / max(i + 1 - start_step, 1)
            print(
                f"[regression] step {i + 1}/{a.train_steps} "
                + " ".join(f"{k}={v:.3e}" for k, v in vals.items())
                + f" ({dt:.2f}s/step)",
                flush=True,
            )
        if (i + 1) % a.save_interval == 0 or stop["sig"]:
            ckpt.save_checkpoint(
                ckpt_path,
                {"params": state.params, "step": state.step},
                config=dict(cfg),
            )
            if stop["sig"]:
                print(f"[regression] SIGTERM at step {i + 1}; checkpointed")
                sys.exit(143)
    ckpt.save_checkpoint(
        ckpt_path,
        {"params": state.params, "step": state.step},
        config=dict(cfg),
    )
    final = {k: float(v) for k, v in terms.items()}
    with open(os.path.join(a.workdir, "train_final.json"), "w") as f:
        json.dump({"steps": a.train_steps, "final": final}, f, indent=2)
    open(done, "w").close()
    print(f"[regression] train done: {final}")
    return ckpt_path


def stage_complete(a, cfg: dict, model, ckpt_path: str) -> str:
    """Write the regression completions as a completed-val tree in raw
    geometry (mirrors `downstream_bench.stage_control`'s writer)."""
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.cli.common import init_params
    from fast_cwdm_tpu.data import Nifti1Image, nifti, save
    from fast_cwdm_tpu.data.brats import (
        MODALITIES, load_preprocessed, unprocess_volume,
    )
    from fast_cwdm_tpu.diffusion.gaussian import condition_order
    from fast_cwdm_tpu.ops import wavelet as wv
    from fast_cwdm_tpu.training import checkpoints as ckpt

    out = os.path.join(a.workdir, "completed_regression")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    params = init_params(model)
    blob = ckpt.load_checkpoint(
        ckpt_path, {"params": params, "step": np.zeros((), np.int32)}
    )
    params = blob["params"]
    compute_dtype = (
        jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
    )

    @jax.jit
    def predict(params, cond):
        zeros = jnp.zeros(cond.shape[:-1] + (model.out_channels,), cond.dtype)
        x = jnp.concatenate([zeros, cond], axis=-1)
        t0 = jnp.zeros((x.shape[0],), jnp.int32)
        outw = model.apply(
            {"params": params}, x.astype(compute_dtype), t0, train=False
        ).astype(jnp.float32)
        img = wv.idwt_normalized(outw, channels=1)
        return jnp.clip(img, 0.0, 1.0)

    for case in sorted(os.listdir(a.val_dir)):
        src = os.path.join(a.val_dir, case)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(out, case)
        os.makedirs(dst, exist_ok=True)
        cond = jnp.concatenate(
            [
                wv.dwt_normalized(
                    jnp.asarray(load_preprocessed(_find(src, m))[None])
                )
                for m in condition_order(a.contr)
            ],
            axis=-1,
        )
        img = np.asarray(predict(params, cond))[0]
        for f in os.listdir(src):
            if f.startswith("."):
                continue
            sp = os.path.join(src, f)
            if f"-{a.contr}." in f:
                hdr = nifti.load_header(sp)
                full = unprocess_volume(img, raw_shape=hdr.shape)
                save(
                    Nifti1Image(
                        full.astype(np.float32), hdr.affine, hdr.header
                    ),
                    os.path.join(dst, f),
                )
            else:
                shutil.copy2(sp, os.path.join(dst, f))
        print(f"[regression] completed {case}")
    open(done, "w").close()
    return out


def stage_eval(a, completed: str) -> dict:
    import downstream_bench as ds

    from fast_cwdm_tpu.cli.evaluate_synthesis import calculate_dice_scores

    ns = SimpleNamespace(workdir=a.workdir, val_dir=a.val_dir, contr=a.contr)
    report = {"label": "regression", "legs": {}}
    preds = {}
    for tag, tree in (("real", a.val_dir), ("regression", completed)):
        images, labels = ds.stage_nnunet(ns, tree, tag)
        preds[tag] = ds.stage_segment(ns, images, tag)
        scores = calculate_dice_scores(preds[tag], labels)
        if tag != "real":
            scores["region_means"] = ds.region_means(ns, tree)
        report["legs"][tag] = scores
        print(
            f"[regression] {tag}: dice_mean={scores['dice_mean']} "
            f"per_label={scores['dice_per_label_mean']} (n={scores['n']})"
        )
    report["agreement"] = ds.agreement(ns, preds["real"], preds["regression"])
    report["gt_region_means"] = ds.region_means(ns, a.val_dir)["mean"]
    tf = os.path.join(a.workdir, "train_final.json")
    if os.path.exists(tf):
        report["train"] = json.load(open(tf))
    report["config"] = {
        "train_steps": a.train_steps, "lr": a.lr,
        "batch_size": a.batch_size, "lesion_weight": a.lesion_weight,
        "lesion_core_weight": a.lesion_core_weight, "seed": a.seed,
    }
    return report


def main(argv=None) -> None:
    a = parse_args(argv)
    os.makedirs(a.workdir, exist_ok=True)
    import jax

    if a.quick:
        jax.config.update("jax_platforms", "cpu")
        from fast_cwdm_tpu.data.phantom import write_phantom_dataset

        a.data_dir = a.data_dir or os.path.join(a.workdir, "train")
        a.val_dir = a.val_dir or os.path.join(a.workdir, "val")
        for d, n, seed0 in ((a.data_dir, 3, 0), (a.val_dir, 2, 10_000)):
            if not os.path.isdir(d):
                write_phantom_dataset(d, n, start_seed=seed0, shape=(40, 40, 26))
        a.train_steps = min(a.train_steps, 30)
        a.save_interval = min(a.save_interval, 20)
        a.log_interval = 10
    else:
        from fast_cwdm_tpu.cli import common

        common.enable_compile_cache()
    if not (a.data_dir and a.val_dir):
        raise SystemExit("--data_dir and --val_dir are required")

    from fast_cwdm_tpu.cli.common import build_model_and_diffusion

    cfg = model_config(a)
    model, _ = build_model_and_diffusion(cfg)

    stages = a.stages.split(",")
    ckpt_path = os.path.join(a.workdir, "regression.ckpt")
    if "train" in stages:
        ckpt_path = stage_train(a, cfg, model)
    if "eval" in stages:
        completed = stage_complete(a, cfg, model, ckpt_path)
        report = stage_eval(a, completed)
        with open(a.out, "w") as f:
            json.dump(report, f, indent=2)
        real = report["legs"]["real"]["dice_mean"]
        reg = report["legs"]["regression"]["dice_mean"]
        print(
            f"| regression probe | real-input {real:.4f} | "
            f"regression {reg:.4f} | Δ {real - reg:+.4f} |"
        )
        print(f"[regression] wrote {a.out}")


if __name__ == "__main__":
    main()
