"""Downstream segmentation benchmark: the reference's full BraSyn eval
chain run end-to-end on phantom completions (VERDICT r3 #3).

Reference chain (`scripts/prepare_nnunet_dataset.py:36-122`,
`evaluate_synthesis.py:121-225`): completed dataset → nnUNet Dataset137
layout → segmentation → Dice against GT labels. The pretrained nnUNet
weights are unreachable here (air-gapped), so the segmentation step uses
the classical phantom-physics inversion (`phantom.segment_case`) — the
point is exercising the REAL pipeline (the same `cli/complete_dataset.py`
→ `cli/prepare_nnunet_dataset.py` → `calculate_dice_scores` code paths a
BraTS user runs) and measuring how much synthesis error costs downstream.

Legs:
  real  — all-real modalities through the same layout+segment+Dice path
          (the segmenter's own ceiling; synthesis plays no part)
  synth — t1c removed from every val case, re-synthesized by the trained
          model via cli/complete_dataset, then the same path

The deliverable is the (real − synth) Dice gap, plus the prediction
agreement Dice(pred_synth, pred_real): how often the downstream consumer
would make the same call on synthesized data.

Stages are resumable (each skipped when its artifact exists). Run:
  python scripts/downstream_bench.py --workdir /root/repo/.qb/downstream \
      --val_dir /root/repo/.qb/val --checkpoint_dir /root/repo/.qb/ckpt_direct_1000 \
      --sampler dpm++ --sampling_steps 25 --write_md QUALITY.md
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--val_dir", required=True,
                    help="complete phantom cases incl. -seg files")
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--contr", default="t1c")
    ap.add_argument("--sampler", default="dpm++",
                    choices=["ddpm", "ddim", "dpm++"])
    ap.add_argument("--sampling_steps", type=int, default=25)
    ap.add_argument("--label", default="",
                    help="row label; default {sampler}-{steps}")
    ap.add_argument("--with_control", action="store_true",
                    help="add the perfect-synthesis control leg: the REAL "
                    "t1c passed through the completion pipeline's "
                    "preprocess→unprocess round trip (no model) — bounds "
                    "what the chain's own normalization costs")
    ap.add_argument("--write_md", default="")
    ap.add_argument("--quick", action="store_true",
                    help="pin jax to CPU (harness smoke with a tiny model)")
    return ap.parse_args(argv)


def stage_incomplete(a) -> str:
    """val minus the target modality — the BraSyn input contract
    (`drop_modality` drops a RANDOM modality per case; here every case
    drops ``contr`` because that is the model under test)."""
    out = os.path.join(a.workdir, "incomplete")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    for case in sorted(os.listdir(a.val_dir)):
        src = os.path.join(a.val_dir, case)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(out, case)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(src):
            if f"-{a.contr}." in f or f.startswith("."):
                continue
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
    open(done, "w").close()
    print(f"[downstream] incomplete tree → {out}")
    return out


def stage_complete(a, incomplete: str) -> str:
    from fast_cwdm_tpu.cli import complete_dataset

    out = os.path.join(a.workdir, f"completed_{a.sampler}{a.sampling_steps}")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    argv = [
        f"--input_dir={incomplete}",
        f"--output_dir={out}",
        f"--checkpoint_dir={a.checkpoint_dir}",
        f"--sampler={a.sampler}",
        f"--sampling_steps={a.sampling_steps}",
    ]
    complete_dataset.main(argv)
    open(done, "w").close()
    return out


def stage_nnunet(a, input_dir: str, tag: str) -> tuple[str, str]:
    from fast_cwdm_tpu.cli import prepare_nnunet_dataset

    raw = os.path.join(a.workdir, f"nnraw_{tag}")
    ds = os.path.join(raw, "Dataset137_BraTS2023")
    done = os.path.join(ds, ".complete")
    images, labels = os.path.join(ds, "imagesTr"), os.path.join(ds, "labelsTr")
    if os.path.exists(done):
        return images, labels
    prepare_nnunet_dataset.main(
        [f"--input_dir={input_dir}", f"--nnunet_raw={raw}"]
    )
    open(done, "w").close()
    return images, labels


def stage_segment(a, images: str, tag: str) -> str:
    """The nnUNet stand-in: phantom-physics inversion over imagesTr,
    predictions in nnUNet label space (the real nnUNet would write the
    same layout — `evaluate_synthesis.py:121-154`)."""
    from fast_cwdm_tpu.cli.prepare_nnunet_dataset import (
        MODALITY_CHANNELS, remap_labels,
    )
    from fast_cwdm_tpu.data import Nifti1Image, nifti, save
    from fast_cwdm_tpu.data.phantom import segment_case

    out = os.path.join(a.workdir, f"preds_{tag}")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    cases = sorted(
        {f.rsplit("_", 1)[0] for f in os.listdir(images) if f.endswith(".nii.gz")}
    )
    for case in cases:
        vols = {
            m: np.asarray(
                nifti.load(
                    os.path.join(images, f"{case}_{ch}.nii.gz")
                ).get_fdata(),
                np.float32,
            )
            for m, ch in MODALITY_CHANNELS.items()
        }
        pred = remap_labels(segment_case(vols))
        save(
            Nifti1Image(pred.astype(np.int16), np.eye(4)),
            os.path.join(out, f"{case}.nii.gz"),
        )
        print(f"[downstream] segmented {tag}/{case}")
    open(done, "w").close()
    return out


def stage_control(a) -> str:
    """Perfect-synthesis control (VERDICT r4 Weak #5): the real t1c run
    through EXACTLY the completion pipeline's intensity path —
    `load_preprocessed` (clip/normalize/pad/crop) then `unprocess_volume`
    (un-crop to raw geometry), the same round trip `cli/complete_dataset.py`
    applies around the sampler — with NO model in the loop. Its Dice is the
    chain-calibration ceiling: the gap real−control is the cost of the
    normalization itself; synth−control isolates the model's share."""
    from fast_cwdm_tpu.data import Nifti1Image, nifti, save, unprocess_volume
    from fast_cwdm_tpu.data.brats import load_preprocessed

    out = os.path.join(a.workdir, "control")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    for case in sorted(os.listdir(a.val_dir)):
        src = os.path.join(a.val_dir, case)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(out, case)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(src):
            if f.startswith("."):
                continue
            sp = os.path.join(src, f)
            if f"-{a.contr}." in f:
                hdr = nifti.load_header(sp)
                vol = load_preprocessed(sp)  # (224,224,160,1) normalized
                full = unprocess_volume(vol, raw_shape=hdr.shape)
                save(
                    Nifti1Image(
                        full.astype(np.float32), hdr.affine, hdr.header
                    ),
                    os.path.join(dst, f),
                )
            else:
                shutil.copy2(sp, os.path.join(dst, f))
    open(done, "w").close()
    print(f"[downstream] control tree → {out}")
    return out


# raw BraTS label → region name (the generator's own labels, pre-remap)
RAW_REGIONS = {4: "et", 1: "ncr", 2: "edema"}


def region_means(a, tree: str) -> dict:
    """Per-case mean NORMALIZED t1c intensity inside each GT lesion region,
    plus healthy-brain MAE vs the real t1c — the multi-case version of the
    hand-made table that diagnosed the core-attenuation defect (QUALITY.md
    r4, single case 10000). Intensities via `load_preprocessed` (the
    training-normalized space those numbers were quoted in); regions via
    the RAW GT labels from the val tree."""
    from fast_cwdm_tpu.data.brats import load_preprocessed, load_seg

    rows = {}
    for case in sorted(os.listdir(a.val_dir)):
        vsrc = os.path.join(a.val_dir, case)
        tsrc = os.path.join(tree, case)
        if not (os.path.isdir(vsrc) and os.path.isdir(tsrc)):
            continue

        def find(d, tag):
            for f in sorted(os.listdir(d)):
                if f"-{tag}." in f:
                    return os.path.join(d, f)
            return None

        t1c_p, seg_p = find(tsrc, a.contr), find(vsrc, "seg")
        real_p = find(vsrc, a.contr)
        if not (t1c_p and seg_p and real_p):
            continue
        x = load_preprocessed(t1c_p)[..., 0]
        real = load_preprocessed(real_p)[..., 0]
        seg = load_seg(seg_p)[..., 0]
        row = {}
        for lbl, name in RAW_REGIONS.items():
            m = seg == lbl
            row[name] = float(x[m].mean()) if m.any() else None
        healthy = (real > 0) & (seg == 0)
        row["healthy_mae"] = float(np.abs(x - real)[healthy].mean())
        rows[case] = row
    means = {}
    for name in list(RAW_REGIONS.values()) + ["healthy_mae"]:
        vals = [r[name] for r in rows.values() if r.get(name) is not None]
        means[name] = float(np.mean(vals)) if vals else None
    return {"mean": means, "cases": rows}


def agreement(a, preds_a: str, preds_b: str) -> float | None:
    """Mean foreground Dice between the two legs' PREDICTIONS: would the
    downstream consumer decide the same on synthesized data?"""
    from fast_cwdm_tpu.cli.evaluate_synthesis import mean_multilabel_dice
    from fast_cwdm_tpu.data import nifti

    vals = []
    for f in sorted(os.listdir(preds_a)):
        if not f.endswith(".nii.gz"):
            continue
        other = os.path.join(preds_b, f)
        if not os.path.exists(other):
            continue
        pa = np.rint(nifti.load(os.path.join(preds_a, f)).get_fdata())
        pb = np.rint(nifti.load(other).get_fdata())
        d = mean_multilabel_dice(pa, pb)
        if not np.isnan(d):  # nan = no lesion in either → uninformative
            vals.append(d)
    return float(np.mean(vals)) if vals else None


def main(argv=None) -> None:
    a = parse_args(argv)
    if a.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from fast_cwdm_tpu.cli import common

        common.enable_compile_cache()
    os.makedirs(a.workdir, exist_ok=True)
    label = a.label or f"{a.sampler}-{a.sampling_steps}"

    incomplete = stage_incomplete(a)
    completed = stage_complete(a, incomplete)

    from fast_cwdm_tpu.cli.evaluate_synthesis import calculate_dice_scores

    report = {"label": label, "legs": {}}
    preds = {}
    legs = [("real", a.val_dir), (f"synth_{label}", completed)]
    if a.with_control:
        legs.append(("control", stage_control(a)))
    for tag, tree in legs:
        images, labels = stage_nnunet(a, tree, tag)
        preds[tag] = stage_segment(a, images, tag)
        scores = calculate_dice_scores(preds[tag], labels)
        if tag != "real":
            # multi-case region means: is the lesion's intensity structure
            # preserved where the GT says the lesion is?
            scores["region_means"] = region_means(a, tree)
        report["legs"][tag] = scores
        print(f"[downstream] {tag}: dice_mean={scores['dice_mean']} "
              f"per_label={scores['dice_per_label_mean']} (n={scores['n']})")
    report["agreement"] = agreement(
        a, preds["real"], preds[f"synth_{label}"]
    )
    # the targets the region means are judged against (x == real ⇒ GT)
    report["gt_region_means"] = region_means(a, a.val_dir)["mean"]

    path = os.path.join(a.workdir, f"downstream_{label}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    real = report["legs"]["real"]
    synth = report["legs"][f"synth_{label}"]
    md = (
        f"| downstream Dice ({label}) | real-input {real['dice_mean']:.4f} "
        f"| synth-input {synth['dice_mean']:.4f} "
        f"| Δ {real['dice_mean'] - synth['dice_mean']:+.4f} "
        f"| prediction agreement {report['agreement']:.4f} |"
    )
    print(md)
    print(f"[downstream] wrote {path}")
    if a.write_md:
        with open(a.write_md, "a") as f:
            f.write("\n" + md + "\n")


if __name__ == "__main__":
    main()
