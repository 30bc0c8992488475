"""Downstream segmentation evaluation (parity surface for
`/root/reference/scripts/evaluate_synthesis.py`).

Pipeline: set nnUNet env vars (`evaluate_synthesis.py:68-81`), run
``nnUNetv2_predict`` as a subprocess (`:121-154`), compute per-case
multi-label Dice against ground truth and write a report (`:25-66,
190-225`). The gdown weight fetch (`:83-119`) is gated: this environment
has no egress, so weights must be pre-staged at ``$nnUNet_results``.

The Dice computation itself is self-contained (numpy) and also exposed as
:func:`dice_score` / :func:`evaluate_cases` for direct SSIM/PSNR/Dice
evaluation without nnUNet.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess

import numpy as np

BRATS_LABELS = (1, 2, 3, 4)


def dice_score(pred: np.ndarray, truth: np.ndarray, label: int) -> float:
    """(`evaluate_synthesis.py:13-24`)"""
    p = pred == label
    t = truth == label
    denom = p.sum() + t.sum()
    if denom == 0:
        return float("nan")
    return float(2.0 * np.logical_and(p, t).sum() / denom)


def mean_multilabel_dice(
    pred: np.ndarray, truth: np.ndarray, labels=BRATS_LABELS
) -> float:
    """Mean FOREGROUND Dice over labels present in either volume.

    Deliberate deviation from the reference's `dice_coef_multilabel`
    (`evaluate_synthesis.py:18-24`), which averages labels 0..3 INCLUDING
    background over a fixed /4 — the near-perfect background class inflates
    the mean by ~25% weight. Use :func:`mean_multilabel_dice_ref` when
    comparing against reference-derived baseline numbers."""
    scores = [dice_score(pred, truth, l) for l in labels]
    scores = [s for s in scores if not np.isnan(s)]
    return float(np.mean(scores)) if scores else float("nan")


def mean_multilabel_dice_ref(
    pred: np.ndarray,
    truth: np.ndarray,
    num_labels: int = 4,
    smooth: float = 1e-6,
) -> float:
    """Bit-compatible with the reference's `dice_coef_multilabel(gt, pred,
    4)` (`evaluate_synthesis.py:13-24`): labels 0..num_labels-1 INCLUDING
    background, fixed /num_labels, smoothed — for apples-to-apples
    comparison with reference-pipeline Dice numbers."""
    total = 0.0
    for label in range(num_labels):
        t = (truth == label).astype(np.float64)
        p = (pred == label).astype(np.float64)
        inter = float(np.sum(t * p))
        total += (2.0 * inter + smooth) / (
            float(np.sum(t)) + float(np.sum(p)) + smooth
        )
    return total / num_labels


# ---------------------------------------------------------------------------
# Image-quality metrics (SSIM / PSNR) — the BraSyn quality axis the
# north-star target references (BASELINE.json).
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def ssim3d(
    a: np.ndarray,
    b: np.ndarray,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
    win: int = 7,
) -> float:
    """Mean 3D SSIM, numerically matching
    ``skimage.metrics.structural_similarity`` defaults (uniform ``win``
    window, sample-covariance NP/(NP-1) correction, and the SSIM map
    averaged only over the interior — cropped by (win-1)//2 per side, so
    truncated border windows never bias the score). Implemented with numpy
    cumulative sums (scikit-image is not shipped in this environment);
    pinned against a brute-force sliding-window oracle in
    tests/test_metrics.py."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    # skimage requires an odd window; additionally win=1 would make the
    # sample-covariance factor NP/(NP-1) divide by zero, and an even win
    # would desync the (win-1)//2 interior crop from the filter footprint
    if win % 2 == 0 or win < 3:
        raise ValueError(f"win must be odd and >= 3; got {win}")
    if min(a.shape) < win:
        raise ValueError(
            f"every side must be at least win={win}; got {a.shape}"
        )

    def uniform_filter(x):
        out = x
        for ax in range(3):
            c = np.cumsum(out, axis=ax)
            pad = win // 2
            n = out.shape[ax]
            upper = np.minimum(np.arange(n) + pad + 1, n)
            lower = np.maximum(np.arange(n) - pad, 0)
            c0 = np.concatenate(
                [np.zeros_like(np.take(c, [0], axis=ax)), c], axis=ax
            )
            out = (
                np.take(c0, upper, axis=ax) - np.take(c0, lower, axis=ax)
            ) / (upper - lower).reshape(
                [-1 if i == ax else 1 for i in range(3)]
            )
        return out

    mu_a = uniform_filter(a)
    mu_b = uniform_filter(b)
    # sample (not population) moments — skimage's use_sample_covariance
    cov_norm = win**3 / (win**3 - 1.0)
    saa = cov_norm * (uniform_filter(a * a) - mu_a * mu_a)
    sbb = cov_norm * (uniform_filter(b * b) - mu_b * mu_b)
    sab = cov_norm * (uniform_filter(a * b) - mu_a * mu_b)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
    )
    pad = (win - 1) // 2  # mean over full-window positions only
    return float(ssim_map[pad:-pad, pad:-pad, pad:-pad].mean())


def evaluate_cases(sample_dir: str) -> dict:
    """Direct SSIM/PSNR over ``{case}/sample.nii.gz`` vs
    ``{case}/target.nii.gz`` pairs produced by the sample CLI."""
    from fast_cwdm_tpu.data import nifti

    rows = []
    for case in sorted(os.listdir(sample_dir)):
        d = os.path.join(sample_dir, case)
        sp = os.path.join(d, "sample.nii.gz")
        tp = os.path.join(d, "target.nii.gz")
        if not (os.path.exists(sp) and os.path.exists(tp)):
            continue
        s = nifti.load(sp).get_fdata()
        t = nifti.load(tp).get_fdata()
        rows.append(
            {
                "case": case,
                "ssim": ssim3d(s, t),
                "psnr": psnr(s, t),
                "mse": float(np.mean((s - t) ** 2)),
            }
        )
    summary = {
        "n": len(rows),
        "ssim_mean": float(np.mean([r["ssim"] for r in rows])) if rows else None,
        "psnr_mean": float(np.mean([r["psnr"] for r in rows])) if rows else None,
        "cases": rows,
    }
    return summary


# ---------------------------------------------------------------------------
# nnUNet pipeline
# ---------------------------------------------------------------------------


def setup_nnunet_environment(base: str) -> dict:
    """(`evaluate_synthesis.py:68-81`)"""
    env = {
        "nnUNet_raw": os.path.join(base, "nnUNet_raw"),
        "nnUNet_preprocessed": os.path.join(base, "nnUNet_preprocessed"),
        "nnUNet_results": os.path.join(base, "nnUNet_results"),
    }
    for k, v in env.items():
        os.makedirs(v, exist_ok=True)
        os.environ[k] = v
    return env


def run_nnunet_prediction(
    input_dir: str, output_dir: str, dataset_id: int = 137, fold: int = 5
) -> bool:
    """(`evaluate_synthesis.py:121-154`); returns False if nnUNet absent."""
    if shutil.which("nnUNetv2_predict") is None:
        print("[eval] nnUNetv2_predict not on PATH — skipping segmentation")
        return False
    cmd = [
        "nnUNetv2_predict",
        "-i", input_dir,
        "-o", output_dir,
        "-d", str(dataset_id),
        "-c", "3d_fullres",
        "-f", str(fold),
    ]
    print("[eval] running:", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return True


# nnUNet Dataset137 label names after `prepare_nnunet_dataset.remap_labels`
# (BraTS 2=ED→1, 1=NCR→2, 4=ET→3)
NNUNET_LABEL_NAMES = {1: "edema", 2: "ncr", 3: "et"}


def calculate_dice_scores(pred_dir: str, gt_dir: str) -> dict:
    """(`evaluate_synthesis.py:190-218`) — plus a PER-LABEL breakdown
    (edema/NCR/ET in nnUNet label space), matching the reference's
    per-case multi-label reporting (`:202-218`): a single mean Dice hides
    which structure failed (the enhancing core is 0.06% of voxels and
    carries the whole BraSyn signal — QUALITY.md downstream section)."""
    from fast_cwdm_tpu.data import nifti

    rows = []
    for f in sorted(os.listdir(pred_dir)):
        if not f.endswith(".nii.gz"):
            continue
        gt_path = os.path.join(gt_dir, f)
        if not os.path.exists(gt_path):
            continue
        pred = np.rint(nifti.load(os.path.join(pred_dir, f)).get_fdata())
        gt = np.rint(nifti.load(gt_path).get_fdata())
        rows.append(
            {
                "case": f,
                "dice": mean_multilabel_dice(pred, gt),
                # reference-formulation score (incl. background, /4,
                # smoothed) for comparison against reference baselines
                "dice_ref": mean_multilabel_dice_ref(pred, gt),
                "dice_per_label": {
                    name: dice_score(pred, gt, lbl)
                    for lbl, name in NNUNET_LABEL_NAMES.items()
                },
            }
        )
    mean = float(np.mean([r["dice"] for r in rows])) if rows else None
    mean_ref = (
        float(np.mean([r["dice_ref"] for r in rows])) if rows else None
    )
    per_label = {}
    for lbl, name in NNUNET_LABEL_NAMES.items():
        vals = [
            r["dice_per_label"][name]
            for r in rows
            if not np.isnan(r["dice_per_label"][name])
        ]
        per_label[name] = float(np.mean(vals)) if vals else None
    return {
        "n": len(rows),
        "dice_mean": mean,
        "dice_mean_ref": mean_ref,
        "dice_per_label_mean": per_label,
        "cases": rows,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description=(
            "Synthesis evaluation. --mode=direct scores sample/target "
            "pairs (SSIM/PSNR/MSE) with no external dependencies. "
            "--mode=nnunet reproduces the reference's downstream "
            "segmentation Dice (`evaluate_synthesis.py:121-225`) and needs "
            "(a) nnUNetv2_predict on PATH and (b) the pretrained BraTS "
            "Dataset137 weights PRE-STAGED under "
            "<work_dir>/nnUNet_results/Dataset137_BraTS2021/ — the "
            "reference auto-fetches them with gdown "
            "(`evaluate_synthesis.py:83-119`); this build has no network "
            "egress, so copy them in beforehand."
        )
    )
    p.add_argument("--mode", choices=["direct", "nnunet"], default="direct")
    p.add_argument("--sample_dir", default="",
                   help="direct mode: dir of {case}/sample+target pairs")
    p.add_argument("--completed_dir", default="",
                   help="nnunet mode: nnUNet imagesTr input")
    p.add_argument("--gt_dir", default="")
    p.add_argument("--work_dir", default="./nnunet_work",
                   help="nnunet mode: root holding nnUNet_raw/preprocessed/"
                        "results; pre-stage Dataset137 weights under "
                        "nnUNet_results (no auto-download here)")
    p.add_argument("--report", default="evaluation_report.json")
    args = p.parse_args(argv)

    if args.mode == "direct":
        if not args.sample_dir:
            p.error("--sample_dir is required for --mode=direct")
        report = evaluate_cases(args.sample_dir)
    else:
        env = setup_nnunet_environment(args.work_dir)
        weights = os.path.join(
            env["nnUNet_results"], "Dataset137_BraTS2021"
        )
        if not os.path.isdir(weights):
            print(
                f"[eval] NOTE: no pretrained weights at {weights} — "
                "pre-stage the nnUNet Dataset137 folder there (the "
                "reference downloads it via gdown; this build has no "
                "egress). nnUNetv2_predict will fail without it."
            )
        pred_dir = os.path.join(args.work_dir, "predictions")
        os.makedirs(pred_dir, exist_ok=True)
        if not args.completed_dir:
            p.error("--completed_dir is required for --mode=nnunet")
        if not args.gt_dir:
            # fail BEFORE the (hours-long) nnUNet prediction pass, not after
            # it with a silent n=0 report
            p.error("--gt_dir is required for --mode=nnunet")
        if run_nnunet_prediction(args.completed_dir, pred_dir):
            report = calculate_dice_scores(pred_dir, args.gt_dir)
        else:
            report = {"error": "nnUNetv2 unavailable"}
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "cases"}))


if __name__ == "__main__":
    main()
