"""Stand-in segmenter tests: the classical inversion that plays nnUNet's
role in the downstream evaluation chain (reference
`evaluate_synthesis.py:121-154` needs unreachable pretrained weights;
VERDICT r3 #3 blesses a phantom-physics segmenter to exercise the
pipeline). The quality bar here is deliberately above what the chain
needs: ET (label 4) ≈ 0.95+, mean foreground Dice ≈ 0.7+."""

import numpy as np
import pytest

from fast_cwdm_tpu.cli.evaluate_synthesis import dice_score, mean_multilabel_dice
from fast_cwdm_tpu.data.phantom import generate_case, segment_case

SHAPE = (120, 120, 78)


@pytest.fixture(scope="module")
def case():
    return generate_case(10000, shape=SHAPE)


def test_segment_recovers_labels(case):
    pred = segment_case(case)
    gt = case["seg"]
    assert dice_score(pred, gt, 4) > 0.9, "enhancing core is exactly invertible"
    assert mean_multilabel_dice(pred, gt) > 0.6


def test_segment_scale_invariant(case):
    """The chain feeds the segmenter a SYNTHESIZED t1c in normalized [0,1]
    units next to raw-gain real modalities — per-modality scale must not
    matter (the gain regression re-estimates it per case)."""
    pred_raw = segment_case(case)
    rescaled = dict(case)
    rescaled["t1c"] = case["t1c"] / float(case["t1c"].max())
    rescaled["t2w"] = case["t2w"] * 3.7
    pred_scaled = segment_case(rescaled)
    # identical decisions up to float noise at the thresholds
    agree = float((pred_raw == pred_scaled).mean())
    assert agree > 0.999, agree


def test_segment_no_lesion_is_all_background():
    v = generate_case(3, shape=SHAPE)  # seed 3 draws no lesion
    assert not v["seg"].any()
    assert not segment_case(v).any()


def test_segment_erased_core_predicts_nothing(case):
    """A synthesis that erases the enhancement (the failure the downstream
    Dice must catch): replace t1c with the exact no-enhancement combo —
    the segmenter must not hallucinate a lesion from the other channels."""
    from fast_cwdm_tpu.data.phantom import T1C_COMBO

    a1, a2, a3, b0, _ = T1C_COMBO
    flat = dict(case)
    g = {m: np.median(case[m][case[m] > 0]) for m in ("t1n", "t2w", "t2f")}
    # combine the raw (gain-carrying) inputs back to a consistent scale
    n = {m: case[m] / g[m] * 0.5 for m in ("t1n", "t2w", "t2f")}
    flat["t1c"] = np.where(
        case["t1c"] > 0,
        a1 * n["t1n"] + a2 * n["t2w"] + a3 * n["t2f"] + b0,
        0.0,
    ).astype(np.float32)
    pred = segment_case(flat)
    assert not (pred == 4).any()


def test_segment_full_raw_shape():
    """Resolution must not break the inversion: the taper shell grows
    ~0.03·dim voxels, and a fixed 3-voxel erosion at the full 240³ BraTS
    shape left enough shell to tilt the gain regression brain-wide
    (observed mean Dice 0.004 before the adaptive default)."""
    from fast_cwdm_tpu.data.phantom import RAW_SHAPE

    case = generate_case(10000, shape=RAW_SHAPE)
    pred = segment_case(case)
    gt = case["seg"]
    assert dice_score(pred, gt, 4) > 0.9
    assert mean_multilabel_dice(pred, gt) > 0.6


class TestCalibration:
    """`scripts/segmenter_calibration.py` exactness + monotonicity
    (VERDICT r4 task 1a: the Dice-vs-degradation curve's validity rests on
    the degradation being exact)."""

    def test_alpha1_reproduces_real_t1c(self):
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "segcal",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "segmenter_calibration.py"),
        )
        segcal = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(segcal)

        real = generate_case(10000, shape=SHAPE)
        deg = segcal.degraded_case(10000, alpha=1.0, shift=(0, 0, 0),
                                   shape=SHAPE)
        np.testing.assert_array_equal(deg["t1c"], real["t1c"])
        for m in ("t1n", "t2w", "t2f", "seg"):
            np.testing.assert_array_equal(deg[m], real[m])

    def test_alpha0_removes_et_signal(self):
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "segcal2",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "segmenter_calibration.py"),
        )
        segcal = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(segcal)

        real = generate_case(10000, shape=SHAPE)
        deg = segcal.degraded_case(10000, alpha=0.0, shift=(0, 0, 0),
                                   shape=SHAPE)
        core = real["seg"] == 4
        assert core.any()
        # enhancement stripped exactly where the GT core is
        assert deg["t1c"][core].mean() < real["t1c"][core].mean() * 0.85
        # ... and untouched elsewhere
        out = (real["seg"] == 0) & (real["t1c"] > 0)
        np.testing.assert_allclose(
            deg["t1c"][out], real["t1c"][out], rtol=1e-5
        )
