"""Phantom benchmark-data tests: determinism, BraTS-layout compatibility,
and well-posedness of the 3→1 completion task (the quality benchmark's
foundation — a phantom whose held-out modality were NOT determined by the
inputs would put a false ceiling on every SSIM number)."""

import os

import numpy as np

from fast_cwdm_tpu.data.phantom import (
    MODALITIES,
    T1C_COMBO,
    generate_case,
    write_case,
    write_phantom_dataset,
)

SMALL = (60, 60, 40)


def test_determinism_and_invariants():
    a = generate_case(7, shape=SMALL)
    b = generate_case(7, shape=SMALL)
    for k in a:
        assert np.array_equal(a[k], b[k]), f"{k} not deterministic"
    c = generate_case(8, shape=SMALL)
    assert not np.array_equal(a["t1n"], c["t1n"])
    for m in MODALITIES:
        v = a[m]
        assert v.shape == SMALL and v.dtype == np.float32
        assert float(v.min()) >= 0.0
        assert float(v.max()) > 100.0, "raw scanner-ish intensity range"
    assert set(np.unique(a["seg"])) <= {0, 1, 2, 4}
    # background is EXACTLY zero in every modality at the same voxels
    # (sampling CLIs mask output by cond == 0, scripts/sample.py:123-125)
    bg = a["t1n"] == 0
    assert bg.any() and not bg.all()
    for m in MODALITIES:
        assert (a[m][bg] == 0).all()


def test_lesion_frequency_and_labels():
    with_lesion = 0
    for seed in range(12):
        seg = generate_case(seed, shape=SMALL)["seg"]
        if (seg > 0).any():
            with_lesion += 1
            assert {1, 2, 4} <= set(np.unique(seg)), (
                "a lesion case must carry all three BraTS raw labels"
            )
    assert with_lesion >= 6, f"only {with_lesion}/12 cases grew a lesion"
    none = generate_case(0, shape=SMALL, lesion_prob=0.0)
    assert not (none["seg"] > 0).any()


def test_t1c_well_posedness():
    """t1c must be recoverable from (t1n, t2w, t2f, core): the benchmark's
    premise. Fit the T1C_COMBO affine map on brain voxels of the raw
    volumes (per-modality gains undo the shared normalized space, so fit
    coefficients freely) and require near-perfect reconstruction."""
    case = generate_case(11, shape=SMALL)
    brain = case["t1n"] > 0
    core = (case["seg"] == 4).astype(np.float32)
    X = np.stack(
        [
            case["t1n"][brain],
            case["t2w"][brain],
            case["t2f"][brain],
            core[brain],
            np.ones(int(brain.sum()), np.float32),
        ],
        axis=1,
    ).astype(np.float64)
    y = case["t1c"][brain].astype(np.float64)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ coef
    r2 = 1.0 - float((resid**2).sum()) / float(((y - y.mean()) ** 2).sum())
    assert r2 > 0.99, f"t1c not determined by inputs (R^2={r2:.4f})"


def test_write_dataset_loader_roundtrip(tmp_path):
    from fast_cwdm_tpu.data.brats import BRATSVolumes

    root = str(tmp_path / "phantom")
    dirs = write_phantom_dataset(root, 2, start_seed=3, shape=SMALL)
    assert len(dirs) == 2 and all(os.path.isdir(d) for d in dirs)
    ds = BRATSVolumes(root, mode="train")
    assert len(ds) == 2
    item = ds[0]
    for m in MODALITIES:
        v = np.asarray(item[m])
        # loader contract: pad Z→160, crop X,Y by 8, channel-last
        assert v.shape == (SMALL[0] - 16, SMALL[1] - 16, 160, 1)
        assert 0.0 <= float(v.min()) and float(v.max()) <= 1.0


def test_write_case_missing_modality(tmp_path):
    """An incomplete case (for completion pipelines) omits the target."""
    case = str(tmp_path / "00042")
    write_case(case, 42, shape=SMALL,
               modalities=("t1n", "t2w", "t2f"), with_seg=False)
    files = sorted(os.listdir(case))
    assert len(files) == 3 and not any("t1c" in f for f in files)
    assert len(T1C_COMBO) == 5


def test_rim_texture_only_perturbs_t1c():
    """rim_texture=0 is bit-identical to the pre-option generator (the
    rim rng is an INDEPENDENT stream); rim_texture>0 changes t1c only,
    inside the lesion band, and leaves labels untouched — so a
    rim-textured dataset differs from its base dataset in exactly the
    held-out modality's posterior spread."""
    base = generate_case(9, shape=SMALL)
    zero = generate_case(9, shape=SMALL, rim_texture=0.0)
    for k in base:
        assert np.array_equal(base[k], zero[k]), f"{k} shifted at rim=0"
    rim = generate_case(9, shape=SMALL, rim_texture=0.08)
    assert base["seg"].any(), "seed 9 must carry a lesion for this test"
    for m in ("t1n", "t2w", "t2f"):
        assert np.array_equal(base[m], rim[m]), f"{m} must not change"
    np.testing.assert_array_equal(base["seg"], rim["seg"])
    diff = np.abs(rim["t1c"].astype(np.float64) - base["t1c"])
    assert diff.max() > 0
    # the texture lives in the lesion neighborhood: every changed voxel
    # is within the edema support's bounding box (band ⊂ E>0.05)
    changed = diff > 1e-6 * max(1.0, base["t1c"].max())
    lesion_bbox = np.zeros_like(changed)
    ii = np.nonzero(base["seg"] > 0)
    pad = 12
    lo = [max(0, int(x.min()) - pad) for x in ii]
    hi = [min(s, int(x.max()) + pad) for x, s in zip(ii, SMALL)]
    lesion_bbox[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
    assert changed[~lesion_bbox].sum() == 0


def test_rim_texture_case_seeded():
    """Different seeds draw different rim textures (the spread is
    per-case, not a fixed offset a model could memorize)."""
    r7 = generate_case(10, shape=SMALL, rim_texture=0.08)
    b7 = generate_case(10, shape=SMALL)
    r9 = generate_case(9, shape=SMALL, rim_texture=0.08)
    b9 = generate_case(9, shape=SMALL)
    if not (b7["seg"].any() and b9["seg"].any()):
        import pytest

        pytest.skip("both seeds need lesions")
    d7 = (r7["t1c"] - b7["t1c"])
    d9 = (r9["t1c"] - b9["t1c"])
    # normalized correlation of the two textures over their joint support
    m = (np.abs(d7) > 0) | (np.abs(d9) > 0)
    if m.sum() > 100:
        c = np.corrcoef(d7[m], d9[m])[0, 1]
        assert abs(c) < 0.5, f"rim textures too correlated: {c}"
