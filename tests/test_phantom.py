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
