"""Native C++ data-path tests (fastnifti): decode + fused clip/normalize
parity vs the pure-Python reader. Skipped when g++/zlib are unavailable."""

import os

import numpy as np
import pytest

from fast_cwdm_tpu.data import Nifti1Image, native, save
from fast_cwdm_tpu.data.brats import clip_and_normalize, load_preprocessed

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native fastnifti unavailable"
)


@pytest.fixture(scope="module")
def volume_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("nifti")
    rng = np.random.default_rng(0)
    vol = (rng.random((24, 24, 15)) * 1000).astype(np.float32)
    aff = np.array(
        [[-1, 0, 0, 12], [0, 1, 0, -12], [0, 0, 1.2, -7], [0, 0, 0, 1.0]]
    )
    p = str(d / "BraTS-GLI-00000-000-t1n.nii.gz")
    save(Nifti1Image(vol, aff), p)
    return p, vol, aff


def test_decode_exact(volume_file):
    p, vol, aff = volume_file
    nvol, naff = native.load_volume(p)
    np.testing.assert_array_equal(nvol, vol)
    np.testing.assert_allclose(naff, aff, atol=1e-5)


def test_clip_normalize_matches_numpy(volume_file):
    _, vol, _ = volume_file
    ref = clip_and_normalize(vol.astype(np.float64))
    out = vol.copy(order="F")
    assert native.clip_and_normalize_inplace(out) is not None
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_int16_decode(tmp_path):
    data = np.arange(-100, 116, dtype=np.int16).reshape(6, 6, 6)
    p = str(tmp_path / "i.nii.gz")
    save(Nifti1Image(data, np.eye(4)), p)
    nvol, _ = native.load_volume(p)
    np.testing.assert_array_equal(nvol, data.astype(np.float32))


def test_nan_scl_slope_means_no_scaling(tmp_path):
    """NIfTI-1: scl_slope of NaN (written by many tools instead of 0)
    means "no scaling" — nibabel semantics. Regression: the native
    convert() once NaN'd every voxel, which then silently zeroed the
    volume in clip_normalize."""
    from fast_cwdm_tpu.data import load

    data = np.arange(216, dtype=np.float32).reshape(6, 6, 6)
    p = str(tmp_path / "nanslope.nii")
    save(Nifti1Image(data, np.eye(4)), p)
    with open(p, "r+b") as f:  # patch scl_slope/scl_inter (offset 112/116)
        f.seek(112)
        f.write(np.array([np.nan, np.nan], dtype="<f4").tobytes())
    nvol, _ = native.load_volume(p)
    np.testing.assert_array_equal(nvol, data)
    np.testing.assert_array_equal(
        load(p).get_fdata().astype(np.float32), data
    )


def test_nan_scl_inter_ignored(tmp_path):
    """A valid slope with NaN inter scales without the offset, both paths."""
    from fast_cwdm_tpu.data import load

    data = np.arange(216, dtype=np.float32).reshape(6, 6, 6)
    p = str(tmp_path / "naninter.nii")
    save(Nifti1Image(data, np.eye(4)), p)
    with open(p, "r+b") as f:
        f.seek(112)
        f.write(np.array([2.0, np.nan], dtype="<f4").tobytes())
    nvol, _ = native.load_volume(p)
    np.testing.assert_array_equal(nvol, data * 2.0)
    np.testing.assert_array_equal(
        load(p).get_fdata().astype(np.float32), data * 2.0
    )


def test_load_preprocessed_native_vs_python(volume_file, monkeypatch):
    p, _, _ = volume_file
    nat = load_preprocessed(p)
    monkeypatch.setenv("FAST_CWDM_NATIVE", "0")
    py = load_preprocessed(p)
    assert nat.shape == py.shape
    np.testing.assert_allclose(nat, py, atol=1e-5)
