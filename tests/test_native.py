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


def test_load_preprocessed_native_vs_python(volume_file, monkeypatch):
    p, _, _ = volume_file
    nat = load_preprocessed(p)
    monkeypatch.setenv("FAST_CWDM_NATIVE", "0")
    py = load_preprocessed(p)
    assert nat.shape == py.shape
    np.testing.assert_allclose(nat, py, atol=1e-5)
