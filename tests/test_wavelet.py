"""Wavelet transform parity + correctness tests.

Parity anchors vs the reference (`/root/reference/DWT_IDWT/`):
- Haar filter values & QMF signs (pywt 'haar' rec_lo/rec_hi).
- db2 analytic coefficients ((1±√3)/(4√2) family).
- exact round-trip for even sizes (reference restriction,
  `DWT_IDWT_Functions.py:7-9`).
- subband order/semantics: LLL..HHH = binary over (X, Y, Z) axes with
  high = (even - odd)/√2 (reference `get_matrix` + `DWTFunction_3D`).
- orthonormality: DWT of iid N(0,1) stays iid N(0,1); LLL of a [0,1] image
  lies in [0,3] (the LLL/3 convention's premise).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.ops import wavelet as wv

R = 1.0 / math.sqrt(2.0)


def test_haar_filter_bank():
    lo, hi = wv.filter_bank("haar")
    np.testing.assert_allclose(lo, [R, R], atol=1e-15)
    np.testing.assert_allclose(hi, [R, -R], atol=1e-15)


def test_db2_analytic():
    lo, hi = wv.filter_bank("db2")
    s3 = math.sqrt(3.0)
    expected = np.array([1 + s3, 3 + s3, 3 - s3, 1 - s3]) / (4 * math.sqrt(2))
    np.testing.assert_allclose(lo, expected, atol=1e-12)
    # QMF: g[k] = (-1)^k h[L-1-k]
    np.testing.assert_allclose(hi, [expected[3], -expected[2], expected[1], -expected[0]], atol=1e-12)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 6, 8])
def test_db_orthonormal(n):
    lo, _ = wv.filter_bank(f"db{n}")
    assert len(lo) == 2 * n
    np.testing.assert_allclose(lo.sum(), math.sqrt(2.0), atol=1e-10)
    for k in range(1, n):
        np.testing.assert_allclose(np.dot(lo[2 * k:], lo[: len(lo) - 2 * k]), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.dot(lo, lo), 1.0, atol=1e-10)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_db_vanishing_moments(n):
    _, hi = wv.filter_bank(f"db{n}")
    idx = np.arange(len(hi), dtype=np.float64)
    for p in range(n):
        np.testing.assert_allclose(np.dot(hi, idx**p), 0.0, atol=1e-8)


def test_dwt1_haar_values():
    x = jnp.asarray([1.0, 2.0, 3.0, 5.0]).reshape(4, 1)
    lo, hi = wv.dwt1(x)
    np.testing.assert_allclose(np.asarray(lo)[:, 0], [3 * R, 8 * R], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hi)[:, 0], [-1 * R, -2 * R], atol=1e-6)
    np.testing.assert_allclose(np.asarray(wv.idwt1(lo, hi)), np.asarray(x), atol=1e-6)


def test_dwt3_roundtrip_haar():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16, 3)), dtype=jnp.float32)
    bands = wv.dwt3(x, "haar")
    assert bands.shape == (2, 4, 6, 8, 8, 3)
    rec = wv.idwt3(bands, "haar")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("wavelet", ["db2", "db4"])
def test_dwt3_roundtrip_generic_interior(wavelet):
    """Zero-boundary truncation (reference semantics) reconstructs exactly in
    the interior; only a border of ~filter_length voxels deviates
    (`DWT_IDWT_Functions.py:7-9`)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), dtype=jnp.float32)
    bands = wv.dwt3(x, wavelet)
    assert bands.shape == (1, 16, 16, 16, 8, 2)
    rec = np.asarray(wv.idwt3(bands, wavelet))
    m = len(wv.filter_bank(wavelet)[0])
    inner = np.s_[:, m:-m, m:-m, m:-m, :]
    assert rec[inner].size > 0
    np.testing.assert_allclose(rec[inner], np.asarray(x)[inner], atol=1e-4)


def test_dwt2_roundtrip_and_tiny():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 24, 24, 3)), dtype=jnp.float32)
    bands = wv.dwt2(x)
    assert bands.shape == (3, 12, 12, 4, 3)
    np.testing.assert_allclose(np.asarray(wv.idwt2(bands)), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(wv.dwt2_tiny(x)), np.asarray(bands[..., 0, :]), atol=1e-6
    )


def test_dwt3_band_semantics():
    """Band k = 4*highX + 2*highY + highZ; high = (even-odd)/sqrt(2)."""
    x = np.zeros((1, 2, 2, 2, 1), dtype=np.float32)
    x[0, 0, 0, 0, 0] = 1.0  # single impulse at the even corner
    bands = np.asarray(wv.dwt3(jnp.asarray(x)))[0, 0, 0, 0, :, 0]
    # every band sees +(1/sqrt2)^3 from the even corner
    np.testing.assert_allclose(bands, np.full(8, R**3), atol=1e-6)

    x = np.zeros((1, 2, 2, 2, 1), dtype=np.float32)
    x[0, 1, 0, 0, 0] = 1.0  # odd along X only -> minus sign iff X is high
    bands = np.asarray(wv.dwt3(jnp.asarray(x)))[0, 0, 0, 0, :, 0]
    expected = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * R**3
    np.testing.assert_allclose(bands, expected, atol=1e-6)

    x = np.zeros((1, 2, 2, 2, 1), dtype=np.float32)
    x[0, 0, 0, 1, 0] = 1.0  # odd along Z only -> minus iff Z high (odd bands)
    bands = np.asarray(wv.dwt3(jnp.asarray(x)))[0, 0, 0, 0, :, 0]
    expected = np.array([1, -1, 1, -1, 1, -1, 1, -1]) * R**3
    np.testing.assert_allclose(bands, expected, atol=1e-6)


def test_dwt3_gaussian_stays_gaussian():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), dtype=jnp.float32)
    bands = np.asarray(wv.dwt3(x))
    assert abs(bands.std() - 1.0) < 0.02
    assert abs(bands.mean()) < 0.02


def test_lll_range_and_scaling():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 16, 1)), dtype=jnp.float32)
    flat = wv.dwt3_flat(x)
    lll = np.asarray(flat[..., 0])
    assert lll.min() >= 0.0 and lll.max() <= wv.LLL_SCALE + 1e-5
    norm = wv.dwt_normalized(x)
    np.testing.assert_allclose(np.asarray(norm[..., 0]), lll / 3.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(norm[..., 1:]), np.asarray(flat[..., 1:]), atol=1e-6)
    rec = wv.idwt_normalized(norm)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_dwt3_flat_band_major():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 2)), dtype=jnp.float32)
    flat = wv.dwt3_flat(x)
    bands = wv.dwt3(x)
    assert flat.shape == (1, 2, 2, 2, 16)
    np.testing.assert_allclose(
        np.asarray(flat[..., 3 * 2 + 1]), np.asarray(bands[..., 3, 1]), atol=0
    )
    rec = wv.idwt3_flat(flat, channels=2)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_dwt3_jit_and_grad():
    """The transform is linear; AD transposes it exactly (the reference hand-
    writes this backward, `DWT_IDWT_Functions.py:138-156`)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 1)), dtype=jnp.float32)

    f = jax.jit(lambda v: wv.dwt3_flat(v).sum())
    g = jax.grad(f)(x)
    # gradient of sum over orthonormal analysis = synthesis of all-ones bands
    ones = jnp.ones((1, 2, 2, 2, 8))
    expected = wv.idwt3_flat(ones)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), atol=1e-5)


def test_odd_size_rejected():
    x = jnp.zeros((1, 3, 4, 4, 1))
    with pytest.raises(ValueError):
        wv.dwt3(x)


def test_odd_size_rejected_generic_wavelet():
    """The even-size requirement holds for every even-length filter bank —
    the generic dbN path must fail with the same clear error, not a ragged
    einsum/stack shape mismatch downstream."""
    with pytest.raises(ValueError, match="odd size"):
        wv.dwt1(jnp.zeros((1, 7, 1)), "db2")  # L axis is -2
    with pytest.raises(ValueError, match="odd size"):
        wv.dwt3(jnp.zeros((1, 4, 5, 4, 1)), "db2")


def test_explicit_pallas_impl_rejects_multichannel():
    """The Pallas kernels are single-channel; an explicit impl='pallas'
    with C>1 must raise (not silently drop channels or silently fall back
    — dwt and idwt previously disagreed on which)."""
    with pytest.raises(ValueError, match="single-channel"):
        wv.dwt3_flat(jnp.zeros((1, 4, 4, 4, 4)), impl="pallas")
    with pytest.raises(ValueError, match="single-channel"):
        wv.idwt3_flat(jnp.zeros((1, 2, 2, 2, 32)), channels=4, impl="pallas")


class TestHaarClampProject:
    """Fused block-local x0 projection vs the explicit IDWT→clamp→DWT
    round trip (`gaussian_diffusion.py:335-354` semantics)."""

    def test_matches_full_roundtrip(self):
        import jax
        import jax.numpy as jnp

        from fast_cwdm_tpu.ops import wavelet as wv

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6, 4, 8))
        fused = wv.haar_clamp_project(x)
        img = wv.idwt_normalized(x, channels=1)
        ref = wv.dwt_normalized(jnp.clip(img, 0.0, 1.0))
        assert fused.shape == x.shape
        import numpy as np

        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), atol=1e-5
        )

    def test_identity_inside_range(self):
        """Subbands of an in-range image are a fixed point."""
        import jax
        import numpy as np

        from fast_cwdm_tpu.ops import wavelet as wv

        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 8, 1))
        bands = wv.dwt_normalized(img)
        out = wv.haar_clamp_project(bands)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(bands), atol=1e-5
        )

    def test_mixing_matrix_orthonormal(self):
        import numpy as np

        from fast_cwdm_tpu.ops.wavelet import _haar_mixing_matrix

        m = _haar_mixing_matrix()
        np.testing.assert_allclose(m @ m.T, np.eye(8), atol=1e-12)
