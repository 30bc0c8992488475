"""Pallas DWT/IDWT kernel parity vs the XLA slice/add path.

On CPU these run in interpret mode (`pl.pallas_call(interpret=True)`); the
same kernels compile on TPU (exercised by bench.py / the sampling CLIs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.ops import wavelet as wv
from fast_cwdm_tpu.ops.wavelet_pallas import (
    dwt3_flat_pallas,
    dwt3_pallas,
    idwt3_flat_pallas,
    idwt3_pallas,
)

INTERP = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def vol():
    return jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 12, 1))


class TestForward:
    def test_matches_xla_path(self, vol):
        ours = dwt3_flat_pallas(vol, INTERP)
        ref = wv.dwt3_flat(vol)
        assert ours.shape == ref.shape == (2, 4, 8, 6, 8)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5
        )

    def test_band_major_layout(self, vol):
        bands = dwt3_pallas(vol[..., 0], INTERP)
        assert bands.shape == (2, 8, 4, 8, 6)


class TestInverse:
    def test_roundtrip_exact(self, vol):
        bands = dwt3_flat_pallas(vol, INTERP)
        back = idwt3_flat_pallas(bands, INTERP)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(vol), atol=1e-5
        )

    def test_matches_xla_inverse(self, vol):
        bands = wv.dwt3_flat(vol)
        ours = idwt3_flat_pallas(bands, INTERP)
        ref = wv.idwt3_flat(bands)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5
        )


class TestVJP:
    def test_dwt_vjp_is_idwt(self, vol):
        """Orthonormal transform: pullback of a cotangent through dwt must
        equal its idwt (`DWT_IDWT_Functions.py:138-156` semantics)."""
        x = vol[..., 0]
        _, vjp = jax.vjp(lambda v: dwt3_pallas(v, INTERP), x)
        g = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4, 8, 6))
        (pulled,) = vjp(g)
        expected = idwt3_pallas(g, INTERP)
        np.testing.assert_allclose(
            np.asarray(pulled), np.asarray(expected), atol=1e-5
        )

    def test_grad_through_roundtrip_is_identityish(self, vol):
        x = vol[..., 0]

        def f(v):
            return 0.5 * jnp.sum(idwt3_pallas(dwt3_pallas(v, INTERP), INTERP) ** 2)

        g = jax.grad(f)(x)
        # d/dx 0.5||x||² = x for an orthonormal round trip
        np.testing.assert_allclose(np.asarray(g), np.asarray(x), atol=1e-4)
