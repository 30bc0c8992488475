"""Parity tests for the fused affine+SiLU elementwise kernel (interpret
mode on CPU, compiled on TPU — the ops/wavelet_pallas.py convention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.ops import elementwise_pallas as ep


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ep, "INTERPRET", True)


def _ref(x, a, b):
    bc = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    u = x.astype(jnp.float32) * a.reshape(bc) + b.reshape(bc)
    return (u * jax.nn.sigmoid(u)).astype(x.dtype)


@pytest.mark.parametrize("c", [64, 128, 192, 256])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_affine_silu_matches_reference(c, dtype):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (1, 8, 8, 4, c), dtype)
    a = jax.random.normal(k2, (1, c), jnp.float32)
    b = jax.random.normal(k3, (1, c), jnp.float32)
    assert ep.supported(x.shape), (c, dtype)
    out = ep.affine_silu(x, a, b)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(_ref(x, a, b), np.float32),
        atol=1e-2 if dtype == jnp.bfloat16 else 1e-5,
    )


def test_affine_silu_lane_period_alignment():
    """C=192 needs the 3-row lane period — a channel-misaligned pattern
    would show up as a large error on a channel-ramp input."""
    c = 192
    x = jnp.ones((1, 4, 4, 4, c), jnp.float32)
    a = jnp.arange(c, dtype=jnp.float32)[None]  # distinct per channel
    b = jnp.zeros((1, c), jnp.float32)
    out = ep.affine_silu(x, a, b)
    ref = _ref(x, a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_affine_silu_batch_falls_back():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4, 64))
    a = jnp.ones((2, 64)) * 0.5
    b = jnp.zeros((2, 64))
    out = ep.affine_silu(x, a, b)  # XLA path, still correct
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(x, a, b)), atol=1e-6
    )


def test_affine_silu_grad_matches_autodiff_of_reference():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (1, 4, 4, 4, 64), jnp.float32)
    a = jax.random.normal(k2, (1, 64), jnp.float32)
    b = jax.random.normal(k3, (1, 64), jnp.float32)

    def loss_fused(x, a, b):
        return jnp.sum(jnp.sin(ep.affine_silu(x, a, b)))

    def loss_ref(x, a, b):
        return jnp.sum(jnp.sin(_ref(x, a, b)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, a, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, a, b)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-4
        )


def test_unet_fuse_gn_silu_parity():
    """UNetModel(fuse_gn_silu=True) == baseline to f32 tolerance — the
    flag only changes scheduling (one fused pass), never the math."""
    from fast_cwdm_tpu.models import UNetModel

    kw = dict(
        image_size=16, in_channels=32, model_channels=64, out_channels=8,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, num_groups=32, resblock_updown=True,
        bottleneck_attention=False, resample_2d=False,
    )
    base = UNetModel(**kw)
    fused = UNetModel(fuse_gn_silu=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8, 32))
    t = jnp.array([7], jnp.int32)
    params = base.init(jax.random.PRNGKey(1), x, t)["params"]
    y0 = base.apply({"params": params}, x, t)
    y1 = fused.apply({"params": params}, x, t)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), atol=2e-5
    )


def test_gn_apply_silu_algebra():
    """gn_apply_silu == silu((x − mean)·rstd·scale + bias)."""
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (1, 4, 4, 4, 64), jnp.float32)
    mean = jnp.full((1, 64), 0.3)
    rstd = jnp.full((1, 64), 1.7)
    scale = jnp.linspace(0.5, 1.5, 64)
    bias = jnp.linspace(-0.2, 0.2, 64)
    out = ep.gn_apply_silu(x, mean, rstd, scale, bias)
    u = (x - 0.3) * 1.7 * scale + bias
    ref = u * jax.nn.sigmoid(u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
