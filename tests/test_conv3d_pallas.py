"""Fused prologue+conv3d Pallas kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.ops.conv3d_pallas import conv3d_fused, group_stats

INTERP = jax.default_backend() != "tpu"


def _xla_conv(x, w, b):
    return (
        jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        + b
    )


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 8, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 8, 16)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    return x, w, b


@pytest.mark.parametrize("fold", [True, False])
def test_plain_conv_matches_xla(data, fold):
    x, w, b = data
    np.testing.assert_allclose(
        np.asarray(conv3d_fused(x, w, b, fold_taps=fold, interpret=INTERP)),
        np.asarray(_xla_conv(x, w, b)),
        atol=1e-5,
    )


def test_fused_gn_silu_conv_matches_chain(data):
    x, w, b = data
    g = 4
    scale = jax.random.normal(jax.random.PRNGKey(3), (8,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(4), (8,)) * 0.1
    mean, inv = group_stats(x, g)
    xn = (x - mean[:, None, None, None, :]) * inv[:, None, None, None, :]
    act = xn * scale + bias
    act = act * jax.nn.sigmoid(act)
    ref = _xla_conv(act, w, b)
    ours = conv3d_fused(
        x, w, b, gn=(mean, inv, scale, bias), interpret=INTERP
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_group_stats_match_groupnorm(data):
    x, _, _ = data
    g = 4
    mean, inv = group_stats(x, g)
    # reference: plain per-group statistics
    xf = np.asarray(x, np.float64)
    b, X, Y, Z, C = xf.shape
    xg = xf.reshape(b, -1, g, C // g)
    m = xg.mean(axis=(1, 3))
    v = xg.var(axis=(1, 3))
    m_c = np.repeat(m, C // g, axis=1)
    inv_c = 1.0 / np.sqrt(np.repeat(v, C // g, axis=1) + 1e-5)
    np.testing.assert_allclose(np.asarray(mean), m_c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(inv), inv_c, rtol=1e-4)


def test_single_x_slice():
    """X=1 volume: both neighbour taps are gated off."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 8, 8, 4))
    w = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 3, 4, 4)) * 0.1
    b = jnp.zeros((4,))
    np.testing.assert_allclose(
        np.asarray(conv3d_fused(x, w, b, interpret=INTERP)),
        np.asarray(_xla_conv(x, w, b)),
        atol=1e-5,
    )


@pytest.mark.parametrize("tx", [2, 4])
def test_blocked_plain_conv(data, tx):
    x, w, b = data
    x8 = x[:, :4]  # X=4 divisible by tx in {2,4}
    np.testing.assert_allclose(
        np.asarray(conv3d_fused(x8, w, b, block_x=tx, interpret=INTERP)),
        np.asarray(_xla_conv(x8, w, b)),
        atol=1e-5,
    )


def test_blocked_fused_gn(data):
    x, w, b = data
    x8 = x[:, :4]
    scale = jnp.ones((8,)) * 1.1
    bias = jnp.zeros((8,)) + 0.05
    mean, inv = group_stats(x8, 4)
    xn = (x8 - mean[:, None, None, None, :]) * inv[:, None, None, None, :]
    act = xn * scale + bias
    act = act * jax.nn.sigmoid(act)
    ref = _xla_conv(act, w, b)
    ours = conv3d_fused(
        x8, w, b, gn=(mean, inv, scale, bias), block_x=2, interpret=INTERP
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


class TestV4:
    """N-packed fused ResBlock conv (`conv3d_fused_v4`)."""

    def _mk(self, B=2, X=8, Y=6, Z=6, C=8, Co=8):
        import jax

        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (B, X, Y, Z, C), jnp.float32)
        w = jax.random.normal(ks[1], (3, 3, 3, C, Co), jnp.float32) * 0.1
        b = jax.random.normal(ks[2], (Co,))
        mean = jax.random.normal(ks[3], (B, C)) * 0.1
        inv = jax.nn.softplus(jax.random.normal(ks[4], (B, C))) + 0.5
        scale = jnp.broadcast_to(
            jax.random.normal(ks[5], (C,)) * 0.2 + 1.0, (B, C)
        )
        bias = jnp.broadcast_to(jax.random.normal(ks[6], (C,)) * 0.1, (B, C))
        temb = jax.random.normal(ks[7], (B, Co))
        skip = jax.random.normal(ks[0], (B, X, Y, Z, Co))
        return x, w, b, mean, inv, scale, bias, temb, skip

    def _ref(self, x, w, b, mean, inv, scale, bias, temb, skip):
        import jax

        bc = (slice(None), None, None, None, slice(None))
        xn = (x - mean[bc]) * inv[bc] * scale[bc] + bias[bc]
        h = xn * jax.nn.sigmoid(xn)
        out = jax.lax.conv_general_dilated(
            h, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + b + temb[bc] + skip

    @pytest.mark.parametrize(
        "pack_n,algo,unroll",
        [
            (True, "im2col", False),
            (False, "im2col", False),
            (True, "im2col", True),
            (True, "dzslab", False),
            (True, "dzslab", True),
        ],
    )
    def test_full_epilogue_parity(self, pack_n, algo, unroll):
        from fast_cwdm_tpu.ops.conv3d_pallas import conv3d_fused_v4

        x, w, b, mean, inv, scale, bias, temb, skip = self._mk()
        y_ref = self._ref(x, w, b, mean, inv, scale, bias, temb, skip)
        y = conv3d_fused_v4(
            x, w, b, gn=(mean, inv, scale, bias), temb=temb, skip=skip,
            tx=4, pack_n=pack_n, algo=algo, unroll=unroll, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_plain_conv_parity(self):
        import jax

        from fast_cwdm_tpu.ops.conv3d_pallas import conv3d_fused_v4

        x, w, b, *_ = self._mk()
        y_ref = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + b
        y = conv3d_fused_v4(x, w, b, tx=2, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_rect_channels(self):
        """Ci != Co (decoder concat inputs)."""
        import jax

        from fast_cwdm_tpu.ops.conv3d_pallas import conv3d_fused_v4

        x, _, _, mean, inv, scale, bias, temb, skip = self._mk(C=16, Co=8)
        key = jax.random.PRNGKey(3)
        w = jax.random.normal(key, (3, 3, 3, 16, 8), jnp.float32) * 0.1
        b = jnp.zeros((8,))
        y_ref = self._ref(x, w, b, mean, inv, scale, bias, temb, skip)
        y = conv3d_fused_v4(
            x, w, b, gn=(mean, inv, scale, bias), temb=temb, skip=skip,
            tx=4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


def test_conv3d_fused_per_batch_gn_scale_bias(data):
    """Per-batch (B, C) scale/bias must be applied per element, not
    batch-0-broadcast (regression)."""
    import jax

    from fast_cwdm_tpu.ops.conv3d_pallas import conv3d_fused

    x, w, b = data
    B, C = x.shape[0], x.shape[-1]
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 4)
    mean = jax.random.normal(ks[0], (B, C)) * 0.1
    inv = jax.nn.softplus(jax.random.normal(ks[1], (B, C))) + 0.5
    scale = jax.random.normal(ks[2], (B, C)) * 0.3 + 1.0
    bias = jax.random.normal(ks[3], (B, C)) * 0.1
    bc = (slice(None), None, None, None, slice(None))
    xn = (x - mean[bc]) * inv[bc] * scale[bc] + bias[bc]
    h = xn * jax.nn.sigmoid(xn)
    y_ref = jax.lax.conv_general_dilated(
        h, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b
    y = conv3d_fused(x, w, b, gn=(mean, inv, scale, bias), interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
