"""Neural-net building blocks (parity surface for
`/root/reference/guided_diffusion/nn.py`).

TPU-first choices: channels-last ``(B, X, Y, Z, C)`` layout so 3D convs lower
to XLA's native NDHWC path; GroupNorm statistics always in float32
(reference ``GroupNorm32``, `nn.py:17-19`) while the surrounding compute can
run bfloat16; zero-initialized output convs (`zero_module`, `nn.py:68-75`).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal embeddings, [cos | sin] order (`nn.py:103-121`).

    Always computed in float32 regardless of ambient dtype.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def mean_flat(x: jax.Array) -> jax.Array:
    """Mean over all non-batch dims (`nn.py:95-99`)."""
    return x.mean(axis=tuple(range(1, x.ndim)))


class GroupNorm32(nn.Module):
    """GroupNorm with statistics in float32 (`nn.py:17-19`), cast back to
    the input dtype. Operates on the last (channel) axis.

    Owns its scale/bias directly (params at ``<name>/{scale,bias}``) so the
    fused Pallas conv path can consume them without re-applying the module.
    """

    num_groups: int = 32

    @nn.compact
    def __call__(
        self, x: jax.Array, *, params_only: bool = False,
        act: str | None = None,
    ):
        """``act="silu"`` fuses the normalize-apply and the activation into
        ONE memory pass via the Pallas elementwise kernel when the shape
        supports it (`ops/elementwise_pallas.py` — full 128-lane tiling on
        the flat buffer vs XLA's C-minor fusion); falls back to the plain
        apply + silu otherwise. Stats math is identical either way."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if params_only:
            return scale, bias
        g = self.num_groups
        xf = x.astype(jnp.float32)
        spatial = tuple(range(1, x.ndim - 1))
        # reduce over SPATIAL axes only (lane-preserving: the big pass never
        # reshapes the channel/lane dim — reshaping C→(G, C/G) makes the
        # minor dim C/G=2 and runs the reduction at ~3% of HBM peak on TPU),
        # then mix groups on the tiny (B, C) vectors: group mean = mean of
        # channel means for equal-size groups, bit-for-bit up to summation
        # order. Fast variance (E[x²] − E[x]²), one pass, as in flax.
        mean_c = xf.mean(axis=spatial)  # (B, C)
        mean_sq_c = (xf * xf).mean(axis=spatial)
        mean = mean_c.reshape(-1, g, c // g).mean(axis=-1)  # (B, G)
        mean_sq = mean_sq_c.reshape(-1, g, c // g).mean(axis=-1)
        var = jnp.maximum(mean_sq - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        if act == "silu":
            from fast_cwdm_tpu.ops import elementwise_pallas as ep

            if ep.supported(x.shape) and x.shape[0] == 1:
                mean_pc = jnp.repeat(mean, c // g, axis=-1)  # (B, C)
                inv_pc = jnp.repeat(inv, c // g, axis=-1)
                return ep.gn_apply_silu(x, mean_pc, inv_pc, scale, bias)
        # expand per-group stats to per-channel and apply on the FLAT
        # tensor (stats are tiny; the apply pass fuses into neighbours)
        expand = lambda a: jnp.repeat(  # noqa: E731
            a, c // g, axis=-1
        ).reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (c,))
        y = (xf - expand(mean)) * expand(inv) * scale + bias
        y = y.astype(x.dtype)
        if act == "silu":
            y = jax.nn.silu(y)
        return y


def conv_nd(
    features: int,
    kernel: int = 3,
    *,
    dims: int = 3,
    stride: int | Sequence[int] = 1,
    zero_init: bool = False,
    feature_group_count: int = 1,
    dtype=None,
    name: str | None = None,
) -> nn.Conv:
    """N-D convolution with torch-style symmetric padding (`nn.py:22-34`).

    ``zero_init=True`` reproduces the reference's `zero_module` output heads
    (`nn.py:68-75`).
    """
    if isinstance(stride, int):
        stride = (stride,) * dims
    pad = (kernel - 1) // 2
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features=features,
        kernel_size=(kernel,) * dims,
        strides=tuple(stride),
        padding=[(pad, pad)] * dims,
        kernel_init=init,
        feature_group_count=feature_group_count,
        dtype=dtype,
        name=name,
    )


def avg_pool_nd(x: jax.Array, window: Sequence[int]) -> jax.Array:
    """Average pooling over the spatial dims of channels-last input
    (`nn.py:44-52`). ``window`` has one entry per spatial dim."""
    window = tuple(window)
    return nn.avg_pool(x, window_shape=window, strides=window)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x
