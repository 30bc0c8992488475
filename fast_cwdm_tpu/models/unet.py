"""3D U-Net diffusion model family (parity surface for
`/root/reference/guided_diffusion/unet.py`).

TPU-first re-design, not a translation:

* channels-last ``(B, X, Y, Z, C)`` layout — XLA's native conv layout on TPU
  (the reference is NCDHW, `unet.py:754-800`);
* no device-placement logic — the reference's 2-GPU decoder split
  (``UNetModel.to``, `unet.py:727-752`) is replaced by mesh sharding
  annotations in ``fast_cwdm_tpu.parallel`` (GSPMD decides placement);
* gradient checkpointing via ``flax.linen.remat`` of whole ResBlocks
  (reference `nn.py:124-170` hand-rolls a CheckpointFunction);
* GroupNorm statistics in fp32, everything else may run bf16.

Model surface kept: ``UNetModel``, ``SuperResModel``, ``EncoderUNetModel``
with the same hyperparameters (`unet.py:482-531`) and identical
channel/skip/attention bookkeeping, so parameter counts match the reference
per config.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fast_cwdm_tpu.models.nn import (
    GroupNorm32,
    avg_pool_nd,
    conv_nd,
    timestep_embedding,
)


def _spatial_axes(ndim: int, dims: int) -> tuple[int, ...]:
    """Spatial axes of channels-last input with `dims` spatial dims."""
    return tuple(range(ndim - 1 - dims, ndim - 1))


def nearest_upsample(x: jax.Array, dims: int, resample_2d: bool) -> jax.Array:
    """Nearest-neighbour ×2 upsample; for 3D with ``resample_2d`` only the
    inner two spatial dims are scaled (`unet.py:60-70`)."""
    axes = _spatial_axes(x.ndim, dims)
    if dims == 3 and resample_2d:
        axes = axes[1:]
    for ax in axes:
        x = jnp.repeat(x, 2, axis=ax)
    return x


def _down_window(dims: int, resample_2d: bool) -> tuple[int, ...]:
    if dims == 3 and resample_2d:
        return (1, 2, 2)
    return (2,) * dims


class Upsample(nn.Module):
    """×2 nearest upsample + optional conv (`unet.py:40-70`)."""

    channels: int
    use_conv: bool
    dims: int = 3
    out_channels: int | None = None
    resample_2d: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.channels
        x = nearest_upsample(x, self.dims, self.resample_2d)
        if self.use_conv:
            x = conv_nd(
                self.out_channels or self.channels,
                3,
                dims=self.dims,
                dtype=self.dtype,
                name="conv",
            )(x)
        return x


class Downsample(nn.Module):
    """Strided-conv or average-pool ×2 downsample (`unet.py:73-100`)."""

    channels: int
    use_conv: bool
    dims: int = 3
    out_channels: int | None = None
    resample_2d: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.channels
        window = _down_window(self.dims, self.resample_2d)
        if self.use_conv:
            return conv_nd(
                self.out_channels or self.channels,
                3,
                dims=self.dims,
                stride=window,
                dtype=self.dtype,
                name="op",
            )(x)
        assert (self.out_channels or self.channels) == self.channels
        return avg_pool_nd(x, window)


class WaveletGatingDownsample(nn.Module):
    """Wavelet-gated downsample (`unet.py:103-137`; unused in the
    reference's main path but part of the model surface): DWT the features,
    gate each of the 8 subbands by sigmoid(MLP(global-avg-pool ⊕ temb)),
    and sum the gated subbands."""

    channels: int
    temb_dim: int
    wavelet: str = "haar"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        from fast_cwdm_tpu.ops import wavelet as wv

        pooled = x.mean(axis=_spatial_axes(x.ndim, 3))  # (B, C)
        g = nn.Dense(128, dtype=self.dtype, name="fnn_0")(
            jnp.concatenate([pooled, temb], axis=-1)
        )
        g = nn.Dense(8, dtype=self.dtype, name="fnn_2")(nn.silu(g))
        gates = jax.nn.sigmoid(g)  # (B, 8)
        bands = wv.dwt3(x, self.wavelet)  # (B, X/2, Y/2, Z/2, 8, C)
        gates = gates.reshape(gates.shape[0], 1, 1, 1, 8, 1)
        return (bands * gates).sum(axis=-2)


class WaveletGatingUpsample(nn.Module):
    """Wavelet-gated upsample (`unet.py:140-181`): 1×1-conv channel
    expansion into 8 subbands, gate by sigmoid(MLP(pool ⊕ temb)), IDWT."""

    channels: int
    temb_dim: int
    wavelet: str = "haar"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        from fast_cwdm_tpu.ops import wavelet as wv

        pooled = x.mean(axis=_spatial_axes(x.ndim, 3))
        g = nn.Dense(128, dtype=self.dtype, name="fnn_0")(
            jnp.concatenate([pooled, temb], axis=-1)
        )
        g = nn.Dense(8, dtype=self.dtype, name="fnn_2")(nn.silu(g))
        gates = jax.nn.sigmoid(g)
        expanded = conv_nd(
            self.channels * 8, 1, dims=3, dtype=self.dtype, name="conv_exp"
        )(x)
        bands = expanded.reshape(*expanded.shape[:-1], 8, self.channels)
        bands = bands * gates.reshape(gates.shape[0], 1, 1, 1, 8, 1)
        return wv.idwt3(bands, self.wavelet)


class FusableConv3d(nn.Module):
    """3³ SAME-padding conv with params mirroring ``nn.Conv``
    (``kernel`` DHWIO + ``bias``), plus an optional GN-apply+SiLU prologue
    executed inside the Pallas fused kernel (`ops/conv3d_pallas.py`) when
    running on TPU — the round-trip-free ResBlock path (PERF.md)."""

    features: int
    zero_init: bool = False
    dtype: jnp.dtype | None = None
    block_x: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, gn=None) -> jax.Array:
        c = x.shape[-1]
        init = (
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", init, (3, 3, 3, c, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        dtype = self.dtype or x.dtype
        xx = x.astype(dtype)
        k = kernel.astype(dtype)
        b = bias.astype(dtype)

        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        use_fused = (
            gn is not None
            and on_tpu
            and x.ndim == 5
            and x.shape[1] % self.block_x == 0
            # wide decoder concat inputs (e.g. 192ch at full res) exceed
            # v5e's 128 MB VMEM with the im2col scratch — fall back
            and c <= 128
        )
        if use_fused:
            from fast_cwdm_tpu.ops.conv3d_pallas import conv3d_fused

            return conv3d_fused(xx, k, b, gn=gn, block_x=self.block_x)
        if gn is not None:  # fallback: apply the prologue in XLA
            mean, inv, gscale, gbias = gn
            bc = (slice(None),) + (None,) * 3 + (slice(None),)
            xn = (xx.astype(jnp.float32) - mean[bc]) * inv[bc]
            xn = xn * gscale + gbias
            xx = (xn * jax.nn.sigmoid(xn)).astype(dtype)
        out = jax.lax.conv_general_dilated(
            xx, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + b


class ResBlock(nn.Module):
    """Residual block with timestep conditioning (`unet.py:185-311`).

    GN→SiLU→conv3, temb added (or FiLM scale-shift), GN→SiLU→dropout→zero
    conv, 1×1 (or 3×3 if ``use_conv``) channel-matching skip. ``up``/``down``
    apply the resample to both the hidden and the skip branch between the
    first norm-act and its conv (`unet.py:285-293`).

    ``fuse_conv=True`` (inference-only) routes both GN→SiLU→conv chains
    through the fused Pallas kernel — same parameters, same math, one HBM
    pass instead of three.
    """

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: int | None = None
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    dims: int = 3
    up: bool = False
    down: bool = False
    num_groups: int = 32
    resample_2d: bool = True
    fuse_conv: bool = False
    # fuse each GN-apply + SiLU into one Pallas memory pass
    # (ops/elementwise_pallas.py); identical math, fewer HBM trips
    fuse_gn_silu: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False):
        out_ch = self.out_channels or self.channels
        fuse = (
            self.fuse_conv
            and self.dims == 3
            and not (self.up or self.down)
            and not self.use_scale_shift_norm
            and self.dropout == 0
        )
        in_norm = GroupNorm32(self.num_groups, name="in_norm")
        out_norm = GroupNorm32(self.num_groups, name="out_norm")

        if fuse:
            from fast_cwdm_tpu.ops.conv3d_pallas import group_stats

            gscale, gbias = in_norm(x, params_only=True)
            mean, inv = group_stats(x, self.num_groups)
            h = FusableConv3d(out_ch, dtype=self.dtype, name="in_conv")(
                x, gn=(mean, inv, gscale, gbias)
            )
        else:
            if self.fuse_gn_silu:
                h = in_norm(x, act="silu")
            else:
                h = nn.silu(in_norm(x))
            if self.up:
                h = nearest_upsample(h, self.dims, self.resample_2d)
                x = nearest_upsample(x, self.dims, self.resample_2d)
            elif self.down:
                window = _down_window(self.dims, self.resample_2d)
                h = avg_pool_nd(h, window)
                x = avg_pool_nd(x, window)
            if self.dims == 3:
                h = FusableConv3d(out_ch, dtype=self.dtype, name="in_conv")(h)
            else:
                h = conv_nd(
                    out_ch, 3, dims=self.dims, dtype=self.dtype,
                    name="in_conv",
                )(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out.reshape(
            emb_out.shape[0], *([1] * self.dims), emb_out.shape[-1]
        )

        if fuse:
            from fast_cwdm_tpu.ops.conv3d_pallas import group_stats

            h2 = h + emb_out
            gscale2, gbias2 = out_norm(h2, params_only=True)
            mean2, inv2 = group_stats(h2, self.num_groups)
            h = FusableConv3d(
                out_ch, zero_init=True, dtype=self.dtype, name="out_conv"
            )(h2, gn=(mean2, inv2, gscale2, gbias2))
        else:
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = out_norm(h)
                h = h * (1 + scale) + shift
                h = nn.silu(h)
            elif self.fuse_gn_silu:
                h = out_norm(h + emb_out, act="silu")
            else:
                h = nn.silu(out_norm(h + emb_out))
            if self.dropout > 0:
                h = nn.Dropout(rate=self.dropout)(h, deterministic=not train)
            if self.dims == 3:
                h = FusableConv3d(
                    out_ch, zero_init=True, dtype=self.dtype, name="out_conv"
                )(h)
            else:
                h = conv_nd(
                    out_ch, 3, dims=self.dims, zero_init=True,
                    dtype=self.dtype, name="out_conv",
                )(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = conv_nd(out_ch, 3, dims=self.dims, dtype=self.dtype, name="skip")(x)
        else:
            skip = conv_nd(out_ch, 1, dims=self.dims, dtype=self.dtype, name="skip")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened voxels (`unet.py:314-448`).

    ``use_new_attention_order`` switches the qkv channel layout between the
    legacy (head-major, `QKVAttentionLegacy`, `unet.py:383-409`) and new
    (qkv-major, `QKVAttention`, `unet.py:416-444`) conventions; this only
    matters for checkpoint compatibility, the math is identical.
    """

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    num_groups: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert self.channels % self.num_head_channels == 0
            heads = self.channels // self.num_head_channels
        b, *spatial, c = x.shape
        ch = c // heads

        flat = x.reshape(b, -1, c)
        h = GroupNorm32(self.num_groups, name="norm")(flat)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)  # (B, T, 3C)

        if self.use_new_attention_order:
            # layout [q(H*ch) | k(H*ch) | v(H*ch)]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, -1, heads, ch)
            k = k.reshape(b, -1, heads, ch)
            v = v.reshape(b, -1, heads, ch)
        else:
            # legacy layout: head-major [h0:(q|k|v), h1:(q|k|v), ...]
            qkv = qkv.reshape(b, -1, heads, 3 * ch)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum(
            "bthc,bshc->bhts", q * scale, k * scale
        )
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            logits.dtype
        )
        a = jnp.einsum("bhts,bshc->bthc", weights, v).reshape(b, -1, c)
        a = nn.Dense(
            c,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(a)
        return (flat + a).reshape(b, *spatial, c)


class UNetModel(nn.Module):
    """The production denoiser (`unet.py:451-800`).

    Config surface and channel/skip bookkeeping match the reference exactly
    (encoder: per-level ResBlocks + optional attention + downsample;
    bottleneck ResBlock[+Attn]+ResBlock; decoder: skip concat — or averaged
    additive skips — with an extra ResBlock per level and upsample).
    """

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 3
    num_classes: int | None = None
    use_checkpoint: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    num_groups: int = 32
    bottleneck_attention: bool = True
    resample_2d: bool = True
    additive_skips: bool = False
    fuse_conv: bool = False
    fuse_gn_silu: bool = False
    dtype: jnp.dtype | None = None
    # selective rematerialization (only meaningful with use_checkpoint):
    # remat_max_ds=K remats ONLY blocks at downsample factor ds <= K — the
    # high-resolution levels where activations dominate HBM — and saves the
    # cheap deep-level activations (0 = remat every block, the reference's
    # whole-CheckpointFunction behavior, `nn.py:124-170`). remat_policy
    # names a `jax.checkpoint_policies` entry for what remat may keep.
    remat_max_ds: int = 0
    remat_policy: str | None = None

    def _resblock(self, ds: int | None = None, **kw) -> ResBlock:
        cls = ResBlock
        if self.use_checkpoint and (
            not self.remat_max_ds or ds is None or ds <= self.remat_max_ds
        ):
            policy = (
                getattr(jax.checkpoint_policies, self.remat_policy)
                if self.remat_policy
                else None
            )
            cls = nn.remat(ResBlock, static_argnums=(3,), policy=policy)
        kw.setdefault("dropout", self.dropout)
        kw.setdefault("dims", self.dims)
        kw.setdefault("use_scale_shift_norm", self.use_scale_shift_norm)
        kw.setdefault("num_groups", self.num_groups)
        kw.setdefault("resample_2d", self.resample_2d)
        kw.setdefault("fuse_conv", self.fuse_conv)
        kw.setdefault("fuse_gn_silu", self.fuse_gn_silu)
        kw.setdefault("dtype", self.dtype)
        return cls(**kw)

    def _attention(self, ch: int, heads: int, name: str) -> AttentionBlock:
        return AttentionBlock(
            channels=ch,
            num_heads=heads,
            num_head_channels=self.num_head_channels,
            use_new_attention_order=self.use_new_attention_order,
            num_groups=self.num_groups,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        y: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        assert (y is not None) == (self.num_classes is not None)
        heads_up = (
            self.num_heads
            if self.num_heads_upsample == -1
            else self.num_heads_upsample
        )
        ted = self.model_channels * 4
        emb = nn.Dense(ted, name="time_embed_0")(
            timestep_embedding(timesteps, self.model_channels)
        )
        emb = nn.Dense(ted, name="time_embed_2")(nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, ted, name="label_emb")(y)
        emb = emb.astype(self.dtype or x.dtype)

        # ------------------------- encoder -------------------------
        h = conv_nd(
            self.model_channels, 3, dims=self.dims, dtype=self.dtype,
            name="input_conv",
        )(x)
        hs = [h]
        skip_chans = [self.model_channels]
        ch = self.model_channels
        ds = 1
        bidx = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = self._resblock(
                    ds=ds,
                    channels=ch,
                    emb_channels=ted,
                    out_channels=mult * self.model_channels,
                    name=f"in_{bidx}_res",
                )(h, emb, train)
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    h = self._attention(ch, self.num_heads, f"in_{bidx}_attn")(h)
                hs.append(h)
                skip_chans.append(ch)
                bidx += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = self._resblock(
                        ds=ds,
                        channels=ch,
                        emb_channels=ted,
                        out_channels=ch,
                        down=True,
                        name=f"in_{bidx}_down",
                    )(h, emb, train)
                else:
                    h = Downsample(
                        ch,
                        self.conv_resample,
                        dims=self.dims,
                        out_channels=ch,
                        resample_2d=self.resample_2d,
                        dtype=self.dtype,
                        name=f"in_{bidx}_down",
                    )(h)
                hs.append(h)
                skip_chans.append(ch)
                ds *= 2
                bidx += 1

        # ------------------------- bottleneck -------------------------
        h = self._resblock(
            ds=ds, channels=ch, emb_channels=ted, name="mid_res0"
        )(h, emb, train)
        if self.bottleneck_attention:
            h = self._attention(ch, self.num_heads, "mid_attn")(h)
        h = self._resblock(
            ds=ds, channels=ch, emb_channels=ted, name="mid_res1"
        )(h, emb, train)

        # ------------------------- decoder -------------------------
        bidx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = skip_chans.pop()
                new_hs = hs.pop()
                if self.additive_skips:
                    # averaged additive skips (`unet.py:664-669,793-795`)
                    mid_ch = skip_chans[-1] if skip_chans else self.model_channels
                    h = (h + new_hs) / 2.0
                    in_ch = ch
                else:
                    mid_ch = self.model_channels * mult
                    h = jnp.concatenate([h, new_hs], axis=-1)
                    in_ch = ch + ich
                h = self._resblock(
                    ds=ds,
                    channels=in_ch,
                    emb_channels=ted,
                    out_channels=mid_ch,
                    name=f"out_{bidx}_res",
                )(h, emb, train)
                if ds in self.attention_resolutions:
                    h = self._attention(mid_ch, heads_up, f"out_{bidx}_attn")(h)
                ch = mid_ch
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = self._resblock(
                            ds=ds,
                            channels=ch,
                            emb_channels=ted,
                            out_channels=ch,
                            up=True,
                            name=f"out_{bidx}_up",
                        )(h, emb, train)
                    else:
                        h = Upsample(
                            ch,
                            self.conv_resample,
                            dims=self.dims,
                            out_channels=ch,
                            resample_2d=self.resample_2d,
                            dtype=self.dtype,
                            name=f"out_{bidx}_up",
                        )(h)
                    ds //= 2
                bidx += 1

        if self.fuse_gn_silu:
            h = GroupNorm32(self.num_groups, name="out_norm")(h, act="silu")
        else:
            h = nn.silu(GroupNorm32(self.num_groups, name="out_norm")(h))
        return conv_nd(
            self.out_channels, 3, dims=self.dims, zero_init=True,
            name="out_conv",
        )(h).astype(jnp.float32)


class SuperResModel(nn.Module):
    """2D super-resolution wrapper (`unet.py:803-817`): conditions on a
    bilinear-upsampled low-res image concatenated on channels."""

    unet: UNetModel

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, train: bool = False, **kw):
        b, *spatial, _ = x.shape
        up = jax.image.resize(
            low_res,
            (b, *spatial, low_res.shape[-1]),
            method="bilinear",
        )
        return self.unet(
            jnp.concatenate([x, up], axis=-1), timesteps, train=train, **kw
        )


class EncoderUNetModel(nn.Module):
    """Half-UNet classifier (`unet.py:820-1044`); constructed by
    ``create_classifier`` — unused by the production scripts but part of the
    public surface. Pooling modes: adaptive / spatial / spatial_v2."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 3
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    pool: str = "adaptive"
    num_groups: int = 32
    resample_2d: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, timesteps, train: bool = False):
        ted = self.model_channels * 4
        emb = nn.Dense(ted, name="time_embed_0")(
            timestep_embedding(timesteps, self.model_channels)
        )
        emb = nn.Dense(ted, name="time_embed_2")(nn.silu(emb))

        def resblock(ch_in, name, **kw):
            return ResBlock(
                channels=ch_in,
                emb_channels=ted,
                dropout=self.dropout,
                dims=self.dims,
                use_scale_shift_norm=self.use_scale_shift_norm,
                num_groups=self.num_groups,
                resample_2d=self.resample_2d,
                dtype=self.dtype,
                name=name,
                **kw,
            )

        h = conv_nd(
            self.model_channels, 3, dims=self.dims, dtype=self.dtype,
            name="input_conv",
        )(x)
        results = []
        ch = self.model_channels
        ds = 1
        bidx = 0
        sp_axes = _spatial_axes(h.ndim, self.dims)
        if self.pool.startswith("spatial"):
            results.append(h.mean(axis=sp_axes))
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = resblock(
                    ch, f"in_{bidx}_res", out_channels=mult * self.model_channels
                )(h, emb, train)
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    h = AttentionBlock(
                        channels=ch,
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        use_new_attention_order=self.use_new_attention_order,
                        num_groups=self.num_groups,
                        dtype=self.dtype,
                        name=f"in_{bidx}_attn",
                    )(h)
                if self.pool.startswith("spatial"):
                    results.append(h.mean(axis=sp_axes))
                bidx += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = resblock(ch, f"in_{bidx}_down", out_channels=ch, down=True)(
                        h, emb, train
                    )
                else:
                    h = Downsample(
                        ch,
                        self.conv_resample,
                        dims=self.dims,
                        out_channels=ch,
                        resample_2d=self.resample_2d,
                        dtype=self.dtype,
                        name=f"in_{bidx}_down",
                    )(h)
                if self.pool.startswith("spatial"):
                    results.append(h.mean(axis=sp_axes))
                ds *= 2
                bidx += 1

        h = resblock(ch, "mid_res0")(h, emb, train)
        h = AttentionBlock(
            channels=ch,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_new_attention_order=self.use_new_attention_order,
            num_groups=self.num_groups,
            dtype=self.dtype,
            name="mid_attn",
        )(h)
        h = resblock(ch, "mid_res1")(h, emb, train)

        if self.pool == "adaptive":
            h = GroupNorm32(self.num_groups, name="out_norm")(h)
            h = nn.silu(h)
            h = h.mean(axis=sp_axes, keepdims=True)
            h = conv_nd(
                self.out_channels, 1, dims=self.dims, zero_init=True,
                name="out_conv",
            )(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "spatial":
            results.append(h.mean(axis=sp_axes))
            h = jnp.concatenate(results, axis=-1)
            return nn.Dense(self.out_channels, name="out_dense")(h)
        if self.pool == "spatial_v2":
            results.append(h.mean(axis=sp_axes))
            h = jnp.concatenate(results, axis=-1)
            h = nn.Dense(2048, name="out_dense0")(h)
            h = GroupNorm32(self.num_groups, name="out_norm")(h)
            h = nn.silu(h)
            return nn.Dense(self.out_channels, name="out_dense1")(h)
        raise NotImplementedError(f"Unexpected {self.pool} pooling")
