"""WDM-style wavelet U-Net (parity surface for
`/root/reference/guided_diffusion/wunet.py`).

The model's down/upsampling IS the Haar DWT/IDWT (``use_freq=True``):

* Downsampling emits ``(LLL/3, highs)`` where ``highs`` are the 7 high
  subbands kept as the skip connection (`wunet.py:88-124`);
* Upsampling reconstructs via ``idwt(3·x, highs…)`` with an optional grouped
  conv over the 7 skip subbands (`wunet.py:40-85`);
* A wavelet input pyramid (`WaveletDownsample`, `wunet.py:127-145`) adds a
  DWT'd projection of the raw input at every level
  (``progressive_input='residual'``, forward `wunet.py:749-760`).

TPU-first deviations (documented, not bugs): subbands are carried as a single
band-axis array instead of 7-tuples (pure layout change); the tuple-threading
ResBlock (`wunet.py:148-269`) is expressed as explicit ``(h, skip)`` state in
the model loop; the reference's broken ``use_freq`` + ``conv_resample``
standalone-Downsample combination (`wunet.py:110-124` unpacks a conv output
as 8 subbands) is implemented sanely: ``use_freq`` always uses the DWT.
Additionally, the reference's decoder accidentally re-appends the previous
iteration's layer list when building each upsample block
(`wunet.py:647-673`: ``layers.append(...)`` at ``i == num_res_blocks``
mutates the PREVIOUS ``layers``), so the shared plain ResBlock runs twice
per level at inference; this framework runs each decoder block once (clean
semantics — intentional deviation).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fast_cwdm_tpu.models.nn import GroupNorm32, conv_nd, timestep_embedding
from fast_cwdm_tpu.models.unet import AttentionBlock, Downsample, Upsample
from fast_cwdm_tpu.ops import wavelet as wv


def wav_down(x: jax.Array, wavelet: str = "haar"):
    """DWT downsample → ``(LLL/3, highs)``; ``highs``: (..., 7, C)
    (`wunet.py:118-124`)."""
    bands = wv.dwt3(x, wavelet)
    return bands[..., 0, :] / 3.0, bands[..., 1:, :]


def wav_up(x: jax.Array, highs: jax.Array, wavelet: str = "haar") -> jax.Array:
    """IDWT upsample of ``(x, highs)`` → full-res features
    (`wunet.py:75-76`: ``idwt(3·x, skip…)``)."""
    bands = jnp.concatenate([(3.0 * x)[..., None, :], highs], axis=-2)
    return wv.idwt3(bands, wavelet)


class SkipConv(nn.Module):
    """Grouped conv over the 7 high-subband skips (`wunet.py:61-73`):
    concat bands on channels, /3, grouped conv (groups=7), ×3."""

    channels: int
    out_channels: int
    dims: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, highs: jax.Array) -> jax.Array:
        *lead, seven, c = highs.shape
        flat = highs.reshape(*lead, seven * c) / 3.0
        out = conv_nd(
            self.out_channels * 7,
            3,
            dims=self.dims,
            feature_group_count=7,
            dtype=self.dtype,
            name="conv",
        )(flat)
        out = out * 3.0
        return out.reshape(*lead, seven, self.out_channels)


class WaveletDownsample(nn.Module):
    """Input-pyramid block (`wunet.py:127-145`): DWT all 8 subbands,
    concat on channels (band-major), /3, conv to ``out_channels``."""

    out_channels: int
    wavelet: str = "haar"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        flat = wv.dwt3_flat(x, self.wavelet) / 3.0
        return conv_nd(
            self.out_channels, 3, dims=3, dtype=self.dtype, name="conv"
        )(flat)


class WavResBlock(nn.Module):
    """ResBlock with optional frequency-aware up/down (`wunet.py:148-269`).

    ``down``: full in_layers then DWT on both branches; the 7 high subbands
    of the hidden branch become the emitted skip. ``up``: expects the level's
    stored subbands and IDWTs both branches with them. Unlike the plain
    UNet ResBlock, in_layers run entirely BEFORE the resample
    (`wunet.py:230-241`).
    """

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: int | None = None
    use_scale_shift_norm: bool = False
    dims: int = 3
    up: bool = False
    down: bool = False
    num_groups: int = 32
    resample_2d: bool = True
    use_freq: bool = True
    wavelet: str = "haar"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        highs: jax.Array | None = None,
        train: bool = False,
    ):
        from fast_cwdm_tpu.models.unet import _down_window, nearest_upsample
        from fast_cwdm_tpu.models.nn import avg_pool_nd

        out_ch = self.out_channels or self.channels
        out_skip = None

        h = GroupNorm32(self.num_groups, name="in_norm")(x)
        h = nn.silu(h)
        h = conv_nd(out_ch, 3, dims=self.dims, dtype=self.dtype, name="in_conv")(h)

        if self.down:
            if self.use_freq:
                h, out_skip = wav_down(h, self.wavelet)
                x, _ = wav_down(x, self.wavelet)
            else:
                window = _down_window(self.dims, self.resample_2d)
                h = avg_pool_nd(h, window)
                x = avg_pool_nd(x, window)
        elif self.up:
            if self.use_freq:
                assert highs is not None, "frequency upsample needs skip subbands"
                h = wav_up(h, highs, self.wavelet)
                x = wav_up(x, highs, self.wavelet)
            else:
                h = nearest_upsample(h, self.dims, self.resample_2d)
                x = nearest_upsample(x, self.dims, self.resample_2d)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out.reshape(
            emb_out.shape[0], *([1] * self.dims), emb_out.shape[-1]
        )

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(self.num_groups, name="out_norm")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(self.num_groups, name="out_norm")(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=not train)
        h = conv_nd(
            out_ch, 3, dims=self.dims, zero_init=True, dtype=self.dtype,
            name="out_conv",
        )(h)

        if out_ch == self.channels:
            skip = x
        else:
            skip = conv_nd(out_ch, 1, dims=self.dims, dtype=self.dtype, name="skip")(x)
        return skip + h, out_skip


class WavUNetModel(nn.Module):
    """Full wavelet U-Net (`wunet.py:410-795`).

    Encoder: per-level ResBlocks, a frequency downsample ResBlock (every
    level, including the last), and an input-pyramid residual. Decoder:
    per-level ResBlocks then a frequency upsample ResBlock consuming the
    stored high subbands; ``out_res`` tail ResBlocks (`wunet.py:680-696`);
    non-zero-init output conv (`wunet.py:701-705`).
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
    # Deviation (documented): the reference's WavUNetModel advertises
    # class conditioning (`wunet.py:425`) and stores num_classes
    # (`wunet.py:455`) but never builds a label embedding and its forward
    # takes no labels (`wunet.py:734`) — the flag is dead there. Here it is
    # implemented per the docstring contract, matching UNetModel.
    num_classes: int | None = None
    use_checkpoint: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    num_groups: int = 32
    bottleneck_attention: bool = True
    resample_2d: bool = True
    additive_skips: bool = False
    use_freq: bool = True
    progressive_input: str = "residual"
    wavelet: str = "haar"
    # reproduce the reference's accidental decoder semantics: each upsample
    # block re-runs the preceding ResBlock (+attention) with SHARED params
    # (`wunet.py:647-673`, see module docstring). Only executable — there
    # and here — when the level keeps a constant channel width.
    ref_compat: bool = False
    dtype: jnp.dtype | None = None

    def _resblock(self, **kw) -> WavResBlock:
        cls = WavResBlock
        if self.use_checkpoint:
            cls = nn.remat(WavResBlock, static_argnums=(4,))
        kw.setdefault("dropout", self.dropout)
        kw.setdefault("dims", self.dims)
        kw.setdefault("use_scale_shift_norm", self.use_scale_shift_norm)
        kw.setdefault("num_groups", self.num_groups)
        kw.setdefault("resample_2d", self.resample_2d)
        kw.setdefault("use_freq", self.use_freq)
        kw.setdefault("wavelet", self.wavelet)
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
    ):
        assert (y is not None) == (self.num_classes is not None)
        if self.additive_skips:
            # the reference's WavUNet additive branch is bit-rotted dead
            # code: its encoder stores None-or-7-subband-TUPLES in hs
            # (`wunet.py:752-755`), so `h = (h + new_hs)/sqrt(2)`
            # (`wunet.py:773-775`) is a tensor+tuple TypeError on first
            # use. Additive skips are also architecturally incoherent here
            # — the skips ARE the high-frequency subbands the wavelet
            # Upsample needs for IDWT reconstruction. Reject loudly rather
            # than silently training a different architecture.
            raise ValueError(
                "WavUNetModel does not support additive_skips (broken dead "
                "code in the reference, see wunet.py:752-775); use "
                "UNetModel(additive_skips=True) or the frequency skips"
            )
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

        h = conv_nd(
            self.model_channels, 3, dims=self.dims, dtype=self.dtype,
            name="input_conv",
        )(x)
        pyramid = x
        hs: list = []  # stored skip subbands per encoder block (None or array)
        ch = self.model_channels
        ds = 1
        bidx = 0

        # ------------------------- encoder -------------------------
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h, _ = self._resblock(
                    channels=ch,
                    emb_channels=ted,
                    out_channels=mult * self.model_channels,
                    name=f"in_{bidx}_res",
                )(h, emb, None, train)
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    h = self._attention(ch, self.num_heads, f"in_{bidx}_attn")(h)
                hs.append(None)
                bidx += 1
            # frequency downsample — EVERY level, incl. the last
            # (`wunet.py:532-570`)
            if self.resblock_updown:
                h, skip7 = self._resblock(
                    channels=ch,
                    emb_channels=ted,
                    out_channels=ch,
                    down=True,
                    name=f"in_{bidx}_down",
                )(h, emb, None, train)
            elif self.use_freq:
                h, skip7 = wav_down(h, self.wavelet)
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
                skip7 = None
            hs.append(skip7)
            bidx += 1
            if self.progressive_input == "residual":
                pyramid = WaveletDownsample(
                    out_channels=ch,
                    wavelet=self.wavelet,
                    dtype=self.dtype,
                    name=f"pyramid_{level}",
                )(pyramid)
                pyramid = pyramid + h
                h = pyramid
            ds *= 2

        # ------------------------- bottleneck -------------------------
        h, _ = self._resblock(channels=ch, emb_channels=ted, name="mid_res0")(
            h, emb, None, train
        )
        if self.bottleneck_attention:
            h = self._attention(ch, self.num_heads, "mid_attn")(h)
        h, _ = self._resblock(channels=ch, emb_channels=ted, name="mid_res1")(
            h, emb, None, train
        )

        # ------------------------- decoder -------------------------
        skip7 = None
        bidx = 0
        mid_ch = ch
        prev_mods: tuple | None = None  # last (res, attn) for ref_compat
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                new_hs = hs.pop()
                if new_hs is not None:
                    skip7 = new_hs
                if i != self.num_res_blocks:
                    mid_ch = self.model_channels * mult
                    res = self._resblock(
                        channels=ch,
                        emb_channels=ted,
                        out_channels=mid_ch,
                        name=f"out_{bidx}_res",
                    )
                    h, _ = res(h, emb, None, train)
                    attn = None
                    if ds in self.attention_resolutions:
                        attn = self._attention(
                            mid_ch, heads_up, f"out_{bidx}_attn"
                        )
                        h = attn(h)
                    prev_mods = (res, attn)
                    ch = mid_ch
                else:  # upsample block
                    if self.ref_compat and prev_mods is not None:
                        # reference double-run: same module instances →
                        # shared flax params, executed a second time
                        res, attn = prev_mods
                        h, _ = res(h, emb, None, train)
                        if attn is not None:
                            h = attn(h)
                    if self.resblock_updown:
                        h, _ = self._resblock(
                            channels=mid_ch,
                            emb_channels=ted,
                            out_channels=ch,
                            up=True,
                            name=f"out_{bidx}_up",
                        )(h, emb, skip7, train)
                    elif self.use_freq:
                        if self.conv_resample:
                            skip7 = SkipConv(
                                channels=skip7.shape[-1],
                                out_channels=ch,
                                dims=self.dims,
                                dtype=self.dtype,
                                name=f"out_{bidx}_skipconv",
                            )(skip7)
                        h = wav_up(h, skip7, self.wavelet)
                    else:
                        h = Upsample(
                            mid_ch,
                            self.conv_resample,
                            dims=self.dims,
                            out_channels=ch,
                            resample_2d=self.resample_2d,
                            dtype=self.dtype,
                            name=f"out_{bidx}_up",
                        )(h)
                    ds //= 2
                bidx += 1
                mid_ch = ch

        # ------------------------- tail -------------------------
        for i in range(self.num_res_blocks):
            h, _ = self._resblock(
                channels=ch, emb_channels=ted, out_channels=ch,
                name=f"out_res_{i}",
            )(h, emb, None, train)

        h = GroupNorm32(self.num_groups, name="out_norm")(h)
        h = nn.silu(h)
        # NOT zero-initialized, unlike UNetModel (`wunet.py:701-705`)
        return conv_nd(
            self.out_channels, 3, dims=self.dims, name="out_conv"
        )(h).astype(jnp.float32)
