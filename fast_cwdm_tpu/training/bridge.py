"""Torch-checkpoint bridge: import/export reference ``.pt`` state dicts.

The reference publishes trained weights as torch ``state_dict`` blobs
(README.md:28-31, saved at `train_util.py:343-356`); this module maps them
to/from the Flax ``UNetModel`` parameter pytree:

* torch ``Conv3d`` OIDHW kernels → Flax DHWIO (channels-last);
* ``Linear`` (O,I) → Dense (I,O);
* ``GroupNorm`` weight/bias → scale/bias;
* attention ``Conv1d`` 1×1 kernels → Dense.

The module-index ↔ name mapping is derived by replaying the reference's
construction bookkeeping (`unet.py:544-725`) against the model config — no
reference code is imported.
"""

from __future__ import annotations

from typing import Iterator


import numpy as np

from fast_cwdm_tpu.models.unet import EncoderUNetModel, UNetModel
from fast_cwdm_tpu.models.wunet import WavUNetModel


# ---------------------------------------------------------------------------
# Layout walk: (torch module path, flax module name, kind)
# ---------------------------------------------------------------------------


def unet_layout(model: UNetModel) -> Iterator[tuple[str, str, str]]:
    """Replay `UNetModel.__init__` bookkeeping (`unet.py:544-725`) to pair
    torch ``input_blocks.N.M``-style paths with our flax module names."""
    yield "time_embed.0", "time_embed_0", "linear"
    yield "time_embed.2", "time_embed_2", "linear"
    if model.num_classes is not None:
        yield "label_emb", "label_emb", "embed"
    yield "input_blocks.0.0", "input_conv", "conv"

    nrb = model.num_res_blocks
    ds = 1
    tidx = 1
    bidx = 0
    for level, mult in enumerate(model.channel_mult):
        for _ in range(nrb):
            yield f"input_blocks.{tidx}.0", f"in_{bidx}_res", "res"
            if ds in model.attention_resolutions:
                yield f"input_blocks.{tidx}.1", f"in_{bidx}_attn", "attn"
            tidx += 1
            bidx += 1
        if level != len(model.channel_mult) - 1:
            if model.resblock_updown:
                yield f"input_blocks.{tidx}.0", f"in_{bidx}_down", "res"
            elif model.conv_resample:
                yield f"input_blocks.{tidx}.0", f"in_{bidx}_down", "downsample"
            # else conv_resample=False: avg-pool downsample, parameterless
            # on both sides (`unet.py:92-100`) — nothing to bridge
            tidx += 1
            bidx += 1
            ds *= 2

    yield "middle_block.0", "mid_res0", "res"
    mi = 1
    if model.bottleneck_attention:
        yield "middle_block.1", "mid_attn", "attn"
        mi = 2
    yield f"middle_block.{mi}", "mid_res1", "res"

    bidx = 0
    for level, _mult in list(enumerate(model.channel_mult))[::-1]:
        for i in range(nrb + 1):
            yield f"output_blocks.{bidx}.0", f"out_{bidx}_res", "res"
            sub = 1
            if ds in model.attention_resolutions:
                yield f"output_blocks.{bidx}.{sub}", f"out_{bidx}_attn", "attn"
                sub += 1
            if level and i == nrb:
                if model.resblock_updown:
                    yield f"output_blocks.{bidx}.{sub}", f"out_{bidx}_up", "res"
                elif model.conv_resample:
                    yield f"output_blocks.{bidx}.{sub}", f"out_{bidx}_up", "upsample"
                # conv_resample=False: interpolate-only upsample, no params
                ds //= 2
            bidx += 1

    yield "out.0", "out_norm", "norm"
    yield "out.2", "out_conv", "conv"


def encoder_layout(model: EncoderUNetModel) -> Iterator[tuple[str, str, str]]:
    """Replay `EncoderUNetModel.__init__` (`unet.py:820-1044`). Only the
    ``adaptive`` pooling head is bridgeable: the reference's ``spatial`` head
    hard-codes ``nn.Linear(256, ·)`` and its ``spatial_v2`` head expects
    ``_feature_size`` inputs while the forward feeds only the pooled middle
    features (`unet.py:1031-1040`) — both are broken dead code there; this
    framework implements the upstream guided-diffusion concat semantics,
    which has a different parameter shape."""
    yield "time_embed.0", "time_embed_0", "linear"
    yield "time_embed.2", "time_embed_2", "linear"
    yield "input_blocks.0.0", "input_conv", "conv"

    ds = 1
    tidx = 1
    bidx = 0
    for level, _mult in enumerate(model.channel_mult):
        for _ in range(model.num_res_blocks):
            yield f"input_blocks.{tidx}.0", f"in_{bidx}_res", "res"
            if ds in model.attention_resolutions:
                yield f"input_blocks.{tidx}.1", f"in_{bidx}_attn", "attn"
            tidx += 1
            bidx += 1
        if level != len(model.channel_mult) - 1:
            if model.resblock_updown:
                yield f"input_blocks.{tidx}.0", f"in_{bidx}_down", "res"
            elif model.conv_resample:
                yield f"input_blocks.{tidx}.0", f"in_{bidx}_down", "downsample"
            # else conv_resample=False: avg-pool downsample, parameterless
            # on both sides (`unet.py:92-100`) — nothing to bridge
            tidx += 1
            bidx += 1
            ds *= 2

    yield "middle_block.0", "mid_res0", "res"
    yield "middle_block.1", "mid_attn", "attn"
    yield "middle_block.2", "mid_res1", "res"

    if model.pool != "adaptive":
        raise NotImplementedError(
            f"torch bridge supports pool='adaptive' only (got {model.pool!r}; "
            "the reference's spatial/spatial_v2 heads are shape-incompatible "
            "broken dead code — see docstring)"
        )
    yield "out.0", "out_norm", "norm"
    yield "out.3", "out_conv", "conv"


def wunet_layout(model: WavUNetModel) -> Iterator[tuple[str, str, str]]:
    """Replay `WavUNetModel.__init__` (`wunet.py:410-705`).

    The reference decoder mutates the previous iteration's ``layers`` list
    when building each upsample block (`wunet.py:647-673`), so every
    ``output_blocks.{k}`` upsample entry also re-registers the preceding
    ResBlock/Attention modules — their tensors appear TWICE in the torch
    state_dict under different keys. Entries marked ``alias:`` map those
    duplicate keys onto the same flax parameters (import verifies the copies
    agree; export re-emits them).
    """
    if not model.resblock_updown:
        raise NotImplementedError(
            "torch bridge supports resblock_updown=True wunet only (the "
            "reference's standalone wavelet Down/Upsample path unpacks a "
            "conv output as 8 subbands — broken dead code, `wunet.py:110-124`)"
        )
    if model.num_res_blocks < 1:
        raise NotImplementedError("wunet bridge needs num_res_blocks >= 1")

    yield "time_embed.0", "time_embed_0", "linear"
    yield "time_embed.2", "time_embed_2", "linear"
    yield "input_blocks.0.0", "input_conv", "conv"

    nrb = model.num_res_blocks
    ds = 1
    tidx = 1
    bidx = 0
    for level, _mult in enumerate(model.channel_mult):
        for _ in range(nrb):
            yield f"input_blocks.{tidx}.0", f"in_{bidx}_res", "res"
            if ds in model.attention_resolutions:
                yield f"input_blocks.{tidx}.1", f"in_{bidx}_attn", "attn"
            tidx += 1
            bidx += 1
        # frequency downsample — EVERY level incl. the last (`wunet.py:532`)
        yield f"input_blocks.{tidx}.0", f"in_{bidx}_down", "res"
        tidx += 1
        bidx += 1
        # input-pyramid block (empty Sequential when not 'residual', but the
        # module index still advances, `wunet.py:560-565`)
        if model.progressive_input == "residual":
            yield f"input_blocks.{tidx}.0", f"pyramid_{level}", "wavedown"
        tidx += 1
        ds *= 2

    yield "middle_block.0", "mid_res0", "res"
    mi = 1
    if model.bottleneck_attention:
        yield "middle_block.1", "mid_attn", "attn"
        mi = 2
    yield f"middle_block.{mi}", "mid_res1", "res"

    bidx = 0
    for _level, _mult in list(enumerate(model.channel_mult))[::-1]:
        for i in range(nrb + 1):
            if i != nrb:
                yield f"output_blocks.{bidx}.0", f"out_{bidx}_res", "res"
                if ds in model.attention_resolutions:
                    yield f"output_blocks.{bidx}.1", f"out_{bidx}_attn", "attn"
            else:
                # aliased re-registration of the previous block's layers
                yield f"output_blocks.{bidx}.0", f"out_{bidx - 1}_res", "alias:res"
                sub = 1
                if ds in model.attention_resolutions:
                    yield (
                        f"output_blocks.{bidx}.1",
                        f"out_{bidx - 1}_attn",
                        "alias:attn",
                    )
                    sub = 2
                yield f"output_blocks.{bidx}.{sub}", f"out_{bidx}_up", "res"
                ds //= 2
            bidx += 1

    for i in range(nrb):
        yield f"out_res.{i}.0", f"out_res_{i}", "res"

    yield "out.0", "out_norm", "norm"
    yield "out.2", "out_conv", "conv"


def _layout_for(model) -> Iterator[tuple[str, str, str]]:
    if isinstance(model, WavUNetModel):
        return wunet_layout(model)
    if isinstance(model, EncoderUNetModel):
        return encoder_layout(model)
    if isinstance(model, UNetModel):
        return unet_layout(model)
    raise TypeError(f"no torch layout for {type(model).__name__}")


# per kind: (torch suffix, flax suffix, leaf kind)
_KIND_LEAVES = {
    "conv": [("", "", "conv")],
    "linear": [("", "", "linear")],
    "embed": [("", "", "embed")],
    "norm": [("", "", "norm")],
    "downsample": [("op", "op", "conv")],
    "upsample": [("conv", "conv", "conv")],
    "res": [
        ("in_layers.0", "in_norm", "norm"),
        ("in_layers.2", "in_conv", "conv"),
        ("emb_layers.1", "emb_proj", "linear"),
        ("out_layers.0", "out_norm", "norm"),
        ("out_layers.3", "out_conv", "conv"),
        ("skip_connection", "skip", "conv_optional"),
    ],
    "attn": [
        ("norm", "norm", "norm"),
        ("qkv", "qkv", "conv1d_dense"),
        ("proj_out", "proj_out", "conv1d_dense"),
    ],
    "wavedown": [("conv", "conv", "conv")],
}


def _leaf_entries(model):
    """Yield ``(torch key prefix, flax path, leaf kind, is_alias)``."""
    for tpath, fpath, kind in _layout_for(model):
        alias = kind.startswith("alias:")
        if alias:
            kind = kind[len("alias:"):]
        for tsuf, fsuf, leaf_kind in _KIND_LEAVES[kind]:
            tfull = f"{tpath}.{tsuf}" if tsuf else tpath
            ffull = f"{fpath}/{fsuf}" if fsuf else fpath
            yield tfull, ffull, leaf_kind, alias


# ---------------------------------------------------------------------------
# Leaf conversions
# ---------------------------------------------------------------------------


def _t2f_leaf(kind: str, name: str, w: np.ndarray, dims: int):
    """torch leaf → (flax leaf name, array)."""
    if kind == "norm":
        return ("scale" if name == "weight" else "bias"), w
    if name == "bias":
        return "bias", w
    if kind.startswith("conv_optional"):
        kind = "conv"
    if kind == "conv":
        # torch (O, I, *k) — k may be fewer dims for 1x1; handle generally
        k = w.ndim - 2
        return "kernel", np.transpose(w, (*range(2, 2 + k), 1, 0))
    if kind == "conv1d_dense":
        return "kernel", w[:, :, 0].T
    if kind == "linear":
        return "kernel", w.T
    if kind == "embed":
        return "embedding", w
    raise ValueError(kind)


def _f2t_leaf(kind: str, name: str, w: np.ndarray):
    """flax leaf → (torch leaf name, array)."""
    if kind == "norm":
        return ("weight" if name == "scale" else "bias"), w
    if name == "bias":
        return "bias", w
    if kind.startswith("conv_optional"):
        kind = "conv"
    if kind == "conv":
        k = w.ndim - 2
        return "weight", np.transpose(w, (k + 1, k, *range(k)))
    if kind == "conv1d_dense":
        return "weight", w.T[:, :, None]
    if kind == "linear":
        return "weight", w.T
    if kind == "embed":
        return "weight", w
    raise ValueError(kind)


def _nest(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _flatten(tree, prefix="") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def torch_to_flax(state_dict: dict[str, np.ndarray], model) -> dict:
    """Convert a reference torch state_dict (tensor→numpy) to a Flax
    ``params`` tree for ``model`` (UNetModel, EncoderUNetModel or
    WavUNetModel). Raises on unconsumed/missing keys; aliased duplicate
    keys (wunet decoder) are verified equal to their primary."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    flat: dict[str, np.ndarray] = {}
    consumed = set()
    for tfull, ffull, leaf_kind, alias in _leaf_entries(model):
        for tname in ("weight", "bias"):
            tk = f"{tfull}.{tname}"
            if tk not in sd:
                if leaf_kind == "conv_optional" or (
                    tname == "bias" and leaf_kind == "embed"
                ):
                    continue
                raise KeyError(f"missing torch key {tk}")
            fname, arr = _t2f_leaf(leaf_kind, tname, sd[tk], model.dims)
            fk = f"{ffull}/{fname}"
            if alias:
                if fk not in flat or not np.array_equal(
                    flat[fk], arr.astype(np.float32)
                ):
                    raise ValueError(
                        f"aliased torch key {tk} disagrees with its primary "
                        f"({fk}) — not a reference-shaped wunet state_dict"
                    )
            else:
                flat[fk] = arr.astype(np.float32)
            consumed.add(tk)
    leftovers = set(sd) - consumed
    if leftovers:
        raise KeyError(f"unconsumed torch keys: {sorted(leftovers)[:8]} ...")
    return _nest(flat)


def flax_to_torch(params: dict, model) -> dict[str, np.ndarray]:
    """Inverse of :func:`torch_to_flax` (for `.pt` export). Wunet decoder
    aliases are re-emitted as duplicate keys, reproducing the reference's
    state_dict shape exactly."""
    flat = _flatten(params)
    out: dict[str, np.ndarray] = {}
    consumed = set()
    for tfull, ffull, leaf_kind, _alias in _leaf_entries(model):
        for fname in ("kernel", "bias", "scale", "embedding"):
            fk = f"{ffull}/{fname}"
            if fk not in flat:
                continue
            tname, arr = _f2t_leaf(leaf_kind, fname, flat[fk])
            out[f"{tfull}.{tname}"] = arr
            consumed.add(fk)
    leftovers = set(flat) - consumed
    if leftovers:
        raise KeyError(f"unconsumed flax keys: {sorted(leftovers)[:8]} ...")
    return out


def _check_ref_compat(model, direction: str) -> None:
    """Reference wunet checkpoints were trained WITH the decoder's aliased
    double-run (`wunet.py:647-673`); bridging them onto a
    ``ref_compat=False`` model loads cleanly but silently changes forward
    semantics. Warn loudly (tests exercise both settings deliberately)."""
    if isinstance(model, WavUNetModel) and not model.ref_compat:
        import warnings

        warnings.warn(
            f"{direction} a WavUNetModel with ref_compat=False: the "
            "reference decoder re-runs the previous ResBlock/Attention "
            "(`wunet.py:647-673`); reference-trained weights will produce "
            "different outputs on this model. Construct with "
            "ref_compat=True (factory default for use_freq=True) for "
            "reference-faithful forwards.",
            stacklevel=3,
        )


def load_torch_unet(path: str, model: UNetModel) -> dict:
    """Load a reference ``.pt`` checkpoint into Flax params (needs torch)."""
    import torch

    _check_ref_compat(model, "importing .pt weights into")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return torch_to_flax(sd, model)


def save_torch_unet(path: str, params: dict, model: UNetModel) -> None:
    """Export Flax params as a reference-compatible torch ``.pt``."""
    import torch

    _check_ref_compat(model, "exporting .pt weights from")

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch(params, model).items()}
    torch.save(sd, path)
