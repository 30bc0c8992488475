"""Model/diffusion construction — parity surface for
`/root/reference/guided_diffusion/script_util.py`.

The reference's flag schema (`model_and_diffusion_defaults`,
`script_util.py:70-104`) is kept verbatim so CLIs stay flag-compatible, but
construction returns (Flax module, GaussianDiffusion pytree) and the full
config dict travels with checkpoints instead of being encoded in filenames
(the reference parses hyperparameters back out of checkpoint FILENAMES,
`complete_dataset.py:107-127` — an anti-pattern this framework replaces).

The reference's sys.argv-scraping `get_sample_schedule_args`
(`script_util.py:1-18`) is intentionally not replicated: `sample_schedule`
is plumbed explicitly.
"""

from __future__ import annotations

import argparse
from ast import literal_eval
from typing import Any

from fast_cwdm_tpu.diffusion import schedules
from fast_cwdm_tpu.diffusion.gaussian import LossType, MeanType, VarType
from fast_cwdm_tpu.diffusion.respace import (
    create_spaced_diffusion,
    space_timesteps,
)
from fast_cwdm_tpu.models.unet import EncoderUNetModel, UNetModel
from fast_cwdm_tpu.models.wunet import WavUNetModel

NUM_CLASSES = 2


def diffusion_defaults() -> dict[str, Any]:
    """(`script_util.py:30-48`)"""
    return dict(
        learn_sigma=False,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
        dataset="brats",
        dims=3,
        num_groups=32,
        in_channels=1,
    )


def classifier_defaults() -> dict[str, Any]:
    """(`script_util.py:51-67`)"""
    return dict(
        image_size=64,
        classifier_use_fp16=False,
        classifier_width=128,
        classifier_depth=2,
        classifier_attention_resolutions="32,16,8",
        classifier_num_head_channels=64,
        classifier_use_scale_shift_norm=True,
        classifier_resblock_updown=True,
        classifier_pool="spatial",
        classifier_channel_mult="1,1,2,2,4,4",
        dataset="brats",
    )


def model_and_diffusion_defaults() -> dict[str, Any]:
    """Canonical flag schema (`script_util.py:70-104`)."""
    res = dict(
        image_size=64,
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_heads_upsample=-1,
        num_head_channels=-1,
        attention_resolutions="16,8",
        channel_mult="",
        dropout=0.0,
        class_cond=False,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_fp16=False,
        use_new_attention_order=False,
        dims=3,
        num_groups=32,
        in_channels=1,
        out_channels=0,  # automatically determine if 0
        bottleneck_attention=True,
        resample_2d=True,
        additive_skips=False,
        mode="default",
        use_freq=False,
        predict_xstart=False,
        sample_schedule="direct",
        # compute dtype ("", "float32", "bfloat16"): "" follows use_fp16
        # (False → fp32). TPU-native extension of the reference's
        # fp16 flags (`script_util.py:83`); see create_model's docstring.
        dtype="",
    )
    res.update(diffusion_defaults())
    return res


def _parse_channel_mult(channel_mult, image_size):
    """(`script_util.py:216-234`)"""
    if not channel_mult:
        presets = {
            512: (1, 1, 2, 2, 4, 4),
            256: (1, 2, 2, 4, 4, 4),
            128: (1, 2, 2, 4, 4),
            64: (1, 2, 3, 4),
        }
        if image_size not in presets:
            raise ValueError(f"[MODEL] Unsupported image size: {image_size}")
        return presets[image_size]
    if isinstance(channel_mult, str):
        return tuple(literal_eval(channel_mult))
    if isinstance(channel_mult, (tuple, list)):
        return tuple(channel_mult)
    raise ValueError(f"[MODEL] Value for {channel_mult=} not supported")


def _attention_ds(attention_resolutions, image_size):
    """(`script_util.py:236-239`)"""
    attention_ds = []
    if attention_resolutions:
        for res in str(attention_resolutions).split(","):
            attention_ds.append(image_size // int(res))
    return tuple(attention_ds)


def create_model(
    image_size,
    num_channels,
    num_res_blocks,
    channel_mult="",
    learn_sigma=False,
    class_cond=False,
    use_checkpoint=False,
    attention_resolutions="16",
    num_heads=1,
    num_head_channels=-1,
    num_heads_upsample=-1,
    use_scale_shift_norm=False,
    dropout=0.0,
    resblock_updown=True,
    use_fp16=False,
    use_new_attention_order=False,
    num_groups=32,
    dims=3,
    in_channels=1,
    out_channels=0,
    bottleneck_attention=True,
    resample_2d=True,
    additive_skips=False,
    use_freq=False,
    dtype=None,
    remat_max_ds=None,
):
    """Flag-compatible model constructor (`script_util.py:190-292`).

    Precision: ``dtype`` sets the compute dtype (params stay float32;
    GroupNorm statistics stay float32 regardless — `models/nn.py`). The
    reference's ``use_fp16`` flag (GradScaler mixed precision there,
    `train_util.py:384-394`) maps to its TPU-native equivalent, bfloat16
    compute, when no explicit ``dtype`` is given — it is honored, not
    silently ignored. ``dtype`` accepts jnp dtypes or the strings
    "bfloat16"/"float32" (CLI flag form). None means follow-the-input
    (float32 in every CLI path) unless ``use_fp16`` is stored in the
    config; an explicit "float32" forces fp32 even then (`--dtype
    float32` must win over a checkpoint's use_fp16=True).
    """
    import jax.numpy as jnp

    if isinstance(dtype, str):
        try:
            dtype = {
                "": None,
                "none": None,
                # explicit jnp.float32 (not None): suppresses the use_fp16
                # fallback below; the model treats it identically to
                # follow-the-input since every CLI feeds f32 inputs
                "float32": jnp.float32,
                "bfloat16": jnp.bfloat16,
            }[dtype.lower()]
        except KeyError:
            raise ValueError(
                f"[MODEL] dtype must be '', 'float32' or 'bfloat16' "
                f"(fp16 has no TPU fast path; got {dtype!r})"
            ) from None
    if dtype is None and use_fp16:
        dtype = jnp.bfloat16
    channel_mult = _parse_channel_mult(channel_mult, image_size)
    attention_ds = _attention_ds(attention_resolutions, image_size)
    if out_channels == 0:
        # Deviation (documented): the reference doubles twice on the auto
        # path — `script_util.py:240-241` sets 2*in_channels for
        # learn_sigma, then the constructor call multiplies by 2 AGAIN
        # (`script_util.py:248`), yielding 4*in_channels and a broken
        # LEARNED_RANGE split. Auto means "data channels"; the single
        # learn_sigma doubling below is the correct one.
        out_channels = in_channels
    common = dict(
        num_classes=(NUM_CLASSES if class_cond else None),
        image_size=image_size,
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=out_channels * (2 if learn_sigma else 1),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
        dims=dims,
        num_groups=num_groups,
        bottleneck_attention=bottleneck_attention,
        additive_skips=additive_skips,
        resample_2d=resample_2d,
        dtype=dtype,
    )
    if use_freq:
        # ref_compat=True: flag-compatible construction must reproduce the
        # reference decoder's aliased double-run (`wunet.py:647-673`), or
        # imported reference `.pt` weights would silently run with different
        # forward semantics than they were trained under
        return WavUNetModel(use_freq=True, ref_compat=True, **common)
    return UNetModel(
        conv_resample=True,
        # selective remat: with use_checkpoint, recompute only the
        # full-resolution blocks in the backward pass — deeper levels hold
        # ≤1/8 the activation bytes, so saving them costs little HBM and
        # skips their recompute (production train step 651.8 → 635.9 ms
        # device time; no-remat OOMs the chip — PERF.md round 2).
        # remat_max_ds=0 remats EVERY block (~16 ms/step slower, several
        # GB less live activation memory) — the right trade when HBM is
        # needed elsewhere, e.g. a --device_cache pinned dataset.
        remat_max_ds=(1 if remat_max_ds is None else int(remat_max_ds)),
        **common,
    )


def create_gaussian_diffusion(
    *,
    steps=1000,
    learn_sigma=False,
    sigma_small=False,
    noise_schedule="linear",
    use_kl=False,
    predict_xstart=False,
    rescale_timesteps=False,
    rescale_learned_sigmas=False,
    timestep_respacing="",
    mode="default",
    sample_schedule="direct",
    wavelet="haar",
    **unused,
):
    """(`script_util.py:529-576`)"""
    betas = schedules.get_named_beta_schedule(
        noise_schedule, steps, sample_schedule
    )
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not timestep_respacing:
        timestep_respacing = [steps]
    return create_spaced_diffusion(
        use_timesteps=space_timesteps(steps, timestep_respacing),
        betas=betas,
        mean_type=(MeanType.START_X if predict_xstart else MeanType.EPSILON),
        var_type=(
            (VarType.FIXED_LARGE if not sigma_small else VarType.FIXED_SMALL)
            if not learn_sigma
            else VarType.LEARNED_RANGE
        ),
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
        mode=mode,
        wavelet=wavelet,
    )


def create_model_and_diffusion(**cfg):
    """(`script_util.py:113-187`) — accepts the full
    `model_and_diffusion_defaults()` key set (extra keys ignored the way the
    reference's ``**kwargs`` pop does)."""
    defaults = model_and_diffusion_defaults()
    merged = {**defaults, **cfg}
    model = create_model(
        merged["image_size"],
        merged["num_channels"],
        merged["num_res_blocks"],
        channel_mult=merged["channel_mult"],
        learn_sigma=merged["learn_sigma"],
        class_cond=merged["class_cond"],
        use_checkpoint=merged["use_checkpoint"],
        attention_resolutions=merged["attention_resolutions"],
        num_heads=merged["num_heads"],
        num_head_channels=merged["num_head_channels"],
        num_heads_upsample=merged["num_heads_upsample"],
        use_scale_shift_norm=merged["use_scale_shift_norm"],
        dropout=merged["dropout"],
        resblock_updown=merged["resblock_updown"],
        use_fp16=merged["use_fp16"],
        use_new_attention_order=merged["use_new_attention_order"],
        dims=merged["dims"],
        num_groups=merged["num_groups"],
        in_channels=merged["in_channels"],
        out_channels=merged["out_channels"],
        bottleneck_attention=merged["bottleneck_attention"],
        resample_2d=merged["resample_2d"],
        additive_skips=merged["additive_skips"],
        use_freq=merged["use_freq"],
        dtype=merged.get("dtype"),
        remat_max_ds=merged.get("remat_max_ds"),
    )
    diffusion = create_gaussian_diffusion(
        steps=merged["diffusion_steps"],
        learn_sigma=merged["learn_sigma"],
        noise_schedule=merged["noise_schedule"],
        use_kl=merged["use_kl"],
        predict_xstart=merged["predict_xstart"],
        rescale_timesteps=merged["rescale_timesteps"],
        rescale_learned_sigmas=merged["rescale_learned_sigmas"],
        timestep_respacing=merged["timestep_respacing"],
        mode=merged["mode"],
        sample_schedule=merged["sample_schedule"],
    )
    return model, diffusion


def create_classifier(
    image_size,
    classifier_use_fp16,
    classifier_width,
    classifier_depth,
    classifier_attention_resolutions,
    classifier_use_scale_shift_norm,
    classifier_resblock_updown,
    classifier_pool,
    dataset="brats",
    num_groups=32,
    dims=3,
    in_channels=1,
    num_head_channels=64,
    classifier_channel_mult="",
):
    """(`script_util.py:349-408`)"""
    channel_mult = classifier_channel_mult
    if not channel_mult:
        presets = {
            256: (1, 1, 2, 2, 4, 4),
            128: (1, 1, 2, 3, 4),
            64: (1, 2, 3, 4),
        }
        if image_size not in presets:
            raise ValueError(f"unsupported image size: {image_size}")
        channel_mult = presets[image_size]
    elif isinstance(channel_mult, str):
        channel_mult = tuple(literal_eval(channel_mult))
    return EncoderUNetModel(
        image_size=image_size,
        in_channels=in_channels,
        model_channels=classifier_width,
        out_channels=2,
        num_res_blocks=classifier_depth,
        attention_resolutions=_attention_ds(
            classifier_attention_resolutions, image_size
        ),
        channel_mult=channel_mult,
        num_head_channels=num_head_channels,
        use_scale_shift_norm=classifier_use_scale_shift_norm,
        resblock_updown=classifier_resblock_updown,
        pool=classifier_pool,
        num_groups=num_groups,
        dims=dims,
    )


def classifier_and_diffusion_defaults() -> dict[str, Any]:
    """(`script_util.py:107-110`)"""
    res = classifier_defaults()
    res.update(diffusion_defaults())
    return res


def create_classifier_and_diffusion(**cfg):
    """(`script_util.py:295-346`)"""
    merged = {**classifier_and_diffusion_defaults(), **cfg}
    classifier = create_classifier(
        merged["image_size"],
        merged["classifier_use_fp16"],
        merged["classifier_width"],
        merged["classifier_depth"],
        merged["classifier_attention_resolutions"],
        merged["classifier_use_scale_shift_norm"],
        merged["classifier_resblock_updown"],
        merged["classifier_pool"],
        merged["dataset"],
        dims=merged["dims"],
        num_groups=merged["num_groups"],
        in_channels=merged["in_channels"],
        num_head_channels=merged["classifier_num_head_channels"],
        classifier_channel_mult=merged["classifier_channel_mult"],
    )
    diffusion = create_gaussian_diffusion(
        steps=merged["diffusion_steps"],
        learn_sigma=merged["learn_sigma"],
        noise_schedule=merged["noise_schedule"],
        use_kl=merged["use_kl"],
        predict_xstart=merged["predict_xstart"],
        rescale_timesteps=merged["rescale_timesteps"],
        rescale_learned_sigmas=merged["rescale_learned_sigmas"],
        timestep_respacing=merged["timestep_respacing"],
    )
    return classifier, diffusion


def sr_model_and_diffusion_defaults() -> dict[str, Any]:
    """(`script_util.py:411-419`)"""
    res = model_and_diffusion_defaults()
    res["large_size"] = 256
    res["small_size"] = 64
    for k in ("image_size", "channel_mult", "out_channels", "in_channels"):
        res.pop(k, None)
    return res


def sr_create_model_and_diffusion(**cfg):
    """Super-resolution factory (`script_util.py:422-526`): a 2D
    `SuperResModel` conditioned on the bilinear-upsampled low-res image."""
    from fast_cwdm_tpu.models.unet import SuperResModel

    merged = {**sr_model_and_diffusion_defaults(), **cfg}
    large = merged["large_size"]
    presets = {512: (1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
               64: (1, 2, 3, 4)}
    if large not in presets:
        raise ValueError(f"unsupported large size: {large}")
    unet = UNetModel(
        image_size=large,
        in_channels=6,  # 3 + 3 upsampled low-res
        model_channels=merged["num_channels"],
        out_channels=(3 if not merged["learn_sigma"] else 6),
        num_res_blocks=merged["num_res_blocks"],
        attention_resolutions=_attention_ds(
            merged["attention_resolutions"], large
        ),
        dropout=merged["dropout"],
        channel_mult=presets[large],
        num_classes=(NUM_CLASSES if merged["class_cond"] else None),
        dims=2,
        num_heads=merged["num_heads"],
        num_head_channels=merged["num_head_channels"],
        num_heads_upsample=merged["num_heads_upsample"],
        use_scale_shift_norm=merged["use_scale_shift_norm"],
        resblock_updown=merged["resblock_updown"],
        num_groups=merged.get("num_groups", 32),
    )
    model = SuperResModel(unet=unet)
    diffusion = create_gaussian_diffusion(
        steps=merged["diffusion_steps"],
        learn_sigma=merged["learn_sigma"],
        noise_schedule=merged["noise_schedule"],
        use_kl=merged["use_kl"],
        predict_xstart=merged["predict_xstart"],
        rescale_timesteps=merged["rescale_timesteps"],
        rescale_learned_sigmas=merged["rescale_learned_sigmas"],
        timestep_respacing=merged["timestep_respacing"],
    )
    return model, diffusion


# ---------------------------------------------------------------------------
# argparse plumbing (`script_util.py:579-604`)
# ---------------------------------------------------------------------------


def add_dict_to_argparser(parser: argparse.ArgumentParser, default_dict):
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args, keys):
    return {k: getattr(args, k) for k in keys}


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")
