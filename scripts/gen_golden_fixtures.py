"""Regenerate `tests/golden/*.npz` torch fixtures by EXECUTING the reference.

Maintainer tool — requires the reference checkout at /root/reference (not
shipped with the framework). Each fixture stores a random-weight state_dict,
an input batch, and the reference forward output; the bridge tests import
the weights and match the forward to pin full-model numerics.

No reference code is copied here; the reference modules are imported and
run as-is (with a minimal `pywt` stub, since only the Haar filter bank is
needed and pywt is not installed in this image).
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

REFERENCE = "/root/reference"


def _install_pywt_stub():
    """`DWT_IDWT_layer` imports pywt only for `Wavelet(name).rec_lo/...`;
    provide orthonormal Haar analytically (pywt conventions)."""
    if "pywt" in sys.modules:
        return
    s = 1.0 / np.sqrt(2.0)

    class Wavelet:
        def __init__(self, name):
            assert name in ("haar", "db1"), name
            self.dec_lo = [s, s]
            self.dec_hi = [-s, s]
            self.rec_lo = [s, s]
            self.rec_hi = [s, -s]

    mod = types.ModuleType("pywt")
    mod.Wavelet = Wavelet
    sys.modules["pywt"] = mod


def _install_side_stubs():
    """gaussian_diffusion.py imports torchvision/train_util (→ wandb) at
    module level for logging helpers unused in the numeric path."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = lambda *a, **k: None
        tv.utils = tvu
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Compose = lambda *a, **k: (lambda x: x)
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
        sys.modules["torchvision.transforms"] = tvt
    if "wandb" not in sys.modules:
        wb = types.ModuleType("wandb")
        wb.log = lambda *a, **k: None
        wb.init = lambda *a, **k: None
        wb.Image = lambda *a, **k: None
        sys.modules["wandb"] = wb
    if "blobfile" not in sys.modules:
        bf = types.ModuleType("blobfile")
        bf.BlobFile = open
        bf.join = lambda *a: "/".join(a)
        sys.modules["blobfile"] = bf


def _state_dict_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def gen_wunet(out_path: str):
    import torch

    from guided_diffusion.wunet import WavUNetModel  # reference

    torch.manual_seed(7)
    model = WavUNetModel(
        image_size=16,
        in_channels=8,
        model_channels=16,
        out_channels=8,
        num_res_blocks=1,
        attention_resolutions=(),
        # the reference decoder re-runs the previous level's ResBlock inside
        # each upsample block (`wunet.py:647-673` mutates the prior `layers`
        # list), so its forward CRASHES whenever the channel width changes
        # between levels; constant mult is the only executable reference
        # config (this framework's default semantics run each block once —
        # see models/wunet.py; `ref_compat=True` reproduces the double-run)
        channel_mult=(1, 1),
        dims=3,
        num_groups=8,
        resblock_updown=True,
        # the reference's middle loop calls every child as module(h, emb)
        # (`wunet.py:761-764`), which crashes AttentionBlock — wunet
        # bottleneck attention is executable only in THIS framework
        bottleneck_attention=False,
        resample_2d=False,
        use_freq=True,
        progressive_input="residual",
    )
    model.eval()
    x = torch.randn(2, 8, 16, 16, 16)
    t = torch.tensor([3, 7])
    with torch.no_grad():
        y = model(x, t)
    blob = {f"sd.{k}": v for k, v in _state_dict_numpy(model).items()}
    blob["__x__"] = x.numpy()
    blob["__t__"] = t.numpy()
    blob["__y__"] = y.numpy()
    np.savez(out_path, **blob)
    print(f"wrote {out_path}: y shape {y.shape}, {len(blob) - 3} sd keys")


def gen_encoder(out_path: str):
    import torch

    from guided_diffusion.unet import EncoderUNetModel  # reference

    torch.manual_seed(11)
    model = EncoderUNetModel(
        image_size=16,
        in_channels=8,
        model_channels=16,
        out_channels=5,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        dims=2,
        num_groups=8,
        resblock_updown=True,
        pool="adaptive",
        resample_2d=True,
        num_heads=2,
    )
    model.eval()
    x = torch.randn(2, 8, 16, 16)
    t = torch.tensor([3, 7])
    with torch.no_grad():
        y = model(x, t)
    blob = {f"sd.{k}": v for k, v in _state_dict_numpy(model).items()}
    blob["__x__"] = x.numpy()
    blob["__t__"] = t.numpy()
    blob["__y__"] = y.numpy()
    np.savez(out_path, **blob)
    print(f"wrote {out_path}: y shape {y.shape}, {len(blob) - 3} sd keys")


def gen_diffusion_trace(out_path: str):
    """Seeded 10-step 'sampled'-schedule ancestral chain through a tiny
    reference UNet in i2i mode (production flags: predict_xstart → START_X,
    FIXED_LARGE, clip_denoised idwt→clamp→dwt round trip). Noise is
    injected explicitly per step, so the whole L3 numerical core is pinned
    without RNG coupling."""
    import torch

    from guided_diffusion.script_util import create_gaussian_diffusion
    from guided_diffusion.unet import UNetModel

    torch.manual_seed(21)
    T = 10
    diff = create_gaussian_diffusion(
        steps=T,
        learn_sigma=False,
        noise_schedule="linear",
        predict_xstart=True,
        rescale_timesteps=False,
        timestep_respacing="",
        mode="i2i",
        sample_schedule="sampled",
    )
    model = UNetModel(
        image_size=16,
        in_channels=16,  # 8 noisy-target subbands + 8 condition subbands
        model_channels=16,
        out_channels=8,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=3,
        num_groups=8,
        resblock_updown=True,
        bottleneck_attention=False,
        resample_2d=False,
    )
    model.to("cpu")  # populates model.devices (asserted in forward)
    model.eval()

    x_init = torch.randn(1, 8, 16, 16, 16)
    cond = torch.randn(1, 8, 16, 16, 16)
    noises = torch.randn(T, 1, 8, 16, 16, 16)
    x = x_init
    steps = []
    with torch.no_grad():
        for k, i in enumerate(range(T - 1, -1, -1)):
            t = torch.tensor([i])
            out = diff.p_mean_variance(
                model, x, t, clip_denoised=True, cond=cond
            )
            mask = 0.0 if i == 0 else 1.0
            x = out["mean"] + mask * torch.exp(
                0.5 * out["log_variance"]
            ) * noises[k]
            steps.append(x.numpy().copy())

    blob = {f"sd.{k}": v for k, v in _state_dict_numpy(model).items()}
    blob["__x_init__"] = x_init.numpy()
    blob["__cond__"] = cond.numpy()
    blob["__noises__"] = noises.numpy()
    blob["__steps__"] = np.stack(steps)
    np.savez(out_path, **blob)
    print(f"wrote {out_path}: {len(steps)} steps")


def gen_training_losses(out_path: str):
    """One i2i training_losses evaluation with deterministic noise
    (`gaussian_diffusion.py:1084-1166` ignores its noise arg and redraws at
    :1143 — randn_like is patched for the call). Pins the training
    objective: condition DWTs + LLL/3, x_start DWT, image-space noise DWT,
    q_sample, the 32-channel concat, and the per-subband MSE."""
    import torch

    import guided_diffusion.gaussian_diffusion as gdm
    from guided_diffusion.script_util import create_gaussian_diffusion
    from guided_diffusion.unet import UNetModel

    torch.manual_seed(33)
    T = 10
    diff = create_gaussian_diffusion(
        steps=T,
        learn_sigma=False,
        noise_schedule="linear",
        predict_xstart=True,
        rescale_timesteps=False,
        timestep_respacing="",
        mode="i2i",
        sample_schedule="sampled",
    )
    model = UNetModel(
        image_size=16,
        in_channels=32,  # 8 target + 3x8 condition subbands
        model_channels=16,
        out_channels=8,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=3,
        num_groups=8,
        resblock_updown=True,
        bottleneck_attention=False,
        resample_2d=False,
    )
    model.to("cpu")
    model.eval()

    mods = ["t1n", "t1c", "t2w", "t2f"]
    batch = {m: torch.rand(2, 1, 16, 16, 16) for m in mods}
    t = torch.tensor([3, 7])
    noise = torch.randn(2, 1, 16, 16, 16)

    orig = gdm.th.randn_like
    gdm.th.randn_like = lambda x: noise
    try:
        with torch.no_grad():
            # model_kwargs must be non-None: the reference's i2i branch is an
            # `elif` of `model_kwargs is None` (`gaussian_diffusion.py:
            # 1099-1102`) and is silently skipped otherwise
            terms, model_output, model_output_idwt = diff.training_losses(
                model, batch, t, model_kwargs={}, mode="i2i", contr="t1n"
            )
    finally:
        gdm.th.randn_like = orig

    blob = {f"sd.{k}": v for k, v in _state_dict_numpy(model).items()}
    for m in mods:
        blob[f"__batch_{m}__"] = batch[m].numpy()
    blob["__t__"] = t.numpy()
    blob["__noise__"] = noise.numpy()
    blob["__mse_wav__"] = terms["mse_wav"].numpy()
    blob["__model_output__"] = model_output.numpy()
    blob["__model_output_idwt__"] = model_output_idwt.numpy()
    np.savez(out_path, **blob)
    print(f"wrote {out_path}: mse_wav {terms['mse_wav'].numpy()}")


def gen_ddim_trace(out_path: str):
    """Deterministic (eta=0) 10-step DDIM chain, mode='default' — the only
    executable reference DDIM configuration: mode='i2i' raises
    NotImplementedError (`gaussian_diffusion.py:752-757`), the
    `sampling_steps` interp path crashes on removed `np.float` (`:763`),
    and eta>0 is broken anyway (the noisy sample is computed then DISCARDED
    — `:784` returns `mean_pred`)."""
    import torch

    from guided_diffusion.script_util import create_gaussian_diffusion
    from guided_diffusion.unet import UNetModel

    torch.manual_seed(43)
    T = 10
    diff = create_gaussian_diffusion(
        steps=T,
        learn_sigma=False,
        noise_schedule="linear",
        predict_xstart=True,
        rescale_timesteps=False,
        timestep_respacing="",
        mode="default",
        sample_schedule="sampled",
    )
    model = UNetModel(
        image_size=16,
        in_channels=8,
        model_channels=16,
        out_channels=8,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=3,
        num_groups=8,
        resblock_updown=True,
        bottleneck_attention=False,
        resample_2d=False,
    )
    model.to("cpu")
    model.eval()

    x_init = torch.randn(1, 8, 16, 16, 16)
    x = x_init
    steps = []
    with torch.no_grad():
        for i in range(T - 1, -1, -1):
            out = diff.ddim_sample(
                model, x, torch.tensor([i]), clip_denoised=True, eta=0.0
            )
            x = out["sample"]
            steps.append(x.numpy().copy())

    blob = {f"sd.{k}": v for k, v in _state_dict_numpy(model).items()}
    blob["__x_init__"] = x_init.numpy()
    blob["__steps__"] = np.stack(steps)
    np.savez(out_path, **blob)
    print(f"wrote {out_path}: {len(steps)} ddim steps")


def gen_prod_unet(out_path: str):
    """Production-channel-config parity fixture (`run.sh:61-66`: 81.5M-param
    UNetModel — in 32, model 64, mult (1,2,2,4,4), 2 res blocks, no
    attention, resblock_updown) at reduced spatial size (image 32³ → latent
    16³), with weights REGENERATED deterministically from the torch key
    names (`fast_cwdm_tpu.utils.testing.seeded_state_dict`) so the fixture
    stores only inputs/outputs, not a ~326 MB state_dict.

    Pins three things at the config that matters:
    * the bridge layout walk over all 5 levels (`training/bridge.py`);
    * the full-model forward numerics;
    * the i2i `training_losses` + clip-denoised `p_mean_variance` paths
      (`gaussian_diffusion.py:1084-1166`, `:269-420`).
    """
    import torch

    import guided_diffusion.gaussian_diffusion as gdm
    from guided_diffusion.script_util import create_gaussian_diffusion
    from guided_diffusion.unet import UNetModel

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fast_cwdm_tpu.utils.testing import seeded_state_dict

    torch.manual_seed(57)
    model = UNetModel(
        image_size=16,
        in_channels=32,
        model_channels=64,
        out_channels=8,
        num_res_blocks=2,
        attention_resolutions=(),
        channel_mult=(1, 2, 2, 4, 4),
        dims=3,
        num_groups=32,
        resblock_updown=True,
        bottleneck_attention=False,
        resample_2d=False,
    )
    sd = seeded_state_dict(
        {k: tuple(v.shape) for k, v in model.state_dict().items()}
    )
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    n_params = sum(v.numel() for v in model.parameters())
    model.to("cpu")
    model.eval()

    blob = {"__n_params__": np.array(n_params)}

    # 1) plain forward
    x = torch.randn(1, 32, 16, 16, 16)
    t = torch.tensor([3])
    with torch.no_grad():
        y = model(x, t)
    blob["__x__"] = x.numpy()
    blob["__t__"] = t.numpy()
    blob["__y__"] = y.numpy()

    # 2) i2i training_losses (production diffusion flags)
    T = 10
    diff = create_gaussian_diffusion(
        steps=T,
        learn_sigma=False,
        noise_schedule="linear",
        predict_xstart=True,
        rescale_timesteps=False,
        timestep_respacing="",
        mode="i2i",
        sample_schedule="sampled",
    )
    mods = ["t1n", "t1c", "t2w", "t2f"]
    batch = {m: torch.rand(1, 1, 32, 32, 32) for m in mods}
    tl_t = torch.tensor([7])
    noise = torch.randn(1, 1, 32, 32, 32)
    orig = gdm.th.randn_like
    gdm.th.randn_like = lambda _x: noise
    try:
        with torch.no_grad():
            terms, model_output, _ = diff.training_losses(
                model, batch, tl_t, model_kwargs={}, mode="i2i", contr="t1c"
            )
    finally:
        gdm.th.randn_like = orig
    for m in mods:
        blob[f"__batch_{m}__"] = batch[m].numpy()
    blob["__tl_t__"] = tl_t.numpy()
    blob["__noise__"] = noise.numpy()
    blob["__mse_wav__"] = terms["mse_wav"].numpy()
    blob["__model_output__"] = model_output.numpy()

    # 3) one clip-denoised p_mean_variance step (idwt→clamp→dwt round trip)
    pmv_x = torch.randn(1, 8, 16, 16, 16)
    cond = torch.randn(1, 24, 16, 16, 16)
    pmv_t = torch.tensor([5])
    with torch.no_grad():
        out = diff.p_mean_variance(
            model, pmv_x, pmv_t, clip_denoised=True, cond=cond
        )
    blob["__pmv_x__"] = pmv_x.numpy()
    blob["__cond__"] = cond.numpy()
    blob["__pmv_t__"] = pmv_t.numpy()
    blob["__pmv_mean__"] = out["mean"].numpy()
    blob["__pmv_log_variance__"] = out["log_variance"].numpy()
    blob["__pmv_pred_xstart__"] = out["pred_xstart"].numpy()

    np.savez_compressed(out_path, **blob)
    print(
        f"wrote {out_path}: {n_params} params, "
        f"mse_wav {terms['mse_wav'].numpy()}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--golden-dir",
        default=os.path.join(os.path.dirname(__file__), "..", "tests", "golden"),
    )
    ap.add_argument(
        "--which",
        nargs="*",
        default=["wunet", "encoder", "diffusion", "training", "ddim", "prod"],
    )
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE)
    _install_pywt_stub()
    _install_side_stubs()
    os.makedirs(args.golden_dir, exist_ok=True)

    if "wunet" in args.which:
        gen_wunet(os.path.join(args.golden_dir, "wunet_tiny_torch.npz"))
    if "encoder" in args.which:
        gen_encoder(os.path.join(args.golden_dir, "encoder_tiny_torch.npz"))
    if "diffusion" in args.which:
        gen_diffusion_trace(
            os.path.join(args.golden_dir, "diffusion_trace_torch.npz")
        )
    if "training" in args.which:
        gen_training_losses(
            os.path.join(args.golden_dir, "training_losses_torch.npz")
        )
    if "ddim" in args.which:
        gen_ddim_trace(
            os.path.join(args.golden_dir, "ddim_trace_torch.npz")
        )
    if "prod" in args.which:
        gen_prod_unet(
            os.path.join(args.golden_dir, "prod_unet_torch.npz")
        )


if __name__ == "__main__":
    main()
