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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--golden-dir",
        default=os.path.join(os.path.dirname(__file__), "..", "tests", "golden"),
    )
    ap.add_argument("--which", nargs="*", default=["wunet", "encoder"])
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE)
    _install_pywt_stub()
    os.makedirs(args.golden_dir, exist_ok=True)

    if "wunet" in args.which:
        gen_wunet(os.path.join(args.golden_dir, "wunet_tiny_torch.npz"))
    if "encoder" in args.which:
        gen_encoder(os.path.join(args.golden_dir, "encoder_tiny_torch.npz"))


if __name__ == "__main__":
    main()
