"""Torch-checkpoint bridge tests.

`tests/golden/unet_tiny_torch.npz` holds a reference torch `UNetModel`
state_dict (random weights), an input batch, and the reference forward
output, generated once from `/root/reference/guided_diffusion/unet.py` with
torch on CPU. Importing those weights through the bridge and matching the
forward output to ~1e-7 pins the FULL model numerics (GroupNorm eps, SiLU,
conv padding, legacy attention order, timestep embedding, skip bookkeeping)
to the reference.
"""

import os

import numpy as np
import pytest

from fast_cwdm_tpu.models import UNetModel
from fast_cwdm_tpu.training.bridge import flax_to_torch, torch_to_flax

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "unet_tiny_torch.npz")

TINY_CFG = dict(
    image_size=16,
    in_channels=8,
    model_channels=16,
    out_channels=8,
    num_res_blocks=1,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    dims=3,
    num_groups=8,
    resblock_updown=True,
    bottleneck_attention=True,
    resample_2d=False,
    num_heads=2,
)


@pytest.fixture(scope="module")
def golden():
    data = np.load(GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return data, sd


def test_forward_parity_with_torch_reference(golden):
    import jax.numpy as jnp

    data, sd = golden
    m = UNetModel(**TINY_CFG)
    params = torch_to_flax(sd, m)
    x = np.transpose(data["__x__"], (0, 2, 3, 4, 1))  # NCDHW → NDHWC
    y = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(data["__t__"]))
    y_ref = np.transpose(data["__y__"], (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_roundtrip_exact(golden):
    _, sd = golden
    m = UNetModel(**TINY_CFG)
    params = torch_to_flax(sd, m)
    sd2 = flax_to_torch(params, m)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k])


def test_roundtrip_parameterless_resample():
    """conv_resample=False + resblock_updown=False: the Down/Upsample
    layers have NO parameters on either side (avg-pool / interpolate,
    `unet.py:92-100`) — the layout must not demand conv leaves for them."""
    import jax
    import jax.numpy as jnp

    cfg = dict(
        TINY_CFG,
        resblock_updown=False,
        conv_resample=False,
        attention_resolutions=(),
        bottleneck_attention=False,
    )
    m = UNetModel(**cfg)
    x = jnp.zeros((1, 8, 8, 8, 8))
    params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))[
        "params"
    ]
    sd = flax_to_torch(params, m)
    assert not any(".op." in k or ".2.conv." in k for k in sd), sorted(sd)[:8]
    params2 = torch_to_flax(sd, m)
    a, b = jax.tree.leaves(params), jax.tree.leaves(params2)
    assert len(a) == len(b)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_missing_key_raises(golden):
    _, sd = golden
    m = UNetModel(**TINY_CFG)
    broken = dict(sd)
    broken.pop("middle_block.0.in_layers.2.weight")
    with pytest.raises(KeyError):
        torch_to_flax(broken, m)


def test_unconsumed_key_raises(golden):
    _, sd = golden
    m = UNetModel(**TINY_CFG)
    extra = dict(sd)
    extra["bogus.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        torch_to_flax(extra, m)


def test_convert_checkpoint_cli_roundtrip(golden, tmp_path):
    """`.pt` → `.ckpt` → `.pt` through the conversion CLI preserves every
    tensor bit-exactly."""
    import torch

    from fast_cwdm_tpu.cli import convert_checkpoint

    _, sd = golden
    src_pt = str(tmp_path / "ref.pt")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, src_pt)

    tiny_flags = [
        "--image_size=16", "--num_channels=16", "--num_res_blocks=1",
        "--channel_mult=1,2", "--attention_resolutions=8",
        "--in_channels=8", "--out_channels=8", "--num_groups=8",
        "--bottleneck_attention=True", "--resample_2d=False",
    ]
    ck = str(tmp_path / "x.ckpt")
    convert_checkpoint.main(
        [f"--src={src_pt}", f"--dst={ck}"] + tiny_flags
    )
    out_pt = str(tmp_path / "back.pt")
    convert_checkpoint.main(
        [f"--src={ck}", f"--dst={out_pt}"] + tiny_flags
    )
    back = torch.load(out_pt, weights_only=True)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k].numpy(), sd[k])


# ---------------------------------------------------------------------------
# WavUNetModel bridge (golden: tests/golden/wunet_tiny_torch.npz)
# ---------------------------------------------------------------------------

WUNET_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "wunet_tiny_torch.npz"
)

# constant channel width: the ONLY executable reference wunet shape — its
# decoder re-runs the previous ResBlock inside each upsample block
# (`wunet.py:647-673`), which crashes when the level changes channels
WUNET_TINY_CFG = dict(
    image_size=16,
    in_channels=8,
    model_channels=16,
    out_channels=8,
    num_res_blocks=1,
    attention_resolutions=(),
    channel_mult=(1, 1),
    dims=3,
    num_groups=8,
    resblock_updown=True,
    bottleneck_attention=False,
    resample_2d=False,
    use_freq=True,
    progressive_input="residual",
)


@pytest.fixture(scope="module")
def wunet_golden():
    data = np.load(WUNET_GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return data, sd


class TestWavUNetBridge:
    def test_forward_parity_ref_compat(self, wunet_golden):
        """Imported weights + ref_compat double-run reproduce the executed
        reference forward."""
        import jax.numpy as jnp

        from fast_cwdm_tpu.models.wunet import WavUNetModel

        data, sd = wunet_golden
        m = WavUNetModel(**WUNET_TINY_CFG, ref_compat=True)
        params = torch_to_flax(sd, m)
        x = np.transpose(data["__x__"], (0, 2, 3, 4, 1))
        y = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(data["__t__"]))
        y_ref = np.transpose(data["__y__"], (0, 2, 3, 4, 1))
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)

    def test_roundtrip_exact_with_aliases(self, wunet_golden):
        """Export reproduces the reference state_dict shape exactly,
        including the duplicated (aliased) decoder keys."""
        from fast_cwdm_tpu.models.wunet import WavUNetModel

        _, sd = wunet_golden
        m = WavUNetModel(**WUNET_TINY_CFG)
        params = torch_to_flax(sd, m)
        sd2 = flax_to_torch(params, m)
        assert set(sd2) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(sd2[k], sd[k])

    def test_alias_mismatch_raises(self, wunet_golden):
        from fast_cwdm_tpu.models.wunet import WavUNetModel

        _, sd = wunet_golden
        m = WavUNetModel(**WUNET_TINY_CFG)
        # find an aliased decoder key (a duplicate of out_res primary)
        broken = dict(sd)
        broken["output_blocks.1.0.in_layers.2.weight"] = (
            broken["output_blocks.1.0.in_layers.2.weight"] + 1.0
        )
        with pytest.raises(ValueError):
            torch_to_flax(broken, m)


# ---------------------------------------------------------------------------
# EncoderUNetModel bridge (golden: tests/golden/encoder_tiny_torch.npz)
# ---------------------------------------------------------------------------

ENCODER_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "encoder_tiny_torch.npz"
)

ENCODER_TINY_CFG = dict(
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


@pytest.fixture(scope="module")
def encoder_golden():
    data = np.load(ENCODER_GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return data, sd


class TestEncoderBridge:
    def test_forward_parity(self, encoder_golden):
        import jax.numpy as jnp

        from fast_cwdm_tpu.models.unet import EncoderUNetModel

        data, sd = encoder_golden
        m = EncoderUNetModel(**ENCODER_TINY_CFG)
        params = torch_to_flax(sd, m)
        x = np.transpose(data["__x__"], (0, 2, 3, 1))  # NCHW → NHWC
        y = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(data["__t__"]))
        np.testing.assert_allclose(np.asarray(y), data["__y__"], atol=1e-5)

    def test_roundtrip_exact(self, encoder_golden):
        from fast_cwdm_tpu.models.unet import EncoderUNetModel

        _, sd = encoder_golden
        m = EncoderUNetModel(**ENCODER_TINY_CFG)
        params = torch_to_flax(sd, m)
        sd2 = flax_to_torch(params, m)
        assert set(sd2) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(sd2[k], sd[k])

    def test_non_adaptive_pool_unsupported(self, encoder_golden):
        from fast_cwdm_tpu.models.unet import EncoderUNetModel

        _, sd = encoder_golden
        cfg = dict(ENCODER_TINY_CFG, pool="spatial")
        with pytest.raises(NotImplementedError):
            torch_to_flax(sd, EncoderUNetModel(**cfg))
