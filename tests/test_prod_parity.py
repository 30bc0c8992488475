"""Production-channel-config parity against the EXECUTED reference.

`tests/golden/prod_unet_torch.npz` (scripts/gen_golden_fixtures.py,
`gen_prod_unet`) pins the 81.5M-param production UNetModel (`run.sh:61-66`:
in 32, model 64, mult (1,2,2,4,4), 2 res blocks, no attention,
resblock_updown) at reduced spatial size — the round-1 goldens covered only
a 2.7M-param tiny config, so the 5-level bridge layout walk at the config
that actually ships was asserted by parameter count alone.

The fixture stores no weights: both sides regenerate them deterministically
from the torch key names via
`fast_cwdm_tpu.utils.testing.seeded_state_dict`, so any mismap in the
layout walk (`training/bridge.py:33-87`) puts a DIFFERENT seeded tensor in
that slot and the forward diverges loudly.
"""

import os

import numpy as np
import pytest

from fast_cwdm_tpu.models import UNetModel
from fast_cwdm_tpu.training.bridge import flax_to_torch, torch_to_flax
from fast_cwdm_tpu.utils.testing import seeded_state_dict

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "prod_unet_torch.npz"
)

# production channel config (`run.sh:61-66`, SURVEY §2.2) at latent 16³
PROD_CFG = dict(
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


def _nchw_to_last(a):
    return np.transpose(a, (0, 2, 3, 4, 1))


@pytest.fixture(scope="module")
def prod():
    import jax

    data = np.load(GOLDEN)
    model = UNetModel(**PROD_CFG)
    # regenerate the reference's seeded weights from the torch key names the
    # bridge layout walk produces — shapes come from a throwaway flax init
    # 5 levels halve 4× — 16³ is the smallest latent that survives to 1³
    x0 = np.zeros((1, 16, 16, 16, PROD_CFG["in_channels"]), np.float32)
    init = model.init(jax.random.PRNGKey(0), x0, np.zeros((1,), np.int32))
    shapes = {
        k: tuple(v.shape)
        for k, v in flax_to_torch(init["params"], model).items()
    }
    params = torch_to_flax(seeded_state_dict(shapes), model)
    return data, model, params


def test_param_count_matches_reference(prod):
    data, _, params = prod
    import jax

    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    assert n == int(data["__n_params__"]) == 81_511_048


def test_forward_parity(prod):
    """Full 5-level production forward vs the executed reference."""
    import jax.numpy as jnp

    data, model, params = prod
    x = jnp.asarray(_nchw_to_last(data["__x__"]))
    y = model.apply({"params": params}, x, jnp.asarray(data["__t__"]))
    np.testing.assert_allclose(
        np.asarray(y), _nchw_to_last(data["__y__"]), atol=5e-5
    )


def test_training_losses_parity(prod):
    """i2i training objective at the production config
    (`gaussian_diffusion.py:1084-1166`)."""
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion

    data, model, params = prod
    diff = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")

    def model_fn(x, t):
        return model.apply({"params": params}, x, t)

    batch = {
        m: jnp.asarray(_nchw_to_last(data[f"__batch_{m}__"]))
        for m in ("t1n", "t1c", "t2w", "t2f")
    }
    terms, model_output, _ = diff.training_losses(
        model_fn,
        batch,
        jnp.asarray(data["__tl_t__"]),
        jax.random.PRNGKey(0),
        contr="t1c",
        noise_img=jnp.asarray(_nchw_to_last(data["__noise__"])),
    )
    np.testing.assert_allclose(
        np.asarray(terms["mse_wav"]), data["__mse_wav__"], atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(model_output),
        _nchw_to_last(data["__model_output__"]),
        atol=5e-5,
    )


def test_p_mean_variance_parity(prod):
    """Clip-denoised p_mean_variance (idwt→clamp→dwt x0 projection, LLL/3,
    FIXED_LARGE variance) at the production config
    (`gaussian_diffusion.py:269-420`)."""
    import jax.numpy as jnp

    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion

    data, model, params = prod
    diff = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")

    def model_fn(x, t):
        return model.apply({"params": params}, x, t)

    out = diff.p_mean_variance(
        model_fn,
        jnp.asarray(_nchw_to_last(data["__pmv_x__"])),
        jnp.asarray(data["__pmv_t__"]),
        cond=jnp.asarray(_nchw_to_last(data["__cond__"])),
        clip_denoised=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["mean"]),
        _nchw_to_last(data["__pmv_mean__"]),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["log_variance"]),
        _nchw_to_last(data["__pmv_log_variance__"]),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_xstart"]),
        _nchw_to_last(data["__pmv_pred_xstart__"]),
        atol=5e-5,
    )


def test_published_weights_readiness_chain(prod, tmp_path):
    """Quality-parity readiness (PARITY.md): the moment real published
    weights appear, the recipe is `convert_checkpoint` → `complete_dataset`.
    This smoke drives that chain at the production config with a
    SYNTHESIZED reference-shaped `.pt`: import → BEST-name discovery →
    config-from-sidecar model build → parameter load, asserting the loaded
    tree is bit-identical to the imported weights. (Device sampling on real
    volumes is covered by tests/test_cli.py::test_full_pipeline at a tiny
    config.)"""
    import jax
    import torch

    from fast_cwdm_tpu.cli import common, convert_checkpoint
    from fast_cwdm_tpu.training.checkpoints import find_best_checkpoint

    data, model, params = prod
    sd = flax_to_torch(jax.tree.map(np.asarray, params), model)
    src_pt = str(tmp_path / "brats_t1c_BEST_sampled_10.pt")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, src_pt)

    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    dst = str(ckpt_dir / "brats_t1c_BEST_sampled_10.ckpt")
    convert_checkpoint.main([f"--src={src_pt}", f"--dst={dst}",
                             "--contr=t1c", "--image_size=16"])

    found = find_best_checkpoint(str(ckpt_dir), "t1c")
    assert found is not None
    path, schedule, steps = found
    assert (path, schedule, steps) == (dst, "sampled", 10)

    # rebuild exactly as cli/complete_dataset.py::get_synth does
    from fast_cwdm_tpu.models import model_and_diffusion_defaults
    from fast_cwdm_tpu.training.checkpoints import load_checkpoint_config

    stored = load_checkpoint_config(path) or {}
    cfg = common.production_config(sample_schedule=schedule,
                                   diffusion_steps=steps)
    schema = set(model_and_diffusion_defaults())
    cfg.update({k: v for k, v in stored.items() if k in schema})
    cfg["mode"] = "i2i"
    cfg["image_size"] = 16  # reduced spatial for the CPU template init
    model2, diffusion = common.build_model_and_diffusion(cfg)
    assert diffusion.num_timesteps == 10
    loaded = common.load_params(path, model2)
    flat_a = {k: v for k, v in flax_to_torch(
        jax.tree.map(np.asarray, loaded), model2).items()}
    for k in sd:
        np.testing.assert_array_equal(flat_a[k], sd[k])
