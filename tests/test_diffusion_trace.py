"""Seeded ancestral-chain parity against the EXECUTED reference.

`tests/golden/diffusion_trace_torch.npz` (scripts/gen_golden_fixtures.py)
holds a 10-step "sampled"-schedule i2i chain through a tiny reference UNet
with production sampling flags (START_X mean, FIXED_LARGE variance,
clip_denoised's idwt→clamp→dwt x0 projection — `gaussian_diffusion.py:
269-420,529-574`) and explicitly injected per-step noise. Replaying it here
pins the whole L3 numerical core: beta tables, coefficient tables,
p_mean_variance (incl. the wavelet round-trip and LLL/3 convention),
posterior mean/variance, and the reparameterized step.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "diffusion_trace_torch.npz"
)


@pytest.fixture(scope="module")
def trace():
    data = np.load(GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return data, sd


def test_chain_matches_reference(trace):
    import jax.numpy as jnp

    from fast_cwdm_tpu.diffusion.gaussian import (
        GaussianDiffusion, MeanType, VarType,
    )
    from fast_cwdm_tpu.diffusion.schedules import get_named_beta_schedule
    from fast_cwdm_tpu.models import UNetModel
    from fast_cwdm_tpu.training.bridge import torch_to_flax

    data, sd = trace
    T = 10
    diff = GaussianDiffusion.create(
        get_named_beta_schedule("linear", T, "sampled"),
        mean_type=MeanType.START_X,
        var_type=VarType.FIXED_LARGE,
        mode="i2i",
    )
    model = UNetModel(
        image_size=16,
        in_channels=16,
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
    params = torch_to_flax(sd, model)

    def model_fn(x, t):
        return model.apply({"params": params}, x, t)

    nchw_to_last = lambda a: np.transpose(a, (0, 2, 3, 4, 1))  # noqa: E731
    x = jnp.asarray(nchw_to_last(data["__x_init__"]))
    cond = jnp.asarray(nchw_to_last(data["__cond__"]))
    noises = data["__noises__"]
    steps_ref = data["__steps__"]

    for k, i in enumerate(range(T - 1, -1, -1)):
        t = jnp.full((1,), i, jnp.int32)
        out = diff.p_mean_variance(
            model_fn, x, t, cond=cond, clip_denoised=True
        )
        mask = 0.0 if i == 0 else 1.0
        x = out["mean"] + mask * jnp.exp(
            0.5 * out["log_variance"]
        ) * jnp.asarray(nchw_to_last(noises[k]))
        np.testing.assert_allclose(
            np.asarray(x),
            nchw_to_last(steps_ref[k]),
            atol=5e-5,
            err_msg=f"diverged at reverse step {k} (t={i})",
        )


TRAIN_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "training_losses_torch.npz"
)


def test_training_losses_match_reference():
    """One i2i training_losses evaluation vs the executed reference with
    injected noise: condition DWTs + LLL/3, q_sample, 32-ch concat, model
    eval, per-subband MSE, and the output IDWT
    (`gaussian_diffusion.py:1084-1166`)."""
    import jax.numpy as jnp

    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
    from fast_cwdm_tpu.models import UNetModel
    from fast_cwdm_tpu.training.bridge import torch_to_flax

    data = np.load(TRAIN_GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    diff = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")
    model = UNetModel(
        image_size=16,
        in_channels=32,
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
    params = torch_to_flax(sd, model)

    def model_fn(x, t):
        return model.apply({"params": params}, x, t)

    nchw_to_last = lambda a: np.transpose(a, (0, 2, 3, 4, 1))  # noqa: E731
    batch = {
        m: jnp.asarray(nchw_to_last(data[f"__batch_{m}__"]))
        for m in ("t1n", "t1c", "t2w", "t2f")
    }
    t = jnp.asarray(data["__t__"])
    noise_img = jnp.asarray(nchw_to_last(data["__noise__"]))

    import jax

    terms, model_output, model_output_idwt = diff.training_losses(
        model_fn, batch, t, jax.random.PRNGKey(0),
        contr="t1n", noise_img=noise_img,
    )
    np.testing.assert_allclose(
        np.asarray(terms["mse_wav"]), data["__mse_wav__"], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(model_output),
        nchw_to_last(data["__model_output__"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(model_output_idwt),
        nchw_to_last(data["__model_output_idwt__"]),
        atol=2e-5,
    )


DDIM_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "ddim_trace_torch.npz"
)


def test_ddim_chain_matches_reference():
    """Deterministic eta=0 DDIM chain vs the executed reference
    (mode='default' — the only configuration the reference's DDIM can run:
    i2i raises, the interp path crashes on np.float, and its eta>0 sample
    is discarded at return, `gaussian_diffusion.py:721-784`)."""
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.diffusion.gaussian import (
        GaussianDiffusion, MeanType, VarType,
    )
    from fast_cwdm_tpu.diffusion.schedules import get_named_beta_schedule
    from fast_cwdm_tpu.models import UNetModel
    from fast_cwdm_tpu.training.bridge import torch_to_flax

    data = np.load(DDIM_GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    T = 10
    diff = GaussianDiffusion.create(
        get_named_beta_schedule("linear", T, "sampled"),
        mean_type=MeanType.START_X,
        var_type=VarType.FIXED_LARGE,
        mode="default",
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
    params = torch_to_flax(sd, model)

    def model_fn(x, t):
        return model.apply({"params": params}, x, t)

    nchw_to_last = lambda a: np.transpose(a, (0, 2, 3, 4, 1))  # noqa: E731
    x = jnp.asarray(nchw_to_last(data["__x_init__"]))
    steps_ref = data["__steps__"]
    key = jax.random.PRNGKey(0)  # eta=0: noise multiplied by sigma=0

    for k, i in enumerate(range(T - 1, -1, -1)):
        t = jnp.full((1,), i, jnp.int32)
        out = diff.ddim_sample(model_fn, x, t, key, eta=0.0)
        x = out["sample"]
        np.testing.assert_allclose(
            np.asarray(x),
            nchw_to_last(steps_ref[k]),
            atol=5e-5,
            err_msg=f"ddim diverged at reverse step {k} (t={i})",
        )


RESPACE_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "respace_tables_torch.npz"
)


def test_respacing_tables_match_reference():
    """Non-identity respacing (sections and ddimN strides) vs the executed
    reference: retained-timestep maps exactly, rebuilt betas to float64
    precision (`respace.py:7-94`). The reference's 'direct' linear schedule
    itself breaks below ~50 steps (betas > 1), which is why production uses
    the 'sampled' schedule — respacing is exercised here on valid bases."""
    from fast_cwdm_tpu.diffusion import respace
    from fast_cwdm_tpu.diffusion.schedules import get_named_beta_schedule

    data = np.load(RESPACE_GOLDEN)
    cases = [
        (1000, "ddim50", "1000_ddim50"),
        (1000, [50], "1000_50"),
        (100, [25, 15, 10], "100_25-15-10"),
        (100, [10], "100_10"),
    ]
    for steps, spec, key in cases:
        use = respace.space_timesteps(steps, spec)
        betas = get_named_beta_schedule("linear", steps, "direct")
        sd = respace.create_spaced_diffusion(use_timesteps=use, betas=betas)
        np.testing.assert_array_equal(
            np.asarray(sd.timestep_map), data[f"map_{key}"], err_msg=key
        )
        np.testing.assert_allclose(
            np.asarray(sd.betas, np.float64),
            data[f"betas_{key}"],
            rtol=1e-6,
            err_msg=key,
        )
