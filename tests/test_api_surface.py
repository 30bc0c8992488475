"""API-surface completeness tests: the reference's public symbols that are
dead in its production scripts but part of its surface (SURVEY §2) —
classifier guidance, bpd loops, legacy sampling variants, wavelet gating,
classifier/super-res factories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
from fast_cwdm_tpu.models import (
    UNetModel,
    WaveletGatingDownsample,
    WaveletGatingUpsample,
    create_classifier_and_diffusion,
    sr_create_model_and_diffusion,
)

LATENT = (2, 4, 4, 4, 8)


@pytest.fixture(scope="module")
def diffusion():
    return GaussianDiffusion.named("linear", 10, "sampled")


def dummy_model(x, t, **kw):
    return 0.1 * x[..., :8]


class TestGuidance:
    def test_condition_mean_shifts(self, diffusion):
        x = jax.random.normal(jax.random.PRNGKey(0), LATENT)
        t = jnp.array([3, 5])
        out = diffusion.p_mean_variance(dummy_model, x, t)

        def cond_fn(x, t):
            return jnp.ones_like(x[..., :8])

        shifted = diffusion.condition_mean(cond_fn, out, x, t)
        assert shifted.shape == out["mean"].shape
        assert float(jnp.abs(shifted - out["mean"]).max()) > 0

    def test_condition_score_consistent_shapes(self, diffusion):
        x = jax.random.normal(jax.random.PRNGKey(1), LATENT)
        t = jnp.array([2, 7])
        out = diffusion.p_mean_variance(dummy_model, x, t)

        def cond_fn(x, t):
            return 0.1 * jnp.ones_like(x[..., :8])

        new = diffusion.condition_score(cond_fn, out, x, t)
        assert new["pred_xstart"].shape == out["pred_xstart"].shape
        assert new["mean"].shape == out["mean"].shape


class TestLoops:
    def test_p_sample_loop_known(self, diffusion):
        img = jax.random.uniform(jax.random.PRNGKey(2), LATENT)
        out = diffusion.p_sample_loop_known(
            dummy_model, LATENT, jax.random.PRNGKey(3), img=img,
            noise_level=5,
        )
        assert out.shape == LATENT
        assert np.isfinite(np.asarray(out)).all()

    def test_ddim_progressive_yields_every_step(self, diffusion):
        gen = diffusion.ddim_sample_loop_progressive(
            dummy_model, LATENT, jax.random.PRNGKey(4)
        )
        steps = list(gen)
        assert len(steps) == diffusion.num_timesteps
        assert steps[-1]["sample"].shape == LATENT

    def test_ddim_deterministic_at_eta0(self, diffusion):
        out1 = diffusion.ddim_sample_loop(
            dummy_model, LATENT, jax.random.PRNGKey(5),
            noise=jnp.ones(LATENT), eta=0.0,
        )
        out2 = diffusion.ddim_sample_loop(
            dummy_model, LATENT, jax.random.PRNGKey(99),
            noise=jnp.ones(LATENT), eta=0.0,
        )
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


class TestBpd:
    def test_calc_bpd_loop(self):
        d = GaussianDiffusion.named(
            "linear", 4, "sampled", var_type="fixed_small"
        )
        x0 = jax.random.uniform(jax.random.PRNGKey(6), (2, 4, 4, 4, 8))
        out = d.calc_bpd_loop(
            dummy_model, x0, jax.random.PRNGKey(7), clip_denoised=False
        )
        assert out["vb"].shape == (2, 4)
        assert out["total_bpd"].shape == (2,)
        assert np.isfinite(np.asarray(out["total_bpd"])).all()
        # total = Σ vb + prior
        np.testing.assert_allclose(
            np.asarray(out["total_bpd"]),
            np.asarray(out["vb"].sum(axis=1) + out["prior_bpd"]),
            rtol=1e-5,
        )


class TestWaveletGating:
    def test_down_halves_spatial(self):
        m = WaveletGatingDownsample(channels=4, temb_dim=8)
        x = jnp.ones((2, 8, 8, 8, 4))
        temb = jnp.ones((2, 8))
        p = m.init(jax.random.PRNGKey(0), x, temb)
        out = m.apply(p, x, temb)
        assert out.shape == (2, 4, 4, 4, 4)

    def test_up_doubles_spatial(self):
        m = WaveletGatingUpsample(channels=4, temb_dim=8)
        x = jnp.ones((2, 4, 4, 4, 4))
        temb = jnp.ones((2, 8))
        p = m.init(jax.random.PRNGKey(0), x, temb)
        out = m.apply(p, x, temb)
        assert out.shape == (2, 8, 8, 8, 4)


class TestFactories:
    def test_classifier_factory(self):
        clf, diff = create_classifier_and_diffusion(
            image_size=64,
            classifier_width=16,
            classifier_depth=1,
            classifier_attention_resolutions="",
            classifier_channel_mult="1,2",
            classifier_pool="adaptive",
            classifier_num_head_channels=8,
            num_groups=8,
            dims=3,
            in_channels=4,
            diffusion_steps=100,  # "direct" schedule scales by 1000/steps
        )
        x = jnp.zeros((1, 8, 8, 8, 4))
        t = jnp.zeros((1,), jnp.int32)
        p = clf.init(jax.random.PRNGKey(0), x, t)
        assert clf.apply(p, x, t).shape == (1, 2)
        assert diff.num_timesteps == 100

    def test_sr_factory(self):
        model, diff = sr_create_model_and_diffusion(
            large_size=64,
            small_size=16,
            num_channels=16,
            num_res_blocks=1,
            attention_resolutions="16",
            num_groups=8,
            diffusion_steps=100,
            class_cond=False,
        )
        x = jnp.zeros((1, 16, 16, 3))
        low = jnp.zeros((1, 8, 8, 3))
        t = jnp.zeros((1,), jnp.int32)
        p = model.init(jax.random.PRNGKey(0), x, t, low_res=low)
        out = model.apply(p, x, t, low_res=low)
        assert out.shape == (1, 16, 16, 3)
