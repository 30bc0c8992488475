"""Diffusion core tests: schedule parity invariants, process math, loops.

Parity anchors vs `/root/reference/guided_diffusion/gaussian_diffusion.py`:
- linear schedule endpoints scale with 1000/T (`:39-44`)
- "sampled" schedule reproduces the 1000-step alpha-bar curve at the
  subsampled indices (`:45-58`)
- q/posterior coefficient identities (`:183-205`)
- p_sample_loop with an oracle x0-predicting model recovers x0 exactly
- i2i condition concat order (`:1102-1149`)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.diffusion import (
    GaussianDiffusion,
    LossSecondMomentResampler,
    MeanType,
    UniformSampler,
    VarType,
    condition_order,
    create_spaced_diffusion,
    space_timesteps,
)
from fast_cwdm_tpu.diffusion import schedules
from fast_cwdm_tpu.ops import wavelet as wv


def test_linear_schedule_endpoints():
    b1000 = schedules.linear_betas(1000)
    np.testing.assert_allclose(b1000[0], 1e-4, rtol=1e-12)
    np.testing.assert_allclose(b1000[-1], 0.02, rtol=1e-12)
    b100 = schedules.linear_betas(100)
    np.testing.assert_allclose(b100[0], 1e-3, rtol=1e-12)
    np.testing.assert_allclose(b100[-1], 0.2, rtol=1e-12)


@pytest.mark.parametrize("steps", [10, 100, 1000])
def test_sampled_schedule_matches_full_curve(steps):
    betas = schedules.sampled_betas(steps)
    assert betas.shape == (steps,)
    assert (betas >= 0.0001).all() and (betas <= 0.999).all()
    full = np.cumprod(1 - np.linspace(0.0001, 0.02, 1000, dtype=np.float64))
    idx = np.linspace(0, 999, steps, dtype=int)
    acp = np.cumprod(1 - betas)
    # clip only binds when sub-step betas fall below 1e-4; for these steps the
    # retained alpha-bar curve must match the full one exactly at idx
    mask = ~np.isclose(betas, 0.0001)
    np.testing.assert_allclose(acp[mask], full[idx][mask], rtol=1e-10)


def test_cosine_schedule():
    b = schedules.cosine_betas(50)
    assert b.shape == (50,) and (b > 0).all() and (b <= 0.999).all()


def test_tables_float64_provenance():
    d = GaussianDiffusion.named("linear", 1000)
    assert d.num_timesteps == 1000
    acp = np.asarray(d.alphas_cumprod, dtype=np.float64)
    # identity: posterior_mean_coef1+coef2 scaled forms reconstruct mean of x0
    c1 = np.asarray(d.posterior_mean_coef1)
    c2 = np.asarray(d.posterior_mean_coef2)
    sqrt_acp = np.asarray(d.sqrt_alphas_cumprod)
    # at any t: c1 + c2*sqrt(acp_t)/1 applied to x0-noising... check simple
    # identity c1*1 + c2*sqrt_acp = 1-ish only at t=0; instead check t=0 row:
    np.testing.assert_allclose(c1[0] + c2[0] * sqrt_acp[0], 1.0, rtol=1e-5)
    assert acp[-1] < 1e-4  # fully noised at T


def test_q_sample_and_posterior_identity():
    d = GaussianDiffusion.named("linear", 100)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 8)), dtype=jnp.float32)
    t = jnp.asarray([0, 50])
    zero = jnp.zeros_like(x0)
    xt = d.q_sample(x0, t, zero)
    expected = np.asarray(d.sqrt_alphas_cumprod)[np.asarray(t)].reshape(
        -1, 1, 1, 1, 1
    ) * np.asarray(x0)
    np.testing.assert_allclose(np.asarray(xt), expected, atol=1e-6)

    # eps <-> x0 inversion
    noise = jnp.asarray(rng.standard_normal(x0.shape), dtype=jnp.float32)
    xt = d.q_sample(x0, t, noise)
    x0_rec = d.predict_xstart_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
    eps_rec = d.predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-3)


def _oracle_setup(mode="default", steps=10):
    """A latent x0 (DWT of a [0,1] image) and a model that predicts it."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 8, 1)), dtype=jnp.float32)
    x0 = wv.dwt_normalized(img)
    d = GaussianDiffusion.named(
        "linear",
        steps,
        sample_schedule="sampled",
        mean_type=MeanType.START_X,
        var_type=VarType.FIXED_LARGE,
        mode=mode,
    )
    return d, img, x0


def test_p_sample_loop_oracle_recovers_x0():
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    out = jax.jit(
        lambda key: d.p_sample_loop(
            model_fn, x0.shape, key, clip_denoised=True
        )
    )(jax.random.PRNGKey(0))
    # last step (t=0) returns the posterior mean at t=0 which equals pred x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_p_sample_loop_progressive_matches_api():
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    outs = list(
        d.p_sample_loop_progressive(
            model_fn, x0.shape, jax.random.PRNGKey(0), clip_denoised=True
        )
    )
    assert len(outs) == d.num_timesteps
    np.testing.assert_allclose(
        np.asarray(outs[-1]["sample"]), np.asarray(x0), atol=1e-4
    )


def test_i2i_concat_and_posterior_slice():
    d, img, x0 = _oracle_setup(mode="i2i")
    cond = jnp.ones(x0.shape[:-1] + (24,), dtype=jnp.float32) * 0.5

    def model_fn(x_in, t):
        assert x_in.shape[-1] == 32  # 8 noisy target + 24 cond
        return jnp.broadcast_to(x0, x_in.shape[:-1] + (8,))

    out = d.p_sample_loop(
        model_fn, x0.shape, jax.random.PRNGKey(0), cond=cond
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_condition_order():
    assert condition_order("t1n") == ("t1c", "t2w", "t2f")
    assert condition_order("t1c") == ("t1n", "t2w", "t2f")
    assert condition_order("t2w") == ("t1n", "t1c", "t2f")
    assert condition_order("t2f") == ("t1n", "t1c", "t2w")


def test_training_losses_oracle_zero_and_cond_order():
    d = GaussianDiffusion.named(
        "linear", 10, sample_schedule="sampled", mode="i2i",
        mean_type=MeanType.START_X,
    )
    vals = {"t1n": 0.1, "t1c": 0.2, "t2w": 0.3, "t2f": 0.4}
    batch = {
        m: jnp.full((1, 8, 8, 8, 1), v, dtype=jnp.float32)
        for m, v in vals.items()
    }
    t = jnp.asarray([3])
    key = jax.random.PRNGKey(0)

    # oracle model: return the target's normalized DWT exactly -> zero loss
    target_dwt = wv.dwt_normalized(batch["t1c"])

    def oracle(x_in, tt):
        assert x_in.shape[-1] == 32
        return jnp.broadcast_to(target_dwt, x_in.shape[:-1] + (8,))

    terms, out, out_idwt = d.training_losses(
        oracle, batch, t, key, contr="t1c"
    )
    np.testing.assert_allclose(np.asarray(terms["mse_wav"]), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out_idwt), np.asarray(batch["t1c"]), atol=1e-5
    )

    # cond order probe: model echoes cond bands; for constant-v volumes the
    # normalized LLL is (2*sqrt(2)/3)*v and the high bands are 0.
    k = 2 * np.sqrt(2.0) / 3.0
    echo1 = lambda x_in, tt: x_in[..., 8:16]  # noqa: E731  (first condition)
    _, out1, _ = d.training_losses(echo1, batch, t, key, contr="t1c")
    np.testing.assert_allclose(
        float(out1[..., 0].mean()), k * vals["t1n"], rtol=1e-5
    )
    echo3 = lambda x_in, tt: x_in[..., 24:32]  # noqa: E731  (third condition)
    _, out3, _ = d.training_losses(echo3, batch, t, key, contr="t1c")
    np.testing.assert_allclose(
        float(out3[..., 0].mean()), k * vals["t2f"], rtol=1e-5
    )


def test_ddim_oracle():
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    out = d.ddim_sample_loop(model_fn, x0.shape, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_sample_known_oracle():
    """`sample_known` (`gaussian_diffusion.py:475-478` — unexecutable
    bit-rot there): shape derived from img, delegates to the partial-noising
    known loop."""
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    out = d.sample_known(
        model_fn, x0, jax.random.PRNGKey(1), noise_level=5
    )
    assert out.shape == x0.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_p_sample_loop_interpolation_oracle():
    """(`gaussian_diffusion.py:626-666`) shared-noise q_sample of both
    endpoints, lambdaint mixture, denoise."""
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    x_b = x0 + 0.1
    key = jax.random.PRNGKey(2)
    sample, interpol, r1, r2 = d.p_sample_loop_interpolation(
        model_fn, x0.shape, key,
        img1=x0, img2=x_b, lambdaint=0.3, noise_level=5,
    )
    assert sample.shape == interpol.shape == x0.shape
    assert r1 is x0 and r2 is x_b
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-4)
    # identical endpoints ⇒ the mixture is lambdaint-independent (the two
    # q_samples share one noise draw)
    _, ia, _, _ = d.p_sample_loop_interpolation(
        model_fn, x0.shape, key, img1=x0, img2=x0, lambdaint=0.2,
        noise_level=5,
    )
    _, ib, _, _ = d.p_sample_loop_interpolation(
        model_fn, x0.shape, key, img1=x0, img2=x0, lambdaint=0.9,
        noise_level=5,
    )
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib), atol=1e-6)


def test_ddim_sample_loop_known_oracle():
    """(`gaussian_diffusion.py:914-968`) fresh noise at the target shape,
    img as channel-concat conditioning (i2i), DDIM chain; returns the
    reference's (sample, None, img) tuple shape."""
    d, img, x0 = _oracle_setup(mode="i2i")
    img_cond = jnp.full(x0.shape[:-1] + (24,), 0.5, dtype=jnp.float32)

    def model_fn(x_in, t):
        assert x_in.shape[-1] == 32  # 8 noisy target + 24 cond concat
        return jnp.broadcast_to(x0, x_in.shape[:-1] + (8,))

    sample, x_noisy, ret = d.ddim_sample_loop_known(
        model_fn, x0.shape, jax.random.PRNGKey(3), img=img_cond
    )
    assert x_noisy is None and ret is img_cond
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-4)


def test_ddim_sample_loop_interpolation_oracle():
    """(`gaussian_diffusion.py:827-866`)"""
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    sample, interpol, _, _ = d.ddim_sample_loop_interpolation(
        model_fn, x0.shape, jax.random.PRNGKey(4),
        img1=x0, img2=x0 + 0.1, lambdaint=0.5, noise_level=5,
    )
    assert sample.shape == interpol.shape == x0.shape
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-4)


def test_space_timesteps_and_spaced_diffusion():
    assert space_timesteps(1000, [1000]) == set(range(1000))
    s = space_timesteps(1000, "ddim10")
    assert len(s) == 10
    betas = schedules.linear_betas(1000)
    d = create_spaced_diffusion(
        use_timesteps=space_timesteps(1000, [10]), betas=betas
    )
    assert d.num_timesteps == 10
    assert d.original_num_steps == 1000
    full_acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(
        np.asarray(d.alphas_cumprod),
        full_acp[np.asarray(d.timestep_map)],
        rtol=1e-5,
    )
    # scale_timesteps maps compact -> original indices
    mapped = d.scale_timesteps(jnp.asarray([0, 9]))
    assert int(mapped[0]) == int(d.timestep_map[0])
    assert int(mapped[1]) == int(d.timestep_map[9])


def test_uniform_sampler():
    s = UniformSampler(10)
    t, w = s.sample(jax.random.PRNGKey(0), 64)
    assert t.shape == (64,) and int(t.min()) >= 0 and int(t.max()) < 10
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_loss_aware_sampler():
    s = LossSecondMomentResampler(4, history_per_term=2)
    state = s.init_state()
    t0, w0 = s.sample(jax.random.PRNGKey(0), 8, state)
    np.testing.assert_allclose(np.asarray(w0), 1.0)  # not warmed: uniform
    for i in range(4):
        state = s.update(
            state,
            jnp.arange(4),
            jnp.asarray([1.0, 2.0, 3.0, 4.0]) * (i + 1),
        )
    assert bool((state.loss_counts == 2).all())
    t1, w1 = s.sample(jax.random.PRNGKey(1), 512, state)
    # higher-loss timesteps must be sampled more often
    counts = np.bincount(np.asarray(t1), minlength=4)
    assert counts[3] > counts[0]


def test_fixed_small_and_epsilon_paths():
    # direct linear with <50 steps gives beta>1 and is rejected (the reference
    # asserts the same, `gaussian_diffusion.py:164`): use 100
    d = GaussianDiffusion.named(
        "linear", 100, mean_type=MeanType.EPSILON, var_type=VarType.FIXED_SMALL
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 8)), dtype=jnp.float32)
    model_fn = lambda xx, t: jnp.zeros_like(xx)  # noqa: E731  predicts eps=0
    out = d.p_mean_variance(model_fn, x, jnp.asarray([5]), clip_denoised=False)
    expected_x0 = d.predict_xstart_from_eps(x, jnp.asarray([5]), jnp.zeros_like(x))
    np.testing.assert_allclose(
        np.asarray(out["pred_xstart"]), np.asarray(expected_x0), atol=1e-5
    )


class TestReferenceGoldenTables:
    """Pinned against tables produced by executing the reference
    implementation (`gaussian_diffusion.py:30-205`) once — see
    tests/golden/schedule_tables_torch.npz."""

    @pytest.fixture(scope="class")
    def golden(self):
        import os

        path = os.path.join(
            os.path.dirname(__file__), "golden", "schedule_tables_torch.npz"
        )
        return np.load(path)

    @pytest.mark.parametrize("steps", [10, 100, 1000])
    def test_schedules_bit_exact(self, golden, steps):
        from fast_cwdm_tpu.diffusion import schedules as S

        np.testing.assert_array_equal(
            S.get_named_beta_schedule("linear", steps, "direct"),
            golden[f"direct_{steps}"],
        )
        np.testing.assert_array_equal(
            S.get_named_beta_schedule("linear", steps, "sampled"),
            golden[f"sampled_{steps}"],
        )

    def test_cosine_bit_exact(self, golden):
        from fast_cwdm_tpu.diffusion import schedules as S

        np.testing.assert_array_equal(
            S.get_named_beta_schedule("cosine", 50), golden["cosine_50"]
        )

    def test_coefficient_tables_f32_exact(self, golden):
        from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion

        d = GaussianDiffusion.named("linear", 10, "sampled")
        for attr in [
            "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
            "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
            "posterior_mean_coef1", "posterior_mean_coef2",
            "posterior_variance", "posterior_log_variance_clipped",
            "alphas_cumprod", "alphas_cumprod_prev",
        ]:
            ref = golden[f"tab_sampled10_{attr}"].astype(np.float32)
            ours = np.asarray(getattr(d, attr))
            np.testing.assert_allclose(ours, ref, rtol=3e-7, atol=1e-9)


def test_spaced_diffusion_maps_timesteps_to_model():
    """`_WrappedModel` semantics (`respace.py:112-132`): the model must see
    ORIGINAL-schedule timesteps, not compact indices."""
    from fast_cwdm_tpu.diffusion.respace import (
        create_spaced_diffusion,
        space_timesteps,
    )
    from fast_cwdm_tpu.diffusion.schedules import get_named_beta_schedule

    betas = get_named_beta_schedule("linear", 100, "direct")
    use = space_timesteps(100, "10")
    sd = create_spaced_diffusion(use_timesteps=use, betas=betas)
    assert sd.num_timesteps == 10
    seen = []

    def model_fn(x, t, **kw):
        seen.append(np.asarray(t))
        return 0.1 * x[..., :8]

    x = jnp.ones((1, 4, 4, 4, 8))
    sd.p_mean_variance(model_fn, x, jnp.array([7]))
    mapped = int(seen[0][0])
    expected = sorted(use)[7]
    assert mapped == expected, (mapped, expected)


def test_chunked_sampling_matches_monolithic():
    """chunk_size splits the reverse chain into separate device programs
    with IDENTICAL numerics (the long-chain workaround, PERF.md)."""
    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion

    d = GaussianDiffusion.named("linear", 12, "sampled")

    def model_fn(x, t, **kw):
        return 0.05 * x

    shape = (1, 4, 4, 4, 8)
    key = jax.random.PRNGKey(3)
    noise = jax.random.normal(jax.random.PRNGKey(4), shape)
    mono = d.p_sample_loop(model_fn, shape, key, noise=noise)
    chunked = d.p_sample_loop(
        model_fn, shape, key, noise=noise, chunk_size=5
    )
    np.testing.assert_allclose(
        np.asarray(mono), np.asarray(chunked), atol=1e-6
    )


class TestConfigurationGuards:
    def test_training_losses_rejects_epsilon_mean_type(self):
        """The objective is always x0-prediction; an EPSILON-configured
        diffusion would sample trained checkpoints as garbage — loud error
        instead (the reference fails silently; run.sh:134 avoids it with
        predict_xstart=True)."""
        import jax
        import jax.numpy as jnp

        from fast_cwdm_tpu.diffusion.gaussian import (
            GaussianDiffusion, MeanType,
        )

        diff = GaussianDiffusion.named(
            "linear", 4, "sampled", mode="default",
            mean_type=MeanType.EPSILON,
        )
        x = jnp.zeros((1, 8, 8, 8, 1))
        with pytest.raises(ValueError, match="x0-predictor"):
            diff.training_losses(
                lambda a, t: a[..., :8], x, jnp.zeros((1,), jnp.int32),
                jax.random.PRNGKey(0), mode="default",
            )

    def test_default_mean_type_is_start_x(self):
        from fast_cwdm_tpu.diffusion.gaussian import (
            GaussianDiffusion, MeanType,
        )

        d = GaussianDiffusion.named("linear", 4, "sampled")
        assert d.mean_type == MeanType.START_X

    def test_target_channels_constructible(self):
        from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion

        d = GaussianDiffusion.named(
            "linear", 4, "sampled", target_channels=4
        )
        assert d.target_channels == 4


def test_unfused_clip_projection_matches_fused():
    """`fuse_clip_projection=False` (bench.py's faithful-baseline execution
    shape: full-spatial IDWT→clamp→DWT, `gaussian_diffusion.py:335-354`)
    is numerically identical to the fused block-local Haar projection."""
    import jax

    diff = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")
    slow = diff.replace(fuse_clip_projection=False)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8, 8))
    a = diff._process_xstart(x, clip_denoised=True)
    b = slow._process_xstart(x, clip_denoised=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_clip_projection_multichannel_latent():
    """_process_xstart generalizes to C>1 wavelet latents (8*C channels):
    the projection must clamp EACH image channel's reconstruction, i.e.
    equal the per-channel fused Haar projection applied band-wise."""
    import jax

    d = GaussianDiffusion.named(
        "linear", 4, "sampled", mode="i2i", target_channels=16
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 4, 16))
    out = d._process_xstart(x, clip_denoised=True)
    assert out.shape == x.shape
    # band-major layout: channel c of image k lives at band*2 + k
    from fast_cwdm_tpu.ops import wavelet as wv

    per = np.stack(
        [
            np.asarray(wv.haar_clamp_project(np.asarray(x)[..., k::2]))
            for k in range(2)
        ],
        axis=-1,
    ).reshape(*x.shape[:-1], 16)
    np.testing.assert_allclose(np.asarray(out), per, atol=1e-5)


def test_clip_projection_rejects_nonwavelet_latent():
    """target_channels not divisible by 8 cannot round-trip through the
    wavelet projection — must fail with a clear error, not a reshape
    crash (or silently wrong output)."""
    import pytest

    d = GaussianDiffusion.named(
        "linear", 4, "sampled", target_channels=4
    )
    with pytest.raises(ValueError, match="divisible by 8"):
        d._process_xstart(np.zeros((1, 4, 4, 4, 4)), clip_denoised=True)


def test_cond_fn_threads_through_loops():
    """Classifier guidance plumbing: cond_fn shifts the chain inside both
    the scanned ancestral loop (`gaussian_diffusion.py:569-572`) and the
    DDIM loop (`:741-742` — use-before-def there, fixed here), and a zero
    gradient is a no-op."""
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    key = jax.random.PRNGKey(6)

    zero_fn = lambda x, t: jnp.zeros_like(x)  # noqa: E731
    push_fn = lambda x, t: 5.0 * jnp.ones_like(x)  # noqa: E731

    base = d.p_sample_loop(model_fn, x0.shape, key)
    same = d.p_sample_loop(model_fn, x0.shape, key, cond_fn=zero_fn)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)
    pushed = d.p_sample_loop(model_fn, x0.shape, key, cond_fn=push_fn)
    # with an oracle x0 model, earlier shifts wash out (posterior coef2 at
    # t=0 is 0) and the final sample moves by exactly variance(t=0)·g
    expected_shift = float(d.fixed_large_variance[0]) * 5.0
    np.testing.assert_allclose(
        np.asarray(pushed - base),
        expected_shift,
        rtol=1e-3,
    )

    dbase = d.ddim_sample_loop(model_fn, x0.shape, key, eta=0.5)
    dsame = d.ddim_sample_loop(model_fn, x0.shape, key, eta=0.5,
                               cond_fn=zero_fn)
    np.testing.assert_allclose(np.asarray(dbase), np.asarray(dsame), atol=1e-6)
    dpushed = d.ddim_sample_loop(model_fn, x0.shape, key, eta=0.5,
                                 cond_fn=push_fn)
    # score guidance at the last DDIM step shifts by O(sqrt(1-abar_0)) — a
    # few 1e-4 at this schedule; assert it moved, and by a sane magnitude
    shift = float(jnp.abs(dpushed - dbase).max())
    assert 1e-5 < shift < 1e-2, shift


def test_guidance_kwargs_accepted_by_legacy_wrappers():
    """The reference's legacy loop variants all accept
    cond_fn/denoised_fn/model_kwargs (`gaussian_diffusion.py:576,626,827,
    914`); the wrappers must thread them rather than TypeError. A zero
    cond_fn and an identity denoised_fn must be exact no-ops."""
    d, img, x0 = _oracle_setup()
    model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape[:-1] + (8,))  # noqa: E731
    key = jax.random.PRNGKey(7)
    zero_fn = lambda x, t: jnp.zeros_like(x)  # noqa: E731
    ident = lambda x: x  # noqa: E731

    base = d.sample_known(model_fn, x0, key, noise_level=d.num_timesteps)
    same = d.sample_known(
        model_fn, x0, key, noise_level=d.num_timesteps,
        cond_fn=zero_fn, denoised_fn=ident, model_kwargs={},
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)

    b2, i2, _, _ = d.p_sample_loop_interpolation(
        model_fn, x0.shape, key, img1=x0, img2=0.5 * x0, lambdaint=0.3,
        noise_level=d.num_timesteps,
    )
    s2, si2, _, _ = d.p_sample_loop_interpolation(
        model_fn, x0.shape, key, img1=x0, img2=0.5 * x0, lambdaint=0.3,
        noise_level=d.num_timesteps,
        cond_fn=zero_fn, denoised_fn=ident, model_kwargs={},
    )
    np.testing.assert_allclose(np.asarray(b2), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(si2), atol=1e-6)

    b3, _, _, _ = d.ddim_sample_loop_interpolation(
        model_fn, x0.shape, key, img1=x0, img2=0.5 * x0, lambdaint=0.3,
        noise_level=d.num_timesteps,
    )
    s3, _, _, _ = d.ddim_sample_loop_interpolation(
        model_fn, x0.shape, key, img1=x0, img2=0.5 * x0, lambdaint=0.3,
        noise_level=d.num_timesteps,
        cond_fn=zero_fn, denoised_fn=ident, model_kwargs={},
    )
    np.testing.assert_allclose(np.asarray(b3), np.asarray(s3), atol=1e-6)


def test_schedule_tables_are_host_numpy():
    """Regression guard for the axon trace-time pathology (PERF.md
    round-2 session 3): schedule tables must be HOST numpy — a device
    array captured as a jit closure constant costs a D2H fetch PER TABLE
    at every trace (~66 s each through the tunnel)."""
    import dataclasses

    from fast_cwdm_tpu.diffusion.respace import (
        create_spaced_diffusion,
        space_timesteps,
    )
    from fast_cwdm_tpu.diffusion.schedules import get_named_beta_schedule

    betas = get_named_beta_schedule("linear", 100)
    d = GaussianDiffusion.create(betas)
    sd = create_spaced_diffusion(
        use_timesteps=space_timesteps(100, [10]), betas=betas
    )
    for obj in (d, sd):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            assert not isinstance(v, jax.Array), (
                f"{type(obj).__name__}.{f.name} is a device array; "
                "schedule tables must stay host numpy"
            )


def test_p_sample_loop_chunked_params_path():
    """`p_sample_loop(params=..., chunk_size=...)`: identical numerics to
    the monolithic scan, ONE compiled segment reused across chunks AND
    across calls (the round-2 footgun was a closure-params chunk jit that
    embedded params as HLO constants and rebuilt the wrapper per call)."""
    d = GaussianDiffusion.named("linear", 8, "sampled", mode="i2i")
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.random((1, 4, 4, 4, 24), np.float32))
    params = {"w": jnp.asarray(rng.random((32, 8), np.float32) * 0.1)}
    traces = [0]

    def model_fn(p, x, t):
        traces[0] += 1
        return jnp.einsum("bxyzc,co->bxyzo", x, p["w"])

    key = jax.random.PRNGKey(3)
    shape = (1, 4, 4, 4, 8)
    mono = d.p_sample_loop(
        lambda x, t: model_fn(params, x, t), shape, key, cond=cond
    )
    traces[0] = 0
    chunked = d.p_sample_loop(
        model_fn, shape, key, cond=cond, params=params, chunk_size=4
    )
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(mono),
                               atol=1e-6)
    assert traces[0] == 1, "chunks of equal size must share one trace"
    # second call: the module-level jitted segment is reused — no retrace
    chunked2 = d.p_sample_loop(
        model_fn, shape, jax.random.PRNGKey(4), cond=cond, params=params,
        chunk_size=4,
    )
    assert traces[0] == 1, "segment must be reused across calls"
    assert np.abs(np.asarray(chunked2) - np.asarray(chunked)).max() > 0
    # unchunked params path: same contract, same numerics
    traces[0] = 0
    whole = d.p_sample_loop(model_fn, shape, key, cond=cond, params=params)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(mono),
                               atol=1e-6)
