"""Model-family tests (L2).

Golden values were produced by instantiating the reference torch models
(`/root/reference/guided_diffusion/unet.py`) and counting parameters —
identical parameter counts pin the channel/skip/attention bookkeeping to the
reference construction logic without copying any code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.models import (
    EncoderUNetModel,
    UNetModel,
    WavUNetModel,
    create_model,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    timestep_embedding,
)
from fast_cwdm_tpu.models.factory import NUM_CLASSES

TINY = dict(
    image_size=16,
    in_channels=32,
    model_channels=32,
    out_channels=8,
    num_res_blocks=2,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    dims=3,
    num_groups=8,
    resblock_updown=True,
    bottleneck_attention=True,
    resample_2d=False,
    num_heads=2,
)

# torch reference, same config: sum(p.numel() for p in m.parameters())
TINY_REF_PARAMS = 2_716_680
# production run.sh config (64ch, mult (1,2,2,4,4), no attention, dims 3)
PROD_REF_PARAMS = 81_511_048


def n_params(tree):
    return sum(p.size for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def tiny_unet():
    m = UNetModel(**TINY)
    x = jnp.zeros((1, 8, 8, 8, 32))
    t = jnp.zeros((1,), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    return m, params


class TestUNet:
    def test_param_count_matches_reference(self, tiny_unet):
        _, params = tiny_unet
        assert n_params(params) == TINY_REF_PARAMS

    def test_forward_shape(self, tiny_unet):
        m, params = tiny_unet
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 32))
        t = jnp.array([0, 3], jnp.int32)
        out = m.apply(params, x, t)
        assert out.shape == (2, 8, 8, 8, 8)
        assert out.dtype == jnp.float32

    def test_zero_init_head(self, tiny_unet):
        """Reference zero_module output conv (`unet.py:721-725`): a freshly
        initialized model must output exactly zero."""
        m, params = tiny_unet
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8, 32))
        out = m.apply(params, x, jnp.zeros((1,), jnp.int32))
        assert float(jnp.abs(out).max()) == 0.0

    def test_timestep_dependence(self, tiny_unet):
        m, params = tiny_unet
        # perturb the zero head so outputs are nonzero
        params = jax.tree.map(
            lambda p: p + 0.01 * np.float32(1.0), params
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8, 32))
        o0 = m.apply(params, x, jnp.array([0], jnp.int32))
        o9 = m.apply(params, x, jnp.array([9], jnp.int32))
        assert not np.allclose(np.asarray(o0), np.asarray(o9))

    def test_additive_skips(self):
        m = UNetModel(**{**TINY, "additive_skips": True, "attention_resolutions": ()})
        x = jnp.zeros((1, 8, 8, 8, 32))
        t = jnp.zeros((1,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        assert m.apply(params, x, t).shape == (1, 8, 8, 8, 8)

    def test_non_resblock_updown(self):
        m = UNetModel(**{**TINY, "resblock_updown": False})
        x = jnp.zeros((1, 8, 8, 8, 32))
        t = jnp.zeros((1,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        assert m.apply(params, x, t).shape == (1, 8, 8, 8, 8)

    def test_resample_2d(self):
        """resample_2d keeps the first spatial dim (reference depth) fixed."""
        m = UNetModel(**{**TINY, "resample_2d": True, "attention_resolutions": ()})
        x = jnp.zeros((1, 4, 8, 8, 32))
        t = jnp.zeros((1,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        assert m.apply(params, x, t).shape == (1, 4, 8, 8, 8)

    def test_grad_checkpoint_forward(self):
        m = UNetModel(**{**TINY, "use_checkpoint": True})
        x = jnp.zeros((1, 8, 8, 8, 32))
        t = jnp.zeros((1,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        out = m.apply(params, x, t)
        assert out.shape == (1, 8, 8, 8, 8)
        # and gradients flow through the remat blocks
        g = jax.grad(
            lambda p: m.apply(p, x + 1.0, t).sum()
        )(params)
        assert n_params(g) == n_params(params)

    def test_selective_remat_same_numerics(self):
        """remat_max_ds / remat_policy change WHAT the backward recomputes,
        never the math: identical param trees, forwards, and gradients
        across every remat configuration."""
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((1, 8, 8, 8, 32)),
            jnp.float32,
        )
        t = jnp.asarray([3])
        variants = [
            {},
            {"use_checkpoint": True},
            {"use_checkpoint": True, "remat_max_ds": 1},
            {"use_checkpoint": True, "remat_policy": "dots_saveable"},
        ]
        outs, grads = [], []
        for kw in variants:
            m = UNetModel(**{**TINY, "attention_resolutions": (), **kw})
            params = m.init(jax.random.PRNGKey(0), x, t)
            outs.append(np.asarray(m.apply(params, x, t)))
            g = jax.grad(lambda p: (m.apply(p, x, t) ** 2).sum())(params)
            grads.append(jax.tree.map(np.asarray, g))
        for o in outs[1:]:
            np.testing.assert_allclose(o, outs[0], atol=1e-5)
        for g in grads[1:]:
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(grads[0])):
                np.testing.assert_allclose(a, b, atol=1e-4)

    def test_class_conditional(self):
        m = UNetModel(**{**TINY, "num_classes": 2})
        x = jnp.zeros((1, 8, 8, 8, 32))
        t = jnp.zeros((1,), jnp.int32)
        y = jnp.zeros((1,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t, y)
        assert m.apply(params, x, t, y).shape == (1, 8, 8, 8, 8)


class TestWavUNet:
    def test_forward_shape_and_roundtrip_levels(self):
        m = WavUNetModel(
            image_size=16,
            in_channels=8,
            model_channels=32,
            out_channels=8,
            num_res_blocks=2,
            attention_resolutions=(),
            channel_mult=(1, 2),
            dims=3,
            num_groups=8,
            resblock_updown=True,
            bottleneck_attention=False,
            resample_2d=False,
            use_freq=True,
        )
        x = jnp.ones((1, 16, 16, 8, 8))
        t = jnp.zeros((1,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        out = m.apply(params, x, t)
        assert out.shape == (1, 16, 16, 8, 8)
        # output conv is NOT zero-init (`wunet.py:701-705`)
        assert float(jnp.abs(out).max()) > 0.0

    def test_additive_skips_rejected(self):
        """The reference WavUNet's additive branch is bit-rotted dead code
        (tensor+tuple TypeError, `wunet.py:752-775`) and incompatible with
        frequency skips — silently ignoring the flag would train a
        different architecture than configured."""
        m = WavUNetModel(
            image_size=16,
            in_channels=8,
            model_channels=16,
            out_channels=8,
            num_res_blocks=1,
            attention_resolutions=(),
            channel_mult=(1, 2),
            dims=3,
            num_groups=8,
            additive_skips=True,
        )
        x = jnp.ones((1, 8, 8, 8, 8))
        t = jnp.zeros((1,), jnp.int32)
        with pytest.raises(ValueError, match="additive_skips"):
            m.init(jax.random.PRNGKey(0), x, t)


class TestEncoder:
    @pytest.mark.parametrize("pool", ["adaptive", "spatial", "spatial_v2"])
    def test_pools(self, pool):
        m = EncoderUNetModel(
            image_size=16,
            in_channels=4,
            model_channels=16,
            out_channels=2,
            num_res_blocks=1,
            attention_resolutions=(),
            channel_mult=(1, 2),
            dims=3,
            num_groups=8,
            num_head_channels=8,
            pool=pool,
        )
        x = jnp.zeros((2, 8, 8, 8, 4))
        t = jnp.zeros((2,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        out = m.apply(params, x, t)
        assert out.shape == (2, 2)


class TestFactory:
    def test_defaults_schema_keys(self):
        """Flag schema parity with `script_util.py:70-104`."""
        keys = set(model_and_diffusion_defaults())
        expected = {
            "image_size", "num_channels", "num_res_blocks", "num_heads",
            "num_heads_upsample", "num_head_channels", "attention_resolutions",
            "channel_mult", "dropout", "class_cond", "use_checkpoint",
            "use_scale_shift_norm", "resblock_updown", "use_fp16",
            "use_new_attention_order", "dims", "num_groups", "in_channels",
            "out_channels", "bottleneck_attention", "resample_2d",
            "additive_skips", "mode", "use_freq", "predict_xstart",
            "sample_schedule", "learn_sigma", "diffusion_steps",
            "noise_schedule", "timestep_respacing", "use_kl",
            "rescale_timesteps", "rescale_learned_sigmas", "dataset",
        }
        assert expected <= keys

    def test_remat_max_ds_threads_through_factory(self):
        """remat_max_ds=0 (remat every block) must reach the model: the
        selective default (ds<=1) plus a --device_cache pinned dataset
        OOMs one chip (PERF.md round 3), so the flag is load-bearing."""
        from fast_cwdm_tpu.models.factory import create_model

        base = dict(
            image_size=16, num_channels=8, num_res_blocks=1,
            channel_mult="1,2", attention_resolutions="", num_groups=4,
            dims=3, in_channels=8, out_channels=8,
        )
        assert create_model(**base).remat_max_ds == 1  # factory default
        assert create_model(**base, remat_max_ds=0).remat_max_ds == 0
        m, _ = create_model_and_diffusion(
            **{**base, "channel_mult": "1,2"}, remat_max_ds=0
        )
        assert m.remat_max_ds == 0

    def test_create_model_and_diffusion_production_flags(self):
        """run.sh production flag bundle builds the right model/diffusion."""
        model, diffusion = create_model_and_diffusion(
            image_size=112,
            num_channels=64,
            num_res_blocks=2,
            channel_mult="1,2,2,4,4",
            attention_resolutions="",
            in_channels=32,
            out_channels=8,
            dims=3,
            num_groups=32,
            bottleneck_attention=False,
            resample_2d=False,
            diffusion_steps=10,
            sample_schedule="sampled",
            mode="i2i",
        )
        assert isinstance(model, UNetModel)
        assert model.channel_mult == (1, 2, 2, 4, 4)
        assert model.attention_resolutions == ()
        assert model.out_channels == 8
        assert diffusion.num_timesteps == 10
        assert diffusion.mode == "i2i"

    def test_dtype_flag_surface(self):
        """--dtype is part of the flag schema; strings map to compute
        dtypes, use_fp16 maps to bf16 (TPU-native mixed precision), and
        the production bundle defaults to bf16 (PERF.md setting)."""
        from fast_cwdm_tpu.cli import common

        assert "dtype" in model_and_diffusion_defaults()
        kw = dict(channel_mult="1,2", attention_resolutions="")
        assert create_model(16, 8, 1, dtype="bfloat16", **kw).dtype == (
            jnp.bfloat16
        )
        assert create_model(16, 8, 1, dtype="float32", **kw).dtype == (
            jnp.float32
        )
        assert create_model(16, 8, 1, dtype="", **kw).dtype is None
        assert create_model(16, 8, 1, use_fp16=True, **kw).dtype == (
            jnp.bfloat16
        )
        # an explicit --dtype float32 beats a checkpoint's use_fp16=True
        # (the flag is a runtime choice, never read from the checkpoint)
        assert create_model(
            16, 8, 1, use_fp16=True, dtype="float32", **kw
        ).dtype == jnp.float32
        with pytest.raises(ValueError, match="dtype"):
            create_model(16, 8, 1, dtype="fp16", **kw)
        model, _ = common.build_model_and_diffusion(
            common.production_config()
        )
        assert model.dtype == jnp.bfloat16
        # bf16 compute still initializes/keeps fp32 params
        x = jnp.zeros((1, 16, 16, 16, model.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        tiny = create_model(16, 32, 1, dtype="bfloat16", in_channels=32,
                            out_channels=8, **kw)
        p = tiny.init(jax.random.PRNGKey(0), x, t)["params"]
        leaves = jax.tree.leaves(p)
        assert all(v.dtype == jnp.float32 for v in leaves)
        out = tiny.apply({"params": p}, x, t)
        assert out.dtype == jnp.float32  # head output cast back

    def test_out_channels_auto(self):
        # single learn_sigma doubling — documented deviation: the reference
        # quadruples (auto sets 2*in at script_util.py:240-241, then the
        # constructor call doubles again at :248), breaking LEARNED_RANGE
        m = create_model(64, 32, 1, channel_mult="1,2", in_channels=3,
                         learn_sigma=True, attention_resolutions="")
        assert m.out_channels == 6
        m = create_model(64, 32, 1, channel_mult="1,2", in_channels=3,
                         attention_resolutions="")
        assert m.out_channels == 3
        # explicit out_channels still gets the learn_sigma doubling
        m = create_model(64, 32, 1, channel_mult="1,2", in_channels=3,
                         out_channels=5, learn_sigma=True,
                         attention_resolutions="")
        assert m.out_channels == 10

    def test_class_cond_wunet(self):
        # the reference's WavUNet advertises class conditioning but never
        # implements it (wunet.py:425,455,734) — here the flag is real
        # constant-width mult: factory wunets are ref_compat=True, whose
        # aliased decoder double-run only executes at constant channel width
        m = create_model(16, 16, 1, channel_mult="1,1", in_channels=8,
                         out_channels=8, attention_resolutions="",
                         use_freq=True, class_cond=True, num_groups=8)
        assert isinstance(m, WavUNetModel) and m.num_classes == NUM_CLASSES
        x = jnp.zeros((1, 16, 16, 16, 8))
        t = jnp.zeros((1,), jnp.int32)
        y = jnp.zeros((1,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t, y)
        assert "label_emb" in params["params"]
        assert m.apply(params, x, t, y).shape == (1, 16, 16, 16, 8)
        # unconditional construction has no label params and takes no y
        m0 = create_model(16, 16, 1, channel_mult="1,1", in_channels=8,
                          out_channels=8, attention_resolutions="",
                          use_freq=True, num_groups=8)
        p0 = m0.init(jax.random.PRNGKey(0), x, t)
        assert "label_emb" not in p0["params"]

    def test_use_freq_dispatch(self):
        m = create_model(64, 32, 1, channel_mult="1,2", in_channels=8,
                         attention_resolutions="", use_freq=True)
        assert isinstance(m, WavUNetModel)


class TestTimestepEmbedding:
    def test_golden_formula(self):
        """Bit-parity with `nn.py:103-121` ([cos | sin], max_period 1e4)."""
        # moderate t: at t~1000 the cos/sin phase magnifies float32 exp()
        # rounding in the frequency table into ~1e-3 output differences
        t = jnp.array([0.0, 1.0, 17.0, 50.0])
        dim = 32
        emb = np.asarray(timestep_embedding(t, dim))
        half = dim // 2
        freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
        args = np.asarray(t)[:, None] * freqs[None]
        expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        np.testing.assert_allclose(emb, expected, rtol=2e-5, atol=2e-6)

    def test_odd_dim_padding(self):
        emb = timestep_embedding(jnp.array([3.0]), 7)
        assert emb.shape == (1, 7)
        assert float(emb[0, -1]) == 0.0


class TestFusedConvPath:
    def test_fused_matches_plain(self):
        """fuse_conv routes GN→SiLU→conv through the fused path (Pallas on
        TPU, XLA-fallback prologue on CPU) — numerics must match the plain
        module chain."""
        kw = dict(TINY, attention_resolutions=(), bottleneck_attention=False)
        m0 = UNetModel(**kw)
        m1 = UNetModel(fuse_conv=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, 32))
        t = jnp.array([3], jnp.int32)
        p = m0.init(jax.random.PRNGKey(1), x, t)["params"]
        p = jax.tree.map(lambda a: a + 0.01, p)
        y0 = m0.apply({"params": p}, x, t)
        y1 = m1.apply({"params": p}, x, t)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), atol=2e-5
        )

    def test_param_trees_identical(self):
        kw = dict(TINY, attention_resolutions=(), bottleneck_attention=False)
        m0 = UNetModel(**kw)
        m1 = UNetModel(fuse_conv=True, **kw)
        x = jnp.zeros((1, 8, 8, 8, 32))
        t = jnp.zeros((1,), jnp.int32)
        p0 = m0.init(jax.random.PRNGKey(0), x, t)["params"]
        p1 = m1.init(jax.random.PRNGKey(0), x, t)["params"]
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
