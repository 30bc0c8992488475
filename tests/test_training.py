"""Training-layer tests (L4): train step, EMA, checkpoints, TrainLoop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
from fast_cwdm_tpu.models import UNetModel
from fast_cwdm_tpu.training import (
    TrainLoop,
    TrainState,
    find_best_checkpoint,
    load_best_losses,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    parse_resume_step_from_filename,
    save_checkpoint,
    save_if_best,
)

MODALITIES = ("t1n", "t1c", "t2w", "t2f")


def tiny_model():
    return UNetModel(
        image_size=8,
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


def make_batch(key, b=2, s=8):
    ks = jax.random.split(key, 4)
    return {
        m: jax.random.uniform(k, (b, s, s, s, 1))
        for m, k in zip(MODALITIES, ks)
    }


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    diffusion = GaussianDiffusion.named(
        "linear", 10, "sampled", mode="i2i"
    )
    batch = make_batch(jax.random.PRNGKey(0))
    from fast_cwdm_tpu.ops import wavelet as wv

    x = jnp.concatenate(
        [wv.dwt_normalized(batch[m]) for m in MODALITIES], axis=-1
    )
    params = model.init(
        jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32)
    )["params"]
    return model, diffusion, batch, params


class TestTrainStep:
    def test_loss_decreases_on_overfit(self, setup):
        model, diffusion, batch, params = setup
        tx = make_optimizer(1e-3)
        state = TrainState.create(params, tx, ema_rates=(0.9,))
        step = make_train_step(model, diffusion, tx, contr="t1n", mode="i2i")
        key = jax.random.PRNGKey(42)
        first = None
        for i in range(30):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert int(state.step) == 30
        assert np.isfinite(last)
        assert last < first, (first, last)
        assert metrics["mse_wav"].shape == (8,)
        assert float(metrics["grad_max"]) > 0

    def test_ema_tracks_params(self, setup):
        model, diffusion, batch, params = setup
        tx = make_optimizer(1e-3)
        state = TrainState.create(params, tx, ema_rates=(0.5,))
        step = make_train_step(model, diffusion, tx, contr="t1c", mode="i2i")
        state2, _ = step(state, batch, jax.random.PRNGKey(0))
        # warmup: at t=1 the effective rate is min(0.5, 2/11)
        r = min(0.5, 2.0 / 11.0)
        p_old = jax.tree.leaves(params)[0]
        p_new = jax.tree.leaves(state2.params)[0]
        p_ema = jax.tree.leaves(state2.ema_params[0])[0]
        np.testing.assert_allclose(
            np.asarray(p_ema),
            r * np.asarray(p_old) + (1 - r) * np.asarray(p_new),
            atol=1e-6,
        )

    def test_ema_warmup_schedule(self):
        """rate_t = min(rate, (1+t)/(10+t)): early shadows track params
        (forgetting the init), late shadows approach the asymptotic rate —
        the un-warmed 0.9999 horizon was measured harmful at the 5000-step
        production budget (QUALITY.md r4: SSIM 0.82 vs 0.99)."""
        from fast_cwdm_tpu.training.state import update_ema

        params = {"w": jnp.zeros((4,))}  # training pulls params to 0
        init = {"w": jnp.ones((4,))}
        state = TrainState.create(init, make_optimizer(1e-3),
                                  ema_rates=(0.9999,))

        def at_step(t):
            s = state.replace(step=jnp.asarray(t, jnp.int32))
            return float(update_ema(s, params)[0]["w"][0])

        # shadow = rate_t·ema + (1-rate_t)·params with ema=init=1, params=0
        assert at_step(1) == pytest.approx(2.0 / 11.0)
        assert at_step(100) == pytest.approx(101.0 / 110.0)
        # asymptotic regime: min() selects the configured rate
        assert at_step(200_000) == pytest.approx(0.9999)
        # monotone: never exceeds the configured rate
        assert all(at_step(t) <= 0.9999 + 1e-9 for t in (1, 10, 1000))

    def test_grad_accum_matches_full_batch(self, setup):
        """accum_steps>1 splits the batch into scanned microbatches but
        draws the SAME t and full-batch noise as the unaccumulated step —
        resulting params/metrics match up to float re-association."""
        model, diffusion, _, params = setup
        batch = make_batch(jax.random.PRNGKey(7), b=4)
        tx = make_optimizer(1e-3)
        key = jax.random.PRNGKey(9)

        def run(accum):
            state = TrainState.create(params, tx, ema_rates=(0.9,))
            step = make_train_step(
                model, diffusion, tx, contr="t1c", mode="i2i",
                accum_steps=accum,
            )
            return step(state, batch, key)

        s1, m1 = run(1)
        s2, m2 = run(2)
        s4, m4 = run(4)
        np.testing.assert_allclose(
            float(m2["loss"]), float(m1["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(m2["mse_wav"]), np.asarray(m1["mse_wav"]), rtol=2e-4
        )
        # per-sample losses keep batch order across the microbatch split
        np.testing.assert_allclose(
            np.asarray(m2["loss_per_sample"]),
            np.asarray(m1["loss_per_sample"]),
            rtol=2e-4,
        )
        np.testing.assert_array_equal(np.asarray(m2["t"]), np.asarray(m1["t"]))
        for accum_state in (s2, s4):
            for a, b in zip(
                jax.tree.leaves(s1.params), jax.tree.leaves(accum_state.params)
            ):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=5e-6
                )

    def test_trainloop_microbatch_wiring(self, setup):
        """TrainLoop maps the reference's --microbatch flag (microbatch
        SIZE) to accumulation count, and rejects indivisible sizes."""
        from fast_cwdm_tpu.training.loop import TrainLoop

        model, diffusion, batch, _ = setup
        kwargs = dict(
            model=model, diffusion=diffusion, data=[batch], batch_size=4,
            checkpoint_dir="/tmp/unused_mb",
        )
        with pytest.raises(ValueError, match="not divisible"):
            TrainLoop(**kwargs, microbatch=3)
        # microbatch<=0 or >= batch_size → no accumulation; valid divisor OK
        for mb in (-1, 0, 4, 8, 2):
            TrainLoop(**kwargs, microbatch=mb)

    def test_grad_accum_rejects_indivisible_batch(self, setup):
        model, diffusion, _, params = setup
        batch = make_batch(jax.random.PRNGKey(7), b=3)
        tx = make_optimizer(1e-3)
        state = TrainState.create(params, tx, ema_rates=())
        step = make_train_step(
            model, diffusion, tx, contr="t1c", mode="i2i", accum_steps=2
        )
        with pytest.raises(ValueError, match="not divisible"):
            step(state, batch, jax.random.PRNGKey(0))

    def test_lr_anneal_reaches_zero(self):
        tx = make_optimizer(1.0, lr_anneal_steps=10)
        params = {"w": jnp.ones((4,))}
        opt_state = tx.init(params)
        grads = {"w": jnp.ones((4,))}
        # advance the schedule past the end: the 11th update sees
        # count=10 → lr·(1 - 10/10) = 0
        for _ in range(11):
            updates, opt_state = tx.update(grads, opt_state, params)
        assert float(jnp.abs(updates["w"]).max()) < 1e-6


class TestCheckpoints:
    def test_save_if_best_ledger(self, tmp_path, setup):
        _, _, _, params = setup
        d = str(tmp_path)
        payload = {"params": params}
        assert save_if_best(
            d, "t1n", 0.5, payload, None,
            sample_schedule="sampled", diffusion_steps=10,
        )
        # worse loss → not saved
        assert not save_if_best(
            d, "t1n", 0.7, payload, None,
            sample_schedule="sampled", diffusion_steps=10,
        )
        # better loss → saved, old file replaced
        assert save_if_best(
            d, "t1n", 0.3, payload, None,
            sample_schedule="sampled", diffusion_steps=10,
        )
        assert load_best_losses(d) == {"t1n": 0.3}
        found = find_best_checkpoint(d, "t1n")
        assert found is not None
        path, schedule, steps = found
        assert schedule == "sampled" and steps == 10
        loaded = load_checkpoint(path, {"params": params})
        chex_leaf = jax.tree.leaves(loaded["params"])[0]
        np.testing.assert_array_equal(
            np.asarray(chex_leaf), np.asarray(jax.tree.leaves(params)[0])
        )

    def test_save_if_best_rejects_nan_and_heals_poisoned_ledger(
        self, tmp_path, setup
    ):
        """A NaN loss must never claim the best slot (the reference's
        'loss < best' is NaN-safe, `train_util.py:321`); a non-finite
        ledger entry from an older run counts as absent so the first
        finite loss heals it."""
        _, _, _, params = setup
        d = str(tmp_path)
        payload = {"params": params}
        kw = dict(sample_schedule="sampled", diffusion_steps=10)
        assert save_if_best(d, "t1n", 0.5, payload, None, **kw)
        assert not save_if_best(
            d, "t1n", float("nan"), payload, None, **kw
        )
        assert load_best_losses(d) == {"t1n": 0.5}
        # poisoned ledger (legacy): a finite loss takes the slot back
        from fast_cwdm_tpu.training.checkpoints import save_best_losses

        save_best_losses(d, {"t1n": float("nan")})
        assert save_if_best(d, "t1n", 0.9, payload, None, **kw)
        assert load_best_losses(d) == {"t1n": 0.9}

    def test_roundtrip_preserves_tree(self, tmp_path, setup):
        _, _, _, params = setup
        p = str(tmp_path / "x.ckpt")
        save_checkpoint(p, {"params": params}, config={"a": 1})
        out = load_checkpoint(p, {"params": params})
        for a, b in zip(jax.tree.leaves(out), jax.tree.leaves({"params": params})):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_parse_resume_step(self):
        # the STEP field, not the trailing diffusion-steps suffix
        assert parse_resume_step_from_filename("brats_t1n_004200_direct_1000.ckpt") == 4200
        assert parse_resume_step_from_filename("opt012345.pt") == 12345


class TestTrainLoop:
    def test_smoke_with_test_hook(self, tmp_path, setup, monkeypatch):
        model, diffusion, batch, _ = setup
        monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
        host_batch = jax.tree.map(np.asarray, batch)

        def data():
            while True:
                yield host_batch

        loop = TrainLoop(
            model=model,
            diffusion=diffusion,
            data=data,
            batch_size=2,
            lr=1e-4,
            ema_rate="0.99",
            log_interval=2,
            save_interval=2,
            mode="i2i",
            contr="t1n",
            sample_schedule="sampled",
            diffusion_steps=10,
            checkpoint_dir=str(tmp_path),
        )
        state = loop.run_loop()
        assert int(state.step) == 2
        assert find_best_checkpoint(str(tmp_path), "t1n") is not None


class TestLossAwareTraining:
    def test_loss_aware_sampler_state_updates(self, setup):
        from fast_cwdm_tpu.diffusion.resample import LossSecondMomentResampler

        model, diffusion, batch, params = setup
        sampler = LossSecondMomentResampler(
            diffusion.num_timesteps, history_per_term=3
        )
        tx = make_optimizer(1e-4)
        state = TrainState.create(
            params, tx, sampler_state=sampler.init_state()
        )
        step = make_train_step(
            model, diffusion, tx, contr="t1n", mode="i2i", sampler=sampler
        )
        key = jax.random.PRNGKey(0)
        for i in range(3):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        counts = np.asarray(state.sampler_state.loss_counts)
        assert counts.sum() == 3 * 2  # batch 2 examples per step
        assert np.isfinite(float(metrics["loss"]))


class TestOrbaxBackend:
    def test_roundtrip(self, tmp_path, setup):
        from fast_cwdm_tpu.training import orbax_io

        if not orbax_io.available():
            pytest.skip("orbax not installed")
        _, _, _, params = setup
        p = str(tmp_path / "orbax_ckpt")
        orbax_io.save(p, {"params": params})
        out = orbax_io.load(p, {"params": params})
        for a, b in zip(jax.tree.leaves(out), jax.tree.leaves({"params": params})):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_best_save_lifecycle_orbax_backend(
        self, tmp_path, setup, monkeypatch
    ):
        """FAST_CWDM_CKPT_BACKEND=orbax routes the whole best-checkpoint
        regime — naming, ledger, discovery, replacement-deletion, resume
        load, CLI load — through Orbax directories."""
        import os

        from fast_cwdm_tpu.training import checkpoints as ckpt, orbax_io

        if not orbax_io.available():
            pytest.skip("orbax not installed")
        monkeypatch.setenv("FAST_CWDM_CKPT_BACKEND", "orbax")
        _, _, _, params = setup
        d = str(tmp_path)
        payload = {"params": params, "ema_params": (params,), "step": 5}
        assert ckpt.save_if_best(
            d, "t1c", 0.5, payload, {"opt": np.arange(3.0)},
            sample_schedule="sampled", diffusion_steps=10,
            config={"sample_schedule": "sampled", "diffusion_steps": 10},
        )
        # worse loss refused against the ledger
        assert not ckpt.save_if_best(
            d, "t1c", 0.7, payload, None,
            sample_schedule="sampled", diffusion_steps=10,
        )
        path, schedule, steps = ckpt.find_best_checkpoint(d, "t1c")
        assert path.endswith(".orbax") and (schedule, steps) == ("sampled", 10)
        loaded = ckpt.load_checkpoint(
            path, {"params": params, "ema_params": (params,), "step": 0}
        )
        assert int(loaded["step"]) == 5
        for a, b in zip(
            jax.tree.leaves(loaded["params"]), jax.tree.leaves(params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # templateless restore (the CLI path) sees the EMA shadow
        raw = orbax_io.restore_any(path)
        assert len(raw["ema_params"]) == 1
        # a better loss under a different schedule replaces the best and
        # deletes the previous directory (name parse covers no-sidecar)
        assert ckpt.save_if_best(
            d, "t1c", 0.3, payload, None,
            sample_schedule="direct", diffusion_steps=1000,
        )
        path2, schedule2, steps2 = ckpt.find_best_checkpoint(d, "t1c")
        assert (schedule2, steps2) == ("direct", 1000)
        assert not os.path.exists(path)

    def test_sharded_params_roundtrip(self, tmp_path, setup):
        """Orbax saves/restores mesh-sharded arrays (the multi-host story
        the msgpack backend cannot cover)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fast_cwdm_tpu.parallel import make_mesh
        from fast_cwdm_tpu.training import orbax_io

        if not orbax_io.available():
            pytest.skip("orbax not installed")
        mesh = make_mesh(data=4, sp=2)
        x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
        sharded = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        p = str(tmp_path / "sharded.orbax")
        orbax_io.save(p, {"params": {"w": sharded}, "step": 1})
        out = orbax_io.load(p, {"params": {"w": sharded}, "step": 0})
        np.testing.assert_array_equal(np.asarray(out["params"]["w"]), x)
        assert int(out["step"]) == 1

    def test_ema_probe_finds_arity_on_orbax(self, tmp_path, setup):
        """`load_with_ema_probe` must probe EMA-shadow arities on the
        orbax backend too (resume from an orbax checkpoint written under
        a different ema_rate config), and a wrong `prefer_arity` must
        fall through to the stored one rather than erroring."""
        from fast_cwdm_tpu.training import checkpoints as ckpt, orbax_io

        if not orbax_io.available():
            pytest.skip("orbax not installed")
        _, _, _, params = setup
        p = str(tmp_path / "ema1.orbax")
        orbax_io.save(
            p, {"params": params, "ema_params": (params,), "step": 7}
        )
        loaded = ckpt.load_with_ema_probe(p, params, prefer_arity=2)
        assert len(loaded["ema_params"]) == 1
        assert int(loaded["step"]) == 7
        for a, b in zip(
            jax.tree.leaves(loaded["ema_params"][0]), jax.tree.leaves(params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestImagePanels:
    def test_panel_keys_match_reference(self, tmp_path, setup, monkeypatch):
        """Every 2·log_interval steps the loop logs the x0 mid-plane, the 8
        predicted subband mid-planes, and the 3 source-modality mid-planes
        (`train_util.py:226-284`)."""
        from fast_cwdm_tpu.training import loop as loop_mod
        from fast_cwdm_tpu.utils import logger as _logger

        model, diffusion, batch, _ = setup
        monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
        host_batch = jax.tree.map(np.asarray, batch)
        captured = {}
        monkeypatch.setattr(
            _logger, "log_images", lambda imgs, step: captured.update(imgs)
        )

        def data():
            while True:
                yield host_batch

        loop = TrainLoop(
            model=model,
            diffusion=diffusion,
            data=data,
            batch_size=2,
            lr=1e-4,
            log_interval=1,
            save_interval=2,
            mode="i2i",
            contr="t1n",
            sample_schedule="sampled",
            diffusion_steps=10,
            checkpoint_dir=str(tmp_path),
        )
        loop.run_loop()
        expected = {"sample/x_0"}
        expected |= {f"sample/{n.upper()}" for n in loop_mod.SUBBAND_NAMES}
        expected |= {"source/t1c", "source/t2w", "source/t2f"}
        assert expected <= set(captured), sorted(set(captured))
        assert "source/t1n" not in captured  # target modality excluded
        for k, v in captured.items():
            assert v.ndim == 2 and np.isfinite(v).all(), k


class TestUnconditionalTraining:
    def test_default_mode_train_and_sample(self, tmp_path):
        """LIDC-style unconditional path (`lidcloader.py`, mode='default'):
        single-array batches through the train step, then an unconditional
        p_sample_loop from the trained params."""
        import jax.numpy as jnp

        from fast_cwdm_tpu.models import UNetModel

        model = UNetModel(
            image_size=8,
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
        diffusion = GaussianDiffusion.named(
            "linear", 4, "sampled", mode="default"
        )
        rng = np.random.default_rng(0)
        batch = jnp.asarray(rng.random((2, 16, 16, 16, 1), np.float32))
        from fast_cwdm_tpu.ops import wavelet as wv

        x0 = wv.dwt_normalized(batch)
        params = model.init(
            jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32)
        )["params"]
        tx = make_optimizer(1e-4)
        state = TrainState.create(params, tx)
        step = make_train_step(model, diffusion, tx, mode="default")
        key = jax.random.PRNGKey(1)
        for i in range(3):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"]))
        assert metrics["mse_wav"].shape == (8,)

        def model_fn(x, t):
            return model.apply({"params": state.params}, x, t)

        out = diffusion.p_sample_loop(
            model_fn, (1, 8, 8, 8, 8), jax.random.PRNGKey(2)
        )
        assert out.shape == (1, 8, 8, 8, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestWavUNetTraining:
    def test_wunet_train_step(self):
        """WavUNetModel through the full donated train step (the wavelet
        up/downsampling variant is trainable, not just a forward surface)."""
        import jax.numpy as jnp

        from fast_cwdm_tpu.models.wunet import WavUNetModel

        model = WavUNetModel(
            image_size=16,
            in_channels=32,
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
        )
        diffusion = GaussianDiffusion.named(
            "linear", 4, "sampled", mode="i2i"
        )
        rng = np.random.default_rng(2)
        batch = {
            m: jnp.asarray(rng.random((1, 16, 16, 16, 1), np.float32))
            for m in MODALITIES
        }
        from fast_cwdm_tpu.ops import wavelet as wv

        x0 = jnp.concatenate(
            [wv.dwt_normalized(batch[m]) for m in MODALITIES], axis=-1
        )
        params = model.init(
            jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32)
        )["params"]
        tx = make_optimizer(1e-4)
        state = TrainState.create(params, tx)
        step = make_train_step(model, diffusion, tx, contr="t1n", mode="i2i")
        key = jax.random.PRNGKey(3)
        first = None
        for i in range(5):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            if first is None:
                first = float(metrics["loss"])
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 5


class TestResumeStepParsing:
    def test_step_field_not_diffusion_steps(self):
        from fast_cwdm_tpu.training.checkpoints import (
            parse_resume_step_from_filename,
        )

        assert (
            parse_resume_step_from_filename(
                "brats_t1n_000500_direct_1000.ckpt"
            )
            == 500
        )
        # BEST names carry no step field → 0 (payload step is authoritative)
        assert (
            parse_resume_step_from_filename("brats_t1c_BEST_sampled_10.ckpt")
            == 0
        )


class TestAsyncWriteFailure:
    def test_failed_async_write_raises_on_next_wait(self, tmp_path):
        import numpy as np

        from fast_cwdm_tpu.training import checkpoints as ckpt

        bad_dir = tmp_path / "not_a_dir"
        bad_dir.write_text("occupied")  # a FILE where a dir is needed
        ckpt.save_checkpoint(
            str(bad_dir / "x.ckpt"), {"a": np.zeros(2)}, async_write=True
        )
        with pytest.raises(RuntimeError, match="async checkpoint write"):
            ckpt.wait_for_pending_saves()


class TestInfiniteIterator:
    def test_empty_first_epoch_names_the_real_cause(self):
        from fast_cwdm_tpu.training.loop import _infinite

        with pytest.raises(ValueError, match="first epoch"):
            next(_infinite(lambda: iter(())))

    def test_exhausted_bare_iterator_detected(self):
        from fast_cwdm_tpu.training.loop import _infinite

        one_shot = iter([1, 2])
        it = _infinite(lambda: one_shot)  # bare iterator, not a factory
        assert [next(it), next(it)] == [1, 2]
        with pytest.raises(ValueError, match="CALLABLE factory"):
            next(it)


class TestPreemptionResume:
    def _loop_kwargs(self, setup, tmp_path, **over):
        model, diffusion, batch, _ = setup

        def data():
            while True:
                yield jax.tree.map(np.asarray, batch)

        kw = dict(
            model=model, diffusion=diffusion, data=data, batch_size=2,
            lr=1e-4, log_interval=1000, save_interval=1000, mode="i2i",
            contr="t1n", sample_schedule="sampled", diffusion_steps=10,
            checkpoint_dir=str(tmp_path), lr_anneal_steps=2, seed=3,
        )
        kw.update(over)
        return kw

    def _resumed_state(self, setup, kw):
        _, _, batch, _ = setup
        loop = TrainLoop(**kw)
        loop.state = loop._init_state(jax.tree.map(np.asarray, batch))
        loop._apply_resume()
        return loop

    def test_step_save_writes_and_resume_restores_opt(
        self, setup, tmp_path, capsys
    ):
        """The preemption (step-stamped) save writes opt{step:06d} and a
        resume restores THOSE Adam moments — not the last BEST save's
        (stale moments + a jumped-back anneal count spike the LR)."""
        from fast_cwdm_tpu.utils import logger as flogger

        flogger.configure()  # rebind stdout (capsys swaps it per test)
        from fast_cwdm_tpu.training import checkpoints as ckpt

        kw = self._loop_kwargs(setup, tmp_path)
        loop = TrainLoop(**kw)
        state = loop.run_loop()  # 2 steps, no periodic saves
        step = int(state.step)
        loop.save(step)
        ckpt.wait_for_pending_saves()
        files = os.listdir(tmp_path)
        # the opt stem is dataset/contr-qualified: modality runs share one
        # checkpoint_dir, a bare opt{step} would collide across them
        assert ckpt.opt_checkpoint_name("t1n", step, "sampled", 10) in files, files
        step_file = next(
            f for f in files
            if parse_resume_step_from_filename(f) == step
            and not f.startswith("opt") and f.endswith(".ckpt")
        )
        loop2 = self._resumed_state(
            setup,
            {**kw, "resume_checkpoint": str(tmp_path / step_file)},
        )
        assert loop2.resume_step == step
        out = capsys.readouterr().out
        assert "WARNING" not in out, out
        for a, b in zip(
            jax.tree.leaves(loop2.state.opt_state),
            jax.tree.leaves(state.opt_state),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_reference_style_bare_opt_blob_still_resumes(
        self, setup, tmp_path, capsys
    ):
        """A checkpoint dir imported from the reference pairs the step
        checkpoint with a bare ``opt{step:06d}`` blob
        (`train_util.py:505-513`) — the resume search must find it."""
        from fast_cwdm_tpu.utils import logger as flogger

        flogger.configure()
        from fast_cwdm_tpu.training import checkpoints as ckpt

        kw = self._loop_kwargs(setup, tmp_path)
        loop = TrainLoop(**kw)
        state = loop.run_loop()
        step = int(state.step)
        loop.save(step)
        ckpt.wait_for_pending_saves()
        os.rename(
            tmp_path / ckpt.opt_checkpoint_name("t1n", step, "sampled", 10),
            tmp_path / f"opt{step:06d}.ckpt",
        )
        step_file = next(
            f for f in os.listdir(tmp_path)
            if parse_resume_step_from_filename(f) == step
            and not f.startswith("opt") and f.endswith(".ckpt")
        )
        loop2 = self._resumed_state(
            setup, {**kw, "resume_checkpoint": str(tmp_path / step_file)}
        )
        out = capsys.readouterr().out
        assert "WARNING" not in out, out
        for a, b in zip(
            jax.tree.leaves(loop2.state.opt_state),
            jax.tree.leaves(state.opt_state),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_pre_schedule_qualification_opt_stem_still_resumes(
        self, setup, tmp_path, capsys
    ):
        """Checkpoint dirs written before the opt stem gained the
        schedule/steps qualifier pair the step checkpoint with
        ``opt_{dataset}_{contr}_{step:06d}`` — the resume search must
        still find those."""
        from fast_cwdm_tpu.utils import logger as flogger

        flogger.configure()
        from fast_cwdm_tpu.training import checkpoints as ckpt

        kw = self._loop_kwargs(setup, tmp_path)
        loop = TrainLoop(**kw)
        state = loop.run_loop()
        step = int(state.step)
        loop.save(step)
        ckpt.wait_for_pending_saves()
        os.rename(
            tmp_path / ckpt.opt_checkpoint_name("t1n", step, "sampled", 10),
            tmp_path / f"opt_brats_t1n_{step:06d}.ckpt",
        )
        step_file = next(
            f for f in os.listdir(tmp_path)
            if parse_resume_step_from_filename(f) == step
            and not f.startswith("opt") and f.endswith(".ckpt")
        )
        loop2 = self._resumed_state(
            setup, {**kw, "resume_checkpoint": str(tmp_path / step_file)}
        )
        out = capsys.readouterr().out
        assert "WARNING" not in out, out
        for a, b in zip(
            jax.tree.leaves(loop2.state.opt_state),
            jax.tree.leaves(state.opt_state),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_preemption_saves_prune_older_and_skip_other_runs(
        self, setup, tmp_path
    ):
        """Repeated preemption saves keep only the newest step-stamped
        model+opt pair for THIS run; another modality's files and the BEST
        regime are untouched."""
        from fast_cwdm_tpu.utils import logger as flogger

        flogger.configure()  # rebind stdout (capsys swaps it per test)
        from fast_cwdm_tpu.training import checkpoints as ckpt

        kw = self._loop_kwargs(setup, tmp_path)
        loop = TrainLoop(**kw)
        loop.state = loop._init_state(
            jax.tree.map(np.asarray, setup[2])
        )
        other_model = tmp_path / "brats_t2w_000001_sampled_10.ckpt"
        other_opt = tmp_path / ckpt.opt_checkpoint_name("t2w", 1, "sampled", 10)
        best = tmp_path / "brats_t1n_BEST_sampled_10.ckpt"
        # SAME modality, DIFFERENT schedule sharing the checkpoint_dir (a
        # layout the schedule-qualified BEST names explicitly permit): its
        # step-stamped pair must survive this run's prune even at an older
        # step
        other_sched_model = tmp_path / "brats_t1n_000001_direct_1000.ckpt"
        other_sched_opt = tmp_path / ckpt.opt_checkpoint_name(
            "t1n", 1, "direct", 1000
        )
        sentinels = (
            other_model, other_opt, best, other_sched_model, other_sched_opt
        )
        for p in sentinels:
            p.write_bytes(b"sentinel")
        loop.save(1)
        loop.save(2)
        ckpt.wait_for_pending_saves()
        files = set(os.listdir(tmp_path))
        assert ckpt.opt_checkpoint_name("t1n", 2, "sampled", 10) in files
        assert ckpt.opt_checkpoint_name("t1n", 1, "sampled", 10) not in files
        assert "brats_t1n_000001_sampled_10.ckpt" not in files, files
        # other runs + BEST regime untouched
        for p in sentinels:
            assert p.name in files, (p.name, files)

    def test_resume_from_checkpoint_without_ema_shadows(
        self, setup, tmp_path, capsys
    ):
        """convert_checkpoint imports write ema_params=() while a training
        run's template carries ema_rate shadows — flax from_bytes is
        tuple-arity-strict, so the resume path must probe arities (like
        common.load_params) and start missing shadows from the params."""
        from fast_cwdm_tpu.utils import logger as flogger

        flogger.configure()
        from fast_cwdm_tpu.training import checkpoints as ckpt

        _, _, _, params = setup
        path = str(tmp_path / "brats_t1n_000007_sampled_10.ckpt")
        ckpt.save_checkpoint(
            path, {"params": params, "ema_params": (), "step": 7}
        )
        kw = self._loop_kwargs(
            setup, tmp_path, resume_checkpoint=path
        )
        loop = self._resumed_state(setup, kw)
        assert loop.resume_step == 7
        assert len(loop.state.ema_params) == len(loop._ema_rates)
        # missing shadows start from the loaded params
        for a, b in zip(
            jax.tree.leaves(loop.state.ema_params[0]),
            jax.tree.leaves(params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = capsys.readouterr().out
        assert "EMA shadow" in out, out

    def test_final_anneal_step_offered_to_save_if_best(
        self, setup, tmp_path, capsys
    ):
        """When lr_anneal_steps isn't a save-interval multiple, the final
        weights must still get a best-save opportunity (the reference's
        post-loop save, `train_util.py:311-313`)."""
        from fast_cwdm_tpu.utils import logger as flogger

        flogger.configure()
        from fast_cwdm_tpu.training import checkpoints as ckpt

        kw = self._loop_kwargs(
            setup, tmp_path, lr_anneal_steps=3, save_interval=50
        )
        loop = TrainLoop(**kw)
        loop.run_loop()
        ckpt.wait_for_pending_saves()
        assert ckpt.find_best_checkpoint(str(tmp_path), "t1n") is not None

    def test_missing_opt_blob_warns_fresh(self, setup, tmp_path, capsys):
        from fast_cwdm_tpu.utils import logger as flogger

        flogger.configure()  # rebind stdout (capsys swaps it per test)
        from fast_cwdm_tpu.training import checkpoints as ckpt

        kw = self._loop_kwargs(setup, tmp_path)
        loop = TrainLoop(**kw)
        state = loop.run_loop()
        step = int(state.step)
        loop.save(step)
        ckpt.wait_for_pending_saves()
        os.remove(tmp_path / ckpt.opt_checkpoint_name("t1n", step, "sampled", 10))
        # the end-of-anneal best-save writes an opt_best fallback — remove
        # it too so the no-optimizer-state-at-all path is exercised
        for p in tmp_path.glob("opt_best_t1n.*"):
            os.remove(p)
        step_file = next(
            f for f in os.listdir(tmp_path)
            if parse_resume_step_from_filename(f) == step
            and not f.startswith("opt") and f.endswith(".ckpt")
        )
        self._resumed_state(
            setup, {**kw, "resume_checkpoint": str(tmp_path / step_file)}
        )
        out = capsys.readouterr().out
        assert "FRESH optimizer" in out, out


_PREEMPT_CHILD = r"""
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.environ["TEST_DIR"])
from test_training import tiny_model, make_batch
from fast_cwdm_tpu.diffusion import GaussianDiffusion
from fast_cwdm_tpu.training import TrainLoop

model = tiny_model()
diffusion = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")
batch = jax.tree.map(np.asarray, make_batch(jax.random.PRNGKey(0)))

def data():
    while True:
        yield batch

loop = TrainLoop(
    model=model, diffusion=diffusion, data=data, batch_size=2, lr=1e-4,
    log_interval=10_000, save_interval=10_000, mode="i2i", contr="t1n",
    sample_schedule="sampled", diffusion_steps=10,
    checkpoint_dir=os.environ["CKPT_DIR"], lr_anneal_steps=10_000,
)

import threading
def watch():
    # first step done -> tell the parent we're mid-run
    import time
    while loop.state is None:
        time.sleep(0.05)
    print("RUNNING", flush=True)
threading.Thread(target=watch, daemon=True).start()
state = loop.run_loop()
print(f"EXITED_AT {int(state.step)}", flush=True)
"""


def test_sigterm_preemption_checkpoint(tmp_path):
    """TPU pods are preempted with SIGTERM: the loop must finish the
    in-flight step, write a step-stamped checkpoint, and exit cleanly so
    --resume_checkpoint continues from it (the reference loses everything
    since the last best-save)."""
    import signal
    import subprocess
    import sys
    import time

    script = tmp_path / "preempt_child.py"
    script.write_text(_PREEMPT_CHILD)
    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    env = dict(os.environ)
    env.update(
        TEST_DIR=os.path.dirname(os.path.abspath(__file__)),
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        CKPT_DIR=str(ckdir),
        JAX_PLATFORMS="cpu",
    )
    p = subprocess.Popen(
        [sys.executable, str(script)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    # wait until the loop is demonstrably mid-run, then preempt
    deadline = time.time() + 180
    line = ""
    while time.time() < deadline:
        line = p.stdout.readline()
        if "RUNNING" in line:
            break
    assert "RUNNING" in line, p.stderr.read()[-2000:]
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=180)
    assert p.returncode == 0, err[-2000:]
    assert "EXITED_AT" in out, (out, err[-2000:])
    step = int(out.split("EXITED_AT")[1].split()[0])
    assert step >= 1
    # a step-stamped checkpoint for that step exists and is resumable
    from fast_cwdm_tpu.training.checkpoints import (
        parse_resume_step_from_filename,
    )
    cks = [f for f in os.listdir(ckdir) if "BEST" not in f
           and f.endswith((".ckpt", ".orbax"))]
    assert cks, os.listdir(ckdir)
    assert any(parse_resume_step_from_filename(f) == step for f in cks), (
        cks, step
    )
