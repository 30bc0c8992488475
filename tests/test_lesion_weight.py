"""Lesion-weighted loss option (beyond-reference; QUALITY.md downstream
section): ``make_train_step(lesion_weight=W)`` adds an image-space MSE
over the case's seg mask. W=0 must be EXACTLY the reference objective
(`gaussian_diffusion.py:1164` + equal subband weights
`train_util.py:447-449`); W>0 adds `W · mean_{seg>0}((idwt(pred)−x₀)²)`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fast_cwdm_tpu.data.brats import MODALITIES
from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
from fast_cwdm_tpu.models import UNetModel
from fast_cwdm_tpu.training.train import make_train_step
from fast_cwdm_tpu.training.state import TrainState


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


def make_batch(key, b=2, s=8, lesion=True):
    ks = jax.random.split(key, 4)
    batch = {
        m: jax.random.uniform(k, (b, s, s, s, 1))
        for m, k in zip(MODALITIES, ks)
    }
    seg = np.zeros((b, s, s, s, 1), np.float32)
    if lesion:
        seg[:, 2:5, 2:5, 2:5] = 3.0
    batch["seg"] = jnp.asarray(seg)
    return batch


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    diffusion = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")
    batch = make_batch(jax.random.PRNGKey(0))
    from fast_cwdm_tpu.ops import wavelet as wv

    x = jnp.concatenate(
        [wv.dwt_normalized(batch[m]) for m in MODALITIES], axis=-1
    )
    params = model.init(
        jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32)
    )["params"]
    return model, diffusion, batch, params


def _state(params, tx):
    return TrainState.create(params=params, tx=tx)


def _run(setup, lesion_weight, batch=None, accum_steps=1):
    model, diffusion, b, params = setup
    batch = b if batch is None else batch
    tx = optax.sgd(0.0)  # lr 0: params untouched, loss comparable
    step = make_train_step(
        model, diffusion, tx, contr="t1c", mode="i2i",
        lesion_weight=lesion_weight, accum_steps=accum_steps,
    )
    state = _state(params, tx)
    _, metrics = step(state, batch, jax.random.PRNGKey(42))
    return metrics


def test_zero_weight_is_reference_objective(setup):
    m0 = _run(setup, 0.0)
    # same RNG path: the W>0 loss differs from W=0 by exactly W*aux
    m1 = _run(setup, 0.5)
    aux = float(m1["mse_lesion"])
    assert aux > 0.0
    np.testing.assert_allclose(
        float(m1["loss"]), float(m0["loss"]) + 0.5 * aux, rtol=1e-6
    )
    assert "mse_lesion" not in m0


def test_empty_mask_contributes_zero(setup):
    batch = make_batch(jax.random.PRNGKey(0), lesion=False)
    m0 = _run(setup, 0.0)
    m1 = _run(setup, 0.5, batch=batch)
    assert float(m1["mse_lesion"]) == 0.0
    np.testing.assert_allclose(
        float(m1["loss"]), float(m0["loss"]), rtol=1e-6
    )


def test_accum_path_carries_lesion_metric(setup):
    m = _run(setup, 0.5, accum_steps=2)
    assert np.isfinite(float(m["mse_lesion"]))
    assert np.isfinite(float(m["loss"]))


def test_rejects_non_i2i():
    model = tiny_model()
    diffusion = GaussianDiffusion.named("linear", 10, "sampled")
    with pytest.raises(ValueError, match="i2i"):
        make_train_step(
            model, diffusion, optax.sgd(0.0), mode="default",
            lesion_weight=0.5,
        )


def test_loader_with_seg(tmp_path):
    """BRATSVolumes(with_seg=True) returns raw labels at training geometry
    (pad/crop only — NEVER clip_and_normalize: labels are categorical)."""
    from fast_cwdm_tpu.data import BRATSVolumes, Nifti1Image, save

    case = tmp_path / "BraTS-GLI-00001-000"
    case.mkdir()
    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 900, size=(240, 240, 155)).astype(np.float32)
    for m in ("t1n", "t1c", "t2w", "t2f"):
        save(
            Nifti1Image(vol, np.eye(4)),
            str(case / f"BraTS-GLI-00001-000-{m}.nii.gz"),
        )
    seg = np.zeros((240, 240, 155), np.float32)
    seg[100:110, 100:110, 70:80] = 4.0
    save(
        Nifti1Image(seg, np.eye(4)),
        str(case / "BraTS-GLI-00001-000-seg.nii.gz"),
    )
    ds = BRATSVolumes(str(tmp_path), mode="train", with_seg=True)
    item = ds[0]
    assert item["seg"].shape == (224, 224, 160, 1)
    # labels preserved verbatim (4 stays 4), geometry = modality geometry
    assert set(np.unique(item["seg"])) == {0.0, 4.0}
    assert item["seg"].sum() == 4.0 * 10 * 10 * 10
    # collation includes seg when asked
    from fast_cwdm_tpu.data import iterate_batches

    batch = next(
        iterate_batches(
            ds, 1, keys=tuple(MODALITIES) + ("seg",), drop_last=False
        )
    )
    assert batch["seg"].shape == (1, 224, 224, 160, 1)


def make_varied_batch(key, b=4, s=8):
    """Per-sample masks of DIFFERENT sizes (incl. one empty) — the case
    that distinguishes per-sample masked means from a global masked mean
    under gradient accumulation."""
    batch = make_batch(key, b=b, s=s, lesion=False)
    seg = np.zeros((b, s, s, s, 1), np.float32)
    seg[0, 1:6, 1:6, 1:6] = 2.0           # big lesion, no core
    seg[1, 2:4, 2:4, 2:4] = 4.0           # small pure-core lesion
    seg[2, 2:6, 2:6, 2:6] = 2.0
    seg[2, 3:5, 3:5, 3:5] = 4.0           # nested core
    # sample 3: no lesion at all
    batch["seg"] = jnp.asarray(seg)
    return batch


def test_core_weight_ignores_non_core_labels(setup):
    """`lesion_core_weight` must key on raw label 4 ONLY: adding edema
    voxels (label 2) changes mse_lesion but not mse_lesion_core."""
    model, diffusion, _, params = setup
    tx = optax.sgd(0.0)
    batch = make_varied_batch(jax.random.PRNGKey(3))
    batch2 = dict(batch)
    seg2 = np.asarray(batch["seg"]).copy()
    seg2[3, 0:3, 0:3, 0:3] = 2.0  # new edema in the previously clean case
    batch2["seg"] = jnp.asarray(seg2)

    def run(b):
        step = make_train_step(
            model, diffusion, tx, contr="t1c", mode="i2i",
            lesion_weight=0.5, lesion_core_weight=0.7,
        )
        _, m = step(_state(params, tx), b, jax.random.PRNGKey(42))
        return m

    m1, m2 = run(batch), run(batch2)
    assert float(m1["mse_lesion_core"]) == pytest.approx(
        float(m2["mse_lesion_core"]), rel=1e-6
    )
    assert float(m1["mse_lesion"]) != pytest.approx(
        float(m2["mse_lesion"]), rel=1e-3
    )


@pytest.mark.parametrize("p", [0.0, 1.0])
def test_accum_exact_with_varied_masks(setup, p):
    """Per-sample masked means + t-weighting accumulate EXACTLY: accum 2
    over a batch with differently-sized (incl. empty) masks agrees with
    accum 1 on loss and both aux metrics (ADVICE r4 #1 — the old global
    masked mean diluted microbatches with small masks)."""
    model, diffusion, _, params = setup
    tx = optax.sgd(0.0)
    batch = make_varied_batch(jax.random.PRNGKey(5))
    key = jax.random.PRNGKey(9)

    def run(accum):
        step = make_train_step(
            model, diffusion, tx, contr="t1c", mode="i2i",
            lesion_weight=0.4, lesion_core_weight=0.3, lesion_t_power=p,
            accum_steps=accum,
        )
        _, m = step(_state(params, tx), batch, key)
        return m

    m1, m2 = run(1), run(2)
    for k in ("loss", "mse_lesion", "mse_lesion_core"):
        np.testing.assert_allclose(
            float(m2[k]), float(m1[k]), rtol=2e-5, err_msg=f"{k} accum=2"
        )


def test_t_power_rejects_negative(setup):
    model, diffusion, _, _ = setup
    with pytest.raises(ValueError, match="lesion_t_power"):
        make_train_step(
            model, diffusion, optax.sgd(0.0), contr="t1c", mode="i2i",
            lesion_weight=0.1, lesion_t_power=-1.0,
        )
