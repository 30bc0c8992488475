"""End-to-end CLI pipeline test (L5) on a tiny synthetic BraTS tree:

train → checkpoint → sample → drop_modality → sample_auto →
prepare_nnunet_dataset → evaluate_synthesis(direct).

This is the framework's equivalent of the reference's de-facto integration
test (SURVEY §4: `DIFFUSION_TRAINING_TEST` + nnUNet eval), runnable on CPU.
"""

import json
import os

import numpy as np
import pytest

from fast_cwdm_tpu.data import Nifti1Image, save

MODALITIES = ("t1n", "t1c", "t2w", "t2f")

# tiny model flags shared by train/sample CLIs
TINY_FLAGS = [
    "--num_channels=16",
    "--num_res_blocks=1",
    "--channel_mult=1,2",
    "--attention_resolutions=",
    "--num_groups=8",
    "--bottleneck_attention=False",
    "--image_size=8",
    "--in_channels=32",
    "--out_channels=8",
    "--dims=3",
    "--resample_2d=False",
    "--diffusion_steps=4",
    "--sample_schedule=sampled",
    "--mode=i2i",
]


def _make_case(case_dir, modalities=MODALITIES, shape=(24, 24, 15), seed=0):
    os.makedirs(case_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = os.path.basename(case_dir)
    for m in modalities:
        vol = (rng.random(shape) * 900 + 100).astype(np.float32)
        save(
            Nifti1Image(vol, np.eye(4)),
            os.path.join(case_dir, f"BraTS-GLI-{base}-000-{m}.nii.gz"),
        )
    # a fake segmentation for the nnUNet prep step
    seg = rng.integers(0, 3, shape).astype(np.int16)
    seg[seg == 2] = 4
    save(
        Nifti1Image(seg, np.eye(4)),
        os.path.join(case_dir, f"BraTS-GLI-{base}-000-seg.nii.gz"),
    )


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    train_dir = str(root / "train")
    for i in range(2):
        _make_case(os.path.join(train_dir, f"0000{i}"), seed=i)
    return {
        "root": str(root),
        "train": train_dir,
        "ckpt": str(root / "ckpt"),
    }


@pytest.mark.e2e
def test_full_pipeline(tree, monkeypatch):
    from fast_cwdm_tpu.cli import (
        complete_dataset,
        drop_modality,
        evaluate_synthesis,
        prepare_nnunet_dataset,
        sample,
        sample_auto,
        train,
    )

    # ---------------- train (2 steps via test hook) ----------------
    monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
    train.main(
        TINY_FLAGS
        + [
            f"--data_dir={tree['train']}",
            f"--checkpoint_dir={tree['ckpt']}",
            "--contr=t1c",
            "--data_mesh=1",
            "--batch_size=1",
            "--lr=1e-4",
            "--log_interval=1",
            "--save_interval=2",
        ]
    )
    monkeypatch.delenv("DIFFUSION_TRAINING_TEST")
    ckpts = [
        f
        for f in os.listdir(tree["ckpt"])
        if f.startswith("brats_t1c_BEST") and f.endswith(".ckpt")
    ]
    assert len(ckpts) == 1, os.listdir(tree["ckpt"])
    assert ckpts[0] == "brats_t1c_BEST_sampled_4.ckpt"
    assert os.path.exists(os.path.join(tree["ckpt"], "best_losses.txt"))

    # ---------------- sample ----------------
    out_dir = os.path.join(tree["root"], "results")
    sample.main(
        TINY_FLAGS
        + [
            f"--data_dir={tree['train']}",
            f"--model_path={os.path.join(tree['ckpt'], ckpts[0])}",
            f"--output_dir={out_dir}",
            "--contr=t1c",
        ]
    )
    cases = sorted(os.listdir(out_dir))
    assert len(cases) == 2
    from fast_cwdm_tpu.data import load

    s = load(os.path.join(out_dir, cases[0], "sample.nii.gz")).get_fdata()
    t = load(os.path.join(out_dir, cases[0], "target.nii.gz")).get_fdata()
    assert s.shape == (8, 8, 155) and t.shape == (8, 8, 155)
    assert 0.0 <= s.min() and s.max() <= 1.0

    # ---------------- evaluate (direct SSIM/PSNR) ----------------
    report_path = os.path.join(tree["root"], "report.json")
    evaluate_synthesis.main(
        ["--mode=direct", f"--sample_dir={out_dir}", f"--report={report_path}"]
    )
    report = json.load(open(report_path))
    assert report["n"] == 2
    assert report["ssim_mean"] is not None

    # ---------------- drop_modality ----------------
    pseudo = os.path.join(tree["root"], "pseudo_validation")
    drop_modality.main(
        [f"--input_dir={tree['train']}", f"--output_dir={pseudo}"]
    )
    for case in os.listdir(pseudo):
        files = os.listdir(os.path.join(pseudo, case))
        missing_markers = [f for f in files if f.startswith("missing_")]
        assert len(missing_markers) == 1
        n_mods = sum(1 for f in files for m in MODALITIES if f"-{m}." in f)
        assert n_mods == 3

    # ---------------- sample_auto on the pseudo set ----------------
    # only run for cases whose missing modality is t1c (we trained only t1c)
    auto_cases = [
        c
        for c in os.listdir(pseudo)
        if os.path.exists(os.path.join(pseudo, c, "missing_t1c.txt"))
    ]
    auto_in = os.path.join(tree["root"], "auto_in")
    os.makedirs(auto_in, exist_ok=True)
    for c in auto_cases:
        os.symlink(os.path.join(pseudo, c), os.path.join(auto_in, c))
    auto_out = os.path.join(tree["root"], "auto_out")
    sample_auto.main(
        TINY_FLAGS
        + [
            f"--data_dir={auto_in}",
            f"--checkpoint_dir={tree['ckpt']}",
            f"--output_dir={auto_out}",
        ]
    )
    if auto_cases:
        produced = os.listdir(auto_out)
        assert len(produced) == len(auto_cases)

    # ---------------- complete_dataset ----------------
    completed = os.path.join(tree["root"], "completed")
    complete_dataset.main(
        [
            f"--input_dir={auto_in or pseudo}",
            f"--output_dir={completed}",
            f"--checkpoint_dir={tree['ckpt']}",
        ]
    )
    for c in os.listdir(completed):
        files = os.listdir(os.path.join(completed, c))
        n_mods = sum(1 for f in files for m in MODALITIES if f"-{m}." in f)
        # only completes if the missing modality was t1c (only ckpt we have)
        assert n_mods in (3, 4)

    # ---------------- prepare_nnunet_dataset ----------------
    full_cases = [
        c
        for c in os.listdir(completed)
        if sum(
            1
            for f in os.listdir(os.path.join(completed, c))
            for m in MODALITIES
            if f"-{m}." in f
        )
        == 4
    ]
    nnunet_raw = os.path.join(tree["root"], "nnUNet_raw")
    prepare_nnunet_dataset.main(
        [f"--input_dir={completed}", f"--nnunet_raw={nnunet_raw}"]
    )
    ds_dir = os.path.join(nnunet_raw, "Dataset137_BraTS2023")
    meta = json.load(open(os.path.join(ds_dir, "dataset.json")))
    assert meta["numTraining"] == len(full_cases)
    if full_cases:
        imgs = os.listdir(os.path.join(ds_dir, "imagesTr"))
        assert len(imgs) == 4 * len(full_cases)


def test_label_remap():
    from fast_cwdm_tpu.cli.prepare_nnunet_dataset import remap_labels

    seg = np.array([0, 1, 2, 4])
    np.testing.assert_array_equal(remap_labels(seg), [0, 2, 1, 3])


def test_find_missing_modality(tmp_path):
    from fast_cwdm_tpu.cli.complete_dataset import find_missing_modality

    case = str(tmp_path / "c1")
    _make_case(case, modalities=("t1n", "t2w", "t2f"))
    assert find_missing_modality(case) == "t1c"
    case2 = str(tmp_path / "c2")
    _make_case(case2)
    assert find_missing_modality(case2) is None


def test_drop_modality_matches_reference_stream(tmp_path):
    """The seeded drop assignment must reproduce the reference's stream
    EXACTLY (`drop_modality.py:19-28`): one vectorized randint over ALL
    sorted entries (stray files consume a draw), alphabetical modality
    list — otherwise pseudo-validation task mixes are incomparable."""
    from fast_cwdm_tpu.cli import drop_modality

    src = tmp_path / "val"
    src.mkdir()
    cases = [f"BraTS-GLI-{i:05d}-000" for i in range(6)]
    for c in cases:
        d = src / c
        d.mkdir()
        for m in MODALITIES:
            (d / f"{c}-{m}.nii.gz").write_bytes(b"x")
    # a stray file sorts between cases and must consume one RNG draw,
    # exactly as the reference's os.listdir iteration does
    (src / "BraTS-GLI-00002-000.notes.txt").write_bytes(b"y")
    out = tmp_path / "pseudo"
    drop_modality.main([f"--input_dir={src}", f"--output_dir={out}"])

    entries = sorted(os.listdir(src))
    expected_idx = np.random.RandomState(123456).randint(
        0, 4, size=len(entries)
    )
    ref_order = ("t1c", "t1n", "t2f", "t2w")
    for i, entry in enumerate(entries):
        if not (src / entry).is_dir():
            continue
        marker = [
            f
            for f in os.listdir(out / entry)
            if f.startswith("missing_")
        ]
        assert marker == [f"missing_{ref_order[expected_idx[i]]}.txt"]


def test_chunked_synthesis_matches_monolithic():
    """Very long schedules sample as separately-dispatched chunk scans;
    numerics must equal the single-scan path exactly (same key splitting)."""
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
    from fast_cwdm_tpu.models import UNetModel

    model = UNetModel(
        image_size=8, in_channels=32, model_channels=16, out_channels=8,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, num_groups=8, resblock_updown=True,
        bottleneck_attention=False, resample_2d=False,
    )
    diffusion = GaussianDiffusion.named("linear", 8, "sampled", mode="i2i")
    rng = np.random.default_rng(1)
    batch = {
        m: rng.random((1, 16, 16, 16, 1), np.float32)
        for m in MODALITIES
    }
    cond = common.prepare_condition(batch, "t1c")
    mask = jnp.asarray(batch["t1n"])
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 32)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    # the output conv is zero-init, which would make pred_x0 ≡ 0 and the
    # clamp a no-op — give it weight so clip_denoised actually matters
    params = dict(params)
    params["out_conv"] = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape) * 0.3,
        params["out_conv"],
    )
    key = jax.random.PRNGKey(9)
    mono = common.make_synthesis_fn(
        model, params, diffusion, crop_z=16, chunk=None
    )(cond, mask, key)
    chunked = common.make_synthesis_fn(
        model, params, diffusion, crop_z=16, chunk=3
    )(cond, mask, key)
    np.testing.assert_allclose(chunked, mono, atol=1e-6)
    # DDIM chunks the same way (regression: "ddim is short by
    # construction" once disabled chunking, so a full-length DDIM run
    # executed the monolithic >200-step scan that faults the device)
    mono_d = common.make_synthesis_fn(
        model, params, diffusion, crop_z=16, chunk=None, sampler="ddim"
    )(cond, mask, key)
    chunked_d = common.make_synthesis_fn(
        model, params, diffusion, crop_z=16, chunk=3, sampler="ddim"
    )(cond, mask, key)
    np.testing.assert_allclose(chunked_d, mono_d, atol=1e-6)
    # clip_denoised must actually reach the loops (regression: the CLI
    # flag was parsed but silently ignored) — and stay chunk-consistent
    mono_nc = common.make_synthesis_fn(
        model, params, diffusion, crop_z=16, chunk=None, clip_denoised=False
    )(cond, mask, key)
    chunked_nc = common.make_synthesis_fn(
        model, params, diffusion, crop_z=16, chunk=3, clip_denoised=False
    )(cond, mask, key)
    np.testing.assert_allclose(chunked_nc, mono_nc, atol=1e-6)
    assert np.abs(mono_nc - mono).max() > 1e-6, (
        "clip_denoised=False produced identical output — flag not threaded"
    )


def test_ddim_sampler_selection():
    """--use_ddim routes through ddim_sample_loop (deterministic for
    eta=0), not ancestral DDPM."""
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
    from fast_cwdm_tpu.models import UNetModel

    model = UNetModel(
        image_size=8, in_channels=32, model_channels=16, out_channels=8,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, num_groups=8, resblock_updown=True,
        bottleneck_attention=False, resample_2d=False,
    )
    diffusion = GaussianDiffusion.named("linear", 4, "sampled", mode="i2i")
    rng = np.random.default_rng(4)
    batch = {m: rng.random((1, 16, 16, 16, 1), np.float32) for m in MODALITIES}
    cond = common.prepare_condition(batch, "t1c")
    mask = jnp.asarray(batch["t1n"])
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 32)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    key = jax.random.PRNGKey(11)
    calls = []
    orig = GaussianDiffusion.ddim_sample_loop

    def spy(self, *a, **k):
        calls.append("ddim")
        return orig(self, *a, **k)

    GaussianDiffusion.ddim_sample_loop = spy
    try:
        ddim = common.make_synthesis_fn(
            model, params, diffusion, crop_z=16, sampler="ddim"
        )(cond, mask, key)
        ddpm = common.make_synthesis_fn(model, params, diffusion, crop_z=16)(
            cond, mask, key
        )
    finally:
        GaussianDiffusion.ddim_sample_loop = orig
    assert calls == ["ddim"]  # ddim path used once, ddpm path not routed
    assert ddim.shape == ddpm.shape
    assert np.isfinite(ddim).all() and np.isfinite(ddpm).all()


def test_load_best_synthesis_ddim_respacing(tmp_path, monkeypatch):
    """--sampler ddim --sampling_steps N on the auto CLIs applies ddimN
    respacing, matching sample.py's contract (previously they silently
    ignored the flag for ddim, so identical flags respaced the chain in
    one CLI and walked the full chain in another)."""
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.cli import common
    from fast_cwdm_tpu.models import model_and_diffusion_defaults
    from fast_cwdm_tpu.training import checkpoints as ckpt

    cfg = model_and_diffusion_defaults()
    cfg.update(
        image_size=8, num_channels=16, num_res_blocks=1, channel_mult="1,2",
        attention_resolutions="", num_groups=8, bottleneck_attention=False,
        in_channels=32, out_channels=8, dims=3, resample_2d=False,
        diffusion_steps=4, sample_schedule="sampled",
    )
    model, _ = common.build_model_and_diffusion(dict(cfg, mode="i2i"))
    params = common.init_params(model)
    name = ckpt.best_checkpoint_name("t1c", "sampled", 4)
    ckpt.save_checkpoint(
        str(tmp_path / name),
        {"params": params, "ema_params": (), "step": 0},
        config=dict(cfg, sample_schedule="sampled", diffusion_steps=4),
    )

    seen = {}
    orig = common.build_model_and_diffusion

    def spy(c):
        seen.update(c)
        return orig(c)

    monkeypatch.setattr(common, "build_model_and_diffusion", spy)
    fn = common.load_best_synthesis(
        str(tmp_path), "t1c", base_cfg=dict(cfg),
        sampler="ddim", sampler_steps=2, use_ema=False,
    )
    assert seen["timestep_respacing"] == "ddim2"

    rng = np.random.default_rng(7)
    batch = {m: rng.random((1, 16, 16, 16, 1), np.float32) for m in MODALITIES}
    cond = common.prepare_condition(batch, "t1c")
    out = fn(cond, jnp.asarray(batch["t1n"]), jax.random.PRNGKey(3))
    assert np.isfinite(out).all()

    # ddpm ignores sampling_steps: no respacing applied
    seen.clear()
    common.load_best_synthesis(
        str(tmp_path), "t1c", base_cfg=dict(cfg),
        sampler="ddpm", sampler_steps=2, use_ema=False,
    )
    assert seen.get("timestep_respacing", "") in ("", "4")


def test_enable_compile_cache(tmp_path, monkeypatch):
    """Every compute CLI turns on XLA's persistent compilation cache
    (the TPU-native answer to torch-eager's zero warm-up: production
    scan compiles are ~10-15 min through the remote compiler, PERF.md).
    Env var overrides the location; "off" disables."""
    import jax

    from fast_cwdm_tpu.cli import common

    loc = tmp_path / "xla_cache"
    monkeypatch.setenv("FAST_CWDM_COMPILE_CACHE", str(loc))
    prev = jax.config.jax_compilation_cache_dir
    try:
        common.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(loc)
        assert loc.is_dir()
        # disabled: config untouched
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("FAST_CWDM_COMPILE_CACHE", "off")
        common.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_complete_dataset_shard_selection(tmp_path):
    """--shard i/N processes the strided case subset; shards are disjoint
    and cover the input (fleet operation: one invocation per host)."""
    from fast_cwdm_tpu.cli import complete_dataset as cd

    root = tmp_path / "val"
    for i in range(5):
        _make_case(str(root / f"{i:05d}"), modalities=("t1n", "t2w", "t2f"))

    # the strided selection main() applies: disjoint shards covering all
    case_dirs = sorted(str(p) for p in root.iterdir() if p.is_dir())
    shards = [case_dirs[k::2] for k in range(2)]
    assert sorted(shards[0] + shards[1]) == case_dirs
    assert not set(shards[0]) & set(shards[1])
    # flag surface: parser accepts it and rejects malformed values
    p = cd.create_argparser()
    assert p.parse_args(["--input_dir", "x", "--output_dir", "y",
                         "--checkpoint_dir", "z", "--shard", "1/2"]).shard == "1/2"
    for bad in ("2/2", "3/2", "-1/2", "ab/2", "1"):
        with pytest.raises(SystemExit):
            cd.main(["--input_dir", str(root),
                     "--output_dir", str(tmp_path / "o"),
                     "--checkpoint_dir", str(tmp_path), "--shard", bad])
