"""Harness tests for `scripts/probe_regression.py` (the objective-vs-
architecture probe, QUALITY.md round-5 "binding constraint" follow-up).

The heavy legs (training, completion, segmentation) are exercised by the
`--quick` CPU smoke and the chip run recorded in QUALITY.md; here the
harness logic — stage skipping, config discipline, CLI contract — is
pinned cheaply, mirroring `tests/test_downstream_bench.py`.
"""

import importlib.util
import os

import pytest

_PR_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "probe_regression.py",
)
_spec = importlib.util.spec_from_file_location("probe_regression", _PR_PATH)
pr = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pr)


def test_find_matches_modality_tag(tmp_path):
    d = tmp_path / "case"
    d.mkdir()
    (d / "BraTS-GLI-00000-000-t1c.nii.gz").write_bytes(b"x")
    (d / "BraTS-GLI-00000-000-t1n.nii.gz").write_bytes(b"x")
    (d / ".hidden-t1c.nii.gz").write_bytes(b"x")
    found = pr._find(str(d), "t1c")
    assert found is not None and found.endswith("-t1c.nii.gz")
    assert not os.path.basename(found).startswith(".")
    assert pr._find(str(d), "t2w") is None


def test_production_config_keeps_memory_discipline():
    """The probe trains the PRODUCTION model with a device-pinned dataset,
    so it must carry the same remat discipline as cli/train
    --remat_max_ds=0 (PERF.md round 3: selective remat + pinned dataset
    OOMs the chip)."""
    a = pr.parse_args(["--workdir", "/tmp/x"])
    cfg = pr.model_config(a)
    assert cfg["remat_max_ds"] == 0
    assert cfg["use_checkpoint"] is True
    # identical architecture to every diffusion run it is compared to
    assert cfg["in_channels"] == 32 and cfg["out_channels"] == 8
    assert cfg["num_channels"] == 64


def test_quick_config_is_tiny():
    a = pr.parse_args(["--workdir", "/tmp/x", "--quick"])
    cfg = pr.model_config(a)
    assert cfg["num_channels"] == 16 and cfg["image_size"] == 8


def test_stage_train_skips_on_done_marker(tmp_path):
    """With the .train_done marker present the stage returns the checkpoint
    path without touching data or device (resumable-stage contract)."""
    a = pr.parse_args(
        ["--workdir", str(tmp_path), "--data_dir", "/nonexistent",
         "--val_dir", "/nonexistent"]
    )
    open(os.path.join(str(tmp_path), ".train_done"), "w").close()
    path = pr.stage_train(a, {}, model=None)  # model unused when skipped
    assert path.endswith("regression.ckpt")


def test_main_requires_dirs_outside_quick():
    with pytest.raises(SystemExit):
        pr.main(["--workdir", "/tmp/x"])


def test_defaults_match_documented_probe_protocol():
    a = pr.parse_args(["--workdir", "/tmp/x"])
    # production budget, favorable-optimizer default (docstring contract)
    assert a.train_steps == 5000
    assert a.lr == pytest.approx(1e-4)
    assert a.lesion_weight == 0.0 and a.lesion_core_weight == 0.0
    assert a.stages == "train,eval"
