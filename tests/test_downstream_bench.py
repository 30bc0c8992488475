"""Downstream-benchmark harness tests (`scripts/downstream_bench.py`):
the resumable stage protocol and the report/markdown contract of the
reference's BraSyn eval tail (`prepare_nnunet_dataset.py:36-122`,
`evaluate_synthesis.py:121-225`) run on phantom completions.

The heavy legs (model completion, segmentation) are exercised end-to-end
by the chip run recorded in QUALITY.md; here they are stubbed so the
harness logic — stage skipping, incomplete-tree construction, agreement
Dice, report shape — is pinned cheaply on CPU.
"""

import importlib.util
import json
import os

import numpy as np

_DB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "downstream_bench.py",
)
_spec = importlib.util.spec_from_file_location("downstream_bench", _DB_PATH)
db = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(db)


def _args(tmp_path, **over):
    base = {
        "workdir": str(tmp_path / "wd"),
        "val_dir": str(tmp_path / "val"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
    }
    base.update(over)
    argv = [f"--{k}={v}" for k, v in base.items()]
    return db.parse_args(argv)


def _fake_val(tmp_path, cases=("00000", "00001")):
    """A val tree with 4 modalities + seg per case (tiny placeholder
    files — stage_incomplete only copies, never parses)."""
    val = tmp_path / "val"
    for c in cases:
        d = val / c
        d.mkdir(parents=True)
        for m in ("t1n", "t1c", "t2w", "t2f", "seg"):
            (d / f"BraTS-GLI-{c}-000-{m}.nii.gz").write_bytes(b"x")
    return str(val)


def test_stage_incomplete_drops_only_target_modality(tmp_path):
    a = _args(tmp_path)
    _fake_val(tmp_path)
    os.makedirs(a.workdir, exist_ok=True)
    out = db.stage_incomplete(a)
    for c in ("00000", "00001"):
        files = sorted(os.listdir(os.path.join(out, c)))
        assert not any("-t1c." in f for f in files), files
        # the other three modalities AND the seg label survive
        assert len([f for f in files if f.endswith(".nii.gz")]) == 4


def test_stage_incomplete_resumes_on_marker(tmp_path):
    a = _args(tmp_path)
    _fake_val(tmp_path)
    os.makedirs(a.workdir, exist_ok=True)
    out = db.stage_incomplete(a)
    # drop a file behind the marker's back: the stage must NOT redo work
    victim = os.path.join(out, "00000")
    for f in os.listdir(victim):
        os.remove(os.path.join(victim, f))
    assert db.stage_incomplete(a) == out
    assert os.listdir(victim) == []


def test_agreement_skips_missing_and_all_empty_pairs(tmp_path):
    from fast_cwdm_tpu.data import Nifti1Image, save

    a = _args(tmp_path)
    pa, pb = tmp_path / "pa", tmp_path / "pb"
    pa.mkdir(), pb.mkdir()

    def put(d, name, arr):
        save(Nifti1Image(arr.astype(np.int16), np.eye(4)), str(d / name))

    lesion = np.zeros((8, 8, 8), np.int16)
    lesion[2:5, 2:5, 2:5] = 3
    put(pa, "c1.nii.gz", lesion)
    put(pb, "c1.nii.gz", lesion)          # perfect agreement
    put(pa, "c2.nii.gz", np.zeros((8, 8, 8)))
    put(pb, "c2.nii.gz", np.zeros((8, 8, 8)))  # nan → uninformative, dropped
    put(pa, "only_a.nii.gz", lesion)      # no counterpart → skipped
    val = db.agreement(a, str(pa), str(pb))
    assert val == 1.0


def test_main_report_and_md_row(tmp_path, monkeypatch):
    """Full main() with the heavy stages stubbed: report JSON written,
    legs keyed real/synth_{label}, md row appended to --write_md."""
    md = tmp_path / "OUT.md"
    a_argv = {
        "sampler": "dpm++",
        "sampling_steps": 25,
        "write_md": str(md),
        "quick": "",
    }
    _fake_val(tmp_path)

    monkeypatch.setattr(db, "stage_complete", lambda a, inc: a.val_dir)
    monkeypatch.setattr(
        db, "stage_nnunet", lambda a, tree, tag: (tree, tree)
    )
    preds = {}

    def fake_segment(a, images, tag):
        d = os.path.join(a.workdir, f"preds_{tag}")
        os.makedirs(d, exist_ok=True)
        preds[tag] = d
        return d

    monkeypatch.setattr(db, "stage_segment", fake_segment)
    monkeypatch.setattr(
        db, "agreement", lambda a, x, y: 0.875
    )
    monkeypatch.setattr(
        db, "region_means",
        lambda a, tree: {"mean": {"et": 0.9}, "cases": {}},
    )
    fake_scores = {
        "dice_mean": 0.9, "n": 2, "per_case": {},
        "dice_per_label_mean": {"edema": 0.9, "ncr": 0.9, "et": 0.9},
    }
    import fast_cwdm_tpu.cli.evaluate_synthesis as ev

    monkeypatch.setattr(
        ev, "calculate_dice_scores", lambda p, l: dict(fake_scores)
    )
    argv = [
        f"--workdir={tmp_path / 'wd'}",
        f"--val_dir={tmp_path / 'val'}",
        f"--checkpoint_dir={tmp_path / 'ckpt'}",
        "--quick",
    ] + [f"--{k}={v}" for k, v in a_argv.items() if k != "quick"]
    db.main(argv)

    report_path = os.path.join(str(tmp_path / "wd"), "downstream_dpm++-25.json")
    with open(report_path) as f:
        report = json.load(f)
    assert set(report["legs"]) == {"real", "synth_dpm++-25"}
    assert report["agreement"] == 0.875
    # round-5 evidence fields ride in the report
    assert report["legs"]["synth_dpm++-25"]["region_means"]["mean"]["et"] == 0.9
    assert report["gt_region_means"] == {"et": 0.9}
    line = md.read_text().strip()
    assert line.startswith("| downstream Dice (dpm++-25) |")
    assert "prediction agreement 0.8750" in line
