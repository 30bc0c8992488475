"""Quality-benchmark harness tests: the resumable train stage must survive
a mid-run kill (tunnel outage / outer timeout SIGTERM) — resuming from the
newest restartable checkpoint instead of restarting 5000 production steps,
and never mistaking a mid-run BEST save for a finished run."""

import importlib.util
import os

import pytest

_QB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "quality_bench.py",
)
_spec = importlib.util.spec_from_file_location("quality_bench", _QB_PATH)
qb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(qb)


def _args(tmp_path, **over):
    argv = [f"--workdir={tmp_path}"]
    argv += [f"--{k}={v}" for k, v in over.items()]
    return qb.parse_args(argv)


def test_resume_candidate_empty(tmp_path):
    a = _args(tmp_path)
    assert qb._resume_candidate(a, str(tmp_path), "direct", 1000) == ""


def test_resume_candidate_prefers_step_stamped(tmp_path):
    a = _args(tmp_path)
    cdir = str(tmp_path)
    best = os.path.join(cdir, "brats_t1c_BEST_direct_1000.ckpt")
    stamped = os.path.join(cdir, "brats_t1c_002500_direct_1000.ckpt")
    open(best, "w").close()
    # BEST alone → BEST (params-only resume beats a restart)
    assert qb._resume_candidate(a, cdir, "direct", 1000) == best
    open(stamped, "w").close()
    # a step-stamped preemption save (paired opt blob) beats BEST
    assert qb._resume_candidate(a, cdir, "direct", 1000) == stamped
    # the stamped glob is schedule-qualified (the BEST fallback is not —
    # harmless, since ckpt_dir_for gives every schedule its own dir)
    assert (
        qb._resume_candidate(a, cdir, "sampled", 10) != stamped
    )


def test_stage_train_skips_on_done_marker(tmp_path, monkeypatch):
    a = _args(tmp_path, schedules="direct:1000")
    cdir = qb.ckpt_dir_for(a, "direct", 1000)
    os.makedirs(cdir)
    open(os.path.join(cdir, ".done"), "w").close()
    # BEST existence alone must NOT skip — only the marker does
    import fast_cwdm_tpu.cli.train as train_cli

    def boom(argv):
        raise AssertionError("train must not run when .done exists")

    monkeypatch.setattr(train_cli, "main", boom)
    qb.stage_train(a, str(tmp_path / "train"))


def test_stage_train_passes_resume_flag(tmp_path, monkeypatch):
    a = _args(tmp_path, schedules="direct:1000")
    cdir = qb.ckpt_dir_for(a, "direct", 1000)
    os.makedirs(cdir)
    stamped = os.path.join(cdir, "brats_t1c_002500_direct_1000.ckpt")
    open(stamped, "w").close()
    seen = {}

    def fake_leg(a_, argv):
        seen.setdefault("argv", argv)
        return "completed"

    monkeypatch.setattr(qb, "_run_train_leg", fake_leg)
    qb.stage_train(a, str(tmp_path / "train"))
    assert f"--resume_checkpoint={stamped}" in seen["argv"]
    # a completed return writes the completion marker
    assert os.path.exists(os.path.join(cdir, ".done"))


def test_stage_train_preemption_is_not_completion(tmp_path, monkeypatch):
    """A SIGTERM'd training run returns "preempted" after writing its
    checkpoint; stage_train must NOT write .done (which would make the
    next invocation skip a half-trained model) and must stop the harness
    so the outer retry resumes it."""
    a = _args(tmp_path, schedules="direct:1000")
    cdir = qb.ckpt_dir_for(a, "direct", 1000)
    os.makedirs(cdir)
    monkeypatch.setattr(qb, "_run_train_leg", lambda a_, argv: "preempted")
    with pytest.raises(SystemExit) as ei:
        qb.stage_train(a, str(tmp_path / "train"))
    assert ei.value.code == 143
    assert not os.path.exists(os.path.join(cdir, ".done"))


def test_quick_mode_trains_in_process(tmp_path, monkeypatch):
    """--quick must NOT spawn a subprocess: the in-process jax platform
    pin is the only reliable way to keep the smoke off the real chip."""
    a = _args(tmp_path, schedules="direct:100")
    a.quick = True
    import fast_cwdm_tpu.cli.train as train_cli

    monkeypatch.setattr(train_cli, "main", lambda argv: "completed")
    monkeypatch.setattr(
        qb.subprocess, "Popen",
        lambda *a_, **k: pytest.fail("quick mode must stay in-process"),
    )
    assert qb._run_train_leg(a, ["--x"]) == "completed"


class _FakeProc:
    """Stands in for subprocess.Popen in _run_train_leg tests."""

    def __init__(self, rc, hang_first=False):
        self.rc, self.hang_first = rc, hang_first
        self.signals, self.killed = [], False

    def wait(self, timeout=None):
        if self.hang_first and not self.signals:
            raise qb.subprocess.TimeoutExpired("train", timeout)
        return self.rc

    def send_signal(self, sig):
        self.signals.append(sig)

    def kill(self):
        self.killed = True


@pytest.mark.parametrize(
    "rc,status", [(0, "completed"), (143, "preempted"), (1, "failed(rc=1)")]
)
def test_run_train_leg_exit_code_mapping(tmp_path, monkeypatch, rc, status):
    """Each training leg runs in its own subprocess (HBM isolation: the
    round-3 run OOM'd when model 2 started in model 1's process) with the
    cli/train.py exit-code contract: 0=completed, 143=preempted."""
    a = _args(tmp_path)
    monkeypatch.setattr(
        qb.subprocess, "Popen", lambda *a_, **k: _FakeProc(rc)
    )
    assert qb._run_train_leg(a, ["--x"]) == status


def test_run_train_leg_wall_budget_sigterm(tmp_path, monkeypatch):
    """--max_wall_hours: a leg that outlives the budget is SIGTERM'd
    (checkpoint-and-exit in the child) and reported as preempted, so the
    harness exits 143 for an operator resume (docs/RUNBOOK.md)."""
    a = _args(tmp_path, max_wall_hours="0.001")
    proc = _FakeProc(143, hang_first=True)
    monkeypatch.setattr(qb.subprocess, "Popen", lambda *a_, **k: proc)
    assert qb._run_train_leg(a, ["--x"]) == "preempted"
    import signal as _signal

    assert proc.signals == [_signal.SIGTERM]


def test_eval_rows_roundtrip_and_resume(tmp_path):
    """quality.json is written after every row (atomic) and reloaded on
    resume, so a mid-eval kill loses at most one sampler leg."""
    a = _args(tmp_path)
    assert qb.load_rows(a) == []
    rows = [
        {"model": "-", "leg": "copy-t1n", "evals": 0, "ssim_mean": 0.5,
         "ssim_min": 0.4, "psnr_mean": 20.0, "s_per_volume": None},
        {"model": "direct-1000", "leg": "ddpm-100", "evals": 100,
         "ssim_mean": 0.9, "ssim_min": 0.8, "psnr_mean": 30.0,
         "s_per_volume": 12.9},
    ]
    qb.dump_rows(a, rows)
    assert qb.load_rows(a) == rows
    assert not os.path.exists(qb.quality_json_path(a) + ".tmp")
    # the resume key set matches what stage_eval skips on
    done = {(r["model"], r["leg"]) for r in qb.load_rows(a)}
    assert ("direct-1000", "ddpm-100") in done


def test_quick_mode_never_weakens_to_invalid_schedule():
    # the linear beta schedule needs T >= ~50 when scaled (betas <= 1);
    # --quick rewrites the default schedules accordingly
    a = qb.parse_args(["--workdir=/tmp/x", "--quick"])
    with pytest.raises(SystemExit):
        qb.parse_args(["--nonsense"])
    qb.apply_quick(a)
    assert a.schedules == "direct:100,sampled:4"
    assert a.train_steps == 60
    # explicit schedule choices are respected, only shrunk defaults rewrite
    b = qb.parse_args(["--workdir=/tmp/x", "--quick", "--schedules=direct:80"])
    qb.apply_quick(b)
    assert b.schedules == "direct:80"


def test_render_md_texture_column():
    """The texture column appears only when a row carries texture_ratio
    (rim-textured datasets); legacy rows render the original 7-col table."""
    a = _args(["--workdir", "w"])
    legacy = [{
        "model": "m", "leg": "l", "evals": 5, "ssim_mean": 0.9,
        "ssim_min": 0.8, "psnr_mean": 30.0, "s_per_volume": 1.5,
    }]
    out = qb.render_md(a, legacy)
    assert "texture" not in out
    rows = legacy + [{
        "model": "m", "leg": "t", "evals": 5, "ssim_mean": 0.9,
        "ssim_min": 0.8, "psnr_mean": 30.0, "texture_ratio": 0.87,
        "s_per_volume": 1.5,
    }]
    out = qb.render_md(a, rows)
    assert "texture" in out
    assert "| 0.870 |" in out
    # the legacy row renders an em-dash in the texture column
    assert "| 30.00 | — | 1.5 |" in out.splitlines()[2]
