"""kv-logger tests (parity surface for the vendored OpenAI-baselines
logger, `/root/reference/guided_diffusion/logger.py`)."""

import json
import os

from fast_cwdm_tpu.utils import logger as L


def test_logkv_mean_and_dump(tmp_path):
    lg = L.configure(str(tmp_path), format_strs=["csv", "json"])
    L.logkv("step", 1)
    L.logkv_mean("loss", 1.0)
    L.logkv_mean("loss", 3.0)
    out = L.dumpkvs()
    assert out["loss"] == 2.0  # running mean (`logger.py:221-233`)
    assert out["step"] == 1
    # second window starts clean
    L.logkv("step", 2)
    out2 = L.dumpkvs()
    assert "loss" not in out2

    csv_path = os.path.join(str(tmp_path), "progress.csv")
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 3  # header + 2 rows

    with open(os.path.join(str(tmp_path), "progress.json")) as f:
        rows = [json.loads(l) for l in f]
    assert rows[0]["loss"] == 2.0
    lg.close()


def test_csv_backfills_new_keys(tmp_path):
    L.configure(str(tmp_path), format_strs=["csv"])
    L.logkv("a", 1)
    L.dumpkvs()
    L.logkv("a", 2)
    L.logkv("b", 3)
    L.dumpkvs()
    with open(os.path.join(str(tmp_path), "progress.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "a,b"
    assert lines[1].startswith("1")


def test_profile_kv(tmp_path):
    L.configure(str(tmp_path), format_strs=[])
    with L.profile_kv("io"):
        pass
    out = L.dumpkvs()
    assert "wait_io" in out


def test_env_configure(tmp_path, monkeypatch):
    monkeypatch.setenv("OPENAI_LOGDIR", str(tmp_path / "envdir"))
    monkeypatch.setenv("OPENAI_LOG_FORMAT", "csv")
    lg = L.configure()
    assert lg.logdir.endswith("envdir")
    L.log("hello", "world")  # no stdout sink — must not raise
    lg.close()
