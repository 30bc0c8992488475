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


def test_wandb_sink_scalars_and_images(tmp_path, monkeypatch):
    """Wandb sink parity (`train_util.py:226-284`): scalars via wandb.log,
    image panels via wandb.Image — exercised against a stub module (wandb
    is not installed in this image)."""
    import sys
    import types

    import numpy as np

    calls = []

    stub = types.ModuleType("wandb")
    stub.run = object()  # pretend already initialized

    def _log(payload, step=None):
        calls.append((payload, step))

    class _Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    stub.log = _log
    stub.Image = _Image
    monkeypatch.setitem(sys.modules, "wandb", stub)

    out = L.make_output("wandb", str(tmp_path))
    out.writekvs({"loss": 0.5, "step": 3, "name": "x"})
    assert calls[-1][0] == {"loss": 0.5, "step": 3.0}

    lg = L.Logger(str(tmp_path), [out])
    monkeypatch.setattr(L.Logger, "CURRENT", lg)
    img = np.random.default_rng(0).random((8, 8)).astype(np.float32)
    L.log_images({"sample/x_0": img}, step=7)
    payload, step = calls[-1]
    assert step == 7
    assert isinstance(payload["sample/x_0"], _Image)
    np.testing.assert_array_equal(payload["sample/x_0"].arr, img)
