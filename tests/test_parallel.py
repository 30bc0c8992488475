"""Parallel-layer tests on the 8-virtual-device CPU mesh (conftest forces
``--xla_force_host_platform_device_count=8``).

Validates what the reference could not (world_size hard-coded to 1,
`dist_util.py:44`): data-parallel gradient averaging and spatially-sharded
training steps produce the same numerics as a single device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
from fast_cwdm_tpu.models import UNetModel
from fast_cwdm_tpu.parallel import (
    batch_spec,
    make_mesh,
    replicated,
    shard_batch,
)
from fast_cwdm_tpu.parallel.mesh import local_batch_size
from fast_cwdm_tpu.training import TrainState, make_optimizer, make_train_step

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


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    diffusion = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")
    rng = np.random.default_rng(0)
    batch = {
        m: rng.random((8, 8, 8, 8, 1), dtype=np.float32) for m in MODALITIES
    }
    from fast_cwdm_tpu.ops import wavelet as wv

    x = jnp.concatenate(
        [wv.dwt_normalized(jnp.asarray(batch[m])) for m in MODALITIES],
        axis=-1,
    )
    params = model.init(
        jax.random.PRNGKey(1), x, jnp.zeros((8,), jnp.int32)
    )["params"]
    return model, diffusion, batch, params


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    mesh = make_mesh()
    assert dict(mesh.shape) == {"data": 8, "sp": 1}
    mesh = make_mesh(data=4, sp=2)
    assert dict(mesh.shape) == {"data": 4, "sp": 2}
    assert local_batch_size(8, mesh) == 2
    with pytest.raises(ValueError):
        local_batch_size(6, make_mesh())
    # over-subscription fails HERE with the real cause, not inside
    # create_device_mesh's opaque shape assertion
    with pytest.raises(ValueError, match="exceeds"):
        make_mesh(data=16)
    # an explicit sub-mesh is allowed (pin a job to part of the machine)
    sub = make_mesh(data=2, sp=1)
    assert dict(sub.shape) == {"data": 2, "sp": 1}
    assert sub.devices.size == 2


def test_batch_spec():
    mesh = make_mesh(data=4, sp=2)
    assert batch_spec(mesh, 5) == P("data", None, "sp", None, None)
    mesh1 = make_mesh(data=8, sp=1)
    assert batch_spec(mesh1, 5) == P("data", None, None, None, None)


@pytest.mark.parametrize("data,sp", [(8, 1), (4, 2)])
def test_sharded_step_matches_single_device(setup, data, sp):
    """DP gradient psum + SP halo exchange must not change the numerics."""
    model, diffusion, batch, params = setup
    tx = make_optimizer(1e-3)
    step = make_train_step(model, diffusion, tx, contr="t1n", mode="i2i")
    key = jax.random.PRNGKey(7)

    # single device
    state0 = TrainState.create(params, tx)
    _, m_single = step(state0, jax.tree.map(jnp.asarray, batch), key)

    # sharded
    mesh = make_mesh(data=data, sp=sp)
    sharded_batch = shard_batch(mesh, batch)
    state_sh = jax.device_put(
        TrainState.create(params, tx), replicated(mesh)
    )
    _, m_sharded = step(state_sh, sharded_batch, key)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_single["mse_wav"]),
        np.asarray(m_sharded["mse_wav"]),
        rtol=2e-4, atol=1e-6,
    )


def test_sharded_step_with_grad_accum(setup):
    """Gradient accumulation composes with data sharding: the scanned
    microbatch reshape resharding (GSPMD-inserted) keeps the numerics of
    the unsharded unaccumulated step."""
    model, diffusion, batch, params = setup
    tx = make_optimizer(1e-3)
    key = jax.random.PRNGKey(7)
    step1 = make_train_step(model, diffusion, tx, contr="t1n", mode="i2i")
    state0 = TrainState.create(params, tx)
    _, m_ref = step1(state0, jax.tree.map(jnp.asarray, batch), key)

    step_acc = make_train_step(
        model, diffusion, tx, contr="t1n", mode="i2i", accum_steps=2
    )
    mesh = make_mesh(data=4, sp=2)
    sharded_batch = shard_batch(mesh, batch)
    state_sh = jax.device_put(TrainState.create(params, tx), replicated(mesh))
    _, m_acc = step_acc(state_sh, sharded_batch, key)

    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_acc["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_ref["mse_wav"]), np.asarray(m_acc["mse_wav"]),
        rtol=2e-4, atol=1e-6,
    )


class TestSetupDistributedEnvRouting:
    """Env-var routing of `setup_distributed` (no real cluster needed —
    `jax.distributed.initialize` is stubbed)."""

    ENV = (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
        "SLURM_NTASKS", "OMPI_MCA_orte_hnp_uri",
        "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
        "FAST_CWDM_ALLOW_SINGLE_PROCESS",
    )

    @pytest.fixture()
    def clean(self, monkeypatch):
        from fast_cwdm_tpu.parallel.mesh import setup_distributed

        for k in self.ENV:
            monkeypatch.delenv(k, raising=False)
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda *a, **kw: calls.append(kw),
        )
        return setup_distributed, calls, monkeypatch

    def test_full_manual_launch(self, clean):
        setup, calls, mp = clean
        mp.setenv("JAX_COORDINATOR_ADDRESS", "h:1234")
        mp.setenv("JAX_NUM_PROCESSES", "2")
        mp.setenv("JAX_PROCESS_ID", "1")
        setup()
        assert calls == [dict(
            coordinator_address="h:1234", num_processes=2, process_id=1
        )]

    def test_generic_coord_with_full_contract(self, clean):
        # COORDINATOR_ADDRESS (un-namespaced) + both JAX_* vars is a valid
        # manual launch — the coordinator may come from either env name
        setup, calls, mp = clean
        mp.setenv("COORDINATOR_ADDRESS", "h:1234")
        mp.setenv("JAX_NUM_PROCESSES", "2")
        mp.setenv("JAX_PROCESS_ID", "0")
        setup()
        assert calls and calls[0]["coordinator_address"] == "h:1234"

    def test_partial_manual_config_is_fatal(self, clean):
        setup, calls, mp = clean
        mp.setenv("JAX_NUM_PROCESSES", "2")
        with pytest.raises(RuntimeError, match="needs ALL"):
            setup()
        mp.setenv("JAX_COORDINATOR_ADDRESS", "h:1234")
        with pytest.raises(RuntimeError, match="needs ALL"):
            setup()
        assert not calls

    def test_stray_generic_coordinator_is_ignored(self, clean):
        # an outer launcher exporting COORDINATOR_ADDRESS for its own
        # rendezvous must not abort (or misconfigure) our startup
        setup, calls, mp = clean
        mp.setenv("COORDINATOR_ADDRESS", "h:9999")
        setup()  # no managed markers either → single-process no-op
        assert not calls

    def test_unset_is_single_process_noop(self, clean):
        setup, calls, _ = clean
        setup()
        assert not calls

    def test_failed_autodetect_under_managed_markers_is_fatal(self, clean):
        # SLURM markers present but JAX's cluster detection can't resolve
        # a coordinator: degrading would make EVERY rank believe it is
        # rank 0 of 1 (N unsynced replicas racing on shared checkpoint
        # files) — must hard-fail unless explicitly allowed
        setup, calls, mp = clean
        mp.setenv("SLURM_NTASKS", "4")
        mp.setattr(
            jax.distributed, "initialize",
            lambda *a, **kw: (_ for _ in ()).throw(
                ValueError("could not detect cluster")
            ),
        )
        with pytest.raises(RuntimeError, match="Refusing to degrade"):
            setup()
        mp.setenv("FAST_CWDM_ALLOW_SINGLE_PROCESS", "1")
        setup()  # explicit opt-out continues single-process


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


class TestTensorParallel:
    def test_tp_mesh_and_param_sharding(self):
        import jax
        import jax.numpy as jnp

        from fast_cwdm_tpu.parallel import (
            TENSOR_AXIS, make_mesh, param_spec, shard_params,
        )

        mesh = make_mesh(data=2, sp=2, tp=2)
        assert dict(mesh.shape) == {"data": 2, "sp": 2, "tp": 2}
        params = {
            "conv": {"kernel": jnp.zeros((3, 3, 3, 8, 16)),
                     "bias": jnp.zeros((16,))},
            "dense": {"kernel": jnp.zeros((8, 32))},
        }
        sharded = shard_params(mesh, params)
        k = sharded["conv"]["kernel"]
        spec = k.sharding.spec
        assert spec[-1] == TENSOR_AXIS
        assert sharded["conv"]["bias"].sharding.spec == ()
        # odd channel width stays replicated
        odd = shard_params(mesh, {"w": jnp.zeros((4, 7))})
        assert odd["w"].sharding.spec == ()

    def test_two_axis_mesh_unchanged(self):
        from fast_cwdm_tpu.parallel import make_mesh

        mesh = make_mesh(data=4, sp=2)
        assert dict(mesh.shape) == {"data": 4, "sp": 2}



class TestShardedSampling:
    def test_mesh_sampling_matches_single_device(self):
        """Batched multi-chip synthesis (batch sharded over the data axis)
        produces the same volumes as the unsharded path."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fast_cwdm_tpu.cli import common
        from fast_cwdm_tpu.diffusion.gaussian import GaussianDiffusion
        from fast_cwdm_tpu.models import UNetModel
        from fast_cwdm_tpu.parallel import make_mesh

        model = UNetModel(
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
        diffusion = GaussianDiffusion.named("linear", 4, "sampled", mode="i2i")
        rng = np.random.default_rng(3)
        batch = {
            m: rng.random((4, 16, 16, 16, 1), np.float32)
            for m in ("t1n", "t1c", "t2w", "t2f")
        }
        cond = common.prepare_condition(batch, "t1c")
        mask = jnp.asarray(batch["t1n"])
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 32)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        key = jax.random.PRNGKey(5)

        single = common.make_synthesis_fn(
            model, params, diffusion, crop_z=16
        )(cond, mask, key)
        mesh = make_mesh(data=4, sp=1)
        sharded = common.make_synthesis_fn(
            model, params, diffusion, crop_z=16, mesh=mesh
        )(cond, mask, key)
        np.testing.assert_allclose(sharded, single, atol=1e-5)
        # dp x sp: volumes split over data AND spatially over sp (GSPMD
        # inserts the conv/DWT halo exchanges) — same numerics
        mesh2 = make_mesh(data=2, sp=2)
        sharded2 = common.make_synthesis_fn(
            model, params, diffusion, crop_z=16, mesh=mesh2
        )(cond, mask, key)
        np.testing.assert_allclose(sharded2, single, atol=1e-5)
        # DPM-Solver++ rides the same synth/mesh plumbing: sharded ==
        # unsharded for the solver too
        dpm_single = common.make_synthesis_fn(
            model, params, diffusion, crop_z=16,
            sampler="dpm++", sampler_steps=3,
        )(cond, mask, key)
        dpm_sharded = common.make_synthesis_fn(
            model, params, diffusion, crop_z=16, mesh=mesh2,
            sampler="dpm++", sampler_steps=3,
        )(cond, mask, key)
        np.testing.assert_allclose(dpm_sharded, dpm_single, atol=1e-5)


# ---------------------------------------------------------------------------
# Two-process jax.distributed (the multi-host path the reference faked with
# world_size=1, `dist_util.py:42-44`)
# ---------------------------------------------------------------------------

_DIST_CHILD = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from fast_cwdm_tpu.parallel import make_hybrid_mesh, setup_distributed
setup_distributed()
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()
mesh = make_hybrid_mesh(sp=1)
assert dict(mesh.shape) == {"data": 4, "sp": 1}, dict(mesh.shape)
sharding = NamedSharding(mesh, P("data"))
local = np.arange(jax.local_device_count(), dtype=np.float32) + 10 * rank
arr = jax.make_array_from_process_local_data(
    sharding, local, (jax.device_count(),)
)
# global reduction across both processes: XLA inserts the psum
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
val = float(np.asarray(jax.device_get(total.addressable_shards[0].data)))
print(f"RESULT {rank} {val}", flush=True)

# multi-host input pipeline contract: each process owns a disjoint
# contiguous row block of the global batch, decodes ONLY those rows, and
# shard_batch(global_batch=...) assembles the global array — the summed
# global batch must equal the full-batch sum on both ranks
from fast_cwdm_tpu.parallel.mesh import local_batch_rows, shard_batch
B = 4
lo, hi = local_batch_rows(mesh, B)
assert hi - lo == B // 2, (lo, hi)
print(f"ROWS {rank} {lo} {hi}", flush=True)
global_batch = np.arange(B * 3, dtype=np.float32).reshape(B, 3)
batch = {"x": global_batch[lo:hi]}  # the only rows this rank "decoded"
dev_batch = shard_batch(mesh, batch, global_batch=B)
tot = jax.jit(
    lambda t: jnp.sum(t["x"]), out_shardings=NamedSharding(mesh, P())
)(dev_batch)
tot = float(np.asarray(jax.device_get(tot.addressable_shards[0].data)))
assert tot == float(global_batch.sum()), (tot, global_batch.sum())
print(f"BATCHSUM {rank} {tot}", flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    """Spawn two real processes with a localhost coordinator:
    `setup_distributed` (explicit env launch) → `make_hybrid_mesh(sp=1)`
    (process-granule DCN axis) → one global reduction; both ranks must see
    the same total. Exercises the `process_count() > 1` branches that are
    dead in the in-process tests."""
    import os
    import socket
    import subprocess
    import sys

    script = tmp_path / "dist_child.py"
    script.write_text(_DIST_CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def attempt():
        # bind-then-close port probing is a TOCTOU race; retry on failure
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = []
        for rank in range(2):
            env = dict(os.environ)
            env.update(
                PYTHONPATH=repo,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=2",
                JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(rank),
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(script)],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    text=True,
                )
            )
        results = {}
        rows = {}
        batchsums = {}
        errs = []
        for rank, p in enumerate(procs):
            out, err = p.communicate(timeout=240)
            if p.returncode != 0:
                errs.append(f"rank {rank} rc={p.returncode}:\n{err[-2000:]}")
                continue
            for line in out.splitlines():
                if line.startswith("RESULT"):
                    _, r, v = line.split()
                    results[int(r)] = float(v)
                elif line.startswith("ROWS"):
                    _, r, lo, hi = line.split()
                    rows[int(r)] = (int(lo), int(hi))
                elif line.startswith("BATCHSUM"):
                    _, r, v = line.split()
                    batchsums[int(r)] = float(v)
        return results, rows, batchsums, errs

    results, rows, batchsums, errs = attempt()
    if errs:  # fresh port, one retry
        results, rows, batchsums, errs = attempt()
    assert not errs, errs[0]
    # ranks agree, and the value is the cross-process sum:
    # rank0 contributes [0, 1], rank1 [10, 11] -> 22
    assert results == {0: 22.0, 1: 22.0}
    # per-process data shards: disjoint halves covering the global batch,
    # and the assembled global batch sums identically on both ranks
    assert sorted(rows.values()) == [(0, 2), (2, 4)], rows
    assert batchsums == {0: 66.0, 1: 66.0}, batchsums


_DIST_TRAIN_CHILD = r"""
import os, sys, glob
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.environ["TEST_DIR"])
from fast_cwdm_tpu.parallel import make_hybrid_mesh, setup_distributed
setup_distributed()
rank = jax.process_index()
from test_training import tiny_model, make_batch
from fast_cwdm_tpu.diffusion import GaussianDiffusion
from fast_cwdm_tpu.training import TrainLoop
from fast_cwdm_tpu.parallel.mesh import local_batch_rows

mesh = make_hybrid_mesh(sp=1)
model = tiny_model()
diffusion = GaussianDiffusion.named("linear", 10, "sampled", mode="i2i")
B = 4
rows = local_batch_rows(mesh, B)
print(f"ROWS {rank} {rows[0]} {rows[1]}", flush=True)
gbatch = jax.tree.map(np.asarray, make_batch(jax.random.PRNGKey(0), b=B))

def data():  # each process feeds ONLY its own rows of the global batch
    while True:
        yield {k: v[rows[0]:rows[1]] for k, v in gbatch.items()}

loop = TrainLoop(
    model=model, diffusion=diffusion, data=data, batch_size=B, lr=1e-4,
    log_interval=1, save_interval=2, mode="i2i", contr="t1n",
    sample_schedule="sampled", diffusion_steps=10, lr_anneal_steps=2,
    checkpoint_dir=os.environ["CKPT_DIR"], mesh=mesh, seed=7,
)
state = loop.run_loop()
print(f"DONE {rank} step={int(state.step)}", flush=True)
"""


@pytest.mark.parametrize("backend", ["", "orbax"])
def test_two_process_train_loop(tmp_path, backend):
    """Full multi-host training path, two REAL processes on a shared
    checkpoint dir: hybrid mesh, per-process input rows, global batch
    assembly, collective metric fetch (per-sample metrics span
    non-addressable shards — a plain device_get raises), and
    rank-0-only checkpoint/ledger writes.

    The orbax variant is a deadlock regression test: orbax's default save
    is a collective every process must enter, so a rank-0-only save would
    hang the pod unless orbax_io restricts the barrier set to the calling
    process (orbax_io._checkpointer)."""
    import os
    import socket
    import subprocess
    import sys

    if backend == "orbax":
        from fast_cwdm_tpu.training import orbax_io

        if not orbax_io.available():
            pytest.skip("orbax not installed")

    script = tmp_path / "dist_train_child.py"
    script.write_text(_DIST_TRAIN_CHILD)
    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=repo,
            TEST_DIR=os.path.join(repo, "tests"),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
            CKPT_DIR=str(ckdir),
            FAST_CWDM_CKPT_BACKEND=backend,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    rows = {}
    done = {}
    for rank, p in enumerate(procs):
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"rank {rank}:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("ROWS"):
                _, r, lo, hi = line.split()
                rows[int(r)] = (int(lo), int(hi))
            elif line.startswith("DONE"):
                done[int(rank)] = line
    # disjoint contiguous halves of the global batch
    assert sorted(rows.values()) == [(0, 2), (2, 4)], rows
    assert len(done) == 2, done
    # rank 0 wrote the full best-checkpoint set exactly once
    files = sorted(os.listdir(ckdir))
    assert "best_losses.txt" in files, files
    ext = ".orbax" if backend == "orbax" else ".ckpt"
    assert f"brats_t1n_BEST_sampled_10{ext}" in files, files
