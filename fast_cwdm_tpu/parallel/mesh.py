"""Mesh + sharding utilities (TPU-native replacement for
`/root/reference/guided_diffusion/dist_util.py`).

The reference manages an explicit process group (NCCL/Gloo backend pick at
`dist_util.py:34`, env-var rendezvous `:42-53`) and moves tensors with
`.to(dev)`; here all of that collapses into:

* `setup_distributed()` — `jax.distributed.initialize()` for multi-host (a
  no-op single-host);
* `make_mesh(data=-1, sp=1)` — an ICI-aligned `jax.sharding.Mesh` with a
  ``data`` axis (batch / DP) and optional ``sp`` axis (spatial sharding of
  the volume; XLA GSPMD inserts conv/DWT halo exchanges automatically);
* sharding helpers used by the jitted train/sample steps. Gradient averaging
  is XLA's automatic `psum` under `jit` with sharded inputs — there is no
  hand-written all-reduce anywhere in the framework.
"""

from __future__ import annotations



import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "sp"
TENSOR_AXIS = "tp"


def setup_distributed() -> None:
    """Multi-host init (`jax.distributed`); single-process is a no-op.

    Parity surface for `dist_util.setup_dist` (`dist_util.py:20-53`) minus
    the port/rank bookkeeping JAX handles itself. MUST run before any call
    that initializes the XLA backend (e.g. `jax.process_count()` /
    `jax.devices()`), so the env-var check comes first and initialize() is
    simply idempotent-guarded.

    Manual (non-SLURM/OMPI/TPU-pod) launches set ``JAX_COORDINATOR_ADDRESS``
    + ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID`` explicitly — this JAX only
    auto-detects managed cluster environments, so the values are forwarded
    to ``initialize()`` here; on managed environments (SLURM, Open MPI,
    Cloud-TPU pods) leave all three unset and auto-detection applies.
    """
    import os

    jax_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    generic_coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    coord = jax_coord or generic_coord
    if jax_coord or nproc or pid:
        # any JAX_* var engages the manual contract; a partial config
        # would fall into auto-detect and die with an unrelated
        # cluster-detection error (or hang at rendezvous)
        if not (coord and nproc and pid):
            raise RuntimeError(
                "manual jax.distributed launch needs ALL of "
                "JAX_COORDINATOR_ADDRESS (or COORDINATOR_ADDRESS), "
                "JAX_NUM_PROCESSES and JAX_PROCESS_ID (got "
                f"coordinator={coord!r}, num_processes={nproc!r}, "
                f"process_id={pid!r})"
            )
    elif generic_coord:
        # a bare generic COORDINATOR_ADDRESS is often exported by outer
        # launchers for their own rendezvous — don't treat it as (a broken
        # half of) OUR manual contract; fall through to auto-detection
        print(
            f"[DIST] COORDINATOR_ADDRESS={generic_coord!r} set without "
            "JAX_NUM_PROCESSES/JAX_PROCESS_ID — ignoring it and relying "
            "on managed-cluster auto-detection"
        )
        coord = None
    if coord is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        except RuntimeError as e:
            # already initialized (or backends already up in-process):
            # surface only genuinely new failures
            if "already" not in str(e).lower():
                raise
        return
    # Managed-cluster markers jax.distributed can auto-detect from —
    # required to be genuinely MULTI-process (a dev box inside a SLURM
    # allocation of 1 task, or a single-worker TPU VM where
    # TPU_WORKER_HOSTNAMES is one hostname, stays single-process).
    managed = (
        int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1
        or os.environ.get("OMPI_MCA_orte_hnp_uri")
        or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not managed:
        return  # single-host launch
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    except ValueError as e:
        # Markers looked multi-process but JAX's cluster detection could
        # not resolve a coordinator. Degrading to single-process here
        # would make EVERY process of the job believe it is rank 0 of 1:
        # N independent unsynced replicas burning N× compute, all passing
        # the rank-0 checkpoint gates and racing on the same .tmp files
        # on a shared filesystem. Hard-fail instead; the escape hatch is
        # explicit.
        if os.environ.get("FAST_CWDM_ALLOW_SINGLE_PROCESS"):
            print(
                "[setup_distributed] WARNING: managed-cluster markers "
                f"present but jax.distributed auto-detection failed ({e}); "
                "FAST_CWDM_ALLOW_SINGLE_PROCESS is set — continuing "
                "single-process."
            )
            return
        raise RuntimeError(
            "managed-cluster markers present (SLURM/OpenMPI/TPU pod) but "
            f"jax.distributed auto-detection failed: {e}. Refusing to "
            "degrade to single-process — every rank would train an "
            "independent replica and race on shared checkpoint files. "
            "Set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
            "JAX_PROCESS_ID to launch manually, or set "
            "FAST_CWDM_ALLOW_SINGLE_PROCESS=1 to accept single-process."
        ) from e


def make_mesh(
    data: int = -1,
    sp: int = 1,
    tp: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, sp[, tp])`` mesh over the available devices.

    ``data=-1`` uses all devices not consumed by ``sp``/``tp``. Device order
    comes from `mesh_utils.create_device_mesh` so the inner axes ride ICI
    neighbours (scaling-book recipe: innermost axis ↔ fastest links). The
    ``tp`` axis (tensor parallelism: channel-sharded params via
    :func:`shard_params`) is only materialized when tp > 1, keeping the
    common 2-axis mesh shape for dp/sp-only jobs.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data == -1:
        if n % (sp * tp):
            raise ValueError(f"{n} devices not divisible by sp*tp={sp * tp}")
        data = n // (sp * tp)
    want = data * sp * tp
    if want > n:
        # fail HERE with the real cause — create_device_mesh's internal
        # assertion about mesh shape vs device count is much less clear
        raise ValueError(
            f"mesh data*sp*tp={want} exceeds the {n} available devices"
        )
    if want < n:
        # an explicit sub-mesh is legitimate (e.g. pin a job to 2 of 8
        # chips) but silently running at a fraction of the machine is a
        # classic misconfiguration — say so
        print(
            f"[make_mesh] using {want} of {n} devices "
            f"(data={data}, sp={sp}, tp={tp}); pass data=-1 to use all"
        )
        devices = devices[:want]
    if tp == 1:
        dev_array = mesh_utils.create_device_mesh(
            (data, sp), devices=np.asarray(devices)
        )
        return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))
    dev_array = mesh_utils.create_device_mesh(
        (data, sp, tp), devices=np.asarray(devices)
    )
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS, TENSOR_AXIS))


def make_hybrid_mesh(sp: int = 1) -> Mesh:
    """Multi-slice mesh: the ``data`` axis spans DCN (one group per slice)
    × ICI within a slice; ``sp`` stays intra-slice so conv halo exchanges
    ride ICI only. This is the multi-host BraTS-sweep capability the
    reference's world_size-1 dist scaffolding never reached
    (`dist_util.py:42-44`)."""
    n_groups = jax.process_count()
    per_group = jax.local_device_count()
    if n_groups <= 1:
        return make_mesh(sp=sp)
    if per_group % sp:
        raise ValueError(f"{per_group} local devices not divisible by sp={sp}")
    # group by slice_index only when it actually distinguishes the groups;
    # on a single-slice multi-host pod (and on the CPU test fabric) every
    # device reports the same slice_index and the granule must be the
    # PROCESS, or create_hybrid_device_mesh sees one slice and rejects the
    # dcn shape
    slice_ids = {getattr(d, "slice_index", 0) for d in jax.devices()}
    dev_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_group // sp, sp),
        dcn_mesh_shape=(n_groups, 1),
        process_is_granule=len(slice_ids) != n_groups,
    )
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_spec(mesh: Mesh, ndim: int, *, spatial_axis_index: int = 2) -> P:
    """PartitionSpec for a channels-last batch ``(B, X, Y, Z, C)``:
    batch over ``data``, one spatial dim over ``sp`` (if sp > 1)."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if mesh.shape[SPATIAL_AXIS] > 1 and ndim > spatial_axis_index:
        spec[spatial_axis_index] = SPATIAL_AXIS
    return P(*spec)


def batch_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh, ndim))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(leaf, mesh: Mesh) -> P:
    """Tensor-parallel spec for one parameter: shard the OUTPUT-channel
    (last) axis over ``tp`` when divisible — column-parallel convs/denses;
    GSPMD inserts the matching collectives. 1-D params (norm scales,
    biases) stay replicated. Capability beyond the reference (SURVEY §2.7:
    TP absent there; optional here)."""
    ntp = dict(mesh.shape).get(TENSOR_AXIS, 1)
    if ntp > 1 and leaf.ndim >= 2 and leaf.shape[-1] % ntp == 0:
        return P(*([None] * (leaf.ndim - 1) + [TENSOR_AXIS]))
    return P()


def shard_params(mesh: Mesh, params):
    """Device-put a parameter pytree with :func:`param_spec` shardings
    (replicates everything when the mesh has no ``tp`` axis)."""
    return jax.tree.map(
        lambda p: jax.device_put(p, NamedSharding(mesh, param_spec(p, mesh))),
        params,
    )


def shard_batch(mesh: Mesh, tree, *, global_batch: int | None = None):
    """Device-put a host batch pytree with batch/data (+ spatial) sharding.

    Single-process: ``tree`` holds GLOBAL batches and ``jax.device_put``
    slices out each device's shard. Multi-host: pass ``global_batch`` and
    feed each process only its OWN rows (:func:`local_batch_rows`) — the
    global array is assembled from the per-process shards without any
    cross-host transfer. The reference decodes the full DataLoader batch
    on every rank instead (`train.py:66-69` + DistributedSampler absent).
    """
    if global_batch is not None and jax.process_count() > 1:
        def put(x):
            sh = batch_sharding(mesh, np.ndim(x))
            gshape = (global_batch,) + tuple(np.shape(x)[1:])
            return jax.make_array_from_process_local_data(sh, x, gshape)

        return jax.tree.map(put, tree)

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, tree)


def local_batch_rows(mesh: Mesh, global_batch: int) -> tuple[int, int]:
    """The contiguous ``[start, stop)`` row range of a ``global_batch``-row
    batch owned by THIS process's devices under :func:`batch_sharding`.

    Multi-host input pipeline contract: every process builds the same
    seeded case permutation, decodes only these rows of each global batch,
    and :func:`shard_batch` (with ``global_batch=``) assembles the global
    array. Row→device mapping is taken from the sharding itself, so any
    device order `make_hybrid_mesh` produces stays consistent.
    """
    local_batch_size(global_batch, mesh)  # validates divisibility
    sh = NamedSharding(mesh, P(DATA_AXIS))
    idx_map = sh.addressable_devices_indices_map((global_batch,))
    blocks = set()
    for idx in idx_map.values():
        s = idx[0]
        blocks.add((s.start or 0, global_batch if s.stop is None else s.stop))
    starts = sorted(b[0] for b in blocks)
    stops = sorted(b[1] for b in blocks)
    lo, hi = starts[0], stops[-1]
    if sum(b[1] - b[0] for b in blocks) != hi - lo:
        # hybrid device orders always give each process one contiguous
        # data-axis block; anything else means the mesh was hand-built
        raise ValueError(
            f"process rows not contiguous under this mesh: {sorted(blocks)}"
        )
    return lo, hi


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch (reference `global_batch = batch *
    world_size`, `train_util.py:96`, inverted)."""
    ndata = mesh.shape[DATA_AXIS]
    if global_batch % ndata:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {ndata}"
        )
    return global_batch // ndata
