"""Device-mesh construction and sharding (L0 dist).

Replaces the reference's `dist_util.py` (torch.distributed NCCL/Gloo process
groups, `dist_util.py:20-53`) with JAX-native SPMD: one `Mesh`, sharding
annotations, and XLA-inserted collectives.
"""

from fast_cwdm_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    SPATIAL_AXIS,
    TENSOR_AXIS,
    batch_sharding,
    batch_spec,
    make_hybrid_mesh,
    make_mesh,
    param_spec,
    replicated,
    setup_distributed,
    shard_batch,
    shard_params,
)
