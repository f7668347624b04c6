"""Device-mesh data parallelism."""

from dahpe_tpu.parallel.distributed import (
    cpu_collective_timeout_flag,
    robust_distributed_initialize,
)
from dahpe_tpu.parallel.mesh import (
    create_mesh,
    make_parallel_da_step,
    make_parallel_eval_step,
    make_parallel_pretrain_step,
    replicate,
    shard_batch,
)

__all__ = [
    "cpu_collective_timeout_flag",
    "robust_distributed_initialize",
    "create_mesh",
    "make_parallel_da_step",
    "make_parallel_eval_step",
    "make_parallel_pretrain_step",
    "replicate",
    "shard_batch",
]
