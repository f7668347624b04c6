"""Device-mesh data parallelism."""

from dahpe_tpu.parallel.mesh import (
    create_mesh,
    make_parallel_da_step,
    make_parallel_eval_step,
    make_parallel_pretrain_step,
    replicate,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "make_parallel_da_step",
    "make_parallel_eval_step",
    "make_parallel_pretrain_step",
    "replicate",
    "shard_batch",
]
