"""Data parallelism over a ``jax.sharding.Mesh``.

The reference is strictly single-device (``train1.py:34``; no
``torch.distributed`` anywhere — SURVEY.md §2.10), so this layer is new
TPU-native capability rather than a port: the jitted DA step runs SPMD with
the batch sharded over the mesh's ``data`` axis and parameters replicated.
XLA/GSPMD inserts the gradient ``psum`` over ICI; batch statistics become
global-batch (sync-BN) because every ``jnp.mean`` over the batch axis is a
global mean under GSPMD — strictly more correct than the reference's
per-device stats.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``jax.devices()`` then spans hosts and per-host data loading feeds
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Sequence | None = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch with its leading dim sharded over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters, optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_da_step(model, mesh: Mesh, *, axis: str = "data", **config):
    """Jit the DA train step for SPMD execution over ``mesh``.

    State in/out replicated; batches sharded on the leading (batch) dim
    (shardings given as pytree prefixes). Gradients reduce over ICI
    automatically (GSPMD); losses/metrics are global-batch means, identical
    to the single-device values.
    """
    from dahpe_tpu.train.da import make_da_train_step

    step = make_da_train_step(model, **config)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(model, mesh: Mesh, *, axis: str = "data"):
    """Jit the eval forward (main head only) sharded over the batch."""

    def eval_fn(variables, x):
        out = model.apply(variables, x, train=False, gl_coeff=0.0)
        return out["y"] if isinstance(out, dict) else out

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))
    return jax.jit(
        eval_fn, in_shardings=(repl, batch_sh), out_shardings=batch_sh
    )
