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
    """Place a host batch with its leading dim sharded over the mesh.

    Single-process: the full global batch is on this host and ``device_put``
    slices it across local devices. Multi-host (``jax.process_count() > 1``):
    each process passes only ITS shard of the global batch (the per-host
    slice its ``BatchLoader`` produced) and the global array is assembled
    from the process-local pieces — no host ever materializes the full batch.
    """

    multiprocess = jax.process_count() > 1

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters, optimizer state) on the mesh.

    Under multi-host every process must hold an identical copy (states are
    built from the same seed on every host); the copies become one global
    replicated array per leaf.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
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


def make_parallel_pretrain_step(model, mesh: Mesh, *, axis: str = "data",
                                **config):
    """Source pretraining step over the data mesh — same contract as
    :func:`make_parallel_da_step`: state replicated, batch sharded on
    ``axis``, grads psum'd by GSPMD, ``lr`` a replicated scalar."""
    from dahpe_tpu.train.pretrain import make_pretrain_step

    step = make_pretrain_step(model, **config)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, repl),
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
