"""Whole-iteration fusion: batch production + train step in ONE dispatch.

With a :class:`~dahpe_tpu.data.device_store.DeviceDataStore` the training
loop's steady state is three device programs per iteration (source batch,
target batch, DA step). Each dispatch crosses the host↔device transport —
cheap on a local PCIe chip, measurably not through a high-latency link (this
environment's tunneled TPU). Fusing everything into one jitted program makes
an entire DA iteration (on-device sample gather + fused augmentation +
Gaussian targets for BOTH domains + the 3-phase minimax step) a single
dispatch, with the sampling keys advancing inside the program (donated
buffers) exactly like ``DeviceDataStore.seed_stream``.

The reference has no equivalent capability (host ``DataLoader`` feeding,
``train1.py:76-77,355-357``); given equal seeds the fused iteration is
bit-identical to the separate ``next_train_batch`` + step path (tested).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def seed_key(mesh, key):
    """Replicated device-resident key-data buffer from a host PRNG key —
    the one-time seed upload for a fused iteration's key stream."""
    from dahpe_tpu.parallel.mesh import replicate

    return replicate(np.asarray(jax.random.key_data(key), np.uint32), mesh)


def _advance(key_data):
    key = jax.random.wrap_key_data(key_data)
    next_key, sub = jax.random.split(key)
    return jax.random.key_data(next_key), jax.random.key_data(sub)


def make_fused_da_iteration(model, mesh, source_store, target_store,
                            batch_size: int, *, image_size: int = 256,
                            heatmap_size: int = 64, rotation: float = 180.0,
                            scale_range=(0.6, 1.3), sigma: float = 2.0,
                            steps_per_call: int = 1, **step_config):
    """``(state, s_key_data, t_key_data) -> (state, metrics, s_key', t_key')``
    — one jitted SPMD program per DA iteration over ``mesh``.

    Key streams match ``seed_stream``/``next_train_batch``: seed each with
    ``store._put_key(key)`` (or any replicated uint32 key-data array) and
    thread the returned buffers; the batch sequence is bit-identical to the
    unfused path under the same seeds.

    ``steps_per_call > 1`` runs that many consecutive DA iterations inside
    the one program (``lax.scan`` — the body compiles once), amortizing the
    per-dispatch host/link overhead across K steps. The sampling-key
    sequence (and therefore the batch sequence) is bit-identical to K
    single calls; the step numerics match to float-reassociation noise
    (XLA fuses the scan body differently from the straight-line program —
    measured ~1e-8 absolute after 3 steps, the same class as
    ``share_target_features``). Returned metrics are the mean over the
    chunk (each metric is a scalar).
    """
    from dahpe_tpu.train.da import make_da_train_step

    cfg = dict(image_size=image_size, heatmap_size=heatmap_size,
               rotation=rotation, scale_range=tuple(scale_range), sigma=sigma)
    src = source_store.traced_batch_fn(batch_size, **cfg)
    tgt = target_store.traced_batch_fn(batch_size, **cfg)
    step = make_da_train_step(model, **step_config)
    repl = NamedSharding(mesh, P())

    # the resident store arrays are jit ARGUMENTS, not closure captures:
    # under multi-host they span non-addressable devices, which jit refuses
    # to close over (and as arguments they are passed by reference anyway)
    @partial(jax.jit, out_shardings=(repl, repl, repl, repl),
             donate_argnums=(0, 1, 2))
    def iteration(state, s_key_data, t_key_data, s_arrays, t_arrays):
        def one_step(state, s_key_data, t_key_data):
            s_next, s_sub = _advance(s_key_data)
            t_next, t_sub = _advance(t_key_data)
            state, metrics = step(state, src(*s_arrays, s_sub),
                                  tgt(*t_arrays, t_sub))
            return state, metrics, s_next, t_next

        if steps_per_call == 1:
            return one_step(state, s_key_data, t_key_data)

        def body(carry, _):
            state, metrics, s_next, t_next = one_step(*carry)
            return (state, s_next, t_next), metrics

        (state, s_next, t_next), metrics = jax.lax.scan(
            body, (state, s_key_data, t_key_data), length=steps_per_call
        )
        metrics = jax.tree.map(lambda m: m.mean(axis=0), metrics)
        return state, metrics, s_next, t_next

    def call(state, s_key_data, t_key_data):
        return iteration(state, s_key_data, t_key_data,
                         source_store.store_arrays(),
                         target_store.store_arrays())

    return call


def make_fused_pretrain_iteration(model, mesh, source_store, batch_size: int,
                                  *, image_size: int = 256,
                                  heatmap_size: int = 64,
                                  rotation: float = 180.0,
                                  scale_range=(0.6, 1.3), sigma: float = 2.0,
                                  steps_per_call: int = 1, **step_config):
    """``(state, key_data, lr) -> (state, metrics, key')`` — the supervised
    pretrain counterpart of :func:`make_fused_da_iteration` (including
    ``steps_per_call``; the lr is constant across a chunk, which matches the
    CLI's per-epoch schedule)."""
    from dahpe_tpu.train.pretrain import make_pretrain_step

    src = source_store.traced_batch_fn(
        batch_size, image_size=image_size, heatmap_size=heatmap_size,
        rotation=rotation, scale_range=tuple(scale_range), sigma=sigma,
    )
    step = make_pretrain_step(model, **step_config)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(repl, repl, repl),
             donate_argnums=(0, 1))
    def iteration(state, key_data, lr, arrays):
        def one_step(state, key_data):
            next_key, sub = _advance(key_data)
            state, metrics = step(state, src(*arrays, sub), lr)
            return state, metrics, next_key

        if steps_per_call == 1:
            return one_step(state, key_data)

        def body(carry, _):
            state, metrics, next_key = one_step(*carry)
            return (state, next_key), metrics

        (state, next_key), metrics = jax.lax.scan(
            body, (state, key_data), length=steps_per_call
        )
        metrics = jax.tree.map(lambda m: m.mean(axis=0), metrics)
        return state, metrics, next_key

    def call(state, key_data, lr):
        return iteration(state, key_data, lr, source_store.store_arrays())

    return call
