"""Multi-host data parallelism, actually executed: 2 CPU processes.

The reference has no distributed layer at all (``train1.py:34``); the
rebuild's ``--multihost`` path (``jax.distributed.initialize`` + per-host
loader shards + ``shard_batch``/``replicate`` over a global mesh) is new
capability, so it gets an execution test rather than a wiring test: two
OS processes with 2 virtual CPU devices each run ONE parallel DA step on a
4-device global mesh and must agree with the single-process 4-device value.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT

LOCAL_DEVICES = 2
NUM_PROCESSES = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(extra_args=()):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO_ROOT
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO_ROOT, "tests", "multihost_worker.py"),
                coordinator,
                str(NUM_PROCESSES),
                str(pid),
                str(LOCAL_DEVICES),
                *extra_args,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(NUM_PROCESSES)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    return outs


def _parse_losses(out: str) -> np.ndarray:
    for line in out.splitlines():
        if line.startswith("LOSSES "):
            return np.array([float(v) for v in line.split()[1:]])
    raise AssertionError(f"no LOSSES line in worker output:\n{out}")


def _single_process_losses() -> np.ndarray:
    """Ground truth: same step on a single-process 4-device mesh."""
    import jax

    from dahpe_tpu import models
    from dahpe_tpu.models.resnet import Bottleneck
    from dahpe_tpu.parallel import (
        create_mesh,
        make_parallel_da_step,
        replicate,
        shard_batch,
    )
    from dahpe_tpu.train import create_da_state

    n_global = NUM_PROCESSES * LOCAL_DEVICES
    mesh = create_mesh(jax.devices()[:n_global])
    model = models.MultiHeadPoseResNet(
        backbone=models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1]),
        num_keypoints=21,
    )
    state = create_da_state(model, jax.random.key(0), image_size=64, with_ema=True)
    state = replicate(state, mesh)

    def global_batch(seed):
        rng = np.random.default_rng(seed)
        return {
            "image": rng.standard_normal((n_global, 64, 64, 3)).astype(np.float32),
            "target": np.clip(
                rng.standard_normal((n_global, 16, 16, 21)), 0, None
            ).astype(np.float32),
            "weight": np.ones((n_global, 21), np.float32),
        }

    step = make_parallel_da_step(model, mesh, ema_decay=0.999)
    _, metrics = step(
        state, shard_batch(global_batch(0), mesh), shard_batch(global_batch(1), mesh)
    )
    return np.array(
        [
            float(metrics["loss_s"]),
            float(metrics["loss_gf"]),
            float(metrics["loss_gt"]),
        ]
    )


@pytest.mark.slow
def test_two_process_da_step_matches_single_process():
    outs = _run_workers()
    losses = [_parse_losses(out) for out in outs]
    # both processes see the same replicated global metrics
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    expected = _single_process_losses()
    # cross-process psum may reduce in a different association order than the
    # single-process all-reduce; tolerance covers float32 reassociation only
    np.testing.assert_allclose(losses[0], expected, rtol=2e-5)


def _parse_store(out: str) -> np.ndarray:
    for line in out.splitlines():
        if line.startswith("STORE "):
            return np.array([float(v) for v in line.split()[1:]])
    raise AssertionError(f"no STORE line in worker output:\n{out}")


def _single_process_store_sums(fixture_root: str) -> np.ndarray:
    """Same sampled global batch on a single-process 4-device mesh."""
    import os

    import jax
    import jax.numpy as jnp

    from dahpe_tpu.data import DecodedCache, RenderedHandPose
    from dahpe_tpu.data.device_store import DeviceDataStore
    from dahpe_tpu.parallel import create_mesh

    n_global = NUM_PROCESSES * LOCAL_DEVICES
    mesh = create_mesh(jax.devices()[:n_global])
    ds = RenderedHandPose(fixture_root, split="train", transforms=None)
    cache = DecodedCache(
        ds, os.path.join(fixture_root, "_cache64"), raw_size=64
    )
    store = DeviceDataStore(cache, mesh=mesh, raw_size=64, verbose=False)
    batch = store.train_batch(
        jax.random.key(5), batch_size=2 * n_global, image_size=64,
        heatmap_size=16,
    )
    return np.array(
        [
            float(jnp.sum(batch[k].astype(jnp.float32)))
            for k in ("image", "target", "weight")
        ]
    )


def _parse_fused(out: str) -> np.ndarray:
    for line in out.splitlines():
        if line.startswith("FUSED "):
            return np.array([float(v) for v in line.split()[1:]])
    raise AssertionError(f"no FUSED line in worker output:\n{out}")


def _single_process_fused_losses(fixture_root: str) -> np.ndarray:
    """Ground truth for the fused iteration on a single-process mesh."""
    import os

    import jax

    from dahpe_tpu import models
    from dahpe_tpu.data import DecodedCache, RenderedHandPose
    from dahpe_tpu.data.device_store import DeviceDataStore
    from dahpe_tpu.models.resnet import Bottleneck
    from dahpe_tpu.parallel import create_mesh, replicate
    from dahpe_tpu.train import (
        create_da_state,
        make_fused_da_iteration,
        seed_key,
    )

    n_global = NUM_PROCESSES * LOCAL_DEVICES
    mesh = create_mesh(jax.devices()[:n_global])
    ds = RenderedHandPose(fixture_root, split="train", transforms=None)
    cache = DecodedCache(
        ds, os.path.join(fixture_root, "_cache64"), raw_size=64
    )
    store = DeviceDataStore(cache, mesh=mesh, raw_size=64, verbose=False)
    model = models.MultiHeadPoseResNet(
        backbone=models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1]),
        num_keypoints=21,
    )
    state = replicate(
        create_da_state(model, jax.random.key(0), image_size=64,
                        with_ema=True),
        mesh,
    )
    fused = make_fused_da_iteration(
        model, mesh, store, store, 2 * n_global, image_size=64,
        heatmap_size=16, ema_decay=0.999,
    )
    ks = seed_key(mesh, jax.random.key(11))
    kt = seed_key(mesh, jax.random.key(12))
    _, fm, ks, kt = fused(state, ks, kt)
    return np.array(
        [float(fm["loss_s"]), float(fm["loss_gf"]), float(fm["loss_gt"])]
    )


@pytest.mark.slow
def test_two_process_device_store_matches_single_process(tmp_path):
    """Multi-host device store: per-process shard upload + replicated-key
    sampling must produce the identical global training batch regardless of
    process layout (sampling folds in the device's mesh position, not the
    process); the fused single-dispatch iteration must then reproduce the
    single-process losses across both processes."""
    from tests.fixtures import make_rhd_fixture

    root = str(tmp_path / "rhd")
    make_rhd_fixture(root, n=16)
    expected = _single_process_store_sums(root)  # also pre-builds the cache
    expected_fused = _single_process_fused_losses(root)
    outs = _run_workers(extra_args=(root,))
    sums = [_parse_store(out) for out in outs]
    np.testing.assert_allclose(sums[0], sums[1], rtol=0, atol=0)
    np.testing.assert_allclose(sums[0], expected, rtol=2e-5)
    fused = [_parse_fused(out) for out in outs]
    np.testing.assert_allclose(fused[0], fused[1], rtol=0, atol=0)
    np.testing.assert_allclose(fused[0], expected_fused, rtol=2e-5)
