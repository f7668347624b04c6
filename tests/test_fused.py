"""Whole-iteration fusion (``train/fused.py``): one dispatch must reproduce
the separate store-batch + parallel-step path bit-for-bit under equal seeds.
"""

import numpy as np
import pytest

import jax

from tests.fixtures import make_rhd_fixture

from dahpe_tpu import models
from dahpe_tpu.data import DecodedCache, RenderedHandPose
from dahpe_tpu.data.device_store import DeviceDataStore
from dahpe_tpu.models.resnet import Bottleneck
from dahpe_tpu.parallel import (
    create_mesh,
    make_parallel_da_step,
    make_parallel_pretrain_step,
    replicate,
)
from dahpe_tpu.train import (
    create_da_state,
    create_pretrain_state,
    make_fused_da_iteration,
    make_fused_pretrain_iteration,
    seed_key,
)

K = 21
IMG, HM = 64, 16


@pytest.fixture(scope="module")
def stores():
    import tempfile

    mesh = create_mesh()
    roots = []
    out = []
    for seed in (0, 1):
        root = tempfile.mkdtemp(prefix=f"fused_rhd{seed}_")
        make_rhd_fixture(root, n=16, seed=seed)
        ds = RenderedHandPose(root, split="train", transforms=None)
        cache = DecodedCache(ds, root + "/_c")
        out.append(DeviceDataStore(cache, mesh=mesh, verbose=False))
        roots.append(root)
    return mesh, out[0], out[1]


def tiny_model():
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    return models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=K)


def _params_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_fused_da_iteration_matches_unfused(stores):
    mesh, src, tgt = stores
    d = mesh.shape["data"]
    b = 2 * d
    cfg = dict(image_size=IMG, heatmap_size=HM)
    model = tiny_model()

    def fresh_state():
        return replicate(
            create_da_state(model, jax.random.key(0), image_size=IMG,
                            batch_size=b),
            mesh,
        )

    # unfused: seed_stream + next_train_batch + parallel step
    step = make_parallel_da_step(model, mesh, compute_metrics=False)
    state_u = fresh_state()
    src.seed_stream(jax.random.key(3))
    tgt.seed_stream(jax.random.key(4))
    for _ in range(2):
        b_s = src.next_train_batch(b, **cfg)
        b_t = tgt.next_train_batch(b, **cfg)
        state_u, m_u = step(state_u, b_s, b_t)

    # fused: one dispatch per iteration, same seeds
    fused = make_fused_da_iteration(
        model, mesh, src, tgt, b, compute_metrics=False, **cfg
    )
    state_f = fresh_state()
    ks = seed_key(mesh, jax.random.key(3))
    kt = seed_key(mesh, jax.random.key(4))
    for _ in range(2):
        state_f, m_f, ks, kt = fused(state_f, ks, kt)

    assert float(m_f["loss_s"]) == float(m_u["loss_s"])
    _params_equal(state_u.params, state_f.params)
    _params_equal(state_u.batch_stats, state_f.batch_stats)
    assert int(state_f.step) == 2


@pytest.mark.slow
def test_fused_da_scan_chunk_matches_single_calls(stores):
    """steps_per_call=K (one lax.scan dispatch) must reproduce K separate
    fused calls: the key-stream advance bit-exactly (it determines the
    batch sequence), the params to float-reassociation noise (XLA fuses
    the scan body differently from the straight-line program), and the
    metrics as the chunk mean."""
    mesh, src, tgt = stores
    d = mesh.shape["data"]
    b = 2 * d
    cfg = dict(image_size=IMG, heatmap_size=HM)
    model = tiny_model()
    K = 3

    def fresh_state():
        return replicate(
            create_da_state(model, jax.random.key(0), image_size=IMG,
                            batch_size=b),
            mesh,
        )

    single = make_fused_da_iteration(
        model, mesh, src, tgt, b, compute_metrics=False, **cfg
    )
    state_1 = fresh_state()
    ks, kt = seed_key(mesh, jax.random.key(3)), seed_key(mesh, jax.random.key(4))
    losses = []
    for _ in range(K):
        state_1, m, ks, kt = single(state_1, ks, kt)
        losses.append(float(m["loss_s"]))

    ks_1, kt_1 = np.asarray(ks), np.asarray(kt)  # key stream after K singles

    chunked = make_fused_da_iteration(
        model, mesh, src, tgt, b, compute_metrics=False,
        steps_per_call=K, **cfg
    )
    state_k = fresh_state()
    ks, kt = seed_key(mesh, jax.random.key(3)), seed_key(mesh, jax.random.key(4))
    state_k, m_k, ks, kt = chunked(state_k, ks, kt)

    # the key stream (hence the batch sequence) advances bit-identically
    np.testing.assert_array_equal(np.asarray(ks), ks_1)
    np.testing.assert_array_equal(np.asarray(kt), kt_1)
    # The DA step's pseudo-label construction takes discrete decisions
    # (peak locations); float-reassociation noise between the scan-compiled
    # and straight-line programs can flip a near-tie peak, and a flipped
    # label moves the touched weights by an lr-scale increment (~1e-5 at
    # this config). So DA params match only loosely by construction; the
    # tight equivalence check lives in the pretrain scan test below (smooth
    # loss, no discrete branching), and the exact batch-sequence guarantee
    # is the key assertion above.
    for a, b_ in zip(
        jax.tree.leaves(state_1.params), jax.tree.leaves(state_k.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=0.05, atol=5e-4
        )
    assert int(state_k.step) == K
    np.testing.assert_allclose(
        float(m_k["loss_s"]), np.mean(losses), rtol=1e-3
    )


@pytest.mark.slow
def test_fused_pretrain_scan_chunk_matches_single_calls(stores):
    """Tight numerical equivalence of steps_per_call on the supervised
    pretrain path: smooth MSE loss, no discrete pseudo-label branching, so
    scan-vs-straight-line divergence stays at reassociation scale."""
    mesh, src, _ = stores
    d = mesh.shape["data"]
    b = 2 * d
    cfg = dict(image_size=IMG, heatmap_size=HM)
    model = models.PoseResNet(
        backbone=models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1]),
        num_keypoints=K,
    )
    n_steps = 3

    def fresh_state():
        return replicate(
            create_pretrain_state(model, jax.random.key(0), image_size=IMG,
                                  batch_size=b),
            mesh,
        )

    lr = replicate(np.float32(1e-3), mesh)
    single = make_fused_pretrain_iteration(
        model, mesh, src, b, compute_metrics=False, **cfg
    )
    state_1 = fresh_state()
    k = seed_key(mesh, jax.random.key(9))
    losses = []
    for _ in range(n_steps):
        state_1, m, k = single(state_1, k, lr)
        losses.append(float(m["loss_s"]))
    k_1 = np.asarray(k)

    chunked = make_fused_pretrain_iteration(
        model, mesh, src, b, compute_metrics=False,
        steps_per_call=n_steps, **cfg
    )
    state_k = fresh_state()
    k = seed_key(mesh, jax.random.key(9))
    state_k, m_k, k = chunked(state_k, k, lr)

    np.testing.assert_array_equal(np.asarray(k), k_1)
    for a, b_ in zip(
        jax.tree.leaves(state_1.params), jax.tree.leaves(state_k.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6
        )
    np.testing.assert_allclose(
        float(m_k["loss_s"]), np.mean(losses), rtol=1e-5
    )


@pytest.mark.slow
def test_fused_pretrain_iteration_matches_unfused(stores):
    mesh, src, _ = stores
    d = mesh.shape["data"]
    b = 2 * d
    cfg = dict(image_size=IMG, heatmap_size=HM)
    model = models.PoseResNet(
        backbone=models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1]),
        num_keypoints=K,
    )

    def fresh_state():
        return replicate(
            create_pretrain_state(model, jax.random.key(0), image_size=IMG,
                                  batch_size=b),
            mesh,
        )

    step = make_parallel_pretrain_step(model, mesh, compute_metrics=False)
    state_u = fresh_state()
    src.seed_stream(jax.random.key(9))
    for _ in range(2):
        state_u, m_u = step(state_u, src.next_train_batch(b, **cfg), 1e-3)

    fused = make_fused_pretrain_iteration(
        model, mesh, src, b, compute_metrics=False, **cfg
    )
    state_f = fresh_state()
    k = seed_key(mesh, jax.random.key(9))
    lr = replicate(np.float32(1e-3), mesh)
    for _ in range(2):
        state_f, m_f, k = fused(state_f, k, lr)

    assert float(m_f["loss_s"]) == float(m_u["loss_s"])
    _params_equal(state_u.params, state_f.params)
