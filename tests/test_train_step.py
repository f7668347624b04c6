"""Tests for the jitted DA minimax step and partitioned SGD."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.train import (
    create_da_state,
    create_pretrain_state,
    make_da_train_step,
    make_pretrain_step,
)
from dahpe_tpu.train.optim import (
    DA_PARTITIONS,
    apply_partition_updates,
    da_lr,
    init_partitioned,
    pretrain_lr_factor,
    torch_sgd,
)
from dahpe_tpu.models.resnet import Bottleneck


def tiny_model(num_keypoints=4):
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    return models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=num_keypoints)


def tiny_batch(rng, b=2, k=4, img=64):
    hm = img // 4
    x = rng.standard_normal((b, img, img, 3)).astype(np.float32)
    tgt = np.clip(rng.standard_normal((b, hm, hm, k)), 0, None).astype(np.float32)
    w = np.ones((b, k), np.float32)
    return {
        "image": jnp.asarray(x),
        "target": jnp.asarray(tgt),
        "weight": jnp.asarray(w),
    }


def test_apply_partition_updates_freezes_unstepped():
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    grads = {"a": jnp.full(3, 0.5), "b": jnp.full(3, 0.5)}
    parts = {"pa": ("a",), "pb": ("b",)}
    tx = torch_sgd(weight_decay=0.0)
    opt = init_partitioned(tx, params, parts)
    new_params, new_opt = apply_partition_updates(
        tx, params, opt, grads, jnp.asarray(0.1), ("pa",), parts
    )
    assert not np.allclose(np.asarray(new_params["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new_params["b"]), 1.0)
    # momentum of the frozen partition untouched
    chex_trace_b = jax.tree.leaves(new_opt["pb"])
    for leaf in chex_trace_b:
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_torch_sgd_matches_pytorch_single_param():
    torch = pytest.importorskip("torch")
    w0 = np.asarray([1.0, -2.0, 3.0], np.float32)
    g_seq = [np.asarray([0.1, 0.2, -0.3], np.float32),
             np.asarray([-0.5, 0.4, 0.1], np.float32),
             np.asarray([0.2, -0.1, 0.0], np.float32)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([p], lr=0.05, momentum=0.9, nesterov=True, weight_decay=1e-4)
    for g in g_seq:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    ref = p.detach().numpy()

    tx = torch_sgd()
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in g_seq:
        direction, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p_, d: p_ - 0.05 * d, params, direction)
    np.testing.assert_allclose(np.asarray(params["w"]), ref, rtol=1e-6, atol=1e-7)


def test_da_lr_and_pretrain_factor():
    assert float(da_lr(0)) == pytest.approx(0.1 * 0.01)
    assert float(da_lr(10000)) == pytest.approx(0.1 * 0.01 * 2.0 ** (-0.75))
    assert pretrain_lr_factor(0) == 1.0
    assert pretrain_lr_factor(43) == 1.0
    assert pretrain_lr_factor(44) == pytest.approx(0.1)  # counter = 45
    assert pretrain_lr_factor(59) == pytest.approx(0.01)


def test_da_train_step_runs_and_updates_all_partitions():
    rng = np.random.default_rng(0)
    model = tiny_model()
    state = create_da_state(model, jax.random.key(0), image_size=64)
    step_fn = jax.jit(make_da_train_step(model))
    b_s, b_t = tiny_batch(rng), tiny_batch(rng)
    new_state, metrics = step_fn(state, b_s, b_t)
    assert int(new_state.step) == 1
    for key in ("loss_s", "loss_gf", "loss_gt", "acc_s", "acc_t"):
        assert np.isfinite(float(metrics[key])), key
    for part, keys in DA_PARTITIONS.items():
        for k in keys:
            before = jax.tree.leaves(state.params[k])
            after = jax.tree.leaves(new_state.params[k])
            changed = any(
                not np.allclose(np.asarray(x), np.asarray(y))
                for x, y in zip(before, after)
            )
            assert changed, f"partition {part}/{k} did not update"
    # batch stats moved (3 train-mode forwards)
    bs0 = jax.tree.leaves(state.batch_stats)
    bs1 = jax.tree.leaves(new_state.batch_stats)
    assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(bs0, bs1))


def test_da_train_step_conf_gate():
    """conf_gate drops low-confidence target pseudo-labels in steps B/C:
    the target losses must change, the source loss must NOT (step A is
    never gated), and the step must stay finite and update all partitions
    (drift-mitigation knob, docs/ACCURACY.md)."""
    rng = np.random.default_rng(2)
    model = tiny_model()
    state = create_da_state(model, jax.random.key(0), image_size=64)
    b_s, b_t = tiny_batch(rng, b=4), tiny_batch(rng, b=4)

    plain_fn = jax.jit(make_da_train_step(model))
    gated_fn = jax.jit(make_da_train_step(model, conf_gate=0.75))
    _, m0 = plain_fn(state, b_s, b_t)
    st1, m1 = gated_fn(state, b_s, b_t)

    assert float(m1["loss_s"]) == pytest.approx(float(m0["loss_s"]))
    assert float(m1["loss_gf"]) != pytest.approx(float(m0["loss_gf"]))
    assert float(m1["loss_gt"]) != pytest.approx(float(m0["loss_gt"]))
    for key in ("loss_s", "loss_gf", "loss_gt"):
        assert np.isfinite(float(m1[key])), key
    for part, keys in DA_PARTITIONS.items():
        for k in keys:
            changed = any(
                not np.allclose(np.asarray(x), np.asarray(y))
                for x, y in zip(
                    jax.tree.leaves(state.params[k]),
                    jax.tree.leaves(st1.params[k]),
                )
            )
            assert changed, f"partition {part}/{k} did not update"

    # the unshared path gates identically in kind (its own forward's peaks)
    unshared = jax.jit(
        make_da_train_step(model, conf_gate=0.75, share_target_features=False)
    )
    _, m2 = unshared(state, b_s, b_t)
    assert np.isfinite(float(m2["loss_gf"]))
    assert float(m2["loss_gf"]) != pytest.approx(float(m0["loss_gf"]))


def test_pretrain_step_decreases_loss():
    rng = np.random.default_rng(1)
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    model = models.PoseResNet(backbone=backbone, num_keypoints=4)
    state = create_pretrain_state(model, jax.random.key(0), image_size=64)
    step_fn = jax.jit(make_pretrain_step(model))
    batch = tiny_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch, jnp.asarray(0.05))
        losses.append(float(metrics["loss_s"]))
    assert losses[-1] < losses[0]
