"""Checkpoint round trips: orbax full train state + reference .pth interop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.models.resnet import Bottleneck
from dahpe_tpu.train import create_da_state, make_da_train_step
from dahpe_tpu.utils import checkpoint as ckpt


def tiny_model(k=4):
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    return models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=k)


def tiny_batch(rng, b=2, k=4, img=64):
    hm = img // 4
    return {
        "image": jnp.asarray(rng.standard_normal((b, img, img, 3)), jnp.float32),
        "target": jnp.asarray(
            np.clip(rng.standard_normal((b, hm, hm, k)), 0, None), jnp.float32
        ),
        "weight": jnp.ones((b, k), jnp.float32),
    }


@pytest.mark.slow
def test_orbax_state_round_trip_and_resume(tmp_path):
    rng = np.random.default_rng(0)
    model = tiny_model()
    state = create_da_state(model, jax.random.key(0), image_size=64)
    step = jax.jit(make_da_train_step(model, compute_metrics=False))
    b_s, b_t = tiny_batch(rng), tiny_batch(rng)
    state, _ = step(state, b_s, b_t)

    path = str(tmp_path / "ckpt")
    ckpt.save_state(path, state)
    template = create_da_state(model, jax.random.key(1), image_size=64)
    restored = ckpt.restore_state(path, template)
    assert int(restored.step) == 1

    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # momentum buffers survive too (the reference loses 2 of 5 optimizers)
    for a, b in zip(jax.tree.leaves(state.opt), jax.tree.leaves(restored.opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues identically
    s1, m1 = step(state, b_s, b_t)
    s2, m2 = step(restored, b_s, b_t)
    assert float(m1["loss_s"]) == pytest.approx(float(m2["loss_s"]), rel=1e-6)


def test_model_variables_round_trip(tmp_path):
    model = tiny_model()
    state = create_da_state(model, jax.random.key(0), image_size=64)
    path = str(tmp_path / "vars")
    ckpt.save_state(path, {"params": state.params, "batch_stats": state.batch_stats})
    loaded = ckpt.load_model_variables(path)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(loaded["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_imagenet_backbone(tmp_path):
    """A torchvision-keyed ImageNet file (no 'backbone.' prefix, with fc.*)
    loads into the backbone and changes only backbone leaves."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracles import OracleResNet

    tnet = OracleResNet([1, 1, 1, 1])
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in tnet.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    state_dict = tnet.state_dict()
    # torchvision files carry the classifier our headless net lacks
    state_dict["fc.weight"] = torch.zeros(1000, 2048)
    state_dict["fc.bias"] = torch.zeros(1000)
    path = str(tmp_path / "imagenet.pth")
    torch.save(state_dict, path)

    model = tiny_model(k=4)
    state = create_da_state(model, jax.random.key(0), image_size=64)
    variables = ckpt.load_imagenet_backbone(
        path, {"params": state.params, "batch_stats": state.batch_stats}
    )
    # backbone conv1 now equals the torch weights
    got = np.asarray(variables["params"]["backbone"]["conv1"]["kernel"])
    want = state_dict["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=0)
    # heads untouched
    a = jax.tree.leaves(state.params["head"])
    b = jax.tree.leaves(variables["params"]["head"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prune_epoch_checkpoints(tmp_path):
    """--keep-checkpoints retention: only the newest N integer-named epoch
    dirs (+ their aux sidecars) survive; named checkpoints are untouched."""
    import os

    root = str(tmp_path)
    for name in ("0", "1", "2", "3", "4", "best", "model_ema"):
        os.makedirs(os.path.join(root, name))
        with open(os.path.join(root, f"{name}_aux.npz"), "wb") as fh:
            fh.write(b"x")
    # a stray integer-named FILE must not be rmtree'd as a checkpoint
    with open(os.path.join(root, "7"), "w") as fh:
        fh.write("not a checkpoint dir")

    pruned = ckpt.prune_epoch_checkpoints(root, keep=2)
    assert pruned == [0, 1, 2]
    left = sorted(os.listdir(root))
    assert left == [
        "3", "3_aux.npz", "4", "4_aux.npz", "7",
        "best", "best_aux.npz", "model_ema", "model_ema_aux.npz",
    ]
    # keep >= count and keep=0 are no-ops
    assert ckpt.prune_epoch_checkpoints(root, keep=5) == []
    assert ckpt.prune_epoch_checkpoints(root, keep=0) == []
    assert sorted(os.listdir(root)) == left
