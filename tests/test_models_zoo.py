"""Model-zoo coverage: RegDA baseline family + backbone variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.models.resnet import BasicBlock, Bottleneck
from dahpe_tpu.train.disparity import rd_plain


def test_regda_baseline_forward_and_disparity():
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    model = models.RegDAPoseResNet(backbone=backbone, num_keypoints=5)
    x = jnp.zeros((2, 64, 64, 3))
    v = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.key(0))
    out = model.apply(v, x, train=False, gl_coeff=0.0)
    assert out["y"].shape == out["y_adv"].shape == out["y_adv2"].shape == (2, 16, 16, 5)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
    w = jnp.ones((2, 5))
    lo = rd_plain(y, out["y_adv"], w, "min")
    hi = rd_plain(y, out["y_adv"], w, "max")
    assert np.isfinite(float(lo)) and np.isfinite(float(hi))


@pytest.mark.parametrize("name,blocks", [("resnet18", BasicBlock), ("resnext50_32x4d", Bottleneck)])
def test_backbone_variants_forward(name, blocks):
    backbone = models.get_backbone(name)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: backbone.init(r, x, train=False))(jax.random.key(0))
    out = backbone.apply(v, x, train=False)
    assert out.shape == (1, 2, 2, backbone.out_features)


def test_predict_fn_fused_decode():
    from dahpe_tpu.evaluate import make_predict_fn

    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    model = models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=5)
    x = jnp.zeros((2, 64, 64, 3))
    v = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.key(0))
    predict = make_predict_fn(model, image_size=64, heatmap_size=16)
    coords, maxvals = predict(v, x)
    assert coords.shape == (2, 5, 2)
    assert maxvals.shape == (2, 5, 1)
    assert float(coords.max()) <= 64.0
