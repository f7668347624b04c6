"""Gold parity test: the full 3-step DA iteration vs a torch oracle driven by
the reference's OWN loss/pseudo-label/GL modules.

Runs two complete iterations (so the warm-start λ becomes nonzero in the
second) on identical weights and batches, then compares every parameter and
batch-norm statistic. This pins down the whole trainer: loss weights,
gradient routing through the GL layer, per-partition SGD with nesterov
momentum + coupled weight decay, LambdaLR decay, and BN update ordering.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.models.resnet import Bottleneck
from dahpe_tpu.train import create_da_state, make_da_train_step
from dahpe_tpu.utils import torch_import
from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

K = 21  # rd_64's channel-union GF hardcodes .repeat(1, 21, 1, 1)


def _build_torch_side():
    from tests.torch_oracles import OracleResNet, randomize_bn_stats
    from uda.model.pose_resnet2 import Upsampling as TorchUpsampling
    from utils.gl import WarmStartGradientLayer
    import uda.model.regda_7 as regda_7

    class TorchMultiHead(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = OracleResNet([1, 1, 1, 1])
            self.upsampling = TorchUpsampling(self.backbone.out_features)
            self.head = regda_7.PoseResNetx9._make_head(2, 256, K)
            self.head_adv = regda_7.PoseResNetx9._make_head(2, 256, K)
            self.head_adv2 = regda_7.make_head(2, 256, K)
            self.head_adv3 = regda_7.make_head2(2, 256, K)
            self.gl_layer = WarmStartGradientLayer(
                alpha=1.0, lo=0.0, hi=0.1, max_iters=1000, auto_step=False
            )

        def forward(self, x):
            f = self.upsampling(self.backbone(x))
            f_adv = self.gl_layer(f)
            y = self.head(f)
            y_adv = self.head_adv(f_adv)
            y_adv2 = self.head_adv2(f_adv, y_adv)
            y_adv3 = self.head_adv3(f_adv, y_adv2)
            return y, y_adv, y_adv2, y_adv3, f

    m = TorchMultiHead()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    randomize_bn_stats(m, seed=12)
    return m


def _reference_iteration(model, batches, n_iters):
    """The reference's train() inner loop (train1.py:355-458), verbatim in
    behavior: 3 forwards/backwards, per-optimizer stepping, per-iteration
    LambdaLR, model.step()."""
    from uda.model.loss import JointsKLLoss
    from uda.model.regda_4 import PseudoLabelGenerator
    from uda.model.regda_7 import (
        PseudoLabelGenerator01,
        PseudoLabelGenerator03,
        RegressionDisparityx1,
        RegressionDisparityx5,
        RegressionDisparityx6,
    )

    criterion = JointsKLLoss()
    rd64 = RegressionDisparityx6(PseudoLabelGenerator(K, 64, 64), JointsKLLoss(epsilon=1e-7))
    rd32 = RegressionDisparityx5(PseudoLabelGenerator03(K), JointsKLLoss(epsilon=1e-7))
    rd16 = RegressionDisparityx1(PseudoLabelGenerator01(K), JointsKLLoss(epsilon=1e-7))

    sgd = lambda params: torch.optim.SGD(
        params, lr=0.1, momentum=0.9, weight_decay=1e-4, nesterov=True
    )
    opt_f = sgd(list(model.backbone.parameters()) + list(model.upsampling.parameters()))
    opt_h = sgd(model.head.parameters())
    opt_ha = sgd(model.head_adv.parameters())
    opt_ha2 = sgd(model.head_adv2.parameters())
    opt_ha3 = sgd(model.head_adv3.parameters())
    opts = [opt_f, opt_h, opt_ha, opt_ha2, opt_ha3]
    lr_fn = lambda x: 0.01 * (1.0 + 1e-4 * float(x)) ** (-0.75)
    scheds = [torch.optim.lr_scheduler.LambdaLR(o, lr_fn) for o in opts]

    model.train()
    for it in range(n_iters):
        x_s, label_s, w_s, x_t, w_t = batches[it]
        for o in opts:
            o.zero_grad()
        y_s, y_s_adv, y_s_adv2, y_s_adv3, f_s = model(x_s)
        loss_s = (
            2 * criterion(y_s, label_s, w_s)
            + 4 * rd32(y_s, y_s_adv2, None, w_s, mode="min")
            + 4 * rd64(y_s, y_s_adv, None, w_s, mode="min")
            + 4 * rd16(y_s, y_s_adv3, w_s, mode="min")
        )
        loss_s.backward()
        for o in opts:
            o.step()

        opt_ha.zero_grad()
        opt_ha2.zero_grad()
        opt_ha3.zero_grad()
        y_t, y_t_adv, y_t_adv2, y_t_adv3, f_t = model(x_t)
        up_full = torch.nn.Upsample(size=64, mode="bilinear")
        up_half = torch.nn.Upsample(size=32, mode="bilinear")
        target5 = 0.5 * up_full(y_t_adv3.detach()) + up_full(y_t_adv2.detach())
        target0 = up_half(y_t_adv3.detach())
        loss_gf = (
            0.3 * rd16(y_t, y_t_adv3, w_t, mode="max")
            + 1.0 * rd64(y_t, y_t_adv, target5, w_t, mode="max")
            + 0.3 * rd32(y_t, y_t_adv2, target0, w_t, mode="max")
        )
        loss_gf.backward()
        opt_ha.step()
        opt_ha2.step()
        opt_ha3.step()

        opt_f.zero_grad()
        y_t, y_t_adv, y_t_adv2, y_t_adv3, f_t = model(x_t)
        loss_gt = 0.3 * rd32(y_t, y_t_adv2, None, w_t, mode="min") + 1.0 * rd64(
            y_t, y_t_adv, None, w_t, mode="min"
        )
        loss_gt.backward()
        opt_f.step()

        model.gl_layer.step()
        for s in scheds:
            s.step()
    return model


@requires_reference
@pytest.mark.slow
def test_da_iteration_parity_with_reference_loop():
    add_reference_to_path()
    if not hasattr(np, "int"):
        np.int = int  # the reference PLGs use the removed numpy alias

    tmodel = _build_torch_side()
    state0 = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(0)
    n_iters = 2
    batches = []
    for _ in range(n_iters):
        x_s = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)
        x_t = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)
        label = np.clip(rng.standard_normal((1, 64, 64, K)), 0, None).astype(np.float32)
        w = np.ones((1, K, 1), np.float32)
        batches.append((x_s, x_t, label, w))

    torch_batches = [
        (
            torch.from_numpy(x_s.transpose(0, 3, 1, 2)),
            torch.from_numpy(label.transpose(0, 3, 1, 2)),
            torch.from_numpy(w),
            torch.from_numpy(x_t.transpose(0, 3, 1, 2)),
            torch.from_numpy(w),
        )
        for x_s, x_t, label, w in batches
    ]
    _reference_iteration(tmodel, torch_batches, n_iters)
    ref_state = tmodel.state_dict()

    # --- our side: same init via the importer, same batches -------------
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    model = models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=K)
    init_vars = model.init(
        jax.random.key(0), jnp.zeros((1, 256, 256, 3)), train=False, gl_coeff=0.0
    )
    variables = torch_import.import_torch_state_dict(
        {k: v.numpy() for k, v in state0.items()}, reference_variables=init_vars
    )
    state = create_da_state(model, jax.random.key(0), image_size=256, batch_size=1)
    state = state.replace(
        params=dict(variables["params"]), batch_stats=dict(variables["batch_stats"])
    )
    step_fn = jax.jit(make_da_train_step(model, compute_metrics=False))
    for x_s, x_t, label, w in batches:
        b_s = {
            "image": jnp.asarray(x_s),
            "target": jnp.asarray(label),
            "weight": jnp.asarray(w[..., 0]),
        }
        b_t = {
            "image": jnp.asarray(x_t),
            "target": jnp.asarray(label),
            "weight": jnp.asarray(w[..., 0]),
        }
        state, metrics = step_fn(state, b_s, b_t)

    ours = torch_import.export_torch_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    worst = 0.0
    for key, ref_val in ref_state.items():
        if key.endswith("num_batches_tracked"):
            continue
        got = ours[key]
        ref_np = ref_val.detach().numpy()
        denom = np.maximum(np.abs(ref_np), 1e-3)
        rel = np.max(np.abs(got - ref_np) / denom)
        worst = max(worst, float(rel))
        np.testing.assert_allclose(
            got, ref_np, rtol=5e-3, atol=5e-5, err_msg=f"param {key}"
        )
    assert worst < 5e-3
