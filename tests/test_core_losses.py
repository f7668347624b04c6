"""Golden tests: KL/MSE losses vs the reference torch implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from dahpe_tpu.core import losses
from dahpe_tpu.core.layout import from_bkhw
from tests.conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _data(rng, b=4, k=21, h=64, w=64):
    out = rng.standard_normal((b, k, h, w)).astype(np.float32)
    tgt = np.clip(rng.standard_normal((b, k, h, w)), 0, None).astype(np.float32)
    wgt = (rng.uniform(size=(b, k, 1)) > 0.3).astype(np.float32)
    return out, tgt, wgt


@requires_reference
@pytest.mark.parametrize("epsilon", [0.0, 1e-7])
def test_joints_kl_loss_matches_reference(epsilon):
    add_reference_to_path()
    import torch
    from uda.model.loss import JointsKLLoss

    rng = np.random.default_rng(0)
    out, tgt, wgt = _data(rng)
    if epsilon == 0.0:
        # keep targets strictly positive somewhere per joint to avoid 0/0
        tgt += 1e-3
    ref = JointsKLLoss(epsilon=epsilon)(
        torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(wgt)
    ).item()
    ours = losses.joints_kl_loss(
        from_bkhw(jnp.asarray(out)),
        from_bkhw(jnp.asarray(tgt)),
        jnp.asarray(wgt[..., 0]),
        epsilon=epsilon,
    )
    assert float(ours) == pytest.approx(ref, rel=1e-5)


@requires_reference
def test_joints_mse_loss_matches_reference():
    add_reference_to_path()
    import torch
    from uda.model.loss import JointsMSELoss

    rng = np.random.default_rng(1)
    out, tgt, wgt = _data(rng)
    ref = JointsMSELoss()(
        torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(wgt)
    ).item()
    ours = losses.joints_mse_loss(
        from_bkhw(jnp.asarray(out)),
        from_bkhw(jnp.asarray(tgt)),
        jnp.asarray(wgt[..., 0]),
    )
    assert float(ours) == pytest.approx(ref, rel=1e-5)


def test_kl_loss_zero_when_pred_equals_target_distribution():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    p = jnp.asarray(np.exp(logits) / np.exp(logits).reshape(2, 3, -1).sum(-1)[..., None, None])
    val = losses.joints_kl_loss(from_bkhw(jnp.asarray(logits)), from_bkhw(p))
    assert float(val) == pytest.approx(0.0, abs=1e-5)
