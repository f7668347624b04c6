"""Numerical parity of model blocks + the .pth importer against torch.

The backbone blocks are checked against ``torch.nn.functional`` oracles; the
heads/upsampling are checked against the reference modules themselves
(imported read-only), with weights transported by the importer — which
therefore exercises the exact path the published checkpoints will take.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.utils import torch_import
from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _from_nhwc(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w = rng.standard_normal((16, 32, 4, 4)).astype(np.float32)  # torch (I,O,k,k)

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w),
        stride=2,
        padding=1,
    ).numpy()

    mod = models.ConvTranspose2dTorch(features=32, kernel_size=4, stride=2, padding=1)
    kernel = jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    out = mod.apply({"params": {"kernel": kernel}}, jnp.asarray(x))
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=1e-5)


def test_batch_norm_matches_torch_train_and_eval():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 6, 6, 8)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))

    bn = models.BatchNorm2d()
    variables = bn.init(jax.random.key(0), jnp.asarray(x), train=False)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": variables["batch_stats"],
    }

    # train mode: output + updated running stats
    tbn.train()
    ref = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out, updates = bn.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )

    # eval mode with the updated stats
    tbn.eval()
    ref_eval = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out_eval = bn.apply(
        {"params": variables["params"], "batch_stats": updates["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(_from_nhwc(out_eval), ref_eval, rtol=1e-4, atol=1e-5)


@requires_reference
def test_plain_head_parity_via_importer():
    add_reference_to_path()
    from uda.model.regda_7 import PoseResNetx9

    thead = PoseResNetx9._make_head(2, 32, 5)
    thead.eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 32)).astype(np.float32)
    ref = thead(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    state = {k: v.numpy() for k, v in thead.state_dict().items()}
    head = models.PlainHead(num_keypoints=5, channel_dim=32)
    init_vars = head.init(jax.random.key(0), jnp.asarray(x), train=False)
    variables = torch_import.import_torch_state_dict(
        state, reference_variables=init_vars
    )
    out = head.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("stride", [1, 2])
def test_fusion_head_parity_via_importer(stride):
    add_reference_to_path()
    import uda.model.regda_7 as regda_7

    tmod = regda_7.make_head(2, 256, 21) if stride == 1 else regda_7.make_head2(2, 256, 21)
    tmod.eval()
    # randomize BN running stats so eval isn't trivially identity
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(3)
    f = rng.standard_normal((2, 16, 16, 256)).astype(np.float32)
    hm_size = 16 if stride == 1 else 8
    hm = rng.standard_normal((2, hm_size, hm_size, 21)).astype(np.float32)

    ref = tmod(
        torch.from_numpy(f.transpose(0, 3, 1, 2)),
        torch.from_numpy(hm.transpose(0, 3, 1, 2)),
    ).detach().numpy()

    state = {k: v.numpy() for k, v in tmod.state_dict().items()}
    head = models.FusionHead(num_keypoints=21, feature_stride=stride)
    init_vars = head.init(
        jax.random.key(0), jnp.asarray(f), jnp.asarray(hm), train=False
    )
    variables = torch_import.import_torch_state_dict(
        state, reference_variables=init_vars
    )
    out = head.apply(variables, jnp.asarray(f), jnp.asarray(hm), train=False)
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=1e-4)


@requires_reference
def test_upsampling_parity_via_importer():
    add_reference_to_path()
    from uda.model.pose_resnet2 import Upsampling as TorchUpsampling

    tmod = TorchUpsampling(64, hidden_dims=(32, 32, 32))
    tmod.eval()
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
            if isinstance(m, torch.nn.ConvTranspose2d):
                m.weight.normal_(0, 0.1)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4, 4, 64)).astype(np.float32)
    ref = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    # the importer keys on "upsampling" in the path to apply the deconv flip
    state = {
        "upsampling." + k: v.numpy() for k, v in tmod.state_dict().items()
    }
    ours = models.Upsampling(hidden_dims=(32, 32, 32))
    init_vars = ours.init(jax.random.key(0), jnp.asarray(x), train=False)
    wrapped = {coll: {"upsampling": tree} for coll, tree in init_vars.items()}
    variables = torch_import.import_torch_state_dict(
        state, reference_variables=wrapped
    )
    variables = {coll: tree["upsampling"] for coll, tree in variables.items()}
    out = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=1e-4)


def test_export_round_trip():
    rng = np.random.default_rng(5)
    head = models.FusionHead(num_keypoints=7, feature_stride=2, channel_dim=16)
    f = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    hm = jnp.asarray(rng.standard_normal((1, 4, 4, 7)).astype(np.float32))
    variables = head.init(jax.random.key(0), f, hm, train=False)
    state = torch_import.export_torch_state_dict(variables)
    back = torch_import.import_torch_state_dict(state, reference_variables=variables)
    for coll in ("params", "batch_stats"):
        a = jax.tree.leaves(variables[coll])
        b = jax.tree.leaves(back[coll])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)
