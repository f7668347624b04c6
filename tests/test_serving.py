"""StableHLO export of the serving program (``dahpe_tpu/serving.py``)."""

import numpy as np

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.evaluate import make_predict_fn
from dahpe_tpu.models.resnet import Bottleneck
from dahpe_tpu.serving import export_predict, load_predict
import pytest


def _model_and_vars():
    model = models.MultiHeadPoseResNet(
        backbone=models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1]),
        num_keypoints=21,
    )
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False,
            gl_coeff=0.0,
        )
    )()
    return model, variables


def test_exported_predict_matches_live(tmp_path):
    model, variables = _model_and_vars()
    blob = export_predict(
        model, variables, batch_size=3, image_size=64, heatmap_size=16
    )
    assert isinstance(blob, bytes) and len(blob) > 0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 64, 64, 3)), jnp.float32)

    live = make_predict_fn(model, image_size=64, heatmap_size=16)
    coords_l, maxv_l = live(variables, x)
    restored = load_predict(blob)
    coords_r, maxv_r = restored(variables, x)
    np.testing.assert_array_equal(np.asarray(coords_l), np.asarray(coords_r))
    np.testing.assert_allclose(
        np.asarray(maxv_l), np.asarray(maxv_r), rtol=1e-6
    )


def test_export_cli_and_npz_weights(tmp_path):
    """The export CLI: orbax checkpoint → StableHLO + npz weights, then a
    'bare host' reload (artifact + npz only) matches the live model."""
    from dahpe_tpu.cli.export import build_export_parser, main as export_main
    from dahpe_tpu.serving import load_predict_file, load_variables_npz
    from dahpe_tpu.utils import checkpoint as ckpt

    model = models.MultiHeadPoseResNet(
        backbone=models.get_backbone("resnet18"), num_keypoints=21
    )
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False,
            gl_coeff=0.0,
        )
    )()
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt.save_state(ckpt_dir, variables)
    out = str(tmp_path / "model.stablehlo")
    export_main(build_export_parser().parse_args([
        ckpt_dir, "-o", out, "-a", "resnet18", "--image-size", "64",
        "--heatmap-size", "16", "--batch-size", "2",
    ]))

    restored = load_predict_file(out)
    weights = load_variables_npz(out + ".weights.npz")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    coords, maxv = restored(weights, x)
    live = make_predict_fn(model, image_size=64, heatmap_size=16)
    coords_l, _ = live(variables, x)
    np.testing.assert_array_equal(np.asarray(coords_l), np.asarray(coords))
    assert np.isfinite(np.asarray(maxv)).all()


def test_variables_npz_roundtrip(tmp_path):
    from dahpe_tpu.serving import load_variables_npz, save_variables_npz

    _, variables = _model_and_vars()
    path = str(tmp_path / "w.npz")
    save_variables_npz(path, variables)
    back = load_variables_npz(path)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(sorted(flat_a, key=str),
                                  sorted(flat_b, key=str)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_batch_polymorphic_export():
    model, variables = _model_and_vars()
    blob = export_predict(
        model, variables, batch_size=None, image_size=64, heatmap_size=16
    )
    restored = load_predict(blob)
    live = make_predict_fn(model, image_size=64, heatmap_size=16)
    rng = np.random.default_rng(1)
    for b in (1, 5):
        x = jnp.asarray(rng.standard_normal((b, 64, 64, 3)), jnp.float32)
        coords_r, _ = restored(variables, x)
        coords_l, _ = live(variables, x)
        assert coords_r.shape == (b, 21, 2)
        np.testing.assert_array_equal(
            np.asarray(coords_l), np.asarray(coords_r)
        )


def test_int8_batch_polymorphic_export():
    """Int8 artifact exported batch-polymorphic: one serialized program
    serves any batch size, matching the live int8 forward exactly."""
    from dahpe_tpu import quant
    from dahpe_tpu.serving import export_predict_int8

    model, variables = _model_and_vars()
    rng = np.random.default_rng(11)
    calib = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    qtree = quant.quantize_model(model, variables, calib)
    blob = export_predict_int8(
        qtree, batch_size=None, image_size=64, heatmap_size=16
    )
    restored = load_predict(blob)
    live = quant.make_int8_predict_fn(image_size=64, heatmap_size=16)
    for b in (1, 5):
        x = jnp.asarray(rng.standard_normal((b, 64, 64, 3)), jnp.float32)
        coords_r, _ = restored(qtree, x)
        coords_l, _ = live(qtree, x)
        assert coords_r.shape == (b, 21, 2)
        np.testing.assert_array_equal(
            np.asarray(coords_l), np.asarray(coords_r)
        )


def test_int8_export_roundtrip(tmp_path):
    """Quantized artifact (``export_predict_int8`` + ``save_quantized_npz``):
    a bare-host reload — StableHLO bytes + int8 npz, no model code — is
    bit-identical to the live ``make_int8_predict_fn`` on the same tree."""
    from dahpe_tpu import quant
    from dahpe_tpu.serving import (
        export_predict_int8, load_quantized_npz, save_quantized_npz,
    )

    model, variables = _model_and_vars()
    rng = np.random.default_rng(7)
    calib = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    qtree = quant.quantize_model(model, variables, calib)

    blob = export_predict_int8(
        qtree, batch_size=2, image_size=64, heatmap_size=16
    )
    npz = str(tmp_path / "q.npz")
    save_quantized_npz(npz, qtree)
    qback = load_quantized_npz(npz)

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    restored = load_predict(blob)
    coords_r, maxv_r = restored(qback, x)
    live = quant.make_int8_predict_fn(image_size=64, heatmap_size=16)
    coords_l, maxv_l = live(qtree, x)
    np.testing.assert_array_equal(np.asarray(coords_l), np.asarray(coords_r))
    np.testing.assert_allclose(
        np.asarray(maxv_l), np.asarray(maxv_r), rtol=1e-6
    )


@pytest.mark.slow
def test_int8_export_cli(tmp_path):
    """Export CLI with --int8: orbax checkpoint → int8 StableHLO + int8 npz,
    reloaded bare-host; int8 weight file is ~4x smaller than the float one."""
    import os

    from dahpe_tpu.cli.export import build_export_parser, main as export_main
    from dahpe_tpu.serving import load_predict_file, load_quantized_npz
    from dahpe_tpu.utils import checkpoint as ckpt

    model = models.MultiHeadPoseResNet(
        backbone=models.get_backbone("resnet18"), num_keypoints=21
    )
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False,
            gl_coeff=0.0,
        )
    )()
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt.save_state(ckpt_dir, variables)
    out_f = str(tmp_path / "model.stablehlo")
    export_main(build_export_parser().parse_args([
        ckpt_dir, "-o", out_f, "-a", "resnet18", "--image-size", "64",
        "--heatmap-size", "16", "--batch-size", "2",
    ]))
    out_q = str(tmp_path / "model_int8.stablehlo")
    export_main(build_export_parser().parse_args([
        ckpt_dir, "-o", out_q, "-a", "resnet18", "--image-size", "64",
        "--heatmap-size", "16", "--batch-size", "2", "--int8",
    ]))

    restored = load_predict_file(out_q)
    qtree = load_quantized_npz(out_q + ".weights.npz")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    coords, maxv = restored(qtree, x)
    assert coords.shape == (2, 21, 2)
    assert np.isfinite(np.asarray(coords)).all()
    assert np.isfinite(np.asarray(maxv)).all()
    size_f = os.path.getsize(out_f + ".weights.npz")
    size_q = os.path.getsize(out_q + ".weights.npz")
    assert size_q < 0.4 * size_f


def test_uint8_ingestion_export_matches_normalized():
    """The uint8-ingestion artifact (VERDICT r2 item 8): raw uint8 HWC in,
    on-device ImageNet normalize compiled into the graph — same decode as
    feeding the normalized float path by hand."""
    from dahpe_tpu.data.device_aug import IMAGENET_MEAN, IMAGENET_STD

    model, variables = _model_and_vars()
    blob = export_predict(
        model, variables, batch_size=2, image_size=64, heatmap_size=16,
        uint8_input=True,
    )
    restored = load_predict(blob)

    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    coords_u, maxv_u = restored(variables, jnp.asarray(raw))

    norm = (raw.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) \
        / np.asarray(IMAGENET_STD)
    live = make_predict_fn(model, image_size=64, heatmap_size=16)
    coords_f, maxv_f = live(variables, jnp.asarray(norm))
    np.testing.assert_array_equal(np.asarray(coords_u), np.asarray(coords_f))
    np.testing.assert_allclose(
        np.asarray(maxv_u), np.asarray(maxv_f), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_mesh_predict_data_parallel():
    """Data-parallel serving over the 8-device mesh: the artifact inlined
    into a GSPMD-partitioned program, batch sharded, weights replicated —
    bit-identical to single-device execution (float AND int8 artifacts)."""
    from dahpe_tpu import quant
    from dahpe_tpu.parallel.mesh import create_mesh
    from dahpe_tpu.serving import export_predict_int8, make_mesh_predict

    model, variables = _model_and_vars()
    mesh = create_mesh()
    n = len(jax.devices())
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2 * n, 64, 64, 3)), jnp.float32)

    blob = export_predict(
        model, variables, batch_size=2 * n, image_size=64, heatmap_size=16
    )
    restored = load_predict(blob)
    coords_1, maxv_1 = restored(variables, x)
    mesh_predict = make_mesh_predict(restored, mesh)
    coords_m, maxv_m = mesh_predict(variables, x)
    assert len(coords_m.sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(coords_1), np.asarray(coords_m))
    # partitioned fusion may differ in the last ULP of the heatmap values
    np.testing.assert_allclose(
        np.asarray(maxv_1), np.asarray(maxv_m), rtol=1e-5
    )

    calib = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    qtree = quant.quantize_model(model, variables, calib)
    qblob = export_predict_int8(
        qtree, batch_size=2 * n, image_size=64, heatmap_size=16
    )
    qrestored = load_predict(qblob)
    qcoords_1, _ = qrestored(qtree, x)
    qmesh_predict = make_mesh_predict(qrestored, mesh)
    qcoords_m, _ = qmesh_predict(qtree, x)
    np.testing.assert_array_equal(
        np.asarray(qcoords_1), np.asarray(qcoords_m)
    )
