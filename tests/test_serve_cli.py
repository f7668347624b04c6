"""HTTP serving CLI (`dahpe_tpu/cli/serve.py`): a real server on an
ephemeral port, driven over HTTP with stdlib clients only — the deployment
contract (docs/SERVING.md)."""

import io
import json
import threading
from http.client import HTTPConnection

import numpy as np

import jax
import jax.numpy as jnp

from dahpe_tpu import models


def _export_artifact(tmp_path, batch):
    from dahpe_tpu.cli.export import build_export_parser, main as export_main
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
        "--heatmap-size", "16", "--batch-size", str(batch),
    ]))
    return out


def _post_npy(conn, path, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn.request("POST", path, body=buf.getvalue())
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_serve_cli_http(tmp_path):
    from dahpe_tpu.cli.serve import build_serve_parser, create_server
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    artifact = _export_artifact(tmp_path, batch=8)
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0"]
    ))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        conn = HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = json.loads(resp.read())
        assert resp.status == 200
        assert health["batch"] == 8
        assert health["frame_shape"] == [64, 64, 3]

        # a partial batch (3 < 8): server pads to the compiled batch and
        # truncates the response; values must equal a direct artifact call
        rng = np.random.default_rng(0)
        frames = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
        status, out = _post_npy(conn, "/predict", frames)
        assert status == 200
        coords = np.asarray(out["coords"])
        assert coords.shape == (3, 21, 2)
        assert np.asarray(out["maxvals"]).shape == (3, 21)

        predict = load_predict_file(artifact)
        weights = load_artifact_weights(artifact + ".weights.npz")
        padded = np.concatenate(
            [frames, np.zeros((5, 64, 64, 3), np.float32)]
        )
        coords_direct, _ = predict(weights, padded)
        np.testing.assert_array_equal(
            coords, np.asarray(coords_direct)[:3]
        )

        # oversize request → 413 with the polymorphic-export hint
        status, out = _post_npy(
            conn, "/predict",
            np.zeros((9, 64, 64, 3), np.float32),
        )
        assert status == 413 and "polymorphic" in out["error"]

        # malformed request → 400, server stays up
        status, out = _post_npy(
            conn, "/predict", np.zeros((2, 32, 32, 3), np.float32)
        )
        assert status == 400
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        server.shutdown()
        server.server_close()


def test_serve_cli_mesh(tmp_path):
    """--mesh: the server shards each compiled batch over all 8 virtual
    devices; responses match the single-device artifact."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    artifact = _export_artifact(tmp_path, batch=8)
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0", "--mesh", "--no-warmup"]
    ))
    try:
        rng = np.random.default_rng(1)
        frames = rng.standard_normal((8, 64, 64, 3)).astype(np.float32)
        out = server.servable.run(frames)
        predict = load_predict_file(artifact)
        weights = load_artifact_weights(artifact + ".weights.npz")
        coords_direct, _ = predict(weights, frames)
        np.testing.assert_array_equal(
            np.asarray(out["coords"]), np.asarray(coords_direct)
        )
    finally:
        server.server_close()
