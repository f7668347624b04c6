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
import pytest


def _export_artifact(tmp_path, batch, *extra_flags):
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
    batch_flags = [] if batch is None else ["--batch-size", str(batch)]
    export_main(build_export_parser().parse_args([
        ckpt_dir, "-o", out, "-a", "resnet18", "--image-size", "64",
        "--heatmap-size", "16", *batch_flags, *extra_flags,
    ]))
    return out


def _post_npy(conn, path, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn.request("POST", path, body=buf.getvalue())
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


@pytest.mark.slow
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

        # the typed client speaks the same protocol (dahpe_tpu.client)
        from dahpe_tpu.client import PoseClient, ServeError

        with PoseClient("127.0.0.1", port) as client:
            assert client.health()["batch"] == 8
            c2, m2 = client.predict(frames)
            np.testing.assert_array_equal(c2, coords.astype(np.float32))
            assert m2.shape == (3, 21)
            try:
                client.predict(np.zeros((9, 64, 64, 3), np.float32))
                raise AssertionError("oversize must raise")
            except ServeError as e:
                assert e.status == 413
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_uint8_polymorphic(tmp_path):
    """A batch-polymorphic uint8-ingest artifact: the server skips warmup
    (no fixed batch), accepts ANY request batch (padded to a power-of-two
    bucket server-side), enforces the uint8 dtype contract, and matches a
    direct artifact call."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    artifact = _export_artifact(tmp_path, None, "--uint8-input")
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
        assert health["batch"] is None  # polymorphic
        assert health["dtype"] == "uint8"

        rng = np.random.default_rng(2)
        for n in (2, 5):  # two sizes — no fixed compiled batch, no 413
            frames = rng.integers(0, 256, (n, 64, 64, 3), dtype=np.uint8)
            status, out = _post_npy(conn, "/predict", frames)
            assert status == 200
            assert np.asarray(out["coords"]).shape == (n, 21, 2)
            if n == 5:
                predict = load_predict_file(artifact)
                weights = load_artifact_weights(
                    artifact + ".weights.npz"
                )
                coords_direct, _ = predict(weights, frames)
                np.testing.assert_array_equal(
                    np.asarray(out["coords"]), np.asarray(coords_direct)
                )

        # float frames against a uint8 artifact → 400 dtype rejection
        status, out = _post_npy(
            conn, "/predict", np.zeros((2, 64, 64, 3), np.float32)
        )
        assert status == 400 and "uint8" in out["error"]
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_dynamic_batching(tmp_path):
    """--batch-window: 4 concurrent batch-2 requests against a batch-8
    artifact coalesce into ONE device dispatch (the batcher fills the
    compiled batch), every client gets its own rows back, and /healthz
    exposes the coalescing ratio."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    artifact = _export_artifact(tmp_path, batch=8)
    # 30 s window: dispatch triggers on FILL (4 x 2 rows = compiled batch);
    # the window only bounds the wait if a client dies mid-test
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0", "--batch-window", "30000"]
    ))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        rng = np.random.default_rng(3)
        payloads = [
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
            for _ in range(4)
        ]
        results = [None] * 4

        def client(i):
            conn = HTTPConnection("127.0.0.1", port, timeout=120)
            results[i] = _post_npy(conn, "/predict", payloads[i])

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        predict = load_predict_file(artifact)
        weights = load_artifact_weights(artifact + ".weights.npz")
        for i in range(4):
            status, out = results[i]
            assert status == 200
            # row results are batch-composition-independent: a request's
            # coords match a solo padded call regardless of which other
            # requests shared its dispatch
            solo = np.concatenate(
                [payloads[i], np.zeros((6, 64, 64, 3), np.float32)]
            )
            coords_direct, _ = predict(weights, solo)
            np.testing.assert_array_equal(
                np.asarray(out["coords"]), np.asarray(coords_direct)[:2]
            )

        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["requests"] == 4
        assert health["batches"] == 1  # all four coalesced into one dispatch
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_int8_artifact(tmp_path):
    """The int8 deployment artifact serves over HTTP unchanged: the weight
    loader recognizes the quantized npz, the endpoint's contract comes from
    the artifact's avals, and responses match a direct artifact call."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    artifact = _export_artifact(tmp_path, 4, "--int8")
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0"]
    ))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["batch"] == 4

        rng = np.random.default_rng(5)
        frames = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
        status, out = _post_npy(conn, "/predict", frames)
        assert status == 200
        predict = load_predict_file(artifact)
        weights = load_artifact_weights(artifact + ".weights.npz")
        coords_direct, _ = predict(weights, frames)
        np.testing.assert_array_equal(
            np.asarray(out["coords"]), np.asarray(coords_direct)
        )
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_batching_oversize_polymorphic(tmp_path):
    """A batch-polymorphic artifact under --batch-window: a request LARGER
    than the coalescing cap (--max-batch) must dispatch solo — the cap is
    a coalescing target, not a request limit (regression: the collector
    used to starve it, hanging the client)."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    artifact = _export_artifact(tmp_path, None)  # polymorphic, float32
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0", "--batch-window", "50", "--max-batch", "4"]
    ))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        rng = np.random.default_rng(4)
        frames = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)
        status, out = _post_npy(conn, "/predict", frames)  # 6 > cap 4
        assert status == 200
        predict = load_predict_file(artifact)
        weights = load_artifact_weights(artifact + ".weights.npz")
        coords_direct, _ = predict(weights, frames)
        np.testing.assert_array_equal(
            np.asarray(out["coords"]), np.asarray(coords_direct)
        )
        # a small follow-up request still coalesces/serves normally
        status, out = _post_npy(conn, "/predict", frames[:2])
        assert status == 200
        assert np.asarray(out["coords"]).shape == (2, 21, 2)
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_pow2_bucketing(tmp_path):
    """Batch-polymorphic artifacts dispatch on power-of-two padded batches:
    arbitrary request sizes would otherwise compile one program per
    observed size; bucketing bounds the compile set to log2(max) programs.
    Padding must never change the live rows (per-sample independence)."""
    from dahpe_tpu.cli.serve import (
        _pow2_bucket, build_serve_parser, create_server,
    )
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    assert [_pow2_bucket(n) for n in (1, 2, 3, 5, 8, 9)] == \
        [1, 2, 4, 8, 8, 16]

    artifact = _export_artifact(tmp_path, None)  # polymorphic, float32
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0"]
    ))
    try:
        servable = server.servable
        dispatched = []
        orig_predict = servable.predict

        def recording(w, f):
            dispatched.append(f.shape[0])
            return orig_predict(w, f)

        servable.predict = recording
        rng = np.random.default_rng(7)
        frames = rng.standard_normal((5, 64, 64, 3)).astype(np.float32)
        out = servable.run(frames)
        assert dispatched == [8]  # 5 → pow2 bucket 8
        coords = np.asarray(out["coords"])
        assert coords.shape == (5, 21, 2)
        # live rows equal the unpadded direct call — padding is invisible
        predict = load_predict_file(artifact)
        weights = load_artifact_weights(artifact + ".weights.npz")
        coords_direct, _ = predict(weights, frames)
        np.testing.assert_array_equal(coords, np.asarray(coords_direct))
        # an exact-bucket batch dispatches unpadded
        servable.run(frames[:4])
        assert dispatched == [8, 4]
    finally:
        server.server_close()


def test_pad_target_respects_mesh_divisibility():
    """Polymorphic padding must round up to a multiple of the mesh's device
    count: P('data') cannot shard 2 rows over 8 devices, so without the
    round-up every small request to a --mesh server would 500."""
    from dahpe_tpu.cli.serve import _pad_target

    assert _pad_target(5, 8, 1) == 8        # fixed batch always wins
    assert _pad_target(3, None, 1) == 4     # plain pow2 bucket
    assert _pad_target(1, None, 8) == 8     # meshed: at least one row/device
    assert _pad_target(2, None, 8) == 8
    assert _pad_target(9, None, 8) == 16    # pow2 >= devices already divides
    assert _pad_target(5, None, 6) == 12    # non-pow2 device counts too


@pytest.mark.slow
def test_serve_cli_mesh_small_polymorphic_request(tmp_path):
    """A --mesh server with a batch-polymorphic artifact must serve requests
    smaller than the device count (padding rounds up to the mesh size);
    results equal the unmeshed direct call on the live rows."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server
    from dahpe_tpu.serving import load_artifact_weights, load_predict_file

    artifact = _export_artifact(tmp_path, None)  # polymorphic, float32
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0", "--mesh"]
    ))
    try:
        servable = server.servable
        assert servable.n_devices == len(jax.devices())
        rng = np.random.default_rng(3)
        frames = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        out = servable.run(frames)  # 2 rows over 8 devices: pad to 8
        coords = np.asarray(out["coords"])
        assert coords.shape == (2, 21, 2)
        predict = load_predict_file(artifact)
        weights = load_artifact_weights(artifact + ".weights.npz")
        coords_direct, _ = predict(weights, frames)
        np.testing.assert_array_equal(coords, np.asarray(coords_direct))
    finally:
        server.server_close()


@pytest.mark.slow
def test_serve_cli_dispatch_error_is_500(tmp_path):
    """A device-dispatch failure on a WELL-FORMED request answers 500, not
    400 — client retry logic keys on 4xx-vs-5xx, and a valid request must
    never be blamed for a server fault. The server stays up and recovers
    once the device does."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server

    artifact = _export_artifact(tmp_path, batch=4)
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0"]
    ))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        frames = np.zeros((2, 64, 64, 3), np.float32)

        orig_predict = server.servable.predict

        def failing(w, f):
            raise RuntimeError("RESOURCE_EXHAUSTED: simulated device OOM")

        server.servable.predict = failing
        status, out = _post_npy(conn, "/predict", frames)
        assert status == 500
        assert "RESOURCE_EXHAUSTED" in out["error"]

        # malformed request during the same fault is still the client's 400
        status, _ = _post_npy(
            conn, "/predict", np.zeros((2, 32, 32, 3), np.float32)
        )
        assert status == 400

        server.servable.predict = orig_predict
        status, out = _post_npy(conn, "/predict", frames)
        assert status == 200  # recovered without restart
        assert np.asarray(out["coords"]).shape == (2, 21, 2)
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_dispatch_error_500_batched(tmp_path):
    """The same 5xx contract through the dynamic-batching path: the
    collector thread's dispatch failure propagates to every coalesced
    handler as a 500."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server

    artifact = _export_artifact(tmp_path, batch=4)
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0", "--batch-window", "20"]
    ))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]

        def failing(w, f):
            raise RuntimeError("simulated mid-batch device failure")

        server.servable.predict = failing
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        status, out = _post_npy(
            conn, "/predict", np.zeros((2, 64, 64, 3), np.float32)
        )
        assert status == 500
        assert "device failure" in out["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_client_non_json_error_bodies():
    """PoseClient must surface replies produced OUTSIDE the endpoint's JSON
    path (stdlib send_error HTML, a proxy's error page, a truncated body)
    as the documented ServeError — never a raw JSONDecodeError."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from dahpe_tpu.client import PoseClient, ServeError

    class OddHandler(BaseHTTPRequestHandler):
        def do_GET(self):
            # 200 with a non-JSON body (e.g. a misconfigured proxy)
            body = b"<html>totally not json</html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self.send_error(503, "upstream unavailable")  # HTML error page

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), OddHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        with PoseClient("127.0.0.1", port) as client:
            try:
                client.health()  # GET → 200 non-JSON
                raise AssertionError("non-JSON 200 must raise ServeError")
            except ServeError as e:
                assert e.status == 200 and "non-JSON" in str(e)
            try:
                client.predict(np.zeros((1, 8, 8, 3), np.float32))
                raise AssertionError("HTML 503 must raise ServeError")
            except ServeError as e:
                assert e.status == 503
                # the raw (truncated) HTML body is the message — readable,
                # not a JSONDecodeError traceback
                assert "Error response" in str(e)
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_close_drains_handlers(tmp_path):
    """server_close joins in-flight handler threads (non-daemon): a request
    accepted before shutdown completes instead of being killed mid-device-
    dispatch (which would wedge the chip)."""
    from dahpe_tpu.cli.serve import build_serve_parser, create_server

    artifact = _export_artifact(tmp_path, batch=4)
    server = create_server(build_serve_parser().parse_args(
        [artifact, "--port", "0"]
    ))
    assert server.daemon_threads is False  # stdlib joins only non-daemon
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]

    entered = threading.Event()
    release = threading.Event()
    orig_predict = server.servable.predict

    def slow(w, f):
        entered.set()
        release.wait(timeout=60)
        return orig_predict(w, f)

    server.servable.predict = slow
    result = {}

    def client():
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        result["reply"] = _post_npy(
            conn, "/predict", np.zeros((2, 64, 64, 3), np.float32)
        )

    c = threading.Thread(target=client)
    c.start()
    assert entered.wait(timeout=60)
    server.shutdown()          # stop accepting; in-flight request lives on

    closer = threading.Thread(target=server.server_close)
    closer.start()
    closer.join(timeout=1.0)
    assert closer.is_alive()   # close BLOCKS on the in-flight handler

    release.set()
    closer.join(timeout=60)
    assert not closer.is_alive()
    c.join(timeout=60)
    status, out = result["reply"]
    assert status == 200       # the drained request completed normally
    assert np.asarray(out["coords"]).shape == (2, 21, 2)


@pytest.mark.slow
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
