"""HTTP serving CLI — a production endpoint around an exported artifact.

``python -m dahpe_tpu.cli.serve model.stablehlo --port 8000`` loads an
exported artifact (``cli.export``; float or ``--int8``) with its sibling
``.weights.npz`` and serves keypoint predictions over HTTP. The reference
has no serving runtime at all (deployment = re-run ``test.py``); this is
the last mile of the TPU-native deployment story (docs/SERVING.md):
export → acceptance eval (``cli.test --artifact``) → serve.

Protocol (stdlib-only on both ends):

- ``GET /healthz`` → JSON: artifact geometry (batch/image size/dtype) and
  device inventory.
- ``POST /predict`` with an ``.npy`` body (``numpy.save`` of a
  ``(B, H, W, 3)`` frame array matching the artifact's input dtype —
  uint8 for ``--uint8-input`` artifacts, float32 otherwise) →
  JSON ``{"coords": (B, K, 2) image px, "maxvals": (B, K)}``.

Fixed-batch artifacts accept any request ``B ≤ batch``: the server pads to
the compiled batch and truncates the response (one compile, stable
latency — the same fixed-shape discipline as the eval loop). Requests
above the compiled batch are rejected with 413; export batch-polymorphic
for unbounded request sizes. ``--mesh`` shards each batch over every
local device (``serving.make_mesh_predict``) for N× throughput on a pod
host.

The jax call itself is serialized under a lock: one TPU program runs at a
time (concurrency belongs in the batch dimension, not in racing
dispatches); the ThreadingHTTPServer still overlaps request parsing and
response IO with device execution.

``--batch-window MS`` turns on dynamic batching: concurrent requests are
coalesced into ONE device batch — a batcher thread collects requests
until the compiled batch is full or MS milliseconds have passed since the
first queued request, runs one predict, and scatters the rows back to the
waiting handlers. Under concurrent load this converts the padding waste
of fixed-batch serving into useful work (N clients share one dispatch);
an idle server adds at most the window to a lone request's latency.
``/healthz`` reports ``requests``/``batches`` so the coalescing ratio is
observable in production.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax


class DispatchError(RuntimeError):
    """A server-side device-dispatch failure (TPU error, mesh divisibility,
    OOM). Distinct from request-contract violations so the handler can
    answer 500 — a client with a well-formed request must not be told 400
    during a server fault (retry logic keys on 4xx-vs-5xx)."""


def _pow2_bucket(n: int) -> int:
    """Smallest power of two >= n. Polymorphic artifacts re-compile per
    concrete batch shape; padding dispatches to pow2 buckets bounds the
    compile set to log2(max) programs instead of one per observed size."""
    return 1 << max(0, (n - 1).bit_length())


def _pad_target(n: int, compiled_batch: int | None, n_devices: int = 1) -> int:
    """Rows to pad an ``n``-row request to before dispatch. Fixed-batch
    artifacts pad to their compiled batch; batch-polymorphic ones to the
    next power-of-two bucket, rounded up to a multiple of the mesh's device
    count — ``P('data')`` sharding cannot split e.g. 2 rows over 8 devices,
    so without the round-up every small request to a ``--mesh`` server
    would fail with 500 (the bucket set stays bounded: at most one extra
    program below ``n_devices``)."""
    if compiled_batch is not None:
        return compiled_batch
    target = _pow2_bucket(n)
    return -(-target // n_devices) * n_devices


def build_serve_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="serve an exported artifact over HTTP"
    )
    p.add_argument("artifact", help="StableHLO file from cli.export "
                                    "(sibling .weights.npz required)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000,
                   help="0 picks an ephemeral port (printed on startup)")
    p.add_argument("--mesh", action="store_true",
                   help="shard request batches over ALL local devices "
                        "(weights replicated, batch split — N devices = "
                        "N x throughput); request batches must divide by "
                        "the device count")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the startup compile (first request pays it)")
    p.add_argument("--batch-window", type=float, default=0.0, metavar="MS",
                   help="dynamic batching: coalesce concurrent requests "
                        "into one device batch, dispatching when the "
                        "compiled batch fills or MS milliseconds after the "
                        "first queued request (0 = off)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="coalescing cap for batch-POLYMORPHIC artifacts "
                        "under --batch-window (fixed-batch artifacts cap "
                        "at their compiled batch)")
    return p


class _Servable:
    """The loaded artifact + its request contract, shared by all handler
    threads."""

    def __init__(self, artifact_path: str, *, mesh: bool = False,
                 warmup: bool = True):
        from jax import export as jax_export

        from dahpe_tpu.serving import load_artifact_weights

        with open(artifact_path, "rb") as f:
            exported = jax_export.deserialize(f.read())
        self.weights = load_artifact_weights(artifact_path + ".weights.npz")
        self.predict = exported.call
        self.n_devices = 1
        if mesh:
            from dahpe_tpu.parallel.mesh import create_mesh
            from dahpe_tpu.serving import make_mesh_predict

            self.predict = make_mesh_predict(exported.call, create_mesh())
            self.n_devices = len(jax.devices())

        aval = exported.in_avals[-1]  # the frame input (weights lead)
        b = aval.shape[0]
        self.batch = b if isinstance(b, int) else None  # None: polymorphic
        self.frame_shape = tuple(aval.shape[1:])  # (H, W, 3)
        self.dtype = np.dtype(aval.dtype)
        self._lock = threading.Lock()
        self._count_lock = threading.Lock()
        self.requests = 0   # /predict calls answered 200
        self.batches = 0    # device dispatches — ≤ requests under batching
        if warmup and self.batch is not None:
            x = np.zeros((self.batch,) + self.frame_shape, self.dtype)
            jax.block_until_ready(self.predict(self.weights, x))

    def info(self) -> dict:
        return {
            "status": "ok",
            "batch": self.batch,  # null = batch-polymorphic
            "frame_shape": list(self.frame_shape),
            "dtype": str(self.dtype),
            "devices": [str(d) for d in jax.devices()],
            "requests": self.requests,
            "batches": self.batches,
        }

    def validate(self, frames: np.ndarray) -> None:
        """Request-contract errors raised OUTSIDE the device path, so the
        batcher never sees a malformed row."""
        if frames.ndim != 4 or frames.shape[1:] != self.frame_shape:
            raise ValueError(
                f"expected (B, {', '.join(map(str, self.frame_shape))}) "
                f"frames, got {frames.shape}"
            )
        if frames.dtype != self.dtype:
            raise ValueError(
                f"expected dtype {self.dtype}, got {frames.dtype}"
            )
        if self.batch is not None and frames.shape[0] > self.batch:
            raise OverflowError(
                f"request batch {frames.shape[0]} > compiled batch "
                f"{self.batch} (export batch-polymorphic for unbounded "
                "requests)"
            )

    def run_arrays(self, frames: np.ndarray):
        """One device dispatch: pad to the compiled batch (fixed-batch
        artifacts) or the next power-of-two bucket (batch-polymorphic ones,
        bounding recompiles under varying request/coalesced sizes — rows
        are per-sample independent, so padding never changes live rows),
        predict, return the live rows as numpy ``(coords (n,K,2),
        maxvals (n,K))``."""
        n = frames.shape[0]
        target = _pad_target(n, self.batch, self.n_devices)
        if n < target:
            frames = np.concatenate(
                [frames, np.zeros((target - n,) + self.frame_shape,
                                  self.dtype)]
            )
        with self._lock:
            try:
                coords, maxvals = self.predict(self.weights, frames)
            except Exception as e:
                raise DispatchError(f"{type(e).__name__}: {e}") from e
            self.batches += 1
        return np.asarray(coords)[:n], np.asarray(maxvals)[:n, :, 0]

    def count_request(self) -> None:
        with self._count_lock:
            self.requests += 1

    def run(self, frames: np.ndarray) -> dict:
        self.validate(frames)
        coords, maxvals = self.run_arrays(frames)
        self.count_request()
        return {"coords": coords.tolist(), "maxvals": maxvals.tolist()}


class _Batcher:
    """Dynamic batching: handler threads `submit` their frames and block;
    one collector thread dispatches a coalesced batch when `cap` rows are
    queued or `window` seconds have passed since the first queued request,
    then scatters the result rows back. Requests never split across
    dispatches (each already fits the cap — `validate` enforced ≤ compiled
    batch, and polymorphic caps come from --max-batch)."""

    def __init__(self, servable: _Servable, window_s: float,
                 max_batch: int = 64):
        self.servable = servable
        self.window = window_s
        self.cap = servable.batch if servable.batch is not None else max_batch
        self._queue: list[dict] = []
        self._cv = threading.Condition()
        threading.Thread(target=self._collect, daemon=True).start()

    def submit(self, frames: np.ndarray) -> dict:
        item = {"frames": frames, "done": threading.Event(),
                "t": time.monotonic()}
        with self._cv:
            self._queue.append(item)
            self._cv.notify_all()
        item["done"].wait()
        if "error" in item:
            raise item["error"]
        self.servable.count_request()
        return {
            "coords": item["coords"].tolist(),
            "maxvals": item["maxvals"].tolist(),
        }

    def _queued_rows(self) -> int:
        return sum(i["frames"].shape[0] for i in self._queue)

    def _collect(self) -> None:
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                # the window runs from the HEAD request's enqueue time, so a
                # request never waits more than ~window even when it arrived
                # mid-dispatch
                deadline = self._queue[0]["t"] + self.window
                while self._queued_rows() < self.cap:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(remaining)
                # always take at least the head: a batch-polymorphic
                # artifact runs ANY batch, so a request larger than the
                # coalescing cap dispatches solo instead of starving
                # (fixed-batch oversize was already 413'd by `validate`)
                take, rows = [], 0
                while self._queue and (
                    not take
                    or rows + self._queue[0]["frames"].shape[0] <= self.cap
                ):
                    item = self._queue.pop(0)
                    take.append(item)
                    rows += item["frames"].shape[0]
            try:
                coords, maxvals = self.servable.run_arrays(
                    np.concatenate([i["frames"] for i in take])
                )
                off = 0
                for item in take:
                    n = item["frames"].shape[0]
                    item["coords"] = coords[off:off + n]
                    item["maxvals"] = maxvals[off:off + n]
                    off += n
            except Exception as e:  # pragma: no cover - device failure
                err = (e if isinstance(e, DispatchError)
                       else DispatchError(f"{type(e).__name__}: {e}"))
                for item in take:
                    item["error"] = err
            finally:
                for item in take:
                    item["done"].set()


def _make_handler(servable: _Servable, batcher: _Batcher | None = None):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, servable.info())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                frames = np.load(io.BytesIO(self.rfile.read(n)),
                                 allow_pickle=False)
                if batcher is not None:
                    servable.validate(frames)
                    out = batcher.submit(frames)
                else:
                    out = servable.run(frames)
                self._reply(200, out)
            except OverflowError as e:
                self._reply(413, {"error": str(e)})
            except DispatchError as e:  # server fault, NOT the client's
                self._reply(500, {"error": str(e)})
            except Exception as e:  # malformed body/shape/dtype
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # route access logs to stdout
            print(f"{self.address_string()} {fmt % args}")

        # a stalled client read must not pin a (joined-on-close) handler
        # thread forever; the socket errors out and the thread exits
        timeout = 120

    return Handler


class _DrainingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer whose ``server_close`` actually drains: handler
    threads are non-daemon, so close joins every in-flight request before
    the process exits (stdlib skips daemon threads in ``_Threads``) —
    killing a handler mid-TPU-dispatch would wedge the chip."""

    daemon_threads = False  # block_on_close (default True) then joins


def create_server(args) -> ThreadingHTTPServer:
    servable = _Servable(args.artifact, mesh=args.mesh,
                         warmup=not args.no_warmup)
    batcher = (
        _Batcher(servable, args.batch_window / 1e3, args.max_batch)
        if args.batch_window > 0 else None
    )
    server = _DrainingHTTPServer(
        (args.host, args.port), _make_handler(servable, batcher)
    )
    server.servable = servable
    return server


def main(args):
    import signal

    server = create_server(args)
    # container orchestrators stop with SIGTERM: finish in-flight requests,
    # stop accepting, exit 0 (same path as Ctrl-C). shutdown() must run off
    # the serve_forever thread, hence the helper thread.
    signal.signal(
        signal.SIGTERM,
        lambda *_: threading.Thread(target=server.shutdown).start(),
    )
    host, port = server.server_address[:2]
    info = server.servable.info()
    b = info["batch"] if info["batch"] is not None else "polymorphic"
    batching = (
        f", dynamic batching {args.batch_window:g} ms"
        if args.batch_window > 0 else ""
    )
    print(
        f"serving {args.artifact} (batch {b}, {info['dtype']} "
        f"{tuple(info['frame_shape'])}) on http://{host}:{port} "
        f"[{len(info['devices'])} device(s){batching}]"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main(build_serve_parser().parse_args())
