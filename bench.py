"""Benchmark: images/sec/chip for 256x256 pose inference (the north-star
metric from BASELINE.json) on the flagship ResNet-101 multiscale model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); REF_GPU_IMG_S
below is a documented estimate for Simple-Baseline ResNet-101 inference at
256x256 on the single research GPU the reference targets (~120 img/s fp32).
BASELINE.json's bar is >=5x that per chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_GPU_IMG_S = 120.0
# reference DA training: batch 32, 3 fwd + 3 bwd of ResNet-101 per iteration
# (train1.py:355-458) ≈ 0.6 s/iter on the same class of GPU → ~100 img/s
REF_GPU_TRAIN_IMG_S = 100.0


def _enable_compile_cache() -> None:
    import jax

    cache = os.environ.get("DAHPE_JAX_CACHE", "/tmp/dahpe_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def bench_train_step(batch: int = 32) -> None:
    """Secondary benchmark: full 3-step DA training iteration throughput
    (three fwd+bwd of ResNet-101 + pseudo-labels + partitioned SGD)."""
    import jax
    import jax.numpy as jnp

    from dahpe_tpu import models
    from dahpe_tpu.train import create_da_state, make_da_train_step

    backbone = models.get_backbone("resnet101", dtype=jnp.bfloat16)
    model = models.MultiHeadPoseResNet(
        backbone=backbone, num_keypoints=21, dtype=jnp.bfloat16
    )
    print(f"init DA state (batch {batch})", file=sys.stderr)
    state = create_da_state(model, jax.random.key(0), image_size=256,
                            batch_size=batch)
    step = make_da_train_step(model, compute_metrics=False)

    rng = np.random.default_rng(0)

    def mk_batch():
        return {
            "image": jnp.asarray(
                rng.standard_normal((batch, 256, 256, 3)), jnp.float32
            ),
            "target": jnp.asarray(
                np.clip(rng.standard_normal((batch, 64, 64, 21)), 0, None),
                jnp.float32,
            ),
            "weight": jnp.ones((batch, 21), jnp.float32),
        }

    b_s, b_t = mk_batch(), mk_batch()

    @jax.jit
    def run_n(state, n):
        def body(_, s):
            s2, _m = step(s, b_s, b_t)
            return s2
        return jax.lax.fori_loop(0, n, body, state)

    def timed(n):
        t0 = time.perf_counter()
        out = run_n(state, n)
        float(jax.tree.leaves(out.params)[0].ravel()[0])
        return time.perf_counter() - t0

    timed(1)
    t_lo = min(timed(1) for _ in range(2))
    t_hi = min(timed(9) for _ in range(2))
    per_step = (t_hi - t_lo) / 8
    img_s = 2 * batch / per_step  # one source + one target batch per iter
    print(
        f"DA train step: {per_step*1e3:.1f} ms/iter, {img_s:.1f} img/s "
        f"(batch {batch}+{batch})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "da_train_images_per_sec_per_chip_256px",
                "value": round(img_s, 1),
                "unit": "images/sec",
                "vs_baseline": round(img_s / REF_GPU_TRAIN_IMG_S, 2),
                # the reference publishes no throughput; denominator is the
                # documented estimate in BASELINE.md, not a measurement
                "vs_baseline_is_estimate": True,
            }
        )
    )


def bench_pretrain_step(batch: int = 32, iters: int = 20) -> None:
    """Supervised pretrain iteration (``train1.py:278-325`` counterpart):
    (a) the pure jitted step on resident batches — the 1-fwd + 1-bwd
    roofline probe — and (b) the whole-system fused iteration from the
    device store (on-device gather + augmentation + targets + step), the
    ``--device-store`` pretrain phase's steady state. The (b)−(a) delta is
    the augmentation/input share (docs/PERF.md pretrain section)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from fixtures import make_rhd_fixture

    from dahpe_tpu import models
    from dahpe_tpu.data import DecodedCache, RenderedHandPose
    from dahpe_tpu.data.device_store import DeviceDataStore
    from dahpe_tpu.train import (
        create_pretrain_state,
        make_fused_pretrain_iteration,
        make_pretrain_step,
        seed_key,
    )
    from dahpe_tpu.parallel import replicate

    model = models.PoseResNet(
        backbone=models.get_backbone("resnet101", dtype=jnp.bfloat16),
        num_keypoints=21, dtype=jnp.bfloat16,
    )
    print(f"init pretrain state (batch {batch})", file=sys.stderr)
    state = create_pretrain_state(model, jax.random.key(0), image_size=256,
                                  batch_size=batch)

    # (a) pure step, resident synthetic batch, on-device loop differencing
    step = make_pretrain_step(model, compute_metrics=False)
    rng = np.random.default_rng(0)
    b = {
        "image": jnp.asarray(
            rng.standard_normal((batch, 256, 256, 3)), jnp.float32
        ),
        "target": jnp.asarray(
            np.clip(rng.standard_normal((batch, 64, 64, 21)), 0, None),
            jnp.float32,
        ),
        "weight": jnp.ones((batch, 21), jnp.float32),
    }

    @jax.jit
    def run_n(state, n):
        def body(_, s):
            s2, _m = step(s, b, jnp.float32(1e-3))
            return s2
        return jax.lax.fori_loop(0, n, body, state)

    def timed(n):
        t0 = time.perf_counter()
        out = run_n(state, n)
        float(jax.tree.leaves(out.params)[0].ravel()[0])
        return time.perf_counter() - t0

    timed(1)
    t_lo = min(timed(1) for _ in range(2))
    t_hi = min(timed(9) for _ in range(2))
    step_ms = (t_hi - t_lo) / 8 * 1e3
    print(f"pretrain pure step: {step_ms:.1f} ms/iter "
          f"({batch / step_ms * 1e3:.0f} img/s)", file=sys.stderr)

    # (b) whole-system fused iteration from the device store
    root = tempfile.mkdtemp(prefix="dahpe_bench_")
    try:
        make_rhd_fixture(root, n=256)
        ds = RenderedHandPose(root, split="train", transforms=None)
        store = DeviceDataStore(
            DecodedCache(ds, os.path.join(root, "_c")), verbose=False
        )
        fused = make_fused_pretrain_iteration(
            model, store.mesh, store, batch, compute_metrics=False
        )
        fstate = replicate(
            create_pretrain_state(model, jax.random.key(0), image_size=256,
                                  batch_size=batch),
            store.mesh,
        )
        key = seed_key(store.mesh, jax.random.key(0))
        lr = replicate(np.float32(1e-3), store.mesh)
        fstate, m, key = fused(fstate, key, lr)  # compile
        float(m["loss_s"])

        def ftimed(n):
            nonlocal fstate, key
            t0 = time.perf_counter()
            for _ in range(n):
                fstate, m, key = fused(fstate, key, lr)
            float(m["loss_s"])
            return time.perf_counter() - t0

        ftimed(2)
        e2e_ms = min(ftimed(iters) for _ in range(2)) / iters * 1e3
        img_s = batch / e2e_ms * 1e3
        print(
            f"pretrain e2e (device store): {e2e_ms:.1f} ms/iter "
            f"({img_s:.0f} img/s); aug/input share {e2e_ms - step_ms:.1f} ms",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "pretrain_e2e_images_per_sec_per_chip_256px",
                    "value": round(img_s, 1),
                    "unit": "images/sec",
                    "vs_baseline": None,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_train_e2e(batch: int = 32, iters: int = 20,
                    fused: bool = True, steps_per_call: int = 1) -> None:
    """Whole-system DA training iteration on one chip with the
    device-resident store: on-device sample gather + fused augmentation +
    Gaussian targets + the 3-phase DA step — the ``--device-store
    --decoded-cache`` CLI path's steady state, nothing hidden. ``fused``
    runs the production single-dispatch program (``train/fused.py``);
    ``fused=False`` measures the three-dispatch path for comparison;
    ``steps_per_call > 1`` (``e2e 32 scan``) scans that many DA iterations
    inside each dispatch — isolates per-dispatch overhead from in-program
    compute."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from fixtures import make_rhd_fixture

    from dahpe_tpu import models
    from dahpe_tpu.data import DecodedCache, RenderedHandPose
    from dahpe_tpu.data.device_store import DeviceDataStore
    from dahpe_tpu.train import (
        create_da_state,
        make_da_train_step,
        make_fused_da_iteration,
        seed_key,
    )

    root = tempfile.mkdtemp(prefix="dahpe_bench_")
    try:
        make_rhd_fixture(root, n=256)
        ds = RenderedHandPose(root, split="train", transforms=None)
        store = DeviceDataStore(
            DecodedCache(ds, os.path.join(root, "_c")), verbose=False
        )
        model = models.MultiHeadPoseResNet(
            backbone=models.get_backbone("resnet101", dtype=jnp.bfloat16),
            num_keypoints=21, dtype=jnp.bfloat16,
        )
        print(f"init DA state (batch {batch})", file=sys.stderr)
        state = create_da_state(model, jax.random.key(0), image_size=256,
                                batch_size=batch)
        if fused:
            fused_it = make_fused_da_iteration(
                model, store.mesh, store, store, batch,
                compute_metrics=False, steps_per_call=steps_per_call,
            )
            keys = [seed_key(store.mesh, jax.random.key(i)) for i in (0, 1)]

            def one_iter(state):
                state, m, keys[0], keys[1] = fused_it(state, keys[0], keys[1])
                return state, m
        else:
            step = jax.jit(make_da_train_step(model, compute_metrics=False))
            store.seed_stream(jax.random.key(0))

            def one_iter(state):
                b_s = store.next_train_batch(batch)
                b_t = store.next_train_batch(batch)
                return step(state, b_s, b_t)

        state, m = one_iter(state)  # compile
        float(m["loss_s"])

        def timed(n):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = one_iter(state)
            float(m["loss_s"])  # host transfer = real sync through the tunnel
            return time.perf_counter() - t0

        timed(2)
        per_call = min(timed(iters) for _ in range(2)) / iters
        dt = per_call / (steps_per_call if fused else 1)
        img_s = 2 * batch / dt
        print(
            f"DA e2e iteration (device store): {dt*1e3:.1f} ms/iter, "
            f"{img_s:.1f} img/s",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "da_train_e2e_images_per_sec_per_chip_256px",
                    "value": round(img_s, 1),
                    "unit": "images/sec",
                    "vs_baseline": round(img_s / REF_GPU_TRAIN_IMG_S, 2),
                    "vs_baseline_is_estimate": True,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_data_pipeline(
    batch: int = 64, n_images: int = 256, cached: bool = False
) -> None:
    """Host input-pipeline throughput through the threaded BatchLoader on a
    synthetic RHD fixture: live decode+crop+resize (raw fast path), or the
    pre-decoded mmap cache (``cached=True``, the production train path)."""
    import shutil
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from fixtures import make_rhd_fixture

    from dahpe_tpu.data import BatchLoader, DecodedCache, RenderedHandPose

    root = tempfile.mkdtemp(prefix="dahpe_bench_")
    try:
        make_rhd_fixture(root, n=n_images)
        ds = RenderedHandPose(root, split="train", transforms=None)
        if cached:
            t0 = time.perf_counter()
            ds = DecodedCache(ds, os.path.join(root, "_cache"))
            print(
                f"cache build: {time.perf_counter() - t0:.2f}s for "
                f"{len(ds)} images (one-time)",
                file=sys.stderr,
            )
        loader = BatchLoader(
            ds, batch_size=batch, num_workers=os.cpu_count() or 8, seed=0,
            raw=True, drop_last=True,
        )
        # warm epoch (page cache), then timed epochs
        for _ in loader:
            pass
        n = 0
        t0 = time.perf_counter()
        for _ in range(4 if cached else 1):
            for b in loader:
                n += b["image_u8"].shape[0]
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": (
                        "host_input_pipeline_images_per_sec"
                        + ("_cached" if cached else "")
                    ),
                    "value": round(n / dt, 1),
                    "unit": "images/sec",
                    "vs_baseline": None,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_device_aug(batch: int = 256, warp: str = "matmul") -> None:
    """On-device fused augmentation throughput (``data/device_aug.py``):
    the full train-time transform (affine warp + jitter + blur + normalize)
    for a batch of raw 288^2 uint8 crops, timed on device with the same
    two-loop-length differencing as the inference bench."""
    import jax
    import jax.numpy as jnp

    from dahpe_tpu.data.device_aug import augment_batch

    rng = np.random.default_rng(0)
    # uint8, like the production device-store path (the pallas warp ingests
    # it directly; other warps cast on entry exactly as the store would)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, 288, 288, 3)), jnp.uint8
    )
    kps = jnp.asarray(rng.uniform(20, 260, (batch, 21, 2)), jnp.float32)
    intr = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (batch, 3, 3))

    @jax.jit
    def run_n(images, key, n):
        def body(_, carry):
            images, key, acc = carry
            key, sub = jax.random.split(key)
            out, kp, _ = augment_batch(
                images, kps, intr, sub, out_size=256, warp=warp
            )
            # data dependency so iterations serialize and can't be hoisted;
            # the added term is a traced zero (XLA can't fold it) so the
            # uint8 store passes through unchanged.  The min(., 0.99) makes
            # the truncate-to-0 contract explicit rather than relying on the
            # output being ImageNet-normalized (|out| < ~3) forever.
            return (
                images
                + jnp.minimum(jnp.abs(out[0, 0, 0, 0]) * 1e-9, 0.99).astype(
                    images.dtype
                ),
                key,
                acc + out[0, 0, 0, 0] + kp[0, 0, 0],
            )

        _, _, acc = jax.lax.fori_loop(
            0, n, body, (images, key, jnp.float32(0.0))
        )
        return acc

    def timed(n):
        t0 = time.perf_counter()
        float(run_n(images, jax.random.key(0), n))
        return time.perf_counter() - t0

    timed(1)
    t_lo = min(timed(2) for _ in range(3))
    t_hi = min(timed(12) for _ in range(3))
    per_batch = (t_hi - t_lo) / 10
    img_s = batch / per_batch
    print(
        f"device aug ({warp}): {per_batch*1e3:.1f} ms/batch-{batch}, "
        f"{img_s:.1f} img/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"device_augment_images_per_sec_{warp}",
                "value": round(img_s, 1),
                "unit": "images/sec",
                "vs_baseline": None,
            }
        )
    )


def bench_serving(batch: int = 96, int8: bool = False,
                  glue: str = "bfloat16") -> None:
    """Serving-artifact throughput: the exported StableHLO program
    (``dahpe_tpu/serving.py``) with RAW uint8 frame ingestion — the
    deployment configuration (clients ship camera bytes; normalize is
    compiled into the artifact). With ``int8``, the artifact is the
    post-training-quantized program (``dahpe_tpu/quant.py``: BN-folded
    per-channel int8 convs on the MXU). Timed on device with the same
    two-loop differencing as the inference bench; the one-shot wall latency
    through this environment's tunnel is reported on stderr for context (it
    is transport-dominated here, not representative of a co-located host)."""
    import jax
    import jax.numpy as jnp

    from dahpe_tpu import models
    from dahpe_tpu.serving import (
        export_predict, export_predict_int8, load_predict,
    )

    model = models.MultiHeadPoseResNet(
        backbone=models.get_backbone("resnet101", dtype=jnp.bfloat16),
        num_keypoints=21, dtype=jnp.bfloat16,
    )
    kind = f"int8/{glue}-glue" if int8 else "bf16"
    print(
        f"init + export artifact (batch {batch}, uint8 in, {kind})",
        file=sys.stderr,
    )
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 256, 256, 3)), train=False,
            gl_coeff=0.0,
        )
    )()
    if int8:
        from dahpe_tpu import quant
        from dahpe_tpu.data.device_aug import IMAGENET_MEAN, IMAGENET_STD

        rng = np.random.default_rng(1)
        calib = (
            jnp.asarray(
                rng.integers(0, 256, (8, 256, 256, 3)), jnp.float32
            ) / 255.0
            - jnp.asarray(IMAGENET_MEAN)
        ) / jnp.asarray(IMAGENET_STD)
        variables = quant.quantize_model(model, variables, calib)
        blob = export_predict_int8(
            variables, batch_size=batch, image_size=256, heatmap_size=64,
            uint8_input=True, glue=glue,
        )
    else:
        blob = export_predict(
            model, variables, batch_size=batch, image_size=256,
            heatmap_size=64, uint8_input=True,
        )
    print(f"artifact: {len(blob)} bytes", file=sys.stderr)
    restored = load_predict(blob)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8
    )

    @jax.jit
    def run_n(variables, x, n):
        def body(_, carry):
            x, acc = carry
            coords, _ = restored(variables, x)
            # data-dependent LSB flip so iterations serialize on device
            dep = (coords[0, 0, 0].astype(jnp.int32) % 2).astype(jnp.uint8)
            return (x ^ dep, acc + coords[0, 0, 0])

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    def timed(n):
        t0 = time.perf_counter()
        float(run_n(variables, x, n))
        return time.perf_counter() - t0

    # Scale the differenced loop length so the measured signal stays well
    # above the tunnel's multi-ms run-to-run jitter. At large batches 20
    # iterations are hundreds of ms of device time, but at batch 1 the
    # program is ~0.5 ms and 20 iterations are pure noise — r3's "66.5
    # ms/img int8 @ batch 1" was exactly this artifact (the same config
    # differenced to *negative* time on a rerun; a 2000-iteration probe
    # measured 0.47 ms/img, parity with bf16 — docs/PERF.md).
    n_iters = max(20, int(2000 / max(batch, 1)))
    timed(1)
    t_lo = min(timed(2) for _ in range(3))
    t_hi = min(timed(2 + n_iters) for _ in range(3))
    per_batch = (t_hi - t_lo) / n_iters
    img_s = batch / per_batch

    # one-shot request latency incl. host<->device transfer (tunnel-bound in
    # this environment; a co-located serving host pays microseconds instead)
    coords, _ = restored(variables, x)  # warm
    jax.block_until_ready(coords)
    t0 = time.perf_counter()
    coords, _ = restored(variables, x)
    np.asarray(coords)
    wall = time.perf_counter() - t0
    print(
        f"serving ({kind}): {per_batch*1e3:.2f} ms/batch-{batch} on device "
        f"({img_s:.1f} img/s); one-shot incl. transport {wall*1e3:.1f} ms",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "serving_artifact_images_per_sec_per_chip_256px_"
                          "uint8"
                          + ("_int8" if int8 else "")
                          + ("_f32glue" if int8 and glue == "float32" else ""),
                "value": round(img_s, 1),
                "unit": "images/sec",
                "vs_baseline": round(img_s / REF_GPU_IMG_S, 2),
                "vs_baseline_is_estimate": True,
            }
        )
    )


def parse_flagged_args(rest: list[str], default_batch: int) -> int:
    """First integer in ``rest`` (any position) or ``default_batch``.

    The batch int and word flags may come in either order (``e2e 32 unfused``
    and ``e2e unfused 32`` both work); non-numeric args must never crash the
    parse (ADVICE r2 — regression-guarded by tests/test_bench_parsing.py).
    """
    nums = [int(a) for a in rest if a.lstrip("-").isdigit()]
    return nums[0] if nums else default_batch


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dahpe_tpu import models

    _enable_compile_cache()
    if len(sys.argv) > 1 and sys.argv[1] == "serve":
        rest = sys.argv[2:]
        bench_serving(
            parse_flagged_args(rest, 96), int8="int8" in rest,
            glue="float32" if "f32glue" in rest else "bfloat16",
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "data":
        bench_data_pipeline(cached="cached" in sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "aug":
        bench_device_aug(
            batch=int(sys.argv[2]) if len(sys.argv) > 2 else 256,
            warp=sys.argv[3] if len(sys.argv) > 3 else "matmul",
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        bench_train_step(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "pretrain":
        bench_pretrain_step(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "e2e":
        # flags and the batch int may come in either order
        # (`e2e 32 unfused` and `e2e unfused` both work)
        rest = sys.argv[2:]
        bench_train_e2e(
            parse_flagged_args(rest, 32),
            fused="unfused" not in rest,
            steps_per_call=20 if "scan" in rest else 1,
        )
        return

    # batch sweep on v5e (r2/r3): 64->4644, 96->5065, 100->4974, 104->5180,
    # 108->5025, 112->5206, 116->4815, 120->4984, 128->5000, 160->4484,
    # 192->4529 img/s; non-monotone (XLA tiling), 112 is the stable peak
    # (3 runs within 0.06%)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 112
    backbone = models.get_backbone("resnet101", dtype=jnp.bfloat16)
    model = models.MultiHeadPoseResNet(
        backbone=backbone, num_keypoints=21, dtype=jnp.bfloat16
    )

    x0 = jnp.zeros((batch, 256, 256, 3), jnp.bfloat16)
    print(f"init resnet101 (batch {batch}) on {jax.devices()[0]}", file=sys.stderr)
    variables = jax.jit(lambda: model.init(jax.random.key(0), x0, train=False))()

    # The TPU is reached through a high-latency tunnel in this environment, so
    # host-side dispatch timing is meaningless. The loop runs ON DEVICE
    # (fori_loop, serialized by a data dependency) and we difference two loop
    # lengths to cancel the round-trip + dispatch constant.
    @jax.jit
    def infer_n(variables, x, n):
        def body(_, carry):
            x, acc = carry
            y = model.apply(variables, x, train=False, gl_coeff=0.0)["y"]
            # feed a scalar of y back into x so iterations can't be hoisted
            x = x * (1.0 + 1e-6 * y[0, 0, 0, 0]).astype(x.dtype)
            return (x, acc + jnp.float32(y[0, 0, 0, 0]))

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 256, 256, 3)), jnp.bfloat16)

    def timed(n):
        # block_until_ready is not reliable through the tunnel; a host
        # transfer of the data-dependent scalar is.
        t0 = time.perf_counter()
        float(infer_n(variables, x, n))
        return time.perf_counter() - t0

    timed(1)  # compile
    # 50 differenced iters (~1 s on device): long enough that the ±10 ms
    # run-to-run jitter of each timing lands under 1% of the difference
    n_lo, n_hi = 2, 52
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    dt = t_hi - t_lo
    iters = n_hi - n_lo
    print(f"t({n_hi})={t_hi:.3f}s t({n_lo})={t_lo:.3f}s", file=sys.stderr)

    img_s = batch * iters / dt
    print(f"{iters} iters in {dt:.3f}s -> {img_s:.1f} img/s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "pose_inference_images_per_sec_per_chip_256px",
                "value": round(img_s, 1),
                "unit": "images/sec",
                "vs_baseline": round(img_s / REF_GPU_IMG_S, 2),
                # denominator is BASELINE.md's documented ESTIMATE (the
                # reference publishes no throughput numbers)
                "vs_baseline_is_estimate": True,
            }
        )
    )


if __name__ == "__main__":
    main()
