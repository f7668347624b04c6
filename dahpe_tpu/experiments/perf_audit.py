"""Pass-by-pass HBM/compute accounting of the on-device batch producer.

VERDICT r4 item 2: round 4 proved the "VMEM-compute-bound, <3% left" model
wrong by costing the XLA passes *around* the opaque Pallas rotation kernel;
this audit applies the same standard to everything that now brackets it —
sample gather, rotation, crop-resize matmuls, color jitter, blur, normalize,
Gaussian targets — i.e. the device-store batch pipeline whose two
invocations (source + target) make up the e2e-vs-bare-step gap (76.2 vs
69 ms/iter at batch 32, docs/PERF.md).

Method: jit each pipeline PREFIX (stage 1, stages 1-2, ...) and time it with
the device-resident differencing loop bench.py uses (``lax.fori_loop`` with
a traced-zero data dependency, two loop lengths differenced, host-transfer
sync). The marginal cost of stage k is prefix(k) - prefix(k-1) — measured
WITH its real fusion context, not as an isolated kernel (an isolated stage
would pay materialization boundaries the full program doesn't have).

Run on the real chip:  python -m dahpe_tpu.experiments.perf_audit [batch]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from dahpe_tpu.core.heatmap import generate_target
from dahpe_tpu.data import device_aug as da

STAGES = ("gather", "rotate", "crop", "jitter", "blur", "norm", "targets")


def make_prefix(upto: str, batch: int, out_size: int, rotation: float,
                scale_range, warp: str, heatmap_size: int, sigma: float):
    """Pipeline through `upto`: (store arrays, key) -> (image-like, aux).

    Mirrors ``device_store._build_train_batch`` + ``device_aug`` stage for
    stage (single-device form — no shard_map, same ops)."""

    def per_image(img, kp, intr, ks):
        """Everything per-image, following device_aug._warp_one."""
        h, w = img.shape[0], img.shape[1]
        mat, off, angle, side, crop_off, factor = da._affine_params(
            ks[0], h, w, out_size, rotation, scale_range
        )
        rotated = da._rotate_shears(img, angle, use_pallas=warp == "pallas")
        if upto == "rotate":
            return rotated.astype(jnp.float32), kp
        out = da._crop_resize_matmul(rotated, side, crop_off, out_size)
        rad = -jnp.deg2rad(angle)
        rot_kp = jnp.array(
            [[jnp.cos(rad), -jnp.sin(rad)], [jnp.sin(rad), jnp.cos(rad)]]
        )
        center = jnp.array([w / 2.0, h / 2.0])
        kp = (kp - center) @ rot_kp.T + center
        kp = (kp - crop_off) * factor
        if upto == "crop":
            return out, kp
        out = da._color_jitter(out, ks[1], 0.25)
        if upto == "jitter":
            return out, kp
        out = da._gaussian_blur(out, ks[2])
        if upto == "blur":
            return out, kp
        out = (out / 255.0 - da.IMAGENET_MEAN) / da.IMAGENET_STD
        return out, kp

    def fn(images, kps, vis, intr, key):
        n = images.shape[0]
        idx = jax.random.choice(
            jax.random.fold_in(key, 0), n, shape=(batch,), replace=False
        )
        # flat-view gather, mirroring device_store (r5: 2.7x over 4D take)
        h, w, c = images.shape[1:]
        img = jnp.take(
            images.reshape(n, h * w * c), idx, axis=0
        ).reshape(batch, h, w, c)
        kp = jnp.take(kps, idx, axis=0)
        if upto == "gather":
            return img, kp
        v = jnp.take(vis, idx, axis=0)
        it = jnp.take(intr, idx, axis=0)
        if not (warp == "pallas" and img.dtype == jnp.uint8):
            img = img.astype(jnp.float32)
        keys = jax.random.split(jax.random.fold_in(key, 1), (batch, 3))
        out, kp = jax.vmap(per_image)(img, kp, it, keys)
        if upto != "targets":
            return out, kp
        target, _ = generate_target(
            kp, v, (heatmap_size, heatmap_size), (out_size, out_size),
            sigma=sigma,
        )
        return out, target[..., 0]

    return fn


def timed_loop(fn, store, *, iters: int, repeats: int = 3) -> float:
    """bench.py-style device-resident loop: carry the uint8 store through a
    traced-zero perturbation so iterations serialize, sync via one host
    transfer, difference two loop lengths."""
    images, kps, vis, intr = store

    @partial(jax.jit, static_argnames=("n",))
    def run_n(images, key, n):
        def body(_, carry):
            images, key, acc = carry
            key, sub = jax.random.split(key)
            out, aux = fn(images, kps, vis, intr, sub)
            # full reductions so NO stage can be dead-code-eliminated or
            # narrowed: a single-element probe would let XLA shrink the
            # gather-only prefix to a one-element gather and misattribute
            # its cost to the next stage. The reductions fuse into the
            # producer epilogue (measured ~free) and are uniform across
            # prefixes.
            live = out.astype(jnp.float32).sum() + aux.astype(
                jnp.float32
            ).sum()
            bump = jnp.minimum(jnp.abs(live) * 1e-12, 0.99)
            return (
                images + bump.astype(images.dtype),
                key,
                acc + live,
            )

        _, _, acc = jax.lax.fori_loop(
            0, n, body, (images, key, jnp.float32(0.0))
        )
        return acc

    key = jax.random.key(0)
    float(run_n(images, key, 2))  # compile + warm
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(images, key, 2))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_n(images, key, 2 + iters))
        t_big = time.perf_counter() - t0
        best = min(best, (t_big - t_small) / iters)
    return best


def main(batch: int = 32, raw: int = 288, out_size: int = 256,
         n_store: int = 256, iters: int = 60) -> None:
    from dahpe_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    warp = "pallas" if jax.devices()[0].platform == "tpu" else "matmul"
    rng = np.random.default_rng(0)
    store = (
        jnp.asarray(rng.integers(0, 256, (n_store, raw, raw, 3), np.uint8)),
        jnp.asarray(rng.uniform(20, raw - 20, (n_store, 21, 2)).astype(np.float32)),
        jnp.ones((n_store, 21), jnp.float32),
        jnp.tile(jnp.eye(3, dtype=jnp.float32), (n_store, 1, 1)),
    )
    print(
        f"# perf audit: batch {batch}, raw {raw}, out {out_size}, "
        f"warp {warp}, store {n_store}, iters {iters}",
        flush=True,
    )
    prev = 0.0
    for name in STAGES:
        fn = make_prefix(
            name, batch, out_size, 180.0, (0.6, 1.3), warp, 64, 2.0
        )
        dt = timed_loop(fn, store, iters=iters)
        print(
            f"{name:10s} prefix {dt*1e3:8.3f} ms   "
            f"marginal {(dt-prev)*1e3:+8.3f} ms",
            flush=True,
        )
        prev = dt
    print(
        f"full producer ({batch} imgs): {prev*1e3:.3f} ms "
        f"-> x2 domains = {2*prev*1e3:.3f} ms/iter of e2e overhead",
        flush=True,
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
