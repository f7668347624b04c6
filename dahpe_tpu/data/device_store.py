"""Device-resident dataset store: training batches with ZERO host traffic.

The reference streams every batch from the host (``DataLoader``,
``train1.py:76-77``); on a GPU box that is nearly free. On TPU the
host→device link is the scarcest resource in the input path (and through
this environment's tunneled chip it is catastrophically scarce: ~26 ms
latency, tens of MB/s, no pipelining — measured). The pre-decoded crops of
a whole hand-pose dataset, however, fit in HBM as uint8 (RHD train:
~10 GB at 288², ~8 GB at 256²; H3D/STB far less), so the TPU-native design
is to upload the decoded cache ONCE and make every training iteration a
single on-device program:

    sample indices (on-device RNG) → gather crops from the resident store
    → fused warp/jitter/blur/normalize (``device_aug``) → Gaussian targets

After the one-time upload the input pipeline needs no host CPU, no disk,
and no PCIe/tunnel bytes — iteration wall time equals device compute time.

Sharding: given a ``Mesh``, the sample dimension is sharded over the data
axis and each device samples its batch shard from its local shard of the
dataset (the same per-worker-shard semantics as multi-host ``BatchLoader``
loading, ``cli/common.py``). Sampling is with replacement ACROSS steps and
without replacement within a step — the infinite-iterator regime the DA
trainer already runs in (``utils/data.py`` role); there is no epoch
boundary to preserve.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@partial(jax.jit, donate_argnums=0, static_argnames=())
def _write_chunk(buf, chunk, start):
    """In-place (donated) row-range write into the resident buffer."""
    idx = (start,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, chunk.astype(buf.dtype), idx)


class DeviceDataStore:
    """Pre-decoded crops resident in HBM, sharded over a data mesh.

    Args:
      source: anything with ``fetch_raw(i, rng, raw_size)`` — a
        :class:`~dahpe_tpu.data.cache.DecodedCache` (preferred: upload is
        mmap-read speed) or a live dataset (decodes once during upload).
      mesh: data mesh; samples are sharded over ``axis``. ``None`` = a
        1-device mesh on the default device.
      shard_samples: shard the sample dim over the mesh (training stores;
        drops a trailing remainder so shards are equal, like drop_last).
        ``False`` replicates the arrays on every device — required for the
        eval loader under a replicated-parameter mesh, and keeps EVERY
        sample (validation must not drop any).
      raw_size: side of the stored crops (must match a cache's build size).
      upload_chunk: rows per host→device copy during the one-time upload.
    """

    def __init__(self, source, *, mesh: Mesh | None = None,
                 axis: str = "data", shard_samples: bool = True,
                 raw_size: int = 288, upload_chunk: int = 512,
                 verbose: bool = True):
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()[:1]), (axis,))
        self.mesh = mesh
        self.axis = axis
        self.shard_samples = shard_samples
        self.raw_size = int(raw_size)
        # equal shards per device (drop_last semantics, like BatchLoader)
        d = mesh.shape[axis] if shard_samples else 1
        self.n = (len(source) // d) * d
        if self.n == 0:
            raise ValueError(f"dataset ({len(source)}) smaller than mesh ({d})")
        k = source.num_keypoints
        s = self.raw_size

        row_spec = P(axis) if shard_samples else P()
        sharding = NamedSharding(mesh, row_spec)
        rng = np.random.default_rng(0)  # fetch_raw does not consume it

        def fetch_range(lo: int, hi: int):
            imgs = np.empty((hi - lo, s, s, 3), np.uint8)
            kp = np.empty((hi - lo, k, 2), np.float32)
            vi = np.empty((hi - lo, k), np.float32)
            it = np.empty((hi - lo, 3, 3), np.float32)
            for j, i in enumerate(range(lo, hi)):
                item = source.fetch_raw(i, rng, s)
                imgs[j] = item["image_u8"]
                kp[j] = item["keypoint2d"]
                vi[j] = np.reshape(item["visible"], (k,))
                it[j] = item["intrinsic_matrix"]
            return imgs, kp, vi, it

        if jax.process_count() > 1:
            # multi-host: every process decodes and uploads ONLY the rows its
            # own devices hold; the global arrays are assembled from the
            # per-device pieces without any host ever seeing the full set.
            # The raveled-device-index → row-range assignment below is only
            # correct on a 1-D mesh (on a multi-axis mesh, devices off the
            # sample axis must hold replicated rows, not fresh ranges).
            if shard_samples and mesh.devices.ndim != 1:
                raise ValueError(
                    "multi-host DeviceDataStore requires a 1-D mesh "
                    f"(got shape {mesh.devices.shape}); build with "
                    "parallel.create_mesh"
                )
            devs = list(mesh.devices.ravel())
            rows_per = self.n // len(devs) if shard_samples else self.n
            per_field: list[list] = [[], [], [], []]
            full = None
            for di, dev in enumerate(devs):
                if dev.process_index != jax.process_index():
                    continue
                if shard_samples:
                    bufs = fetch_range(di * rows_per, (di + 1) * rows_per)
                else:  # replicated store: each device holds every row
                    if full is None:
                        full = fetch_range(0, self.n)
                    bufs = full
                for field, buf in zip(per_field, bufs):
                    field.append(jax.device_put(buf, dev))
                if verbose and jax.process_index() == 0:
                    print(f"device-store upload: device {di}", flush=True)
            shapes = ((self.n, s, s, 3), (self.n, k, 2), (self.n, k),
                      (self.n, 3, 3))
            images, kps, vis, intr = (
                jax.make_array_from_single_device_arrays(shape, sharding, arrs)
                for shape, arrs in zip(shapes, per_field)
            )
        else:
            def alloc(shape, dtype):
                return jax.jit(
                    lambda: jnp.zeros(shape, dtype), out_shardings=sharding
                )()

            images = alloc((self.n, s, s, 3), jnp.uint8)
            kps = alloc((self.n, k, 2), jnp.float32)
            vis = alloc((self.n, k), jnp.float32)
            intr = alloc((self.n, 3, 3), jnp.float32)

            for start in range(0, self.n, upload_chunk):
                stop = min(start + upload_chunk, self.n)
                imgs, kp, vi, it = fetch_range(start, stop)
                images = _write_chunk(images, jnp.asarray(imgs), start)
                kps = _write_chunk(kps, jnp.asarray(kp), start)
                vis = _write_chunk(vis, jnp.asarray(vi), start)
                intr = _write_chunk(intr, jnp.asarray(it), start)
                if verbose and start // upload_chunk % 8 == 0:
                    print(f"device-store upload: {stop}/{self.n}", flush=True)
        jax.block_until_ready(images)
        self.images, self.kps, self.vis, self.intr = images, kps, vis, intr
        self._train_batch_fn = None
        self._train_batch_cfg = None
        self._stream = None  # device-resident sampling key (seed_stream)

    def nbytes(self) -> int:
        return sum(
            x.size * x.dtype.itemsize
            for x in (self.images, self.kps, self.vis, self.intr)
        )

    def _build_train_batch(self, batch_size: int, image_size: int,
                           heatmap_size: int, rotation: float,
                           scale_range: tuple, sigma: float):
        from dahpe_tpu.core.heatmap import generate_target
        from dahpe_tpu.data.device_aug import augment_batch

        mesh, axis = self.mesh, self.axis
        if not self.shard_samples:
            raise ValueError(
                "train_batch requires a sample-sharded store "
                "(shard_samples=True); replicated stores are eval-only"
            )
        d = mesh.shape[axis]
        if batch_size % d:
            raise ValueError(f"batch {batch_size} not divisible by mesh {d}")
        local_b = batch_size // d
        local_n = self.n // d

        # the Pallas shear kernels are bit-identical to the jnp masked-shift
        # path and ~2.8x faster on TPU (each shear one VMEM-resident pass);
        # non-TPU backends (CPU tests) keep the portable jnp form
        warp = (
            "pallas"
            if mesh.devices.ravel()[0].platform == "tpu" else "matmul"
        )

        def shard_fn(images, kps, vis, intr, key_data):
            # per-device stream from ONE replicated key: fold in the device's
            # position on the axis (process-layout independent, multi-host ok)
            key = jax.random.wrap_key_data(key_data)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            idx = jax.random.choice(
                key, local_n, shape=(local_b,), replace=False
            )
            # gather the image rows through a FLAT (n, h*w*c) view: measured
            # 2.7x faster than the 4D take on TPU (0.14 vs 0.38 ms for
            # 32x288x288x3 uint8 — docs/PERF.md r5 audit). The reshape is a
            # layout-preserving bitcast, so XLA lowers the gather to plain
            # row copies instead of a 4D gather.
            h, w, c = images.shape[1:]
            img = jnp.take(
                images.reshape(images.shape[0], h * w * c), idx, axis=0
            ).reshape(local_b, h, w, c)
            kp = jnp.take(kps, idx, axis=0)
            v = jnp.take(vis, idx, axis=0)
            it = jnp.take(intr, idx, axis=0)
            img, kp, _ = augment_batch(
                img, kp, it, jax.random.fold_in(key, 1),
                out_size=image_size, rotation=rotation,
                scale_range=scale_range, warp=warp,
            )
            target, weight = generate_target(
                kp, v, (heatmap_size, heatmap_size),
                (image_size, image_size), sigma=sigma,
            )
            return {"image": img, "target": target, "weight": weight}

        tiled = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            out_specs={"image": P(axis), "target": P(axis), "weight": P(axis)},
            # the Pallas shear kernels' out_shapes carry no varying-mesh-axes
            # annotation, which the checker requires of every output produced
            # inside a shard_map; the specs above already pin the sharding.
            # Scoped to the TPU/pallas build only — the portable jnp warp
            # (CPU tests) keeps full spec validation.
            check_vma=(warp != "pallas"),
        )

        @jax.jit
        def one_shot(images, kps, vis, intr, key_data):
            return tiled(images, kps, vis, intr, key_data)

        @partial(jax.jit, donate_argnums=(4,))
        def streaming(images, kps, vis, intr, key_data):
            # advance the key ON DEVICE: through a high-latency transport
            # (tunneled TPU: ~26 ms/transfer, no pipelining) a per-iteration
            # host key upload would gate the whole training loop.
            key = jax.random.wrap_key_data(key_data)
            next_key, sub = jax.random.split(key)
            batch = tiled(images, kps, vis, intr, jax.random.key_data(sub))
            return batch, jax.random.key_data(next_key)

        return tiled, one_shot, streaming

    def eval_loader(self, batch_size: int, *, heatmap_size: int = 64,
                    sigma: float = 2.0):
        """Device-resident validation loader (drop-in for ``BatchLoader`` in
        ``evaluate.validate`` — it advertises ``device_finalized``).

        Build the store at ``raw_size == image_size`` for this: the
        deterministic val-transform geometry (crop + PIL bilinear resize) is
        then EXACTLY the cache/upload prefix, bit-identical to the host PIL
        path, and the device only normalizes + renders Gaussian targets.
        Trailing batches are padded with clipped duplicate rows whose targets
        are zero-masked, so they contribute nothing to PCK — mirroring the
        host path's zero-row padding.
        """
        if self.shard_samples and self.mesh.shape[self.axis] > 1:
            raise ValueError(
                "eval_loader needs a replicated store on a >1-device mesh "
                "(build with shard_samples=False): a sample-sharded store "
                "drops trailing samples and validation must see every one"
            )
        return _DeviceEvalLoader(self, batch_size, heatmap_size, sigma)

    def _fns(self, batch_size: int, image_size: int, heatmap_size: int,
             rotation: float, scale_range, sigma: float):
        cfg = (batch_size, image_size, heatmap_size, float(rotation),
               tuple(scale_range), float(sigma))
        if self._train_batch_fn is None or self._train_batch_cfg != cfg:
            self._train_batch_fn = self._build_train_batch(*cfg[:3], *cfg[3:])
            self._train_batch_cfg = cfg
        return self._train_batch_fn

    def _put_key(self, key):
        if hasattr(key, "dtype") and key.dtype == np.uint32:
            key_data = np.asarray(key, np.uint32)  # raw key data (resume)
        else:
            key_data = np.asarray(jax.random.key_data(key), np.uint32)
        if jax.process_count() > 1:
            from dahpe_tpu.parallel.mesh import replicate

            return replicate(key_data, self.mesh)
        return jax.device_put(key_data, NamedSharding(self.mesh, P()))

    def train_batch(self, key, batch_size: int, *, image_size: int = 256,
                    heatmap_size: int = 64, rotation: float = 180.0,
                    scale_range=(0.6, 1.3), sigma: float = 2.0) -> dict:
        """One fully on-device training batch: gather + augment + targets.

        ``key`` drives both the sample choice and the augmentation — an
        explicit-key entry for tests and one-shot use. The training loop
        should prefer :meth:`seed_stream` + :meth:`next_train_batch`, which
        never touch the host after the seed upload.
        """
        _, one_shot, _ = self._fns(batch_size, image_size, heatmap_size,
                                   rotation, scale_range, sigma)
        return one_shot(
            self.images, self.kps, self.vis, self.intr, self._put_key(key)
        )

    def traced_batch_fn(self, batch_size: int, *, image_size: int = 256,
                        heatmap_size: int = 64, rotation: float = 180.0,
                        scale_range=(0.6, 1.3), sigma: float = 2.0):
        """The un-jitted batch producer ``(images, kps, vis, intr, key_data)
        -> batch`` for composing into a LARGER jitted program
        (``train.fused``): one dispatch can then carry sample gather +
        augmentation + targets + the train step. The resident arrays must be
        passed as ARGUMENTS of the outer jit (see :meth:`store_arrays`) —
        under multi-host they span non-addressable devices and cannot be
        closed over. Given the same sub-key, the output is bit-identical to
        :meth:`train_batch`."""
        tiled, _, _ = self._fns(batch_size, image_size, heatmap_size,
                                rotation, scale_range, sigma)
        return tiled

    def store_arrays(self) -> tuple:
        """The resident arrays, in :meth:`traced_batch_fn` argument order."""
        return (self.images, self.kps, self.vis, self.intr)

    def seed_stream(self, key) -> None:
        """Upload the batch-sampling key ONCE; :meth:`next_train_batch` then
        advances it entirely on device (``jax.random.split`` inside the same
        jitted program, donated buffer), so steady-state training does zero
        host→device transfers per iteration. ``key`` is a typed PRNG key or
        a raw uint32 key-data array (a saved :meth:`stream_data`)."""
        self._stream = self._put_key(key)

    def stream_data(self):
        """The current sampling-key buffer as host uint32 key data (for
        checkpointing — reseeding with it makes resume a true continuation),
        or ``None`` before :meth:`seed_stream`."""
        if getattr(self, "_stream", None) is None:
            return None
        return np.asarray(jax.device_get(self._stream), np.uint32)

    def next_train_batch(self, batch_size: int, *, image_size: int = 256,
                         heatmap_size: int = 64, rotation: float = 180.0,
                         scale_range=(0.6, 1.3), sigma: float = 2.0) -> dict:
        """One on-device training batch from the device-resident key stream
        (deterministic in the :meth:`seed_stream` key)."""
        if getattr(self, "_stream", None) is None:
            raise ValueError("call seed_stream(key) before next_train_batch")
        _, _, streaming = self._fns(batch_size, image_size, heatmap_size,
                                    rotation, scale_range, sigma)
        batch, self._stream = streaming(
            self.images, self.kps, self.vis, self.intr, self._stream
        )
        return batch

class _DeviceEvalLoader:
    """Sequential, fixed-shape validation batches straight from HBM."""

    device_finalized = True

    def __init__(self, store: DeviceDataStore, batch_size: int,
                 heatmap_size: int, sigma: float):
        from dahpe_tpu.core.heatmap import generate_target
        from dahpe_tpu.data.device_aug import IMAGENET_MEAN, IMAGENET_STD

        self.store = store
        self.batch_size = int(batch_size)
        n, b = store.n, self.batch_size
        image_size = store.raw_size
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        @jax.jit
        def eval_batch(images, kps, vis, start):
            rows = start + jnp.arange(b)
            valid = (rows < n).astype(jnp.float32)
            idx = jnp.clip(rows, 0, n - 1)
            img = jnp.take(images, idx, axis=0).astype(jnp.float32) / 255.0
            img = (img - mean) / std
            target, weight = generate_target(
                jnp.take(kps, idx, axis=0), jnp.take(vis, idx, axis=0),
                (heatmap_size, heatmap_size), (image_size, image_size),
                sigma=sigma,
            )
            # zero-mask the clipped duplicate padding rows: all-zero targets
            # fail pck_accuracy's peak validity filter, exactly like the host
            # path's zero-row padding (evaluate.validate)
            target = target * valid[:, None, None, None]
            weight = weight * valid[:, None]
            return {"image": img, "target": target, "weight": weight}

        self._fn = eval_batch

    def __len__(self) -> int:
        return -(-self.store.n // self.batch_size)

    def __iter__(self):
        s = self.store
        for start in range(0, s.n, self.batch_size):
            yield {
                "batch": self._fn(s.images, s.kps, s.vis, start),
                "n_real": min(self.batch_size, s.n - start),
            }
