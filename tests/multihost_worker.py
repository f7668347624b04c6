"""Worker process for the 2-process multi-host CPU test.

Launched by ``tests/test_multihost.py`` (never collected by pytest — no
``test_`` prefix). Each process owns 2 virtual CPU devices; together they
form a 4-device global mesh over ``jax.distributed``, exactly the topology
the ``--multihost`` CLI path builds (``cli/train.py``). Prints one line
``LOSSES <loss_s> <loss_gf> <loss_gt>`` for the parent to compare.
"""

import os
import sys


def main():
    coordinator, num_processes, process_id, local_devices = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    # see multihost_cli_worker.py: raise Gloo's connect timeout before the
    # backend exists — the two workers' first collectives can be minutes
    # apart under suite load on this one-core box.
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}"
        " --xla_cpu_collective_timeout_seconds=1200"
    ).strip()
    os.environ["DAHPE_COORDINATOR"] = coordinator
    os.environ["DAHPE_NUM_PROCESSES"] = str(num_processes)
    os.environ["DAHPE_PROCESS_ID"] = str(process_id)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from dahpe_tpu.parallel import robust_distributed_initialize

    robust_distributed_initialize()
    assert jax.process_count() == num_processes

    import numpy as np
    import jax.numpy as jnp

    from dahpe_tpu import models
    from dahpe_tpu.models.resnet import Bottleneck
    from dahpe_tpu.parallel import (
        create_mesh,
        make_parallel_da_step,
        replicate,
        shard_batch,
    )
    from dahpe_tpu.train import create_da_state

    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global
    mesh = create_mesh(jax.devices())

    model = models.MultiHeadPoseResNet(
        backbone=models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1]),
        num_keypoints=21,
    )
    state = create_da_state(model, jax.random.key(0), image_size=64, with_ema=True)
    state = replicate(state, mesh)

    def global_batch(seed):
        rng = np.random.default_rng(seed)
        return {
            "image": rng.standard_normal((n_global, 64, 64, 3)).astype(np.float32),
            "target": np.clip(
                rng.standard_normal((n_global, 16, 16, 21)), 0, None
            ).astype(np.float32),
            "weight": np.ones((n_global, 21), np.float32),
        }

    def local_shard(batch):
        # rows owned by this process under P('data') over process-ordered
        # devices: the contiguous [pid*local : (pid+1)*local) block
        lo = process_id * local_devices
        hi = lo + local_devices
        return {k: v[lo:hi] for k, v in batch.items()}

    step = make_parallel_da_step(model, mesh, ema_decay=0.999)
    b_s = shard_batch(local_shard(global_batch(0)), mesh)
    b_t = shard_batch(local_shard(global_batch(1)), mesh)
    new_state, metrics = step(state, b_s, b_t)
    jax.block_until_ready(metrics)
    assert int(new_state.step) == 1
    print(
        f"LOSSES {float(metrics['loss_s']):.10f} "
        f"{float(metrics['loss_gf']):.10f} {float(metrics['loss_gt']):.10f}",
        flush=True,
    )

    if len(sys.argv) > 5:
        # device-store section: each process uploads only its devices' rows;
        # the sampled global training batch must match the single-process
        # mesh value (the parent computes it) — proven via global checksums.
        fixture_root = sys.argv[5]
        from dahpe_tpu.data import DecodedCache, RenderedHandPose
        from dahpe_tpu.data.device_store import DeviceDataStore

        ds = RenderedHandPose(fixture_root, split="train", transforms=None)
        cache = DecodedCache(
            ds, os.path.join(fixture_root, "_cache64"), raw_size=64
        )
        store = DeviceDataStore(
            cache, mesh=mesh, raw_size=64, verbose=False
        )
        batch = store.train_batch(
            jax.random.key(5), batch_size=2 * n_global, image_size=64,
            heatmap_size=16,
        )
        sums = [
            float(jnp.sum(batch[k].astype(jnp.float32)))
            for k in ("image", "target", "weight")
        ]
        print(
            "STORE " + " ".join(f"{v:.6f}" for v in sums), flush=True
        )

        # fused single-dispatch iteration under multi-host: store batch
        # production + DA step in one SPMD program across both processes
        from dahpe_tpu.train import make_fused_da_iteration, seed_key

        state2 = replicate(
            create_da_state(model, jax.random.key(0), image_size=64,
                            with_ema=True),
            mesh,
        )
        fused = make_fused_da_iteration(
            model, mesh, store, store, 2 * n_global, image_size=64,
            heatmap_size=16, ema_decay=0.999,
        )
        ks = seed_key(mesh, jax.random.key(11))
        kt = seed_key(mesh, jax.random.key(12))
        state2, fm, ks, kt = fused(state2, ks, kt)
        jax.block_until_ready(fm)
        print(
            f"FUSED {float(fm['loss_s']):.10f} "
            f"{float(fm['loss_gf']):.10f} {float(fm['loss_gt']):.10f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
