"""DA training CLI — the TPU-native ``train1.py``.

Flow parity with ``train1.py:37-275``: build transforms/datasets/loaders,
model (+ optional EMA twin), supervised pretrain when no pretrain checkpoint
is given, then 200 epochs x 500 iterations of the 3-step minimax with
per-epoch validation, checkpointing and best-copy. The per-iteration work is
one jitted SPMD step over the device mesh.
"""

from __future__ import annotations

import math
import os
import random
import time

import numpy as np

import jax
import jax.numpy as jnp

from dahpe_tpu.cli.args import build_parser
from dahpe_tpu.cli.common import (
    build_datasets,
    build_loaders,
    build_model,
    build_train_loader,
    build_val_loader,
    make_visualizer,
    train_loader_mode,
)
from dahpe_tpu.data import ForeverIterator, finalize_batch
from dahpe_tpu.evaluate import make_eval_step, validate
from dahpe_tpu.parallel import create_mesh, make_parallel_da_step, replicate, shard_batch
from dahpe_tpu.train import create_da_state, create_pretrain_state, make_pretrain_step
from dahpe_tpu.train.optim import pretrain_lr_factor
from dahpe_tpu.train.rng import iter_keys
from dahpe_tpu.utils import checkpoint as ckpt
from dahpe_tpu.utils import fast_ckpt
from dahpe_tpu.utils.logging import RunLogger
from dahpe_tpu.utils.meters import AverageMeter, ProgressMeter


def variables_of(state):
    return {"params": state.params, "batch_stats": state.batch_stats}


class DivergenceError(RuntimeError):
    """Training produced a non-finite loss (exit code 3)."""


def check_finite(saver, logger, state, step: int, **losses) -> None:
    """Failure detection: a NaN/inf loss aborts the run instead of
    training garbage for the rest of the schedule.

    Checked at every ``--print-freq`` display (the loop only fetches
    metrics there — a per-iteration device sync would gate the whole
    loop) AND immediately before every checkpoint write (``--save-every``,
    the graceful-stop drain, the epoch save), so no persisted checkpoint
    can ever hold non-finite state no matter where inside a print window
    divergence began. The poisoned state is dumped to
    ``checkpoints/nan_abort`` for forensics; ``checkpoints/latest`` keeps
    its last (finite) contents, so ``--resume checkpoints/latest`` (e.g.
    with a lower lr) restarts from good weights. The reference has no
    equivalent (a NaN there silently burns the remaining epochs)."""
    import math

    bad = {k: v for k, v in losses.items() if not math.isfinite(v)}
    if not bad:
        return
    path = logger.get_checkpoint_path("nan_abort")
    if saver is not None:
        saver.save(path, state)
        saver.flush()
    else:
        ckpt.save_state(path, state)
    raise DivergenceError(
        f"non-finite losses at step {step}: "
        + ", ".join(f"{k}={v}" for k, v in sorted(bad.items()))
        + f"; diverged state dumped to {path}; every checkpoint write is "
        "finiteness-gated, so checkpoints/latest still holds the last "
        "pre-divergence state — resume from it (consider a lower --lr)"
    )


def da_losses_host(metrics) -> dict:
    """The DA step's three loss scalars as host floats in ONE transfer
    (stacked on device first — fetching each ``float()`` separately pays
    this environment's ~26 ms round trip three times)."""
    keys = ("loss_s", "loss_gf", "loss_gt")
    vals = np.asarray(jnp.stack([metrics[k] for k in keys]))
    return {k: float(v) for k, v in zip(keys, vals)}




def validate_steps_per_call(args) -> int:
    """Resolve ``--steps-per-call`` to a usable chunk size K.

    K > 1 scans K train iterations inside each fused dispatch
    (train/fused.py), so every host-side boundary — progress reports, the
    stop-consensus poll, ``--save-every`` checkpoints, ``--max-steps`` —
    can only land on multiples of K. Rather than silently shifting those
    semantics, any cadence that is not a multiple of K is rejected here
    with an actionable message (the multihost stop consensus additionally
    REQUIRES every host to poll at the same call count — lockstep holds
    because all hosts share one K)."""
    k = int(getattr(args, "steps_per_call", 1) or 1)
    if k <= 1:
        return 1
    if not args.device_store or args.debug:
        raise SystemExit(
            "--steps-per-call > 1 requires --device-store without --debug: "
            "only the fused single-dispatch iteration can scan steps on "
            "device (host-fed paths need a host round trip per step)"
        )
    bad = [f"{name}={value}" for name, value in (
        ("--iters-per-epoch", args.iters_per_epoch),
        ("--print-freq", args.print_freq),
        ("--save-every", args.save_every),
        ("--max-steps", args.max_steps),
    ) if value and value % k]
    if bad:
        raise SystemExit(
            f"--steps-per-call {k}: {', '.join(bad)} must be multiples of "
            "K — chunk boundaries are the only report/checkpoint/stop "
            "points of a scanned run"
        )
    return k


def pretrain_phase(args, logger, train_source_loader, val_source_loader,
                   val_source_dataset, *, source_store=None, mesh=None,
                   saver=None, stop=lambda: None):
    """Supervised source pretraining (``train1.py:158-181``).

    With ``source_store`` (a :class:`DeviceDataStore` sharded over ``mesh``)
    the batches come entirely from device memory (on-device gather + fused
    augmentation) and the step runs as a pjit over the mesh; otherwise the
    reference-parity host PIL loader feeds a single-device jitted step.

    ``stop()`` (a signum, or None) is polled at every iteration boundary:
    the reference pretrain schedule is 70 epochs, so preemption must drain
    gracefully here too, not only in the DA loop. On a stop the current
    model variables land in ``checkpoints/pretrain_interrupt`` and the
    function returns None — the caller exits 0 (container-stop contract)
    and a later run continues with ``--pretrain`` on that path (epoch
    schedule restarts; optimizer momentum is not part of a warm start,
    matching what ``--pretrain`` transfers).
    """
    model = build_model(args, multi_head=False)
    state = create_pretrain_state(
        model, jax.random.key(args.seed), image_size=args.image_size,
        momentum=args.momentum, weight_decay=args.wd,
    )
    if args.imagenet_pth:
        variables = ckpt.load_imagenet_backbone(
            args.imagenet_pth, variables_of(state)
        )
        state = state.replace(
            params=dict(variables["params"]),
            batch_stats=dict(variables["batch_stats"]),
        )
    if source_store is not None:
        # one fused program per iteration: on-device gather + augmentation +
        # targets + the supervised step, single dispatch (train/fused.py)
        from dahpe_tpu.train import make_fused_pretrain_iteration, seed_key

        fused = make_fused_pretrain_iteration(
            model, mesh, source_store, args.batch_size,
            image_size=args.image_size, heatmap_size=args.heatmap_size,
            rotation=args.rotation, scale_range=tuple(args.resize_scale),
            steps_per_call=validate_steps_per_call(args),
        )
        state = replicate(state, mesh)
        key_buf = seed_key(mesh, jax.random.key(args.seed + 7))

        def run_iteration(state, lr):
            nonlocal key_buf
            state, metrics, key_buf = fused(state, key_buf, lr)
            return state, metrics
    else:
        step_fn = jax.jit(make_pretrain_step(model))
        source_iter = ForeverIterator(lambda: iter(train_source_loader))

        def next_batch():
            return finalize_batch(
                next(source_iter),
                heatmap_size=(args.heatmap_size,) * 2,
                image_size=(args.image_size,) * 2,
            )

        def run_iteration(state, lr):
            return step_fn(state, next_batch(), lr)
    eval_step = make_eval_step(model)
    pretrain_path = logger.get_checkpoint_path("pretrain")
    # the reference starts at 0 (train1.py:165) and would never write the
    # checkpoint if val acc stayed <= 0; -inf guarantees a checkpoint exists
    best_acc = float("-inf")
    chunk = validate_steps_per_call(args) if source_store is not None else 1

    for epoch in range(args.pretrain_epochs):
        lr = args.lr * pretrain_lr_factor(
            epoch, milestones=tuple(args.lr_step), factor=args.lr_factor
        )
        print(f"pretrain epoch {epoch} lr {lr:.2e}")
        # one upload per epoch; a per-iteration host scalar would cost a
        # full transport round-trip every step
        lr_dev = jnp.asarray(lr, jnp.float32)
        batch_time = AverageMeter("Time", ":4.2f")
        losses = AverageMeter("Loss (s)", ":.2e")
        accs = AverageMeter("Acc (s)", ":3.2f")
        progress = ProgressMeter(
            args.iters_per_epoch, [batch_time, losses, accs],
            prefix=f"Epoch: [{epoch}]",
        )
        end = time.time()
        for i in range(0, args.iters_per_epoch, chunk):
            state, metrics = run_iteration(state, lr_dev)
            if i % args.print_freq == 0:
                loss_now = float(metrics["loss_s"])
                check_finite(saver, logger, state, epoch * args.iters_per_epoch + i,
                             loss_s=loss_now)
                losses.update(loss_now)
                accs.update(float(metrics["acc_s"]))
                batch_time.update(time.time() - end)
                progress.display(i)
            end = time.time()
            signum = stop()
            if signum is not None:
                path = logger.get_checkpoint_path("pretrain_interrupt")
                check_finite(saver, logger, state,
                             epoch * args.iters_per_epoch + i,
                             loss_s=float(metrics["loss_s"]))
                if saver is not None:
                    saver.save(path, variables_of(state))
                    saver.flush()
                else:
                    ckpt.save_state(path, variables_of(state))
                print(f"signal {signum}: finished the in-flight iteration, "
                      f"saved {path}, exiting cleanly — continue with "
                      f"--pretrain {path}")
                return None

        acc = validate(
            val_source_loader, model, variables_of(state), val_source_dataset,
            image_size=args.image_size, heatmap_size=args.heatmap_size,
            print_freq=args.print_freq, eval_step=eval_step,
        )
        if acc["all"] > best_acc:
            best_acc = acc["all"]
            if saver is not None:
                # drains behind the next epoch's compute; flushed below
                # before the caller loads the checkpoint back
                saver.save(pretrain_path, variables_of(state))
            else:
                ckpt.save_state(pretrain_path, variables_of(state))
        print(f"Source: {acc['all']:.4f} best: {best_acc:.4f}")
        logger.log_metrics(
            kind="pretrain_epoch", epoch=epoch, lr=lr,
            loss_s=losses.avg, acc_s=accs.avg, iter_time_s=batch_time.avg,
            val_source=acc, best_source=best_acc,
        )
    if saver is not None:
        saver.flush()  # the DA phase loads pretrain_path right away
    return pretrain_path


def make_stop_poller(stop_signum, poll_every: int = 1):
    """Multihost-safe graceful-stop check, polled at iteration boundaries.

    The drain path (``save_latest`` → ``fast_ckpt.save_packed``) is a
    COLLECTIVE — every process runs the pack program — so all processes must
    agree to drain at the SAME iteration. SIGTERM delivery can straddle an
    iteration boundary across hosts; a purely local flag check would have
    one process enter the save while its peers launch the next training
    step, deadlocking both (caught by the 2-process CLI rehearsal in
    tests/test_multihost.py). The local flag is therefore OR-reduced across
    processes (max of signums) by a ``process_allgather``.

    That allgather is a HOST sync: the calling host blocks until the
    collective lands, i.e. until every process's training step has
    finished — which would destroy the dispatch run-ahead the async loops
    rely on if it ran every iteration. So the returned poller counts its
    calls and runs the collective only every ``poll_every``-th call (the
    CLI passes ``--print-freq``, the cadence at which the host already
    syncs on metric fetches); between cadence points a locally-set flag is
    DEFERRED, never acted on locally — acting on it would be exactly the
    one-process-drains-alone deadlock. Every process must therefore call
    the poller exactly once per iteration so the call counters stay in
    lockstep (loop trip counts are identical across processes: same args,
    same resume point). Worst-case drain latency is ``poll_every``
    iterations — bounded and cheap next to a preemption grace period.
    Single-process runs skip all of this and take the plain local check
    every call: no collective, no host sync, zero cost.
    """
    calls = 0

    def poll() -> int | None:
        nonlocal calls
        local = stop_signum[0] if stop_signum else 0
        if jax.process_count() == 1:
            return local or None
        calls += 1
        if calls % max(poll_every, 1):
            return None
        from jax.experimental import multihost_utils

        agreed = int(
            np.max(multihost_utils.process_allgather(np.int32(local)))
        )
        return agreed or None

    return poll


def main(args):
    from dahpe_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    if getattr(args, "multihost", False):
        # Explicit coordinator config via the DAHPE_COORDINATOR env contract
        # (torchrun-style) for clusters jax's auto-detection doesn't know
        # (and for the 2-process CPU rehearsal in tests/test_multihost.py);
        # on TPU pods the no-arg call auto-detects everything.  Bring-up is
        # timeout-bounded and retried (VERDICT r4: a bare initialize lost a
        # coordinator race under host load) — parallel/distributed.py.
        from dahpe_tpu.parallel import robust_distributed_initialize

        robust_distributed_initialize()
    logger = RunLogger(args.log, args.phase)
    # checkpoint writes drain on a worker thread behind the next epoch's
    # compute (a concurrent D2H measured zero step slowdown): the flagship
    # state is ~460 MB and a synchronous drain through a slow device link
    # would stall the loop for tens of seconds per save (docs/PERF.md)
    saver = fast_ckpt.AsyncSaver()

    # Preemption contract (SURVEY §5: the reference has none — recovery is
    # manual per-epoch --resume): SIGTERM/SIGINT request a graceful stop; the
    # in-flight iteration finishes, the current state is checkpointed and the
    # process exits 0 — the preemptible-TPU story, mirroring cli/serve's
    # drain-on-SIGTERM. Installed BEFORE the pretrain phase so a 70-epoch
    # pretraining run is covered too (a default SIGTERM would kill the
    # process mid-TPU-dispatch, which wedges this environment's chip).
    # --save-every N additionally bounds hard-kill loss to N DA iterations.
    import signal

    stop_signum: list[int] = []  # handler appends; loops poll at boundaries

    def _request_stop(signum, frame):
        # flag-only: a print() here can re-enter the buffered writer the
        # main thread is inside (RuntimeError: reentrant call) and crash
        # the very drain path this handler exists to protect — the loops
        # announce the stop at the next iteration boundary instead
        if stop_signum:
            # second signal: stop being graceful (e.g. a double ctrl-C
            # while a long validation sweep delays the iteration boundary)
            restore_handlers()
            signal.raise_signal(signum)
            return
        stop_signum.append(signum)

    prev_handlers = {
        s: signal.signal(s, _request_stop)
        for s in (signal.SIGTERM, signal.SIGINT)
    }

    def restore_handlers():
        for s, h in prev_handlers.items():
            signal.signal(s, h)

    # tee + handlers are process-global: un-install them even when a phase
    # raises (DivergenceError etc.) — an escaped exception must not leave
    # stdout redirected into the run log
    try:
        _run_phases(args, logger, saver, stop_signum)
    finally:
        restore_handlers()
        logger.close()


def _run_phases(args, logger, saver, stop_signum):
    print(args)
    random.seed(args.seed)
    np.random.seed(args.seed)

    (train_source, val_source, train_target, val_target) = build_datasets(args)
    # train loaders come up directly in their production mode (PIL host
    # transforms, raw-for-device-aug, or fused C++ warp) — nothing is built
    # and thrown away. Under --device-store the DA loop needs no host
    # loaders at all (the dataset lives in HBM; see data/device_store.py).
    loader_mode = train_loader_mode(args)
    if args.device_store:
        # train AND val data live in HBM (stores built with the mesh below);
        # host val loaders are only needed for the standalone test phase
        train_source_loader = train_target_loader = None
        val_source_loader = val_target_loader = None
        if args.phase == "test":
            val_source_loader = build_val_loader(args, val_source)
            val_target_loader = build_val_loader(args, val_target)
    else:
        (train_source_loader, val_source_loader,
         train_target_loader, val_target_loader) = build_loaders(
            args, train_source, val_source, train_target, val_target,
            train_mode=loader_mode,
        )
        print("Source train:", len(train_source_loader))
        print("Target train:", len(train_target_loader))
    if val_source_loader is not None:
        print("Source test:", len(val_source_loader))
        print("Target test:", len(val_target_loader))

    # the data mesh + (optional) device-resident stores are shared by the
    # pretrain and DA phases, so they come up before either
    mesh = stores = None
    if args.phase == "train":
        n_dev = math.gcd(args.batch_size, len(jax.devices()))
        mesh = create_mesh(jax.devices()[:n_dev])
        if n_dev < len(jax.devices()):
            print(
                f"using {n_dev}/{len(jax.devices())} devices "
                f"(batch {args.batch_size} must divide evenly)"
            )
        if args.device_store:
            # the whole train set lives in HBM: each batch is ONE on-device
            # program (sample gather + fused augmentation + targets) — no
            # host loader, no H2D traffic on the training critical path
            from dahpe_tpu.cli.common import maybe_decoded_cache
            from dahpe_tpu.data.device_store import DeviceDataStore

            stores = {}
            for name, ds in (("source", train_source),
                             ("target", train_target)):
                stores[name] = DeviceDataStore(
                    maybe_decoded_cache(args, ds), mesh=mesh
                )
                print(f"device store ({name}): {stores[name].n} samples, "
                      f"{stores[name].nbytes() / 1e9:.2f} GB HBM")
            # val sets too: per-epoch validation is a pure on-device sweep
            from dahpe_tpu.cli.common import build_device_val_loader

            val_source_loader = build_device_val_loader(
                args, val_source, mesh=mesh, name="source"
            )
            val_target_loader = build_device_val_loader(
                args, val_target, mesh=mesh, name="target"
            )
            print("Source test:", len(val_source_loader))
            print("Target test:", len(val_target_loader))

    model = build_model(args, multi_head=True)
    state = create_da_state(
        model, jax.random.key(args.seed), image_size=args.image_size,
        with_ema=args.with_ema, momentum=args.momentum, weight_decay=args.wd,
    )

    start_epoch = 0
    start_iter = 0
    resume_aux = {}  # sampling-key buffers + best-acc watermark (save_aux)
    if args.resume:
        state = ckpt.restore_state(args.resume, state)
        resume_aux = ckpt.load_aux(args.resume)
        start_epoch = int(state.step) // args.iters_per_epoch
        # a mid-epoch 'latest' checkpoint (--save-every / SIGTERM) resumes at
        # the exact iteration it stopped on; epoch checkpoints land on the
        # boundary, where this is 0 (unchanged behavior)
        start_iter = int(state.step) % args.iters_per_epoch
        # "(with stream keys)" must track the keys specifically — soak.py
        # asserts on it as evidence the sampling streams truly continued; a
        # best_acc-only sidecar (host-loader run) must not claim it
        print(
            f"resumed from {args.resume} at epoch {start_epoch}"
            + (f" iteration {start_iter}" if start_iter else "")
            + (" (with stream keys)" if "key_s" in resume_aux else "")
        )
    else:
        pretrain_path = args.pretrain
        if (pretrain_path is None and args.phase == "train"
                and args.pretrain_epochs > 0):
            print("Pretraining the model on source domain.")
            if stores is not None:
                # fully on-device pretraining from the source store
                pretrain_source_loader = None
            else:
                # pretraining consumes PIL-transformed batches regardless of
                # the DA loaders' mode (finalize_batch wants image/keypoint2d)
                pretrain_source_loader = (
                    train_source_loader
                    if loader_mode == "pil"
                    else build_train_loader(args, train_source, mode="pil")
                )
            pretrain_path = pretrain_phase(
                args, logger, pretrain_source_loader, val_source_loader,
                val_source,
                source_store=stores["source"] if stores else None,
                mesh=mesh, saver=saver,
                stop=make_stop_poller(stop_signum, args.print_freq),
            )
            if pretrain_path is None:  # graceful stop during pretraining
                saver.close()
                return
        if pretrain_path is not None:
            variables = variables_of(state)
            # Multi-host: ONLY process 0 reads the checkpoint. Writes are
            # process-0-gated (fast_ckpt.save_packed), so on per-host log
            # dirs the file does not even exist elsewhere, and on a shared
            # filesystem a non-zero host could race the async writer. The
            # warm-start weights are shipped over the wire instead — one
            # ~model-sized broadcast, the standard JAX multihost-restore
            # pattern (caught by the 2-process rehearsal in
            # tests/test_multihost.py: process 1 crashed on this load).
            if jax.process_index() == 0:
                if pretrain_path.endswith(".pth"):
                    variables = ckpt.load_reference_pth(
                        pretrain_path, variables, strict=False
                    )
                else:
                    pre = ckpt.load_model_variables(pretrain_path)
                    # key-filtered warm start (train1.py:184-189): backbone
                    # + upsampling transfer; the pretrain head's Conv1x1
                    # keys do not exist in the multi-head model and are
                    # dropped
                    from dahpe_tpu.utils.torch_import import filtered_update

                    variables = filtered_update(variables, pre)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                variables = multihost_utils.broadcast_one_to_all(
                    jax.device_get(variables)
                )
            state = state.replace(
                params=dict(variables["params"]),
                batch_stats=dict(variables["batch_stats"]),
            )
            if args.with_ema:
                state = state.replace(
                    ema_params=jax.tree.map(jnp.copy, state.params),
                    ema_batch_stats=jax.tree.map(jnp.copy, state.batch_stats),
                )

    visualize = make_visualizer(train_source, logger) if args.debug else None
    eval_step = make_eval_step(model)

    if args.phase == "test":
        src_acc = validate(val_source_loader, model, variables_of(state), val_source,
                           image_size=args.image_size, heatmap_size=args.heatmap_size,
                           print_freq=args.print_freq, eval_step=eval_step)
        tgt_acc = validate(val_target_loader, model, variables_of(state), val_target,
                           image_size=args.image_size, heatmap_size=args.heatmap_size,
                           print_freq=args.print_freq, eval_step=eval_step)
        print(f"Source: {src_acc['all']:4.3f} Target: {tgt_acc['all']:4.3f}")
        for name, acc in tgt_acc.items():
            print(f"{name}: {acc:4.3f}")
        logger.log_metrics(
            kind="eval", val_source=src_acc["all"], val_target=tgt_acc,
        )
        return

    # --- DA training over the device mesh --------------------------------
    chunk = validate_steps_per_call(args)
    if start_iter % chunk:
        raise SystemExit(
            f"--resume checkpoint stops at mid-epoch iteration {start_iter}, "
            f"which is not a --steps-per-call {chunk} chunk boundary — "
            "resume with the K it was saved under (or K=1)"
        )
    step_config = dict(
        base_lr=args.lr, lr_gamma=args.lr_gamma, lr_decay=args.lr_decay,
        trade_off=args.trade_off, momentum=args.momentum, weight_decay=args.wd,
        ema_decay=args.ema_decay if args.with_ema else None,
        conf_gate=args.conf_gate or None,
    )
    state = replicate(state, mesh)

    def fresh_stream_key(i: int):
        """Seed for device key stream ``i`` (0=source, 1=target). A resumed
        run without saved stream buffers folds in the restored step so it at
        least does not REPLAY the sequence from iteration 0 (a run resumed
        WITH the sidecar continues the exact sequence instead)."""
        base = jax.random.key(args.seed)
        if int(state.step):
            base = jax.random.fold_in(base, int(state.step))
        return jax.random.fold_in(base, i)

    current_stream_aux = dict  # per-mode override below

    # host-loader on-device augmentation: fold the restored step into the
    # key sequence so a resumed run does not replay the augmentations it
    # already trained on (same contract as fresh_stream_key; the loaders'
    # sample order is epoch-seeded and advances with start_epoch)
    aug_key_base = jax.random.key(args.seed)
    if int(state.step):
        aug_key_base = jax.random.fold_in(aug_key_base, int(state.step))
    aug_keys = iter_keys(aug_key_base) if args.device_aug else None

    if args.device_store and not args.debug:
        # ONE dispatch per iteration: both stores' on-device gather +
        # augmentation + targets AND the 3-phase step in a single jitted
        # program, sampling keys advancing inside it (train/fused.py).
        # --debug falls back to the two-dispatch path below because its
        # visualization needs the batches on the host.
        from dahpe_tpu.train import make_fused_da_iteration, seed_key

        fused = make_fused_da_iteration(
            model, mesh, stores["source"], stores["target"], args.batch_size,
            image_size=args.image_size, heatmap_size=args.heatmap_size,
            rotation=args.rotation, scale_range=tuple(args.resize_scale),
            steps_per_call=chunk, **step_config,
        )
        if "key_s" in resume_aux:
            key_bufs = [
                replicate(np.asarray(resume_aux[k], np.uint32), mesh)
                for k in ("key_s", "key_t")
            ]
        else:
            key_bufs = [seed_key(mesh, fresh_stream_key(i)) for i in (0, 1)]

        def current_stream_aux():
            return {"key_s": key_bufs[0], "key_t": key_bufs[1]}

        def run_iteration(state):
            state, metrics, key_bufs[0], key_bufs[1] = fused(
                state, key_bufs[0], key_bufs[1]
            )
            return state, metrics, None, None
    elif args.device_store:
        # one seed upload per store; every iteration's sampling/augmentation
        # key then advances on device (the tunnel's per-transfer latency
        # would otherwise gate the loop — see device_store.seed_stream)
        step_fn = make_parallel_da_step(model, mesh, **step_config)

        def make_next_batch(store, stream_id):
            saved = resume_aux.get("key_s" if stream_id == 0 else "key_t")
            store.seed_stream(
                np.asarray(saved, np.uint32)
                if saved is not None
                else fresh_stream_key(stream_id)
            )

            def next_batch():
                return store.next_train_batch(
                    args.batch_size,
                    image_size=args.image_size,
                    heatmap_size=args.heatmap_size,
                    rotation=args.rotation,
                    scale_range=tuple(args.resize_scale),
                )
            return next_batch

        next_source = make_next_batch(stores["source"], 0)
        next_target = make_next_batch(stores["target"], 1)

        def current_stream_aux():
            return {"key_s": stores["source"].stream_data(),
                    "key_t": stores["target"].stream_data()}
    else:
        step_fn = make_parallel_da_step(model, mesh, **step_config)
        if args.device_aug:
            from dahpe_tpu.data.pipeline import device_train_batch

        source_iter = ForeverIterator(lambda: iter(train_source_loader))
        target_iter = ForeverIterator(lambda: iter(train_target_loader))

        def next_batch(it):
            if args.device_aug:
                batch = device_train_batch(
                    next(it), next(aug_keys),
                    image_size=args.image_size,
                    heatmap_size=args.heatmap_size,
                    rotation=args.rotation,
                    scale_range=tuple(args.resize_scale),
                )
            else:
                batch = finalize_batch(
                    next(it),
                    heatmap_size=(args.heatmap_size,) * 2,
                    image_size=(args.image_size,) * 2,
                )
            return shard_batch(batch, mesh)

        next_source = lambda: next_batch(source_iter)  # noqa: E731
        next_target = lambda: next_batch(target_iter)  # noqa: E731

    if not (args.device_store and not args.debug):
        def run_iteration(state):
            b_s, b_t = next_source(), next_target()
            state, metrics = step_fn(state, b_s, b_t)
            return state, metrics, b_s, b_t

    # watermark survives resume: a post-resume epoch must not overwrite
    # checkpoints/best unless it actually beats the pre-crash best
    best_acc = float(resume_aux.get("best_acc", float("-inf")))

    def save_latest():
        # closes over the loop's current `state` binding; resuming this
        # checkpoint lands mid-epoch (start_iter above) and, on the
        # device-store paths, continues the batch sequence bit-identically
        # (tests/test_preempt.py). Enqueued async: --save-every keeps
        # training while the write drains; the stop path flushes before
        # exiting.
        path = logger.get_checkpoint_path("latest")
        saver.save(path, state)
        saver.save_aux(path, best_acc=best_acc, **current_stream_aux())
        return path

    print("Start regression domain adaptation.")
    # a resume point exists from step 0 on: a preemption before the first
    # epoch-end save no longer loses the pretrain warm start, and the
    # background drain warms the device link (the FIRST bulk transfer in a
    # process runs at the link's slow cold rate — docs/PERF.md; every later
    # drain, including a SIGTERM's, then runs warm)
    save_latest()
    if args.profile:
        # steady-state device trace: compile+warm first so the capture holds
        # only real iterations (SURVEY §5: the reference has no profiler)
        import os

        from dahpe_tpu.utils import profiling

        for _ in range(2):
            state, metrics, _, _ = run_iteration(state)
        jax.block_until_ready(metrics["loss_s"])
        tracedir = os.path.join(args.log, "trace")
        with profiling.trace(tracedir):
            for _ in range(args.profile):
                state, metrics, _, _ = run_iteration(state)
            jax.block_until_ready(metrics["loss_s"])
        print(f"profiler trace ({args.profile} iters) -> {tracedir}")
    # host-side mirror of state.step (re-synced here so --profile's warmup
    # iterations count): fetching the device scalar every iteration would
    # pay this environment's ~26 ms transfer latency per step
    global_step = int(jax.device_get(state.step))
    if args.max_steps and global_step >= args.max_steps:
        print(f"--max-steps {args.max_steps} already reached "
              f"(step {global_step}); nothing to do")
        return
    poll_stop = make_stop_poller(stop_signum, args.print_freq)
    for epoch in range(start_epoch, args.epochs):
        logger.set_epoch(epoch)
        batch_time = AverageMeter("Time", ":4.2f")
        losses_s = AverageMeter("Loss (s)", ":.2e")
        losses_gf = AverageMeter("Loss (t, false)", ":.2e")
        losses_gt = AverageMeter("Loss (t, truth)", ":.2e")
        acc_s = AverageMeter("Acc (s)", ":3.2f")
        acc_t = AverageMeter("Acc (t)", ":3.2f")
        progress = ProgressMeter(
            args.iters_per_epoch,
            [batch_time, losses_s, losses_gf, losses_gt, acc_s, acc_t],
            prefix=f"Epoch: [{epoch}]",
        )
        end = time.time()
        first_iter = start_iter if epoch == start_epoch else 0
        for i in range(first_iter, args.iters_per_epoch, chunk):
            state, metrics, b_s, b_t = run_iteration(state)
            global_step += chunk
            if i % args.print_freq == 0:
                check_finite(saver, logger, state, global_step,
                             loss_s=float(metrics["loss_s"]),
                             loss_gf=float(metrics["loss_gf"]),
                             loss_gt=float(metrics["loss_gt"]))
                losses_s.update(float(metrics["loss_s"]))
                losses_gf.update(float(metrics["loss_gf"]))
                losses_gt.update(float(metrics["loss_gt"]))
                acc_s.update(float(metrics["acc_s"]))
                acc_t.update(float(metrics["acc_t"]))
                batch_time.update(time.time() - end)
                progress.display(i)
                if visualize is not None:
                    scale = args.image_size / args.heatmap_size
                    pred_s = np.asarray(metrics["pred_s"])[0] * scale
                    pred_t = np.asarray(metrics["pred_t"])[0] * scale
                    visualize(np.asarray(b_s["image"][0]), pred_s,
                              f"source_{i}_pred")
                    visualize(np.asarray(b_t["image"][0]), pred_t,
                              f"target_{i}_pred")
            end = time.time()
            budget_done = args.max_steps and global_step >= args.max_steps
            stop_sig = poll_stop()
            if stop_sig or budget_done:
                if stop_sig:
                    print(f"signal {stop_sig}: finished the in-flight "
                          "iteration, saving checkpoints/latest, then "
                          "exiting cleanly")
                # gate: divergence inside the last print window must not be
                # persisted as the advertised resume point
                check_finite(saver, logger, state, global_step,
                             **da_losses_host(metrics))
                path = save_latest()
                saver.close()  # the write must land before the exit
                why = ("--max-steps reached" if budget_done
                       else "stop requested")
                print(f"{why} at step {global_step} "
                      f"(epoch {epoch} iteration {i}); saved {path} — "
                      f"continue with --resume {path}")
                return
            if args.save_every and global_step % args.save_every == 0:
                check_finite(saver, logger, state, global_step,
                             **da_losses_host(metrics))
                save_latest()

        # the epoch checkpoint below is finiteness-gated too: divergence in
        # the final print window of an epoch must not be persisted (or pay
        # for a validation sweep of NaN predictions)
        check_finite(saver, logger, state, global_step,
                     **da_losses_host(metrics))
        src_acc = validate(val_source_loader, model, variables_of(state), val_source,
                           image_size=args.image_size, heatmap_size=args.heatmap_size,
                           print_freq=args.print_freq, eval_step=eval_step)
        tgt_acc = validate(val_target_loader, model, variables_of(state), val_target,
                           image_size=args.image_size, heatmap_size=args.heatmap_size,
                           print_freq=args.print_freq,
                           visualize=make_visualizer(val_target, logger) if args.debug else None,
                           eval_step=eval_step)

        epoch_path = logger.get_checkpoint_path(epoch)
        saver.save(epoch_path, state)
        if args.with_ema:
            saver.save(
                logger.get_checkpoint_path("model_ema"),
                {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
            )
            # validate2 counterpart (train1.py:243,270): evaluate the EMA twin
            ema_acc = validate(
                val_target_loader, model,
                {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
                val_target, image_size=args.image_size,
                heatmap_size=args.heatmap_size, print_freq=args.print_freq,
                eval_step=eval_step,
            )
            print(f"ema: {ema_acc['all']:4.3f}")
        if tgt_acc["all"] > best_acc:
            best_acc = tgt_acc["all"]
            # identical bytes to the epoch save just enqueued: duplicate it
            # host-side (hardlinks) instead of paying a second device drain
            saver.link(epoch_path, logger.get_checkpoint_path("best"))
            saver.save_aux(logger.get_checkpoint_path("best"),
                           best_acc=best_acc, **current_stream_aux())
        # aux AFTER the best update so the epoch checkpoint records the
        # current watermark + the post-epoch sampling-key buffers: restoring
        # it continues the exact batch sequence (tests/test_resume.py)
        saver.save_aux(epoch_path,
                       best_acc=best_acc, **current_stream_aux())
        if args.keep_checkpoints > 0:
            # ordered after the pending saves on the worker — never prunes
            # a directory a queued job is still writing or linking from
            saver.run(lambda d=logger.checkpoint_directory,
                      k=args.keep_checkpoints:
                      ckpt.prune_epoch_checkpoints(d, k))
        print(
            f"Source: {src_acc['all']:4.3f} Target: {tgt_acc['all']:4.3f} "
            f"Target(best): {best_acc:4.3f}"
        )
        for name, acc in tgt_acc.items():
            print(f"{name}: {acc:4.3f}")
        logger.log_metrics(
            kind="da_epoch", epoch=epoch, step=global_step,
            loss_s=losses_s.avg, loss_gf=losses_gf.avg, loss_gt=losses_gt.avg,
            acc_s=acc_s.avg, acc_t=acc_t.avg, iter_time_s=batch_time.avg,
            val_source=src_acc["all"], val_target=tgt_acc,
            best_target=best_acc,
            **({"val_target_ema": ema_acc["all"]} if args.with_ema else {}),
        )

    saver.close()


if __name__ == "__main__":
    try:
        main(build_parser("train").parse_args())
    except DivergenceError as e:
        print(f"FATAL: {e}")
        raise SystemExit(3)  # distinct from crashes: retry wants lower lr,
        #                      not the same command again
