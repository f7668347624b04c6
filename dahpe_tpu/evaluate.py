"""Validation loop: per-group PCK over a dataset.

Mirrors ``validate`` (``train1.py:495-536``): eval-mode forward (main head
only), per-batch PCK per joint, grouped via the dataset's keypoint groups,
averaged across batches weighted by batch size. The forward + metric run
jitted on device; only the tiny per-group dict returns to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dahpe_tpu.core.losses import joints_kl_loss
from dahpe_tpu.core.metrics import pck_accuracy
from dahpe_tpu.data.pipeline import finalize_batch
from dahpe_tpu.utils.meters import AverageMeter, AverageMeterDict


def make_eval_step(model):
    @jax.jit
    def eval_step(variables, batch):
        out = model.apply(variables, batch["image"], train=False, gl_coeff=0.0)
        y = out["y"] if isinstance(out, dict) else out
        # per-sample loss (mean over joints) so the host can exclude padded
        # trailing-batch rows from the reported average — a batch-mean here
        # would dilute the value by the zero-weight padding rows.
        loss_per_sample = jnp.mean(
            joints_kl_loss(y, batch["target"], batch["weight"], reduction="none"),
            axis=1,
        )
        acc_per_joint, avg_acc, cnt, pred = pck_accuracy(y, batch["target"])
        return {
            "loss_per_sample": loss_per_sample,
            "acc_per_joint": acc_per_joint,
            "avg_acc": avg_acc,
            "cnt": cnt,
            "pred": pred,
        }

    return eval_step


def make_artifact_eval_step(predict, *, image_size: int = 256,
                            heatmap_size: int = 64):
    """Eval step driving an EXPORTED serving artifact instead of a live
    model — the deployment acceptance path of ``cli.test --artifact``.

    ``predict`` is the reloaded StableHLO callable (``serving.load_predict``
    / ``load_predict_file``; float or int8 artifact alike): ``(weights,
    images) → (coords_image_px, maxvals)``. PCK is computed from the
    artifact's own decoded coordinates mapped back to heatmap pixels —
    ``coords / (image_size/heatmap_size)`` is the exact inverse of the
    artifact's decode scaling, so a float artifact reproduces the
    checkpoint's PCK bit-for-bit and an int8 artifact's PCK gap IS its
    quantization cost on real data. The artifact emits no heatmaps, so the
    KL loss is reported as NaN (coordinates are the deployment contract).
    """
    from dahpe_tpu.core.decode import get_max_preds
    from dahpe_tpu.core.metrics import calc_dists, dist_acc

    scale = image_size / heatmap_size

    @jax.jit
    def eval_step(variables, batch):
        coords, _ = predict(variables, batch["image"].astype(jnp.float32))
        pred = coords / scale  # heatmap px
        gt, _ = get_max_preds(batch["target"])
        b, h, w, _ = batch["target"].shape
        norm = jnp.ones((b, 2), jnp.float32) * jnp.asarray(
            [h, w], jnp.float32
        ) / 10.0
        dists = calc_dists(pred.astype(jnp.float32), gt, norm)
        acc = dist_acc(dists)
        valid = acc >= 0
        cnt = jnp.sum(valid)
        avg = jnp.where(
            cnt > 0,
            jnp.sum(jnp.where(valid, acc, 0.0)) / jnp.maximum(cnt, 1),
            0.0,
        )
        return {
            "loss_per_sample": jnp.full((b,), jnp.nan, jnp.float32),
            "acc_per_joint": acc,
            "avg_acc": avg,
            "cnt": cnt,
            "pred": pred,
        }

    return eval_step


def make_predict_fn(model, *, image_size: int = 256, heatmap_size: int = 64,
                    uint8_input: bool = False):
    """Serving entry: images → keypoint coordinates, one fused XLA program.

    Returns a jitted ``(variables, images (B,H,W,3)) -> (coords (B,K,2),
    maxvals (B,K,1))`` with coordinates in IMAGE pixels (heatmap argmax
    scaled by the stride, the reference's deployment decode).

    ``uint8_input=True`` makes the program ingest raw uint8 HWC frames and
    fold the ImageNet normalization into the compiled graph — deployment
    clients send camera bytes as-is and every transport link carries 4x
    fewer bytes than a pre-normalized float32 feed.
    """
    from dahpe_tpu.core.decode import get_max_preds

    scale = image_size / heatmap_size

    @jax.jit
    def predict(variables, images):
        if uint8_input:
            from dahpe_tpu.data.device_aug import IMAGENET_MEAN, IMAGENET_STD

            images = images.astype(jnp.float32) / 255.0
            images = (images - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
                IMAGENET_STD
            )
        out = model.apply(variables, images, train=False, gl_coeff=0.0)
        y = out["y"] if isinstance(out, dict) else out
        preds, maxvals = get_max_preds(y)
        return preds * scale, maxvals

    return predict


def validate(
    loader,
    model,
    variables,
    dataset,
    *,
    image_size: int = 256,
    heatmap_size: int = 64,
    visualize=None,
    print_freq: int = 100,
    eval_step=None,
) -> dict:
    """Returns the per-group PCK dict {MCP, PIP, DIP, fingertip, all}."""
    eval_step = eval_step or make_eval_step(model)
    acc = AverageMeterDict(dataset.keypoints_group.keys(), ":3.2f")
    losses = AverageMeter("Loss", ":.2e")

    full_batch = getattr(loader, "batch_size", None)
    # device-resident loaders (DeviceDataStore.eval_loader) yield finalized,
    # fixed-shape batches straight from HBM with their real row count
    prepared = getattr(loader, "device_finalized", False)

    for i, host_batch in enumerate(loader):
        if prepared:
            batch, n_real = host_batch["batch"], host_batch["n_real"]
        else:
            n_real = int(host_batch["image"].shape[0])
            if full_batch is not None and n_real < full_batch:
                # pad the trailing partial batch to a fixed shape so the
                # jitted eval step compiles exactly once (a recompile costs
                # minutes on remote TPU transports). Padded rows have
                # all-zero targets whose peak coords fail the `> 1` validity
                # filter, so they contribute nothing to PCK; the loss/meters
                # are weighted by n_real.
                pad = full_batch - n_real
                import numpy as _np

                host_batch = {
                    k: _np.concatenate(
                        [v, _np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                    )
                    for k, v in host_batch.items()
                }
            batch = finalize_batch(
                host_batch,
                heatmap_size=(heatmap_size, heatmap_size),
                image_size=(image_size, image_size),
            )
        out = eval_step(variables, batch)
        # ONE fetch for both metrics: each device_get pays the link's
        # ~26 ms round trip, and this runs once per val batch
        loss_rows, acc_per_joint = jax.device_get(
            (out["loss_per_sample"], out["acc_per_joint"])
        )
        loss_rows = loss_rows[:n_real]
        losses.update(float(loss_rows.mean()), n_real)
        group_acc = dataset.group_accuracy(list(acc_per_joint))
        acc.update(group_acc, n_real)

        if i % print_freq == 0:
            print(f"Test: [{i}/{len(loader)}]\t{losses}\tall {acc['all'].avg:.3f}")
            if visualize is not None and not prepared:
                pred = jax.device_get(out["pred"])[0]
                visualize(
                    host_batch["image"][0],
                    pred * image_size / heatmap_size,
                    f"val_{i}_pred",
                )
                visualize(
                    host_batch["image"][0],
                    host_batch["keypoint2d"][0],
                    f"val_{i}_label",
                )
    return acc.average()
