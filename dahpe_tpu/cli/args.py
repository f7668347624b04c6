"""Shared argparse flags, mirroring the reference CLI (``train1.py:602-674``)."""

from __future__ import annotations

import argparse

from dahpe_tpu import models
from dahpe_tpu.data import DATASETS


def build_parser(phase: str = "train") -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native domain-adaptive hand keypoint detection"
    )
    parser.add_argument("target_root", help="root path of the target dataset")
    parser.add_argument("--source_root", default="data/RHD", help="root of source dataset")
    parser.add_argument("-s", "--source", default="RenderedHandPose",
                        choices=sorted(DATASETS))
    parser.add_argument("-t", "--target", choices=sorted(DATASETS), required=True)
    parser.add_argument("--resize-scale", nargs="+", type=float, default=(0.6, 1.3))
    parser.add_argument("--rotation", type=int, default=180)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--heatmap-size", type=int, default=64)
    parser.add_argument("-a", "--arch", default="resnet101",
                        choices=sorted(models.BACKBONES))
    parser.add_argument("--pretrain", type=str, default=None,
                        help="pretrained checkpoint (checkpoint dir or reference .pth)")
    parser.add_argument("--imagenet-pth", type=str, default=None,
                        help="torchvision ImageNet .pth for backbone init "
                             "(this environment has no network egress)")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--num-head-layers", type=int, default=2)
    parser.add_argument("--trade-off", default=1.0, type=float)
    parser.add_argument("-b", "--batch-size", default=32, type=int)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--wd", "--weight-decay", default=1e-4, type=float, dest="wd")
    parser.add_argument("--lr-gamma", default=1e-4, type=float)
    parser.add_argument("--lr-decay", default=0.75, type=float)
    parser.add_argument("--lr-step", default=[45, 60], nargs="+", type=int)
    parser.add_argument("--lr-factor", default=0.1, type=float)
    parser.add_argument("-j", "--workers", default=4, type=int)
    parser.add_argument("--pretrain-epochs", default=70, type=int)
    parser.add_argument("--epochs", default=200, type=int)
    parser.add_argument("-i", "--iters-per-epoch", default=500, type=int)
    parser.add_argument("-p", "--print-freq", default=100, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--log", type=str, default="logs/mt")
    parser.add_argument("--phase", type=str, default=phase, choices=["train", "test"])
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--profile", default=0, type=int, metavar="N",
                        help="capture a jax.profiler device trace of N "
                             "steady-state DA iterations (written under "
                             "{log}/trace, TensorBoard-viewable)")
    parser.add_argument("--keep-checkpoints", default=0, type=int,
                        metavar="N",
                        help="retain only the newest N per-epoch checkpoint "
                             "dirs (best/model_ema/pretrain are never "
                             "pruned); 0 keeps all — long production runs "
                             "save a full optimizer+EMA state every epoch")
    parser.add_argument("--save-every", default=0, type=int, metavar="N",
                        help="write a mid-epoch 'latest' checkpoint (full "
                             "state + stream-key sidecar) every N DA "
                             "iterations; 0 = per-epoch only. Preemptible "
                             "TPU runs bound their lost work to N "
                             "iterations; --resume from 'latest' continues "
                             "mid-epoch, bit-identically on the "
                             "device-store path")
    parser.add_argument("--max-steps", default=0, type=int, metavar="N",
                        help="stop after N total DA optimizer steps (across "
                             "resumes), saving the 'latest' checkpoint and "
                             "exiting cleanly; 0 = no limit. Budget-bound "
                             "runs and preemption drills")
    parser.add_argument("--ema-decay", default=0.99, type=float,
                        help="EMA-twin decay. The reference fixes 0.999 "
                             "(train1.py:667) untuned; the r5 sweep "
                             "(docs/ACCURACY.md) measured 0.99 as the only "
                             "decay whose EMA beats the live model's "
                             "end-of-run PCK on both studied shifts — "
                             "0.999's ~1000-iter horizon averages straight "
                             "over pseudo-label drift")
    parser.add_argument("--conf-gate", default=0.0, type=float, metavar="Q",
                        help="drop the per-joint fraction Q of least-"
                             "confident target pseudo-labels in the "
                             "adversarial steps (batch-relative peak-"
                             "activation quantile; drift mitigation — "
                             "docs/ACCURACY.md). 0 = off, the reference "
                             "behavior (train1.py trusts every label)")
    parser.add_argument("--with-ema", action="store_true",
                        help="maintain + update the EMA twin each iteration "
                             "(the reference creates it but leaves the update "
                             "commented out, train1.py:461)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute dtype (fp32 params)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() so the mesh "
                             "spans all hosts; each host loads a disjoint "
                             "data shard")
    parser.add_argument("--device-store", action="store_true",
                        help="upload the pre-decoded dataset to HBM once "
                             "(data/device_store.py) and run the ENTIRE "
                             "train input path on device: per-iteration "
                             "sample gather + fused augmentation + Gaussian "
                             "targets, zero host traffic. Requires the "
                             "dataset to fit in HBM as uint8 crops; combine "
                             "with --decoded-cache to make the one-time "
                             "upload decode-free")
    parser.add_argument("--steps-per-call", default=1, type=int, metavar="K",
                        help="scan K consecutive train iterations inside "
                             "each fused dispatch (train/fused.py): the "
                             "per-dispatch host/link overhead is amortized "
                             "K-fold (measured 78.3 -> 74.3 ms/iter at K=20 "
                             "through this environment's tunneled link, "
                             "docs/PERF.md). Requires --device-store (and "
                             "not --debug); iters-per-epoch, print-freq and "
                             "any save-every/max-steps must be multiples of "
                             "K so checkpoint/report boundaries stay exact. "
                             "The batch sequence is bit-identical to K=1; "
                             "step numerics match to float-reassociation "
                             "noise, and metrics report as chunk means")
    parser.add_argument("--device-aug", action="store_true",
                        help="host threads only decode+crop; all augmentation "
                             "(fused affine warp, jitter, blur, normalize) "
                             "runs batched on the TPU")
    parser.add_argument("--decoded-cache", type=str, default=None,
                        help="directory for the pre-decoded crop cache "
                             "(data/cache.py): the decode+crop+resize prefix "
                             "is materialized once, after which train fetches "
                             "are mmap reads — removes PNG decode from the "
                             "input critical path (works with --device-aug "
                             "and --host-warp)")
    parser.add_argument("--host-warp", action="store_true",
                        help="fast path: fused C++ augmentation on the host "
                             "(one resample for rotate+crop+resize + jitter + "
                             "blur + normalize), Gaussian targets on device")
    if phase == "test":
        parser.add_argument("--checkpoint", type=str, default=None,
                            help="checkpoint to evaluate (checkpoint dir or .pth)")
        parser.add_argument("--artifact", type=str, default=None,
                            help="evaluate an EXPORTED serving artifact "
                                 "(cli.export StableHLO + sibling "
                                 ".weights.npz; float or --int8) instead of "
                                 "a checkpoint — the deployment acceptance "
                                 "run. PCK comes from the artifact's own "
                                 "decoded coordinates. The artifact must be "
                                 "float-input (no --uint8-input) and its "
                                 "export batch must equal -b (or be "
                                 "batch-polymorphic)")
    return parser
