"""Serving-export CLI: checkpoint → portable StableHLO artifact.

``python -m dahpe_tpu.cli.export <checkpoint> -o model.stablehlo`` loads a
checkpoint (packed dir — legacy orbax dirs and reference torch ``.pth``
files load too, via ``utils/checkpoint.py``/the importer) and
serializes the fused forward-plus-decode serving program (images →
image-space keypoints + confidences) with :mod:`dahpe_tpu.serving`
(``jax.export``). The artifact reloads with
``dahpe_tpu.serving.load_predict_file`` on any host with jax — no flax, no
model zoo, no checkpoint code. The reference has no deployment path beyond
re-running its eval script (``test.py:190-201``).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.cli.common import build_model
from dahpe_tpu.serving import save_predict, save_variables_npz
from dahpe_tpu.utils import checkpoint as ckpt


def build_export_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export the serving program (StableHLO via jax.export)"
    )
    p.add_argument("checkpoint",
                   help="checkpoint dir (packed or legacy orbax) or reference .pth")
    p.add_argument("-o", "--output", required=True,
                   help="output artifact path")
    p.add_argument("-a", "--arch", default="resnet101",
                   choices=sorted(models.BACKBONES))
    p.add_argument("--num-head-layers", type=int, default=2)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--heatmap-size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=None,
                   help="fixed batch; omit for a batch-polymorphic artifact")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute dtype (params stay fp32)")
    p.add_argument("--uint8-input", action="store_true",
                   help="artifact ingests raw uint8 HWC frames and "
                        "normalizes on device (4x fewer bytes per frame "
                        "over any transport than a float32 feed)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization (dahpe_tpu.quant): "
                        "BN-folded per-channel int8 convs on the MXU; at the "
                        "measured-best deployment point (batch 256, bf16 "
                        "glue) ~1.5x serving throughput (docs/PERF.md)")
    p.add_argument("--int8-glue", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="inter-conv activation storage dtype of the int8 "
                        "artifact; throughput is strongly batch-dependent "
                        "for either choice — see the measured batch x glue "
                        "matrix in docs/PERF.md before deploying")
    p.add_argument("--calib-npz", default=None,
                   help="calibration images for --int8: an .npz with "
                        "'images' (normalized model inputs, NHWC float) or "
                        "'frames' (raw uint8 HWC, normalized here); without "
                        "it calibration falls back to random frames — fine "
                        "for scale coverage, but pass real data for "
                        "deployment")
    p.add_argument("--calib-percentile", type=float, default=None,
                   help="robust --int8 calibration: use this percentile of "
                        "|activation| (e.g. 99.9) instead of the absolute "
                        "max, so one outlier calibration batch can't crush "
                        "the int8 resolution (quant.calibrate_act_scales)")
    return p


def _calibration_images(args) -> jnp.ndarray:
    """Normalized NHWC calibration batch for --int8: user-supplied images
    (``--calib-npz``) or, as a fallback, random frames through the ImageNet
    normalization (covers the activation-scale *range*; real data is better
    — say so on stderr)."""
    import sys

    import numpy as np

    from dahpe_tpu.data.device_aug import IMAGENET_MEAN, IMAGENET_STD

    def normalize(frames):
        x = jnp.asarray(frames, jnp.float32) / 255.0
        return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    if args.calib_npz:
        with np.load(args.calib_npz) as data:
            if "images" in data:
                return jnp.asarray(data["images"], jnp.float32)
            if "frames" in data:
                return normalize(data["frames"])
            raise SystemExit(
                f"--calib-npz {args.calib_npz}: need 'images' or 'frames'"
            )
    print(
        "--int8 without --calib-npz: calibrating on random frames "
        "(pass real data for deployment accuracy)",
        file=sys.stderr,
    )
    rng = np.random.default_rng(0)
    return normalize(
        rng.integers(0, 256, (8, args.image_size, args.image_size, 3))
    )


def main(args):
    model = build_model(args, multi_head=True)
    template = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, args.image_size, args.image_size, 3)),
            train=False, gl_coeff=0.0,
        )
    )(jax.random.key(0))
    if args.checkpoint.endswith(".pth"):
        variables = ckpt.load_reference_pth(args.checkpoint, template,
                                            strict=True)
    else:
        variables = ckpt.load_model_variables(args.checkpoint)
    weights = args.output + ".weights.npz"
    if args.int8:
        from dahpe_tpu import quant
        from dahpe_tpu.serving import export_predict_int8, save_quantized_npz

        calib = _calibration_images(args)
        qtree = quant.quantize_model(model, variables, calib,
                                     percentile=args.calib_percentile)
        blob = export_predict_int8(
            qtree, batch_size=args.batch_size, image_size=args.image_size,
            heatmap_size=args.heatmap_size, uint8_input=args.uint8_input,
            glue=args.int8_glue,
        )
        with open(args.output, "wb") as f:
            f.write(blob)
        save_quantized_npz(weights, qtree)
    else:
        save_predict(
            args.output, model, variables,
            batch_size=args.batch_size, image_size=args.image_size,
            heatmap_size=args.heatmap_size, uint8_input=args.uint8_input,
        )
        save_variables_npz(weights, variables)
    import os

    b = args.batch_size if args.batch_size is not None else "polymorphic"
    kind = " int8" if args.int8 else ""
    print(
        f"exported {args.arch}@{args.image_size}{kind} (batch {b}) "
        f"-> {args.output} ({os.path.getsize(args.output)} bytes) "
        f"+ {weights} ({os.path.getsize(weights)} bytes)"
    )


if __name__ == "__main__":
    main(build_export_parser().parse_args())
