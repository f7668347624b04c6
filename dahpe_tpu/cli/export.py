"""Serving-export CLI: checkpoint → portable StableHLO artifact.

``python -m dahpe_tpu.cli.export <checkpoint> -o model.stablehlo`` loads an
orbax checkpoint (or a reference torch ``.pth``, via the importer) and
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
                   help="orbax checkpoint dir or reference .pth")
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
    return p


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
    save_predict(
        args.output, model, variables,
        batch_size=args.batch_size, image_size=args.image_size,
        heatmap_size=args.heatmap_size, uint8_input=args.uint8_input,
    )
    weights = args.output + ".weights.npz"
    save_variables_npz(weights, variables)
    import os

    b = args.batch_size if args.batch_size is not None else "polymorphic"
    print(
        f"exported {args.arch}@{args.image_size} (batch {b}) "
        f"-> {args.output} ({os.path.getsize(args.output)} bytes) "
        f"+ {weights} ({os.path.getsize(weights)} bytes)"
    )


if __name__ == "__main__":
    main(build_export_parser().parse_args())
