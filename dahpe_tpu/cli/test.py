"""Evaluation CLI — the TPU-native ``test.py``.

``python -m dahpe_tpu.cli.test <target_root> -t STB --checkpoint <path>``
loads a checkpoint (packed/legacy-orbax dir, or a reference torch ``.pth`` incl. the
published ``STB_best_750.pth`` / ``H3D_best_754.pth``) and reports per-group
PCK@0.05 on the source and target test splits (``test.py:37-227`` parity).

``--artifact model.stablehlo`` instead evaluates an EXPORTED serving
artifact (``cli.export``; float or int8): same loaders and PCK grouping,
but scoring the artifact's own decoded coordinates — the deployment
acceptance run the reference has no equivalent of.
"""

from __future__ import annotations

import jax

from dahpe_tpu.cli.args import build_parser
from dahpe_tpu.cli.common import (
    build_datasets,
    build_device_val_loader,
    build_model,
    build_val_loader,
    enable_compile_cache,
    make_visualizer,
)
from dahpe_tpu.evaluate import make_eval_step, validate
from dahpe_tpu.utils import checkpoint as ckpt
from dahpe_tpu.utils.logging import RunLogger


def main(args):
    # argument contract FIRST: failing after the dataset build (and, under
    # --device-store, the full val-split decode + HBM upload through a
    # ~75 MB/s tunnel) would waste minutes on a usage error
    if (args.checkpoint is None) == (getattr(args, "artifact", None) is None):
        raise SystemExit("pass exactly one of --checkpoint / --artifact")
    enable_compile_cache()
    logger = RunLogger(args.log, "test")
    print(args)

    # evaluation needs only the two val splits — no train datasets/loaders
    (_, val_source, _, val_target) = build_datasets(args, val_only=True)
    if args.device_store:
        # HBM-resident eval: through a high-latency host↔device transport
        # (this environment's tunnel: ~26 ms/transfer, ~75 MB/s) a host
        # loader would make the real 3.2k-image H3D sweep transfer-bound
        val_source_loader = build_device_val_loader(args, val_source,
                                                    name="source")
        val_target_loader = build_device_val_loader(args, val_target,
                                                    name="target")
    else:
        val_source_loader = build_val_loader(args, val_source)
        val_target_loader = build_val_loader(args, val_target)

    if args.artifact:
        # deployment acceptance: drive the exported StableHLO program
        # (float or int8) and score its own decoded coordinates
        from dahpe_tpu.evaluate import make_artifact_eval_step
        from dahpe_tpu.serving import load_artifact_weights, load_predict_file

        model = None
        predict = load_predict_file(args.artifact)
        variables = load_artifact_weights(args.artifact + ".weights.npz")
        print(f"loaded artifact {args.artifact}")
        eval_step = make_artifact_eval_step(
            predict, image_size=args.image_size,
            heatmap_size=args.heatmap_size,
        )
    else:
        model = build_model(args, multi_head=True)
        import jax.numpy as jnp

        template = jax.jit(
            lambda r: model.init(
                r,
                jnp.zeros((1, args.image_size, args.image_size, 3)),
                train=False,
                gl_coeff=0.0,
            )
        )(jax.random.key(0))
        if args.checkpoint.endswith(".pth"):
            variables = ckpt.load_reference_pth(
                args.checkpoint, template, strict=True
            )
        else:
            variables = ckpt.load_model_variables(args.checkpoint)
        print(f"loaded {args.checkpoint}")
        eval_step = make_eval_step(model)
    visualize = make_visualizer(val_target, logger) if args.debug else None
    src_acc = validate(
        val_source_loader, model, variables, val_source,
        image_size=args.image_size, heatmap_size=args.heatmap_size,
        print_freq=args.print_freq, eval_step=eval_step,
    )
    tgt_acc = validate(
        val_target_loader, model, variables, val_target,
        image_size=args.image_size, heatmap_size=args.heatmap_size,
        print_freq=args.print_freq, visualize=visualize, eval_step=eval_step,
    )
    print(f"Source: {src_acc['all']:4.3f} Target: {tgt_acc['all']:4.3f}")
    for name, acc in tgt_acc.items():
        print(f"{name}: {acc:4.3f}")
    logger.log_metrics(
        kind="eval", checkpoint=args.checkpoint,
        val_source=src_acc["all"], val_target=tgt_acc,
    )
    logger.close()


if __name__ == "__main__":
    main(build_parser("test").parse_args())
