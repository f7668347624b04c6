"""Calibrate the CONTENT shift: source-only target PCK over a (shift, content) grid.

Companion to :mod:`dahpe_tpu.experiments.adaptation` and the r3 photometric
shift study (docs/ACCURACY.md "Shift calibration"). The pseudo-label minimax
needs a partially-competent source model to bootstrap from (the reference's
own RHD→H3D regime: source-only 61.8 → DA 75.4 PCK,
``/root/reference/README.md:40-41``) — so before running the content-shift
acceptance we measure where a fixed source-only model lands as a function of
the geometry/style ``content`` knob (``data/synthetic.py``), at each
photometric ``shift``. One pretrain, many evaluations: the source model does
not depend on the target parameters.

Usage::

    python -m dahpe_tpu.experiments.content_calibration \
        --shifts 0,0.3 --contents 0.3,0.5,0.7,1.0 --json /tmp/calib.json
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def run_calibration(
    *,
    arch: str = "resnet18",
    n_train: int = 512,
    n_val: int = 128,
    image_size: int = 128,
    heatmap_size: int = 32,
    batch: int = 32,
    pre_iters: int = 4000,
    pretrain_lr: float = 1e-3,
    rotation: float = 30.0,
    scale_range=(0.75, 1.25),
    raw_size: int = 160,
    shifts=(0.0, 0.3),
    contents=(0.0, 0.3, 0.5, 0.7, 1.0),
    style=None,
    seed: int = 0,
    bf16: bool = False,
    verbose: bool = True,
) -> dict:
    """Returns ``{"source_val": pck, "grid": [{"shift", "content", "pck"}…]}``."""
    from dahpe_tpu import models
    from dahpe_tpu.cli.common import enable_compile_cache
    from dahpe_tpu.data.device_store import DeviceDataStore
    from dahpe_tpu.data.synthetic import SyntheticHands
    from dahpe_tpu.evaluate import make_eval_step, validate
    from dahpe_tpu.models.resnet import Bottleneck
    from dahpe_tpu.parallel import create_mesh, replicate
    from dahpe_tpu.train import (
        create_pretrain_state,
        make_fused_pretrain_iteration,
        seed_key,
    )

    enable_compile_cache()

    def log(msg):
        if verbose:
            print(msg, flush=True)

    mesh = create_mesh(jax.devices()[:1])
    dtype = jnp.bfloat16 if bf16 else None

    mk = dict(n=n_train, seed=seed, image_size=(image_size,) * 2,
              heatmap_size=(heatmap_size,) * 2)
    src_train = SyntheticHands(domain="source", split="train", **mk)
    src_store = DeviceDataStore(src_train, mesh=mesh, raw_size=raw_size,
                                verbose=False)

    if arch == "mini":
        backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1],
                                 dtype=dtype)
    else:
        backbone = models.get_backbone(arch, dtype=dtype)
    model = models.PoseResNet(backbone=backbone, num_keypoints=21,
                              dtype=dtype)
    state = replicate(
        create_pretrain_state(model, jax.random.key(seed),
                              image_size=image_size, batch_size=batch),
        mesh,
    )
    fused = make_fused_pretrain_iteration(
        model, mesh, src_store, batch, image_size=image_size,
        heatmap_size=heatmap_size, rotation=rotation,
        scale_range=tuple(scale_range),
    )
    key = seed_key(mesh, jax.random.key(seed + 100))
    lr = replicate(np.float32(pretrain_lr), mesh)
    t0 = time.time()
    for i in range(pre_iters):
        state, m, key = fused(state, key, lr)
        if verbose and (i + 1) % 1000 == 0:
            log(f"  pretrain {i + 1}/{pre_iters} "
                f"loss={float(m['loss_s']):.4f} acc_s={float(m['acc_s']):.3f}")
    state_vars = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(model)
    log(f"pretrain done in {time.time() - t0:.0f}s")

    def _pck(dataset):
        store = DeviceDataStore(dataset, mesh=mesh, shard_samples=False,
                                raw_size=image_size, verbose=False)
        loader = store.eval_loader(batch, heatmap_size=heatmap_size)
        return float(validate(
            loader, model, state_vars, dataset, image_size=image_size,
            heatmap_size=heatmap_size, print_freq=10 ** 9,
            eval_step=eval_step,
        )["all"])

    mkv = dict(mk, n=n_val)
    src_pck = _pck(SyntheticHands(domain="source", split="test", **mkv))
    log(f"source-val PCK {src_pck:.3f}")
    grid = []
    for shift in shifts:
        for content in contents:
            pck = _pck(SyntheticHands(domain="target", split="test",
                                      shift=shift, content=content,
                                      style=style, **mkv))
            grid.append({"shift": float(shift), "content": float(content),
                         "style": float(content if style is None else style),
                         "pck": pck})
            log(f"  shift={shift:<4} content={content:<4} "
                f"source-only target PCK {pck:.3f}")
    return {"source_val": src_pck, "grid": grid}


if __name__ == "__main__":
    import argparse
    import json

    def _floats(s):
        return tuple(float(x) for x in s.split(",") if x)

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--pre-iters", type=int, default=4000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--shifts", type=_floats, default=(0.0, 0.3))
    p.add_argument("--contents", type=_floats,
                   default=(0.0, 0.3, 0.5, 0.7, 1.0))
    p.add_argument("--style", type=float, default=None,
                   help="fixed rendering-style shift; default couples it "
                        "to each content value")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--json", default=None)
    a = p.parse_args()
    r = run_calibration(arch=a.arch, pre_iters=a.pre_iters, batch=a.batch,
                        shifts=a.shifts, contents=a.contents, style=a.style,
                        seed=a.seed, bf16=a.bf16)
    if a.json:
        with open(a.json, "w") as f:
            json.dump(r, f)
