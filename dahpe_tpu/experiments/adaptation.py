"""Acceptance experiment: the 3-step DA minimax must BEAT source-only.

The reference exists to produce an adaptation gain — target PCK of the
adversarial loop (``train1.py:328-458``) over plain supervised source
training (``train1.py:278-325``). Step-for-step parity (tests/test_da_parity)
cannot show that gain; this experiment does, on the asset-free controlled
shift of :mod:`dahpe_tpu.data.synthetic`:

1. pretrain a PoseResNet on labeled SOURCE for ``pre_iters``;
2. CONTROL: continue source-only training for another ``da_iters``
   (equal gradient-update budget), evaluate target PCK;
3. DA: from the SAME pretrain state, run ``da_iters`` of the full fused
   3-step minimax with unlabeled target batches, evaluate target PCK
   (and the EMA twin when enabled).

Success = DA beats the control by a clear margin at a non-trivial absolute
level. ``tests/test_adaptation.py`` regression-guards the margin; measured
numbers live in ``docs/ACCURACY.md``.

Everything runs through the production machinery: device-resident stores,
fused single-dispatch iterations, the real evaluation loop.
"""

from __future__ import annotations

import math
import time

import numpy as np

import jax
import jax.numpy as jnp


def _eval_target(model, state_vars, loader, dataset, *, image_size,
                 heatmap_size, eval_step):
    from dahpe_tpu.evaluate import validate

    return validate(
        loader, model, state_vars, dataset, image_size=image_size,
        heatmap_size=heatmap_size, print_freq=10 ** 9, eval_step=eval_step,
    )["all"]


def run_adaptation_experiment(
    *,
    arch: str = "mini",
    n_train: int = 384,
    n_val: int = 128,
    image_size: int = 64,
    heatmap_size: int = 16,
    batch: int = 16,
    pre_iters: int = 300,
    da_iters: int = 300,
    pretrain_lr: float = 1e-3,
    da_lr: float = 0.01,
    rotation: float = 30.0,
    scale_range=(0.75, 1.25),
    raw_size: int = 96,
    shift: float = 0.4,
    content: float = 0.0,
    style: float | None = None,
    seed: int = 0,
    with_ema: bool = True,
    ema_decay: float = 0.999,
    conf_gate: float | None = None,
    bf16: bool = False,
    eval_every: int = 100,
    n_devices: int = 1,
    verbose: bool = True,
) -> dict:
    """Returns ``{"source_only": pck, "da": pck, "gain": …, "curve": […]}``.

    ``arch='mini'`` is a [1,1,1,1]-bottleneck backbone for quick smoke
    runs; any name in ``models.BACKBONES`` works. The acceptance
    configuration is the ``__main__`` defaults (resnet18 @ 128²/32, shift
    0.4 — see docs/ACCURACY.md); on one chip it runs in ~5 minutes.
    """
    from dahpe_tpu import models
    from dahpe_tpu.data.device_store import DeviceDataStore
    from dahpe_tpu.data.synthetic import SyntheticHands
    from dahpe_tpu.evaluate import make_eval_step
    from dahpe_tpu.models.resnet import BasicBlock, Bottleneck
    from dahpe_tpu.parallel import create_mesh, replicate
    from dahpe_tpu.train import (
        create_da_state,
        create_pretrain_state,
        make_fused_da_iteration,
        make_fused_pretrain_iteration,
        seed_key,
    )
    from dahpe_tpu.utils.torch_import import filtered_update

    from dahpe_tpu.cli.common import enable_compile_cache

    enable_compile_cache()  # repeat runs skip the minutes-long compiles

    def log(msg):
        if verbose:
            print(msg, flush=True)

    # default 1 device: the adaptation question needs no collectives, and on
    # this environment's single host core an 8-virtual-device CPU mesh both
    # thrashes and risks XLA:CPU rendezvous timeouts under concurrent load
    # (multi-device correctness is covered by tests/test_parallel.py)
    n_dev = math.gcd(batch, n_devices or len(jax.devices()))
    mesh = create_mesh(jax.devices()[:n_dev])
    log(f"adaptation experiment: {n_dev} devices, arch={arch}, "
        f"{pre_iters}+{da_iters} iters, batch {batch}")

    mk = dict(n=n_train, seed=seed, image_size=(image_size,) * 2,
              heatmap_size=(heatmap_size,) * 2)
    src_train = SyntheticHands(domain="source", split="train", **mk)
    tgt_train = SyntheticHands(domain="target", split="train", shift=shift,
                               content=content, style=style, **mk)
    mkv = dict(mk, n=n_val)
    src_val = SyntheticHands(domain="source", split="test", **mkv)
    tgt_val = SyntheticHands(domain="target", split="test", shift=shift,
                             content=content, style=style, **mkv)

    src_store = DeviceDataStore(src_train, mesh=mesh, raw_size=raw_size,
                                verbose=False)
    tgt_store = DeviceDataStore(tgt_train, mesh=mesh, raw_size=raw_size,
                                verbose=False)
    val_store = DeviceDataStore(tgt_val, mesh=mesh, shard_samples=False,
                                raw_size=image_size, verbose=False)
    val_loader = val_store.eval_loader(batch, heatmap_size=heatmap_size)
    sval_store = DeviceDataStore(src_val, mesh=mesh, shard_samples=False,
                                 raw_size=image_size, verbose=False)
    sval_loader = sval_store.eval_loader(batch, heatmap_size=heatmap_size)

    dtype = jnp.bfloat16 if bf16 else None

    def make_backbone():
        if arch == "mini":
            return models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1],
                                 dtype=dtype)
        if arch == "micro":
            # BasicBlock keeps the stage widths at 64..512 (no 4x Bottleneck
            # expansion): ~20x cheaper than 'mini' end to end — sized for the
            # CPU-runnable adaptation margin guard (tests/test_adaptation.py)
            return models.ResNet(block=BasicBlock, layers=[1, 1, 1, 1],
                                 dtype=dtype)
        return models.get_backbone(arch, dtype=dtype)

    aug = dict(image_size=image_size, heatmap_size=heatmap_size,
               rotation=rotation, scale_range=tuple(scale_range))

    # ---- phase 1: supervised source pretrain --------------------------
    pre_model = models.PoseResNet(backbone=make_backbone(), num_keypoints=21,
                                  dtype=dtype)
    pre_state = replicate(
        create_pretrain_state(pre_model, jax.random.key(seed),
                              image_size=image_size, batch_size=batch),
        mesh,
    )
    pre_fused = make_fused_pretrain_iteration(
        pre_model, mesh, src_store, batch, **aug
    )
    key = seed_key(mesh, jax.random.key(seed + 100))
    lr = replicate(np.float32(pretrain_lr), mesh)
    t0 = time.time()
    for i in range(pre_iters):
        pre_state, m, key = pre_fused(pre_state, key, lr)
        if verbose and (i + 1) % max(eval_every, 1) == 0:
            log(f"  pretrain {i + 1}/{pre_iters} loss={float(m['loss_s']):.4f} "
                f"acc_s={float(m['acc_s']):.3f}")
    # host snapshot: the fused control iterations below DONATE the state
    # buffers, which deletes pre_state's device arrays — the DA warm start
    # must read from this copy, not the donated originals
    pre_vars = jax.device_get(
        {"params": pre_state.params, "batch_stats": pre_state.batch_stats}
    )
    eval_pre = make_eval_step(pre_model)
    pck_src = _eval_target(pre_model, pre_vars, sval_loader, src_val,
                           image_size=image_size,
                           heatmap_size=heatmap_size, eval_step=eval_pre)
    pck_pretrain = _eval_target(pre_model, pre_vars, val_loader, tgt_val,
                                image_size=image_size,
                                heatmap_size=heatmap_size, eval_step=eval_pre)
    log(f"pretrain done in {time.time() - t0:.0f}s; source-val PCK "
        f"{pck_src:.3f}, target PCK {pck_pretrain:.3f}")

    # ---- control: source-only for the SAME extra budget ----------------
    ctl_state = pre_state
    for i in range(da_iters):
        ctl_state, m, key = pre_fused(ctl_state, key, lr)
    ctl_vars = {"params": ctl_state.params,
                "batch_stats": ctl_state.batch_stats}
    pck_source_only = _eval_target(
        pre_model, ctl_vars, val_loader, tgt_val, image_size=image_size,
        heatmap_size=heatmap_size, eval_step=eval_pre,
    )
    log(f"source-only control ({pre_iters}+{da_iters} iters): "
        f"target PCK {pck_source_only:.3f}")

    # ---- DA: the full 3-step minimax from the same pretrain ------------
    da_model = models.MultiHeadPoseResNet(backbone=make_backbone(),
                                          num_keypoints=21, dtype=dtype)
    da_state = create_da_state(
        da_model, jax.random.key(seed), image_size=image_size,
        batch_size=batch, with_ema=with_ema,
    )
    warm = filtered_update(
        {"params": da_state.params, "batch_stats": da_state.batch_stats},
        pre_vars,
    )
    da_state = da_state.replace(
        params=dict(warm["params"]), batch_stats=dict(warm["batch_stats"]),
    )
    if with_ema:
        da_state = da_state.replace(
            ema_params=jax.tree.map(jnp.copy, da_state.params),
            ema_batch_stats=jax.tree.map(jnp.copy, da_state.batch_stats),
        )
    da_state = replicate(da_state, mesh)
    da_fused = make_fused_da_iteration(
        da_model, mesh, src_store, tgt_store, batch,
        base_lr=da_lr, ema_decay=ema_decay if with_ema else None,
        conf_gate=conf_gate, **aug,
    )
    ks = seed_key(mesh, jax.random.key(seed + 200))
    kt = seed_key(mesh, jax.random.key(seed + 300))
    eval_da = make_eval_step(da_model)
    curve = []
    t0 = time.time()
    for i in range(da_iters):
        da_state, m, ks, kt = da_fused(da_state, ks, kt)
        if (i + 1) % eval_every == 0 or i + 1 == da_iters:
            pck = _eval_target(
                da_model,
                {"params": da_state.params,
                 "batch_stats": da_state.batch_stats},
                val_loader, tgt_val, image_size=image_size,
                heatmap_size=heatmap_size, eval_step=eval_da,
            )
            curve.append((i + 1, float(pck)))
            log(f"  DA {i + 1}/{da_iters} loss_s={float(m['loss_s']):.4f} "
                f"target PCK {pck:.3f}")
    pck_da = curve[-1][1]
    result = {
        "shift": float(shift),
        "content": float(content),
        "style": float(content if style is None else style),
        "source_val": float(pck_src),
        "pretrain": float(pck_pretrain),
        "source_only": float(pck_source_only),
        "da": float(pck_da),
        "gain": float(pck_da - pck_source_only),
        "curve": curve,
        "da_seconds": time.time() - t0,
    }
    if with_ema:
        result["da_ema"] = float(_eval_target(
            da_model,
            {"params": da_state.ema_params,
             "batch_stats": da_state.ema_batch_stats},
            val_loader, tgt_val, image_size=image_size,
            heatmap_size=heatmap_size, eval_step=eval_da,
        ))
    log(f"RESULT source_only={result['source_only']:.3f} "
        f"da={result['da']:.3f} gain={result['gain']:+.3f}"
        + (f" ema={result['da_ema']:.3f}" if with_ema else ""))
    return result


if __name__ == "__main__":
    import argparse
    import json

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--pre-iters", type=int, default=4000)
    p.add_argument("--da-iters", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--heatmap-size", type=int, default=32)
    p.add_argument("--raw-size", type=int, default=160)
    p.add_argument("--shift", type=float, default=0.4)
    p.add_argument("--content", type=float, default=0.0,
                   help="geometry (pose-distribution) shift strength of "
                        "the target domain (docs/ACCURACY.md content study)")
    p.add_argument("--style", type=float, default=None,
                   help="rendering-style shift strength; default couples "
                        "it to --content")
    p.add_argument("--da-lr", type=float, default=0.01)
    p.add_argument("--ema-decay", type=float, default=0.999,
                   help="EMA twin decay (reference default 0.999, "
                        "train1.py:667 — kept here so studies stay "
                        "comparable across rounds; the production CLI "
                        "default is 0.99 after the r5 sweep, "
                        "docs/ACCURACY.md)")
    p.add_argument("--conf-gate", type=float, default=None,
                   help="drop this per-joint fraction of least-confident "
                        "target pseudo-labels in steps B/C (drift "
                        "mitigation; default off = reference behavior)")
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", default=None,
                   help="also write the result dict to this path")
    a = p.parse_args()
    r = run_adaptation_experiment(
        arch=a.arch, pre_iters=a.pre_iters, da_iters=a.da_iters,
        batch=a.batch, n_train=a.n_train, image_size=a.image_size,
        heatmap_size=a.heatmap_size, raw_size=a.raw_size, shift=a.shift,
        content=a.content, style=a.style, da_lr=a.da_lr,
        ema_decay=a.ema_decay, conf_gate=a.conf_gate,
        eval_every=a.eval_every, bf16=a.bf16, seed=a.seed,
    )
    if a.json:
        with open(a.json, "w") as f:
            json.dump(r, f)
