"""Post-training int8 quantization of the serving path (w8a8 convs).

The MXU runs int8×int8→int32 at ~2.3× its bf16 rate on v5e (measured:
423 vs 181 TFLOP/s on a 3×3/256ch conv probe), and the serving forward is
conv-dominated — so a quantized artifact buys real serving throughput from
the same chip. Measured end-to-end (resnet101@256, docs/PERF.md): the gain
is strongly batch- and glue-dtype-dependent — the deployment point is
batch 256 with bfloat16 glue at **7566 img/s, 1.48× the float artifact's
best** (f32 glue: 5861 at batch 96; bf16 glue at batch 96 is a tiling
pathology at 3732 — bench your exact batch before deploying). The reference
has no quantization story (deployment is "re-run the eval script",
``test.py:190-201``); this is a TPU-native extension of
``dahpe_tpu/serving.py``.

Design — the standard PTQ recipe, arranged for XLA:

1. **Fold BatchNorm into the convs** (`fold_serving_params`). Eval-mode BN
   is an affine map per channel; folded weights/biases make every layer a
   bare conv+bias, which is what quantization wants to see. The folded
   tree drives a *functional* re-execution of the serving forward
   (`_forward`) — structure (strides, groups, deconv geometry, residuals)
   is derived from the param tree itself, so every ResNet variant in
   `models.BACKBONES` works unchanged. Float parity with `model.apply` is
   exact up to dtype rounding (`tests/test_quant.py`).
2. **Calibrate activation scales** (`calibrate_act_scales`): one float
   pass over sample batches records per-conv-input absolute maxima.
3. **Quantize** (`quantize_serving`): weights per-output-channel symmetric
   int8; activations per-tensor symmetric int8 at the calibrated scale.
   The convs run int8 on the MXU (``preferred_element_type=int32``); all
   glue (requantize, bias, ReLU, residual adds, maxpool) stays in float on
   the VPU where XLA fuses it into the conv epilogues.
4. **Serve** (`make_int8_predict_fn`): same ``(params, images) → (coords,
   maxvals)`` contract as ``evaluate.make_predict_fn``; exportable through
   ``serving.export_predict``'s machinery via ``jax.export`` on the jitted
   function.

Only the deployment path is quantized — training and evaluation keep full
precision; accuracy acceptance for a quantized artifact is a PCK-parity
check against its own float source (see tests), not against the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-5  # models/batch_norm.py:BatchNorm2d.epsilon


# --------------------------------------------------------------------------
# 1. BN folding + structure extraction
# --------------------------------------------------------------------------

def _fold(conv_p: dict, bn_p: dict, bn_s: dict) -> dict:
    """conv → BN(eval) collapsed to conv+bias: ``w' = w·γ/√(σ²+ε)`` over the
    output channel, ``b' = β − μ·γ/√(σ²+ε)`` (+ the conv's own bias folded
    through the BN when present)."""
    w = np.asarray(conv_p["kernel"], np.float32)  # HWIO
    r = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
        np.asarray(bn_s["var"], np.float32) + _BN_EPS
    )
    b = np.asarray(bn_p["bias"], np.float32) - np.asarray(
        bn_s["mean"], np.float32
    ) * r
    if "bias" in conv_p:
        b = b + np.asarray(conv_p["bias"], np.float32) * r
    return {"w": w * r, "b": b}


def _plain(conv_p: dict) -> dict:
    w = np.asarray(conv_p["kernel"], np.float32)
    b = conv_p.get("bias")
    b = (
        np.asarray(b, np.float32)
        if b is not None
        else np.zeros(w.shape[-1], np.float32)
    )
    return {"w": w, "b": b}


def fold_serving_params(variables: dict) -> dict:
    """The serving forward's folded weights, keyed by a flat conv name.

    Input: full model ``variables`` ({params, batch_stats}) of a
    ``PoseResNet`` or ``MultiHeadPoseResNet`` (only backbone / upsampling /
    main head are used — the serving decode reads ``y``). Output: a nested
    dict with a ``blocks`` layout that `_forward` replays.
    """
    p, s = variables["params"], variables["batch_stats"]
    pb, sb = p["backbone"], s["backbone"]
    out = {"stem": _fold(pb["conv1"], pb["bn1"], sb["bn1"])}

    layers: list[list[dict]] = []
    li = 1
    while f"layer{li}_0" in pb:
        blocks = []
        bi = 0
        while f"layer{li}_{bi}" in pb:
            bp, bs = pb[f"layer{li}_{bi}"], sb[f"layer{li}_{bi}"]
            blk = {
                "conv1": _fold(bp["conv1"], bp["bn1"], bs["bn1"]),
                "conv2": _fold(bp["conv2"], bp["bn2"], bs["bn2"]),
            }
            if "conv3" in bp:  # Bottleneck
                blk["conv3"] = _fold(bp["conv3"], bp["bn3"], bs["bn3"])
            if "downsample_0" in bp:
                blk["downsample"] = _fold(
                    bp["downsample_0"], bp["downsample_1"], bs["downsample_1"]
                )
            blocks.append(blk)
            bi += 1
        layers.append(blocks)
        li += 1
    out["layers"] = layers

    pu, su = p["upsampling"], s["upsampling"]
    out["up"] = [
        _fold(pu[str(3 * i)], pu[str(3 * i + 1)], su[str(3 * i + 1)])
        for i in range(len(pu) // 2)
    ]
    ph = p["head"]
    if "kernel" in ph:  # PoseResNet: bare Conv1x1 head
        out["head"] = [_plain(ph)]
    else:  # MultiHeadPoseResNet main PlainHead: [Conv3x3→BN→ReLU]* → Conv1x1
        sh = s["head"]
        n_stages = (len(ph) - 1) // 2
        out["head"] = [
            _fold(ph[str(3 * i)], ph[str(3 * i + 1)], sh[str(3 * i + 1)])
            for i in range(n_stages)
        ] + [_plain(ph[str(3 * n_stages)])]
    return out


# --------------------------------------------------------------------------
# 2. The functional serving forward with a pluggable conv op
# --------------------------------------------------------------------------

def _geom_deconv(k: int) -> tuple[int, int]:
    """torch ConvTranspose (k, s=2) geometry as lhs-dilated conv padding —
    the models/upsampling.py kernel-size rule."""
    if k == 4:
        p, op = 1, 0
    elif k == 3:
        p, op = 1, 1
    elif k == 2:
        p, op = 0, 0
    else:
        raise NotImplementedError(f"kernel_size {k}")
    pad = k - 1 - p
    return pad, pad + op


def _forward(folded: dict, x: jnp.ndarray, conv_op):
    """Replay the serving forward (backbone → upsampling → main head) from a
    folded tree. ``conv_op(name, x, entry, *, stride, padding,
    lhs_dilation)`` implements the conv+bias; everything else (ReLU,
    maxpool, residual adds) is float glue shared by all modes."""

    def conv(name, x, e, stride=1, padding=0, lhs_dilation=None):
        return conv_op(
            name, x, e, stride=stride, padding=padding, lhs_dilation=lhs_dilation
        )

    x = jax.nn.relu(conv("stem", x, folded["stem"], stride=2, padding=3))
    x = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for li, blocks in enumerate(folded["layers"]):
        for bi, blk in enumerate(blocks):
            # stride is structural, never stored in the (possibly traced)
            # tree: first block of layer2..4 downsamples (models/resnet.py)
            stride = 2 if (li > 0 and bi == 0) else 1
            n = f"l{li + 1}b{bi}"
            idn = x
            if "conv3" in blk:  # Bottleneck 1-3-1
                y = jax.nn.relu(conv(n + "c1", x, blk["conv1"]))
                y = jax.nn.relu(
                    conv(n + "c2", y, blk["conv2"], stride=stride, padding=1)
                )
                y = conv(n + "c3", y, blk["conv3"])
            else:  # BasicBlock 3-3
                y = jax.nn.relu(
                    conv(n + "c1", x, blk["conv1"], stride=stride, padding=1)
                )
                y = conv(n + "c2", y, blk["conv2"], padding=1)
            if "downsample" in blk:
                idn = conv(n + "ds", x, blk["downsample"], stride=stride)
            x = jax.nn.relu(y + idn)
    for i, e in enumerate(folded["up"]):
        kernel = e["w"] if "w" in e else e["wq"]
        lo, hi = _geom_deconv(kernel.shape[0])
        x = jax.nn.relu(
            conv(f"up{i}", x, e, padding=(lo, hi), lhs_dilation=(2, 2))
        )
    for i, e in enumerate(folded["head"][:-1]):
        x = jax.nn.relu(conv(f"head{i}", x, e, padding=1))
    return conv("head_out", x, folded["head"][-1])


def _conv_base(x, w, *, stride, padding, lhs_dilation, preferred=None):
    if isinstance(padding, int):
        padding = (padding, padding)  # symmetric → (lo, hi)
    groups = x.shape[-1] // w.shape[2]
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride) if lhs_dilation is None else (1, 1),
        padding=(padding, padding),  # same (lo, hi) on both spatial dims
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=preferred,
    )


def apply_folded(folded: dict, x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Float reference execution of the folded tree (parity oracle and
    calibration backbone). Bit-comparable to ``model.apply(...)["y"]`` in
    float32."""

    def conv_op(name, x, e, *, stride, padding, lhs_dilation):
        y = _conv_base(
            x.astype(dtype), jnp.asarray(e["w"], dtype),
            stride=stride, padding=padding, lhs_dilation=lhs_dilation,
        )
        return y + jnp.asarray(e["b"], dtype)

    return _forward(folded, x.astype(dtype), conv_op)


# --------------------------------------------------------------------------
# 3. Calibration + quantization
# --------------------------------------------------------------------------

def calibrate_act_scales(folded: dict, images: jnp.ndarray, *,
                         percentile: float | None = None) -> dict:
    """Per-conv-input activation ranges from one float pass over ``images``
    (normalized model inputs, a representative batch or a few concatenated).

    ``percentile=None`` (default) records plain absolute maxima — exact, but
    a single outlier batch crushes the int8 resolution of every later input
    (the scale is set by the one freak value, all regular activations then
    land in a few low bits). ``percentile=99.9`` (say) records the 99.9th
    percentile of |x| per conv input instead: the freak tail gets clipped by
    the quantizer's existing ±127 clamp while the bulk keeps full 8-bit
    resolution. Calibration is offline, so the percentile's O(n log n) sort
    per conv input is irrelevant; ``percentile=100`` matches the absmax
    path up to float32 sorted-interpolation rounding. PCK parity between
    the modes on clean data — and the outlier robustness claim — are
    tested in ``tests/test_quant.py``."""
    maxes: dict[str, jnp.ndarray] = {}

    def conv_op(name, x, e, *, stride, padding, lhs_dilation):
        a = jnp.abs(x)
        maxes[name] = (
            jnp.max(a) if percentile is None
            else jnp.percentile(a.astype(jnp.float32).reshape(-1),
                                percentile)
        )
        y = _conv_base(
            x, jnp.asarray(e["w"], jnp.float32),
            stride=stride, padding=padding, lhs_dilation=lhs_dilation,
        )
        return y + jnp.asarray(e["b"], jnp.float32)

    _forward(folded, images.astype(jnp.float32), conv_op)
    return {k: float(v) for k, v in jax.device_get(maxes).items()}


def quantize_serving(folded: dict, act_scales: dict) -> dict:
    """int8 deployment tree: per-output-channel symmetric weights, the
    calibrated per-tensor activation scale riding along with each conv."""

    def q(e, name):
        w = np.asarray(e["w"], np.float32)
        sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        sx = np.float32(max(act_scales[name], 1e-12) / 127.0)
        return {"wq": wq, "sw": sw.astype(np.float32), "b": e["b"], "sx": sx}

    out = {"stem": q(folded["stem"], "stem"), "layers": [], "up": [], "head": []}
    for li, blocks in enumerate(folded["layers"]):
        qblocks = []
        for bi, blk in enumerate(blocks):
            n = f"l{li + 1}b{bi}"
            qb = {
                "conv1": q(blk["conv1"], n + "c1"),
                "conv2": q(blk["conv2"], n + "c2"),
            }
            if "conv3" in blk:
                qb["conv3"] = q(blk["conv3"], n + "c3")
            if "downsample" in blk:
                qb["downsample"] = q(blk["downsample"], n + "ds")
            qblocks.append(qb)
        out["layers"].append(qblocks)
    out["up"] = [q(e, f"up{i}") for i, e in enumerate(folded["up"])]
    out["head"] = [
        q(e, f"head{i}") for i, e in enumerate(folded["head"][:-1])
    ] + [q(folded["head"][-1], "head_out")]
    return out


def apply_int8(quantized: dict, x: jnp.ndarray,
               glue=jnp.bfloat16) -> jnp.ndarray:
    """The quantized serving forward: every conv int8×int8→int32 on the MXU,
    dequant+bias+ReLU glue fused into the epilogues by XLA.

    ``glue`` is the dtype activations are *stored* in between convs (ReLU
    outputs, residual adds, maxpool). The per-conv quantize math
    (divide/round/clip) always runs in float32 in-registers; ``glue`` only
    sets the HBM format of the layer-boundary tensors. bfloat16 (default)
    halves the inter-layer HBM traffic that dominates the early,
    memory-bound ResNet stages — and its rounding noise is an order of
    magnitude below the int8 quantization noise already accepted on every
    conv input (the conv input gets crushed to 8 bits regardless of how
    the tensor was stored). float32 is the bit-conservative mode used by
    the quantization-error tests."""

    def conv_op(name, x, e, *, stride, padding, lhs_dilation):
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / e["sx"]), -127, 127
        ).astype(jnp.int8)
        yq = _conv_base(
            xq, jnp.asarray(e["wq"]),
            stride=stride, padding=padding, lhs_dilation=lhs_dilation,
            preferred=jnp.int32,
        )
        scale = jnp.asarray(e["sw"], jnp.float32) * e["sx"]
        y = yq.astype(jnp.float32) * scale + jnp.asarray(e["b"], jnp.float32)
        return y.astype(glue)

    # decode reads the final heatmaps in float32 regardless of glue
    return _forward(quantized, x.astype(glue), conv_op).astype(jnp.float32)


# --------------------------------------------------------------------------
# 4. Serving entry (evaluate.make_predict_fn contract)
# --------------------------------------------------------------------------

def make_int8_predict_fn(*, image_size: int = 256, heatmap_size: int = 64,
                         uint8_input: bool = False, glue=jnp.bfloat16):
    """Quantized serving entry: ``(quantized, images) → (coords, maxvals)``,
    coordinates in image pixels — the int8 twin of
    ``evaluate.make_predict_fn`` (same decode, same uint8-ingest option).
    ``glue`` — see :func:`apply_int8`."""
    from dahpe_tpu.core.decode import get_max_preds

    scale = image_size / heatmap_size

    @jax.jit
    def predict(quantized, images):
        if uint8_input:
            from dahpe_tpu.data.device_aug import IMAGENET_MEAN, IMAGENET_STD

            images = images.astype(jnp.float32) / 255.0
            images = (images - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
                IMAGENET_STD
            )
        y = apply_int8(quantized, images, glue=glue)
        preds, maxvals = get_max_preds(y)
        return preds * scale, maxvals

    return predict


def quantize_model(model, variables, calib_images: jnp.ndarray, *,
                   percentile: float | None = None) -> dict:
    """One-call PTQ: fold, calibrate on ``calib_images`` (normalized model
    inputs), quantize. Returns the deployment tree for
    :func:`make_int8_predict_fn` / :func:`apply_int8`. ``percentile``
    selects robust (outlier-clipping) calibration — see
    :func:`calibrate_act_scales`."""
    folded = fold_serving_params(variables)
    scales = calibrate_act_scales(folded, calib_images, percentile=percentile)
    return quantize_serving(folded, scales)
