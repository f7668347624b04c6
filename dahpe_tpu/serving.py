"""Deployment: ahead-of-time export of the serving program as StableHLO.

The reference has no deployment story beyond "load the .pth in the eval
script" (``test.py:190-201``); a production TPU service wants the serving
computation compiled AHEAD of time and shipped as an artifact independent of
the Python model definition. This module exports the fused
forward-plus-decode program (:func:`dahpe_tpu.evaluate.make_predict_fn` —
images → image-space keypoint coordinates + confidences) through
``jax.export`` (StableHLO): the artifact is versioned, serializable, and
reloadable on any host with jax — no flax, no model zoo, no checkpoint code.

Exports can be batch-polymorphic (``batch_size=None``): one artifact serves
any batch size, XLA specializing at load time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dahpe_tpu.evaluate import make_predict_fn


def _shapes_of(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree
    )


def export_predict(model, variables, *, batch_size: int | None = None,
                   image_size: int = 256, heatmap_size: int = 64,
                   input_dtype=jnp.float32,
                   uint8_input: bool = False) -> bytes:
    """Serialize the serving program to portable StableHLO bytes.

    The exported callable keeps the ``(variables, images) -> (coords,
    maxvals)`` signature (weights are runtime inputs, so one artifact serves
    many checkpoints). ``batch_size=None`` exports a batch-polymorphic
    artifact via a symbolic leading dimension. ``uint8_input=True`` exports
    the raw-frame ingestion variant: uint8 HWC in, ImageNet normalization
    compiled into the artifact — clients ship 4x fewer bytes per frame.
    """
    predict = make_predict_fn(
        model, image_size=image_size, heatmap_size=heatmap_size,
        uint8_input=uint8_input,
    )
    if uint8_input:
        input_dtype = jnp.uint8
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    x = jax.ShapeDtypeStruct((b, image_size, image_size, 3), input_dtype)
    exported = jax_export.export(predict)(_shapes_of(variables), x)
    return bytes(exported.serialize())


def export_predict_int8(quantized, *, batch_size: int | None = None,
                        image_size: int = 256, heatmap_size: int = 64,
                        uint8_input: bool = False,
                        glue: str = "bfloat16") -> bytes:
    """Serialize the **int8** serving program (``dahpe_tpu/quant.py``) to
    portable StableHLO bytes.

    Same contract as :func:`export_predict` but the first runtime input is
    the quantized deployment tree from :func:`dahpe_tpu.quant.quantize_model`
    (int8 per-channel weights + calibrated activation scales); every conv in
    the artifact runs int8×int8→int32 on the MXU. Reload with
    :func:`load_predict` — the artifact needs jax alone.

    ``glue`` ("bfloat16" | "float32") is the inter-conv activation storage
    dtype (see ``quant.apply_int8``). Throughput is strongly
    batch×glue-dependent on v5e (docs/PERF.md has the measured matrix);
    bfloat16 at batch 256 is the measured-best deployment point.
    """
    from dahpe_tpu.quant import make_int8_predict_fn

    predict = make_int8_predict_fn(
        image_size=image_size, heatmap_size=heatmap_size,
        uint8_input=uint8_input, glue=jnp.dtype(glue),
    )
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    x = jax.ShapeDtypeStruct(
        (b, image_size, image_size, 3),
        jnp.uint8 if uint8_input else jnp.float32,
    )
    exported = jax_export.export(predict)(_shapes_of(quantized), x)
    return bytes(exported.serialize())


def load_predict(blob: bytes):
    """Rebuild the serving callable from :func:`export_predict` bytes."""
    return jax_export.deserialize(blob).call


def make_mesh_predict(predict, mesh, *, axis: str = "data"):
    """Data-parallel serving: scale a reloaded artifact (float or int8)
    across a ``jax.sharding.Mesh``.

    The artifact's StableHLO is inlined into an outer jitted program with
    the frame batch sharded over ``axis`` and the weights replicated; GSPMD
    partitions the convs over the batch dimension (embarrassingly parallel —
    no collectives in the forward), so N chips serve N× the single-chip
    throughput from ONE program and one global batch. Batch sharding never
    splits a reduction, so decoded coordinates are bit-identical to
    single-device execution (confidence values may differ in the last ULP
    from partitioned fusion).

    ``predict`` is :func:`load_predict` / :func:`load_predict_file` output
    (a live jitted predict works too). The global batch must be divisible
    by the mesh size; batch-polymorphic artifacts serve any such batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis))
    return jax.jit(
        lambda weights, images: predict(weights, images),
        in_shardings=(replicated, sharded),
        out_shardings=(sharded, sharded),
    )


def save_predict(path: str, model, variables, **kw) -> None:
    with open(path, "wb") as f:
        f.write(export_predict(model, variables, **kw))


def load_predict_file(path: str):
    with open(path, "rb") as f:
        return load_predict(f.read())


def save_variables_npz(path: str, variables) -> None:
    """Companion weight file for an exported artifact: a plain ``.npz``
    keyed by tree path, loadable with numpy alone — together with the
    StableHLO bytes this is a fully self-contained deployment (no flax, no
    orbax, no model code on the serving host).

    ``np.savez`` is banned on the checkpoint hot path (CLAUDE.md: ~10-60x
    slower than ``np.save`` at the 459 MB state size, paid repeatedly per
    epoch) but is the right call here: export runs once, the file is
    ≤~50 MB (<1 s measured — zipfile's CRC is the floor; a hand-rolled
    uncompressed-zip writer measured no faster), and the single-file .npz
    IS the deployment contract."""
    import numpy as onp

    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    arrays = {
        "/".join(str(getattr(k, "key", k)) for k in path): onp.asarray(leaf)
        for path, leaf in flat
    }
    onp.savez(path, **arrays)


def save_quantized_npz(path: str, quantized) -> None:
    """Weight file for an int8 artifact: the quantized deployment tree
    (which nests lists — layers/blocks/head stages) flattened to a plain
    ``.npz``. Int8 weights make it ~4x smaller than the float npz.
    One-shot ≤~12 MB write: ``np.savez`` is fine here for the same reason
    as :func:`save_variables_npz` (the CLAUDE.md savez ban targets the
    per-epoch checkpoint path, not exports)."""
    import numpy as onp

    flat, _ = jax.tree_util.tree_flatten_with_path(quantized)
    arrays = {}
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        arrays["/".join(parts)] = onp.asarray(leaf)
    onp.savez(path, **arrays)


def load_quantized_npz(path: str):
    """Rebuild the quantized deployment tree from :func:`save_quantized_npz`
    output (all-digit key levels become lists again, restoring the
    ``layers``/``up``/``head`` sequences ``apply_int8`` iterates)."""
    import numpy as onp

    out: dict = {}
    with onp.load(path) as data:
        for key in data.files:
            node = out
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            a = data[key]
            node[leaf] = jnp.asarray(a) if a.ndim else a[()]

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(out)


def load_artifact_weights(path: str):
    """Load the ``.weights.npz`` sibling of an exported artifact, float or
    int8 alike: quantized trees are recognized by their per-conv int8
    weight leaves (``.../wq``) and rebuilt with :func:`load_quantized_npz`;
    anything else is a plain variables tree."""
    import numpy as onp

    with onp.load(path) as data:
        quantized = any(k == "wq" or k.endswith("/wq") for k in data.files)
    return load_quantized_npz(path) if quantized else load_variables_npz(path)


def load_variables_npz(path: str):
    """Rebuild the ``variables`` pytree (nested dicts) from
    :func:`save_variables_npz` output."""
    import numpy as onp

    out: dict = {}
    with onp.load(path) as data:
        for key in data.files:
            node = out
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = jnp.asarray(data[key])
    return out
