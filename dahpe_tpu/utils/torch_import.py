"""One-way importer: reference PyTorch ``.pth`` checkpoints → Flax variables.

The published reference checkpoints (``models/H3D_best_754.pth``,
``models/STB_best_750.pth``, ``models/pretrain_rhd.pth`` — ``README.md:40-41``)
and torchvision ImageNet weights are torch ``state_dict``s keyed like
``backbone.layer1.0.conv1.weight``. Our Flax modules name submodules after the
same torch Sequential indices (see ``dahpe_tpu/models``), so the import is a
mechanical transform:

- conv ``weight (O, I, kh, kw)``     → ``kernel (kh, kw, I, O)``
- grouped conv                        → same transpose (lax convention matches)
- deconv ``weight (I, O, kh, kw)``   → spatially flipped ``kernel (kh, kw, I, O)``
  (our ConvTranspose2dTorch stores the equivalent forward-conv kernel)
- BN ``weight/bias``                  → params ``scale/bias``
- BN ``running_mean/running_var``     → batch_stats ``mean/var``
- ``num_batches_tracked``             → dropped
- ``layerL.B`` / ``downsample.N``     → ``layerL_B`` / ``downsample_N``

No torch import is required here; tensors arrive as numpy arrays (use
:func:`load_pth` for the torch-side file read).
"""

from __future__ import annotations

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict


def _flax_path(torch_key: str) -> tuple[str, ...]:
    parts = torch_key.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        # fuse torch's nested "layerL.B" and "downsample.N" into flat names
        if (
            i + 1 < len(parts)
            and (p.startswith("layer") or p == "downsample")
            and parts[i + 1].isdigit()
        ):
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _is_deconv(path: tuple[str, ...]) -> bool:
    return "upsampling" in path


def import_torch_state_dict(
    state_dict: dict[str, np.ndarray],
    *,
    reference_variables=None,
) -> dict:
    """Convert a torch ``state_dict`` into ``{"params", "batch_stats"}``.

    Args:
      state_dict: flat torch key → numpy array.
      reference_variables: optional Flax variables pytree; when given, every
        imported leaf is shape-checked against it and keys missing on either
        side are reported via the returned dict's ``"__report__"``-free strict
        behavior: a ``ValueError`` is raised listing mismatches.
    """
    params: dict[tuple[str, ...], np.ndarray] = {}
    batch_stats: dict[tuple[str, ...], np.ndarray] = {}

    # Pre-scan: a module that owns running stats is a BN; its `weight` is a
    # scale vector even though 1-D convs don't exist here, be explicit anyway.
    bn_modules = {
        _flax_path(k)[:-1]
        for k in state_dict
        if k.endswith("running_mean")
    }

    for key, value in state_dict.items():
        value = np.asarray(value)
        path = _flax_path(key)
        mod, leaf = path[:-1], path[-1]
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            batch_stats[mod + ("mean",)] = value.astype(np.float32)
        elif leaf == "running_var":
            batch_stats[mod + ("var",)] = value.astype(np.float32)
        elif leaf == "weight":
            if mod in bn_modules:
                params[mod + ("scale",)] = value.astype(np.float32)
            elif value.ndim == 4:
                if _is_deconv(mod):
                    # torch deconv weight (I, O, kh, kw) → flipped HWIO
                    kernel = value[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
                else:
                    # torch conv weight (O, I, kh, kw) → HWIO
                    kernel = value.transpose(2, 3, 1, 0)
                params[mod + ("kernel",)] = np.ascontiguousarray(
                    kernel, dtype=np.float32
                )
            elif value.ndim == 2:  # linear layer (unused in pose nets)
                params[mod + ("kernel",)] = value.T.astype(np.float32)
            else:
                params[mod + ("scale",)] = value.astype(np.float32)
        elif leaf == "bias":
            params[mod + ("bias",)] = value.astype(np.float32)
        else:
            raise ValueError(f"unhandled torch key {key!r}")

    variables = {
        "params": unflatten_dict(params),
        "batch_stats": unflatten_dict(batch_stats),
    }

    if reference_variables is not None:
        _check_against(variables, reference_variables)
    return variables


def _check_against(imported: dict, reference) -> None:
    ref_flat = {
        coll: flatten_dict(dict(tree))
        for coll, tree in dict(reference).items()
        if coll in ("params", "batch_stats")
    }
    problems = []
    for coll in ("params", "batch_stats"):
        imp = flatten_dict(imported.get(coll, {}))
        ref = ref_flat.get(coll, {})
        for k in sorted(set(imp) | set(ref)):
            name = coll + "/" + "/".join(k)
            if k not in imp:
                problems.append(f"missing in checkpoint: {name}")
            elif k not in ref:
                problems.append(f"unexpected in checkpoint: {name}")
            elif tuple(imp[k].shape) != tuple(np.shape(ref[k])):
                problems.append(
                    f"shape mismatch {name}: ckpt {imp[k].shape} vs model {np.shape(ref[k])}"
                )
    if problems:
        raise ValueError("torch import mismatch:\n  " + "\n  ".join(problems))


def filtered_update(variables: dict, imported: dict) -> dict:
    """Merge imported leaves into ``variables``, keeping model leaves that the
    checkpoint lacks — the reference's key-filtered, ``strict=False`` load used
    when warm-starting the DA model from the pretrain checkpoint
    (``train1.py:184-189``).
    """
    out = {}
    for coll in variables:
        base = flatten_dict(dict(variables[coll]))
        upd = flatten_dict(imported.get(coll, {}))
        for k, v in upd.items():
            if k in base and tuple(base[k].shape) == tuple(v.shape):
                base[k] = v
        out[coll] = unflatten_dict(base)
    return out


def load_pth(path: str, key: str | None = "model") -> dict[str, np.ndarray]:
    """Read a torch ``.pth`` file → flat numpy state dict (host side).

    Reference training checkpoints store the model under ``"model"``
    (``train1.py:248-260``); raw torchvision ImageNet files are bare state
    dicts (pass ``key=None``).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and isinstance(obj, dict) and key in obj:
        obj = obj[key]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def export_torch_state_dict(variables: dict) -> dict[str, np.ndarray]:
    """Inverse transform: Flax variables → torch-keyed numpy state dict.

    Enables writing reference-compatible ``.pth`` files (round-trip tested).
    """
    out: dict[str, np.ndarray] = {}
    params = flatten_dict(dict(variables.get("params", {})))
    stats = flatten_dict(dict(variables.get("batch_stats", {})))
    bn_modules = {k[:-1] for k in stats if k[-1] == "mean"}

    def torch_key(mod: tuple[str, ...], leaf: str) -> str:
        parts = []
        for p in mod:
            if "_" in p and (p.startswith("layer") or p.startswith("downsample")):
                head, tail = p.rsplit("_", 1)
                if tail.isdigit():
                    parts.extend([head, tail])
                    continue
            parts.append(p)
        return ".".join(parts + [leaf])

    for k, v in params.items():
        mod, leaf = k[:-1], k[-1]
        v = np.asarray(v)
        if leaf == "kernel":
            if _is_deconv(mod):
                w = v.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
            elif v.ndim == 4:
                w = v.transpose(3, 2, 0, 1)
            else:
                w = v.T
            out[torch_key(mod, "weight")] = np.ascontiguousarray(w)
        elif leaf == "scale":
            out[torch_key(mod, "weight")] = v
        else:
            out[torch_key(mod, leaf)] = v
    for k, v in stats.items():
        mod, leaf = k[:-1], k[-1]
        name = {"mean": "running_mean", "var": "running_var"}[leaf]
        out[torch_key(mod, name)] = np.asarray(v)
        nbt = torch_key(mod, "num_batches_tracked")
        out.setdefault(nbt, np.asarray(0, dtype=np.int64))
    del bn_modules
    return out
