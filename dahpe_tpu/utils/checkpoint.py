"""Checkpointing: packed native state, plus reference-``.pth`` interop.

The reference saves per-epoch torch dicts with model + 3 of 5 optimizer /
scheduler states (``train1.py:248-268``). Natively we checkpoint the FULL
``DATrainState`` pytree (all five optimizer partitions, step, EMA) in the
packed format (``utils/fast_ckpt.py`` — a few contiguous buffers instead
of a file per leaf; legacy orbax directories stay restorable);
``save_reference_pth`` emits a torch-compatible ``state_dict`` so models
trained here load in the upstream codebase.
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state) -> None:
    """Save a train-state pytree (packed format, overwriting).

    Packed (``utils/fast_ckpt.py``) replaced orbax as the write format:
    draining the 981-leaf flagship state leaf-by-leaf through this class
    of device link measured 50-150 s per save vs ~20 s packed (and ~0 s
    effective through :class:`fast_ckpt.AsyncSaver`). Legacy orbax
    directories remain restorable below."""
    from dahpe_tpu.utils import fast_ckpt

    fast_ckpt.save_packed(path, state)


def restore_state(path: str, target):
    """Restore into the structure of ``target`` (a template state).
    Reads both packed checkpoints and legacy orbax directories."""
    from dahpe_tpu.utils import fast_ckpt

    path = os.path.abspath(path)
    # resolve_packed also finds a checkpoint stranded under .tmp_pack /
    # .old_pack by a hard kill inside the save's directory swap
    if fast_ckpt.resolve_packed(path):
        return fast_ckpt.restore_packed(path, target)
    ckptr = _checkpointer()
    return ckptr.restore(path, item=jax.device_get(target))


def save_aux(path: str, **arrays) -> None:
    """Sidecar ``<path>_aux.npz`` next to an orbax checkpoint: the device
    sampling-key buffers and the best-accuracy watermark. ``restore_state``
    alone is state-complete but stream-incomplete — without these a resumed
    run replays the sampling/augmentation sequence from iteration 0 and can
    overwrite ``best`` with a worse post-resume epoch.

    Written atomically (tmp + ``os.replace``) so a crash mid-save — the
    exact scenario resume exists for — can never leave a truncated sidecar
    in place of the last good one. Under multi-host only process 0 writes
    (the key buffers are replicated; orbax coordinates its own writers,
    this sidecar must not have N uncoordinated ones)."""
    import numpy as np

    if jax.process_index() != 0:
        return
    final = path + "_aux.npz"
    tmp = final + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(
            fh,
            **{
                k: np.asarray(jax.device_get(v))
                for k, v in arrays.items()
                if v is not None
            },
        )
    os.replace(tmp, final)


def prune_epoch_checkpoints(checkpoint_dir: str, keep: int) -> list[int]:
    """Delete all but the newest ``keep`` integer-named (per-epoch)
    checkpoints under ``checkpoint_dir``, plus their ``_aux.npz`` sidecars.
    Named checkpoints (``best``, ``model_ema``, ``pretrain``…) are never
    touched. A full optimizer+EMA state lands every epoch — unbounded on a
    200-epoch production run — so the train CLI calls this behind
    ``--keep-checkpoints N``. Returns the pruned epoch numbers (process 0
    only; other hosts no-op like :func:`save_aux`)."""
    import shutil

    if keep <= 0 or jax.process_index() != 0:
        return []
    epochs = sorted(
        int(name) for name in os.listdir(checkpoint_dir)
        if name.isdigit() and os.path.isdir(os.path.join(checkpoint_dir, name))
    )
    pruned = epochs[:-keep] if keep < len(epochs) else []
    for epoch in pruned:
        shutil.rmtree(os.path.join(checkpoint_dir, str(epoch)))
        aux = os.path.join(checkpoint_dir, f"{epoch}_aux.npz")
        if os.path.exists(aux):
            os.remove(aux)
    return pruned


def load_aux(path: str) -> dict:
    """The sidecar arrays saved by :func:`save_aux`; ``{}`` when absent or
    unreadable (checkpoints from before the sidecar existed — or a sidecar
    truncated by a crash predating the atomic write — resume with a
    step-folded key fallback instead of crashing)."""
    import numpy as np

    f = path + "_aux.npz"
    if not os.path.exists(f):
        return {}
    try:
        with np.load(f) as z:
            return {k: z[k] for k in z.files}
    except Exception as e:  # truncated/corrupt zip: degrade, don't die
        print(f"warning: ignoring unreadable resume sidecar {f}: {e}")
        return {}


def load_model_variables(path: str):
    """Restore only {params, batch_stats} from a saved train state
    (packed or legacy orbax; host arrays either way)."""
    from dahpe_tpu.utils import fast_ckpt

    path = os.path.abspath(path)
    if fast_ckpt.resolve_packed(path):
        state = fast_ckpt.load_packed_tree(path)
    else:
        state = _checkpointer().restore(path)
    return {"params": state["params"], "batch_stats": state["batch_stats"]}


def save_reference_pth(path: str, variables) -> None:
    """Write a torch ``{'model': state_dict}`` .pth loadable by the reference."""
    import torch

    from dahpe_tpu.utils.fast_ckpt import device_get_packed
    from dahpe_tpu.utils.torch_import import export_torch_state_dict

    # packed drain: a leaf-per-transfer device_get of a full model costs
    # 50-150 s through this class of link (docs/PERF.md "Checkpointing")
    state = export_torch_state_dict(device_get_packed(variables))
    torch.save({"model": {k: torch.from_numpy(v.copy()) for k, v in state.items()}}, path)


def load_imagenet_backbone(path: str, template_variables):
    """Load a torchvision ImageNet ``.pth`` into the model's backbone.

    torchvision files are bare state dicts keyed ``conv1.weight / layer1...``
    with a classifier head (``fc.*``) our headless backbone lacks; keys are
    prefixed onto ``backbone.`` and merged key-filtered, reproducing the
    reference's pretrained-backbone load (``uda/model/resnet.py:50-59``).
    """
    from dahpe_tpu.utils.torch_import import (
        filtered_update,
        import_torch_state_dict,
        load_pth,
    )

    state_dict = load_pth(path, key=None)
    state_dict = {
        "backbone." + k: v
        for k, v in state_dict.items()
        if not k.startswith("fc.")
    }
    imported = import_torch_state_dict(state_dict)
    return filtered_update(dict(template_variables), imported)


def load_reference_pth(path: str, template_variables, *, strict: bool = False):
    """Load a reference .pth into Flax variables.

    strict=True audits every key/shape (eval of published checkpoints);
    strict=False reproduces the reference's key-filtered warm start
    (``train1.py:184-189``).
    """
    from dahpe_tpu.utils.torch_import import (
        filtered_update,
        import_torch_state_dict,
        load_pth,
    )

    state_dict = load_pth(path)
    if strict:
        return import_torch_state_dict(
            state_dict, reference_variables=template_variables
        )
    imported = import_torch_state_dict(state_dict)
    return filtered_update(dict(template_variables), imported)
