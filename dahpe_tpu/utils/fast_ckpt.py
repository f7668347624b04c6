"""Packed checkpoints: the whole train state as a few contiguous buffers.

A leaf-per-file checkpointer is pathological on a high-latency device
link: the flagship DA state is 981 leaves / 459 MB, and draining it
leaf-by-leaf through this environment's tunneled TPU costs 50-150 s
measured (each small transfer pays the ~26 ms round trip; the link does
not pipeline), with restore in the same class — before a byte hits disk.

Here ONE jitted program concatenates every leaf into per-dtype 1-D
buffers split into ~32 MB chunks (the measured sweet spot of the link:
one 459 MB transfer crawls at ~5 MB/s, 32 MB chunks sustain ~21 MB/s),
so a save is a handful of large transfers at the link's best rate plus
plain ``np.save`` writes (~2 GB/s disk; ``np.savez`` measured 250x
slower on this image and is avoided). Restore mirrors it: one upload per
chunk, then a single jitted slice/reshape/unflatten.

The packed chunks are freshly allocated device buffers, which makes them
natural snapshots for :class:`AsyncSaver`: the training loop can donate
its state buffers to the next iteration (``train/fused.py``) while a
worker thread drains the snapshot to disk — a concurrent D2H measured
ZERO slowdown on the compute stream (docs/PERF.md "Checkpointing"), so
epoch-boundary saves cost the loop nothing.

On-disk layout (a directory, like the orbax checkpoints it replaces, so
path/sidecar/prune semantics are unchanged)::

    <path>/packed_spec.json     # per-leaf path/shape/dtype + chunk table
    <path>/g<i>.npy             # chunk i (bfloat16 stored as uint16)

``utils/checkpoint.py`` keeps reading legacy orbax directories (those
lack ``packed_spec.json``) so older runs stay restorable.
"""

from __future__ import annotations

import json
import os
import shutil
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SPEC_NAME = "packed_spec.json"
CHUNK_BYTES = 32 * 1024 * 1024

# numpy has no native bfloat16: store those chunks as uint16 bit patterns
_STORAGE_VIEW = {"bfloat16": np.uint16}


def _key_step(k) -> list:
    """One key-path entry -> a JSON-able ``[kind, key]`` pair."""
    from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey

    if isinstance(k, DictKey):
        return ["d", str(k.key)]
    if isinstance(k, GetAttrKey):
        return ["a", k.name]
    if isinstance(k, SequenceKey):
        return ["s", str(k.idx)]
    if isinstance(k, FlattenedIndexKey):
        return ["i", str(k.key)]
    return ["?", str(k)]


def _spec_of(tree) -> tuple[dict, list]:
    """``(spec, leaves)``: per-leaf path/shape/dtype plus the chunk table
    assigning every leaf a (chunk, offset) in dtype-major order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    leaves_spec, leaves = [], []
    for path, leaf in flat:
        leaves_spec.append({
            "path": [_key_step(k) for k in path],
            "shape": list(leaf.shape),
            "dtype": np.dtype(leaf.dtype).name,
        })
        leaves.append(leaf)
    # dtype-major packing order: stable, independent of leaf order churn
    order = sorted(range(len(leaves)),
                   key=lambda i: (leaves_spec[i]["dtype"], i))
    chunks, cur_dtype, cur_elems, cur_members = [], None, 0, []
    for i in order:
        d = leaves_spec[i]["dtype"]
        size = int(np.prod(leaves_spec[i]["shape"], dtype=np.int64))
        per_elem = np.dtype(d).itemsize
        if (d != cur_dtype
                or (cur_elems + size) * per_elem > CHUNK_BYTES and cur_elems):
            if cur_members:
                chunks.append({"dtype": cur_dtype, "elems": cur_elems,
                               "members": cur_members})
            cur_dtype, cur_elems, cur_members = d, 0, []
        leaves_spec[i]["chunk"] = len(chunks)
        leaves_spec[i]["offset"] = cur_elems
        cur_members.append(i)
        cur_elems += size
    if cur_members:
        chunks.append({"dtype": cur_dtype, "elems": cur_elems,
                       "members": cur_members})
    return {"version": 1, "leaves": leaves_spec, "chunks": chunks}, leaves


@partial(jax.jit, static_argnums=(1,))
def _pack(leaves, spec_json: str):
    spec = json.loads(spec_json)
    out = []
    for chunk in spec["chunks"]:
        parts = [jnp.ravel(leaves[i]) for i in chunk["members"]]
        out.append(jnp.concatenate(parts) if len(parts) > 1
                   else jnp.reshape(parts[0], (-1,)) + jnp.zeros((), parts[0].dtype))
    return out


def pack_state(tree) -> tuple[dict, list]:
    """Snapshot ``tree`` into packed device chunks (fresh buffers — safe
    against the caller donating the original state to its next step)."""
    spec, leaves = _spec_of(tree)
    chunks = _pack(leaves, json.dumps(spec))
    return spec, chunks


def _host_view(h: np.ndarray) -> np.ndarray:
    view = _STORAGE_VIEW.get(h.dtype.name)
    return h.view(view) if view is not None else h


def _drain_write(path: str, spec: dict, chunks, alive=lambda: True) -> bool:
    """Fetch + write chunk by chunk; abandon cleanly if ``alive()`` turns
    false between chunks.

    Transfers are async-started a small window ahead (pipelining measured
    1.7x the strictly sequential fetch on this link; a FULL up-front
    async start would commit every transfer to the wire and make the job
    uncancelable — with the window, a superseded save stops within
    ~2 chunks instead of draining 459 MB nobody will read, which is what
    bounds the SIGTERM flush when a background save is still in flight).
    Returns True when the checkpoint was swapped in."""
    window = 2
    tmp = path + ".tmp_pack"
    if os.path.exists(tmp):
        # a COMPLETE leftover tmp with no checkpoint at `path` means a crash
        # landed inside a previous swap window (between the two renames
        # below): promote it instead of destroying the only copy
        if is_packed(tmp) and not is_packed(path):
            os.rename(tmp, path)
        else:
            shutil.rmtree(tmp)
    os.makedirs(tmp)
    started = 0
    for i, arr in enumerate(chunks):
        while started < min(len(chunks), i + window):
            try:
                chunks[started].copy_to_host_async()
            except Exception:
                pass  # backend without async copy: np.asarray still works
            started += 1
        if not alive():
            shutil.rmtree(tmp, ignore_errors=True)
            return False
        np.save(os.path.join(tmp, f"g{i}.npy"), _host_view(np.asarray(arr)))
    with open(os.path.join(tmp, SPEC_NAME), "w") as fh:
        json.dump(spec, fh)
    old = path + ".old_pack"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return True


def is_packed(path: str) -> bool:
    return os.path.isfile(os.path.join(path, SPEC_NAME))


def resolve_packed(path: str) -> str | None:
    """The readable packed checkpoint for ``path``, surviving a hard kill
    inside ``_drain_write``'s directory swap: the two renames (``path`` →
    ``.old_pack``, ``.tmp_pack`` → ``path``) are not jointly atomic, so a
    crash in that window leaves the state only under a sibling name.
    Preference order: ``path`` itself (the advertised checkpoint), then a
    COMPLETE ``.tmp_pack`` (crash between the renames — it is the newest
    full write), then ``.old_pack`` (crash after the first rename with an
    incomplete tmp). ``None`` when no complete checkpoint exists under any
    of the three names. Completeness == the spec file exists; it is written
    last, so a partially drained directory never resolves."""
    for p in (path, path + ".tmp_pack", path + ".old_pack"):
        if is_packed(p):
            return p
    return None


def save_packed(path: str, tree) -> None:
    """Pack + drain + write. EVERY process runs the pack program (a jit
    over multi-host global arrays must be entered collectively, even
    though replicated packing needs no communication); only process 0
    drains and writes (mirrors ``save_aux``)."""
    spec, chunks = pack_state(tree)
    if jax.process_index() != 0:
        return
    _drain_write(os.path.abspath(path), spec, chunks)


def _chunk_host_arrays(path: str, spec: dict) -> list:
    out = []
    for i, chunk in enumerate(spec["chunks"]):
        arr = np.load(os.path.join(path, f"g{i}.npy"))
        view = _STORAGE_VIEW.get(chunk["dtype"])
        if view is not None and arr.dtype == view:
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        out.append(arr)
    return out


def _load_spec(path: str) -> dict:
    with open(os.path.join(path, SPEC_NAME)) as fh:
        return json.load(fh)


@partial(jax.jit, static_argnums=(1,))
def _unpack(chunks, spec_json: str):
    spec = json.loads(spec_json)
    leaves = [None] * len(spec["leaves"])
    for ci, chunk in enumerate(spec["chunks"]):
        for i in chunk["members"]:
            ls = spec["leaves"][i]
            size = int(np.prod(ls["shape"], dtype=np.int64))
            flat = jax.lax.slice(chunks[ci], (ls["offset"],),
                                 (ls["offset"] + size,))
            leaves[i] = jnp.reshape(flat, ls["shape"])
    return leaves


def _replicated_sharding(target):
    """The template's mesh as a replicated sharding, when it has one —
    chunks uploaded with it make the jitted unpack produce leaves already
    laid out like the template (incl. multi-host replicated globals)."""
    from jax.sharding import NamedSharding, PartitionSpec

    for leaf in jax.tree_util.tree_leaves(target):
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding):
            return NamedSharding(sh.mesh, PartitionSpec())
    return None


def restore_packed(path: str, target):
    """Restore into ``target``'s structure: one upload per chunk, one
    jitted unpack. The saved per-leaf paths/shapes/dtypes must match the
    template exactly — a mismatch is a hard error, not a silent merge."""
    path = resolve_packed(os.path.abspath(path)) or os.path.abspath(path)
    spec = _load_spec(path)
    t_spec, _ = _spec_of(target)
    if t_spec["leaves"] != spec["leaves"]:
        for a, b in zip(t_spec["leaves"], spec["leaves"]):
            if a != b:
                raise ValueError(
                    f"packed checkpoint mismatch at {b['path']}: saved "
                    f"{b['shape']}/{b['dtype']} vs template "
                    f"{a['shape']}/{a['dtype']}"
                )
        raise ValueError(
            f"packed checkpoint holds {len(spec['leaves'])} leaves, "
            f"template has {len(t_spec['leaves'])}"
        )
    repl = _replicated_sharding(target)
    chunks = [jax.device_put(a) if repl is None else jax.device_put(a, repl)
              for a in _chunk_host_arrays(path, spec)]
    leaves = _unpack(chunks, json.dumps(spec))
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_packed_tree(path: str) -> dict:
    """Template-free restore to HOST numpy as nested dicts (dataclass
    fields become dict keys — the shape ``cli.test``/``cli.export`` expect
    when they pick ``{params, batch_stats}`` out of a full train state).
    Pure host slicing: no device involved."""
    path = resolve_packed(os.path.abspath(path)) or os.path.abspath(path)
    spec = _load_spec(path)
    host = _chunk_host_arrays(path, spec)
    root: dict = {}
    for ls in spec["leaves"]:
        size = int(np.prod(ls["shape"], dtype=np.int64))
        flat = host[ls["chunk"]][ls["offset"]:ls["offset"] + size]
        value = flat.reshape(ls["shape"])
        node = root
        for kind, key in ls["path"][:-1]:
            node = node.setdefault(key, {})
        node[ls["path"][-1][1]] = value
    return root


def device_get_packed(tree):
    """``jax.device_get`` through the packed path: ONE jitted concat into
    ~32 MB chunks + a pipelined drain, instead of a leaf-per-transfer
    round trip (50-150 s vs ~20-50 s for the flagship state on this
    link). Returns the same pytree structure with numpy leaves."""
    if not all(isinstance(l, jax.Array)
               for l in jax.tree_util.tree_leaves(tree)):
        return jax.device_get(tree)  # host/mixed trees: nothing to drain
    spec, chunks = pack_state(tree)
    for arr in chunks:
        try:
            arr.copy_to_host_async()
        except Exception:
            pass
    # no storage view needed: np.asarray of a bf16 device chunk already
    # yields an ml_dtypes.bfloat16 host array
    host = [np.asarray(c) for c in chunks]
    leaves = []
    for ls in spec["leaves"]:
        size = int(np.prod(ls["shape"], dtype=np.int64))
        flat = host[ls["chunk"]][ls["offset"]:ls["offset"] + size]
        leaves.append(flat.reshape(ls["shape"]))
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class AsyncSaver:
    """Overlap checkpoint writes with training.

    ``save()`` packs the state into fresh device buffers NOW (cheap, one
    dispatch) and hands the drain-to-disk to a worker thread; a
    concurrent D2H measured zero compute slowdown here, so the training
    loop keeps stepping while ~30 s of transfer happens behind it.
    ``link()`` enqueues a host-side copy of an already-saved checkpoint
    (the ``best`` copy is identical bytes to the epoch save — repeating
    the D2H for it would double the drain for nothing). Jobs run in
    submission order on ONE worker, so a ``link`` after its source's
    ``save`` is safe. ``flush()`` blocks until the queue drains and
    re-raises the first worker error; call it before process exit and
    before pruning. Bounded queue (default 2 pending) caps the extra HBM
    held by snapshots."""

    def __init__(self, max_pending: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._error: BaseException | None = None
        self._gen: dict[str, int] = {}  # per-path save generation
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            job = self._q.get()
            if job is None:  # close() sentinel
                self._q.task_done()
                return
            try:
                if self._error is None:
                    job()
            except BaseException as e:  # surfaced by the next flush/save
                self._error = e
            finally:
                self._q.task_done()

    def _raise_pending(self) -> None:
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError(f"async checkpoint save failed: {e}") from e

    def save(self, path: str, tree) -> None:
        self._raise_pending()
        spec, chunks = pack_state(tree)  # collective: all processes enter
        if jax.process_index() != 0:
            return
        path = os.path.abspath(path)
        # generation stamp: when saves to ONE path (--save-every's `latest`)
        # outpace the link, a superseded save is skipped if still queued
        # and ABANDONED at its next chunk boundary if already draining —
        # instead of pushing a full state nobody can ever observe through
        # the link ahead of the one that matters (the difference bounds
        # the SIGTERM flush). Durability caveat: a stale drain is only
        # abandoned once SOME completed checkpoint exists at the path —
        # otherwise a link slower than the save cadence would abandon
        # every generation in turn and a hard kill would find nothing.
        self._gen[path] = gen = self._gen.get(path, 0) + 1

        def job():
            _drain_write(
                path, spec, chunks,
                alive=lambda: (self._gen.get(path) == gen
                               or not is_packed(path)),
            )

        self._q.put(job)

    def save_aux(self, path: str, **arrays) -> None:
        """Sidecar write, ordered after any pending state save."""
        from dahpe_tpu.utils import checkpoint as ckpt

        self._raise_pending()
        if jax.process_index() != 0:
            return  # before the fetches: non-zero hosts skip the D2H too
        host = {k: (None if v is None else np.asarray(jax.device_get(v)))
                for k, v in arrays.items()}
        self._q.put(lambda: ckpt.save_aux(path, **host))

    def run(self, fn) -> None:
        """Enqueue an arbitrary host-side job (e.g. checkpoint pruning)
        ordered after every pending save — instead of flushing the queue
        at the epoch boundary just to sequence it."""
        self._raise_pending()
        if jax.process_index() != 0:
            return
        self._q.put(fn)

    def link(self, src: str, dst: str) -> None:
        """Duplicate checkpoint ``src`` at ``dst`` host-side (hardlinked
        files when the filesystem allows, copies otherwise)."""
        self._raise_pending()
        if jax.process_index() != 0:
            return
        src, dst = os.path.abspath(src), os.path.abspath(dst)

        def job():
            tmp = dst + ".tmp_pack"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            shutil.copytree(src, tmp, copy_function=_link_or_copy)
            old = dst + ".old_pack"
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(dst):
                os.rename(dst, old)
            os.rename(tmp, dst)
            if os.path.exists(old):
                shutil.rmtree(old)

        self._q.put(job)

    def flush(self) -> None:
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        """Drain pending jobs and stop the worker thread. The saver is
        unusable afterwards (further saves would queue forever)."""
        self._q.join()
        if self._thread.is_alive():
            self._q.put(None)
            self._thread.join()
        self._raise_pending()


def _link_or_copy(src: str, dst: str, *, follow_symlinks: bool = True) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)
