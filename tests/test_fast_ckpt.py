"""Packed checkpoint format + async saver (``utils/fast_ckpt.py``).

The packed format replaced orbax as the write path because a per-leaf
drain through a high-latency device link measured 50-150 s for the
flagship state (docs/PERF.md "Checkpointing"); these tests pin the
format's exactness, the legacy-orbax read path, and the AsyncSaver's
ordering/error contracts on CPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dahpe_tpu.utils import checkpoint as ckpt
from dahpe_tpu.utils import fast_ckpt


def small_tree():
    return {
        "params": {
            "conv": jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4),
            "bn": {"scale": (jnp.arange(5, dtype=jnp.bfloat16) / 3)},
        },
        "batch_stats": {"mean": jnp.full((4,), 2.5, jnp.float32)},
        "step": jnp.asarray(7, jnp.int32),
        "keys": jnp.arange(8, dtype=jnp.uint32),
        "gone": None,
    }


def assert_trees_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_packed_round_trip_exact(tmp_path):
    tree = small_tree()
    p = str(tmp_path / "ck")
    ckpt.save_state(p, tree)
    assert fast_ckpt.is_packed(p)
    template = jax.tree.map(jnp.zeros_like, tree)
    restored = ckpt.restore_state(p, template)
    assert_trees_equal(tree, restored)
    # bfloat16 survives the uint16 storage view bit-exactly
    assert restored["params"]["bn"]["scale"].dtype == jnp.bfloat16


def test_packed_overwrite_replaces_atomically(tmp_path):
    tree = small_tree()
    p = str(tmp_path / "ck")
    ckpt.save_state(p, tree)
    tree2 = jax.tree.map(lambda a: a + 1, tree)
    ckpt.save_state(p, tree2)
    restored = ckpt.restore_state(p, jax.tree.map(jnp.zeros_like, tree))
    assert int(restored["step"]) == 8
    # no stale swap directories left behind
    assert not os.path.exists(p + ".tmp_pack")
    assert not os.path.exists(p + ".old_pack")


def test_template_mismatch_is_a_hard_error(tmp_path):
    tree = small_tree()
    p = str(tmp_path / "ck")
    ckpt.save_state(p, tree)
    bad = jax.tree.map(jnp.zeros_like, tree)
    bad["step"] = jnp.zeros((2,), jnp.int32)
    with pytest.raises(ValueError, match="mismatch"):
        ckpt.restore_state(p, bad)


def test_template_free_load_model_variables(tmp_path):
    tree = small_tree()
    p = str(tmp_path / "ck")
    ckpt.save_state(p, tree)
    v = ckpt.load_model_variables(p)
    assert sorted(v) == ["batch_stats", "params"]
    np.testing.assert_array_equal(
        v["params"]["conv"], np.asarray(tree["params"]["conv"])
    )


def test_legacy_orbax_checkpoints_stay_restorable(tmp_path):
    import orbax.checkpoint as ocp

    tree = small_tree()
    # bf16 leaf dropped: orbax-on-disk round-trips it as float32 on some
    # versions; the legacy path only needs structural coverage here
    tree["params"]["bn"]["scale"] = jnp.ones((5,), jnp.float32)
    p = str(tmp_path / "legacy")
    ocp.PyTreeCheckpointer().save(p, jax.device_get(tree))
    assert not fast_ckpt.is_packed(p)
    restored = ckpt.restore_state(p, jax.tree.map(jnp.zeros_like, tree))
    assert_trees_equal(tree, restored)
    v = ckpt.load_model_variables(p)
    np.testing.assert_array_equal(
        v["params"]["conv"], np.asarray(tree["params"]["conv"])
    )


def test_async_saver_orders_save_link_prune(tmp_path):
    saver = fast_ckpt.AsyncSaver()
    tree = small_tree()
    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    for epoch in range(3):
        tree = jax.tree.map(lambda a: a + 1, tree)
        p = str(ckdir / str(epoch))
        saver.save(p, tree)
        saver.save_aux(p, best_acc=jnp.asarray(float(epoch)))
    # link depends on the pending save of epoch 2; prune depends on all
    saver.link(str(ckdir / "2"), str(ckdir / "best"))
    saver.run(lambda: ckpt.prune_epoch_checkpoints(str(ckdir), 1))
    saver.flush()
    assert sorted(os.listdir(ckdir)) == ["2", "2_aux.npz", "best"]
    best = ckpt.restore_state(
        str(ckdir / "best"), jax.tree.map(jnp.zeros_like, tree)
    )
    assert_trees_equal(tree, best)  # epoch-2 content
    assert float(np.load(str(ckdir / "2_aux.npz"))["best_acc"]) == 2.0


def test_async_saver_snapshot_is_donation_safe(tmp_path):
    """The enqueue-time pack must snapshot: mutating (here: deleting) the
    source arrays after save() returns cannot corrupt the write."""
    saver = fast_ckpt.AsyncSaver()
    tree = small_tree()
    expect = jax.device_get(tree)
    p = str(tmp_path / "ck")
    saver.save(p, tree)
    for leaf in jax.tree_util.tree_leaves(tree):
        leaf.delete()  # what donation does to the previous state
    saver.flush()
    restored = ckpt.restore_state(
        p, jax.tree.map(lambda a: np.zeros_like(a), expect)
    )
    assert_trees_equal(expect, restored)


def test_async_saver_same_path_supersession(tmp_path):
    """Saves to one path that outpace the worker: the newest generation
    wins; a superseded generation is only abandoned once a completed
    checkpoint exists (durability before freshness)."""
    import threading

    saver = fast_ckpt.AsyncSaver(max_pending=8)
    p = str(tmp_path / "latest")
    template = jax.tree.map(jnp.zeros_like, small_tree())

    gate = threading.Event()
    saver.run(gate.wait)  # hold the worker so both saves queue up
    t1 = small_tree()
    t2 = jax.tree.map(lambda a: a + 1, t1)
    saver.save(p, t1)  # superseded while queued, but no durable copy yet
    saver.save(p, t2)
    gate.set()
    saver.flush()
    assert int(ckpt.restore_state(p, template)["step"]) == int(t2["step"])

    gate2 = threading.Event()
    saver.run(gate2.wait)
    t3 = jax.tree.map(lambda a: a + 10, t1)
    t4 = jax.tree.map(lambda a: a + 20, t1)
    saver.save(p, t3)  # superseded AND a durable copy exists -> abandoned
    saver.save(p, t4)
    gate2.set()
    saver.flush()
    assert int(ckpt.restore_state(p, template)["step"]) == int(t4["step"])


def test_restore_survives_crash_inside_swap_window(tmp_path):
    """_drain_write's directory swap (rename path->old, rename tmp->path)
    is two renames; a hard kill between them leaves the only copy under a
    sibling name. resolve_packed must find it so --resume still works."""
    tree = small_tree()
    template = jax.tree.map(jnp.zeros_like, tree)
    p = str(tmp_path / "latest")
    ckpt.save_state(p, tree)

    # crash between the renames, tmp incomplete: only .old_pack remains
    os.rename(p, p + ".old_pack")
    assert fast_ckpt.resolve_packed(p) == p + ".old_pack"
    assert_trees_equal(tree, ckpt.restore_state(p, template))
    np.testing.assert_array_equal(
        ckpt.load_model_variables(p)["params"]["conv"],
        np.asarray(tree["params"]["conv"]),
    )

    # crash between the renames with tmp COMPLETE: tmp is the newest full
    # write and must win over old
    t2 = jax.tree.map(lambda a: a + 1, tree)
    tmp2 = str(tmp_path / "t2")
    ckpt.save_state(tmp2, t2)
    os.rename(tmp2, p + ".tmp_pack")
    assert fast_ckpt.resolve_packed(p) == p + ".tmp_pack"
    assert int(ckpt.restore_state(p, template)["step"]) == int(t2["step"])

    # an INCOMPLETE tmp (no spec file — killed mid-drain) never resolves
    os.remove(os.path.join(p + ".tmp_pack", fast_ckpt.SPEC_NAME))
    assert fast_ckpt.resolve_packed(p) == p + ".old_pack"

    # the advertised path always wins when it exists
    ckpt.save_state(p, t2)
    assert fast_ckpt.resolve_packed(p) == p


def test_next_save_promotes_stranded_tmp_instead_of_destroying_it(tmp_path):
    """A complete .tmp_pack with no checkpoint at the path (crash inside
    the swap window) is the ONLY copy; the next save must promote it to
    the path — not rmtree it — so a second crash mid-drain cannot lose
    the state entirely."""
    tree = small_tree()
    p = str(tmp_path / "latest")
    ckpt.save_state(p, tree)
    os.rename(p, p + ".tmp_pack")  # simulate the stranded swap

    # a drain that dies immediately (alive() false before chunk 0) models
    # the second crash: the promoted checkpoint must survive at `path`
    spec, chunks = fast_ckpt.pack_state(jax.tree.map(lambda a: a + 1, tree))
    assert not fast_ckpt._drain_write(p, spec, chunks, alive=lambda: False)
    assert fast_ckpt.is_packed(p)
    restored = ckpt.restore_state(p, jax.tree.map(jnp.zeros_like, tree))
    assert int(restored["step"]) == int(tree["step"])  # the promoted copy


def test_async_saver_surfaces_worker_errors(tmp_path):
    saver = fast_ckpt.AsyncSaver()
    saver.run(lambda: (_ for _ in ()).throw(OSError("disk full")))
    with pytest.raises(RuntimeError, match="disk full"):
        saver.flush()
    # the saver stays usable after the error is surfaced
    p = str(tmp_path / "ck")
    saver.save(p, small_tree())
    saver.flush()
    assert fast_ckpt.is_packed(p)
