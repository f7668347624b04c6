"""PRNG key plumbing shared by the trainer loops and benches."""

from __future__ import annotations

import jax


def iter_keys(key):
    """Infinite stream of fresh PRNG keys (device-resident jnp ops only —
    no host round trip per key)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
