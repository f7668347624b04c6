"""Robust multi-host bring-up for the ``--multihost`` path.

The reference has no distributed layer at all (``train1.py:34`` — one
``torch.device``); the rebuild's multi-host story is ``jax.distributed`` +
SPMD over a global mesh (``parallel/mesh.py``).  This module hardens the one
step of that story that talks to the network before SPMD exists: process
bring-up.

Why hardening is needed (VERDICT r4, weak #1): ``jax.distributed.initialize``
was called bare, and under scheduler pressure on a loaded host the 2-process
CLI rehearsal lost a coordinator race — a worker died with
``Gloo context initialization failed: Connect timeout``.  Two distinct
failure windows exist:

1. **Coordinator rendezvous** (``jax.distributed.initialize`` itself): the
   coordinator may come up seconds late when hosts start staggered.  Governed
   by ``initialization_timeout`` and retriable — a failed attempt holds no
   global state, so we shut the client down and try again with backoff.
2. **Collective-context bring-up** (first CPU collective): XLA's Gloo
   backend full-mesh-connects lazily inside the first collective; its
   connect timeout is an XLA flag (``--xla_cpu_collective_timeout_seconds``),
   parsed from ``XLA_FLAGS`` — it must be raised *before* backend creation
   and only on CPU (any XLA flag hangs the tunneled TPU backend at init —
   CLAUDE.md).  The test workers set it in their environment; this module
   only documents it.

Env knobs (all optional):

- ``DAHPE_DIST_INIT_TIMEOUT`` — seconds passed as ``initialization_timeout``
  (default 300, jax's own default).
- ``DAHPE_DIST_INIT_RETRIES`` — bounded retry count on timeout/connect-class
  failures (default 3 attempts total).
- ``DAHPE_COORDINATOR`` / ``DAHPE_NUM_PROCESSES`` / ``DAHPE_PROCESS_ID`` —
  explicit (torchrun-style) coordinator config for clusters jax cannot
  auto-detect, and for the 2-process CPU rehearsal in
  ``tests/test_multihost.py``.  On TPU pods leave them unset: the no-arg
  call auto-detects everything.
"""

from __future__ import annotations

import os
import time

import jax

# Substrings identifying the transient bring-up failure class (coordinator
# not yet listening / slow host): retriable.  Anything else (bad address,
# mismatched process counts) re-raises immediately.
_TRANSIENT = (
    "timeout",
    "timed out",
    "deadline",
    "connect",
    "unavailable",
    "connection refused",
)


def _is_transient(err: BaseException) -> bool:
    msg = str(err).lower()
    return any(s in msg for s in _TRANSIENT)


def robust_distributed_initialize(*, verbose: bool = True) -> None:
    """``jax.distributed.initialize`` with explicit timeout + bounded retry.

    Reads the ``DAHPE_*`` env contract documented in the module docstring.
    Raises the last error if every attempt fails, so a genuinely dead
    coordinator still surfaces loudly rather than hanging the pod.
    """
    kw: dict = {}
    if os.environ.get("DAHPE_COORDINATOR"):
        kw = dict(
            coordinator_address=os.environ["DAHPE_COORDINATOR"],
            num_processes=int(os.environ["DAHPE_NUM_PROCESSES"]),
            process_id=int(os.environ["DAHPE_PROCESS_ID"]),
        )
    kw["initialization_timeout"] = int(
        os.environ.get("DAHPE_DIST_INIT_TIMEOUT", "300")
    )
    attempts = max(1, int(os.environ.get("DAHPE_DIST_INIT_RETRIES", "3")))

    last: BaseException | None = None
    for attempt in range(attempts):
        try:
            jax.distributed.initialize(**kw)
            return
        except Exception as err:  # jaxlib raises bare RuntimeError subclasses
            last = err
            if not _is_transient(err) or attempt == attempts - 1:
                raise
            # A failed initialize can leave a half-open client; tear it down
            # before re-dialing (shutdown on an uninitialized client is a
            # no-op error we swallow).
            try:
                jax.distributed.shutdown()
            except Exception:
                pass
            delay = 2.0 * (attempt + 1)
            if verbose:
                print(
                    "jax.distributed.initialize attempt "
                    f"{attempt + 1}/{attempts} failed ({err}); "
                    f"retrying in {delay:.0f}s",
                    flush=True,
                )
            time.sleep(delay)
    raise last  # unreachable; keeps type-checkers honest


def cpu_collective_timeout_flag(seconds: int = 900) -> str:
    """The ``XLA_FLAGS`` fragment that raises XLA:CPU's Gloo collective
    (and lazy full-mesh connect) timeout.  Must be placed in ``XLA_FLAGS``
    *before* the backend is created, and only for CPU runs — any XLA flag
    hangs the tunneled TPU backend in this environment (CLAUDE.md)."""
    return f"--xla_cpu_collective_timeout_seconds={int(seconds)}"
