"""Persistent XLA compilation cache.

On the axon-tunneled chip every first-touch compile blocks the client
for the full remote-compiler round trip (measured: 195 s for the
first trivial op of a process, 39 min for the 16 kb x 128-lane chain
bucket).  jax's persistent cache is keyed on (HLO, backend, config)
and works across processes on this backend, turning those into
one-time costs per kernel: a warm second process pays 0.6 s / 0.06 s
for the same two compiles.

Call enable() before the first jit of the process (idempotent).  The
default directory lives in the repo so the bench driver and tests
share warm entries across rounds; override with MGT_JAX_CACHE
(MGT_JAX_CACHE=0 disables).
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = str(Path(__file__).resolve().parents[2] / ".jax_cache")
_done = False


def enable() -> bool:
    global _done
    if _done:
        return True
    where = os.environ.get("MGT_JAX_CACHE", _DEFAULT)
    if where in ("0", "off", ""):
        return False
    # the cache exists to absorb the axon tunnel's remote-compile
    # costs; on the CPU backend compiles are cheap and loading AOT
    # entries across machine-feature variations risks SIGILL.  Decide
    # from the live backend, not the env var: jax silently falls back
    # to CPU when no accelerator is present.
    import jax
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    try:
        jax.config.update("jax_compilation_cache_dir", where)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return False
    _done = True
    return True
