"""Device runtime configuration for the TPU compute path.

The minimizer records are 64-bit packed (hash<<8|span, rid<<32|pos<<1|strand),
so the device path runs with x64 enabled.  Import this module before any
other jax usage inside minigraph_tpu.ops.
"""
from __future__ import annotations

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

U64 = jnp.uint64
I32 = jnp.int32


def u64(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint64)


def hash64_jnp(key: jnp.ndarray, mask) -> jnp.ndarray:
    """Vectorized invertible minimizer hash (sketch.c:28-38)."""
    key = key.astype(jnp.uint64)
    m = jnp.uint64(mask)
    key = (~key + (key << jnp.uint64(21))) & m
    key = key ^ (key >> jnp.uint64(24))
    key = (key + (key << jnp.uint64(3)) + (key << jnp.uint64(8))) & m
    key = key ^ (key >> jnp.uint64(14))
    key = (key + (key << jnp.uint64(2)) + (key << jnp.uint64(4))) & m
    key = key ^ (key >> jnp.uint64(28))
    key = (key + (key << jnp.uint64(31))) & m
    return key
