"""64-bit integer arithmetic as (hi, lo) uint32 pairs.

TPUs have no native 64-bit integer path: XLA emulates every uint64 op,
and the emulation (plus 8-byte gathers) dominates the sketch/seed
profile.  These helpers express the same math on explicit uint32
planes, which the VPU executes natively.  All ops are elementwise and
shape-polymorphic.

The minimizer hash (sketch.c:28-38) and the 128-bit anchor packing
(map-algo.c:152-192) only ever need masked-width (< 2^56) values, so
the pair representation is exact.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

U32 = jnp.uint32
Pair = Tuple[jnp.ndarray, jnp.ndarray]


def pair(value: int) -> Tuple[int, int]:
    """Split a Python int into (hi, lo) uint32 constants."""
    return (value >> 32) & 0xFFFFFFFF, value & 0xFFFFFFFF


def from_u64(x: jnp.ndarray) -> Pair:
    return ((x >> jnp.uint64(32)).astype(U32),
            (x & jnp.uint64(0xFFFFFFFF)).astype(U32))


def to_u64(h: jnp.ndarray, l: jnp.ndarray) -> jnp.ndarray:
    return (h.astype(jnp.uint64) << jnp.uint64(32)) | l.astype(jnp.uint64)


def shl(h, l, n: int) -> Pair:
    """(h,l) << n for static 0 <= n < 64."""
    if n == 0:
        return h, l
    if n >= 32:
        return (l << U32(n - 32)) if n > 32 else l, jnp.zeros_like(l)
    return (h << U32(n)) | (l >> U32(32 - n)), l << U32(n)


def shr(h, l, n: int) -> Pair:
    """(h,l) >> n for static 0 <= n < 64 (logical)."""
    if n == 0:
        return h, l
    if n >= 32:
        return jnp.zeros_like(h), (h >> U32(n - 32)) if n > 32 else h
    return h >> U32(n), (l >> U32(n)) | (h << U32(32 - n))


def add(h1, l1, h2, l2) -> Pair:
    lo = l1 + l2
    carry = (lo < l1).astype(U32)
    return h1 + h2 + carry, lo


def add_small(h, l, c) -> Pair:
    """(h,l) + c for a uint32 c (array or scalar)."""
    lo = l + c
    carry = (lo < l).astype(U32)
    return h + carry, lo


def xor(h1, l1, h2, l2) -> Pair:
    return h1 ^ h2, l1 ^ l2


def not_(h, l) -> Pair:
    return ~h, ~l


def and_const(h, l, mask: int) -> Pair:
    mh, ml = pair(mask)
    return h & U32(mh), l & U32(ml)


def or_(h1, l1, h2, l2) -> Pair:
    return h1 | h2, l1 | l2


def eq(h1, l1, h2, l2) -> jnp.ndarray:
    return (h1 == h2) & (l1 == l2)


def lt(h1, l1, h2, l2) -> jnp.ndarray:
    """Unsigned (h1,l1) < (h2,l2)."""
    return (h1 < h2) | ((h1 == h2) & (l1 < l2))


def le(h1, l1, h2, l2) -> jnp.ndarray:
    return (h1 < h2) | ((h1 == h2) & (l1 <= l2))


def select(c, h1, l1, h2, l2) -> Pair:
    return jnp.where(c, h1, h2), jnp.where(c, l1, l2)


def min_newest(h1, l1, j1, h2, l2, j2):
    """Pairwise min keeping the NEWEST (largest j) element on ties.

    Matches the reference sketcher's rule that the running minimum
    moves to the most recent tied k-mer (sketch.c:84-89).
    """
    take2 = le(h2, l2, h1, l1)
    return (jnp.where(take2, h2, h1), jnp.where(take2, l2, l1),
            jnp.where(take2, j2, j1))


def hash64(h, l, mask: int) -> Pair:
    """Invertible minimizer hash on pairs (sketch.c:28-38)."""
    # key = (~key + (key << 21)) & mask
    nh, nl = not_(h, l)
    sh, sl = shl(h, l, 21)
    h, l = and_const(*add(nh, nl, sh, sl), mask)
    # key ^= key >> 24
    h, l = xor(h, l, *shr(h, l, 24))
    # key = (key + (key << 3) + (key << 8)) & mask
    a3 = shl(h, l, 3)
    a8 = shl(h, l, 8)
    h2, l2 = add(h, l, *a3)
    h, l = and_const(*add(h2, l2, *a8), mask)
    # key ^= key >> 14
    h, l = xor(h, l, *shr(h, l, 14))
    # key = (key + (key << 2) + (key << 4)) & mask
    a2 = shl(h, l, 2)
    a4 = shl(h, l, 4)
    h2, l2 = add(h, l, *a2)
    h, l = and_const(*add(h2, l2, *a4), mask)
    # key ^= key >> 28
    h, l = xor(h, l, *shr(h, l, 28))
    # key = (key + (key << 31)) & mask
    h, l = and_const(*add(h, l, *shl(h, l, 31)), mask)
    return h, l
