"""Banded dual-affine gap alignment as one Pallas kernel.

Batched score engine for the per-anchor-gap alignments of the base
alignment stage (mg_wfa_cmp / the short-gap cases of mg_gchain_cigar,
galign.c:39-145): B pairs aligned in lockstep, batch on lanes, the
band of anti-diagonal cells on sublanes, all five DP planes (H and
two affine gap pairs) resident in VMEM scratch across the sequential
anti-diagonal grid axis — nothing round-trips HBM except the input
sequence planes (streamed rows) and one score row at the end.

Semantics: min-plus global alignment with miniwfa's penalty model
(mismatch x, gaps min(o1+l*e1, o2+l*e2)); equals the exact WFA score
whenever the optimal path stays within the band of `wa` diagonals
(|i-j| <= wa-2 everywhere); otherwise returns the banded optimum
(an upper bound), or -1 when the end cell lies outside the band.
Score-only: the exact-CIGAR device path is ops/wfa_jax.py; the
host/native engines do traceback for output.

Anti-diagonal parity trick: cells on plane k have i-j == k (mod 2),
so the band is stored by ACTIVE slot a (diagonal d = 2a - wa + (k&1))
and the E/F dependencies become rolls that alternate {0,+1}/{-1,0}
with k's parity — two k's are unrolled per step so every roll amount
is a compile-time constant (Mosaic needs static shifts), and values
wrapped around the band edge are re-masked to INF.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 0x3F000000
SENT = 200          # common sentinel prefixed to both sequences
T_PAD, Q_PAD = 254, 255


def _shifted(x, sh, a_iota, wa):
    """x rolled so new[a] = old[a + sh] (sh in {-1, 0, 1}), with the
    slot that wrapped around the band edge reset to INF."""
    if sh == 0:
        return x
    r = pltpu.roll(x, (-sh) % wa, 0)
    edge = wa - 1 if sh == 1 else 0
    return jnp.where(a_iota == edge, INF, r)


def _banded_kernel(tl_ref, ql_ref, tp_ref, qp_ref, out_ref,
                   h1, h2, e1s, f1s, e2s, f2s, sc,
                   *, wa, ku, n_steps, x, o1, e1, o2, e2):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        a0 = jax.lax.broadcasted_iota(jnp.int32, h2.shape, 0)
        h2[...] = jnp.where(a0 == wa // 2, 0, INF)  # virtual (-1,-1)=0
        h1[...] = jnp.full(h1.shape, INF, jnp.int32)
        e1s[...] = jnp.full(h1.shape, INF, jnp.int32)
        f1s[...] = jnp.full(h1.shape, INF, jnp.int32)
        e2s[...] = jnp.full(h1.shape, INF, jnp.int32)
        f2s[...] = jnp.full(h1.shape, INF, jnp.int32)
        sc[...] = jnp.full(h1.shape, INF, jnp.int32)

    tlr = tl_ref[0:1, :]
    qlr = ql_ref[0:1, :]
    a_iota = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 0)

    # sequence windows covering all ku sub-iterations of this step:
    # t'[i] lives at physical row i + wa/2 (slot a reads i = m+P-wa/2+a
    # -> phys m+P+a); q'[j] at row c - j with c = n_steps-1+wa/2
    # (slot a reads j = m+wa/2-a -> phys c-m-wa/2+a, increasing in a)
    m0 = g * ku
    tw_all = tp_ref[pl.ds(m0, wa + ku + 1), :]
    qw_all = qp_ref[pl.ds(jnp.int32(n_steps) - m0 - jnp.int32(ku),
                          wa + ku), :]

    for u in range(ku):
        m = m0 + u
        for P in (0, 1):
            k = 2 * m + P
            tw = tw_all[u + P: u + P + wa, :]
            qw = qw_all[ku - 1 - u: ku - 1 - u + wa, :]
            sub = jnp.where(tw == qw, 0, x)

            h1p, h2p = h1[...], h2[...]
            # E source: slot a+P on plane k-1; F source: slot a+P-1
            esh, fsh = P, P - 1
            he = _shifted(h1p, esh, a_iota, wa)
            hf = _shifted(h1p, fsh, a_iota, wa)
            e1n = jnp.minimum(_shifted(e1s[...], esh, a_iota, wa) + e1,
                              he + (o1 + e1))
            e2n = jnp.minimum(_shifted(e2s[...], esh, a_iota, wa) + e2,
                              he + (o2 + e2))
            f1n = jnp.minimum(_shifted(f1s[...], fsh, a_iota, wa) + e1,
                              hf + (o1 + e1))
            f2n = jnp.minimum(_shifted(f2s[...], fsh, a_iota, wa) + e2,
                              hf + (o2 + e2))
            hn = jnp.minimum(jnp.minimum(jnp.minimum(e1n, f1n),
                                         jnp.minimum(e2n, f2n)),
                             h2p + sub)

            iv = (m + P - wa // 2) + a_iota
            jv = (m + wa // 2) - a_iota
            valid = (iv >= 0) & (jv >= 0) & (iv <= tlr) & (jv <= qlr)
            hn = jnp.where(valid, hn, INF)
            e1n = jnp.where(valid, e1n, INF)
            f1n = jnp.where(valid, f1n, INF)
            e2n = jnp.where(valid, e2n, INF)
            f2n = jnp.where(valid, f2n, INF)

            endk = (tlr + qlr) == k
            a_end = (tlr - qlr + (wa - P)) >> 1
            endm = endk & (a_iota == a_end)
            sc[...] = jnp.minimum(sc[...], jnp.where(endm, hn, INF))

            h2[...] = h1p
            h1[...] = hn
            e1s[...], f1s[...] = e1n, f1n
            e2s[...], f2s[...] = e2n, f2n

    @pl.when(g == pl.num_programs(1) - 1)
    def _fin():
        out_ref[...] = jnp.min(sc[...], axis=0, keepdims=True)


@partial(jax.jit,
         static_argnames=("n_steps", "wa", "ku", "pens", "bb",
                          "interpret"))
def banded_score_traced(tp, qp, tl8, ql8, n_steps: int, pens,
                        wa: int = 32, ku: int = 4, bb: int = 128,
                        interpret: bool = False):
    """tp/qp: (Lpad, B) int32 sequence planes from encode_banded;
    tl8/ql8: (8, B) int32 (row-replicated lengths).  Returns (1, B)
    int32 banded alignment penalties (>= INF/2 where the end cell
    never entered the band)."""
    x, o1, e1, o2, e2 = pens
    Lpad, B = tp.shape
    kern = partial(_banded_kernel, wa=wa, ku=ku, n_steps=n_steps,
                   x=x, o1=o1, e1=e1, o2=o2, e2=e2)
    grid = (B // bb, n_steps // ku)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, bb), lambda b, s: (0, b)),
            pl.BlockSpec((8, bb), lambda b, s: (0, b)),
            pl.BlockSpec((Lpad, bb), lambda b, s: (0, b)),
            pl.BlockSpec((Lpad, bb), lambda b, s: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, bb), lambda b, s: (0, b)),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((wa, bb), jnp.int32)
                        for _ in range(7)],
        interpret=interpret,
    )(tl8, ql8, tp, qp)


def encode_banded(pairs: List[Tuple[bytes, bytes]], wa: int = 32,
                  ku: int = 4, bb: int = 128):
    """Build the sequence planes for banded_score_traced.

    Returns (tp, qp, tl8, ql8, n_steps).  The target plane holds t'[i]
    at physical row i + wa/2 with t' = SENT + t; the query plane holds
    q'[j] at physical row (n_steps-1) + wa/2 - j.  Rows outside a
    pair's sequence carry distinct pads so they never compare equal."""
    B = len(pairs)
    Lmax = max(max(len(t), len(q)) for t, q in pairs) if pairs else 1
    n_steps = ((Lmax + 2 + ku - 1) // ku) * ku
    Lpad = ((n_steps + wa + ku + 1 + 7) // 8) * 8
    Bp = ((B + bb - 1) // bb) * bb
    # build row-major (pair-contiguous) then transpose once: column
    # writes into the (Lpad, Bp) layout are 60x slower
    tpr = np.full((Bp, Lpad), T_PAD, dtype=np.uint8)
    qpr = np.full((Bp, Lpad), Q_PAD, dtype=np.uint8)
    tl = np.zeros(Bp, dtype=np.int32)
    ql = np.zeros(Bp, dtype=np.int32)
    c = n_steps - 1 + wa // 2
    tpr[:B, wa // 2] = SENT
    qpr[:B, c] = SENT
    for i, (t, q) in enumerate(pairs):
        tl[i], ql[i] = len(t), len(q)
        tpr[i, wa // 2 + 1: wa // 2 + 1 + len(t)] = \
            np.frombuffer(t, dtype=np.uint8)
        qpr[i, c - len(q): c] = np.frombuffer(q, dtype=np.uint8)[::-1]
    tl8 = np.broadcast_to(tl, (8, Bp)).copy()
    ql8 = np.broadcast_to(ql, (8, Bp)).copy()
    return (jnp.asarray(tpr.T.astype(np.int32)),
            jnp.asarray(qpr.T.astype(np.int32)),
            jnp.asarray(tl8), jnp.asarray(ql8), n_steps)


def banded_score(pairs: List[Tuple[bytes, bytes]],
                 pens=(4, 4, 2, 15, 1), wa: int = 32,
                 interpret: bool = False) -> np.ndarray:
    """Batched banded dual-affine penalties; -1 where the end cell is
    outside the band (|len(t)-len(q)| > wa-2).  Flips x64 off around
    the Pallas dispatch (the remote compiler rejects x64 kernels)."""
    if not pairs:
        return np.zeros(0, dtype=np.int32)
    prev = jax.config.jax_enable_x64
    if prev:
        jax.config.update("jax_enable_x64", False)
    try:
        tp, qp, tl8, ql8, n_steps = encode_banded(pairs, wa=wa)
        out = banded_score_traced(tp, qp, tl8, ql8, n_steps,
                                  tuple(pens), wa=wa,
                                  interpret=interpret)
        s = np.asarray(out)[0, :len(pairs)]
    finally:
        if prev:
            jax.config.update("jax_enable_x64", True)
    return np.where(s >= (1 << 28), -1, s).astype(np.int32)
