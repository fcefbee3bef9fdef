"""Seed-hit collection as MXU equality-joins (no scatter/gather).

Replaces collect_anchors_device (pipeline.py) for position-aligned
sketch planes (sketch_jax4).  The reference semantics are
collect_seed_hits (map-algo.c:152-192): for every query minimizer,
look up its index entry, keep entries with cnt < max_occ, emit one
anchor per (minimizer, position) pair, sort anchors by x.

TPU-native formulation: the index lookup is an *equality join* done on
the MXU.  A 34-bit minimizer m is split into four 9-bit chunks; with
query features [m1^2, m1, ..., m4^2, m4, 1] and key column
[1, -2c1, ..., 1, -2c4, sum(ci^2)] the dot product equals
sum((mi-ci)^2), which is ZERO iff m == key.  All values stay below
2^22, so f32 matmuls (precision="float32") are exact.  The 0/1 match
indicator then *extracts* the key's payload — occurrence count plus
the first occ_cap positions, baked into the extract matrix host-side —
with a second matmul.  Expansion from per-minimizer hit lists to a
flat anchor array uses a band indicator (offs <= a < offs+occ) and a
third matmul.  The only sorts are one bool-key compaction of emitted
slots and the final anchor order; there are no gathers or scatters,
which cost ~7 ms per 512x1024 elements on this backend.

Scaling note: the join is O(Q * K) MXU work — ideal for graphs up to
~10^5 distinct minimizers per shard (MHC-scale); larger graphs shard
the key table across devices (parallel/shard.py) or fall back to the
searchsorted path in pipeline.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.midx import MinimizerIndex
from . import u32
from .sketch_jax4 import META_Q_BITS, SketchPlanes

U32 = jnp.uint32
U32MAX = jnp.uint32(0xFFFFFFFF)
F32 = jnp.float32
PREC = "float32"  # bf16-pass-exact f32 matmuls; required for the joins


def _chunks9(v: np.ndarray) -> np.ndarray:
    """Split uint64 minimizers into four 9-bit chunks as f32."""
    return np.stack([((v >> (9 * i)) & 0x1FF).astype(np.float32)
                     for i in range(4)], -1)


@dataclass
class JoinIndex:
    """Device tables for the matmul-join anchor stage."""
    keymat: jnp.ndarray    # (9, K) f32 equality-join matrix
    keyext: jnp.ndarray    # (K, 2 + 3*occ_cap) f32 payload extract matrix
    km_p: jnp.ndarray      # (1, 9, Kpad) for the fused Pallas probe
    ke_p: jnp.ndarray      # (1, EXT, Kpad) transposed/padded
    occ_cap: int
    k: int
    w: int
    n_key: int

    @classmethod
    def from_host(cls, gi: MinimizerIndex, occ_cap: int = 16) -> "JoinIndex":
        keys = np.asarray(gi.keys, dtype=np.uint64)       # sorted minier
        start = np.asarray(gi.key_start, dtype=np.int64)
        cnt = np.asarray(gi.key_cnt, dtype=np.int64)
        pos = np.asarray(gi.pos, dtype=np.uint64)
        seg_len = np.asarray([s.len for s in gi.g.seg], dtype=np.int64)
        K = len(keys)
        assert keys.max(initial=0) < 1 << 36, "minimizer exceeds join width"

        Kc = _chunks9(keys)
        keymat = np.zeros((9, K), np.float32)
        for i in range(4):
            keymat[2 * i] = 1.0
            keymat[2 * i + 1] = -2.0 * Kc[:, i]
        keymat[8] = (Kc ** 2).sum(1)

        # payload: [cnt, 1(found)] + per hit slot [rid<<1|strand, rpos,
        # seg_len-rpos-2]; all values < 2^24 so the f32 extract is exact
        ext = np.zeros((K, 2 + 3 * occ_cap), np.float32)
        ext[:, 0] = cnt
        ext[:, 1] = 1.0
        for j in range(K):
            n = min(int(cnt[j]), occ_cap)
            p = pos[start[j]: start[j] + n]
            rid = (p >> np.uint64(32)).astype(np.int64)
            rposs = ((p & np.uint64(0xFFFFFFFF)) >> np.uint64(1)) \
                .astype(np.int64)
            strand = (p & np.uint64(1)).astype(np.int64)
            assert rid.max(initial=0) < 1 << 23
            assert rposs.max(initial=0) < 1 << 23
            ext[j, 2 + 0 * occ_cap: 2 + 0 * occ_cap + n] = \
                (rid << 1) | strand
            ext[j, 2 + 1 * occ_cap: 2 + 1 * occ_cap + n] = rposs
            ext[j, 2 + 2 * occ_cap: 2 + 2 * occ_cap + n] = \
                seg_len[rid] - rposs - 2
        kpad = max(256, -(-K // 256) * 256)
        km_p = np.zeros((1, 9, kpad), np.float32)
        km_p[0, 8, :] = 1.0  # padding columns never match
        km_p[0, :, :K] = keymat
        ke_p = np.zeros((1, ext.shape[1], kpad), np.float32)
        ke_p[0, :, :K] = ext.T
        return cls(keymat=jnp.asarray(keymat), keyext=jnp.asarray(ext),
                   km_p=jnp.asarray(km_p), ke_p=jnp.asarray(ke_p),
                   occ_cap=occ_cap, k=gi.k, w=gi.w, n_key=K)


def _tandem_flags(hh, hl, emitted):
    """MG_SEED_TANDEM analog: emitted minimizer whose hash equals the
    previous or next emitted hash (collect_matches, map-algo.c:73-86).
    Forward/backward fill of the last emitted hash, no gathers."""
    def combine(a, b):
        keep = b[2]
        return (jnp.where(keep, b[0], a[0]), jnp.where(keep, b[1], a[1]),
                a[2] | b[2])

    fwd = jax.lax.associative_scan(combine, (hh, hl, emitted), axis=1)
    prev_h = jnp.concatenate(
        [jnp.full_like(hh[:, :1], U32MAX), fwd[0][:, :-1]], 1)
    prev_l = jnp.concatenate(
        [jnp.full_like(hl[:, :1], U32MAX), fwd[1][:, :-1]], 1)
    bwd = jax.lax.associative_scan(combine, (hh, hl, emitted), axis=1,
                                   reverse=True)
    next_h = jnp.concatenate(
        [bwd[0][:, 1:], jnp.full_like(hh[:, :1], U32MAX)], 1)
    next_l = jnp.concatenate(
        [bwd[1][:, 1:], jnp.full_like(hl[:, :1], U32MAX)], 1)
    eq_prev = (hh == prev_h) & (hl == prev_l)
    eq_next = (hh == next_h) & (hl == next_l)
    return emitted & (eq_prev | eq_next)


@partial(jax.jit, static_argnames=("occ_cap", "qcap", "acap", "b_chunk",
                                   "return_planes"))
def collect_anchors_join(keymat, keyext, hh, hl, meta, t_hh, t_hl, t_meta,
                         max_occ, occ_cap: int, qcap: int = 512,
                         acap: int = 2048, b_chunk: int = 32,
                         return_planes: bool = False):
    """Anchor collection from sketch planes via MXU joins.

    Returns (ax, ay, n_a, q_overflow): (B, acap) uint64 anchors sorted
    by x (padding all-ones), per-read anchor count, and a per-read flag
    set when the read had more emitted minimizers than qcap.
    """
    B, S = hh.shape
    K = keymat.shape[1]
    EXT = keyext.shape[1]
    b_chunk = min(b_chunk, B)
    pad_b = (-B) % b_chunk

    emitted = meta != U32MAX
    t_emitted = t_meta != U32MAX
    tand = _tandem_flags(hh, hl, emitted)
    # ties are by definition repeats of the window minimum
    meta_t = jnp.where(tand, meta | U32(1 << 31), meta)
    t_meta_t = jnp.where(t_emitted, t_meta | U32(1 << 31), t_meta)

    chh = jnp.concatenate([hh, t_hh], 1)
    chl = jnp.concatenate([hl, t_hl], 1)
    cmeta = jnp.concatenate([meta_t, t_meta_t], 1)
    cemit = jnp.concatenate([emitted, t_emitted], 1)

    # ---- compact emitted slots to qcap (one bool-key sort) ----
    n_q = jnp.sum(cemit, axis=1).astype(jnp.int32)
    q_overflow = n_q > qcap
    _, qhh, qhl, qmeta = jax.lax.sort(
        (jnp.logical_not(cemit), chh, chl, cmeta), dimension=1,
        num_keys=1, is_stable=True)
    qhh, qhl, qmeta = qhh[:, :qcap], qhl[:, :qcap], qmeta[:, :qcap]
    qvalid = jnp.arange(qcap)[None, :] < jnp.minimum(n_q, qcap)[:, None]

    # ---- probe: equality join on the MXU ----
    # query features from 9-bit chunks of the 34-bit minimizer
    m_lo32 = qhl
    feats = []
    for i in range(3):
        ci = ((m_lo32 >> U32(9 * i)) & U32(0x1FF)).astype(F32)
        feats.extend([ci * ci, ci])
    # chunk 3 spans the 32-bit boundary
    c3 = (((qhh << U32(5)) | (m_lo32 >> U32(27))) & U32(0x1FF)).astype(F32)
    feats.extend([c3 * c3, c3, jnp.ones_like(c3)])
    Q = jnp.stack(feats, -1)  # (B, qcap, 9)
    Q = jnp.where(qvalid[..., None], Q, F32(-1))  # no key matches -1

    def probe_chunk(_, qc):
        D = jax.lax.dot_general(qc, keymat, (((2,), (0,)), ((), ())),
                                precision=PREC)
        ind = (D == 0).astype(F32)
        out = jax.lax.dot_general(ind, keyext, (((2,), (0,)), ((), ())),
                                  precision=PREC)
        return _, out

    Qp = jnp.pad(Q, ((0, pad_b), (0, 0), (0, 0))) if pad_b else Q
    nb = (B + pad_b) // b_chunk
    Qc = Qp.reshape(nb, b_chunk, qcap, 9)
    _, ext = jax.lax.scan(probe_chunk, 0, Qc)
    ext = ext.reshape(B + pad_b, qcap, EXT)[:B]

    cnt = ext[..., 0].astype(jnp.int32)
    found = ext[..., 1] > 0
    keep = found & qvalid & (cnt < max_occ)
    occ = jnp.where(keep, jnp.minimum(cnt, occ_cap), 0)
    occ_byte = jnp.where(keep, jnp.minimum(cnt, 255), 0)

    offs = jnp.cumsum(occ, axis=1) - occ
    n_tot = jnp.sum(occ, axis=1)
    n_a = jnp.minimum(n_tot, acap).astype(jnp.int32)
    q_overflow = q_overflow | (n_tot > acap)

    # ---- band expansion: anchor a belongs to query q iff
    # offs_q <= a < offs_q + occ_q ----
    qext_cols = [offs.astype(F32), occ_byte.astype(F32),
                 (qmeta & U32(0xFFF)).astype(F32),
                 (qmeta >> U32(12)).astype(F32)]
    qext = jnp.concatenate(
        [jnp.stack(qext_cols, -1), ext[..., 2:]], -1)  # (B,qcap,4+3*occ)
    offs_f = offs.astype(F32)
    ends_f = (offs + occ).astype(F32)
    a_iota = jnp.arange(acap, dtype=F32)

    def band_chunk(_, args):
        of, en, qe = args
        oh = ((a_iota[None, :, None] >= of[:, None, :])
              & (a_iota[None, :, None] < en[:, None, :])).astype(F32)
        out = jax.lax.dot_general(oh, qe, (((2,), (1,)), ((0,), (0,))),
                                  precision=PREC)
        return _, out

    def padb(a):
        if not pad_b:
            return a
        return jnp.pad(a, ((0, pad_b),) + ((0, 0),) * (a.ndim - 1))

    _, aext = jax.lax.scan(
        band_chunk, 0,
        (padb(offs_f).reshape(nb, b_chunk, qcap),
         padb(ends_f).reshape(nb, b_chunk, qcap),
         padb(qext).reshape(nb, b_chunk, qcap, qext.shape[-1])))
    aext = aext.reshape(B + pad_b, acap, qext.shape[-1])[:B]

    a_valid = jnp.arange(acap)[None, :] < n_a[:, None]
    rank = (jnp.arange(acap, dtype=F32)[None, :] - aext[..., 0]) \
        .astype(jnp.int32)
    occ_b = aext[..., 1].astype(U32)
    m_lo = aext[..., 2].astype(U32)
    m_hi = aext[..., 3].astype(U32)
    qmeta_a = (m_hi << U32(12)) | m_lo

    # select this anchor's hit slot by rank (static occ_cap-way select)
    rs = jnp.zeros_like(aext[..., 0])
    rp = jnp.zeros_like(rs)
    rb = jnp.zeros_like(rs)
    for s in range(occ_cap):
        here = rank == s
        rs = jnp.where(here, aext[..., 4 + s], rs)
        rp = jnp.where(here, aext[..., 4 + occ_cap + s], rp)
        rb = jnp.where(here, aext[..., 4 + 2 * occ_cap + s], rb)
    rid_strand = rs.astype(U32)
    rpos = rp.astype(jnp.int32)
    base = rb.astype(jnp.int32)

    # unpack query meta: tandem<<31 | span<<26 | qpos<<1 | z
    z = qmeta_a & U32(1)
    qpos = (qmeta_a >> U32(1)) & U32((1 << META_Q_BITS) - 1)
    span = (qmeta_a >> U32(META_Q_BITS + 1)) & U32(0x1F)
    tandem = qmeta_a >> U32(31)

    strand = rid_strand & U32(1)
    rid = rid_strand >> U32(1)
    rev = strand ^ z
    tpos = jnp.where(rev == 0, rpos, base + span.astype(jnp.int32))

    # ax = rid<<33 | rev<<32 | tpos ; ay = occ<<56 | seg<<48 |
    # tandem<<42 | span<<32 | qpos   (map-algo.c:152-192 packing)
    axh = (rid << U32(1)) | rev
    axl = tpos.astype(U32)
    ayh = (occ_b << U32(24)) | (tandem << U32(10)) | span
    ayl = qpos
    axh = jnp.where(a_valid, axh, U32MAX)
    axl = jnp.where(a_valid, axl, U32MAX)
    ayh = jnp.where(a_valid, ayh, U32MAX)
    ayl = jnp.where(a_valid, ayl, U32MAX)

    axh, axl, ayh, ayl = jax.lax.sort(
        (axh, axl, ayh, ayl), dimension=1, num_keys=2, is_stable=True)
    if return_planes:
        return axh, axl, ayh, ayl, n_a, q_overflow
    return (u32.to_u64(axh, axl), u32.to_u64(ayh, ayl), n_a, q_overflow)


def merge_planes(hh, hl, meta, t_hh, t_hl, t_meta):
    """Interleave main/tie planes into the exact reference emission
    order and set MG_SEED_TANDEM by emission-order adjacency.

    The reference emits, per trigger position t: the A/B-rule old
    minimum, then (B-rule) the first tie (sketch.c:90-105); the device
    planes park both AT t, so slot 2t = main, 2t+1 = tie reproduces
    mv[] order exactly (the one corner where a first-window tie
    precedes a main emission at the same t is flagged by the sketch's
    overflow bit).  Tandem = hash equal to the previous or the next
    emission in mv[] order (collect_matches, map-algo.c:83-85).
    Returns (mhh, mhl, mmeta, memit), each (B, 2S).
    """
    B, S = hh.shape

    def ilv(a, b):
        return jnp.stack([a, b], 2).reshape(B, 2 * S)

    mhh, mhl, mmeta = ilv(hh, t_hh), ilv(hl, t_hl), ilv(meta, t_meta)
    memit = mmeta != U32MAX
    tand = _tandem_flags(mhh, mhl, memit)
    mmeta = jnp.where(tand, mmeta | U32(1 << 31), mmeta)
    return mhh, mhl, mmeta, memit


@partial(jax.jit, static_argnames=("occ_cap", "qcap", "acap", "b_chunk"))
def collect_anchors_exact(keymat, keyext, hh, hl, meta, t_hh, t_hl, t_meta,
                          max_occ, occ_cap: int, qcap: int = 512,
                          acap: int = 2048, b_chunk: int = 32):
    """Byte-parity anchor collection (collect_seed_hits semantics,
    map-algo.c:58-192, including emission ORDER).

    Differences from collect_anchors_join that make this the
    production front-end for the parity CLI path:
      * main/tie planes interleaved in emission order (merge_planes),
        so x-tied anchors keep the reference's generation order under
        the stable sort (radix_sort_128x is LSD-stable; ties keep
        (minimizer emission idx, index hit idx) order);
      * tandem flags by exact emission adjacency, not plane heuristics;
      * occurrence truncation is FLAGGED: a kept minimizer with
        occ_cap < cnt < max_occ would silently lose anchors, so such
        reads route to the host path;
      * per-emission query info (q_cnt, q_meta) is returned so the
        host can compute rep_len and mini_pos (collect_matches
        semantics) without re-sketching.

    Returns a dict: axh/axl/ayh/ayl (B, acap) u32 anchor planes sorted
    by x with reference tie order, n_a, overflow, q_cnt (B, qcap) true
    index occurrence per emission (0 = not indexed), q_meta (B, qcap)
    tandem<<31|span<<26|qpos<<1|strand per emission (all-ones pad),
    n_q (B,) total emissions.
    """
    B, S = hh.shape
    b_chunk = min(b_chunk, B)
    pad_b = (-B) % b_chunk

    chh, chl, cmeta, cemit = merge_planes(hh, hl, meta, t_hh, t_hl, t_meta)

    n_q = jnp.sum(cemit, axis=1).astype(jnp.int32)
    q_overflow = n_q > qcap
    _, qhh, qhl, qmeta = jax.lax.sort(
        (jnp.logical_not(cemit), chh, chl, cmeta), dimension=1,
        num_keys=1, is_stable=True)
    qhh, qhl, qmeta = qhh[:, :qcap], qhl[:, :qcap], qmeta[:, :qcap]
    qvalid = jnp.arange(qcap)[None, :] < jnp.minimum(n_q, qcap)[:, None]

    m_lo32 = qhl
    feats = []
    for i in range(3):
        ci = ((m_lo32 >> U32(9 * i)) & U32(0x1FF)).astype(F32)
        feats.extend([ci * ci, ci])
    c3 = (((qhh << U32(5)) | (m_lo32 >> U32(27))) & U32(0x1FF)).astype(F32)
    feats.extend([c3 * c3, c3, jnp.ones_like(c3)])
    Q = jnp.stack(feats, -1)
    Q = jnp.where(qvalid[..., None], Q, F32(-1))

    def probe_chunk(_, qc):
        D = jax.lax.dot_general(qc, keymat, (((2,), (0,)), ((), ())),
                                precision=PREC)
        ind = (D == 0).astype(F32)
        out = jax.lax.dot_general(ind, keyext, (((2,), (0,)), ((), ())),
                                  precision=PREC)
        return _, out

    Qp = jnp.pad(Q, ((0, pad_b), (0, 0), (0, 0))) if pad_b else Q
    nb = (B + pad_b) // b_chunk
    _, ext = jax.lax.scan(probe_chunk, 0, Qp.reshape(nb, b_chunk, qcap, 9))
    ext = ext.reshape(B + pad_b, qcap, keyext.shape[1])[:B]

    cnt = ext[..., 0].astype(jnp.int32)
    found = ext[..., 1] > 0
    cnt = jnp.where(found, cnt, 0)
    keep = found & qvalid & (cnt < max_occ)
    occ = jnp.where(keep, jnp.minimum(cnt, occ_cap), 0)
    occ_byte = jnp.where(keep, jnp.minimum(cnt, 255), 0).astype(U32)
    n_tot = jnp.sum(occ, axis=1)
    n_a = jnp.minimum(n_tot, acap).astype(jnp.int32)
    a_overflow = n_tot > acap
    # silent anchor loss: cnt in (occ_cap, max_occ) would keep the
    # minimizer but drop hits beyond occ_cap
    trunc = jnp.any(keep & (cnt > occ_cap), axis=1)

    # ---- direct (query, slot) grid assembly: all elementwise ----
    slot_ok = (jnp.arange(occ_cap)[None, None, :]
               < occ[..., None])                         # (B, qcap, occ)
    rid_strand = ext[..., 2: 2 + occ_cap].astype(U32)
    rpos = ext[..., 2 + occ_cap: 2 + 2 * occ_cap].astype(jnp.int32)
    base = ext[..., 2 + 2 * occ_cap: 2 + 3 * occ_cap].astype(jnp.int32)

    qmeta_x = qmeta[..., None]
    z = qmeta_x & U32(1)
    qpos = (qmeta_x >> U32(1)) & U32((1 << META_Q_BITS) - 1)
    span = (qmeta_x >> U32(META_Q_BITS + 1)) & U32(0x1F)
    tandem_b = qmeta_x >> U32(31)

    strand = rid_strand & U32(1)
    rid = rid_strand >> U32(1)
    rev = strand ^ z
    tpos = jnp.where(rev == 0, rpos, base + span.astype(jnp.int32))

    axh = (rid << U32(1)) | rev
    axl = tpos.astype(U32)
    ayh = (occ_byte[..., None] << U32(24)) | (tandem_b << U32(10)) | span
    ayl = qpos
    axh = jnp.where(slot_ok, axh, U32MAX).reshape(B, qcap * occ_cap)
    axl = jnp.where(slot_ok, axl, U32MAX).reshape(B, qcap * occ_cap)
    ayh = jnp.where(slot_ok, ayh, U32MAX).reshape(B, qcap * occ_cap)
    ayl = jnp.where(slot_ok, ayl, U32MAX).reshape(B, qcap * occ_cap)

    axh, axl, ayh, ayl = jax.lax.sort(
        (axh, axl, ayh, ayl), dimension=1, num_keys=2, is_stable=True)
    axh, axl = axh[:, :acap], axl[:, :acap]
    ayh, ayl = ayh[:, :acap], ayl[:, :acap]
    # duplicate x keys: the reference sorts anchors with ksort.h's
    # IN-PLACE MSD radix sort, whose equal-key permutation is NOT
    # insertion order; distinct keys sort identically under any
    # algorithm, so only reads with x collisions (tandem self-hits)
    # need the host path.
    dup = jnp.any((axh[:, 1:] == axh[:, :-1])
                  & (axl[:, 1:] == axl[:, :-1])
                  & (axh[:, 1:] != U32MAX), axis=1)
    return {"axh": axh, "axl": axl, "ayh": ayh, "ayl": ayl, "n_a": n_a,
            "overflow": q_overflow | a_overflow | trunc | dup,
            "q_cnt": jnp.where(qvalid, cnt, 0),
            "q_meta": jnp.where(qvalid, qmeta, U32MAX),
            "n_q": n_q}


def collect_anchors_flat_pallas_traced(ji, hh, hl, meta, t_hh, t_hl,
                                       t_meta, max_occ, occ_cap: int,
                                       qcap: int = 512, acap: int = 2048,
                                       interpret: bool = False):
    """join2 semantics with the probe fused on-core (probe_pallas).

    Traceable; caller must be x64-free.  Returns u32 anchor planes.
    """
    from .probe_pallas import probe_flat_traced

    B, S = hh.shape
    emitted = meta != U32MAX
    t_emitted = t_meta != U32MAX
    tand = _tandem_flags(hh, hl, emitted)
    meta_t = jnp.where(tand, meta | U32(1 << 31), meta)
    t_meta_t = jnp.where(t_emitted, t_meta | U32(1 << 31), t_meta)

    chh = jnp.concatenate([hh, t_hh], 1)
    chl = jnp.concatenate([hl, t_hl], 1)
    cmeta = jnp.concatenate([meta_t, t_meta_t], 1)
    cemit = jnp.concatenate([emitted, t_emitted], 1)

    n_q = jnp.sum(cemit, axis=1).astype(jnp.int32)
    q_overflow = n_q > qcap
    _, qhh, qhl, qmeta = jax.lax.sort(
        (jnp.logical_not(cemit), chh, chl, cmeta), dimension=1,
        num_keys=1, is_stable=True)
    qhh, qhl, qmeta = qhh[:, :qcap], qhl[:, :qcap], qmeta[:, :qcap]
    qvalid = jnp.arange(qcap)[None, :] < jnp.minimum(n_q, qcap)[:, None]

    feats = []
    for i in range(3):
        ci = ((qhl >> U32(9 * i)) & U32(0x1FF)).astype(F32)
        feats.extend([ci * ci, ci])
    c3 = (((qhh << U32(5)) | (qhl >> U32(27))) & U32(0x1FF)).astype(F32)
    feats.extend([c3 * c3, c3, jnp.ones_like(c3)])
    sQ = jnp.stack([jnp.where(qvalid, f, F32(-1)) for f in feats])

    ext = probe_flat_traced(sQ, ji.km_p, ji.ke_p, interpret=interpret)
    # ext: (EXT, B, qcap) plane-major
    cnt = ext[0].astype(jnp.int32)
    found = ext[1] > 0
    keep = found & qvalid & (cnt < max_occ)
    occ = jnp.where(keep, jnp.minimum(cnt, occ_cap), 0)
    occ_byte = jnp.where(keep, jnp.minimum(cnt, 255), 0).astype(U32)
    n_tot = jnp.sum(occ, axis=1)
    n_a = jnp.minimum(n_tot, acap).astype(jnp.int32)
    a_overflow = n_tot > acap

    qmeta_x = qmeta
    z = qmeta_x & U32(1)
    qpos = (qmeta_x >> U32(1)) & U32((1 << META_Q_BITS) - 1)
    span = (qmeta_x >> U32(META_Q_BITS + 1)) & U32(0x1F)
    tandem_b = qmeta_x >> U32(31)

    parts = []
    for sft in range(occ_cap):
        ok_s = sft < occ
        rid_strand = ext[2 + sft].astype(U32)
        rpos = ext[2 + occ_cap + sft].astype(jnp.int32)
        base = ext[2 + 2 * occ_cap + sft].astype(jnp.int32)
        strand = rid_strand & U32(1)
        rid = rid_strand >> U32(1)
        rev = strand ^ z
        tpos = jnp.where(rev == 0, rpos, base + span.astype(jnp.int32))
        axh = jnp.where(ok_s, (rid << U32(1)) | rev, U32MAX)
        axl = jnp.where(ok_s, tpos.astype(U32), U32MAX)
        ayh = jnp.where(ok_s, (occ_byte << U32(24))
                        | (tandem_b << U32(10)) | span, U32MAX)
        ayl = jnp.where(ok_s, qpos, U32MAX)
        parts.append((axh, axl, ayh, ayl))
    axh = jnp.concatenate([p[0] for p in parts], 1)
    axl = jnp.concatenate([p[1] for p in parts], 1)
    ayh = jnp.concatenate([p[2] for p in parts], 1)
    ayl = jnp.concatenate([p[3] for p in parts], 1)

    axh, axl, ayh, ayl = jax.lax.sort(
        (axh, axl, ayh, ayl), dimension=1, num_keys=2, is_stable=True)
    return (axh[:, :acap], axl[:, :acap], ayh[:, :acap], ayl[:, :acap],
            n_a, q_overflow | a_overflow)
