"""Bucketed MXU equality-join: seed-hit collection that scales with K.

anchors_jax.collect_anchors_join scans every query against every index
key — O(Q*K) MXU work, fine for the MT toy graph (K~3k) but hopeless
at pangenome scale (MHC ~1M minimizers).  This module adds the bucket
level: keys are partitioned host-side by the top b bits of the
minimizer hash (keys are already sorted, so buckets are contiguous and
balanced — the hash is uniform), and each query only joins against its
own bucket.  Work drops to O(Q * K / 2^b) with a ~2x padding slack.

Pipeline (all sorts tiny, zero gathers/scatters):
  1. compaction sort now keys on (emitted, bucket) so queries arrive
     bucket-grouped; slot-in-bucket comes from a run-position scan.
  2. queries spread into a dense (2^b, QB) grid with a band-onehot
     matmul (flatkey == j), carrying the 9 join features + meta.
  3. per-bucket batched matmul join: (B, 2^b, QB, 9) x (2^b, 9, KB),
     exact-zero test, payload extract matmul — identical math to
     anchors_jax but 2^b-times less of it.
  4. expansion / packing / final sort as in anchors_jax.

Reads that overflow QB slots in some bucket (possible only for highly
repetitive reads) are flagged for the exact fallback path, like tie
overflow in sketch_jax4.

Scaling: MHC-scale (K~1e6, KB=128) probes in a few ms per 512-read
batch.  Human-scale (K~5e7) additionally shards buckets across the
"idx" mesh axis (parallel/shard.py) — 2^b and the mesh multiply.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.midx import MinimizerIndex
from . import u32
from .anchors_jax import PREC, _chunks9, _tandem_flags
from .sketch_jax4 import META_Q_BITS

U32 = jnp.uint32
U32MAX = jnp.uint32(0xFFFFFFFF)
F32 = jnp.float32


@dataclass
class BucketedJoinIndex:
    """Per-bucket device tables for the bucketed matmul join."""
    keymat: jnp.ndarray    # (2^b, 9, KB) f32
    keyext: jnp.ndarray    # (2^b, EXT, KB) f32 (transposed for layout)
    b_bits: int
    kb: int
    occ_cap: int
    k: int
    w: int
    n_key: int

    @classmethod
    def from_host(cls, gi: MinimizerIndex, occ_cap: int = 16,
                  b_bits: int | None = None,
                  kb_target: int = 64) -> "BucketedJoinIndex":
        keys = np.asarray(gi.keys, dtype=np.uint64)
        start = np.asarray(gi.key_start, dtype=np.int64)
        cnt = np.asarray(gi.key_cnt, dtype=np.int64)
        pos = np.asarray(gi.pos, dtype=np.uint64)
        seg_len = np.asarray([s.len for s in gi.g.seg], dtype=np.int64)
        K = len(keys)
        if b_bits is None:
            # nb is bounded by per-read query statistics (the spread
            # grid is nb*qb wide), NOT by K: more keys per bucket only
            # grows the matmul's K dimension, which the MXU amortizes.
            b_bits = 6 if K > 4096 else max(0, K.bit_length() - 6)
        nb = 1 << b_bits
        # bucket by the LOW hash bits: minimizers are window minima, so
        # their hash values skew small and the TOP bits are non-uniform
        bkt = (keys & np.uint64(nb - 1)).astype(np.int64)
        order = np.argsort(bkt, kind="stable")
        keys, start, cnt, bkt = keys[order], start[order], cnt[order], \
            bkt[order]
        counts = np.bincount(bkt, minlength=nb)
        KB = int(counts.max(initial=1))
        KB = max(KB, 8)
        KB = -(-KB // 512) * 512 if KB > 256 else KB  # pallas chunk align
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]

        EXT = 2 + 3 * occ_cap
        keymat = np.zeros((nb, 9, KB), np.float32)
        keymat[:, 8, :] = 1.0  # padding columns: dot >= 1, never match
        keyext = np.zeros((nb, EXT, KB), np.float32)
        Kc = _chunks9(keys)
        k2 = (Kc ** 2).sum(1)
        jv = np.arange(K, dtype=np.int64)
        v = bkt
        jj = jv - starts[v]
        for i in range(4):
            keymat[v, 2 * i, jj] = 1.0
            keymat[v, 2 * i + 1, jj] = -2.0 * Kc[:, i]
        keymat[v, 8, jj] = k2
        keyext[v, 0, jj] = cnt
        keyext[v, 1, jj] = 1.0
        # flatten (key, hit-slot) pairs for the position planes
        m = np.minimum(cnt, occ_cap)
        rows = np.repeat(jv, m)
        cols = np.arange(len(rows)) - np.repeat(np.cumsum(m) - m, m)
        p = pos[np.repeat(start, m) + cols]
        rid = (p >> np.uint64(32)).astype(np.int64)
        rposs = ((p & np.uint64(0xFFFFFFFF)) >> np.uint64(1)) \
            .astype(np.int64)
        strand = (p & np.uint64(1)).astype(np.int64)
        rv, rj = v[rows], jj[rows]
        keyext[rv, 2 + cols, rj] = (rid << 1) | strand
        keyext[rv, 2 + occ_cap + cols, rj] = rposs
        keyext[rv, 2 + 2 * occ_cap + cols, rj] = seg_len[rid] - rposs - 2
        return cls(keymat=jnp.asarray(keymat), keyext=jnp.asarray(keyext),
                   b_bits=b_bits, kb=KB, occ_cap=occ_cap, k=gi.k, w=gi.w,
                   n_key=K)


def _padb_fn(pad_b):
    def padb(a):
        if not pad_b:
            return a
        return jnp.pad(a, ((0, pad_b),) + ((0, 0),) * (a.ndim - 1))
    return padb


@partial(jax.jit, static_argnames=("nb", "qcap", "qb", "b_chunk"))
def spread_queries(hh, hl, meta, t_hh, t_hl, t_meta, nb: int,
                   qcap: int = 512, qb: int = 24, b_chunk: int = 32):
    """Compact emitted minimizers, group by bucket, spread to the dense
    (B, SB=nb*qb, 11) feature grid: 9 join features + m_lo + m_hi.
    Returns (sf, n_q, q_overflow)."""
    B, S_in = hh.shape
    SB = nb * qb
    b_chunk = min(b_chunk, B)
    pad_b = (-B) % b_chunk
    padb = _padb_fn(pad_b)

    emitted = meta != U32MAX
    t_emitted = t_meta != U32MAX
    tand = _tandem_flags(hh, hl, emitted)
    meta_t = jnp.where(tand, meta | U32(1 << 31), meta)
    t_meta_t = jnp.where(t_emitted, t_meta | U32(1 << 31), t_meta)

    chh = jnp.concatenate([hh, t_hh], 1)
    chl = jnp.concatenate([hl, t_hl], 1)
    cmeta = jnp.concatenate([meta_t, t_meta_t], 1)
    cemit = jnp.concatenate([emitted, t_emitted], 1)

    # bucket of each slot = low b bits of the minimizer hash
    bkt = chl & U32(nb - 1)
    sort_key = jnp.where(cemit, bkt, U32(nb + 1))

    n_q = jnp.sum(cemit, axis=1).astype(jnp.int32)
    q_overflow = n_q > qcap
    skey, qhh, qhl, qmeta = jax.lax.sort(
        (sort_key, chh, chl, cmeta), dimension=1, num_keys=1,
        is_stable=True)
    skey = skey[:, :qcap]
    qhh, qhl, qmeta = qhh[:, :qcap], qhl[:, :qcap], qmeta[:, :qcap]
    qvalid = jnp.arange(qcap)[None, :] < jnp.minimum(n_q, qcap)[:, None]

    # slot within the bucket run
    idx = jnp.arange(qcap, dtype=jnp.int32)[None, :]
    new_run = jnp.concatenate(
        [jnp.ones((B, 1), bool), skey[:, 1:] != skey[:, :-1]], 1)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_run, idx, -1), axis=1)
    slot = idx - run_start
    lost = qvalid & (slot >= qb)
    q_overflow = q_overflow | jnp.any(lost, axis=1)
    ok = qvalid & ~lost
    flatkey = jnp.where(ok, skey * U32(qb) + slot.astype(U32), U32(SB))

    # spread features to the dense (SB,) grid via onehot matmul
    m_lo32 = qhl
    feats = []
    for i in range(3):
        ci = ((m_lo32 >> U32(9 * i)) & U32(0x1FF)).astype(F32)
        feats.extend([ci * ci, ci])
    c3 = (((qhh << U32(5)) | (m_lo32 >> U32(27))) & U32(0x1FF)).astype(F32)
    feats.extend([c3 * c3, c3, jnp.ones_like(c3),
                  (qmeta & U32(0xFFF)).astype(F32),
                  (qmeta >> U32(12)).astype(F32)])
    featv = jnp.stack(feats, -1)  # (B, qcap, 11): 9 join + m_lo, m_hi
    featv = jnp.where(ok[..., None], featv, F32(0))

    j_iota = jnp.arange(SB, dtype=jnp.int32)

    def spread_chunk(_, args):
        fk, fv = args
        oh = (j_iota[None, :, None]
              == fk.astype(jnp.int32)[:, None, :]).astype(F32)
        out = jax.lax.dot_general(oh, fv, (((2,), (1,)), ((0,), (0,))),
                                  precision=PREC)
        return _, out

    nbc = (B + pad_b) // b_chunk
    _, sf = jax.lax.scan(
        spread_chunk, 0,
        (padb(flatkey).reshape(nbc, b_chunk, qcap),
         padb(featv).reshape(nbc, b_chunk, qcap, 11)))
    sf = sf.reshape(B + pad_b, SB, 11)[:B]
    # plane-major layout: an (.., 11) minor dim would pad to 128 lanes
    # and force a 10x relayout at every jit boundary
    return jnp.moveaxis(sf, 2, 0), n_q, q_overflow


@partial(jax.jit, static_argnames=("b_chunk",))
def probe_xla(keymat, keyext, sf, b_chunk: int = 0):
    """Reference XLA probe: per-bucket batched matmul join.  Bandwidth-
    bound (materializes the indicator in HBM); probe_pallas.py is the
    production path on TPU."""
    _, B, SB = sf.shape
    nb, _, KB = keymat.shape
    EXT = keyext.shape[1]
    qb = SB // nb
    if b_chunk == 0:
        budget = 256 * 1024 * 1024 // max(SB * KB * 4, 1)
        b_chunk = max(1, min(32, budget))
    b_chunk = min(b_chunk, B)
    pad_b = (-B) % b_chunk
    padb = _padb_fn(pad_b)
    nbc = (B + pad_b) // b_chunk
    sQ = jnp.moveaxis(sf[:9], 0, 2)  # (B, SB, 9)

    def probe_chunk(_, qc):
        D = jnp.einsum("cvqf,vfk->cvqk", qc, keymat, precision=PREC)
        ind = (D == 0).astype(F32)
        out = jnp.einsum("cvqk,vek->cevq", ind, keyext, precision=PREC)
        return _, out

    _, ext = jax.lax.scan(
        probe_chunk, 0,
        padb(sQ).reshape(nbc, b_chunk, nb, qb, 9))
    # (nbc, bc, EXT, nb, qb) -> (EXT, B, SB)
    ext = jnp.moveaxis(ext, 2, 0).reshape(EXT, B + pad_b, SB)
    return ext[:, :B]


@partial(jax.jit, static_argnames=("occ_cap", "acap", "b_chunk",
                                   "return_planes"))
def finish_anchors(ext, sf, max_occ, occ_cap: int, acap: int = 2048,
                   b_chunk: int = 32, return_planes: bool = False):
    """Expansion + anchor packing + final sort from probe output."""
    EXT, B, SB = ext.shape
    b_chunk = min(b_chunk, B)
    pad_b = (-B) % b_chunk
    padb = _padb_fn(pad_b)
    nbc = (B + pad_b) // b_chunk

    present = sf[8] > 0  # the constant-1 feature marks real slots
    m_lo = sf[9].astype(U32)
    m_hi = sf[10].astype(U32)

    cnt = ext[0].astype(jnp.int32)
    found = (ext[1] > 0) & present
    keep = found & (cnt < max_occ)
    occ = jnp.where(keep, jnp.minimum(cnt, occ_cap), 0)
    occ_byte = jnp.where(keep, jnp.minimum(cnt, 255), 0)

    offs = jnp.cumsum(occ, axis=1) - occ
    n_tot = jnp.sum(occ, axis=1)
    n_a = jnp.minimum(n_tot, acap).astype(jnp.int32)
    a_ovf = n_tot > acap

    qext = jnp.concatenate(
        [jnp.stack([offs.astype(F32), occ_byte.astype(F32),
                    m_lo.astype(F32), m_hi.astype(F32)], -1),
         jnp.moveaxis(ext[2:], 0, 2)], -1)
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

    _, aext = jax.lax.scan(
        band_chunk, 0,
        (padb(offs_f).reshape(nbc, b_chunk, SB),
         padb(ends_f).reshape(nbc, b_chunk, SB),
         padb(qext).reshape(nbc, b_chunk, SB, qext.shape[-1])))
    aext = aext.reshape(B + pad_b, acap, qext.shape[-1])[:B]

    a_valid = jnp.arange(acap)[None, :] < n_a[:, None]
    rank = (jnp.arange(acap, dtype=F32)[None, :] - aext[..., 0]) \
        .astype(jnp.int32)
    occ_b = aext[..., 1].astype(U32)
    qmeta_a = (aext[..., 3].astype(U32) << U32(12)) \
        | aext[..., 2].astype(U32)

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

    z = qmeta_a & U32(1)
    qpos = (qmeta_a >> U32(1)) & U32((1 << META_Q_BITS) - 1)
    span = (qmeta_a >> U32(META_Q_BITS + 1)) & U32(0x1F)
    tandem = qmeta_a >> U32(31)

    strand = rid_strand & U32(1)
    rid = rid_strand >> U32(1)
    rev = strand ^ z
    tpos = jnp.where(rev == 0, rpos, base + span.astype(jnp.int32))

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
        return axh, axl, ayh, ayl, n_a, a_ovf
    return (u32.to_u64(axh, axl), u32.to_u64(ayh, ayl), n_a, a_ovf)


def collect_anchors_bucketed(keymat, keyext, hh, hl, meta, t_hh, t_hl,
                             t_meta, max_occ, occ_cap: int,
                             qcap: int = 512, qb: int = 24,
                             acap: int = 2048, b_chunk: int = 32,
                             return_planes: bool = False,
                             pallas: bool = False,
                             pallas_interpret: bool = False):
    """Bucketed anchor collection; contract of collect_anchors_join.

    pallas=True routes the probe through the fused Pallas kernel
    (probe_pallas.py) as its own x64-free dispatch; otherwise the XLA
    reference probe runs (and the whole call can sit under jax.jit).
    """
    nb = keymat.shape[0]
    sf, n_q, q_overflow = spread_queries(hh, hl, meta, t_hh, t_hl, t_meta,
                                         nb, qcap=qcap, qb=qb,
                                         b_chunk=b_chunk)
    if pallas:
        from .probe_pallas import probe_bucketed_pallas
        B = sf.shape[1]
        bb = 128
        while B % bb:
            bb //= 2
        ext = probe_bucketed_pallas(sf[:9], keymat, keyext, nb, bb=bb,
                                    kc=min(512, keymat.shape[2]),
                                    interpret=pallas_interpret)
    else:
        ext = probe_xla(keymat, keyext, sf)
    out = finish_anchors(ext, sf, max_occ, occ_cap, acap=acap,
                         b_chunk=b_chunk, return_planes=return_planes)
    return (*out[:-1], q_overflow | out[-1])
