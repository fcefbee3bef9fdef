"""Hash-table anchor collection: K-independent seed lookup via gathers.

Third probe backend, complementing the matmul joins (anchors_jax,
anchors_bucketed).  The equality-join scans O(K/2^b) keys per query on
the MXU, which tops out around MHC-scale indexes; this backend instead
uses a host-built two-choice cuckoo hash table and pays a FIXED number
of device gathers per batch — on this backend a (512, 512) gather
costs ~5 ms regardless of table size, so the hash probe wins once
K exceeds ~1e6 and is the only viable route to human-scale graphs
(K~5e7; combine with "idx"-axis mesh sharding).

Layout: every gather plane is uint32.
  tag[slot]  = low 32 bits of the minimizer hash
  pay[slot]  = start<<10 | cnt_capped8<<2 | hash_hi2  (exact key check:
               tag + the 2 high hash bits; minimizers are < 2^34;
               cnt caps at 255 so the reference occurrence tests
               — t < max_occ with max_occ <= 250 and the occ byte
               min(t,255) — stay exactly decidable)
  pos planes = (rid<<1|strand, rpos, base=seg_len-rpos-2) per hit

Expansion is a scatter + running max over anchor slots (O(B*acap))
plus per-field take_along_axis gathers; the probe and the per-anchor
position fetch are table gathers.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.midx import MinimizerIndex
from . import u32
from .anchors_jax import _tandem_flags
from .sketch_jax4 import META_Q_BITS

U32 = jnp.uint32
U32MAX = jnp.uint32(0xFFFFFFFF)
F32 = jnp.float32

# multiply-shift constants for the two table choices (odd, arbitrary)
MUL1A, MUL1B = 0x9E3779B1, 0x85EBCA77
MUL2A, MUL2B = 0xC2B2AE3D, 0x27D4EB2F


def _slot_hashes(hh, hl, hbits):
    """Two independent table slots from the (hi, lo) minimizer hash."""
    a1 = hl * np.uint32(MUL1A) + hh * np.uint32(MUL1B)
    a2 = hl * np.uint32(MUL2A) + hh * np.uint32(MUL2B)
    return (a1 >> np.uint32(32 - hbits)), (a2 >> np.uint32(32 - hbits))


@dataclass
class HashJoinIndex:
    """Cuckoo hash table + position planes on device."""
    tag: jnp.ndarray    # (H,) u32
    pay: jnp.ndarray    # (H,) u32
    p_rid: jnp.ndarray  # (P,) u32 rid<<1|strand
    p_sel: jnp.ndarray  # (2P,) u32 interleaved [rpos, seg_len-rpos-2];
    #                     indexed 2*i+rev so tpos needs ONE gather
    hbits: int
    occ_cap: int
    k: int
    w: int
    n_key: int

    @classmethod
    def from_host(cls, gi: MinimizerIndex, occ_cap: int = 16,
                  max_occ: int = 50) -> "HashJoinIndex":
        seg_len = np.asarray([s.len for s in gi.g.seg], dtype=np.int64)
        return cls.from_arrays(
            np.asarray(gi.keys, dtype=np.uint64),
            np.asarray(gi.key_start, dtype=np.int64),
            np.asarray(gi.key_cnt, dtype=np.int64),
            np.asarray(gi.pos, dtype=np.uint64),
            seg_len, k=gi.k, w=gi.w, occ_cap=occ_cap)

    @classmethod
    def from_arrays(cls, keys, start, cnt, pos, seg_len, k: int, w: int,
                    occ_cap: int = 16,
                    hbits_min: int = 0) -> "HashJoinIndex":
        """Build from flat index arrays (used directly for per-shard
        tables in idx-axis mesh sharding; hbits_min forces a common
        table size across shards)."""
        K = len(keys)
        assert keys.max(initial=0) < 1 << 34
        assert start.max(initial=0) < 1 << 22, \
            "position array too large for 22-bit start; shard the index"

        hh = (keys >> np.uint64(32)).astype(np.uint32)
        hl = keys.astype(np.uint32)
        cnt_c = np.minimum(cnt, 255)
        pay = (start.astype(np.uint32) << np.uint32(10)) \
            | (cnt_c.astype(np.uint32) << np.uint32(2)) \
            | hh
        hbits = max(4, hbits_min,
                    int(np.ceil(np.log2(max(K, 1) * 2))))
        for _ in range(6):
            H = 1 << hbits
            s1, s2 = _slot_hashes(hh, hl, hbits)
            table = np.full(H, -1, dtype=np.int64)  # key index per slot
            ok = True
            rng = np.random.default_rng(0)
            for j in range(K):
                cur, slot = j, int(s1[j])
                for _ in range(200):  # cuckoo random walk
                    if table[slot] < 0:
                        table[slot] = cur
                        cur = -1
                        break
                    cur, table[slot] = table[slot], cur
                    a, b = int(s1[cur]), int(s2[cur])
                    slot = b if slot == a else a
                if cur >= 0:
                    ok = False
                    break
            if ok:
                break
            hbits += 1
        else:
            raise RuntimeError("cuckoo build failed")
        tag = np.zeros(H, dtype=np.uint32)
        payt = np.full(H, 0xFFFFFFFF, dtype=np.uint32)
        filled = table >= 0
        tag[filled] = hl[table[filled]]
        payt[filled] = pay[table[filled]]

        p_rid = ((pos >> np.uint64(32)).astype(np.uint32) << np.uint32(1)) \
            | (pos & np.uint64(1)).astype(np.uint32)
        p_pos = ((pos & np.uint64(0xFFFFFFFF)) >> np.uint64(1)) \
            .astype(np.uint32)
        rid = (pos >> np.uint64(32)).astype(np.int64)
        p_base = (seg_len[rid] - p_pos.astype(np.int64) - 2) \
            .astype(np.uint32)
        p_sel = np.empty(2 * max(len(pos), 1), dtype=np.uint32)
        p_sel[0::2] = p_pos if len(pos) else 0
        p_sel[1::2] = p_base if len(pos) else 0
        return cls(tag=jnp.asarray(tag), pay=jnp.asarray(payt),
                   p_rid=jnp.asarray(p_rid), p_sel=jnp.asarray(p_sel),
                   hbits=hbits,
                   occ_cap=occ_cap, k=k, w=w, n_key=K)


@partial(jax.jit, static_argnames=("hbits", "occ_cap", "qcap", "acap",
                                   "b_chunk", "return_planes"))
def collect_anchors_hash(tag, pay, p_rid, p_sel, hh, hl, meta,
                         t_hh, t_hl, t_meta, max_occ, hbits: int,
                         occ_cap: int, qcap: int = 512, acap: int = 2048,
                         b_chunk: int = 32, return_planes: bool = False):
    """Anchor collection via cuckoo-hash gathers; contract of
    collect_anchors_join."""
    B, S_in = hh.shape

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

    # ---- probe: two cuckoo choices, 4 gathers ----
    s1, s2 = _slot_hashes(qhh, qhl, hbits)
    t1 = jnp.take(tag, s1.astype(jnp.int32))
    y1 = jnp.take(pay, s1.astype(jnp.int32))
    t2 = jnp.take(tag, s2.astype(jnp.int32))
    y2 = jnp.take(pay, s2.astype(jnp.int32))
    hit1 = (t1 == qhl) & ((y1 & U32(3)) == qhh) & (y1 != U32MAX)
    hit2 = (t2 == qhl) & ((y2 & U32(3)) == qhh) & (y2 != U32MAX)
    payv = jnp.where(hit1, y1, y2)
    found = (hit1 | hit2) & qvalid
    cnt = jnp.where(found, (payv >> U32(2)) & U32(0xFF), 0) \
        .astype(jnp.int32)
    start = jnp.where(found, payv >> U32(10), 0).astype(jnp.int32)

    # cnt in the table caps at 255; max_occ above that can't be checked
    keep = found & (cnt < jnp.minimum(max_occ, 255))
    occ = jnp.where(keep, jnp.minimum(cnt, occ_cap), 0)
    occ_byte = jnp.where(keep, cnt, 0)  # capped at 63 by the table

    offs = jnp.cumsum(occ, axis=1) - occ
    n_tot = jnp.sum(occ, axis=1)
    n_a = jnp.minimum(n_tot, acap).astype(jnp.int32)
    q_overflow = q_overflow | (n_tot > acap)

    # ---- band expansion via scatter + running max: anchor slot r of
    # read b belongs to emission q iff offs_q <= r < offs_q + occ_q.
    # Live emissions partition [0, n_tot) in ascending order, so
    # scattering q+1 at offs_q and taking a running max recovers the
    # emission per slot in O(B*(qcap+acap)) — the one-hot matmul this
    # replaces moved B*acap*qcap one-hot cells through HBM (~1 GB per
    # 16-read long bucket batch) and dominated long-read collect.
    q_iota = jnp.arange(qcap, dtype=jnp.int32)[None, :]
    # offs >= acap happens exactly on reads already flagged q_overflow
    # (n_tot > acap); without the clamp their emissions would scatter
    # into the NEXT read's slot range of the flattened mark array and
    # silently corrupt an unflagged neighbor's anchors.
    live = (occ > 0) & (offs < acap)
    rowb = jnp.arange(B, dtype=jnp.int32)[:, None]
    flat_i = jnp.where(live, rowb * acap + offs, B * acap)
    mark = jnp.zeros((B * acap,), jnp.int32).at[flat_i.reshape(-1)] \
        .max(jnp.broadcast_to(q_iota + 1, (B, qcap)).reshape(-1),
             mode="drop").reshape(B, acap)
    qidx = jnp.maximum(jax.lax.cummax(mark, axis=1) - 1, 0)

    def take_q(a):
        return jnp.take_along_axis(a, qidx, axis=1)

    a_valid = jnp.arange(acap)[None, :] < n_a[:, None]
    rank = jnp.arange(acap, dtype=jnp.int32)[None, :] - take_q(offs)
    occ_b = take_q(occ_byte).astype(U32)
    qmeta_a = take_q(qmeta)
    idx = jnp.where(a_valid, take_q(start) + rank, 0)

    # ---- per-anchor position fetch: 2 gathers (rev selects the
    # pre-flipped coordinate inside the interleaved plane) ----
    rid_strand = jnp.take(p_rid, idx)

    z = qmeta_a & U32(1)
    qpos = (qmeta_a >> U32(1)) & U32((1 << META_Q_BITS) - 1)
    span = (qmeta_a >> U32(META_Q_BITS + 1)) & U32(0x1F)
    tandem = qmeta_a >> U32(31)

    strand = rid_strand & U32(1)
    rid = rid_strand >> U32(1)
    rev = strand ^ z
    val = jnp.take(p_sel, ((idx.astype(U32) << U32(1)) | rev)
                   .astype(jnp.int32)).astype(jnp.int32)
    tpos = jnp.where(rev == 0, val, val + span.astype(jnp.int32))

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


@partial(jax.jit, static_argnames=("hbits", "occ_cap", "qcap", "acap",
                                   "b_chunk", "narrow"))
def collect_anchors_exact_hash(tag, pay, p_rid, p_sel, hh, hl, meta,
                               t_hh, t_hl, t_meta, max_occ, hbits: int,
                               occ_cap: int, qcap: int = 512,
                               acap: int = 2048, b_chunk: int = 32,
                               narrow: bool = False):
    """Byte-parity anchor collection with the cuckoo-hash probe.

    The K-independent sibling of anchors_jax.collect_anchors_exact for
    MHC-to-human scale indexes: same contract (emission-order merged
    planes, exact tandem flags, occurrence-cap truncation + duplicate-x
    flags, per-emission query info), with the O(Q*K) matmul probe
    replaced by two-choice cuckoo gathers.  Reads probing a saturated
    count field (cnt == 255 with max_occ > 255) are flagged."""
    from .anchors_jax import merge_planes

    B, S_in = hh.shape

    chh, chl, cmeta, cemit = merge_planes(hh, hl, meta, t_hh, t_hl, t_meta)

    n_q = jnp.sum(cemit, axis=1).astype(jnp.int32)
    q_overflow = n_q > qcap
    if narrow:
        # the emission compaction is a stable PARTITION, not a sort:
        # sort ONE u32 key (flag in the top bit, slot index below —
        # exactly reproducing the stable boolean sort's permutation)
        # and gather the three payload planes only up to qcap.  Cuts
        # the bitonic passes' bandwidth ~4x on the wide long-read
        # planes at the cost of 3 narrow gathers; bitwise-identical
        # output (tests/test_join_pipeline.py covers both settings).
        S2 = chh.shape[1]
        slot = jnp.arange(S2, dtype=jnp.uint32)[None, :]
        key = jnp.where(cemit, slot, slot | jnp.uint32(0x80000000))
        skey = jax.lax.sort(key, dimension=1)
        idx = (skey[:, :qcap] & jnp.uint32(0x7FFFFFFF)) \
            .astype(jnp.int32)
        qhh = jnp.take_along_axis(chh, idx, axis=1)
        qhl = jnp.take_along_axis(chl, idx, axis=1)
        qmeta = jnp.take_along_axis(cmeta, idx, axis=1)
    else:
        _, qhh, qhl, qmeta = jax.lax.sort(
            (jnp.logical_not(cemit), chh, chl, cmeta), dimension=1,
            num_keys=1, is_stable=True)
        qhh, qhl, qmeta = qhh[:, :qcap], qhl[:, :qcap], qmeta[:, :qcap]
    qvalid = jnp.arange(qcap)[None, :] < jnp.minimum(n_q, qcap)[:, None]

    # ---- probe: two cuckoo choices, 4 gathers ----
    s1, s2 = _slot_hashes(qhh, qhl, hbits)
    t1 = jnp.take(tag, s1.astype(jnp.int32))
    y1 = jnp.take(pay, s1.astype(jnp.int32))
    t2 = jnp.take(tag, s2.astype(jnp.int32))
    y2 = jnp.take(pay, s2.astype(jnp.int32))
    hit1 = (t1 == qhl) & ((y1 & U32(3)) == qhh) & (y1 != U32MAX)
    hit2 = (t2 == qhl) & ((y2 & U32(3)) == qhh) & (y2 != U32MAX)
    payv = jnp.where(hit1, y1, y2)
    found = (hit1 | hit2) & qvalid
    cnt = jnp.where(found, (payv >> U32(2)) & U32(0xFF), 0) \
        .astype(jnp.int32)
    start = jnp.where(found, payv >> U32(10), 0).astype(jnp.int32)

    keep = found & (cnt < max_occ)
    occ = jnp.where(keep, jnp.minimum(cnt, occ_cap), 0)
    occ_byte = jnp.where(keep, cnt, 0)  # table caps at 255 == min(,255)

    offs = jnp.cumsum(occ, axis=1) - occ
    n_tot = jnp.sum(occ, axis=1)
    n_a = jnp.minimum(n_tot, acap).astype(jnp.int32)
    a_overflow = n_tot > acap
    # silent anchor loss / saturated count field
    trunc = jnp.any(keep & (cnt > occ_cap), axis=1)
    trunc = trunc | ((max_occ > 255)
                     & jnp.any(found & (cnt == 255), axis=1))

    # ---- band expansion via scatter + running max: anchor slot r of
    # read b belongs to emission q iff offs_q <= r < offs_q + occ_q.
    # Live emissions partition [0, n_tot) in ascending order, so
    # scattering q+1 at offs_q and taking a running max recovers the
    # emission per slot in O(B*(qcap+acap)) — the one-hot matmul this
    # replaces moved B*acap*qcap one-hot cells through HBM (~1 GB per
    # 16-read long bucket batch) and dominated long-read collect.
    q_iota = jnp.arange(qcap, dtype=jnp.int32)[None, :]
    # clamp: emissions at offs >= acap belong only to reads already
    # flagged a_overflow; letting them scatter would corrupt the NEXT
    # read's slot range in the flattened mark array (silent wrong
    # anchors on an unflagged neighbor).
    live = (occ > 0) & (offs < acap)
    rowb = jnp.arange(B, dtype=jnp.int32)[:, None]
    flat_i = jnp.where(live, rowb * acap + offs, B * acap)
    mark = jnp.zeros((B * acap,), jnp.int32).at[flat_i.reshape(-1)] \
        .max(jnp.broadcast_to(q_iota + 1, (B, qcap)).reshape(-1),
             mode="drop").reshape(B, acap)
    qidx = jnp.maximum(jax.lax.cummax(mark, axis=1) - 1, 0)

    def take_q(a):
        return jnp.take_along_axis(a, qidx, axis=1)

    a_valid = jnp.arange(acap)[None, :] < n_a[:, None]
    rank = jnp.arange(acap, dtype=jnp.int32)[None, :] - take_q(offs)
    occ_b = take_q(occ_byte).astype(U32)
    qmeta_a = take_q(qmeta)
    idx = jnp.where(a_valid, take_q(start) + rank, 0)

    rid_strand = jnp.take(p_rid, idx)
    z = qmeta_a & U32(1)
    qpos = (qmeta_a >> U32(1)) & U32((1 << META_Q_BITS) - 1)
    span = (qmeta_a >> U32(META_Q_BITS + 1)) & U32(0x1F)
    tandem = qmeta_a >> U32(31)
    strand = rid_strand & U32(1)
    rid = rid_strand >> U32(1)
    rev = strand ^ z
    val = jnp.take(p_sel, ((idx.astype(U32) << U32(1)) | rev)
                   .astype(jnp.int32)).astype(jnp.int32)
    tpos = jnp.where(rev == 0, val, val + span.astype(jnp.int32))

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
    dup = jnp.any((axh[:, 1:] == axh[:, :-1])
                  & (axl[:, 1:] == axl[:, :-1])
                  & (axh[:, 1:] != U32MAX), axis=1)
    return {"axh": axh, "axl": axl, "ayh": ayh, "ayl": ayl, "n_a": n_a,
            "overflow": q_overflow | a_overflow | trunc | dup,
            "q_cnt": jnp.where(qvalid, cnt, 0),
            "q_meta": jnp.where(qvalid, qmeta, U32MAX),
            "n_q": n_q}
