"""Batched 2-piece-affine WFA on device.

Many pairwise alignments advance in lockstep: one while_loop over the
score, each step extending every alignment's whole wavefront with
vectorized gather-compares and computing the next wave with shifted
maxes on the VPU (the same int32 recurrences as the host engine).
Traceback bits are recorded per score into an HBM tensor and decoded on
host with the exact reference traceback, so device CIGARs equal the
host/native CIGARs.

Intended for the -c per-anchor-gap alignments: thousands of short gap
alignments per read batch, padded into (B, D) wavefront planes.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.int32(-0x40000000)


@partial(jax.jit, static_argnames=("pens", "d_cap", "s_cap", "with_tb"))
def wfa_device(ts, tl, qs, ql, pens, d_cap: int, s_cap: int,
               with_tb: bool = True):
    """Align B sequence pairs.

    ts/qs: (B, L) uint8 padded with distinct sentinels (ts pad=254,
    qs pad=255); tl/ql: (B,) int32; pens: (x, o1, e1, o2, e2).
    d_cap: diagonals half-width (covers d in [-d_cap, d_cap]);
    s_cap: score budget.

    Returns (score, tb_bits, done_at):
      score: (B,) int32, -1 where the budget was exceeded
      tb_bits: (s_cap, B, D) uint8 traceback ops (when with_tb)
      done state encodes which alignments finished.
    """
    px, po1, pe1, po2, pe2 = pens
    B, L = ts.shape
    D = 2 * d_cap + 1
    d_off = jnp.arange(D, dtype=jnp.int32) - d_cap  # diagonal values

    max_pen = max(px, po1 + pe1, po2 + pe2)
    n_hist = max_pen + 1

    # ring buffer of the last max_pen+1 waves: (n_hist, B, D) per array
    def full(v):
        return jnp.full((n_hist, B, D), v, dtype=jnp.int32)

    H = full(NEG_INF)
    E1 = full(NEG_INF)
    F1 = full(NEG_INF)
    E2 = full(NEG_INF)
    F2 = full(NEG_INF)
    H = H.at[n_hist - 1, :, d_cap].set(-1)  # s=0 seed at diagonal 0
    tb = jnp.zeros((s_cap if with_tb else 1, B, D), dtype=jnp.uint8)
    score = jnp.full(B, -1, dtype=jnp.int32)
    done = jnp.zeros(B, dtype=bool)
    end_d = jnp.zeros(B, dtype=jnp.int32)
    no_ext = jnp.zeros(B, dtype=bool)

    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]

    def extend_all(Hc):
        """Greedy exact-match extension on every diagonal (B, D)."""
        def cond(st):
            Hc, any_ok = st
            return any_ok

        def body(st):
            Hc, _ = st
            k = Hc
            valid = (k >= -1) & (k < tl[:, None]) \
                & (d_off[None, :] + k >= -1) \
                & (d_off[None, :] + k < ql[:, None])
            tpos = jnp.clip(k + 1, 0, L - 1)
            qpos = jnp.clip(d_off[None, :] + k + 1, 0, L - 1)
            tch = ts[bidx, tpos]
            qch = qs[bidx, qpos]
            can = valid & (k + 1 < tl[:, None]) \
                & (d_off[None, :] + k + 1 < ql[:, None]) & (tch == qch)
            Hc2 = jnp.where(can, k + 1, Hc)
            return Hc2, jnp.any(can)

        Hc, _ = jax.lax.while_loop(cond, body, (Hc, jnp.bool_(True)))
        return Hc

    def step(s, st):
        H, E1, F1, E2, F2, tb, score, done, end_d, no_ext = st
        top = (s - 1) % n_hist  # slot holding wave s-1... see ring note
        # ring indexing: wave (s) is written to slot s % n_hist; the seed
        # wave 0 lives at slot n_hist-1 ≡ -1 mod n_hist... we instead keep
        # "slot(s) = (n_hist - 1 + s) % n_hist"
        def slot(sv):
            return (n_hist - 1 + sv) % n_hist

        cur = slot(s)
        Hpre = H[cur]
        Hc = jnp.where(done[:, None], Hpre, extend_all(Hpre))
        # end test (host scans diagonals in increasing order: take first)
        at_end = (Hc == tl[:, None] - 1) \
            & (d_off[None, :] + Hc == ql[:, None] - 1) & (Hc > NEG_INF)
        now_done = jnp.any(at_end, axis=1) & ~done
        first_d = jnp.argmax(at_end, axis=1).astype(jnp.int32)
        end_d = jnp.where(now_done, first_d, end_d)
        bvec = jnp.arange(B)
        no_ext = jnp.where(now_done,
                           Hc[bvec, first_d] == Hpre[bvec, first_d], no_ext)
        score = jnp.where(now_done, s, score)
        done = done | now_done
        H = H.at[cur].set(Hc)

        # next wave s+1
        nxt = slot(s + 1)

        def sh_m(a):  # value at d-1
            return jnp.pad(a, ((0, 0), (1, 0)),
                           constant_values=NEG_INF)[:, :D]

        def sh_p(a):  # value at d+1
            return jnp.pad(a, ((0, 0), (0, 1)),
                           constant_values=NEG_INF)[:, 1:]

        pHx = H[slot(s + 1 - px)]
        pHo1 = H[slot(s + 1 - po1 - pe1)]
        pHo2 = H[slot(s + 1 - po2 - pe2)]
        pE1 = E1[slot(s + 1 - pe1)]
        pF1 = F1[slot(s + 1 - pe1)]
        pE2 = E2[slot(s + 1 - pe2)]
        pF2 = F2[slot(s + 1 - pe2)]
        # guard: waves with s+1-pen < 0 hold NEG_INF anyway (ring init)

        ho1m, ho2m = sh_m(pHo1), sh_m(pHo2)
        e1m, e2m = sh_m(pE1), sh_m(pE2)
        ho1p, ho2p = sh_p(pHo1), sh_p(pHo2)
        f1p, f2p = sh_p(pF1), sh_p(pF2)

        nE1 = jnp.maximum(ho1m, e1m)
        nE2 = jnp.maximum(ho2m, e2m)
        e = jnp.maximum(nE1, nE2)
        nF1 = jnp.maximum(ho1p, f1p) + 1
        nF2 = jnp.maximum(ho2p, f2p) + 1
        f = jnp.maximum(nF1, nF2)
        h = jnp.maximum(e, f)
        nH = jnp.maximum(pHx + 1, h)

        if with_tb:
            x = jnp.zeros((B, D), dtype=jnp.uint8)
            x |= jnp.where(ho1m >= e1m, 0, 0x08).astype(jnp.uint8)
            x |= jnp.where(ho2m >= e2m, 0, 0x20).astype(jnp.uint8)
            ze = jnp.where(nE1 >= nE2, 1, 3).astype(jnp.uint8)
            x |= jnp.where(ho1p >= f1p, 0, 0x10).astype(jnp.uint8)
            x |= jnp.where(ho2p >= f2p, 0, 0x40).astype(jnp.uint8)
            zf = jnp.where(nF1 >= nF2, 2, 4).astype(jnp.uint8)
            z = jnp.where(e >= f, ze, zf)
            z = jnp.where(pHx + 1 >= h, 0, z).astype(jnp.uint8)
            zero = jnp.zeros((), dtype=s.dtype)
            tb = jax.lax.dynamic_update_slice(tb, (x | z)[None],
                                              (s, zero, zero))

        keep = done[:, None]
        H = H.at[nxt].set(jnp.where(keep, H[nxt], nH))
        E1 = E1.at[nxt].set(jnp.where(keep, E1[nxt], nE1))
        F1 = F1.at[nxt].set(jnp.where(keep, F1[nxt], nF1))
        E2 = E2.at[nxt].set(jnp.where(keep, E2[nxt], nE2))
        F2 = F2.at[nxt].set(jnp.where(keep, F2[nxt], nF2))
        return H, E1, F1, E2, F2, tb, score, done, end_d, no_ext

    def cond(carry):
        s, st = carry
        done = st[7]
        return (s < s_cap) & ~jnp.all(done)

    def body(carry):
        s, st = carry
        return s + 1, step(s, st)

    st = (H, E1, F1, E2, F2, tb, score, done, end_d, no_ext)
    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st))
    return st[6], st[5], st[7], st[8], st[9]


def encode_pairs(pairs: List[Tuple[bytes, bytes]], L: Optional[int] = None):
    """Pad pairs to (B, L) with distinct sentinels (254 target, 255 query)."""
    Lmax = L or max(max(len(a), len(b)) for a, b in pairs)
    B = len(pairs)
    ts = np.full((B, Lmax + 8), 254, dtype=np.uint8)
    qs = np.full((B, Lmax + 8), 255, dtype=np.uint8)
    tl = np.zeros(B, dtype=np.int32)
    ql = np.zeros(B, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        ts[i, : len(a)] = np.frombuffer(a, dtype=np.uint8)
        qs[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        tl[i] = len(a)
        ql[i] = len(b)
    return (jnp.asarray(ts), jnp.asarray(tl), jnp.asarray(qs),
            jnp.asarray(ql))


def traceback_host(pair: Tuple[bytes, bytes], s: int, tb_col: np.ndarray,
                   d_cap: int, end_d: int, no_ext: bool,
                   pens=(4, 4, 2, 15, 1)) -> List[int]:
    """Decode one alignment's device traceback bits with the exact host
    traceback (align/wfa.py semantics)."""
    from ..align.wfa import WfOpt, _pad_str, _traceback
    ts, qs = pair
    pts, pqs = _pad_str(ts, qs)
    opt = WfOpt(x=pens[0], o1=pens[1], e1=pens[2], o2=pens[3], e2=pens[4])
    # device tb rows are full-width (B, D) planes indexed by d + d_cap
    tb = [(-d_cap, d_cap, tb_col[i]) for i in range(s)]
    last = 0
    if s > 0 and no_ext:
        last = int(tb_col[s - 1][end_d]) & 7
    return _traceback(opt, tb, len(ts) - 1, pts, len(qs) - 1, pqs, last)


@partial(jax.jit, static_argnames=("pens", "d_cap", "t_cap"))
def wfa_tb_walk(ts, tl, qs, ql, tb, score, end_d, no_ext, pens,
                d_cap: int, t_cap: int):
    """On-device traceback walk over the recorded tb bits.

    Mirrors the reference walk (miniwfa.c:330-377 / align/wfa.py
    _traceback) one base-consuming action per step, vectorized over
    the batch, so the (s_cap, B, D) tb planes never leave the device —
    only a (t_cap, B) op trace does (every step consumes >= 1 of
    i+k, so t_cap = tl + ql + 2 bounds the walk).

    Returns (ops, fin_i, fin_k): per-step op codes (7 match, 8
    mismatch, 1 ins, 2 del, 0 inactive) emitted END-first, and the
    final (i, k) for the host's leading-indel cleanup.
    """
    px, po1, pe1, po2, pe2 = pens
    S, B, D = tb.shape
    tb_flat = tb.reshape(-1)
    bidx = jnp.arange(B, dtype=jnp.int32)

    i0 = ql - 1
    k0 = tl - 1
    active0 = score >= 0
    # state 1/3 -> I (consumes i), 2/4 -> D (consumes k), 0 -> X
    pen_open = jnp.array([px, po1 + pe1, po1 + pe1, po2 + pe2, po2 + pe2],
                         jnp.int32)
    pen_ext = jnp.array([px, pe1, pe1, pe2, pe2], jnp.int32)

    def body(carry):
        t, i, k, sx, last, active, ops, fi, fk = carry
        inb = (i >= 0) & (k >= 0) & active
        tch = ts[bidx, jnp.clip(k, 0, ts.shape[1] - 1)]
        qch = qs[bidx, jnp.clip(i, 0, qs.shape[1] - 1)]
        m = inb & (last == 0) & (tch == qch)

        # tb read for the non-match lanes
        d = jnp.clip(i - k + d_cap, 0, D - 1)
        srow = jnp.clip(sx, 0, S - 1)
        x = tb_flat[(srow * B + bidx) * D + d]
        state = jnp.where(last == 0, (x & 7).astype(jnp.int32), last)
        ext = jnp.where(state > 0,
                        (x >> (state + 2).astype(jnp.uint8)) & 1, 0) \
            .astype(jnp.int32)

        op = jnp.where(m, 7,
             jnp.where(state == 0, 8,
             jnp.where((state == 1) | (state == 3), 1, 2))).astype(jnp.uint8)
        op = jnp.where(inb, op, 0)
        ops = jax.lax.dynamic_update_index_in_dim(ops, op, t, 0)

        di = jnp.where(m | (state == 0) | (state == 1) | (state == 3), 1, 0)
        dk = jnp.where(m | (state == 0) | (state == 2) | (state == 4), 1, 0)
        pen = jnp.where(ext == 1, pen_ext[state], pen_open[state])
        i2 = jnp.where(inb, i - di, i)
        k2 = jnp.where(inb, k - dk, k)
        sx2 = jnp.where(inb & ~m, sx - pen, sx)
        last2 = jnp.where(inb & ~m & (state > 0) & (ext == 1), state, 0)
        last2 = jnp.where(m, 0, jnp.where(inb, last2, last))
        now_out = active & ((i2 < 0) | (k2 < 0))
        fi = jnp.where(now_out & active, i2, fi)
        fk = jnp.where(now_out & active, k2, fk)
        active2 = active & ~now_out
        return (t + 1, i2, k2, sx2, last2, active2, ops, fi, fk)

    def cond(carry):
        t = carry[0]
        active = carry[5]
        return (t < t_cap) & jnp.any(active)

    ops = jnp.zeros((t_cap, B), dtype=jnp.uint8)
    init = (jnp.int32(0), i0, k0, score - 1,
            no_ext_state(no_ext, tb, score, end_d),
            active0, ops, i0, k0)
    out = jax.lax.while_loop(cond, body, init)
    return out[6], out[7], out[8]


def no_ext_state(no_ext, tb, score, end_d):
    """Initial `last` state: when the final cell was reached without a
    fresh extension, the walk continues in the recorded state of the
    final score's strip (mwf_wfa_core, miniwfa.c:404-406)."""
    S, B, D = tb.shape
    bidx = jnp.arange(B, dtype=jnp.int32)
    x = tb[jnp.clip(score - 1, 0, S - 1), bidx,
           jnp.clip(end_d, 0, D - 1)]
    return jnp.where(no_ext & (score > 0), (x & 7).astype(jnp.int32), 0)


def decode_walk(ops_col: np.ndarray, fin_i: int, fin_k: int) -> List[int]:
    """Host RLE of one alignment's op trace -> reference cigar u32s."""
    n = int(np.argmin(ops_col)) if ops_col[-1] == 0 else len(ops_col)
    if ops_col[0] == 0:
        n = 0
    seq = ops_col[:n]
    cig: List[int] = []
    if n:
        # run-length encode (emitted end-first)
        change = np.nonzero(np.diff(seq))[0]
        starts = np.concatenate([[0], change + 1])
        ends = np.concatenate([change + 1, [n]])
        for s0, e0 in zip(starts.tolist(), ends.tolist()):
            op = int(seq[s0])
            cig.append((e0 - s0) << 4 | op)
    if fin_i >= 0:
        cig.append((fin_i + 1) << 4 | 1)
    elif fin_k >= 0:
        cig.append((fin_k + 1) << 4 | 2)
    # walk emits from the alignment end: reverse, then merge the seam
    cig.reverse()
    out: List[int] = []
    for c in cig:
        if out and (out[-1] & 0xF) == (c & 0xF):
            out[-1] += (c >> 4) << 4
        else:
            out.append(c)
    return out
