"""Batched device GWFA (graph wavefront edit distance) with an
on-device traceback walk — the bridge engine of gchain materialization
(bridge_gwfa, gchain1.c:349-381; wavefront machinery gfa-ed.c:56-617)
re-designed as a data-parallel frontier kernel.

EXACT-OR-FLAG contract (docs/STATUS.md round-2 design addendum): the
host engine resolves same-score walk ties by first-reached order in a
queue-driven expansion; a data-parallel frontier cannot replay "first
reached" for free.  This kernel gets bit-exactness from three pieces:

  * SCORES are order-free: per-(vertex,diagonal) dedup keeps the
    furthest offset k (gwf_diag_dedup), a commutative max, and lower-k
    duplicates are dominated (their children are a subset), so always
    deduping every step cannot change reachability or the score.
  * The per-step visited set (buf.ha, gfa-ed.c:318-343) IS order-
    semantic: the first (state, arc) event to claim a (vertex, query
    position) key expands, later ones are dropped entirely.  The host
    queue order is (hop wave, frontier position, arc index) — all
    recoverable on device — so events are sorted by (key, that order)
    and only run heads not already visited act.  This is replayed
    exactly, not flagged.
  * WALK ties (equal-k duplicates with different trace pointers) are
    resolved by the host's in-run candidate preference where that is
    provably order-free (children of one contiguous diagonal run:
    parent d+1 beats d beats d-1, gfa-ed.c:354-379), and TAINTED
    otherwise.  Taint rides the state through children and trace
    pushes; a job is flagged F_TIE only when the state that reaches
    the target carries taint — ties on losing paths never flag.

Capacity overflows (frontier, trace, walk, visited, forbidden bands,
vertex degree, hop chain, step cap) also set flags, so a job either
finishes bit-identical to the host engine or is flagged for a host
re-run — never silently wrong.

State is (vd, k, t, taint): vd = v << 32 | (0x40000000 + d) as in
gwf_gen_vd (gfa-ed.c:60).  Anti-diagonal (xo) bookkeeping is not
carried: the kernel flags frontier overflow at dcap <= max_chk
instead of pruning (gwf_prune only fires past 1000 live diagonals
with the bridge parameters, gchain1.c:360)."""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

# 64-bit vd keys (v << 32 | diag) need x64, like ops/device
jax.config.update("jax_enable_x64", True)

I32 = jnp.int32
I64 = jnp.int64

DIAG_SHIFT = 1 << 30
BIG = 0x7FFFFFFFFFFFFFFF  # plain int: no backend init at import

# flag bits (returned per job)
F_TIE = 1        # the winning walk's lineage hit a queue-order tie
F_DCAP = 2       # frontier / candidate overflow
F_TCAP = 4       # trace log or walk overflow
F_DEG = 8        # vertex out-degree above degcap
F_HOP = 16       # cross-vertex hop chain longer than hopcap
F_FCAP = 32      # forbidden-band / visited table overflow
F_STEPS = 128    # hit the static step cap before max_ed was exhausted


class GwfaGraph(NamedTuple):
    """Device-resident flat graph view (align/gwfa.py _flat_graph
    re-packed with a degree-capped arc table)."""
    arc_w: jnp.ndarray      # (n_vtx, degcap) i32 target vertex
    arc_ow: jnp.ndarray     # (n_vtx, degcap) i32 overlap on target
    arc_cnt: jnp.ndarray    # (n_vtx,) i32
    seq_off: jnp.ndarray    # (n_vtx,) i32 into seq blob
    seq_len: jnp.ndarray    # (n_vtx,) i32
    seq: jnp.ndarray        # (blob + 1,) i32 char codes; [-1] = -1 pad


def build_device_graph(g, es, degcap: int = 6):
    """Pack the graph for the device kernel; cached on g by callers.
    Returns (GwfaGraph, max_degree)."""
    from ..align.gwfa import _flat_graph
    arc_start, arc_cnt, arc_w, arc_ow, seq_off, seq_len, seq_buf = \
        _flat_graph(g, es)
    n_vtx = len(arc_cnt)
    aw = np.zeros((n_vtx, degcap), dtype=np.int32)
    ao = np.zeros((n_vtx, degcap), dtype=np.int32)
    for v in range(n_vtx):
        c = min(int(arc_cnt[v]), degcap)
        st = int(arc_start[v])
        aw[v, :c] = arc_w[st: st + c].astype(np.int32)
        ao[v, :c] = arc_ow[st: st + c]
    seq = np.frombuffer(seq_buf, dtype=np.uint8).astype(np.int32)
    seq = np.concatenate([seq, np.full(1, -1, dtype=np.int32)])
    gd = GwfaGraph(
        arc_w=jnp.asarray(aw), arc_ow=jnp.asarray(ao),
        arc_cnt=jnp.asarray(arc_cnt.astype(np.int32)),
        seq_off=jnp.asarray(seq_off.astype(np.int32)),
        seq_len=jnp.asarray(seq_len.astype(np.int32)),
        seq=jnp.asarray(seq))
    return gd, int(arc_cnt.max()) if n_vtx else 0


# ----------------------------------------------------------------------
# helpers


def _mk_vd(v, d):
    return (v.astype(I64) << 32) | \
        (jnp.uint32(DIAG_SHIFT) + d.astype(jnp.uint32)).astype(I64)


def _vd_v(vd):
    return (vd >> 32).astype(I32)


def _vd_d(vd):
    return (vd & jnp.int64(0xFFFFFFFF)).astype(I32) - DIAG_SHIFT


def _extend_runs(gd: GwfaGraph, q, ql, vd, k, valid, chunk: int = 16):
    """Landau-Vishkin exact-match extension along each state's
    diagonal (gwf_extend1, gfa-ed.c:84-96), all states in parallel.
    q: (J, QCAP) i32 padded query; ql: (J,) i32."""
    v = _vd_v(vd)
    d = _vd_d(vd)
    vl = gd.seq_len[v]
    base = gd.seq_off[v]
    qlb = ql[:, None]
    max_k = jnp.minimum(qlb - d, vl) - 1
    seq_pad = gd.seq.shape[0] - 1

    def cond(st):
        return jnp.any(st[1])

    def body(st):
        k_cur, active = st
        offs = jnp.arange(chunk, dtype=I32)
        tpos = base[..., None] + k_cur[..., None] + 1 + offs
        qpos = d[..., None] + k_cur[..., None] + 1 + offs
        inb = (k_cur[..., None] + 1 + offs) <= max_k[..., None]
        tpos = jnp.where(inb, tpos, seq_pad)
        tc = gd.seq[tpos]
        rows = jnp.arange(q.shape[0])[:, None, None]
        qc = q[rows, jnp.clip(qpos, 0, q.shape[-1] - 1)]
        eq = inb & (tc == qc) & (tc >= 0)
        run = jnp.sum(jnp.cumprod(eq.astype(I32), axis=-1),
                      axis=-1).astype(I32)
        k_new = jnp.where(active, k_cur + run, k_cur).astype(I32)
        active = active & (run == chunk)
        return (k_new, active)

    k_out, _ = jax.lax.while_loop(cond, body, (k, valid & (k < max_k)))
    return k_out


def _sorted_member(tab, x):
    """Per-row membership of x in the sorted, BIG-padded table tab."""
    pos = jax.vmap(lambda f, y: jnp.searchsorted(f, y, side="left"))(
        tab, x)
    return jnp.take_along_axis(
        tab, jnp.clip(pos, 0, tab.shape[-1] - 1), axis=-1) == x


def _sorted_insert(tab, new, new_valid):
    """Sorted-unique union of tab and the valid entries of new."""
    cat = jnp.concatenate(
        [tab, jnp.where(new_valid, new, BIG)], axis=-1)
    cat = jax.lax.sort(cat, dimension=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(cat[..., :1], dtype=bool),
         cat[..., 1:] == cat[..., :-1]], axis=-1)
    cat = jnp.where(dup, BIG, cat)
    cat = jax.lax.sort(cat, dimension=-1)
    kept = cat[..., : tab.shape[-1]]
    ovf = jnp.any(cat[..., tab.shape[-1]:] != BIG, axis=-1)
    return kept, ovf


# ----------------------------------------------------------------------
# the kernel


@functools.partial(
    jax.jit,
    static_argnames=("dcap", "ccap", "tcap", "fcap", "wcap", "degcap",
                     "hopcap", "evcap", "max_steps"))
def gwfa_batch(gd: GwfaGraph, q, ql, v0, off0, v1, off1, max_ed,
               dcap=256, ccap=2048, tcap=512, fcap=512, wcap=64,
               degcap=6, hopcap=16, evcap=128, max_steps=256):
    """Run GWFA for a batch of bridge jobs.

    q: (J, QCAP) i32 query codes (latin-1 bytes), -1 padded.
    ql, v0, off0, v1, off1, max_ed: (J,) i32.

    Returns dict of device arrays:
      s      (J,) i32  edit distance, or -1 when not found within
                       max_ed (exact unless flagged)
      flags  (J,) i32  0 = exact; else F_* bits (host re-run needed)
      walk   (J, wcap) i32 vertex walk in host order
      n_walk (J,) i32
    """
    J = q.shape[0]
    rows = jnp.arange(J)[:, None]

    # trace log: slot 0 is the root (v=-1, pre=-1)
    tr_v0 = jnp.full((J, tcap), -1, dtype=I32)
    tr_pre0 = jnp.full((J, tcap), -1, dtype=I32)
    tr_n0 = jnp.ones((J,), dtype=I32)

    # initial frontier (gfa_ed_init, gfa-ed.c:552-560)
    a_vd0 = jnp.full((J, dcap), BIG, dtype=I64)
    a_k0 = jnp.zeros((J, dcap), dtype=I32)
    a_t0 = jnp.zeros((J, dcap), dtype=I32)
    a_tn0 = jnp.zeros((J, dcap), dtype=I32)
    a_vd0 = a_vd0.at[:, 0].set(_mk_vd(v0, -off0))
    a_k0 = a_k0.at[:, 0].set(off0 - 1)

    forb0 = jnp.full((J, fcap), BIG, dtype=I64)

    def push_cand(bufs, n_c, flags, vd, k, t, tn, valid):
        """Append valid candidates compacted after slot n_c; dropped
        writes land in the +1 pad slot; overflow flags the row."""
        c_vd, c_k, c_t, c_n = bufs
        slot = n_c[:, None] + jnp.cumsum(valid.astype(I32), axis=-1) - 1
        ok = valid & (slot < ccap)
        sl = jnp.where(ok, slot, ccap)
        c_vd = c_vd.at[rows, sl].set(jnp.where(ok, vd, BIG), mode="drop")
        c_k = c_k.at[rows, sl].set(k, mode="drop")
        c_t = c_t.at[rows, sl].set(t, mode="drop")
        c_n = c_n.at[rows, sl].set(tn, mode="drop")
        n_c = jnp.minimum(n_c + jnp.sum(valid, axis=-1).astype(I32),
                          ccap)
        flags = flags | jnp.where(
            jnp.any(valid & (slot >= ccap), axis=-1), F_DCAP, 0)
        return (c_vd, c_k, c_t, c_n), n_c, flags

    def wavefront_children(bufs, n_c, flags, new_forb, nf_n, vd, k, t,
                           tn, valid, vl, ql_b):
        """Wavefront children with the host's IN-RUN MERGE: per run of
        consecutive diagonals, the child at diag e is the single entry
        max(k[e-1], k[e]+1, k[e+1]+1) — merged BEFORE the out-of-bound
        filter (gwf_ed_extend_batch, gfa-ed.c:332-402: a merged child
        whose max candidate lands out of bounds is dropped whole, so
        lower candidates must not leak through), plus one edge child
        on each side of the run.  Equal-k merge ties follow the host's
        candidate order: parent e+1 beats e beats e-1."""
        v = _vd_v(vd)
        d = _vd_d(vd)
        neg = jnp.int32(-(1 << 30))
        pad = lambda x, fill: jnp.concatenate(
            [jnp.full_like(x[..., :1], fill), x], axis=-1)
        vd_l = pad(vd, BIG)[..., :-1]
        k_l = pad(k, 0)[..., :-1]
        t_l = pad(t, 0)[..., :-1]
        n_l = pad(tn, 0)[..., :-1]
        va_l = pad(valid, False)[..., :-1]
        has_l = valid & va_l & (vd == vd_l + 1)
        vd_r = jnp.concatenate([vd[..., 1:], vd[..., :1] * 0 + BIG],
                               axis=-1)
        k_r = jnp.concatenate([k[..., 1:], k[..., :1] * 0], axis=-1)
        t_r = jnp.concatenate([t[..., 1:], t[..., :1] * 0], axis=-1)
        n_r = jnp.concatenate([tn[..., 1:], tn[..., :1] * 0], axis=-1)
        va_r = jnp.concatenate(
            [valid[..., 1:], jnp.zeros_like(valid[..., :1])], axis=-1)
        has_r = valid & va_r & (vd_r == vd + 1)
        # merged child at the state's own diagonal
        cur_k = jnp.where(has_l, k_l, neg)
        cur_t = jnp.where(has_l, t_l, 0)
        cur_n = jnp.where(has_l, n_l, 0)
        up = (k + 1) >= cur_k
        cur_k = jnp.where(up, k + 1, cur_k)
        cur_t = jnp.where(up, t, cur_t)
        cur_n = jnp.where(up, tn, cur_n)
        up = has_r & ((k_r + 1) >= cur_k)
        cur_k = jnp.where(up, k_r + 1, cur_k)
        cur_t = jnp.where(up, t_r, cur_t)
        cur_n = jnp.where(up, n_r, cur_n)
        ok = valid & (d + cur_k < ql_b) & (cur_k < vl)
        fin = valid & (cur_k == vl)
        bufs, n_c, flags = push_cand(
            bufs, n_c, flags, vd, cur_k, cur_t, cur_n, ok)
        new_forb, nf_n = _forb_stage(new_forb, nf_n, vd, fin)
        # left edge child of each run
        okl = valid & ~has_l
        ok = okl & ((d - 1) + (k + 1) < ql_b) & (k + 1 < vl)
        fin = okl & (k + 1 == vl)
        bufs, n_c, flags = push_cand(
            bufs, n_c, flags, vd - 1, k + 1, t, tn, ok)
        new_forb, nf_n = _forb_stage(new_forb, nf_n, vd - 1, fin)
        # right edge child of each run
        okr = valid & ~has_r
        ok = okr & ((d + 1) + k < ql_b) & (k < vl)
        fin = okr & (k == vl)
        bufs, n_c, flags = push_cand(
            bufs, n_c, flags, vd + 1, k, t, tn, ok)
        new_forb, nf_n = _forb_stage(new_forb, nf_n, vd + 1, fin)
        return bufs, n_c, flags, new_forb, nf_n

    def _forb_stage(stage, nf_n, vd, valid):
        """Stage finished vertex-diagonals with a rolling sorted
        truncation; nf_n counts the total staged so truncation loss is
        detectable (flagged as F_FCAP by the caller via nf_n)."""
        cat = jnp.concatenate([stage, jnp.where(valid, vd, BIG)],
                              axis=-1)
        cat = jax.lax.sort(cat, dimension=-1)
        return cat[..., : stage.shape[-1]], \
            nf_n + jnp.sum(valid, axis=-1).astype(I32)

    def step(carry):
        (a_vd, a_k, a_t, a_tn, forb, s, flags, found, dead, end_t,
         end_v, end_tn, tr_v, tr_pre, tr_n) = carry
        live = ~(found | dead) & (flags == 0)
        ql_b = ql[:, None]

        c_vd = jnp.full((J, ccap + 1), BIG, dtype=I64)
        c_k = jnp.zeros((J, ccap + 1), dtype=I32)
        c_t = jnp.zeros((J, ccap + 1), dtype=I32)
        c_n = jnp.zeros((J, ccap + 1), dtype=I32)
        bufs = (c_vd, c_k, c_t, c_n)
        n_c = jnp.zeros((J,), dtype=I32)
        # staged forbidden vds (sorted, BIG-padded, truncating stage —
        # width 4*dcap bounds one step's worth: <= 2 per state + hops)
        new_forb = jnp.full((J, 4 * dcap), BIG, dtype=I64)
        nf_n = jnp.zeros((J,), dtype=I32)
        # per-step visited (vertex, qpos) keys (buf.ha)
        vis = jnp.full((J, 2 * dcap), BIG, dtype=I64)

        # ---- batch-extension phase over the whole frontier
        valid = (a_vd != BIG) & live[:, None]
        k_ext = _extend_runs(gd, q, ql, a_vd, a_k, valid)
        v = _vd_v(a_vd)
        d = _vd_d(a_vd)
        vl = gd.seq_len[jnp.clip(v, 0, gd.seq_len.shape[0] - 1)]
        i = d + k_ext
        at_vend = k_ext == vl - 1
        at_qend = i == ql_b - 1
        boundary = valid & (at_vend | at_qend)
        # wavefront children for every state (boundary ones included:
        # the A queue holds copies, their in-run children still count)
        bufs, n_c, flags, new_forb, nf_n = wavefront_children(
            bufs, n_c, flags, new_forb, nf_n, a_vd, k_ext, a_t,
            a_tn, valid, vl, ql_b)

        # ---- queue phase: boundary states wave by wave (the A queue)
        def hop_body(hs):
            (b_vd, b_k, b_t, b_tn, b_act, bufs, n_c, new_forb, nf_n,
             vis, flags, found, end_t, end_v, end_tn, tr_v, tr_pre,
             tr_n, hop) = hs
            v = _vd_v(b_vd)
            d = _vd_d(b_vd)
            vlh = gd.seq_len[jnp.clip(v, 0, gd.seq_len.shape[0] - 1)]
            i = d + b_k
            at_vend = b_k == vlh - 1
            at_qend = i == ql_b - 1

            # (a) re-interior states (fresh cross-vertex arrivals whose
            # extension left them mid-vertex): 3 children, no run
            inter = b_act & ~at_vend & ~at_qend
            for dd, kk in ((-1, 1), (0, 1), (1, 0)):
                bufs, n_c, flags = push_cand(
                    bufs, n_c, flags, _mk_vd(v, d + dd), b_k + kk,
                    b_t, b_tn, inter)

            # (b) target check at query end (first in queue order wins;
            # our plane order IS the host queue order)
            qend = b_act & at_qend
            hit = qend & (v == v1[:, None]) & (b_k == off1[:, None])
            anyhit = jnp.any(hit, axis=-1)
            first_hit = jnp.argmax(hit, axis=-1)
            now = anyhit & ~found
            end_t = jnp.where(now, b_t[jnp.arange(J), first_hit], end_t)
            end_v = jnp.where(now, v[jnp.arange(J), first_hit], end_v)
            end_tn = jnp.where(now, b_tn[jnp.arange(J), first_hit],
                               end_tn)
            found = found | anyhit
            # query end, vertex unfinished, not the target: deletion
            qd = qend & ~hit & (b_k + 1 < vlh) & ~found[:, None]
            bufs, n_c, flags = push_cand(
                bufs, n_c, flags, _mk_vd(v, d - 1), b_k + 1,
                b_t, b_tn, qd)

            # (c) expansion trace pushes: one per expanding state
            vend = b_act & at_vend & ~at_qend & ~found[:, None]
            qv = qend & ~hit & ~qd & (v != v1[:, None]) & ~found[:, None]
            exp = vend | qv
            slot = tr_n[:, None] + jnp.cumsum(exp.astype(I32),
                                              axis=-1) - 1
            sok = exp & (slot < tcap)
            flags = flags | jnp.where(
                jnp.any(exp & (slot >= tcap), axis=-1), F_TCAP, 0)
            sl = jnp.where(sok, slot, tcap)
            tr_v = tr_v.at[rows, sl].set(v, mode="drop")
            tr_pre = tr_pre.at[rows, sl].set(b_t, mode="drop")
            tr_n = jnp.minimum(
                tr_n + jnp.sum(exp, axis=-1).astype(I32), tcap)
            tw = jnp.where(exp, jnp.minimum(sl, tcap - 1), b_t)

            # finished vertex-diagonal -> forbidden band
            new_forb, nf_n = _forb_stage(new_forb, nf_n, b_vd, vend)
            flags = flags | jnp.where(
                jnp.any(vend & (gd.arc_cnt[v] > degcap), axis=-1),
                F_DEG, 0)

            # (d) arc events with the per-step visited set (buf.ha):
            # first (hop, frontier position, arc) event per (w, i+1)
            # key acts, later ones are dropped — host queue order
            ecap = evcap * degcap
            ev_key = jnp.full((J, ecap), BIG, dtype=I64)
            ev_ord = jnp.zeros((J, ecap), dtype=I32)
            ev_w = jnp.zeros((J, ecap), dtype=I32)
            ev_ow = jnp.zeros((J, ecap), dtype=I32)
            ev_i = jnp.zeros((J, ecap), dtype=I32)
            ev_t = jnp.zeros((J, ecap), dtype=I32)
            ev_n = jnp.zeros((J, ecap), dtype=I32)
            ev_m = jnp.zeros((J, ecap), dtype=I32)
            # compact expanding vend states into evcap slots
            vord = jnp.argsort(jnp.where(vend, jnp.arange(dcap, dtype=I32),
                                         I32(1 << 30)), axis=-1,
                               stable=True)[..., :evcap]
            cvend = jnp.take_along_axis(vend, vord, axis=-1)
            flags = flags | jnp.where(
                jnp.sum(vend, axis=-1) > evcap, F_DCAP, 0)
            cv = jnp.take_along_axis(v, vord, axis=-1)
            ci = jnp.take_along_axis(i, vord, axis=-1)
            ctw = jnp.take_along_axis(tw, vord, axis=-1)
            ctn = jnp.take_along_axis(b_tn, vord, axis=-1)
            ccol = jnp.take_along_axis(
                jnp.broadcast_to(jnp.arange(dcap, dtype=I32), v.shape),
                vord, axis=-1)
            n_ext = jnp.zeros((J, evcap), dtype=I32)
            for ai in range(degcap):
                w = gd.arc_w[jnp.clip(cv, 0, gd.arc_w.shape[0] - 1), ai]
                ow = gd.arc_ow[jnp.clip(cv, 0, gd.arc_w.shape[0] - 1), ai]
                has = cvend & (ai < gd.arc_cnt[
                    jnp.clip(cv, 0, gd.arc_cnt.shape[0] - 1)])
                wl = gd.seq_len[w]
                wch = gd.seq[jnp.clip(gd.seq_off[w] + ow, 0,
                                      gd.seq.shape[0] - 1)]
                qch = jnp.take_along_axis(
                    q, jnp.clip(ci + 1, 0, q.shape[-1] - 1), axis=-1)
                m = has & (ci + 1 < ql_b) & (ow < wl) & (wch == qch)
                n_ext = n_ext + m.astype(I32)
                sl2 = jnp.arange(evcap, dtype=I32) * degcap + ai
                ev_key = ev_key.at[:, sl2].set(
                    jnp.where(has,
                              (w.astype(I64) << 32)
                              | (ci + 1).astype(I64), BIG))
                ev_ord = ev_ord.at[:, sl2].set(ccol * degcap + ai)
                ev_w = ev_w.at[:, sl2].set(w)
                ev_ow = ev_ow.at[:, sl2].set(ow)
                ev_i = ev_i.at[:, sl2].set(ci)
                ev_t = ev_t.at[:, sl2].set(ctw)
                ev_n = ev_n.at[:, sl2].set(ctn)
                ev_m = ev_m.at[:, sl2].set(m.astype(I32))
            # sort events by (key, order); winner = head not visited
            (ek, eo, ew, eow, ei, et, en, em) = jax.lax.sort(
                (ev_key, ev_ord, ev_w, ev_ow, ev_i, ev_t, ev_n, ev_m),
                num_keys=2, dimension=-1)
            ehead = jnp.concatenate(
                [jnp.ones_like(ek[..., :1], dtype=bool),
                 ek[..., 1:] != ek[..., :-1]], axis=-1) & (ek != BIG)
            seen = _sorted_member(vis, ek)
            act = ehead & ~seen
            vis, vovf = _sorted_insert(vis, ek, ehead)
            flags = flags | jnp.where(vovf, F_FCAP, 0)
            # matching winners become next-wave queue states
            na_sel = act & (em == 1)
            # flag instead of silently truncating: > dcap winners in
            # one wave means dropped match chains (exact-or-flag)
            flags = flags | jnp.where(
                jnp.sum(na_sel, axis=-1) > dcap, F_DCAP, 0)
            # order new states by host queue order (event order)
            nord = jnp.argsort(jnp.where(na_sel, eo, I32(1 << 30)),
                               axis=-1, stable=True)[..., :dcap]
            na_take = jnp.take_along_axis(na_sel, nord, axis=-1)
            na_w = jnp.take_along_axis(ew, nord, axis=-1)
            na_ow = jnp.take_along_axis(eow, nord, axis=-1)
            na_i = jnp.take_along_axis(ei, nord, axis=-1)
            na_t = jnp.take_along_axis(et, nord, axis=-1)
            na_n = jnp.take_along_axis(en, nord, axis=-1)
            na_vd = jnp.where(na_take,
                              _mk_vd(na_w, na_i + 1 - na_ow), BIG)
            na_k = jnp.where(na_take, na_ow, 0)
            # mismatching winners push the two cross-vertex children
            mm = act & (em == 0)
            for dd in (0, 1):
                ch_d = ei + dd - eow
                ok = mm & (ch_d + eow < ql_b)
                bufs, n_c, flags = push_cand(
                    bufs, n_c, flags, _mk_vd(ew, ch_d), eow, et, en, ok)
            # residual child (v, d+1, k) when not every arc matched;
            # n_ext lives in compacted space, scatter it back
            n_ext_full = jnp.zeros((J, dcap + 1), dtype=I32)
            n_ext_full = n_ext_full.at[rows, jnp.where(
                cvend, ccol, dcap)].set(n_ext, mode="drop")
            n_ext_b = n_ext_full[..., :dcap]
            res = vend & ((gd.arc_cnt[v] == 0)
                          | (n_ext_b != jnp.minimum(gd.arc_cnt[v],
                                                    degcap)))
            bufs, n_c, flags = push_cand(
                bufs, n_c, flags, _mk_vd(v, d + 1), b_k, b_t, b_tn,
                res)

            # (e) query end at a non-target vertex end: one child/arc,
            # NOT visited-checked (gfa-ed.c:351-357)
            for ai in range(degcap):
                w = gd.arc_w[jnp.clip(v, 0, gd.arc_w.shape[0] - 1), ai]
                ow = gd.arc_ow[jnp.clip(v, 0, gd.arc_w.shape[0] - 1), ai]
                has = qv & (ai < gd.arc_cnt[
                    jnp.clip(v, 0, gd.arc_cnt.shape[0] - 1)])
                bufs, n_c, flags = push_cand(
                    bufs, n_c, flags, _mk_vd(w, i - ow),
                    jnp.broadcast_to(ow, v.shape), tw, b_tn, has)
            flags = flags | jnp.where(
                jnp.any(qv & (gd.arc_cnt[v] > degcap), axis=-1),
                F_DEG, 0)

            # next wave: extend the fresh arrivals
            na_valid = (na_vd != BIG) & ~found[:, None]
            na_k2 = _extend_runs(gd, q, ql, na_vd, na_k, na_valid)
            flags = flags | jnp.where(
                (hop + 1 >= hopcap) & jnp.any(na_valid, axis=-1),
                F_HOP, 0)
            return (na_vd, na_k2, na_t, na_n, na_valid, bufs, n_c,
                    new_forb, nf_n, vis, flags, found, end_t, end_v,
                    end_tn, tr_v, tr_pre, tr_n, hop + 1)

        def hop_cond(hs):
            return jnp.any(hs[4]) & (hs[-1] < hopcap)

        hs = (a_vd, k_ext, a_t, a_tn, boundary, bufs, n_c, new_forb,
              nf_n, vis, flags, found, end_t, end_v, end_tn, tr_v,
              tr_pre, tr_n, jnp.int32(0))
        hs = jax.lax.while_loop(hop_cond, hop_body, hs)
        (_, _, _, _, _, bufs, n_c, new_forb, nf_n, vis, flags, found,
         end_t, end_v, end_tn, tr_v, tr_pre, tr_n, _) = hs
        flags = flags | jnp.where(
            (nf_n > new_forb.shape[-1]) & ~found, F_FCAP, 0)

        # ---- dedup + forbidden filter -> next frontier
        c_vd, c_k, c_t, c_n = (x[..., :ccap] for x in bufs)
        forb2, fovf = _sorted_insert(forb, new_forb, new_forb != BIG)
        flags = flags | jnp.where(fovf & ~found, F_FCAP, 0)
        cand = (c_vd != BIG) & ~found[:, None] & (flags == 0)[:, None]
        cand = cand & ~_sorted_member(forb2, c_vd)
        # lexicographic (vd asc, k desc) — winner is the run head
        key2 = jnp.where(cand, (-c_k).astype(I64), BIG)
        key1 = jnp.where(cand, c_vd, BIG)
        vd_s, _k2, k_s, t_s, n_s, va_s = jax.lax.sort(
            (key1, key2, c_k, c_t, c_n, cand.astype(I32)),
            num_keys=2, dimension=-1)
        va_s = va_s.astype(bool)
        head = jnp.concatenate(
            [jnp.ones_like(vd_s[..., :1], dtype=bool),
             vd_s[..., 1:] != vd_s[..., :-1]], axis=-1) & va_s
        idx = jnp.arange(ccap, dtype=I32)
        head_idx = jax.lax.associative_scan(
            jnp.maximum, jnp.where(head, idx, I32(-1)), axis=-1)
        head_idx = jnp.maximum(head_idx, 0)
        runk = jnp.take_along_axis(k_s, head_idx, axis=-1)
        runt = jnp.take_along_axis(t_s, head_idx, axis=-1)
        # a same-(vd,k) duplicate with a different trace means the
        # host queue order picks the surviving lineage: taint.  The
        # host only dedups on steps whose A queue was non-empty
        # (gwfa_exact.py:295); on other steps a dominated duplicate
        # survives there and can equalize via extension next step, so
        # without boundary states ANY dropped different-trace
        # duplicate taints the run (conservative).
        had_A = jnp.any(boundary, axis=-1)
        tie = va_s & (t_s != runt) \
            & ((k_s == runk) | ~had_A[:, None])
        tie_run = jnp.zeros((J, ccap + 1), dtype=I32)
        tie_run = tie_run.at[rows, jnp.where(tie, head_idx, ccap)].max(
            1, mode="drop")
        run_taint = jnp.take_along_axis(tie_run[..., :ccap], head_idx,
                                        axis=-1)
        n_s = n_s | run_taint
        n_keep = jnp.sum(head, axis=-1)
        flags = flags | jnp.where((n_keep > dcap) & ~found, F_DCAP, 0)
        ord2 = jnp.argsort(jnp.where(head, vd_s, BIG), axis=-1,
                           stable=True)[..., :dcap]
        a_vd = jnp.take_along_axis(jnp.where(head, vd_s, BIG), ord2,
                                   axis=-1)
        a_k = jnp.take_along_axis(k_s, ord2, axis=-1)
        a_t = jnp.take_along_axis(t_s, ord2, axis=-1)
        a_tn = jnp.take_along_axis(n_s, ord2, axis=-1)

        dead = dead | (~found & (n_keep == 0))
        s2 = jnp.where(~(found | dead) & (flags == 0), s + 1, s)
        dead = dead | ((s2 > max_ed) & ~found)
        flags = flags | jnp.where(
            (s2 >= max_steps) & (s2 <= max_ed) & ~found & ~dead
            & (flags == 0), F_STEPS, 0)
        return (a_vd, a_k, a_t, a_tn, forb2, s2, flags, found, dead,
                end_t, end_v, end_tn, tr_v, tr_pre, tr_n)

    def loop_cond(carry):
        (_, _, _, _, _, s, flags, found, dead, *_r) = carry
        return jnp.any(~(found | dead) & (flags == 0))

    carry = (a_vd0, a_k0, a_t0, a_tn0, forb0, jnp.zeros((J,), dtype=I32),
             jnp.zeros((J,), dtype=I32), jnp.zeros((J,), dtype=bool),
             jnp.zeros((J,), dtype=bool), jnp.full((J,), -1, dtype=I32),
             jnp.full((J,), -1, dtype=I32), jnp.zeros((J,), dtype=I32),
             tr_v0, tr_pre0, tr_n0)
    carry = jax.lax.while_loop(loop_cond, step, carry)
    (_, _, _, _, _, s, flags, found, dead, end_t, end_v, end_tn,
     tr_v, tr_pre, tr_n) = carry

    # the winner's lineage carried a queue-order tie -> host re-run
    flags = flags | jnp.where(found & (end_tn != 0), F_TIE, 0)

    # ---- walk reconstruction (gfa_ed_step traceback)
    okw = found & (flags == 0)
    wbuf = jnp.full((J, wcap), -1, dtype=I32)
    wbuf = wbuf.at[:, 0].set(jnp.where(okw, end_v, -1))
    wn = okw.astype(I32)

    def walk_body(ws):
        wbuf, wn, cur, act = ws
        pv = tr_v[jnp.arange(J), jnp.clip(cur, 0, tr_v.shape[-1] - 1)]
        take = act & (cur >= 0) & (pv >= 0)
        wbuf = wbuf.at[jnp.arange(J),
                       jnp.where(take, jnp.minimum(wn, wcap - 1),
                                 wcap)].set(pv, mode="drop")
        cur2 = tr_pre[jnp.arange(J),
                      jnp.clip(cur, 0, tr_v.shape[-1] - 1)]
        cur = jnp.where(take, cur2, cur)
        wn = wn + take.astype(I32)
        return (wbuf, wn, cur, take)

    ws = jax.lax.while_loop(
        lambda ws: jnp.any(ws[3]), walk_body,
        (wbuf, wn, jnp.where(okw, end_t, -1), okw))
    wbuf, wn, _, _ = ws
    flags = flags | jnp.where(wn > wcap, F_TCAP, 0)
    idxw = jnp.arange(wcap, dtype=I32)
    rev_idx = jnp.clip(wn[:, None] - 1 - idxw, 0, wcap - 1)
    walk = jnp.where(idxw[None, :] < wn[:, None],
                     jnp.take_along_axis(wbuf, rev_idx, axis=-1), -1)

    return {"s": jnp.where(found, s, -1), "flags": flags,
            "walk": walk, "n_walk": wn}
