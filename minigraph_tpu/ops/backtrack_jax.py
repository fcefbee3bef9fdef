"""Exact on-device chain backtrack + compaction.

Replicates native/mgt_lchain.c mgt_chain_backtrack_core + compact_a
(reference lchain.c mg_chain_backtrack semantics) per read lane, so
the device can ship CHAINS instead of raw anchors: on the tunneled
chip the d2h link moves ~13-29 MB/s, and surviving-chain anchors are
typically 3-10x fewer than collected anchors (the later host stages —
long-join rescue included — only ever touch compacted chain anchors,
see native/mgt_tail.c:186-227).

Semantics replicated exactly:
  * candidate starts = anchors with f >= min_sc, visited in f-desc
    order, ties by larger index first (ascending stable sort on f,
    traversed from the top — the 128-bit radix pair order);
  * peak_cut walk: s = f_start - f[at] per parent step, first maximum
    wins, stop on drop > max_drop / root / claimed anchor (the
    stopping anchor itself may become the cut);
  * claim start..cut exclusive; chains failing min_cnt/min_sc are
    dropped but KEEP their claims (lchain.c:63-66);
  * compaction: chains reordered by first-anchor x ascending (stable:
    ties keep build = score-desc order), each chain's anchors
    reversed to forward order.

The per-lane sequential walk runs as a SIMD interpreter: one
lax.while_loop where every iteration advances each lane's state
machine by one step (select-candidate / walk / claim).  Lanes that
exceed the step budget set an `unsure` flag and the read falls back
to the exact host path — the same exact-or-flag contract as the
chain kernel.  All i32; runs under the x64-free fused step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

I32 = jnp.int32


def backtrack_compact(f, p, n_a, axh, axl, ayh, ayl,
                      min_cnt, min_sc, max_drop, ucap):
    """(B, A) planes -> compacted chains, per lane.

    Returns dict:
      c_axh/c_axl/c_ayh/c_ayl: (B, A) compacted chain anchors (dense
        from 0, forward order, chains in first-anchor-x order)
      u_sc/u_cnt: (B, ucap) chain score / anchor count (same order)
      n_u, n_v: (B,) live counts
      bt_unsure: (B,) bool — step budget exceeded or > ucap chains
    """
    B, A = f.shape
    idx = jnp.arange(A, dtype=I32)[None, :]
    live = idx < n_a[:, None]
    cand = live & (f >= jnp.int32(min_sc))
    # ascending sort on (f, i) — the index is an explicit second KEY,
    # not a stability assumption (TPU bitonic sorts may ignore
    # is_stable): equal-f candidates order ascending by index exactly
    # like the radix pair sort.  Non-candidates sort past the live
    # block with key +INF so candidates occupy [0, n_z) ascending and
    # rank k walks them top-down (f never reaches 2^30, no collision).
    key = jnp.where(cand, f, jnp.int32(0x7FFFFFFF))
    s_key, s_idx = jax.lax.sort((key, jnp.broadcast_to(idx, (B, A))),
                                num_keys=2)
    n_z = cand.sum(axis=1).astype(I32)                  # (B,)

    max_steps = jnp.int32(8 * A + 16)

    # Per-lane dynamic indexing as one-hot compare+reduce: a (B, A)
    # elementwise pass is ~100x cheaper on the VPU than the dynamic
    # row gather take_along_axis lowers to (measured 146 ms/batch ->
    # single-digit ms for the whole interpreter at B=256, A=512).
    def oh(j):
        return idx == j[:, None]          # j == -1 -> all-False row

    def take(plane, j):
        """plane[b, j[b]] as a masked reduction (j < 0 -> 0)."""
        return jnp.sum(jnp.where(oh(j), plane.astype(I32), 0),
                       axis=1, dtype=I32)

    # state: mode 0=select 1=walk 2=claim 3=done
    st0 = dict(
        mode=jnp.where(n_z > 0, 0, 3).astype(I32),
        k=n_z - 1,
        at=jnp.zeros(B, I32), best_s=jnp.zeros(B, I32),
        best_at=jnp.zeros(B, I32), start=jnp.zeros(B, I32),
        sc0=jnp.zeros(B, I32), cut=jnp.zeros(B, I32),
        cur=jnp.zeros(B, I32), nv0=jnp.zeros(B, I32),
        claimed=jnp.zeros((B, A), jnp.bool_),
        vbuf=jnp.zeros((B, A), I32),
        u_sc=jnp.zeros((B, ucap), I32),
        u_cnt=jnp.zeros((B, ucap), I32),
        n_u=jnp.zeros(B, I32), n_v=jnp.zeros(B, I32),
        unsure=jnp.zeros(B, jnp.bool_),
        steps=jnp.int32(0),
    )

    def cond(st):
        return jnp.any(st["mode"] != 3) & (st["steps"] < max_steps)

    ur_oh = jnp.arange(ucap, dtype=I32)[None, :]

    def body(st):
        mode = st["mode"]
        # --- mode 0: select next unclaimed candidate ---
        sel = mode == 0
        kk = st["k"]
        done_k = kk < 0
        cand_i = take(s_idx, kk)
        cand_claimed = take(st["claimed"], cand_i) > 0
        # claimed candidate: k-1, stay in select
        k_new = jnp.where(sel & ~done_k & cand_claimed, kk - 1, kk)
        to_done = sel & done_k
        to_walk = sel & ~done_k & ~cand_claimed
        f_cand = take(f, cand_i)
        # --- mode 1: one walk step ---
        wlk = mode == 1
        at2 = take(p, st["at"])
        root = at2 < 0
        s = jnp.where(root, st["sc0"], st["sc0"] - take(f, at2))
        better = s > st["best_s"]
        drop = ~better & (st["best_s"] - s > jnp.int32(max_drop))
        at2_claimed = (take(st["claimed"], at2) > 0) & ~root
        walk_end = wlk & (drop | root | at2_claimed)
        best_s_n = jnp.where(wlk & better, s, st["best_s"])
        best_at_n = jnp.where(wlk & better, at2, st["best_at"])
        # --- mode 2: one claim step ---
        clm = mode == 2
        at_cut = st["cur"] == st["cut"]
        do_claim = clm & ~at_cut
        # append cur to vbuf[n_v], claim it (one-hot writes)
        nv = st["n_v"]
        w_v = (idx == nv[:, None]) & do_claim[:, None]
        vbuf = jnp.where(w_v, st["cur"][:, None], st["vbuf"])
        claimed = st["claimed"] | (oh(st["cur"]) & do_claim[:, None])
        nv = jnp.where(do_claim, nv + 1, nv)
        cur_n = jnp.where(do_claim, take(p, st["cur"]), st["cur"])
        # chain finished: accept/reject
        fin = clm & at_cut
        cut_root = st["cut"] < 0
        sc = jnp.where(cut_root, st["sc0"],
                       st["sc0"] - take(f, st["cut"]))
        cnt = nv - st["nv0"]
        acc = fin & (sc >= jnp.int32(min_sc)) \
            & (cnt >= jnp.int32(min_cnt)) & (cnt > 0)
        nu = st["n_u"]
        over_u = acc & (nu >= jnp.int32(ucap))
        put = acc & ~over_u
        w_u = (ur_oh == nu[:, None]) & put[:, None]
        u_sc = jnp.where(w_u, sc[:, None], st["u_sc"])
        u_cnt = jnp.where(w_u, cnt[:, None], st["u_cnt"])
        nu = jnp.where(put, nu + 1, nu)
        nv = jnp.where(fin & ~acc, st["nv0"], nv)   # reject: rewind v
        k_new = jnp.where(fin, k_new - 1, k_new)

        # --- transitions ---
        mode_n = mode
        mode_n = jnp.where(to_done, 3, mode_n)
        # enter walk: at=start=cand, best_s=0, best_at=cand
        mode_n = jnp.where(to_walk, 1, mode_n)
        start_n = jnp.where(to_walk, cand_i, st["start"])
        sc0_n = jnp.where(to_walk, f_cand, st["sc0"])
        at_init = jnp.where(to_walk, cand_i, st["at"])
        bs_n = jnp.where(to_walk, 0, best_s_n)
        ba_n = jnp.where(to_walk, cand_i, best_at_n)
        # walk step advance / end
        at_n = jnp.where(wlk & ~walk_end, at2, at_init)
        mode_n = jnp.where(walk_end, 2, mode_n)
        cut_n = jnp.where(walk_end, ba_n, st["cut"])
        cur_n = jnp.where(walk_end, start_n, cur_n)
        nv0_n = jnp.where(walk_end, nv, st["nv0"])
        # claim finished -> back to select
        mode_n = jnp.where(fin, 0, mode_n)

        return dict(mode=mode_n, k=k_new, at=at_n, best_s=bs_n,
                    best_at=ba_n, start=start_n, sc0=sc0_n, cut=cut_n,
                    cur=cur_n, nv0=nv0_n, claimed=claimed, vbuf=vbuf,
                    u_sc=u_sc, u_cnt=u_cnt, n_u=nu, n_v=nv,
                    unsure=st["unsure"] | over_u,
                    steps=st["steps"] + 1)

    st = jax.lax.while_loop(cond, body, st0)
    unsure = st["unsure"] | (st["mode"] != 3)

    # ---- compact: chains by first-anchor x asc (stable) ----
    n_u, n_v = st["n_u"], st["n_v"]
    u_cnt, u_sc, vbuf = st["u_cnt"], st["u_sc"], st["vbuf"]
    ur = jnp.arange(ucap, dtype=I32)[None, :]
    u_live = ur < n_u[:, None]
    coff = jnp.cumsum(u_cnt, axis=1) - u_cnt            # (B, ucap) excl
    # first anchor of chain c = vbuf[coff[c] + cnt[c] - 1]
    first_v = jnp.take_along_axis(
        vbuf, jnp.maximum(coff + u_cnt - 1, 0), axis=1)
    kxh = jnp.where(u_live, jnp.take_along_axis(
        axh, jnp.minimum(first_v, A - 1), axis=1).astype(I32),
        jnp.int32(0x7FFFFFFF))
    kxl = jnp.where(u_live, jnp.take_along_axis(
        axl, jnp.minimum(first_v, A - 1), axis=1).astype(I32),
        jnp.int32(0x7FFFFFFF))
    # u32 order on i32 bit patterns: flip the sign bit
    SB = jnp.int32(-0x80000000)
    ord_c = jnp.arange(ucap, dtype=I32)[None, :] \
        + jnp.zeros((B, 1), I32)
    # ord_c is an explicit third key: x-ties keep build (score-desc)
    # order exactly like the host's stable radix on (x, coff|c) pairs
    _, _, perm = jax.lax.sort(
        (kxh ^ SB, kxl ^ SB, ord_c), num_keys=3)
    cnt_o = jnp.take_along_axis(u_cnt, perm, axis=1)
    sc_o = jnp.take_along_axis(u_sc, perm, axis=1)
    coff_src_o = jnp.take_along_axis(coff, perm, axis=1)
    coff_out = jnp.cumsum(cnt_o, axis=1) - cnt_o        # (B, ucap)

    # per output position t: which chain, which offset
    t = jnp.arange(A, dtype=I32)[None, :]
    # rank r = number of chains whose out block starts <= t, minus 1
    live_c = (jnp.arange(ucap, dtype=I32)[None, :] < n_u[:, None])
    starts = jnp.where(live_c, coff_out, jnp.int32(0x7FFFFFFF))
    rank = (starts[:, None, :] <= t[:, :, None]).sum(axis=2) - 1
    rank = jnp.clip(rank, 0, ucap - 1)
    o = t - jnp.take_along_axis(coff_out, rank, axis=1)
    src = jnp.take_along_axis(coff_src_o, rank, axis=1) \
        + jnp.take_along_axis(cnt_o, rank, axis=1) - 1 - o
    a_idx = jnp.take_along_axis(vbuf, jnp.clip(src, 0, A - 1), axis=1)
    vmask = t < n_v[:, None]
    a_idx = jnp.clip(a_idx, 0, A - 1)

    def g(plane):
        z = jnp.take_along_axis(plane, a_idx, axis=1)
        return jnp.where(vmask, z, jnp.zeros_like(z))

    return dict(c_axh=g(axh), c_axl=g(axl), c_ayh=g(ayh),
                c_ayl=g(ayl), u_sc=sc_o, u_cnt=cnt_o,
                n_u=n_u, n_v=n_v, bt_unsure=unsure)
