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
    order.  The reference's candidate order comes from ksort.h's
    radix_sort_128x — an in-place MSD american-flag sort that is NOT
    stable, so its tie permutation has no closed form the device can
    reproduce.  The kernel orders ties by larger index first and
    DETECTS when a tie could have mattered: whenever a walk stops at
    (or a candidate is found claimed by) a chain whose start has the
    SAME f as the current candidate, the equal-f pair interacted and
    the read is flagged to the exact host path.  Non-interacting ties
    (the overwhelmingly common kind — 0/128 interacting on the 2 kb
    MHC bench reads vs 38% of reads having some equal-f candidates)
    produce identical output under every tie order and stay on
    device.  A first-anchor-x tie between two kept chains is flagged
    for the same reason at compaction time (build-order ties there
    inherit the candidate order);
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
machine.  Round-5 structure (2x fewer iterations than the r4
three-mode select/walk/claim interpreter):

  * the walk CLAIMS AS IT GOES (vbuf append + claimed marks fused
    into the walk step); a walk never revisits its own path (parent
    chains strictly decrease), so self-claims are invisible to it and
    only the cross-chain semantics matter — which are sequential
    anyway.  At walk end, overshoot past the cut (= peak) is undone
    position-by-position (mode 2), typically a handful of steps.
  * selection is O(1) iterations per chain instead of one iteration
    per examined candidate: a rank-indexed claimed plane (claimed_k,
    maintained alongside the anchor-indexed bitmap via the inverse
    candidate permutation) turns "skip claimed candidates" into one
    masked max.

Lanes that exceed the step budget set an `unsure` flag and the read
falls back to the exact host path — the same exact-or-flag contract
as the chain kernel.  All i32; runs under the x64-free fused step.
"""
from __future__ import annotations

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
    # inverse permutation: rank of anchor a in the candidate order
    # (sort (s_idx, rank) by s_idx -> ranks in anchor order)
    _, r_of = jax.lax.sort((s_idx, jnp.broadcast_to(idx, (B, A))),
                           num_keys=1)

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

    # Packed per-anchor plane: one take yields parent, claim state,
    # and the claimer's f at once (the interpreter is bound by the
    # number of (B, A) one-hot passes per iteration).  Bits:
    #   [0..13]  p+1                (A < 16384, asserted by the front)
    #   14       claimed
    #   15       chain start
    #   16       visited (claimf valid; survives undo)
    #   [17..31] low 15 bits of the claiming chain's start-f — the
    #            equal-f tie tests compare these 15 bits, so a 2^-15
    #            collision can only ADD a (conservative) flag
    assert A < (1 << 14), "packed parent field"
    PK_P = jnp.int32(0x3FFF)
    PK_CLAIMED = jnp.int32(1 << 14)
    PK_START = jnp.int32(1 << 15)
    PK_VIS = jnp.int32(1 << 16)
    F15 = jnp.int32(0x7FFF)

    # state: mode 0=select 1=walk 2=undo 3=done
    st0 = dict(
        mode=jnp.where(n_z > 0, 0, 3).astype(I32),
        k=n_z - 1,
        pk_at=jnp.zeros(B, I32), best_s=jnp.zeros(B, I32),
        best_at=jnp.zeros(B, I32), best_pos=jnp.zeros(B, I32),
        start=jnp.zeros(B, I32), sc0=jnp.zeros(B, I32),
        cut=jnp.zeros(B, I32), nv0=jnp.zeros(B, I32),
        pk=p + 1,
        claimed_k=idx >= n_z[:, None],   # ranks past n_z never select
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

    def finish_chain(st, fin, cut, nv_keep):
        """Accept/reject the finished chain (lanes where fin); returns
        updated (u_sc, u_cnt, n_u, n_v, unsure, k, mode pieces are
        handled by the caller)."""
        cut_root = cut < 0
        sc = jnp.where(cut_root, st["sc0"], st["sc0"] - take(f, cut))
        cnt = nv_keep - st["nv0"]
        acc = fin & (sc >= jnp.int32(min_sc)) \
            & (cnt >= jnp.int32(min_cnt)) & (cnt > 0)
        nu = st["n_u"]
        over_u = acc & (nu >= jnp.int32(ucap))
        put = acc & ~over_u
        w_u = (ur_oh == nu[:, None]) & put[:, None]
        u_sc = jnp.where(w_u, sc[:, None], st["u_sc"])
        u_cnt = jnp.where(w_u, cnt[:, None], st["u_cnt"])
        nu = jnp.where(put, nu + 1, nu)
        # reject: rewind v (claims stay, lchain.c:63-66)
        n_v = jnp.where(fin, jnp.where(acc, nv_keep, st["nv0"]),
                        st["n_v"])
        return u_sc, u_cnt, nu, n_v, over_u

    def body(st):
        mode = st["mode"]
        pk, claimed_k = st["pk"], st["claimed_k"]
        vbuf, nv = st["vbuf"], st["n_v"]

        # --- mode 0: select the highest-ranked unclaimed candidate
        # (one masked max; O(1) iterations per chain) ---
        sel = mode == 0
        k_free = jnp.max(jnp.where(
            ~claimed_k & (idx <= st["k"][:, None]), idx, I32(-1)),
            axis=1)
        to_done = sel & (k_free < 0)
        to_walk = sel & (k_free >= 0)
        cand_i = take(s_idx, k_free)
        f_cand = take(f, cand_i)
        pk_cand = take(pk, cand_i)
        # entering walk: append + claim the start anchor
        start_n = jnp.where(to_walk, cand_i, st["start"])
        sc0_n = jnp.where(to_walk, f_cand, st["sc0"])

        # --- mode 1: one walk step from `at` (claims as it goes);
        # the packed word carried from the previous step supplies
        # p[at] without a take, and one take of pk[at2] yields claim
        # state + claimer-f + next parent together ---
        wlk = mode == 1
        at2 = (st["pk_at"] & PK_P) - 1
        root = at2 < 0
        pk2 = take(pk, at2)
        fa2 = take(f, at2)
        s = jnp.where(root, st["sc0"], st["sc0"] - fa2)
        better = s > st["best_s"]
        drop = ~better & (st["best_s"] - s > jnp.int32(max_drop))
        at2_claimed = ((pk2 & PK_CLAIMED) > 0) & ~root
        # the claimer's start-f equals this walk's start-f: the
        # reference's unstable tie order could have swapped the two
        # chains — exact-or-flag
        tie_hit = wlk & at2_claimed \
            & (((pk2 >> 17) & F15) == (st["sc0"] & F15))
        walk_end = wlk & (drop | root | at2_claimed)
        walk_go = wlk & ~walk_end
        best_s_n = jnp.where(wlk & better, s, st["best_s"])
        best_at_n = jnp.where(wlk & better, at2, st["best_at"])
        # position at2 will occupy if appended (this iteration, when
        # walk continues); ending steps never append at2
        best_pos_n = jnp.where(walk_go & better, nv, st["best_pos"])
        # walk entry: best starts at the candidate itself with s = 0
        best_s_n = jnp.where(to_walk, 0, best_s_n)
        best_at_n = jnp.where(to_walk, cand_i, best_at_n)

        # append+claim: the selected start (to_walk) or at2 (walk_go)
        app = to_walk | walk_go
        app_i = jnp.where(to_walk, cand_i, at2)
        base = jnp.where(to_walk, pk_cand, pk2)
        # the visited bit + stale claimer-f survive undo on purpose:
        # claiming a node an equal-f walk VISITED is also an
        # interaction (under the reference's tie order the other
        # chain could have claimed it first) — detect before the
        # overwrite
        tie_hit = tie_hit | (app & ((base & PK_VIS) > 0)
                             & (((base >> 17) & F15)
                                == (sc0_n & F15)))
        newv = (base & PK_P) | PK_CLAIMED | PK_VIS \
            | jnp.where(to_walk, PK_START, 0) \
            | ((sc0_n & F15) << 17)
        app_oh = oh(app_i) & app[:, None]
        pk = jnp.where(app_oh, newv[:, None], pk)
        rk = take(r_of, app_i)
        claimed_k = claimed_k | (oh(rk) & app[:, None])
        w_v = (idx == nv[:, None]) & app[:, None]
        vbuf = jnp.where(w_v, app_i[:, None], vbuf)
        nv = jnp.where(app, nv + 1, nv)

        # walk end: resolve the cut.  cut == best_at; if the best was
        # set on the ending step itself (best_at == at2, never
        # appended) or the walk root-ended with a final improvement
        # (best_at == -1), every appended node is kept; otherwise undo
        # speculative claims back to best_pos (cut excluded from the
        # claim set, so best_pos itself is undone too).
        cut_n = jnp.where(walk_end, best_at_n, st["cut"])
        keep_all = walk_end & ((best_at_n == at2) | (best_at_n < 0))
        need_undo = walk_end & ~keep_all & (nv > best_pos_n)
        fin_now = walk_end & ~need_undo
        nv_keep = jnp.where(keep_all, nv, best_pos_n)

        # --- mode 2: one undo step (unclaim vbuf[nv-1]; the visited
        # bit and claimer-f stay for the tie detection) ---
        und = mode == 2
        u_at = take(vbuf, nv - 1)
        u_oh = oh(u_at) & und[:, None]
        pk = jnp.where(u_oh, pk & ~(PK_CLAIMED | PK_START), pk)
        u_rk = take(r_of, u_at)
        claimed_k = claimed_k & ~(oh(u_rk) & und[:, None])
        nv = jnp.where(und, nv - 1, nv)
        undo_done = und & (nv <= st["best_pos"])
        fin_now = fin_now | undo_done

        # --- chain completion (accept/reject) ---
        cutv = jnp.where(undo_done, st["cut"], cut_n)
        u_sc, u_cnt, nu, n_v_new, over_u = finish_chain(
            dict(st, n_v=nv), fin_now, cutv, jnp.where(
                undo_done, nv, nv_keep))
        k_new = jnp.where(fin_now, st["k"] - 1, st["k"])
        # NB k is only an upper bound for the masked-max select; the
        # claimed_k plane is what actually skips visited candidates
        k_new = jnp.where(to_walk, k_free, k_new)

        # --- transitions ---
        mode_n = mode
        mode_n = jnp.where(to_done, 3, mode_n)
        mode_n = jnp.where(to_walk, 1, mode_n)
        mode_n = jnp.where(walk_end & need_undo, 2, mode_n)
        mode_n = jnp.where(fin_now, 0, mode_n)
        # the carried word's p bits identify the next walk position
        # (claim-bit updates to pk[app_i] never touch the p field)
        pk_at_n = jnp.where(to_walk, pk_cand,
                            jnp.where(walk_go, pk2, st["pk_at"]))

        return dict(mode=mode_n, k=k_new, pk_at=pk_at_n,
                    best_s=best_s_n,
                    best_at=best_at_n, best_pos=jnp.where(
                        to_walk, nv - 1, best_pos_n),
                    start=start_n, sc0=sc0_n, cut=cut_n,
                    nv0=jnp.where(to_walk, nv - 1, st["nv0"]),
                    pk=pk, claimed_k=claimed_k, vbuf=vbuf,
                    u_sc=u_sc, u_cnt=u_cnt, n_u=nu,
                    n_v=jnp.where(fin_now, n_v_new, nv),
                    unsure=st["unsure"] | over_u | tie_hit,
                    steps=st["steps"] + 1)

    st = jax.lax.while_loop(cond, body, st0)
    unsure = st["unsure"] | (st["mode"] != 3)
    # a candidate claimed mid-path by an equal-f chain was silently
    # skipped by the select — the reference's tie order could instead
    # have walked it first (15-bit f compare: collisions only add
    # conservative flags)
    pkf = st["pk"]
    unsure = unsure | jnp.any(
        ((pkf & PK_CLAIMED) > 0) & cand
        & (((pkf >> 17) & F15) == (f & F15))
        & ((pkf & PK_START) == 0),
        axis=1)

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
    # order.  Two kept chains tying on first-anchor x inherit the
    # candidate tie order the reference's unstable radix produced —
    # flag those reads rather than guess.
    skh, skl, perm = jax.lax.sort(
        (kxh ^ SB, kxl ^ SB, ord_c), num_keys=3)
    unsure = unsure | jnp.any(
        (skh[:, 1:] == skh[:, :-1]) & (skl[:, 1:] == skl[:, :-1])
        & (jnp.arange(1, ucap, dtype=I32)[None, :] < n_u[:, None]),
        axis=1)
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
