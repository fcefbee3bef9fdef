"""Byte-exact device linear-chaining DP with certainty flags.

Reproduces mg_lchain_dp's DP fill (lchain.c:165-207) EXACTLY for every
read it does not flag, including the max_skip early-break heuristic,
the max_iter window clamp, and the max_ii long-range candidate — all
of which change results and therefore cannot be approximated on a
parity path.

The early break is the hard part: the reference counts "skips" —
window candidates that do not improve the running maximum AND are
marked in t[] as the parent of an already-processed candidate — and
breaks the predecessor scan after max_skip of them.  Key structural
facts that make an exact vectorized emulation possible:

  1. Parents precede children (p[j'] < j'), and the scan window is an
     upper range [st, i), so every child of an in-window anchor is
     itself in-window.  A cumulative child count cnt[j] = #{j' > j :
     p[j'] == j} therefore reproduces t[] membership exactly EXCEPT
     for per-i validity (the reference only marks from candidates
     whose transition score is valid at i).
  2. Over-marking can only BREAK EARLIER (at a larger j).  So compute
     the over-approximate break position jb_over; the true break (if
     any) is at jb_true <= jb_over, and the true processed window
     [end_j_true, i) always CONTAINS [jb_over, i).
  3. The floor-at-zero skip counter at any position is bounded by the
     number of +1-capable rows above it: +1 rows are always valid &
     marked & not-new, and only the argmax row is certainly new
     (every valid row above it scores strictly below the max).  So
     `count(valid & marked rows above x) <= max_skip` proves no break
     can fire above x — one masked sum, no scans (round 5; the
     earlier closed-form suffix-scan break emulation computed the
     same decision 3 scans more expensively, with an identical 0%
     flag rate measured on the 16 kb MHC workload).

A provably-unbroken scan down to the full-window argmax j* implies
the true result equals the full-window result (any window containing
the argmax yields the same max, and ties break to the largest j =
first processed under the reference's strict > update).  Otherwise
the read is flagged `uncertain` and routed to the exact host DP.  The
max_ii secondary candidate (lchain.c:191-198) is applied when it
fires under every possible break position and flagged when its firing
could depend on the unknown true break.

Single-query-segment flavor (n_seg == 1, !is_cdna): the production
device path only maps single-segment fragments.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .chain_jax import _mg_log2

I32 = jnp.int32
NEG_BIG = jnp.int32(-0x3FFFFFFF)


def _sc_valid(xi, yi, xj, yj, max_dist_x, max_dist_y, bw,
              chn_pen_gap, chn_pen_skip):
    """Vectorized comput_sc (lchain.c:115-140) returning (sc, valid).

    Window membership (same vertex, x-distance) is handled by the
    caller; this reproduces only the INT32_MIN validity rules."""
    dq = (yi & jnp.uint64(0xFFFFFFFF)).astype(I32) \
        - (yj & jnp.uint64(0xFFFFFFFF)).astype(I32)
    dr = (xi - xj).astype(jnp.uint64).astype(jnp.uint32).view(I32)
    bad = (dq <= 0) | (dq > max_dist_x)
    bad |= (dr == 0) | (dq > max_dist_y)
    dd = jnp.abs(dr - dq)
    bad |= dd > bw
    dg = jnp.minimum(dr, dq)
    q_span = ((yj >> jnp.uint64(32)) & jnp.uint64(0xFF)).astype(I32)
    sc = jnp.minimum(q_span, dg)
    lin_pen = jnp.float32(chn_pen_gap) * dd.astype(jnp.float32) \
        + jnp.float32(chn_pen_skip) * dg.astype(jnp.float32)
    log_pen = jnp.where(dd >= 1, _mg_log2((dd + 1).astype(jnp.float32)),
                        jnp.float32(0.0))
    pen = (lin_pen + jnp.float32(0.5) * log_pen).astype(I32)
    sc = sc - jnp.where((dd != 0) | (dg > q_span), pen, 0)
    return jnp.where(bad, NEG_BIG, sc), ~bad


def _pick(arr, idx):
    """arr[b, idx[b]] per lane without a gather: one-hot masked max."""
    B, N = arr.shape
    iota = jnp.arange(N, dtype=I32)[None, :]
    hit = iota == idx[:, None]
    return jnp.max(jnp.where(hit, arr, arr.min()), axis=1)


@partial(jax.jit, static_argnames=())
def lchain_dp_exact(ax, ay, n_a, max_dist_x, max_dist_y, bw, max_skip,
                    max_iter, chn_pen_gap, chn_pen_skip):
    """Exact-or-flagged batched chaining DP fill.

    ax/ay: (B, N) uint64 anchors in reference sort order; n_a: (B,).
    The caller must pre-apply mg_lchain_dp's entry adjustments
    (max_dist_x = max(max_dist_x, bw), same for y).
    Returns (f, p, v, sure): (B, N) int32 DP arrays (v = peak score,
    lchain.c:201) and a per-read flag that is True only when every
    step's result provably equals the reference's.
    """
    B, N = ax.shape
    iota = jnp.arange(N, dtype=I32)[None, :]
    xh = (ax >> jnp.uint64(32)).astype(jnp.uint32)

    def step(carry, i):
        f, p, cnt, v, max_ii, f_mii, uncertain = carry
        xi = jax.lax.dynamic_index_in_dim(ax, i, 1, keepdims=False)
        yi = jax.lax.dynamic_index_in_dim(ay, i, 1, keepdims=False)
        xhi = (xi >> jnp.uint64(32)).astype(jnp.uint32)
        active = i < n_a

        # window masks: mask_dist = same vertex & x-dist (the st
        # pointer, lchain.c:173); win = additionally the max_iter clamp
        same_vx = xh == xhi[:, None]
        xdist_ok = (xi[:, None] - ax).astype(jnp.uint64) \
            <= jnp.uint64(1) * max_dist_x.astype(jnp.uint64)
        before = iota < i
        mask_dist = same_vx & xdist_ok & before
        win = mask_dist & (iota >= i - max_iter)
        st_dist = i - jnp.sum(mask_dist, axis=1).astype(I32)
        st_win = i - jnp.sum(win, axis=1).astype(I32)

        sc, valid0 = _sc_valid(xi[:, None], yi[:, None], ax, ay,
                               max_dist_x, max_dist_y, bw,
                               chn_pen_gap, chn_pen_skip)
        valid = valid0 & win
        sc_tot = jnp.where(valid, sc + f, NEG_BIG)

        q_span_i = ((yi >> jnp.uint64(32)) & jnp.uint64(0xFF)).astype(I32)

        # full-window max; ties -> largest j (first processed wins
        # under the strict > update in descending-j order)
        M = jnp.max(sc_tot, axis=1)
        idx = jnp.max(jnp.where((sc_tot == M[:, None]) & valid, iota,
                                I32(-1)), axis=1)
        best = M > q_span_i

        # ---- scan-free conservative break test (round 5) ----
        # The floor-at-zero skip counter at any row is bounded by the
        # number of +1-capable rows above it (+1 rows are valid &
        # marked & not-new; only the argmax row is certainly new).
        # count(above x) <= max_skip proves the scan reaches x.
        marked = cnt > 0
        splus = (valid & marked
                 & ~((iota == idx[:, None]) & best[:, None])).astype(I32)
        cnt_above_idx = jnp.sum(
            jnp.where(iota > idx[:, None], splus, 0), axis=1)

        max_f = jnp.where(best, M, q_span_i)
        max_j = jnp.where(best, idx, I32(-1))
        step_unc = best & (cnt_above_idx > max_skip)

        # ---- max_ii long-range candidate (lchain.c:191-198) ----
        stale = (max_ii < 0) | (max_ii < st_dist)
        fw = jnp.where(win, f, NEG_BIG)
        Mf = jnp.max(fw, axis=1)
        idx_f = jnp.max(jnp.where((fw == Mf[:, None]) & win, iota,
                                  I32(-1)), axis=1)
        any_win = jnp.any(win, axis=1)
        max_ii = jnp.where(stale, jnp.where(any_win, idx_f, I32(-1)),
                           max_ii)
        f_mii = jnp.where(stale, jnp.where(any_win, Mf, I32(0)), f_mii)

        has_mii = max_ii >= 0
        # the reference evaluates comput_sc(a[i], a[max_ii]) with NO
        # window restriction (lchain.c:198): a live max_ii can sit
        # BELOW the max_iter-clamped window start, which is the whole
        # point of the candidate.  Mask with score validity only.
        tmp = _pick(jnp.where(valid0 & before, sc, NEG_BIG), max_ii)
        cand_ok = has_mii & (tmp > NEG_BIG)
        delta = cand_ok & (max_f < tmp + f_mii)
        # fires under every possible end_j (end_j >= st_win - 1)
        fire_sure = has_mii & (max_ii < st_win - 1)
        # conservative analog of `has_break & (max_ii < jb)`
        cnt_above_mii = jnp.sum(
            jnp.where(iota > max_ii[:, None], splus, 0), axis=1)
        fire_maybe = has_mii & ~fire_sure & (cnt_above_mii > max_skip)
        apply = fire_sure & delta
        step_unc |= fire_maybe & delta
        f_i = jnp.where(apply, tmp + f_mii, max_f)
        p_i = jnp.where(apply, max_ii, max_j)

        v_pi = _pick(v, jnp.maximum(p_i, 0))
        v_i = jnp.where((p_i >= 0) & (v_pi > f_i), v_pi, f_i)

        # final max_ii update (lchain.c:203-204); a live max_ii is
        # always x-close (else it would have been recomputed above)
        upd = (max_ii < 0) | (f_mii < f_i)
        max_ii = jnp.where(active & upd, i, max_ii)
        f_mii = jnp.where(active & upd, f_i, f_mii)

        uncertain = uncertain | (step_unc & active)
        wr = active[:, None] & (iota == i)
        f = jnp.where(wr, f_i[:, None], f)
        p = jnp.where(wr, p_i[:, None], p)
        v = jnp.where(wr, v_i[:, None], v)
        cnt = cnt + ((iota == p_i[:, None]) & (p_i >= 0)[:, None]
                     & active[:, None]).astype(I32)
        return (f, p, cnt, v, max_ii, f_mii, uncertain), None

    init = (jnp.zeros((B, N), I32), jnp.full((B, N), -1, I32),
            jnp.zeros((B, N), I32), jnp.zeros((B, N), I32),
            jnp.full((B,), -1, I32), jnp.zeros((B,), I32),
            jnp.zeros((B,), bool))
    (f, p, cnt, v, max_ii, f_mii, uncertain), _ = jax.lax.scan(
        step, init, jnp.arange(N, dtype=I32))
    return f, p, v, ~uncertain


@partial(jax.jit, static_argnames=("window", "tile"))
def lchain_dp_exact_win(ax, ay, n_a, max_dist_x, max_dist_y, bw, max_skip,
                        max_iter, chn_pen_gap, chn_pen_skip,
                        window: int = 1024, tile: int = 8):
    """Windowed lchain_dp_exact for long reads.

    Identical semantics with two changes that keep per-step work
    O(B * window) instead of O(B * N):
      * only the `window` most recent anchors are candidates; a read
        where the reference's scan window [st, i) reaches further back
        (dense anchors within max_dist_x) is flagged uncertain and
        takes the host path — rare outside repeat pileups, and those
        reads usually already trip the occurrence caps;
      * `tile` anchors are processed per lax.scan step (the step body
        is unrolled), amortizing the ~10 us TPU scan-step overhead.

    Arrays are left-padded with `window` dummy columns internally so
    every slice offset is static.
    """
    B, N = ax.shape
    W, T = window, tile
    assert N % T == 0
    U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    pad = jnp.full((B, W), U64MAX, dtype=ax.dtype)
    axp = jnp.concatenate([pad, ax], axis=1)
    ayp = jnp.concatenate([pad, ay], axis=1)
    xhp = (axp >> jnp.uint64(32)).astype(jnp.uint32)

    def step(carry, i0):
        # padded arrays: anchor i lives at column W + i
        f, p, cnt, v, max_ii, f_mii, uncertain = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, W + T, axis=1)
        fw, pw, cw, vw = sl(f), sl(p), sl(cnt), sl(v)
        axw, ayw, xhw = sl(axp), sl(ayp), sl(xhp)
        for t in range(T):
            i = i0 + t                    # global anchor index
            col = W + t                   # its column inside the slice
            xi, yi, xhi = axw[:, col], ayw[:, col], xhw[:, col]
            active = i < n_a
            # global anchor index of slice column c is i0 + c - W
            jg = i0 + jnp.arange(W + T, dtype=I32)[None, :] - W
            before = jnp.arange(W + T, dtype=I32)[None, :] < col
            same_vx = xhw == xhi[:, None]
            xdist_ok = (xi[:, None] - axw).astype(jnp.uint64) \
                <= jnp.uint64(1) * max_dist_x.astype(jnp.uint64)
            mask_dist = same_vx & xdist_ok & before
            win = mask_dist & (jg >= i - max_iter)
            st_dist = i - jnp.sum(mask_dist, axis=1).astype(I32)
            st_win = i - jnp.sum(win, axis=1).astype(I32)
            # the reference window may reach below our slice: flag
            overflow = mask_dist[:, 0]

            sc, valid0 = _sc_valid(xi[:, None], yi[:, None], axw, ayw,
                                   max_dist_x, max_dist_y, bw,
                                   chn_pen_gap, chn_pen_skip)
            valid = valid0 & win
            sc_tot = jnp.where(valid, sc + fw, NEG_BIG)
            q_span_i = ((yi >> jnp.uint64(32))
                        & jnp.uint64(0xFF)).astype(I32)

            M = jnp.max(sc_tot, axis=1)
            idx = jnp.max(jnp.where((sc_tot == M[:, None]) & valid, jg,
                                    I32(-1)), axis=1)
            best = M > q_span_i

            # scan-free conservative break test (see lchain_dp_exact)
            marked = cw > 0
            splus = (valid & marked
                     & ~((jg == idx[:, None]) & best[:, None])) \
                .astype(I32)
            cnt_above_idx = jnp.sum(
                jnp.where(jg > idx[:, None], splus, 0), axis=1)

            max_f = jnp.where(best, M, q_span_i)
            max_j = jnp.where(best, idx, I32(-1))
            step_unc = (best & (cnt_above_idx > max_skip)) | overflow

            stale = (max_ii < 0) | (max_ii < st_dist)
            fmsk = jnp.where(win, fw, NEG_BIG)
            Mf = jnp.max(fmsk, axis=1)
            idx_f = jnp.max(jnp.where((fmsk == Mf[:, None]) & win, jg,
                                      I32(-1)), axis=1)
            any_win = jnp.any(win, axis=1)
            max_ii = jnp.where(stale, jnp.where(any_win, idx_f, I32(-1)),
                               max_ii)
            f_mii = jnp.where(stale, jnp.where(any_win, Mf, I32(0)), f_mii)

            has_mii = max_ii >= 0
            mii_col = jg == max_ii[:, None]
            # score validity only, NOT the scan window: the candidate
            # exists precisely to reach below the max_iter clamp
            # (lchain.c:198); a max_ii below the slice is covered by
            # the overflow flag
            tmp = jnp.max(jnp.where(mii_col & valid0, sc, NEG_BIG),
                          axis=1)
            cand_ok = has_mii & (tmp > NEG_BIG)
            delta = cand_ok & (max_f < tmp + f_mii)
            fire_sure = has_mii & (max_ii < st_win - 1)
            cnt_above_mii = jnp.sum(
                jnp.where(jg > max_ii[:, None], splus, 0), axis=1)
            fire_maybe = has_mii & ~fire_sure & (cnt_above_mii > max_skip)
            apply = fire_sure & delta
            step_unc |= fire_maybe & delta
            f_i = jnp.where(apply, tmp + f_mii, max_f)
            p_i = jnp.where(apply, max_ii, max_j)

            pcol = jg == jnp.maximum(p_i, 0)[:, None]
            v_pi = jnp.max(jnp.where(pcol, vw, NEG_BIG), axis=1)
            v_i = jnp.where((p_i >= 0) & (v_pi > f_i), v_pi, f_i)

            upd = (max_ii < 0) | (f_mii < f_i)
            max_ii = jnp.where(active & upd, i, max_ii)
            f_mii = jnp.where(active & upd, f_i, f_mii)
            uncertain = uncertain | (step_unc & active)

            fw = fw.at[:, col].set(jnp.where(active, f_i, fw[:, col]))
            pw = pw.at[:, col].set(jnp.where(active, p_i, pw[:, col]))
            vw = vw.at[:, col].set(jnp.where(active, v_i, vw[:, col]))
            cw = cw + (pcol & (p_i >= 0)[:, None]
                       & active[:, None]).astype(I32)
        upd_sl = lambda a, w: jax.lax.dynamic_update_slice_in_dim(
            a, w, i0, axis=1)
        return (upd_sl(f, fw), upd_sl(p, pw), upd_sl(cnt, cw),
                upd_sl(v, vw), max_ii, f_mii, uncertain), None

    init = (jnp.zeros((B, W + N), I32), jnp.full((B, W + N), -1, I32),
            jnp.zeros((B, W + N), I32), jnp.zeros((B, W + N), I32),
            jnp.full((B,), -1, I32), jnp.zeros((B,), I32),
            jnp.zeros((B,), bool))
    (f, p, cnt, v, max_ii, f_mii, uncertain), _ = jax.lax.scan(
        step, init, jnp.arange(0, N, T, dtype=I32))
    return (f[:, W:], p[:, W:], v[:, W:], ~uncertain)
