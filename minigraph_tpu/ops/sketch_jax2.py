"""Fully parallel exact minimizer sketch (no sequential scan).

Key identity: in the reference sketcher (sketch.c:56-109) the "current
minimum" state after processing event t always equals the *newest*
minimum of the last w events (rule A moves the minimum to the newest
tied element; rule B's rescan picks the closest; otherwise the old
minimum is still the newest minimum of the shifted window).  Every
emission rule therefore becomes a stateless per-event window
computation:

  A-emit[t]   : x_t <= min(W[t-1]) and l_t >= w+k        -> emit prev min
  B-emit[t]   : otherwise, newest-argmin(W[t-1]) == t-w  -> emit prev min
  B-ties[t]   : events in W[t] tied with newest-argmin(W[t])
  FW-ties[t]  : at l_t == w+k-1, events in W[t]\\{t} tied with prev min
  final       : newest-min of the last window

where W[t] = events [t-w+1, t] ("events" = all in-range positions except
strand-symmetric k-mers; ambiguous bases are U64MAX events).  Everything
is computed with vectorized gathers + one cumsum compaction — the layout
TPUs want.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device import hash64_jnp
from .sketch_jax import NT4_NP, encode_batch  # noqa: F401 (re-export)

U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _compact_order(mask):
    """Permutation that stably moves masked elements to the front.

    argsort is ~20x cheaper than scatter on TPU, so compactions are
    expressed as sorts.
    """
    return jnp.argsort(jnp.logical_not(mask), stable=True)


def _compact(values, mask, fill):
    """Stable compaction of masked elements to the front (per row)."""
    order = _compact_order(mask)
    v = values[order]
    return jnp.where(mask[order], v, fill)


@partial(jax.jit, static_argnames=("w", "k", "cap"))
def sketch_device_v2(codes, lens, w: int, k: int, cap: int, rid=None):
    """Batched exact minimizer sketch; same contract as sketch_device."""
    B, L = codes.shape
    if rid is None:
        rid = jnp.zeros(B, dtype=jnp.uint64)
    mask2k = jnp.uint64((1 << (2 * k)) - 1)

    def one(code_row, n_len, rid1):
        pos = jnp.arange(L, dtype=jnp.int32)
        in_range = pos < n_len
        valid = (code_row < 4) & in_range

        # ---- registers over the *valid* subsequence (C registers skip
        # ambiguous bases but persist across them) ----
        vidx = jnp.cumsum(valid.astype(jnp.int32)) - 1  # compact index
        cc = _compact(code_row.astype(jnp.uint64), valid, jnp.uint64(0))
        cvalid = _compact(valid, valid, False)
        kf = jnp.zeros(L, dtype=jnp.uint64)
        kr = jnp.zeros(L, dtype=jnp.uint64)
        j = jnp.arange(L, dtype=jnp.int32)
        for d in range(k):
            src = jnp.where(j - d >= 0, j - d, 0)
            cd = cc[src]
            ok = (j - d >= 0)
            kf = kf | jnp.where(ok, cd << jnp.uint64(2 * d), jnp.uint64(0))
            kr = kr | jnp.where(
                ok, (jnp.uint64(3) ^ cd) << jnp.uint64(2 * (k - 1 - d)),
                jnp.uint64(0))
        kf = kf & mask2k
        sym_c = cvalid & (kf == kr)
        zc = (kf >= kr)
        canon_c = jnp.where(zc, kr, kf)
        # map back to original positions
        sym = valid & sym_c[jnp.maximum(vidx, 0)]
        z = zc[jnp.maximum(vidx, 0)]
        canon = canon_c[jnp.maximum(vidx, 0)]

        # ---- event stream: all in-range positions except symmetric ----
        is_event = in_range & ~sym
        eidx = jnp.cumsum(is_event.astype(jnp.int32)) - 1
        n_ev = jnp.sum(is_event.astype(jnp.int32))
        amb = _compact(~valid & in_range, is_event, False)
        e_pos = _compact(pos, is_event, jnp.int32(0))
        e_z = _compact(z, is_event, False)
        e_canon = _compact(canon, is_event, jnp.uint64(0))
        t = jnp.arange(L, dtype=jnp.int32)
        in_ev = t < n_ev

        # l[t]: events since the last ambiguous event (which has l = 0)
        last_amb = jax.lax.associative_scan(
            jnp.maximum, jnp.where(amb, t, -1))
        l = jnp.where(last_amb >= 0, t - last_amb, t + 1)

        span = jnp.minimum(l, k)
        has_info = in_ev & ~amb & (l >= k)
        ex = jnp.where(
            has_info,
            (hash64_jnp(e_canon, mask2k) << jnp.uint64(8))
            | span.astype(jnp.uint64), U64MAX)
        ey = jnp.where(
            has_info,
            (rid1 << jnp.uint64(32))
            | (((e_pos.astype(jnp.uint64) << jnp.uint64(1))
                | e_z.astype(jnp.uint64)) & jnp.uint64(0xFFFFFFFF)), U64MAX)

        # ---- windowed views (padded with w virtual U64MAX events) ----
        px = jnp.concatenate([jnp.full(w, U64MAX, dtype=jnp.uint64), ex])
        py = jnp.concatenate([jnp.full(w, U64MAX, dtype=jnp.uint64), ey])
        # win[t, j] = event t-w+1+j  (j = 0 oldest .. w-1 newest = t)
        gidx = t[:, None] + jnp.arange(1, w + 1, dtype=jnp.int32)[None, :]
        wx = px[gidx]
        wy = py[gidx]
        # newest-argmin of W[t]
        mval = jnp.min(wx, axis=1)
        last_j = (w - 1) - jnp.argmax((wx[:, ::-1] == mval[:, None]),
                                      axis=1).astype(jnp.int32)
        m_ev = t - w + 1 + last_j            # event index of the minimum
        m_y = wy[t, last_j]

        # state before processing event t = state after t-1
        pmv = jnp.concatenate([U64MAX[None], mval[:-1]])
        pmy = jnp.concatenate([U64MAX[None], m_y[:-1]])
        pme = jnp.concatenate([jnp.int32(-1)[None] * 0 - 1, m_ev[:-1]])

        A_cond = ex <= pmv
        B_cond = in_ev & ~A_cond & (pme == t - w)
        emitA = in_ev & A_cond & (l >= w + k) & (pmv != U64MAX)
        emitB = B_cond & (l >= w + k - 1) & (pmv != U64MAX)
        # B rescan ties: events in W[t] equal to the new minimum
        b_ties = (B_cond & (l >= w + k - 1) & (mval != U64MAX))[:, None] \
            & (wx == mval[:, None]) & (wy != m_y[:, None])
        # first-window ties: W[t] minus the newest slot, vs the *previous* min
        fw = in_ev & (l == w + k - 1) & (pmv != U64MAX)
        fw_ties = fw[:, None] & (wx[:, :-1] == pmv[:, None]) \
            & (wy[:, :-1] != pmy[:, None])

        # ---- flatten emissions: per t: [fw ties (w-1), A/B old (1),
        #      B ties (w)] ----
        em_x = jnp.concatenate(
            [wx[:, :-1], pmv[:, None], wx], axis=1)
        em_y = jnp.concatenate(
            [wy[:, :-1], pmy[:, None], wy], axis=1)
        em_m = jnp.concatenate(
            [fw_ties, (emitA | emitB)[:, None], b_ties], axis=1)
        em_m = em_m.reshape(-1)
        em_x = em_x.reshape(-1)
        em_y = em_y.reshape(-1)
        # final emission: state after the last event, appended at the end
        lastv = jnp.where(n_ev > 0, mval[jnp.maximum(n_ev - 1, 0)], U64MAX)
        lasty = jnp.where(n_ev > 0, m_y[jnp.maximum(n_ev - 1, 0)], U64MAX)
        fin = lastv != U64MAX
        em_m = jnp.concatenate([em_m, fin[None]])
        em_x = jnp.concatenate([em_x, lastv[None]])
        em_y = jnp.concatenate([em_y, lasty[None]])
        # compact via argsort and truncate to cap
        order = _compact_order(em_m)[:cap]
        keep = em_m[order]
        outx = jnp.where(keep, em_x[order], U64MAX)
        outy = jnp.where(keep, em_y[order], U64MAX)
        cur = jnp.sum(em_m.astype(jnp.int32)).astype(jnp.int32)
        return outx, outy, jnp.minimum(cur, cap)

    return jax.vmap(one)(codes, lens, rid)
