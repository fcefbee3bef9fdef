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
        vorder = _compact_order(valid)
        cvalid = valid[vorder]
        cc = jnp.where(cvalid, code_row[vorder].astype(jnp.uint64),
                       jnp.uint64(0))
        kf = jnp.zeros(L, dtype=jnp.uint64)
        kr = jnp.zeros(L, dtype=jnp.uint64)
        zpad = jnp.zeros(L, dtype=jnp.uint64)
        for d in range(k):
            # static shift (cheaper than a gather)
            cd = cc if d == 0 else jnp.concatenate([zpad[:d], cc[: L - d]])
            kf = kf | (cd << jnp.uint64(2 * d))
            kr = kr | ((jnp.uint64(3) ^ cd) << jnp.uint64(2 * (k - 1 - d)))
            if d:  # clear the pad contribution of kr's xor on zero pad
                kr = kr ^ jnp.concatenate(
                    [jnp.full(d, jnp.uint64(3) << jnp.uint64(2 * (k - 1 - d))),
                     zpad[: L - d]])
        kf = kf & mask2k
        sym_c = cvalid & (kf == kr)
        zc = (kf >= kr)
        canon_c = jnp.where(zc, kr, kf)
        # map back to original positions with ONE packed gather
        packed_c = canon_c | jnp.where(sym_c, jnp.uint64(1) << jnp.uint64(63),
                                       jnp.uint64(0)) \
            | jnp.where(zc, jnp.uint64(1) << jnp.uint64(62), jnp.uint64(0))
        packed = packed_c[jnp.maximum(vidx, 0)]
        sym = valid & ((packed >> jnp.uint64(63)) != 0)
        z = (packed >> jnp.uint64(62)) & jnp.uint64(1) != 0
        canon = packed & jnp.uint64((1 << 62) - 1)

        # ---- event stream: all in-range positions except symmetric ----
        is_event = in_range & ~sym
        n_ev = jnp.sum(is_event.astype(jnp.int32))
        eorder = _compact_order(is_event)
        emask = is_event[eorder]
        # one packed gather: amb<<63 | z<<62 | pos (canon gathered with it)
        pk = pos.astype(jnp.uint64) \
            | jnp.where(~valid & in_range, jnp.uint64(1) << jnp.uint64(63),
                        jnp.uint64(0)) \
            | jnp.where(z, jnp.uint64(1) << jnp.uint64(62), jnp.uint64(0))
        pk_e = jnp.where(emask, pk[eorder], jnp.uint64(0))
        e_canon = jnp.where(emask, canon[eorder], jnp.uint64(0))
        amb = (pk_e >> jnp.uint64(63)) != 0
        e_z = (pk_e >> jnp.uint64(62)) & jnp.uint64(1) != 0
        e_pos = (pk_e & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
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
        # win[t, j] = event t-w+1+j via static slices (no gather)
        wx = jnp.stack([px[j + 1: j + 1 + L] for j in range(w)], axis=1)
        wy = jnp.stack([py[j + 1: j + 1 + L] for j in range(w)], axis=1)
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

        # ---- flatten emission masks: per t: [fw ties (w-1), A/B old (1),
        #      B ties (w)]; values are gathered lazily for survivors ----
        S = 2 * w  # slots per event
        em_m = jnp.concatenate(
            [fw_ties, (emitA | emitB)[:, None], b_ties], axis=1).reshape(-1)
        # final emission: state after the last event, appended at the end
        lastv = jnp.where(n_ev > 0, mval[jnp.maximum(n_ev - 1, 0)], U64MAX)
        lasty = jnp.where(n_ev > 0, m_y[jnp.maximum(n_ev - 1, 0)], U64MAX)
        fin = lastv != U64MAX
        em_m = jnp.concatenate([em_m, fin[None]])
        # compact via argsort, truncate to cap, then decode (t, slot)
        order = _compact_order(em_m)[:cap]
        keep = em_m[order]
        o_t = (order // S).astype(jnp.int32)
        o_slot = (order % S).astype(jnp.int32)
        is_fin = order == L * S          # the appended final-emission slot
        is_old = o_slot == (w - 1)       # the A/B old-min slot
        # window position u for tie slots: fw ties use j = slot,
        # B ties use j = slot - w; both index W[t] = events t-w+1+j
        j_win = jnp.where(o_slot < w - 1, o_slot, o_slot - w)
        u = o_t + 1 + j_win              # + (w padding offset) below
        vx = px[jnp.clip(u, 0, L + w - 1)]
        vy = py[jnp.clip(u, 0, L + w - 1)]
        o_t_c = jnp.clip(o_t, 0, L - 1)
        vx = jnp.where(is_old, pmv[o_t_c], vx)
        vy = jnp.where(is_old, pmy[o_t_c], vy)
        vx = jnp.where(is_fin, lastv, vx)
        vy = jnp.where(is_fin, lasty, vy)
        outx = jnp.where(keep, vx, U64MAX)
        outy = jnp.where(keep, vy, U64MAX)
        cur = jnp.sum(em_m.astype(jnp.int32)).astype(jnp.int32)
        return outx, outy, jnp.minimum(cur, cap)

    return jax.vmap(one)(codes, lens, rid)
