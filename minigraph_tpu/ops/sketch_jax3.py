"""Gather-free exact minimizer sketch on uint32 planes (odd k).

Same emission semantics as sketch_jax2 (itself an exact restatement of
sketch.c:56-109), specialized to ODD k — every minigraph preset uses
k in {17, 19, 21}.  For odd k a canonical k-mer can never equal its
reverse complement (the middle base flips), so the reference's
symmetric-k-mer skip (sketch.c:74) never fires and the event stream IS
the position stream.  That collapses sketch_jax2's three stable
compactions (valid bases, events, emissions) into zero gathers for the
value math: k-mers, hashes, window minima and emission masks are all
computed position-aligned with static shifts.

The second trick is dtype: TPUs emulate uint64, so all 64-bit packing
(hash<<8|span, rid<<32|pos<<1|strand) is carried as (hi, lo) uint32
plane pairs (ops/u32.py) and only assembled into uint64 for the final
<= cap emitted records.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import u32

U32 = jnp.uint32
U32MAX = jnp.uint32(0xFFFFFFFF)


@partial(jax.jit, static_argnames=("w", "k", "cap"))
def sketch_device_v3(codes, lens, w: int, k: int, cap: int, rid=None):
    """Batched exact minimizer sketch; contract of sketch_device_v2.

    codes: (B, L) uint8 nt4 codes (>=4 = ambiguous); lens: (B,) int32.
    Returns (mx, my, n): (B, cap) uint64 minimizer records (padding =
    all-ones) and per-read counts.  Requires odd k.
    """
    if k % 2 == 0:
        raise ValueError("sketch_device_v3 requires odd k")
    B, L = codes.shape
    if rid is None:
        rid = jnp.zeros(B, dtype=U32)
    else:
        rid = rid.astype(U32)
    mask2k = (1 << (2 * k)) - 1

    def one(code_row, n_len, rid1):
        pos = jnp.arange(L, dtype=jnp.int32)
        in_range = pos < n_len
        valid = (code_row < 4) & in_range
        c = jnp.where(valid, code_row, 0).astype(U32)

        def shift_pos(a, d, fill):
            """a shifted so out[i] = a[i-d] (static d)."""
            if d == 0:
                return a
            return jnp.concatenate([jnp.full(d, fill, dtype=a.dtype),
                                    a[: L - d]])

        # k-mer registers, position-aligned: kf[i] = bases i-k+1..i
        # (base i in the low bits, sketch.c:66), kr = revcomp.
        kf_hi = jnp.zeros(L, dtype=U32)
        kf_lo = jnp.zeros(L, dtype=U32)
        kr_hi = jnp.zeros(L, dtype=U32)
        kr_lo = jnp.zeros(L, dtype=U32)
        for d in range(k):
            cd = shift_pos(c, d, U32(0))
            cdc = cd ^ U32(3)  # complement
            bf = 2 * d
            if bf < 32:
                kf_lo = kf_lo | (cd << U32(bf))
                if bf > 30:  # straddles (bf == 31 impossible: even)
                    pass
            if bf >= 32:
                kf_hi = kf_hi | (cd << U32(bf - 32))
            br = 2 * (k - 1 - d)
            if br < 32:
                kr_lo = kr_lo | (cdc << U32(br))
            else:
                kr_hi = kr_hi | (cdc << U32(br - 32))

        # l[i]: valid bases since the last ambiguous/over-end position
        last_bad = jax.lax.associative_scan(
            jnp.maximum, jnp.where(valid, -1, pos))
        l = jnp.where(last_bad >= 0, pos - last_bad, pos + 1)

        z = jnp.logical_not(u32.lt(kf_hi, kf_lo, kr_hi, kr_lo))  # rev smaller
        can_h, can_l = u32.select(z, kr_hi, kr_lo, kf_hi, kf_lo)
        hh, hl = u32.hash64(can_h, can_l, mask2k)

        span = jnp.minimum(l, k).astype(U32)
        has_info = in_range & valid & (l >= k)
        # ex = hash<<8 | span ; ey = rid<<32 | pos<<1 | z
        exh, exl = u32.shl(hh, hl, 8)
        exl = exl | span
        exh = jnp.where(has_info, exh, U32MAX)
        exl = jnp.where(has_info, exl, U32MAX)
        eyh = jnp.where(has_info, rid1, U32MAX)
        eyl = jnp.where(has_info,
                        (pos.astype(U32) << U32(1)) | z.astype(U32), U32MAX)

        # ---- windowed newest-min over the last w positions ----
        pxh = jnp.concatenate([jnp.full(w, U32MAX, dtype=U32), exh])
        pxl = jnp.concatenate([jnp.full(w, U32MAX, dtype=U32), exl])
        pyh = jnp.concatenate([jnp.full(w, U32MAX, dtype=U32), eyh])
        pyl = jnp.concatenate([jnp.full(w, U32MAX, dtype=U32), eyl])

        def win(a, j):
            # window slot j of W[t] = event t-w+1+j
            return a[j + 1: j + 1 + L]

        mh, ml = win(pxh, 0), win(pxl, 0)
        myh, myl = win(pyh, 0), win(pyl, 0)
        mj = jnp.zeros(L, dtype=jnp.int32)
        for j in range(1, w):
            nh, nl = win(pxh, j), win(pxl, j)
            take = u32.le(nh, nl, mh, ml)  # newest wins ties
            mh = jnp.where(take, nh, mh)
            ml = jnp.where(take, nl, ml)
            myh = jnp.where(take, win(pyh, j), myh)
            myl = jnp.where(take, win(pyl, j), myl)
            mj = jnp.where(take, j, mj)
        t = pos
        m_ev = t - w + 1 + mj

        def prev(a, fill):
            return jnp.concatenate([jnp.full(1, fill, dtype=a.dtype),
                                    a[:-1]])

        pmh, pml = prev(mh, U32MAX), prev(ml, U32MAX)
        pmyh, pmyl = prev(myh, U32MAX), prev(myl, U32MAX)
        pme = prev(m_ev, jnp.int32(-1))

        pmv_ok = ~u32.eq(pmh, pml, U32MAX, U32MAX)
        mval_ok = ~u32.eq(mh, ml, U32MAX, U32MAX)
        in_ev = in_range
        A_cond = u32.le(exh, exl, pmh, pml)
        B_cond = in_ev & ~A_cond & (pme == t - w)
        emitA = in_ev & A_cond & (l >= w + k) & pmv_ok
        emitB = B_cond & (l >= w + k - 1) & pmv_ok

        # tie scans over the window slots (rare emissions, cheap masks)
        b_base = B_cond & (l >= w + k - 1) & mval_ok
        fw = in_ev & (l == w + k - 1) & pmv_ok
        tie_cols = []
        for j in range(w):
            wxh_j, wxl_j = win(pxh, j), win(pxl, j)
            wyh_j, wyl_j = win(pyh, j), win(pyl, j)
            bt = b_base & u32.eq(wxh_j, wxl_j, mh, ml) \
                & ~u32.eq(wyh_j, wyl_j, myh, myl)
            if j < w - 1:
                ft = fw & u32.eq(wxh_j, wxl_j, pmh, pml) \
                    & ~u32.eq(wyh_j, wyl_j, pmyh, pmyl)
            else:
                ft = None
            tie_cols.append((ft, bt))

        # slot layout per t: [fw ties (w-1), A/B old-min (1), B ties (w)].
        # Flattened COLUMN-major (slot*L + t): keeps L (128-aligned) as
        # the minor dim — a (L, 2w) row-major stack forces an expensive
        # lane relayout — and makes the t/slot decode shift/mask ops.
        S = 2 * w
        em_cols = [tie_cols[j][0] for j in range(w - 1)] \
            + [emitA | emitB] \
            + [tie_cols[j][1] for j in range(w)]
        # emission ORDER within a read differs from row-major flatten,
        # but consumers re-sort anchors by x (see pipeline.py), so only
        # the SET of emissions must match sketch_jax2.
        em_m = jnp.concatenate(em_cols)
        last_i = jnp.maximum(n_len - 1, 0)
        lastvh, lastvl = mh[last_i], ml[last_i]
        lastyh, lastyl = myh[last_i], myl[last_i]
        fin = (n_len > 0) & ~u32.eq(lastvh, lastvl, U32MAX, U32MAX)
        em_m = jnp.concatenate([em_m, fin[None]])

        assert L & (L - 1) == 0, "L must be a power of two"
        lshift = L.bit_length() - 1
        order = jnp.argsort(jnp.logical_not(em_m), stable=True)[:cap]
        keep = em_m[order]
        o_t = (order & (L - 1)).astype(jnp.int32)
        o_slot = (order >> lshift).astype(jnp.int32)
        is_fin = order == L * S
        is_old = o_slot == (w - 1)
        j_win = jnp.where(o_slot < w - 1, o_slot, o_slot - w)
        u = jnp.clip(o_t + 1 + j_win, 0, L + w - 1)
        vxh, vxl = pxh[u], pxl[u]
        vyh, vyl = pyh[u], pyl[u]
        o_t_c = jnp.clip(o_t, 0, L - 1)
        vxh = jnp.where(is_old, pmh[o_t_c], vxh)
        vxl = jnp.where(is_old, pml[o_t_c], vxl)
        vyh = jnp.where(is_old, pmyh[o_t_c], vyh)
        vyl = jnp.where(is_old, pmyl[o_t_c], vyl)
        vxh = jnp.where(is_fin, lastvh, vxh)
        vxl = jnp.where(is_fin, lastvl, vxl)
        vyh = jnp.where(is_fin, lastyh, vyh)
        vyl = jnp.where(is_fin, lastyl, vyl)
        vxh = jnp.where(keep, vxh, U32MAX)
        vxl = jnp.where(keep, vxl, U32MAX)
        vyh = jnp.where(keep, vyh, U32MAX)
        vyl = jnp.where(keep, vyl, U32MAX)
        outx = u32.to_u64(vxh, vxl)
        outy = u32.to_u64(vyh, vyl)
        cur = jnp.sum(em_m.astype(jnp.int32)).astype(jnp.int32)
        return outx, outy, jnp.minimum(cur, cap)

    return jax.vmap(one)(codes, lens, rid)
