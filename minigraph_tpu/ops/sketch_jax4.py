"""Position-aligned minimizer sketch: no compaction, no sorts, no gathers.

Emission semantics match sketch.c:56-109 for ODD k — every minigraph
preset uses k in {17, 19, 21}, and for odd k a canonical k-mer can
never equal its reverse complement (the middle base flips), so the
reference's symmetric-k-mer skip (sketch.c:74) never fires and the
event stream IS the position stream.  Instead of compacting emissions
into a dense (cap,) list — a batched 45k-element sort plus decode
gathers that dominate the device profile — emissions stay AT the
position that triggered them:

  plane 0 (main): the A/B-rule old-minimum emitted at position t
  plane 1 (tie):  the first tie emitted at position t (B-rescan or
                  first-window ties)
  fin scalars:    the end-of-read state emission
  overflow flag:  true when some position emits >= 2 ties; such reads
                  must be re-sketched by the exact compacting path
                  (sketch_jax2) or the host.  Ties need equal 34-bit+
                  hashes inside one window, so overflow is rare outside
                  extreme tandem repeats.

Outputs are uint32 planes: the minimizer hash as a (hi, lo) pair and a
packed meta word span<<26 | qpos<<1 | strand.  Downstream (the anchor
join) consumes planes directly; nothing ever materializes a ragged
list on device.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import u32

U32 = jnp.uint32
U32MAX = jnp.uint32(0xFFFFFFFF)

META_Q_BITS = 25  # qpos field width; reads up to 32 Mb


class SketchPlanes(NamedTuple):
    """Position-aligned sketch output (all (B, L+1) except scalars)."""
    hh: jnp.ndarray      # minimizer hash hi (U32MAX = empty slot)
    hl: jnp.ndarray      # minimizer hash lo
    meta: jnp.ndarray    # span<<26 | qpos<<1 | strand
    t_hh: jnp.ndarray    # tie plane hash hi
    t_hl: jnp.ndarray
    t_meta: jnp.ndarray
    n: jnp.ndarray       # (B,) emission count
    overflow: jnp.ndarray  # (B,) bool: >=2 ties at one position


def _pack_meta(span, qpos, z):
    return (span.astype(U32) << U32(META_Q_BITS + 1)) \
        | (qpos.astype(U32) << U32(1)) | z.astype(U32)


@partial(jax.jit, static_argnames=("w", "k"))
def sketch_planes(codes, lens, w: int, k: int) -> SketchPlanes:
    """Batched exact minimizer sketch to position-aligned planes.

    codes: (B, L) uint8 nt4 codes; lens: (B,) int32.  Odd k only.
    """
    if k % 2 == 0:
        raise ValueError("sketch_planes requires odd k")
    B, L = codes.shape
    if L >= 1 << META_Q_BITS:
        raise ValueError("read length exceeds meta qpos field")
    mask2k = (1 << (2 * k)) - 1

    def one(code_row, n_len):
        pos = jnp.arange(L, dtype=jnp.int32)
        in_range = pos < n_len
        valid = (code_row < 4) & in_range
        c = jnp.where(valid, code_row, 0).astype(U32)

        def shift_pos(a, d):
            if d == 0:
                return a
            return jnp.concatenate([jnp.zeros(d, dtype=a.dtype), a[: L - d]])

        kf_hi = jnp.zeros(L, dtype=U32)
        kf_lo = jnp.zeros(L, dtype=U32)
        kr_hi = jnp.zeros(L, dtype=U32)
        kr_lo = jnp.zeros(L, dtype=U32)
        for d in range(k):
            cd = shift_pos(c, d)
            cdc = cd ^ U32(3)
            bf = 2 * d
            if bf < 32:
                kf_lo = kf_lo | (cd << U32(bf))
            else:
                kf_hi = kf_hi | (cd << U32(bf - 32))
            br = 2 * (k - 1 - d)
            if br < 32:
                kr_lo = kr_lo | (cdc << U32(br))
            else:
                kr_hi = kr_hi | (cdc << U32(br - 32))

        last_bad = jax.lax.associative_scan(
            jnp.maximum, jnp.where(valid, -1, pos))
        l = jnp.where(last_bad >= 0, pos - last_bad, pos + 1)

        z = jnp.logical_not(u32.lt(kf_hi, kf_lo, kr_hi, kr_lo))
        can_h, can_l = u32.select(z, kr_hi, kr_lo, kf_hi, kf_lo)
        hh, hl = u32.hash64(can_h, can_l, mask2k)

        span = jnp.minimum(l, k).astype(U32)
        has_info = in_range & valid & (l >= k)
        # event key ex = hash<<8|span keeps the reference comparison
        # order; hash pair (hh, hl) rides along for the join output.
        exh, exl = u32.shl(hh, hl, 8)
        exl = exl | span
        exh = jnp.where(has_info, exh, U32MAX)
        exl = jnp.where(has_info, exl, U32MAX)
        emeta = jnp.where(has_info, _pack_meta(span, pos, z), U32MAX)

        pxh = jnp.concatenate([jnp.full(w, U32MAX, dtype=U32), exh])
        pxl = jnp.concatenate([jnp.full(w, U32MAX, dtype=U32), exl])
        pym = jnp.concatenate([jnp.full(w, U32MAX, dtype=U32), emeta])

        def win(a, j):
            return a[j + 1: j + 1 + L]

        mh, ml = win(pxh, 0), win(pxl, 0)
        mym = win(pym, 0)
        mj = jnp.zeros(L, dtype=jnp.int32)
        for j in range(1, w):
            nh, nl = win(pxh, j), win(pxl, j)
            take = u32.le(nh, nl, mh, ml)
            mh = jnp.where(take, nh, mh)
            ml = jnp.where(take, nl, ml)
            mym = jnp.where(take, win(pym, j), mym)
            mj = jnp.where(take, j, mj)
        t = pos
        m_ev = t - w + 1 + mj

        def prev(a, fill):
            return jnp.concatenate([jnp.full(1, fill, dtype=a.dtype),
                                    a[:-1]])

        pmh, pml = prev(mh, U32MAX), prev(ml, U32MAX)
        pmym = prev(mym, U32MAX)
        pme = prev(m_ev, jnp.int32(-1))

        pmv_ok = ~u32.eq(pmh, pml, U32MAX, U32MAX)
        mval_ok = ~u32.eq(mh, ml, U32MAX, U32MAX)
        in_ev = in_range
        A_cond = u32.le(exh, exl, pmh, pml)
        B_cond = in_ev & ~A_cond & (pme == t - w)
        emitA = in_ev & A_cond & (l >= w + k) & pmv_ok
        emitB = B_cond & (l >= w + k - 1) & pmv_ok

        b_base = B_cond & (l >= w + k - 1) & mval_ok
        fw = in_ev & (l == w + k - 1) & pmv_ok
        # fold the (2w-1) tie slots into (first-tie, tie-count) planes
        tie_h = jnp.full(L, U32MAX, dtype=U32)
        tie_l = jnp.full(L, U32MAX, dtype=U32)
        tie_m = jnp.full(L, U32MAX, dtype=U32)
        tie_n = jnp.zeros(L, dtype=jnp.int32)
        tie_fw = jnp.zeros(L, dtype=bool)

        def add_tie(cond, vh, vl, vm, th, tl, tm, tn):
            first = cond & (tn == 0)
            th = jnp.where(first, vh, th)
            tl = jnp.where(first, vl, tl)
            tm = jnp.where(first, vm, tm)
            return th, tl, tm, tn + cond.astype(jnp.int32)

        for j in range(w):
            wxh_j, wxl_j = win(pxh, j), win(pxl, j)
            wym_j = win(pym, j)
            if j < w - 1:
                ft = fw & u32.eq(wxh_j, wxl_j, pmh, pml) & (wym_j != pmym)
                tie_h, tie_l, tie_m, tie_n = add_tie(
                    ft, wxh_j, wxl_j, wym_j, tie_h, tie_l, tie_m, tie_n)
                tie_fw = tie_fw | ft
            bt = b_base & u32.eq(wxh_j, wxl_j, mh, ml) & (wym_j != mym)
            tie_h, tie_l, tie_m, tie_n = add_tie(
                bt, wxh_j, wxl_j, wym_j, tie_h, tie_l, tie_m, tie_n)

        main_emit = emitA | emitB
        out_h = jnp.where(main_emit, pmh, U32MAX)
        out_l = jnp.where(main_emit, pml, U32MAX)
        out_m = jnp.where(main_emit, pmym, U32MAX)

        # final state emission parked at free slot n_len (plane width L+1)
        last_i = jnp.maximum(n_len - 1, 0)
        fin_ok = (n_len > 0) & ~u32.eq(mh[last_i], ml[last_i],
                                       U32MAX, U32MAX)
        pad_h = jnp.where(fin_ok, mh[last_i], U32MAX)[None]
        pad_l = jnp.where(fin_ok, ml[last_i], U32MAX)[None]
        pad_m = jnp.where(fin_ok, mym[last_i], U32MAX)[None]
        slot = jnp.arange(L + 1, dtype=jnp.int32)
        at_fin = slot == n_len
        umax1 = jnp.full(1, U32MAX, dtype=U32)
        # NB: the widening slot L must stay EMPTY unless n_len == L,
        # otherwise short reads emit the fin minimizer twice
        out_h = jnp.where(at_fin, pad_h, jnp.concatenate([out_h, umax1]))
        out_l = jnp.where(at_fin, pad_l, jnp.concatenate([out_l, umax1]))
        out_m = jnp.where(at_fin, pad_m, jnp.concatenate([out_m, umax1]))
        zpad = jnp.full(1, U32MAX, dtype=U32)
        tie_h = jnp.concatenate([tie_h, zpad])
        tie_l = jnp.concatenate([tie_l, zpad])
        tie_m = jnp.concatenate([tie_m, zpad])

        n = jnp.sum(main_emit.astype(jnp.int32)) \
            + jnp.sum(jnp.minimum(tie_n, 1)) + fin_ok.astype(jnp.int32)
        # A first-window tie sharing its trigger with a main (B-rule)
        # emission is emitted BEFORE the main record by the reference
        # (sketch.c:84-87 runs before the A/B block) — the planes encode
        # main-then-tie, so emission ORDER would be wrong; flag it.
        overflow = jnp.any(tie_n > 1) | jnp.any(tie_fw & main_emit)
        # strip the ex-packing: planes carry the raw hash pair
        hh_o, hl_o = u32.shr(out_h, out_l, 8)
        hh_o = jnp.where(out_m == U32MAX, U32MAX, hh_o)
        hl_o = jnp.where(out_m == U32MAX, U32MAX, hl_o)
        th_o, tl_o = u32.shr(tie_h, tie_l, 8)
        th_o = jnp.where(tie_m == U32MAX, U32MAX, th_o)
        tl_o = jnp.where(tie_m == U32MAX, U32MAX, tl_o)
        return hh_o, hl_o, out_m, th_o, tl_o, tie_m, n, overflow

    outs = jax.vmap(one)(codes, lens)
    return SketchPlanes(*outs)
