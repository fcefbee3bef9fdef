"""Whole-sketch Pallas kernel: one launch instead of ~290.

sketch_jax4's XLA graph compiles to ~290 kernels; on this backend each
op pays ~50-150 us of launch/runtime overhead, so the 0.9 ms of actual
VPU work takes ~15 ms.  This kernel fuses the entire position-aligned
sketch — nt4 validity, k-mer registers, canonical hash, window
newest-min, emission rules, tie folding — into a single launch with
every intermediate in VMEM.

Key trick that makes the kernel embarrassingly parallel: the reference
run-length l (valid bases since the last ambiguous base) is only ever
used clamped to w+k (l>=k, l>=w+k, l==w+k-1, min(l,k)), so it can be
recomputed locally from a (w+k+1)-position halo — no scan, no carry.

Layout: positions on sublanes, reads on lanes (blocks of (L, RB)).
Same emission semantics as sketch_jax4 (fin value parked by the
wrapper at plane slot n_len).  Runs x64-free (see chain_pallas).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sketch_jax4 import META_Q_BITS, SketchPlanes

U32MAX = 0xFFFFFFFF


def _shift_down(x, d, fill):
    """out[i] = x[i-d] along axis 0 (static d), rows < d get fill."""
    if d == 0:
        return x
    L = x.shape[0]
    r = pltpu.roll(x, shift=d, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows >= d, r, fill)


def _make_kernel(L, TL, RB, w, k):
    mask2k = (1 << (2 * k)) - 1
    mhi = (mask2k >> 32) & U32MAX
    mlo = mask2k & U32MAX
    HALO = w + k + 1

    def u32c(v):
        return jnp.uint32(v)

    def shl64(h, l, n):
        if n == 0:
            return h, l
        if n >= 32:
            return (l << u32c(n - 32)) if n > 32 else l, jnp.zeros_like(l)
        return (h << u32c(n)) | (l >> u32c(32 - n)), l << u32c(n)

    def shr64(h, l, n):
        if n == 0:
            return h, l
        if n >= 32:
            return jnp.zeros_like(h), (h >> u32c(n - 32)) if n > 32 else h
        return h >> u32c(n), (l >> u32c(n)) | (h << u32c(32 - n))

    def add64(h1, l1, h2, l2):
        lo = l1 + l2
        carry = (lo < l1).astype(jnp.uint32)
        return h1 + h2 + carry, lo

    def hash64(h, l):
        nh, nl = ~h, ~l
        sh, sl = shl64(h, l, 21)
        h, l = add64(nh, nl, sh, sl)
        h, l = h & u32c(mhi), l & u32c(mlo)
        th, tl = shr64(h, l, 24)
        h, l = h ^ th, l ^ tl
        a3h, a3l = shl64(h, l, 3)
        a8h, a8l = shl64(h, l, 8)
        h2, l2 = add64(h, l, a3h, a3l)
        h, l = add64(h2, l2, a8h, a8l)
        h, l = h & u32c(mhi), l & u32c(mlo)
        th, tl = shr64(h, l, 14)
        h, l = h ^ th, l ^ tl
        a2h, a2l = shl64(h, l, 2)
        a4h, a4l = shl64(h, l, 4)
        h2, l2 = add64(h, l, a2h, a2l)
        h, l = add64(h2, l2, a4h, a4l)
        h, l = h & u32c(mhi), l & u32c(mlo)
        th, tl = shr64(h, l, 28)
        h, l = h ^ th, l ^ tl
        sh, sl = shl64(h, l, 31)
        h, l = add64(h, l, sh, sl)
        return h & u32c(mhi), l & u32c(mlo)

    def lt64(ah, al, bh, bl):
        return (ah < bh) | ((ah == bh) & (al < bl))

    def le64(ah, al, bh, bl):
        return (ah < bh) | ((ah == bh) & (al <= bl))

    W2 = 2 * TL

    def kernel(codes_ref, nlen_ref,
               hh_ref, hl_ref, meta_ref, thh_ref, thl_ref, tmeta_ref,
               finh_ref, finl_ref, finm_ref, nmain_ref, tien_ref):
        UMAX = jnp.uint32(U32MAX)
        i_blk = pl.program_id(1)
        # rows [0, TL) are the previous tile (halo), [TL, 2TL) current
        base = i_blk * jnp.int32(TL) - jnp.int32(TL)
        pos = jax.lax.broadcasted_iota(jnp.int32, (W2, RB), 0) + base
        n_len = nlen_ref[...]                       # (1, RB)
        in_range = (pos >= 0) & (pos < n_len)
        c_raw = codes_ref[0]                        # (2TL, RB) int32
        valid = (c_raw < 4) & in_range
        c = jnp.where(valid, c_raw, 0).astype(jnp.uint32)

        # k-mer registers: kf[i] = sum_d c[i-d] << 2d, kr = revcomp
        zero = jnp.zeros((W2, RB), jnp.uint32)
        kf_hi, kf_lo, kr_hi, kr_lo = zero, zero, zero, zero
        for d in range(k):
            cd = _shift_down(c, d, jnp.uint32(0))
            cdc = cd ^ jnp.uint32(3)
            bf = 2 * d
            if bf < 32:
                kf_lo = kf_lo | (cd << u32c(bf))
            else:
                kf_hi = kf_hi | (cd << u32c(bf - 32))
            br = 2 * (k - 1 - d)
            if br < 32:
                kr_lo = kr_lo | (cdc << u32c(br))
            else:
                kr_hi = kr_hi | (cdc << u32c(br - 32))

        # l: valid positions since the last bad one, exact up to HALO
        # (Mosaic can only rotate 32-bit data, so shift an i32 mask)
        l = jnp.full((W2, RB), HALO, jnp.int32)
        bad_i = (~valid).astype(jnp.int32)
        for j in range(HALO - 1, -1, -1):
            bj = _shift_down(bad_i, j, jnp.int32(1))
            l = jnp.where(bj != 0, j, l)

        z = ~lt64(kf_hi, kf_lo, kr_hi, kr_lo)
        can_h = jnp.where(z, kr_hi, kf_hi)
        can_l = jnp.where(z, kr_lo, kf_lo)
        hh, hl = hash64(can_h, can_l)

        span = jnp.minimum(l, k).astype(jnp.uint32)
        has_info = in_range & valid & (l >= k)
        exh, exl = shl64(hh, hl, 8)
        exl = exl | span
        exh = jnp.where(has_info, exh, UMAX)
        exl = jnp.where(has_info, exl, UMAX)
        emeta = jnp.where(
            has_info,
            (span << u32c(META_Q_BITS + 1))
            | (pos.astype(jnp.uint32) << u32c(1)) | z.astype(jnp.uint32),
            UMAX)

        # windowed newest-min over the last w positions (slot j holds
        # the event at i-(w-1-j); shift by w-1-j)
        def win(a, j, fill):
            return _shift_down(a, w - 1 - j, fill)

        mh, ml = win(exh, 0, UMAX), win(exl, 0, UMAX)
        mym = win(emeta, 0, UMAX)
        mj = jnp.zeros((W2, RB), jnp.int32)
        for j in range(1, w):
            nh, nl = win(exh, j, UMAX), win(exl, j, UMAX)
            take = le64(nh, nl, mh, ml)
            mh = jnp.where(take, nh, mh)
            ml = jnp.where(take, nl, ml)
            mym = jnp.where(take, win(emeta, j, UMAX), mym)
            mj = jnp.where(take, j, mj)
        m_ev = pos - (w - 1) + mj

        pmh = _shift_down(mh, 1, UMAX)
        pml = _shift_down(ml, 1, UMAX)
        pmym = _shift_down(mym, 1, UMAX)
        pme = _shift_down(m_ev, 1, jnp.int32(-1))

        pmv_ok = ~((pmh == UMAX) & (pml == UMAX))
        mval_ok = ~((mh == UMAX) & (ml == UMAX))
        A_cond = le64(exh, exl, pmh, pml)
        B_cond = in_range & ~A_cond & (pme == pos - w)
        emitA = in_range & A_cond & (l >= w + k) & pmv_ok
        emitB = B_cond & (l >= w + k - 1) & pmv_ok

        b_base = B_cond & (l >= w + k - 1) & mval_ok
        fw = in_range & (l == w + k - 1) & pmv_ok
        tie_h = jnp.full((W2, RB), UMAX, jnp.uint32)
        tie_l = jnp.full((W2, RB), UMAX, jnp.uint32)
        tie_m = jnp.full((W2, RB), UMAX, jnp.uint32)
        tie_n = jnp.zeros((W2, RB), jnp.int32)
        tie_fw = jnp.zeros((W2, RB), jnp.bool_)
        for j in range(w):
            wxh_j, wxl_j = win(exh, j, UMAX), win(exl, j, UMAX)
            wym_j = win(emeta, j, UMAX)
            conds = []
            if j < w - 1:
                ftc = fw & (wxh_j == pmh) & (wxl_j == pml) \
                    & (wym_j != pmym)
                conds.append(ftc)
                tie_fw = tie_fw | ftc
            conds.append(b_base & (wxh_j == mh) & (wxl_j == ml)
                         & (wym_j != mym))
            for cond in conds:
                first = cond & (tie_n == 0)
                tie_h = jnp.where(first, wxh_j, tie_h)
                tie_l = jnp.where(first, wxl_j, tie_l)
                tie_m = jnp.where(first, wym_j, tie_m)
                tie_n = tie_n + cond.astype(jnp.int32)

        main_emit = emitA | emitB
        # a first-window tie sharing its trigger with a main emission
        # is ordered tie-BEFORE-main by the reference (sketch.c:84-87);
        # the planes encode main-then-tie, so force the overflow flag
        # (mirrors sketch_jax4)
        tie_n = jnp.where(tie_fw & main_emit, 2, tie_n)
        out_h = jnp.where(main_emit, pmh, UMAX)
        out_l = jnp.where(main_emit, pml, UMAX)
        out_m = jnp.where(main_emit, pmym, UMAX)

        # strip the hash<<8|span packing back to the raw hash pair
        def unpack(oh, ol, om):
            sh, sl = shr64(oh, ol, 8)
            sh = jnp.where(om == UMAX, UMAX, sh)
            sl = jnp.where(om == UMAX, UMAX, sl)
            return sh, sl

        hh_o, hl_o = unpack(out_h, out_l, out_m)
        th_o, tl_o = unpack(tie_h, tie_l, tie_m)
        hh_ref[...] = hh_o[TL:]
        hl_ref[...] = hl_o[TL:]
        meta_ref[...] = out_m[TL:]
        thh_ref[...] = th_o[TL:]
        thl_ref[...] = tl_o[TL:]
        tmeta_ref[...] = tie_m[TL:]

        # fin emission: window-min state at position n_len-1, per lane.
        # At most one row of the CURRENT tile is selected; extract it
        # with a masked i32 sum (Mosaic has no unsigned reductions) and
        # accumulate across position tiles.
        cur = jax.lax.broadcasted_iota(jnp.int32, (W2, RB), 0) >= TL
        last = jnp.maximum(n_len - 1, 0)           # (1, RB)
        sel = (pos == last) & cur

        def pick_row(v):
            vi = pltpu.bitcast(v, jnp.int32)
            s = jnp.sum(jnp.where(sel, vi, 0), axis=0, keepdims=True)
            return pltpu.bitcast(s, jnp.uint32)

        @pl.when(i_blk == 0)
        def _init():
            finh_ref[...] = jnp.zeros((1, RB), jnp.uint32)
            finl_ref[...] = jnp.zeros((1, RB), jnp.uint32)
            finm_ref[...] = jnp.zeros((1, RB), jnp.uint32)
            nmain_ref[...] = jnp.zeros((1, RB), jnp.int32)
            tien_ref[...] = jnp.zeros((1, RB), jnp.int32)

        finh_ref[...] |= pick_row(mh)
        finl_ref[...] |= pick_row(ml)
        finm_ref[...] |= pick_row(mym)

        @pl.when(i_blk == pl.num_programs(1) - 1)
        def _finalize():
            fh, fl = finh_ref[...], finl_ref[...]
            fm = finm_ref[...]
            fsh, fsl = shr64(fh, fl, 8)
            empty = ((fh == UMAX) & (fl == UMAX)) | (n_len <= 0)
            finh_ref[...] = jnp.where(empty, UMAX, fsh)
            finl_ref[...] = jnp.where(empty, UMAX, fsl)
            finm_ref[...] = jnp.where(empty, UMAX, fm)
        nmain_ref[...] += (
            jnp.sum((main_emit & cur).astype(jnp.int32), axis=0,
                    keepdims=True)
            + jnp.sum(((tie_n > 0) & cur).astype(jnp.int32), axis=0,
                      keepdims=True))
        tien_ref[...] = jnp.maximum(
            tien_ref[...],
            jnp.max(jnp.where(cur, tie_n, 0), axis=0, keepdims=True))

    return kernel


def sketch_planes_pallas_traced(codes, lens, w, k, rb=128, tl=128,
                                interpret=False):
    """Traceable whole-sketch path: caller must be x64-free."""
    B, L = codes.shape
    pad_b = (-B) % rb if B >= rb else 0
    if B < rb:
        rb = B  # a full-lane block is always legal
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)), constant_values=4)
        lens = jnp.pad(lens, (0, pad_b))
    codes_t = codes.T.astype(jnp.int32)
    lens_row = lens.astype(jnp.int32)[None, :]
    outs = _sketch_pallas_call(codes_t, lens_row, w, k, rb, tl, interpret)
    sp = _assemble_traced(*outs, lens_row)
    if pad_b:
        sp = SketchPlanes(*(a[:B] for a in sp))
    return sp


@partial(jax.jit, static_argnames=("w", "k", "rb", "tl", "interpret"))
def _sketch_pallas_jit(codes_t, lens_row, w, k, rb, tl, interpret):
    return _sketch_pallas_call(codes_t, lens_row, w, k, rb, tl, interpret)


def _sketch_pallas_call(codes_t, lens_row, w, k, rb, tl, interpret):
    L, B = codes_t.shape
    assert L % tl == 0 and B % rb == 0
    nblk = L // tl
    kernel = _make_kernel(L, tl, rb, w, k)
    # overlapping position windows: block i sees [i*TL - TL, i*TL + TL)
    pad = jnp.full((tl, B), 4, dtype=jnp.int32)  # invalid codes
    xp = jnp.concatenate([pad, codes_t], axis=0)
    x2 = jnp.stack([jax.lax.slice_in_dim(xp, i * tl, i * tl + 2 * tl, axis=0)
                    for i in range(nblk)])        # (nblk, 2TL, B)
    grid = (B // rb, nblk)  # b outer, i inner: counters accumulate per b
    plane = pl.BlockSpec((tl, rb), lambda b, i: (i, b))
    row = pl.BlockSpec((1, rb), lambda b, i: (0, b))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 2 * tl, rb), lambda b, i: (i, 0, b)),
                  row],
        out_specs=[plane] * 6 + [row] * 5,
        out_shape=[jax.ShapeDtypeStruct((L, B), jnp.uint32)] * 6
        + [jax.ShapeDtypeStruct((1, B), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((1, B), jnp.int32)] * 2,
        interpret=interpret,
    )(x2, lens_row)
    return outs


def sketch_planes_pallas(codes, lens, w: int, k: int, rb: int = 128,
                         tl: int = 128, interpret: bool = False
                         ) -> SketchPlanes:
    """sketch_jax4.sketch_planes contract, single-kernel Pallas path.

    codes: (B, L) uint8; lens: (B,) int32.  Odd k; B % rb == 0,
    L % tl == 0, tl >= w + k + 1.
    """
    if k % 2 == 0:
        raise ValueError("sketch_planes_pallas requires odd k")
    if tl < w + k + 1:
        raise ValueError("tile smaller than the halo")
    B, L = codes.shape
    while B % rb:
        rb //= 2
    prev = jax.config.jax_enable_x64
    if prev:
        jax.config.update("jax_enable_x64", False)
    try:
        codes_t = codes.T.astype(jnp.int32)
        lens_row = lens.astype(jnp.int32)[None, :]
        (hh, hl, meta, thh, thl, tmeta,
         finh, finl, finm, nmain, tien) = _sketch_pallas_jit(
            codes_t, lens_row, w, k, rb, tl, interpret)
        return _assemble(hh, hl, meta, thh, thl, tmeta,
                         finh, finl, finm, nmain, tien, lens_row)
    finally:
        if prev:
            jax.config.update("jax_enable_x64", True)


@jax.jit
def _assemble(hh, hl, meta, thh, thl, tmeta, finh, finl, finm,
              nmain, tien, lens_row):
    return _assemble_traced(hh, hl, meta, thh, thl, tmeta, finh, finl,
                            finm, nmain, tien, lens_row)


def _assemble_traced(hh, hl, meta, thh, thl, tmeta, finh, finl, finm,
                     nmain, tien, lens_row):
    """Transpose to (B, L+1) planes and park fin at slot n_len."""
    UMAX = jnp.uint32(U32MAX)
    L, B = hh.shape

    def widen(a, fill):
        return jnp.concatenate(
            [a.T, jnp.full((B, 1), fill, a.dtype)], axis=1)

    slot = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
    at_fin = slot == lens_row.T  # (B, L+1)
    hh_p = jnp.where(at_fin, finh.T, widen(hh, UMAX))
    hl_p = jnp.where(at_fin, finl.T, widen(hl, UMAX))
    meta_p = jnp.where(at_fin, finm.T, widen(meta, UMAX))
    n = nmain[0] + (finm[0] != UMAX).astype(jnp.int32)
    overflow = tien[0] > 1
    return SketchPlanes(hh=hh_p, hl=hl_p, meta=meta_p,
                        t_hh=widen(thh, UMAX), t_hl=widen(thl, UMAX),
                        t_meta=widen(tmeta, UMAX),
                        n=n, overflow=overflow)
