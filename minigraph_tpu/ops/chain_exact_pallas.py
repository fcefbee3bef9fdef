"""Exact-or-flag linear-chaining DP as a single Pallas launch.

Same construction as ops/chain_exact.lchain_dp_exact_win — the
byte-parity DP fill of mg_lchain_dp (lchain.c:165-207) with the
over-approximate skip-break emulation and max_ii candidate — but with
the sliding anchor window resident in VMEM.  The XLA windowed scan
pays per-op launch overhead for every one of its N sequential steps
(~35 us x 4096 anchors ~= 145 ms per 16-read long batch); here the
whole anchor loop runs on-core, which is what makes a window wide
enough for 15 kb reads (W=768 covers the measured p100 scan reach of
~524 on MHC-class graphs) affordable.

Layout: anchors on sublanes, reads on lanes.  A (W+T, B) buffer holds
the last W anchors plus the T-anchor tile being processed; row r of
grid step a is global anchor jg = a*T - W + r.  Between grid steps the
buffer shifts down by T (VMEM copy).  The skip-break sureness test is
scan-free (round 5): the floor-at-zero skip counter is bounded by the
count of valid&marked&not-certainly-new rows above a position, so one
masked sum replaces the three log-depth suffix scans the break-position
emulation needed (measured: identical 0% flag rate on the 16 kb MHC
workload, ~threefold fewer VPU ops per anchor step).

Flag semantics are identical to the XLA kernel at the same (W, T):
`sure[b]` is True only when every step's (f, p) provably equals the
reference's; a larger T only widens the usable sub-window (rows below
W are candidates exactly as the XLA slice's are), never changes
results for sure reads.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain_pallas import _mg_log2

NEG_BIG = -0x3FFFFFFF
U32MAX = 0xFFFFFFFF
I32 = jnp.int32


def _make_kernel(W, T, B, mdx, mdy, bw, max_skip, max_iter,
                 pen_gap, pen_skip):
    H = W + T
    # the max_iter clamp can only bind inside the buffer when the
    # buffer is deeper than the clamp (never for the production lr
    # window of 5000); fold it out statically when it cannot
    iter_binds = max_iter < H

    def kernel(nmax_ref, n_ref, xh_ref, tp_ref, qp_ref, sp_ref,
               f_ref, p_ref, unc_ref,
               wh, wtp, wqp, wsp, wf, wcnt, mst):
        a = pl.program_id(0)
        # grid steps beyond every read's anchor count do nothing the
        # host ever reads (outputs are consumed only below n_a); skip
        # them — real batches fill acap ~50%, so this halves the work.
        # Step 0 always runs (scratch init + the unc output write).
        run = (a == 0) | (a * jnp.int32(T) < nmax_ref[0])
        base = a * jnp.int32(T) - jnp.int32(W)
        jg = base + jax.lax.broadcasted_iota(I32, (H, B), 0)
        n = n_ref[0:1, :]

        @pl.when((a == 0) & run)
        def _init():
            wh[...] = jnp.full((H, B), U32MAX, dtype=jnp.uint32)
            wtp[...] = jnp.zeros((H, B), dtype=I32)
            wqp[...] = jnp.zeros((H, B), dtype=I32)
            wsp[...] = jnp.zeros((H, B), dtype=I32)
            wf[...] = jnp.full((H, B), NEG_BIG, dtype=I32)
            wcnt[...] = jnp.zeros((H, B), dtype=I32)
            # per-read scalars: max_ii / f_mii / uncertain
            mst[0:1, :] = jnp.full((1, B), -1, dtype=I32)
            mst[1:2, :] = jnp.zeros((1, B), dtype=I32)
            mst[2:3, :] = jnp.zeros((1, B), dtype=I32)

        @pl.when((a > 0) & run)
        def _shift():
            wh[0:W, :] = wh[T:H, :]
            wtp[0:W, :] = wtp[T:H, :]
            wqp[0:W, :] = wqp[T:H, :]
            wsp[0:W, :] = wsp[T:H, :]
            wf[0:W, :] = wf[T:H, :]
            wcnt[0:W, :] = wcnt[T:H, :]
            # cnt is additive: the incoming tile's rows must start at 0
            wcnt[W:H, :] = jnp.zeros((T, B), dtype=I32)

        def body(t, _):
            i = a * jnp.int32(T) + t
            xh_i = xh_ref[pl.ds(t, 1), :]           # (1, B)
            tp_i = tp_ref[pl.ds(t, 1), :]
            qp_i = qp_ref[pl.ds(t, 1), :]
            sp_i = sp_ref[pl.ds(t, 1), :]
            active = i < n                          # (1, B)
            max_ii = mst[0:1, :]
            f_mii = mst[1:2, :]
            unc = mst[2:3, :]

            before = jg < i
            cand = (wh[...] == xh_i) \
                & (pltpu.bitcast(tp_i - wtp[...], jnp.uint32)
                   <= jnp.uint32(mdx))
            mask_dist = cand & before
            overflow = mask_dist[0:1, :]
            if iter_binds:
                win = mask_dist & (jg >= i - jnp.int32(max_iter))
            else:
                win = mask_dist
            st_dist = i - jnp.sum(mask_dist.astype(I32), axis=0,
                                  keepdims=True)
            st_win = i - jnp.sum(win.astype(I32), axis=0, keepdims=True)

            # comput_sc (lchain.c:115-140), vectorized over the buffer
            dq = qp_i - wqp[...]
            dr = tp_i - wtp[...]
            bad = (dq <= 0) | (dq > jnp.int32(mdx)) | (dr == 0) \
                | (dq > jnp.int32(mdy))
            dd = jnp.abs(dr - dq)
            bad |= dd > jnp.int32(bw)
            dg = jnp.minimum(dr, dq)
            sc = jnp.minimum(wsp[...], dg)
            lin = jnp.float32(pen_gap) * dd.astype(jnp.float32) \
                + jnp.float32(pen_skip) * dg.astype(jnp.float32)
            logp = jnp.where(dd >= 1,
                             _mg_log2((dd + 1).astype(jnp.float32)),
                             jnp.float32(0.0))
            pen = (lin + jnp.float32(0.5) * logp).astype(I32)
            sc = sc - jnp.where((dd != 0) | (dg > wsp[...]), pen, 0)
            valid0 = jnp.logical_not(bad)
            valid = valid0 & win
            sc_tot = jnp.where(valid, sc + wf[...], jnp.int32(NEG_BIG))

            # full-window max; ties -> largest j (first processed)
            M = jnp.max(sc_tot, axis=0, keepdims=True)
            idx = jnp.max(jnp.where((sc_tot == M) & valid, jg,
                                    jnp.int32(-1)), axis=0, keepdims=True)
            best = M > sp_i

            # scan-free skip-break test (round 5; replaces the three
            # log-depth suffix scans of the jb emulation): the
            # floor-at-zero skip counter at any row is bounded by the
            # number of +1-capable rows above it, and +1 rows are
            # always valid & marked & not-new.  Only the argmax row is
            # certainly new (everything above it scores < M), so
            # counting valid&marked rows above a position x gives a
            # conservative break test: count <= max_skip => no break
            # can fire above x => the scan provably reaches x.
            # Measured on the 16 kb MHC workload: 0/88207 anchors
            # flag (tools_scan_stats.py), same as the jb emulation.
            marked = wcnt[...] > 0
            splus = (valid & marked
                     & jnp.logical_not((jg == idx) & best)).astype(I32)
            cnt_above_idx = jnp.sum(jnp.where(jg > idx, splus, 0),
                                    axis=0, keepdims=True)

            max_f = jnp.where(best, M, sp_i)
            max_j = jnp.where(best, idx, jnp.int32(-1))
            step_unc = (best & (cnt_above_idx > jnp.int32(max_skip))) \
                | overflow

            # max_ii long-range candidate (lchain.c:191-198)
            stale = (max_ii < 0) | (max_ii < st_dist)
            fmsk = jnp.where(win, wf[...], jnp.int32(NEG_BIG))
            Mf = jnp.max(fmsk, axis=0, keepdims=True)
            idx_f = jnp.max(jnp.where((fmsk == Mf) & win, jg,
                                      jnp.int32(-1)), axis=0,
                            keepdims=True)
            any_win = idx_f >= 0
            max_ii = jnp.where(stale, idx_f, max_ii)
            f_mii = jnp.where(stale, jnp.where(any_win, Mf,
                                               jnp.int32(0)), f_mii)

            has_mii = max_ii >= 0
            mii_row = jg == max_ii
            tmp = jnp.max(jnp.where(mii_row & valid0, sc,
                                    jnp.int32(NEG_BIG)), axis=0,
                          keepdims=True)
            cand_ok = has_mii & (tmp > jnp.int32(NEG_BIG))
            delta = cand_ok & (max_f < tmp + f_mii)
            fire_sure = has_mii & (max_ii < st_win - 1)
            # conservative analog of `has_break & (max_ii < jb)`: a
            # break above max_ii needs > max_skip +1-capable rows there
            cnt_above_mii = jnp.sum(jnp.where(jg > max_ii, splus, 0),
                                    axis=0, keepdims=True)
            fire_maybe = has_mii & jnp.logical_not(fire_sure) \
                & (cnt_above_mii > jnp.int32(max_skip))
            apply = fire_sure & delta
            step_unc = step_unc | (fire_maybe & delta)
            f_i = jnp.where(apply, tmp + f_mii, max_f)
            p_i = jnp.where(apply, max_ii, max_j)

            upd = (max_ii < 0) | (f_mii < f_i)
            mst[0:1, :] = jnp.where(active & upd, i, max_ii)
            mst[1:2, :] = jnp.where(active & upd, f_i, f_mii)
            mst[2:3, :] = unc | (step_unc & active).astype(I32)

            f_ref[pl.ds(t, 1), :] = jnp.where(active, f_i, 0)
            p_ref[pl.ds(t, 1), :] = jnp.where(active, p_i,
                                              jnp.int32(-1))

            # child mark at the parent row (cnt, lchain.c t[] analog)
            wcnt[...] = wcnt[...] + ((jg == p_i) & (p_i >= 0)
                                     & active).astype(I32)
            tw = t + jnp.int32(W)
            wh[pl.ds(tw, 1), :] = xh_i
            wtp[pl.ds(tw, 1), :] = tp_i
            wqp[pl.ds(tw, 1), :] = qp_i
            wsp[pl.ds(tw, 1), :] = sp_i
            wf[pl.ds(tw, 1), :] = f_i
            return jnp.int32(0)

        # skipped steps run the loop zero times (a dynamic trip count
        # instead of a pl.when region: the conditional region forced
        # an extra VMEM copy of the live window scratch, blowing the
        # 16 MB scoped-vmem limit at the 2 kb bucket's B=256)
        jax.lax.fori_loop(jnp.int32(0),
                          jnp.where(run, jnp.int32(T), jnp.int32(0)),
                          body, jnp.int32(0))

        # skipped blocks still get deterministic padding (f=0, p=-1,
        # matching lchain_dp_exact_win's contract for rows >= n_a) —
        # Pallas outputs are not zero-initialized, so leaving them
        # unwritten would return garbage above max(n_a)
        @pl.when(jnp.logical_not(run))
        def _pad():
            f_ref[...] = jnp.zeros((T, B), dtype=I32)
            p_ref[...] = jnp.full((T, B), -1, dtype=I32)

        unc_ref[0:1, :] = mst[2:3, :]

    return kernel


def chain_exact_pallas_traced(axh, axl, ayh, ayl, n_a, mdx, mdy, bw,
                              max_skip, max_iter, pen_gap, pen_skip,
                              window, tile, interpret=False):
    """Traceable core: (B, A) u32 planes -> (f, p, sure).  Must be
    traced with jax_enable_x64 off (compose under an x64-free jit)."""
    B, A = axh.shape
    W, T = window, tile
    assert A % T == 0 and W % 8 == 0
    xh = axh.T
    tp = axl.view(I32).T
    qp = ayl.view(I32).T
    sp = (ayh & jnp.uint32(0xFF)).view(I32).T
    nrow = jnp.broadcast_to(n_a.astype(I32)[None, :], (8, B))
    nmax = jnp.max(n_a.astype(I32)).reshape(1)

    kernel = _make_kernel(W, T, B, mdx, mdy, bw, max_skip, max_iter,
                          pen_gap, pen_skip)
    f, p, unc = pl.pallas_call(
        kernel,
        grid=(A // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, B), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, B), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, B), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, B), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, B), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, B), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, B), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((A, B), I32),
                   jax.ShapeDtypeStruct((A, B), I32),
                   jax.ShapeDtypeStruct((1, B), I32)],
        scratch_shapes=[
            pltpu.VMEM((W + T, B), jnp.uint32),   # wh
            pltpu.VMEM((W + T, B), I32),          # wtp
            pltpu.VMEM((W + T, B), I32),          # wqp
            pltpu.VMEM((W + T, B), I32),          # wsp
            pltpu.VMEM((W + T, B), I32),          # wf
            pltpu.VMEM((W + T, B), I32),          # wcnt
            pltpu.VMEM((8, B), I32),              # mst (max_ii/f_mii/unc)
        ],
        interpret=interpret,
    )(nmax, nrow, xh, tp, qp, sp)
    return f.T, p.T, jnp.logical_not(unc[0].astype(bool))


@partial(jax.jit, static_argnames=("mdx", "mdy", "bw", "max_skip",
                                   "max_iter", "pen_gap", "pen_skip",
                                   "window", "tile", "interpret"))
def _chain_exact_jit(axh, axl, ayh, ayl, n_a, mdx, mdy, bw, max_skip,
                     max_iter, pen_gap, pen_skip, window, tile,
                     interpret):
    return chain_exact_pallas_traced(axh, axl, ayh, ayl, n_a, mdx, mdy,
                                     bw, max_skip, max_iter, pen_gap,
                                     pen_skip, window, tile, interpret)


def lchain_dp_exact_pallas(axh, axl, ayh, ayl, n_a, mdx: int, mdy: int,
                           bw: int, max_skip: int, max_iter: int,
                           pen_gap: float, pen_skip: float,
                           window: int = 768, tile: int = 128,
                           interpret: bool = False):
    """u32-plane front end: (B, A) planes -> (f, p, sure).

    Contract of chain_exact.lchain_dp_exact_win minus the unused v
    array; runs x64-free (the axon remote compiler rejects Pallas
    under x64, see chain_pallas.py).
    """
    prev = jax.config.jax_enable_x64
    if prev:
        jax.config.update("jax_enable_x64", False)
    try:
        return _chain_exact_jit(axh, axl, ayh, ayl, n_a, int(mdx),
                                int(mdy), int(bw), int(max_skip),
                                int(max_iter), float(pen_gap),
                                float(pen_skip), window, tile, interpret)
    finally:
        if prev:
            jax.config.update("jax_enable_x64", True)
