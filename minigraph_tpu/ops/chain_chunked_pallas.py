"""Chunked-walk linear-chaining DP: the round-5 chain formulation.

Same contract as chain_exact_pallas (exact-or-flag vs mg_lchain_dp,
lchain.c:149-219) but the per-anchor evaluation mirrors what the
reference actually DOES instead of evaluating the whole window:

  * measured on the 16 kb MHC workload (tools_scan_stats.py), the
    reference's inner scan processes a mean of 25.9 rows (p99 38)
    before the skip break fires, while the x-distance window spans a
    mean of 277 rows (p99 505).  The full-window kernels pay the p99
    window for every anchor.
  * here each anchor evaluates the top TOP rows of the window and
    walks deeper 64-row blocks only while a cheap bound says a deeper
    row could still win: sc <= q_span <= 31 (the 5-bit span plane),
    so a block with max f <= best - 31 is unbeatable-by-construction.
    Per-tile block maxima of f over the frozen window region make the
    bound one scalar-indexed read per block; measured lane-max walk
    depth is 1.94 blocks of 64 (sim over 64 reads).
  * ties lose to larger j, so stopping at `bound <= best` is exact
    (a deeper equal-scoring row can never be the reference's pick).

The max_ii long-range candidate (lchain.c:191-198) is dropped — not
approximated: it exists to rescue candidates the SKIP BREAK truncated,
and this kernel's sureness test already proves the scan reached the
full-window argmax (count of valid&marked rows above it <= max_skip),
which makes the reference's truncated maximum equal the full-window
maximum; an in-window cache row is part of that maximum, so the
candidate can never change a sure lane's result.  This requires the
iteration clamp to never bind inside the buffer (max_iter >= W + T —
true for the lr preset's 5000 vs the 768-row window); the builder
asserts it and DeviceFront falls back to the full-window kernel
otherwise.

Flag semantics: a lane is sure only when (a) its window stayed inside
the W-row buffer, and (b) no skip break could fire above the window
argmax.  Identical contract to the other chain kernels; a flagged
read reruns on the exact host DP.
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
BLK = 64          # deep-walk block rows
TOP = 128         # always-evaluated top rows (covers every row the
                  # current tile has written: t < T <= TOP)


def _make_kernel(W, T, B, mdx, mdy, bw, max_skip, pen_gap, pen_skip):
    H = W + T
    NB = W // BLK                 # deep blocks cover rows [0, W)

    def kernel(nmax_ref, n_ref, xh_ref, tp_ref, qp_ref, sp_ref,
               f_ref, p_ref, unc_ref,
               wh, wtp, wqp, wsp, wf, wcnt, pmf, pml, wst):
        a = pl.program_id(0)
        run = (a == 0) | (a * jnp.int32(T) < nmax_ref[0])
        n = n_ref[0:1, :]

        @pl.when((a == 0) & run)
        def _init():
            wh[...] = jnp.full((H, B), U32MAX, dtype=jnp.uint32)
            wtp[...] = jnp.zeros((H, B), dtype=I32)
            wqp[...] = jnp.zeros((H, B), dtype=I32)
            wsp[...] = jnp.zeros((H, B), dtype=I32)
            wf[...] = jnp.full((H, B), NEG_BIG, dtype=I32)
            wcnt[...] = jnp.zeros((H, B), dtype=I32)

        @pl.when((a > 0) & run)
        def _shift():
            wh[0:W, :] = wh[T:H, :]
            wtp[0:W, :] = wtp[T:H, :]
            wqp[0:W, :] = wqp[T:H, :]
            wsp[0:W, :] = wsp[T:H, :]
            wf[0:W, :] = wf[T:H, :]
            wcnt[0:W, :] = wcnt[T:H, :]
            wcnt[W:H, :] = jnp.zeros((T, B), dtype=I32)

        # per-tile, per-lane block maxima of f over the frozen window
        # region [0, W), masked to the tile's first/last anchor
        # vertices; prefix maxima land in VMEM scratch so the deep
        # walk reads one dynamic row.  Computed unconditionally (the
        # buffers are initialized from step 0, and a pl.when region
        # would force a VMEM copy of the window scratch).
        xh_first = xh_ref[0:1, :]
        xh_last = xh_ref[T - 1:T, :]
        m1 = jnp.where(wh[0:W, :] == xh_first, wf[0:W, :],
                       jnp.int32(NEG_BIG))
        m2 = jnp.where(wh[0:W, :] == xh_last, wf[0:W, :],
                       jnp.int32(NEG_BIG))
        run1 = jnp.full((1, B), NEG_BIG, dtype=I32)
        run2 = jnp.full((1, B), NEG_BIG, dtype=I32)
        for b in range(NB):
            run1 = jnp.maximum(run1, jnp.max(
                m1[b * BLK:(b + 1) * BLK, :], axis=0, keepdims=True))
            run2 = jnp.maximum(run2, jnp.max(
                m2[b * BLK:(b + 1) * BLK, :], axis=0, keepdims=True))
            pmf[b:b + 1, :] = run1
            pml[b:b + 1, :] = run2

        if True:
            def body(t, _):
                i = a * jnp.int32(T) + t
                xh_i = xh_ref[pl.ds(t, 1), :]
                tp_i = tp_ref[pl.ds(t, 1), :]
                qp_i = qp_ref[pl.ds(t, 1), :]
                sp_i = sp_ref[pl.ds(t, 1), :]
                active = i < n
                tw = t + jnp.int32(W)

                # window deeper than the buffer => flag (bound tables
                # only cover buffer rows)
                overflow = (wh[0:1, :] == xh_i) \
                    & (pltpu.bitcast(tp_i - wtp[0:1, :], jnp.uint32)
                       <= jnp.uint32(mdx))

                def eval_rows(sh, stp, sqp, ssp, sf, scnt, jg, jcap):
                    """One chunk: comput_sc + window masks.  jcap caps
                    the rows (deep blocks exclude rows the top chunk
                    already evaluated: jg < i - TOP)."""
                    before = jg < jcap
                    cand = (sh == xh_i) \
                        & (pltpu.bitcast(tp_i - stp, jnp.uint32)
                           <= jnp.uint32(mdx)) & before
                    dq = qp_i - sqp
                    dr = tp_i - stp
                    bad = (dq <= 0) | (dq > jnp.int32(mdx)) \
                        | (dr == 0) | (dq > jnp.int32(mdy))
                    dd = jnp.abs(dr - dq)
                    bad |= dd > jnp.int32(bw)
                    dg = jnp.minimum(dr, dq)
                    sc = jnp.minimum(ssp, dg)
                    lin = jnp.float32(pen_gap) * dd.astype(jnp.float32) \
                        + jnp.float32(pen_skip) * dg.astype(jnp.float32)
                    logp = jnp.where(
                        dd >= 1, _mg_log2((dd + 1).astype(jnp.float32)),
                        jnp.float32(0.0))
                    pen = (lin + jnp.float32(0.5) * logp).astype(I32)
                    sc = sc - jnp.where((dd != 0) | (dg > ssp), pen, 0)
                    valid = jnp.logical_not(bad) & cand
                    sc_tot = jnp.where(valid, sc + sf,
                                       jnp.int32(NEG_BIG))
                    splus = (valid & (scnt > 0)).astype(I32)
                    return sc_tot, valid, splus, cand

                # ---- top chunk: rows [tw-TOP, tw) ----
                t0 = tw - jnp.int32(TOP)
                jg_top = (i - jnp.int32(TOP)) \
                    + jax.lax.broadcasted_iota(I32, (TOP, B), 0)
                sc_tot, valid, splus, cand_t = eval_rows(
                    wh[pl.ds(t0, TOP), :], wtp[pl.ds(t0, TOP), :],
                    wqp[pl.ds(t0, TOP), :], wsp[pl.ds(t0, TOP), :],
                    wf[pl.ds(t0, TOP), :], wcnt[pl.ds(t0, TOP), :],
                    jg_top, i)
                M = jnp.max(sc_tot, axis=0, keepdims=True)
                idx = jnp.max(jnp.where((sc_tot == M) & valid, jg_top,
                                        jnp.int32(-1)), axis=0,
                              keepdims=True)
                cnt_seen = jnp.sum(splus, axis=0, keepdims=True)
                cnt_above = jnp.sum(
                    jnp.where(jg_top > idx, splus, 0), axis=0,
                    keepdims=True)
                # window may continue below the top chunk only if the
                # chunk's bottom row is still in-window (contiguity:
                # same-vertex rows are contiguous and x ascends, so a
                # non-candidate bottom row proves nothing deeper can
                # be in-window)
                deeper = cand_t[0:1, :] & active

                vmatch1 = xh_i == xh_first
                vmatch2 = xh_i == xh_last
                # topmost block holding rows below the top chunk
                # (rows >= t0 inside it are re-masked via jcap)
                bstart = (jnp.int32(W - TOP - 1) + t) // jnp.int32(BLK)

                # the deep-walk state vectors live in scratch memory
                # (wst rows: 0=M, 1=idx, 2=cnt_seen, 3=cnt_above,
                # 4=going) and only the scalar block index rides the
                # while carry: an scf.while with vector carries trips
                # a Mosaic layout-unification failure (the keepdims
                # reductions produce replicated {*,0} sublane offsets
                # that the body's yields can't match), and a memory
                # round-trip gives every iteration a canonical layout.
                wst[0:1, :] = M
                wst[1:2, :] = idx
                wst[2:3, :] = cnt_seen
                wst[3:4, :] = cnt_above
                wst[4:5, :] = deeper.astype(I32)

                def wcond(b):
                    return (b >= 0) & jnp.any(wst[4:5, :] != 0)

                def wbody(b):
                    M_r = wst[0:1, :]
                    idx_r = wst[1:2, :]
                    cs = wst[2:3, :]
                    ca = wst[3:4, :]
                    going = wst[4:5, :] != 0
                    pm = jnp.where(
                        vmatch1, pmf[pl.ds(b, 1), :],
                        jnp.where(vmatch2, pml[pl.ds(b, 1), :],
                                  jnp.int32(0x3FFFFFFF)))
                    going = going & (pm + jnp.int32(31) > M_r)
                    r0 = b * jnp.int32(BLK)
                    jg_b = (a * jnp.int32(T) - jnp.int32(W) + r0) \
                        + jax.lax.broadcasted_iota(I32, (BLK, B), 0)
                    sc_b, val_b, sp_b, cand_b = eval_rows(
                        wh[pl.ds(r0, BLK), :], wtp[pl.ds(r0, BLK), :],
                        wqp[pl.ds(r0, BLK), :], wsp[pl.ds(r0, BLK), :],
                        wf[pl.ds(r0, BLK), :], wcnt[pl.ds(r0, BLK), :],
                        jg_b, i - jnp.int32(TOP))
                    m_b = jnp.max(jnp.where(going, sc_b,
                                            jnp.int32(NEG_BIG)),
                                  axis=0, keepdims=True)
                    i_b = jnp.max(jnp.where((sc_b == m_b) & val_b
                                            & going, jg_b,
                                            jnp.int32(-1)),
                                  axis=0, keepdims=True)
                    s_b = jnp.sum(jnp.where(going, sp_b, 0), axis=0,
                                  keepdims=True)
                    sa_b = jnp.sum(
                        jnp.where(going & (jg_b > i_b), sp_b, 0),
                        axis=0, keepdims=True)
                    upd = going & (m_b > M_r)
                    wst[1:2, :] = jnp.where(upd, i_b, idx_r)
                    wst[3:4, :] = jnp.where(upd, cs + sa_b, ca)
                    wst[0:1, :] = jnp.where(upd, m_b, M_r)
                    wst[2:3, :] = cs + s_b
                    wst[4:5, :] = (going & cand_b[0:1, :]).astype(I32)
                    return b - 1

                jax.lax.while_loop(wcond, wbody, bstart)
                M = wst[0:1, :]
                idx = wst[1:2, :]
                cnt_above = wst[3:4, :]

                best = M > sp_i
                f_i = jnp.where(best, M, sp_i)
                p_i = jnp.where(best, idx, jnp.int32(-1))
                step_unc = (best
                            & (cnt_above > jnp.int32(max_skip))) \
                    | overflow
                unc_ref[0:1, :] = unc_ref[0:1, :] \
                    | (step_unc & active).astype(I32)

                f_ref[pl.ds(t, 1), :] = jnp.where(active, f_i, 0)
                p_ref[pl.ds(t, 1), :] = jnp.where(active, p_i,
                                                  jnp.int32(-1))
                # child mark at the parent row
                jg_all = (a * jnp.int32(T) - jnp.int32(W)) \
                    + jax.lax.broadcasted_iota(I32, (H, B), 0)
                wcnt[...] = wcnt[...] + ((jg_all == p_i) & (p_i >= 0)
                                         & active).astype(I32)
                wh[pl.ds(tw, 1), :] = xh_i
                wtp[pl.ds(tw, 1), :] = tp_i
                wqp[pl.ds(tw, 1), :] = qp_i
                wsp[pl.ds(tw, 1), :] = sp_i
                wf[pl.ds(tw, 1), :] = jnp.where(active, f_i,
                                                jnp.int32(NEG_BIG))
                return jnp.int32(0)

            @pl.when(a == 0)
            def _unc0():
                unc_ref[0:1, :] = jnp.zeros((1, B), dtype=I32)

            # skipped steps run zero iterations (see chain_exact_pallas)
            jax.lax.fori_loop(jnp.int32(0),
                              jnp.where(run, jnp.int32(T), jnp.int32(0)),
                              body, jnp.int32(0))

        @pl.when(jnp.logical_not(run))
        def _pad():
            f_ref[...] = jnp.zeros((T, B), dtype=I32)
            p_ref[...] = jnp.full((T, B), -1, dtype=I32)

    return kernel


def chain_chunked_pallas_traced(axh, axl, ayh, ayl, n_a, mdx, mdy, bw,
                                max_skip, max_iter, pen_gap, pen_skip,
                                window, tile, interpret=False):
    """Traceable core: (B, A) u32 planes -> (f, p, sure); x64-free."""
    B, A = axh.shape
    W, T = window, tile
    assert A % T == 0 and W % BLK == 0 and W >= TOP and T <= TOP
    assert max_iter >= W + T, \
        "iteration clamp would bind inside the buffer; use the " \
        "full-window kernel"
    xh = axh.T
    tp = axl.view(I32).T
    qp = ayl.view(I32).T
    sp = (ayh & jnp.uint32(0xFF)).view(I32).T
    nrow = jnp.broadcast_to(n_a.astype(I32)[None, :], (8, B))
    nmax = jnp.max(n_a.astype(I32)).reshape(1)

    kernel = _make_kernel(W, T, B, mdx, mdy, bw, max_skip,
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
            pltpu.VMEM((W // BLK, B), I32),       # pmf
            pltpu.VMEM((W // BLK, B), I32),       # pml
            pltpu.VMEM((8, B), I32),              # wst (deep-walk st)
        ],
        interpret=interpret,
    )(nmax, nrow, xh, tp, qp, sp)
    return f.T, p.T, jnp.logical_not(unc[0].astype(bool))


@partial(jax.jit, static_argnames=("mdx", "mdy", "bw", "max_skip",
                                   "max_iter", "pen_gap", "pen_skip",
                                   "window", "tile", "interpret"))
def _chain_chunked_jit(axh, axl, ayh, ayl, n_a, mdx, mdy, bw, max_skip,
                       max_iter, pen_gap, pen_skip, window, tile,
                       interpret):
    return chain_chunked_pallas_traced(axh, axl, ayh, ayl, n_a, mdx,
                                       mdy, bw, max_skip, max_iter,
                                       pen_gap, pen_skip, window, tile,
                                       interpret)


def lchain_dp_chunked_pallas(axh, axl, ayh, ayl, n_a, mdx: int,
                             mdy: int, bw: int, max_skip: int,
                             max_iter: int, pen_gap: float,
                             pen_skip: float, window: int = 768,
                             tile: int = 128,
                             interpret: bool = False):
    """u32-plane front end; contract of lchain_dp_exact_pallas."""
    prev = jax.config.jax_enable_x64
    if prev:
        jax.config.update("jax_enable_x64", False)
    try:
        return _chain_chunked_jit(axh, axl, ayh, ayl, n_a, int(mdx),
                                  int(mdy), int(bw), int(max_skip),
                                  int(max_iter), float(pen_gap),
                                  float(pen_skip), window, tile,
                                  interpret)
    finally:
        if prev:
            jax.config.update("jax_enable_x64", True)
