"""Linear-chaining DP as a Pallas TPU kernel.

Same recurrence as ops/chain_jax.py (comput_sc, lchain.c:114-139) but
with the predecessor window resident in VMEM scratch: the XLA scan
round-trips the (W,) score history through HBM every step and pays
~10 us of loop overhead per anchor, while this kernel runs the whole
anchor loop on-core.  Layout: reads on lanes (B multiple of 128),
anchors streamed in (T, B) tiles along the sequential grid axis; the
ring buffer of the last W anchors (keys, positions, spans, scores)
lives in scratch and persists across grid steps.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -0x3FFFFFFF
U32MAX = 0xFFFFFFFF


def _mg_log2(z):
    """Bit-exact float32 fast log2 (mgpriv.h:63-71); valid for z >= 2."""
    i = pltpu.bitcast(z, jnp.uint32)
    # NB: u32->i32 astype hits a Mosaic lowering recursion; bitcast is
    # value-preserving here (exponent byte < 2^8)
    expo = pltpu.bitcast((i >> jnp.uint32(23)) & jnp.uint32(255),
                         jnp.int32)
    log2 = (expo - 128).astype(jnp.float32)
    i2 = (i & jnp.uint32(0x807FFFFF)) + jnp.uint32(127 << 23)
    zf = pltpu.bitcast(i2, jnp.float32)
    c1 = jnp.float32(-0.34484843)
    c2 = jnp.float32(2.02466578)
    c3 = jnp.float32(0.67487759)
    return log2 + ((c1 * zf + c2) * zf - c3)


def _make_kernel(W, T, B, maxdx, maxdy, bw, pen_gap, pen_skip):
    def kernel(n_ref, axh_ref, tp_ref, qp_ref, sp_ref,
               f_ref, p_ref,
               wh, wtp, wqp, wsp, wf, wai):
        a = pl.program_id(0)

        @pl.when(a == 0)
        def _init():
            wh[...] = jnp.full((W, B), U32MAX, dtype=jnp.uint32)
            wtp[...] = jnp.zeros((W, B), dtype=jnp.int32)
            wqp[...] = jnp.zeros((W, B), dtype=jnp.int32)
            wsp[...] = jnp.zeros((W, B), dtype=jnp.int32)
            wf[...] = jnp.full((W, B), NEG_BIG, dtype=jnp.int32)
            wai[...] = jnp.full((W, B), -1, dtype=jnp.int32)

        n = n_ref[0, :]

        def body(j, _):
            i = a * jnp.int32(T) + j
            xh = axh_ref[pl.ds(j, 1), :]   # (1, B) rid<<1|rev key
            tp = tp_ref[pl.ds(j, 1), :]    # target pos
            qp = qp_ref[pl.ds(j, 1), :]    # query pos
            sp = sp_ref[pl.ds(j, 1), :]    # span

            dq = qp - wqp[...]
            dr = tp - wtp[...]
            bad = (dq <= 0) | (dq > maxdx) | (dr == 0) | (dq > maxdy)
            dd = jnp.abs(dr - dq)
            bad |= dd > bw
            bad |= wh[...] != xh
            bad |= wai[...] < 0
            dg = jnp.minimum(dr, dq)
            sc = jnp.minimum(wsp[...], dg)
            lin = (jnp.float32(pen_gap) * dd.astype(jnp.float32)
                   + jnp.float32(pen_skip) * dg.astype(jnp.float32))
            logp = jnp.where(dd >= 1,
                             _mg_log2((dd + 1).astype(jnp.float32)),
                             jnp.float32(0.0))
            pen = (lin + jnp.float32(0.5) * logp).astype(jnp.int32)
            sc = sc - jnp.where((dd != 0) | (dg > wsp[...]), pen, 0)
            tot = jnp.where(bad, jnp.int32(NEG_BIG), sc + wf[...])

            best = jnp.max(tot, axis=0, keepdims=True)      # (1, B)
            # predecessor = smallest anchor index among the maxima
            # (matches jnp.argmax's first-occurrence over oldest-first)
            cand = jnp.where(tot == best, wai[...], jnp.int32(0x7FFFFFFF))
            pred = jnp.min(cand, axis=0, keepdims=True)

            alive = i < n
            use = (best > sp) & alive
            f_i = jnp.where(alive, jnp.where(use, best, sp), jnp.int32(NEG_BIG))
            p_i = jnp.where(use, pred, jnp.int32(-1))
            f_ref[pl.ds(j, 1), :] = f_i
            p_ref[pl.ds(j, 1), :] = p_i

            slot = jax.lax.rem(i, jnp.asarray(W, dtype=i.dtype))
            wh[pl.ds(slot, 1), :] = xh
            wtp[pl.ds(slot, 1), :] = tp
            wqp[pl.ds(slot, 1), :] = qp
            wsp[pl.ds(slot, 1), :] = sp
            wf[pl.ds(slot, 1), :] = f_i
            wai[pl.ds(slot, 1), :] = jnp.full((1, B), i, dtype=jnp.int32)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), body,
                          jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("window", "tile", "maxdx", "maxdy", "bw",
                                   "pen_gap", "pen_skip", "interpret"))
def _chain_planes_jit(axh, axl, ayh, ayl, n_a, maxdx, maxdy, bw,
                      pen_gap, pen_skip, window, tile, interpret):
    return chain_planes_traced(axh, axl, ayh, ayl, n_a, maxdx, maxdy,
                               bw, pen_gap, pen_skip, window, tile,
                               interpret)


def chain_planes_traced(axh, axl, ayh, ayl, n_a, maxdx, maxdy, bw,
                        pen_gap, pen_skip, window, tile, interpret):
    """x64-free traceable chain: u32 planes (B, A) -> (f, p) (B, A)."""
    B, A = axh.shape
    W, T = window, tile
    assert A % T == 0, \
        f"anchor capacity {A} must be a multiple of the chain tile {T}"

    axh_t = axh.T                                          # (A, B)
    tp = axl.view(jnp.int32).T
    qp = ayl.view(jnp.int32).T
    sp = (ayh & jnp.uint32(0xFF)).view(jnp.int32).T
    nrow = n_a.astype(jnp.int32)[None, :]                  # (1, B)

    kernel = _make_kernel(W, T, B, maxdx, maxdy, bw, pen_gap, pen_skip)
    grid = (A // T,)
    f, p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, B), lambda a: (0, 0)),
                  pl.BlockSpec((T, B), lambda a: (a, 0)),
                  pl.BlockSpec((T, B), lambda a: (a, 0)),
                  pl.BlockSpec((T, B), lambda a: (a, 0)),
                  pl.BlockSpec((T, B), lambda a: (a, 0))],
        out_specs=[pl.BlockSpec((T, B), lambda a: (a, 0)),
                   pl.BlockSpec((T, B), lambda a: (a, 0))],
        out_shape=[jax.ShapeDtypeStruct((A, B), jnp.int32),
                   jax.ShapeDtypeStruct((A, B), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((W, B), jnp.uint32),   # wh
            pltpu.VMEM((W, B), jnp.int32),    # wtp
            pltpu.VMEM((W, B), jnp.int32),    # wqp
            pltpu.VMEM((W, B), jnp.int32),    # wsp
            pltpu.VMEM((W, B), jnp.int32),    # wf
            pltpu.VMEM((W, B), jnp.int32),    # wai (anchor indices)
        ],
        interpret=interpret,
    )(nrow, axh_t, tp, qp, sp)
    return f.T, p.T


def lchain_dp_pallas_planes(axh, axl, ayh, ayl, n_a, maxdx: int = 5000,
                            maxdy: int = 5000, bw: int = 500,
                            pen_gap: float = 0.1827,
                            pen_skip: float = 0.00913, window: int = 32,
                            tile: int = 256, interpret: bool = False):
    """Chaining DP on u32 anchor planes (B, A); contract of
    lchain_dp_device.

    Runs as its own dispatch with jax_enable_x64 OFF during tracing:
    the axon remote compiler rejects any Pallas kernel compiled under
    x64, and Mosaic cannot lower the int64 indices x64 introduces.
    All inputs are 32-bit so semantics are unaffected.
    """
    prev = jax.config.jax_enable_x64
    if prev:
        jax.config.update("jax_enable_x64", False)
    try:
        return _chain_planes_jit(axh, axl, ayh, ayl, n_a, maxdx, maxdy,
                                 bw, pen_gap, pen_skip, window, tile,
                                 interpret)
    finally:
        if prev:
            jax.config.update("jax_enable_x64", True)


def lchain_dp_pallas(ax, ay, n_a, maxdx: int = 5000, maxdy: int = 5000,
                     bw: int = 500, pen_gap: float = 0.1827,
                     pen_skip: float = 0.00913, window: int = 32,
                     tile: int = 256, interpret: bool = False):
    """u64 convenience wrapper: (B, A) uint64 anchors -> (f, p)."""
    axh = (ax >> jnp.uint64(32)).astype(jnp.uint32)
    axl = (ax & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ayh = (ay >> jnp.uint64(32)).astype(jnp.uint32)
    ayl = (ay & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return lchain_dp_pallas_planes(axh, axl, ayh, ayl, n_a, maxdx, maxdy,
                                   bw, pen_gap, pen_skip, window, tile,
                                   interpret)
