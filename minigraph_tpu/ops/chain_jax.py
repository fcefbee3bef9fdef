"""Batched linear-chaining DP on device.

A lax.scan over anchor rank with a vectorized predecessor window: each
step scores transitions from the previous W anchors (comput_sc,
lchain.c:114-139, same int32/float32 math incl. the fast log2
approximation) and extends the best.  This is the throughput path: it
evaluates the full window instead of the reference's sequential
skip/early-break heuristics, so it explores a superset of the
reference's candidate set.  The parity (host) path remains
authoritative for byte-identical output.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .device import I32

INT32_MIN = jnp.int32(-0x80000000)
NEG_BIG = jnp.int32(-0x3FFFFFFF)


def _mg_log2(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact float32 fast log2 (mgpriv.h:63-71); valid for x >= 2."""
    z = x.astype(jnp.float32)
    i = z.view(jnp.uint32)
    log2 = (((i >> jnp.uint32(23)) & jnp.uint32(255)).astype(jnp.int32)
            - 128).astype(jnp.float32)
    i2 = (i & jnp.uint32(0x807FFFFF)) + jnp.uint32(127 << 23)
    zf = i2.view(jnp.float32)
    c1 = jnp.float32(-0.34484843)
    c2 = jnp.float32(2.02466578)
    c3 = jnp.float32(0.67487759)
    return log2 + ((c1 * zf + c2) * zf - c3)


def _comput_sc_vec(xi, yi, xj, yj, max_dist_x, max_dist_y, bw,
                   chn_pen_gap, chn_pen_skip):
    """Vectorized transition scores j -> i over a window of anchors.

    Single-query-segment flavor (sidi == sidj), int32 semantics.
    """
    dq = (yi & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32) \
        - (yj & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
    dr = (xi - xj).astype(jnp.uint64).astype(jnp.uint32).view(jnp.int32)
    bad = (dq <= 0) | (dq > max_dist_x)
    bad |= (dr == 0) | (dq > max_dist_y)
    dd = jnp.abs(dr - dq)
    bad |= dd > bw
    # different segment/orientation (x high bits differ) is unreachable
    bad |= (xi >> jnp.uint64(32)) != (xj >> jnp.uint64(32))
    dg = jnp.minimum(dr, dq)
    q_span = ((yj >> jnp.uint64(32)) & jnp.uint64(0xFF)).astype(jnp.int32)
    sc = jnp.minimum(q_span, dg)
    lin_pen = jnp.float32(chn_pen_gap) * dd.astype(jnp.float32) \
        + jnp.float32(chn_pen_skip) * dg.astype(jnp.float32)
    log_pen = jnp.where(dd >= 1, _mg_log2((dd + 1).astype(jnp.float32)),
                        jnp.float32(0.0))
    pen = (lin_pen + jnp.float32(0.5) * log_pen).astype(jnp.int32)
    sc = sc - jnp.where((dd != 0) | (dg > q_span), pen, 0)
    return jnp.where(bad, NEG_BIG, sc)


@partial(jax.jit, static_argnames=("window", "tile"))
def lchain_dp_tiled(ax, ay, n_a, max_dist_x, max_dist_y, bw,
                    chn_pen_gap, chn_pen_skip, window: int = 64,
                    tile: int = 16):
    """lchain_dp_device with `tile` anchors per scan step.

    The per-step work of the straight scan is tiny (B x W scores), so
    the A-step lax.scan is loop-overhead-bound (~13 us/step on v5e).
    Processing `tile` anchors per step with an unrolled inner loop cuts
    the step count by `tile`x at identical results.
    """
    B, A = ax.shape
    W, T = window, tile
    assert A % T == 0

    def one(axr, ayr, n):
        padx = jnp.concatenate([jnp.full(W, 0xFFFFFFFFFFFFFFFF,
                                         dtype=jnp.uint64), axr])
        pady = jnp.concatenate([jnp.full(W, 0xFFFFFFFFFFFFFFFF,
                                         dtype=jnp.uint64), ayr])

        def step(hist, t0):
            # hist: (W,) scores of anchors t0-W..t0-1
            # tile slices: values for anchors t0-W .. t0+T-1
            tx = jax.lax.dynamic_slice(padx, (t0,), (W + T,))
            ty = jax.lax.dynamic_slice(pady, (t0,), (W + T,))
            buf = jnp.concatenate([hist, jnp.full(T, NEG_BIG, jnp.int32)])
            fs, ps = [], []
            for j in range(T):
                i = t0 + j
                xi, yi = tx[W + j], ty[W + j]
                sc = _comput_sc_vec(xi, yi, tx[j: W + j], ty[j: W + j],
                                    max_dist_x, max_dist_y, bw,
                                    chn_pen_gap, chn_pen_skip)
                j_off = jnp.arange(W, dtype=jnp.int32)
                valid_j = (i - W + j_off) >= 0
                tot = jnp.where(valid_j, sc + jax.lax.dynamic_slice(
                    buf, (j,), (W,)), NEG_BIG)
                span = ((yi >> jnp.uint64(32)) & jnp.uint64(0xFF)) \
                    .astype(jnp.int32)
                best = jnp.max(tot)
                bj = jnp.argmax(tot).astype(jnp.int32)
                use = (best > span) & (i < n)
                f_i = jnp.where(i < n, jnp.where(use, best, span), NEG_BIG)
                p_i = jnp.where(use, i - W + bj, jnp.int32(-1))
                buf = jax.lax.dynamic_update_index_in_dim(buf, f_i, W + j, 0)
                fs.append(f_i)
                ps.append(p_i)
            return buf[T:], (jnp.stack(fs), jnp.stack(ps))

        init = jnp.full(W, NEG_BIG, dtype=jnp.int32)
        _, (f, p) = jax.lax.scan(
            step, init, jnp.arange(0, A, T, dtype=jnp.int32))
        return f.reshape(A), p.reshape(A)

    return jax.vmap(one)(ax, ay, n_a)


@partial(jax.jit, static_argnames=("window",))
def lchain_dp_device(ax, ay, n_a, max_dist_x, max_dist_y, bw,
                     chn_pen_gap, chn_pen_skip, window: int = 64):
    """Banded chaining DP over sorted anchors.

    ax, ay: (B, A) uint64 sorted by x (padding = all-ones); n_a: (B,).
    Returns (f, p): per-anchor best chain score (int32) and predecessor
    (int32, -1 for none).
    """
    B, A = ax.shape
    W = window

    def one(axr, ayr, n):
        # padded window views: for anchor i, predecessors i-W..i-1
        padx = jnp.concatenate([jnp.full(W, 0xFFFFFFFFFFFFFFFF,
                                         dtype=jnp.uint64), axr])
        pady = jnp.concatenate([jnp.full(W, 0xFFFFFFFFFFFFFFFF,
                                         dtype=jnp.uint64), ayr])

        def step(f_hist, i):
            # f_hist: (W,) scores of anchors i-W..i-1
            xi = axr[i]
            yi = ayr[i]
            xw = jax.lax.dynamic_slice(padx, (i,), (W,))
            yw = jax.lax.dynamic_slice(pady, (i,), (W,))
            sc = _comput_sc_vec(xi, yi, xw, yw, max_dist_x, max_dist_y,
                                bw, chn_pen_gap, chn_pen_skip)
            j_off = jnp.arange(W, dtype=jnp.int32)
            valid_j = (j_off >= W - i) | (i >= W)
            valid_j = (i - W + j_off) >= 0
            tot = jnp.where(valid_j, sc + f_hist, NEG_BIG)
            span = ((yi >> jnp.uint64(32)) & jnp.uint64(0xFF)).astype(jnp.int32)
            best = jnp.max(tot)
            bj = jnp.argmax(tot).astype(jnp.int32)
            use = (best > span) & (i < n)
            f_i = jnp.where(i < n, jnp.where(use, best, span), NEG_BIG)
            p_i = jnp.where(use, i - W + bj, jnp.int32(-1))
            f_hist = jnp.concatenate([f_hist[1:], f_i[None]])
            return f_hist, (f_i, p_i)

        init = jnp.full(W, NEG_BIG, dtype=jnp.int32)
        _, (f, p) = jax.lax.scan(step, init, jnp.arange(A, dtype=jnp.int32))
        return f, p

    return jax.vmap(one)(ax, ay, n_a)
