"""Exactness of the device chaining DP (ops/chain_exact.py).

Contract: for every read the kernel does NOT flag, the DP fill (f, p)
fed through the host backtrack must equal the host lchain_dp engine
byte-for-byte — including the max_skip early-break heuristic and the
max_ii long-range candidate, which change results.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from minigraph_tpu.graph.gfa_io import read_gfa  # noqa: E402
from minigraph_tpu.index.midx import build_index  # noqa: E402
from minigraph_tpu.mapping.lchain import lchain_dp, lchain_dp_from_fp  # noqa: E402
from minigraph_tpu.mapping.seeds import (collect_minimizers,  # noqa: E402
                                         collect_seed_hits)
from minigraph_tpu.options import (GGOptions, IndexOptions,  # noqa: E402
                                   MapOptions, opt_set)
from minigraph_tpu.ops.chain_exact import (lchain_dp_exact,  # noqa: E402
                                           lchain_dp_exact_win)
from minigraph_tpu.utils.hashes import expf  # noqa: E402

N = 512


@pytest.fixture(scope="module")
def mt_anchors():
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set("lr", io_, mo, go)
    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, io_.k, io_.w, mo)
    rng = np.random.default_rng(23)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    host_axy = []
    for div in (0.08,) * 24 + (0.2,) * 8:
        L = int(rng.integers(300, 2000))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), int(len(s) * div)):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        r = "".join(s)
        mv_x, mv_y = collect_minimizers(gi, [len(r)], [r])
        ax, ay, _, _ = collect_seed_hits(gi, mo, mo.occ_max1, mv_x, mv_y,
                                         None)
        host_axy.append((ax, ay))
    tmp = expf(-np.float32(mo.div) * np.float32(gi.k))
    cpg = float(np.float32(np.float32(mo.chn_pen_gap) * np.float32(tmp)))
    cps = float(np.float32(np.float32(mo.chn_pen_skip) * np.float32(tmp)))
    return mo, host_axy, cpg, cps


def _batchify(host_axy):
    B = len(host_axy)
    AX = np.full((B, N), np.uint64(0xFFFFFFFFFFFFFFFF))
    AY = np.full((B, N), np.uint64(0xFFFFFFFFFFFFFFFF))
    NA = np.zeros(B, np.int32)
    for i, (ax, ay) in enumerate(host_axy):
        n = min(len(ax), N)
        AX[i, :n] = ax[:n]
        AY[i, :n] = ay[:n]
        NA[i] = n
    return AX, AY, NA


def _check(mo, host_axy, cpg, cps, f, p, sure, require_sure=None):
    n_sure = n_checked = 0
    for i, (ax, ay) in enumerate(host_axy):
        if len(ax) > N:
            continue
        n_checked += 1
        if not sure[i]:
            continue
        n_sure += 1
        hx, hy, hnu, hu = lchain_dp(
            mo.max_gap, mo.max_gap, mo.bw, mo.max_lc_skip, mo.max_lc_iter,
            mo.min_lc_cnt, mo.min_lc_score, cpg, cps, False, 1,
            ax.copy(), ay.copy())
        n = min(len(ax), N)
        dx, dy, dnu, du = lchain_dp_from_fp(
            f[i, :n], p[i, :n], mo.bw, mo.max_lc_skip, mo.min_lc_cnt,
            mo.min_lc_score, False, ax.copy(), ay.copy())
        assert dnu == hnu and np.array_equal(du, hu), i
        assert np.array_equal(dx, hx) and np.array_equal(dy, hy), i
    if require_sure is not None:
        assert n_sure >= require_sure, (n_sure, n_checked)


def test_chain_exact_full(mt_anchors):
    mo, host_axy, cpg, cps = mt_anchors
    AX, AY, NA = _batchify(host_axy)
    f, p, v, sure = jax.jit(lchain_dp_exact)(
        jnp.asarray(AX), jnp.asarray(AY), jnp.asarray(NA),
        jnp.int32(max(mo.max_gap, mo.bw)), jnp.int32(max(mo.max_gap, mo.bw)),
        jnp.int32(mo.bw), jnp.int32(mo.max_lc_skip),
        jnp.int32(mo.max_lc_iter), jnp.float32(cpg), jnp.float32(cps))
    f, p, sure = map(np.asarray, (f, p, sure))
    _check(mo, host_axy, cpg, cps, f, p, sure, require_sure=28)


def test_chain_exact_windowed(mt_anchors):
    mo, host_axy, cpg, cps = mt_anchors
    AX, AY, NA = _batchify(host_axy)
    for window in (128, 32):  # 32 forces window-overflow flags
        f, p, v, sure = lchain_dp_exact_win(
            jnp.asarray(AX), jnp.asarray(AY), jnp.asarray(NA),
            jnp.int32(max(mo.max_gap, mo.bw)),
            jnp.int32(max(mo.max_gap, mo.bw)),
            jnp.int32(mo.bw), jnp.int32(mo.max_lc_skip),
            jnp.int32(mo.max_lc_iter), jnp.float32(cpg), jnp.float32(cps),
            window=window, tile=8)
        f, p, sure = map(np.asarray, (f, p, sure))
        _check(mo, host_axy, cpg, cps, f, p, sure,
               require_sure=20 if window == 128 else 5)


def test_chain_exact_max_iter_clamp(mt_anchors):
    """With a tiny max_iter the scan window clamps and the max_ii
    long-range candidate decides scores (lchain.c:191-198).  The
    construction pins the candidate: a chainable backbone every 30
    anchors with pairwise-incompatible noise between (dd > bw), so
    the best predecessor is only reachable through max_ii, which
    must be masked by score validity alone, not window membership
    (the pre-fix kernel reported sure=True with unchained
    backbones here)."""
    mo, host_axy, cpg, cps = mt_anchors
    n = 120
    ax = np.zeros(n, np.uint64)
    ay = np.zeros(n, np.uint64)
    span = 17
    x = 100
    for i in range(n):
        q = x if i % 30 == 0 else x + 3000 + (i % 30) * 700
        ax[i] = np.uint64(x)
        ay[i] = (np.uint64(span) << np.uint64(32)) \
            | np.uint64(q & 0xFFFFFFFF)
        x += 11
    max_iter = 16
    hx, hy, hnu, hu = lchain_dp(
        5000, 5000, 500, 25, max_iter, 3, 40, cpg, cps, False, 1,
        ax.copy(), ay.copy())
    assert hnu >= 1          # the host chains the backbone
    Nn = 128
    AX = np.full((1, Nn), np.uint64(0xFFFFFFFFFFFFFFFF))
    AY = AX.copy()
    AX[0, :n] = ax
    AY[0, :n] = ay
    NA = np.array([n], np.int32)
    f, p, v, sure = jax.jit(lchain_dp_exact)(
        jnp.asarray(AX), jnp.asarray(AY), jnp.asarray(NA),
        jnp.int32(5000), jnp.int32(5000), jnp.int32(500),
        jnp.int32(25), jnp.int32(max_iter), jnp.float32(cpg),
        jnp.float32(cps))
    f, p, sure = map(np.asarray, (f, p, sure))
    assert sure[0]
    dx, dy, dnu, du = lchain_dp_from_fp(
        f[0, :n], p[0, :n], 500, 25, 3, 40, False, ax.copy(),
        ay.copy())
    assert dnu == hnu and np.array_equal(du, hu)
    assert np.array_equal(dx, hx) and np.array_equal(dy, hy)
    # the windowed production kernel must agree too
    f, p, v, sure = lchain_dp_exact_win(
        jnp.asarray(AX), jnp.asarray(AY), jnp.asarray(NA),
        jnp.int32(5000), jnp.int32(5000), jnp.int32(500),
        jnp.int32(25), jnp.int32(max_iter), jnp.float32(cpg),
        jnp.float32(cps), window=128, tile=8)
    f, p, sure = map(np.asarray, (f, p, sure))
    if sure[0]:
        dx, dy, dnu, du = lchain_dp_from_fp(
            f[0, :n], p[0, :n], 500, 25, 3, 40, False, ax.copy(),
            ay.copy())
        assert dnu == hnu and np.array_equal(du, hu)
