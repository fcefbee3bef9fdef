"""Exactness of the on-device backtrack + compaction
(ops/backtrack_jax.py) against the native host backtrack
(mgt_lchain_finish: peak backtrack + chain compaction)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from minigraph_tpu.graph.gfa_io import read_gfa  # noqa: E402
from minigraph_tpu.index.midx import build_index  # noqa: E402
from minigraph_tpu.mapping.lchain import lchain_dp_from_fp  # noqa: E402
from minigraph_tpu.mapping.seeds import (collect_minimizers,  # noqa: E402
                                         collect_seed_hits)
from minigraph_tpu.options import (GGOptions, IndexOptions,  # noqa: E402
                                   MapOptions, opt_set)
from minigraph_tpu.ops.backtrack_jax import backtrack_compact  # noqa: E402
from minigraph_tpu.ops.chain_exact import lchain_dp_exact  # noqa: E402
from minigraph_tpu.utils.hashes import expf  # noqa: E402

N = 512
UCAP = 64


@pytest.fixture(scope="module")
def fp_fixture():
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set("lr", io_, mo, go)
    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, io_.k, io_.w, mo)
    rng = np.random.default_rng(31)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    host_axy = []
    for div in (0.05,) * 12 + (0.12,) * 12 + (0.25,) * 8:
        L = int(rng.integers(300, 2000))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), int(len(s) * div)):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        r = "".join(s)
        mv_x, mv_y = collect_minimizers(gi, [len(r)], [r])
        ax, ay, _, _ = collect_seed_hits(gi, mo, mo.occ_max1, mv_x,
                                         mv_y, None)
        if len(ax) > N:
            ax, ay = ax[:N], ay[:N]
        host_axy.append((ax, ay))
    tmp = expf(-np.float32(mo.div) * np.float32(gi.k))
    cpg = float(np.float32(np.float32(mo.chn_pen_gap) * np.float32(tmp)))
    cps = float(np.float32(np.float32(mo.chn_pen_skip)
                           * np.float32(tmp)))
    B = len(host_axy)
    AX = np.full((B, N), np.uint64(0xFFFFFFFFFFFFFFFF))
    AY = np.full((B, N), np.uint64(0xFFFFFFFFFFFFFFFF))
    NA = np.zeros(B, np.int32)
    for i, (ax, ay) in enumerate(host_axy):
        AX[i, :len(ax)] = ax
        AY[i, :len(ay)] = ay
        NA[i] = len(ax)
    f, p, v, sure = jax.jit(lchain_dp_exact)(
        jnp.asarray(AX), jnp.asarray(AY), jnp.asarray(NA),
        jnp.int32(max(mo.max_gap, mo.bw)),
        jnp.int32(max(mo.max_gap, mo.bw)),
        jnp.int32(mo.bw), jnp.int32(mo.max_lc_skip),
        jnp.int32(mo.max_lc_iter), jnp.float32(cpg), jnp.float32(cps))
    return (mo, host_axy, np.asarray(f), np.asarray(p),
            np.asarray(sure), AX, AY, NA)


def test_backtrack_compact_parity(fp_fixture):
    mo, host_axy, f, p, sure, AX, AY, NA = fp_fixture
    axh = (AX >> np.uint64(32)).astype(np.uint32)
    axl = (AX & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    ayh = (AY >> np.uint64(32)).astype(np.uint32)
    ayl = (AY & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = jax.jit(lambda *a: backtrack_compact(
        *a, min_cnt=mo.min_lc_cnt, min_sc=mo.min_lc_score,
        max_drop=mo.bw, ucap=UCAP))(
        jnp.asarray(f.astype(np.int32)), jnp.asarray(p.astype(np.int32)),
        jnp.asarray(NA), jnp.asarray(axh), jnp.asarray(axl),
        jnp.asarray(ayh), jnp.asarray(ayl))
    out = {k: np.asarray(v) for k, v in out.items()}
    n_checked = 0
    for i, (ax, ay) in enumerate(host_axy):
        if not sure[i]:
            continue
        n = int(NA[i])
        hx, hy, hnu, hu = lchain_dp_from_fp(
            f[i, :n], p[i, :n], mo.bw, mo.max_lc_skip, mo.min_lc_cnt,
            mo.min_lc_score, False, ax.copy(), ay.copy())
        assert not out["bt_unsure"][i], i
        dnu = int(out["n_u"][i])
        dnv = int(out["n_v"][i])
        assert dnu == hnu, (i, dnu, hnu)
        du = (out["u_sc"][i, :dnu].astype(np.uint64) << np.uint64(32)) \
            | out["u_cnt"][i, :dnu].astype(np.uint64)
        assert np.array_equal(du, hu), i
        n_keep = int(hu.astype(np.uint64).astype(np.uint32).sum()) \
            if hnu else 0
        assert dnv == n_keep, (i, dnv, n_keep)
        dx = (out["c_axh"][i, :dnv].astype(np.uint64) << np.uint64(32)) \
            | out["c_axl"][i, :dnv].astype(np.uint64)
        dy = (out["c_ayh"][i, :dnv].astype(np.uint64) << np.uint64(32)) \
            | out["c_ayl"][i, :dnv].astype(np.uint64)
        assert np.array_equal(dx, hx[:dnv]), i
        assert np.array_equal(dy, hy[:dnv]), i
        n_checked += 1
    assert n_checked >= 20, n_checked


@pytest.mark.parametrize("max_drop", [5, 60, 500])
def test_backtrack_compact_fuzz_forest(max_drop):
    """Adversarial synthetic parent forests: random branching, f
    values that rise and fall (stressing the peak-cut walk's
    overshoot-undo), tiny max_drop, rejected chains, and ucap
    pressure — against the native host backtrack."""
    rng = np.random.default_rng(max_drop)
    B, N_ = 24, 256
    F = np.zeros((B, N_), np.int32)
    P = np.full((B, N_), -1, np.int32)
    AX = np.zeros((B, N_), np.uint64)
    AY = np.zeros((B, N_), np.uint64)
    NA = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(20, N_))
        NA[b] = n
        # random forest: each anchor chains to a recent predecessor
        # (or roots); f random-walks so peaks sit mid-chain
        for i in range(n):
            if i and rng.random() < 0.9:
                j = int(rng.integers(max(0, i - 12), i))
                P[b, i] = j
                F[b, i] = F[b, j] + int(rng.integers(-40, 60))
            else:
                F[b, i] = int(rng.integers(10, 80))
        AX[b, :n] = np.sort(rng.integers(0, 1 << 33, n).astype(np.uint64))
        AY[b, :n] = rng.integers(0, 1 << 40, n).astype(np.uint64)
    out = jax.jit(lambda *a: backtrack_compact(
        *a, min_cnt=3, min_sc=40, max_drop=max_drop, ucap=64))(
        jnp.asarray(F), jnp.asarray(P), jnp.asarray(NA),
        jnp.asarray((AX >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((AX & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((AY >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((AY & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    out = {k: np.asarray(v) for k, v in out.items()}
    n_checked = 0
    for b in range(B):
        if out["bt_unsure"][b]:
            continue
        n = int(NA[b])
        hx, hy, hnu, hu = lchain_dp_from_fp(
            F[b, :n], P[b, :n],
            max_drop, 25, 3, 40, False,
            AX[b, :n].copy(), AY[b, :n].copy())
        dnu = int(out["n_u"][b])
        assert dnu == hnu, (b, dnu, hnu)
        du = (out["u_sc"][b, :dnu].astype(np.uint64) << np.uint64(32)) \
            | out["u_cnt"][b, :dnu].astype(np.uint64)
        assert np.array_equal(du, hu), b
        dnv = int(out["n_v"][b])
        n_keep = int(hu.astype(np.uint64).astype(np.uint32).sum()) \
            if hnu else 0
        assert dnv == n_keep, (b, dnv, n_keep)
        dx = (out["c_axh"][b, :dnv].astype(np.uint64) << np.uint64(32)) \
            | out["c_axl"][b, :dnv].astype(np.uint64)
        dy = (out["c_ayh"][b, :dnv].astype(np.uint64) << np.uint64(32)) \
            | out["c_ayl"][b, :dnv].astype(np.uint64)
        assert np.array_equal(dx, hx[:dnv]), b
        assert np.array_equal(dy, hy[:dnv]), b
        n_checked += 1
    # random forests tie candidate f values often (the tie-interaction
    # flag then routes the lane to the host path); a healthy majority
    # must still be unflagged and every unflagged lane byte-exact
    assert n_checked >= B // 3, n_checked
