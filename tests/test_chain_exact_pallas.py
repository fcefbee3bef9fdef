"""Pallas exact-or-flag chain kernel vs the XLA reference kernel.

The two implement the same construction (chain_exact.py docstring), so
at identical (window, tile) every output — f, p, and the sure flag —
must match bitwise on any input.  Anchors are synthesized to look like
real seed hits: sorted by (vertex, tpos), mostly near-diagonal with
noise, plus repeat pileups dense enough to exercise the skip-break
and window-overflow paths.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from minigraph_tpu.ops.chain_exact import lchain_dp_exact_win
from minigraph_tpu.ops.chain_exact_pallas import lchain_dp_exact_pallas

MDX = MDY = 5000
BW = 500
MAX_SKIP = 25
MAX_ITER = 5000
PEN_GAP = 0.1827
PEN_SKIP = 0.000913


def synth_planes(B, A, rng, dense_frac=0.25):
    """Sorted (axh, axl, ayh, ayl) u32 planes + n_a."""
    axh = np.full((B, A), 0xFFFFFFFF, np.uint32)
    axl = np.full((B, A), 0xFFFFFFFF, np.uint32)
    ayh = np.full((B, A), 0xFFFFFFFF, np.uint32)
    ayl = np.full((B, A), 0xFFFFFFFF, np.uint32)
    n_a = rng.integers(0, A + 1, B)
    n_a[0] = 0
    n_a[-1] = A
    for b in range(B):
        n = int(n_a[b])
        if n == 0:
            continue
        # 1-3 vertices; tpos mostly tracking qpos (diagonal) + noise
        nv = int(rng.integers(1, 4))
        vid = np.sort(rng.integers(0, 50, n).astype(np.uint32) % nv)
        qpos = np.sort(rng.integers(0, 2000, n)).astype(np.int64)
        diag = rng.integers(0, 300, nv)
        tpos = qpos + diag[vid] + rng.integers(-40, 40, n)
        if rng.random() < dense_frac:
            # repeat pileup: many anchors in a tiny tpos range
            lo = int(rng.integers(0, max(1, n // 2)))
            hi = min(n, lo + int(rng.integers(20, 80)))
            tpos[lo:hi] = tpos[lo] + rng.integers(0, 5, hi - lo)
        tpos = np.maximum(tpos, 1)
        order = np.lexsort((tpos, vid))
        vid, tpos, qpos = vid[order], tpos[order], qpos[order]
        span = rng.integers(15, 24, n)
        axh[b, :n] = vid
        axl[b, :n] = tpos.astype(np.uint32)
        ayh[b, :n] = span.astype(np.uint32)  # occ/tandem bits irrelevant
        ayl[b, :n] = qpos.astype(np.uint32)
    return (jnp.asarray(axh), jnp.asarray(axl), jnp.asarray(ayh),
            jnp.asarray(ayl), jnp.asarray(n_a, dtype=jnp.int32))


@pytest.mark.parametrize("W,T,A,B", [(64, 16, 256, 8), (128, 32, 512, 8)])
def test_pallas_matches_xla(W, T, A, B):
    rng = np.random.default_rng(7)
    for trial in range(4):
        axh, axl, ayh, ayl, n_a = synth_planes(B, A, rng)
        ax = (axh.astype(jnp.uint64) << jnp.uint64(32)) \
            | axl.astype(jnp.uint64)
        ay = (ayh.astype(jnp.uint64) << jnp.uint64(32)) \
            | ayl.astype(jnp.uint64)
        f0, p0, _v, sure0 = lchain_dp_exact_win(
            ax, ay, n_a, jnp.int32(MDX), jnp.int32(MDY), jnp.int32(BW),
            jnp.int32(MAX_SKIP), jnp.int32(MAX_ITER),
            jnp.float32(PEN_GAP), jnp.float32(PEN_SKIP),
            window=W, tile=T)
        f1, p1, sure1 = lchain_dp_exact_pallas(
            axh, axl, ayh, ayl, n_a, MDX, MDY, BW, MAX_SKIP, MAX_ITER,
            PEN_GAP, PEN_SKIP, window=W, tile=T, interpret=True)
        np.testing.assert_array_equal(np.asarray(sure0),
                                      np.asarray(sure1),
                                      err_msg=f"trial {trial} sure")
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1),
                                      err_msg=f"trial {trial} f")
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1),
                                      err_msg=f"trial {trial} p")
        assert np.asarray(sure0).any(), "want some sure lanes"


def test_small_max_iter_clamp():
    """max_iter < buffer depth exercises the in-buffer clamp branch."""
    rng = np.random.default_rng(3)
    W, T = 64, 16
    axh, axl, ayh, ayl, n_a = synth_planes(8, 256, rng, dense_frac=0.8)
    ax = (axh.astype(jnp.uint64) << jnp.uint64(32)) \
        | axl.astype(jnp.uint64)
    ay = (ayh.astype(jnp.uint64) << jnp.uint64(32)) \
        | ayl.astype(jnp.uint64)
    f0, p0, _v, sure0 = lchain_dp_exact_win(
        ax, ay, n_a, jnp.int32(MDX), jnp.int32(MDY), jnp.int32(BW),
        jnp.int32(MAX_SKIP), jnp.int32(40), jnp.float32(PEN_GAP),
        jnp.float32(PEN_SKIP), window=W, tile=T)
    f1, p1, sure1 = lchain_dp_exact_pallas(
        axh, axl, ayh, ayl, n_a, MDX, MDY, BW, MAX_SKIP, 40,
        PEN_GAP, PEN_SKIP, window=W, tile=T, interpret=True)
    np.testing.assert_array_equal(np.asarray(sure0), np.asarray(sure1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
