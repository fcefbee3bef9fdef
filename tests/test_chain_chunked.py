"""Chunked-walk Pallas chain kernel (ops/chain_chunked_pallas.py) vs
the XLA full-window reference kernel.

For max_iter >= W + T (the kernel's precondition) the two must agree
on the sure flags bitwise, and on f/p everywhere except
window-overflow lanes (where the full-window kernel may apply the
max_ii candidate whose value the overflow flag already voids) — sure
lanes in particular must match bitwise.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from minigraph_tpu.ops.chain_exact import lchain_dp_exact_win
from minigraph_tpu.ops.chain_chunked_pallas import lchain_dp_chunked_pallas

from test_chain_exact_pallas import (MDX, MDY, BW, MAX_SKIP, PEN_GAP,
                                     PEN_SKIP, synth_planes)

MAX_ITER = 5000
# interpret-mode emulation of the in-kernel while loop is slow, so the
# parity sweep uses a tighter x-window (shallower walks) plus one
# full-depth trial; the kernels' window semantics don't depend on mdx
MDX_T = 600


# T=16 keeps the XLA reference kernel's unrolled-scan compile small;
# W=256 exercises the deep-block walk (window region below the
# always-evaluated top 128 rows), W=128 + mdx=5000 the overflow flag
@pytest.mark.slow
@pytest.mark.parametrize("W,T,A,B,mdx", [(256, 16, 256, 8, MDX_T),
                                         (256, 16, 256, 8, MDX),
                                         (128, 64, 256, 8, MDX)])
def test_chunked_matches_xla(W, T, A, B, mdx):
    rng = np.random.default_rng(11)
    n_sure_tot = 0
    for trial in range(2):
        axh, axl, ayh, ayl, n_a = synth_planes(B, A, rng)
        ax = (axh.astype(jnp.uint64) << jnp.uint64(32)) \
            | axl.astype(jnp.uint64)
        ay = (ayh.astype(jnp.uint64) << jnp.uint64(32)) \
            | ayl.astype(jnp.uint64)
        f0, p0, _v, sure0 = lchain_dp_exact_win(
            ax, ay, n_a, jnp.int32(mdx), jnp.int32(MDY), jnp.int32(BW),
            jnp.int32(MAX_SKIP), jnp.int32(MAX_ITER),
            jnp.float32(PEN_GAP), jnp.float32(PEN_SKIP),
            window=W, tile=T)
        f1, p1, sure1 = lchain_dp_chunked_pallas(
            axh, axl, ayh, ayl, n_a, mdx, MDY, BW, MAX_SKIP, MAX_ITER,
            PEN_GAP, PEN_SKIP, window=W, tile=T, interpret=True)
        sure0, sure1 = np.asarray(sure0), np.asarray(sure1)
        np.testing.assert_array_equal(sure0, sure1,
                                      err_msg=f"trial {trial} sure")
        f0, p0 = np.asarray(f0), np.asarray(p0)
        f1, p1 = np.asarray(f1), np.asarray(p1)
        for b in range(B):
            if sure0[b]:
                n = int(np.asarray(n_a)[b])
                np.testing.assert_array_equal(
                    f0[b, :n], f1[b, :n], err_msg=f"trial {trial} f {b}")
                np.testing.assert_array_equal(
                    p0[b, :n], p1[b, :n], err_msg=f"trial {trial} p {b}")
                n_sure_tot += 1
    assert n_sure_tot >= 8, n_sure_tot


def test_chunked_rejects_binding_clamp():
    rng = np.random.default_rng(5)
    axh, axl, ayh, ayl, n_a = synth_planes(8, 256, rng)
    with pytest.raises(AssertionError):
        lchain_dp_chunked_pallas(
            axh, axl, ayh, ayl, n_a, MDX, MDY, BW, MAX_SKIP, 40,
            PEN_GAP, PEN_SKIP, window=128, tile=64, interpret=True)
