"""Fused bucketed equality-join probe as a Pallas TPU kernel.

The XLA formulation of the bucketed probe (anchors_bucketed.probe_xla)
materializes the (B, nb, qb, KB) distance and indicator tensors in HBM
— tens of GB of traffic per 512-read batch on a Mb-scale graph,
dwarfing the MXU work.  This kernel keeps both in VMEM: for each
(bucket, read-block) grid cell it streams the bucket's key matrix and
payload table once, computes the exact-zero equality test on-core, and
accumulates the payload extraction matmul.  Tables are revisited
bucket-major so Pallas re-DMAs them only when the bucket changes.

All operands are plane-major — queries (9, B, SB), payload tables
(nb, EXT, KB), output (EXT, B, SB) — so nothing at a dispatch boundary
carries a tiny minor dimension (which XLA pads to 128 lanes and
relayouts at ~10x cost).  Every matmul is arranged transpose-free.

Same exactness contract as the XLA path: f32 matmuls with
precision="float32" (bf16-pass-exact), values < 2^22.

Runs as an x64-free dispatch (see chain_pallas for why).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PREC = "float32"


def _make_kernel(bb, qb, KB, KC, EXT):
    n_kc = KB // KC

    def kernel(sq_ref, km_ref, ke_ref, out_ref, acc):
        # sq_ref: (9, 1, qb, bb); km_ref: (1, 9, KB); ke_ref: (1, EXT, KB)
        q = sq_ref[...].reshape(9, qb * bb)   # (9, N)

        def chunk(c, _):
            km = km_ref[0, :, pl.ds(c * KC, KC)]           # (9, KC)
            # D[kc, n] = sum_f km[f, kc] * q[f, n]
            D = jax.lax.dot_general(km, q, (((0,), (0,)), ((), ())),
                                    precision=PREC)         # (KC, N)
            ind = (D == 0).astype(jnp.float32)
            ke = ke_ref[0, :, pl.ds(c * KC, KC)]            # (EXT, KC)
            acc[...] += jax.lax.dot_general(
                ke, ind, (((1,), (0,)), ((), ())), precision=PREC)
            return _

        acc[...] = jnp.zeros((EXT, bb * qb), dtype=jnp.float32)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_kc), chunk,
                          jnp.int32(0))
        out_ref[...] = acc[...].reshape(EXT, 1, qb, bb)

    return kernel


@partial(jax.jit, static_argnames=("nb", "bb", "kc", "interpret"))
def _probe_jit(sQ, keymat, keyext, nb, bb, kc, interpret):
    return _probe_jit_traced(sQ, keymat, keyext, nb, bb, kc, interpret)


def _probe_jit_traced(sQ, keymat, keyext, nb, bb, kc, interpret):
    _, B, SB = sQ.shape
    qb = SB // nb
    KB = keymat.shape[2]
    EXT = keyext.shape[1]
    nrb = B // bb
    kernel = _make_kernel(bb, qb, KB, kc, EXT)
    # rearrange to put the 128-aligned read axis last (block shape
    # constraint: last two dims divisible by (8, 128))
    sQt = sQ.reshape(9, B, nb, qb).transpose(0, 2, 3, 1)  # (9,nb,qb,B)
    out = pl.pallas_call(
        kernel,
        grid=(nb, nrb),  # bucket-major: table blocks re-DMA only on v++
        in_specs=[
            pl.BlockSpec((9, 1, qb, bb), lambda v, rb: (0, v, 0, rb)),
            pl.BlockSpec((1, 9, KB), lambda v, rb: (v, 0, 0)),
            pl.BlockSpec((1, EXT, KB), lambda v, rb: (v, 0, 0)),
        ],
        out_specs=pl.BlockSpec((EXT, 1, qb, bb),
                               lambda v, rb: (0, v, 0, rb)),
        out_shape=jax.ShapeDtypeStruct((EXT, nb, qb, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((EXT, qb * bb), jnp.float32)],
        interpret=interpret,
    )(sQt, keymat, keyext)
    return out.transpose(0, 3, 1, 2).reshape(EXT, B, SB)


def probe_bucketed_pallas(sQ, keymat, keyext, nb: int, bb: int = 128,
                          kc: int = 512, interpret: bool = False):
    """Bucketed join probe: (9, B, SB) queries x per-bucket tables ->
    (EXT, B, SB) payload extraction, fused on-core.

    KB must be a multiple of kc (BucketedJoinIndex pads); B a multiple
    of bb.
    """
    prev = jax.config.jax_enable_x64
    if prev:
        jax.config.update("jax_enable_x64", False)
    try:
        return _probe_jit(sQ, keymat, keyext, nb, bb, kc, interpret)
    finally:
        if prev:
            jax.config.update("jax_enable_x64", True)


def _make_flat_kernel(bb, qcap, KB, KC, EXT):
    n_kc = KB // KC

    def kernel(sq_ref, km_ref, ke_ref, out_ref, acc):
        # sq_ref: (9, bb, qcap); km_ref: (9, KB); ke_ref: (EXT, KB)
        q = sq_ref[...].reshape(9, bb * qcap)

        def chunk(c, _):
            km = km_ref[:, pl.ds(c * KC, KC)]              # (9, KC)
            D = jax.lax.dot_general(km, q, (((0,), (0,)), ((), ())),
                                    precision=PREC)         # (KC, N)
            ind = (D == 0).astype(jnp.float32)
            ke = ke_ref[:, pl.ds(c * KC, KC)]               # (EXT, KC)
            acc[...] += jax.lax.dot_general(
                ke, ind, (((1,), (0,)), ((), ())), precision=PREC)
            return _

        acc[...] = jnp.zeros((EXT, bb * qcap), dtype=jnp.float32)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_kc), chunk,
                          jnp.int32(0))
        out_ref[...] = acc[...].reshape(EXT, bb, qcap)

    return kernel


def probe_flat_traced(sQ, km_p, ke_p, bb: int = 8, kc: int = 256,
                      interpret: bool = False):
    """Flat (single-bucket) fused probe: (9, B, qcap) queries x the
    whole key table -> (EXT, B, qcap).  Traceable, x64-free caller."""
    _, B, qcap = sQ.shape
    km = km_p[0] if km_p.ndim == 3 else km_p        # (9, Kpad)
    ke = ke_p[0] if ke_p.ndim == 3 else ke_p        # (EXT, Kpad)
    KB = km.shape[1]
    kc = min(kc, KB)
    EXT = ke.shape[0]
    while B % bb:
        bb //= 2
    kernel = _make_flat_kernel(bb, qcap, KB, kc, EXT)
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((9, bb, qcap), lambda rb: (0, rb, 0)),
                  pl.BlockSpec((9, KB), lambda rb: (0, 0)),
                  pl.BlockSpec((EXT, KB), lambda rb: (0, 0))],
        out_specs=pl.BlockSpec((EXT, bb, qcap), lambda rb: (0, rb, 0)),
        out_shape=jax.ShapeDtypeStruct((EXT, B, qcap), jnp.float32),
        scratch_shapes=[pltpu.VMEM((EXT, bb * qcap), jnp.float32)],
        interpret=interpret,
    )(sQ, km, ke)
