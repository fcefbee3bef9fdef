"""Batched device mapping front-end: sketch → index probe → anchors →
linear-chaining DP, all under one jit.

This is the TPU production path for the seed-chain stage (the hot
~90% of mapping compute).  The minimizer index lives on device as
sorted flat tables (keys / start / count / positions) — the HBM graph
store; lookups are binary-search gathers; anchors are built with the
reference's 128-bit packing and chained with the banded DP kernel.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..index.midx import MinimizerIndex
from .chain_jax import lchain_dp_device
from .sketch_jax import encode_batch
from .sketch_jax2 import sketch_device_v2 as sketch_device

U64 = jnp.uint64


@dataclass
class DeviceIndex:
    """Device-resident minimizer index + segment table."""
    keys: jnp.ndarray        # (K,) uint64 sorted minimizers
    key_start: jnp.ndarray   # (K,) int32
    key_cnt: jnp.ndarray     # (K,) int32
    pos: jnp.ndarray         # (P,) uint64 position records
    seg_len: jnp.ndarray     # (S,) int32
    k: int
    w: int

    @classmethod
    def from_host(cls, gi: MinimizerIndex) -> "DeviceIndex":
        return cls(
            keys=jnp.asarray(gi.keys),
            key_start=jnp.asarray(gi.key_start, dtype=jnp.int32),
            key_cnt=jnp.asarray(gi.key_cnt, dtype=jnp.int32),
            pos=jnp.asarray(gi.pos),
            seg_len=jnp.asarray(
                np.asarray([s.len for s in gi.g.seg], dtype=np.int32)),
            k=gi.k,
            w=gi.w,
        )


@partial(jax.jit, static_argnames=("occ_cap", "acap"))
def collect_anchors_device(idx_keys, idx_start, idx_cnt, idx_pos, seg_len,
                           mv_x, mv_y, n_mv, max_occ, occ_cap: int,
                           acap: int):
    """Index probe + anchor construction (collect_seed_hits semantics,
    map-algo.c:152-192) with fixed per-minimizer occurrence cap.

    mv_x/mv_y: (B, M) minimizer records; n_mv: (B,).
    Returns (ax, ay, n_a): (B, acap) anchors sorted by x.
    """
    B, M = mv_x.shape

    def one(mx, my, nm):
        minier = mx >> U64(8)
        k_idx = jnp.searchsorted(idx_keys, minier, method="sort")
        k_idx_c = jnp.minimum(k_idx, len(idx_keys) - 1)
        found = (idx_keys[k_idx_c] == minier) \
            & (jnp.arange(M) < nm)
        cnt = jnp.where(found, idx_cnt[k_idx_c], 0)
        start = jnp.where(found, idx_start[k_idx_c], 0)
        keep = found & (cnt < max_occ)
        cnt = jnp.where(keep, cnt, 0)

        q_pos = (my & U64(0xFFFFFFFF)).astype(jnp.int64)
        q_span = (mx & U64(0xFF)).astype(jnp.int32)
        seg_id = (my >> U64(32)).astype(jnp.int32)
        tandem = jnp.zeros(M, dtype=bool)
        same_prev = minier[1:] == minier[:-1]
        tandem = tandem.at[1:].set(same_prev)
        tandem = tandem.at[:-1].set(tandem[:-1] | same_prev)

        # expand: for each minimizer take up to occ_cap hits
        occ = jnp.minimum(cnt, occ_cap)
        offs = jnp.cumsum(occ) - occ
        hit_slot = jnp.arange(occ_cap)
        # (M, occ_cap) grid of hit candidates
        hit_ok = hit_slot[None, :] < occ[:, None]
        r = idx_pos[jnp.minimum(start[:, None] + hit_slot[None, :],
                                len(idx_pos) - 1)]
        rid = (r >> U64(32)).astype(jnp.int32)
        rpos = ((r & U64(0xFFFFFFFF)) >> U64(1)).astype(jnp.int64)
        rev = ((r.astype(jnp.int64) ^ q_pos[:, None]) & 1).astype(jnp.int64)
        tpos = jnp.where(rev == 0, rpos,
                         (seg_len[rid] - (rpos + 1 - q_span[:, None]) - 1)
                         .astype(jnp.int64))
        axv = (rid.astype(jnp.uint64) << U64(33)) \
            | (rev.astype(jnp.uint64) << U64(32)) \
            | tpos.astype(jnp.uint64)
        occ_b = jnp.minimum(cnt, 255).astype(jnp.uint64)
        ayv = (occ_b[:, None] << U64(56)) \
            | (seg_id.astype(jnp.uint64)[:, None] << U64(48)) \
            | jnp.where(tandem[:, None], U64(1 << 42), U64(0)) \
            | (q_span.astype(jnp.uint64)[:, None] << U64(32)) \
            | (q_pos[:, None] >> 1).astype(jnp.uint64)
        ayv = jnp.broadcast_to(ayv, (M, occ_cap))
        # pack + sort in one argsort: invalid hits get the max key
        axf = jnp.where(hit_ok, axv, jnp.uint64(0xFFFFFFFFFFFFFFFF)) \
            .reshape(-1)
        ayf = jnp.where(hit_ok, ayv, jnp.uint64(0xFFFFFFFFFFFFFFFF)) \
            .reshape(-1)
        n_a = jnp.minimum(jnp.sum(occ), acap).astype(jnp.int32)
        order = jnp.argsort(axf, stable=True)[:acap]
        return axf[order], ayf[order], n_a

    return jax.vmap(one)(mv_x, mv_y, n_mv)


def make_map_step_v2(ji, w: int, k: int, acap: int = 2048,
                     occ_cap: int = 16, qcap: int = 512,
                     window: int = 64, max_occ: int = 50,
                     max_dist_x: int = 5000, max_dist_y: int = 5000,
                     bw: int = 500, chn_pen_gap: float = 0.1827,
                     chn_pen_skip: float = 0.00913, b_chunk: int = 32):
    """Jittable batched map step on the join pipeline: position-aligned
    sketch planes (sketch_jax4) -> MXU equality-join anchors
    (anchors_jax) -> banded chaining DP.  ~10x the throughput of
    make_map_step; reads flagged overflow need the exact fallback."""
    from .anchors_jax import collect_anchors_join
    from .chain_jax import lchain_dp_tiled
    from .sketch_jax4 import sketch_planes

    def map_step(codes, lens):
        sp = sketch_planes(codes, lens, w, k)
        ax, ay, n_a, q_ovf = collect_anchors_join(
            ji.keymat, ji.keyext, sp.hh, sp.hl, sp.meta,
            sp.t_hh, sp.t_hl, sp.t_meta, jnp.int32(max_occ),
            occ_cap=occ_cap, qcap=qcap, acap=acap, b_chunk=b_chunk)
        f, p = lchain_dp_tiled(ax, ay, n_a,
                               jnp.int32(max_dist_x), jnp.int32(max_dist_y),
                               jnp.int32(bw), jnp.float32(chn_pen_gap),
                               jnp.float32(chn_pen_skip), window=window,
                               tile=8)
        best = jnp.max(f, axis=1)
        best_i = jnp.argmax(f, axis=1).astype(jnp.int32)
        return {"f": f, "p": p, "best": best, "best_anchor": best_i,
                "n_anchors": n_a,
                "overflow": sp.overflow | q_ovf}

    return map_step


def make_map_pipeline_v2(ji, w: int, k: int, acap: int = 2048,
                         occ_cap: int = 16, qcap: int = 512,
                         window: int = 32, max_occ: int = 50,
                         b_chunk: int = 32, pallas_interpret: bool = False,
                         **chain_kw):
    """Production pipeline as chained dispatches: jitted front (sketch
    planes + join anchors, x64), Pallas probe for bucketed indexes,
    Pallas chaining kernel (x64-free dispatches; see chain_pallas).
    Accepts a JoinIndex (flat join, small graphs) or BucketedJoinIndex
    (pangenome scale).  Returns a plain Python function — do NOT wrap
    in jax.jit."""
    from .anchors_bucketed import (BucketedJoinIndex, finish_anchors,
                                   spread_queries)
    from .anchors_jax import collect_anchors_join
    from .chain_pallas import lchain_dp_pallas_planes
    from .probe_pallas import probe_bucketed_pallas
    from .sketch_jax4 import sketch_planes

    bucketed = isinstance(ji, BucketedJoinIndex)

    if bucketed:
        nb = ji.keymat.shape[0]

        @jax.jit
        def front(codes, lens):
            sp = sketch_planes(codes, lens, w, k)
            sf, n_q, q_ovf = spread_queries(
                sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta, nb,
                qcap=qcap, b_chunk=b_chunk)
            return sf, sp.overflow | q_ovf

        @partial(jax.jit, static_argnames=())
        def tail(ext, sf):
            return finish_anchors(ext, sf, jnp.int32(max_occ), occ_cap,
                                  acap=acap, b_chunk=b_chunk,
                                  return_planes=True)

        def anchors(codes, lens):
            sf, ovf = front(codes, lens)
            B = sf.shape[1]
            bb = 128
            while B % bb:
                bb //= 2
            ext = probe_bucketed_pallas(
                sf[:9], ji.keymat, ji.keyext, nb, bb=bb,
                kc=min(512, ji.keymat.shape[2]),
                interpret=pallas_interpret)
            axh, axl, ayh, ayl, n_a, a_ovf = tail(ext, sf)
            return axh, axl, ayh, ayl, n_a, ovf | a_ovf
    else:
        @jax.jit
        def anchors(codes, lens):
            sp = sketch_planes(codes, lens, w, k)
            axh, axl, ayh, ayl, n_a, q_ovf = collect_anchors_join(
                ji.keymat, ji.keyext, sp.hh, sp.hl, sp.meta,
                sp.t_hh, sp.t_hl, sp.t_meta, jnp.int32(max_occ),
                occ_cap=occ_cap, qcap=qcap, acap=acap, b_chunk=b_chunk,
                return_planes=True)
            return axh, axl, ayh, ayl, n_a, sp.overflow | q_ovf

    def run(codes, lens):
        axh, axl, ayh, ayl, n_a, ovf = anchors(codes, lens)
        f, p = lchain_dp_pallas_planes(axh, axl, ayh, ayl, n_a,
                                       window=window,
                                       interpret=pallas_interpret,
                                       **chain_kw)
        best = jnp.max(f, axis=1)
        best_i = jnp.argmax(f, axis=1).astype(jnp.int32)
        return {"f": f, "p": p, "best": best, "best_anchor": best_i,
                "n_anchors": n_a, "overflow": ovf}

    return run


def make_map_step_v3(ji, w: int, k: int, acap: int = 2048,
                     occ_cap: int = 16, qcap: int = 512,
                     window: int = 32, max_occ: int = 50,
                     b_chunk: int = 32, pallas_interpret: bool = False,
                     **chain_kw):
    """Single-dispatch production map step: Pallas sketch + MXU join +
    Pallas chain fused under ONE x64-free jit.  On this backend every
    dispatch blocks the host ~13 ms, so dispatch count — not op
    count — sets the throughput floor; the whole path is uint32/f32 so
    nothing needs x64.  Returns a plain Python function."""
    from .anchors_bucketed import (BucketedJoinIndex, finish_anchors,
                                   spread_queries)
    from .anchors_hash import HashJoinIndex, collect_anchors_hash
    from .anchors_jax import collect_anchors_join
    from .chain_pallas import chain_planes_traced
    from .probe_pallas import probe_bucketed_pallas
    from .sketch_pallas import sketch_planes_pallas_traced

    bucketed = isinstance(ji, BucketedJoinIndex)
    hashed = isinstance(ji, HashJoinIndex)
    nb = ji.keymat.shape[0] if bucketed else 0

    @partial(jax.jit, static_argnames=())
    def step(codes, lens):
        sp = sketch_planes_pallas_traced(codes, lens, w, k,
                                         interpret=pallas_interpret)
        if bucketed:
            sf, n_q, s_ovf = spread_queries(
                sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta, nb,
                qcap=qcap, b_chunk=b_chunk)
            B = sf.shape[1]
            bb = 128
            while B % bb:
                bb //= 2
            ext = probe_bucketed_pallas(
                sf[:9], ji.keymat, ji.keyext, nb, bb=bb,
                kc=min(512, ji.keymat.shape[2]),
                interpret=pallas_interpret)
            axh, axl, ayh, ayl, n_a, a_ovf = finish_anchors(
                ext, sf, jnp.int32(max_occ), occ_cap, acap=acap,
                b_chunk=b_chunk, return_planes=True)
            q_ovf = s_ovf | a_ovf
        elif hashed:
            axh, axl, ayh, ayl, n_a, q_ovf = collect_anchors_hash(
                ji.tag, ji.pay, ji.p_rid, ji.p_sel,
                sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta,
                jnp.int32(max_occ), hbits=ji.hbits, occ_cap=occ_cap,
                qcap=qcap, acap=acap, b_chunk=b_chunk, return_planes=True)
        else:
            axh, axl, ayh, ayl, n_a, q_ovf = collect_anchors_join(
                ji.keymat, ji.keyext, sp.hh, sp.hl, sp.meta,
                sp.t_hh, sp.t_hl, sp.t_meta, jnp.int32(max_occ),
                occ_cap=occ_cap, qcap=qcap, acap=acap, b_chunk=b_chunk,
                return_planes=True)
        f, p = chain_planes_traced(
            axh, axl, ayh, ayl, n_a, 5000, 5000, 500,
            0.1827, 0.00913, window, 256, pallas_interpret)
        best = jnp.max(f, axis=1)
        best_i = jnp.argmax(f, axis=1).astype(jnp.int32)
        return {"f": f, "p": p, "best": best, "best_anchor": best_i,
                "n_anchors": n_a, "overflow": sp.overflow | q_ovf}

    def run(codes, lens):
        prev = jax.config.jax_enable_x64
        if prev:
            jax.config.update("jax_enable_x64", False)
        try:
            return step(codes, lens)
        finally:
            if prev:
                jax.config.update("jax_enable_x64", True)

    return run


def make_map_step(dix: DeviceIndex, mcap: int, acap: int, occ_cap: int = 16,
                  window: int = 64, max_occ: int = 50, max_dist_x: int = 5000,
                  max_dist_y: int = 5000, bw: int = 500,
                  chn_pen_gap: float = 0.1827, chn_pen_skip: float = 0.00913):
    """Build the jittable batched map step (flagship forward fn)."""

    def map_step(codes, lens):
        mx, my, n_mv = sketch_device(codes, lens, dix.w, dix.k, cap=mcap)
        ax, ay, n_a = collect_anchors_device(
            dix.keys, dix.key_start, dix.key_cnt, dix.pos, dix.seg_len,
            mx, my, n_mv, max_occ, occ_cap, acap)
        f, p = lchain_dp_device(ax, ay, n_a,
                                jnp.int32(max_dist_x), jnp.int32(max_dist_y),
                                jnp.int32(bw), jnp.float32(chn_pen_gap),
                                jnp.float32(chn_pen_skip), window=window)
        best = jnp.max(f, axis=1)
        best_i = jnp.argmax(f, axis=1).astype(jnp.int32)
        return {"f": f, "p": p, "best": best, "best_anchor": best_i,
                "n_anchors": n_a}

    return map_step
