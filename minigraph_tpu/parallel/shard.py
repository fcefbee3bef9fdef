"""Multi-chip scaling of the mapping front-end.

Layout (SURVEY.md §2.5/§7): read batches are data-parallel over the
mesh's "data" axis; the minimizer index is replicated when it fits
(MT/MHC easily) or sharded by key range over the "idx" axis with an
all-gather of per-shard seed hits; coverage vectors merge with psum.
There is no gradient step in this framework — the "training step"
equivalent is the full batched map step (sketch → index probe →
chaining DP).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pipeline import DeviceIndex, make_map_step


def make_mesh(n_devices: Optional[int] = None, idx_shards: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # fall back to the virtual CPU mesh (xla_force_host_platform_
        # device_count) when the accelerator platform has fewer chips
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise RuntimeError(f"need {n} devices, have {len(devs)}")
    data = n // idx_shards
    arr = np.asarray(devs[:n]).reshape(data, idx_shards)
    return Mesh(arr, axis_names=("data", "idx"))


def make_sharded_map_step(mesh: Mesh, dix: DeviceIndex, mcap: int, acap: int,
                          **kw):
    """jit the batched map step with data-parallel reads and a replicated
    device index; XLA inserts the collectives."""
    step = make_map_step(dix, mcap, acap, **kw)
    data_spec = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(
        step,
        in_shardings=(data_spec, data_spec),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    return jitted


def make_sharded_map_step_v2(mesh: Mesh, ji, w: int, k: int, acap: int = 1024,
                             **kw):
    """Data-parallel reads over the "data" axis on the join pipeline
    (make_map_step_v2); join tables replicate (they are tiny: K x 52
    f32).  XLA inserts the collectives."""
    from ..ops.pipeline import make_map_step_v2
    step = make_map_step_v2(ji, w=w, k=k, acap=acap, **kw)
    data_spec = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(data_spec, data_spec),
                   out_shardings=NamedSharding(mesh, P("data")))


def make_index_sharded_map_step_v2(mesh: Mesh, ji, w: int, k: int,
                                   acap: int = 1024, occ_cap: int = 16,
                                   qcap: int = 256, window: int = 16,
                                   max_occ: int = 50):
    """Join pipeline with the KEY TABLE sharded by column range over the
    "idx" mesh axis: each device equality-joins against its key slice
    (a minimizer matches in exactly one shard), per-shard anchors are
    all-gathered and merge-sorted, then chained.  Reads stay
    data-parallel over "data"."""
    from ._smap import shard_map

    from ..ops.anchors_jax import collect_anchors_join
    from ..ops.chain_jax import lchain_dp_tiled
    from ..ops.sketch_jax4 import sketch_planes

    n_idx = mesh.shape["idx"]
    K = ji.keymat.shape[1]
    per = -(-K // n_idx)
    # pad so every shard has `per` columns; padded keys can't match
    # (their constant row is 1, never zero)
    km = np.asarray(ji.keymat)
    ke = np.asarray(ji.keyext)
    km_p = np.zeros((9, per * n_idx), np.float32)
    km_p[8] = 1.0
    km_p[:, :K] = km
    ke_p = np.zeros((per * n_idx, ke.shape[1]), np.float32)
    ke_p[:K] = ke
    km_sh = jnp.asarray(km_p.reshape(9, n_idx, per).transpose(1, 0, 2))
    ke_sh = jnp.asarray(ke_p.reshape(n_idx, per, ke.shape[1]))
    acap_shard = max(acap // n_idx, 256)

    def local_step(codes, lens, keymat, keyext):
        keymat, keyext = keymat[0], keyext[0]
        sp = sketch_planes(codes, lens, w, k)
        ax, ay, n_a, q_ovf = collect_anchors_join(
            keymat, keyext, sp.hh, sp.hl, sp.meta,
            sp.t_hh, sp.t_hl, sp.t_meta, jnp.int32(max_occ),
            occ_cap=occ_cap, qcap=qcap, acap=acap_shard,
            b_chunk=min(32, codes.shape[0]))
        ax_all = jax.lax.all_gather(ax, "idx", axis=0)
        ay_all = jax.lax.all_gather(ay, "idx", axis=0)
        n_all = jax.lax.psum(n_a, "idx")
        b = ax.shape[0]
        ax_m = jnp.moveaxis(ax_all, 0, 1).reshape(b, -1)
        ay_m = jnp.moveaxis(ay_all, 0, 1).reshape(b, -1)
        ax_m, ay_m = jax.lax.sort((ax_m, ay_m), dimension=1, num_keys=1,
                                  is_stable=True)
        ax_m, ay_m = ax_m[:, :acap], ay_m[:, :acap]
        f, p = lchain_dp_tiled(ax_m, ay_m, jnp.minimum(n_all, acap),
                               jnp.int32(5000), jnp.int32(5000),
                               jnp.int32(500), jnp.float32(0.1827),
                               jnp.float32(0.00913), window=window, tile=8)
        best = jnp.max(f, axis=1)
        return best, jnp.minimum(n_all, acap)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data"), P("data"), P("idx"), P("idx")),
        out_specs=(P("data"), P("data")),
        check_rep=False)

    def step(codes, lens):
        return fn(codes, lens, km_sh, ke_sh)

    return jax.jit(step)


def shard_hash_index(gi, n_shards: int, occ_cap: int = 16):
    """Build one cuckoo table per contiguous key-range shard (equal
    hbits and padded position planes so the shards stack into a single
    "idx"-sharded array).  Per-shard position offsets are rebased,
    which also lifts the 24-bit start ceiling by n_shards."""
    from ..ops.anchors_hash import HashJoinIndex

    seg_len = np.asarray([s.len for s in gi.g.seg], dtype=np.int64)
    keys_sh, start_sh, cnt_sh, pos_sh = shard_index_by_key(
        np.asarray(gi.keys), np.asarray(gi.key_start),
        np.asarray(gi.key_cnt), np.asarray(gi.pos), n_shards)
    hbits_min = 0
    while True:  # until every shard fits the common table size
        shards = []
        for s in range(n_shards):
            ks = keys_sh[s]
            real = ks != np.uint64(0xFFFFFFFFFFFFFFFF)
            shards.append(HashJoinIndex.from_arrays(
                ks[real], start_sh[s][real].astype(np.int64),
                cnt_sh[s][real].astype(np.int64),
                pos_sh[s], seg_len, k=gi.k, w=gi.w, occ_cap=occ_cap,
                hbits_min=hbits_min))
        hb = max(h.hbits for h in shards)
        if all(h.hbits == hb for h in shards):
            break
        hbits_min = hb
    pmax = max(h.p_rid.shape[0] for h in shards)
    smax = max(h.p_sel.shape[0] for h in shards)

    def padto(a, n):
        a = np.asarray(a)
        return np.pad(a, (0, n - len(a)))

    tag = jnp.asarray(np.stack([np.asarray(h.tag) for h in shards]))
    pay = jnp.asarray(np.stack([np.asarray(h.pay) for h in shards]))
    p_rid = jnp.asarray(np.stack([padto(h.p_rid, pmax) for h in shards]))
    p_sel = jnp.asarray(np.stack([padto(h.p_sel, smax) for h in shards]))
    return tag, pay, p_rid, p_sel, hb


def make_hash_sharded_map_step(mesh: Mesh, gi, acap: int = 1024,
                               occ_cap: int = 16, qcap: int = 256,
                               window: int = 16, max_occ: int = 50):
    """Cuckoo-hash probe with the TABLE sharded over the "idx" mesh
    axis — the human-scale layout (SURVEY.md §2.5): every key lives in
    exactly one shard's table, each device probes the full query set
    against its shard with K-independent gathers, per-shard anchors
    are all-gathered along "idx" and merge-sorted, then chained.
    Reads stay data-parallel over "data"."""
    from ._smap import shard_map

    from ..ops.anchors_hash import collect_anchors_hash
    from ..ops.chain_jax import lchain_dp_tiled
    from ..ops.sketch_jax4 import sketch_planes

    n_idx = mesh.shape["idx"]
    tag_sh, pay_sh, prid_sh, psel_sh, hbits = shard_hash_index(
        gi, n_idx, occ_cap=occ_cap)
    acap_shard = max(acap // n_idx, 256)
    w, k = gi.w, gi.k

    def local_step(codes, lens, tag, pay, p_rid, p_sel):
        tag, pay, p_rid, p_sel = tag[0], pay[0], p_rid[0], p_sel[0]
        sp = sketch_planes(codes, lens, w, k)
        ax, ay, n_a, q_ovf = collect_anchors_hash(
            tag, pay, p_rid, p_sel, sp.hh, sp.hl, sp.meta,
            sp.t_hh, sp.t_hl, sp.t_meta, jnp.int32(max_occ),
            hbits=hbits, occ_cap=occ_cap, qcap=qcap, acap=acap_shard,
            b_chunk=min(32, codes.shape[0]))
        ax_all = jax.lax.all_gather(ax, "idx", axis=0)
        ay_all = jax.lax.all_gather(ay, "idx", axis=0)
        n_all = jax.lax.psum(n_a, "idx")
        b = ax.shape[0]
        ax_m = jnp.moveaxis(ax_all, 0, 1).reshape(b, -1)
        ay_m = jnp.moveaxis(ay_all, 0, 1).reshape(b, -1)
        ax_m, ay_m = jax.lax.sort((ax_m, ay_m), dimension=1, num_keys=1,
                                  is_stable=True)
        ax_m, ay_m = ax_m[:, :acap], ay_m[:, :acap]
        f, p = lchain_dp_tiled(ax_m, ay_m, jnp.minimum(n_all, acap),
                               jnp.int32(5000), jnp.int32(5000),
                               jnp.int32(500), jnp.float32(0.1827),
                               jnp.float32(0.00913), window=window, tile=8)
        best = jnp.max(f, axis=1)
        return best, jnp.minimum(n_all, acap)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data"), P("data"), P("idx"), P("idx"), P("idx"),
                  P("idx")),
        out_specs=(P("data"), P("data")),
        check_rep=False)

    def step(codes, lens):
        return fn(codes, lens, tag_sh, pay_sh, prid_sh, psel_sh)

    return jax.jit(step)


def make_index_sharded_map_step(mesh: Mesh, dix: DeviceIndex, mcap: int,
                                acap: int, occ_cap: int = 16,
                                window: int = 32, max_occ: int = 50):
    """Map step with the minimizer index sharded by key range over the
    "idx" mesh axis: each device probes its local shard, per-shard seed
    hits are all-gathered along "idx" and merged by sorting, and the
    chaining DP runs on the merged anchors.  Reads stay data-parallel
    over the "data" axis.  (SURVEY.md §2.5: allgather of per-shard
    seed hits.)"""
    import jax.numpy as jnp
    from ._smap import shard_map

    from ..ops.chain_jax import lchain_dp_device
    from ..ops.pipeline import collect_anchors_device
    from ..ops.sketch_jax2 import sketch_device_v2

    n_idx = mesh.shape["idx"]
    keys_sh, start_sh, cnt_sh, pos_sh = shard_index_by_key(
        np.asarray(dix.keys), np.asarray(dix.key_start),
        np.asarray(dix.key_cnt), np.asarray(dix.pos), n_idx)
    keys_sh = jnp.asarray(keys_sh)
    start_sh = jnp.asarray(start_sh.astype(np.int32))
    cnt_sh = jnp.asarray(cnt_sh.astype(np.int32))
    pos_sh = jnp.asarray(pos_sh)
    seg_len = dix.seg_len
    acap_shard = max(acap // n_idx, 256)

    def local_step(codes, lens, keys, start, cnt, pos):
        # shard_map passes blocks with the leading shard axis kept
        keys, start, cnt, pos = keys[0], start[0], cnt[0], pos[0]
        mx, my, n_mv = sketch_device_v2(codes, lens, dix.w, dix.k, cap=mcap)
        ax, ay, n_a = collect_anchors_device(
            keys, start, cnt, pos, seg_len, mx, my, n_mv,
            max_occ, occ_cap, acap_shard)
        # merge per-shard hits across the idx axis
        ax_all = jax.lax.all_gather(ax, "idx", axis=0)   # (I, b, acap_shard)
        ay_all = jax.lax.all_gather(ay, "idx", axis=0)
        n_all = jax.lax.psum(n_a, "idx")
        b = ax.shape[0]
        ax_m = jnp.moveaxis(ax_all, 0, 1).reshape(b, -1)
        ay_m = jnp.moveaxis(ay_all, 0, 1).reshape(b, -1)
        order = jnp.argsort(ax_m, axis=1, stable=True)[:, :acap]
        ax_m = jnp.take_along_axis(ax_m, order, axis=1)
        ay_m = jnp.take_along_axis(ay_m, order, axis=1)
        f, p = lchain_dp_device(ax_m, ay_m, jnp.minimum(n_all, acap),
                                jnp.int32(5000), jnp.int32(5000),
                                jnp.int32(500), jnp.float32(0.1827),
                                jnp.float32(0.00913), window=window)
        best = jnp.max(f, axis=1)
        return best, jnp.minimum(n_all, acap)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data"), P("data"), P("idx"), P("idx"), P("idx"),
                  P("idx")),
        out_specs=(P("data"), P("data")),
        check_rep=False)

    def step(codes, lens):
        return fn(codes, lens, keys_sh, start_sh, cnt_sh, pos_sh)

    return jax.jit(step)


def shard_index_by_key(gi_keys, gi_start, gi_cnt, gi_pos, n_shards: int):
    """Split the flat index into contiguous key-range shards (padded to
    equal sizes) for "idx"-axis sharding."""
    K = len(gi_keys)
    per = -(-K // n_shards)
    shards = []
    for s in range(n_shards):
        a, b = s * per, min((s + 1) * per, K)
        keys = np.full(per, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
        cnt = np.zeros(per, dtype=np.int32)
        start = np.zeros(per, dtype=np.int32)
        if a < b:
            keys[: b - a] = gi_keys[a:b]
            cnt[: b - a] = gi_cnt[a:b]
            p0 = gi_start[a]
            p1 = gi_start[b - 1] + gi_cnt[b - 1] if b > a else p0
            start[: b - a] = gi_start[a:b] - p0
            pos = np.asarray(gi_pos[p0:p1], dtype=np.uint64)
        else:
            pos = np.zeros(0, dtype=np.uint64)
        shards.append((keys, start, cnt, pos))
    pmax = max(len(s[3]) for s in shards)
    pos_arr = np.full((n_shards, max(pmax, 1)), 0, dtype=np.uint64)
    for s, sh in enumerate(shards):
        pos_arr[s, : len(sh[3])] = sh[3]
    return (np.stack([s[0] for s in shards]),
            np.stack([s[1] for s in shards]),
            np.stack([s[2] for s in shards]),
            pos_arr)
