"""TPU device front-end for the production mapping path.

Runs the batched seed stage — minimizer sketch, index probe, anchor
construction (collect_seed_hits semantics, map-algo.c:58-192) — on
device with BYTE PARITY against the host path, then hands each read to
the exact host tail (mapping/mapper.py:map_frag_tail).  Reads the
device cannot reproduce exactly carry an overflow flag (sketch tie
overflow, qcap/acap overflow, occurrence-cap truncation) and fall back
to the full host path, so output is byte-identical either way.

Reads are padded into length buckets so each (batch, pad_len)
combination compiles once; long reads use wider, shallower buckets.
"""
from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..index.midx import MinimizerIndex
from ..options import (MG_M_HEAP_SORT, MG_M_NO_DIAG, MapOptions)

U64 = np.uint64
META_Q_MASK = (1 << 25) - 1

# (pad_len, batch) buckets; reads longer than the widest go to host.
# Batches are full 128-lane multiples: the Pallas chain kernel's
# per-anchor cost is lane-count-independent below 128, so shallow
# batches waste 4-8x of the chip (measured 29 ms/batch at B=16 and
# B=128 alike on the 16 kb bucket).
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (2048, 256), (8192, 128), (32768, 128))


@dataclass
class FrontResult:
    """Per-read device seed-stage output, host-array form."""
    ax: np.ndarray        # (n_a,) uint64 anchors sorted by x
    ay: np.ndarray
    rep_len: int
    mini_pos: np.ndarray  # (n_mini_pos,) int32 or int64 by path
    n_mv: int
    f: Optional[np.ndarray] = None  # (n_a,) int32 device chain DP scores
    p: Optional[np.ndarray] = None  # (n_a,) int32 parents
    # device-backtracked chains (ops/backtrack_jax.py): when set,
    # ax/ay are the COMPACTED chain anchors and u is sc<<32|cnt per
    # chain, exactly mgt_lchain_finish's outputs
    u: Optional[np.ndarray] = None  # (n_u,) uint64


def derive_query_info(q_cnt: np.ndarray, q_meta: np.ndarray, n_q: int,
                      max_occ: int) -> Tuple[int, np.ndarray]:
    """rep_len + mini_pos from per-emission query info
    (collect_matches, map-algo.c:67-89)."""
    cnts = q_cnt[:n_q].astype(np.int64)
    metas = q_meta[:n_q].astype(np.uint32)
    qpos = ((metas >> 1) & META_Q_MASK).astype(np.int64)   # k-mer end i
    span = ((metas >> 26) & 0x1F).astype(np.int64)
    rep = cnts >= max_occ
    mini_pos = qpos[~rep].astype(np.int32)
    rep_st = rep_en = 0
    rep_len = 0
    for en, sp in zip((qpos[rep] + 1).tolist(), span[rep].tolist()):
        st = en - sp
        if st > rep_en:
            rep_len += rep_en - rep_st
            rep_st, rep_en = st, en
        else:
            rep_en = en
    rep_len += rep_en - rep_st
    return rep_len, mini_pos


class DeviceFront:
    """Batched on-device seed stage with host fallback flags."""

    def __init__(self, gi: MinimizerIndex, opt: MapOptions,
                 buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
                 occ_cap: int = 16, b_chunk: int = 32, chain: bool = True,
                 chain_window: int = None, use_pallas: bool = None):
        from ..options import MG_M_RMQ, MG_M_SPLICE, MG_M_SR
        from ..ops.anchors_jax import JoinIndex
        from ..utils.hashes import expf
        from ..utils.jaxcache import enable as _enable_jax_cache
        _enable_jax_cache()
        self.gi = gi
        self.opt = opt
        self.occ_cap = occ_cap
        self.b_chunk = b_chunk
        # Mosaic kernels only lower for real TPU devices.  The default
        # (None) decides from jax.default_backend(), which is WRONG
        # when the step is jitted onto a virtual CPU mesh while a TPU
        # plugin owns the default backend (the dryrun_multichip case:
        # make_mesh falls back to jax.devices("cpu") but
        # default_backend() still says "tpu") — callers jitting onto
        # CPU meshes must pass use_pallas=False.
        self._use_pallas = use_pallas
        # probe backend: the MXU equality join scans O(K) key columns
        # per query — ideal below ~1e5 distinct minimizers; above that
        # the K-independent cuckoo-hash gathers win (ops/anchors_hash)
        if len(gi.keys) > 100_000:
            from ..ops.anchors_hash import HashJoinIndex
            # per-anchor positions come from idx gathers, so occ_cap
            # is free here: cover max_occ and the truncation flag
            # (occ_cap < cnt < max_occ) never fires
            self.occ_cap = occ_cap = max(occ_cap,
                                         min(256, opt.occ_max1 + 1))
            self.ji = HashJoinIndex.from_host(gi, occ_cap=occ_cap)
            self.hashed = True
        else:
            self.ji = JoinIndex.from_host(gi, occ_cap=occ_cap)
            self.hashed = False
        self.buckets = sorted(buckets)
        self.max_len = self.buckets[-1][0]
        self._fns: Dict[int, object] = {}
        # The FIRST copy_to_host_async in a process wedges the next
        # fetch for minutes on the tunneled axon runtime (measured
        # 140-340 s, size-independent; later calls behave).  Absorb
        # that one-time stall in a daemon thread so it overlaps the
        # first jit compile; submit() only uses the async prefetch
        # once the probe has drained.
        self._async_ok = False

        def _warm_async():
            try:
                import jax.numpy as jnp
                a = (jnp.arange(8, dtype=jnp.uint32) + 1)
                a.block_until_ready()
                a.copy_to_host_async()
                np.asarray(a)
                self._async_ok = True
            except Exception:
                pass   # async prefetch stays off; cold fetches work

        import threading
        threading.Thread(target=_warm_async, daemon=True).start()
        self._wfa_pool = None     # device -c gap pool (driver-lazy)
        self.n_device = 0
        self.n_fallback = 0
        self.n_chain_unsure = 0
        self.n_flat_ovf = 0
        self.n_slice_refetch = 0
        # per-bucket [anchor_words, mini_words] high-water fetch sizes
        self._fill_pred: Dict[int, list] = {}
        self.thread_fetch = True
        # buckets that have completed one call (i.e. are compiled):
        # a submit touching a cold bucket sets last_submit_cold so the
        # split controller does not charge the jit compile to t_dev
        self._hot_buckets = set()
        self.last_submit_cold = False
        # device chain DP (ops/chain_exact.py) applies when the chain
        # parameters are read-independent (map-algo.c:377-390): no sr/
        # splice/rmq, no frag-length-dependent ref gap
        self.chain_enabled = (
            chain and not (opt.flag & (MG_M_RMQ | MG_M_SPLICE | MG_M_SR))
            and opt.max_frag_len <= 0)
        self.chain_window = chain_window
        tmp = expf(-np.float32(opt.div) * np.float32(gi.k))
        self.chn_pen_gap = float(np.float32(
            np.float32(opt.chn_pen_gap) * np.float32(tmp)))
        self.chn_pen_skip = float(np.float32(
            np.float32(opt.chn_pen_skip) * np.float32(tmp)))
        mdx = opt.max_gap_ref if opt.max_gap_ref > 0 else opt.max_gap
        mdy = opt.max_gap
        self.mdx_adj = max(mdx, opt.bw)
        self.mdy_adj = max(mdy, opt.bw)

    def _fn(self, pad_len: int):
        fn = self._fns.get(pad_len)
        if fn is None:
            # the dense-plane qpos field is 17 bits, and the packed
            # chain fp word (f << 14 | p+1) holds parents < 16383,
            # so acap = pad_len//4 must stay <= 8192
            assert pad_len <= (1 << 15), \
                "device bucket too long for the packed planes"
            import jax
            import jax.numpy as jnp
            from functools import partial
            from ..ops import u32
            from ..ops.anchors_jax import collect_anchors_exact
            from ..ops.chain_exact import lchain_dp_exact_win
            # Sketch kernel: the Pallas whole-sketch kernel is
            # bitwise-identical to the XLA one (incl. the tie planes
            # and the emission-order corner flag; pinned by
            # tests/test_join_pipeline.py::test_sketch_pallas_matches_xla)
            # and ~5x faster on the chip — the XLA graph's ~290 kernels
            # each pay 50-150 us of per-kernel runtime overhead.  On
            # CPU backends (the test mesh) Pallas would need interpret
            # mode, so keep the XLA sketch there; chip-path GAF parity
            # vs the oracle is asserted in bench.py on every run.
            use_pallas = (self._use_pallas if self._use_pallas is not None
                          else jax.default_backend() not in ("cpu",))
            if use_pallas:
                from ..ops.sketch_jax4 import SketchPlanes
                from ..ops.sketch_pallas import sketch_planes_pallas_traced

                def sketch_planes(codes, lens, w, k):
                    # long-read buckets have small batches (16-64);
                    # pad to a full 128-lane block for Mosaic (the
                    # wasted rows cost ~nothing — the sketch is
                    # bandwidth-trivial next to collect)
                    B = codes.shape[0]
                    if B < 128:
                        codes = jnp.pad(codes, ((0, 128 - B), (0, 0)),
                                        constant_values=4)
                        lens = jnp.pad(lens, (0, 128 - B))
                        sp = sketch_planes_pallas_traced(codes, lens, w, k)
                        return SketchPlanes(*(a[:B] for a in sp))
                    return sketch_planes_pallas_traced(codes, lens, w, k)
            else:
                from ..ops.sketch_jax4 import sketch_planes
            # caps scale with the bucket: qcap covers ~2L/w emissions
            # (~L/6 at w=11), acap a few hits per emission; overflow-
            # flagged reads fall back to host, so caps trade only
            # throughput — and smaller caps cut BOTH the chain-scan
            # length and the device->host fetch, which dominates on a
            # tunneled chip (measured n_a ~= L/9 on MHC-class reads,
            # so L/4 leaves ~2x headroom on the long buckets).
            # 2 kb bucket: devprof measured n_a mean 163 / max 462 and
            # n_q <= ~370 at w=11, so acap 512 / qcap 384 cover real
            # reads while halving collect volume and the chain scan;
            # the rare denser read overflow-flags to the exact host
            # path (throughput-only trade)
            if pad_len <= 2048:
                qcap, acap = 384, 512
            elif pad_len <= 8192:
                qcap = max(256, pad_len // 4)
                acap = pad_len // 2 if pad_len <= 4096 else pad_len // 4
            else:
                # long buckets: measured n_a on the 16 kb MHC workload
                # is mean 1413 / max 1943 (~L/9), so L/6 rounded to the
                # tile keeps ~1.4x headroom while narrowing the
                # backtrack/pack planes and the anchor sort ~1.5x; a
                # denser read overflow-flags to the exact host path
                # (throughput-only trade, like the r4 2 kb caps)
                qcap = pad_len // 4
                acap = (pad_len // 6 // 128) * 128
            do_chain = self.chain_enabled
            # window policy (chain_window=None): on the chip the chain
            # runs as a Pallas kernel with the window in VMEM, so a
            # window covering the measured scan reach of 15 kb MHC
            # reads (p100 ~524 anchors) is affordable — W=768 makes
            # essentially every long read chain-sure.  The CPU/XLA
            # test path keeps the narrow long-bucket window (its scan
            # pays per-step launch overhead); an unsure chain re-runs
            # its DP on host — never a parity risk, only throughput.
            if self.chain_window is not None:
                win = min(self.chain_window, acap)
            elif use_pallas:
                # short buckets: W=acap means no window flag can fire
                # below the anchor cap (W=512 at acap=512 for 2 kb);
                # W=1024 at B=256 blew the 16 MB scoped-vmem limit
                # (6 window planes + shift temps + outputs ~ 18.4 MB)
                win = min(512 if pad_len <= 4096 else 768, acap)
            else:
                win = min(1024 if pad_len <= 4096 else 256, acap)
            opt = self.opt

            # NB: index tables are runtime args, NOT closure constants —
            # baking MB-sized tables into the jit can wedge the axon
            # remote compiler for ~30 min (see .claude/skills/verify).
            if self.hashed:
                from ..ops.anchors_hash import collect_anchors_exact_hash

                import os as _os
                narrow = bool(_os.environ.get("MGT_NARROW_QCOMPACT"))

                def collect_body(t1, t2, t3, t4, codes, lens, max_occ):
                    sp = sketch_planes(codes, lens, self.gi.w, self.gi.k)
                    res = collect_anchors_exact_hash(
                        t1, t2, t3, t4, sp.hh, sp.hl, sp.meta,
                        sp.t_hh, sp.t_hl, sp.t_meta, max_occ,
                        hbits=self.ji.hbits, occ_cap=self.occ_cap,
                        qcap=qcap, acap=acap, b_chunk=self.b_chunk,
                        narrow=narrow)
                    res["overflow"] = res["overflow"] | sp.overflow
                    # cnt <= 255 decides every occurrence test
                    # (max_occ caps at 250); u8 shrinks the fetch
                    res["q_cnt"] = jnp.clip(res["q_cnt"], 0, 255) \
                        .astype(jnp.uint8)
                    return res

                tables = (self.ji.tag, self.ji.pay, self.ji.p_rid,
                          self.ji.p_sel)
            else:
                def collect_body(t1, t2, codes, lens, max_occ):
                    sp = sketch_planes(codes, lens, self.gi.w, self.gi.k)
                    res = collect_anchors_exact(
                        t1, t2, sp.hh, sp.hl, sp.meta,
                        sp.t_hh, sp.t_hl, sp.t_meta, max_occ,
                        occ_cap=self.occ_cap, qcap=qcap, acap=acap,
                        b_chunk=self.b_chunk)
                    res["overflow"] = res["overflow"] | sp.overflow
                    res["q_cnt"] = jnp.clip(res["q_cnt"], 0, 255) \
                        .astype(jnp.uint8)
                    return res

                tables = (self.ji.keymat, self.ji.keyext)

            def chain_body(axh, axl, ayh, ayl, n_a):
                if use_pallas:
                    import os as _os
                    # round-5 chunked-walk kernel (evaluates the
                    # measured ~26-row scan, not the p99 window;
                    # ops/chain_chunked_pallas.py) — opt-in until
                    # measured on the chip; requires the iteration
                    # clamp to clear the buffer
                    if (_os.environ.get("MGT_CHAIN_CHUNKED")
                            and opt.max_lc_iter >= win + min(128, acap)
                            and win >= 128):
                        from ..ops.chain_chunked_pallas import \
                            chain_chunked_pallas_traced as _chain_tr
                    else:
                        from ..ops.chain_exact_pallas import \
                            chain_exact_pallas_traced as _chain_tr
                    f, p, sure = _chain_tr(
                        axh, axl, ayh, ayl, n_a, int(self.mdx_adj),
                        int(self.mdy_adj), int(opt.bw),
                        int(opt.max_lc_skip), int(opt.max_lc_iter),
                        float(self.chn_pen_gap),
                        float(self.chn_pen_skip),
                        window=win, tile=min(128, acap))
                else:
                    ax = u32.to_u64(axh, axl)
                    ay = u32.to_u64(ayh, ayl)
                    f, p, v, sure = lchain_dp_exact_win(
                        ax, ay, n_a, jnp.int32(self.mdx_adj),
                        jnp.int32(self.mdy_adj), jnp.int32(opt.bw),
                        jnp.int32(opt.max_lc_skip),
                        jnp.int32(opt.max_lc_iter),
                        jnp.float32(self.chn_pen_gap),
                        jnp.float32(self.chn_pen_skip),
                        window=win, tile=8)
                return f.astype(jnp.int32), p.astype(jnp.int32), sure

            # dense anchor compaction: the padded (B, acap) planes are
            # ~70% empty on real reads, and the d2h fetch is the
            # steady-state bottleneck on a tunneled chip.  Scatter the
            # live anchors of all reads into flat planes of HALF the
            # padded size (ay packed to one u32: occ8|tandem1|span6|
            # qpos17 — span <= 31 by construction, reads <= 128 kb),
            # cutting the fetch ~3.5x; a fuller-than-half batch sets
            # flat_ovf and gather() re-runs it through the padded path.
            cap_flat = (dict(self.buckets)[pad_len] * acap) // 2

            cap_mini = (dict(self.buckets)[pad_len] * qcap * 3) // 4

            cap_u = dict(self.buckets)[pad_len] * 8

            def pack_body(axh, axl, ayh, ayl, uinfo, n_a, q_cnt, q_meta,
                          n_q, max_occ):
                B = axh.shape[0]
                ar = jnp.arange(acap, dtype=jnp.int32)[None, :]
                valid = ar < n_a[:, None]
                prefix = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32),
                     jnp.cumsum(n_a.astype(jnp.int32))])[:B]
                idx = jnp.where(valid, prefix[:, None] + ar, cap_flat)
                idx = idx.reshape(-1)

                def flat(v):
                    return jnp.zeros(cap_flat, v.dtype) \
                        .at[idx].set(v.reshape(-1), mode="drop")

                ay_pk = ((ayh >> jnp.uint32(24)) << jnp.uint32(24)) \
                    | (((ayh >> jnp.uint32(10)) & jnp.uint32(1))
                       << jnp.uint32(23)) \
                    | ((ayh & jnp.uint32(0x3F)) << jnp.uint32(17)) \
                    | (ayl & jnp.uint32(0x1FFFF))
                # rep_len + mini_pos on device (derive_query_info /
                # collect_matches, map-algo.c:67-89): q_cnt is clipped
                # at 255 >= every max_occ, so the comparison is exact
                qr = jnp.arange(qcap, dtype=jnp.int32)[None, :]
                q_ok = qr < n_q[:, None]
                cnt = q_cnt.astype(jnp.int32)
                rep = q_ok & (cnt >= max_occ)
                qpos = ((q_meta >> jnp.uint32(1))
                        & jnp.uint32((1 << 25) - 1)).astype(jnp.int32)
                span = ((q_meta >> jnp.uint32(26))
                        & jnp.uint32(0x1F)).astype(jnp.int32)
                # union of rep intervals [en-sp, en): ens ascend per
                # read, so coverage is sum(max(0, en - max(st, prev
                # rep en))) with an exclusive running max
                en = jnp.where(rep, qpos + 1, 0)
                run = jax.lax.cummax(en, axis=1)
                prev_en = jnp.concatenate(
                    [jnp.zeros((B, 1), jnp.int32), run[:, :-1]], axis=1)
                st = qpos + 1 - span
                contrib = jnp.where(
                    rep, jnp.maximum(0, (qpos + 1)
                                     - jnp.maximum(st, prev_en)), 0)
                rep_len = contrib.sum(axis=1).astype(jnp.int32)
                # mini_pos = qpos of non-rep emissions, dense-packed
                mini_sel = q_ok & ~rep
                n_mini = mini_sel.sum(axis=1).astype(jnp.int32)
                mprefix = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32), jnp.cumsum(n_mini)])[:B]
                mrank = jnp.cumsum(mini_sel.astype(jnp.int32),
                                   axis=1) - 1
                midx = jnp.where(mini_sel, mprefix[:, None] + mrank,
                                 cap_mini).reshape(-1)
                f_mini = jnp.zeros(cap_mini, jnp.int32) \
                    .at[midx].set(qpos.reshape(-1), mode="drop")
                out = {"f_axh": flat(axh), "f_axl": flat(axl),
                       "f_ay": flat(ay_pk), "prefix": prefix,
                       "rep_len": rep_len, "n_mini": n_mini,
                       "mprefix": mprefix, "f_mini": f_mini,
                       "flat_ovf": (jnp.sum(n_a) > cap_flat)
                       | (jnp.sum(n_mini) > cap_mini)}
                if uinfo is not None:
                    # chain records (sc, cnt) dense-packed into the
                    # header (small: a few chains per read)
                    u_sc, u_cnt, n_u = uinfo
                    ucap_w = u_sc.shape[1]
                    ur = jnp.arange(ucap_w, dtype=jnp.int32)[None, :]
                    u_ok = ur < n_u[:, None]
                    uprefix = jnp.concatenate(
                        [jnp.zeros(1, jnp.int32),
                         jnp.cumsum(n_u.astype(jnp.int32))])[:B]
                    uidx = jnp.where(u_ok, uprefix[:, None] + ur,
                                     cap_u).reshape(-1)
                    out["u_sc"] = jnp.zeros(cap_u, jnp.int32) \
                        .at[uidx].set(u_sc.reshape(-1), mode="drop")
                    out["u_cnt"] = jnp.zeros(cap_u, jnp.int32) \
                        .at[uidx].set(u_cnt.reshape(-1), mode="drop")
                    out["n_u"] = n_u
                    out["uprefix"] = uprefix
                    out["flat_ovf"] = out["flat_ovf"] \
                        | (jnp.sum(n_u) > cap_u)
                return out

            # wire layout of the single fetched buffer: every result
            # leaf fetched separately pays its own tunnel round trip
            # (measured ~96 ms for 1.44 MB over ~12 leaves vs a
            # ~6.6 ms RTT floor), so the step concatenates everything
            # into ONE u32 vector and gather() unpacks host-side with
            # zero-copy numpy views.  [(key, shape, dtype), ...],
            # filled at trace time (shapes are static per bucket).
            pack_layout: list = []
            meta: dict = {}

            def step_body(*args):
                *tbl, codes, lens, max_occ = args
                res = collect_body(*tbl, codes, lens, max_occ)
                if do_chain:
                    # chain DP + EXACT backtrack/compaction on device
                    # (ops/backtrack_jax.py): the host only ever needs
                    # surviving-chain anchors (even the long-join
                    # rescue re-chains the compacted set, mgt_tail.c
                    # :186-227), and chains are 3-10x fewer than raw
                    # anchors — which is what the 13-29 MB/s tunnel
                    # fetch pays for.  Unsure lanes (chain flag, step
                    # budget, ucap) fall back to the exact host path.
                    from ..ops.backtrack_jax import backtrack_compact
                    f, p, sure = chain_body(res["axh"], res["axl"],
                                            res["ayh"], res["ayl"],
                                            res["n_a"])
                    bt = backtrack_compact(
                        f, p, res["n_a"], res["axh"], res["axl"],
                        res["ayh"], res["ayl"],
                        min_cnt=int(opt.min_lc_cnt),
                        min_sc=int(opt.min_lc_score),
                        max_drop=int(opt.bw), ucap=64)
                    res["sure"] = sure & ~bt["bt_unsure"]
                    pk_axh, pk_axl = bt["c_axh"], bt["c_axl"]
                    pk_ayh, pk_ayl = bt["c_ayh"], bt["c_ayl"]
                    pk_n = bt["n_v"]
                    uinfo = (bt["u_sc"], bt["u_cnt"], bt["n_u"])
                    full = {"axh": pk_axh, "axl": pk_axl,
                            "ayh": pk_ayh, "ayl": pk_ayl,
                            "u_pad_sc": bt["u_sc"],
                            "u_pad_cnt": bt["u_cnt"],
                            "q_cnt": res.pop("q_cnt"),
                            "q_meta": res.pop("q_meta")}
                    res["n_a"] = pk_n
                    res.pop("axh"), res.pop("axl")
                    res.pop("ayh"), res.pop("ayl")
                else:
                    pk_axh, pk_axl = res["axh"], res["axl"]
                    pk_ayh, pk_ayl = res["ayh"], res["ayl"]
                    pk_n = res["n_a"]
                    uinfo = None
                    full = {k: res.pop(k)
                            for k in ("axh", "axl", "ayh", "ayl",
                                      "q_cnt", "q_meta")
                            if k in res}
                flat = pack_body(pk_axh, pk_axl, pk_ayh, pk_ayl,
                                 uinfo, pk_n,
                                 full["q_cnt"], full["q_meta"],
                                 res["n_q"], max_occ)
                res.update(flat)
                # layout: [header | anchor records | mini].  The flat
                # anchor planes are interleaved into R-word records so
                # ONE contiguous prefix slice carries every live
                # anchor: the tunnel moves ~13-29 MB/s, and at typical
                # fill (~30% of cap_flat) fetching the pad slack costs
                # more than the whole device compute.  gather() slices
                # by a per-bucket high-water fill mark; header scalars
                # always come along (they hold the true fills).
                rec_keys = [k for k in ("f_axh", "f_axl", "f_ay",
                                        "f_fp") if k in res]
                mini = res.pop("f_mini")
                recs = [res.pop(k) for k in rec_keys]
                pack_layout.clear()     # retrace resets the layout
                parts = []
                for k in sorted(res):
                    v = res[k]
                    if v.dtype == jnp.bool_:
                        v = v.astype(jnp.uint32).reshape(-1)
                        dt = np.dtype(bool)
                    else:
                        dt = np.dtype(v.dtype.name)
                        v = v.reshape(-1).view(jnp.uint32)
                    pack_layout.append((k, tuple(res[k].shape), dt,
                                        int(np.prod(v.shape))))
                    parts.append(v)
                hdr_words = sum(w for *_x, w in pack_layout)
                rec = jnp.stack([r.view(jnp.uint32) for r in recs],
                                axis=1).reshape(-1)
                meta["hdr"] = hdr_words
                meta["R"] = len(rec_keys)
                meta["rec_keys"] = rec_keys
                meta["mini_off"] = hdr_words + len(rec_keys) * cap_flat
                parts.append(rec)
                parts.append(mini.view(jnp.uint32))
                return jnp.concatenate(parts), full

            def unpack(buf_np, n_rec=None, n_mini_w=None):
                """Parse a fetched prefix: header + the first n_rec
                anchor records + n_mini_w mini words (defaults = all,
                for a full-buffer fetch)."""
                res = {}
                off = 0
                for k, shape, dt, words in pack_layout:
                    sl = buf_np[off: off + words]
                    off += words
                    res[k] = ((sl != 0) if dt == np.dtype(bool)
                              else sl.view(dt)).reshape(shape)
                R = meta["R"]
                if n_rec is None:
                    n_rec = cap_flat
                    n_mini_w = cap_mini
                    rec = buf_np[off: off + R * cap_flat]
                    mini = buf_np[meta["mini_off"]:
                                  meta["mini_off"] + cap_mini]
                else:
                    rec = buf_np[off: off + R * n_rec]
                    mini = buf_np[off + R * n_rec:
                                  off + R * n_rec + n_mini_w]
                rec = rec.reshape(-1, R)
                for i, k in enumerate(meta["rec_keys"]):
                    res[k] = rec[:, i] if k == "f_fp" \
                        else rec[:, i].view(np.uint32)
                res["f_mini"] = mini.view(np.int32)
                return res

            if use_pallas:
                # ONE dispatch per batch: on the tunneled chip every
                # chained dispatch costs ~5 ms of host/tunnel overhead
                # (and a cold sync round-trip ~25 ms), so the fused
                # sketch+collect+chain+pack program — all Pallas or
                # u32 XLA, nothing needs x64 — sets the floor at one.
                # Pallas under x64 is rejected by the axon remote
                # compiler (and Mosaic cannot lower the i64 indices
                # x64 introduces), so trace/call with x64 off; the
                # flag is part of the jit cache key, so it must be
                # off on EVERY call.
                fused = jax.jit(step_body)

                def step(codes, lens, max_occ):
                    prev = jax.config.jax_enable_x64
                    if prev:
                        jax.config.update("jax_enable_x64", False)
                    try:
                        return fused(*tables, codes, lens, max_occ)
                    finally:
                        if prev:
                            jax.config.update("jax_enable_x64", True)
            else:
                # CPU (test-mesh) path: separate jits, x64 tolerated
                jitted = jax.jit(step_body)

                def step(codes, lens, max_occ):
                    return jitted(*tables, codes, lens, max_occ)

            # stage bodies for profilers (tools/devprof.py)
            step._stages = {"collect": collect_body, "chain": chain_body,
                            "pack": pack_body, "tables": tables,
                            "acap": acap, "qcap": qcap, "win": win}
            step._unpack = unpack
            step._meta = meta
            step._caps = (cap_flat, cap_mini)
            # raw traceable body (tables, codes, lens, max_occ) ->
            # (packed buf, full planes): lets the multichip dryrun jit
            # the PRODUCTION fused step under explicit mesh shardings
            step._traceable = step_body
            self._fns[pad_len] = fn = step
        return fn

    def eligible(self, opt: MapOptions, n_segs: int, qlen_sum: int) -> bool:
        from ..options import DBG
        if DBG["flag"]:
            return False
        if n_segs != 1 or qlen_sum == 0 or qlen_sum > self.max_len:
            return False
        if opt.flag & (MG_M_HEAP_SORT | MG_M_NO_DIAG):
            return False
        if opt.max_qlen > 0 and qlen_sum > opt.max_qlen:
            return False
        if opt.occ_max1 > 255:
            # the device occurrence plane saturates at uint8, so the
            # host's cnt >= occ_max1 repeat test (computed pre-
            # saturation) cannot be reproduced; take the host path
            return False
        return True

    def submit(self, seqs: List[str]):
        """Dispatch the device seed stage for a list of reads without
        blocking on results (jax dispatch is asynchronous), so the
        caller can overlap host work with device compute — the
        kt_pipeline analog (kthread.c:97-128, gmap.c:177).

        Returns an opaque handle for gather()."""
        from ..ops.sketch_jax import encode_batch

        by_bucket: Dict[int, List[int]] = {}
        for i, s in enumerate(seqs):
            for pad_len, bsz in self.buckets:
                if len(s) <= pad_len:
                    by_bucket.setdefault(pad_len, []).append(i)
                    break
        max_occ = np.int32(self.opt.occ_max1)
        pending = []
        self.last_submit_cold = any(p not in self._hot_buckets
                                    for p in by_bucket)
        self._hot_buckets.update(by_bucket)
        for pad_len, idxs in by_bucket.items():
            bsz = dict(self.buckets)[pad_len]
            fn = self._fn(pad_len)
            for c0 in range(0, len(idxs), bsz):
                chunk = idxs[c0: c0 + bsz]
                reads = [seqs[i] for i in chunk]
                # pad the batch to the compiled size
                reads += [""] * (bsz - len(reads))
                codes, lens = encode_batch(reads, pad_to=pad_len)
                res, full = fn(codes, lens, max_occ)
                # start the device->host transfer now so it overlaps
                # the host tail work of the PREVIOUS batch (the fetch
                # is the largest serial cost on a tunneled chip);
                # gated until the first-call wedge probe has drained.
                # Redundant when the background device_get thread does
                # the fetch (the default), so only used without it.
                if self._async_ok and not self.thread_fetch:
                    try:
                        res.copy_to_host_async()
                    except AttributeError:
                        pass
                # predictive prefix slice: fetch header + the live
                # anchor records + live mini words only, sized by the
                # bucket's high-water fill (x1.3 headroom, rounded up
                # to cap/8 so the lazily-built slice programs stay
                # few).  ~30% typical fill -> ~3x fewer bytes through
                # the 13-29 MB/s tunnel; gather() refetches the full
                # regions when the true fill exceeds the slice.
                cap_flat_b, cap_mini_b = fn._caps
                pred = self._fill_pred.setdefault(
                    pad_len, [cap_flat_b // 2, cap_mini_b // 2])
                qstep_a = max(1, cap_flat_b // 8)
                qstep_m = max(1, cap_mini_b // 8)
                ta = min(cap_flat_b, -(-pred[0] // qstep_a) * qstep_a)
                tm = min(cap_mini_b, -(-pred[1] // qstep_m) * qstep_m)
                mt = fn._meta
                k1 = mt["hdr"] + mt["R"] * ta
                sl = (res[0:k1], res[mt["mini_off"]:
                                     mt["mini_off"] + tm], ta, tm)
                # background fetch: device_get releases the GIL, so
                # the tunnel transfer overlaps the host tails of the
                # previous batch even before the async-copy probe has
                # drained (and regardless of its effectiveness)
                th = holder = None
                if self.thread_fetch:
                    import threading
                    import jax as _jax
                    holder = {}

                    def _bg(sl=sl, holder=holder):
                        try:
                            holder["v"] = _jax.device_get(
                                (sl[0], sl[1]))
                        except Exception as e:  # fall back in gather()
                            holder["e"] = e

                    th = threading.Thread(target=_bg, daemon=True)
                    th.start()
                pending.append((chunk, res, full, th, holder, fn, sl))
        return (len(seqs), pending)

    def _fetch_parsed(self, entry):
        """Join the bg fetch of one pending chunk, parse the packed
        buffer (refetching on slice undershoot / flat overflow) and
        update the fill predictor.  Returns the parsed res dict."""
        import jax

        chunk, res, full, th, holder, fn, sl = entry
        if th is not None:
            th.join()
        if holder and "v" in holder:
            a1, a2 = holder["v"]
        else:
            a1, a2 = jax.device_get((sl[0], sl[1]))
        ta, tm = sl[2], sl[3]
        parsed = fn._unpack(np.concatenate([a1, a2]),
                            n_rec=ta, n_mini_w=tm)
        t_true = int(parsed["n_a"].sum())
        m_true = int(parsed["n_mini"].sum())
        # high-water fill predictor: x1.3 headroom, slow decay
        for pl in list(self._fns):
            if self._fns[pl] is fn:
                pr = self._fill_pred.setdefault(
                    pl, [t_true, m_true])
                pr[0] = max(int(t_true * 1.3), (pr[0] * 7) // 8)
                pr[1] = max(int(m_true * 1.3), (pr[1] * 7) // 8)
                break
        if t_true > ta or m_true > tm:
            # slice undershot the true fill: refetch full regions
            self.n_slice_refetch += 1
            parsed = fn._unpack(jax.device_get(res))
        if parsed.get("flat_ovf"):
            # batch fuller than the half-size flat planes: fetch
            # the padded planes kept on device instead (rare)
            self.n_flat_ovf += 1
            parsed.update(jax.device_get(full))
        return parsed

    def gather_flat(self, handle):
        """Batch-array variant of gather() for the native hybrid
        batch: no per-read Python objects.  Returns (flat, extra)
        where flat is a list of (positions-in-submit-order int array,
        blob dict of batch arrays) consumed by _map_batch_native's
        fr_flat path, and extra maps positions to FrontResult-or-None
        for chunks that cannot go flat (padded-path refetch)."""
        n_seqs, pending = handle
        flat = []
        extra = {}
        for entry in pending:
            chunk = entry[0]
            res = self._fetch_parsed(entry)
            if "axh" in res or not self.chain_enabled:
                # padded-path refetch or a non-chain front: fall back
                # to per-read results for this chunk
                sub = self._chunk_results(chunk, res)
                for ri, fr in zip(chunk, sub):
                    extra[ri] = fr
                continue
            ovf = res["overflow"]
            sure = res["sure"]
            ok = np.asarray(~ovf[:len(chunk)] & sure[:len(chunk)])
            self.n_fallback += int(ovf[:len(chunk)].sum())
            self.n_chain_unsure += int(
                (~sure[:len(chunk)] & ~ovf[:len(chunk)]).sum())
            self.n_device += int(ok.sum())
            for bi in np.nonzero(~ok)[0]:
                extra[chunk[bi]] = None
            sel = np.nonzero(ok)[0]
            if not len(sel):
                continue
            AX = (res["f_axh"].astype(U64) << U64(32)) \
                | res["f_axl"].astype(U64)
            PK = res["f_ay"].astype(U64)
            AY = ((PK >> U64(24)) << U64(56)) \
                | (((PK >> U64(23)) & U64(1)) << U64(42)) \
                | (((PK >> U64(17)) & U64(0x3F)) << U64(32)) \
                | (PK & U64(0x1FFFF))
            U = (res["u_sc"].astype(U64) << U64(32)) \
                | res["u_cnt"].astype(U64)
            MINI = np.ascontiguousarray(res["f_mini"], dtype=np.int64)
            blob = {"AX": np.ascontiguousarray(AX),
                    "AY": np.ascontiguousarray(AY),
                    "U": np.ascontiguousarray(U), "MINI": MINI,
                    "prefix": res["prefix"][sel],
                    "n_a": res["n_a"][sel],
                    "uprefix": res["uprefix"][sel],
                    "n_u": res["n_u"][sel],
                    "mprefix": res["mprefix"][sel],
                    "n_mini": res["n_mini"][sel],
                    "rep_len": res["rep_len"][sel],
                    "n_q": res["n_q"][sel]}
            flat.append((np.asarray([chunk[b] for b in sel]), blob))
        return flat, extra

    def gather(self, handle) -> List[Optional[FrontResult]]:
        """Fetch the results of a submit(); one FrontResult per read,
        or None where the read must take the host path (overflow)."""
        n_seqs, pending = handle
        out: List[Optional[FrontResult]] = [None] * n_seqs
        for entry in pending:
            chunk = entry[0]
            res = self._fetch_parsed(entry)
            for ri, fr in zip(chunk, self._chunk_results(chunk, res)):
                out[ri] = fr
        return out

    def _chunk_results(self, chunk, res):
        """Per-read FrontResults for one parsed chunk (shared by
        gather and gather_flat's fallback)."""
        out: List[Optional[FrontResult]] = [None] * len(chunk)
        if len(chunk):
            ovf = res["overflow"]
            sure = res.get("sure")
            n_a = res["n_a"]
            n_q = res["n_q"]
            flat = "axh" not in res
            if flat:
                # dense planes: ay packed occ8|tandem1|span6|qpos17
                prefix = res["prefix"]
                AX = (res["f_axh"].astype(U64) << U64(32)) \
                    | res["f_axl"].astype(U64)
                PK = res["f_ay"].astype(U64)
                AY = ((PK >> U64(24)) << U64(56)) \
                    | (((PK >> U64(23)) & U64(1)) << U64(42)) \
                    | (((PK >> U64(17)) & U64(0x3F)) << U64(32)) \
                    | (PK & U64(0x1FFFF))
                mini_flat = res["f_mini"].astype(np.int64)
                mprefix = res["mprefix"]
                n_mini = res["n_mini"]
                rep_lens = res["rep_len"]
                u_sc_f = res.get("u_sc")
                if u_sc_f is not None:
                    U_all = (u_sc_f.astype(np.uint64) << U64(32)) \
                        | res["u_cnt"].astype(np.uint64)
                    n_u_h = res["n_u"]
                    uprefix = res["uprefix"]
            else:
                # padded (B, acap) planes; device ayh =
                # occ<<24|tandem<<10|span, host layout =
                # occ<<56|seg<<48|tandem<<42|span<<32 | qpos
                AX = (res["axh"].astype(U64) << U64(32)) \
                    | res["axl"].astype(U64)
                AH = res["ayh"].astype(U64)
                AY = ((AH >> U64(24)) << U64(56)) \
                    | (((AH >> U64(10)) & U64(1)) << U64(42)) \
                    | ((AH & U64(0x3FF)) << U64(32)) \
                    | res["ayl"].astype(U64)
                u_pad = res.get("u_pad_sc")
                if u_pad is not None:
                    U_pad = (u_pad.astype(np.uint64) << U64(32)) \
                        | res["u_pad_cnt"].astype(np.uint64)
            chains_mode = self.chain_enabled
            for bi in range(len(chunk)):
                if ovf[bi]:
                    self.n_fallback += 1
                    continue
                if chains_mode and sure is not None and not sure[bi]:
                    # chain DP or backtrack flagged: the compacted
                    # chains are unusable, re-run the read on the
                    # exact host path from scratch
                    self.n_chain_unsure += 1
                    continue
                n = int(n_a[bi])
                if flat:
                    p0 = int(prefix[bi])
                    sl = slice(p0, p0 + n)
                    m0 = int(mprefix[bi])
                    mini_pos = mini_flat[m0: m0 + int(n_mini[bi])]
                    rep_len = int(rep_lens[bi])
                else:
                    sl = (bi, slice(0, n))
                    rep_len, mini_pos = derive_query_info(
                        res["q_cnt"][bi], res["q_meta"][bi],
                        int(n_q[bi]), int(self.opt.occ_max1))
                ax = AX[sl]
                ay = AY[sl]
                ub = None
                if chains_mode:
                    if flat:
                        u0 = int(uprefix[bi])
                        ub = U_all[u0: u0 + int(n_u_h[bi])]
                    else:
                        ub = U_pad[bi, : int(res["n_u"][bi])] \
                            if u_pad is not None else None
                out[bi] = FrontResult(ax=ax, ay=ay, rep_len=rep_len,
                                      mini_pos=mini_pos,
                                      n_mv=int(n_q[bi]), u=ub)
                self.n_device += 1
        return out

    def run_batch(self, seqs: List[str]) -> List[Optional[FrontResult]]:
        """Synchronous submit + gather."""
        return self.gather(self.submit(seqs))

    def log_stats(self):
        from ..utils.syslog import mlog
        tot = self.n_device + self.n_fallback
        if tot:
            mlog("device_front",
                 f"device seed stage: {self.n_device}/{tot} reads on "
                 f"device, {self.n_fallback} host fallbacks, "
                 f"{self.n_chain_unsure} chain-DP host reruns, "
                 f"{self.n_flat_ovf} flat-plane refetches")
        if self._wfa_pool is not None:
            mlog("device_front",
                 f"device -c gap WFA: {self._wfa_pool.n_device} on "
                 f"device, {self._wfa_pool.n_host} host")
