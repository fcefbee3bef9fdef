"""Per-read mapping pipeline (mg_map_frag, map-algo.c:340-502) and the
file-level mapping driver (mg_map_files, gmap.c:163-211)."""
from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np

from ..graph.gfa import Graph
from ..index.midx import MinimizerIndex, build_index
from ..options import (MG_M_CAL_COV, MG_M_CIGAR, MG_M_FRAG_MERGE,
                       MG_M_FRAG_MODE, MG_M_HEAP_SORT, MG_M_INDEPEND_SEG,
                       MG_M_NO_DIAG as _MG_M_NO_DIAG, MG_M_RMQ,
                       MG_M_SPLICE, MG_M_SR, MG_M_VERTEX_COOR,
                       MG_M_WRITE_LCHAIN, MG_M_WRITE_MZ, MG_MAX_SEG,
                       GGOptions, IndexOptions, MapOptions)
from ..utils.hashes import expf, kh_hash_str, kh_hash_uint32
from ..utils.ksort import radix_argsort
from ..seqio.bseq import BSeqFile, qname_same, toupper
from ..seqio.gaf import write_gaf
from .gchain import GChains, gchain_gen, gchain1_dp
from .lchain import lchain_dp, lchain_gen, lchain_rmq, update_anchors
from .seeds import collect_minimizers, collect_seed_hits
from .select import (gchain_drop_flt, gchain_flt_sub, gchain_set_mapq,
                     gchain_set_parent)

U32 = 0xFFFFFFFF

# flags whose output shape the native GAF formatter does not handle;
# reads carrying any of these go through the Python serializer
_EMIT_BAIL_FLAGS = (MG_M_CIGAR | MG_M_CAL_COV | MG_M_FRAG_MODE
                    | MG_M_FRAG_MERGE | MG_M_WRITE_LCHAIN
                    | MG_M_WRITE_MZ | MG_M_VERTEX_COOR | MG_M_SPLICE)
# -c no longer bails: the batch driver runs the base-level stage
# (CIGAR + ds) natively inside the workers
_EMIT_BAIL_NOCIG = _EMIT_BAIL_FLAGS & ~MG_M_CIGAR
# the batch driver also handles merged paired-end fragments (heap
# collection + ql:B:i emission); only these output shapes still bail
_EMIT_BAIL_BATCH = (MG_M_CAL_COV | MG_M_WRITE_LCHAIN | MG_M_WRITE_MZ
                    | MG_M_VERTEX_COOR | MG_M_SPLICE)


def _batch_mode_ok(flag: int) -> bool:
    """Flag shapes the native batch driver can serialize."""
    if flag & _EMIT_BAIL_BATCH:
        return False
    if flag & MG_M_FRAG_MODE:
        # merged-fragment output only; -c with fragments stays Python
        if not (flag & MG_M_FRAG_MERGE) or (flag & MG_M_CIGAR):
            return False
    return True


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


# --seed-device: route long-query sketching through the chunk-halo
# device sweep (ggs/asm contig seed stage on the chip); output is
# byte-identical, so this is a routing decision only
SEED_DEVICE = {"on": False, "min_len": 16384}


def map_frag(gi: MinimizerIndex, qlens: List[int], seqs: List[str],
             opt: MapOptions, qname: Optional[str],
             fast_emit: bool = False,
             gwfa_pool=None) -> Optional[GChains]:
    """Map one fragment (n_segs query segments) to the graph."""
    n_segs = len(qlens)
    qlen_sum = sum(qlens)
    if qlen_sum == 0 or n_segs <= 0 or n_segs > MG_MAX_SEG:
        return None
    if opt.max_qlen > 0 and qlen_sum > opt.max_qlen:
        return None

    from ..options import DBG as _DBG, MG_DBG_QNAME as _Q
    if _DBG["flag"] & _Q:
        sys.stderr.write(f"QR\t{qname}\t0\t{qlen_sum}\n")

    from ..options import MG_M_NO_DIAG as _ND
    res = None
    seed_dev = (SEED_DEVICE["on"]
                and qlen_sum >= SEED_DEVICE["min_len"]
                and not (opt.flag & MG_M_HEAP_SORT))
    if n_segs == 1 and not (opt.flag & (MG_M_HEAP_SORT | _ND)) \
            and not seed_dev and not (_DBG["flag"]):
        # whole seed stage in one native call (native/mgt_collect.c)
        from .seeds import collect_native
        res = collect_native(gi, opt, opt.occ_max1, seqs[0])
    if res is not None:
        ax, ay, rep_len, mini_pos, n_mv = res
    else:
        if seed_dev:
            # contig/chromosome-scale queries: the sketch runs on
            # device as overlapping chunks with exact halos
            # (index/midx_device.py chunk-halo argument; byte-
            # identical stream), stitched here — this is the ggs/asm
            # seed stage on the chip (--seed-device)
            from .seeds import collect_minimizers_device
            mv_x, mv_y = collect_minimizers_device(gi, qlens, seqs)
        else:
            mv_x, mv_y = collect_minimizers(gi, qlens, seqs)
        n_mv = len(mv_x)
        if opt.flag & MG_M_HEAP_SORT:
            from .seeds import collect_seed_hits_heap
            ax, ay, rep_len, mini_pos = collect_seed_hits_heap(
                gi, opt, opt.occ_max1, mv_x, mv_y)
        else:
            ax, ay, rep_len, mini_pos = collect_seed_hits(
                gi, opt, opt.occ_max1, mv_x, mv_y, qname)
    return map_frag_tail(gi, qlens, seqs, opt, qname,
                         ax, ay, rep_len, mini_pos, n_mv,
                         fast_emit=fast_emit, gwfa_pool=gwfa_pool)


def map_frag_tail(gi: MinimizerIndex, qlens: List[int], seqs: List[str],
                  opt: MapOptions, qname: Optional[str],
                  ax: np.ndarray, ay: np.ndarray, rep_len: int,
                  mini_pos: np.ndarray, n_mv: int,
                  chain_fp=None, chains_u=None, cigar_sink=None,
                  fast_emit: bool = False,
                  gwfa_pool=None) -> Optional[GChains]:
    """Per-read pipeline after seed collection (map-algo.c:377-495).

    Split out so the device front-end (mapping/device_front.py) can
    inject batched on-device anchors and continue byte-identically."""
    n_segs = len(qlens)
    qlen_sum = sum(qlens)
    hash_ = kh_hash_str(qname) if qname else 0
    hash_ ^= (kh_hash_uint32(qlen_sum & U32) + kh_hash_uint32(opt.seed)) & U32
    hash_ &= U32
    hash_ = kh_hash_uint32(hash_)

    from ..options import DBG, MG_DBG_SEED, MG_DBG_LCHAIN, MG_DBG_QNAME
    if DBG["flag"] & MG_DBG_SEED:
        _dump_seeds(gi, ax, ay, rep_len)

    def _ptime(t0, stage):
        # Q-stage timing lines (print_time, map-algo.c:332-338)
        import time
        t = time.time()
        sys.stderr.write(f"Q{stage}\t{qname}\t{t - t0:.3f}\n")
        return t

    dbg_q = bool(DBG["flag"] & MG_DBG_QNAME)
    if dbg_q:
        import time
        _qt = time.time()

    is_sr = bool(opt.flag & MG_M_SR)
    is_splice = bool(opt.flag & MG_M_SPLICE)
    if is_sr:
        max_chain_gap_qry = max(qlen_sum, opt.max_gap)
    else:
        max_chain_gap_qry = opt.max_gap
    if opt.max_gap_ref > 0:
        max_chain_gap_ref = opt.max_gap_ref
    elif opt.max_frag_len > 0:
        max_chain_gap_ref = max(opt.max_frag_len - qlen_sum, opt.max_gap)
    else:
        max_chain_gap_ref = opt.max_gap

    chn_pen_gap, chn_pen_skip = _chain_penalties(gi, opt)

    # whole-tail native path (native/mgt_tail.c): linear chain +
    # rescue + lchain tail + graph chain in ONE call; falls back to
    # the decomposed stages below for debug dumps / engine bailouts
    if len(ax) > 0:
        from .gchain import map_tail_full
        if chains_u is not None:
            # device-backtracked chains: ax/ay are compacted, mt_f
            # carries the u array, mt_dx its length (mode 3 skips the
            # whole linear-chain stage, native/mgt_tail.c)
            mt_mode, mt_f, mt_p = 3, chains_u, None
            mt_dx, mt_dy = len(chains_u), 0
        elif opt.flag & MG_M_RMQ:
            mt_mode, mt_f, mt_p = 2, None, None
            mt_dx, mt_dy = opt.max_gap, 0
        elif chain_fp is not None:
            mt_mode, mt_f, mt_p = 0, chain_fp[0], chain_fp[1]
            mt_dx, mt_dy = 0, 0
        else:
            mt_mode, mt_f, mt_p = 1, None, None
            mt_dx, mt_dy = max_chain_gap_ref, max_chain_gap_qry
        seq_cat = "".join(seqs)
        # selection runs natively too (native/mgt_select.c); the
        # returned GChains is final (gcs.selected) and the finish
        # stage only handles base alignment
        sel_args = (opt.mask_level, opt.pri_ratio, gi.k * 2,
                    opt.best_n, qlen_sum, n_mv, opt.min_gc_score,
                    rep_len)
        emit = None
        if fast_emit and n_segs == 1 \
                and not (opt.flag & _EMIT_BAIL_FLAGS):
            # plain single-segment GAF: serialize natively too
            emit = (qname or "", qlen_sum, opt.flag)
        gcs = map_tail_full(gi.g, gi.es, mt_mode, mt_f, mt_p, ax, ay,
                            mini_pos, opt, qlen_sum, n_segs, mt_dx,
                            mt_dy, chn_pen_gap, chn_pen_skip, is_splice,
                            hash_, seq_cat, select=sel_args, emit=emit,
                            gwfa_pool=gwfa_pool)
        if gcs is not None:
            from ..align.gwfa_device import GwfaPending
            if isinstance(gcs, GwfaPending):
                return gcs          # deferred: batch GWFA sink phase 1
            gcs.rep_len = rep_len
            return _map_frag_finish(gi, gcs, opt, qname, n_segs,
                                    seq_cat, qlen_sum, n_mv, cigar_sink)

    if chains_u is not None:
        # device chains: skip the linear-chain stage entirely
        n_lc = len(chains_u)
        u = np.ascontiguousarray(chains_u, dtype=np.uint64)
    elif len(ax) == 0:
        n_lc, u = 0, np.empty(0, dtype=np.uint64)
    elif opt.flag & MG_M_RMQ:
        ax, ay, n_lc, u = lchain_rmq(opt.max_gap, opt.max_gap_pre, opt.bw,
                                     opt.max_lc_skip, opt.rmq_size_cap,
                                     opt.min_lc_cnt, opt.min_lc_score,
                                     chn_pen_gap, chn_pen_skip, ax, ay)
    elif chain_fp is not None:
        # device-computed DP fill (ops/chain_exact.py); host backtrack
        from .lchain import lchain_dp_from_fp
        ax, ay, n_lc, u = lchain_dp_from_fp(
            chain_fp[0], chain_fp[1], opt.bw, opt.max_lc_skip,
            opt.min_lc_cnt, opt.min_lc_score, is_splice, ax, ay)
    else:
        ax, ay, n_lc, u = lchain_dp(max_chain_gap_ref, max_chain_gap_qry,
                                    opt.bw, opt.max_lc_skip, opt.max_lc_iter,
                                    opt.min_lc_cnt, opt.min_lc_score,
                                    chn_pen_gap, chn_pen_skip, is_splice,
                                    n_segs, ax, ay)

    # long-join rescue re-chain (map-algo.c:407-417)
    if opt.bw_long > opt.bw and not (opt.flag & (MG_M_SPLICE | MG_M_SR)) \
            and n_segs == 1 and n_lc > 1:
        st = _i32(int(ay[0]))
        en = _i32(int(ay[(int(u[0]) & U32) - 1]))
        if qlen_sum - (en - st) > opt.rmq_rescue_size \
                or qlen_sum - (en - st) > qlen_sum * opt.rmq_rescue_ratio:
            n_a = sum(int(u[i]) & U32 for i in range(n_lc))
            ax, ay = ax[:n_a], ay[:n_a]
            perm = radix_argsort(ax)
            ax, ay = ax[perm], ay[perm]
            ax, ay, n_lc, u = lchain_rmq(opt.max_gap, opt.max_gap_pre,
                                         opt.bw_long, opt.max_lc_skip,
                                         opt.rmq_size_cap, opt.min_lc_cnt,
                                         opt.min_lc_score, chn_pen_gap,
                                         chn_pen_skip, ax, ay)

    if dbg_q:
        _qt = _ptime(_qt, 1)
    # fused native tail (native/mgt_gchain.c): lchain_gen + filter
    # block + update_anchors in one call, chains kept as a table
    tab = None
    if n_lc and not (DBG["flag"] & MG_DBG_LCHAIN):
        from .lchain import lchain_tail_tab
        tab = lchain_tail_tab(qlen_sum, n_lc, u, ax, ay, mini_pos, opt)
    if tab is None:
        if n_lc:
            lc = lchain_gen(qlen_sum, n_lc, u, ax, ay)
            if n_lc > 1:
                from .filters import apply_chain_filters
                kept = []
                for p in lc:
                    off, cnt = apply_chain_filters(ax, ay, p.off, p.cnt,
                                                   p.score, opt)
                    p.off, p.cnt = off, cnt
                    if cnt >= opt.min_lc_cnt:
                        q_span = (int(ay[p.off]) >> 32) & 0xFF
                        p.rs = _i32(int(ax[p.off])) + 1 - q_span
                        p.qs = _i32(int(ay[p.off])) + 1 - q_span
                        p.re = _i32(int(ax[p.off + p.cnt - 1])) + 1
                        p.qe = _i32(int(ay[p.off + p.cnt - 1])) + 1
                        kept.append(p)
                lc = kept
            for p in lc:
                update_anchors(p, ax, ay, mini_pos)
        else:
            lc = []
        if DBG["flag"] & MG_DBG_LCHAIN:
            _dump_lchain(gi, lc, ax, ay, qname)
    if dbg_q:
        _qt = _ptime(_qt, 2)

    seq_cat = "".join(seqs)
    gcs = None
    if tab is not None and not dbg_q:
        # whole graph-chain stage in one native call
        from .gchain import gchain_full_tab
        gcs = gchain_full_tab(gi.g, gi.es, tab, qlen_sum, opt.bw_long,
                              opt.bw_long, opt.bw_long, opt.max_gc_skip,
                              opt.ref_bonus, chn_pen_gap, opt.mask_level,
                              ay, ax, hash_, opt.min_gc_cnt,
                              opt.min_gc_score, opt.gdp_max_ed, n_segs,
                              seq_cat)
    if gcs is None:
        if tab is not None:
            from .gchain import gchain1_dp_tab
            n_gc, u, lc = gchain1_dp_tab(gi.g, tab, qlen_sum, opt.bw_long,
                                         opt.bw_long, opt.bw_long,
                                         opt.max_gc_skip, opt.ref_bonus,
                                         chn_pen_gap, chn_pen_skip,
                                         opt.mask_level, ay)
        else:
            n_gc, u, lc = gchain1_dp(gi.g, lc, qlen_sum, opt.bw_long,
                                     opt.bw_long, opt.bw_long,
                                     opt.max_gc_skip, opt.ref_bonus,
                                     chn_pen_gap, chn_pen_skip,
                                     opt.mask_level, ay)
        if dbg_q:
            _qt = _ptime(_qt, 3)
        from .gchain import gchain_gen_tab
        gcs = gchain_gen_tab(gi.g, gi.es, n_gc, u, lc, ax, ay, hash_,
                             opt.min_gc_cnt, opt.min_gc_score,
                             opt.gdp_max_ed, n_segs, seq_cat)
    gcs.rep_len = rep_len
    if dbg_q:
        _qt = _ptime(_qt, 4)

    gcs = _map_frag_finish(gi, gcs, opt, qname, n_segs, seq_cat,
                           qlen_sum, n_mv, cigar_sink)
    if dbg_q:
        _qt = _ptime(_qt, 5)
        # QM memory-stat line (map-algo.c:485); no kalloc arenas here
        sys.stderr.write(f"QM\t{qname}\t{qlen_sum}\t"
                         f"cap=0,nCore=0,largest=0\n")
    return gcs


def _map_frag_finish(gi, gcs, opt, qname, n_segs, seq_cat, qlen_sum,
                     n_mv, cigar_sink):
    """Selection + mapq + base alignment (map-algo.c:464-483), shared
    by the whole-tail native path and the decomposed path.  When the
    native tail already ran mgt_select_chains (gcs.selected), only the
    base-alignment step remains."""
    if not getattr(gcs, "selected", False):
        gchain_set_parent(opt.mask_level, gcs.gc, opt.sub_diff, 0)
        gchain_flt_sub(opt.pri_ratio, gi.k * 2, opt.best_n, gcs.gc)
        gchain_drop_flt(gcs)
        gchain_set_mapq(gcs, qlen_sum, n_mv, opt.min_gc_score)
    if (opt.flag & MG_M_CIGAR) and n_segs == 1:
        if cigar_sink is not None:
            # device -c mode: defer the per-gap WFAs into the batch
            # pool (align/cigar_device.py); the driver finalizes
            from ..align.cigar_device import harvest_read
            cigar_sink.pending.append(harvest_read(
                gi.g, gi.es, seq_cat, gcs, qname, cigar_sink.jobs))
        else:
            from ..align.cigar import gchain_cigar, gchain_gen_ds
            gchain_cigar(gi.g, gi.es, seq_cat, gcs, qname)
            gchain_gen_ds(gi.g, gi.es, seq_cat, gcs)
    return gcs


def _dump_seeds(gi, ax, ay, rep_len):
    """--dbg-seed TSV (map-algo.c:370-375 format)."""
    out = [f"RS\t{rep_len}"]
    for i in range(len(ax)):
        x, y = int(ax[i]), int(ay[i])
        gap = 0 if i == 0 else (_i32(y) - _i32(int(ay[i - 1]))) \
            - (_i32(x) - _i32(int(ax[i - 1])))
        out.append(f"SD\t{gi.g.seg[x >> 33].name}\t{_i32(x)}\t"
                   f"{'+-'[(x >> 32) & 1]}\t{_i32(y)}\t{(y >> 32) & 0xFF}"
                   f"\t{gap}")
    sys.stderr.write("\n".join(out) + "\n")


def _dump_lchain(gi, lc, ax, ay, qname):
    """--dbg-lchain TSV (mg_print_lchain, format.c:90-119)."""
    out = []
    for p in lc:
        span = (int(ay[p.off]) >> 32) & 0xFF
        mlen = blen = span
        for j in range(1, p.cnt):
            ql_ = _i32(int(ay[p.off + j])) - _i32(int(ay[p.off + j - 1]))
            pl = _i32(int(ax[p.off + j])) - _i32(int(ax[p.off + j - 1]))
            blen += max(pl, ql_)
            mlen += span if (pl > span and ql_ > span) else min(pl, ql_)
        seg = gi.g.seg[p.v >> 1]
        row = [f"LC\t{qname}\t{p.qs}\t{p.qe}\t{'+-'[p.v & 1]}\t{seg.name}"
               f"\t{seg.len}\t{p.rs}\t{p.re}\t{p.score}\t{mlen}\t{blen}"
               f"\t{p.cnt}\t"]
        row.append("".join(f"{_i32(int(ay[p.off + j]))}," for j in range(p.cnt)))
        row.append("\t")
        row.append("".join(f"{_i32(int(ax[p.off + j]))}," for j in range(p.cnt)))
        row.append("\t")
        row.append("".join(f"{int(ay[p.off + j]) >> 56}," for j in range(p.cnt)))
        out.append("".join(row))
    if out:
        sys.stdout.write("\n".join(out) + "\n")


def map_one(gi: MinimizerIndex, seq: str, opt: MapOptions,
            qname: Optional[str] = None) -> Optional[GChains]:
    return map_frag(gi, [len(seq)], [seq], opt, qname)


def map_files(g: Graph, fns: List[str], ipt: IndexOptions, opt0: MapOptions,
              out=sys.stdout, cov: Optional[tuple] = None,
              n_threads: int = 1, device: bool = False,
              front_kwargs: Optional[dict] = None,
              gwfa_device: bool = False) -> int:
    """Index once, then map each query file (mg_map_files, gmap.c:186-211).

    With device=True the batched seed stage (sketch + index probe +
    anchor build) runs on the TPU (mapping/device_front.py); flagged
    reads fall back to the host path, so output stays byte-identical."""
    import copy
    opt = copy.copy(opt0)
    gi = build_index(g, ipt.k, ipt.w, opt)
    if gi is None:
        return -1
    front = None
    if device:
        from .device_front import DeviceFront
        front = DeviceFront(gi, opt, **(front_kwargs or {}))
    gwfa_pool = None
    if gwfa_device:
        from ..align.gwfa_device import DeviceGwfaPool
        gwfa_pool = DeviceGwfaPool(gi)
    c_seg = c_link = None
    if opt.flag & MG_M_CAL_COV:
        c_seg = np.zeros(g.n_seg, dtype=np.float64)
        c_link = np.zeros(g.n_arc, dtype=np.float64)
    frag_mode = bool(opt.flag & MG_M_FRAG_MODE)
    file_groups = [fns] if frag_mode and len(fns) > 1 else [[fn] for fn in fns]
    for group in file_groups:
        _map_file_frag(gi, group, opt, out, c_seg, c_link, n_threads,
                       front, gwfa_pool)
    if front is not None:
        front.log_stats()
    if gwfa_pool is not None:
        gwfa_pool.log_stats()
    if opt.flag & MG_M_CAL_COV:
        from ..ggen.cov import aux_update_cv
        aux_update_cv(g, "dc", c_seg, c_link)
    return 0


_batch_cfg = False


def _chain_penalties(gi, opt):
    """f32 chain penalties, cached per options object (map-algo.c:388)."""
    pen_key = (opt.div, gi.k, opt.chn_pen_gap, opt.chn_pen_skip)
    pen = getattr(opt, "_pen_cache", None)
    if pen is None or pen[0] != pen_key:
        tmp = expf(-np.float32(opt.div) * np.float32(gi.k))
        chn_pen_gap = float(np.float32(
            np.float32(opt.chn_pen_gap) * np.float32(tmp)))
        chn_pen_skip = float(np.float32(
            np.float32(opt.chn_pen_skip) * np.float32(tmp)))
        opt._pen_cache = (pen_key, chn_pen_gap, chn_pen_skip)
        return chn_pen_gap, chn_pen_skip
    return pen[1], pen[2]


def _ema(prev, x, alpha=0.4):
    """Exponential moving average with None start."""
    return x if prev is None else prev + alpha * (x - prev)


def _probe_interval(split):
    """Batches between device probes while the host owns the work.

    A probe maps ~a quarter batch through the device path, costing
    ~(n/4)*t_dev against interval*n*t_host of host work; sizing the
    interval to ~5x the cost ratio caps probe overhead at ~5%
    regardless of workload (for 15 kb reads t_dev/t_host is ~25x, so
    the old fixed 8 spent >50% of the wall on probes)."""
    td, th = split.get("t_dev"), split.get("t_host")
    if not td or not th:
        return 8
    return max(8, min(256, int(5.0 * td / th)))


def _map_batch_native(gi, opt, items, n_threads, host_collect=False,
                      blob=None, fr_map=None, frag_blob=None,
                      fr_flat=None):
    """Map a batch of reads anchors -> GAF text in ONE native call
    (native/mgt_batch.c: work-stealing pthread loop over mgt_map_tail
    + mgt_select_chains + mgt_format_gaf).  items is a list of
    (fi, qname, seq, FrontResult-or-None); with host_collect=True the
    FrontResult is ignored and the workers also run the seed stage
    (mgt_collect: sketch + probe + anchors), making the whole host
    mapping path one C call per batch.  Returns {fi: gaf_text or
    None-for-fallback}, or None when the batch driver is unavailable
    (caller uses the per-read path).

    blob mode: reads come straight from native-reader arenas; fr_map
    ({arena index k: FrontResult}) marks reads whose seed stage ran on
    the device — the workers skip the collect for those and consume
    the provided anchor planes (hybrid batch).  frag_blob =
    (n_seg_arr, seg_mid, qname_len) presents the blob as FRAGMENT
    items: the offsets in blob span whole fragments (mates adjacent in
    the arena) and qname_len[k] is the first mate's name length."""
    global _batch_cfg
    import ctypes as ct

    from ..options import (DBG, MG_M_NO_COMP_PATH, MG_M_PRINT_2ND,
                           MG_M_SHOW_UNMAP, MG_MAX_SHORT_K)
    from ..utils.native import get_lib
    from .gchain import _get_gaf_ctx, _get_gfull_ctx
    if DBG["flag"] or not _batch_mode_ok(opt.flag) \
            or (not items and blob is None):
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "mgt_map_tail_batch"):
        return None
    if not _batch_cfg:
        lib.mgt_map_tail_batch.restype = ct.c_int64
        lib.mgt_map_tail_batch.argtypes = (
            [ct.c_int64, ct.c_int64, ct.c_void_p, ct.c_void_p]
            + [ct.c_void_p] * 13                      # per-read arrays
            + [ct.c_int64] * 4 + [ct.c_void_p] * 3
            + [ct.c_int64, ct.c_void_p]               # host-collect ctx
            + [ct.c_void_p, ct.c_int64]               # probe table
            + [ct.c_int64, ct.c_void_p, ct.c_void_p]  # frag ctx
            + [ct.c_int64, ct.c_void_p]               # -c ctx
            + [ct.c_char_p, ct.c_void_p, ct.c_char_p, ct.c_void_p]
            + [ct.c_void_p]                           # qname_len
            + [ct.c_void_p] * 4 + [ct.c_int64, ct.c_void_p]
            + [ct.c_void_p] * 6 + [ct.c_char_p]       # graph ctx
            + [ct.c_char_p] + [ct.c_void_p] * 3
            + [ct.c_char_p] + [ct.c_void_p] * 4       # gaf name ctx
            + [ct.c_void_p] * 4)                      # out
        lib.mgt_buf_free.restype = None
        lib.mgt_buf_free.argtypes = [ct.c_void_p]
        _batch_cfg = True

    n = len(items) if blob is None else blob[0]
    if n == 0:
        return {}
    is_sr = bool(opt.flag & MG_M_SR)
    is_splice = bool(opt.flag & MG_M_SPLICE)
    is_rmq = bool(opt.flag & MG_M_RMQ)
    if opt.max_gap_ref > 0:
        mdx_dp = opt.max_gap_ref
    elif opt.max_frag_len > 0:
        mdx_dp = None  # depends on qlen; computed per read below
    else:
        mdx_dp = opt.max_gap
    chn_pen_gap, chn_pen_skip = _chain_penalties(gi, opt)
    do_rescue = int(opt.bw_long > opt.bw
                    and not (opt.flag & (MG_M_SPLICE | MG_M_SR)))
    gaf_flags = (int(bool(opt.flag & MG_M_PRINT_2ND))
                 | (int(bool(opt.flag & MG_M_NO_COMP_PATH)) << 1)
                 | (int(bool(opt.flag & MG_M_SHOW_UNMAP)) << 2)
                 | (int(bool(opt.flag & MG_M_FRAG_MERGE)) << 3))
    P = np.array([
        opt.bw, opt.max_lc_skip, opt.max_lc_iter, opt.min_lc_cnt,
        opt.min_lc_score, int(is_splice), opt.max_gap_pre,
        opt.rmq_size_cap, do_rescue, opt.bw_long, opt.rmq_rescue_size,
        opt.max_gap, opt.lc_max_occ, opt.lc_max_trim, opt.max_gap >> 1,
        opt.max_gc_skip, opt.ref_bonus, MG_MAX_SHORT_K, opt.min_gc_cnt,
        opt.min_gc_score, opt.gdp_max_ed, opt.seed, gi.k * 2,
        opt.best_n, gaf_flags], dtype=np.int64)
    PD = np.array([chn_pen_gap, chn_pen_skip, opt.rmq_rescue_ratio,
                   opt.mask_level, opt.pri_ratio], dtype=np.float64)

    mode = np.empty(n, dtype=np.int64)
    n_a = np.empty(n, dtype=np.int64)
    axp = np.empty(n, dtype=np.uint64)
    ayp = np.empty(n, dtype=np.uint64)
    fpp = np.zeros(n, dtype=np.uint64)
    ppp = np.zeros(n, dtype=np.uint64)
    n_mv = np.empty(n, dtype=np.int64)
    n_mini = np.zeros(n, dtype=np.int64)
    mpp = np.empty(n, dtype=np.uint64)
    qlen = np.empty(n, dtype=np.int64)
    rep_len = np.empty(n, dtype=np.int64)
    mdx = np.empty(n, dtype=np.int64)
    mdy = np.empty(n, dtype=np.int64)
    qseq_off = np.zeros(n + 1, dtype=np.int64)
    qname_off = np.zeros(n + 1, dtype=np.int64)
    n_seg_arr = np.ones(n, dtype=np.int64)
    seg_mid = np.zeros(n, dtype=np.int64)
    any_frag = False
    keep = []
    seq_parts, name_parts = [], []
    qname_len_arr = None
    if blob is not None:
        # arenas come straight from the native reader: no per-read
        # Python objects on the hot path (host-collect implied)
        _nr, sq_addr, sq_off_v, nm_addr, nm_off_v, skip = blob
        qseq_off[:] = sq_off_v
        qname_off[:] = nm_off_v
        qlen[:] = qseq_off[1:] - qseq_off[:-1]
        if frag_blob is not None:
            n_seg_arr, seg_mid, qname_len_arr = frag_blob
            any_frag = True
        n_a[:] = n_mv[:] = rep_len[:] = 0
        axp[:] = ayp[:] = mpp[:] = 0
        if is_rmq:
            mode[:] = 2
            mdx[:] = opt.max_gap
            mdy[:] = 0
        else:
            mode[:] = 1
            if mdx_dp is not None:
                mdx[:] = mdx_dp
            else:
                np.maximum(opt.max_frag_len - qlen, opt.max_gap,
                           out=mdx)
            if is_sr:
                np.maximum(qlen, opt.max_gap, out=mdy)
            else:
                mdy[:] = opt.max_gap
        if skip is not None:
            mode[skip] = -1
        if fr_flat:
            # device chains as BATCH arrays (front.gather_flat): all
            # per-read pointers filled with vectorized numpy — no
            # per-read Python on the hybrid hot path
            for idxs, fb in fr_flat:
                if not len(idxs):
                    continue
                keep.append(fb)
                pre = fb["prefix"].astype(np.uint64)
                n_a[idxs] = fb["n_a"]
                axp[idxs] = fb["AX"].ctypes.data + pre * 8
                ayp[idxs] = fb["AY"].ctypes.data + pre * 8
                mpp[idxs] = fb["MINI"].ctypes.data \
                    + fb["mprefix"].astype(np.uint64) * 8
                n_mini[idxs] = fb["n_mini"]
                n_mv[idxs] = fb["n_q"]
                rep_len[idxs] = fb["rep_len"]
                mode[idxs] = 3
                fpp[idxs] = fb["U"].ctypes.data \
                    + fb["uprefix"].astype(np.uint64) * 8
                mdx[idxs] = fb["n_u"]
                mdy[idxs] = 0
        if fr_map:
            # device-fronted reads in the hybrid batch: provide the
            # anchor planes; the worker skips its collect (axp != 0)
            for k2, fr in fr_map.items():
                ax, ay = fr.ax, fr.ay
                if not ax.flags["C_CONTIGUOUS"]:
                    ax = np.ascontiguousarray(ax)
                if not ay.flags["C_CONTIGUOUS"]:
                    ay = np.ascontiguousarray(ay)
                mp = fr.mini_pos
                if mp.dtype != np.int64 or not mp.flags["C_CONTIGUOUS"]:
                    mp = np.ascontiguousarray(mp, dtype=np.int64)
                keep.append((ax, ay, mp))
                n_a[k2] = len(ax)
                axp[k2] = ax.ctypes.data
                ayp[k2] = ay.ctypes.data
                mpp[k2] = mp.ctypes.data
                n_mv[k2] = fr.n_mv
                n_mini[k2] = len(mp)
                rep_len[k2] = fr.rep_len
                if fr.u is not None:
                    u64 = np.ascontiguousarray(fr.u, dtype=np.uint64)
                    keep.append((u64,))
                    fpp[k2] = u64.ctypes.data
                    mode[k2] = 3
                    mdx[k2] = len(u64)
                    mdy[k2] = 0
                elif not is_rmq and fr.f is not None:
                    f32 = np.ascontiguousarray(fr.f, dtype=np.int32)
                    p32 = np.ascontiguousarray(fr.p, dtype=np.int32)
                    keep.append((f32, p32))
                    fpp[k2] = f32.ctypes.data
                    ppp[k2] = p32.ctypes.data
                    mode[k2] = 0
                    mdx[k2] = mdy[k2] = 0
        qseq_blob = ct.cast(sq_addr, ct.c_char_p)
        qname_blob = ct.cast(nm_addr, ct.c_char_p)
        host_collect = True
        items = ()
    for k, (fi, qname, seq, fr) in enumerate(items):
        if isinstance(seq, tuple):
            # merged paired-end fragment: segments concatenated in the
            # blob, boundary in seg_mid (collect offsets per segment)
            n_seg_arr[k] = len(seq)
            seg_mid[k] = qseq_off[k] + len(seq[0])
            any_frag = True
            seq = "".join(seq)
        ql = len(seq)
        qlen[k] = ql
        if host_collect:
            n_a[k] = n_mv[k] = n_mini[k] = rep_len[k] = 0
            axp[k] = ayp[k] = mpp[k] = 0
        else:
            ax, ay = fr.ax, fr.ay
            if not ax.flags["C_CONTIGUOUS"]:
                ax = np.ascontiguousarray(ax)
            if not ay.flags["C_CONTIGUOUS"]:
                ay = np.ascontiguousarray(ay)
            mp = fr.mini_pos
            if mp.dtype != np.int64 or not mp.flags["C_CONTIGUOUS"]:
                mp = np.ascontiguousarray(mp, dtype=np.int64)
            keep.append((ax, ay, mp))
            n_a[k] = len(ax)
            axp[k] = ax.ctypes.data
            ayp[k] = ay.ctypes.data
            mpp[k] = mp.ctypes.data
            n_mv[k] = fr.n_mv
            n_mini[k] = len(mp)
            rep_len[k] = fr.rep_len
        if not host_collect and fr.u is not None:
            u64 = np.ascontiguousarray(fr.u, dtype=np.uint64)
            keep.append((u64,))
            fpp[k] = u64.ctypes.data
            mode[k] = 3
            mdx[k] = len(u64)
            mdy[k] = 0
        elif is_rmq:
            mode[k] = 2
            mdx[k] = opt.max_gap
            mdy[k] = 0
        elif not host_collect and fr.f is not None:
            f32 = np.ascontiguousarray(fr.f, dtype=np.int32)
            p32 = np.ascontiguousarray(fr.p, dtype=np.int32)
            keep.append((f32, p32))
            fpp[k] = f32.ctypes.data
            ppp[k] = p32.ctypes.data
            mode[k] = 0
            mdx[k] = mdy[k] = 0
        else:
            mode[k] = 1
            mdx[k] = mdx_dp if mdx_dp is not None \
                else max(opt.max_frag_len - ql, opt.max_gap)
            mdy[k] = max(ql, opt.max_gap) if is_sr else opt.max_gap
        seq_parts.append(seq)
        name_parts.append(qname or "")
        qseq_off[k + 1] = qseq_off[k] + ql
        qname_off[k + 1] = qname_off[k] + len(name_parts[-1])
    if blob is None:
        qseq_blob = "".join(seq_parts).encode("latin-1")
        qname_blob = "".join(name_parts).encode("latin-1")

    args0 = _get_gfull_ctx(gi.g, gi.es)
    gctx = _get_gaf_ctx(gi.g)
    o_off = np.empty(n, dtype=np.int64)
    o_len = np.empty(n, dtype=np.int64)
    status = np.empty(n, dtype=np.int64)
    pbuf = ct.c_void_p()
    if host_collect:
        from .seeds import get_collect_ctx
        cptr = get_collect_ctx(gi)
        col_args = (1, gi.w, gi.k, opt.occ_max1,
                    cptr[0], cptr[1], cptr[2], cptr[3], cptr[4],
                    cptr[6], cptr[7])
    else:
        col_args = (0, 0, 0, 0, None, None, None, 0, None, None, 0)
    frag_args = (int(bool(opt.flag & MG_M_HEAP_SORT)),
                 n_seg_arr.ctypes.data if any_frag else None,
                 seg_mid.ctypes.data if any_frag else None)
    if opt.flag & MG_M_CIGAR:
        from ..align.cigar import _es_tables
        seqp, _sl = _es_tables(gi.es)
        cig_args = (1, ct.cast(seqp, ct.c_void_p))
    else:
        cig_args = (0, None)
    total = lib.mgt_map_tail_batch(
        n, max(1, n_threads), P.ctypes.data, PD.ctypes.data,
        mode.ctypes.data, n_a.ctypes.data, axp.ctypes.data,
        ayp.ctypes.data, fpp.ctypes.data, ppp.ctypes.data,
        n_mv.ctypes.data, n_mini.ctypes.data, mpp.ctypes.data,
        qlen.ctypes.data,
        rep_len.ctypes.data, mdx.ctypes.data, mdy.ctypes.data,
        *col_args,
        *frag_args,
        *cig_args,
        qseq_blob, qseq_off.ctypes.data,
        qname_blob, qname_off.ctypes.data,
        qname_len_arr.ctypes.data if qname_len_arr is not None else None,
        *args0,
        gctx[0], gctx[1], gctx[3], gctx[4],
        gctx[5], gctx[6], gctx[7], gctx[8], gctx[9],
        ct.byref(pbuf), o_off.ctypes.data, o_len.ctypes.data,
        status.ctypes.data)
    if total < 0:
        return None
    txt = ct.string_at(pbuf, total).decode("latin-1") if total else ""
    lib.mgt_buf_free(pbuf)
    res = {}
    if blob is not None:
        for k in range(n):
            res[k] = (txt[int(o_off[k]): int(o_off[k]) + int(o_len[k])]
                      if status[k] == 0 else None)
        return res
    for k, (fi, _, _, _) in enumerate(items):
        if status[k] == 0:
            res[fi] = txt[int(o_off[k]): int(o_off[k]) + int(o_len[k])]
        else:
            res[fi] = None
    return res


def _open_split_submit(gi, opt, front, split, n_threads,
                       n, sq_addr, sq_off, nm_addr, nm_off, qlen, bad):
    """Phase 1 of the OPEN host/device split for one arena batch:
    submit the device share (async) and run the host C batch for the
    rest on the calling thread (the call releases the GIL, so the
    front's background fetch makes progress and the chip executes
    concurrently).  Returns the in-flight state for
    _open_split_finish; with the triple-buffered reader arenas the
    caller finishes batch k-1 only AFTER submitting batch k, so the
    chip crunches batch k while the host runs k-1's device-share
    tails — cross-batch pipelining on top of the in-batch overlap.
    Reads never touch Python strings on this path (gap 2b: the --tpu
    configuration rides the native reader arenas end to end)."""
    import ctypes as ct

    # eligibility + share (split["share"] = the HOST's fraction)
    elig = [k for k in range(n) if not bad[k]
            and front.eligible(opt, 1, int(qlen[k]))]
    n_steal = int(len(elig) * split["share"])
    cand = elig[n_steal:]
    sub_wall = 0.0
    handle = None
    cold = False
    if cand:
        total = int(sq_off[-1])
        abuf = np.frombuffer(
            (ct.c_char * total).from_address(sq_addr),
            dtype=np.uint8) if total else np.empty(0, np.uint8)
        t0 = time.perf_counter()
        handle = front.submit(
            [abuf[int(sq_off[k]): int(sq_off[k + 1])] for k in cand])
        sub_wall = time.perf_counter() - t0
        cold = getattr(front, "last_submit_cold", False)
    # host share: everything not sent to the device
    host_skip = np.asarray(bad).copy()
    if cand:
        host_skip[cand] = True
    skipw = np.nonzero(host_skip)[0]
    n_host = int(n - len(skipw))
    c0 = time.thread_time() if n_threads == 1 else time.process_time()
    t0 = time.perf_counter()
    res = _map_batch_native(
        gi, opt, None, n_threads,
        blob=(n, sq_addr, sq_off, nm_addr, nm_off,
              skipw if len(skipw) else None))
    if res is not None and n_host > 0:
        cpu = (time.thread_time() - c0) if n_threads == 1 \
            else (time.process_time() - c0)
        wall = time.perf_counter() - t0
        split["t_host"] = _ema(
            split["t_host"],
            (wall if n_threads == 1 else max(wall, cpu)) / n_host)
        split["t_host_cpu"] = _ema(
            split.get("t_host_cpu"), cpu / n_host)
    return {"n": n, "sq_addr": sq_addr, "sq_off": sq_off,
            "nm_addr": nm_addr, "nm_off": nm_off, "bad": bad,
            "cand": cand, "handle": handle, "res": res,
            "sub_wall": sub_wall, "cold": cold}


def _open_split_finish(gi, opt, front, split, n_threads, st):
    """Phase 2: gather the device share, run its hybrid tail (device
    anchors where the front delivered, in-worker collect where it
    flagged), update the share controller, return the merged res."""
    n, cand = st["n"], st["cand"]
    res = st["res"]
    if st["handle"] is not None:
        t0 = time.perf_counter()
        # batch-array hand-off: gather_flat returns the chains as
        # whole-batch arrays + per-read offsets, and the pointer
        # tables fill with vectorized numpy (fr_flat) — the per-read
        # Python glue was ~40% of the device share's host cost
        flat, extra = front.gather_flat(st["handle"])
        cand_arr = np.asarray(cand)
        fr_flat = [(cand_arr[sel], fb) for sel, fb in flat]
        fr_map = {cand[i]: fr for i, fr in extra.items()
                  if fr is not None}
        # the hybrid batch runs EVERY candidate read: where the front
        # delivered chains/anchors the workers consume them (fr_map /
        # fr_flat); where it flagged (no FrontResult) the workers run
        # the in-worker native collect — flagged reads must NOT be
        # skipped here or they'd fall to the slow per-read Python path
        # (round-4 advisor 'medium').
        dev_skip = np.ones(n, dtype=bool)
        dev_skip[cand_arr] = False
        dev_skip |= np.asarray(st["bad"])
        dskipw = np.nonzero(dev_skip)[0]
        dres = _map_batch_native(
            gi, opt, None, n_threads,
            blob=(n, st["sq_addr"], st["sq_off"], st["nm_addr"],
                  st["nm_off"], dskipw if len(dskipw) else None),
            fr_map=fr_map, fr_flat=fr_flat)
        if dres is not None:
            if res is None:
                res = {}
            for k in cand:
                res[k] = dres.get(k)
            if not st["cold"]:  # a jit compile is not the steady cost
                split["t_dev"] = _ema(
                    split["t_dev"],
                    (st["sub_wall"] + time.perf_counter() - t0)
                    / len(cand))
        elif res is not None:
            for k in cand:
                res[k] = None       # per-read fallback
    # ---- controller: share balance + collapse test (mirrors the
    # Python split loop, mapper.py _map_file_frag) ----
    split["n_since"] = split.get("n_since", 0) + n
    now = time.perf_counter()
    t_last = split.get("t_last")
    n_cyc = split.get("n_since", 0)
    split["t_last"] = now
    split["n_since"] = 0
    if (t_last is not None and n_cyc > 0 and split["share"] < 1.0):
        cyc = now - t_last
        if cyc / n_cyc < 0.05:      # not a compile cycle
            split["rate_mix"] = _ema(split.get("rate_mix"), n_cyc / cyc)
            split["nb_mix"] = split.get("nb_mix", 0) + 1
    if split["t_dev"] and split["t_host"]:
        tgt = split["t_dev"] / (split["t_dev"] + split["t_host"])
        share = 1.0 if tgt > 0.95 else min(0.9, max(0.0, tgt))
        if tgt > 0.95:
            split["hi_tgt"] = split.get("hi_tgt", 0) + 1
        else:
            split["hi_tgt"] = 0
        if split.get("hi_tgt", 0) >= 2:
            split["collapsed"] = True
            share = 1.0
        elif (share < 1.0 and split.get("rate_mix")
              and split.get("nb_mix", 0) >= 3
              and split.get("t_host_cpu")
              and 1.0 / split["t_host_cpu"]
              > 1.08 * split["rate_mix"]):
            split["collapsed"] = True
            share = 1.0
        split["share"] = share
    return res


def _map_arena_frags(gi, opt, out, n_threads, n, sq_addr, sq_off,
                     nm_addr, nm_off):
    """One frag-mode arena batch through the native batch driver.

    Fragments are consecutive same-name runs (mates adjacent in the
    arena), grouped in C; a 2-seg fragment is one batch item spanning
    both mates with the boundary in seg_mid, and the paired-end
    orientation flips (gmap.c:38-43) are applied in place on the
    arena bytes so fallback reads see them too."""
    import ctypes as ct

    from ..utils.native import get_lib
    lib = get_lib()
    if not getattr(_map_arena_frags, "_cfg", False):
        lib.mgt_frag_group.restype = ct.c_int64
        lib.mgt_frag_group.argtypes = [ct.c_void_p, ct.c_void_p,
                                       ct.c_int64, ct.c_void_p]
        lib.mgt_revcomp_spans.restype = None
        lib.mgt_revcomp_spans.argtypes = [ct.c_void_p, ct.c_void_p,
                                          ct.c_void_p, ct.c_int64]
        _map_arena_frags._cfg = True
    first = np.empty(n + 1, dtype=np.int64)
    nf = lib.mgt_frag_group(ct.c_void_p(nm_addr),
                            ct.c_void_p(nm_off.ctypes.data), n,
                            ct.c_void_p(first.ctypes.data))
    first = first[:nf + 1]
    f0 = first[:-1]
    qso = np.ascontiguousarray(sq_off[first])
    qno = np.ascontiguousarray(nm_off[first])
    n_seg = np.ascontiguousarray(np.diff(first))
    qname_len = np.ascontiguousarray(nm_off[f0 + 1] - nm_off[f0])
    seg_mid = np.zeros(nf, dtype=np.int64)
    two = n_seg == 2
    seg_mid[two] = sq_off[f0[two] + 1]
    qsum = qso[1:] - qso[:-1]
    skip = (qsum <= 0) | (n_seg > 2)
    if opt.max_qlen > 0:
        skip = skip | (qsum > opt.max_qlen)
    two_ok = two & ~skip
    i2 = f0[two_ok]
    if len(i2):
        if opt.pe_ori >> 1 & 1:
            st = np.ascontiguousarray(sq_off[i2])
            en = np.ascontiguousarray(sq_off[i2 + 1])
            lib.mgt_revcomp_spans(ct.c_void_p(sq_addr),
                                  ct.c_void_p(st.ctypes.data),
                                  ct.c_void_p(en.ctypes.data), len(i2))
        if opt.pe_ori & 1:
            st = np.ascontiguousarray(sq_off[i2 + 1])
            en = np.ascontiguousarray(sq_off[i2 + 2])
            lib.mgt_revcomp_spans(ct.c_void_p(sq_addr),
                                  ct.c_void_p(st.ctypes.data),
                                  ct.c_void_p(en.ctypes.data), len(i2))
    skipw = np.nonzero(skip)[0]
    res = _map_batch_native(
        gi, opt, None, n_threads,
        blob=(nf, sq_addr, qso, nm_addr, qno,
              skipw if len(skipw) else None),
        frag_blob=(n_seg, seg_mid, qname_len))
    for j in range(nf):
        txt = res.get(j) if res is not None else None
        if txt is None:
            fj, ns = int(first[j]), int(n_seg[j])
            name = ct.string_at(
                nm_addr + int(nm_off[fj]),
                int(qname_len[j])).decode("latin-1")
            seqs = [ct.string_at(
                sq_addr + int(sq_off[fj + k]),
                int(sq_off[fj + k + 1] - sq_off[fj + k]))
                .decode("latin-1") for k in range(ns)]
            qlens = [len(s) for s in seqs]
            gcs = map_frag(gi, qlens, seqs, opt, name,
                           fast_emit=not (opt.flag & MG_M_CIGAR))
            txt = write_gaf(gi.g, gcs, ns, qlens, name, opt.flag)
        if txt:
            out.write(txt)


def _arena_batches(rdr, max_bp, frag_mode):
    """One-batch read-ahead over the native reader arenas.

    The C reader double-buffers its arena sets (mgt_seqio.c ar[2]:
    batch k stays valid while k+1 decodes), so a prefetch pthread can
    gz-decode batch k+1 while batch k maps — the reference's
    kt_pipeline I/O<->compute overlap (kthread.c:97-128, gmap.c:177).
    The semaphore holds the prefetcher one batch ahead, never two:
    reading k+2 would recycle batch k's arena under the consumer."""
    import os
    import queue
    import threading

    if os.environ.get("MGT_NO_READAHEAD"):      # A/B measurement switch
        while True:
            a = rdr.read_batch_arena(max_bp, frag_mode)
            if a is None:
                return
            yield a
        return

    tokens = threading.Semaphore(2)
    q = queue.Queue()
    stop = []

    def worker():
        while True:
            tokens.acquire()
            if stop:
                return
            try:
                a = rdr.read_batch_arena(max_bp, frag_mode)
            except Exception as e:          # re-raised on the consumer
                q.put(("err", e))
                return
            q.put(("ok", a))
            if a is None:
                return

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    try:
        while True:
            kind, a = q.get()
            if kind == "err":
                raise a
            if a is None:
                return
            yield a
            tokens.release()
    finally:
        stop.append(True)
        tokens.release()


def _map_file_native(gi, opt, rdr, out, n_threads, front=None,
                     split=None, frag_mode=False):
    """All-native single-file mapping loop: C reader arenas -> C batch
    driver -> GAF bytes; Python touches only fallback reads (engine
    bailouts, zero-length, over-max_qlen).

    With a collapsed device front attached (front/split), every 8th
    arena batch probes a quarter slice through the device (submitted
    BEFORE the blob call so device exec overlaps the C mapping) to
    keep t_dev fresh; when the finish-together target drops below
    0.45 on two CONSECUTIVE probes the collapsed flag clears and the
    NEXT _map_file_frag call re-enters the adaptive split loop.  The
    probe counter persists in the shared split dict so short files
    (< 8 arena batches each) still accumulate toward a probe."""
    import ctypes as ct

    def _emit_batch(res, n, rec):
        """Write batch results in read order; None entries (engine
        bailouts / driver unavailable) re-run on the exact per-read
        path."""
        for k in range(n):
            txt = res.get(k) if res is not None else None
            if txt is None:
                name, seq = rec(k)
                gcs = map_frag(gi, [len(seq)], [seq], opt, name,
                               fast_emit=not (opt.flag & MG_M_CIGAR))
                txt = write_gaf(gi.g, gcs, 1, [len(seq)], name,
                                opt.flag)
            if txt:
                out.write(txt)

    pending = None      # in-flight split batch (chip busy on it)

    def _flush_pending():
        nonlocal pending
        if pending is None:
            return
        st, rec_p = pending
        pending = None
        res_p = _open_split_finish(gi, opt, front, split, n_threads, st)
        _emit_batch(res_p, st["n"], rec_p)

    for arena in _arena_batches(rdr, opt.mini_batch_size, frag_mode):
        n, sq_addr, sq_off, nm_addr, nm_off = arena
        if frag_mode:
            _flush_pending()
            _map_arena_frags(gi, opt, out, n_threads, n, sq_addr,
                             sq_off, nm_addr, nm_off)
            continue
        qlen = sq_off[1:] - sq_off[:-1]
        skip = qlen <= 0
        if opt.max_qlen > 0:
            skip = skip | (qlen > opt.max_qlen)

        # bind this batch's arena explicitly: a pending batch's rec is
        # called one iteration later, when the loop locals have moved
        # on to the next arena
        def rec(k, nm_addr=nm_addr, nm_off=nm_off, sq_addr=sq_addr,
                sq_off=sq_off):
            name = ct.string_at(
                nm_addr + int(nm_off[k]),
                int(nm_off[k + 1] - nm_off[k])).decode("latin-1")
            seq = ct.string_at(
                sq_addr + int(sq_off[k]),
                int(sq_off[k + 1] - sq_off[k])).decode("latin-1")
            return name, seq

        if (front is not None and split is not None
                and not split.get("collapsed")):
            # OPEN split straight from the arenas: submit batch k's
            # device share + map the host share, THEN finish batch
            # k-1 (its fetch has had a full host batch to drain) —
            # the chip is never idle while host tails run.  Emission
            # stays in batch order: k-1 completes before any of k.
            st = _open_split_submit(gi, opt, front, split, n_threads,
                                    n, sq_addr, sq_off, nm_addr,
                                    nm_off, qlen, skip)
            _flush_pending()
            pending = (st, rec)
            continue
        _flush_pending()

        handle = cand = None
        sub_wall = 0.0
        if front is not None and split is not None:
            split["nb"] = split.get("nb", 0) + 1
            if split["nb"] % _probe_interval(split) == 0:
                p = max(8, n // 4)
                cand = [k for k in range(n) if not skip[k]
                        and front.eligible(opt, 1, int(qlen[k]))][:p]
                if cand:
                    # dispatch cost is part of what makes a tunneled
                    # chip lose — charge it to the probe's t_dev
                    t_sub0 = time.perf_counter()
                    handle = front.submit([rec(k)[1] for k in cand])
                    sub_wall = time.perf_counter() - t_sub0
                    probe_cold = getattr(front, "last_submit_cold",
                                         False)
                    skip = skip.copy()
                    skip[cand] = True
        skipw = np.nonzero(skip)[0]
        # with n_threads > 1 the blob call runs in worker pthreads and
        # time.thread_time() (calling thread only) undercounts; summed
        # process CPU time gives the single-thread-equivalent cost the
        # split path's n_threads=1 EMAs are comparable with
        c0 = time.thread_time() if n_threads == 1 else time.process_time()
        t0 = time.perf_counter()
        res = _map_batch_native(
            gi, opt, None, n_threads,
            blob=(n, sq_addr, sq_off, nm_addr, nm_off,
                  skipw if len(skipw) else None))
        n_host = int(n - len(skipw))
        if split is not None and res is not None and n_host > 0:
            cpu = (time.thread_time() - c0) if n_threads == 1 \
                else (time.process_time() - c0)
            wall = time.perf_counter() - t0
            split["t_host"] = _ema(
                split["t_host"],
                (wall if n_threads == 1 else max(wall, cpu)) / n_host)
            split["t_host_cpu"] = _ema(
                split.get("t_host_cpu"), cpu / n_host)
        if handle is not None:
            t0 = time.perf_counter()
            probe_res = dict(zip(cand, front.gather(handle)))
            items = [(k,) + rec(k) + (fr,)
                     for k, fr in probe_res.items() if fr is not None]
            ptxt = _map_batch_native(gi, opt, items, n_threads) \
                if items else {}
            if items and ptxt is not None and not probe_cold:
                split["t_dev"] = _ema(
                    split["t_dev"],
                    (sub_wall + time.perf_counter() - t0) / len(items))
                if split["t_dev"] and split["t_host"]:
                    tgt = split["t_dev"] / (split["t_dev"]
                                            + split["t_host"])
                    # hysteresis: one biased-low probe (device exec
                    # overlapped the blob call) must not reopen the
                    # split — require 2 consecutive probes under 0.45
                    if tgt <= 0.45:   # device profitable again
                        split["reopen"] = split.get("reopen", 0) + 1
                        if split["reopen"] >= 2:
                            split["collapsed"] = False
                            split["rate_mix"] = None
                            split["nb_mix"] = 0
                            split["reopen"] = 0
                    else:
                        split["reopen"] = 0
            elif not items:
                # probe paid dispatch but produced nothing usable;
                # count it so a wedged front is visible in --dbg
                split["probe_fail"] = split.get("probe_fail", 0) + 1
            # merge probe results (fallback reads keep res None so the
            # shared per-read fallback below handles them)
            if res is None:
                res = {}
            for k in cand:
                res[k] = (ptxt or {}).get(k)

        _emit_batch(res, n, rec)
    _flush_pending()


# --- fork-based worker pool (kt_for analog; index shared copy-on-write) ---
_POOL_CTX = {}


def _pool_worker_map(item):
    off, qname, seqs = item
    gi, opt = _POOL_CTX["gi"], _POOL_CTX["opt"]
    qlens = [len(s) for s in seqs]
    gcs = map_frag(gi, qlens, seqs, opt, qname, fast_emit=True)
    return off, gcs


def _map_fragments_parallel(gi, opt, items, n_threads):
    """Map fragments across a fork pool; results in input order.

    items: list of (off, qname, [seqs]).  Per-read work is independent
    and output order is restored, so results equal the sequential path
    (kt_for semantics, kthread.c:30-52).
    """
    import multiprocessing as mp
    _POOL_CTX["gi"] = gi
    _POOL_CTX["opt"] = opt
    try:
        ctx = mp.get_context("fork")
        with ctx.Pool(n_threads) as pool:
            results = pool.map(_pool_worker_map, items,
                               chunksize=max(1, len(items) // (n_threads * 4)))
    finally:
        _POOL_CTX.clear()
    return [gcs for _, gcs in sorted(results, key=lambda x: x[0])]


def _read_batch_frag(fps, chunk_size: int):
    """Interleaved multi-file reading (mg_bseq_read_frag, bseq.c:100-128)."""
    out = []
    size = 0
    while True:
        recs = []
        for fp in fps:
            r = fp._next()
            if r is not None:
                recs.append(r)
        if len(recs) < len(fps):
            if recs:
                sys.stderr.write("[W] query files have different number of "
                                 "records; extra records skipped.\n")
            break
        out.extend(recs)
        size += sum(r.l_seq for r in recs)
        if size >= chunk_size:
            break
    return out


def _revcomp_str(s: str) -> str:
    from ..graph.gfa import revcomp
    return revcomp(s)


def _map_file_frag(gi: MinimizerIndex, fns: List[str], opt: MapOptions,
                   out, c_seg, c_link, n_threads: int = 1,
                   front=None, gwfa_pool=None) -> None:
    """3-step read→map→write pipeline semantics (gmap.c:66-177)."""
    frag_mode = len(fns) > 1 or bool(opt.flag & MG_M_FRAG_MODE)
    from ..options import DBG as _DBGm
    # all-native fast loop: single plain file, no device, no special
    # output shape -> C reader + C batch driver, no per-read Python.
    # A device front rides this loop too, in BOTH split states: open
    # (device share submitted from the arenas, hybrid C tails) and
    # collapsed (host-all with periodic device probes) — the --tpu
    # path never pays the Python reader on plain single-file runs.
    _split_st = getattr(front, "_split_state", None) if front is not None \
        else None
    if (front is not None and _split_st is None
            and gwfa_pool is None and not _DBGm["flag"]
            and not (opt.flag & _EMIT_BAIL_NOCIG)):
        _split_st = {"share": 0.35, "t_host": None, "t_dev": None}
        front._split_state = _split_st
    if (gwfa_pool is None and not _DBGm["flag"]
            and len(fns) == 1
            and (not frag_mode or front is None)
            and _batch_mode_ok(opt.flag)
            and not (opt.flag & (MG_M_INDEPEND_SEG | _MG_M_NO_DIAG))
            and (front is None
                 or (_split_st is not None
                     and not (opt.flag & _EMIT_BAIL_NOCIG)))):
        try:
            from ..seqio.bseq import NativeSeqReader
            rdr = NativeSeqReader(fns[0])
        except OSError:
            rdr = None
        if rdr is not None:
            try:
                _map_file_native(gi, opt, rdr, out, n_threads,
                                 front=front, split=_split_st,
                                 frag_mode=frag_mode)
                return
            finally:
                rdr.close()
    fps = [BSeqFile(fn) for fn in fns]
    pe_ori = opt.pe_ori

    # heterogeneous split: while the device runs the seed stage for its
    # share of a batch, a background thread maps the remaining reads
    # with the all-native host batch driver (the C call releases the
    # GIL, so it fills the core during the device's exec+fetch idle
    # window).  The share adapts so both engines finish together.
    split_ok = (front is not None and gwfa_pool is None
                and not _DBGm["flag"]
                and not (opt.flag & (_EMIT_BAIL_NOCIG | MG_M_HEAP_SORT
                                     | MG_M_INDEPEND_SEG
                                     | _MG_M_NO_DIAG)))
    host_pool = None
    split = {"share": 0.35, "t_host": None, "t_dev": None}
    if split_ok:
        from concurrent.futures import ThreadPoolExecutor
        host_pool = ThreadPoolExecutor(max_workers=1)
        # keep the learned balance across calls (bench/ggs reuse the
        # same DeviceFront for several mapping passes)
        split = getattr(front, "_split_state", None) or split
        front._split_state = split

    def _host_batch_timed(items):
        # thread CPU time (the n_threads=1 native call runs inline in
        # this thread) gives the host engine's per-read cost free of
        # core-contention distortion — the wall clock is time-sliced
        # against the device path's host-side work on small hosts
        t0 = time.perf_counter()
        c0 = time.thread_time()
        txt = _map_batch_native(gi, opt, items, 1, host_collect=True)
        return (txt, time.perf_counter() - t0, time.thread_time() - c0,
                len(items))
    def _read_prep():
        """Read + encode + DISPATCH the next batch (pipeline stage 0).

        The device dispatch in front.submit() is asynchronous, so by
        submitting batch k+1 before the host finishes the per-read
        tails of batch k, read/parse and device compute overlap the
        host tail work — the kt_pipeline analog (gmap.c:66-177)."""
        if len(fps) > 1:
            batch = _read_batch_frag(fps, opt.mini_batch_size)
        else:
            batch = fps[0].read_batch(opt.mini_batch_size, frag_mode)
        if not batch:
            return None
        for s in batch:
            s.seq = toupper(s.seq)
        # group into fragments by query name
        frags = []
        j = 0
        for i in range(1, len(batch) + 1):
            if i == len(batch) or not frag_mode \
                    or not qname_same(batch[i - 1].name, batch[i].name):
                frags.append((j, i - j))
                j = i
        handle = front_idx = None
        host_fut = None
        if front is not None:
            # device seed stage for every eligible single-seg frag
            front_idx = [fi for fi, (off, n_seg) in enumerate(frags)
                         if front.eligible(opt, n_seg, batch[off].l_seq)]
            if host_pool is not None:
                # device-ineligible single-seg reads always take the
                # host C batch; an adaptive share of the eligible ones
                # is stolen from the device to balance the pipeline
                elig = set(front_idx)
                host_set = [
                    fi for fi, (off, n_seg) in enumerate(frags)
                    if n_seg == 1 and batch[off].l_seq > 0
                    and fi not in elig
                    and not (opt.max_qlen > 0
                             and batch[off].l_seq > opt.max_qlen)]
                n_steal = int(len(front_idx) * split["share"])
                if n_steal >= len(front_idx):
                    # device currently unprofitable: host takes all,
                    # but every 8th batch probes a device slice so a
                    # recovered/unwedged (or genuinely faster, for the
                    # collapsed single-core state) device can win work
                    # back; a quarter-batch probe amortizes the fixed
                    # dispatch cost enough for a fair t_dev estimate
                    split["nb"] = split.get("nb", 0) + 1
                    probe = max(8, len(front_idx) // 4)
                    n_steal = max(0, len(front_idx) - probe) \
                        if split["nb"] % _probe_interval(split) == 0 \
                        else len(front_idx)
                if n_steal > 0:
                    host_set += front_idx[:n_steal]
                    front_idx = front_idx[n_steal:]
                if host_set:
                    items = [(fi, batch[frags[fi][0]].name,
                              batch[frags[fi][0]].seq, None)
                             for fi in sorted(host_set)]
                    host_fut = host_pool.submit(_host_batch_timed, items)
            if front_idx:
                t_sub0 = time.perf_counter()
                handle = front.submit(
                    [batch[frags[fi][0]].seq for fi in front_idx])
                # host-side dispatch cost is part of the device path's
                # per-read price; charged to t_dev at the next gather
                split["sub_wall"] = split.get("sub_wall", 0.0) \
                    + time.perf_counter() - t_sub0
                if getattr(front, "last_submit_cold", False):
                    split["sub_cold"] = True
        return batch, frags, handle, front_idx, host_fut

    try:
        cur = _read_prep()
        while cur is not None:
            batch, frags, handle, front_idx, host_fut = cur
            cur = _read_prep()  # device + I/O run ahead of the tails
            pre = None
            front_res = None
            t_dev0 = time.perf_counter()
            if handle is not None:
                front_res = dict(zip(front_idx, front.gather(handle)))
            import os
            from ..options import DBG as _DBGf
            eff_threads = min(n_threads, os.cpu_count() or 1)
            if front is not None:
                eff_threads = 1  # device batching replaces the fork pool
            # whole-host batch path: seed collection + tails + GAF all
            # inside one C call (host_collect mode of mgt_batch.c);
            # replaces the fork pool when eligible
            host_batch_ok = (
                front is None and gwfa_pool is None and not _DBGf["flag"]
                and _batch_mode_ok(opt.flag)
                and not (opt.flag & (MG_M_INDEPEND_SEG | _MG_M_NO_DIAG)))
            if host_batch_ok:
                eff_threads = 1  # C threads replace the fork pool
            if eff_threads > 1 and not (opt.flag & MG_M_INDEPEND_SEG):
                items = []
                for off, n_seg in frags:
                    if n_seg == 2:
                        if pe_ori >> 1 & 1:
                            batch[off].seq = _revcomp_str(batch[off].seq)
                        if pe_ori & 1:
                            batch[off + 1].seq = \
                                _revcomp_str(batch[off + 1].seq)
                    items.append((off,
                                  batch[off].name,
                                  [batch[off + k].seq for k in range(n_seg)]))
                pre = _map_fragments_parallel(gi, opt, items, eff_threads)
            # batched native tails: anchors -> GAF bytes in one C
            # call (work-stealing threads), per-read Python only for
            # fallbacks (native/mgt_batch.c)
            batch_txt = None
            flips_done = False
            if front_res and gwfa_pool is None \
                    and not (opt.flag & _EMIT_BAIL_NOCIG):
                items = [(fi, batch[frags[fi][0]].name,
                          batch[frags[fi][0]].seq, fr)
                         for fi, fr in front_res.items()
                         if fr is not None and frags[fi][1] == 1]
                batch_txt = _map_batch_native(gi, opt, items, n_threads)
                if items and batch_txt is not None:
                    if split.pop("sub_cold", False):
                        split.pop("sub_wall", None)  # compile, not cost
                    else:
                        split["t_dev"] = _ema(
                            split["t_dev"],
                            (split.pop("sub_wall", 0.0)
                             + time.perf_counter() - t_dev0)
                            / len(items))
            elif host_batch_ok:
                items = []
                for fi, (off, n_seg) in enumerate(frags):
                    if n_seg > 2:
                        continue
                    qsum = sum(batch[off + k2].l_seq
                               for k2 in range(n_seg))
                    if qsum == 0 or (opt.max_qlen > 0
                                     and qsum > opt.max_qlen):
                        continue
                    if n_seg == 2:
                        # paired-end orientation flip (gmap.c:38-43);
                        # flips_done stops compute_frag re-flipping a
                        # fallback read
                        if pe_ori >> 1 & 1:
                            batch[off].seq = _revcomp_str(batch[off].seq)
                        if pe_ori & 1:
                            batch[off + 1].seq = \
                                _revcomp_str(batch[off + 1].seq)
                        items.append((fi, batch[off].name,
                                      (batch[off].seq,
                                       batch[off + 1].seq), None))
                    else:
                        items.append((fi, batch[off].name,
                                      batch[off].seq, None))
                flips_done = True
                if items:
                    batch_txt = _map_batch_native(gi, opt, items,
                                                  n_threads,
                                                  host_collect=True)
            if split_ok:
                # reads since the last balance point (a cycle can span
                # several batches when some run without a host share)
                split["n_since"] = split.get("n_since", 0) + len(frags)
            if host_fut is not None:
                h_txt, h_wall, h_cpu, h_n = host_fut.result()
                if h_txt:
                    batch_txt = h_txt if batch_txt is None \
                        else {**batch_txt, **h_txt}
                if h_n:
                    split["t_host"] = _ema(split["t_host"], h_wall / h_n)
                    split["t_host_cpu"] = _ema(
                        split.get("t_host_cpu"), h_cpu / h_n)
                # measured blended throughput over the last full batch
                # cycle (reads of ALL paths / wall since the previous
                # balance point); compile-length cycles are skipped
                now = time.perf_counter()
                t_last = split.get("t_last")
                n_cyc = split.get("n_since", 0)
                split["t_last"] = now
                split["n_since"] = 0
                if (t_last is not None and n_cyc > 0
                        and not split.get("collapsed")
                        and split["share"] < 1.0):
                    cyc = now - t_last
                    if cyc / n_cyc < 0.05:  # not a compile cycle
                        split["rate_mix"] = _ema(
                            split.get("rate_mix"), n_cyc / cyc)
                        split["nb_mix"] = split.get("nb_mix", 0) + 1
                # balance: host takes t_dev/(t_dev+t_host) of the work
                if split["t_dev"] and split["t_host"]:
                    tgt = split["t_dev"] / (split["t_dev"]
                                            + split["t_host"])
                    share = 1.0 if tgt > 0.95 \
                        else min(0.9, max(0.0, tgt))
                    # device per-read cost >19x host, twice in a row:
                    # unprofitable outright — collapse without waiting
                    # for the rate_mix comparison (which never updates
                    # at share==1.0, leaving the slower Python-reader
                    # loop in charge indefinitely)
                    if tgt > 0.95:
                        split["hi_tgt"] = split.get("hi_tgt", 0) + 1
                    else:
                        split["hi_tgt"] = 0
                    # single-core correction: finish-together assumes
                    # the host engine and the device path's host-side
                    # work run on separate cores.  When they contend
                    # for one core (or a tunneled chip's dispatch cost
                    # exceeds a full host mapping), the blend is
                    # SLOWER than host-only — detected by comparing
                    # the measured blended rate with the host engine's
                    # contention-free CPU rate.  Collapse to host-all;
                    # the every-8th-batch probe keeps t_dev fresh so a
                    # locally-attached chip wins the work back when
                    # tgt drops below 0.45.
                    if split.get("collapsed"):
                        if tgt <= 0.45:
                            split["reopen"] = split.get("reopen", 0) + 1
                            if split["reopen"] >= 2:
                                split["collapsed"] = False
                                split["rate_mix"] = None
                                split["nb_mix"] = 0
                                split["reopen"] = 0
                            else:
                                share = 1.0
                        else:
                            split["reopen"] = 0
                            share = 1.0
                    elif split.get("hi_tgt", 0) >= 2:
                        split["collapsed"] = True
                        share = 1.0
                    elif (share < 1.0 and split.get("rate_mix")
                          and split.get("nb_mix", 0) >= 3
                          and split.get("t_host_cpu")
                          and 1.0 / split["t_host_cpu"]
                          > 1.08 * split["rate_mix"]):
                        split["collapsed"] = True
                        share = 1.0
                    split["share"] = share
            # device -c mode: defer per-gap WFAs of device-front reads
            # into one batch pool, align on device, then finalize
            cigar_sink = None
            if front is not None and front_res and batch_txt is None \
                    and (opt.flag & MG_M_CIGAR):
                from ..align.cigar_device import DeviceWfaPool

                class _Sink:
                    jobs = []
                    pending = []
                cigar_sink = _Sink()
                cigar_sink.jobs = []
                cigar_sink.pending = []

            def compute_frag(fi, off, n_seg, gp=None):
                gp = gp if gp is not None else gwfa_pool
                # paired-end orientation flip (gmap.c:38-43)
                if pre is None and not flips_done and n_seg == 2:
                    if pe_ori >> 1 & 1:
                        batch[off].seq = _revcomp_str(batch[off].seq)
                    if pe_ori & 1:
                        batch[off + 1].seq = _revcomp_str(batch[off + 1].seq)
                seqs = [batch[off + k].seq for k in range(n_seg)]
                qlens = [len(s) for s in seqs]
                if pre is not None:
                    gcs_list = [pre[fi]]
                elif front_res is not None \
                        and front_res.get(fi) is not None:
                    fr = front_res[fi]
                    fp = (fr.f, fr.p) if fr.f is not None else None
                    gcs_list = [map_frag_tail(gi, qlens, seqs, opt,
                                              batch[off].name, fr.ax,
                                              fr.ay, fr.rep_len,
                                              fr.mini_pos, fr.n_mv,
                                              chain_fp=fp,
                                              chains_u=fr.u,
                                              cigar_sink=cigar_sink,
                                              fast_emit=cigar_sink
                                              is None,
                                              gwfa_pool=gp)]
                elif opt.flag & MG_M_INDEPEND_SEG:
                    gcs_list = [map_frag(gi, [qlens[k]], [seqs[k]], opt,
                                         batch[off + k].name,
                                         fast_emit=cigar_sink is None,
                                         gwfa_pool=gp)
                                for k in range(n_seg)]
                else:
                    gcs_list = [map_frag(gi, qlens, seqs, opt,
                                         batch[off].name,
                                         fast_emit=cigar_sink is None,
                                         gwfa_pool=gp)]
                return qlens, gcs_list

            def emit_frag(off, n_seg, qlens, gcs_list):
                gcs = gcs_list[0]
                if (opt.flag & MG_M_FRAG_MODE) and (opt.flag & MG_M_FRAG_MERGE):
                    if opt.flag & MG_M_CAL_COV:
                        from ..ggen.cov import cov_map
                        cov_map(gi.g, gcs, opt.min_cov_mapq, opt.min_cov_blen,
                                c_seg, c_link, batch[off].name)
                    else:
                        txt = write_gaf(gi.g, gcs, n_seg, qlens,
                                        batch[off].name, opt.flag)
                        if txt:
                            out.write(txt)
                else:
                    for k in range(n_seg):
                        t = batch[off + k]
                        gck = gcs_list[k] if len(gcs_list) > 1 else \
                            (gcs if k == 0 else None)
                        if opt.flag & MG_M_CAL_COV:
                            from ..ggen.cov import cov_map
                            cov_map(gi.g, gck, opt.min_cov_mapq,
                                    opt.min_cov_blen, c_seg, c_link, t.name)
                        else:
                            txt = write_gaf(gi.g, gck, 1, [t.l_seq],
                                            t.name, opt.flag)
                            if txt:
                                out.write(txt)

            if cigar_sink is not None:
                computed = [compute_frag(fi, off, n_seg)
                            for fi, (off, n_seg) in enumerate(frags)]
                from ..align.cigar_device import finalize_read
                if front._wfa_pool is None:
                    front._wfa_pool = DeviceWfaPool()
                res = front._wfa_pool.run(cigar_sink.jobs)
                for pr in cigar_sink.pending:
                    finalize_read(pr, res)
                for (off, n_seg), (qlens, gcs_list) in zip(frags, computed):
                    emit_frag(off, n_seg, qlens, gcs_list)
            elif batch_txt is not None:
                for fi, (off, n_seg) in enumerate(frags):
                    txt = batch_txt.get(fi)
                    if txt is not None:
                        if txt:
                            out.write(txt)
                    else:
                        qlens, gcs_list = compute_frag(fi, off, n_seg)
                        emit_frag(off, n_seg, qlens, gcs_list)
            else:
                from ..options import DBG as _DBG
                if front is not None and n_threads > 1 \
                        and not _DBG["flag"]:
                    # thread-parallel tails: the whole-tail native call
                    # releases the GIL, so threads scale on multi-core
                    # hosts (kthread worker analog); emission stays in
                    # input order
                    from concurrent.futures import ThreadPoolExecutor
                    with ThreadPoolExecutor(
                            max_workers=min(n_threads, 16)) as ex:
                        futs = [ex.submit(compute_frag, fi, off, n_seg)
                                for fi, (off, n_seg) in enumerate(frags)]
                        for fut, (off, n_seg) in zip(futs, frags):
                            qlens, gcs_list = fut.result()
                            emit_frag(off, n_seg, qlens, gcs_list)
                elif gwfa_pool is not None and front is None:
                    # cross-read GWFA pooling: harvest every read's
                    # bridge jobs (phase 1), ONE device dispatch for
                    # the whole batch, then re-run deferred reads with
                    # their result slices injected (phase 2) —
                    # amortizes the per-dispatch tunnel overhead over
                    # every bridge site of the batch
                    from ..align.gwfa_device import (GwfaBatchSink,
                                                     GwfaPending)
                    sink = GwfaBatchSink(gwfa_pool)
                    computed = [compute_frag(fi, off, n_seg, gp=sink)
                                for fi, (off, n_seg) in enumerate(frags)]
                    flips_done = True   # recompute must not re-flip
                    sink.solve()
                    for fi, ((off, n_seg), (qlens, gcs_list)) in \
                            enumerate(zip(frags, computed)):
                        tickets = [gc.ticket for gc in gcs_list
                                   if isinstance(gc, GwfaPending)]
                        if tickets:
                            sink.queue_inject(tickets)
                            qlens, gcs_list = compute_frag(
                                fi, off, n_seg, gp=sink)
                        emit_frag(off, n_seg, qlens, gcs_list)
                else:
                    for fi, (off, n_seg) in enumerate(frags):
                        qlens, gcs_list = compute_frag(fi, off, n_seg)
                        emit_frag(off, n_seg, qlens, gcs_list)
    finally:
        if host_pool is not None:
            host_pool.shutdown(wait=True)
        for fp in fps:
            fp.close()
