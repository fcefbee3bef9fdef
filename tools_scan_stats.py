#!/usr/bin/env python
"""Measure the reference chain scan's per-anchor behavior on the 16 kb
bench workload, to size the device chain kernel (round 5).

For each anchor of each read this simulates mg_lchain_dp's inner scan
(lchain.c:165-207) EXACTLY (incl. t[]-epoch marks, skip break, max_ii
cache) and records:
  * n_scan   rows actually processed before break/dry
  * win      full window size (i - lo)
  * broke    whether the skip break fired
and evaluates two device-side sureness tests against the truth:
  * jb-test  (current kernel): over-marked break emulation, flag when
    idx < jb_over
  * count-test (scan-free candidate): flag when #(valid & childcnt>0 &
    not-argmax) rows above idx exceeds max_skip
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from minigraph_tpu.graph.gfa_io import read_gfa
from minigraph_tpu.index.midx import build_index
from minigraph_tpu.mapping.seeds import collect_minimizers, collect_seed_hits
from minigraph_tpu.options import (GGOptions, IndexOptions, MapOptions,
                                   opt_check, opt_set)
from minigraph_tpu.seqio.bseq import read_all

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
READS = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_cache/reads16k.fa"


def mg_log2(x):
    # mgpriv.h mg_log2 bit-hack (f32)
    x = np.float32(x)
    vi = x.view(np.int32) if isinstance(x, np.ndarray) else \
        np.array([x], np.float32).view(np.int32)[0]
    y = np.float32((vi >> 23) - 127) \
        + (np.float32(np.int32(vi & 0x7FFFFF).view(np.int32))
           / np.float32(1 << 23))
    return y


def main():
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set("lr", io_, mo, go)
    opt_check(io_, mo, go)
    g = read_gfa("/root/repo/.bench_cache/mhc3m.gfa")
    gi = build_index(g, io_.k, io_.w, mo)
    reads = read_all(READS)[:N_READS]

    mdx = mo.max_gap_ref if mo.max_gap_ref > 0 else mo.max_gap
    mdy = mo.max_gap
    bw, max_skip, max_iter = mo.bw, mo.max_lc_skip, mo.max_lc_iter
    mdx = max(mdx, bw)
    mdy = max(mdy, bw)
    tmp = np.float32(np.exp(np.float32(-mo.div) * np.float32(gi.k)))
    pen_gap = np.float32(mo.chn_pen_gap) * tmp
    pen_skip = np.float32(mo.chn_pen_skip) * tmp
    print(f"mdx={mdx} mdy={mdy} bw={bw} max_skip={max_skip} "
          f"max_iter={max_iter} pen_gap={pen_gap:.4f}")

    all_scan, all_win, all_broke = [], [], []
    jb_flags = cnt_flags = total = 0
    per_read_trip = []   # chunks-of-64 per anchor per read
    for rec in reads:
        mv_x, mv_y = collect_minimizers(gi, [len(rec.seq)], [rec.seq.upper()])
        ax, ay, rep_len, mini_pos = collect_seed_hits(
            gi, mo, mo.occ_max1, mv_x, mv_y)
        n = len(ax)
        if n == 0:
            continue
        xh = (ax >> np.uint64(32)).astype(np.uint32)
        xl = (ax & np.uint64(0xFFFFFFFF)).astype(np.int64)
        qp = (ay & np.uint64(0xFFFFFFFF)).astype(np.int64)
        span = ((ay >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int64)
        f = np.zeros(n, np.int64)
        p = np.full(n, -1, np.int64)
        childcnt = np.zeros(n, np.int64)
        mark = np.full(n, -1, np.int64)   # t[] epoch array
        cache, f_cache = -1, 0
        blk = 0
        trips = []
        for i in range(n):
            if xh[i] != xh[blk]:
                blk = i
            lo_d = np.searchsorted(xl[blk:i + 1], xl[i] - mdx, "left") + blk
            lo = max(lo_d, i - max_iter)
            win = i - lo
            # vectorized comput_sc over the window
            j = np.arange(lo, i)
            dq = qp[i] - qp[j]
            dr = xl[i] - xl[j]
            bad = (dq <= 0) | (dq > mdx) | (dr == 0) | (dq > mdy)
            dd = np.abs(dr - dq)
            bad |= dd > bw
            dg = np.minimum(dr, dq)
            sc = np.minimum(span[j], dg)
            lin = pen_gap * dd.astype(np.float32) \
                + pen_skip * dg.astype(np.float32)
            with np.errstate(invalid="ignore"):
                lg = np.where(dd >= 1,
                              np.float32(0.5) * np.log2(
                                  np.maximum(dd + 1, 1).astype(np.float32)),
                              np.float32(0))
            pen = (lin + lg).astype(np.int64)
            sc = sc - np.where((dd != 0) | (dg > span[j]), pen, 0)
            sc_tot = np.where(bad, -(1 << 40), sc + f[j])
            valid = ~bad

            # truth: sequential scan with epoch marks
            best = span[i]
            best_j = -1
            n_skip = 0
            n_scan = 0
            stop = lo - 1
            for jj in range(i - 1, lo - 1, -1):
                n_scan += 1
                if bad[jj - lo]:
                    continue
                tot = sc_tot[jj - lo]
                if tot > best:
                    best, best_j = tot, jj
                    if n_skip > 0:
                        n_skip -= 1
                elif mark[jj] == i:
                    n_skip += 1
                    if n_skip > max_skip:
                        stop = jj
                        break
                if p[jj] >= 0:
                    mark[p[jj]] = i
            # full-window argmax (ties -> largest j)
            if win > 0 and valid.any():
                M = sc_tot.max()
                idx = lo + np.max(np.where((sc_tot == M) & valid,
                                           np.arange(win), -1))
            else:
                M, idx = -(1 << 40), -1
            is_best = M > span[i]

            # current kernel's jb test (over-marked break emulation)
            marked = childcnt[j] > 0
            suf = np.maximum.accumulate(sc_tot[::-1])[::-1]
            excl = np.concatenate([suf[1:], [-(1 << 40)]])
            run_before = np.maximum(span[i], excl)
            new = valid & (sc_tot > run_before)
            d = np.where(new, -1, np.where(valid & marked & ~new, 1, 0))
            S = np.cumsum(d[::-1])[::-1]
            Smin = np.minimum.accumulate(S[::-1])[::-1]
            n_after = S - np.minimum(0, Smin)
            brk = (d == 1) & (n_after > max_skip)
            jb = lo + np.max(np.where(brk, np.arange(win), -1)) \
                if win else -1
            has_break = brk.any() if win else False
            jb_flag = bool(has_break and is_best and idx < jb)

            # scan-free count test
            splus = valid & marked
            if is_best and idx >= lo:
                splus = splus & (j != idx)
            cnt_above = int(np.sum(splus & (j > idx)))
            cnt_flag = bool(is_best and cnt_above > max_skip)

            total += 1
            jb_flags += jb_flag
            cnt_flags += cnt_flag
            all_scan.append(n_scan)
            all_win.append(win)
            all_broke.append(stop >= lo)
            # chunked evaluation with the f+span bound: walk chunks of
            # CH rows top-down; stop when every remaining row j has
            # f[j] + 31 <= current best (sc <= span <= 31)
            CH = 64
            chunks = 0
            best_ch = span[i]
            for e in range(i, lo, -CH):
                s = max(lo, e - CH)
                chunks += 1
                seg = sc_tot[s - lo: e - lo]
                if seg.size and seg.max() > best_ch:
                    best_ch = seg.max()
                if s == lo:
                    break
                deep_ub = f[lo:s].max() + 31 if s > lo else -(1 << 40)
                if deep_ub <= best_ch:
                    break
            trips.append(max(1, chunks))

            # max_ii cache (C formulation)
            if cache < lo_d:
                cache = -1
                fb = -(1 << 40)
                for jj in range(lo, i):
                    if f[jj] >= fb:
                        fb, cache = f[jj], jj
            if cache >= 0 and cache < stop:
                jj = cache
                dq1 = qp[i] - qp[jj]
                dr1 = xl[i] - xl[jj]
                okc = not ((dq1 <= 0) or (dq1 > mdx) or (dr1 == 0)
                           or (dq1 > mdy) or (xh[i] != xh[jj]))
                dd1 = abs(dr1 - dq1)
                okc = okc and dd1 <= bw
                if okc:
                    dg1 = min(dr1, dq1)
                    sc1 = min(span[jj], dg1)
                    lg1 = 0.5 * np.log2(dd1 + 1) if dd1 >= 1 else 0.0
                    pen1 = int(np.float32(pen_gap * dd1 + pen_skip * dg1
                                          + lg1))
                    sc1 = sc1 - (pen1 if (dd1 != 0 or dg1 > span[jj]) else 0)
                    if best < sc1 + f[jj]:
                        best, best_j = sc1 + f[jj], jj
            f[i], p[i] = best, best_j
            if best_j >= 0:
                childcnt[best_j] += 1
            if cache < 0 or f[cache] < best:
                cache = i
        per_read_trip.append(trips)

    scan = np.array(all_scan)
    win = np.array(all_win)
    print(f"\nanchors: {total} over {len(per_read_trip)} reads")
    print(f"scan len: mean {scan.mean():.1f} p50 {np.percentile(scan, 50):.0f} "
          f"p90 {np.percentile(scan, 90):.0f} p99 {np.percentile(scan, 99):.0f} "
          f"max {scan.max()}")
    print(f"window:   mean {win.mean():.1f} p50 {np.percentile(win, 50):.0f} "
          f"p90 {np.percentile(win, 90):.0f} p99 {np.percentile(win, 99):.0f} "
          f"max {win.max()}")
    print(f"broke: {np.mean(all_broke):.1%}")
    print(f"flag rates: jb-test {jb_flags}/{total} = {jb_flags/total:.2%}, "
          f"count-test {cnt_flags}/{total} = {cnt_flags/total:.2%}")
    # chunked-scan drag: lanes = reads, step = anchor ordinal
    L = max(len(t) for t in per_read_trip)
    trip_m = np.ones((len(per_read_trip), L), np.int64)
    for r, t in enumerate(per_read_trip):
        trip_m[r, :len(t)] = t
    worst = trip_m.max(axis=0)
    print(f"chunk-of-64 trips: mean-per-anchor {scan.mean()/64 + 1:.2f}, "
          f"lane-max mean {worst.mean():.2f} (sum {worst.sum()} vs "
          f"per-lane-mean sum {trip_m.mean(axis=0).sum():.0f})")


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"[{time.time()-t0:.1f}s]")
