"""Device-batched base-level alignment for -c mode.

mg_gchain_cigar (galign.c:39-145) aligns every inter-anchor gap of
every graph chain with the WFA — thousands of SMALL alignments per
read batch.  On the host each costs microseconds; on the device the
win comes from batching: the per-read anchor walks are harvested into
a flat pool of (target-gap, query-gap) jobs, the pool is aligned in
lockstep by the batched exact WFA (ops/wfa_jax.py, CIGAR-exact vs the
host engine), and the per-chain CIGARs are stitched back byte-
identically.  Jobs too large for a bucket (or whose score exceeds the
bucket's budget) fall back to the host wfa_auto — including its
chain-heuristic path for huge divergent gaps — so results NEVER
depend on where a job ran.

Flow (driver: mapping/mapper.py, device -c mode):
  harvest_read()  per read, right after the chain tail
  DeviceWfaPool.run()  once per read batch
  finalize_read() builds gc.p Cigars + the ds strings
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..options import MG_SEED_IGNORE
from ..mapping.gchain import Cigar, GChains
from .cigar import _append1, _append_many, _es_seq, _i32
from .wfa import wfa_auto

# (max gap length, score budget, batch) size classes.  Jobs SMALLER
# than MIN_DEV_LEN run on the host: the native wavefront engine
# finishes a 20 bp gap in microseconds, while a device job pays ~1 ms
# of dispatch/fetch/decode overhead — batching only wins once the
# host cost crosses that line.  Larger gaps and over-budget jobs also
# go to the host engine (incl. its chain heuristic).
BUCKETS: Tuple[Tuple[int, int, int], ...] = (
    (768, 1024, 64), (2048, 3072, 16))
MIN_DEV_LEN = 256
MAX_DEV_LEN = BUCKETS[-1][0]


@dataclass
class PendingCigar:
    """One gchain's walk with unresolved WFA gaps."""
    gc: object
    off_a0: int
    segs: List = field(default_factory=list)  # ('ops', [u32]) | ('job', id)


@dataclass
class PendingRead:
    gt: GChains
    g: object
    es: list
    qseq: str
    qname: Optional[str]
    chains: List[PendingCigar] = field(default_factory=list)


def harvest_read(g, es, qseq: str, gt: GChains, qname: Optional[str],
                 jobs: List[Tuple[bytes, bytes]]) -> PendingRead:
    """The anchor walk of gchain_cigar, with WFA gaps deferred into
    `jobs` (indices are global across the batch).

    Chains whose gaps the one-call native walk (native/mgt_cigar.c)
    can resolve are finished right here — per-gap Python dispatch
    costs ~0.35 ms while the C walk does a whole typical read in ~1 ms
    — so only chains with over-budget/oversized gaps take the
    harvest + device-pool route."""
    from .cigar import _gchain_cigar_native
    qbytes = qseq.encode("latin-1")
    pr = PendingRead(gt=gt, g=g, es=es, qseq=qseq, qname=qname)
    for gc in gt.gc:
        if _gchain_cigar_native(es, qbytes, gt, gc):
            continue
        l0 = gc.off
        off_a0 = gt.lc[l0].off
        pc = PendingCigar(gc=gc, off_a0=off_a0)
        ops: List[int] = []
        _append1(ops, 7, (int(gt.ay[off_a0]) >> 32) & 0xFF)
        j0 = 0
        for j in range(1, gc.n_anchor):
            py = int(gt.ay[off_a0 + j])
            px = int(gt.ax[off_a0 + j])
            if (py & MG_SEED_IGNORE) and j != gc.n_anchor - 1:
                continue
            qx = int(gt.ax[off_a0 + j0])
            qy = int(gt.ay[off_a0 + j0])
            l = l0
            while l < gc.off + gc.cnt:
                r = gt.lc[l]
                if r.off <= off_a0 + j < r.off + r.cnt:
                    break
                l += 1
            assert l < gc.off + gc.cnt
            # same sanity check as the host walk (align/cigar.py): a
            # corrupt anchor offset fails HERE, not as an opaque
            # length mismatch in finalize_read
            assert _i32(qx) < es[gt.lc[l0].v >> 1].len
            if l == l0:
                l_seq = _i32(px) - _i32(qx)
                seq = _es_seq(es, gt.lc[l0].v)[
                    _i32(qx) + 1: _i32(qx) + 1 + l_seq]
            else:
                v = gt.lc[l0].v
                parts = [_es_seq(es, v)[_i32(qx) + 1:]]
                for k in range(l0 + 1, l):
                    parts.append(_es_seq(es, gt.lc[k].v))
                parts.append(_es_seq(es, gt.lc[l].v)[: _i32(px) + 1])
                seq = b"".join(parts)
                l_seq = len(seq)
            qlen = _i32(py) - _i32(qy)
            qgap = qbytes[_i32(qy) + 1: _i32(qy) + 1 + qlen]
            assert l_seq > 0 or qlen > 0
            if l_seq == 0:
                _append1(ops, 1, qlen)
            elif qlen == 0:
                _append1(ops, 2, l_seq)
            elif l_seq == qlen and qlen <= ((qy >> 32) & 0xFF):
                _append1(ops, 7, qlen)
            else:
                pc.segs.append(("ops", ops))
                pc.segs.append(("job", len(jobs)))
                jobs.append((seq, qgap))
                ops = []
            j0 = j
            l0 = l
        pc.segs.append(("ops", ops))
        pr.chains.append(pc)
    return pr


def finalize_read(pr: PendingRead, results: Dict[int, List[int]]) -> None:
    """Stitch resolved gaps into gc.p Cigars (gchain_cigar tail) and
    generate the ds strings."""
    gt = pr.gt
    for pc in pr.chains:
        gc = pc.gc
        cigar: List[int] = []
        for kind, payload in pc.segs:
            if kind == "ops":
                _append_many(cigar, payload)
            else:
                _append_many(cigar, results[payload])
        p = Cigar()
        off_a0 = pc.off_a0
        p.ss = _i32(int(gt.ax[off_a0])) + 1 \
            - ((int(gt.ay[off_a0]) >> 32) & 0xFF)
        p.ee = _i32(int(gt.ax[off_a0 + gc.n_anchor - 1])) + 1
        p.n_cigar = len(cigar)
        p.cigar = cigar
        qtot = 0
        for c in cigar:
            op, ln = c & 0xF, c >> 4
            if op == 7:
                p.mlen += ln
                p.blen += ln
            else:
                p.blen += ln
            if op != 1:
                p.aplen += ln
            if op != 2:
                qtot += ln
        gc.p = p
        gc.ds = None
        assert qtot == gc.qe - gc.qs and p.aplen == gc.pe - gc.ps
    from .cigar import gchain_gen_ds
    gchain_gen_ds(pr.g, pr.es, pr.qseq, gt)


class DeviceWfaPool:
    """Batched exact WFA over the harvested gap jobs."""

    def __init__(self, pens=(4, 4, 2, 15, 1),
                 buckets: Tuple[Tuple[int, int, int], ...] = BUCKETS):
        self.pens = pens
        self.buckets = buckets
        self.n_device = 0
        self.n_host = 0

    def run(self, jobs: List[Tuple[bytes, bytes]]) -> Dict[int, List[int]]:
        from ..ops.wfa_jax import (decode_walk, encode_pairs, wfa_device,
                                   wfa_tb_walk)

        results: Dict[int, List[int]] = {}
        by_bucket: Dict[int, List[int]] = {}
        host_jobs: List[int] = []
        # custom buckets smaller than MIN_DEV_LEN stay reachable
        min_dev = min([MIN_DEV_LEN] + [b[0] for b in self.buckets])
        for i, (t, q) in enumerate(jobs):
            ln = max(len(t), len(q))
            if ln < min_dev:
                host_jobs.append(i)
                continue
            for bi, (lmax, s_cap, bsz) in enumerate(self.buckets):
                if ln <= lmax:
                    by_bucket.setdefault(bi, []).append(i)
                    break
            else:
                host_jobs.append(i)
        for bi, idxs in by_bucket.items():
            lmax, s_cap, bsz = self.buckets[bi]
            for c0 in range(0, len(idxs), bsz):
                chunk = idxs[c0: c0 + bsz]
                pairs = [jobs[i] for i in chunk]
                pairs += [(b"A", b"A")] * (bsz - len(pairs))
                ts, tl, qs, ql = encode_pairs(pairs, L=lmax)
                score, tb, done, end_d, no_ext = wfa_device(
                    ts, tl, qs, ql, self.pens, d_cap=lmax, s_cap=s_cap)
                # traceback ON DEVICE: the (s_cap, B, D) tb planes
                # never cross the link; only a (2L, B) op trace does
                ops, fi, fk = wfa_tb_walk(
                    ts, tl, qs, ql, tb, score, end_d, no_ext,
                    self.pens, d_cap=lmax, t_cap=2 * lmax + 4)
                score = np.asarray(score)
                ops = np.asarray(ops)
                fi = np.asarray(fi)
                fk = np.asarray(fk)
                for k, i in enumerate(chunk):
                    if score[k] < 0:   # over budget: host (incl. chain)
                        host_jobs.append(i)
                        continue
                    results[i] = decode_walk(ops[:, k], int(fi[k]),
                                             int(fk[k]))
                    self.n_device += 1
        for i in host_jobs:
            t, q = jobs[i]
            rst = wfa_auto(t, q, cigar=True)
            results[i] = rst.cigar or []
            self.n_host += 1
        return results
