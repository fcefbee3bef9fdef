"""Minimizer index over a sequence graph.

Flat sorted-array layout instead of the reference's bucketed hash
(index.c:12-17): all (minimizer, position) records are sorted by
(minimizer, position); lookups binary-search the key array.  Lookup
results are identical — the reference also returns each minimizer's
positions sorted by position (index.c:156).  This layout is directly
usable as device gather tables.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..graph.gfa import Graph, revcomp
from .sketch import sketch


@dataclass
class EdSeq:
    """Per-segment forward and reverse-complement sequence bytes
    (gfa_edseq_init equivalent; used by GWFA/CIGAR stages)."""
    fwd: bytes
    rc: bytes
    len: int


class MinimizerIndex:
    def __init__(self, g: Graph, k: int, w: int):
        self.g = g
        self.k = k
        self.w = w
        self.n_seg = g.n_seg
        # sorted flat tables
        self.keys: np.ndarray = np.empty(0, dtype=np.uint64)      # unique minimizers
        self.key_start: np.ndarray = np.empty(0, dtype=np.int64)
        self.key_cnt: np.ndarray = np.empty(0, dtype=np.int64)
        self.pos: np.ndarray = np.empty(0, dtype=np.uint64)       # y records
        self.es: List[EdSeq] = []

    # ------------------------------------------------------------------
    def get(self, minier: int) -> np.ndarray:
        """Positions (y records) of a minimizer, sorted by position."""
        i = np.searchsorted(self.keys, np.uint64(minier))
        if i >= len(self.keys) or self.keys[i] != np.uint64(minier):
            return _EMPTY
        s = self.key_start[i]
        return self.pos[s: s + self.key_cnt[i]]

    def get_many(self, miniers: np.ndarray):
        """Vectorized lookup: returns (start, count) per query minimizer
        (count 0 when absent)."""
        idx = np.searchsorted(self.keys, miniers)
        idx_c = np.minimum(idx, len(self.keys) - 1) if len(self.keys) else idx
        found = np.zeros(len(miniers), dtype=bool)
        if len(self.keys):
            found = self.keys[idx_c] == miniers
        start = np.where(found, self.key_start[idx_c] if len(self.keys) else 0, 0)
        cnt = np.where(found, self.key_cnt[idx_c] if len(self.keys) else 0, 0)
        return start.astype(np.int64), cnt.astype(np.int64)

    def cal_quantile(self, fracs) -> List[int]:
        """Occurrence quantiles over distinct minimizers (index.c:74-93)."""
        counts = self.key_cnt.astype(np.uint32)
        n = len(counts)
        out = []
        for f in fracs:
            kk = int((1.0 - float(np.float32(f))) * n)
            if n == 0:
                out.append(0)
            else:
                kk = min(kk, n - 1)
                out.append(int(np.partition(counts, kk)[kk]))
        return out


_EMPTY = np.empty(0, dtype=np.uint64)


def gfa_overlap(g: Graph) -> bool:
    return any(a.ov != 0 or a.ow != 0 for a in g.arc)


def build_index(g: Graph, k: int, w: int, mo=None) -> Optional[MinimizerIndex]:
    """Index the graph (mg_index, index.c:186-230): uppercases segment
    sequences in place, sketches every segment, builds the flat table,
    and updates dynamic occurrence options."""
    if gfa_overlap(g):
        raise ValueError("graphs with overlapping segments are not supported")
    for s in g.seg:
        if s.seq is not None:
            s.seq = s.seq.upper()

    xs_all, ys_all = [], []
    for i, s in enumerate(g.seg):
        if s.seq is None or s.len == 0:
            continue
        x, y = sketch(s.seq, w, k, i)
        xs_all.append(x)
        ys_all.append(y)
    gi = MinimizerIndex(g, k, w)
    if xs_all:
        x = np.concatenate(xs_all)
        y = np.concatenate(ys_all)
        minier = x >> np.uint64(8)
        order = np.lexsort((y, minier))
        minier = minier[order]
        gi.pos = y[order]
        keys, start, cnt = np.unique(minier, return_index=True, return_counts=True)
        gi.keys = keys
        gi.key_start = start.astype(np.int64)
        gi.key_cnt = cnt.astype(np.int64)

    gi.es = []
    for s in g.seg:
        fwd = (s.seq or "").encode("latin-1")
        gi.es.append(EdSeq(fwd=fwd, rc=revcomp(s.seq or "").encode("latin-1"),
                           len=s.len))
    from ..utils.syslog import mlog
    mlog("mg_index", "indexed the graph")
    if mo is not None:
        from ..options import opt_update
        opt_update(gi, mo)
    return gi
