"""Device-parallel minimizer index construction.

The reference sketches segments serially and parallelizes only the
bucket hash build (index.c:203-209).  Here the SKETCH — the dominant
cost at pangenome scale — runs on the TPU: segments are packed into
fixed-shape batches and swept by the batched position-aligned sketch
kernel (ops/sketch_jax4.py); segments longer than the widest bucket
are processed in overlapping chunks whose halos reproduce the exact
window state, so the per-segment record streams are byte-identical to
the host sketch.  Table assembly (one global lexsort) stays on host —
it is a single C-speed numpy sort and the direct input to the device
gather tables.

Chunk-halo correctness: an emission with payload end-position p is
triggered at some t in [p, p+w], and the sketch state at trigger t
depends only on bases [t-(w+k-1), t].  Chunking by payload ranges
[a, b) with context [a-(w+k+1), b+w) therefore reproduces every
emission exactly once; the end-of-sequence state emission is taken
from the final chunk only.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

# (chunk payload length, batch) buckets for the device sweep
DEV_BUCKETS: Tuple[Tuple[int, int], ...] = ((4096, 128), (32768, 16))


def sketch_segments_device(seqs: List[str], w: int, k: int,
                           buckets=DEV_BUCKETS, mesh=None):
    """Sketch many sequences on device; returns per-sequence (x, y)
    uint64 record arrays (y has rid=0; callers rebase).

    Sequences with tie overflow (the rare >=2-ties-per-trigger case)
    fall back to the host engine per sequence.

    With `mesh` (a jax Mesh with a "data" axis), chunk batches are
    sharded data-parallel across the mesh — the multi-device layout
    for sketching ONE chromosome-scale sequence (SURVEY §5 long-
    context / §7 multi-host): chunks of the same query land on
    different devices and the host stitch is unchanged.
    """
    import jax
    from functools import partial

    from ..ops.sketch_jax import encode_batch
    from ..ops.sketch_jax4 import META_Q_BITS, sketch_planes
    from .sketch import sketch as host_sketch

    halo = w + k + 1
    max_pay = buckets[-1][0]
    jobs = []   # (seq_idx, pay_start, chunk_str, ctx_off, is_last)
    for si, s in enumerate(seqs):
        n = len(s)
        if n == 0:
            continue
        pay = min(max_pay, n)
        a = 0
        while a < n:
            b = min(a + pay, n)
            c0 = max(0, a - halo)
            c1 = min(n, b + w)
            jobs.append((si, a, s[c0:c1], a - c0, b - a, b == n))
            a = b

    out_x: List[List[np.ndarray]] = [[] for _ in seqs]
    out_y: List[List[np.ndarray]] = [[] for _ in seqs]
    fallback = set()

    by_bucket = {}
    for j, job in enumerate(jobs):
        L = len(job[2]) + w + 1
        for pad_len, bsz in buckets:
            if L <= pad_len + halo + w + 1:
                by_bucket.setdefault(pad_len, []).append(j)
                break
        else:
            by_bucket.setdefault(buckets[-1][0], []).append(j)

    for pad_len, idxs in by_bucket.items():
        bsz = dict(buckets)[pad_len]
        width = pad_len + halo + w + 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dsh = NamedSharding(mesh, P("data"))
            fn = jax.jit(partial(sketch_planes, w=w, k=k),
                         in_shardings=(dsh, dsh))
        else:
            fn = jax.jit(partial(sketch_planes, w=w, k=k))
        for c0 in range(0, len(idxs), bsz):
            chunk_ids = idxs[c0: c0 + bsz]
            texts = [jobs[j][2] for j in chunk_ids]
            texts += [""] * (bsz - len(texts))
            codes, lens = encode_batch(texts, pad_to=width)
            sp = fn(codes, lens)
            hh, hl, meta = map(np.asarray, (sp.hh, sp.hl, sp.meta))
            thh, thl, tmeta = map(np.asarray,
                                  (sp.t_hh, sp.t_hl, sp.t_meta))
            ovf = np.asarray(sp.overflow)
            for bi, j in enumerate(chunk_ids):
                si, pay_a, text, ctx_off, pay_len, is_last = jobs[j]
                if ovf[bi]:
                    fallback.add(si)
                    continue
                xs, ys = _decode_chunk(
                    hh[bi], hl[bi], meta[bi], thh[bi], thl[bi],
                    tmeta[bi], ctx_off, pay_a, pay_len,
                    len(text), is_last, META_Q_BITS)
                out_x[si].append(xs)
                out_y[si].append(ys)

    res = []
    for si, s in enumerate(seqs):
        if si in fallback:
            res.append(host_sketch(s, w, k, rid=0))
        elif out_x[si]:
            res.append((np.concatenate(out_x[si]),
                        np.concatenate(out_y[si])))
        else:
            res.append((np.empty(0, np.uint64), np.empty(0, np.uint64)))
    return res


def _decode_chunk(hh, hl, meta, thh, thl, tmeta, ctx_off, pay_a, pay_len,
                  text_len, is_last, qbits):
    """Planes -> (x, y) records in emission order, keeping payloads in
    this chunk's range and rebasing positions to the full sequence."""
    U64 = np.uint64
    qmask = np.uint32((1 << qbits) - 1)
    S = meta.shape[0]
    # interleave main/tie per trigger = emission order
    H = np.empty(2 * S, hh.dtype)
    L = np.empty(2 * S, hl.dtype)
    M = np.empty(2 * S, meta.dtype)
    H[0::2], H[1::2] = hh, thh
    L[0::2], L[1::2] = hl, thl
    M[0::2], M[1::2] = meta, tmeta
    emit = M != np.uint32(0xFFFFFFFF)
    # the final-state emission sits at plane slot text_len (main);
    # drop it for non-final chunks
    if not is_last:
        fin_slot = 2 * text_len
        if fin_slot < 2 * S:
            emit[fin_slot] = False
    H, L, M = H[emit], L[emit], M[emit]
    pos = ((M >> np.uint32(1)) & qmask).astype(np.int64)
    keep = (pos >= ctx_off) & (pos < ctx_off + pay_len)
    H, L, M, pos = H[keep], L[keep], M[keep], pos[keep]
    span = ((M >> np.uint32(qbits + 1)) & np.uint32(0x1F)).astype(np.int64)
    z = (M & np.uint32(1)).astype(np.int64)
    gpos = pos - ctx_off + pay_a
    x = ((H.astype(U64) << U64(32)) | L.astype(U64)) << U64(8)
    x |= span.astype(U64)
    y = (gpos.astype(U64) << U64(1)) | z.astype(U64)
    return x, y


def build_index_device(g, k: int, w: int, mo=None):
    """mg_index with the sketch stage on device; byte-identical tables
    to index/midx.build_index."""
    from ..graph.gfa import revcomp
    from .midx import EdSeq, MinimizerIndex, gfa_overlap

    if gfa_overlap(g):
        raise ValueError("graphs with overlapping segments are not supported")
    for s in g.seg:
        if s.seq is not None:
            s.seq = s.seq.upper()
    seqs = [(i, s.seq) for i, s in enumerate(g.seg)
            if s.seq is not None and s.len > 0]
    sk = sketch_segments_device([t for _, t in seqs], w, k)
    xs_all, ys_all = [], []
    for (rid, _), (x, y) in zip(seqs, sk):
        xs_all.append(x)
        ys_all.append(y | (np.uint64(rid) << np.uint64(32)))
    gi = MinimizerIndex(g, k, w)
    if xs_all:
        x = np.concatenate(xs_all)
        y = np.concatenate(ys_all)
        minier = x >> np.uint64(8)
        order = np.lexsort((y, minier))
        minier = minier[order]
        gi.pos = y[order]
        keys, start, cnt = np.unique(minier, return_index=True,
                                     return_counts=True)
        gi.keys = keys
        gi.key_start = start.astype(np.int64)
        gi.key_cnt = cnt.astype(np.int64)
    gi.es = []
    for s in g.seg:
        fwd = (s.seq or "").encode("latin-1")
        gi.es.append(EdSeq(fwd=fwd,
                           rc=revcomp(s.seq or "").encode("latin-1"),
                           len=s.len))
    from ..utils.syslog import mlog
    mlog("mg_index", "indexed the graph (device sketch)")
    if mo is not None:
        from ..options import opt_update
        opt_update(gi, mo)
    return gi
