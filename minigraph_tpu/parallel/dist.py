"""Multi-process (multi-host) distributed mapping runtime.

The reference has no distributed backend — its only parallelism is
single-node pthreads (kthread.c).  The TPU-native equivalent
(SURVEY §2.5/§5): `jax.distributed` over ICI/DCN with

  * read batches DATA-PARALLEL across processes (fragment ordinal
    mod num_processes — deterministic, so output is shard-count
    invariant, the analog of the reference's thread-count invariance);
  * the minimizer index built replicated on every process (it is a
    deterministic function of the graph; MT/MHC-scale fits easily —
    human-scale tables shard over the "idx" mesh axis instead, see
    parallel/shard.py);
  * per-shard GAF records gathered to rank 0 with their fragment
    ordinals and written in input order (byte-identical to a
    single-process run);
  * coverage vectors (--cov) merged with an all-reduce before rank 0
    writes the dc:f tags.

Graph augmentation (-cxggs) stays single-process per sample — it is
inherently sequential and cheap (ggen.c:84-102); only the mapping
inside each sample shards.

Run one process per host:

    python -m minigraph_tpu.parallel.dist --coordinator host0:29500 \
        --num-processes 2 --process-id 0 [minigraph args...]

The CI test (tests/test_distributed.py) launches 2 local CPU
processes and asserts byte parity with the single-process CLI.
"""
from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int):
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def _gather_text_shards(texts: List[str]) -> Optional[List[str]]:
    """All-gather variable-length per-process strings; every process
    returns the full list (indexed by process id)."""
    from jax.experimental import multihost_utils

    data = "\x00".join(texts).encode("utf-8")
    n = np.int64(len(data))
    lens = np.asarray(multihost_utils.process_allgather(n))
    cap = int(lens.max())
    buf = np.zeros(cap, dtype=np.uint8)
    buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    allbuf = np.asarray(multihost_utils.process_allgather(buf))
    out = []
    for i in range(allbuf.shape[0]):
        raw = allbuf[i, : int(lens[i])].tobytes().decode("utf-8")
        out.append(raw.split("\x00"))
    return out


def map_files_distributed(g, fns: List[str], ipt, opt0, out=sys.stdout,
                          device: bool = False,
                          front_kwargs: Optional[dict] = None) -> int:
    """Data-parallel mg_map_files across jax processes.

    Every process streams the same input files, maps the fragments
    whose ordinal is congruent to its process id, and rank 0 writes
    the merged, input-ordered GAF (or the coverage-annotated graph)."""
    import copy

    import jax
    from jax.experimental import multihost_utils

    from ..index.midx import build_index
    from ..options import MG_M_CAL_COV, MG_M_FRAG_MODE
    from ..mapping.mapper import (_read_batch_frag, map_frag,
                                  map_frag_tail)
    from ..seqio.bseq import BSeqFile, qname_same, toupper
    from ..seqio.gaf import write_gaf

    pid = jax.process_index()
    n_proc = jax.process_count()
    opt = copy.copy(opt0)
    gi = build_index(g, ipt.k, ipt.w, opt)
    if gi is None:
        return -1
    front = None
    if device:
        from ..mapping.device_front import DeviceFront
        front = DeviceFront(gi, opt, **(front_kwargs or {}))

    c_seg = c_link = None
    is_cov = bool(opt.flag & MG_M_CAL_COV)
    if is_cov:
        c_seg = np.zeros(g.n_seg, dtype=np.float64)
        c_link = np.zeros(g.n_arc, dtype=np.float64)

    frag_mode = bool(opt.flag & MG_M_FRAG_MODE)
    file_groups = [fns] if frag_mode and len(fns) > 1 \
        else [[fn] for fn in fns]
    texts: List[str] = []      # this shard's GAF records, one per frag
    ordinals: List[int] = []
    ordinal = 0
    for group in file_groups:
        fps = [BSeqFile(fn) for fn in group]
        try:
            while True:
                if len(fps) > 1:
                    batch = _read_batch_frag(fps, opt.mini_batch_size)
                else:
                    batch = fps[0].read_batch(opt.mini_batch_size,
                                              frag_mode)
                if not batch:
                    break
                for s in batch:
                    s.seq = toupper(s.seq)
                frags = []
                j = 0
                for i in range(1, len(batch) + 1):
                    if i == len(batch) or not frag_mode or \
                            not qname_same(batch[i - 1].name,
                                           batch[i].name):
                        frags.append((j, i - j))
                        j = i
                mine = [(fi, off, n_seg)
                        for fi, (off, n_seg) in enumerate(frags)
                        if (ordinal + fi) % n_proc == pid]
                handle = fidx = None
                if front is not None and mine:
                    fidx = [fi for fi, off, n_seg in mine
                            if front.eligible(opt, n_seg,
                                              batch[off].l_seq)]
                    if fidx:
                        handle = front.submit(
                            [batch[frags[fi][0]].seq for fi in fidx])
                front_res = {}
                if handle is not None:
                    front_res = dict(zip(fidx, front.gather(handle)))
                for fi, off, n_seg in mine:
                    seqs = [batch[off + k].seq for k in range(n_seg)]
                    qlens = [len(s) for s in seqs]
                    fr = front_res.get(fi)
                    if fr is not None:
                        fp_ = (fr.f, fr.p) if fr.f is not None else None
                        gcs = map_frag_tail(gi, qlens, seqs, opt,
                                            batch[off].name, fr.ax,
                                            fr.ay, fr.rep_len,
                                            fr.mini_pos, fr.n_mv,
                                            chain_fp=fp_)
                    else:
                        gcs = map_frag(gi, qlens, seqs, opt,
                                       batch[off].name)
                    if is_cov:
                        from ..ggen.cov import cov_map
                        cov_map(gi.g, gcs, opt.min_cov_mapq,
                                opt.min_cov_blen, c_seg, c_link,
                                batch[off].name)
                    else:
                        rec = []
                        for k in range(n_seg):
                            t = batch[off + k]
                            gck = gcs if k == 0 else None
                            txt = write_gaf(gi.g, gck, 1, [t.l_seq],
                                            t.name, opt.flag)
                            rec.append(txt or "")
                        texts.append("".join(rec))
                        ordinals.append(ordinal + fi)
                ordinal += len(frags)
        finally:
            for fp in fps:
                fp.close()

    if front is not None:
        front.log_stats()
    if is_cov:
        # coverage all-reduce, then rank 0 annotates the graph
        seg_all = np.asarray(multihost_utils.process_allgather(c_seg))
        link_all = np.asarray(multihost_utils.process_allgather(c_link))
        if pid == 0:
            from ..ggen.cov import aux_update_cv
            aux_update_cv(g, "dc", seg_all.sum(0), link_all.sum(0))
        return 0

    # interleave shards back into input order on rank 0
    payload = [f"{o}\x01{t}" for o, t in zip(ordinals, texts)]
    shards = _gather_text_shards(["\x02".join(payload)])
    if pid == 0:
        recs = []
        for sh in shards:
            for blob in sh:
                if not blob:
                    continue
                for item in blob.split("\x02"):
                    if not item:
                        continue
                    o, t = item.split("\x01", 1)
                    recs.append((int(o), t))
        recs.sort(key=lambda x: x[0])
        for _, t in recs:
            if t:
                out.write(t)
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    coord = nproc = pid = None
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--coordinator":
            coord = argv[i + 1]
            i += 2
        elif argv[i] == "--num-processes":
            nproc = int(argv[i + 1])
            i += 2
        elif argv[i] == "--process-id":
            pid = int(argv[i + 1])
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    if None in (coord, nproc, pid):
        sys.stderr.write("usage: dist --coordinator H:P --num-processes N "
                         "--process-id I [minigraph args...]\n")
        return 1
    initialize(coord, nproc, pid)

    from ..cli import main as cli_main
    # reuse the CLI's option parsing by intercepting map_files
    import minigraph_tpu.mapping.mapper as mapper_mod
    orig = mapper_mod.map_files

    def patched(g, fns, ipt, opt, out=sys.stdout, cov=None, n_threads=1,
                device=False, front_kwargs=None, **_kw):
        # **_kw swallows per-session mapper options the distributed
        # driver does not forward (e.g. gwfa_device)
        return map_files_distributed(g, fns, ipt, opt, out=out,
                                     device=device,
                                     front_kwargs=front_kwargs)

    mapper_mod.map_files = patched
    import minigraph_tpu.cli as cli_mod
    cli_mod.map_files = patched
    import jax
    devnull = None
    if jax.process_index() != 0:
        # only rank 0 emits output (GAF merge / cov-annotated graph)
        import io as _io
        devnull = sys.stdout
        sys.stdout = _io.StringIO()
    try:
        return cli_main(rest)
    finally:
        if devnull is not None:
            sys.stdout = devnull
        mapper_mod.map_files = orig
        cli_mod.map_files = orig


if __name__ == "__main__":
    raise SystemExit(main())
