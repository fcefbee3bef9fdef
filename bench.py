#!/usr/bin/env python
"""Benchmark: reads/s of the device seed-chain mapping step.

Maps a batch of simulated long reads (5% divergence) against the MT
test graph (or a synthetic graph when the reference tree is absent):
batched minimizer sketch -> device index probe -> banded chaining DP,
all under one jit on one chip.

vs_baseline compares against the reference C minigraph mapping the same
reads on this host (single thread), when the oracle binary can be
built; otherwise against the paper's published 8-thread throughput
(tex/minigraph.tex:341: 68,857 reads / 79 s = 871.6 reads/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = Path(__file__).resolve().parent
REF_GFA = Path("/root/reference/test/MT.gfa")
ORACLE = REPO / ".golden" / "minigraph_ref"

READ_LEN = 2048
N_READS = 2048
BATCH = 2048
N_ITER = 3


def log(msg):
    sys.stderr.write(f"[bench] {msg}\n")


def build_graph_index():
    from minigraph_tpu.index.midx import build_index
    if REF_GFA.exists():
        from minigraph_tpu.graph.gfa_io import read_gfa
        g = read_gfa(str(REF_GFA))
    else:
        import numpy as np
        from minigraph_tpu.graph.gfa import Graph
        rng = np.random.default_rng(0)
        g = Graph()
        seq = "".join(rng.choice(list("ACGT"), size=100_000))
        sid = g.add_seg("s1")
        g.seg[sid].seq = seq
        g.seg[sid].len = len(seq)
        g.seg[sid].snid = g.sseq_add("chr1")
        g.seg[sid].soff = 0
        g.seg[sid].rank = 0
        g.finalize()
    gi = build_index(g, 17, 11)
    return g, gi


def simulate_reads(g, n, read_len, seed=11):
    import numpy as np
    rng = np.random.default_rng(seed)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    reads = []
    for _ in range(n):
        st = int(rng.integers(0, max(len(ref) - read_len, 1)))
        s = list(ref[st: st + read_len])
        for p in rng.integers(0, len(s), size=max(1, len(s) // 20)):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    return reads


def bench_device(gi, reads):
    import jax
    from minigraph_tpu.ops.anchors_jax import JoinIndex
    from minigraph_tpu.ops.pipeline import make_map_step_v3
    from minigraph_tpu.ops.sketch_jax import encode_batch

    ji = JoinIndex.from_host(gi, occ_cap=16)
    # acap/qcap sized to the workload (2kb reads emit <= ~350
    # minimizers, ~1.2 hits each); overflow flags guard truncation
    fn = make_map_step_v3(ji, w=gi.w, k=gi.k, acap=512, qcap=384,
                          window=32, b_chunk=64)
    batches = []
    for i in range(0, len(reads), BATCH):
        chunk = reads[i: i + BATCH]
        while len(chunk) < BATCH:
            chunk = chunk + chunk[: BATCH - len(chunk)]
        batches.append(encode_batch(chunk, pad_to=READ_LEN))
    import numpy as np

    # warmup/compile; a host fetch is the only reliable sync on this
    # backend (block_until_ready returns before execution completes)
    out = fn(*batches[0])
    np.asarray(out["best"])
    t0 = time.perf_counter()
    n_done = 0
    for _ in range(N_ITER):
        for codes, lens in batches:
            out = fn(codes, lens)
            n_done += codes.shape[0]
    np.asarray(out["best"])
    dt = time.perf_counter() - t0
    return n_done / dt, out


def bench_reference(reads):
    """Time the reference binary on the same reads (1 thread)."""
    if not ORACLE.exists():
        ref_dir = Path("/root/reference")
        if not ref_dir.exists():
            return None
        ORACLE.parent.mkdir(exist_ok=True)
        srcs = sorted(str(p) for p in ref_dir.glob("*.c"))
        try:
            subprocess.run(["gcc", "-O2", "-o", str(ORACLE), *srcs,
                            "-lz", "-lpthread", "-lm"],
                           check=True, capture_output=True, timeout=300)
        except Exception:
            return None
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
        fa = f.name
    try:
        t0 = time.perf_counter()
        n_runs = max(N_ITER, 1)
        for _ in range(n_runs):
            subprocess.run([str(ORACLE), "-t", "1", str(REF_GFA), fa],
                           capture_output=True, check=True, timeout=600)
        dt = time.perf_counter() - t0
        return len(reads) * n_runs / dt
    except Exception:
        return None
    finally:
        os.unlink(fa)


def bench_scale():
    """Informational: MHC-class scale — an 8 Mb, 400-segment synthetic
    graph (200 backbone segments + 200 divergent alt alleles, K~1.4M)
    through the cuckoo-hash fused step (K-independent gathers win
    above ~1e5 keys; see ops/anchors_hash.py)."""
    import numpy as np

    from minigraph_tpu.graph.gfa import Graph
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_hash import HashJoinIndex
    from minigraph_tpu.ops.pipeline import make_map_step_v3
    from minigraph_tpu.ops.sketch_jax import encode_batch

    rng = np.random.default_rng(0)
    g = Graph()
    backbone = []
    soff = 0
    for i in range(200):
        seq = "".join(rng.choice(list("ACGT"), size=40_000))
        sid = g.add_seg(f"s{i}")
        g.seg[sid].seq = seq
        g.seg[sid].len = len(seq)
        g.seg[sid].snid = g.sseq_add("chr1") if i == 0 else g.seg[0].snid
        g.seg[sid].soff = soff
        g.seg[sid].rank = 0
        soff += len(seq)
        backbone.append(seq)
    for i in range(200):
        s = list(backbone[i][10_000:12_000])
        for p in rng.integers(0, len(s), size=100):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        sid = g.add_seg(f"a{i}")
        g.seg[sid].seq = "".join(s)
        g.seg[sid].len = len(s)
        g.seg[sid].snid = g.sseq_add(f"alt{i}")
        g.seg[sid].soff = 0
        g.seg[sid].rank = 1
    g.finalize()
    gi = build_index(g, 17, 11)
    hi = HashJoinIndex.from_host(gi, occ_cap=16)

    ref = "".join(backbone)
    rng2 = np.random.default_rng(7)
    reads = []
    for _ in range(BATCH):
        st = int(rng2.integers(0, len(ref) - READ_LEN))
        s = list(ref[st: st + READ_LEN])
        for p in rng2.integers(0, len(s), size=READ_LEN // 20):
            s[p] = "ACGT"[int(rng2.integers(0, 4))]
        reads.append("".join(s))
    codes, lens = encode_batch(reads, pad_to=READ_LEN)
    fn = make_map_step_v3(hi, w=gi.w, k=gi.k, acap=512, qcap=384,
                          window=32, b_chunk=64)
    out = fn(codes, lens)
    np.asarray(out["best"])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(codes, lens)
    np.asarray(out["best"])
    dt = (time.perf_counter() - t0) / 3
    log(f"scale 8Mb/400-seg graph (K={len(gi.keys)}): "
        f"{BATCH / dt:.0f} reads/s/chip (cuckoo-hash fused step)")


def main():
    import jax
    log(f"devices: {jax.devices()}")
    g, gi = build_graph_index()
    reads = simulate_reads(g, N_READS, READ_LEN)
    log(f"{len(reads)} reads x {READ_LEN} bp vs graph with {g.n_seg} segs")
    rps, out = bench_device(gi, reads)
    try:
        bench_scale()
    except Exception as e:
        log(f"scale bench skipped: {e}")
    log(f"device seed-chain: {rps:.1f} reads/s "
        f"({rps * READ_LEN / 1e6:.1f} Mbp/s)")
    base = None
    if REF_GFA.exists():
        base = bench_reference(reads)
    if base:
        log(f"reference C (1 thread, this host): {base:.1f} reads/s")
        vs = rps / base
    else:
        vs = rps / 871.6  # paper throughput, 8 CPU threads (minigraph.tex:341)
    print(json.dumps({
        "metric": "seed_chain_reads_per_s_chip",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
