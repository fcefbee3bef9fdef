"""Native C engines vs python oracles (WFA, GWFA, chaining) and the
reference miniwfa oracle for checkpoint mode."""
import subprocess

import numpy as np
import pytest

from tests.conftest import REF_DIR, REPO


def _rand_pair(rng, n1, n2, div=8):
    base = rng.choice(list("ACGT"), size=max(n1, n2))
    s1 = "".join(base[:n1])
    s2 = list(base[:n2])
    for p in rng.integers(0, max(n2, 1), size=max(1, n2 // div)):
        s2[p] = "ACGT"[int(rng.integers(0, 4))]
    return s1.encode(), "".join(s2).encode()


def test_native_wfa_matches_python():
    from minigraph_tpu.align.wfa import WfOpt, _wfa_exact_native, _wfa_exact_py
    rng = np.random.default_rng(0)
    for trial in range(8):
        s1, s2 = _rand_pair(rng, int(rng.integers(1, 250)),
                            int(rng.integers(1, 250)))
        for cig in (True, False):
            for max_s in (0, 50):
                opt = WfOpt(cigar=cig, max_s=max_s)
                a = _wfa_exact_py(opt, s1, s2)
                b = _wfa_exact_native(opt, s1, s2)
                assert b is not None, "native lib unavailable"
                assert a.s == b.s
                if cig and a.s >= 0:
                    assert a.cigar == b.cigar


WFA_ORACLE_SRC = """
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "{ref}/miniwfa.h"
int main(int argc, char **argv) {{
    int step = atoi(argv[1]);
    char *t = malloc(1<<22), *q = malloc(1<<22);
    if (scanf("%s %s", t, q) != 2) return 1;
    mwf_opt_t opt; mwf_rst_t r;
    mwf_opt_init(&opt);
    opt.flag |= MWF_F_CIGAR;
    opt.step = step;
    mwf_wfa_exact(0, &opt, strlen(t), t, strlen(q), q, &r);
    printf("%d %d\\n", r.s, r.n_cigar);
    for (int i = 0; i < r.n_cigar; ++i) printf("%u\\n", r.cigar[i]);
    return 0;
}}
"""


@pytest.fixture(scope="module")
def wfa_oracle():
    exe = REPO / ".golden" / "wfa_oracle"
    if not exe.exists():
        if not (REF_DIR / "miniwfa.c").exists():
            pytest.skip("reference miniwfa not available")
        src = exe.with_suffix(".c")
        src.write_text(WFA_ORACLE_SRC.format(ref=REF_DIR))
        subprocess.run(
            ["gcc", "-O2", "-o", str(exe), str(src),
             str(REF_DIR / "miniwfa.c"), str(REF_DIR / "kalloc.c"),
             str(REF_DIR / "misc.c"), str(REF_DIR / "sketch.c"),
             str(REF_DIR / "gfa-base.c")], check=True, capture_output=True)
    return exe


def test_wfa_step_mode_matches_reference(wfa_oracle):
    from minigraph_tpu.align.wfa import WfOpt, _wfa_exact_native
    rng = np.random.default_rng(31)
    for trial in range(5):
        s1, s2 = _rand_pair(rng, int(rng.integers(80, 900)),
                            int(rng.integers(80, 900)))
        for step in (0, 64):
            r = subprocess.run([str(wfa_oracle), str(step)],
                               input=f"{s1.decode()}\n{s2.decode()}\n",
                               capture_output=True, text=True)
            toks = r.stdout.split()
            ref_s, ref_n = int(toks[0]), int(toks[1])
            ref_cig = [int(x) for x in toks[2: 2 + ref_n]]
            mine = _wfa_exact_native(WfOpt(cigar=True, step=step), s1, s2)
            assert mine.s == ref_s
            assert mine.cigar == ref_cig


def test_native_gwfa_matches_python(ref_test_dir):
    from minigraph_tpu.align import gwfa as G
    from minigraph_tpu.align.gwfa_exact import gwfa_ed as py_gwfa
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index

    g = read_gfa(str(ref_test_dir / "MT.gfa"))
    gi = build_index(g, 17, 11)
    rng = np.random.default_rng(2)
    for trial in range(40):
        ai = int(rng.integers(0, g.n_arc))
        a = g.arc[ai]
        v0, v1 = a.v_lv >> 32, a.w
        l0 = g.seg[v0 >> 1].len
        end0 = int(rng.integers(max(l0 - 150, 0), l0))
        end1 = int(rng.integers(0, min(150, g.seg[v1 >> 1].len)))
        s0 = gi.es[v0 >> 1].fwd if (v0 & 1) == 0 else gi.es[v0 >> 1].rc
        s1 = gi.es[v1 >> 1].fwd if (v1 & 1) == 0 else gi.es[v1 >> 1].rc
        q = bytearray(s0[end0:] + s1[: end1 + 1])
        for p in rng.integers(0, max(len(q), 1), size=max(1, len(q) // 12)):
            q[p] = ord("ACGT"[int(rng.integers(0, 4))])
        q = bytes(q)
        if not q:
            continue
        sp, wp = py_gwfa(g, gi.es, q, v0, end0, v1, end1, 10000)
        res = G._native_gwfa(g, gi.es, q, v0, end0, v1, end1, 10000)
        assert res is not None, "native lib unavailable"
        sn, wn = res
        assert sp == sn and wp == wn


def test_native_chaining_matches_python():
    import minigraph_tpu.mapping.lchain as L
    import minigraph_tpu.mapping.lchain_rmq as LR
    import minigraph_tpu.utils.native as nat

    rng = np.random.default_rng(9)
    for trial in range(4):
        n = int(rng.integers(10, 800))
        tpos = np.sort(rng.integers(0, 50000, size=n))
        qpos = (tpos + rng.integers(-200, 200, size=n)).clip(0)
        seg = rng.integers(0, 3, size=n)
        rev = rng.integers(0, 2, size=n)
        ax = (seg.astype(np.uint64) << np.uint64(33)) \
            | (rev.astype(np.uint64) << np.uint64(32)) \
            | tpos.astype(np.uint64)
        ay = (rng.integers(1, 5, size=n).astype(np.uint64) << np.uint64(56)) \
            | (np.uint64(17) << np.uint64(32)) | qpos.astype(np.uint64)
        perm = np.argsort(ax, kind="stable")
        ax, ay = ax[perm], ay[perm]
        args_dp = (5000, 5000, 500, 25, 5000, 5, 40, 0.1827412, 0.0091371,
                   False, 1)
        rn = L._native_chain("mgt_lchain_dp",
                             args_dp[:9] + (0, 1), ax.copy(), ay.copy())
        assert rn is not None, "native lib unavailable"
        rrn = L._native_chain("mgt_lchain_rmq",
                              (10000, 1000, 1000, 50, 100000, 5, 40,
                               0.1827412, 0.0091371), ax.copy(), ay.copy())
        lib = nat._lib
        nat._lib, nat._tried = None, True
        try:
            rp = L.lchain_dp(*args_dp, ax.copy(), ay.copy())
            rrp = LR.lchain_rmq_impl(10000, 1000, 1000, 50, 100000, 5, 40,
                                     0.1827412, 0.0091371, ax.copy(),
                                     ay.copy())
        finally:
            nat._lib = lib
        for a, b in ((rn, rp), (rrn, rrp)):
            assert a[2] == b[2]
            assert np.array_equal(a[0], b[0])
            assert np.array_equal(a[1], b[1])
            assert np.array_equal(a[3], b[3])


def test_native_shortk_fuzz():
    """Native mgt_shortest_k matches the python engine on random graphs."""
    import numpy as np
    from minigraph_tpu.graph.gfa import Graph
    from minigraph_tpu.graph import shortk as SK

    rng = np.random.default_rng(42)
    for trial in range(20):
        n_seg = int(rng.integers(4, 30))
        g = Graph()
        for i in range(n_seg):
            sid = g.add_seg(f"s{i}")
            g.seg[sid].len = int(rng.integers(50, 2000))
            g.seg[sid].seq = "A" * g.seg[sid].len
            g.seg[sid].snid = -1
            g.seg[sid].rank = int(rng.integers(0, 3))
        n_arc = int(rng.integers(n_seg, n_seg * 3))
        for _ in range(n_arc):
            v = int(rng.integers(0, 2 * n_seg))
            w = int(rng.integers(0, 2 * n_seg))
            if (v >> 1) == (w >> 1):
                continue
            g.add_arc1(v, w, 0, 0)
        g.finalize()
        src = int(rng.integers(0, 2 * n_seg))
        n_dst = int(rng.integers(1, 8))
        mk = int(rng.integers(1, 16))
        md = int(rng.integers(100, 20000))
        wp = bool(rng.integers(0, 2))

        def mk_dst():
            ds = []
            for _ in range(n_dst):
                t = SK.PathDst(v=int(rng.integers(0, 2 * n_seg)))
                t.target_dist = int(rng.integers(-1, 10000))
                t.check_hash = int(rng.integers(0, 2))
                t.inner = int(rng.integers(0, 5) == 0)
                ds.append(t)
            return ds

        state = rng.bit_generator.state
        d1 = mk_dst()
        rng.bit_generator.state = state
        d2 = mk_dst()
        ok, r1 = SK._shortest_k_native(g, src, d1, md, mk, wp)
        assert ok
        orig = SK._shortest_k_native
        SK._shortest_k_native = lambda *a, **k: (False, None)
        try:
            r2 = SK.shortest_k(g, src, d2, md, mk, wp)
        finally:
            SK._shortest_k_native = orig
        for a, b in zip(d1, d2):
            assert (a.n_path, a.dist, a.hash, a.is_0, a.path_end) == \
                (b.n_path, b.dist, b.hash, b.is_0, b.path_end), trial
        if r1 is None or r2 is None:
            assert r1 == r2 or (not wp), trial
        else:
            assert len(r1) == len(r2), trial
            for x, y in zip(r1, r2):
                assert (x.v, x.d, x.pre) == (y.v, y.d, y.pre), trial


def test_native_sketch_fuzz_vs_python():
    """The rewritten native sketch (position-rule formulation) must
    emit the exact record stream of the reference loop, which the
    pure-Python engine reproduces (sketch.c:56-109)."""
    import numpy as np
    from minigraph_tpu.index.sketch import _native_sketch, _py_sketch

    rng = np.random.default_rng(0)
    for t in range(500):
        L = int(rng.integers(1, 300))
        w = int(rng.integers(1, 18))
        k = int(rng.integers(1, 25))  # even k exercises symmetric skips
        s = "".join(rng.choice(list("ACGTN"), L,
                               p=[.24, .24, .24, .24, .04])).encode()
        if rng.random() < 0.3:
            u = s[:max(1, int(rng.integers(1, 20)))]
            s = s[:20] + u * int(rng.integers(2, 10)) + s[20:]
        a = _native_sketch(s, w, k, rid=3)
        b = _py_sketch(s, w, k, rid=3)
        assert a is not None
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]), \
            (t, L, w, k)


def test_native_lchain_dp_fuzz_vs_python():
    """Rewritten native chaining DP (chunked two-pass scan, binary-
    search window, epoch marks, probe-walk backtrack) vs the pure
    Python engine on adversarial anchor sets."""
    import numpy as np
    import minigraph_tpu.mapping.lchain as LC

    rng = np.random.default_rng(7)
    for trial in range(150):
        n = int(rng.integers(1, 400))
        n_v = int(rng.integers(1, 4))       # vertices
        # anchors: clustered diagonals + noise, sorted by x
        rid = rng.integers(0, n_v, n)
        rev = rng.integers(0, 2, n)
        tpos = rng.integers(0, 8000, n)
        qpos = np.minimum(tpos + rng.integers(-300, 300, n), 1 << 20)
        qpos = np.maximum(qpos, 0)
        span = rng.integers(15, 22, n)
        ax = (rid.astype(np.uint64) << np.uint64(33)) \
            | (rev.astype(np.uint64) << np.uint64(32)) \
            | tpos.astype(np.uint64)
        ay = (span.astype(np.uint64) << np.uint64(32)) \
            | qpos.astype(np.uint64)
        perm = np.argsort(ax, kind="stable")
        ax, ay = ax[perm], ay[perm]
        max_skip = int(rng.integers(0, 8))  # small: provokes breaks
        max_iter = int(rng.integers(5, 60))
        bw = int(rng.integers(50, 1000))
        args = (5000, 5000, bw, max_skip, max_iter, 3, 40,
                0.19, 0.009, False, 1)
        r_nat = LC.lchain_dp(*args, ax.copy(), ay.copy())
        orig = LC._native_chain
        LC._native_chain = lambda *a, **k: None
        try:
            r_py = LC.lchain_dp(*args, ax.copy(), ay.copy())
        finally:
            LC._native_chain = orig
        assert r_nat[2] == r_py[2], trial
        assert np.array_equal(r_nat[3], r_py[3]), trial
        assert np.array_equal(r_nat[0], r_py[0]), trial
        assert np.array_equal(r_nat[1], r_py[1]), trial


def test_asan_selftest():
    """Memory-safety harness for the native engines: the fuzz driver
    (native/mgt_selftest.c) built with AddressSanitizer must run
    clean — the analog of the reference's `make asan=1`."""
    import subprocess
    import tempfile
    from pathlib import Path

    nat = Path(__file__).resolve().parents[1] / "native"
    srcs = sorted(str(p) for p in nat.glob("*.c"))
    with tempfile.TemporaryDirectory() as td:
        exe = str(Path(td) / "mgt_selftest")
        r = subprocess.run(
            ["gcc", "-O1", "-g", "-fsanitize=address,undefined",
             "-fno-sanitize-recover=all", "-ffp-contract=off",
             "-o", exe, *srcs, "-lm", "-lz", "-lpthread"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        r = subprocess.run([exe], capture_output=True, text=True,
                           timeout=300)
        assert r.returncode == 0, (r.stdout[-500:], r.stderr[-3000:])
        assert "selftest ok" in r.stdout


def test_native_chain_filters_fuzz_vs_python():
    """native/mgt_filters.c vs the Python filter block on random
    chains (trim offsets, counts, and the IGNORE/FIXED flag pattern
    must be identical)."""
    import numpy as np
    import minigraph_tpu.mapping.filters as F

    class Opt:
        lc_max_occ = 8
        lc_max_trim = 12
        bw = 500
        max_gap = 5000

    rng = np.random.default_rng(77)
    for trial in range(300):
        n = int(rng.integers(1, 200))
        tp = np.cumsum(rng.integers(1, 120, n))
        qp = tp + rng.integers(-400, 400, n)
        occ = rng.integers(1, 20, n)
        span = rng.integers(15, 22, n)
        ax = tp.astype(np.uint64)
        ay = (occ.astype(np.uint64) << np.uint64(56)) \
            | (span.astype(np.uint64) << np.uint64(32)) \
            | (qp & 0xFFFFFFFF).astype(np.uint64)
        score = int(rng.integers(40, 2000))
        ay1 = np.ascontiguousarray(ay)
        ay2 = np.ascontiguousarray(ay.copy())
        axc = np.ascontiguousarray(ax)
        o1, c1 = F.apply_chain_filters(axc, ay1, 0, n, score, Opt)
        # force the python path
        orig = F.apply_chain_filters.__globals__["get_lib"] \
            if "get_lib" in F.apply_chain_filters.__globals__ else None
        off, cnt = F.fix_bad_ends(axc, ay2, Opt.lc_max_occ,
                                  Opt.lc_max_trim, 0, n)
        off, cnt = F.fix_bad_ends_alt(axc, ay2, score, Opt.bw, 100,
                                      off, cnt)
        F.filter_bad_seeds(off, cnt, axc, ay2, 10, 40,
                           Opt.max_gap >> 1, 10)
        F.filter_bad_seeds_alt(off, cnt, axc, ay2, 30, Opt.max_gap >> 1)
        assert (o1, c1) == (off, cnt), trial
        assert np.array_equal(ay1, ay2), trial


def test_native_gchain_stage_matches_python():
    """The fused native graph-chain stage (mgt_lchain_tail +
    mgt_gchain_full) must reproduce the legacy Python tail
    byte-for-byte on a multi-path graph (gchain1.c:62-520 semantics)."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.mapper import map_frag
    from minigraph_tpu.options import (GGOptions, IndexOptions, MapOptions,
                                       opt_check, opt_set)
    from minigraph_tpu.seqio.bseq import BSeqFile
    from minigraph_tpu.seqio.gaf import write_gaf
    import minigraph_tpu.mapping.gchain as gch
    import minigraph_tpu.mapping.lchain as lch

    g = read_gfa(str(REF_DIR / "test" / "MT.gfa"))
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set(None, io_, mo, go)
    opt_check(io_, mo, go)
    gi = build_index(g, io_.k, io_.w, mo)

    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    rng = np.random.default_rng(31)
    reads = []
    for i in range(24):
        L = int(rng.integers(500, 3000))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), len(s) // 12):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((f"r{i}", "".join(s)))

    def run_all():
        out = []
        for name, seq in reads:
            gcs = map_frag(gi, [len(seq)], [seq], mo, name)
            out.append(write_gaf(gi.g, gcs, 1, [len(seq)], name, mo.flag)
                       or "")
        return "".join(out)

    fused = run_all()
    assert fused, "no alignments produced"
    full, tail_t, gdpc, mt = (gch.gchain_full_tab, lch.lchain_tail_tab,
                              gch._gdp_core, gch.map_tail_full)
    try:
        gch.map_tail_full = lambda *a, **k: None
        mid = run_all()          # 3-call native path
        gch.gchain_full_tab = lambda *a, **k: None
        gch._gdp_core = lambda *a, **k: None
        lch.lchain_tail_tab = lambda *a, **k: None
        legacy = run_all()       # pure Python tail
    finally:
        gch.gchain_full_tab = full
        gch._gdp_core = gdpc
        lch.lchain_tail_tab = tail_t
        gch.map_tail_full = mt
    assert fused == mid
    assert fused == legacy


def test_parallel_index_build_matches_serial():
    """mgt_sketch_many (the kt_for bucket-build analog, index.c:207)
    must produce byte-identical flat index tables."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    import minigraph_tpu.index.sketch as sk

    g = read_gfa(str(REF_DIR / "test" / "MT.gfa"))
    gi = build_index(g, 17, 11)
    orig = sk.sketch_many
    try:
        sk.sketch_many = lambda *a, **k: None
        gi2 = build_index(g, 17, 11)
    finally:
        sk.sketch_many = orig
    assert np.array_equal(gi.keys, gi2.keys)
    assert np.array_equal(gi.pos, gi2.pos)
    assert np.array_equal(gi.key_start, gi2.key_start)
    assert np.array_equal(gi.key_cnt, gi2.key_cnt)


def test_sketch_many_fuzz_vs_single():
    """Pthread-pooled sketch must equal the single-segment engine on
    random segments (incl. tiny, N-laden and tie-heavy ones)."""
    from minigraph_tpu.index.sketch import sketch, sketch_many

    rng = np.random.default_rng(77)
    seqs = []
    for i in range(60):
        L = int(rng.integers(1, 5000))
        s = rng.choice(list(b"ACGTN"), L,
                       p=[0.24, 0.24, 0.24, 0.24, 0.04])
        seqs.append(bytes(s.astype(np.uint8)))
    seqs.append(b"ACACACACACAC" * 200)    # tie-heavy tandem
    rids = list(range(len(seqs)))
    res = sketch_many(seqs, 11, 17, rids, n_threads=5)
    assert res is not None
    for i, s in enumerate(seqs):
        x, y = sketch(s, 11, 17, i)
        assert np.array_equal(res[i][0], x), f"seg {i} x"
        assert np.array_equal(res[i][1], y), f"seg {i} y"


def test_batch_driver_matches_per_read_paths():
    """The one-call batch driver (mgt_map_tail_batch) must reproduce
    the per-read path byte-for-byte in all three modes: precomputed
    anchors, host-collect (seed stage in the workers), and -c
    host-collect (base-level CIGAR + ds in the workers), at 1 and 4
    threads (gmap.c:99 + map-algo.c:340 + galign.c:39-293)."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.mapper import _map_batch_native, map_frag
    from minigraph_tpu.options import (MG_M_CIGAR, GGOptions, IndexOptions,
                                       MapOptions, opt_check, opt_set)
    from minigraph_tpu.seqio.gaf import write_gaf

    g = read_gfa(str(REF_DIR / "test" / "MT.gfa"))
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set(None, io_, mo, go)
    opt_check(io_, mo, go)
    gi = build_index(g, io_.k, io_.w, mo)

    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    rng = np.random.default_rng(53)
    reads = []
    for i in range(32):
        L = int(rng.integers(400, 2500))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), len(s) // 15):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((f"r{i}", "".join(s)))

    for cigar in (False, True):
        mc = MapOptions()
        opt_set(None, io_, mc, go)
        if cigar:
            mc.flag |= MG_M_CIGAR
        opt_check(io_, mc, go)
        want = []
        for name, seq in reads:
            gcs = map_frag(gi, [len(seq)], [seq], mc, name,
                           fast_emit=not cigar)
            want.append(write_gaf(gi.g, gcs, 1, [len(seq)], name,
                                  mc.flag) or "")
        items = [(i, name, seq, None)
                 for i, (name, seq) in enumerate(reads)]
        for nt in (1, 4):
            res = _map_batch_native(gi, mc, items, nt,
                                    host_collect=True)
            assert res is not None, "batch driver unavailable"
            n_ok = sum(1 for v in res.values() if v is not None)
            assert n_ok >= len(reads) - 2, f"too many bailed: {n_ok}"
            for i, w in enumerate(want):
                got = res.get(i)
                if got is not None:
                    assert got == w, f"read {i} cigar={cigar} nt={nt}"


def test_native_seq_reader_matches_python():
    """The native FASTA/FASTQ reader must produce the same records as
    the Python parser (+ the mapper's toupper) across formats:
    multiline FASTA, FASTQ with '@'-leading quality lines, CRLF,
    lowercase and U bases, comments, gzip (bseq.c:61-98)."""
    import ctypes as ct
    import gzip as _gz
    import tempfile
    from pathlib import Path

    from minigraph_tpu.seqio.bseq import (BSeqFile, NativeSeqReader,
                                          toupper)

    rng = np.random.default_rng(11)

    def rand_seq(n):
        return "".join(rng.choice(list("ACGTNacgtnuU"), n))

    fa_lines = []
    fq_lines = []
    for i in range(40):
        L = int(rng.integers(0, 900))
        s = rand_seq(L)
        fa_lines.append(f">fa{i} some comment {i}")
        for j in range(0, max(L, 1), 60):
            fa_lines.append(s[j:j + 60])
        q = "".join(rng.choice(list("!@+>#IJK"), L))
        fq_lines.append(f"@fq{i}")
        for j in range(0, max(L, 1), 70):
            fq_lines.append(s[j:j + 70])
        fq_lines.append("+")
        for j in range(0, max(L, 1), 70):
            fq_lines.append(q[j:j + 70])

    cases = {
        "plain.fa": "\n".join(fa_lines) + "\n",
        "crlf.fa": "\r\n".join(fa_lines) + "\r\n",
        "noeol.fa": "\n".join(fa_lines),           # no final newline
        "plain.fq": "\n".join(fq_lines) + "\n",
    }
    with tempfile.TemporaryDirectory() as td:
        for name, text in cases.items():
            p = Path(td) / name
            p.write_text(text)
            pgz = Path(td) / (name + ".gz")
            with _gz.open(pgz, "wt") as f:
                f.write(text)
            for path in (p, pgz):
                fp = BSeqFile(str(path))
                want = []
                while True:
                    b = fp.read_batch(1 << 30, False)
                    if not b:
                        break
                    want += [(s.name, toupper(s.seq)) for s in b]
                fp.close()
                r = NativeSeqReader(str(path))
                got = []
                while True:
                    arena = r.read_batch_arena(5000)   # small batches
                    if arena is None:
                        break
                    n, sq_addr, sq_off, nm_addr, nm_off = arena
                    for k in range(n):
                        nm = ct.string_at(
                            nm_addr + int(nm_off[k]),
                            int(nm_off[k + 1] - nm_off[k])).decode()
                        sq = ct.string_at(
                            sq_addr + int(sq_off[k]),
                            int(sq_off[k + 1] - sq_off[k])).decode()
                        got.append((nm, sq))
                r.close()
                assert len(got) == len(want), (name, path.suffix,
                                               len(got), len(want))
                for a, b in zip(got, want):
                    assert a == b, (name, a[0], b[0], a[1][:40],
                                    b[1][:40])


def test_batch_driver_sr_fragments(oracle, ref_test_dir):
    """Paired-end short reads through the native batch driver must be
    byte-identical to the reference binary under -x sr (heap seed
    collection, fragment merge, ql:B:i; map-algo.c:93-150 +
    format.c frag rules)."""
    import subprocess
    import tempfile
    from pathlib import Path

    from minigraph_tpu.cli import main as cli_main

    # paired reads straight off the MT reference sequences
    ref_fa = ref_test_dir / "MT-human.fa"
    seq = "".join(l.strip() for l in ref_fa.read_text().splitlines()
                  if not l.startswith(">"))
    rng = np.random.default_rng(3)
    comp = str.maketrans("ACGTacgt", "TGCAtgca")
    recs = []
    for i in range(200):
        frag = int(rng.integers(280, 600))
        st = int(rng.integers(0, len(seq) - frag))
        r1 = seq[st:st + 125]
        r2 = seq[st + frag - 125:st + frag].translate(comp)[::-1]
        recs.append((f"q{i}/1", r1))
        recs.append((f"q{i}/2", r2))
    with tempfile.TemporaryDirectory() as td:
        fa = Path(td) / "sr.fa"
        fa.write_text("".join(f">{n}\n{s}\n" for n, s in recs))
        r = subprocess.run(
            [str(oracle), "-x", "sr", str(ref_test_dir / "MT.gfa"),
             str(fa)], capture_output=True, text=True, check=True)
        import io
        import contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cli_main(["-x", "sr", str(ref_test_dir / "MT.gfa"),
                      str(fa)])
        assert buf.getvalue() == r.stdout


@pytest.mark.slow
def test_batch_driver_asan_multithread(ref_test_dir):
    """The full multithreaded batch driver (collect + tails + -c +
    GAF) under AddressSanitizer: the worker pool's grow-and-retry
    paths have twice hidden memory bugs that only ASan catches."""
    import os
    import subprocess
    import tempfile
    from pathlib import Path

    nat = Path(__file__).resolve().parents[1] / "native"
    srcs = sorted(str(p) for p in nat.glob("*.c")
                  if not p.name.endswith("_selftest.c"))
    asan_rt = subprocess.run(
        ["gcc", "-print-file-name=libasan.so"],
        capture_output=True, text=True).stdout.strip()
    driver = r"""
import io, sys
sys.path.insert(0, {repo!r})
from minigraph_tpu.graph.gfa_io import read_gfa
from minigraph_tpu.index.midx import build_index
from minigraph_tpu.options import (IndexOptions, MapOptions, GGOptions,
                                   opt_set, opt_check, MG_M_CIGAR)
from minigraph_tpu.mapping.mapper import _map_file_frag
import minigraph_tpu.utils.native as nat
import ctypes
nat._lib = ctypes.CDLL({so!r})
nat._tried = True
io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
opt_set(None, io_, mo, go)
opt_check(io_, mo, go)
g = read_gfa({gfa!r})
gi = build_index(g, io_.k, io_.w, mo)
for cigar in (False, True):
    mo2 = MapOptions()
    opt_set(None, io_, mo2, go)
    if cigar:
        mo2.flag |= MG_M_CIGAR
    opt_check(io_, mo2, go)
    sink = io.StringIO()
    _map_file_frag(gi, [{reads!r}], mo2, sink, None, None, 4, None)
    assert sink.getvalue()
print("asan batch ok")
"""
    with tempfile.TemporaryDirectory() as td:
        so = str(Path(td) / "libmgt_asan.so")
        r = subprocess.run(
            ["gcc", "-O1", "-g", "-fsanitize=address",
             "-fno-omit-frame-pointer", "-shared", "-fPIC", "-o", so,
             *srcs, "-lm", "-lpthread", "-lz"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        script = Path(td) / "drv.py"
        script.write_text(driver.format(
            repo=str(REPO), so=so,
            gfa=str(ref_test_dir / "MT.gfa"),
            reads=str(ref_test_dir / "MT-orangA.fa")))
        env = dict(os.environ,
                   LD_PRELOAD=asan_rt,
                   ASAN_OPTIONS="detect_leaks=0",
                   JAX_PLATFORMS="cpu")
        r = subprocess.run(["python", str(script)], capture_output=True,
                           text=True, timeout=300, env=env)
        assert r.returncode == 0, (r.stdout[-500:], r.stderr[-3000:])
        assert "asan batch ok" in r.stdout


def test_native_frag_arena_loop(oracle, ref_test_dir):
    """The all-native frag-mode loop (C reader frag batching + in-C
    qname grouping + arena pe_ori flips, mapper._map_arena_frags) must
    be byte-identical to the oracle across arena-batch boundaries: a
    tiny mini_batch_size forces the reader to hold a mate over between
    batches (bseq.c frag rule), gz input exercises the zlib path, and
    a bare-name first mate ("q7" + "q7/2") exercises the per-item
    qname_len override."""
    import gzip
    import io
    import subprocess
    import tempfile
    from pathlib import Path

    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.mapper import _map_file_frag
    from minigraph_tpu.options import (GGOptions, IndexOptions,
                                       MapOptions, opt_check, opt_set)

    ref_fa = ref_test_dir / "MT-human.fa"
    seq = "".join(l.strip() for l in ref_fa.read_text().splitlines()
                  if not l.startswith(">"))
    rng = np.random.default_rng(11)
    comp = str.maketrans("ACGTacgt", "TGCAtgca")
    recs = []
    for i in range(120):
        frag = int(rng.integers(280, 600))
        st = int(rng.integers(0, len(seq) - frag))
        n1 = f"q{i}" if i % 7 == 0 else f"q{i}/1"
        recs.append((n1, seq[st:st + 125]))
        recs.append((f"q{i}/2",
                     seq[st + frag - 125:st + frag]
                     .translate(comp)[::-1]))
    with tempfile.TemporaryDirectory() as td:
        fa = Path(td) / "sr.fa.gz"
        with gzip.open(fa, "wt") as f:
            f.write("".join(f">{n}\n{s}\n" for n, s in recs))
        want = subprocess.run(
            [str(oracle), "-x", "sr", "-K", "2000",
             str(ref_test_dir / "MT.gfa"), str(fa)],
            capture_output=True, text=True, check=True).stdout
        io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
        opt_set("sr", io_, mo, go)
        opt_check(io_, mo, go)
        mo.mini_batch_size = 2000   # ~8 mates per arena batch
        g = read_gfa(str(ref_test_dir / "MT.gfa"))
        gi = build_index(g, io_.k, io_.w, mo)
        sink = io.StringIO()
        _map_file_frag(gi, [str(fa)], mo, sink, None, None, 1, None)
        assert sink.getvalue() == want


def test_probe_fallback_parity(ref_test_dir):
    """The >128M-key binary-search fallback of the native collectors
    (seeds.py get_collect_ctx: no O(1) probe table above the cap)
    must map byte-identically; MGT_PROBE_KEYCAP=0 forces it on a
    small index so the fallback path runs in-suite."""
    import io as _io
    import os

    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.mapper import _map_file_frag
    from minigraph_tpu.options import (GGOptions, IndexOptions,
                                       MapOptions, opt_check, opt_set)

    def run():
        io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
        opt_set("lr", io_, mo, go)
        opt_check(io_, mo, go)
        g = read_gfa(str(ref_test_dir / "MT.gfa"))
        gi = build_index(g, io_.k, io_.w, mo)
        sink = _io.StringIO()
        _map_file_frag(gi, [str(ref_test_dir / "MT-orangA.fa")], mo,
                       sink, None, None, 1, None)
        return sink.getvalue(), getattr(gi, "_collect_ctx")[0][6]

    want, htab = run()
    assert htab is not None          # default: probe table built
    os.environ["MGT_PROBE_KEYCAP"] = "0"
    try:
        got, htab2 = run()
    finally:
        del os.environ["MGT_PROBE_KEYCAP"]
    assert htab2 is None             # fallback: binary search
    assert got == want
