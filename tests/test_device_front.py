"""Parity tests for the production device front-end (--tpu path).

Contract: every read either takes the device seed stage with BYTE
parity against the host collect_seed_hits (anchors incl. order,
rep_len, mini_pos, n_mv), or carries an overflow flag and falls back
to the host path — so CLI output is byte-identical either way.
"""
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from minigraph_tpu.graph.gfa_io import read_gfa  # noqa: E402
from minigraph_tpu.index.midx import build_index  # noqa: E402
from minigraph_tpu.options import (GGOptions, IndexOptions,  # noqa: E402
                                   MapOptions, opt_set)
from minigraph_tpu.mapping.seeds import (collect_minimizers,  # noqa: E402
                                         collect_seed_hits)
from minigraph_tpu.mapping.device_front import DeviceFront  # noqa: E402

MT_GFA = "/root/reference/test/MT.gfa"


def _opts(preset="lr"):
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set(preset, io_, mo, go)
    return io_, mo, go


def _mt_reads(rng, n, lmax, tandem=0):
    g = read_gfa(MT_GFA)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    reads = []
    for _ in range(n):
        L = int(rng.integers(300, lmax))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), len(s) // 20):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    for _ in range(tandem):
        L = int(rng.integers(300, lmax))
        st = int(rng.integers(0, len(ref) - L))
        s = ref[st:st + L]
        reads.append(s[:100] + s[:30] * 5 + s[100:])
    return g, reads


def test_front_matches_host_collect():
    rng = np.random.default_rng(5)
    io_, mo, go = _opts()
    g, reads = _mt_reads(rng, 30, 1000, tandem=8)
    gi = build_index(g, io_.k, io_.w, mo)
    front = DeviceFront(gi, mo, buckets=((1024, 64),), chain=False)
    res = front.run_batch(reads)
    n_dev = 0
    for r, fr in zip(reads, res):
        mv_x, mv_y = collect_minimizers(gi, [len(r)], [r])
        hax, hay, hrep, hmini = collect_seed_hits(
            gi, mo, mo.occ_max1, mv_x, mv_y, None)
        if fr is None:
            continue  # flagged read: host path covers it
        n_dev += 1
        assert np.array_equal(fr.ax, hax)
        assert np.array_equal(fr.ay, hay)
        assert fr.rep_len == hrep
        assert np.array_equal(fr.mini_pos, np.asarray(hmini, np.int32))
        assert fr.n_mv == len(mv_x)
    # device must actually cover the bulk of ordinary reads
    assert n_dev >= 25


def test_front_flags_tandem_dup_x():
    """Reads with duplicate anchor x keys must be flagged (the
    reference's MSD radix sort permutes equal keys unstably)."""
    rng = np.random.default_rng(11)
    io_, mo, go = _opts()
    g, reads = _mt_reads(rng, 0, 1500, tandem=10)
    gi = build_index(g, io_.k, io_.w, mo)
    front = DeviceFront(gi, mo, buckets=((2048, 16),), chain=False)
    res = front.run_batch(reads)
    for r, fr in zip(reads, res):
        if fr is None:
            continue
        # unflagged tandem reads must still be exact
        mv_x, mv_y = collect_minimizers(gi, [len(r)], [r])
        hax, hay, _, _ = collect_seed_hits(
            gi, mo, mo.occ_max1, mv_x, mv_y, None)
        assert np.array_equal(fr.ax, hax)
        assert np.array_equal(fr.ay, hay)


@pytest.mark.slow
def test_cli_tpu_parity_configs12(tmp_path, oracle):
    """BASELINE configs 1-2 through --tpu == oracle byte-for-byte.

    Config 1 maps FASTA-as-graph (PAF), config 2 maps the rGFA graph
    (GAF); the query is the whole 16.6 kb MT-orangA molecule, so this
    also exercises the 32 kb device bucket."""
    ref = "/root/reference/test"
    for tgt in (f"{ref}/MT-human.fa", f"{ref}/MT.gfa"):
        want = subprocess.run(
            [str(oracle), tgt, f"{ref}/MT-orangA.fa"],
            capture_output=True, text=True, check=True).stdout
        got = subprocess.run(
            [sys.executable, "-m", "minigraph_tpu", "--tpu", tgt,
             f"{ref}/MT-orangA.fa"],
            capture_output=True, text=True, check=True)
        assert got.stdout == want, f"--tpu output differs for {tgt}"
        assert "device seed stage" in got.stderr


@pytest.mark.slow
def test_front_long_reads_16k_bucket():
    """15 kb-class reads through the 16384 bucket: anchors, rep_len,
    mini_pos and device-chain results must match the host exactly
    (copies are taken because the native finisher compacts anchors in
    place)."""
    rng = np.random.default_rng(31)
    io_, mo, go = _opts()
    g = read_gfa(MT_GFA)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    reads = []
    for _ in range(8):
        L = int(rng.integers(9000, 16000))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), len(s) // 25):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    gi = build_index(g, io_.k, io_.w, mo)
    front = DeviceFront(gi, mo, buckets=((16384, 8),), chain=False)
    res = front.run_batch(reads)
    n_dev = 0
    for r, fr in zip(reads, res):
        if fr is None:
            continue
        n_dev += 1
        mv_x, mv_y = collect_minimizers(gi, [len(r)], [r])
        hax, hay, hrep, hmini = collect_seed_hits(
            gi, mo, mo.occ_max1, mv_x, mv_y, None)
        assert np.array_equal(fr.ax, hax)
        assert np.array_equal(fr.ay, hay)
        assert fr.rep_len == hrep
        assert np.array_equal(fr.mini_pos, np.asarray(hmini, np.int32))
    assert n_dev >= 6


@pytest.mark.slow
def test_cli_tpu_cov_parity(oracle):
    """--cov through the device path: dc:f coverage tags on the output
    graph must equal the oracle's byte-for-byte."""
    ref = "/root/reference/test"
    args = ["--cov", f"{ref}/MT.gfa", f"{ref}/MT-orangA.fa"]
    want = subprocess.run([str(oracle), *args], capture_output=True,
                          text=True, check=True).stdout
    got = subprocess.run(
        [sys.executable, "-m", "minigraph_tpu", "--tpu", *args],
        capture_output=True, text=True, check=True)
    assert got.stdout == want


@pytest.mark.slow
def test_threaded_tails_parity():
    """-t N with the device front: thread-pooled host tails (the
    whole-tail native call releases the GIL) must emit byte-identical
    output in input order."""
    import io

    import numpy as np
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.device_front import DeviceFront
    from minigraph_tpu.mapping.mapper import _map_file_frag
    from minigraph_tpu.options import (GGOptions, IndexOptions,
                                       MapOptions, opt_check, opt_set)

    g = read_gfa("/root/reference/test/MT.gfa")
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    rng = np.random.default_rng(11)
    import tempfile
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    for i in range(48):
        L = int(rng.integers(200, 850))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), len(s) // 14):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        fa.write(f">r{i}\n{''.join(s)}\n")
    fa.close()
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set(None, io_, mo, go)
    opt_check(io_, mo, go)
    gi = build_index(g, io_.k, io_.w, mo)
    front = DeviceFront(gi, mo, buckets=((1024, 48),))
    outs = []
    for nt in (1, 3):
        sink = io.StringIO()
        _map_file_frag(gi, [fa.name], mo, sink, None, None, nt, front)
        outs.append(sink.getvalue())
    assert outs[0] and outs[0] == outs[1]


def test_collapsed_split_native_loop_parity(monkeypatch):
    """A front whose split state has COLLAPSED rides the all-native
    reader loop (no Python parse) with a quarter-batch device probe
    every 8th batch — output must be byte-identical to the pure host
    path, and the probe must refresh t_dev."""
    import io
    import tempfile

    import minigraph_tpu.mapping.mapper as M
    from minigraph_tpu.mapping.mapper import _map_file_frag
    from minigraph_tpu.options import opt_check

    g = read_gfa(MT_GFA)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    rng = np.random.default_rng(17)
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    for i in range(60):
        L = int(rng.integers(300, 900))
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st:st + L])
        for p in rng.integers(0, len(s), len(s) // 16):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        fa.write(f">r{i}\n{''.join(s)}\n")
    fa.close()
    io_, mo, go = _opts()
    opt_check(io_, mo, go)
    mo.mini_batch_size = 2000   # ~2-3 reads/batch -> >= 8 batches
    gi = build_index(g, io_.k, io_.w, mo)

    sink = io.StringIO()
    _map_file_frag(gi, [fa.name], mo, sink, None, None, 1, None)
    want = sink.getvalue()

    called = {}
    orig = M._map_file_native

    def spy(*a, **kw):
        called["native"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(M, "_map_file_native", spy)
    front = DeviceFront(gi, mo, buckets=((1024, 64),), chain=False)
    front._split_state = {"share": 1.0, "collapsed": True,
                          "t_host": None, "t_dev": None}
    sink = io.StringIO()
    _map_file_frag(gi, [fa.name], mo, sink, None, None, 1, front)
    assert sink.getvalue() == want
    assert called.get("native"), "collapsed front must take the native loop"
    assert front._split_state["t_dev"] is not None, \
        "the every-8th-batch device probe must refresh t_dev"


def test_probe_interval_scales_with_cost_ratio():
    """Probe spacing must grow with the device/host cost ratio so
    probe overhead stays bounded (~5%) for expensive long-read
    batches, and stay at the floor while estimates are missing."""
    from minigraph_tpu.mapping.mapper import _probe_interval

    assert _probe_interval({}) == 8
    assert _probe_interval({"t_dev": None, "t_host": 1e-3}) == 8
    # short reads: ~5.7x ratio -> ~28 batches
    iv = _probe_interval({"t_dev": 1.02e-3, "t_host": 0.18e-3})
    assert 20 <= iv <= 32
    # long reads: ~26x ratio -> >= 100 batches
    iv = _probe_interval({"t_dev": 70e-3, "t_host": 2.7e-3})
    assert iv >= 100
    # never below 8, never above 256
    assert _probe_interval({"t_dev": 1e-6, "t_host": 1.0}) == 8
    assert _probe_interval({"t_dev": 10.0, "t_host": 1e-4}) == 256


def test_front_chains_match_host():
    """chains mode (the production default): fr.ax/ay are the
    COMPACTED chain anchors and fr.u the chain records, all equal to
    the host linear-chain engine's output byte-for-byte."""
    from minigraph_tpu.mapping.lchain import lchain_dp
    from minigraph_tpu.utils.hashes import expf

    rng = np.random.default_rng(7)
    io_, mo, go = _opts()
    g, reads = _mt_reads(rng, 30, 1800, tandem=4)
    gi = build_index(g, io_.k, io_.w, mo)
    tmp = expf(-np.float32(mo.div) * np.float32(gi.k))
    cpg = float(np.float32(np.float32(mo.chn_pen_gap) * np.float32(tmp)))
    cps = float(np.float32(np.float32(mo.chn_pen_skip)
                           * np.float32(tmp)))
    front = DeviceFront(gi, mo, buckets=((2048, 64),))
    res = front.run_batch(reads)
    n_dev = 0
    for r, fr in zip(reads, res):
        if fr is None:
            continue
        n_dev += 1
        assert fr.u is not None
        mv_x, mv_y = collect_minimizers(gi, [len(r)], [r])
        hax, hay, hrep, hmini = collect_seed_hits(
            gi, mo, mo.occ_max1, mv_x, mv_y, None)
        cx, cy, hnu, hu = lchain_dp(
            mo.max_gap, mo.max_gap, mo.bw, mo.max_lc_skip,
            mo.max_lc_iter, mo.min_lc_cnt, mo.min_lc_score, cpg, cps,
            False, 1, hax.copy(), hay.copy())
        assert len(fr.u) == hnu
        assert np.array_equal(np.asarray(fr.u), hu)
        assert np.array_equal(np.asarray(fr.ax), cx)
        assert np.array_equal(np.asarray(fr.ay), cy)
        assert fr.rep_len == hrep
        assert np.array_equal(fr.mini_pos, np.asarray(hmini, np.int32))
    assert n_dev >= 25
