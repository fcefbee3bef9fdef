"""Contig-scale device seed stage (--seed-device): the query sketch
runs as overlapping device chunks with exact halos
(index/midx_device.sketch_segments_device), stitched on host — the
ggs/asm long-query seed stage on the chip.  Byte parity is the
contract at both the minimizer-stream and the end-to-end GAF level."""
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from minigraph_tpu.graph.gfa import Graph  # noqa: E402
from minigraph_tpu.index.midx import build_index  # noqa: E402
from minigraph_tpu.mapping.seeds import (collect_minimizers,  # noqa: E402
                                         collect_minimizers_device)
from minigraph_tpu.options import (GGOptions, IndexOptions,  # noqa: E402
                                   MapOptions, opt_check, opt_set)
from minigraph_tpu.tools.synth import (make_haplotype,  # noqa: E402
                                       make_reference, write_fasta)

REPO = "/root/repo"


def _graph_from_ref(ref):
    g = Graph()
    sid = g.add_seg("s1")
    g.seg[sid].seq = ref
    g.seg[sid].len = len(ref)
    g.seg[sid].snid = g.sseq_add("chr1")
    g.seg[sid].soff = 0
    g.seg[sid].rank = 0
    g.finalize()
    return g


def test_chunked_query_sketch_byte_parity():
    """256 kb query: device chunk-halo minimizer stream == host."""
    ref = make_reference(300_000, seed=9)
    contig = make_haplotype(ref, seed=10)[:262_144]
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set("asm", io_, mo, go)
    g = _graph_from_ref(ref)
    gi = build_index(g, io_.k, io_.w, mo)
    mv_x0, mv_y0 = collect_minimizers(gi, [len(contig)], [contig.upper()])
    mv_x1, mv_y1 = collect_minimizers_device(gi, [len(contig)],
                                             [contig.upper()])
    assert len(mv_x0) > 1000
    assert np.array_equal(mv_x0, mv_x1)
    assert np.array_equal(mv_y0, mv_y1)


@pytest.mark.slow
def test_seed_device_cli_gaf_parity(tmp_path):
    """End-to-end: -xasm mapping of a 256 kb contig with and without
    --seed-device produces byte-identical GAF."""
    ref = make_reference(300_000, seed=9)
    contig = make_haplotype(ref, seed=11)[:262_144]
    ref_fa = tmp_path / "ref.fa"
    ctg_fa = tmp_path / "ctg.fa"
    write_fasta(ref_fa, [("chr1", ref)])
    write_fasta(ctg_fa, [("ctg1", contig)])
    outs = []
    for extra in ([], ["--seed-device"]):
        r = subprocess.run(
            [sys.executable, "-m", "minigraph_tpu", "-x", "asm", *extra,
             str(ref_fa), str(ctg_fa)],
            capture_output=True, text=True, timeout=1200, cwd=REPO)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(r.stdout)
    assert outs[0] == outs[1]
    assert outs[0].count("\n") >= 1
