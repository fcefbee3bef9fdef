"""End-to-end byte-parity tests against the reference binary
(BASELINE.md parity configs)."""
import io

import pytest

from minigraph_tpu.graph.gfa_io import read_gfa
from minigraph_tpu.mapping.mapper import map_files
from minigraph_tpu.options import GGOptions, IndexOptions, MapOptions, opt_set


def _map(graph_fn, query_fns, preset=None, **kw):
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    if preset:
        assert opt_set(preset, io_, mo, go) == 0
    for k, v in kw.items():
        setattr(mo, k, v)
    g = read_gfa(str(graph_fn))
    buf = io.StringIO()
    map_files(g, [str(f) for f in query_fns], io_, mo, out=buf)
    return buf.getvalue()


def test_config1_paf_seq_to_seq(ref_test_dir, run_oracle):
    """minigraph MT-human.fa MT-orangA.fa → PAF (config 1)."""
    ref = run_oracle(str(ref_test_dir / "MT-human.fa"),
                     str(ref_test_dir / "MT-orangA.fa"))
    mine = _map(ref_test_dir / "MT-human.fa", [ref_test_dir / "MT-orangA.fa"])
    assert mine == ref


def test_config2_gaf_seq_to_graph(ref_test_dir, run_oracle):
    """minigraph MT.gfa MT-orangA.fa → GAF (config 2)."""
    ref = run_oracle(str(ref_test_dir / "MT.gfa"),
                     str(ref_test_dir / "MT-orangA.fa"))
    mine = _map(ref_test_dir / "MT.gfa", [ref_test_dir / "MT-orangA.fa"])
    assert mine == ref


def test_gaf_chimp_query(ref_test_dir, run_oracle):
    ref = run_oracle(str(ref_test_dir / "MT.gfa"),
                     str(ref_test_dir / "MT-chimp.fa"))
    mine = _map(ref_test_dir / "MT.gfa", [ref_test_dir / "MT-chimp.fa"])
    assert mine == ref


def test_gaf_human_self(ref_test_dir, run_oracle):
    ref = run_oracle(str(ref_test_dir / "MT.gfa"),
                     str(ref_test_dir / "MT-human.fa"))
    mine = _map(ref_test_dir / "MT.gfa", [ref_test_dir / "MT-human.fa"])
    assert mine == ref


def test_asm_preset_gaf(ref_test_dir, run_oracle):
    """-x asm exercises the RMQ chaining engine."""
    ref = run_oracle("-x", "asm", str(ref_test_dir / "MT.gfa"),
                     str(ref_test_dir / "MT-orangA.fa"))
    mine = _map(ref_test_dir / "MT.gfa", [ref_test_dir / "MT-orangA.fa"],
                preset="asm")
    assert mine == ref


def test_vertex_coordinates(ref_test_dir, run_oracle):
    from minigraph_tpu.options import MG_M_VERTEX_COOR
    ref = run_oracle("--vc", str(ref_test_dir / "MT.gfa"),
                     str(ref_test_dir / "MT-orangA.fa"))
    mine = _map(ref_test_dir / "MT.gfa", [ref_test_dir / "MT-orangA.fa"],
                flag=MG_M_VERTEX_COOR)
    assert mine == ref


def test_config3_cigar_gaf(ref_test_dir, run_oracle):
    """-c base-level alignment → CIGAR+ds GAF (config 3)."""
    from minigraph_tpu.options import MG_M_CIGAR
    ref = run_oracle("-c", str(ref_test_dir / "MT.gfa"),
                     str(ref_test_dir / "MT-orangA.fa"))
    mine = _map(ref_test_dir / "MT.gfa", [ref_test_dir / "MT-orangA.fa"],
                flag=MG_M_CIGAR)
    assert mine == ref


def test_cigar_asm_preset(ref_test_dir, run_oracle):
    from minigraph_tpu.options import MG_M_CIGAR
    ref = run_oracle("-cx", "asm", str(ref_test_dir / "MT.gfa"),
                     str(ref_test_dir / "MT-chimp.fa"))
    io_kw = {}
    mine = _map(ref_test_dir / "MT.gfa", [ref_test_dir / "MT-chimp.fa"],
                preset="asm", flag=__import__("minigraph_tpu.options", fromlist=["x"]).MG_M_RMQ | MG_M_CIGAR)
    assert mine == ref
