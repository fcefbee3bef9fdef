import io

from minigraph_tpu.graph.gfa_io import read_gfa, write_gfa


def _print_mine(path):
    g = read_gfa(str(path))
    buf = io.StringIO()
    write_gfa(g, buf)
    return buf.getvalue()


def test_roundtrip_mt_gfa(ref_test_dir, run_oracle):
    ref = run_oracle("--ggen", str(ref_test_dir / "MT.gfa"))
    assert _print_mine(ref_test_dir / "MT.gfa") == ref


def test_roundtrip_fasta_as_graph(ref_test_dir, run_oracle):
    ref = run_oracle("--ggen", str(ref_test_dir / "MT-human.fa"))
    assert _print_mine(ref_test_dir / "MT-human.fa") == ref


def test_graph_topology(ref_test_dir):
    g = read_gfa(str(ref_test_dir / "MT.gfa"))
    assert g.n_seg == 8
    # every arc has a complement with the same link_id
    by_link = {}
    for a in g.arc:
        by_link.setdefault(a.link_id, []).append(a)
    for link_id, arcs in by_link.items():
        assert len(arcs) == 2
        a, b = arcs
        assert a.comp != b.comp
        assert (a.v_lv >> 32) == (b.w ^ 1)
    # idx covers all arcs
    total = sum(g.arc_range(v)[1] for v in range(g.n_vtx))
    assert total == g.n_arc
