"""anno/genecopy post-processing tools (misc/mgutils.js:174-551,
:1250-1410): classification cascade, walk-interval extraction, greedy
copy selection, and the JS output layout (tab join, comma-flattened
nested arrays)."""
import io

from minigraph_tpu.tools.mgutils3 import cmd_anno, cmd_genecopy


def test_anno_classification(tmp_path):
    bed = tmp_path / "in.bed"
    bed.write_text("chr1\t100\t200\t150\nchr2\t0\t50\t80\n")
    etrf = tmp_path / "etrf.txt"
    # period-3 tandem repeat over [0,120) of the first bubble
    etrf.write_text("chr1_100_200\t0\t120\tAAT\t3\t40\n")
    dust = tmp_path / "dust.txt"
    dust.write_text("chr2_0_50\t10\t50\n")
    out = io.StringIO()
    assert cmd_anno(["-e", str(etrf), "-d", str(dust), str(bed)],
                    out=out) == 0
    assert out.getvalue().splitlines() == [
        # micro cov 120 >= 0.7*150 -> dominant class wins
        "chr1\t100\t200\t150\tmicro\tmicro:120\tLCR:120",
        # LCR cov 40: below every 0.7 cutoff, above the 5% floor
        "chr2\t0\t50\t80\tpartial\tLCR:40",
    ]


def test_anno_rm_classes(tmp_path):
    bed = tmp_path / "in.bed"
    bed.write_text("chr3\t10\t20\t400\n")
    rm = tmp_path / "rm.out"
    cols = ["500", "1.0", "0.0", "0.0", "chr3_10_20", "1", "350", "(0)",
            "+", "L1HS", "LINE/L1", "1", "350", "(0)", "1"]
    rm.write_text(" ".join(cols) + "\n")
    out = io.StringIO()
    assert cmd_anno(["-r", str(rm), "-m", str(bed)], out=out) == 0
    line = out.getvalue().splitlines()[0].split("\t")
    # -m + L1HS at 1.0% divergence: annotated as the mobile subclass
    assert line[4] == "LINE/L1HS"
    assert "LINE/L1HS:350" in line
    assert "_l1:350" in line


def test_genecopy_selection(tmp_path):
    src = tmp_path / "src.bed"
    src.write_text("chr1\t1000\t2000\tgeneA\t.\t+\n")
    gaf = tmp_path / "in.gaf"
    gaf.write_text(
        # clean distal copy of geneA (score 950)
        "geneA\t1000\t0\t950\t+\tchr1\t10000\t5000\t5950\t950\t950\t60"
        "\tcg:Z:950=\n"
        # hit over the source locus itself (score 945): excluded via
        # the src overlap rule, still counts as prior coverage
        "geneA\t1000\t0\t980\t+\tchr1\t10000\t1000\t1990\t949\t950\t60"
        "\tcg:Z:800=1*149=\n"
        # walk-format hit spanning two segments
        "geneB\t500\t0\t480\t+\t>s1:0-300>s2:0-400\t700\t100\t600\t480"
        "\t480\t60\tcg:Z:480=\n")
    out = io.StringIO()
    assert cmd_genecopy([str(gaf), str(src)], out=out) == 0
    assert out.getvalue().splitlines() == [
        "OG\tgeneA\t1\t990\t990\tgeneA",
        "GH\tgeneA\t1000\t0\t950\t950\t0\tchr1,5000,5950,1",
        "GH\tgeneB\t500\t0\t480\t480\t0\ts1,100,300,1,s2,0,300,1",
        "GC\tgeneA\t2\t1",
        "GC\tgeneB\t1\t1",
    ]
