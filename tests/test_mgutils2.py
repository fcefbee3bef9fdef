"""Tests for the second batch of mgutils subcommands."""
import io
import subprocess

import pytest

from minigraph_tpu.tools import mgutils2 as m2

REF_GFA = "/root/reference/test/MT.gfa"
REF_FA = "/root/reference/test/MT-orangA.fa"


def test_stablegaf_roundtrip(oracle, tmp_path):
    """--vc GAF converted by stableGaf equals the oracle's own stable
    output (columns 1-9; per-record tags ride through verbatim)."""
    vc = subprocess.run([str(oracle), "--vc", REF_GFA, REF_FA],
                        capture_output=True, text=True, check=True).stdout
    stable = subprocess.run([str(oracle), REF_GFA, REF_FA],
                            capture_output=True, text=True,
                            check=True).stdout
    gaf = tmp_path / "vc.gaf"
    gaf.write_text(vc)
    out = io.StringIO()
    assert m2.cmd_stable_gaf([REF_GFA, str(gaf)], out=out) == 0
    got = ["\t".join(ln.split("\t")[:9]) for ln in
           out.getvalue().splitlines()]
    want = ["\t".join(ln.split("\t")[:9]) for ln in stable.splitlines()]
    assert got == want


def test_renamefa_joinfa(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">old#ctg1\nACGTACGTACGT\n>ctg2\nGGGG\n")
    out = io.StringIO()
    m2.cmd_renamefa(["s1", str(fa)], out=out)
    assert out.getvalue() == \
        ">s1#ctg1\nACGTACGTACGT\n>s1#ctg2\nGGGG\n"
    out = io.StringIO()
    m2.cmd_joinfa(["-l", "4", "-n", "3", "-s", "cat", str(fa)], out=out)
    assert out.getvalue() == ">cat\nACGTACGTACGTNNNGGGG\n"


def test_paf2bl(tmp_path):
    paf = tmp_path / "in.paf"
    rows = [
        # kept: de in [0.01, 0.1], mapq>=5, len>=500
        "q1\t1000\t0\t900\t+\tt1\t5000\t100\t1000\t800\t900\t60\t"
        "de:f:0.05",
        # dropped: secondary
        "q2\t1000\t0\t900\t+\tt1\t5000\t100\t1000\t800\t900\t60\t"
        "tp:A:S\tde:f:0.05",
        # dropped: low divergence
        "q3\t1000\t0\t900\t+\tt2\t5000\t200\t900\t800\t900\t60\t"
        "de:f:0.001",
    ]
    paf.write_text("\n".join(rows) + "\n")
    out = io.StringIO()
    m2.cmd_paf2bl([str(paf)], out=out)
    assert out.getvalue() == "t1\t100\t1000\n"
    out = io.StringIO()
    m2.cmd_paf2bl(["-s", str(paf)], out=out)  # sub mode: de <= 0.002
    assert out.getvalue() == "t2\t200\t900\n"


def test_sveval_basic(tmp_path):
    vcf = tmp_path / "true.vcf"
    vcf.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        # 200bp insertion at chr1:1000 (ALT longer)
        "chr1\t1000\tv1\tA\t" + "A" * 201 + "\t.\tPASS\t.\tGT\t1/1\n"
        # 150bp deletion at chr1:5000
        "chr1\t5000\tv2\t" + "C" * 151 + "\tC\t.\tPASS\t.\tGT\t0/1\n")
    bed = tmp_path / "conf.bed"
    bed.write_text("chr1\t0\t100000\n")
    calls = tmp_path / "call.txt"
    # one call overlapping v1 (TP), none near v2 (FN), one extra (FP)
    calls.write_text(
        "chr1\t950\t1050\t30\t.\t.\t.\t*\t" + "A" * 200 + "\n"
        "chr1\t20000\t20100\t30\t.\t.\t.\t" + "G" * 200 + "\t*\n")
    out = io.StringIO()
    assert m2.cmd_sveval([str(vcf), str(bed), str(calls)], out=out) == 0
    lines = dict(ln.split("\t", 1) for ln in out.getvalue().splitlines())
    assert lines["NA"].startswith("1\t2")   # 1 FN of 2 true
    assert lines["PA"].startswith("1\t2")   # 1 FP of 2 calls


def test_addsample(tmp_path):
    bed = tmp_path / "m.bed"
    bed.write_text("##fileformat=x\n#CHROM\tother\nchr1\t1\t2\n")
    sm = tmp_path / "s.txt"
    sm.write_text("sampleA\nsampleB extra\n")
    out = io.StringIO()
    m2.cmd_addsample([str(bed), str(sm)], out=out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "##fileformat=x"
    assert lines[1] == "#CHROM\tSTART\tEND\tINFO\tFORMAT\tsampleA\tsampleB"
    assert lines[2] == "chr1\t1\t2"


def test_classify_repeat():
    assert m2.classify_repeat("SINE/Alu") == "01_Alu"
    assert m2.classify_repeat("mini") == "11_VNTR"
    assert m2.classify_repeat("weird") == "20_Other-repeat"
    assert m2.classify_repeat("segdup") == "21_SegDup"
