"""Post-processing utilities: merge + merge2vcf chain."""
import io

from minigraph_tpu.tools.mgutils import cmd_merge, cmd_merge2vcf


def test_merge_and_merge2vcf(tmp_path):
    # three pasted per-sample --call rows (6 cols each)
    base1 = "chr1\t100\t200\t>s1\t>s3"
    base2 = "chr1\t500\t500\t>s3\t>s4"
    pasted = (
        f"{base1}\t>s2:100:+:ref:90:190\t{base1}\t>s2:100:+:hapA:80:180\t"
        f"{base1}\t>s9:140:+:hapB:70:200\n"
        f"{base2}\t*:0:+:ref:490:500\t{base2}\t.\t"
        f"{base2}\t*:0:-:hapB:40:50\n"
    )
    inp = tmp_path / "pasted.bed"
    inp.write_text(pasted)
    samples = tmp_path / "samples.txt"
    samples.write_text("ref\nhapA\nhapB\n")

    out = io.StringIO()
    assert cmd_merge(["-s", str(samples), str(inp)], out=out) == 0
    merged = out.getvalue()
    lines = [l for l in merged.splitlines() if not l.startswith("##")]
    assert lines[0].startswith("#CHROM")
    row1 = lines[1].split("\t")
    assert "NS=3" in row1[3] and "NA=2" in row1[3]
    assert "AWALK=>s2,>s9" in row1[3]
    assert row1[5].startswith("0:")  # most frequent allele = 0
    assert row1[7].startswith("1:")
    row2 = lines[2].split("\t")
    assert row2[6] == "."

    mb = tmp_path / "merged.bed"
    mb.write_text(merged)
    out2 = io.StringIO()
    assert cmd_merge2vcf(["-r", "0", str(mb)], out=out2) == 0
    vcf = out2.getvalue()
    body = [l for l in vcf.splitlines() if not l.startswith("#")]
    assert len(body) == 2
    t = body[0].split("\t")
    assert t[0] == "chr1" and t[1] == "100"
    assert t[4] == "<X:1>"
    assert "AN=3" in t[7]
    # ref sample's allele rotated to 0
    assert t[9].startswith("0:") and t[11].startswith("1:")
