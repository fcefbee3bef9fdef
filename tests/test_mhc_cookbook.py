"""MHC-class cookbook: multi-Mb multi-haplotype graph construction,
per-sample bubble calling, and the merge → VCF chain.

Synthetic stand-in for the reference's human-MHC cookbook
(reference README.md:142-163; the Zenodo tarball is unavailable
offline): an MHC-like 1 Mb reference with diverged repeat families +
4 SV-carrying haplotypes (tools/synth.py).  The minigraph-binary
stages are pinned BYTE-IDENTICAL to the oracle; the offline merge
utilities (mgutils) are checked semantically.

This also pins the former one-off "synthetic scale" checks
(docs/STATUS.md) as a regression test.
"""
import io
import subprocess
import sys

import pytest

from minigraph_tpu.tools.synth import (make_haplotype, make_reference,
                                       write_fasta)

N_HAPS = 4
REF_LEN = 1_000_000


@pytest.fixture(scope="module")
def cookbook(tmp_path_factory):
    d = tmp_path_factory.mktemp("mhc")
    ref = make_reference(REF_LEN, seed=42)
    write_fasta(d / "ref.fa", [("chr1", ref)])
    for h in range(N_HAPS):
        hap = make_haplotype(ref, seed=100 + h)
        write_fasta(d / f"hap{h}.fa", [(f"h{h}#chr1", hap)])
    return d


def _run_ours(args):
    r = subprocess.run([sys.executable, "-m", "minigraph_tpu", *args],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _run_ref(oracle, args):
    return subprocess.run([str(oracle), *args], capture_output=True,
                          text=True, check=True).stdout


@pytest.mark.slow
def test_ggs_build_parity(cookbook, oracle):
    haps = [str(cookbook / f"hap{h}.fa") for h in range(N_HAPS)]
    args = ["-cxggs", str(cookbook / "ref.fa"), *haps]
    want = _run_ref(oracle, args)
    got = _run_ours(args)
    assert got == want
    (cookbook / "graph.gfa").write_text(got)
    # the graph must actually contain structure (SVs became bubbles)
    n_seg = sum(1 for ln in got.splitlines() if ln.startswith("S"))
    assert n_seg > 50


@pytest.mark.slow
def test_call_bed_parity_and_vcf(cookbook, oracle):
    if not (cookbook / "graph.gfa").exists():
        pytest.skip("graph build failed or test order changed")
    gfa = str(cookbook / "graph.gfa")
    beds = []
    samples = ["ref"] + [f"hap{h}" for h in range(2)]
    for s in samples:
        fa = str(cookbook / ("ref.fa" if s == "ref" else f"{s}.fa"))
        args = ["-cxasm", "--call", gfa, fa]
        want = _run_ref(oracle, args)
        got = _run_ours(args)
        assert got == want, f"--call BED differs for {s}"
        beds.append(got)

    # paste the per-sample beds and run merge -> merge2vcf (mgutils)
    from minigraph_tpu.tools.mgutils import cmd_merge, cmd_merge2vcf
    rows = [b.splitlines() for b in beds]
    assert len({len(r) for r in rows}) == 1  # same bubble count
    pasted = "\n".join("\t".join(parts)
                       for parts in zip(*rows)) + "\n"
    pasted_f = cookbook / "pasted.bed"
    pasted_f.write_text(pasted)
    samples_f = cookbook / "samples.txt"
    samples_f.write_text("\n".join(samples) + "\n")
    out = io.StringIO()
    assert cmd_merge(["-s", str(samples_f), str(pasted_f)], out=out) == 0
    merged = out.getvalue()
    mb = cookbook / "merged.bed"
    mb.write_text(merged)
    out2 = io.StringIO()
    assert cmd_merge2vcf(["-r", "0", str(mb)], out=out2) == 0
    vcf = out2.getvalue()
    body = [ln for ln in vcf.splitlines() if not ln.startswith("#")]
    # every bubble row becomes a VCF record with all samples genotyped
    assert len(body) == len(rows[0])
    assert len(body) > 20
    head = [ln for ln in vcf.splitlines() if ln.startswith("#CHROM")][0]
    assert head.split("\t")[9:] == samples
