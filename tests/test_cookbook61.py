"""Reference-shaped cookbook: 5 Mb reference x 61 SV-carrying
haplotypes through the full workflow — `-cxggs` incremental build,
per-sample `-cxasm --call`, mgutils merge -> merge2vcf — with the
minigraph-binary stages pinned BYTE-IDENTICAL to the oracle.

This mirrors the reference's human-MHC cookbook (README.md:142-163:
~5 Mb MHC, 61 haplotypes, build ~7 min on one node); the existing
1 Mb x 4-hap test (test_mhc_cookbook.py) stays as the fast tier.
Wall cost is dominated by the two -cxggs builds (ours + oracle), so
the whole file is slow-marked; BENCH side metrics (build/call walls)
go to stderr for the driver to record.
"""
import subprocess
import sys
import time

import pytest

from minigraph_tpu.tools.synth import (make_haplotype, make_reference,
                                       write_fasta)

import os

N_HAPS = int(os.environ.get("CB61_HAPS", 61))
REF_LEN = int(os.environ.get("CB61_LEN", 5_000_000))
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cookbook61(tmp_path_factory):
    d = tmp_path_factory.mktemp("mhc61")
    ref = make_reference(REF_LEN, seed=61)
    write_fasta(d / "ref.fa", [("chr6", ref)])
    for h in range(N_HAPS):
        hap = make_haplotype(ref, seed=6100 + h, sv_per_mb=8.0)
        write_fasta(d / f"hap{h}.fa", [(f"h{h}#chr6", hap)])
    return d


def _run_ours(args, timeout=3600):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "minigraph_tpu", *args],
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout, time.time() - t0


def _run_ref(oracle, args, timeout=3600):
    t0 = time.time()
    r = subprocess.run([str(oracle), *args], capture_output=True,
                       text=True, check=True, timeout=timeout)
    return r.stdout, time.time() - t0


def test_cookbook61_build_call_merge(cookbook61, oracle):
    d = cookbook61
    haps = [str(d / f"hap{h}.fa") for h in range(N_HAPS)]
    args = ["-cxggs", str(d / "ref.fa"), *haps]
    want, t_ref = _run_ref(oracle, args)
    got, t_ours = _run_ours(args)
    print(f"\n[cookbook61] -cxggs build: ours {t_ours:.0f}s "
          f"oracle {t_ref:.0f}s ({t_ref/max(t_ours,1e-9):.2f}x)",
          file=sys.stderr)
    assert got == want
    gfa = d / "graph.gfa"
    gfa.write_text(got)
    n_seg = sum(1 for ln in got.splitlines() if ln.startswith("S"))
    if N_HAPS >= 61:
        assert n_seg > 1000, \
            "61-hap graph should carry thousands of segments"

    # per-sample calls on a subset (the cookbook parallelizes 61 such
    # 1-thread jobs; byte parity per sample is the contract)
    beds = []
    t_call = 0.0
    samples = ["ref"] + [f"hap{h}"
                         for h in (0, 17, 60) if h < N_HAPS]
    for s in samples:
        fa = str(d / f"{s}.fa")
        cargs = ["-cxasm", "--call", str(gfa), fa]
        want, t_r = _run_ref(oracle, cargs)
        got, t_o = _run_ours(cargs)
        t_call += t_o
        assert got == want, f"--call BED differs for {s}"
        beds.append(got)
    print(f"[cookbook61] --call x{len(samples)}: {t_call:.0f}s total",
          file=sys.stderr)

    # merge -> merge2vcf over the subset (offline utilities,
    # semantic checks: consistent row count, VCF well-formed)
    import io as _io

    from minigraph_tpu.tools.mgutils import cmd_merge, cmd_merge2vcf
    rows = [b.splitlines() for b in beds]
    assert len({len(r) for r in rows}) == 1, "bubble row counts differ"
    pasted_f = d / "pasted.bed"
    pasted_f.write_text("\n".join("\t".join(parts)
                                  for parts in zip(*rows)) + "\n")
    samples_f = d / "samples.txt"
    samples_f.write_text("\n".join(samples) + "\n")
    out = _io.StringIO()
    assert cmd_merge(["-s", str(samples_f), str(pasted_f)], out=out) == 0
    mb = d / "merged.bed"
    mb.write_text(out.getvalue())
    out2 = _io.StringIO()
    assert cmd_merge2vcf(["-r", "0", str(mb)], out=out2) == 0
    vcf = out2.getvalue()
    body = [ln for ln in vcf.splitlines() if not ln.startswith("#")]
    assert len(body) == len(rows[0])
    if N_HAPS >= 61:
        assert len(body) > 100
    head = [ln for ln in vcf.splitlines() if ln.startswith("#CHROM")][0]
    assert head.split("\t")[9:] == samples
