"""CLI-level byte parity on the five BASELINE configurations."""
import subprocess
import sys

import pytest

from tests.conftest import REPO


def _run_cli(*args):
    r = subprocess.run([sys.executable, "-m", "minigraph_tpu.cli", *args],
                       capture_output=True, text=True, cwd=str(REPO))
    assert r.returncode == 0, r.stderr
    return r.stdout


@pytest.mark.parametrize("args", [
    ("{t}/MT-human.fa", "{t}/MT-orangA.fa"),                       # config 1
    ("{t}/MT.gfa", "{t}/MT-orangA.fa"),                            # config 2
    ("-c", "{t}/MT.gfa", "{t}/MT-orangA.fa"),                      # config 3
    ("-cxggs", "-l10k", "{t}/MT.gfa", "{t}/MT-chimp.fa",
     "{t}/MT-orangA.fa"),                                          # config 4
    ("-cxasm", "-l10k", "--call", "{t}/MT.gfa", "{t}/MT-orangA.fa"),  # 5
    ("--cov", "{t}/MT.gfa", "{t}/MT-orangA.fa"),
    # asm-mode coverage: ggen dispatch + mg_cov_asm (cal_cov.c:55-139),
    # emitting cf:f tags instead of the map-mode dc:f
    ("-cxasm", "--cov", "{t}/MT.gfa", "{t}/MT-orangA.fa"),
], ids=["paf", "gaf", "cigar", "ggs", "call", "cov", "cov-asm"])
def test_cli_config_parity(ref_test_dir, run_oracle, args):
    args = [a.format(t=str(ref_test_dir)) for a in args]
    assert _run_cli(*args) == run_oracle(*args)


def test_dbg_gc1_dump_parity(run_oracle, ref_test_dir, tmp_path):
    """--dbg-gc1 stage dumps are byte-identical to the reference
    (gchain1.c:195-214 stderr trace)."""
    import re
    import subprocess
    import sys
    gfa = str(ref_test_dir / "MT.gfa")
    fa = str(ref_test_dir / "MT-orangA.fa")
    import tests.conftest as C
    ref = subprocess.run([str(C.ORACLE), "--dbg-gc1", "-t", "1", gfa, fa],
                         capture_output=True, text=True)
    ours = subprocess.run(
        [sys.executable, "-m", "minigraph_tpu", "--dbg-gc1", gfa, fa],
        capture_output=True, text=True, cwd=str(C.REPO))
    pat = re.compile(r"^(  \[dst| \[opt|\[best)")
    flt = lambda s: [ln for ln in s.splitlines() if pat.match(ln)]
    assert flt(ours.stderr) == flt(ref.stderr)
    assert flt(ref.stderr), "oracle produced no GC1 dump lines"


def test_dbg_insert_dump_parity(run_oracle, tmp_path):
    """--dbg-insert IN/IS stage dumps byte-identical to the reference
    (ggsimple.c:247-257).  Synthetic sample with real SVs: the MT test
    data inserts nothing (the distributed MT.gfa already contains all
    its variation)."""
    import subprocess
    import sys

    import numpy as np
    import tests.conftest as C
    rng = np.random.default_rng(3)
    ref_seq = "".join(rng.choice(list("ACGT"), 300000))
    ins = "".join(rng.choice(list("ACGT"), 5000))
    # sample: a 5kb insertion at 100k (one clean ggs event)
    smp = ref_seq[:100000] + ins + ref_seq[100000:]
    ref_fa = tmp_path / "ref.fa"
    smp_fa = tmp_path / "smp.fa"
    ref_fa.write_text(">chr1\n" + ref_seq + "\n")
    smp_fa.write_text(">s1\n" + smp + "\n")
    args = ["--dbg-insert", "-cxggs", str(ref_fa), str(smp_fa)]
    ref = subprocess.run([str(C.ORACLE), "-t", "1", *args],
                         capture_output=True, text=True)
    ours = subprocess.run([sys.executable, "-m", "minigraph_tpu", *args],
                          capture_output=True, text=True, cwd=str(C.REPO))
    flt = lambda s: [ln for ln in s.splitlines()
                     if ln.startswith(("IN\t", "IS\t", "IP\t", "IQ\t"))]
    assert flt(ours.stderr) == flt(ref.stderr)
    assert flt(ref.stderr), "oracle produced no insert dump lines"
    # the augmented graphs must match too
    assert ours.stdout == ref.stdout


def test_dbg_lc_prof_parity(run_oracle, ref_test_dir):
    """--dbg-lc-prof LP counters match the reference (n_iter / mmax_f /
    rmq_size exactly; mp_max is allocator-internal and approximate)."""
    import subprocess
    import sys
    import tests.conftest as C
    gfa = str(ref_test_dir / "MT.gfa")
    fa = str(ref_test_dir / "MT-orangA.fa")
    ref = subprocess.run(
        [str(C.ORACLE), "--dbg-lc-prof", "-t", "1", gfa, fa],
        capture_output=True, text=True)
    ours = subprocess.run(
        [sys.executable, "-m", "minigraph_tpu", "--dbg-lc-prof", gfa, fa],
        capture_output=True, text=True, cwd=str(C.REPO))

    def flt(s):
        out = []
        for ln in s.splitlines():
            if ln.startswith("LP\t"):
                out.append("\t".join(ln.split("\t")[:4]))
        return out

    assert flt(ours.stderr) == flt(ref.stderr)
    assert flt(ref.stderr)
