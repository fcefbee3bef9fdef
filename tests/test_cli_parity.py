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
], ids=["paf", "gaf", "cigar", "ggs", "call", "cov"])
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
