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
