"""Multi-process distributed mapping: shard-count invariance.

Launches 2 local CPU jax processes (gloo collectives) and asserts the
rank-0 merged GAF is byte-identical to the single-process CLI — the
distributed analog of the reference's thread-count invariance
(SURVEY §2.5)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

MT_GFA = "/root/reference/test/MT.gfa"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def reads_fa(tmp_path_factory):
    from minigraph_tpu.graph.gfa_io import read_gfa
    g = read_gfa(MT_GFA)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    rng = np.random.default_rng(9)
    d = tmp_path_factory.mktemp("dist")
    fa = d / "reads.fa"
    with open(fa, "w") as fh:
        for i in range(32):
            L = int(rng.integers(400, 1800))
            st = int(rng.integers(0, len(ref) - L))
            s = list(ref[st:st + L])
            for p in rng.integers(0, len(s), len(s) // 15):
                s[p] = "ACGT"[int(rng.integers(0, 4))]
            fh.write(f">r{i}\n{''.join(s)}\n")
    return str(fa)


@pytest.mark.slow
def test_two_process_gaf_parity(reads_fa):
    want = subprocess.run(
        [sys.executable, "-m", "minigraph_tpu", MT_GFA, reads_fa],
        capture_output=True, text=True, check=True).stdout

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "minigraph_tpu.parallel.dist",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             MT_GFA, reads_fa],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e[-2000:]
    def strip_gloo(s):
        return "".join(ln for ln in s.splitlines(keepends=True)
                       if not ln.startswith("[Gloo]"))

    got = strip_gloo(outs[0][0])  # rank 0 writes the merged GAF
    assert got == want
    assert strip_gloo(outs[1][0]) == ""  # rank 1 writes nothing


@pytest.mark.slow
def test_two_process_tpu_front_parity(reads_fa):
    """--tpu across 2 processes: the device-front (seed+chain on the
    jax backend, exact-or-flag) composes with the distributed
    data-parallel split; rank-0 merged GAF is byte-identical to the
    single-process host CLI (VERDICT r3 item 6)."""
    want = subprocess.run(
        [sys.executable, "-m", "minigraph_tpu", MT_GFA, reads_fa],
        capture_output=True, text=True, check=True).stdout

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [subprocess.Popen(
        [sys.executable, "-m", "minigraph_tpu.parallel.dist",
         "--coordinator", f"localhost:{port}",
         "--num-processes", "2", "--process-id", str(pid),
         "--tpu", MT_GFA, reads_fa],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env) for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e[-2000:]

    def strip_gloo(s):
        return "".join(ln for ln in s.splitlines(keepends=True)
                       if not ln.startswith("[Gloo]"))

    got = strip_gloo(outs[0][0])
    assert got == want
    # the front must actually have run on-device for rank 0
    assert "device seed stage" in outs[0][1]


@pytest.mark.slow
def test_two_process_cov_parity(reads_fa):
    """--cov across 2 processes: the all-reduced dc:f coverage tags on
    rank 0's output graph equal the single-process run byte-for-byte."""
    want = subprocess.run(
        [sys.executable, "-m", "minigraph_tpu", "--cov", MT_GFA, reads_fa],
        capture_output=True, text=True, check=True).stdout

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [subprocess.Popen(
        [sys.executable, "-m", "minigraph_tpu.parallel.dist",
         "--coordinator", f"localhost:{port}",
         "--num-processes", "2", "--process-id", str(pid),
         "--cov", MT_GFA, reads_fa],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env) for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e[-2000:]

    def strip_gloo(s):
        return "".join(ln for ln in s.splitlines(keepends=True)
                       if not ln.startswith("[Gloo]"))

    assert strip_gloo(outs[0][0]) == want
