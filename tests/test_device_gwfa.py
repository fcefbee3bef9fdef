"""Device GWFA kernel (ops/gwfa_jax.py) vs the exact host engine.

Exact-or-flag contract: for every job the kernel does not flag, the
(edit distance, vertex walk) pair must equal align/gwfa_exact.gwfa_ed
byte-for-byte; flagged jobs are re-run on the host engine by callers.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from minigraph_tpu.align.gwfa_exact import gwfa_ed as py_gwfa  # noqa: E402
from minigraph_tpu.graph.gfa_io import read_gfa  # noqa: E402
from minigraph_tpu.index.midx import build_index  # noqa: E402
from minigraph_tpu.ops.gwfa_jax import (build_device_graph,  # noqa: E402
                                        gwfa_batch)

QCAP = 512
MAXED = 120


def _mk_jobs(g, gi, rng, n, mrate=8):
    """Bridge-shaped jobs: source-vertex suffix + a random multi-arc
    walk + target-vertex prefix, point-mutated (the recipe of
    test_native_engines.test_native_gwfa_matches_python)."""
    jobs = []
    for _ in range(n):
        ai = int(rng.integers(0, g.n_arc))
        a = g.arc[ai]
        v0, v1 = a.v_lv >> 32, a.w
        l0 = g.seg[v0 >> 1].len
        end0 = int(rng.integers(max(l0 - 150, 0), l0))
        s0 = gi.es[v0 >> 1].fwd if (v0 & 1) == 0 else gi.es[v0 >> 1].rc
        mid = b""
        vcur = v1
        for _hop in range(int(rng.integers(0, 3))):
            st, cnt = g.arc_range(vcur)
            if cnt == 0:
                break
            ai2 = st + int(rng.integers(0, cnt))
            if vcur != v1:
                sc = gi.es[vcur >> 1].fwd if (vcur & 1) == 0 \
                    else gi.es[vcur >> 1].rc
                mid += sc
            vcur = int(g.arc_w[ai2])
        v1 = vcur
        end1 = int(rng.integers(0, min(150, g.seg[v1 >> 1].len)))
        s1 = gi.es[v1 >> 1].fwd if (v1 & 1) == 0 else gi.es[v1 >> 1].rc
        q = bytearray(s0[end0:] + mid + s1[: end1 + 1])
        for p in rng.integers(0, max(len(q), 1),
                              size=max(1, len(q) // mrate)):
            q[p] = ord("ACGT"[int(rng.integers(0, 4))])
        q = bytes(q)
        if q and len(q) <= QCAP:
            jobs.append((q, int(v0), int(end0), int(v1), int(end1)))
    return jobs


def _run_and_check(g, gi, jobs):
    gd, _ = build_device_graph(g, gi.es)
    J = len(jobs)
    qa = np.full((J, QCAP), -1, dtype=np.int32)
    arr = {k: np.zeros(J, dtype=np.int32)
           for k in ("ql", "v0", "o0", "v1", "o1")}
    for i, (q, v0, e0, v1, e1) in enumerate(jobs):
        qa[i, :len(q)] = np.frombuffer(q, dtype=np.uint8)
        arr["ql"][i], arr["v0"][i], arr["o0"][i] = len(q), v0, e0
        arr["v1"][i], arr["o1"][i] = v1, e1
    res = gwfa_batch(gd, jnp.asarray(qa), jnp.asarray(arr["ql"]),
                     jnp.asarray(arr["v0"]), jnp.asarray(arr["o0"]),
                     jnp.asarray(arr["v1"]), jnp.asarray(arr["o1"]),
                     jnp.asarray(np.full(J, MAXED, dtype=np.int32)))
    res = {k: np.asarray(v) for k, v in res.items()}
    n_exact = n_flag = 0
    for i, (q, v0, e0, v1, e1) in enumerate(jobs):
        if int(res["flags"][i]):
            n_flag += 1
            continue
        sp, wp = py_gwfa(g, gi.es, q, v0, e0, v1, e1, MAXED)
        sd = int(res["s"][i])
        wd = [int(x) for x in res["walk"][i][: int(res["n_walk"][i])]]
        if sp < 0:
            assert sd < 0, f"job {i}: host not-found but device s={sd}"
        else:
            assert sd == sp, f"job {i}: s {sd} != host {sp}"
            assert wd == wp, f"job {i}: walk {wd} != host {wp}"
        n_exact += 1
    return n_exact, n_flag


def test_device_gwfa_exact_or_flag_mt(ref_test_dir):
    g = read_gfa(str(ref_test_dir / "MT.gfa"))
    gi = build_index(g, 17, 11)
    rng = np.random.default_rng(5)
    jobs = _mk_jobs(g, gi, rng, 24, mrate=8)
    n_exact, n_flag = _run_and_check(g, gi, jobs)
    # the kernel must be useful, not just safe: most jobs unflagged
    assert n_exact >= len(jobs) * 6 // 10, (n_exact, n_flag)


@pytest.mark.slow
def test_device_gwfa_exact_or_flag_heavy(ref_test_dir):
    g = read_gfa(str(ref_test_dir / "MT.gfa"))
    gi = build_index(g, 17, 11)
    for seed, mrate in ((3, 6), (11, 25), (13, 3)):
        rng = np.random.default_rng(seed)
        jobs = _mk_jobs(g, gi, rng, 48, mrate=mrate)
        n_exact, n_flag = _run_and_check(g, gi, jobs)
        assert n_exact >= len(jobs) * 6 // 10, (seed, n_exact, n_flag)


def test_cli_gwfa_device_parity_config3(oracle):
    """-c mapping through --gwfa-device == oracle byte-for-byte; the
    run must put bridges on the device (gchain1.c:349-381 path)."""
    import subprocess
    import sys
    R = "/root/reference/test"
    args = ["-c", f"{R}/MT.gfa", f"{R}/MT-orangA.fa"]
    got = subprocess.run(
        [sys.executable, "-m", "minigraph_tpu", "--gwfa-device", *args],
        capture_output=True, text=True, cwd="/root/repo")
    want = subprocess.run([str(oracle), *args], capture_output=True,
                          text=True)
    assert got.stdout == want.stdout
    assert "device GWFA bridges" in got.stderr
    import re
    m = re.search(r"device GWFA bridges: (\d+)/(\d+) on device",
                  got.stderr)
    assert m and int(m.group(1)) > 0, got.stderr
