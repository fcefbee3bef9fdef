"""Device compute path: sketch kernel exactness, batched pipeline and
multi-chip sharding (virtual CPU mesh)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def small_reads():
    rng = np.random.default_rng(3)
    out = []
    for n in [40, 200, 333, 517]:
        out.append("".join(rng.choice(list("ACGTN"),
                                      p=[0.24, 0.24, 0.24, 0.24, 0.04],
                                      size=n)))
    out.append("ACACACACACACACACACAC" + "GGTT" * 8)  # tie-heavy
    return out


def test_device_sketch_matches_host(small_reads):
    from minigraph_tpu.index.sketch import sketch
    from minigraph_tpu.ops.sketch_jax import encode_batch, sketch_device

    codes, lens = encode_batch(small_reads)
    for (w, k) in [(11, 17), (10, 19)]:
        X, Y, N = sketch_device(codes, lens, w, k,
                                cap=max(len(s) for s in small_reads))
        X, Y, N = np.asarray(X), np.asarray(Y), np.asarray(N)
        for i, s in enumerate(small_reads):
            hx, hy = sketch(s, w, k, 0)
            n = int(N[i])
            assert n == len(hx)
            assert np.array_equal(X[i, :n], hx)
            assert np.array_equal(Y[i, :n], hy)


def test_entry_compiles_and_runs():
    import sys
    sys.path.insert(0, str(__import__("tests.conftest",
                                      fromlist=["REPO"]).REPO))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["f"].shape[0] == args[0].shape[0]
    assert int(jax.numpy.max(out["n_a"])) > 0
    assert int(jax.numpy.max(out["f"])) > 300  # clean reads chain high
    assert bool(jax.numpy.all(out["sure"]))


@pytest.mark.slow  # the driver re-runs dryrun_multichip every round
@pytest.mark.skipif(len(jax.devices("cpu")) < 8 and len(jax.devices()) < 8,
                    reason="needs 8 devices")
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, str(__import__("tests.conftest",
                                      fromlist=["REPO"]).REPO))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow  # sharded-equals-unsharded is also asserted in dryrun
@pytest.mark.skipif(len(jax.devices("cpu")) < 8 and len(jax.devices()) < 8,
                    reason="needs 8 devices")
def test_hash_sharded_matches_unsharded():
    """Sharded cuckoo tables + allgather merge give the same best chain
    scores as the single-device flat join step."""
    import numpy as np

    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_jax import JoinIndex
    from minigraph_tpu.ops.pipeline import make_map_step_v2
    from minigraph_tpu.ops.sketch_jax import encode_batch
    from minigraph_tpu.parallel.shard import (make_hash_sharded_map_step,
                                              make_mesh)

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, 17, 11)
    rng = np.random.default_rng(3)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    B, L = 8, 512
    reads = []
    for _ in range(B):
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st: st + L])
        for p in rng.integers(0, len(s), L // 20):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    codes, lens = encode_batch(reads, pad_to=L)

    mesh = make_mesh(8, idx_shards=4)
    step = make_hash_sharded_map_step(mesh, gi, acap=1024, window=16)
    with mesh:
        best_sh, n_a = step(codes, lens)
        jax.block_until_ready(best_sh)

    ji = JoinIndex.from_host(gi, occ_cap=16)
    ref_step = make_map_step_v2(ji, w=gi.w, k=gi.k, acap=1024, window=16,
                                b_chunk=4)
    out = jax.jit(ref_step)(codes, lens)
    assert (np.asarray(best_sh) == np.asarray(out["best"])).all()
    assert int(np.asarray(n_a).max()) > 0
