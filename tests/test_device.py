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
    assert out["best"].shape[0] == args[0].shape[0]
    assert int(jax.numpy.max(out["n_anchors"])) > 0


@pytest.mark.skipif(len(jax.devices("cpu")) < 8 and len(jax.devices()) < 8,
                    reason="needs 8 devices")
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, str(__import__("tests.conftest",
                                      fromlist=["REPO"]).REPO))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
