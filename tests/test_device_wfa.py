"""Batched device WFA vs the host engine (scores and CIGARs)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_device_wfa_matches_host():
    from minigraph_tpu.align.wfa import WfOpt, wfa_exact
    from minigraph_tpu.ops.wfa_jax import (encode_pairs, traceback_host,
                                           wfa_device)

    rng = np.random.default_rng(8)
    pairs = []
    for _ in range(12):
        n1 = int(rng.integers(10, 120))
        n2 = n1 + int(rng.integers(-6, 6))
        base = rng.choice(list(b"ACGT"), size=max(n1, n2))
        s1 = bytes(base[:n1])
        s2 = bytearray(base[:n2])
        for p in rng.integers(0, max(n2, 1), size=max(1, n2 // 20)):
            s2[p] = b"ACGT"[int(rng.integers(0, 4))]
        pairs.append((s1, bytes(s2)))
    pairs.append((b"ACGT", b"ACGT"))          # zero-score
    pairs.append((b"ACGTACGT", b"ACGAACGT"))  # single mismatch

    ts, tl, qs, ql = encode_pairs(pairs)
    score, tb, done, end_d, no_ext = wfa_device(
        ts, tl, qs, ql, (4, 4, 2, 15, 1), d_cap=128, s_cap=200)
    score = np.asarray(score)
    tb = np.asarray(tb)
    end_d = np.asarray(end_d)
    no_ext = np.asarray(no_ext)
    checked = 0
    for i, (s1, s2) in enumerate(pairs):
        host = wfa_exact(WfOpt(cigar=True), s1, s2)
        if host.s >= 200:
            assert int(score[i]) in (-1, host.s)
            continue
        checked += 1
        assert host.s == int(score[i])
        cig = traceback_host((s1, s2), int(score[i]), tb[:, i, :], 128,
                             int(end_d[i]), bool(no_ext[i]))
        assert cig == host.cigar
    assert checked >= 10
