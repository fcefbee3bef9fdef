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


def test_banded_pallas_matches_exact_wfa():
    """Pallas banded dual-affine scores equal the exact WFA penalty
    whenever the optimal path stays inside the band, and equal the
    full min-plus DP exactly when the band covers the whole table."""
    import numpy as np

    from minigraph_tpu.align.wfa import WfOpt, wfa_exact
    from minigraph_tpu.ops.wfa_pallas import banded_score

    X, O1, E1, O2, E2 = 4, 4, 2, 15, 1
    BIG = 1 << 30

    def dp_oracle(t, q):
        tl, ql = len(t), len(q)
        H = np.full((tl + 1, ql + 1), BIG, np.int64)
        E1a = np.full_like(H, BIG); F1a = np.full_like(H, BIG)
        E2a = np.full_like(H, BIG); F2a = np.full_like(H, BIG)
        H[0, 0] = 0
        for i in range(tl + 1):
            for j in range(ql + 1):
                if i == 0 and j == 0:
                    continue
                e1 = min(E1a[i, j-1] + E1, H[i, j-1] + O1 + E1) \
                    if j > 0 else BIG
                e2 = min(E2a[i, j-1] + E2, H[i, j-1] + O2 + E2) \
                    if j > 0 else BIG
                f1 = min(F1a[i-1, j] + E1, H[i-1, j] + O1 + E1) \
                    if i > 0 else BIG
                f2 = min(F2a[i-1, j] + E2, H[i-1, j] + O2 + E2) \
                    if i > 0 else BIG
                d = H[i-1, j-1] + (0 if t[i-1] == q[j-1] else X) \
                    if (i > 0 and j > 0) else BIG
                E1a[i, j], E2a[i, j] = e1, e2
                F1a[i, j], F2a[i, j] = f1, f2
                H[i, j] = min(d, e1, e2, f1, f2)
        return int(H[tl, ql])

    rng = np.random.default_rng(0)

    def rnd(n):
        return "".join(rng.choice(list("ACGT"), size=n)).encode()

    pairs = [(rnd(int(rng.integers(1, 16))), rnd(int(rng.integers(1, 16))))
             for _ in range(40)]
    got = banded_score(pairs, wa=32, interpret=True)
    want = np.array([dp_oracle(t, q) for t, q in pairs])
    assert (got == want).all()

    pairs2 = []
    for _ in range(10):
        t = bytearray(rnd(150)); q = bytearray(t)
        for p in rng.integers(0, len(q), size=8):
            q[p] = ord(rng.choice(list("ACGT")))
        for _ in range(3):
            p = int(rng.integers(0, len(q) - 4))
            if rng.random() < 0.5:
                del q[p: p + int(rng.integers(1, 4))]
            else:
                q[p:p] = rnd(int(rng.integers(1, 4)))
        pairs2.append((bytes(t), bytes(q)))
    got2 = banded_score(pairs2, wa=32, interpret=True)
    want2 = np.array([wfa_exact(WfOpt(max_iter=10**8), t, q).s
                      for t, q in pairs2])
    assert (got2 == want2).all()

    # out-of-band length skew reports -1, in-band result unaffected
    got3 = banded_score([(rnd(100), rnd(20)), pairs2[0]], wa=32,
                        interpret=True)
    assert got3[0] == -1 and got3[1] == want2[0]


def test_device_tb_walk_matches_host():
    """The on-device traceback walk must decode to the exact host
    CIGARs (the (s_cap, B, D) tb planes never leave the device)."""
    from minigraph_tpu.align.wfa import WfOpt, wfa_exact
    from minigraph_tpu.ops.wfa_jax import (decode_walk, encode_pairs,
                                           wfa_device, wfa_tb_walk)

    rng = np.random.default_rng(8)
    pairs = []
    for t in range(20):
        n1 = int(rng.integers(5, 160))
        n2 = max(1, n1 + int(rng.integers(-12, 12)))
        base = rng.choice(list(b"ACGT"),
                          size=max(n1, n2) + 4).astype(np.uint8)
        s1 = base[:n1].tobytes()
        s2 = bytearray(base[:n2].tobytes())
        div = rng.choice([0.05, 0.2, 0.5])
        for p in rng.integers(0, max(n2, 1), size=max(1, int(n2 * div))):
            s2[p] = b"ACGT"[int(rng.integers(0, 4))]
        pairs.append((s1, bytes(s2)))
    pairs.append((b"ACGT", b"ACGT"))
    pairs.append((b"A", b"TTTTTTTT"))

    D_CAP, S_CAP = 192, 400
    ts, tl, qs, ql = encode_pairs(pairs, L=D_CAP)
    score, tb, done, end_d, no_ext = wfa_device(
        ts, tl, qs, ql, (4, 4, 2, 15, 1), d_cap=D_CAP, s_cap=S_CAP)
    ops, fi, fk = wfa_tb_walk(ts, tl, qs, ql, tb, score, end_d, no_ext,
                              (4, 4, 2, 15, 1), d_cap=D_CAP,
                              t_cap=2 * D_CAP + 4)
    ops, fi, fk = map(np.asarray, (ops, fi, fk))
    score = np.asarray(score)
    checked = 0
    for i, (s1, s2) in enumerate(pairs):
        host = wfa_exact(WfOpt(cigar=True), s1, s2)
        if host.s >= S_CAP or score[i] < 0:
            continue
        checked += 1
        assert decode_walk(ops[:, i], int(fi[i]), int(fk[i])) \
            == host.cigar, i
    assert checked >= 18
