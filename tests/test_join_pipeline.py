"""Tests for the position-aligned sketch + MXU-join anchor pipeline.

Exactness contract: for reads without tie/qcap overflow the join
pipeline must produce the SAME minimizer set as sketch_jax2 (which
is oracle-exact vs sketch.c) and the SAME anchor set as
collect_anchors_device (modulo the tandem bit, whose adjacency
definition is position-order rather than compaction-order).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from minigraph_tpu.ops.sketch_jax import encode_batch  # noqa: E402
from minigraph_tpu.ops.sketch_jax2 import sketch_device_v2  # noqa: E402
from minigraph_tpu.ops.sketch_jax4 import (  # noqa: E402
    META_Q_BITS, sketch_planes)

W, K = 11, 17


def _random_reads(n, lmax, seed=5, with_n=True):
    rng = np.random.default_rng(seed)
    reads = []
    p = [.24, .24, .24, .24, .04] if with_n else None
    alpha = list("ACGTN") if with_n else list("ACGT")
    for _ in range(n):
        ln = int(rng.integers(200, lmax + 1))
        reads.append("".join(rng.choice(alpha, ln, p=p)))
    return reads


def _plane_set(sp, i):
    hh, hl, meta, thh, thl, tmeta = (np.asarray(sp.hh), np.asarray(sp.hl),
                                     np.asarray(sp.meta), np.asarray(sp.t_hh),
                                     np.asarray(sp.t_hl), np.asarray(sp.t_meta))
    s = set()
    for HH, HL, MM in ((hh, hl, meta), (thh, thl, tmeta)):
        sel = MM[i] != 0xFFFFFFFF
        for h_, l_, m_ in zip(HH[i][sel].tolist(), HL[i][sel].tolist(),
                              MM[i][sel].tolist()):
            m_ &= 0x7FFFFFFF  # strip tandem flag
            span = m_ >> (META_Q_BITS + 1)
            qpos = (m_ >> 1) & ((1 << META_Q_BITS) - 1)
            z = m_ & 1
            s.add(((((h_ << 32) | l_) << 8) | span, (qpos << 1) | z))
    return s


def test_sketch_planes_match_v2():
    reads = _random_reads(32, 1024)
    reads[0] = "ACGT" * 128  # tandem: must flag overflow, not mis-emit
    codes, lens = encode_batch(reads, pad_to=1024)
    mx, my, n3 = map(np.asarray, jax.jit(
        partial(sketch_device_v2, w=W, k=K, cap=512))(codes, lens))
    sp = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    ovf = np.asarray(sp.overflow)
    n4 = np.asarray(sp.n)
    checked = 0
    for i in range(len(reads)):
        if ovf[i]:
            continue
        s3 = set(zip(mx[i, :n3[i]].tolist(), my[i, :n3[i]].tolist()))
        assert _plane_set(sp, i) == s3, f"read {i}"
        assert n4[i] == n3[i]
        checked += 1
    assert checked >= len(reads) - 4


def test_join_anchors_match_reference_path():
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_jax import JoinIndex, collect_anchors_join
    from minigraph_tpu.ops.pipeline import (DeviceIndex,
                                            collect_anchors_device)

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, K, W)
    dix = DeviceIndex.from_host(gi)
    ji = JoinIndex.from_host(gi, occ_cap=16)
    rng = np.random.default_rng(3)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    B, L = 16, 2048
    reads = []
    for _ in range(B):
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st: st + L])
        for p in rng.integers(0, len(s), len(s) // 20):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    codes, lens = encode_batch(reads, pad_to=L)

    mx, my, nmv = jax.jit(partial(sketch_device_v2, w=W, k=K, cap=1024))(
        codes, lens)
    axo, ayo, nao = jax.jit(partial(
        collect_anchors_device, occ_cap=16, acap=2048))(
        dix.keys, dix.key_start, dix.key_cnt, dix.pos, dix.seg_len,
        mx, my, nmv, 50)
    sp = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    axn, ayn, nan_, qov = jax.jit(partial(collect_anchors_join, occ_cap=16))(
        ji.keymat, ji.keyext, sp.hh, sp.hl, sp.meta,
        sp.t_hh, sp.t_hl, sp.t_meta, jnp.int32(50))
    axo, ayo, nao = map(np.asarray, (axo, ayo, nao))
    axn, ayn, nan_ = map(np.asarray, (axn, ayn, nan_))
    ovf = np.asarray(sp.overflow) | np.asarray(qov)
    tmask = ~(np.uint64(1) << np.uint64(42))
    for i in range(B):
        if ovf[i]:
            continue
        so = set(zip(axo[i, :nao[i]].tolist(),
                     (ayo[i, :nao[i]] & tmask).tolist()))
        sn = set(zip(axn[i, :nan_[i]].tolist(),
                     (ayn[i, :nan_[i]] & tmask).tolist()))
        assert so == sn and nao[i] == nan_[i], f"read {i}"
        # anchors must be sorted by x for the chaining DP
        assert (np.diff(axn[i, :nan_[i]].astype(np.uint64)) >= 0).all()


def test_map_step_v2_runs():
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_jax import JoinIndex
    from minigraph_tpu.ops.pipeline import make_map_step_v2

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, K, W)
    ji = JoinIndex.from_host(gi, occ_cap=16)
    rng = np.random.default_rng(0)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    reads = [ref[100:1600], ref[5000:6800]]
    codes, lens = encode_batch(reads, pad_to=2048)
    fn = jax.jit(make_map_step_v2(ji, w=W, k=K, window=32))
    out = fn(codes, lens)
    best = np.asarray(out["best"])
    # perfect substrings of the reference must chain to a high score
    assert (best > 500).all()
    assert not np.asarray(out["overflow"]).any()


def test_pallas_chain_matches_xla():
    """Interpret-mode Pallas chaining equals the XLA scan kernel."""
    from minigraph_tpu.ops.chain_jax import lchain_dp_tiled
    from minigraph_tpu.ops.chain_pallas import lchain_dp_pallas

    rng = np.random.default_rng(7)
    B, A = 8, 256
    # synthetic sorted anchors on one (rid, rev) key
    tpos = np.sort(rng.integers(0, 50_000, (B, A)), axis=1).astype(np.uint64)
    ax = (np.uint64(3) << np.uint64(33)) | tpos
    qpos = (tpos + rng.integers(-300, 300, (B, A))).clip(0) \
        .astype(np.uint64)
    span = np.uint64(17)
    ay = (span << np.uint64(32)) | qpos
    na = np.full(B, A, dtype=np.int32)
    args = (jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(na),
            jnp.int32(5000), jnp.int32(5000), jnp.int32(500),
            jnp.float32(0.1827), jnp.float32(0.00913))
    f0, p0 = jax.jit(partial(lchain_dp_tiled, window=16, tile=8))(*args)
    f1, p1 = lchain_dp_pallas(jnp.asarray(ax), jnp.asarray(ay),
                              jnp.asarray(na), window=16, tile=64,
                              interpret=True)
    assert (np.asarray(f0) == np.asarray(f1)).all()
    assert (np.asarray(p0) == np.asarray(p1)).all()


def test_bucketed_join_matches_flat():
    """Bucketed probe (XLA path) produces the same anchors as the flat
    equality join."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_bucketed import (BucketedJoinIndex,
                                                    collect_anchors_bucketed)
    from minigraph_tpu.ops.anchors_jax import JoinIndex, collect_anchors_join

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, K, W)
    ji = JoinIndex.from_host(gi, occ_cap=16)
    bi = BucketedJoinIndex.from_host(gi, occ_cap=16)
    rng = np.random.default_rng(9)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    B, L = 4, 1024
    reads = []
    for _ in range(B):
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st: st + L])
        for p in rng.integers(0, len(s), len(s) // 20):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    codes, lens = encode_batch(reads, pad_to=L)
    sp = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    args = (sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta,
            jnp.int32(50))
    ax1, ay1, n1, o1 = jax.jit(partial(collect_anchors_join, occ_cap=16))(
        ji.keymat, ji.keyext, *args)
    ax2, ay2, n2, o2 = collect_anchors_bucketed(
        bi.keymat, bi.keyext, *args, occ_cap=16)
    assert (np.asarray(n1) == np.asarray(n2)).all()
    assert (np.asarray(ax1) == np.asarray(ax2)).all()
    assert (np.asarray(ay1) == np.asarray(ay2)).all()
    # pallas probe in interpreter mode agrees too
    ax3, ay3, n3, o3 = collect_anchors_bucketed(
        bi.keymat, bi.keyext, *args, occ_cap=16, pallas=True,
        pallas_interpret=True)
    assert (np.asarray(ax1) == np.asarray(ax3)).all()
    assert (np.asarray(ay1) == np.asarray(ay3)).all()


def test_hash_anchors_match_flat():
    """Cuckoo-hash probe produces the same anchors as the flat join."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_hash import (HashJoinIndex,
                                                collect_anchors_hash)
    from minigraph_tpu.ops.anchors_jax import JoinIndex, collect_anchors_join

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, K, W)
    ji = JoinIndex.from_host(gi, occ_cap=16)
    hi = HashJoinIndex.from_host(gi, occ_cap=16)
    rng = np.random.default_rng(13)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    B, L = 8, 1024
    reads = []
    for _ in range(B):
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st: st + L])
        for p in rng.integers(0, len(s), len(s) // 20):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    codes, lens = encode_batch(reads, pad_to=L)
    sp = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    args = (sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta,
            jnp.int32(50))
    a1 = jax.jit(partial(collect_anchors_join, occ_cap=16))(
        ji.keymat, ji.keyext, *args)
    a2 = jax.jit(partial(collect_anchors_hash, hbits=hi.hbits,
                         occ_cap=16))(
        hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args)
    for x, y in zip(a1[:3], a2[:3]):
        assert (np.asarray(x) == np.asarray(y)).all()


def test_sketch_pallas_matches_xla():
    """Interpret-mode Pallas sketch equals the XLA plane sketch,
    including short reads, Ns, ties and the fin slot."""
    from minigraph_tpu.ops.sketch_pallas import sketch_planes_pallas

    rng = np.random.default_rng(5)
    reads = []
    for _ in range(6):
        n = int(rng.integers(100, 257))
        reads.append("".join(rng.choice(list("ACGTN"), n,
                                        p=[.24, .24, .24, .24, .04])))
    reads[0] = "ACGT" * 64          # ties -> overflow path
    codes, lens = encode_batch(reads, pad_to=256)
    sp1 = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    sp2 = sketch_planes_pallas(codes, lens, W, K, rb=2, tl=64,
                               interpret=True)
    for a, b in zip(sp1, sp2):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_anchor_cap_overflow_flag():
    """Anchors beyond acap raise the read's overflow flag (fallback
    routing) in the flat, hash, and bucketed backends alike."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_bucketed import (BucketedJoinIndex,
                                                    collect_anchors_bucketed)
    from minigraph_tpu.ops.anchors_hash import (HashJoinIndex,
                                                collect_anchors_hash)
    from minigraph_tpu.ops.anchors_jax import JoinIndex, collect_anchors_join

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, K, W)
    rng = np.random.default_rng(2)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    B, L = 4, 2048  # ~200 anchors per read at 5% divergence
    reads = []
    for _ in range(B):
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st: st + L])
        for p in rng.integers(0, len(s), L // 20):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    codes, lens = encode_batch(reads, pad_to=L)
    sp = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    args = (sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta,
            jnp.int32(50))
    ji = JoinIndex.from_host(gi, occ_cap=16)
    hi = HashJoinIndex.from_host(gi, occ_cap=16)
    bi = BucketedJoinIndex.from_host(gi, occ_cap=16)
    for small, big in (
        (collect_anchors_join(ji.keymat, ji.keyext, *args, occ_cap=16,
                              acap=64, b_chunk=4),
         collect_anchors_join(ji.keymat, ji.keyext, *args, occ_cap=16,
                              acap=1024, b_chunk=4)),
        (collect_anchors_hash(hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args,
                              hbits=hi.hbits, occ_cap=16, acap=64,
                              b_chunk=4),
         collect_anchors_hash(hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args,
                              hbits=hi.hbits, occ_cap=16, acap=1024,
                              b_chunk=4)),
        (collect_anchors_bucketed(bi.keymat, bi.keyext, *args, occ_cap=16,
                                  acap=64, b_chunk=4),
         collect_anchors_bucketed(bi.keymat, bi.keyext, *args, occ_cap=16,
                                  acap=1024, b_chunk=4)),
    ):
        n_big = np.asarray(big[2])
        ovf_small = np.asarray(small[3])
        ovf_big = np.asarray(big[3])
        assert (ovf_small == (n_big > 64)).all()
        assert not ovf_big.any()


def test_narrow_qcompact_bitwise_equal():
    """narrow=True (1-key partition sort + payload gathers) must be
    bitwise-identical to the 4-operand stable sort."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_hash import (HashJoinIndex,
                                                collect_anchors_exact_hash)

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, K, W)
    hi = HashJoinIndex.from_host(gi, occ_cap=16)
    rng = np.random.default_rng(29)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    B, L = 6, 2048
    reads = []
    for _ in range(B):
        st = int(rng.integers(0, len(ref) - L))
        s = list(ref[st: st + L])
        for p in rng.integers(0, L, L // 15):
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    reads[0] = "ACGT" * (L // 4)     # tie-heavy read
    codes, lens = encode_batch(reads, pad_to=L)
    sp = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    args = (sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta,
            jnp.int32(50))
    outs = [collect_anchors_exact_hash(
        hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args, hbits=hi.hbits,
        occ_cap=16, acap=1024, qcap=512, b_chunk=2, narrow=nw)
        for nw in (False, True)]
    for k in outs[0]:
        assert (np.asarray(outs[0][k])
                == np.asarray(outs[1][k])).all(), k


def test_hash_overflow_does_not_bleed_into_neighbor():
    """An acap-overflowing read must not corrupt the NEXT read's
    anchors: the scatter-based band expansion flattens (B, acap) into
    one (B*acap,) array, so spilling emissions (offs >= acap) of a
    flagged read used to mark the neighbor's slot range (regression
    for the round-4 advisor 'high')."""
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.ops.anchors_hash import (HashJoinIndex,
                                                collect_anchors_hash,
                                                collect_anchors_exact_hash)

    g = read_gfa("/root/reference/test/MT.gfa")
    gi = build_index(g, K, W)
    hi = HashJoinIndex.from_host(gi, occ_cap=16)
    rng = np.random.default_rng(7)
    ref = "".join((s.seq or "") for s in g.seg if s.rank == 0)
    L = 2048
    big = ref[:L]                       # exact slice: many anchors
    Ln = 256                            # short read: stays under acap
    st = int(rng.integers(0, len(ref) - Ln))
    s = list(ref[st: st + Ln])
    for p in rng.integers(0, Ln, Ln // 20):
        s[p] = "ACGT"[int(rng.integers(0, 4))]
    normal = "".join(s)
    codes, lens = encode_batch([big, normal], pad_to=L)
    sp = jax.jit(partial(sketch_planes, w=W, k=K))(codes, lens)
    args = (sp.hh, sp.hl, sp.meta, sp.t_hh, sp.t_hl, sp.t_meta,
            jnp.int32(50))
    # acap=64 makes read 0 overflow (hundreds of anchors at 2 kb)
    ax_s, ay_s, n_s, ovf_s = collect_anchors_hash(
        hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args, hbits=hi.hbits,
        occ_cap=16, acap=64, b_chunk=2)
    ax_b, ay_b, n_b, ovf_b = collect_anchors_hash(
        hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args, hbits=hi.hbits,
        occ_cap=16, acap=2048, b_chunk=2)
    assert bool(np.asarray(ovf_s)[0]) and not bool(np.asarray(ovf_s)[1])
    n1 = int(np.asarray(n_b)[1])
    assert n1 <= 64, "pick acap so the normal read fits"
    assert (np.asarray(ax_s)[1, :n1] == np.asarray(ax_b)[1, :n1]).all()
    assert (np.asarray(ay_s)[1, :n1] == np.asarray(ay_b)[1, :n1]).all()
    # same property on the exact-parity variant (the production path)
    r_s = collect_anchors_exact_hash(
        hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args, hbits=hi.hbits,
        occ_cap=16, acap=64, b_chunk=2)
    r_b = collect_anchors_exact_hash(
        hi.tag, hi.pay, hi.p_rid, hi.p_sel, *args, hbits=hi.hbits,
        occ_cap=16, acap=2048, b_chunk=2)
    assert bool(np.asarray(r_s["overflow"])[0])
    assert not bool(np.asarray(r_s["overflow"])[1])
    n1 = int(np.asarray(r_b["n_a"])[1])
    assert n1 <= 64
    for k in ("axh", "axl", "ayh", "ayl"):
        assert (np.asarray(r_s[k])[1, :n1]
                == np.asarray(r_b[k])[1, :n1]).all()
