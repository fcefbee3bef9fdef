"""Device-parallel index construction (index/midx_device.py).

Contract: per-segment record streams and the assembled flat tables
are byte-identical to the host build — including chunked long
segments (halo windows), ambiguous bases, and tandem-tie fallbacks.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from minigraph_tpu.graph.gfa_io import read_gfa  # noqa: E402
from minigraph_tpu.index.midx import build_index  # noqa: E402
from minigraph_tpu.index.midx_device import (  # noqa: E402
    build_index_device, sketch_segments_device)
from minigraph_tpu.index.sketch import sketch  # noqa: E402


@pytest.mark.slow
def test_sketch_segments_device_fuzz():
    rng = np.random.default_rng(4)
    seqs = []
    for t in range(10):
        L = int(rng.integers(500, 12000))
        s = list("".join(rng.choice(list("ACGT"), L)))
        for p in rng.integers(0, L, L // 300):
            s[p] = "N"
        if t % 3 == 0:
            u = "".join(s[:25])
            s = s[:50] + list(u * 6) + s[50:]
        seqs.append("".join(s))
    seqs.append("ACGT" * 1500)   # tandem: per-sequence host fallback
    res = sketch_segments_device(seqs, 11, 17, buckets=((4096, 8),))
    for s, (x, y) in zip(seqs, res):
        hx, hy = sketch(s, 11, 17, rid=0)
        assert np.array_equal(x, hx) and np.array_equal(y, hy)


@pytest.mark.slow
def test_build_index_device_matches_host():
    g = read_gfa("/root/reference/test/MT.gfa")
    gi_h = build_index(g, 17, 11)
    g2 = read_gfa("/root/reference/test/MT.gfa")
    gi_d = build_index_device(g2, 17, 11)
    assert np.array_equal(gi_h.keys, gi_d.keys)
    assert np.array_equal(gi_h.key_start, gi_d.key_start)
    assert np.array_equal(gi_h.key_cnt, gi_d.key_cnt)
    assert np.array_equal(gi_h.pos, gi_d.pos)
