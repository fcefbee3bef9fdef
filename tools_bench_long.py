"""Standalone long-read bench (bench.py's bench_long) for iteration."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax

import bench

print("[warm] absorbing first-fetch wedge...", flush=True)
t0 = time.perf_counter()
np.asarray(jax.numpy.arange(4) + 1)
print(f"[warm] {time.perf_counter()-t0:.1f}s", flush=True)

gfa, _ = bench.ensure_workload()
reads_fa = bench.ensure_long_reads()

from minigraph_tpu.graph.gfa_io import read_gfa
from minigraph_tpu.index.midx import build_index
from minigraph_tpu.options import GGOptions, IndexOptions, MapOptions, opt_set

io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
opt_set("lr", io_, mo, go)
g = read_gfa(str(gfa))
gi = build_index(g, io_.k, io_.w, mo)
rps, vs = bench.bench_long(gi, mo, reads_fa)
print(f"long rps={rps:.0f} vs_baseline={vs}")
