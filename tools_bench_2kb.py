"""Standalone 2kb e2e bench (bench.py's bench_ours) for iteration."""
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

gfa, reads_fa = bench.ensure_workload()
rps, gaf, gi, mo, front = bench.bench_ours(gfa, reads_fa)

# paired host-config number in the same noise window
host_rps = bench.bench_ours_pure_host(gi, reads_fa)[0] \
    if hasattr(bench, "bench_ours_pure_host") else None
print(f"2kb device rps={rps:.0f} host_rps={host_rps}")
