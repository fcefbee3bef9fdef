"""Profile the native host mapping path (MGT_PROF=1) on a workload.

Usage: python -m minigraph_tpu.tools.profmap GRAPH.gfa READS.fa [-x lr] [-c] [-n REPS]

Maps the reads through the production host batch driver with the
stage profilers on, then prints the per-stage wall-ns dumps from all
four native profilers (batch, tail, gchain, gwfa) normalized per read.
Slot meanings (see native/mgt_{batch,tail,gchain,gwfa}.c):
  batch:  0 collect, 1 map_tail, 2 select, 3 cigar, 4 format
  tail:   0 lchain, 1 rescue, 2 lchain_tail, 3 gchain_full;
          counters 4 rescue calls, 5 rescue anchors, 6 rescue iters,
          7 first-pass anchors
  gchain: 0 gchain1_dp, 1 shortk-in-DP, 2 gchain_gen, 3 gwfa bridges,
          4 shortk bridges, 5 extras; counters 6 DP shortk calls,
          7 gwfa bridge calls
  gwfa:   0 extend, 1 dedup, 2 prune; counters 3 steps, 4 peak wave
"""
from __future__ import annotations

import ctypes
import io
import os
import sys
import time

os.environ["MGT_PROF"] = "1"


def dump(lib, name):
    fn = getattr(lib, name, None)
    if fn is None:
        return None
    buf = (ctypes.c_int64 * 8)()
    fn.restype = None
    fn.argtypes = [ctypes.POINTER(ctypes.c_int64)]
    fn(buf)
    return list(buf)


def main(argv):
    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.mapper import _map_file_frag
    from minigraph_tpu.options import (MG_M_CIGAR, GGOptions, IndexOptions,
                                       MapOptions, opt_check, opt_set)
    from minigraph_tpu.utils.native import get_lib

    args = [a for a in argv if not a.startswith("-")]
    gfa, reads = args[0], args[1]
    preset = "lr"
    if "-x" in argv:
        preset = argv[argv.index("-x") + 1]
    reps = int(argv[argv.index("-n") + 1]) if "-n" in argv else 1
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set(preset, io_, mo, go)
    if "-c" in argv:
        mo.flag |= MG_M_CIGAR
    opt_check(io_, mo, go)
    g = read_gfa(gfa)
    gi = build_index(g, io_.k, io_.w, mo)
    lib = get_lib()
    for name in ("mgt_batch_prof_dump", "mgt_tail_prof_dump8",
                 "mgt_gchain_prof_dump", "mgt_gwfa_prof_dump"):
        dump(lib, name)  # reset
    n_reads = sum(1 for ln in open(reads) if ln.startswith(">"))
    t_best = None
    for _ in range(reps):
        for name in ("mgt_batch_prof_dump", "mgt_tail_prof_dump8",
                     "mgt_gchain_prof_dump", "mgt_gwfa_prof_dump"):
            dump(lib, name)  # keep only the last rep
        sink = io.StringIO()
        t0 = time.time()
        _map_file_frag(gi, [reads], mo, sink, None, None, 1, None)
        dt = time.time() - t0
        t_best = dt if t_best is None else min(t_best, dt)
    print(f"== {n_reads} reads, {t_best:.2f}s -> {n_reads/t_best:.0f} reads/s "
          f"({t_best/n_reads*1e3:.3f} ms/read)")
    reps = 1          # dumps were reset before the last rep
    us = 1e3 * reps * n_reads  # ns total -> us/read divisor
    b = dump(lib, "mgt_batch_prof_dump")
    t = dump(lib, "mgt_tail_prof_dump8")
    gc = dump(lib, "mgt_gchain_prof_dump")
    gw = dump(lib, "mgt_gwfa_prof_dump")
    if b:
        print(f"batch us/read: collect {b[0]/us:.1f} map_tail {b[1]/us:.1f} "
              f"select {b[2]/us:.1f} cigar {b[3]/us:.1f} format {b[4]/us:.1f}")
    if t:
        print(f"tail  us/read: lchain {t[0]/us:.1f} rescue {t[1]/us:.1f} "
              f"lchain_tail {t[2]/us:.1f} gchain_full {t[3]/us:.1f} | "
              f"rescue calls {t[4]/reps} anchors {t[5]/reps} "
              f"iters {t[6]/reps} first-pass anchors {t[7]/reps}")
    if gc:
        print(f"gchain us/read: dp {gc[0]/us:.1f} shortk-dp {gc[1]/us:.1f} "
              f"gen {gc[2]/us:.1f} gwfa {gc[3]/us:.1f} shortk-br {gc[4]/us:.1f} "
              f"extras {gc[5]/us:.1f} | shortk calls {gc[6]/reps} "
              f"gwfa calls {gc[7]/reps}")
    if gw:
        print(f"gwfa  us/read: extend {gw[0]/us:.1f} dedup {gw[1]/us:.1f} "
              f"prune {gw[2]/us:.1f} | steps {gw[3]/reps} peak {gw[4]}")


if __name__ == "__main__":
    main(sys.argv[1:])
