"""Command-line interface mirroring the reference CLI (main.c:96-301).

Two passes over the options: -x presets are applied first, then
per-flag overrides.
"""
from __future__ import annotations

import getopt
import sys
from typing import List, Optional

from . import MG_VERSION_COMPAT
from .graph.bubbles import sort_ref_arc
from .graph.gfa_io import read_gfa, write_gfa
from .mapping.mapper import map_files
from .options import (GGOptions, IndexOptions, MapOptions, opt_check,
                      opt_set, MG_G_CAL_COV, MG_G_CALL, MG_G_GGSIMPLE,
                      MG_G_NO_INV, MG_G_NO_QOVLP, MG_M_ALL_CHAINS,
                      MG_M_CAL_COV, MG_M_CIGAR, MG_M_FRAG_MERGE,
                      MG_M_FRAG_MODE, MG_M_HEAP_SORT, MG_M_NO_COMP_PATH,
                      MG_M_NO_DIAG, MG_M_PRINT_2ND, MG_M_RMQ,
                      MG_M_SHOW_UNMAP, MG_M_SKIP_GCHECK, MG_M_VERTEX_COOR,
                      MG_M_WRITE_LCHAIN, MG_M_WRITE_MZ)

_SHORT = "x:k:w:t:r:m:n:g:K:o:p:N:Pq:d:l:f:U:M:F:j:L:DSc"
_LONG = [
    "version", "vc", "secondary=", "ins-qovlp=", "heap-sort=", "show-unmap=",
    "ggen=", "ggen", "rmq=", "rmq", "gg-min-end-cnt=", "gg-min-end-frac=",
    "no-comp-path", "gg-match-pen=", "frag", "cov", "min-cov-blen=",
    "min-cov-mapq=", "gap-pen=", "ref-bonus=", "max-gap-pre=", "max-lc-skip=",
    "max-gc-skip=", "max-lc-iter=", "max-rmq-size=", "inv=", "write-mz",
    "call", "cap-calloc=", "gdp-max-ed=", "dbg-seed",
    "dbg-lchain", "dbg-gc1", "dbg-shortk", "dbg-qname", "dbg-insert",
    "dbg-lc-prof", "dbg-mwf-long", "dbg-mwf-seq", "no-kalloc", "tpu",
    "gwfa-device", "seed-device",
]


def _parse_num(s: str) -> int:
    mult = 1
    t = s
    if t and t[-1] in "GgMmKk":
        mult = {"g": 1e9, "m": 1e6, "k": 1e3}[t[-1].lower()]
        t = t[:-1]
    return int(float(t) * mult + 0.499)


def _parse_num2(s: str):
    if "," in s:
        a, b = s.split(",", 1)
        return _parse_num(a), _parse_num(b)
    return _parse_num(s), None


def _yes_no(flag: int, bit: int, arg: str, yes_to_set: bool = True) -> int:
    yes = arg in ("yes", "y")
    no = arg in ("no", "n")
    if not yes and not no:
        sys.stderr.write("[WARNING] option only accepts 'yes' or 'no'.\n")
        return flag
    if yes == yes_to_set:
        return flag | bit
    return flag & ~bit


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    io_, mo, go = IndexOptions(), MapOptions(), GGOptions()
    try:
        opts, args = getopt.gnu_getopt(argv, _SHORT, _LONG)
    except getopt.GetoptError as e:
        sys.stderr.write(f"[ERROR] {e}\n")
        return 1
    # first pass: presets
    for k, v in opts:
        if k == "-x":
            if opt_set(v, io_, mo, go) < 0:
                sys.stderr.write(f"[ERROR] unknown preset '{v}'\n")
                return 1
    out = sys.stdout
    n_threads = 4
    device = False
    gwfa_device = False
    for k, v in opts:
        if k == "-w":
            io_.w = int(v)
        elif k == "-k":
            io_.k = int(v)
        elif k == "-t":
            n_threads = int(v)
        elif k == "-f":
            mo.occ_max1_frac = float(v)
        elif k == "-g":
            mo.max_gap = _parse_num(v)
        elif k == "-F":
            mo.max_frag_len = _parse_num(v)
        elif k == "-K":
            mo.mini_batch_size = _parse_num(v)
        elif k == "-p":
            mo.pri_ratio = float(v)
        elif k == "-N":
            mo.best_n = _parse_num(v)
        elif k == "-P":
            mo.flag |= MG_M_ALL_CHAINS
        elif k == "-D":
            mo.flag |= MG_M_NO_DIAG
        elif k == "-M":
            mo.mask_level = float(v)
        elif k == "-j":
            mo.div = float(v)
        elif k == "-l":
            go.min_map_len = _parse_num(v)
        elif k == "-d":
            go.min_depth_len = _parse_num(v)
        elif k == "-q":
            go.min_mapq = int(v)
        elif k == "-L":
            go.min_var_len = int(v)
        elif k == "-S":
            mo.flag |= MG_M_WRITE_LCHAIN
        elif k == "-c":
            mo.flag |= MG_M_CIGAR
        elif k == "-U":
            a, b = _parse_num2(v)
            mo.occ_max1 = a
            if b is not None:
                mo.occ_max1_cap = b
        elif k == "-r":
            a, b = _parse_num2(v)
            mo.bw = a
            if b is not None:
                mo.bw_long = b
        elif k == "-n":
            a, b = _parse_num2(v)
            mo.min_gc_cnt = a
            if b is not None:
                mo.min_lc_cnt = b
        elif k == "-m":
            a, b = _parse_num2(v)
            mo.min_gc_score = a
            if b is not None:
                mo.min_lc_score = b
        elif k == "-o":
            if v != "-":
                out = open(v, "w")
        elif k == "--version":
            print(MG_VERSION_COMPAT)
            return 0
        elif k == "--vc":
            mo.flag |= MG_M_VERTEX_COOR
        elif k == "--secondary":
            mo.flag = _yes_no(mo.flag, MG_M_PRINT_2ND, v)
        elif k == "--ins-qovlp":
            go.flag = _yes_no(go.flag, MG_G_NO_QOVLP, v)
        elif k == "--heap-sort":
            mo.flag = _yes_no(mo.flag, MG_M_HEAP_SORT, v)
        elif k == "--show-unmap":
            mo.flag = _yes_no(mo.flag, MG_M_SHOW_UNMAP, v)
        elif k == "--ggen":
            if v in ("", "simple"):
                go.algo = MG_G_GGSIMPLE
            elif v == "none":
                go.algo = 0
            else:
                sys.stderr.write(f"ERROR: unknown ggen algorithm \"{v}\"\n")
                return 1
        elif k == "--rmq":
            mo.flag = _yes_no(mo.flag, MG_M_RMQ, v) if v else (mo.flag | MG_M_RMQ)
        elif k == "--gg-min-end-cnt":
            go.ggs_min_end_cnt = int(v)
        elif k == "--gg-min-end-frac":
            go.ggs_min_end_frac = float(v)
        elif k == "--no-comp-path":
            mo.flag |= MG_M_NO_COMP_PATH
        elif k == "--gg-match-pen":
            go.match_pen = int(v)
        elif k == "--frag":
            mo.flag |= MG_M_FRAG_MODE | MG_M_FRAG_MERGE
        elif k == "--cov":
            mo.flag |= MG_M_CAL_COV | MG_M_SKIP_GCHECK
            go.flag |= MG_G_CAL_COV
        elif k == "--min-cov-blen":
            mo.min_cov_blen = _parse_num(v)
        elif k == "--min-cov-mapq":
            mo.min_cov_mapq = int(v)
        elif k == "--gap-pen":
            mo.chn_pen_gap = float(v)
        elif k == "--ref-bonus":
            mo.ref_bonus = int(v)
        elif k == "--max-gap-pre":
            mo.max_gap_pre = _parse_num(v)
        elif k == "--max-lc-skip":
            mo.max_lc_skip = int(v)
        elif k == "--max-gc-skip":
            mo.max_gc_skip = int(v)
        elif k == "--max-lc-iter":
            mo.max_lc_iter = _parse_num(v)
        elif k == "--max-rmq-size":
            mo.rmq_size_cap = _parse_num(v)
        elif k == "--inv":
            go.flag = _yes_no(go.flag, MG_G_NO_INV, v, yes_to_set=False)
        elif k == "--write-mz":
            mo.flag |= MG_M_WRITE_MZ | MG_M_WRITE_LCHAIN
        elif k == "--call":
            go.flag |= MG_G_CALL
            mo.flag |= MG_M_SKIP_GCHECK
        elif k == "--cap-calloc":
            mo.cap_kalloc = _parse_num(v)
        elif k == "--gdp-max-ed":
            mo.gdp_max_ed = _parse_num(v)
        elif k == "--dbg-seed":
            from .options import DBG, MG_DBG_SEED
            DBG["flag"] |= MG_DBG_SEED
        elif k in ("--dbg-qname", "--dbg-insert", "--dbg-lc-prof",
                   "--dbg-mwf-long", "--dbg-mwf-seq", "--no-kalloc"):
            from .options import (DBG, MG_DBG_INSERT, MG_DBG_LC_PROF,
                                  MG_DBG_MINIWFA, MG_DBG_MWF_SEQ,
                                  MG_DBG_NO_KALLOC, MG_DBG_QNAME)
            DBG["flag"] |= {"--dbg-qname": MG_DBG_QNAME,
                            "--dbg-insert": MG_DBG_INSERT,
                            "--dbg-lc-prof": MG_DBG_LC_PROF,
                            "--dbg-mwf-long": MG_DBG_MINIWFA,
                            "--dbg-mwf-seq": MG_DBG_MWF_SEQ,
                            "--no-kalloc": MG_DBG_NO_KALLOC}[k]
        elif k == "--dbg-gc1":
            from .options import DBG, MG_DBG_GC1
            DBG["flag"] |= MG_DBG_GC1
        elif k == "--dbg-shortk":
            from .options import DBG, MG_DBG_SHORTK
            DBG["flag"] |= MG_DBG_SHORTK
        elif k == "--dbg-lchain":
            from .options import DBG, MG_DBG_LCHAIN
            DBG["flag"] |= MG_DBG_LCHAIN
        elif k == "--tpu":
            device = True
        elif k == "--gwfa-device":
            gwfa_device = True
        elif k == "--seed-device":
            from .mapping.mapper import SEED_DEVICE
            SEED_DEVICE["on"] = True

    if opt_check(io_, mo, go) < 0:
        return 1
    if not args:
        sys.stderr.write(
            "Usage: minigraph-tpu [options] <target.gfa> <query.fa> [...]\n")
        return 1

    g = read_gfa(args[0])
    from .utils.syslog import mlog
    mlog("main", f'loaded the graph from "{args[0]}"')
    ret = 0
    if go.algo == 0 and not (go.flag & MG_G_CALL):
        ret = map_files(g, args[1:], io_, mo, out=out, n_threads=n_threads,
                        device=device, gwfa_device=gwfa_device)
    else:
        from .ggen.driver import ggen
        if go.flag & MG_G_CALL:
            sort_ref_arc(g)
        ret = ggen(g, args[1:], io_, mo, go, out=out, n_threads=n_threads)
    if (go.algo != 0 or (mo.flag & MG_M_CAL_COV)) and not (go.flag & MG_G_CALL):
        write_gfa(g, out)
    if out is not sys.stdout:
        out.close()
    from .utils.syslog import final_log
    from . import MG_VERSION_COMPAT as _v
    final_log(_v, ["minigraph-tpu"] + argv)
    return 1 if ret else 0


if __name__ == "__main__":
    sys.exit(main())
