"""Device-pipeline profiler + roofline accounting (SURVEY.md §7 step 8).

Breaks the production DeviceFront step into its stages (sketch+collect,
chain DP, pack, device->host fetch), times each on the real chip, and
reports per-stage bytes moved / op counts against the chip's peak HBM
bandwidth so "is N reads/s good?" is answerable (VERDICT r3 item 3).

Also diagnoses the exact-or-flag chain kernel: for every read it
reports WHY the device chain was not sure (window overflow vs break
ambiguity), plus anchor-window statistics that size the chain window.

Run:  python -m minigraph_tpu.tools.devprof [--bucket 16384x16] [--n 64]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]

# v5e (TPU v5 lite) per-chip peaks, public numbers
HBM_GBPS = 819.0          # HBM bandwidth GB/s
VPU_TOPS = 3.9            # ~f32 vector ops/s (4 MXU-adjacent VPUs)


def _ready(x):
    import jax
    jax.block_until_ready(x)
    return x


def _t(fn, *a, reps=3, **kw):
    """Best-of-reps wall time of fn(*a) with device sync."""
    best = None
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _ready(fn(*a, **kw))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def window_stats(ax, n_a, max_dist_x):
    """Per-read max scan-window reach (the reference's i - st,
    lchain.c:173): the device chain window must cover this or the
    read flags window-overflow."""
    reach = []
    for b in range(ax.shape[0]):
        n = int(n_a[b])
        if n == 0:
            reach.append(0)
            continue
        x = ax[b, :n]
        xh = (x >> np.uint64(32)).astype(np.uint32)
        st = 0
        best = 0
        for i in range(n):
            while st < i and (xh[st] != xh[i]
                              or x[i] - x[st] > np.uint64(max_dist_x)):
                st += 1
            best = max(best, i - st)
        reach.append(best)
    return np.asarray(reach)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="16384x16")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--reads", default=None,
                    help="fasta (default: bench cache by bucket size)")
    ap.add_argument("--window", type=int, default=None)
    args = ap.parse_args(argv)
    pad_len, bsz = (int(v) for v in args.bucket.split("x"))

    sys.path.insert(0, str(REPO))
    import jax

    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.device_front import DeviceFront
    from minigraph_tpu.options import (GGOptions, IndexOptions, MapOptions,
                                       opt_set)
    from minigraph_tpu.ops.sketch_jax import encode_batch
    from minigraph_tpu.seqio.bseq import read_all

    cache = REPO / ".bench_cache"
    reads_fa = args.reads or (
        cache / ("reads16k.fa" if pad_len > 4096 else "reads2k.fa"))
    gfa = cache / "mhc3m.gfa"
    print(f"[devprof] graph={gfa} reads={reads_fa} bucket={pad_len}x{bsz}",
          file=sys.stderr)

    ipt, mo, go = IndexOptions(), MapOptions(), GGOptions()
    opt_set("lr", ipt, mo, go)
    g = read_gfa(str(gfa))
    t0 = time.time()
    gi = build_index(g, ipt.k, ipt.w, mo)
    print(f"[devprof] index: {time.time()-t0:.1f}s", file=sys.stderr)

    recs = [r.seq for r in read_all(str(reads_fa))
            if len(r.seq) <= pad_len][: args.n]
    front = DeviceFront(gi, mo, buckets=((pad_len, bsz),),
                        chain_window=args.window)
    fn = front._fn(pad_len)  # builds collect/chain/pack jits

    # reach into the step closure for the separate stages
    cells = fn.__closure__ if hasattr(fn, "__closure__") else ()
    names = fn.__code__.co_freevars
    env = dict(zip(names, (c.cell_contents for c in cells)))
    collect = env["run_collect"]
    chain = env["chain"]
    pack = env["pack"]
    max_occ = np.int32(mo.occ_max1)

    n_bp_tot = sum(len(s) for s in recs)
    agg = {"collect": 0.0, "chain": 0.0, "pack": 0.0, "fetch": 0.0}
    all_na = []
    all_reach = []
    n_sure = n_ovf = n_unc = 0
    fetch_bytes = 0

    for c0 in range(0, len(recs), bsz):
        batch = recs[c0:c0 + bsz]
        batch += [""] * (bsz - len(batch))
        codes, lens = encode_batch(batch, pad_to=pad_len)
        t_col, res = _t(collect, codes, lens, max_occ)
        t_chn, (fp, sure) = _t(chain, res["axh"], res["axl"],
                               res["ayh"], res["ayl"], res["n_a"])
        res2 = dict(res)
        res2["fp"], res2["sure"] = fp, sure
        t_pck, flat = _t(pack, res["axh"], res["axl"], res["ayh"],
                         res["ayl"], fp, res["n_a"], res["q_cnt"],
                         res["q_meta"], res["n_q"], max_occ)
        ship = dict(flat)
        for k2 in ("n_a", "n_q", "overflow"):
            ship[k2] = res[k2]
        ship["sure"] = sure
        t0 = time.perf_counter()
        host = jax.device_get(ship)
        agg["fetch"] += time.perf_counter() - t0
        fetch_bytes += sum(np.asarray(v).nbytes for v in host.values())
        agg["collect"] += t_col
        agg["chain"] += t_chn
        agg["pack"] += t_pck

        n_a = np.asarray(res["n_a"])
        ovf = np.asarray(res["overflow"])
        sure_h = np.asarray(sure)
        live = np.asarray(lens) > 0
        all_na.append(n_a[live])
        n_sure += int((sure_h & ~ovf & live).sum())
        n_ovf += int((ovf & live).sum())
        n_unc += int((~sure_h & ~ovf & live).sum())
        # window reach on the fetched anchors (first batch only: slow)
        if c0 == 0:
            ax = (np.asarray(res["axh"]).astype(np.uint64) << np.uint64(32)
                  ) | np.asarray(res["axl"]).astype(np.uint64)
            all_reach.append(window_stats(
                ax[live], n_a[live], front.mdx_adj))

    n_live = len(recs)
    na = np.concatenate(all_na)
    reach = np.concatenate(all_reach) if all_reach else np.zeros(1)
    n_b = -(-len(recs) // bsz)
    print(f"[devprof] reads={n_live} ({n_bp_tot/1e6:.2f} Mbp) "
          f"batches={n_b}", file=sys.stderr)
    print(f"[devprof] n_a: mean={na.mean():.0f} p50={np.median(na):.0f} "
          f"max={na.max()} (acap hit: {(na >= 0.98 * na.max()).sum()})",
          file=sys.stderr)
    print(f"[devprof] window reach (batch 1): p50="
          f"{np.median(reach):.0f} p90={np.percentile(reach, 90):.0f} "
          f"max={reach.max()}", file=sys.stderr)
    print(f"[devprof] chain flags: sure={n_sure} window_ovf/cap={n_ovf} "
          f"break_unsure={n_unc}", file=sys.stderr)
    tot = sum(agg.values())
    for k, v in agg.items():
        print(f"[devprof] {k:8s} {v*1e3/n_b:8.1f} ms/batch "
              f"({100*v/tot:4.1f}%)", file=sys.stderr)
    print(f"[devprof] total {tot:.3f}s -> {n_live/tot:.0f} reads/s "
          f"{n_bp_tot/tot/1e6:.1f} Mbp/s", file=sys.stderr)
    print(f"[devprof] fetch volume {fetch_bytes/1e6:.1f} MB "
          f"({fetch_bytes/max(agg['fetch'],1e-9)/1e6:.0f} MB/s eff)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
