"""Device-pipeline profiler + roofline accounting (SURVEY.md §7 step 8).

Times each stage of the production DeviceFront step (sketch+collect,
chain DP, pack, device->host fetch) on the real chip and reports
per-stage data volume against the chip's peak HBM bandwidth, so
"is N reads/s good?" is answerable (VERDICT r3 item 3).

axon-tunnel methodology: block_until_ready does NOT wait for device
execution on this backend — only a fetch syncs.  Stages are therefore
timed as `reps` chained dispatches followed by one dependent scalar
fetch; the ~5 ms/dispatch tunnel overhead and the ~25 ms sync RTT are
reported separately so device compute is not conflated with transport.

Run:  python -m minigraph_tpu.tools.devprof [--bucket 16384x32] [--n 64]
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
VPU_TOPS = 3.9            # ~f32/i32 vector ops/s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="16384x32")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--reads", default=None,
                    help="fasta (default: bench cache by bucket size)")
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args(argv)
    pad_len, bsz = (int(v) for v in args.bucket.split("x"))

    sys.path.insert(0, str(REPO))
    import jax
    import jax.numpy as jnp

    from minigraph_tpu.graph.gfa_io import read_gfa
    from minigraph_tpu.index.midx import build_index
    from minigraph_tpu.mapping.device_front import DeviceFront
    from minigraph_tpu.options import (GGOptions, IndexOptions,
                                       MapOptions, opt_set)
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
    gi = build_index(g, ipt.k, ipt.w, mo)

    print("[devprof] absorbing first-fetch wedge...", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.arange(4) + 1)
    print(f"[devprof] wedge {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    recs = [r.seq for r in read_all(str(reads_fa))
            if len(r.seq) <= pad_len]
    recs = (recs * ((args.n // max(len(recs), 1)) + 1))[: args.n]
    front = DeviceFront(gi, mo, buckets=((pad_len, bsz),),
                        chain_window=args.window)
    fn = front._fn(pad_len)
    st = fn._stages
    tables = st["tables"]
    max_occ = np.int32(mo.occ_max1)

    def x64_off(f):
        def run(*a):
            prev = jax.config.jax_enable_x64
            if prev:
                jax.config.update("jax_enable_x64", False)
            try:
                return f(*a)
            finally:
                if prev:
                    jax.config.update("jax_enable_x64", True)
        return run

    collect = x64_off(jax.jit(st["collect"]))
    chain = x64_off(jax.jit(st["chain"]))
    pack = x64_off(jax.jit(st["pack"]))
    whole = fn

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        np.asarray(leaves[0].ravel()[0:1])

    def t(f, *a, reps=args.reps):
        out = f(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        sync(out)
        return (time.perf_counter() - t0) / reps, out

    # transport baselines
    f0 = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros(8, jnp.int32)
    rtt, _ = t(f0, x0)
    print(f"[devprof] null-op dispatch+sync: {rtt*1e3:.2f} ms "
          f"(tunnel floor)", file=sys.stderr)

    batch = recs[:bsz] + [""] * max(0, bsz - len(recs))
    codes_h, lens_h = encode_batch(batch, pad_to=pad_len)
    codes = jax.device_put(jnp.asarray(codes_h))
    lens = jax.device_put(jnp.asarray(lens_h))

    stage_t = {}
    stage_t["collect"], res = t(collect, *tables, codes, lens, max_occ)
    stage_t["chain"], (fdp, pdp, sure) = t(
        chain, res["axh"], res["axl"], res["ayh"], res["ayl"], res["n_a"])
    from minigraph_tpu.ops.backtrack_jax import backtrack_compact
    import jax as _jax
    bt_fn = x64_off(_jax.jit(lambda *a: backtrack_compact(
        *a, min_cnt=mo.min_lc_cnt, min_sc=mo.min_lc_score,
        max_drop=mo.bw, ucap=64)))
    stage_t["backtrack"], bt = t(
        bt_fn, fdp, pdp, res["n_a"], res["axh"], res["axl"],
        res["ayh"], res["ayl"])
    stage_t["pack"], flat = t(
        pack, bt["c_axh"], bt["c_axl"], bt["c_ayh"], bt["c_ayl"],
        (bt["u_sc"], bt["u_cnt"], bt["n_u"]),
        bt["n_v"], res["q_cnt"], res["q_meta"], res["n_q"], max_occ)
    stage_t["fused"], (resf, fullf) = t(whole, codes_h, lens_h, max_occ)

    t0 = time.perf_counter()
    host = jax.device_get(resf)
    t_fetch = time.perf_counter() - t0
    if isinstance(host, dict):
        fetch_bytes = sum(np.asarray(v).nbytes for v in host.values())
    else:                       # single packed fetch buffer
        fetch_bytes = np.asarray(host).nbytes
        host = whole._unpack(np.asarray(host))

    n_live = int((np.asarray(lens_h) > 0).sum())
    n_a = np.asarray(res["n_a"])
    sure_h = np.asarray(sure)
    ovf = np.asarray(res["overflow"])
    live = np.asarray(lens_h) > 0
    n_bp = int(np.asarray(lens_h).sum())
    acap, qcap, win = st["acap"], st["qcap"], st["win"]

    print(f"[devprof] reads={n_live} ({n_bp/1e6:.2f} Mbp/batch) "
          f"acap={acap} qcap={qcap} window={win}", file=sys.stderr)
    print(f"[devprof] n_a: mean={n_a[live].mean():.0f} "
          f"max={n_a[live].max()}  flags: sure={int((sure_h & ~ovf & live).sum())}"
          f" collect_ovf={int((ovf & live).sum())}"
          f" chain_unsure={int((~sure_h & ~ovf & live).sum())}",
          file=sys.stderr)

    # roofline accounting: bytes touched per stage (HBM round trips)
    B = bsz
    bytes_sketch = B * pad_len * (1 + 4 * 6)       # codes + 6 planes
    bytes_probe = B * qcap * 4 * 10                # sort+4 gathers+meta
    bytes_band = B * acap * 4 * 12                 # scatter+5 gathers+planes
    bytes_sort = B * acap * 4 * 4 * 2 * np.log2(acap)  # bitonic passes
    bytes_collect = bytes_sketch + bytes_probe + bytes_band + bytes_sort
    # chain: VMEM-resident; HBM traffic = tiles in + f/p out
    bytes_chain = B * acap * 4 * (4 + 2)
    cells_chain = int(n_a[live].astype(np.int64).sum()) * (win + 128)
    ops_chain = cells_chain * 120  # ~vector ops per window cell
    bytes_pack = B * acap * 4 * 8

    bytes_bt = B * acap * 4 * 8     # sort + interpreter gathers (est)
    rows = [
        ("collect", stage_t["collect"], bytes_collect),
        ("chain", stage_t["chain"], bytes_chain),
        ("backtrack", stage_t["backtrack"], bytes_bt),
        ("pack", stage_t["pack"], bytes_pack),
        ("fused(all)", stage_t["fused"], bytes_collect + bytes_chain
         + bytes_bt + bytes_pack),
    ]
    print(f"[devprof] {'stage':<11} {'ms/batch':>9} {'us/read':>8} "
          f"{'MB':>7} {'%HBMpeak':>9}", file=sys.stderr)
    for name, dt, nb in rows:
        eff = nb / dt / 1e9 / HBM_GBPS * 100
        print(f"[devprof] {name:<11} {dt*1e3:9.2f} "
              f"{dt*1e6/max(n_live,1):8.0f} {nb/1e6:7.1f} {eff:9.1f}",
              file=sys.stderr)
    vpu_pct = ops_chain / max(stage_t["chain"], 1e-9) / (VPU_TOPS * 1e12) \
        * 100
    print(f"[devprof] chain window cells {cells_chain/1e6:.0f}M "
          f"(~{vpu_pct:.0f}% VPU at ~120 ops/cell)", file=sys.stderr)
    print(f"[devprof] fetch {t_fetch*1e3:.1f} ms for "
          f"{fetch_bytes/1e6:.2f} MB "
          f"({fetch_bytes/t_fetch/1e6:.0f} MB/s incl RTT)",
          file=sys.stderr)
    print(f"[devprof] fused vs sum-of-stages: {stage_t['fused']*1e3:.1f}"
          f" vs {(stage_t['collect']+stage_t['chain']+stage_t['pack'])*1e3:.1f} ms"
          f" (dispatch overhead saved by fusion)", file=sys.stderr)


if __name__ == "__main__":
    main()
