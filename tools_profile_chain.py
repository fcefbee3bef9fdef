"""On-chip timing + parity of the Pallas exact chain kernel (16kb bucket)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp

from minigraph_tpu.graph.gfa_io import read_gfa
from minigraph_tpu.index.midx import build_index
from minigraph_tpu.options import GGOptions, IndexOptions, MapOptions, opt_set
from minigraph_tpu.mapping.device_front import DeviceFront
from minigraph_tpu.ops.sketch_jax import encode_batch
from minigraph_tpu.ops.chain_exact import lchain_dp_exact_win
from minigraph_tpu.ops.chain_exact_pallas import lchain_dp_exact_pallas
from minigraph_tpu.ops import u32
from minigraph_tpu.seqio.bseq import read_all

PAD = 16384
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
W = int(sys.argv[2]) if len(sys.argv) > 2 else 768
T = int(sys.argv[3]) if len(sys.argv) > 3 else 128

ipt, mo, go = IndexOptions(), MapOptions(), GGOptions()
opt_set("lr", ipt, mo, go)
g = read_gfa(".bench_cache/mhc3m.gfa")
gi = build_index(g, ipt.k, ipt.w, mo)
recs = [r.seq for r in read_all(".bench_cache/reads16k.fa")]
recs = (recs * ((B // len(recs)) + 1))[:B]
front = DeviceFront(gi, mo, buckets=((PAD, B),), chain=False)

print("[warm] absorbing first-fetch wedge...", flush=True)
t0 = time.perf_counter()
np.asarray(jnp.arange(4) + 1)
print(f"[warm] {time.perf_counter()-t0:.1f}s", flush=True)

fn = front._fn(PAD)
codes, lens = encode_batch(recs, pad_to=PAD)
env = dict(zip(fn.__code__.co_freevars,
               (c.cell_contents for c in fn.__closure__)))
res = env["run_collect"](codes, lens, np.int32(mo.occ_max1))
axh, axl, ayh, ayl, n_a = (res["axh"], res["axl"], res["ayh"],
                           res["ayl"], res["n_a"])
print("n_a:", np.asarray(n_a)[:8], "acap:", axh.shape)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def bench(fn, *a, reps=6):
    out = fn(*a)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / reps, out


args = (int(front.mdx_adj), int(front.mdy_adj), int(mo.bw),
        int(mo.max_lc_skip), int(mo.max_lc_iter),
        float(front.chn_pen_gap), float(front.chn_pen_skip))

dt, (f1, p1, sure1) = bench(
    lambda: lchain_dp_exact_pallas(axh, axl, ayh, ayl, n_a, *args,
                                   window=W, tile=T))
n_sure = int(np.asarray(sure1)[np.asarray(n_a) > 0].sum())
n_live = int((np.asarray(n_a) > 0).sum())
print(f"pallas W={W} T={T} B={B}: {dt*1e3:.1f} ms/batch "
      f"({dt*1e3/B:.2f} ms/read)  sure={n_sure}/{n_live}")

if "--xla" in sys.argv:
    ax = u32.to_u64(axh, axl)
    ay = u32.to_u64(ayh, ayl)
    dt0, (f0, p0, _v, sure0) = bench(
        lambda: lchain_dp_exact_win(
            ax, ay, n_a, jnp.int32(front.mdx_adj),
            jnp.int32(front.mdy_adj), jnp.int32(mo.bw),
            jnp.int32(mo.max_lc_skip), jnp.int32(mo.max_lc_iter),
            jnp.float32(front.chn_pen_gap),
            jnp.float32(front.chn_pen_skip), window=W, tile=8))
    print(f"xla    W={W} T=8: {dt0*1e3:.1f} ms/batch")
    same_f = np.array_equal(np.asarray(f0), np.asarray(f1))
    same_p = np.array_equal(np.asarray(p0), np.asarray(p1))
    s0, s1 = np.asarray(sure0), np.asarray(sure1)
    print(f"f equal: {same_f}  p equal: {same_p}  "
          f"sure xla={s0.sum()} pallas={s1.sum()} "
          f"(pallas flags less at larger T: "
          f"{int((s1 & ~s0).sum())} extra sure, "
          f"{int((s0 & ~s1).sum())} lost)")
