"""Persistent warmed chip worker: pays the first-fetch wedge once,
then execs python command files from /tmp/chipq/ in a shared
namespace (results + stdout to <name>.out, marker <name>.done)."""
import io
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
Q = Path("/tmp/chipq")
Q.mkdir(exist_ok=True)

import numpy as np  # noqa: E402
import jax  # noqa: E402

from minigraph_tpu.utils.jaxcache import enable as _cache  # noqa: E402
_cache()

t0 = time.perf_counter()
np.asarray(jax.numpy.arange(4) + 1)
(Q / "READY").write_text(f"wedge {time.perf_counter()-t0:.1f}s\n")
print(f"[worker] ready, wedge {time.perf_counter()-t0:.1f}s", flush=True)

NS = {"__name__": "__chipworker__"}
while True:
    jobs = sorted(p for p in Q.glob("*.py") if not p.name.startswith("_"))
    for job in jobs:
        out = Q / (job.stem + ".out")
        done = Q / (job.stem + ".done")
        try:    # tolerate a concurrent worker claiming the job first
            src = job.read_text()
            job.rename(Q / ("_" + job.name))
        except OSError:
            continue
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with redirect_stdout(buf), redirect_stderr(buf):
                exec(compile(src, job.name, "exec"), NS)
            status = "ok"
        except BaseException:
            buf.write(traceback.format_exc())
            status = "err"
        out.write_text(buf.getvalue())
        done.write_text(f"{status} {time.perf_counter()-t0:.1f}s\n")
    time.sleep(0.5)
