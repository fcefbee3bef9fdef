"""Device pool for GWFA bridge jobs (ops/gwfa_jax.py).

The native graph-chain materialization harvests its bridge sites
through the thread-local hook in native/mgt_gchain.c (mode 1), this
pool solves the batch on the accelerator, and a second materialization
pass injects the results (mode 2).  Jobs the kernel flags are marked
-2 so the inject pass runs the inline host engine for them — output
stays byte-identical to an all-host run.

Economics note (docs/STATUS.md): on a tunneled chip each device call
pays ~1 ms of dispatch overhead, so this path is opt-in
(--gwfa-device); on locally-attached chips the pool amortizes across
the batch.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

WCAP = 64
QCAP_BUCKETS = (256, 1024)
J_BUCKET = 16


class DeviceGwfaPool:
    def __init__(self, gi, degcap: int = 6):
        self.gi = gi
        self._gd = None
        self.degcap = degcap
        self.n_jobs = 0
        self.n_device = 0
        self.n_flagged = 0
        self.n_oversize = 0

    def _graph(self):
        if self._gd is None:
            from ..ops.gwfa_jax import build_device_graph
            self._gd, self._maxdeg = build_device_graph(
                self.gi.g, self.gi.es, degcap=self.degcap)
        return self._gd

    def run(self, jobs: np.ndarray, qseq: str):
        """jobs: (n, 8) int64 harvest rows [qs, qe, v0, end0, v1, end1,
        max_ed, 0].  Returns (res_s, res_walk, res_wn) in site order;
        res_s[k] == -2 requests the inline host engine for site k."""
        qb = np.frombuffer(qseq.encode("latin-1"), dtype=np.uint8)
        return self.run_multi(jobs, [qb] * len(jobs))

    def run_multi(self, jobs: np.ndarray, qbufs):
        """run() for jobs pooled ACROSS reads: qbufs[k] is job k's own
        query byte array.  One call per read batch amortizes the
        per-dispatch tunnel overhead over every bridge site of the
        batch (round-5 cross-read pooling)."""
        import jax.numpy as jnp

        from ..ops.gwfa_jax import gwfa_batch
        n = len(jobs)
        self.n_jobs += n
        res_s = np.full(n, -2, dtype=np.int64)
        res_walk = np.full((n, WCAP), -1, dtype=np.int32)
        res_wn = np.zeros(n, dtype=np.int64)
        if n == 0:
            return res_s, res_walk, res_wn
        lens = jobs[:, 1] - jobs[:, 0]
        for qcap in QCAP_BUCKETS:
            sel = np.nonzero((lens <= qcap)
                             & (lens > (0 if qcap == QCAP_BUCKETS[0]
                                        else QCAP_BUCKETS[0])))[0]
            if len(sel) == 0:
                continue
            J = J_BUCKET * ((len(sel) + J_BUCKET - 1) // J_BUCKET)
            qa = np.full((J, qcap), -1, dtype=np.int32)
            ql = np.ones(J, dtype=np.int32)
            v0 = np.zeros(J, dtype=np.int32)
            o0 = np.zeros(J, dtype=np.int32)
            v1 = np.zeros(J, dtype=np.int32)
            o1 = np.zeros(J, dtype=np.int32)
            med = np.zeros(J, dtype=np.int32)
            for bi, k in enumerate(sel):
                qs, qe = int(jobs[k, 0]), int(jobs[k, 1])
                qa[bi, : qe - qs] = qbufs[k][qs: qe]
                ql[bi] = qe - qs
                v0[bi], o0[bi] = int(jobs[k, 2]), int(jobs[k, 3])
                v1[bi], o1[bi] = int(jobs[k, 4]), int(jobs[k, 5])
                med[bi] = int(jobs[k, 6])
            res = gwfa_batch(self._graph(), jnp.asarray(qa),
                             jnp.asarray(ql), jnp.asarray(v0),
                             jnp.asarray(o0), jnp.asarray(v1),
                             jnp.asarray(o1), jnp.asarray(med))
            import jax
            res = jax.device_get(res)
            for bi, k in enumerate(sel):
                if int(res["flags"][bi]):
                    self.n_flagged += 1
                    continue
                self.n_device += 1
                res_s[k] = int(res["s"][bi])
                wn = int(res["n_walk"][bi])
                res_wn[k] = wn
                res_walk[k, :wn] = res["walk"][bi][:wn]
        self.n_oversize += int(np.sum(lens > QCAP_BUCKETS[-1]))
        return res_s, res_walk, res_wn

    def log_stats(self):
        from ..utils.syslog import mlog
        if self.n_jobs:
            mlog("gwfa_device",
                 f"device GWFA bridges: {self.n_device}/{self.n_jobs} "
                 f"on device, {self.n_flagged} flagged to host, "
                 f"{self.n_oversize} oversize")


class GwfaPending:
    """Sentinel a deferred read returns from the tail: its bridge jobs
    are in the batch sink; the driver re-runs it after solve()."""
    __slots__ = ("ticket",)

    def __init__(self, ticket: int):
        self.ticket = ticket


class GwfaBatchSink:
    """Cross-read GWFA job pooling: phase 1 harvests every read's
    bridge jobs (reads with sites return GwfaPending), solve() runs
    ONE device dispatch for the whole batch, phase 2 re-runs pending
    reads with their result slices injected (hook mode 2).  A missing
    injection only costs device work — the native tail then bridges
    with the inline host engine, so output never depends on phase
    bookkeeping."""

    def __init__(self, pool: DeviceGwfaPool):
        self.pool = pool
        self.phase = 1
        self.rows = []
        self.qbufs = []
        self._slices = []
        self._queue = []

    def add(self, jobs: np.ndarray, qseq: str) -> int:
        t = len(self.rows)
        self.rows.append(np.array(jobs))
        self.qbufs.append(
            np.frombuffer(qseq.encode("latin-1"), dtype=np.uint8))
        return t

    def solve(self):
        self.phase = 2
        if not self.rows:
            return
        all_rows = np.concatenate(self.rows, axis=0)
        qjob = []
        for rows, qb in zip(self.rows, self.qbufs):
            qjob.extend([qb] * len(rows))
        res_s, res_walk, res_wn = self.pool.run_multi(all_rows, qjob)
        off = 0
        for rows in self.rows:
            n = len(rows)
            self._slices.append(
                (np.ascontiguousarray(res_s[off: off + n]),
                 np.ascontiguousarray(res_walk[off: off + n]),
                 np.ascontiguousarray(res_wn[off: off + n])))
            off += n

    def queue_inject(self, tickets):
        """Arm phase-2 injections for one fragment's reads, in the
        order its map_tail_full calls will consume them."""
        self._queue = [self._slices[t] for t in tickets]

    def pop_inject(self):
        return self._queue.pop(0) if self._queue else None
