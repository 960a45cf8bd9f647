#!/usr/bin/env python3
"""Aggregate memory-bandwidth vs process-count probe (no Spark).

Why it exists: the north rule's scaling criterion compares throughput at
N vs 4N EXECUTORS. The sandbox stands that in with local[N] vs local[4N]
threads on ONE box — but a real cluster resize multiplies memory
bandwidth, last-level cache, and network by 4, while a single socket
saturates. This probe measures where the box's aggregate streaming
bandwidth stops scaling linearly in process count, which bounds the
core-count ladder any shuffle-heavy job can honestly demonstrate here:
legs inside the linear-bandwidth envelope model a cluster; legs beyond
it measure the socket, not the engine.

    python tools/membw_probe.py            # 1,4,8,16,32 processes
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(n_iter: int, sz: int, q) -> None:
    import numpy as np

    a = np.random.rand(sz)  # ~8*sz bytes, streamed n_iter times
    t0 = time.time()
    s = 0.0
    for _ in range(n_iter):
        s += a.sum()
    dt = time.time() - t0
    q.put(n_iter * a.nbytes / dt + (0.0 if s == s else 0.0))


def main() -> None:
    levels = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                               else ("1", "4", "8", "16", "32"))]
    out = {}
    for procs in levels:
        q = mp.Queue()
        ps = [mp.Process(target=_worker, args=(30, 50_000_000, q))
              for _ in range(procs)]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        agg = sum(rates) / 1e9
        out[procs] = {"aggregate_gb_s": round(agg, 1),
                      "per_proc_gb_s": round(agg / procs, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
