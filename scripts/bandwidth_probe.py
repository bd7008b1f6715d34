"""Memory-bandwidth saturation probe for the scaling-efficiency story.

The north rule's N -> 4N criterion is evidenced in-sandbox as local[8]
vs local[32] on ONE socket. The blocks-write stage is memory-bandwidth
bound (zero-copy Arrow encode: its work is mostly large sequential
reads/writes). On one socket, 4x threads do NOT get 4x DRAM bandwidth —
this probe measures exactly how much aggregate copy bandwidth 1, 8 and
32 concurrent workers get, establishing the hardware ceiling any
single-node measurement of that stage is subject to. On a real
multi-executor cluster (the north rule's deployment), 4x executors
bring 4x memory channels and the ceiling scales with N.

Method: each worker repeatedly copies a 256 MB numpy buffer (far larger
than LLC, so it streams from DRAM); aggregate GB/s = workers * bytes /
wall. Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

BUF_MB = 256
REPS = 8


def _worker(q: mp.Queue) -> None:
    src = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    # touch both buffers before timing
    np.copyto(dst, src)
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.copyto(dst, src)
    dt = time.perf_counter() - t0
    # copy = 1 read + 1 write stream
    q.put(2 * REPS * src.nbytes / dt)


def measure(workers: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q,)) for _ in range(workers)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / 1e9


def main() -> None:
    out = {"metric": "memcpy_bandwidth_gbps", "buf_mb": BUF_MB}
    for w in (1, 8, 32):
        out[f"workers_{w}"] = round(measure(w), 1)
    out["bw_ratio_8_to_32"] = round(out["workers_32"] / out["workers_8"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
