"""N -> 4N scaling on REAL separate executor JVMs (local-cluster).

The north-rule scaling evidence so far pairs local[N] thread counts,
which share one JVM heap/allocator; this probe runs the same 3M-doc
e2e index build on Spark's local-cluster master — 1 executor x 4 cores
vs 4 executors x 4 cores (the same 4 -> 16 half-box span) — so each
level is real multi-JVM execution with network-ish shuffle between
executor processes. Child per trial-level (fresh JVMs), interleaved
L,H rounds, steal sampled per trial.

    python scripts/probe_local_cluster.py [--docs 3000000] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from scaling_bench import _cpu_stat  # noqa: E402

_CHILD = """
import os, sys, shutil, tempfile, time
sys.path.insert(0, %(here)r)
n_exec, cores_per, n_docs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
total = n_exec * cores_per
from web_search_engine_spark.session import get_spark
from web_search_engine_spark.plans.build_index import build_index
spark = get_spark(
    f"lc-{n_exec}x{cores_per}",
    master=f"local-cluster[{n_exec},{cores_per},8192]",
    shuffle_partitions=total,
    extra_conf={
        "spark.executor.memory": "7g",
        "spark.local.dir": "/dev/shm/wse_lc_shuffle",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1 * 1024 * 1024),
    },
)
src = spark.read.parquet(f"/tmp/wse_scale_src_{n_docs}")
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "go":
        break
    out = tempfile.mkdtemp(prefix=f"wse_lc_{n_exec}_", dir="/dev/shm")
    t0 = time.perf_counter()
    build_index(spark, src, out, codec="varbyte", num_shards=16, resume=False)
    print(f"DONE {time.perf_counter() - t0:.2f}", flush=True)
    shutil.rmtree(out, ignore_errors=True)
spark.stop()
"""


class Level:
    def __init__(self, n_exec: int, cores_per: int, n_docs: int):
        self.tag = f"{n_exec}x{cores_per}"
        self.proc = subprocess.Popen(
            [sys.executable, "-c", _CHILD % {"here": HERE},
             str(n_exec), str(cores_per), str(n_docs)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
            env=dict(os.environ, PYTHONPATH=HERE),
        )
        self._expect("READY")

    def _expect(self, tag: str) -> str:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"child {self.tag} died")
            if line.startswith(tag):
                return line.strip()

    def trial(self) -> tuple[float, float]:
        s0, t0 = _cpu_stat()
        self.proc.stdin.write("go\n")
        self.proc.stdin.flush()
        wall = float(self._expect("DONE").split()[1])
        s1, t1 = _cpu_stat()
        steal = (s1 - s0) / max(1, t1 - t0)
        return wall, steal

    def stop(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3_000_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    low = Level(1, 4, args.docs)
    high = Level(4, 4, args.docs)
    try:
        wl, _ = low.trial()
        wh, _ = high.trial()
        print(f"warmup: 1x4 {wl:.1f}s | 4x4 {wh:.1f}s", flush=True)
        pairs = []
        rows = []
        for t in range(args.trials):
            tl, sl = low.trial()
            th, sh = high.trial()
            eff = tl / (4.0 * th)
            pairs.append(eff)
            rows.append({"round": t, "lc_1x4_sec": round(tl, 1),
                         "lc_4x4_sec": round(th, 1),
                         "steal": [round(sl, 3), round(sh, 3)],
                         "pair_efficiency": round(eff, 3)})
            print(f"round {t}: 1x4 {tl:.1f}s (steal {sl:.1%}) | "
                  f"4x4 {th:.1f}s (steal {sh:.1%}) | pair {eff:.3f}",
                  flush=True)
        pairs.sort()
        print(json.dumps({
            "mode": "local-cluster e2e", "docs": args.docs,
            "rounds": rows,
            "median_pair_efficiency": round(pairs[len(pairs) // 2], 3),
            "best_pair_efficiency": round(pairs[-1], 3),
        }))
    finally:
        low.stop()
        high.stop()


if __name__ == "__main__":
    main()
