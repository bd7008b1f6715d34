"""Spark event-log forensics for scaling runs: per-stage wall, task
count, summed run/CPU/GC time, straggler spread (max vs median task
duration), and shuffle bytes. Pairs with scaling_bench.py's
WSE_EVENTLOG_DIR knob — run the same build at two parallelism levels,
then compare where the high-parallelism level's core-seconds go (idle
stragglers vs CPU inflation vs GC).

Usage: python scripts/parse_evlog.py <eventlog-file-or-dir> ...
"""

import json
import sys
from collections import defaultdict


def _lines(path):
    """Iterate event-log JSON lines. Handles Spark's eventlog_v2 rolling
    DIRECTORY layout (events_*.zstd files) and plain/zstd single files;
    zstd is decompressed via pyarrow (no zstandard module needed)."""
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        files = [path]
    for f in files:
        if f.endswith(".zstd"):
            import io

            import pyarrow as pa

            stream = pa.CompressedInputStream(pa.OSFile(f, "rb"), "zstd")
            yield from io.TextIOWrapper(stream, encoding="utf-8")
        else:
            yield from open(f)


def parse(path):
    stages = {}  # sid -> dict
    tasks = defaultdict(list)
    for line in _lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stages[sid] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "wall": (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000,
                "ntasks": si["Number of Tasks"],
            }
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            ti = ev.get("Task Info") or {}
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
            tasks[sid].append({
                "dur": dur,
                "run": tm.get("Executor Run Time", 0) / 1000,
                "gc": tm.get("JVM GC Time", 0) / 1000,
                "cpu": tm.get("Executor CPU Time", 0) / 1e9,
                "sread": (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
                + (tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0),
                "swrite": (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0),
            })
    return stages, tasks


def report(path, cores, last_n_stages=None):
    stages, tasks = parse(path)
    print(f"== {path} (cores={cores})")
    total_wall = sum(s["wall"] for s in stages.values())
    # report only the second build (warmup is first): stages sorted by id,
    # take the second half
    sids = sorted(stages)
    half = sids[len(sids) // 2:] if last_n_stages is None else sids[-last_n_stages:]
    print(f"{'sid':>4} {'wall':>7} {'ntask':>5} {'sumrun':>8} {'sumcpu':>8} {'gc':>6} "
          f"{'maxdur':>7} {'meddur':>7} {'srdMB':>7} {'swrMB':>7}  name")
    for sid in half:
        s = stages[sid]
        ts = tasks.get(sid, [])
        if not ts:
            continue
        durs = sorted(t["dur"] for t in ts)
        print(f"{sid:>4} {s['wall']:>7.1f} {s['ntasks']:>5} "
              f"{sum(t['run'] for t in ts):>8.1f} {sum(t['cpu'] for t in ts):>8.1f} "
              f"{sum(t['gc'] for t in ts):>6.1f} "
              f"{durs[-1]:>7.1f} {durs[len(durs)//2]:>7.1f} "
              f"{sum(t['sread'] for t in ts)/1e6:>7.0f} {sum(t['swrite'] for t in ts)/1e6:>7.0f}  {s['name']}")
    print()


if __name__ == "__main__":
    # usage: parse_evlog.py <eventlog-file-or-dir> ...
    import glob
    import os

    args = sys.argv[1:] or ["/tmp/spark-events"]
    paths = []
    for a in args:
        if os.path.isdir(a) and not os.path.basename(a).startswith("eventlog_v2"):
            paths.extend(sorted(glob.glob(os.path.join(a, "*"))))
        else:
            paths.append(a)
    for path in paths:
        cores = "?"
        for line in _lines(path):
            if '"spark.master"' in line:
                flat = line.replace(" ", "")
                if '"spark.master":"local[' in flat:
                    cores = flat.split('"spark.master":"local[')[1].split("]")[0]
                break
        report(path, cores)
