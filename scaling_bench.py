"""Scaling-efficiency evidence (north rule: N -> 4N executors >= 0.8).

No real cluster exists in this sandbox, so the same index-build job runs
at two parallelism levels (local[8] vs local[32]) on identical input, as
BASELINE.json prescribes. Each level runs in a FRESH SparkSession
(sequential, never concurrent); the best of ``--trials`` wall times per
level is used (the sandbox scheduler adds multi-second noise).

Writes/updates BENCH.md with the throughput table. Usage:
    python scaling_bench.py [--docs 120000] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import sys, tempfile, shutil, time
from web_search_engine_spark.plans.build_index import build_index
from web_search_engine_spark.session import get_spark

cores, n_docs, num_shards, trials, mode = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5])
src_dir = f"/tmp/wse_scale_src_{n_docs}"  # corpus parquet, shared across runs
# shuffle + index output on tmpfs: a single virtio disk does not scale
# with cores and would mask compute scaling (126G /dev/shm available)
spark = get_spark(
    f"scale-{cores}", master=f"local[{cores}]", shuffle_partitions=cores,
    extra_conf={"spark.local.dir": "/dev/shm/wse_shuffle"},
)
import os
if not os.path.exists(src_dir + "/_SUCCESS"):
    from web_search_engine_spark.sources.corpus import generate_corpus_pdf_fast
    pdf = generate_corpus_pdf_fast(n_docs, seed=42)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(src_dir)
src = spark.read.parquet(src_dir)
# steady-state measurement: trial 0 warms JVM JIT + python workers (a
# long-running cluster executor is warm); best of the remaining trials
# is reported.
if mode == "e2e":
    # full from-scratch index build per trial (4 Spark actions)
    for t in range(trials + 1):
        out = tempfile.mkdtemp(prefix=f"wse_scale_{cores}_", dir="/dev/shm")
        t0 = time.perf_counter()
        build_index(spark, src, out, codec="varbyte", num_shards=num_shards, resume=False)
        dt = time.perf_counter() - t0
        print(f"TRIAL {t} {dt:.3f}", flush=True)
        shutil.rmtree(out, ignore_errors=True)
else:
    # datapath: the dominant stage as ONE action — tokenize (pandas_udf)
    # -> postings (two-phase hash agg) -> range shuffle -> varbyte block
    # encode -> partitioned parquet write; source rows pre-cached (as in
    # the resident build), no driver-side metadata jobs in the window.
    from web_search_engine_spark.operators.blocks import build_block_index
    from web_search_engine_spark.operators.postings import (
        assign_doc_ids_counted, build_postings, with_tokens)
    docs, n, handle = assign_doc_ids_counted(src, ["repo", "path"])
    docs = docs.cache(); docs.count(); handle.unpersist()
    shard_size = max(1, -(-n_docs // num_shards))
    for t in range(trials + 1):
        out = tempfile.mkdtemp(prefix=f"wse_dp_{cores}_", dir="/dev/shm")
        t0 = time.perf_counter()
        blocks = build_block_index(
            build_postings(with_tokens(docs, "content")),
            codec="varbyte", shard_size=shard_size)
        blocks.write.mode("overwrite").partitionBy("shard").parquet(out)
        dt = time.perf_counter() - t0
        print(f"TRIAL {t} {dt:.3f}", flush=True)
        shutil.rmtree(out, ignore_errors=True)
print(f"ELAPSED done")
spark.stop()
"""


def run_build(
    cores: int, n_docs: int, num_shards: int, trials: int, mode: str = "e2e"
) -> list[float]:
    """All trials for one level in a FRESH subprocess (JVM reuse across
    SparkSessions in one process was measured to distort timings)."""
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cores), str(n_docs), str(num_shards),
         str(trials), mode],
        capture_output=True, text=True, env=env, timeout=5400,
    )
    times = [
        float(line.split()[2])
        for line in out.stdout.splitlines()
        if line.startswith("TRIAL")
    ]
    if len(times) < trials + 1:
        raise RuntimeError(f"build failed (cores={cores}):\n{out.stderr[-2000:]}")
    return times[1:]  # drop the warmup trial


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--mode", default="e2e", choices=["e2e", "datapath"])
    args = ap.parse_args()

    results = {}
    for cores in (args.low, args.high):
        times = run_build(cores, args.docs, num_shards=16, trials=args.trials,
                          mode=args.mode)
        for t, dt in enumerate(times):
            print(f"local[{cores}] trial {t}: {dt:.1f}s "
                  f"({args.docs / dt:.0f} docs/s)", flush=True)
        results[cores] = min(times)

    tput_low = args.docs / results[args.low]
    tput_high = args.docs / results[args.high]
    ratio = args.high / args.low
    eff = (tput_high / tput_low) / ratio
    summary = {
        "mode": args.mode,
        "docs": args.docs,
        f"local[{args.low}]_sec": round(results[args.low], 2),
        f"local[{args.high}]_sec": round(results[args.high], 2),
        f"throughput_{args.low}": round(tput_low, 1),
        f"throughput_{args.high}": round(tput_high, 1),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    if args.mode != "e2e":
        return

    section = f"""
## Scaling evidence (N -> {ratio:.0f}N cores, same input)

Full index build (tokenize pandas_udf -> postings -> varbyte blocks +
lexicon + doc stats, 16 shards) over {args.docs:,} deterministic
synthetic source files (seed 42). Methodology: fresh JVM per
parallelism level; one untimed warmup build (JIT + python workers — a
long-lived cluster executor is warm), then best of {args.trials} timed
from-scratch builds; shuffle dirs + output on tmpfs so the single
sandbox disk does not mask compute scaling:

| parallelism | wall sec | docs/s |
|---|---|---|
| local[{args.low}] | {results[args.low]:.1f} | {tput_low:,.0f} |
| local[{args.high}] | {results[args.high]:.1f} | {tput_high:,.0f} |

**Scaling efficiency (throughput ratio / core ratio): {eff:.3f}**
(north-rule target >= 0.8). Reference single-node baseline: 32.4k docs/s
tokenize+runs stage alone, 5.2k docs/s end-to-end (BASELINE.md).
"""
    try:
        existing = open("BENCH.md").read()
        head = existing.split("\n## Scaling evidence", 1)[0].rstrip()
    except FileNotFoundError:
        head = "# BENCH — engine benchmark evidence\n"
    with open("BENCH.md", "w") as f:
        f.write(head + "\n" + section)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
