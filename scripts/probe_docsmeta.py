"""Decompose the docs_meta write — the flattest remaining e2e stage
(VERDICT r4 #3: eff 0.512, 23.1s@4 -> 11.3s@16 at 3M docs in the
round-5 sqlenc stage table).

The stage is four fused pieces; this probe prices each cumulatively,
INTERLEAVED across two warm children (round-3 lesson: level-after-level
trials compare two different noise windows on this box):

  D0_dlagg   postings.groupBy(doc_id).agg(sum tf) -> noop
             (re-reads the PERSISTED postings relation, ~58M rows)
  D1_shameta cached source rows -> shard/doc_id/keys/meta + sha2 -> noop
             (the second scan of the corpus text, CPU-bound hash)
  D2_joined  D1 join broadcast(D0) + dl coalesce -> noop
  D3_full    D2 + salted identity repartition -> partitioned parquet
             (the production stage, /dev/shm sink)

D3-D2 prices the exchange+write, D2-(D0+D1 overlap) the join. Each
child replays the real build context first (blocks write, untimed) so
heap/worker state matches mid-build — the round-4 dl-source episode
showed isolated-fresh-JVM numbers do not survive that pressure.

Usage: python scripts/probe_docsmeta.py [--docs 3000000] [--low 4]
                                        [--high 16] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_bench import _cpu_stat  # noqa: E402

CHILD = r"""
import os, sys, time, tempfile, shutil
cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
from pyspark.sql import functions as F
from web_search_engine_spark.session import get_spark
from web_search_engine_spark.operators.blocks import (
    build_block_index, identity_partition_key)
from web_search_engine_spark.operators.postings import (
    assign_doc_ids_counted, build_postings, with_tokens)

spark = get_spark(
    f"dmprobe-{cores}", master=f"local[{cores}]", shuffle_partitions=cores,
    extra_conf={
        "spark.local.dir": "/dev/shm/wse_shuffle",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
    })
src = spark.read.parquet(f"/tmp/wse_scale_src_{n_docs}")
docs, n, handle = assign_doc_ids_counted(src, ["repo", "path"])
docs = docs.cache(); docs.count(); handle.unpersist()
shard_size = max(1, -(-n // 16))
work = docs.withColumn(
    "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int"))
key_cols, meta_cols = ["repo", "path"], ["commit", "lang"]

# replay the real build context once (untimed): persisted postings
# materialized by a blocks write, exactly what precedes docs_meta
postings = build_postings(with_tokens(work, "content")).persist()
blk_out = tempfile.mkdtemp(prefix=f"wse_dm_blk_{cores}_", dir="/dev/shm")
build_block_index(
    postings, codec="varbyte", shard_size=shard_size, shards_hint=16,
).write.mode("overwrite").partitionBy("shard").parquet(blk_out)
shutil.rmtree(blk_out, ignore_errors=True)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
shameta = work.select(
    "shard", "doc_id", *key_cols, *meta_cols,
    F.sha2(F.col("content"), 256).alias("content_sha256"))
joined = (
    shameta.join(F.broadcast(dl), "doc_id", "left")
    .withColumn("dl", F.coalesce("dl", F.lit(0).cast("long")))
    .select("shard", "doc_id", *key_cols, *meta_cols, "dl",
            "content_sha256"))

# repartition-first dl agg: the default plan's partial agg over a
# (term,doc_id)-hashed relation builds a ~n_docs-entry map per map
# partition and emits ~one row per key PER PARTITION, so exchanged
# rows GROW with parallelism (P x n_docs). Projecting to the 16-byte
# (doc_id, tf) rows and doc-hashing them FIRST makes the exchange a
# constant |postings| rows and shrinks every agg map to n_docs/P.
dl_b = (
    postings.select("doc_id", "tf")
    .repartition(F.col("doc_id"))
    .groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
)
joined_b = (
    shameta.join(F.broadcast(dl_b), "doc_id", "left")
    .withColumn("dl", F.coalesce("dl", F.lit(0).cast("long")))
    .select("shard", "doc_id", *key_cols, *meta_cols, "dl",
            "content_sha256"))

def d0(): noop(dl)
def d0b(): noop(dl_b)
def d1(): noop(shameta)
def d2(): noop(joined)
def d3():
    out = tempfile.mkdtemp(prefix=f"wse_dm_{cores}_", dir="/dev/shm")
    par = spark.sparkContext.defaultParallelism
    sub = max(1, (4 * par + 16 - 1) // 16)
    joined.repartition(
        par, identity_partition_key(
            F.col("shard"), F.pmod(F.col("doc_id"), F.lit(sub)), sub, par),
    ).write.mode("overwrite").partitionBy("shard").parquet(out)
    shutil.rmtree(out, ignore_errors=True)

def d3b():
    out = tempfile.mkdtemp(prefix=f"wse_dmb_{cores}_", dir="/dev/shm")
    par = spark.sparkContext.defaultParallelism
    sub = max(1, (4 * par + 16 - 1) // 16)
    joined_b.repartition(
        par, identity_partition_key(
            F.col("shard"), F.pmod(F.col("doc_id"), F.lit(sub)), sub, par),
    ).write.mode("overwrite").partitionBy("shard").parquet(out)
    shutil.rmtree(out, ignore_errors=True)

VARIANTS = [("D0_dlagg", d0), ("D0b_dlrepart", d0b), ("D1_shameta", d1),
            ("D2_joined", d2), ("D3_full", d3), ("D3b_full_repart", d3b)]
print("READY", flush=True)
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "RUN":
        for name, fn in VARIANTS:
            t0 = time.perf_counter(); fn()
            print(f"SUB {name} {time.perf_counter()-t0:.2f}", flush=True)
        print("TRIAL done", flush=True)
    elif cmd == "QUIT":
        break
spark.stop()
"""


class _Child:
    def __init__(self, cores: int, docs: int):
        self.cores = cores
        env = dict(
            os.environ,
            PYTHONPATH=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        )
        self.proc = subprocess.Popen(
            [sys.executable, "-c", CHILD, str(cores), str(docs)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, env=env, bufsize=1,
        )
        self._readline_until("READY")

    def _readline_until(self, tag):
        subs = {}
        while True:
            line = self.proc.stdout.readline()
            if not line:
                err = self.proc.stderr.read()
                raise RuntimeError(
                    f"child local[{self.cores}] died:\n{err[-3000:]}"
                )
            if line.startswith("SUB "):
                _, name, sec = line.split()
                subs[name] = float(sec)
            elif line.startswith(tag):
                return subs

    def run_trial(self):
        s0, t0 = _cpu_stat()
        self.proc.stdin.write("RUN\n")
        self.proc.stdin.flush()
        subs = self._readline_until("TRIAL")
        s1, t1 = _cpu_stat()
        return subs, (s1 - s0) / max(1, t1 - t0)

    def close(self):
        try:
            self.proc.stdin.write("QUIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3_000_000)
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=1)
    args = ap.parse_args()

    lo = _Child(args.low, args.docs)
    hi = _Child(args.high, args.docs)
    ratio = args.high / args.low
    acc: dict[str, list[tuple[float, float]]] = {}
    try:
        for w in range(args.warmups):
            sl, _ = lo.run_trial()
            sh, _ = hi.run_trial()
            print(f"warmup {w}: low {sl} | high {sh}", flush=True)
        for t in range(args.trials):
            sl, stl = lo.run_trial()
            sh, sth = hi.run_trial()
            print(
                f"round {t} (steal L {stl:.0%} H {sth:.0%}):", flush=True
            )
            for name in sl:
                eff = (sl[name] / max(1e-9, sh[name])) / ratio
                acc.setdefault(name, []).append((sl[name], sh[name]))
                print(
                    f"  {name}: {sl[name]:.1f}s -> {sh[name]:.1f}s "
                    f"eff {eff:.3f}",
                    flush=True,
                )
    finally:
        lo.close()
        hi.close()

    out = {"docs": args.docs, "low": args.low, "high": args.high}
    for name, pairs in acc.items():
        effs = sorted((l / max(1e-9, h)) / ratio for l, h in pairs)
        out[name] = {
            "low_sec": [round(l, 1) for l, _ in pairs],
            "high_sec": [round(h, 1) for _, h in pairs],
            "median_eff": round(effs[len(effs) // 2], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
