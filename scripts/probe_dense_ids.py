"""Probe: cost of assign_doc_ids_counted's range-exchange path vs a
dense-integer-key projection fast path (doc_id = key - min when the
single integral key is provably dense via an exact distinct count).

Times, at bench shape (sf0.1 by default):
  1. the current path (sampling job + range exchange + count job)
  2. the probe jobs the fast path would need (min/max/count agg, then
     count_distinct confirmation)
  3. the fast-path materialization (spread + projection + persist+count)
The downstream consumer cost is approximated by one with_tokens noop
over the resulting cached relation for each variant.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from web_search_engine_spark.operators.postings import (
    _spread_input,
    assign_doc_ids_counted,
    with_tokens,
)
from web_search_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, n=3, warm=1):
    for _ in range(warm):
        fn()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    print(
        f"{name:55s} med={samples[len(samples)//2]*1000:8.1f} ms  "
        f"min={samples[0]*1000:8.1f} ms",
        flush=True,
    )
    return samples[len(samples) // 2]


def main():
    spark = get_spark(
        "probe-dense-ids", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    src = docs.select(F.col("doc_id").alias("orig_id"), "text")
    # warm python workers
    with_tokens(src, "text", method="pandas").select(
        F.sum(F.size("tokens"))
    ).collect()

    def current_path():
        out, n, handle = assign_doc_ids_counted(src, ["orig_id"])
        noop(out)
        handle.unpersist(blocking=True)

    def probe_jobs_only():
        r = src.agg(
            F.count("orig_id").alias("c"),
            F.min("orig_id").alias("mn"),
            F.max("orig_id").alias("mx"),
        ).collect()[0]
        assert r["c"] == r["mx"] - r["mn"] + 1
        d = src.agg(F.count_distinct("orig_id").alias("d")).collect()[0]["d"]
        assert d == r["c"]

    def fast_path():
        r = src.agg(
            F.count("orig_id").alias("c"),
            F.min("orig_id").alias("mn"),
            F.max("orig_id").alias("mx"),
        ).collect()[0]
        d = src.agg(F.count_distinct("orig_id").alias("d")).collect()[0]["d"]
        assert d == r["c"] == r["mx"] - r["mn"] + 1
        out = _spread_input(src).withColumn(
            "doc_id", (F.col("orig_id") - F.lit(r["mn"])).cast("long")
        )
        h = out.persist()
        noop(out)
        h.unpersist(blocking=True)

    timeit("current: range+count+noop(out)", current_path)
    timeit("fast: probe jobs only (agg + count_distinct)", probe_jobs_only)
    timeit("fast: probes + spread + persist + noop", fast_path)

    # downstream consumer comparison: tokenize over the cached relation
    out_cur, n_cur, h_cur = assign_doc_ids_counted(src, ["orig_id"])
    noop(out_cur)

    def consume_cur():
        noop(with_tokens(out_cur, "text", method="pandas").select(
            "doc_id", F.size("tokens").alias("dl")))

    timeit("downstream tokenize: over range-partitioned cache", consume_cur)
    h_cur.unpersist(blocking=True)

    mn = src.agg(F.min("orig_id")).collect()[0][0]
    out_f = _spread_input(src).withColumn(
        "doc_id", (F.col("orig_id") - F.lit(mn)).cast("long")
    ).persist()
    noop(out_f)

    def consume_fast():
        noop(with_tokens(out_f, "text", method="pandas").select(
            "doc_id", F.size("tokens").alias("dl")))

    timeit("downstream tokenize: over spread+projected cache", consume_fast)
    out_f.unpersist(blocking=True)
    spark.stop()


if __name__ == "__main__":
    main()
