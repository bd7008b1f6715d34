"""Round-6 build_index decomposition at bench shape (sf1.0, 8 shards).

Times each sub-plan of the build with noop sinks vs real writes so the
blocks_write / docs_meta_write seconds can be attributed to compute,
exchange, observation, or the parquet sink itself.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from web_search_engine_spark.operators.blocks import (
    build_block_index,
    identity_partition_key,
)
from web_search_engine_spark.operators.postings import (
    assign_doc_ids_counted,
    build_postings,
    with_tokens,
)
from web_search_engine_spark.plans.build_index import _per_shard_observe_exprs
from web_search_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
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
    print(f"{name:50s} med={samples[len(samples)//2]*1000:8.1f} ms  "
          f"min={samples[0]*1000:8.1f} ms", flush=True)


def main():
    spark = get_spark("probe-r06-build", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs_in = docs.count()
    with_tokens(docs, "text", method="pandas").select(
        F.sum(F.size("tokens"))).collect()
    src = docs.select(F.col("doc_id").alias("orig_id"), "text")

    # --- stage 1: id assignment ---
    def assign():
        out, n, handle = assign_doc_ids_counted(src, ["orig_id"])
        handle.unpersist(blocking=True)
        return n
    timeit("assign_doc_ids_counted (count job only)", assign)

    docs_ids, n_docs, cached = assign_doc_ids_counted(src, ["orig_id"])
    shard_size = max(1, -(-n_docs // 8))
    work = docs_ids.withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int"))
    pending = list(range(8))

    toks = with_tokens(work, "text", method="pandas")

    sc.setJobDescription("tokenize from cached src")
    timeit("tokenize over cached ranged src (noop)",
           lambda: noop(toks.select("doc_id", "tokens")))

    sc.setJobDescription("postings from cached src")
    timeit("build_postings over cached src (noop)",
           lambda: noop(build_postings(toks)))

    def blocks_df():
        return build_block_index(
            build_postings(toks), shard_size=shard_size, shards_hint=8)

    sc.setJobDescription("blocks encode noop")
    timeit("postings->blocks encode (noop)", lambda: noop(blocks_df()))

    sc.setJobDescription("blocks encode + observe noop")
    def blocks_obs_noop():
        obs = Observation("b")
        noop(blocks_df().observe(obs, *_per_shard_observe_exprs(pending, "blocks")))
        return obs.get
    timeit("blocks + observation (noop)", blocks_obs_noop)

    sc.setJobDescription("blocks write parquet")
    def blocks_write():
        d = tempfile.mkdtemp(prefix="probe_blk_")
        try:
            blocks_df().write.mode("overwrite").option(
                "parquet.block.size", str(4 * 1024 * 1024)
            ).partitionBy("shard").parquet(os.path.join(d, "blocks"))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    timeit("blocks + partitioned parquet write", blocks_write)

    # --- docs_meta (dl_source=tokenize shape at this scale) ---
    meta = toks.select(
        "shard", "doc_id", "orig_id",
        F.size("tokens").cast("long").alias("dl"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )
    sc.setJobDescription("docs_meta noop")
    timeit("docs_meta compute (noop)", lambda: noop(meta))

    par = sc.defaultParallelism
    sub = max(1, (4 * par + 8 - 1) // 8)
    def meta_write():
        d = tempfile.mkdtemp(prefix="probe_meta_")
        try:
            meta.repartition(
                par, identity_partition_key(
                    F.col("shard"), F.pmod(F.col("doc_id"), F.lit(sub)), sub, par)
            ).write.mode("overwrite").partitionBy("shard").parquet(
                os.path.join(d, "docs_meta"))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    sc.setJobDescription("docs_meta write")
    timeit("docs_meta repartition + partitioned write", meta_write)

    def meta_write_nosha():
        d = tempfile.mkdtemp(prefix="probe_meta2_")
        try:
            meta.drop("content_sha256").repartition(
                par, identity_partition_key(
                    F.col("shard"), F.pmod(F.col("doc_id"), F.lit(sub)), sub, par)
            ).write.mode("overwrite").partitionBy("shard").parquet(
                os.path.join(d, "docs_meta"))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    sc.setJobDescription("docs_meta write nosha")
    timeit("docs_meta write WITHOUT sha256", meta_write_nosha)

    cached.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
