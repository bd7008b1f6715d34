"""A/B/C the tokenizer choice over the FULL blocks datapath (cached
source -> tokenize -> postings -> blocks shuffle -> encode ->
partitioned parquet write to tmpfs), per parallelism level (BENCH.md
round 4 'tokenizer A/B').

  A_pandas   pandas_udf tokenize (the default)
  B_split    with_tokens(method='split'): JVM regexp codegen for
             ASCII entity-free rows, pandas for the rest
  C_splitv2  B + mapreduce.fileoutputcommitter.algorithm.version=2
             (task-side commit renames instead of driver-serial)

Round-4 readings (1.5M docs): A 94.7@4 / 35.1@16 BEAT B 123.5 / 59.3
at both levels — java.util.regex on the token pattern costs more than
the Python worker boundary it avoids — and C ~= B (the commit phase is
not a bottleneck on tmpfs). Hence the pandas default.

Usage: python scripts/probe_tokenizer_ab.py [--docs 1500000]
                                            [--levels 4,16]
"""
import argparse
import os
import subprocess
import sys

CHILD = r"""
import sys, time, tempfile, shutil
cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); variant = sys.argv[3]
from web_search_engine_spark.session import get_spark
from web_search_engine_spark.operators.postings import (
    assign_doc_ids_counted, build_postings, with_tokens)
from web_search_engine_spark.operators.blocks import build_block_index
from web_search_engine_spark.sources.corpus import generate_corpus_pdf_fast

extra = {"spark.local.dir": "/dev/shm/wse_shuffle",
         "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
         "spark.sql.files.openCostInBytes": str(1024 * 1024)}
if variant == "C_splitv2":
    extra["spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"] = "2"
spark = get_spark(f"tok-{cores}-{variant}", master=f"local[{cores}]",
                  shuffle_partitions=cores, extra_conf=extra)
src_dir = f"/tmp/wse_scale_src_{n_docs}"
import os
if not os.path.exists(src_dir + "/_SUCCESS"):
    pdf = generate_corpus_pdf_fast(n_docs, seed=42)
    spark.createDataFrame(pdf).repartition(64).write.mode(
        "overwrite").parquet(src_dir)
src = spark.read.parquet(src_dir)
docs, n, handle = assign_doc_ids_counted(src, ["repo", "path"])
docs = docs.cache(); docs.count(); handle.unpersist()
shard_size = max(1, -(-n_docs // 16))
method = "pandas" if variant == "A_pandas" else "split"

def trial():
    out = tempfile.mkdtemp(prefix=f"tp_{cores}_", dir="/dev/shm")
    t0 = time.perf_counter()
    build_block_index(
        build_postings(with_tokens(docs, "content", method=method)),
        codec="varbyte", shard_size=shard_size, shards_hint=16,
    ).write.mode("overwrite").option(
        "parquet.block.size", str(4 * 1024 * 1024)
    ).partitionBy("shard").parquet(out)
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt

trial()
best = min(trial() for _ in range(2))
print(f"RESULT {cores} {variant} {best:.2f}", flush=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--levels", default="4,16")
    args = ap.parse_args()
    for cores in (int(c) for c in args.levels.split(",")):
        print(f"=== local[{cores}] ===", flush=True)
        for variant in ("A_pandas", "B_split", "C_splitv2"):
            env = dict(os.environ)
            env["PYTHONPATH"] = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            )
            env["PYSPARK_PYTHON"] = sys.executable
            subprocess.run(
                [sys.executable, "-c", CHILD, str(cores), str(args.docs),
                 variant],
                env=env, check=True,
            )


if __name__ == "__main__":
    main()
