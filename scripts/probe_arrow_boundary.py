"""Price the JVM->Arrow->Python worker boundary of the blocks encode
stage, per parallelism level (BENCH.md round 4 'boundary probe' — the
probe that found Spark 4.1.2's per-row ArrowWriter.sizeInBytes walk).

Variants over the SAME sorted exchange (postings cached + counted
first, noop sink, warm + 2 timed, min):

  F0_consume  mapInArrow that only counts rows — isolates JVM row->
              Arrow conversion + IPC transfer, zero encode work
  F1_encode   the real zero-copy varbyte block encoder

If F0 ~= F1, the boundary — not the encoder — owns the stage. With
`spark.sql.execution.arrow.maxBytesPerBatch` at its 64 MB default,
Spark 4 walks the whole Arrow vector tree after EVERY row to check
batch size; session.py pins the conf to Int.MaxValue which takes the
short-circuit (batches stay bounded by maxRecordsPerBatch). Round-4
readings, 1.5M docs, same window:

  before fix: F0 44.1@4 / 27.5@16 (eff 0.40), F1 40.9 / 35.4 (0.29)
  after fix:  F0 29.3@4 / 12.0@16 (eff 0.61), F1 33.2 / 13.0 (0.64)

Pass --default-batch-bytes to re-measure the unfixed behavior.

Usage: python scripts/probe_arrow_boundary.py [--docs 1500000]
         [--levels 4,16] [--default-batch-bytes]
"""
import argparse
import os
import subprocess
import sys

CHILD = r"""
import sys, time
cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); unfixed = sys.argv[3] == "1"
from web_search_engine_spark.session import get_spark
from web_search_engine_spark.operators.postings import (
    assign_doc_ids_counted, build_postings, with_tokens)
from web_search_engine_spark.operators import blocks as B
from web_search_engine_spark.sources.corpus import generate_corpus_pdf_fast
from pyspark.sql import functions as F
import pyarrow as pa

extra = {"spark.local.dir": "/dev/shm/wse_shuffle",
         "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
         "spark.sql.files.openCostInBytes": str(1024 * 1024)}
if unfixed:  # restore Spark's 64 MB default -> per-row size walk
    extra["spark.sql.execution.arrow.maxBytesPerBatch"] = str(64 * 1024 * 1024)
spark = get_spark(f"boundary-{cores}", master=f"local[{cores}]",
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
postings = build_postings(with_tokens(docs, "content")).persist()
print("postings", postings.count(), flush=True)
shard_size = max(1, -(-n_docs // 16))

def sorted_rel():
    sharded = postings.withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int"))
    sub = max(1, (4 * cores + 15) // 16)
    pk = B.identity_partition_key(
        F.col("shard"), F.pmod(F.xxhash64("term"), F.lit(sub)), sub, cores)
    return sharded.repartition(cores, pk).sortWithinPartitions(
        "shard", "term", "doc_id")

_SINK = pa.schema([("f", pa.string()), ("nrows", pa.int64())])
def consume_fn(batches):
    n = 0
    for b in batches:
        n += b.num_rows
    yield pa.RecordBatch.from_arrays(
        [pa.array(["x"]), pa.array([n])], schema=_SINK)

def f0():
    sorted_rel().mapInArrow(consume_fn, "f string, nrows long").write.format(
        "noop").mode("overwrite").save()
def f1():
    sorted_rel().mapInArrow(
        B._block_builder(128, "varbyte"), B.BLOCK_SCHEMA
    ).write.format("noop").mode("overwrite").save()

for name, fn in (("F0_consume", f0), ("F1_encode", f1)):
    fn()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter() - t0)
    print(f"RESULT {cores} {name} {best:.2f}", flush=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--default-batch-bytes", action="store_true",
                    help="measure WITHOUT the session.py fix")
    args = ap.parse_args()
    for cores in (int(c) for c in args.levels.split(",")):
        print(f"=== local[{cores}] ===", flush=True)
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        env["PYSPARK_PYTHON"] = sys.executable
        subprocess.run(
            [sys.executable, "-c", CHILD, str(cores), str(args.docs),
             "1" if args.default_batch_bytes else "0"],
            env=env, check=True,
        )


if __name__ == "__main__":
    main()
