"""SparkSession factory with scale-aware defaults.

Local sandbox runs on local[N]; on a real cluster the same confs apply
per-executor (AQE, Arrow, shuffle sizing). Keep every engine job going
through here so the tuning is in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_SHUFFLE_PARTITIONS


def arrow_records_per_batch() -> int:
    """Arrow records-per-batch cap derived from a declared row-width
    bound (ADVICE r4): with the byte cap removed (see below), batch
    bytes ~= records x row width, so cap records at ~256 MB target /
    WSE_EXPECTED_ROW_BYTES. Default 4 KiB reproduces the
    measured-optimal 65536; a 300 KB-document corpus setting
    WSE_EXPECTED_ROW_BYTES=300000 gets ~894-row batches instead of
    multi-GB ones."""
    row_bound = max(1, int(os.environ.get("WSE_EXPECTED_ROW_BYTES", "4096")))
    return max(256, min(65536, (256 << 20) // row_bound))


def get_spark(
    app_name: str = "web_search_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    - AQE on: runtime coalescing + skew-join splitting.
    - Arrow on: pandas_udf / applyInPandas batches are columnar.
    - shuffle partitions sized to parallelism, not the 200 default.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fewer, larger Arrow batches through mapInPandas/pandas_udf —
        # bounded by the declared row width, see arrow_records_per_batch
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_records_per_batch()),
        )
        # Spark 4's default 64 MB arrow.maxBytesPerBatch makes the
        # Python runners call ArrowWriter.sizeInBytes() PER INPUT ROW —
        # a recursive, allocation-heavy walk of the Arrow vector tree
        # (jstack-profiled: NonNullableStructVector.setValueCount /
        # getBufferSizeFor dominate the mapInArrow stage, ~1.8 us/row,
        # and the allocation churn collapses multi-thread scaling).
        # Int.MaxValue hits the BatchedPythonArrowInput short-circuit
        # that skips the walk entirely; batches stay bounded by
        # maxRecordsPerBatch rows, which is derived from the declared
        # row-width bound above — set WSE_EXPECTED_ROW_BYTES for wide
        # rows rather than restoring the byte cap.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647")
        .config("spark.sql.session.timeZone", "UTC")
        # 8g measured ~2.7x faster than 48g at local[32] on the index
        # build (G1 young-gen behavior with many allocating task
        # threads); raise via SPARK_GRAFT_DRIVER_MEM for huge inputs.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # PySpark 4's DataFrame-debugging wrapper captures a Python call
        # site around EVERY DataFrame/Column API call (a conf-get RPC, a
        # stack walk, and a JVM origin set+clear — measured ~3.9 ms per
        # wrapped op, ~130 ms per fresh query construct and more across
        # the build's hundreds of ops). Driver-side overhead only; error
        # messages merely lose the Python call-site line. Re-enable via
        # extra_conf when debugging plan construction.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
