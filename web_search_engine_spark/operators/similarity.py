"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed
variant is the scale path (candidates only meet inside hyperplane-sign
buckets, turning the quadratic all-pairs into a bucketed self-join).
All arithmetic is promoted to double so the DuckDB oracle matches
bit-for-bit after round(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def _dbl(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector.

    -> (rank, vec_id, cosine); the query vector itself is excluded.
    Plan: broadcast the 1-row query side into the scan; global top-k is
    TakeOrderedAndProject (no full sort).
    """
    e = _dbl(embeddings)
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .withColumn(
            "cosine",
            F.round(_dot(F.col("embedding"), F.col("qe")) / (_norm(F.col("embedding")) * _norm(F.col("qe"))), 6),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "cosine")
    )


def cosine_topk_batch(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Top-k neighbors for a SET of stored vectors.

    -> (query_id, rank, vec_id, cosine). Plan: broadcast the query rows
    against the full table, per-query window top-k (parallel across
    queries) — the batch shape a retrieval pipeline runs at scale.
    """
    e = _dbl(embeddings)
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("embedding"), F.col("qe")) / (_norm(F.col("embedding")) * _norm(F.col("qe"))), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def hyperplane_signs(
    embeddings: DataFrame, planes: int = 4, tables: int = 8, dims: int | None = None
) -> DataFrame:
    """-> (vec_id, embedding, table, bucket): multi-table random-
    hyperplane LSH. Each of ``tables`` hash tables signs the vector
    against ``planes`` hyperplanes -> a ``planes``-bit bucket id.

    Plane coefficients are deterministic md5-derived pseudo-randoms
    (coef(t, p, d) = hexint(md5('t:p:d')) scaled to [-1, 1]) — buckets
    reproduce across engines and runs with no RNG state. Few planes per
    table keeps per-table recall high; many tables drive the union miss
    probability down ((1 - r^planes)^tables).
    """
    e = _dbl(embeddings)
    if dims is None:
        dims = len(e.select("embedding").first()["embedding"])

    def coef(t: int, p: int, d: int):
        return (
            F.conv(F.substring(F.md5(F.lit(f"{t}:{p}:{d}")), 1, 8), 16, 10).cast("long")
            % 2001 - 1000
        ).cast("double") / 1000.0

    per_table = []
    for t in range(tables):
        bucket = F.lit(0)
        for p in range(planes):
            dot_p = sum(
                (F.element_at(F.col("embedding"), d + 1) * coef(t, p, d) for d in range(dims)),
                F.lit(0.0),
            )
            bucket = bucket + F.when(dot_p > 0, F.lit(1 << p)).otherwise(F.lit(0))
        per_table.append(
            F.struct(F.lit(t).alias("table"), bucket.cast("long").alias("bucket"))
        )
    return e.select(
        "vec_id", "embedding", F.explode(F.array(*per_table)).alias("tb")
    ).select("vec_id", "embedding", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates meet inside any shared (table,
    bucket) cell -> union -> exact cosine re-rank.

    -> (query_id, rank, vec_id, cosine). Recall vs cosine_topk_batch is
    asserted in tests; at scale the bucket join replaces the quadratic
    cross product (shuffle keyed on (table, bucket), candidate set
    ~tables * bucket_size per query).
    """
    signed = hyperplane_signs(embeddings, planes, tables)
    q = signed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        "table",
        "bucket",
    )
    cand = (
        signed.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "embedding", "qe")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("embedding"), F.col("qe")) / (_norm(F.col("embedding")) * _norm(F.col("qe"))), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
