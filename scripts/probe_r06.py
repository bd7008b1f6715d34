"""Round-6 decomposition probe: where do the bench rows' seconds go?

Reproduces bench.py's setup (same session confs, same cached relations)
and times each sub-plan with the noop sink (guide §1.4) so the
computation is isolated from the sink. Run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/probe_r06.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from web_search_engine_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_stats,
    lexicon_df,
    with_tokens,
)
from web_search_engine_spark.plans.query import (
    boolean_search,
    probe_lexicon,
    score_per_doc,
    score_queries,
)
from web_search_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BATCH_QUERIES = [
    ("q1", "hash join"),
    ("q2", "merge sort"),
    ("q3", "window agg stream"),
    ("q4", "the fast query"),
    ("q5", "spark"),
    ("q6", "customer order line"),
    ("q7", "vector stream batch"),
    ("q8", "slow scan filter table"),
]


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
    print(f"{name:45s} med={samples[len(samples)//2]*1000:8.1f} ms  "
          f"min={samples[0]*1000:8.1f} ms", flush=True)


def main():
    spark = get_spark("probe-r06", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    with_tokens(docs, "text", method="pandas").select(
        F.sum(F.size("tokens"))).collect()

    print(f"== build_postings decomposition (sf dir {SF_DIR}) ==")
    print("input partitions:", docs.rdd.getNumPartitions())
    sc.setJobDescription("scan only")
    timeit("scan only (noop)", lambda: noop(docs))
    sc.setJobDescription("tokenize")
    timeit("scan+tokenize (noop)",
           lambda: noop(with_tokens(docs, "text", method="pandas")))
    sc.setJobDescription("tokenize+explode")
    timeit("scan+tokenize+explode (noop)",
           lambda: noop(with_tokens(docs, "text", method="pandas").select(
               "doc_id", F.explode("tokens").alias("term"))))
    sc.setJobDescription("build_postings")
    timeit("full build_postings (noop)",
           lambda: noop(build_postings(with_tokens(docs, "text", method="pandas"))))
    par = sc.defaultParallelism
    sc.setJobDescription("tokenize spread")
    timeit("repartition(par)+tokenize (noop)",
           lambda: noop(with_tokens(docs.repartition(par), "text",
                                    method="pandas")))
    sc.setJobDescription("build_postings spread")
    timeit("repartition(par)+build_postings (noop)",
           lambda: noop(build_postings(
               with_tokens(docs.repartition(par), "text", method="pandas"))))

    print("== query path decomposition ==")
    postings = build_postings(
        with_tokens(docs, "text", method="pandas")).cache()
    postings.count()
    stats = doc_stats(with_tokens(docs, "text", method="pandas")).cache()
    n, avgdl = corpus_stats(stats)
    lex = lexicon_df(postings).cache()
    lex.count()

    all_terms = sorted({t for _, q in BATCH_QUERIES for t in q.split()})
    sc.setJobDescription("probe_lexicon")
    timeit("probe_lexicon (driver collect)",
           lambda: probe_lexicon(lex, all_terms))
    sc.setJobDescription("per_doc OR")
    timeit("score_per_doc OR (noop)",
           lambda: noop(score_per_doc(postings, stats, n, avgdl,
                                      BATCH_QUERIES, "OR", lexicon=lex)))
    sc.setJobDescription("score_queries OR")
    timeit("score_queries OR count",
           lambda: score_queries(postings, stats, n, avgdl,
                                 BATCH_QUERIES, "OR", 10, lexicon=lex).count())
    sc.setJobDescription("postings filter only")
    terms = all_terms
    timeit("postings isin-filter (noop)",
           lambda: noop(postings.filter(F.col("term").isin(terms))))
    sc.setJobDescription("boolean_and")
    timeit("boolean_and count",
           lambda: boolean_search(postings, "window agg stream", "AND").count())
    sc.setJobDescription("boolean_or")
    timeit("boolean_or count",
           lambda: boolean_search(postings, "vector stream", "OR").count())

    # how much of score_queries is plan/analysis overhead vs execution?
    sc.setJobDescription("plan-only")
    def plan_only():
        df = score_queries(postings, stats, n, avgdl, BATCH_QUERIES,
                           "OR", 10, lexicon=lex)
        df._jdf.queryExecution().executedPlan()
    timeit("score_queries plan-only (no exec)", plan_only)

    print("== explain: score_queries OR ==")
    score_queries(postings, stats, n, avgdl, BATCH_QUERIES, "OR", 10,
                  lexicon=lex).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
