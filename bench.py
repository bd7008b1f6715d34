"""Per-round benchmark harness (driver contract).

Runs the engine's headline operations at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

"value" = total wall seconds across the headline queries (lower is
better); per-query seconds are in "queries". Compare against
BASELINE.md (reference: 32.4k docs/s tokenize+runs, ~5.2k docs/s e2e
build, 0.6-62 ms/query DAAT at 8.8M docs).
"""

from __future__ import annotations

import json
import os
import time

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
    score_queries,
)
from web_search_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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


# (steal_jiffies, total_jiffies) sampler — sampling it per timed row
# lets a reader separate engine regressions from VM weather (VERDICT
# r3 #3: the r3 artifact landed in a degraded window and read 3.1x
# worse than the controlled same-window evidence). One implementation,
# shared with the scaling harness (scripts/ab_oversub.py and
# scripts/size_probe.py import from the same place).
from scaling_bench import _cpu_stat


def main() -> None:
    spark = get_spark(
        "wse-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    timings: dict[str, float] = {}
    steals: dict[str, float] = {}
    build_trials: dict[str, list[float]] = {}

    def _steal_record(name: str, st0: tuple[int, int]) -> None:
        s1, t1 = _cpu_stat()
        steals[name] = round((s1 - st0[0]) / max(1, t1 - st0[1]), 3)

    def timed(name: str, fn):
        st0 = _cpu_stat()
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        _steal_record(name, st0)
        return out

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs_input = docs.count()  # warm the JVM/scan before timing
    # warm the Python workers too (concurrent pandas/Arrow imports cost
    # seconds at 32 workers; a long-lived cluster executor is warm)
    with_tokens(docs, "text", method="pandas").select(
        F.sum(F.size("tokens"))
    ).collect()

    # --- index build (best-of-2: builds are the rows most exposed to VM
    # weather — a single cold trial made the r3 artifact unrepresentative) ---
    st0 = _cpu_stat()
    trials = []
    postings = None
    for trial in range(2):
        if postings is not None:
            postings.unpersist(blocking=True)
        t0 = time.perf_counter()
        postings = build_postings(with_tokens(docs, "text", method="pandas")).cache()
        n_postings = postings.count()
        trials.append(round(time.perf_counter() - t0, 4))
    timings["build_postings"] = min(trials)
    build_trials["build_postings"] = trials
    _steal_record("build_postings", st0)
    stats = doc_stats(with_tokens(docs, "text", method="pandas")).cache()
    n, avgdl = corpus_stats(stats)
    lex = timed("build_lexicon", lambda: lexicon_df(postings).cache())
    lex.count()

    # --- queries: warmup pass (JVM/codegen/broadcast warm), then timed ---
    def q_batch_or():
        return score_queries(postings, stats, n, avgdl, BATCH_QUERIES, "OR", 10, lexicon=lex).count()

    def q_batch_and():
        return score_queries(postings, stats, n, avgdl, BATCH_QUERIES, "AND", 10, lexicon=lex).count()

    def q_single():
        return score_queries(postings, stats, n, avgdl, [("q", "hash join")], "OR", 10, lexicon=lex).count()

    def q_bool_and():
        return boolean_search(postings, "window agg stream", "AND").count()

    def q_bool_or():
        return boolean_search(postings, "vector stream", "OR").count()

    def timed_median(name: str, fn, trials: int = 3):
        """Median of N trials — the sandbox has noisy multi-second
        per-job scheduling overhead; medians are the stable signal."""
        st0 = _cpu_stat()
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)
        _steal_record(name, st0)

    for fn in (q_batch_or, q_batch_and, q_single, q_bool_and, q_bool_or):
        fn()  # warmup
    timed_median("bm25_batch8_or", q_batch_or)
    timed_median("bm25_batch8_and", q_batch_and)
    timed_median("bm25_single", q_single)
    timed_median("boolean_and", q_bool_and)
    timed_median("boolean_or", q_bool_or)

    # --- physical index: build to disk, then interactive WAND queries ---
    import shutil
    import statistics
    import tempfile

    from web_search_engine_spark.plans.build_index import build_index
    from web_search_engine_spark.plans.search import SearchEngine

    # key on the existing dense doc_id: the index's dense-rank id
    # assignment becomes the identity, so the block path's results are
    # directly comparable with the relational path's doc_ids below
    src = docs.select(F.col("doc_id").alias("orig_id"), "text")
    st0 = _cpu_stat()
    trials = []
    idx_dir = None
    for trial in range(2):
        if idx_dir is not None:
            shutil.rmtree(idx_dir, ignore_errors=True)
        idx_dir = tempfile.mkdtemp(prefix="wse_bench_idx_")
        t0 = time.perf_counter()
        build_index(
            spark, src, idx_dir, codec="varbyte", num_shards=8, resume=False,
            key_cols=("orig_id",), text_col="text",
        )
        trials.append(round(time.perf_counter() - t0, 4))
    timings["index_build_disk"] = min(trials)
    build_trials["index_build_disk"] = trials
    _steal_record("index_build_disk", st0)

    eng = SearchEngine(idx_dir)
    lat_ms = []
    for _, q in BATCH_QUERIES:
        eng.search(q, "OR", 10)  # warm block cache path
    for _ in range(3):
        for _, q in BATCH_QUERIES:
            t0 = time.perf_counter()
            eng.search(q, "OR", 10, use_wand=True)
            lat_ms.append((time.perf_counter() - t0) * 1000)
    lat_ms.sort()
    timings["wand_query_p50"] = round(statistics.median(lat_ms) / 1000, 4)
    timings["wand_query_p95"] = round(lat_ms[int(len(lat_ms) * 0.95) - 1] / 1000, 4)

    # --- hot (stopword-heavy) OR query: TAAT vs blockwise block-max ---
    # kernel-cliff evidence at this SF; the 3M-doc run lives in
    # scripts/bench_hot_query.py (BENCH.md)
    hot_q = " ".join(
        r["term"] for r in lex.orderBy(F.desc("df"), "term").limit(5).collect()
    )
    for mode, kerns in (("OR", ("taat", "bmw_block")), ("AND", ("taat", "vec_and"))):
        for kern in kerns:
            eng.search(hot_q, mode, 10, force_kernel=kern)  # warm + flat cache
            samples = []
            for _ in range(5):
                t0 = time.perf_counter()
                eng.search(hot_q, mode, 10, force_kernel=kern)
                samples.append(time.perf_counter() - t0)
            timings[f"hot_{mode.lower()}_{kern}"] = round(statistics.median(samples), 4)

    # --- cluster-scale batch path over the BLOCK table (VERDICT r2 #5):
    # prune scan on term -> vectorized decode -> relational BM25 ---
    from web_search_engine_spark.plans.search import batch_score
    from web_search_engine_spark.sources.catalog import IndexCatalog

    cat = IndexCatalog(spark, idx_dir)

    def q_batch_blocks():
        return batch_score(cat, BATCH_QUERIES, "OR", 10).count()

    q_batch_blocks()  # warm
    timed_median("bm25_batch8_blocks", q_batch_blocks)

    # same-results guard: the block path must reproduce the relational
    # path row-for-row (rounded scores) — a silent divergence would make
    # the timing meaningless
    def canon(df):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
            for r in df.collect()
        )

    rel = score_queries(postings, stats, n, avgdl, BATCH_QUERIES, "OR", 10, lexicon=lex)
    blk = batch_score(cat, BATCH_QUERIES, "OR", 10)
    if canon(rel) != canon(blk):
        raise SystemExit("block-path results diverge from relational path")
    shutil.rmtree(idx_dir, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "n_docs": n_docs_input,
                "n_postings": n_postings,
                "docs_per_sec_build": round(
                    n_docs_input / max(timings["build_postings"], 1e-9), 1
                ),
                # VM-weather context per row: fraction of CPU the host
                # stole during that measurement (0.0 = clean window)
                "steal": steals,
                "build_trials": build_trials,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
