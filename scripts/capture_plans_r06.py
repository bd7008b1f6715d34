"""Capture explain('formatted') plans for every query path touched in
round 6, writing plans/r06/<name>_{before,after}.txt.

Run once from the round-start worktree (--tag before) and once from the
current tree (--tag after); the output dir is always the MAIN repo's
plans/r06/.  Covers the declared driver queries whose physical plans
changed plus the bench-only paths (batch score_queries, block-table
batch_score, the build_index blocks/docs_meta subplans are exercised
through their public entry points).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT_DIR = "/root/repo/plans/r06"
SF = "/root/testdata/sf0.01"

TOUCHED = [
    # declared queries whose plans changed (tokenize explode fix, input
    # spread, doc-clustered postings layout)
    "tf_postings", "lexicon", "doc_stats", "corpus_stats",
    "doc_len_from_postings",
    "bm25_top10_or", "bm25_top10_and", "bm25_single_term", "bm25_dup_terms",
    "boolean_and", "boolean_or",
    "block_roundtrip", "block_meta",
    "simhash", "simhash_pairs", "fingerprint",
    "fuzzy_dedup_reindex",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    args = ap.parse_args()
    os.makedirs(OUT_DIR, exist_ok=True)

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from web_search_engine_spark.session import get_spark

    spark = get_spark("plans-r06", master="local[8]", shuffle_partitions=8)

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, args.tag, flush=True)

    qs = entry_mod.queries()
    for name in TOUCHED:
        try:
            dump(name, qs[name](spark, SF))
        except Exception as ex:  # pragma: no cover - capture helper
            print("SKIP", name, type(ex).__name__, str(ex)[:120])

    # bench-only paths
    from web_search_engine_spark.operators.postings import (
        build_postings,
        corpus_stats,
        doc_stats,
        lexicon_df,
        with_tokens,
    )
    from web_search_engine_spark.plans.query import score_queries

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = with_tokens(docs, "text", method="pandas")
    postings = build_postings(toks).cache()
    postings.count()
    stats = doc_stats(with_tokens(docs, "text", method="pandas")).cache()
    n, avgdl = corpus_stats(stats)
    lex = lexicon_df(postings).cache()
    lex.count()
    dump("bench_build_postings", build_postings(with_tokens(docs, "text", method="pandas")))
    batch = [("q1", "hash join"), ("q2", "merge sort")]
    dump("bench_score_queries_or", score_queries(postings, stats, n, avgdl, batch, "OR", 10, lexicon=lex))

    spark.stop()


if __name__ == "__main__":
    main()
