"""Query paths over the relational postings (term, doc_id, tf).

Replaces the reference's Searcher/Ranker/DAAT machinery
(HW2/engine/searcher.py, ranker.py, daat_ranker.py) with declarative
plans. Semantics pinned (SURVEY.md §2.7):

  - query tokenizer = lower().split() (NOT the corpus regex);
  - query terms absent from the lexicon are dropped BEFORE AND-gating;
  - duplicate query terms score multiple times (reference iterates the
    raw token list) -> weight = multiplicity;
  - AND and OR produce identical per-doc scores; mode only filters
    eligibility (doc must match all distinct surviving terms);
  - N and avgdl include zero-length docs; dl=0 docs are never scored
    (they have no postings);
  - top-k tie policy: score desc, doc_id asc.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, DEFAULT_TOPK
from ..functions.bm25 import bm25_term_score_col
from ..functions.tokenizer import tokenize_query


def _query_terms_df(spark: SparkSession, queries: list[tuple[str, str]]) -> DataFrame:
    """(query_id, term, weight, n_terms) from raw query strings.

    weight = how many times the term appears in the query (duplicate
    terms double-count in the reference scorer, HW2/engine/ranker.py:63);
    n_terms = number of DISTINCT terms, later clipped to those present in
    the index for the AND gate (HW2/engine/daat_ranker.py:68,108).
    """
    rows = []
    for qid, q in queries:
        counts = Counter(tokenize_query(q))
        for term, w in counts.items():
            rows.append((qid, term, w))
    if not rows:
        return spark.createDataFrame([], "query_id string, term string, weight long")
    return spark.createDataFrame(rows, "query_id string, term string, weight long")


def score_per_doc(
    postings: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    queries: list[tuple[str, str]],
    mode: str = "OR",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Un-ranked per-doc BM25 -> (query_id, doc_id, score).

    Plan shape (scale rationale):
      broadcast tiny query-term table into the postings scan (the join
      doubles as the term filter -> Catalyst prunes the scan) ->
      broadcast per-query df counts -> join doc_stats on doc_id -> one
      hash agg per (query_id, doc_id).
    """
    spark = postings.sparkSession
    qterms = _query_terms_df(spark, queries)

    # df per term, computed only for query terms (semi-filtered first).
    hit = postings.join(F.broadcast(qterms), "term")
    term_df = (
        hit.groupBy("query_id", "term", "weight")
        .agg(F.count("*").cast("long").alias("df"))
    )
    # AND gate denominator: distinct terms that survived the lexicon probe.
    n_present = term_df.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_terms_present")
    )

    scored_terms = (
        hit.join(F.broadcast(term_df.select("query_id", "term", "df")), ["query_id", "term"])
        .join(doc_stats, "doc_id")
        .withColumn(
            "term_score",
            F.col("weight")
            * bm25_term_score_col(
                F.col("tf"), F.col("df"), F.col("dl"), n_docs, avgdl, k1, b
            ),
        )
    )
    per_doc = scored_terms.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score"),
        F.count("*").cast("long").alias("n_matched"),
    )
    if mode.upper() == "AND":
        per_doc = per_doc.join(F.broadcast(n_present), "query_id").filter(
            F.col("n_matched") == F.col("n_terms_present")
        )
    return per_doc.select("query_id", "doc_id", "score")


def score_queries(
    postings: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    queries: list[tuple[str, str]],
    mode: str = "OR",
    topk: int = DEFAULT_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Batch BM25 top-k: -> (query_id, rank, doc_id, score).

    Per-query window top-k (parallel across queries; for a single query
    Spark plans TakeOrderedAndProject — no global sort).
    """
    per_doc = score_per_doc(
        postings, doc_stats, n_docs, avgdl, queries, mode, k1, b
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "score")
    )


def score_query(
    postings: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    query: str,
    mode: str = "OR",
    topk: int = DEFAULT_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Single-query BM25 top-k -> (doc_id, score), score desc, doc_id asc."""
    res = score_queries(
        postings, doc_stats, n_docs, avgdl, [("q", query)], mode, topk, k1, b
    )
    return res.orderBy("rank").select("doc_id", "score")


def boolean_search(
    postings: DataFrame, query: str, mode: str = "AND"
) -> DataFrame:
    """Unranked Boolean retrieval -> (doc_id) set.

    AND = n-ary intersection via groupBy + HAVING count(distinct term) =
    |surviving terms| (HW2/engine/searcher.py:74-81 does set
    intersection/union after full postings decode).
    """
    spark = postings.sparkSession
    terms = sorted(set(tokenize_query(query)))
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    hits = postings.filter(F.col("term").isin(terms)).select("term", "doc_id").distinct()
    if mode.upper() == "OR":
        return hits.select("doc_id").distinct()
    present = [r["term"] for r in hits.select("term").distinct().collect()]
    if not present:
        return spark.createDataFrame([], "doc_id long")
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == len(present))
        .select("doc_id")
    )
