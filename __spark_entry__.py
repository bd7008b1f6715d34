"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2
run over the driver-provided ``documents`` table; ``oracle_sql()`` holds
the equivalent DuckDB SQL. Both sides tokenize with the reference regex
(HW2/engine/parser.py:78) and score BM25 with the reference formulas
(HW2/engine/daat_ranker.py:35-44, k1=1.2 b=0.75). Scores are rounded to
6 decimals on BOTH sides and ranked on the rounded value (tie-break
doc_id asc) so the float hash-compare is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_search_engine_spark.config import TOKEN_RE
from web_search_engine_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_stats,
    lexicon_df,
    with_tokens,
)
from web_search_engine_spark.plans.query import boolean_search, score_per_doc

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Fixed query set over the documents-table vocabulary (mirrors the
# reference's fixed 7-query set pattern, HW2/engine/searcher.py:254-262).
Q_OR = "hash join"
Q_AND = "merge sort"
Q_SINGLE = "spark"
Q_DUP = "the the data"  # duplicate query terms double-count (ranker.py:63)
Q_BOOL_AND = "window agg stream"
Q_BOOL_OR = "vector stream"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JVM regexp tokenizer: documents.text is entity-free, and the DuckDB
    # oracle runs the identical regex — see functions/tokenizer.py.
    return with_tokens(_docs(spark, sf_dir), "text", method="sql")


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_postings(_tokens(spark, sf_dir))


def _bm25_topk(spark: SparkSession, sf_dir: str, query: str, mode: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    postings = build_postings(toks)
    stats = doc_stats(toks)
    n, avgdl = corpus_stats(stats)
    per = score_per_doc(postings, stats, n, avgdl, [("q", query)], mode=mode)
    per = per.withColumn("score", F.round("score", 6))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("rank", "doc_id", "score")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for the OR query on sf0.001."""
    return _bm25_topk(spark, DEFAULT_SF_DIR, Q_OR, "OR")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # A1: tf counting (explode + groupBy)
        "tf_postings": lambda spark, sf: _postings(spark, sf).select(
            "term", "doc_id", "tf"
        ),
        # A3: document frequency (exact)
        "lexicon": lambda spark, sf: lexicon_df(_postings(spark, sf)),
        # A2: doc length (zero-length docs kept)
        "doc_stats": lambda spark, sf: doc_stats(_tokens(spark, sf)),
        # A4: corpus stats N, avgdl
        "corpus_stats": lambda spark, sf: doc_stats(_tokens(spark, sf)).agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("dl"), 6).alias("avgdl"),
        ),
        # A6: doc length rebuilt from postings (dl = sum tf)
        "doc_len_from_postings": lambda spark, sf: _postings(spark, sf)
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("dl")),
        # P7/P8/A7/O6: BM25 top-k, OR and AND modes, single + duplicate terms
        "bm25_top10_or": lambda spark, sf: _bm25_topk(spark, sf, Q_OR, "OR"),
        "bm25_top10_and": lambda spark, sf: _bm25_topk(spark, sf, Q_AND, "AND"),
        "bm25_single_term": lambda spark, sf: _bm25_topk(spark, sf, Q_SINGLE, "OR"),
        "bm25_dup_terms": lambda spark, sf: _bm25_topk(spark, sf, Q_DUP, "OR"),
        # J1/J2: boolean set retrieval
        "boolean_and": lambda spark, sf: boolean_search(
            _postings(spark, sf), Q_BOOL_AND, "AND"
        ),
        "boolean_or": lambda spark, sf: boolean_search(
            _postings(spark, sf), Q_BOOL_OR, "OR"
        ),
    }


# ---------------------------------------------------------------- oracle SQL

_CTES = f"""
tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
),
dl AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOKEN_RE}'))::BIGINT AS dl
  FROM documents
),
tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl)
"""


def _values_clause(query: str) -> str:
    from collections import Counter

    counts = Counter(query.lower().split())
    vals = ", ".join(f"('{t}', {w})" for t, w in counts.items())
    return vals


def _bm25_sql(query: str, mode: str) -> str:
    vals = _values_clause(query)
    and_filter = (
        "WHERE s.n_matched = (SELECT count(*) FROM present)"
        if mode.upper() == "AND"
        else ""
    )
    return f"""
WITH {_CTES},
qterms(term, weight) AS (VALUES {vals}),
present AS (
  SELECT q.term, q.weight, d.df FROM qterms q JOIN dft d USING (term)
),
scored AS (
  SELECT tf.doc_id,
         sum(p.weight
             * ln((st.n_docs - p.df + 0.5) / (p.df + 0.5) + 1.0)
             * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
            ) AS score,
         count(*) AS n_matched
  FROM tf
  JOIN present p USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats st
  WHERE dl.dl > 0
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY round(s.score, 6) DESC, s.doc_id ASC) AS rank,
       s.doc_id,
       round(s.score, 6) AS score
FROM scored s
{and_filter}
ORDER BY rank
LIMIT 10
"""


def _boolean_sql(query: str, mode: str) -> str:
    terms = sorted(set(query.lower().split()))
    in_list = ", ".join(f"'{t}'" for t in terms)
    if mode.upper() == "OR":
        return f"""
WITH {_CTES}
SELECT DISTINCT doc_id FROM tf WHERE term IN ({in_list})
"""
    return f"""
WITH {_CTES},
present AS (SELECT DISTINCT term FROM dft WHERE term IN ({in_list}))
SELECT doc_id
FROM tf
WHERE term IN ({in_list})
GROUP BY doc_id
HAVING count(DISTINCT term) = (SELECT count(*) FROM present)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "tf_postings": f"WITH {_CTES} SELECT term, doc_id, tf FROM tf",
        "lexicon": f"WITH {_CTES} SELECT term, df FROM dft",
        "doc_stats": f"WITH {_CTES} SELECT doc_id, dl FROM dl",
        "corpus_stats": f"WITH {_CTES} SELECT n_docs, round(avgdl, 6) AS avgdl FROM stats",
        "doc_len_from_postings": f"WITH {_CTES} SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id",
        "bm25_top10_or": _bm25_sql(Q_OR, "OR"),
        "bm25_top10_and": _bm25_sql(Q_AND, "AND"),
        "bm25_single_term": _bm25_sql(Q_SINGLE, "OR"),
        "bm25_dup_terms": _bm25_sql(Q_DUP, "OR"),
        "boolean_and": _boolean_sql(Q_BOOL_AND, "AND"),
        "boolean_or": _boolean_sql(Q_BOOL_OR, "OR"),
    }
