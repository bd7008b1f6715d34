"""BM25 as native Catalyst column expressions (whole-stage codegen).

Formulas pinned to the reference:
  idf  = ln((N - df + 0.5) / (df + 0.5) + 1)      (HW2/engine/daat_ranker.py:35-37)
  s    = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                                                  (HW2/engine/daat_ranker.py:40-44)
Defaults k1=1.2, b=0.75 (HW2/engine/ranker.py:17). The "+1 inside the
log" variant never goes negative — do not substitute Lucene's formula.
All arithmetic in float64, matching Python floats in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1


def bm25_idf_col(n_docs, df_col: Column) -> Column:
    """IDF column; ``n_docs`` is a scalar (python number) or Column."""
    n = F.lit(float(n_docs)) if not isinstance(n_docs, Column) else n_docs.cast("double")
    d = df_col.cast("double")
    return F.log((n - d + F.lit(0.5)) / (d + F.lit(0.5)) + F.lit(1.0))


def bm25_weighted_score_expr(
    n_docs,
    avgdl,
    k1: float = BM25_K1,
    b: float = BM25_B,
    tf: str = "tf",
    df: str = "df",
    dl: str = "dl",
    weight: str = "weight",
) -> str:
    """``weight * bm25_term_score`` as ONE SQL expression string.

    Semantically identical to ``weight_col * bm25_term_score_col(...)``
    — the parsed tree has the same operator structure and association,
    so every float64 intermediate is bit-identical (pinned by
    tests/test_milestone1.py::test_bm25_expr_bit_identical). The point
    is driver latency: building the equivalent Column tree costs ~45 ms
    of py4j round-trips PER QUERY CALL (one RPC per operator/literal);
    F.expr ships one string. Scalar literals are embedded via repr()
    (shortest round-trip form — Double.parseDouble restores the exact
    bits) with the D suffix so they parse as DOUBLE, never DECIMAL.
    """
    n = repr(float(n_docs))
    avg = repr(float(avgdl))
    k1r = repr(float(k1))
    k1p1 = repr(float(k1) + 1.0)
    omb = repr(1.0 - float(b))
    br = repr(float(b))
    return (
        f"{weight} * (ln(({n}D - CAST({df} AS DOUBLE) + 0.5D)"
        f" / (CAST({df} AS DOUBLE) + 0.5D) + 1.0D)"
        f" * (CAST({tf} AS DOUBLE) * {k1p1}D)"
        f" / (CAST({tf} AS DOUBLE)"
        f" + {k1r}D * ({omb}D + {br}D * CAST({dl} AS DOUBLE) / {avg}D)))"
    )


def bm25_term_score_col(
    tf_col: Column,
    df_col: Column,
    dl_col: Column,
    n_docs,
    avgdl,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    """Single-term BM25 contribution — pure column arithmetic, no UDF."""
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    avg = F.lit(float(avgdl)) if not isinstance(avgdl, Column) else avgdl.cast("double")
    idf = bm25_idf_col(n_docs, df_col)
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avg)
    return idf * (tf * F.lit(k1 + 1.0)) / denom
