"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All pure-JVM column expressions with exact DuckDB-oracle equivalents
(deterministic arithmetic, fixed stopword lists, md5-derived hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import TOKEN_RE
from ..functions.tokenizer import tokens_sql_col

# Tiny fixed stopword inventories for the n-gram/stopword language
# heuristic. Deliberately minimal — the operator contract is the
# deterministic voting scheme, not linguistic coverage.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

FP_MOD = 1_000_000_007
FP_BASE = 131
FP_POWS = [pow(FP_BASE, j, FP_MOD) for j in range(32)]


def _count_in_set(toks, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, pred_lang, vote_en, vote_de, vote_es, vote_fr).

    Stopword-vote argmax; ties and zero votes resolve to the first
    language in fixed (en, de, es, fr) order — deterministic.
    """
    toks = tokens_sql_col(text_col)
    out = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    for lang, words in LANG_STOPWORDS.items():
        out = out.withColumn(f"vote_{lang}", _count_in_set(F.col("toks"), words).cast("long"))
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"vote_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"vote_{lg}") == best, F.lit(lg)).otherwise(pred)
    return out.withColumn("pred_lang", pred).drop("toks")


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, n_tokens, stopword_ratio, punct_ratio, mean_token_len,
    quality) — length/punctuation/stopword heuristics, rounded to 6.

    quality = 0.4*min(n_tokens/100, 1) + 0.3*(1 - punct_ratio)
            + 0.2*min(4*stopword_ratio, 1) + 0.1*min(mean_token_len/8, 1)
    """
    toks = tokens_sql_col(text_col)
    text = F.col(text_col)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("double")
    n_punct = (
        n_chars
        - F.length(F.regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    )
    stop = _count_in_set(toks, LANG_STOPWORDS["en"]).cast("double")
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.when(n_tokens > 0, stop / n_tokens).otherwise(F.lit(0.0)), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(F.lit(0.0)), 6
        ).alias("mean_token_len"),
    )
    quality = (
        0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.col("punct_ratio"))
        + 0.2 * F.least(4.0 * F.col("stopword_ratio"), F.lit(1.0))
        + 0.1 * F.least(F.col("mean_token_len") / 8.0, F.lit(1.0))
    )
    return out.withColumn("quality", F.round(quality, 6))


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, n_ws, n_regex, n_bpe_ish): whitespace-split count,
    reference-regex count, BPE-ish pre-tokenizer count."""
    text = F.col(text_col)
    ws = F.size(
        F.filter(F.split(F.trim(text), "\\s+"), lambda t: F.length(t) > 0)
    ).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("n_ws"),
        F.size(tokens_sql_col(text_col)).cast("long").alias("n_regex"),
        F.size(
            F.regexp_extract_all(text, F.lit(f"({BPE_ISH_RE})"), 1)
        ).cast("long").alias("n_bpe_ish"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, fingerprint) — position-weighted rolling hash.

    fp = Σ_i h(tok_i) * 131^(i mod 32) mod (1e9+7), h = md5-derived int.
    Order-sensitive (reordered tokens change fp) yet engine-portable:
    the 32 modular powers are baked in as an array literal.
    """
    pows = F.array(*[F.lit(p) for p in FP_POWS])
    # posexplode_outer + not-null filter: the non-outer generate gets an
    # inferred size(...)>0 filter pushed below it, doubling the regex
    # evaluation (guide §4.4); output identical — empty docs drop either way
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(tokens_sql_col(text_col)).alias("i", "tok"),
    ).filter(F.col("tok").isNotNull()).select(
        "doc_id",
        (
            (F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long") % FP_MOD)
            * F.element_at(pows, (F.col("i") % 32 + 1).cast("int"))
            % FP_MOD
        ).alias("contrib"),
    )
    return exploded.groupBy("doc_id").agg(
        (F.sum("contrib") % FP_MOD).cast("long").alias("fingerprint")
    )
