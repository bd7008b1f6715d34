"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

The engine's primary input table per BASELINE.json `input_hint`:
(repo string, path string, commit string, lang string, content string).
Seed-fixed; no external data. Designed to exercise:

  (a) hot/stopword-like tokens (`the`, `i`, `0`, `import`) for skew;
  (b) tokenizer edge cases: `u.s.`, `3.14`, `foo-bar`, HTML entities
      (`&amp;`), mixed case (reference regex: HW2/engine/parser.py:78);
  (c) zero-token rows (punctuation-only content) pinning the N/avgdl
      semantics of HW2/engine/build_runs_mp.py:89-91;
  (d) duplicate content across rows for sha256-invariant + dedup ops;
  (e) reference-query vocabulary (`manhattan project`, `communication
      policy`, `u.s policy`, `3.14 math`, ...) so the reference query set
      (HW2/engine/searcher.py:254-262) returns non-empty results.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

LANGS = ["python", "java", "go", "rust", "javascript", "c"]

# Zipf-ish vocabulary: hot code tokens first, then reference-query words,
# then a long tail.
HOT = ["the", "i", "0", "1", "import", "def", "return", "if", "for", "self", "x"]
QUERY_WORDS = [
    "manhattan", "project", "bomb", "communication", "policy", "overturned",
    "carriage", "u.s.", "3.14", "math", "machine", "learning", "archie",
    "moore", "bash", "ali", "foo-bar",
]
TAIL = [f"sym{j}" for j in range(400)] + [
    "parse", "token", "index", "merge", "shard", "query", "score", "block",
    "heap", "buffer", "stream", "codec", "varbyte", "lexicon", "posting",
    "cursor", "spark", "shuffle", "partition", "&amp;", "Mixed", "CASE",
]
VOCAB = HOT + QUERY_WORDS + TAIL
# Zipf-like weights over the vocabulary.
WEIGHTS = [1.0 / (r + 1) ** 0.9 for r in range(len(VOCAB))]


def generate_corpus_pdf(n_docs: int = 400, seed: int = 42) -> pd.DataFrame:
    """Deterministic pandas corpus; columns (repo, path, commit, lang, content)."""
    rng = random.Random(seed)
    rows = []
    dup_content = "def duplicate_content(): return 42  # the the import policy\n"
    for i in range(n_docs):
        repo = f"org{i % 7}/project-{i % 13}"
        path = f"src/module_{i:05d}.{rng.choice(['py', 'java', 'go', 'rs', 'js', 'c'])}"
        commit = hashlib.sha1(f"{seed}:{repo}:{path}".encode()).hexdigest()
        lang = LANGS[i % len(LANGS)]
        kind = i % 23
        if kind == 7:
            content = " \t\n!!! ??? ***"  # zero-token row (regex finds nothing)
        elif kind == 11:
            content = dup_content  # exact duplicate rows
        else:
            n_lines = rng.randint(2, 12)
            lines = []
            for _ in range(n_lines):
                n_words = rng.randint(3, 14)
                words = rng.choices(VOCAB, weights=WEIGHTS, k=n_words)
                lines.append(" ".join(words))
            content = "\n".join(lines)
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_corpus_pdf_fast(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Vectorized (numpy) variant for LARGE corpora (benchmarks).

    Deterministic for a given (n_docs, seed) but a DIFFERENT corpus than
    generate_corpus_pdf — correctness tests keep the scalar generator,
    benchmarks use this one (millions of docs in seconds).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    probs = np.array(WEIGHTS) / sum(WEIGHTS)
    words_per_doc = rng.integers(20, 90, size=n_docs)
    total_words = int(words_per_doc.sum())
    flat = rng.choice(len(vocab), size=total_words, p=probs)
    # per-doc joins via offsets over one big python-free word array
    joined = vocab[flat]
    offsets = np.concatenate(([0], np.cumsum(words_per_doc)))
    contents = np.empty(n_docs, dtype=object)
    big = "\n".join(
        " ".join(joined[offsets[i] : offsets[i + 1]]) for i in range(n_docs)
    ).split("\n")
    for i in range(n_docs):
        contents[i] = big[i]
    idx = np.arange(n_docs)
    return pd.DataFrame(
        {
            "repo": [f"org{i % 7}/project-{i % 13}" for i in idx],
            "path": [f"src/module_{i:07d}.py" for i in idx],
            "commit": [f"{i:040x}" for i in idx],
            "lang": [LANGS[i % len(LANGS)] for i in idx],
            "content": contents,
        }
    )


def corpus_df(spark, n_docs: int = 400, seed: int = 42):
    """Spark DataFrame of the synthetic corpus (5-column input_hint shape)."""
    pdf = generate_corpus_pdf(n_docs, seed)
    return spark.createDataFrame(pdf)


def read_tsv_corpus(spark, path: str):
    """The reference's corpus file format as a source (S1): one document
    per line, text = LAST tab-separated column, blank lines consume a
    docid but produce no document (HW2/engine/build_runs_mp.py:60-90).

    -> input_hint shape (repo, path, commit, lang, content) with
    path = zero-padded line number, so the engine's dense-rank doc ids
    preserve the reference's line ORDER exactly (ids are the gap-free
    relabeling of the reference's line-number ids; BM25 rank identity
    only needs the order, which tie-breaks on docid asc).

    Line numbering needs per-file positional indices — the one legitimate
    RDD use in the engine (zipWithIndex respects text-split order).
    """
    from pyspark.sql import functions as F

    numbered = (
        spark.read.text(path)
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
        .filter(lambda t: t[0].strip() != "")
        .map(lambda t: (int(t[1]), t[0].split("\t")[-1]))
    )
    df = spark.createDataFrame(numbered, "line_no long, content string")
    return df.select(
        F.lit("tsv").alias("repo"),
        F.format_string("%012d", F.col("line_no")).alias("path"),
        F.lit("").alias("commit"),
        F.lit("").alias("lang"),
        F.col("content"),
    )


def read_jsonl_corpus(spark, path: str, text_field: str = "text",
                      id_field: str | None = None):
    """JSON-lines corpus -> input_hint shape. ``id_field`` (if given)
    becomes the natural key; otherwise a TSV-style line order key is
    derived the same way as read_tsv_corpus."""
    from pyspark.sql import functions as F

    df = spark.read.json(path)
    if id_field is not None:
        return df.select(
            F.lit("jsonl").alias("repo"),
            F.col(id_field).cast("string").alias("path"),
            F.lit("").alias("commit"),
            F.lit("").alias("lang"),
            F.col(text_field).cast("string").alias("content"),
        )
    numbered = (
        spark.read.text(path)
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
        .filter(lambda t: t[0].strip() != "")
        .map(lambda t: (int(t[1]), t[0]))
    )
    import json as _json

    rows = numbered.map(
        lambda t: (t[0], str(_json.loads(t[1]).get(text_field, "")))
    )
    df2 = spark.createDataFrame(rows, "line_no long, content string")
    return df2.select(
        F.lit("jsonl").alias("repo"),
        F.format_string("%012d", F.col("line_no")).alias("path"),
        F.lit("").alias("commit"),
        F.lit("").alias("lang"),
        F.col("content"),
    )


def corpus_docs(n_docs: int = 400, seed: int = 42) -> list[tuple[int, str]]:
    """(doc_id, content) with doc_id = dense rank over (repo, path) —
    the oracle-side mirror of operators.postings.assign_doc_ids."""
    pdf = generate_corpus_pdf(n_docs, seed)
    pdf = pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    return list(zip(range(len(pdf)), pdf["content"]))
