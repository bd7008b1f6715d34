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
import os
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


def _numbered_lines(spark, path: str):
    """Per-file 0-based line numbers for a text source, fully JVM-side
    (no RDD, no per-row Python — at 100 TB the reader IS the job) and
    SPLIT-parallel (no per-file window: the reference's production input
    is ONE 8.84M-line collection.tsv — `Window.partitionBy(file)` would
    funnel the whole corpus through a single task; VERDICT r3 #2).

    Same offsets technique as assign_doc_ids_counted
    (operators/postings.py): (1) aggregate per-(file, split) row counts
    — one row per ~128MB split, tiny even at 100 TB; (2) cumsum the
    counts driver-side in (file, split byte offset) order; (3)
    broadcast-join the offsets back and add the row's rank within its
    split. Split identity/order is the EXPLICIT byte offset
    `_metadata.file_block_start` (not the scan's split-packing order —
    ADVICE r3), so per-file order is ascending (block_start, position)
    == ascending byte offset by the text reader's line-ownership rule
    (a line belongs to the split where it begins).

    Rank-within-split = mid - min(mid): a split's rows are contiguous
    in one scan partition in byte order, so their
    ``monotonically_increasing_id`` values are consecutive — asserted
    at runtime per split (max-min == count-1). The offsets aggregation
    and the output projection scan the source twice; both plan the same
    deterministic split packing (the same property task retries rely
    on), so mid values agree across the two scans.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    base = spark.read.text(path).select(
        F.input_file_name().alias("file"),
        F.col("_metadata.file_block_start").alias("_bstart"),
        F.monotonically_increasing_id().alias("mid"),
        "value",
    )
    stats = sorted(
        base.groupBy("file", "_bstart")
        .agg(F.count("*").alias("cnt"), F.min("mid").alias("mid0"),
             F.max("mid").alias("mid1"))
        .collect(),
        key=lambda r: (r["file"], r["_bstart"]),
    )
    offs, acc, cur = [], 0, None
    for r in stats:
        if r["mid1"] - r["mid0"] != r["cnt"] - 1:
            raise RuntimeError(
                "non-contiguous row ids within a file split "
                f"({r['file']} @ {r['_bstart']}): the reader's "
                "rank-within-split invariant does not hold on this Spark"
            )
        if r["file"] != cur:
            cur, acc = r["file"], 0
        offs.append((r["file"], r["_bstart"], r["mid0"], acc))
        acc += r["cnt"]
    # pandas -> Arrow LocalRelation (a list-backed createDataFrame would
    # plan as Scan ExistingRDD and respawn Python workers per reuse)
    off_df = spark.createDataFrame(
        pd.DataFrame(offs, columns=["file", "_bstart", "_mid0", "_offset"]),
        "file string, _bstart long, _mid0 long, _offset long",
    )
    out = (
        base.join(F.broadcast(off_df), ["file", "_bstart"])
        .withColumn(
            "line_no", F.col("_offset") + (F.col("mid") - F.col("_mid0"))
        )
        .drop("_bstart", "_mid0", "_offset")
    )
    if os.environ.get("WSE_READER_CHECK") == "1":
        # cross-scan guard (ADVICE r4): the contiguity assert above only
        # validates the FIRST scan; the output projection is a second
        # scan of the source, and line_no is only right if both scans
        # assigned the same mid per (file, _bstart) split. Verify the
        # end result per file — a dense 0..rows-1 numbering — instead of
        # trusting the packing. Costs one extra aggregation over the
        # output scan, so it's opt-in (tests enable it; production runs
        # can too when a Spark upgrade changes scan planning).
        bad = (
            out.groupBy("file")
            .agg(
                F.count("*").alias("cnt"),
                F.min("line_no").alias("lo"),
                F.max("line_no").alias("hi"),
                F.countDistinct("line_no").alias("uniq"),
            )
            .filter(
                (F.col("lo") != 0)
                | (F.col("hi") != F.col("cnt") - 1)
                | (F.col("uniq") != F.col("cnt"))
            )
            .collect()
        )
        if bad:
            raise RuntimeError(
                "line_no numbering is not dense per file — the two "
                f"source scans packed splits differently: {bad[:3]}"
            )
    return out


def read_tsv_corpus(spark, path: str):
    """The reference's corpus file format as a source (S1): one document
    per line, text = LAST tab-separated column, blank lines consume a
    docid but produce no document (HW2/engine/build_runs_mp.py:60-90).

    -> input_hint shape (repo, path, commit, lang, content) with
    path = zero-padded line number and repo = the source file name, so
    the engine's dense-rank doc ids preserve the reference's line ORDER
    exactly (ids are the gap-free relabeling of the reference's
    line-number ids; BM25 rank identity only needs the order, which
    tie-breaks on docid asc).

    Entirely JVM-side: line numbering via per-file row_number (see
    _numbered_lines), last-column extraction via element_at(split(...)).
    """
    from pyspark.sql import functions as F

    return (
        _numbered_lines(spark, path)
        .filter(F.trim("value") != "")  # blank lines consumed a line_no
        .select(
            F.concat(
                F.lit("tsv:"), F.element_at(F.split("file", "/"), -1)
            ).alias("repo"),
            F.format_string("%012d", F.col("line_no")).alias("path"),
            F.lit("").alias("commit"),
            F.lit("").alias("lang"),
            F.element_at(F.split("value", "\t"), -1).alias("content"),
        )
    )


def read_jsonl_corpus(spark, path: str, text_field: str = "text",
                      id_field: str | None = None):
    """JSON-lines corpus -> input_hint shape, fully JVM-side.
    ``id_field`` (if given) becomes the natural key via the JSON reader;
    otherwise a TSV-style line-order key is derived the same way as
    read_tsv_corpus, with the text field pulled by get_json_object."""
    from pyspark.sql import functions as F

    if id_field is not None:
        df = spark.read.json(path)
        return df.select(
            F.lit("jsonl").alias("repo"),
            F.col(id_field).cast("string").alias("path"),
            F.lit("").alias("commit"),
            F.lit("").alias("lang"),
            F.col(text_field).cast("string").alias("content"),
        )
    return (
        _numbered_lines(spark, path)
        .filter(F.trim("value") != "")
        .select(
            F.concat(
                F.lit("jsonl:"), F.element_at(F.split("file", "/"), -1)
            ).alias("repo"),
            F.format_string("%012d", F.col("line_no")).alias("path"),
            F.lit("").alias("commit"),
            F.lit("").alias("lang"),
            F.coalesce(
                F.get_json_object("value", f"$['{text_field}']"), F.lit("")
            ).alias("content"),
        )
    )


def read_source_table(spark, ref: str, fmt: str | None = None):
    """Primary corpus source resolver (north rule: 'over Iceberg tables
    of source-code repositories', input_hint columns (repo, path,
    commit, lang, content)).

    ``ref`` is one of:
      - an Iceberg table identifier (``catalog.db.table`` — no slash):
        read via the Iceberg DataSource V2 connector when its runtime
        is on the classpath (on a real cluster: snapshot isolation,
        partition pruning, metadata-only planning). The sandbox ships
        no Iceberg jars, so this branch raises a clear error here —
        parquet below exercises the same columnar-scan plan shape
        (both are DSv2 scans with min/max pruning + column pruning).
      - a ``.tsv`` path/glob  -> read_tsv_corpus (reference format)
      - a ``.jsonl`` path/glob -> read_jsonl_corpus
      - anything else          -> parquet directory/path.
    ``fmt`` overrides the extension sniffing ("iceberg" | "tsv" |
    "jsonl" | "parquet").
    """
    import os

    kind = fmt
    if kind is None:
        # a slash-free ref that exists locally is a relative path, not an
        # Iceberg table id (ADVICE r3: 'corpus' must read parquet, not
        # error with 'Iceberg runtime missing')
        if (
            "/" not in ref
            and not ref.endswith((".parquet", ".tsv", ".jsonl"))
            and not os.path.exists(ref)
        ):
            kind = "iceberg"
        elif ref.endswith(".tsv") or ".tsv" in ref.rsplit("/", 1)[-1]:
            kind = "tsv"
        elif ref.endswith(".jsonl") or ".jsonl" in ref.rsplit("/", 1)[-1]:
            kind = "jsonl"
        else:
            kind = "parquet"
    if kind == "iceberg":
        try:
            return spark.read.format("iceberg").load(ref)
        except Exception as ex:
            raise RuntimeError(
                f"cannot read Iceberg table '{ref}': the Iceberg Spark "
                "runtime is not on the classpath (add "
                "org.apache.iceberg:iceberg-spark-runtime and a catalog "
                "conf); use a parquet path in environments without it"
            ) from ex
    if kind == "tsv":
        return read_tsv_corpus(spark, ref)
    if kind == "jsonl":
        return read_jsonl_corpus(spark, ref)
    if os.path.exists(ref):
        # the JVM resolves relative paths against ITS startup cwd, which
        # need not match the Python process's current cwd
        ref = os.path.abspath(ref)
    return spark.read.parquet(ref)


def corpus_docs(n_docs: int = 400, seed: int = 42) -> list[tuple[int, str]]:
    """(doc_id, content) with doc_id = dense rank over (repo, path) —
    the oracle-side mirror of operators.postings.assign_doc_ids."""
    pdf = generate_corpus_pdf(n_docs, seed)
    pdf = pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    return list(zip(range(len(pdf)), pdf["content"]))
