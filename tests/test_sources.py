"""Corpus source readers: the reference's TSV line format and JSONL."""

import json

from web_search_engine_spark.plans.build_index import build_index
from web_search_engine_spark.plans.search import SearchEngine
from web_search_engine_spark.sources.corpus import read_jsonl_corpus, read_tsv_corpus


def test_tsv_corpus_reference_semantics(spark, tmp_path):
    """Last tab column is the text; blank lines vanish (consume a line
    number but yield no doc); zero-token non-blank lines stay as dl=0
    docs — HW2/engine/build_runs_mp.py:60-90 semantics."""
    p = tmp_path / "collection.tsv"
    p.write_text(
        "0\tfirst doc about manhattan project\n"
        "\n"  # blank: no document
        "2\tmeta\tlast column wins here\n"
        "3\t!!! ???\n"  # tokenizes to nothing -> dl=0 doc
        "4\tmanhattan again\n"
    )
    src = read_tsv_corpus(spark, str(p))
    rows = {r["path"]: r["content"] for r in src.collect()}
    assert len(rows) == 4  # blank line dropped
    assert rows["000000000002"] == "last column wins here"

    idx = str(tmp_path / "idx")
    build_index(spark, src, idx, num_shards=2, tokenizer="sql")
    eng = SearchEngine(idx)
    assert eng.n_docs == 4  # dl=0 doc counted, blank line not
    hits = eng.search("manhattan", "OR", 10)
    # line order is preserved by the dense-rank relabeling: the two
    # manhattan docs are lines 0 and 4 -> dense ids 0 and 3
    assert sorted(d for d, _ in hits) == [0, 3]


def test_jsonl_corpus(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    docs = [
        {"id": "a", "text": "spark shuffle partition"},
        {"id": "b", "text": "manhattan project"},
    ]
    p.write_text("\n".join(json.dumps(d) for d in docs) + "\n")

    by_id = read_jsonl_corpus(spark, str(p), text_field="text", id_field="id")
    assert {r["path"]: r["content"] for r in by_id.collect()} == {
        "a": "spark shuffle partition",
        "b": "manhattan project",
    }

    by_line = read_jsonl_corpus(spark, str(p), text_field="text")
    assert [r["content"] for r in by_line.orderBy("path").collect()] == [
        "spark shuffle partition",
        "manhattan project",
    ]


def test_readers_are_jvm_side(spark, tmp_path):
    """VERDICT r2 'What's wrong #1': the corpus readers must not run the
    corpus through per-row Python — no RDD scan, no Python eval node."""
    t = tmp_path / "c.tsv"
    t.write_text("0\talpha beta\n1\tgamma\n")
    j = tmp_path / "c.jsonl"
    j.write_text('{"text": "alpha"}\n{"text": "beta"}\n')
    for df in (
        read_tsv_corpus(spark, str(t)),
        read_jsonl_corpus(spark, str(j)),
        read_jsonl_corpus(spark, str(j), id_field=None),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for bad in ("ExistingRDD", "PythonRDD", "BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan, (bad, plan[:2000])


def test_tsv_multi_file_line_order(spark, tmp_path):
    """Glob input: per-file line numbering, files distinguished by repo;
    dense-rank doc order = (file, line) order."""
    (tmp_path / "a.tsv").write_text("0\tdoc a zero\n1\tdoc a one\n")
    (tmp_path / "b.tsv").write_text("0\tdoc b zero\n")
    src = read_tsv_corpus(spark, str(tmp_path / "*.tsv"))
    rows = {(r["repo"], r["path"]): r["content"] for r in src.collect()}
    assert rows == {
        ("tsv:a.tsv", "000000000000"): "doc a zero",
        ("tsv:a.tsv", "000000000001"): "doc a one",
        ("tsv:b.tsv", "000000000000"): "doc b zero",
    }


def test_single_big_file_split_parallel(spark, tmp_path):
    """VERDICT r3 #2: the reference's production input is ONE big
    collection.tsv — line numbering must parallelize across its splits,
    not funnel every line through a single per-file window task. Force
    many splits with a tiny maxPartitionBytes and assert (a) exact line
    parity, (b) the scan really produced multiple splits, (c) no Window
    node (the old one-task shuffle) in the plan."""
    from pyspark.sql import functions as F

    p = tmp_path / "collection.tsv"
    lines = [f"{i}\tdoc number {i} body {'x' * (i % 37)}" for i in range(500)]
    lines[123] = ""  # blank line: consumes a line number, yields no doc
    p.write_text("\n".join(lines) + "\n")

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        n_splits = (
            spark.read.text(str(p))
            .select(F.col("_metadata.file_block_start").alias("b"))
            .distinct()
            .count()
        )
        assert n_splits > 10, n_splits  # the file genuinely split

        src = read_tsv_corpus(spark, str(p))
        plan = src._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan[:2000]
        got = {r["path"]: r["content"] for r in src.collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)

    want = {
        f"{i:012d}": line.split("\t")[-1]
        for i, line in enumerate(lines)
        if line.strip()
    }
    assert got == want


def test_reader_cross_scan_guard(spark, tmp_path, monkeypatch):
    """ADVICE r4: the line-number offsets come from a FIRST scan and are
    joined onto a SECOND scan of the same source — WSE_READER_CHECK=1
    re-verifies the end result (dense per-file 0..rows-1 numbering) on
    the joined output. Run it over both a multi-file glob and a
    many-split single file; guard must pass silently on a healthy
    Spark."""
    monkeypatch.setenv("WSE_READER_CHECK", "1")
    (tmp_path / "a.tsv").write_text(
        "\n".join(f"{i}\tdoc a {i}" for i in range(40)) + "\n"
    )
    (tmp_path / "b.tsv").write_text(
        "\n".join(f"{i}\tdoc b {i}" for i in range(25)) + "\n"
    )
    assert read_tsv_corpus(spark, str(tmp_path / "*.tsv")).count() == 65

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        big = tmp_path / "big.tsv"
        big.write_text(
            "\n".join(f"{i}\tdoc {i} {'y' * (i % 23)}" for i in range(300)) + "\n"
        )
        assert read_tsv_corpus(spark, str(big)).count() == 300
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_read_source_table_dispatch(spark, tmp_path):
    """One resolver for the north rule's source surface: Iceberg table
    id (clear error without the runtime), parquet dir, TSV, JSONL."""
    import pytest

    from web_search_engine_spark.sources.corpus import read_source_table

    t = tmp_path / "c.tsv"
    t.write_text("0\talpha beta\n")
    assert read_source_table(spark, str(t)).count() == 1

    pq = str(tmp_path / "pq")
    spark.createDataFrame(
        [("r", "p", "c", "l", "alpha")],
        "repo string, path string, commit string, lang string, content string",
    ).write.parquet(pq)
    assert read_source_table(spark, pq).count() == 1

    j = tmp_path / "c.jsonl"
    j.write_text('{"text": "alpha"}\n')
    assert read_source_table(spark, str(j)).count() == 1

    with pytest.raises(RuntimeError, match="Iceberg"):
        read_source_table(spark, "catalog.db.tbl")


def test_read_source_table_bare_relative_dir(spark, tmp_path, monkeypatch):
    """A slash-free ref that exists on disk is a relative parquet path,
    not an Iceberg table id (ADVICE r3)."""
    from web_search_engine_spark.sources.corpus import read_source_table

    spark.createDataFrame(
        [("r", "p", "c", "l", "alpha")],
        "repo string, path string, commit string, lang string, content string",
    ).write.parquet(str(tmp_path / "corpus"))
    monkeypatch.chdir(tmp_path)
    assert read_source_table(spark, "corpus").count() == 1
