"""Milestone 2: physical block index — invariants, byte-compat, resume,
and rank-identity across all four query paths."""

import math
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.oracle import OracleIndex
from web_search_engine_spark.operators.blocks import (
    blocks_to_postings,
    build_block_index,
    lexicon_from_blocks,
)
from web_search_engine_spark.operators.postings import (
    assign_doc_ids,
    build_postings,
    with_tokens,
)
from web_search_engine_spark.plans.build_index import build_index
from web_search_engine_spark.plans.query import score_queries
from web_search_engine_spark.plans.search import SearchEngine, batch_score
from web_search_engine_spark.sources.corpus import corpus_df, corpus_docs

QUERIES = [
    ("q2", "communication policy"),
    ("q3", "manhattan project"),
    ("q4", "manhattan project bomb"),
    ("q5", "u.s policy"),
    ("q6", "3.14 math"),
    ("q8", "machine learning"),
    ("q9", "communication"),
    ("q10", "the the import"),
]


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    src = corpus_df(spark, n_docs=400, seed=42)
    build_index(spark, src, d, codec="varbyte", block_size=16, num_shards=4)
    return d


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_docs(400, 42))


def _reference_spec_blocks(postings_by_term, block_size=16):
    """Scalar writer implementing the published reference block format
    (HW2/engine/listio.py:44-79) — an independent second implementation
    used to pin byte-compatibility of the Spark-built payloads."""

    def vb(x):
        out = bytearray()
        while True:
            byte = x & 0x7F
            x >>= 7
            if x == 0:
                out.append(byte | 0x80)
                return bytes(out)
            out.append(byte)

    result = {}
    for term, postings in postings_by_term.items():
        items = sorted(postings.items())
        blocks = []
        prev_last = 0
        for i in range(0, len(items), block_size):
            chunk = items[i : i + block_size]
            docids = [d for d, _ in chunk]
            freqs = [f for _, f in chunk]
            doc_bytes = bytearray()
            prev = prev_last
            for d in docids:
                doc_bytes += vb(d - prev)
                prev = d
            freq_bytes = b"".join(vb(f) for f in freqs)
            blocks.append((docids[-1], bytes(doc_bytes), freq_bytes))
            prev_last = docids[-1]
        result[term] = blocks
    return result


def test_block_invariants(spark, index_dir, oracle):
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    rows = blocks.collect()
    by_term_shard = {}
    for r in rows:
        assert 1 <= r["n"] <= 16
        assert r["max_tf"] >= 1
        by_term_shard.setdefault((r["term"], r["shard"]), []).append(r)
    for (term, _shard), rs in by_term_shard.items():
        rs.sort(key=lambda r: r["block_id"])
        assert [r["block_id"] for r in rs] == list(range(len(rs)))
        lasts = [r["last_docid"] for r in rs]
        assert lasts == sorted(lasts)
        # base chain: block 0 base 0, then previous last_docid
        assert rs[0]["base_docid"] == 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur["base_docid"] == prev["last_docid"]
    # sum(n) over blocks == df
    lex = {r["term"]: r["df"] for r in lexicon_from_blocks(blocks).collect()}
    assert lex == oracle.df


def test_byte_compat_single_shard(spark, oracle):
    """num_shards=1 payloads are byte-identical to the reference format."""
    src = assign_doc_ids(corpus_df(spark, n_docs=400, seed=42), ["repo", "path"])
    postings = build_postings(with_tokens(src, "content"))
    blocks = build_block_index(postings, block_size=16, codec="varbyte", shard_size=None)
    got = {}
    for r in blocks.collect():
        got.setdefault(r["term"], []).append(r)
    want = _reference_spec_blocks(oracle.index, block_size=16)
    assert set(got) == set(want)
    for term, wblocks in want.items():
        grs = sorted(got[term], key=lambda r: r["block_id"])
        assert len(grs) == len(wblocks), term
        for gr, (wlast, wdoc, wfreq) in zip(grs, wblocks):
            assert gr["last_docid"] == wlast, term
            assert bytes(gr["doc_bytes"]) == wdoc, term
            assert bytes(gr["freq_bytes"]) == wfreq, term


def test_index_tables_consistent(spark, index_dir, oracle):
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    decoded = blocks_to_postings(blocks, codec="varbyte")
    got = {}
    for r in decoded.collect():
        got.setdefault(r["term"], {})[r["doc_id"]] = r["tf"]
    assert got == dict(oracle.index)
    # doc_stats == oracle doc_lengths; dl == sum(tf)
    ds = {r["doc_id"]: r["dl"] for r in
          spark.read.parquet(os.path.join(index_dir, "docs_meta")).select("doc_id", "dl").collect()}
    assert ds == oracle.doc_lengths
    from_postings = {
        r["doc_id"]: r["dl"]
        for r in decoded.groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()
    }
    nonzero = {d: l for d, l in oracle.doc_lengths.items() if l > 0}
    assert from_postings == nonzero


def test_sequential_writes_match_overlapped(
    spark, index_dir, tmp_path, monkeypatch
):
    """WSE_OVERLAP_WRITES=0 (the A/B knob for the guide-§2.6 overlapped
    writes) must produce the identical index in the tokenize-derived-dl
    shape — regression: docs_meta was only defined inside the overlap
    branch, so the sequential path crashed with UnboundLocalError."""
    monkeypatch.setenv("WSE_OVERLAP_WRITES", "0")
    d = str(tmp_path / "seq_index")
    src = corpus_df(spark, n_docs=400, seed=42)
    build_index(spark, src, d, codec="varbyte", block_size=16, num_shards=4)

    def table(root, name, cols):
        return sorted(
            tuple(r[c] for c in cols)
            for r in spark.read.parquet(os.path.join(root, name))
            .select(*cols).collect()
        )

    meta_cols = ["doc_id", "dl", "content_sha256"]
    assert table(d, "docs_meta", meta_cols) == table(
        index_dir, "docs_meta", meta_cols
    )
    blk_cols = ["term", "block_id", "last_docid", "doc_bytes", "freq_bytes"]
    assert table(d, "blocks", blk_cols) == table(index_dir, "blocks", blk_cols)


def test_sha256_invariant_in_doc_map(spark, index_dir):
    src = assign_doc_ids(corpus_df(spark, n_docs=400, seed=42), ["repo", "path"])
    want = {r["doc_id"]: r["h"] for r in
            src.select("doc_id", F.sha2("content", 256).alias("h")).collect()}
    got = {r["doc_id"]: r["content_sha256"] for r in
           spark.read.parquet(os.path.join(index_dir, "docs_meta")).collect()}
    assert got == want


@pytest.mark.parametrize("mode", ["OR", "AND"])
def test_rank_identity_all_paths(spark, index_dir, oracle, mode):
    """oracle == SearchEngine(WAND) == SearchEngine(unpruned) ==
    distributed batch_score over the index."""
    eng = SearchEngine(index_dir)
    from web_search_engine_spark.sources.catalog import IndexCatalog

    cat = IndexCatalog(spark, index_dir)
    batch = batch_score(cat, QUERIES, mode=mode, topk=10)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))

    for qid, query in QUERIES:
        want = oracle.search(query, mode=mode, topk=10)
        wand = eng.search(query, mode=mode, topk=10, use_wand=True)
        plain = eng.search(query, mode=mode, topk=10, use_wand=False)
        dist = [(d, s) for _, d, s in sorted(by_q.get(qid, []))]
        for name, got in [("wand", wand), ("plain", plain), ("batch", dist)]:
            assert len(got) == len(want), (qid, name, len(got), len(want))
            for (gd, gs), (od, os_) in zip(got, want):
                assert gd == od, (qid, name, mode, gd, od)
                assert math.isclose(gs, os_, rel_tol=1e-9), (qid, name, gd)


def test_wand_matches_unpruned_on_random_queries(index_dir, oracle):
    """bench_search.py pattern: random 2-term queries sampled from the
    lexicon (seed 1234) — WAND must equal unpruned exactly."""
    import random

    eng = SearchEngine(index_dir)
    rng = random.Random(1234)
    vocab = sorted(oracle.index)
    for _ in range(60):
        q = f"{rng.choice(vocab)} {rng.choice(vocab)}"
        a = eng.search(q, mode="OR", topk=10, use_wand=True)
        b = eng.search(q, mode="OR", topk=10, use_wand=False)
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (_, sa), (_, sb) in zip(a, b):
            assert math.isclose(sa, sb, rel_tol=1e-12), q


def test_resume_produces_identical_index(spark, tmp_path):
    """Kill-and-resume: shards built in two attempts equal a clean build."""
    src = corpus_df(spark, n_docs=400, seed=42)
    clean_dir = str(tmp_path / "clean")
    build_index(spark, src, clean_dir, block_size=16, num_shards=4)

    resumed_dir = str(tmp_path / "resumed")
    # attempt 1: only shards {0, 1} (simulate a kill by restricting input)
    docs = assign_doc_ids(src, ["repo", "path"])
    n_docs = docs.count()
    shard_size = -(-n_docs // 4)
    partial = docs.filter((F.col("doc_id") / shard_size).cast("int") < 2).drop("doc_id")
    build_index(spark, partial, resumed_dir, block_size=16, num_shards=2)
    # the partial build wrote shards 0-1 and its manifest rows; attempt 2
    # resumes over the FULL source and must only build shards 2-3
    build_index(spark, src, resumed_dir, block_size=16, num_shards=4)

    for sub in ["blocks", "docs_meta"]:
        a = spark.read.parquet(os.path.join(clean_dir, sub))
        b = spark.read.parquet(os.path.join(resumed_dir, sub))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, sub
    manifest = spark.read.parquet(os.path.join(resumed_dir, "manifest"))
    assert {r["shard"] for r in manifest.collect()} == {0, 1, 2, 3}


def test_resume_config_mismatch_fails_fast(spark, tmp_path):
    """Resuming with a different codec/block_size would silently mix
    incompatible shards in one index — must raise instead."""
    from web_search_engine_spark.plans.build_index import build_index

    d = str(tmp_path / "idx")
    src = corpus_df(spark, n_docs=60, seed=42)
    build_index(spark, src, d, codec="varbyte", block_size=16, num_shards=2)
    with pytest.raises(ValueError, match="resume config mismatch"):
        build_index(spark, src, d, codec="raw", block_size=16, num_shards=2)
    with pytest.raises(ValueError, match="resume config mismatch"):
        build_index(spark, src, d, codec="varbyte", block_size=32, num_shards=2)


def test_empty_source_builds_clean_empty_index(spark, tmp_path):
    from web_search_engine_spark.plans.build_index import build_index
    from web_search_engine_spark.plans.search import SearchEngine

    d = str(tmp_path / "idx")
    src = corpus_df(spark, n_docs=50, seed=42).filter("1 = 0")
    cat = build_index(spark, src, d, num_shards=2)
    assert cat.n_docs == 0
    assert cat.blocks().count() == 0
    assert cat.lexicon().count() == 0
    eng = SearchEngine(d)
    assert eng.search("anything at all") == []


def test_manifest_metrics_match_tables(spark, tmp_path):
    """Per-shard manifest rows ride the writes as Observation metrics —
    they must equal what a direct aggregation of the written tables
    says (guards the conditional-agg expressions)."""
    import os

    from pyspark.sql import functions as F

    from web_search_engine_spark.plans.build_index import build_index

    d = str(tmp_path / "idx")
    build_index(spark, corpus_df(spark, n_docs=200, seed=42), d, num_shards=3)

    man = {
        int(r["shard"]): (int(r["n_docs"]), int(r["sum_dl"]),
                          int(r["n_postings"]), int(r["n_blocks"]))
        for r in spark.read.parquet(os.path.join(d, "manifest")).collect()
    }
    meta = {
        int(r["shard"]): (int(r["nd"]), int(r["sdl"]))
        for r in spark.read.parquet(os.path.join(d, "docs_meta"))
        .groupBy("shard").agg(F.count("*").alias("nd"), F.sum("dl").alias("sdl"))
        .collect()
    }
    blk = {
        int(r["shard"]): (int(r["np"]), int(r["nb"]))
        for r in spark.read.parquet(os.path.join(d, "blocks"))
        .groupBy("shard").agg(F.sum("n").alias("np"), F.count("*").alias("nb"))
        .collect()
    }
    assert set(man) == set(meta) == set(blk)
    for s, (nd, sdl, np_, nb) in man.items():
        assert (nd, sdl) == meta[s], s
        assert (np_, nb) == blk[s], s

    # stats.json must equal the manifest rollup
    from web_search_engine_spark.sources.catalog import read_stats

    st = read_stats(d)
    assert st["n_docs"] == sum(v[0] for v in man.values())
    total_dl = sum(v[1] for v in man.values())
    assert abs(st["avgdl"] - total_dl / st["n_docs"]) < 1e-9


def test_dl_from_postings_matches_tokenize(spark, tmp_path, monkeypatch):
    """ADVICE r3: the dl-from-postings docs_meta derivation (the path
    every >=200k-doc production build takes) was only exercised by
    benchmarks. Force it on a small build and assert docs_meta —
    including zero-token docs, which have NO postings rows and must
    come back dl=0 via the left join coalesce — is row-identical to
    the tokenize-path build."""
    import web_search_engine_spark.plans.build_index as B
    from web_search_engine_spark.sources.catalog import read_stats

    src = corpus_df(spark, n_docs=150, seed=42)  # kind==7 rows: dl=0
    d_tok = str(tmp_path / "tok")
    d_post = str(tmp_path / "post")
    monkeypatch.setattr(B, "_DL_SOURCE", "tokenize")
    B.build_index(spark, src, d_tok, num_shards=3)
    monkeypatch.setattr(B, "_DL_SOURCE", "postings")
    B.build_index(spark, src, d_post, num_shards=3)

    cols = ["shard", "doc_id", "repo", "path", "dl", "content_sha256"]
    a = sorted(
        tuple(r) for r in spark.read.parquet(f"{d_tok}/docs_meta").select(*cols).collect()
    )
    b = sorted(
        tuple(r) for r in spark.read.parquet(f"{d_post}/docs_meta").select(*cols).collect()
    )
    assert a == b
    assert any(t[4] == 0 for t in a)  # the zero-token docs are present
    sa, sb = read_stats(d_tok), read_stats(d_post)
    assert sa["n_docs"] == sb["n_docs"] and sa["avgdl"] == sb["avgdl"]


def test_term_dict_build_bit_identical(spark, tmp_path, monkeypatch):
    """The dictionary-encoded build (term -> lexical int64 id before the
    blocks shuffle, strings joined back after encoding) must reproduce
    the direct string build's block TABLE row-for-row — including the
    varbyte payload bytes — and keep every written file lexically
    term-clustered (the row-group min/max property the serving
    directory prunes on)."""
    import pyarrow.parquet as pq

    import web_search_engine_spark.plans.build_index as B

    src = corpus_df(spark, n_docs=300, seed=11)
    monkeypatch.setattr(B, "_DL_SOURCE", "postings")  # dict needs postings
    d_str = str(tmp_path / "strs")
    d_dict = str(tmp_path / "dict")
    monkeypatch.setattr(B, "_TERM_DICT", "off")
    B.build_index(spark, src, d_str, num_shards=3)
    monkeypatch.setattr(B, "_TERM_DICT", "on")
    B.build_index(spark, src, d_dict, num_shards=3)

    cols = [
        "term", "shard", "block_id", "n", "last_docid", "base_docid",
        "max_tf", "doc_bytes", "freq_bytes",
    ]
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_str}/blocks").select(*cols).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_dict}/blocks").select(*cols).collect()
    )
    assert a == b and len(a) > 0

    # Term->partition assignment differs (the bucket key hashes the id,
    # not the string), so file contents need not match file-for-file.
    # The property serving's row-group pruning needs is that WITHIN each
    # written file terms stay lexically clustered (the partition sort on
    # term_id == lexical order): per (shard, file), the term sequence
    # must be non-decreasing with doc_id runs ascending inside a term.
    checked = 0
    for shard_dir in sorted(os.listdir(f"{d_dict}/blocks")):
        if not shard_dir.startswith("shard="):
            continue
        for fname in sorted(os.listdir(f"{d_dict}/blocks/{shard_dir}")):
            if not fname.endswith(".parquet"):
                continue
            t = pq.read_table(
                f"{d_dict}/blocks/{shard_dir}/{fname}",
                columns=["term", "block_id"],
            )
            terms = t.column("term").to_pylist()
            assert terms == sorted(terms), f"{shard_dir}/{fname} not term-sorted"
            checked += 1
    assert checked > 0


def test_fused_build_matches_agg(spark, tmp_path, monkeypatch):
    """WSE_BUILD_MODE=fused (single shuffle of raw token occurrences,
    tf aggregated as sorted-run lengths inside the encoder) must produce
    the same index as the default two-shuffle aggregated build: block
    table row-identical including payload bytes, docs_meta and stats
    identical. The corpus includes empty docs (dl=0, no postings) and
    repeated terms per doc (tf > 1 run collapsing)."""
    import web_search_engine_spark.plans.build_index as B
    from web_search_engine_spark.sources.catalog import read_stats

    src = corpus_df(spark, n_docs=250, seed=5)
    d_agg = str(tmp_path / "agg")
    d_fused = str(tmp_path / "fused")
    monkeypatch.setattr(B, "_BUILD_MODE", "agg")
    B.build_index(spark, src, d_agg, num_shards=3)
    monkeypatch.setattr(B, "_BUILD_MODE", "fused")
    B.build_index(spark, src, d_fused, num_shards=3)

    bcols = [
        "term", "shard", "block_id", "n", "last_docid", "base_docid",
        "max_tf", "doc_bytes", "freq_bytes",
    ]
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_agg}/blocks").select(*bcols).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_fused}/blocks").select(*bcols).collect()
    )
    assert a == b and len(a) > 0
    assert any(t[6] > 1 for t in a)  # max_tf>1 blocks exercise run collapsing

    mcols = ["shard", "doc_id", "repo", "path", "dl", "content_sha256"]
    ma = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_agg}/docs_meta").select(*mcols).collect()
    )
    mb = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_fused}/docs_meta").select(*mcols).collect()
    )
    assert ma == mb
    sa, sb = read_stats(d_agg), read_stats(d_fused)
    assert sa["n_docs"] == sb["n_docs"] and sa["avgdl"] == sb["avgdl"]


def test_mapcombine_build_matches_agg(spark, tmp_path, monkeypatch):
    """WSE_BUILD_MODE=mapcombine (tokenize + per-doc tf counting + dl +
    sha256 fused into ONE mapInArrow pass; docs_meta from sentinel rows;
    zero hash aggregations in the plan) must produce the same index as
    the default aggregated build: block table row-identical including
    payload bytes, docs_meta (incl. dl=0 + sha for EMPTY docs and the
    passthrough key cols) identical, stats identical."""
    import web_search_engine_spark.plans.build_index as B
    from web_search_engine_spark.sources.catalog import read_stats

    src = corpus_df(spark, n_docs=250, seed=5)
    d_agg = str(tmp_path / "agg")
    d_mc = str(tmp_path / "mc")
    monkeypatch.setattr(B, "_BUILD_MODE", "agg")
    B.build_index(spark, src, d_agg, num_shards=3)
    monkeypatch.setattr(B, "_BUILD_MODE", "mapcombine")
    B.build_index(spark, src, d_mc, num_shards=3)

    bcols = [
        "term", "shard", "block_id", "n", "last_docid", "base_docid",
        "max_tf", "doc_bytes", "freq_bytes",
    ]
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_agg}/blocks").select(*bcols).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_mc}/blocks").select(*bcols).collect()
    )
    assert a == b and len(a) > 0

    mcols = ["shard", "doc_id", "repo", "path", "dl", "content_sha256"]
    ma = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_agg}/docs_meta").select(*mcols).collect()
    )
    mb = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_mc}/docs_meta").select(*mcols).collect()
    )
    assert ma == mb
    assert any(t[4] == 0 for t in mb)  # empty docs kept with dl=0
    sa, sb = read_stats(d_agg), read_stats(d_mc)
    assert sa["n_docs"] == sb["n_docs"] and sa["avgdl"] == sb["avgdl"]


def test_sqlenc_build_matches_agg(spark, tmp_path, monkeypatch):
    """WSE_BUILD_MODE=sqlenc (all-JVM block encode: collect_list +
    higher-order functions + hex/unhex varbyte, zero Python workers in
    the reduce — VERDICT r4 #2) must produce the same index as the
    default build: block table row-identical including payload bytes,
    docs_meta and stats identical."""
    import web_search_engine_spark.plans.build_index as B
    from web_search_engine_spark.sources.catalog import read_stats

    src = corpus_df(spark, n_docs=250, seed=5)
    d_agg = str(tmp_path / "agg")
    d_sql = str(tmp_path / "sqlenc")
    monkeypatch.setattr(B, "_BUILD_MODE", "agg")
    B.build_index(spark, src, d_agg, num_shards=3)
    monkeypatch.setattr(B, "_BUILD_MODE", "sqlenc")
    B.build_index(spark, src, d_sql, num_shards=3)

    bcols = [
        "term", "shard", "block_id", "n", "last_docid", "base_docid",
        "max_tf", "doc_bytes", "freq_bytes",
    ]
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_agg}/blocks").select(*bcols).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_sql}/blocks").select(*bcols).collect()
    )
    assert a == b and len(a) > 0
    assert any(t[6] > 1 for t in a)  # max_tf>1 blocks exercise gap+tf paths

    mcols = ["shard", "doc_id", "repo", "path", "dl", "content_sha256"]
    ma = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_agg}/docs_meta").select(*mcols).collect()
    )
    mb = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{d_sql}/docs_meta").select(*mcols).collect()
    )
    assert ma == mb
    sa, sb = read_stats(d_agg), read_stats(d_sql)
    assert sa["n_docs"] == sb["n_docs"] and sa["avgdl"] == sb["avgdl"]

    # the reduce stage is Python-free: no Arrow/Python eval node in the
    # sqlenc block plan (the tokenizer pandas_udf is upstream of the
    # postings agg, not in the encode)
    from web_search_engine_spark.operators.blocks import build_block_index_sql
    from web_search_engine_spark.operators.postings import build_postings, with_tokens

    plan_df = build_block_index_sql(
        build_postings(with_tokens(src.limit(50).withColumn("doc_id", F.lit(0)), "content")),
        shard_size=100,
    )
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan


def test_sqlenc_rejects_term_dict_on(spark, tmp_path, monkeypatch):
    """WSE_TERM_DICT=on requires the string-term mapInArrow build; the
    SQL encoder must refuse loudly."""
    import pytest

    import web_search_engine_spark.plans.build_index as B

    src = corpus_df(spark, n_docs=30, seed=5)
    monkeypatch.setattr(B, "_BUILD_MODE", "sqlenc")
    monkeypatch.setattr(B, "_TERM_DICT", "on")
    with pytest.raises(ValueError, match="sqlenc"):
        B.build_index(spark, src, str(tmp_path / "x"), num_shards=1)


def test_vb_hex_expr_edge_values(spark):
    """JVM varbyte expression vs the numpy codec on boundary values:
    0, 127/128 (1->2 byte), every 7-bit boundary, and large longs."""
    from web_search_engine_spark.functions import codec as C
    from web_search_engine_spark.operators.blocks import _vb_hex_expr

    vals = [0, 1, 127, 128, 129, (1 << 14) - 1, 1 << 14, (1 << 21) - 1,
            1 << 21, (1 << 28) - 1, 1 << 28, (1 << 35), (1 << 42) + 17,
            (1 << 49) + 3, (1 << 56) + 9, (1 << 62) + 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: bytes(r["b"])
        for r in df.select("v", F.unhex(_vb_hex_expr(F.col("v"))).alias("b")).collect()
    }
    for v in vals:
        want = C.vb_encode(np.array([v], dtype=np.uint64))
        assert got[v] == want, (v, got[v].hex(), want.hex())


def test_dl_join_strategies_identical(spark, tmp_path, monkeypatch):
    """WSE_DL_JOIN broadcast vs shuffle (VERDICT r4 #3: the docs_meta
    join was always sort-merge; small corpora now broadcast the dl
    side) must produce identical docs_meta. Force dl_source=postings so
    the join exists at this corpus size."""
    import web_search_engine_spark.plans.build_index as B

    src = corpus_df(spark, n_docs=200, seed=9)
    monkeypatch.setattr(B, "_DL_SOURCE", "postings")
    outs = {}
    for strat in ("broadcast", "shuffle"):
        monkeypatch.setattr(B, "_DL_JOIN", strat)
        d = str(tmp_path / strat)
        B.build_index(spark, src, d, num_shards=2)
        outs[strat] = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{d}/docs_meta")
            .select("shard", "doc_id", "repo", "path", "dl", "content_sha256")
            .collect()
        )
    assert outs["broadcast"] == outs["shuffle"] and len(outs["broadcast"]) == 200


def test_dl_agg_strategies_identical(spark, tmp_path, monkeypatch):
    """WSE_DL_AGG partial vs repartition (round-5 docs_meta fix): the
    repartition-first dl plan — project (doc_id, tf), hash-repartition
    by doc_id, then aggregate — must produce docs_meta row-identical to
    the stock partial-agg plan. The partial plan's exchange grows as
    P x n_docs (anti-scaling at wide parallelism, BENCH.md round-5
    decomposition); the repartition plan's is constant |postings|.
    Zero-token docs (no postings rows) must survive both via the left
    join coalesce."""
    import web_search_engine_spark.plans.build_index as B

    src = corpus_df(spark, n_docs=150, seed=42)  # kind==7 rows: dl=0
    monkeypatch.setattr(B, "_DL_SOURCE", "postings")
    outs = {}
    for strat in ("partial", "repartition"):
        monkeypatch.setattr(B, "_DL_AGG", strat)
        d = str(tmp_path / strat)
        B.build_index(spark, src, d, num_shards=3)
        outs[strat] = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{d}/docs_meta")
            .select("shard", "doc_id", "repo", "path", "dl", "content_sha256")
            .collect()
        )
    assert outs["partial"] == outs["repartition"]
    assert len(outs["partial"]) == 150
    assert any(t[4] == 0 for t in outs["partial"])  # dl=0 docs kept


def test_dl_agg_rejects_unknown_value(spark, tmp_path, monkeypatch):
    import pytest

    import web_search_engine_spark.plans.build_index as B

    src = corpus_df(spark, n_docs=30, seed=3)
    monkeypatch.setattr(B, "_DL_SOURCE", "postings")
    monkeypatch.setattr(B, "_DL_AGG", "bogus")
    with pytest.raises(ValueError, match="WSE_DL_AGG"):
        B.build_index(spark, src, str(tmp_path / "x"), num_shards=2)


def test_dl_join_rejects_unknown_value(spark, tmp_path, monkeypatch):
    """Knob validation runs at build_index ENTRY, so a typo'd value
    fails every build shape — including small corpora whose dl_source
    resolves to tokenize and never reaches the join branch."""
    import pytest

    import web_search_engine_spark.plans.build_index as B

    src = corpus_df(spark, n_docs=30, seed=3)
    monkeypatch.setattr(B, "_DL_JOIN", "brodcast")
    with pytest.raises(ValueError, match="WSE_DL_JOIN"):
        B.build_index(spark, src, str(tmp_path / "x"), num_shards=2)


def test_dl_source_conflicts_with_fused_modes(spark, tmp_path, monkeypatch):
    """ADVICE r4: an explicitly pinned WSE_DL_SOURCE=postings must fail
    loudly under fused/mapcombine (no standalone postings relation
    exists there), mirroring the WSE_TERM_DICT=on contract — not
    silently build a different shape."""
    import pytest

    import web_search_engine_spark.plans.build_index as B

    src = corpus_df(spark, n_docs=30, seed=5)
    monkeypatch.setattr(B, "_DL_SOURCE", "postings")
    for mode in ("fused", "mapcombine"):
        monkeypatch.setattr(B, "_BUILD_MODE", mode)
        with pytest.raises(ValueError, match="WSE_DL_SOURCE=postings"):
            B.build_index(spark, src, str(tmp_path / mode), num_shards=1)


def test_arrow_records_cap_derives_from_row_bound(monkeypatch):
    """ADVICE r4: with the Arrow byte cap removed, the records cap must
    come from the declared row-width bound so wide-row corpora don't
    produce multi-GB Arrow batches."""
    from web_search_engine_spark.session import arrow_records_per_batch

    monkeypatch.delenv("WSE_EXPECTED_ROW_BYTES", raising=False)
    assert arrow_records_per_batch() == 65536  # default == measured optimum
    monkeypatch.setenv("WSE_EXPECTED_ROW_BYTES", "300000")
    cap = arrow_records_per_batch()
    assert 256 <= cap < 1024  # ~894: 300 KB docs -> ~256 MB batches
    monkeypatch.setenv("WSE_EXPECTED_ROW_BYTES", str(1 << 30))
    assert arrow_records_per_batch() == 256  # floor keeps batches useful


def test_doc_id_runtime_invariant_gate(spark, monkeypatch):
    """WSE_VERIFY_DOC_IDS=1 adds the partition-local-position contiguity
    check (ADVICE r3: the id layout rests on Spark internals a version
    bump could change) — it must pass on the installed Spark and still
    produce the same dense ids."""
    from web_search_engine_spark.operators.postings import assign_doc_ids_counted
    from web_search_engine_spark.sources.corpus import corpus_df as cdf

    monkeypatch.setenv("WSE_VERIFY_DOC_IDS", "1")
    src = cdf(spark, n_docs=97, seed=7).repartition(13)
    out, n, handle = assign_doc_ids_counted(src, ["repo", "path"])
    try:
        rows = out.select("doc_id", "repo", "path").collect()
    finally:
        handle.unpersist()
    assert n == 97
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == list(range(97))  # dense 0..n-1
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"]))
    assert [r["doc_id"] for r in by_key] == list(range(97))  # rank order


@pytest.mark.parametrize("mode", ["OR", "AND"])
def test_three_kernels_identical(index_dir, oracle, monkeypatch, mode):
    """TAAT (vectorized), the pruned cursor kernel (block-max WAND for
    OR, galloping intersection for AND) and the unpruned cursor DAAT
    must agree doc-for-doc with bit-identical scores: all kernels sum
    the per-term contributions in sorted-term order with the same
    float64 expression (float addition is not associative — the
    summation order is a pinned invariant, VERDICT r2 #3)."""
    import random

    import web_search_engine_spark.operators.wand as W

    eng = SearchEngine(index_dir)
    rng = random.Random(99)
    vocab = sorted(oracle.index)
    queries = [f"{rng.choice(vocab)} {rng.choice(vocab)} {rng.choice(vocab)}"
               for _ in range(25)]
    # hot-term conjunctions: random 3-term ANDs rarely co-occur, these do
    queries += ["the import policy", "the i 0", "import def return",
                "the the import", "manhattan project"]
    n_nonempty = 0
    for q in queries:
        monkeypatch.setattr(W, "TAAT_MAX_POSTINGS", 10**12)
        taat = eng.search(q, mode=mode, topk=10, use_wand=True)
        monkeypatch.setattr(W, "TAAT_MAX_POSTINGS", 0)
        pruned = eng.search(q, mode=mode, topk=10, use_wand=True)
        plain = eng.search(q, mode=mode, topk=10, use_wand=False)
        results = [taat, pruned, plain]
        if mode == "OR":
            # the classic per-posting BMW cursor loop — the independent
            # second implementation of the blockwise kernel's pruning
            results.append(eng.search(q, mode=mode, topk=10,
                                      force_kernel="bmw_cursor"))
        first = results[0]
        for got in results[1:]:
            assert [d for d, _ in first] == [d for d, _ in got], q
            for (_, sa), (_, sb) in zip(first, got):
                assert sa == sb, (q, mode, sa, sb)
        n_nonempty += bool(first)
    # the sample must actually exercise scoring (AND intersections are
    # naturally sparser than OR unions)
    assert n_nonempty >= (10 if mode == "OR" else 8)
    if mode == "AND":
        # forcing an OR-only kernel on AND must fail loudly, not quietly
        # validate a different kernel (ADVICE r3)
        for bad in ("bmw_cursor", "bmw_block"):
            with pytest.raises(ValueError):
                eng.search("the import", mode=mode, topk=10, force_kernel=bad)


def test_fast_term_decode_matches_per_block(spark, index_dir):
    """decode_term_postings_fast (two vectorized codec calls with
    segmented shard rebase) must equal the per-block reference decoder
    on multi-shard terms."""
    import numpy as np

    from web_search_engine_spark.operators.wand import (
        decode_term_postings,
        decode_term_postings_fast,
    )

    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    rows_by_term = {}
    for r in blocks.collect():
        rows_by_term.setdefault(r["term"], []).append(
            (r["shard"], r["block_id"], r["last_docid"], r["base_docid"],
             r["max_tf"], bytes(r["doc_bytes"]), bytes(r["freq_bytes"]))
        )
    n_multi = 0
    for term, rows in rows_by_term.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        want = decode_term_postings([(t[2], t[3], t[4], t[5], t[6]) for t in rows],
                                    "varbyte")
        got = decode_term_postings_fast(rows, "varbyte")
        assert np.array_equal(want[0], got[0]), term
        assert np.array_equal(want[1], got[1]), term
        n_multi += len({t[0] for t in rows}) > 1
    assert n_multi >= 5  # the corpus must exercise multi-shard chains


def test_lexicon_driver_merge_matches_spark(spark, tmp_path, monkeypatch):
    """Small-delta lexicon merges run driver-side via pyarrow (round 6);
    the table must be row-identical to the Spark aggregation on BOTH the
    full-rebuild and the additive-append paths."""
    import web_search_engine_spark.plans.build_index as B
    from web_search_engine_spark.streaming.incremental import append_batch

    full = corpus_df(spark, n_docs=200, seed=13).cache()
    first = full.limit(120)
    rest = full.subtract(first)

    def build_and_append(d):
        B.build_index(spark, first, d, num_shards=2)
        append_batch(spark, rest, d, batch_id=0)
        return {
            r["term"]: (r["df"], r["nblocks"], r["max_tf"])
            for r in spark.read.parquet(os.path.join(d, "lexicon")).collect()
        }

    drv = build_and_append(str(tmp_path / "driver_path"))
    monkeypatch.setattr(B, "_LEXICON_DRIVER_MAX_BLOCKS", -1)  # force Spark
    spk = build_and_append(str(tmp_path / "spark_path"))
    assert drv == spk and len(drv) > 0
