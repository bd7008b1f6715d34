"""Semantics tests for the training-data pipeline operators that have
no SQL oracle (ANN recall, multimodal plumbing) plus python-oracle
checks for the dedup family on the synthetic corpus (which, unlike the
driver's documents table, contains true duplicates)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_search_engine_spark.operators import dedup as D
from web_search_engine_spark.operators import multimodal as M
from web_search_engine_spark.operators import similarity as S
from web_search_engine_spark.operators.postings import assign_doc_ids
from web_search_engine_spark.sources.corpus import corpus_df, generate_corpus_pdf

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    src = assign_doc_ids(corpus_df(spark, n_docs=400, seed=42), ["repo", "path"])
    return src.select("doc_id", F.col("content").alias("text")).cache()


def test_exact_dups_find_planted_duplicates(docs):
    """The synthetic corpus plants identical content rows (kind==11)."""
    res = D.exact_duplicates(docs).filter(F.col("group_size") > 1).collect()
    assert len(res) >= 10  # ~400/23 planted dups
    # python oracle: group by md5 of text
    pdf = generate_corpus_pdf(400, 42).sort_values(["repo", "path"]).reset_index(drop=True)
    groups = {}
    for i, t in enumerate(pdf["content"]):
        groups.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(i)
    want = {
        d: (min(g), len(g)) for g in groups.values() if len(g) > 1 for d in g
    }
    got = {r["doc_id"]: (r["keeper_id"], r["group_size"]) for r in res}
    assert got == want


def test_lsh_finds_exact_duplicates_as_near_dups(docs):
    """Identical SHINGLEABLE docs have Jaccard 1.0 — LSH must surface
    every such pair (punctuation-only dups have no shingles and are
    rightly invisible to minhash)."""
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in D.minhash_lsh_pairs(docs).collect()}
    dups = D.exact_duplicates(docs).filter(F.col("group_size") > 1)
    shingleable = docs.select(
        "doc_id", F.size(D.shingles_col("text")).alias("ns")
    ).filter(F.col("ns") > 0)
    by_keeper = {}
    for r in dups.join(shingleable, "doc_id").collect():
        by_keeper.setdefault(r["keeper_id"], []).append(r["doc_id"])
    assert any(len(g) > 1 for g in by_keeper.values())
    for group in by_keeper.values():
        for a in group:
            for b in group:
                if a < b:
                    assert (a, b) in pairs and pairs[(a, b)] == 1.0, (a, b)


def test_simhash_identical_docs_same_fingerprint(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    by_keeper = {}
    for r in D.exact_duplicates(docs).filter(F.col("group_size") > 1).collect():
        by_keeper.setdefault(r["keeper_id"], []).append(r["doc_id"])
    checked = 0
    for group in by_keeper.values():
        vals = {sh[d] for d in group if d in sh}  # tokenless dups have no simhash
        assert len(vals) <= 1
        checked += len(vals)
    assert checked >= 1


def test_ann_lsh_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4, 5, 6, 7]
    exact = S.cosine_topk_batch(emb, qids, 10).collect()
    approx = S.ann_lsh_topk(emb, qids, 10, planes=4, tables=8).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    ap = {}
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex
    ]
    mean_recall = sum(recalls) / len(recalls)
    # 8 tables x 4 planes: per-neighbor hit prob ~1-(1-0.6^4)^8 ~ 0.67
    # for these weakly-similar random embeddings; assert well above the
    # 2% random baseline with margin for the md5-derived planes.
    assert mean_recall >= 0.35, recalls
    # every approx neighbor must carry the EXACT cosine (no score drift)
    exact_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["cosine"] - exact_scores[key]) < 1e-9


def test_media_feature_plumbing(spark):
    media = M.synthesize_media(spark, 120)
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = M.extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 120
    for r in rows[:10]:
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["decoder"] == "fake"
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in M.extract_media_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_media_real_decoder_is_stubbed(spark):
    media = M.synthesize_media(spark, 6)
    with pytest.raises(Exception) as exc_info:
        M.extract_media_features(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling(spark):
    media = M.synthesize_media(spark, 120)
    feats = M.extract_media_features(media).cache()
    frames = M.sample_frames(feats, every_nth=4)
    got = {}
    for r in frames.collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    vids = {r["media_id"]: r["n_frames"] for r in feats.filter(F.col("kind") == "video").collect()}
    assert set(got) == set(vids)
    for mid, idxs in got.items():
        assert sorted(idxs) == list(range(0, vids[mid], 4))


def test_ann_lsh_bucketed_is_verified_subset_of_brute_force(spark):
    """The bucketed near-dup path must emit only EXACT-verified pairs
    (subset of the brute-force result, identical cosines) with recall
    well above chance (measured 0.77 at sf0.01 with 4 planes x 8
    tables; bound left slack for testdata regeneration)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    brute = {
        (r["a"], r["b"]): r["cosine"]
        for r in D.embedding_near_dup_pairs(emb, threshold=0.35).collect()
    }
    lsh = {
        (r["a"], r["b"]): r["cosine"]
        for r in S.ann_lsh_bucketed(emb, threshold=0.35).collect()
    }
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert abs(v - brute[k]) < 1e-9
    assert len(lsh) / len(brute) >= 0.5, (len(lsh), len(brute))


def test_hyperplane_signs_plan_is_constant_size(spark):
    """The signature computation must be ONE pandas_udf expression, not
    a per-dimension unroll (dims x planes x tables expressions would
    blow up Catalyst at 768-4096-dim embeddings)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = S.hyperplane_signs(emb)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "EvalPython" in plan, plan[:2000]
    # no element_at unroll: one occurrence per plan at most
    assert plan.count("element_at") == 0, plan[:2000]


def test_fuzzy_dedup_end_to_end_composition(docs):
    """VERDICT r4 #7: LSH pairs -> connected components -> canonical
    keeper -> filtered corpus must compose consistently:
      - membership covers every doc exactly once (singletons included);
      - cluster labels are the transitive closure of the verified LSH
        pair graph (python union-find oracle over the engine's own
        pairs, which are independently DuckDB-verified at the gate);
      - keeper = min doc_id per cluster;
      - fuzzy_dedup_corpus == docs minus non-keepers, columns intact."""
    pairs = [
        (r["a"], r["b"]) for r in D.minhash_lsh_pairs(docs).collect()
    ]
    n = docs.count()

    # union-find oracle
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: min(x for x in range(n) if find(x) == find(d)) for d in range(n)}

    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in D.fuzzy_dedup_clusters(docs).collect()
    }
    assert set(got) == set(range(n))  # total, exactly once
    for d in range(n):
        assert got[d] == (want[d], d == want[d]), (d, got[d], want[d])

    kept = D.fuzzy_dedup_corpus(docs)
    assert kept.columns == docs.columns
    keeper_ids = {d for d, (c, k) in got.items() if k}
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == keeper_ids
    # at least one multi-doc cluster collapsed (planted dups exist)
    assert len(keeper_ids) < n
