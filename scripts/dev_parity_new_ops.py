"""Dev script: parity-check the pipeline operators vs candidate DuckDB SQL."""

from web_search_engine_spark.config import TOKEN_RE
from web_search_engine_spark.session import get_spark
from web_search_engine_spark.operators import dedup as D
from web_search_engine_spark.operators import similarity as S
from web_search_engine_spark.operators import textstats as T
from tests.parity_harness import ddb_con, compare

SF = "/root/testdata/sf0.001"
RE = TOKEN_RE

TOKS = f"regexp_extract_all(lower(text), '{RE}')"
SHINGLES = f"""
sh AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM (SELECT doc_id, {TOKS} AS t FROM documents)
  WHERE len(t) >= 3
)
"""

SQL = {}

SQL["exact_dups"] = """
SELECT doc_id, md5(text) AS digest,
       min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
       count(*) OVER (PARTITION BY md5(text))::BIGINT AS group_size
FROM documents
"""

SQL["minhash_sigs"] = f"""
WITH {SHINGLES}
SELECT doc_id, perm,
       list_aggregate(list_transform(shingles, s -> md5(perm::VARCHAR || ':' || s)), 'min') AS minhash
FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS perm)
"""

SQL["lsh_pairs"] = f"""
WITH {SHINGLES},
sigs AS (
  SELECT doc_id, perm,
         list_aggregate(list_transform(shingles, s -> md5(perm::VARCHAR || ':' || s)), 'min') AS minhash
  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS perm)
),
bands AS (
  SELECT doc_id, (perm // 2)::INT AS band,
         md5(string_agg(minhash, '|' ORDER BY minhash)) AS bh
  FROM sigs GROUP BY doc_id, (perm // 2)::INT
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
)
SELECT a, b,
       round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
             / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cand JOIN sh sa ON sa.doc_id = a JOIN sh sb ON sb.doc_id = b
WHERE round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
            / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) >= 0.5
"""

SQL["simhash"] = f"""
WITH h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM (SELECT doc_id, unnest({TOKS}) AS tok FROM documents)
),
per AS (
  SELECT doc_id, bit, sum(((h >> bit) & 1) * 2 - 1) AS s
  FROM h CROSS JOIN (SELECT unnest(range(0, 16)) AS bit)
  GROUP BY doc_id, bit
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM per GROUP BY doc_id
"""

SQL["simhash_pairs"] = f"""
WITH h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM (SELECT doc_id, unnest({TOKS}) AS tok FROM documents)
),
per AS (
  SELECT doc_id, bit, sum(((h >> bit) & 1) * 2 - 1) AS s
  FROM h CROSS JOIN (SELECT unnest(range(0, 16)) AS bit)
  GROUP BY doc_id, bit
),
sim AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
  FROM per GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, simhash, ci, (simhash >> (ci * 4)) & 15 AS cv
  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS ci)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.simhash AS sa, y.simhash AS sb
  FROM chunks x JOIN chunks y ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id
)
SELECT a, b, bit_count(xor(sa, sb))::INT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 2
"""

SQL["ngram_pairs"] = f"""
WITH {SHINGLES}
SELECT sa.doc_id AS a, sb.doc_id AS b,
       round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
             / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
FROM sh sa, sh sb
WHERE sa.doc_id < sb.doc_id AND sa.doc_id < 100 AND sb.doc_id < 100
  AND round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
            / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) >= 0.3
"""

SQL["emb_near_dup"] = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.8
"""

SQL["cosine_topk"] = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qe), 6) AS cosine
  FROM embeddings, q WHERE vec_id != 0
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank, vec_id, cosine
FROM scored ORDER BY rank LIMIT 10
"""

SQL["cosine_topk_batch"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cosine
  FROM embeddings e, q WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 10
"""

_voteexprs = []
_langsets = {
    "en": "['the','a','of','and','to','in','is','it','that','for']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','auf','zu']",
    "es": "['el','la','de','que','y','en','un','por','con','para']",
    "fr": "['le','la','et','les','des','est','dans','pour','que','une']",
}
for lg, arr in _langsets.items():
    _voteexprs.append(
        f"len(list_filter(t, x -> list_contains({arr}, x)))::BIGINT AS vote_{lg}"
    )
SQL["lang_id"] = f"""
WITH v AS (
  SELECT doc_id, {', '.join(_voteexprs)}
  FROM (SELECT doc_id, {TOKS} AS t FROM documents)
)
SELECT doc_id, vote_en, vote_de, vote_es, vote_fr,
       CASE WHEN vote_en >= vote_de AND vote_en >= vote_es AND vote_en >= vote_fr THEN 'en'
            WHEN vote_de >= vote_es AND vote_de >= vote_fr THEN 'de'
            WHEN vote_es >= vote_fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM v
"""

SQL["quality"] = f"""
WITH base AS (
  SELECT doc_id,
         len(t)::BIGINT AS n_tokens,
         CASE WHEN len(t) > 0
              THEN round(len(list_filter(t, x -> list_contains({_langsets['en']}, x)))::DOUBLE / len(t), 6)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN length(text) > 0
              THEN round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))::DOUBLE / length(text), 6)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(t) > 0
              THEN round(list_aggregate(list_transform(t, x -> length(x)::DOUBLE), 'sum') / len(t), 6)
              ELSE 0.0 END AS mean_token_len
  FROM (SELECT doc_id, text, {TOKS} AS t FROM documents)
)
SELECT doc_id, n_tokens, stopword_ratio, punct_ratio, mean_token_len,
       round(0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct_ratio)
             + 0.2 * least(4.0 * stopword_ratio, 1.0)
             + 0.1 * least(mean_token_len / 8.0, 1.0), 6) AS quality
FROM base
"""

SQL["token_counts"] = f"""
SELECT doc_id,
       len(list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) > 0))::BIGINT AS n_ws,
       len({TOKS})::BIGINT AS n_regex,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS n_bpe_ish
FROM documents
"""

_pows = [pow(131, j, 1_000_000_007) for j in range(32)]
SQL["fingerprint"] = f"""
WITH e AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS i
  FROM (SELECT doc_id, {TOKS} AS t FROM documents)
)
SELECT doc_id,
       (sum(((('0x' || substr(md5(tok), 1, 8))::BIGINT % 1000000007)
             * ([{', '.join(str(p) for p in _pows)}])[(i % 32) + 1]) % 1000000007)::BIGINT
        % 1000000007) AS fingerprint
FROM e GROUP BY doc_id
"""


def main():
    spark = get_spark("parity-dev", master="local[8]", shuffle_partitions=8)
    con = ddb_con(SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    checks = [
        ("exact_dups", D.exact_duplicates(docs)),
        ("minhash_sigs", D.minhash_signatures(docs)),
        ("lsh_pairs", D.minhash_lsh_pairs(docs)),
        ("simhash", D.simhash(docs)),
        ("simhash_pairs", D.simhash_near_pairs(docs)),
        ("ngram_pairs", D.ngram_jaccard_pairs(docs)),
        ("emb_near_dup", D.embedding_near_dup_pairs(emb, threshold=0.8)),
        ("cosine_topk", S.cosine_topk(emb, 0, 10)),
        ("cosine_topk_batch", S.cosine_topk_batch(emb, [0, 1, 2, 3], 10)),
        ("lang_id", T.language_id(docs)),
        ("quality", T.quality_score(docs)),
        ("token_counts", T.token_counts(docs)),
        ("fingerprint", T.doc_fingerprint(docs)),
    ]
    ok = True
    for name, sdf in checks:
        try:
            ok &= compare(sdf, con, SQL[name], name)
        except Exception as e:
            print(f"[{name}] ERROR: {str(e)[:300]}")
            ok = False
    print("ALL OK" if ok else "FAILURES")
    spark.stop()


if __name__ == "__main__":
    main()
