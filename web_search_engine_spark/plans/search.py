"""Search over a built index.

Two paths, one semantics (tested rank-identical):

  - SearchEngine: interactive single-query path. Mirrors the reference's
    serving shape (lexicon + doc_lengths resident in memory, postings
    read per query: HW2/engine/searcher.py:34-50) — the lexicon and doc
    stats load once via Arrow, per-query block fetches go through
    pyarrow dataset predicate pushdown (`term IN (...)` prunes parquet
    row groups on min/max stats — the table-format analog of the
    reference's lexicon offset + block directory seek). No Spark job in
    the hot path; latency is milliseconds like the reference's.

  - batch_score(): distributed scoring of a query SET over the block
    table: prune scan on term -> decode blocks (mapInPandas) -> the same
    relational BM25 plan as plans/query.py. Use this at cluster scale or
    for thousands of queries at once.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, DEFAULT_TOPK
from ..functions.tokenizer import tokenize_query
from ..operators.blocks import blocks_to_postings
from ..operators.wand import search_blocks
from ..sources.catalog import IndexCatalog
from .query import score_queries


class SearchEngine:
    """In-process query engine over an index directory."""

    def __init__(self, index_dir: str):
        from ..sources.catalog import read_stats

        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self.n_docs = int(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.codec = self.stats["codec"]

        lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
            columns=["term", "df"]
        )
        self._df = dict(
            zip(lex.column("term").to_pylist(), lex.column("df").to_pylist())
        )
        ds = pads.dataset(
            os.path.join(index_dir, "docs_meta"), partitioning="hive"
        ).to_table(columns=["doc_id", "dl"])
        doc_ids = np.asarray(ds.column("doc_id"))
        dls = np.asarray(ds.column("dl"), dtype=np.float64)
        self.dl = np.zeros(int(doc_ids.max()) + 1 if len(doc_ids) else 0)
        self.dl[doc_ids] = dls
        self._blocks_ds = pads.dataset(
            os.path.join(index_dir, "blocks"), partitioning="hive"
        )

    def _fetch_blocks(self, terms: list[str]) -> dict[str, list]:
        tbl = self._blocks_ds.to_table(
            columns=[
                "term", "shard", "block_id", "last_docid", "base_docid",
                "max_tf", "doc_bytes", "freq_bytes",
            ],
            filter=pc.field("term").isin(terms),
        )
        rows: dict[str, list] = {}
        cols = [tbl.column(c).to_pylist() for c in (
            "term", "shard", "block_id", "last_docid", "base_docid",
            "max_tf", "doc_bytes", "freq_bytes",
        )]
        for term, shard, bid, last, base, mtf, db, fb in zip(*cols):
            rows.setdefault(term, []).append((shard, bid, last, base, mtf, db, fb))
        return rows

    def search(
        self,
        query: str,
        mode: str = "OR",
        topk: int = DEFAULT_TOPK,
        k1: float = BM25_K1,
        b: float = BM25_B,
        use_wand: bool = True,
    ) -> list[tuple[int, float]]:
        terms = sorted({t for t in tokenize_query(query) if t in self._df})
        if not terms:
            return []
        block_rows = self._fetch_blocks(terms)
        return search_blocks(
            block_rows, self._df, self.codec, self.dl, self.n_docs, self.avgdl,
            query, mode=mode, topk=topk, k1=k1, b=b, use_wand=use_wand,
        )


def make_snippet(text: str, query: str, width: int = 160) -> str:
    """Best-window snippet around query terms (reference app.py:118-155
    defines the same feature; optional — not part of rank-identity).

    Slides a character window over the document and keeps the one
    covering the most DISTINCT query terms (earliest window wins ties).
    """
    terms = {t for t in tokenize_query(query)}
    if not text or not terms:
        return text[:width]
    low = text.lower()
    hits = []
    for t in terms:
        start = 0
        while True:
            i = low.find(t, start)
            if i < 0:
                break
            hits.append((i, t))
            start = i + 1
    if not hits:
        return text[:width]
    hits.sort()
    best_start, best_cover = 0, 0
    for i, (pos, _t) in enumerate(hits):
        cover = {t for p, t in hits[i:] if p < pos + width}
        if len(cover) > best_cover:
            best_cover, best_start = len(cover), max(0, pos - 20)
    return text[best_start : best_start + width]


def extract_subset(docs: DataFrame, out_path: str, limit: int) -> None:
    """First-N-docs corpus sampler (reference extract_subset.py:15-32)."""
    docs.limit(limit).write.mode("overwrite").parquet(out_path)


def batch_score(
    catalog: IndexCatalog,
    queries: list[tuple[str, str]],
    mode: str = "OR",
    topk: int = DEFAULT_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Distributed top-k for a query set, reading the block table."""
    all_terms = sorted(
        {t for _, q in queries for t in tokenize_query(q)}
    )
    pruned = catalog.blocks().filter(F.col("term").isin(all_terms))
    postings = blocks_to_postings(pruned, codec=catalog.codec)
    return score_queries(
        postings,
        catalog.doc_stats().select("doc_id", "dl"),
        catalog.n_docs,
        catalog.avgdl,
        queries,
        mode=mode,
        topk=topk,
        k1=k1,
        b=b,
        lexicon=catalog.lexicon(),
    )
