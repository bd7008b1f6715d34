"""Index table catalog — parquet layout + stats + build manifest.

On a cluster these would be Iceberg tables (the north rule's target);
in the sandbox they are parquet directories with the same logical
schema. Layout under <index_dir>/:

  blocks/      block rows (operators/blocks.BLOCK_SCHEMA), written
               range-partitioned + sorted by (shard, term) so parquet
               row-group min/max stats prune `term IN (...)` scans —
               the table-format analog of the reference's lexicon byte
               offsets + block directory binary search
               (HW2/engine/listio.py:176-196).
  lexicon/     (term, df, nblocks, max_tf)
  docs_meta/   (shard, doc_id, repo, path, commit, lang, dl,
               content_sha256) — doc stats + lineage + the per-row
               sha256 invariant vs the source table (input_hint), in
               ONE table (column pruning makes the dl-only read free).
  stats.json   {n_docs, avgdl, codec, block_size, shard_size}
  manifest/    (shard, n_docs, sum_dl, n_postings, n_blocks, build_sec,
               finished_unix, codec, block_size, shard_size) — one row
               per COMPLETED shard; the resume checkpoint AND the
               corpus-stats rollup source (n_docs/avgdl aggregate from
               these rows, never from a docs_meta rescan). Written
               driver-side via pyarrow — a metadata commit, the same
               way Iceberg writes manifest files.
  _batch_ledger.json  streaming-append idempotency ledger (see
               streaming/incremental.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def write_stats(index_dir: str, stats: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "stats.json"))  # atomic commit


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


class IndexCatalog:
    """Read-side handle on a built index.

    Table handles are memoized per catalog instance: ``spark.read
    .parquet`` eagerly lists the directory (InMemoryFileIndex), so a
    serving loop that calls ``blocks()`` per query would re-pay file
    listing every time — at 100 TB that is a multi-second driver stall
    per call (guide §6 "file listing"). A catalog therefore behaves
    like a table-format SNAPSHOT view: it sees the files present when
    each table is first touched. After appending to the index (e.g.
    streaming ingest), call ``refresh()`` — or construct a new catalog,
    which is what build_index returns — to pick up new files.
    """

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self._tables: dict[str, DataFrame] = {}
        self._lex_dataset = None

    def refresh(self) -> "IndexCatalog":
        """Drop memoized table handles + re-read stats.json."""
        self._tables.clear()
        self._lex_dataset = None
        self.stats = read_stats(self.index_dir)
        return self

    def _table(self, name: str) -> DataFrame:
        df = self._tables.get(name)
        if df is None:
            df = self.spark.read.parquet(os.path.join(self.index_dir, name))
            self._tables[name] = df
        return df

    @property
    def n_docs(self) -> int:
        return int(self.stats["n_docs"])

    @property
    def avgdl(self) -> float:
        return float(self.stats["avgdl"])

    @property
    def codec(self) -> str:
        return self.stats["codec"]

    def blocks(self) -> DataFrame:
        return self._table("blocks")

    def lexicon(self) -> DataFrame:
        return self._table("lexicon")

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """{term: df} for the given terms, read DRIVER-SIDE via pyarrow
        (no Spark job — the lexicon is tiny by Heaps' law and the read
        is term-filtered per row group). The dataset handle is memoized
        with the same snapshot semantics as the Spark table handles: it
        pins the files present at first touch, so df values stay
        consistent with the memoized blocks/docs_meta snapshots across
        a concurrent append; call refresh() to see new data."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        if self._lex_dataset is None:
            self._lex_dataset = pads.dataset(
                os.path.join(self.index_dir, "lexicon"), format="parquet"
            )
        if not terms:
            return {}
        tbl = self._lex_dataset.to_table(
            columns=["term", "df"], filter=pc.field("term").isin(terms)
        )
        return dict(
            zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist())
        )

    def docs_meta(self) -> DataFrame:
        return self._table("docs_meta")

    def doc_stats(self) -> DataFrame:
        return self.docs_meta().select("doc_id", "dl")

    def manifest(self) -> DataFrame:
        return self._table("manifest")
