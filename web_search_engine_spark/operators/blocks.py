"""Blocked postings index — the reference's index.postings + lexicon as tables.

Physical layout (SURVEY.md §1.1): one ROW per block instead of a byte
offset into a monolithic file. Payload bytes (doc_bytes/freq_bytes) are
byte-identical to the reference format (HW2/engine/listio.py:44-79):
<=block_size postings per block, docids delta-gap + varbyte (or raw
uint32), freqs varbyte (or raw). The lexicon's byte offsets disappear;
the block directory (last_docid per block, HW2/engine/listio.py:176-196)
becomes ordinary columns that parquet min/max stats can skip on.

Scale design:
  - The build is `repartitionByRange(shard, term) + sortWithinPartitions
    + mapInPandas`: the explicit re-expression of the reference's
    sort->k-way-merge pipeline (north star) — the range shuffle IS the
    merge, every partition writes independently, no serial final writer
    (HW2/engine/merger.py's bottleneck).
  - mapInPandas (not groupBy(term).applyInPandas): one Arrow batch holds
    THOUSANDS of term groups, encoded with two vectorized codec calls
    per batch instead of one tiny pandas DataFrame per term. A term
    group split across batch boundaries is carried over; range
    partitioning guarantees a (shard, term) group never splits across
    partitions.
  - Hot-term skew is bounded by DOC-SHARDING: shard = doc_id //
    shard_size. Every (shard, term) group has at most shard_size
    postings, so a stopword term at 100 TB splits into many bounded
    groups instead of one monster task. Shards partition doc_id RANGES,
    so per-term global docid order is (shard asc, block_id asc) and
    each shard's gap chain restarts at base 0 (recorded in base_docid).
    With a single shard the output is byte-identical to the reference's
    whole-corpus build.
  - Per-block max_tf supports block-max WAND upper bounds
    (ub = idf * (k1+1)*max_tf / (max_tf + k1*(1-b)) — a true bound since
    the dl term in the denominator only increases it; SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BLOCK_SIZE, CODEC_VARBYTE
from ..functions import codec as C

BLOCK_SCHEMA = (
    "term string, shard int, block_id int, n int, last_docid long, "
    "base_docid long, max_tf long, doc_bytes binary, freq_bytes binary"
)


def _encode_batch(pdf: pd.DataFrame, block_size: int, codec: str) -> pd.DataFrame:
    """Vectorized block builder for one sorted (shard, term, doc_id) batch."""
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            columns=[
                "term", "shard", "block_id", "n", "last_docid", "base_docid",
                "max_tf", "doc_bytes", "freq_bytes",
            ]
        )
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    docids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)

    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
    group_starts = np.flatnonzero(new_group)
    group_of_row = np.cumsum(new_group) - 1
    row_in_group = np.arange(n) - group_starts[group_of_row]

    new_block = new_group | (row_in_group % block_size == 0)
    block_starts = np.flatnonzero(new_block)
    block_ends = np.append(block_starts[1:] - 1, n - 1)
    block_id = (row_in_group[block_starts] // block_size).astype(np.int32)
    n_in_block = (block_ends - block_starts + 1).astype(np.int32)
    last_docid = docids[block_ends]
    # gap base: previous block's last docid within the group, 0 for block 0
    base_docid = np.where(block_id == 0, 0, docids[np.maximum(block_starts - 1, 0)])
    max_tf = np.maximum.reduceat(tfs, block_starts)

    if codec == CODEC_VARBYTE:
        # The delta chain is continuous across blocks of one group
        # (first gap of block b>0 = docid - prev block last = plain diff),
        # so gaps reduce to one diff with group starts reset to the
        # absolute docid (base 0) — then ONE vectorized encode per batch.
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = docids[0]
        np.subtract(docids[1:], docids[:-1], out=gaps[1:])
        gaps[group_starts] = docids[group_starts]
        if np.any(gaps < 0):
            raise ValueError("postings not sorted by (shard, term, doc_id)")
        doc_buf, doc_lens = C.vb_encode_with_lengths(gaps.astype(np.uint64))
        freq_buf, freq_lens = C.vb_encode_with_lengths(tfs.astype(np.uint64))
        doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
        freq_off = np.concatenate(([0], np.cumsum(freq_lens)))
        doc_mv, freq_mv = memoryview(doc_buf), memoryview(freq_buf)
        doc_bytes = [
            bytes(doc_mv[doc_off[s] : doc_off[e + 1]])
            for s, e in zip(block_starts, block_ends)
        ]
        freq_bytes = [
            bytes(freq_mv[freq_off[s] : freq_off[e + 1]])
            for s, e in zip(block_starts, block_ends)
        ]
    else:
        d32 = docids.astype("<u4")
        f32 = tfs.astype("<u4")
        doc_bytes = [d32[s : e + 1].tobytes() for s, e in zip(block_starts, block_ends)]
        freq_bytes = [f32[s : e + 1].tobytes() for s, e in zip(block_starts, block_ends)]

    return pd.DataFrame(
        {
            "term": terms[block_starts],
            "shard": shards[block_starts].astype(np.int32),
            "block_id": block_id,
            "n": n_in_block,
            "last_docid": last_docid,
            "base_docid": base_docid,
            "max_tf": max_tf,
            "doc_bytes": doc_bytes,
            "freq_bytes": freq_bytes,
        }
    )


def _block_builder(block_size: int, codec: str):
    """mapInPandas function: stream batches, carry the trailing
    (shard, term) group so a group split across Arrow batches is
    encoded exactly once."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: pd.DataFrame | None = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_term = pdf["term"].iat[-1]
            last_shard = pdf["shard"].iat[-1]
            tail_mask = (pdf["term"] == last_term) & (pdf["shard"] == last_shard)
            # hold back the final group — it may continue in the next batch
            cut = len(pdf) - int(tail_mask.iloc[::-1].cumprod().sum())
            leftover = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                yield _encode_batch(head, block_size, codec)
        if leftover is not None and len(leftover):
            yield _encode_batch(leftover, block_size, codec)

    return build


def build_block_index(
    postings: DataFrame,
    block_size: int = BLOCK_SIZE,
    codec: str = CODEC_VARBYTE,
    shard_size: int | None = None,
    num_partitions: int | None = None,
    shards_hint: int | None = None,
) -> DataFrame:
    """(term, doc_id, tf) -> block rows (BLOCK_SCHEMA).

    shard_size: max docs per shard (hot-term skew bound). None = single
    shard 0 (byte-identical to the reference whole-corpus build).
    shards_hint: approximate shard count, used to size term sub-buckets.

    Partitioning: HASH on (shard, term-bucket), then sort within
    partitions — every (shard, term) group lands whole in one partition
    with its postings doc_id-ordered (the encoder's invariant).
    Deliberately NOT repartitionByRange: the RangePartitioner's
    reservoir-sampling job recomputes the ENTIRE child lineage
    (tokenize -> explode -> agg) a second time before the real pass —
    measured as a full extra postings pass per build. Hash partitioning
    needs no sampling; term-clustering for scan pruning comes from the
    within-partition sort (tight per-ROW-GROUP term ranges), not from
    cross-partition range order.

    The term BUCKET (xxhash64(term) % sub, sub ~= partitions/shards)
    keeps two properties at once: when shards >> cores (the 100 TB
    regime) sub collapses to 1 and each task holds whole shards, so the
    partitioned write emits O(1) files per shard dir (never the
    tasks x shards small-file blowup); when shards < cores (small
    indexes) the buckets restore full write parallelism at the cost of
    `sub` files per shard dir.
    """
    spark = postings.sparkSession
    if shard_size:
        sharded = postings.withColumn(
            "shard", (F.col("doc_id") / F.lit(int(shard_size))).cast("int")
        )
    else:
        sharded = postings.withColumn("shard", F.lit(0).cast("int"))
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    sub = max(1, n_part // max(1, shards_hint)) if shards_hint else n_part
    ordered = sharded.repartition(
        n_part, "shard", F.pmod(F.xxhash64("term"), F.lit(sub))
    ).sortWithinPartitions("shard", "term", "doc_id")
    return ordered.mapInPandas(_block_builder(block_size, codec), BLOCK_SCHEMA)


def build_block_index_grouped(
    postings: DataFrame,
    block_size: int = BLOCK_SIZE,
    codec: str = CODEC_VARBYTE,
    shard_size: int | None = None,
) -> DataFrame:
    """groupBy(shard, term).applyInPandas variant of the block builder.

    The literal north-star formulation: one pandas group per (shard,
    term). Produces IDENTICAL rows to build_block_index (tested), but
    pays one tiny pandas DataFrame per term — the mapInPandas path
    amortizes thousands of terms per Arrow batch and is the default.
    Kept as the semantic specification and for workloads with few,
    huge terms where per-group isolation is preferable.
    """
    if shard_size:
        sharded = postings.withColumn(
            "shard", (F.col("doc_id") / F.lit(int(shard_size))).cast("int")
        )
    else:
        sharded = postings.withColumn("shard", F.lit(0).cast("int"))

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        return _encode_batch(pdf, block_size, codec)

    return sharded.groupBy("shard", "term").applyInPandas(one_group, BLOCK_SCHEMA)


def lexicon_from_blocks(blocks: DataFrame) -> DataFrame:
    """(term, df, nblocks, max_tf) — df = Σ n over blocks (exact)."""
    return blocks.groupBy("term").agg(
        F.sum("n").cast("long").alias("df"),
        F.count("*").cast("int").alias("nblocks"),
        F.max("max_tf").cast("long").alias("max_tf"),
    )


def _decode_batch(pdf: pd.DataFrame, codec: str) -> pd.DataFrame:
    terms, docs, tfs = [], [], []
    for r in pdf.itertuples(index=False):
        d, f = C.decode_block(r.doc_bytes, r.freq_bytes, int(r.base_docid), codec)
        terms.append(np.repeat(r.term, len(d)))
        docs.append(d)
        tfs.append(f)
    if not terms:
        return pd.DataFrame(columns=["term", "doc_id", "tf"])
    return pd.DataFrame(
        {
            "term": np.concatenate(terms),
            "doc_id": np.concatenate(docs).astype(np.int64),
            "tf": np.concatenate(tfs).astype(np.int64),
        }
    )


def blocks_to_postings(blocks: DataFrame, codec: str = CODEC_VARBYTE) -> DataFrame:
    """Inverse transform: block rows -> (term, doc_id, tf).

    Embarrassingly parallel (base_docid makes every block
    self-decodable — no cross-block chain at read time).
    """
    return blocks.mapInPandas(
        lambda it: (_decode_batch(pdf, codec) for pdf in it),
        "term string, doc_id long, tf long",
    )
