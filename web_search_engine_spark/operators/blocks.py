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

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BLOCK_SIZE, CODEC_VARBYTE
from ..functions import codec as C

BLOCK_SCHEMA = (
    "term string, shard int, block_id int, n int, last_docid long, "
    "base_docid long, max_tf long, doc_bytes binary, freq_bytes binary"
)

# target distinct partition-keys per shuffle partition (see
# build_block_index docstring: bounds hash-assignment stragglers);
# env-overridable for same-window A/B benchmarking
_KEY_OVERSUB = int(os.environ.get("WSE_KEY_OVERSUB", "64"))

# how (shard, term-bucket) keys map to shuffle partitions:
#   salted  — exact round-robin via murmur3-inverted salt values:
#             perfect key balance AND minimal output files
#   oversub — plain hash keys, ~_KEY_OVERSUB keys per partition
#   plain   — plain hash keys, ~1 key per partition (round-2 shape)
_PARTITION_MODE = os.environ.get("WSE_PARTITION_MODE", "salted")

# shuffle-partition multiple for the blocks exchange: n_part =
# defaultParallelism * this. >1 makes tasks finer so the scheduler can
# route around uneven core availability (CPU steal, stragglers) at the
# cost of proportionally more output files per shard dir; 1 keeps
# task count == core count (the default; A/B via scripts/ab_oversub.py)
_PART_MULT = int(os.environ.get("WSE_PART_MULT", "1"))


def _mmh3_int32(value: int, seed: int = 42) -> int:
    """Murmur3 x86_32 of one int32 block — bit-identical to Spark's
    `hash()` / shuffle HashPartitioning on a single int column (seed
    42). Public algorithm (Appleby's MurmurHash3); differentially
    tested against F.hash in tests/test_skew_and_plans.py."""
    m = 0xFFFFFFFF
    k = (value & m) * 0xCC9E2D51 & m
    k = ((k << 15) | (k >> 17)) & m
    k = (k * 0x1B873593) & m
    h = (seed ^ k) & m
    h = ((h << 13) | (h >> 19)) & m
    h = (h * 5 + 0xE6546B64) & m
    h ^= 4  # total bytes hashed
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h  # signed int32


_SALT_CACHE: dict[int, list[int]] = {}


def _identity_salts(n_part: int) -> list[int]:
    """salts[t] = smallest s >= 0 with pmod(murmur3(s), n_part) == t.

    Repartitioning by `salts[key_index % n_part]` therefore sends key
    t's rows to EXACTLY partition t — a deterministic round-robin
    key->partition assignment through Spark's stock hash partitioner
    (no RDD partitioner API, no sampling job). Search cost is O(n_part
    * ln n_part) driver-side int hashing, cached per process."""
    salts = _SALT_CACHE.get(n_part)
    if salts is None:
        salts = [-1] * n_part
        found, s = 0, 0
        while found < n_part:
            t = _mmh3_int32(s) % n_part
            if salts[t] < 0:
                salts[t] = s
                found += 1
            s += 1
        _SALT_CACHE[n_part] = salts
    return salts


def identity_partition_key(shard_col, bucket_col, sub: int, n_part: int):
    """Column expr: round-robin (shard, bucket) keys onto partitions
    via murmur3-inverted salts — key i = shard*sub + bucket goes to
    exactly partition i % n_part when used as the sole
    `repartition(n_part, <this>)` column.

    The salt table rides the plan as an array literal (n_part ints,
    fine up to ~10k partitions; beyond that, ship it as a broadcast
    join against a (key_idx, salt) relation instead)."""
    salts = _identity_salts(n_part)
    key_idx = F.pmod(
        shard_col.cast("long") * sub + bucket_col.cast("long"), F.lit(n_part)
    ).cast("int")
    return F.element_at(F.array(*[F.lit(s) for s in salts]), key_idx + F.lit(1))

def _arrow_block_schema(term_col: str, term_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            (term_col, term_type),
            ("shard", pa.int32()),
            ("block_id", pa.int32()),
            ("n", pa.int32()),
            ("last_docid", pa.int64()),
            ("base_docid", pa.int64()),
            ("max_tf", pa.int64()),
            ("doc_bytes", pa.binary()),
            ("freq_bytes", pa.binary()),
        ]
    )


_ARROW_BLOCK_SCHEMA = _arrow_block_schema("term", pa.string())
# dictionary-encoded build: the shuffle carries term_id (int64, lexical
# rank of the term) instead of the term string — see build_block_index
_ARROW_BLOCK_ID_SCHEMA = _arrow_block_schema("term_id", pa.int64())
BLOCK_ID_SCHEMA = BLOCK_SCHEMA.replace("term string", "term_id long", 1)


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


def _empty_block_batch(schema: pa.Schema = _ARROW_BLOCK_SCHEMA) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [pa.array([], type=f.type) for f in schema], schema=schema
    )


def _binary_from_slices(values: np.ndarray, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy BinaryArray: row b = values[byte_offsets[b]:byte_offsets[b+1]].

    The (values, offsets) pair becomes the Arrow buffers directly — no
    per-block ``bytes(memoryview[...])`` slicing loop (that loop was the
    measured scaling bottleneck of the blocks-write stage). Offsets are
    int32 per the Binary layout; one Arrow batch's payload is far below
    2 GB (batches are bounded by maxRecordsPerBatch and carried groups
    by shard_size postings).
    """
    if byte_offsets[-1] > np.iinfo(np.int32).max:
        raise ValueError("block payload batch exceeds 2 GB Binary offset range")
    offs = np.ascontiguousarray(byte_offsets, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(offs) - 1, [None, pa.py_buffer(offs), pa.py_buffer(values)]
    )


def _group_change_mask(batch: pa.RecordBatch, term_col: str = "term") -> np.ndarray:
    """bool[n-1]: row i+1 starts a new (shard, term) group — computed
    with Arrow kernels, no Python string materialization. term_col is
    'term_id' on the dictionary-encoded path (int64 compares)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    term = batch.column(term_col)
    shard = batch.column("shard")
    chg = pc.or_(
        pc.not_equal(term.slice(1), term.slice(0, n - 1)),
        pc.not_equal(shard.slice(1), shard.slice(0, n - 1)),
    )
    return chg.to_numpy(zero_copy_only=False)


def _encode_arrow(
    batch: pa.RecordBatch,
    block_size: int,
    codec: str,
    term_col: str = "term",
    occurrences: bool = False,
) -> pa.RecordBatch:
    """Arrow-native block builder: one sorted (shard, term, doc_id)
    RecordBatch -> block rows, with payload columns built zero-copy from
    (values-buffer, offsets) pairs. Same block arithmetic and byte
    format as _encode_batch (the pandas spec implementation — tested
    identical). term_col='term_id' runs the identical arithmetic over
    dictionary-encoded int64 term ids.

    occurrences=True is the FUSED single-shuffle build: the batch holds
    one row per raw token occurrence (no tf column), sorted by (shard,
    term, doc_id) — tf aggregation is the run length of equal
    (term, doc_id) in the sorted stream (two numpy diffs), replacing the
    relational groupBy's hash aggregation entirely. The sort makes the
    aggregation free; this is the reference's sorted-runs merge
    (HW2/engine/merger.py tf-summing on merge) done inside the encoder."""
    import pyarrow.compute as pc

    out_schema = (
        _ARROW_BLOCK_SCHEMA if term_col == "term" else _ARROW_BLOCK_ID_SCHEMA
    )
    n = batch.num_rows
    if n == 0:
        return _empty_block_batch(out_schema)
    docids = np.asarray(batch.column("doc_id"), dtype=np.int64)

    row_new_group = np.empty(n, dtype=bool)
    row_new_group[0] = True
    if n > 1:
        row_new_group[1:] = _group_change_mask(batch, term_col)

    if occurrences:
        # collapse runs of equal (group, doc_id) -> one posting with
        # tf = run length; all downstream arithmetic sees postings
        new_posting = row_new_group.copy()
        if n > 1:
            new_posting[1:] |= docids[1:] != docids[:-1]
        take_rows = np.flatnonzero(new_posting)
        tfs = np.diff(np.append(take_rows, n)).astype(np.int64)
        docids = docids[take_rows]
        new_group = row_new_group[take_rows]
        n = len(take_rows)
    else:
        tfs = np.asarray(batch.column("tf"), dtype=np.int64)
        new_group = row_new_group
        take_rows = None
    group_starts = np.flatnonzero(new_group)
    group_of_row = np.cumsum(new_group) - 1
    row_in_group = np.arange(n) - group_starts[group_of_row]

    new_block = new_group | (row_in_group % block_size == 0)
    block_starts = np.flatnonzero(new_block)
    bounds = np.append(block_starts, n)  # len nblocks+1; blocks tile [0, n)
    block_ends = bounds[1:] - 1
    block_id = (row_in_group[block_starts] // block_size).astype(np.int32)
    n_in_block = (bounds[1:] - block_starts).astype(np.int32)
    last_docid = docids[block_ends]
    base_docid = np.where(block_id == 0, 0, docids[np.maximum(block_starts - 1, 0)])
    max_tf = np.maximum.reduceat(tfs, block_starts)

    if codec == CODEC_VARBYTE:
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = docids[0]
        np.subtract(docids[1:], docids[:-1], out=gaps[1:])
        gaps[group_starts] = docids[group_starts]
        if np.any(gaps < 0):
            raise ValueError("postings not sorted by (shard, term, doc_id)")
        doc_buf, doc_lens = C.vb_encode_arrays(gaps.astype(np.uint64))
        freq_buf, freq_lens = C.vb_encode_arrays(tfs.astype(np.uint64))
        doc_bytes = _binary_from_slices(
            doc_buf, np.concatenate(([0], np.cumsum(doc_lens)))[bounds]
        )
        freq_bytes = _binary_from_slices(
            freq_buf, np.concatenate(([0], np.cumsum(freq_lens)))[bounds]
        )
    else:
        d32 = np.ascontiguousarray(docids.astype("<u4")).view(np.uint8)
        f32 = np.ascontiguousarray(tfs.astype("<u4")).view(np.uint8)
        doc_bytes = _binary_from_slices(d32, bounds * 4)
        freq_bytes = _binary_from_slices(f32, bounds * 4)

    idx = pa.array(
        block_starts if take_rows is None else take_rows[block_starts]
    )
    return pa.RecordBatch.from_arrays(
        [
            pc.take(batch.column(term_col), idx).cast(out_schema.field(0).type),
            pc.take(batch.column("shard"), idx).cast(pa.int32()),
            pa.array(block_id),
            pa.array(n_in_block),
            pa.array(last_docid),
            pa.array(base_docid.astype(np.int64)),
            pa.array(max_tf.astype(np.int64)),
            doc_bytes,
            freq_bytes,
        ],
        schema=out_schema,
    )


def _block_builder(
    block_size: int,
    codec: str,
    term_col: str = "term",
    occurrences: bool = False,
):
    """mapInArrow function: stream RecordBatches, carry the trailing
    (shard, term) group so a group split across Arrow batches is
    encoded exactly once. All slicing is zero-copy Arrow."""

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        leftover: pa.RecordBatch | None = None
        for batch in batches:
            if leftover is not None and leftover.num_rows:
                batch = (
                    pa.Table.from_batches([leftover, batch])
                    .combine_chunks()
                    .to_batches(max_chunksize=None)[0]
                )
            n = batch.num_rows
            if n == 0:
                continue
            # hold back the final group — it may continue in the next batch
            if n > 1:
                starts = np.flatnonzero(_group_change_mask(batch, term_col))
                cut = int(starts[-1]) + 1 if len(starts) else 0
            else:
                cut = 0
            leftover = batch.slice(cut)
            if cut:
                yield _encode_arrow(
                    batch.slice(0, cut), block_size, codec, term_col, occurrences
                )
        if leftover is not None and leftover.num_rows:
            yield _encode_arrow(leftover, block_size, codec, term_col, occurrences)

    return build


def build_block_index(
    postings: DataFrame,
    block_size: int = BLOCK_SIZE,
    codec: str = CODEC_VARBYTE,
    shard_size: int | None = None,
    num_partitions: int | None = None,
    shards_hint: int | None = None,
    term_col: str = "term",
    from_occurrences: bool = False,
) -> DataFrame:
    """(term, doc_id, tf) -> block rows (BLOCK_SCHEMA).

    from_occurrences=True is the FUSED SINGLE-SHUFFLE build: input is
    raw (term, doc_id) token occurrences (one row per token, NO tf
    column, duplicates expected). The occurrences are exchanged ONCE on
    the salted key and sorted by (shard, term, doc_id); the encoder
    collapses runs of equal (term, doc_id) into tf counts as it streams
    (see _encode_arrow). Relative to build_postings -> build_block_index
    this moves the un-deduplicated token stream through the exchange
    (~1.6-1.9x the rows of the aggregated postings) but ELIMINATES both
    hash aggregations (whose spill traffic is GBs at corpus scale), the
    second corpus-sized exchange, and the postings cache round-trip —
    the sorted-run architecture of the reference build taken literally
    (HW2/engine/build_runs_mp.py sorted runs; merger.py tf-sum on
    merge), with the shuffle as the run exchange.

    term_col='term_id' is the DICTIONARY-ENCODED build (see
    build_term_dictionary): input is (term_id, doc_id, tf) where
    term_id is the lexical rank of the term, output is BLOCK_ID_SCHEMA
    rows. Because ids are lexical, the within-partition sort on
    (shard, term_id, doc_id) clusters terms exactly as the string sort
    would, so after the strings are joined back the block TABLE is
    row-identical to the string build — payload bytes included — and
    every written file stays lexically term-clustered for row-group
    pruning (differentially tested; term->partition bucketing hashes
    the id, so file-level grouping may differ). The win: the
    corpus-sized shuffle carries an int64 instead of a term string —
    smaller exchange payload, fixed-width sort keys, int group-change
    compares in the encoder.

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

    The term BUCKET (xxhash64(term) % sub) keeps two properties at
    once: when shards >> cores (the 100 TB regime) sub collapses to 1
    and each task holds whole shards, so the partitioned write emits
    O(1) files per shard dir (never the tasks x shards small-file
    blowup); when shards < cores (small indexes) the buckets restore
    full write parallelism at the cost of min(sub, n_part) files per
    shard dir.

    KEY->PARTITION ASSIGNMENT (round 3): hash repartitioning assigns
    KEYS to partitions randomly, so with distinct (shard, bucket) keys
    ~= the partition count the max-loaded partition carries ~3x the
    mean (balls in bins) and the encode/write stage runs on a fraction
    of the cores, while oversubscribing keys (many buckets) multiplies
    output files per task. The default 'salted' mode escapes the
    trade-off: key index i = shard * sub + bucket is round-robined to
    target partition t = i % n_part by repartitioning on a SALT value
    precomputed to murmur3-hash onto exactly t (_identity_salts) —
    perfect key balance with only a few keys per partition and O(keys)
    total output files. 'oversub' / 'plain' keep the stock hash
    assignment (~_KEY_OVERSUB / ~1 keys per partition) for same-window
    A/B comparison (scripts/ab_oversub.py).
    """
    spark = postings.sparkSession
    if shard_size:
        sharded = postings.withColumn(
            "shard", (F.col("doc_id") / F.lit(int(shard_size))).cast("int")
        )
    else:
        sharded = postings.withColumn("shard", F.lit(0).cast("int"))
    n_part = num_partitions or (
        spark.sparkContext.defaultParallelism * _PART_MULT
    )
    shards = max(1, shards_hint or 1)
    if _PARTITION_MODE == "salted":
        # a few keys per partition smooths per-bucket byte skew; exact
        # balance comes from the round-robin, not the key count
        sub = max(1, (4 * n_part + shards - 1) // shards)
        pk = identity_partition_key(
            F.col("shard"), F.pmod(F.xxhash64(term_col), F.lit(sub)), sub, n_part
        )
        ordered = sharded.repartition(n_part, pk)
    else:
        oversub = _KEY_OVERSUB if _PARTITION_MODE == "oversub" else 1
        sub = max(1, (oversub * n_part + shards - 1) // shards)
        ordered = sharded.repartition(
            n_part, "shard", F.pmod(F.xxhash64(term_col), F.lit(sub))
        )
    ordered = ordered.sortWithinPartitions("shard", term_col, "doc_id")
    out_schema = BLOCK_SCHEMA if term_col == "term" else BLOCK_ID_SCHEMA
    return ordered.mapInArrow(
        _block_builder(block_size, codec, term_col, from_occurrences), out_schema
    )


def _vb_hex_expr(v):
    """Catalyst expression: hex string of the varbyte encoding of a
    non-negative long `v` — little-endian 7-bit groups, MSB (0x80) on
    the LAST byte (functions/codec.py / HW2/engine/listio.py:229-321).

    Byte j exists iff j == 0 or v >= 2^(7j); it is the last byte iff
    v < 2^(7(j+1)) (always true at j=8: every long < 2^63). Each byte
    renders as two hex digits; unhex() of the concatenation is the
    payload. All-JVM: no Python worker, no Arrow crossing.
    """
    parts = []
    for j in range(9):
        byte = F.shiftright(v, 7 * j).bitwiseAND(F.lit(127))
        if j == 8:
            byte_val = byte + F.lit(128)
        else:
            byte_val = byte + F.when(
                v < F.lit(1 << (7 * (j + 1))), F.lit(128)
            ).otherwise(F.lit(0))
        piece = F.lpad(F.hex(byte_val), 2, "0")
        if j == 0:
            parts.append(piece)
        else:
            parts.append(
                F.when(v >= F.lit(1 << (7 * j)), piece).otherwise(F.lit(""))
            )
    return F.concat(*parts)


def _u4_hex_expr(v):
    """Catalyst expression: hex of `v` as a little-endian uint32 (the
    raw codec, functions/codec.py raw_encode)."""
    return F.concat(
        *[
            F.lpad(F.hex(F.shiftright(v, 8 * k).bitwiseAND(F.lit(255))), 2, "0")
            for k in range(4)
        ]
    )


def build_block_index_sql(
    postings: DataFrame,
    block_size: int = BLOCK_SIZE,
    codec: str = CODEC_VARBYTE,
    shard_size: int | None = None,
) -> DataFrame:
    """(term, doc_id, tf) -> block rows with the ENCODE entirely
    JVM-side — zero Python workers, zero Arrow crossings in the reduce
    stage (the round-4 scaling forensics isolated the mapInArrow
    encode's Python/Arrow boundary as a non-scaling residual; this is
    the A/B that answers it).

    Shape: groupBy(shard, term) collects each group's postings into a
    doc_id-sorted array (ObjectHashAggregate, one exchange — the same
    logical merge as the mapInArrow build's repartition+sort), then
    pure column expressions chunk the array into <=block_size blocks
    (transform + slice + posexplode) and render the delta-gap varbyte
    payloads as hex strings folded through unhex (_vb_hex_expr). Output
    rows are byte-identical to build_block_index (differentially
    tested).

    Trade-offs vs the mapInArrow build, by design:
      - group arrays are bounded by shard_size postings (the same skew
        bound), ~16 B/posting of agg buffer;
      - output partitioning is hash(shard, term), so a partitionBy
        write would emit tasks x shards files; the caller re-applies
        the salted identity repartition over the (index-sized, ~10x
        smaller than postings) block rows before writing;
      - per-element work runs through Catalyst higher-order functions
        (interpreted per element, but JVM-threaded — the point of the
        A/B is whether removing the Python boundary beats the numpy
        kernel's per-core speed at scale).
    """
    if shard_size:
        sharded = postings.withColumn(
            "shard", (F.col("doc_id") / F.lit(int(shard_size))).cast("int")
        )
    else:
        sharded = postings.withColumn("shard", F.lit(0).cast("int"))
    bs = int(block_size)
    grouped = sharded.groupBy("shard", "term").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("ps")
    )
    blocks = grouped.select(
        "term",
        "shard",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("ps") - F.lit(1)) / F.lit(bs)).cast("int"),
                ),
                lambda i: F.struct(
                    F.slice("ps", i * bs + 1, bs).alias("chunk"),
                    F.when(i == F.lit(0), F.lit(0).cast("long"))
                    .otherwise(
                        F.element_at(
                            F.col("ps"), F.greatest(i * bs, F.lit(1))
                        )["doc_id"]
                    )
                    .alias("base"),
                ),
            )
        ).alias("block_id", "blk"),
    )
    chunk = F.col("blk")["chunk"]
    base = F.col("blk")["base"]
    # gaps: continuous delta chain — first gap of block b>0 is the diff
    # against the previous block's last docid (= base), block 0 starts
    # absolute from base 0 (same spec as _encode_arrow)
    gaps = F.transform(
        chunk,
        lambda x, j: x["doc_id"]
        - F.when(j == F.lit(0), base).otherwise(
            F.element_at(chunk, F.greatest(j, F.lit(1)))["doc_id"]
        ),
    )
    if codec == CODEC_VARBYTE:
        doc_hex = F.array_join(F.transform(gaps, _vb_hex_expr), "")
        freq_hex = F.array_join(
            F.transform(chunk, lambda x: _vb_hex_expr(x["tf"])), ""
        )
    else:
        doc_hex = F.array_join(
            F.transform(chunk, lambda x: _u4_hex_expr(x["doc_id"])), ""
        )
        freq_hex = F.array_join(
            F.transform(chunk, lambda x: _u4_hex_expr(x["tf"])), ""
        )
    return blocks.select(
        "term",
        "shard",
        F.col("block_id").cast("int").alias("block_id"),
        F.size(chunk).cast("int").alias("n"),
        F.element_at(chunk, -1)["doc_id"].cast("long").alias("last_docid"),
        base.cast("long").alias("base_docid"),
        F.array_max(chunk["tf"]).cast("long").alias("max_tf"),
        F.unhex(doc_hex).alias("doc_bytes"),
        F.unhex(freq_hex).alias("freq_bytes"),
    )


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


_ARROW_POSTING_SCHEMA = pa.schema(
    [("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64())]
)


def _flat_binary(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated payload bytes, per-row offsets rebased to 0) for a
    null-free Binary/LargeBinary array (possibly sliced). Arrow binary
    offsets are monotonic, so row payloads concatenated in row order ARE
    the contiguous values-buffer slice — read zero-copy."""
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    vals = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return vals[off[0] : off[-1]], off - off[0]


def _decode_arrow(batch: pa.RecordBatch, codec: str) -> pa.RecordBatch:
    """Vectorized inverse of _encode_arrow: ALL blocks of a batch decode
    in two codec calls over the concatenated payload buffers; per-block
    delta chains are re-based with one segmented cumsum. The only
    per-row work is an Arrow take() for the repeated term column."""
    import pyarrow.compute as pc

    nb = batch.num_rows
    if nb == 0:
        return pa.RecordBatch.from_arrays(
            [pa.array([], type=f.type) for f in _ARROW_POSTING_SCHEMA],
            schema=_ARROW_POSTING_SCHEMA,
        )
    n_per = np.asarray(batch.column("n"), dtype=np.int64)
    bases = np.asarray(batch.column("base_docid"), dtype=np.int64)
    total = int(n_per.sum())
    starts = np.concatenate(([0], np.cumsum(n_per)))  # len nb+1
    doc_flat, _ = _flat_binary(batch.column("doc_bytes"))
    freq_flat, _ = _flat_binary(batch.column("freq_bytes"))
    if codec == CODEC_VARBYTE:
        gaps = C.vb_decode(doc_flat).astype(np.int64)
        tfs = C.vb_decode(freq_flat).astype(np.int64)
        if len(gaps) != total or len(tfs) != total:
            raise ValueError("corrupt block payloads: posting count mismatch")
        csum = np.cumsum(gaps)
        # docid[i] = base_b + (csum[i] - csum[start_b - 1]); vectorized
        # as csum + repeat(per-block rebase constant)
        before = np.where(starts[:-1] > 0, csum[starts[:-1] - 1], 0)
        docids = csum + np.repeat(bases - before, n_per)
    else:
        docids = doc_flat.view("<u4").astype(np.int64)
        tfs = freq_flat.view("<u4").astype(np.int64)
        if len(docids) != total or len(tfs) != total:
            raise ValueError("corrupt block payloads: posting count mismatch")
    indices = pa.array(np.repeat(np.arange(nb), n_per))
    return pa.RecordBatch.from_arrays(
        [
            pc.take(batch.column("term"), indices).cast(pa.string()),
            pa.array(docids),
            pa.array(tfs),
        ],
        schema=_ARROW_POSTING_SCHEMA,
    )


def blocks_to_postings(blocks: DataFrame, codec: str = CODEC_VARBYTE) -> DataFrame:
    """Inverse transform: block rows -> (term, doc_id, tf).

    Embarrassingly parallel (base_docid makes every block
    self-decodable — no cross-block chain at read time).
    """
    return blocks.mapInArrow(
        lambda it: (_decode_arrow(b, codec) for b in it),
        "term string, doc_id long, tf long",
    )
