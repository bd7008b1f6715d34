"""End-to-end resumable index build.

Replaces the reference's three CLI stages (build_runs_mp -> parallel_merge
-> merger, SURVEY.md §3.1) with one declarative pipeline:

  read source -> assign dense docids -> tokenize ONCE -> explode ->
  groupBy(term, doc_id).count() [persisted postings] -> salted identity
  repartition (shard, term-bucket) + sortWithinPartitions + mapInArrow
  block build -> parquet; docs_meta (dl + sha256 + lineage) derives dl
  from the persisted postings (SUM(tf) per doc == the token count by
  definition; dl=0 docs rejoin via left join)

Pass discipline (this is what scales): the SOURCE ROWS are read once and
cached (assign_doc_ids_counted persists its range-partitioned input;
unpersisted at the end of the build) and large corpora are TOKENIZED
ONCE per build (auto-selected above _DL_AUTO_MIN_DOCS — a rule round 4
re-confirmed in-sequence after the Arrow fix; WSE_DL_SOURCE forces
either shape). The only corpus-sized shuffles are the postings
aggregation and the blocks exchange itself.

Job discipline: every Spark action costs seconds of fixed scheduling
latency regardless of cluster size, so the build runs exactly FOUR jobs
regardless of index size: (1) doc-id offsets count, (2) blocks write,
(3) docs_meta write, (4) incremental lexicon merge. Per-shard manifest
metrics ride the write jobs as Observation metrics (no post-hoc re-read
of just-written parquet), the manifest append and stats.json are
driver-side metadata writes (exactly how Iceberg commits manifest
files), and corpus stats aggregate over manifest rows, not over data.

Resumability (north rule): the SHARD (a doc_id range) is the checkpoint
unit. Every attempt writes only the shards missing from manifest/, using
dynamic partition overwrite (partial output from a killed attempt is
replaced wholesale; completed shards are never touched or re-tokenized).
A shard's manifest row is appended only after its data is fully written,
with lineage (row counts, Σdl, build seconds) + codec config. Resume
validates codec/block_size against the manifest and adopts the recorded
shard_size (mixing incompatible shards fails fast instead of silently).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..config import BLOCK_SIZE, CODEC_VARBYTE
from ..operators.blocks import (
    _PART_MULT,
    build_block_index,
    build_block_index_sql,
    identity_partition_key,
    lexicon_from_blocks,
)
from ..operators.postings import (
    assign_doc_ids_counted,
    build_postings,
    build_postings_mapcombine,
    build_term_dictionary,
    with_tokens,
)
from ..sources.catalog import IndexCatalog, read_stats, write_stats

# Above this many pending shards the per-shard conditional Observation
# aggregates get wide; fall back to one tiny post-hoc aggregation job.
OBSERVE_MAX_SHARDS = 64

# doc-length derivation for docs_meta: "postings" reuses the cached
# postings relation (dl = SUM(tf) per doc — definitionally equal to the
# token count) so the corpus is TOKENIZED ONCE per build; "tokenize"
# re-tokenizes (second fully-parallel map pass, no extra shuffle).
# "auto" picks by corpus size — re-confirmed by a round-4 in-sequence
# A/B after the Arrow fix (see the resolution-site comment).
_DL_SOURCE = os.environ.get("WSE_DL_SOURCE", "auto")
_DL_AUTO_MIN_DOCS = 200_000

# dictionary-encoded block build: replace the term string with its dense
# lexical rank (int64) BEFORE the corpus-sized blocks shuffle, and join
# the strings back onto the (tiny) block rows after encoding. The block
# table comes out row-identical with files still term-clustered (lexical
# ids sort exactly like the strings — see blocks.build_block_index); the
# exchange payload and the sort keys
# shrink to fixed-width ints, which is where the bandwidth-bound
# sort+encode stage spends its time. MEASURED NEGATIVE at sandbox scale
# (BENCH.md round 4): with the synthetic corpus's 450-term vocabulary the
# lz4 shuffle compresses repeated short strings as well as int64 ids
# (exchange bytes unchanged, 383 vs 386 MB), the sort+encode stage CPU
# drops only ~17%, and the broadcast map join adds more than that back —
# so the DEFAULT IS OFF. "auto"/"on" keep the path available (with the
# bit-identical differential test) for corpora where it pays: large
# vocabularies of long terms, where the string payload dominates the
# exchange and dictionary pages can't absorb it.
_TERM_DICT = os.environ.get("WSE_TERM_DICT", "off")
_TERM_DICT_MAX_VOCAB = int(
    os.environ.get("WSE_TERM_DICT_MAX_VOCAB", str(2_000_000))
)

# build pipeline shape:
#   "agg"   — explode -> hash-aggregated postings -> second exchange ->
#             sort + encode (two corpus-sized shuffles; postings cached
#             and reused for dl when dl_source=postings)
#   "fused" — single-shuffle: raw token occurrences exchanged once on
#             the salted key, sorted, tf aggregated as run lengths in
#             the encoder (blocks.build_block_index from_occurrences).
#             No hash aggs, no second exchange, no postings cache; dl
#             comes from the tokenize pass. See BENCH.md round 4 for the
#             measured comparison.
#   "mapcombine" — ONE mapInArrow pass does tokenize + per-doc tf
#             counting + dl + sha256 (postings.build_postings_mapcombine);
#             sentinel rows carry docs_meta. No explode, no hash aggs,
#             no dl join anywhere: the blocks exchange is the only
#             corpus-sized shuffle left, and docs_meta is a filter of
#             the persisted fused relation. See BENCH.md round 4.
#   "sqlenc" — the agg pipeline with the block ENCODE entirely JVM-side
#             (blocks.build_block_index_sql: collect_list + higher-order
#             functions + hex/unhex varbyte) — zero Python workers and
#             zero Arrow crossings in the reduce stage. The round-5
#             scaling A/B answering VERDICT r4 #2; byte-identical rows
#             (differentially tested). Incompatible with WSE_TERM_DICT=on.
_BUILD_MODE = os.environ.get("WSE_BUILD_MODE", "agg")

# corpus tokenizer for the build (operators/postings.with_tokens):
#   "pandas" — DEFAULT: every row through the Arrow pandas_udf.
#   "split"  — JVM regexp codegen for ASCII entity-free rows,
#              pandas_udf only for rows that can need Python cleanup
#              (NULL / '&' / non-ASCII). Row-identical to "pandas"
#              (tests/test_tokenizer.py::test_split_tokenizer_matches_pandas).
#   "sql"    — every row pure JVM (diverges on HTML entities).
# The default is "pandas" because the same-window A/B (BENCH.md round
# 4, scripts/probe_tokenizer_ab.py) measured the JVM regexp path
# SLOWER at BOTH parallelism levels (1.5M-doc datapath: 94.7 vs
# 123.5 s at 4 cores, 35.1 vs 59.3 s at 16) — java.util.regex loses
# more than the Python worker boundary costs. "split" stays available
# for corpora where the regex balance differs.
_TOKENIZER = os.environ.get("WSE_TOKENIZER", "pandas")

# how the per-doc dl (SUM tf over the persisted postings) joins back
# onto the source rows for docs_meta:
#   "auto"      — broadcast below _DL_BROADCAST_MAX_DOCS, else shuffle
#   "broadcast" — force broadcast-hash (dl side = n_docs rows of
#                 (long, long); Catalyst can't SEE that the agg output
#                 is join-key-unique and small, so it plans sort-merge
#                 with two exchanges + sorts unless told)
#   "shuffle"   — force the stock sort-merge (the 100-TB shape: at
#                 billions of docs the dl relation outgrows the driver)
_DL_JOIN = os.environ.get("WSE_DL_JOIN", "auto")
# 16 B/row -> ~320 MB broadcast at the cap; beyond that the executors'
# and driver's memory pay more than the avoided exchange
_DL_BROADCAST_MAX_DOCS = int(
    os.environ.get("WSE_DL_BROADCAST_MAX_DOCS", str(20_000_000))
)

# physical plan for the dl aggregation itself (SUM(tf) GROUP BY doc_id
# over the persisted postings — the docs_meta stage's dominant cost,
# BENCH.md round-5 decomposition):
#   "partial"     — the stock plan: partial hash agg on the
#                 (term,doc_id)-hashed postings, exchange, final agg.
#                 At high parallelism the partial agg is structurally
#                 anti-scaling: each map task's hash map holds up to
#                 n_docs entries and emits ~one row per key per
#                 PARTITION, so exchanged rows grow as P x n_docs.
#   "repartition" — project to the 16-byte (doc_id, tf) rows and
#                 hash-repartition them by doc_id FIRST: the exchange
#                 is a constant |postings| compact rows regardless of
#                 P, and every agg map shrinks to n_docs/P entries.
#                 Measured 1.04 pair efficiency 4->16 cores vs 0.46
#                 for "partial" (scripts/probe_docsmeta.py) — the
#                 1000-executor plan.
#   "auto"        — partial only while it still reduces the exchange
#                 >= 2x (P x n_docs <= |postings| / 2, i.e. narrow
#                 parallelism relative to avgdl); repartition
#                 otherwise. |postings| comes from the blocks-stage
#                 Observation already paid for; without it (>64
#                 pending shards) wide parallelism implies the
#                 repartition plan.
_DL_AGG = os.environ.get("WSE_DL_AGG", "auto")

# encode/write task sizing: ~this many docs' worth of postings per
# blocks-encode or docs_meta-write task. The task count is derived from
# the docs actually tokenized in THIS pass (scale-adaptive, guide §2):
# floor = one task per pending shard (the partitioned writes key on
# shard), cap = the session's parallelism — at corpus scale the cap
# binds and the plan is unchanged; at tiny scale this collapses 32
# near-empty tasks (and their per-file open/commit overhead: ~128
# output files for 5k docs) into a handful. The BYTE term protects
# few-large-documents corpora (100 docs x 10 MB must not encode on
# len(pending) tasks): the optimizer's size estimate, pro-rated to the
# pending fraction, adds ~1 task per _BYTES_PER_WRITE_TASK of source.
_DOCS_PER_WRITE_TASK = int(os.environ.get("WSE_DOCS_PER_WRITE_TASK", "1000"))
_BYTES_PER_WRITE_TASK = int(
    os.environ.get("WSE_BYTES_PER_WRITE_TASK", str(1 << 20))
)


def _action_timer():
    """WSE_BUILD_TIMINGS=1 -> print per-action wall times (the build is
    exactly 4 Spark actions; this attributes wall clock to each for
    scaling diagnosis with zero overhead when off)."""
    if os.environ.get("WSE_BUILD_TIMINGS") != "1":
        return lambda label: None
    state = {"t": time.perf_counter()}

    def mark(label: str) -> None:
        now = time.perf_counter()
        print(f"BUILD_TIMING {label} {now - state['t']:.3f}", flush=True)
        state["t"] = now

    return mark

_MANIFEST_COLS = [
    "shard", "n_docs", "sum_dl", "n_postings", "n_blocks",
    "build_sec", "finished_unix", "codec", "block_size", "shard_size",
]


def _read_manifest_rows(index_dir: str) -> list[dict]:
    """Driver-side metadata read of manifest/ (tiny: one row per shard).

    Uses pyarrow directly — the resume probe and corpus-stats rollup
    must not cost a Spark job each. Falls back to empty on a fresh dir.
    """
    path = os.path.join(index_dir, "manifest")
    if not os.path.isdir(path):
        return []
    try:
        import pyarrow.dataset as pads

        return pads.dataset(path, format="parquet").to_table().to_pylist()
    except Exception:
        return []


def _append_manifest_rows(index_dir: str, rows: list[dict]) -> None:
    """Driver-side manifest commit (the Iceberg-manifest analog): one
    small parquet file per completed attempt, appended after the shard
    data is durable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(index_dir, "manifest")
    os.makedirs(path, exist_ok=True)
    schema = pa.schema(
        [
            ("shard", pa.int32()),
            ("n_docs", pa.int64()),
            ("sum_dl", pa.int64()),
            ("n_postings", pa.int64()),
            ("n_blocks", pa.int64()),
            ("build_sec", pa.float64()),
            ("finished_unix", pa.float64()),
            ("codec", pa.string()),
            ("block_size", pa.int32()),
            ("shard_size", pa.int32()),
        ]
    )
    tbl = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(tbl, os.path.join(path, f"part-{uuid.uuid4().hex}.parquet"))


# driver-side lexicon merge threshold: when the delta's block-row count
# (from parquet FOOTERS only — no payload read) is at or below this, the
# merge aggregates driver-side via pyarrow instead of running a Spark
# job (~0.35 s of scan/agg/write job latency at bench scale for a
# few-hundred-row aggregate). Above it — the corpus-scale case — the
# Spark path runs unchanged. File-count short-circuit: past
# _LEXICON_DRIVER_MAX_FILES footers the footer census itself is no
# longer cheap, so skip straight to Spark.
_LEXICON_DRIVER_MAX_BLOCKS = int(
    os.environ.get("WSE_LEXICON_DRIVER_MAX_BLOCKS", str(262_144))
)
_LEXICON_DRIVER_MAX_FILES = 256


def _lexicon_delta_files(
    blocks_dir: str, new_shards: list[int] | None
) -> list[str] | None:
    """Block data files the merge must read, or None when the layout is
    not a plain local shard=N/ tree (fall back to the Spark reader)."""
    if not os.path.isdir(blocks_dir):
        return None
    out: list[str] = []
    if new_shards is None:
        shard_dirs = [
            d for d in sorted(os.listdir(blocks_dir)) if d.startswith("shard=")
        ]
    else:
        shard_dirs = [f"shard={s}" for s in new_shards]
    for d in shard_dirs:
        full = os.path.join(blocks_dir, d)
        if not os.path.isdir(full):
            return None
        out.extend(
            os.path.join(full, f)
            for f in sorted(os.listdir(full))
            if f.endswith(".parquet")
        )
    return out


def _merge_lexicon_driver(
    index_dir: str, files: list[str], fold_old: bool
) -> None:
    """Driver-side merge: aggregate (term, n, max_tf) over ``files`` with
    pyarrow, fold into the existing lexicon when ``fold_old`` (the
    append case; a full rebuild ignores any stale table), atomic-swap.
    Sums/maxes of integers are order-independent, so the table is
    row-identical to the Spark aggregation (differentially tested)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as pads

    lex_dir = os.path.join(index_dir, "lexicon")
    if files:
        tbl = pads.dataset(files, format="parquet").to_table(
            columns=["term", "n", "max_tf"]
        )
        pdf = tbl.to_pandas()
        agg = pdf.groupby("term", sort=False).agg(
            df=("n", "sum"), nblocks=("n", "size"), max_tf=("max_tf", "max")
        )
    else:
        agg = pd.DataFrame(
            {"df": [], "nblocks": [], "max_tf": []},
            index=pd.Index([], name="term"),
        )
    if fold_old:
        old = (
            pads.dataset(lex_dir, format="parquet")
            .to_table(columns=["term", "df", "nblocks", "max_tf"])
            .to_pandas()
            .set_index("term")
        )
        both = old.add(agg, fill_value=0)  # aligned elementwise sum
        # max_tf merges by MAX, not sum — recompute it from the inputs
        both["max_tf"] = old["max_tf"].combine(
            agg["max_tf"], max, fill_value=0
        )
        agg = both
    agg = agg.reset_index()
    out = pa.table(
        {
            "term": pa.array(agg["term"].astype(str) if len(agg) else [], type=pa.string()),
            "df": pa.array(agg["df"].astype("int64"), type=pa.int64()),
            "nblocks": pa.array(
                agg["nblocks"].astype("int32"), type=pa.int32()
            ),
            "max_tf": pa.array(
                agg["max_tf"].astype("int64"), type=pa.int64()
            ),
        }
    )
    import pyarrow.parquet as pq

    tmp_dir = lex_dir + "_tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    pq.write_table(out, os.path.join(tmp_dir, f"part-{uuid.uuid4().hex}.parquet"))
    if os.path.isdir(lex_dir):
        shutil.rmtree(lex_dir)
    os.rename(tmp_dir, lex_dir)


def merge_lexicon(
    spark: SparkSession, index_dir: str, new_shards: list[int] | None
) -> list[str]:
    """Rewrite lexicon/ = existing lexicon ⊕ lexicon of ``new_shards``.

    The lexicon merge is ADDITIVE on (df, nblocks) and MAX on max_tf, so
    an append only has to aggregate the NEW shards' blocks and fold them
    into the existing table — O(delta), not O(index). ``new_shards=None``
    forces a full rebuild from all blocks (also the fallback when no
    lexicon exists yet, e.g. after a crash mid-swap: the lexicon is
    derived state and always reconstructible).

    Small deltas (<= _LEXICON_DRIVER_MAX_BLOCKS block rows by footer
    census) merge DRIVER-SIDE via pyarrow — the aggregate is a few
    hundred rows and the Spark job around it was pure latency; the
    Spark path is unchanged for corpus-scale deltas.

    Returns the list of block data files the merge read — tests assert
    an append touched only the new shards' files.
    """
    blocks_dir = os.path.join(index_dir, "blocks")
    lex_dir = os.path.join(index_dir, "lexicon")
    have_old = os.path.isdir(lex_dir)
    if new_shards is not None and have_old and not new_shards:
        return []  # nothing new, existing lexicon already correct

    files = _lexicon_delta_files(
        blocks_dir, None if (new_shards is None or not have_old) else new_shards
    )
    if files is not None and len(files) <= _LEXICON_DRIVER_MAX_FILES:
        try:
            import pyarrow.parquet as pq

            n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        except Exception:
            n_rows = None
        if n_rows is not None and n_rows <= _LEXICON_DRIVER_MAX_BLOCKS:
            _merge_lexicon_driver(
                index_dir, files, have_old and new_shards is not None
            )
            return files

    if new_shards is None or not have_old:
        delta_blocks = spark.read.parquet(blocks_dir)
        merged = lexicon_from_blocks(delta_blocks)
    else:
        paths = [os.path.join(blocks_dir, f"shard={s}") for s in new_shards]
        delta_blocks = spark.read.option("basePath", blocks_dir).parquet(*paths)
        delta = lexicon_from_blocks(delta_blocks)
        old = spark.read.parquet(lex_dir)
        merged = (
            old.unionByName(delta)
            .groupBy("term")
            .agg(
                F.sum("df").cast("long").alias("df"),
                F.sum("nblocks").cast("int").alias("nblocks"),
                F.max("max_tf").cast("long").alias("max_tf"),
            )
        )

    # write-new-then-swap: Spark cannot overwrite a path it is reading
    tmp_dir = lex_dir + "_tmp"
    merged.write.mode("overwrite").parquet(tmp_dir)
    if have_old:
        shutil.rmtree(lex_dir)
    os.rename(tmp_dir, lex_dir)
    return list(delta_blocks.inputFiles())


def _per_shard_observe_exprs(pending: list[int], kind: str):
    exprs = []
    for s in pending:
        is_s = F.col("shard") == s
        if kind == "docs":
            exprs.append(F.count(F.when(is_s, F.lit(1))).alias(f"n_{s}"))
            exprs.append(
                F.coalesce(F.sum(F.when(is_s, F.col("dl"))), F.lit(0)).alias(f"dl_{s}")
            )
        else:
            exprs.append(
                F.coalesce(F.sum(F.when(is_s, F.col("n"))), F.lit(0)).alias(f"p_{s}")
            )
            exprs.append(F.count(F.when(is_s, F.lit(1))).alias(f"b_{s}"))
    return exprs


def _write_empty_index(
    spark: SparkSession,
    index_dir: str,
    docs_meta: DataFrame,
    codec: str,
    block_size: int,
    shard_size: int,
) -> IndexCatalog:
    """n_docs == 0: commit a clean empty index (schema'd tables + stats)
    instead of crashing on a missing blocks/ dir later."""
    from ..operators.blocks import BLOCK_SCHEMA

    # non-partitioned writes: a dynamic partitionBy of an empty frame
    # writes no files and the tables would be unreadable
    docs_meta.write.mode("overwrite").parquet(os.path.join(index_dir, "docs_meta"))
    spark.createDataFrame([], BLOCK_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(index_dir, "blocks")
    )
    spark.createDataFrame(
        [], "term string, df long, nblocks int, max_tf long"
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "lexicon"))
    write_stats(
        index_dir,
        {
            "n_docs": 0,
            "avgdl": 0.0,
            "codec": codec,
            "block_size": block_size,
            "shard_size": shard_size,
            "built_unix": time.time(),
        },
    )
    return IndexCatalog(spark, index_dir)


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    codec: str = CODEC_VARBYTE,
    block_size: int = BLOCK_SIZE,
    num_shards: int = 8,
    tokenizer: str | None = None,
    key_cols: tuple[str, ...] = ("repo", "path"),
    text_col: str = "content",
    resume: bool = True,
) -> IndexCatalog:
    """Build (or resume) the blocked index under ``index_dir``.

    tokenizer=None resolves to the WSE_TOKENIZER env knob (default
    "pandas" — see _TOKENIZER above); pass "pandas"/"sql"/"split"
    explicitly to pin a path.
    """
    t_start = time.time()
    if tokenizer is None:
        tokenizer = _TOKENIZER
    # validate env knobs up front, not inside the branch that happens to
    # read them — a typo'd value must fail every build shape loudly, not
    # only the shapes that reach that branch
    if _DL_AGG not in ("auto", "partial", "repartition"):
        raise ValueError(
            f"WSE_DL_AGG must be auto|partial|repartition, got {_DL_AGG!r}"
        )
    if _DL_JOIN not in ("auto", "broadcast", "shuffle"):
        raise ValueError(
            f"WSE_DL_JOIN must be auto|broadcast|shuffle, got {_DL_JOIN!r}"
        )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    prior = _read_manifest_rows(index_dir) if resume else []
    if prior:
        rec_codec = prior[0]["codec"]
        rec_block = int(prior[0]["block_size"])
        if rec_codec != codec or rec_block != block_size:
            raise ValueError(
                f"resume config mismatch: index at {index_dir} was built with "
                f"codec={rec_codec!r} block_size={rec_block}, invoked with "
                f"codec={codec!r} block_size={block_size}; pass resume=False "
                f"to rebuild or match the recorded config"
            )

    # Deterministic docids: dense rank over the natural key — identical
    # across resume attempts (SURVEY.md §1.3). The count is a byproduct.
    mark = _action_timer()
    docs, n_docs, cached_src = assign_doc_ids_counted(source, list(key_cols))
    mark("count_assign_ids")
    try:
        if prior:
            # adopt the recorded shard geometry: doc_id->shard must not
            # move for already-committed shards (manifest is the backup
            # authority if the attempt died before stats.json landed)
            try:
                shard_size = int(read_stats(index_dir)["shard_size"])
            except FileNotFoundError:
                shard_size = int(prior[0]["shard_size"])
        else:
            shard_size = max(1, -(-n_docs // num_shards))  # ceil

        docs = docs.withColumn(
            "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int")
        )

        meta_cols = [c for c in ("commit", "lang") if c in source.columns]

        if n_docs == 0:
            empty_meta = with_tokens(docs, text_col, method=tokenizer).select(
                "shard", "doc_id", *key_cols, *meta_cols,
                F.size("tokens").cast("long").alias("dl"),
                F.sha2(F.col(text_col), 256).alias("content_sha256"),
            )
            return _write_empty_index(
                spark, index_dir, empty_meta, codec, block_size, shard_size
            )

        all_shards = set(range(-(-n_docs // shard_size)))
        done = {int(r["shard"]) for r in prior}
        pending = sorted(all_shards - done)

        new_rows: list[dict] = []
        if pending:
            work = docs.filter(F.col("shard").isin(pending))
            # NOTE tokenization deliberately NOT persisted: a cheap, fully
            # parallel map whose array<string> output cached as JVM objects
            # costs more in GC/eviction than recomputing (the cached SOURCE
            # ROWS feed both passes).
            toks = with_tokens(work, text_col, method=tokenizer)

            use_observe = len(pending) <= OBSERVE_MAX_SHARDS
            docs_obs = blocks_obs = None

            # docs actually tokenized in THIS pass: every auto rule below
            # (dl_source, dl_agg, dl_join) sizes against the pending
            # shards' docs, not the full corpus — a resumed build with
            # one small shard left must not pick plans calibrated for
            # full-corpus passes (ADVICE r5)
            pending_docs = sum(
                max(0, min((s + 1) * shard_size, n_docs) - s * shard_size)
                for s in pending
            )

            # see _DOCS_PER_WRITE_TASK / _BYTES_PER_WRITE_TASK:
            # encode/write parallelism derived from this pass's size
            # (docs AND estimated bytes), capped at session parallelism
            pending_bytes_tasks = 0
            try:
                sz = int(
                    source._jdf.queryExecution()
                    .optimizedPlan().stats().sizeInBytes()
                )
                if 0 < sz < (1 << 60) and n_docs:
                    est = sz * pending_docs // n_docs
                    pending_bytes_tasks = -(-est // _BYTES_PER_WRITE_TASK)
            except Exception:
                pass
            par_pass = min(
                spark.sparkContext.defaultParallelism,
                max(
                    len(pending),
                    -(-pending_docs // max(1, _DOCS_PER_WRITE_TASK)),
                    pending_bytes_tasks,
                ),
            )

            dl_source = _DL_SOURCE
            if dl_source == "auto":
                # postings above 200k docs: round 4 RE-TESTED this rule
                # after the Arrow fix (isolated probes suggested the
                # second tokenize pass had become cheaper than the dl
                # join) and the in-sequence e2e A/B said otherwise —
                # tokenize-derived dl read 52-82 s at 16 cores inside a
                # full build (vs 16-34 s for the join; BENCH.md round-4
                # §4), the isolated 9.5 s M0 number not surviving heap/
                # worker pressure from the preceding blocks stage. Keep
                # the round-3 rule; both shapes stay env-forceable and
                # differentially tested.
                dl_source = (
                    "postings" if pending_docs >= _DL_AUTO_MIN_DOCS else "tokenize"
                )
            if _BUILD_MODE in ("fused", "mapcombine") and _DL_SOURCE == "postings":
                # honor an explicitly pinned dl source loudly (the same
                # contract as WSE_TERM_DICT=on below) — these build modes
                # have no standalone postings relation to derive dl from,
                # and silently switching shapes hides the conflict
                raise ValueError(
                    "WSE_DL_SOURCE=postings is incompatible with "
                    f"WSE_BUILD_MODE={_BUILD_MODE!r}: no standalone "
                    "postings relation exists in this build shape"
                )
            if _BUILD_MODE == "fused":
                # no postings relation exists to derive dl from — dl
                # rides the tokenize pass that feeds docs_meta
                dl_source = "tokenize"
            fused_mc = None
            if _BUILD_MODE == "mapcombine":
                # tokenize + per-doc tf counting + dl + sha256 in ONE
                # Arrow pass (operators/postings.build_postings_mapcombine):
                # sentinel rows (term IS NULL) carry the doc-level
                # columns, so NO hash aggregation and NO dl join exist
                # anywhere in the build — dl_source is moot here.
                if tokenizer == "sql":
                    raise ValueError(
                        "WSE_BUILD_MODE=mapcombine implements the "
                        "'pandas'/'split' tokenizer semantics only"
                    )
                fused_mc = build_postings_mapcombine(
                    work, text_col=text_col, doc_rows=True,
                    passthrough_cols=(*key_cols, *meta_cols),
                ).persist()
                dl_source = "mapcombine"
            postings = None
            if dl_source == "postings":
                # tokenize ONCE: dl comes from the postings relation
                # (SUM(tf) per doc == the token count by definition);
                # persist so the blocks write materializes it and the
                # dl aggregation reuses it instead of re-tokenizing.
                # cluster_by_doc=False: the blocks exchange re-partitions
                # on the salted (shard, term-bucket) key right after, and
                # the dl aggregation has its own measured plan choice
                # (WSE_DL_AGG) over the narrow (doc_id, tf) projection —
                # a doc_id exchange of the FULL postings rows here would
                # be strictly more shuffled bytes
                postings = build_postings(toks, cluster_by_doc=False).persist()
                blocks_input = postings
            elif _BUILD_MODE == "mapcombine":
                blocks_input = fused_mc.filter(
                    F.col("term").isNotNull()
                ).select("term", "doc_id", "tf")
            elif _BUILD_MODE == "fused":
                blocks_input = None  # the occurrence stream feeds blocks
            else:
                # cluster_by_doc=False: feeds the salted blocks exchange
                blocks_input = build_postings(toks, cluster_by_doc=False)

            vocab = vocab_handle = None
            if _TERM_DICT == "on" and _BUILD_MODE == "sqlenc":
                raise ValueError(
                    "WSE_TERM_DICT=on is incompatible with "
                    "WSE_BUILD_MODE=sqlenc (the SQL encoder builds from "
                    "term strings)"
                )
            if _TERM_DICT == "on" and postings is None:
                # the dictionary build consumes the persisted postings
                # relation, which only exists when dl_source resolved to
                # "postings" — honor the explicit knob loudly instead of
                # silently running the plain string build
                raise ValueError(
                    "WSE_TERM_DICT=on requires the postings-backed build "
                    "shape (WSE_DL_SOURCE=postings, and not "
                    "WSE_BUILD_MODE=fused/mapcombine); got "
                    f"dl_source={dl_source!r}, build_mode={_BUILD_MODE!r}"
                )
            if postings is not None and _TERM_DICT != "off" and _BUILD_MODE != "sqlenc":
                vocab, n_terms, vocab_handle = build_term_dictionary(postings)
                if _TERM_DICT == "auto" and n_terms > _TERM_DICT_MAX_VOCAB:
                    # vocabulary too big to broadcast onto every block row
                    # — fall back to the direct string build (at cluster
                    # scale this would instead become a shuffle join of
                    # the block rows, still far smaller than the postings)
                    vocab_handle.unpersist()
                    vocab = vocab_handle = None

            # postings -> blocks (the shuffle IS the merge); shard derives
            # from doc_id inside build_block_index with the same shard_size.
            if _BUILD_MODE == "fused":
                # explode_outer + not-null filter: a non-outer explode
                # makes the optimizer infer size(tokens)>0 below the
                # generate and re-evaluate the tokenizer per row (guide
                # §4.4); see operators/postings.build_postings
                occurrences = toks.select(
                    "doc_id", F.explode_outer("tokens").alias("term")
                ).filter(F.col("term").isNotNull())
                blocks = build_block_index(
                    occurrences,
                    block_size=block_size,
                    codec=codec,
                    shard_size=shard_size,
                    num_partitions=par_pass * _PART_MULT,
                    shards_hint=len(pending),
                    from_occurrences=True,
                )
            elif vocab is not None:
                enc = postings.join(F.broadcast(vocab), "term").select(
                    "term_id", "doc_id", "tf"
                )
                blocks = build_block_index(
                    enc,
                    block_size=block_size,
                    codec=codec,
                    shard_size=shard_size,
                    num_partitions=par_pass * _PART_MULT,
                    shards_hint=len(pending),
                    term_col="term_id",
                ).join(F.broadcast(vocab), "term_id").select(
                    "term", "shard", "block_id", "n", "last_docid",
                    "base_docid", "max_tf", "doc_bytes", "freq_bytes",
                )
            elif _BUILD_MODE == "sqlenc":
                # all-JVM encode (VERDICT r4 #2 A/B). The agg's output
                # partitioning is hash(shard, term) — writing that
                # directly would emit tasks x shards files — so the
                # salted identity repartition is re-applied over the
                # BLOCK rows (index-sized, ~10x smaller than postings),
                # and the within-partition sort restores the term
                # clustering the 4 MB row-group pruning relies on.
                par_b = par_pass
                sub_b = max(
                    1, (4 * par_b + len(pending) - 1) // max(1, len(pending))
                )
                blocks = build_block_index_sql(
                    blocks_input,
                    block_size=block_size,
                    codec=codec,
                    shard_size=shard_size,
                ).repartition(
                    par_b,
                    identity_partition_key(
                        F.col("shard"),
                        F.pmod(F.xxhash64("term"), F.lit(sub_b)),
                        sub_b,
                        par_b,
                    ),
                ).sortWithinPartitions("shard", "term", "block_id")
            else:
                blocks = build_block_index(
                    blocks_input,
                    block_size=block_size,
                    codec=codec,
                    shard_size=shard_size,
                    num_partitions=par_pass * _PART_MULT,
                    shards_hint=len(pending),
                )
            if use_observe:
                blocks_obs = Observation("blocks_per_shard")
                blocks = blocks.observe(
                    blocks_obs, *_per_shard_observe_exprs(pending, "blocks")
                )
            def _write_blocks():
                # small parquet row groups for the block table: the
                # serving directory prunes per ROW GROUP on term min/max,
                # and with hash-bucketed files a term range spans each
                # bucket's whole sorted run — 4 MB groups keep the
                # false-positive read per probe bounded at a few MB
                # instead of a 128 MB default group
                blocks.write.mode("overwrite").option(
                    "parquet.block.size", str(4 * 1024 * 1024)
                ).partitionBy("shard").parquet(
                    os.path.join(index_dir, "blocks")
                )

            def _write_docs_meta(dm):
                # repartition by (shard, doc_id-bucket) before the
                # partitioned write: plain task-output writes put a file
                # from every task into every shard dir (tasks x shards
                # small files; measured 14x slower at 32 cores), while
                # repartition("shard") alone caps the write stage at
                # num_shards tasks — fewer than the cores when shards <
                # cores (the sandbox shape; at 100 TB shards >> cores and
                # sub collapses to 1). Keys round-robin onto partitions
                # via murmur3-inverted salts — exact balance, no
                # balls-in-bins stragglers, O(keys) output files (see
                # operators/blocks.identity_partition_key).
                nonlocal docs_obs
                if use_observe:
                    docs_obs = Observation("docs_meta_per_shard")
                    dm = dm.observe(
                        docs_obs, *_per_shard_observe_exprs(pending, "docs")
                    )
                par = par_pass
                sub = max(1, (4 * par + len(pending) - 1) // max(1, len(pending)))
                dm.repartition(
                    par,
                    identity_partition_key(
                        F.col("shard"), F.pmod(F.col("doc_id"), F.lit(sub)),
                        sub, par,
                    ),
                ).write.mode("overwrite").partitionBy("shard").parquet(
                    os.path.join(index_dir, "docs_meta")
                )

            overlapped = (
                postings is None and fused_mc is None
                and os.environ.get("WSE_OVERLAP_WRITES", "1") != "0"
            )
            if postings is None and fused_mc is None:
                # tokenize-derived dl: docs_meta depends only on the
                # cached source rows (also the WSE_OVERLAP_WRITES=0
                # sequential shape — defined outside the overlap branch)
                docs_meta = toks.select(
                    "shard", "doc_id", *key_cols, *meta_cols,
                    F.size("tokens").cast("long").alias("dl"),
                    F.sha2(F.col(text_col), 256).alias("content_sha256"),
                )
            if overlapped:
                # docs_meta depends only on the cached source rows, NOT
                # on the blocks job — submit both writes concurrently so
                # docs_meta back-fills executor slots freed by the blocks
                # stage's tail (guide §2.6 "overlap independent jobs").
                # The shapes that share a persisted relation
                # (dl_source=postings, mapcombine) stay sequential:
                # racing two jobs to materialize one cache would
                # double-compute it.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as pool:
                    fa = pool.submit(_write_blocks)
                    fb = pool.submit(_write_docs_meta, docs_meta)
                    fa.result()
                    fb.result()
                mark("blocks+docs_meta_overlapped")
            else:
                _write_blocks()
                mark("blocks_write")

            # one combined doc-level table: stats + lineage + sha invariant
            if overlapped:
                pass  # written above, concurrently with the blocks job
            elif fused_mc is not None:
                # sentinel rows already carry dl (=tf), sha256, and the
                # key/meta columns; shard is a pure projection of doc_id
                docs_meta = fused_mc.filter(F.col("term").isNull()).select(
                    (F.col("doc_id") / F.lit(shard_size))
                    .cast("int").alias("shard"),
                    "doc_id", *key_cols, *meta_cols,
                    F.col("tf").alias("dl"), "content_sha256",
                )
            elif postings is not None:
                dl_agg = _DL_AGG  # validated at build_index entry
                par_dl = spark.sparkContext.defaultParallelism
                # BOTH auto rules below size against pending_docs
                # (computed above): on a resumed build `work` (and so
                # postings and dl) holds only the PENDING shards' docs,
                # and comparing the full-corpus n_docs against a
                # pending-shards-only postings count (or the broadcast
                # cap) would mis-pick the plan — e.g. reject a cheap
                # broadcast when 1 of 16 shards remains.
                if dl_agg == "auto":
                    # partial agg earns its keep only while it still
                    # SHRINKS the exchange: it emits up to one row per
                    # doc per map partition, so its output is
                    # ~min(|postings|, P x pending_docs) rows. Below a
                    # 2x reduction the repartition-first plan wins (and
                    # keeps winning at any scale — constant exchange,
                    # per-partition maps shrink with P). |postings| is
                    # read from the blocks-stage Observation, already
                    # materialized by the blocks write above.
                    n_post = None
                    if use_observe and blocks_obs is not None:
                        _bv = blocks_obs.get
                        n_post = sum(int(_bv[f"p_{s}"]) for s in pending)
                    if n_post is not None:
                        dl_agg = (
                            "partial"
                            if 2 * par_dl * pending_docs <= n_post
                            else "repartition"
                        )
                    else:
                        # no cheap postings count (>OBSERVE_MAX_SHARDS
                        # pending): wide parallelism means the partial
                        # agg is structurally anti-scaling — switch on P
                        dl_agg = "repartition" if par_dl >= 16 else "partial"
                dl_base = postings.select("doc_id", "tf")
                if dl_agg == "repartition":
                    dl_base = dl_base.repartition(F.col("doc_id"))
                dl = dl_base.groupBy("doc_id").agg(
                    F.sum("tf").cast("long").alias("dl")
                )
                dl_join = _DL_JOIN  # validated at build_index entry
                if dl_join == "auto":
                    # dl has one row per doc IN THIS PASS (pending
                    # shards), not per corpus doc — size against that
                    dl_join = (
                        "broadcast"
                        if pending_docs <= _DL_BROADCAST_MAX_DOCS
                        else "shuffle"
                    )
                if dl_join == "broadcast":
                    dl = F.broadcast(dl)
                docs_meta = (
                    work.select(
                        "shard", "doc_id", *key_cols, *meta_cols,
                        F.sha2(F.col(text_col), 256).alias("content_sha256"),
                    )
                    .join(dl, "doc_id", "left")
                    # empty docs have no postings rows but stay in
                    # N/avgdl with dl=0 (reference P4 semantics)
                    .withColumn("dl", F.coalesce("dl", F.lit(0).cast("long")))
                    .select(
                        "shard", "doc_id", *key_cols, *meta_cols,
                        "dl", "content_sha256",
                    )
                )
            if not overlapped:
                _write_docs_meta(docs_meta)
                mark("docs_meta_write")
            if vocab_handle is not None:
                vocab_handle.unpersist()
            if postings is not None:
                postings.unpersist()
            if fused_mc is not None:
                fused_mc.unpersist()

            if use_observe:
                dv, bv = docs_obs.get, blocks_obs.get
                per_shard = {
                    s: (
                        int(dv[f"n_{s}"]), int(dv[f"dl_{s}"]),
                        int(bv[f"p_{s}"]), int(bv[f"b_{s}"]),
                    )
                    for s in pending
                }
            else:
                per_shard = _post_hoc_shard_stats(spark, index_dir, pending)

            build_sec = round(time.time() - t_start, 3)
            now = time.time()
            for s in pending:
                nd, sdl, np_, nb = per_shard[s]
                new_rows.append(
                    {
                        "shard": s, "n_docs": nd, "sum_dl": sdl,
                        "n_postings": np_, "n_blocks": nb,
                        "build_sec": build_sec, "finished_unix": now,
                        "codec": codec, "block_size": block_size,
                        "shard_size": shard_size,
                    }
                )
            # manifest row lands only after the shard data is durable
            _append_manifest_rows(index_dir, new_rows)

        # lexicon: fold ONLY the new shards into the existing table
        merge_lexicon(spark, index_dir, pending if prior else None)
        mark("lexicon_merge")

        # corpus stats roll up from manifest rows — O(shards) driver work,
        # never a rescan of docs_meta
        all_rows = prior + new_rows
        total_docs = sum(int(r["n_docs"]) for r in all_rows)
        total_dl = sum(int(r["sum_dl"]) for r in all_rows)
        write_stats(
            index_dir,
            {
                "n_docs": total_docs,
                "avgdl": (total_dl / total_docs) if total_docs else 0.0,
                "codec": codec,
                "block_size": block_size,
                "shard_size": shard_size,
                "built_unix": time.time(),
            },
        )
        return IndexCatalog(spark, index_dir)
    finally:
        cached_src.unpersist()


def _post_hoc_shard_stats(
    spark: SparkSession, index_dir: str, pending: list[int]
) -> dict[int, tuple[int, int, int, int]]:
    """Fallback when pending exceeds OBSERVE_MAX_SHARDS: two small
    aggregation jobs over the just-written (column-pruned) parquet."""
    d = (
        spark.read.parquet(os.path.join(index_dir, "docs_meta"))
        .filter(F.col("shard").isin(pending))
        .groupBy("shard")
        .agg(F.count("*").alias("nd"), F.sum("dl").alias("sdl"))
        .collect()
    )
    b = (
        spark.read.parquet(os.path.join(index_dir, "blocks"))
        .filter(F.col("shard").isin(pending))
        .groupBy("shard")
        .agg(F.sum("n").alias("np"), F.count("*").alias("nb"))
        .collect()
    )
    dm = {int(r["shard"]): (int(r["nd"]), int(r["sdl"] or 0)) for r in d}
    bm = {int(r["shard"]): (int(r["np"] or 0), int(r["nb"])) for r in b}
    return {
        s: (*dm.get(s, (0, 0)), *bm.get(s, (0, 0)))
        for s in pending
    }
