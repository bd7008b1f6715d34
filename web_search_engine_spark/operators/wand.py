"""Document-at-a-time BM25 scoring with block-max WAND pruning.

The interactive query path (north star): single queries score on the
driver over the handful of posting lists the query touches — the same
shape as the reference's cursor machinery (HW2/engine/daat.py,
postings_cursor.py, daat_ranker.py), reimplemented over the block-row
table with numpy block decodes and searchsorted seeks. The distributed
batch path for query SETS lives in plans/query.py; both produce
rank-identical results (tested).

Pruning is rank-safe INCLUDING the (score desc, doc_id asc) tie policy:
docids are visited in increasing order, so a later candidate whose score
merely EQUALS the current kth best can never enter the top-k (the
incumbent has the smaller doc_id) — pruning when upper_bound <= theta is
therefore exact, not approximate. Block upper bounds use
ub = idf * (k1+1)*max_tf / (max_tf + k1*(1-b)), a true bound because the
omitted b*dl/avgdl term only grows the denominator (SURVEY.md §4) and
the bound is increasing in tf.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from ..config import BM25_B, BM25_K1, DEFAULT_TOPK
from ..functions import codec as C
from ..functions.tokenizer import tokenize_query


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


class BlockCursor:
    """Cursor over one term's blocks, ordered by (shard, block_id).

    Blocks decode lazily; next_ge seeks via binary search on the
    last_docid directory (the reference's seek_block_ge,
    HW2/engine/listio.py:186-196) then searchsorted within the block.
    """

    __slots__ = (
        "term", "df", "idf", "blocks", "codec", "k1", "b",
        "bi", "pos", "_docids", "_tfs", "last_docids", "block_ubs", "term_ub",
    )

    def __init__(self, term, df, blocks, codec, n_docs, k1=BM25_K1, b=BM25_B):
        self.term = term
        self.df = df
        self.idf = bm25_idf(n_docs, df)
        # blocks: list of (last_docid, base_docid, max_tf, doc_bytes, freq_bytes)
        self.blocks = blocks
        self.codec = codec
        self.k1 = k1
        self.b = b
        self.last_docids = np.array([blk[0] for blk in blocks], dtype=np.int64)
        mtf = np.array([blk[2] for blk in blocks], dtype=np.float64)
        self.block_ubs = self.idf * (mtf * (k1 + 1.0)) / (mtf + k1 * (1.0 - b))
        self.term_ub = float(self.block_ubs.max()) if len(blocks) else 0.0
        self.bi = -1
        self.pos = 0
        self._docids = None
        self._tfs = None
        self._load(0)

    def _load(self, bi: int) -> None:
        if bi >= len(self.blocks):
            self.bi = len(self.blocks)
            self._docids = None
            return
        last, base, _mtf, db, fb = self.blocks[bi]
        d, f = C.decode_block(db, fb, int(base), self.codec)
        self.bi = bi
        self.pos = 0
        self._docids = d
        self._tfs = f

    def exhausted(self) -> bool:
        return self._docids is None

    def docid(self) -> int | None:
        if self._docids is None:
            return None
        return int(self._docids[self.pos])

    def tf(self) -> int:
        return int(self._tfs[self.pos])

    def block_ub(self) -> float:
        return float(self.block_ubs[self.bi]) if self._docids is not None else 0.0

    def block_last(self) -> int:
        return int(self.last_docids[self.bi])

    def advance(self) -> int | None:
        if self._docids is None:
            return None
        self.pos += 1
        if self.pos >= len(self._docids):
            self._load(self.bi + 1)
        return self.docid()

    def next_ge(self, target: int) -> int | None:
        if self._docids is None:
            return None
        if target <= int(self._docids[self.pos]):
            return self.docid()
        if target > int(self.last_docids[self.bi]):
            # directory binary search: first block with last_docid >= target
            nb = int(np.searchsorted(self.last_docids, target, side="left"))
            if nb >= len(self.blocks):
                self._load(len(self.blocks))
                return None
            self._load(nb)
        self.pos = int(np.searchsorted(self._docids, target, side="left"))
        if self.pos >= len(self._docids):  # defensive; cannot happen
            self._load(self.bi + 1)
        return self.docid()

    def score_current(self, dl: float, avgdl: float) -> float:
        tf = float(self._tfs[self.pos])
        denom = tf + self.k1 * (1.0 - self.b + self.b * (dl / avgdl))
        return self.idf * (tf * (self.k1 + 1.0)) / denom


class _TopK:
    """Size-k min-heap keyed (score, -doc_id): among equal scores the
    LARGEST doc_id is evicted first, so survivors match the engine's
    (score desc, doc_id asc) policy."""

    __slots__ = ("k", "heap")

    def __init__(self, k: int):
        self.k = k
        self.heap: list[tuple[float, int, int]] = []

    def offer(self, score: float, doc_id: int) -> None:
        key = (score, -doc_id, doc_id)
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, key)
        elif key > self.heap[0]:
            heapq.heapreplace(self.heap, key)

    def theta(self) -> float:
        return self.heap[0][0] if len(self.heap) >= self.k else float("-inf")

    def full(self) -> bool:
        return len(self.heap) >= self.k

    def result(self) -> list[tuple[int, float]]:
        return [
            (doc_id, score)
            for score, _negid, doc_id in sorted(self.heap, key=lambda t: (-t[0], t[2]))
        ]


def _score_tied(cursors, tied, d, dl_lookup, avgdl, weights):
    dl = float(dl_lookup[d])
    if dl <= 0.0:
        return None  # dl=0 docs are skipped (daat_ranker.py:121-123)
    s = 0.0
    for i in tied:
        s += weights[i] * cursors[i].score_current(dl, avgdl)
    return s


def daat_or_unpruned(cursors, weights, dl_lookup, avgdl, topk):
    """Exhaustive DAAT OR — mirror of HW2/engine/daat_ranker.py:99-141."""
    heap = [(c.docid(), i) for i, c in enumerate(cursors) if not c.exhausted()]
    heapq.heapify(heap)
    top = _TopK(topk)
    while heap:
        d, i = heapq.heappop(heap)
        tied = [i]
        while heap and heap[0][0] == d:
            _, j = heapq.heappop(heap)
            tied.append(j)
        s = _score_tied(cursors, tied, d, dl_lookup, avgdl, weights)
        if s is not None:
            top.offer(s, d)
        for idx in tied:
            nxt = cursors[idx].advance()
            if nxt is not None:
                heapq.heappush(heap, (nxt, idx))
    return top.result()


def daat_and(cursors, weights, dl_lookup, avgdl, topk):
    """Intersection DAAT with galloping next_ge (HW2/engine/daat.py:21-59
    shape), driven from the rarest term (O8 heuristic).

    Cursor ADVANCEMENT order is df-ascending (cheapest intersection),
    but tied-term score summation stays in the callers' sorted-term
    cursor order: float addition is not associative, and the TAAT /
    WAND / relational kernels all sum per-term contributions in
    sorted-term order — AND scores must be bit-identical to them."""
    if not cursors:
        return []
    order = sorted(range(len(cursors)), key=lambda i: cursors[i].df)
    cs = [cursors[i] for i in order]
    top = _TopK(topk)
    d = cs[0].docid()
    while d is not None:
        target = d
        for c in cs[1:]:
            nd = c.next_ge(target)
            if nd is None:
                return top.result()
            if nd != target:
                target = nd
                break
        else:
            # every cursor sits at target — sum in sorted-term order
            s = _score_tied(
                cursors, range(len(cursors)), target, dl_lookup, avgdl, weights
            )
            if s is not None:
                top.offer(s, target)
            d = cs[0].advance()
            continue
        d = cs[0].next_ge(target)
    return top.result()


def wand_or(cursors, weights, dl_lookup, avgdl, topk, block_max=True):
    """Block-max WAND top-k for OR queries (rank-safe, tie-safe).

    Term upper bounds select the pivot (Broder et al.); per-block upper
    bounds then refine the decision and enable jumps past block
    boundaries (Ding & Suel BMW).
    """
    live = [c for c in cursors if not c.exhausted()]
    w = {id(c): weights[i] for i, c in enumerate(cursors)}
    top = _TopK(topk)
    while live:
        live = [c for c in live if not c.exhausted()]
        if not live:
            break
        # secondary key TERM pins the summation order for cursors tied
        # on one docid to sorted-term order — the same float64 addition
        # sequence as DAAT's heap pops and the vectorized TAAT passes
        # (bit-identical scores across all three kernels, tested)
        live.sort(key=lambda c: (c.docid(), c.term))
        theta = top.theta()
        # pivot: first prefix whose term-ub sum could beat theta
        acc = 0.0
        pivot = -1
        for i, c in enumerate(live):
            acc += w[id(c)] * c.term_ub
            if not top.full() or acc > theta:
                pivot = i
                break
        if pivot < 0:
            break  # no prefix can beat theta -> done
        pivot_doc = live[pivot].docid()
        if live[0].docid() == pivot_doc:
            # everything in live[0..P] sits at pivot_doc (P >= pivot)
            P = pivot
            while P + 1 < len(live) and live[P + 1].docid() == pivot_doc:
                P += 1
            prefix = live[: P + 1]
            if block_max and top.full():
                # refine with CURRENT block bounds before paying the score
                bm = sum(w[id(c)] * c.block_ub() for c in prefix)
                if bm <= theta:
                    # Docs in [pivot_doc, jump) can only draw from the
                    # prefix cursors' current blocks (bounded by bm), so
                    # the whole range is skippable — but the jump must
                    # stop at the next cursor's docid (Ding & Suel BMW:
                    # beyond it another term's contributions apply).
                    jump = min(c.block_last() for c in prefix) + 1
                    if P + 1 < len(live):
                        jump = min(jump, live[P + 1].docid())
                    for c in prefix:
                        c.next_ge(jump)
                    continue
            s = _score_tied(
                prefix, range(len(prefix)), pivot_doc, dl_lookup, avgdl,
                [w[id(c)] for c in prefix],
            )
            if s is not None:
                top.offer(s, pivot_doc)
            for c in prefix:
                c.advance()
        else:
            # advance the leading cursors up to the pivot document
            for c in live[:pivot]:
                c.next_ge(pivot_doc)
    return top.result()


# Below this many total postings across the query's terms, the
# numpy-vectorized TAAT kernel beats cursor-driven WAND: the Python
# DAAT loop costs ~8 us per visited posting while TAAT scores ~30 ns
# per posting, so WAND only wins when pruning skips >99% of postings —
# which needs long, score-skewed lists (big indexes), not short ones.
TAAT_MAX_POSTINGS = 2_000_000


def decode_term_postings(blocks: list, codec: str) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate one term's blocks into flat (docids, tfs) arrays
    (blocks pre-sorted by (shard, block_id) = global docid order)."""
    ids, tfs = [], []
    for last, base, _mtf, db, fb in blocks:
        d, f = C.decode_block(db, fb, int(base), codec)
        ids.append(d)
        tfs.append(f)
    if not ids:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return (
        np.concatenate(ids).astype(np.int64),
        np.concatenate(tfs).astype(np.int64),
    )


def decode_term_postings_fast(rows: list, codec: str) -> tuple[np.ndarray, np.ndarray]:
    """Whole-term decode in TWO vectorized codec calls (not one per
    block): per-shard delta chains are continuous across a shard's
    blocks and start at the absolute docid (base 0), so the
    concatenation of one shard's payloads is a single varbyte gap
    stream — decode everything at once, then one segmented-cumsum
    rebase at shard boundaries.

    rows: [(shard, block_id, last_docid, base_docid, max_tf, doc_bytes,
    freq_bytes)] sorted by (shard, block_id)."""
    if not rows:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    doc_all = b"".join(r[5] for r in rows)
    freq_all = b"".join(r[6] for r in rows)
    if codec != "varbyte":
        return (
            np.frombuffer(doc_all, dtype="<u4").astype(np.int64),
            np.frombuffer(freq_all, dtype="<u4").astype(np.int64),
        )
    gaps = C.vb_decode(np.frombuffer(doc_all, dtype=np.uint8)).astype(np.int64)
    tfs = C.vb_decode(np.frombuffer(freq_all, dtype=np.uint8)).astype(np.int64)
    shards = np.array([r[0] for r in rows], dtype=np.int64)
    new_seg = np.empty(len(rows), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = shards[1:] != shards[:-1]
    seg_block = np.flatnonzero(new_seg)
    # postings per segment = varbyte terminator count per segment's bytes
    byte_starts = np.concatenate(
        ([0], np.cumsum([len(r[5]) for r in rows]))
    )[seg_block]
    msb = ((np.frombuffer(doc_all, dtype=np.uint8) & 0x80) > 0).astype(np.int64)
    seg_counts = np.add.reduceat(msb, byte_starts) if len(doc_all) else []
    csum = np.cumsum(gaps)
    seg_starts = np.concatenate(([0], np.cumsum(seg_counts)))[:-1]
    before = np.where(seg_starts > 0, csum[seg_starts - 1], 0)
    docids = csum - np.repeat(before, np.asarray(seg_counts, dtype=np.int64))
    return docids, tfs


def _topk_by_score(union, scores, topk):
    """(score desc, doc_id asc) top-k rows of (union, scores) as the
    kernels' return list. Above a small size an argpartition pass finds
    the k-th score, and only the >= threshold subset (boundary ties
    included) is lexsorted — identical output to the full lexsort, but
    O(n + t log t) instead of O(n log n) (measured 30 ms -> ~2 ms per
    hot query over a 240k-doc union)."""
    n = len(union)
    if n == 0 or topk <= 0:
        return []
    if n > max(64, 8 * topk):
        kth = min(topk, n) - 1
        part = np.argpartition(-scores, kth)[: kth + 1]
        thr = scores[part].min()
        cand = np.flatnonzero(scores >= thr)
        order = cand[np.lexsort((union[cand], -scores[cand]))][:topk]
    else:
        # lexsort: last key is primary
        order = np.lexsort((union, -scores))[:topk]
    return [(int(union[i]), float(scores[i])) for i in order]


def _dense_dl_array(dl_lookup, term_entries):
    """The dense doc_id->dl float64 array behind dl_lookup when one
    exists, covers every posting id, AND the query's posting volume
    justifies O(id-space) accumulators, else None. The scatter-add path
    allocates and scans len(arr) slots per query — a win when the
    candidate set is a meaningful fraction of the corpus (hot queries),
    a regression for a rare 100-posting query on an 8.84M-doc index
    (70+ MB of zeros and a full-array flatnonzero for microseconds of
    real work) — so it is gated on total postings >= len(arr) / 8."""
    arr = (
        dl_lookup
        if isinstance(dl_lookup, np.ndarray)
        else getattr(dl_lookup, "arr", None)
    )
    if arr is None or not isinstance(arr, np.ndarray):
        return None
    m = len(arr)
    total = 0
    for _idf, _w, ids, _tfs in term_entries:
        if len(ids) and int(ids[-1]) >= m:  # ids ascending by decode order
            return None
        total += len(ids)
    if 8 * total < m:
        return None  # selective query: the union path is cheaper
    return arr


def taat_or(term_entries, dl_lookup, avgdl, topk, k1=BM25_K1, b=BM25_B):
    """Vectorized term-at-a-time OR scoring — the reference's TAAT
    ranker (HW2/engine/ranker.py:52-74) as numpy array passes.

    term_entries = [(idf, weight, docids, tfs)] in SORTED-TERM order.
    Bit-identical to the DAAT kernels: for each doc the per-term score
    additions happen in the same (sorted-term) order the tied-cursor sum
    uses, and each term score is computed with the exact expression of
    BlockCursor.score_current.

    With a dense dl store the accumulator is indexed directly by doc_id
    (scatter-add over the id space): no candidate union, no per-term
    searchsorted — the same additions in the same order land at
    arr[doc_id] instead of arr[searchsorted(union, doc_id)], so scores
    are bit-identical (kernel differential tests assert it). Measured
    80 -> ~25 ms per hot query at a 250k-doc index.
    """
    if not term_entries:
        return []
    dense = _dense_dl_array(dl_lookup, term_entries)
    if dense is not None:
        scores = np.zeros(len(dense), dtype=np.float64)
        for idf, w, ids, tfs in term_entries:
            tf = tfs.astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * (dense[ids] / avgdl))
            scores[ids] += w * (idf * (tf * (k1 + 1.0)) / denom)
        # every contribution is > 0 (idf > 0, tf >= 1, weight >= 1), so
        # matched docs are exactly the nonzero slots
        cand = np.flatnonzero(scores)
        dls = dense[cand]
        live = dls > 0.0  # dl=0 docs are never scored (daat_ranker.py:121-123)
        return _topk_by_score(cand[live], scores[cand][live], topk)
    union = np.unique(np.concatenate([ids for _, _, ids, _ in term_entries]))
    if isinstance(dl_lookup, np.ndarray):
        dls = dl_lookup[union]
    elif hasattr(dl_lookup, "take_ids"):
        dls = dl_lookup.take_ids(union)
    else:
        dls = np.array([float(dl_lookup[int(d)]) for d in union])
    scores = np.zeros(len(union), dtype=np.float64)
    for idf, w, ids, tfs in term_entries:
        pos = np.searchsorted(union, ids)
        tf = tfs.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dls[pos] / avgdl))
        scores[pos] += w * (idf * (tf * (k1 + 1.0)) / denom)
    live = dls > 0.0  # dl=0 docs are never scored (daat_ranker.py:121-123)
    return _topk_by_score(union[live], scores[live], topk)


_EPOCH_RANGES = 2048  # block ranges scored per pruning epoch


def blockmax_taat_or(
    term_entries, term_blockmeta, dl_lookup, avgdl, topk, k1=BM25_K1, b=BM25_B
):
    """Vectorized block-max WAND: BMW's per-block skipping with TAAT's
    numpy scoring — no per-posting Python (VERDICT r2 #4: the cursor
    loop costs ~8 us/posting; above TAAT_MAX_POSTINGS a stopword-heavy
    OR query where pruning doesn't bite pays seconds).

    The docid axis splits at every block boundary of every term. Work
    proceeds in EPOCHS: with the current theta, the upper bound of every
    remaining range (sum of the covering blocks' max-score bounds —
    computed with one searchsorted per term) selects the ranges that
    could still beat the top-k; the first _EPOCH_RANGES survivors merge
    into maximal docid intervals and score through the taat_or
    accumulation (same sorted-term order, same float64 expression —
    bit-identical scores); theta then rises and the next epoch re-prunes
    the remainder. Hot queries where nothing prunes degrade to plain
    TAAT plus a few searchsorted passes (no kernel cliff at the
    threshold); score-skewed queries skip the union/score work for
    pruned ranges block-wise (postings arrive pre-decoded by the
    vectorized whole-term decode, which is memory-bandwidth cheap —
    pruning here saves scoring, not decoding).

    Rank-safety matches wand_or: ranges are visited in increasing docid
    order, so a pruned candidate whose score merely EQUALS theta would
    lose the (score desc, doc_id asc) tie to the incumbent anyway.

    term_entries = [(idf, weight, ids, tfs)] in sorted-term order
    (flat decoded postings); term_blockmeta = [(last_docids, block_ubs)]
    aligned with term_entries (block_ubs exclude the query weight).
    """
    if not term_entries:
        return []
    boundaries = np.unique(np.concatenate([m[0] for m in term_blockmeta]))
    R = len(boundaries)
    top = _TopK(topk)
    r = 0
    while r < R:
        rem = boundaries[r:]
        ub = np.zeros(len(rem), dtype=np.float64)
        for (idf, w, _ids, _tfs), (last, bubs) in zip(term_entries, term_blockmeta):
            idx = np.searchsorted(last, rem, side="left")
            v = idx < len(last)
            ub[v] += w * bubs[idx[v]]
        if top.full():
            live = np.flatnonzero(ub > top.theta())
        else:
            live = np.arange(len(rem))
        if live.size == 0:
            break
        sel = live[:_EPOCH_RANGES] + r
        los = np.where(sel > 0, boundaries[sel - 1], -1)  # range = (lo, hi]
        his = boundaries[sel]
        # merge ranges adjacent on the boundary grid into maximal intervals
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sel) > 1) + 1))
        int_lo = los[starts]
        int_hi = his[np.append(starts[1:] - 1, len(sel) - 1)]

        # gather each term's postings inside the intervals, then the
        # taat_or accumulation over the epoch's union
        subs = []
        for idf, w, ids, tfs in term_entries:
            s = np.searchsorted(ids, int_lo, side="right")
            e = np.searchsorted(ids, int_hi, side="right")
            counts = e - s
            total = int(counts.sum())
            if total == 0:
                subs.append(None)
                continue
            offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
            take = np.arange(total) - np.repeat(offs, counts) + np.repeat(s, counts)
            subs.append((ids[take], tfs[take]))
        live_subs = [s for s in subs if s is not None]
        if live_subs:
            union = np.unique(np.concatenate([s[0] for s in live_subs]))
            if hasattr(dl_lookup, "take_ids"):
                dls = dl_lookup.take_ids(union)
            elif isinstance(dl_lookup, np.ndarray):
                dls = dl_lookup[union]
            else:
                dls = np.array([float(dl_lookup[int(d)]) for d in union])
            scores = np.zeros(len(union), dtype=np.float64)
            for (idf, w, _ids, _tfs), sub in zip(term_entries, subs):
                if sub is None:
                    continue
                sids, stfs = sub
                pos = np.searchsorted(union, sids)
                tf = stfs.astype(np.float64)
                denom = tf + k1 * (1.0 - b + b * (dls[pos] / avgdl))
                scores[pos] += w * (idf * (tf * (k1 + 1.0)) / denom)
            ok = dls > 0.0
            # only the epoch's own top-k can enter the global heap
            for doc, sc in _topk_by_score(union[ok], scores[ok], topk):
                top.offer(sc, doc)
        r = int(sel[-1]) + 1
    return top.result()


def taat_and(term_entries, dl_lookup, avgdl, topk, k1=BM25_K1, b=BM25_B):
    """Vectorized term-at-a-time AND: the taat_or accumulation plus a
    per-doc matched-term counter — only docs carrying every distinct
    query term survive (searcher.py:64-90 AND gate). Scores are
    bit-identical to taat_or/daat_and for the surviving docs (same
    sorted-term addition order, same float64 expression)."""
    if not term_entries:
        return []
    dense = _dense_dl_array(dl_lookup, term_entries)
    if dense is not None:
        # scatter-add twin of the union path (see taat_or): identical
        # additions in identical order, indexed by doc_id directly
        scores = np.zeros(len(dense), dtype=np.float64)
        nmatch = np.zeros(len(dense), dtype=np.int64)
        for idf, w, ids, tfs in term_entries:
            tf = tfs.astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * (dense[ids] / avgdl))
            scores[ids] += w * (idf * (tf * (k1 + 1.0)) / denom)
            nmatch[ids] += 1
        cand = np.flatnonzero(nmatch == len(term_entries))
        dls = dense[cand]
        live = dls > 0.0
        return _topk_by_score(cand[live], scores[cand][live], topk)
    union = np.unique(np.concatenate([ids for _, _, ids, _ in term_entries]))
    if isinstance(dl_lookup, np.ndarray):
        dls = dl_lookup[union]
    elif hasattr(dl_lookup, "take_ids"):
        dls = dl_lookup.take_ids(union)
    else:
        dls = np.array([float(dl_lookup[int(d)]) for d in union])
    scores = np.zeros(len(union), dtype=np.float64)
    nmatch = np.zeros(len(union), dtype=np.int64)
    for idf, w, ids, tfs in term_entries:
        pos = np.searchsorted(union, ids)
        tf = tfs.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dls[pos] / avgdl))
        scores[pos] += w * (idf * (tf * (k1 + 1.0)) / denom)
        nmatch[pos] += 1
    live = (dls > 0.0) & (nmatch == len(term_entries))
    return _topk_by_score(union[live], scores[live], topk)


def intersect_and(term_entries, dl_lookup, avgdl, topk, k1=BM25_K1, b=BM25_B):
    """Vectorized AND above TAAT_MAX_POSTINGS (VERDICT r3 #1): the
    per-posting Python galloping loop of daat_and costs ~8 us/visited
    posting — a hot AND with a large intersection pays seconds. Here the
    intersection is successive ``np.searchsorted`` membership passes
    driven from the RAREST term's decoded array (the same df-ascending
    O8 heuristic daat_and uses for cursor advancement), ~30 ns/posting.

    Scoring then runs the taat_and accumulation restricted to the
    intersection: per-doc term contributions are added in sorted-term
    entry order with the exact float64 expression of
    BlockCursor.score_current, so scores are bit-identical to
    taat_and/daat_and (asserted by the 3-kernel differential test).
    """
    if not term_entries:
        return []
    # intersect from rarest: postings arrays are globally docid-sorted
    order = sorted(range(len(term_entries)), key=lambda i: len(term_entries[i][2]))
    inter = term_entries[order[0]][2]
    for i in order[1:]:
        if not len(inter):
            return []
        ids = term_entries[i][2]
        pos = np.searchsorted(ids, inter)
        pos_ok = pos < len(ids)
        keep = np.zeros(len(inter), dtype=bool)
        keep[pos_ok] = ids[pos[pos_ok]] == inter[pos_ok]
        inter = inter[keep]
    if not len(inter):
        return []
    if hasattr(dl_lookup, "take_ids"):
        dls = dl_lookup.take_ids(inter)
    elif isinstance(dl_lookup, np.ndarray):
        dls = dl_lookup[inter]
    else:
        dls = np.array([float(dl_lookup[int(d)]) for d in inter])
    scores = np.zeros(len(inter), dtype=np.float64)
    for idf, w, ids, tfs in term_entries:  # sorted-term order (tie policy)
        pos = np.searchsorted(ids, inter)
        tf = tfs[pos].astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dls / avgdl))
        scores += w * (idf * (tf * (k1 + 1.0)) / denom)
    live = dls > 0.0
    return _topk_by_score(inter[live], scores[live], topk)


def search_blocks(
    block_rows: dict[str, list],
    term_dfs: dict[str, int],
    codec: str,
    dl_lookup: np.ndarray,
    n_docs: int,
    avgdl: float,
    query: str,
    mode: str = "OR",
    topk: int = DEFAULT_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    use_wand: bool = True,
    flat_cache: dict | None = None,
    force_kernel: str | None = None,
) -> list[tuple[int, float]]:
    """Score a query given collected block rows per term.

    block_rows[term] = [(shard, block_id, last_docid, base_docid, max_tf,
    doc_bytes, freq_bytes)] in any order; sorted here by (shard, block_id)
    which is global docid order.

    Kernel choice (use_wand=True): vectorized TAAT (taat_or/taat_and)
    when the query's total posting volume is small (<= TAAT_MAX_POSTINGS);
    beyond that, block-max pruned kernels — the vectorized blockwise
    WAND (blockmax_taat_or) for OR, the vectorized searchsorted
    intersection (intersect_and) for AND. use_wand=False forces the
    exhaustive cursor DAAT (the differential baseline; daat_and for
    AND). ``force_kernel``
    ("taat" | "bmw_block" | "vec_and" | "bmw_cursor" | "daat") overrides the
    selection — used by differential tests; "bmw_cursor" is the classic
    per-posting BMW loop kept as a second independent implementation.
    ``flat_cache`` (term -> decoded arrays) lets a serving engine
    amortize block decodes across repeated queries.
    """
    from collections import Counter

    q = tokenize_query(query)
    counts = Counter(t for t in q if t in block_rows and term_dfs.get(t))
    if not counts:
        return []
    sorted_terms = sorted(counts)  # fixed accumulation order (tie policy)
    total_df = sum(term_dfs[t] for t in sorted_terms)
    is_and = mode.upper() == "AND"

    def term_rows(term):
        return sorted(block_rows[term], key=lambda r: (r[0], r[1]))

    def term_blocks(term):
        return [(r[2], r[3], r[4], r[5], r[6]) for r in term_rows(term)]

    def flat_entries():
        entries = []
        for term in sorted_terms:
            if flat_cache is not None and term in flat_cache:
                ids, tfs = flat_cache[term]
            else:
                ids, tfs = decode_term_postings_fast(term_rows(term), codec)
                if flat_cache is not None:
                    flat_cache[term] = (ids, tfs)
            entries.append(
                (bm25_idf(n_docs, term_dfs[term]), float(counts[term]), ids, tfs)
            )
        return entries

    kernel = force_kernel
    if kernel is None:
        if not use_wand:
            kernel = "daat"
        elif total_df <= TAAT_MAX_POSTINGS:
            kernel = "taat"
        else:
            kernel = "vec_and" if is_and else "bmw_block"

    if kernel == "taat":
        entries = flat_entries()
        if is_and:
            return taat_and(entries, dl_lookup, avgdl, topk, k1, b)
        return taat_or(entries, dl_lookup, avgdl, topk, k1, b)

    if kernel == "vec_and":
        if not is_and:
            raise ValueError("vec_and is an AND kernel; OR uses taat/bmw_block")
        return intersect_and(flat_entries(), dl_lookup, avgdl, topk, k1, b)

    if kernel == "bmw_block":
        if is_and:
            raise ValueError(
                "bmw_block is an OR kernel; AND uses taat/vec_and/daat"
            )
        entries = flat_entries()
        metas = []
        for term in sorted_terms:
            rows = term_rows(term)
            last = np.array([r[2] for r in rows], dtype=np.int64)
            mtf = np.array([r[4] for r in rows], dtype=np.float64)
            idf = bm25_idf(n_docs, term_dfs[term])
            metas.append((last, idf * (mtf * (k1 + 1.0)) / (mtf + k1 * (1.0 - b))))
        return blockmax_taat_or(entries, metas, dl_lookup, avgdl, topk, k1, b)

    if kernel == "bmw_cursor" and is_and:
        # previously this silently fell through to daat_and, letting a
        # differential test "force" the cursor BMW on AND while actually
        # validating a different kernel (ADVICE r3)
        raise ValueError("bmw_cursor is an OR kernel; AND uses taat/vec_and/daat")
    cursors, weights = [], []
    for term in sorted_terms:
        cursors.append(
            BlockCursor(term, term_dfs[term], term_blocks(term), codec, n_docs, k1, b)
        )
        weights.append(float(counts[term]))
    if is_and:
        return daat_and(cursors, weights, dl_lookup, avgdl, topk)
    if kernel == "bmw_cursor":
        return wand_or(cursors, weights, dl_lookup, avgdl, topk)
    return daat_or_unpruned(cursors, weights, dl_lookup, avgdl, topk)
