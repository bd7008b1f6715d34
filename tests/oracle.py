"""Pure-Python oracle implementing the reference's semantics exactly.

An independent reimplementation (NOT a copy) of the behaviors in
HW2/engine/{parser,ranker,daat_ranker,searcher,listio}.py, used as the
golden source for differential tests against the Spark engine:

  - corpus tokenizer: html.unescape -> lower -> regex findall
    (parser.py:76-78; ftfy omitted, see functions/tokenizer.py);
  - doc_lengths keep zero-token docs (build_runs_mp.py:89-91 semantics);
  - N = len(doc_lengths), avgdl includes dl=0 docs (daat_ranker.py:73-76);
  - idf = ln((N-df+0.5)/(df+0.5)+1) (daat_ranker.py:35-37);
  - term score = idf*tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)), k1=1.2 b=0.75;
  - query tokenizer = lower().split(); unknown terms dropped; duplicate
    terms accumulate twice (ranker.py:60-72);
  - AND mode gates on matching all distinct surviving terms; per-doc
    scores identical to OR (searcher.py:64-90);
  - dl=0 docs are skipped when scoring (daat_ranker.py:121-123);
  - top-k ties broken (score desc, doc_id asc) — the engine's pinned
    policy (SURVEY.md §2.7 item 4).
"""

from __future__ import annotations

import html
import math
import re
from collections import Counter, defaultdict

TOKEN_RE = re.compile(r"[a-z0-9]+(?:[.-][a-z0-9]+)*")


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(html.unescape(text).lower())


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: [(doc_id, raw_text)] — zero-token docs kept with dl=0."""
        self.index: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_lengths: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize(text)
            self.doc_lengths[doc_id] = len(toks)
            for t, tf in Counter(toks).items():
                self.index[t][doc_id] = tf
        self.N = len(self.doc_lengths)
        self.avgdl = (
            sum(self.doc_lengths.values()) / self.N if self.N else 0.0
        )
        self.df = {t: len(p) for t, p in self.index.items()}

    def bm25_term(self, tf: int, df: int, dl: int, k1=1.2, b=0.75) -> float:
        idf = math.log((self.N - df + 0.5) / (df + 0.5) + 1.0)
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / self.avgdl)))

    def search(self, query: str, mode: str = "OR", topk: int = 10, k1=1.2, b=0.75):
        """-> [(doc_id, score)] score desc, doc_id asc."""
        q_tokens = query.lower().split()
        terms = [t for t in q_tokens if t in self.index]  # keeps duplicates
        if not terms:
            return []
        distinct = set(terms)
        scores: dict[int, float] = defaultdict(float)
        matched: dict[int, set] = defaultdict(set)
        for t in terms:  # duplicates accumulate again, as in ranker.py:63
            for doc_id, tf in self.index[t].items():
                dl = self.doc_lengths[doc_id]
                if dl > 0:
                    scores[doc_id] += self.bm25_term(tf, self.df[t], dl, k1, b)
                    matched[doc_id].add(t)
        items = scores.items()
        if mode.upper() == "AND":
            items = [(d, s) for d, s in items if matched[d] == distinct]
        ranked = sorted(items, key=lambda x: (-x[1], x[0]))
        return ranked[:topk]

    def boolean(self, query: str, mode: str = "AND") -> set[int]:
        terms = sorted({t for t in query.lower().split() if t in self.index})
        if not terms:
            return set()
        sets = [set(self.index[t]) for t in terms]
        return set.intersection(*sets) if mode.upper() == "AND" else set.union(*sets)
