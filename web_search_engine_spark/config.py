"""Engine-wide constants pinned to the reference semantics.

Every value here is observable reference behavior (file:line cited) —
changing one breaks rank-identity or byte-compatibility tests.
"""

# BM25 parameters — reference defaults (HW2/engine/ranker.py:17,
# HW2/engine/daat_ranker.py:53-54).
BM25_K1 = 1.2
BM25_B = 0.75

# Corpus tokenizer regex (HW2/engine/parser.py:55,78): lowercase text,
# keep "u.s.", "3.14", "foo-bar" as single tokens.
TOKEN_RE = r"[a-z0-9]+(?:[.-][a-z0-9]+)*"

# Postings block size (HW2/engine/listio.py:7).
BLOCK_SIZE = 128

# Codecs for block payloads (HW2/engine/listio.py:18-89).
CODEC_RAW = "raw"
CODEC_VARBYTE = "varbyte"

# Default top-k (HW2/app.py:75 uses topk=10).
DEFAULT_TOPK = 10

# Shuffle sizing default for local test sessions.
DEFAULT_SHUFFLE_PARTITIONS = 32
