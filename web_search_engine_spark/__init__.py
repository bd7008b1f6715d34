"""web_search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new Spark-first engine with the query and data-processing
capabilities of the reference repo siyanlau/Web-Search-Engine (inverted
index build: tokenize -> postings -> blocked varbyte-compressed index +
lexicon; query engine: Boolean AND/OR, TAAT/DAAT BM25 top-k), re-expressed
on the DataFrame API so Catalyst/Tungsten pick physical strategies and the
shuffle replaces the reference's explicit sort/merge pipeline
(/root/reference/HW2/engine/{build_runs_mp,parallel_merge,merger}.py).

Layout:
  functions/  tokenizer (pandas_udf + JVM-regex variants), BM25 column
              expressions, varbyte+delta-gap codec (numpy).
  operators/  postings build, block/lexicon build, top-k, dedup,
              similarity search, text analysis, multimodal plumbing.
  sources/    synthetic source-code corpus generator, table catalog I/O.
  plans/      end-to-end build pipeline (resumable) and query paths.
  streaming/  incremental (availableNow) index-delta ingestion.
"""

__version__ = "0.1.0"
