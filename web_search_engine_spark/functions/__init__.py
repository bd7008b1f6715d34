from .tokenizer import tokenize_udf, tokens_sql_col, tokenize_query, tokenize_text
from .bm25 import bm25_idf_col, bm25_term_score_col
from . import codec

__all__ = [
    "tokenize_udf",
    "tokens_sql_col",
    "tokenize_query",
    "tokenize_text",
    "bm25_idf_col",
    "bm25_term_score_col",
    "codec",
]
