from meresco_lucene_spark.analysis.tokenizer import (
    TOKEN_RE,
    tokenize_expr,
    tokenize_text,
    tokenize_udf,
    shingles,
    char_ngrams,
)

__all__ = [
    "TOKEN_RE",
    "tokenize_expr",
    "tokenize_text",
    "tokenize_udf",
    "shingles",
    "char_ngrams",
]
