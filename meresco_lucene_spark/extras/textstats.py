"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (JVM/codegen) so
the oracles are plain SQL and the 100 TB scan stays Python-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9_]+"

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "des"],
    "es": ["el", "la", "los", "que", "es", "de"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Analyzed-token count + whitespace-word count + a BPE-ish subword
    estimate (ceil(chars/4) is the common rule-of-thumb proxy)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_words"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_subwords_est"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality features + a composite score:
    length, mean word length, stopword ratio, punctuation ratio —
    the usual pretraining-corpus filters, as one JVM-side projection."""
    text = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    mean_wl = F.when(n_tok > 0, F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(mean_wl / F.lit(8.0), F.lit(1.0)) * 0.3
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language heuristic: count distinct marker hits per
    language; predict the argmax (ties + zero evidence -> 'und')."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    counts = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[counts[l] for l in langs])
    pred = F.lit("und")
    # first (alphabetical) language achieving the max, matching the SQL
    # CASE the oracle uses; zero hits stay 'und'
    for l in reversed(langs):
        pred = F.when((counts[l] == best) & (best > 0), F.lit(l)).otherwise(pred)
    sel = [F.col(id_col).alias("doc_id")]
    sel += [counts[l].cast("long").alias(f"hits_{l}") for l in langs]
    sel.append(pred.alias("pred_lang"))
    return df.select(*sel)


def min_gram_fingerprint(
    df: DataFrame, id_col: str, text_col: str, n: int = 4
) -> DataFrame:
    """Winnowing-style document fingerprint: min over md5(word n-grams).
    md5 agrees byte-for-byte between Spark and DuckDB, making the
    fingerprint portable across engines."""
    toks_sql = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    # sequence(1, 0) would be DESCENDING in Spark — guard short docs.
    grams = F.expr(
        f"CASE WHEN size({toks_sql}) >= {n} THEN "
        f"transform(sequence(1, size({toks_sql}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks_sql}, i, {n}))) "
        f"ELSE array() END"
    )
    fp = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(fp, F.lit("")).alias("fingerprint"),
    )
