"""Dutch stemming analyzer (reference MerescoDutchStemmingAnalyzer).

Implements the public Snowball Dutch stemming algorithm
(snowballstem.org/algorithms/dutch/stemmer.html) and the reference's
token-stream shape (analysis/MerescoDutchStemmingAnalyzer.java:55-62):
KeywordRepeatFilter + SnowballFilter + RemoveDuplicates — i.e. every
position emits BOTH the original and the stemmed token, deduped when
equal, so exact and stemmed queries both match
(integration golden: field5=katten -> 1 hit, field4=kat -> 1 hit,
test/_integration/lucenetest.py:226-228).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meresco_lucene_spark.analysis.tokenizer import tokenize_text

_VOWELS = set("aeiouyè")


def _mark(word: str) -> list[str]:
    """Treat initial y, y-after-vowel and i-between-vowels as consonants
    by uppercasing them (Snowball prelude)."""
    chars = list(word)
    n = len(chars)
    for idx, c in enumerate(chars):
        if c == "y" and (idx == 0 or chars[idx - 1] in _VOWELS):
            chars[idx] = "Y"
        elif (
            c == "i"
            and 0 < idx < n - 1
            and chars[idx - 1] in _VOWELS
            and chars[idx + 1] in _VOWELS
        ):
            chars[idx] = "I"
    return chars


def _is_vowel(c: str) -> bool:
    return c in _VOWELS  # marked I/Y are uppercase => consonants


def _regions(chars: list[str]) -> tuple[int, int]:
    """R1/R2 start offsets; R1 is adjusted to begin at position >= 3."""

    def region_after(start: int) -> int:
        i = start
        n = len(chars)
        while i < n and not _is_vowel(chars[i]):
            i += 1
        while i < n and _is_vowel(chars[i]):
            i += 1
        # i is now at the first non-vowel following a vowel (or end)
        return min(i + 1, n)

    # "R1 is adjusted so that the region before it contains at least 3
    # letters."
    r1 = min(max(region_after(0), 3), len(chars))
    r2 = region_after(r1)
    return r1, r2


def _undouble(w: str) -> str:
    return w[:-1] if w.endswith(("kk", "dd", "tt")) else w


def dutch_stem(word: str) -> str:
    """Snowball Dutch stem of a lowercase token."""
    if len(word) < 3:
        return word
    chars = _mark(word)
    r1, r2 = _regions(chars)
    w = "".join(chars)
    e_found = False

    def in_r1(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r1

    def in_r2(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r2

    # ---- step 1
    if w.endswith("heden"):
        if in_r1(5):
            w = w[:-5] + "heid"
    elif w.endswith(("ene", "en")):
        sl = 3 if w.endswith("ene") else 2
        stem = w[:-sl]
        if (
            in_r1(sl)
            and stem
            and not _is_vowel(stem[-1])
            and not stem.endswith("gem")
        ):
            w = _undouble(stem)
    elif w.endswith(("se", "s")):
        sl = 2 if w.endswith("se") else 1
        stem = w[:-sl]
        if in_r1(sl) and stem and not _is_vowel(stem[-1]) and stem[-1] != "j":
            w = stem

    # ---- step 2
    if w.endswith("e") and in_r1(1) and len(w) >= 2 and not _is_vowel(w[-2]):
        w = _undouble(w[:-1])
        e_found = True

    # ---- step 3a
    if w.endswith("heid") and in_r2(4) and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            stem = w[:-2]
            if (
                len(w) - 2 >= r1
                and stem
                and not _is_vowel(stem[-1])
                and not stem.endswith("gem")
            ):
                w = _undouble(stem)

    # ---- step 3b (d-suffixes)
    if w.endswith(("end", "ing")):
        if in_r2(3):
            w = w[:-3]
            if w.endswith("ig") and len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("ig"):
        if in_r2(2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith("lijk"):
        if in_r2(4):
            w = w[:-4]
            if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and not _is_vowel(w[-2]):
                w = _undouble(w[:-1])
    elif w.endswith("baar"):
        if in_r2(4):
            w = w[:-4]
    elif w.endswith("bar"):
        if in_r2(3) and e_found:
            w = w[:-3]

    # ---- step 4: undouble vowel (C v v C, last consonant not I)
    if len(w) >= 4:
        c1, v1, v2, c2 = w[-4], w[-3], w[-2], w[-1]
        if (
            not _is_vowel(c1)
            and v1 == v2
            and v1 in "aeou"
            and not _is_vowel(c2)
            and c2 != "I"
        ):
            w = w[:-2] + w[-1]

    return w.lower()


def tokenize_dutch_text(text: str) -> list[list[str]]:
    """Per position: [original] or [original, stem] when they differ
    (KeywordRepeat + RemoveDuplicates shape)."""
    out = []
    for tok in tokenize_text(text):
        stem = dutch_stem(tok)
        out.append([tok] if stem == tok else [tok, stem])
    return out


def tokenize_dutch_flat(text: str) -> list[str]:
    """Flattened token stream (both variants at the same position in the
    reference; flattened here — positions shift but phrase queries on
    stemmed fields are out of reference scope)."""
    return [t for variants in tokenize_dutch_text(text) for t in variants]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_dutch_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(tokenize_dutch_flat)
