"""BM25 + SmallFloat norm-quantization semantics (SURVEY.md §1.4).

The reference defaults to Lucene 8.9 BM25Similarity (LuceneSettings.java:53,
k1=1.2 b=0.75); Lucene 8 BM25 is
    score = boost * ln(1 + (N-df+0.5)/(df+0.5)) * tf/(tf + k1*(1-b+b*dl/avgdl))
with dl quantized through the SmallFloat int4 norm byte at index time.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_spark.query.bm25 import (
    bm25_score_numpy,
    quantize_dl,
    small_float_int4_decode,
    small_float_int4_encode,
)


def test_int4_exact_below_16():
    v = np.arange(16)
    assert small_float_int4_decode(small_float_int4_encode(v)).tolist() == v.tolist()


def test_int4_known_values():
    enc = small_float_int4_encode(np.array([0, 7, 8, 15, 16, 17, 31, 32, 1000]))
    dec = small_float_int4_decode(enc)
    # 16,17 share a bucket (lossy): 17 -> 16; 31 -> 30; 1000 -> 960
    assert dec.tolist() == [0, 7, 8, 15, 16, 16, 30, 32, 960]


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_int4_properties(x):
    arr = np.array([x])
    d = int(quantize_dl(arr)[0])
    assert d <= x  # decode never exceeds the input
    # idempotent
    assert int(quantize_dl(np.array([d]))[0]) == d


@given(st.integers(min_value=0, max_value=10**6), st.integers(min_value=0, max_value=10**6))
@settings(max_examples=200, deadline=None)
def test_int4_monotone(a, b):
    lo, hi = sorted((a, b))
    q = quantize_dl(np.array([lo, hi]))
    assert q[0] <= q[1]


def test_bm25_hand_computed():
    # N=3, df=2, tf=2, dl=4, avgdl=5, k1=1.2, b=0.75
    n, df, tf, dl, avgdl = 3, 2, 2, 4, 5.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    tfn = tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    got = bm25_score_numpy(
        np.array([tf], dtype=float), np.array([df], dtype=float), np.array([dl], dtype=float), n, avgdl
    )[0]
    assert abs(got - idf * tfn) < 1e-12
    # Lucene 8 drops the (k1+1) factor: score must NOT include it
    assert abs(got - idf * tfn * 2.2) > 1e-6


def test_bm25_df_monotone():
    # higher df => lower idf => lower score
    tf = np.array([1.0, 1.0])
    df = np.array([1.0, 10.0])
    dl = np.array([10.0, 10.0])
    s = bm25_score_numpy(tf, df, dl, 100, 10.0)
    assert s[0] > s[1]
