"""Index build + single-core query operators vs a naive in-Python oracle.

Fixture shape follows the reference's unit-test style (tiny corpora with
hand-checkable counts, LuceneTest.java): a 6-doc corpus exercising tf>1,
shared vs unique terms, phrases, keyword fields and facets.
Pagination goldens recast from LuceneTest.java:363-394; sort missing
values from fieldregistry.py:109-112.
"""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from meresco_lucene_spark.analysis.tokenizer import tokenize_text
from meresco_lucene_spark.index.builder import InvertedIndex
from meresco_lucene_spark.query.executor import facet_counts_df, hits, search
from meresco_lucene_spark.query.ir import FILTER, MUST, MUST_NOT, SHOULD, Q

DOCS = [
    # (doc_id, text, lang, stars)
    (0, "spark fast spark join", "py", 3),
    (1, "slow join table", "py", 1),
    (2, "spark table scan scan scan", "java", 5),
    (3, "join the fast table", "go", None),
    (4, "unique_term spark", "py", 2),
    (5, "fast fast fast join spark", None, 4),
]

K1, B = 1.2, 0.75


def naive_index():
    toks = {d: tokenize_text(t) for d, t, _, _ in DOCS}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(DOCS)
    avgdl = sum(dl.values()) / n
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            tf[(t, d)] = tf.get((t, d), 0) + 1
    df = {}
    for (t, d), _ in tf.items():
        df[t] = df.get(t, 0) + 1
    return toks, dl, n, avgdl, tf, df


def naive_bm25(term, doc):
    _, dl, n, avgdl, tf, df = naive_index()
    if (term, doc) not in tf:
        return None
    idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
    f = tf[(term, doc)]
    return idf * f / (f + K1 * (1 - B + B * dl[doc] / avgdl))


@pytest.fixture(scope="module")
def idx(spark):
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text", "lang", "stars"])
    df = spark.createDataFrame(pdf)
    ix = InvertedIndex.build(
        df,
        id_col="doc_id",
        text_cols=["text"],
        keyword_cols=["lang"],
        facet_fields={"lang": ["lang"]},
    )
    yield ix
    ix.unpersist()


def _hit_map(ix, q):
    return {r["doc_id"]: r["score"] for r in hits(ix, q).collect()}


def test_postings_tf_df(idx):
    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["positions"])
        for r in idx.postings_for("text").collect()
    }
    assert rows[("spark", 0)][0] == 2
    assert rows[("spark", 0)][1] == [0, 2]
    assert rows[("scan", 2)] == (3, [2, 3, 4])
    st = {r["term"]: (r["df"], r["cf"]) for r in idx.term_stats_for("text").collect()}
    assert st["spark"] == (4, 5)
    assert st["join"] == (4, 4)
    assert st["unique_term"] == (1, 1)


def test_field_lengths(idx):
    dl = {r["doc_id"]: r["dl"] for r in idx.lengths_for("text").collect()}
    assert dl == {0: 4, 1: 3, 2: 5, 3: 4, 4: 2, 5: 5}


def test_term_query_scores_match_naive(idx):
    got = _hit_map(idx, Q.term("text", "spark"))
    assert set(got) == {0, 2, 4, 5}
    for d, s in got.items():
        assert abs(s - naive_bm25("spark", d)) < 1e-9


def test_term_query_boost(idx):
    base = _hit_map(idx, Q.term("text", "spark"))
    boosted = _hit_map(idx, Q.term("text", "spark", boost=2.5))
    for d in base:
        assert abs(boosted[d] - 2.5 * base[d]) < 1e-9


def test_matchall(idx):
    got = _hit_map(idx, Q.matchall())
    assert got == {d: 1.0 for d in range(6)}


def test_bool_must(idx):
    got = _hit_map(idx, Q.and_(Q.term("text", "spark"), Q.term("text", "join")))
    assert set(got) == {0, 5}
    for d in got:
        expect = naive_bm25("spark", d) + naive_bm25("join", d)
        assert abs(got[d] - expect) < 1e-9


def test_bool_should(idx):
    got = _hit_map(idx, Q.or_(Q.term("text", "scan"), Q.term("text", "unique_term")))
    assert set(got) == {2, 4}


def test_bool_must_not(idx):
    got = _hit_map(idx, Q.not_(Q.term("text", "join"), Q.term("text", "slow")))
    assert set(got) == {0, 3, 5}


def test_bool_must_not_only_matches_nothing(idx):
    """A BooleanQuery with only MUST_NOT clauses matches NOTHING (Lucene
    requires a positive clause; the reference behaves the same). Reachable
    via Q.from_dict replay of reference query dicts."""
    got = _hit_map(idx, Q.boolean((MUST_NOT, Q.term("text", "spark"))))
    assert got == {}
    # empty boolean also matches nothing
    assert _hit_map(idx, Q.boolean()) == {}


def test_bool_filter_only_matches_all_passing(idx):
    """FILTER-only boolean: all docs passing the filter, score 0."""
    got = _hit_map(idx, Q.boolean((FILTER, Q.term("text", "spark"))))
    assert got == {0: 0.0, 2: 0.0, 4: 0.0, 5: 0.0}
    # FILTER + MUST_NOT mix keeps the filter-driven base
    got2 = _hit_map(
        idx,
        Q.boolean(
            (FILTER, Q.term("text", "spark")), (MUST_NOT, Q.term("text", "scan"))
        ),
    )
    assert got2 == {0: 0.0, 4: 0.0, 5: 0.0}


def test_bool_filter_does_not_score(idx):
    plain = _hit_map(idx, Q.term("text", "spark"))
    filtered = _hit_map(
        idx,
        Q.boolean((MUST, Q.term("text", "spark")), (FILTER, Q.term("text", "join"))),
    )
    assert set(filtered) == {0, 5}
    for d in filtered:
        assert abs(filtered[d] - plain[d]) < 1e-9  # FILTER adds no score


def test_bool_must_plus_should_scores(idx):
    got = _hit_map(
        idx,
        Q.boolean((MUST, Q.term("text", "table")), (SHOULD, Q.term("text", "scan"))),
    )
    assert set(got) == {1, 2, 3}
    assert abs(got[2] - (naive_bm25("table", 2) + naive_bm25("scan", 2))) < 1e-9
    assert abs(got[1] - naive_bm25("table", 1)) < 1e-9


def test_phrase_query(idx):
    got = _hit_map(idx, Q.phrase("text", "fast", "spark"))
    # adjacent 'fast spark' only in doc 0? doc0: spark fast spark join -> 'fast spark' at pos1->2 yes
    # doc5: fast fast fast join spark -> no adjacency
    assert set(got) == {0}


def test_phrase_repeated_term(idx):
    got = _hit_map(idx, Q.phrase("text", "scan", "scan"))
    assert set(got) == {2}


def test_prefix_query_constant_score(idx):
    got = _hit_map(idx, Q.prefix("text", "sc"))
    assert got == {2: 1.0}
    got2 = _hit_map(idx, Q.prefix("text", "s"))
    assert set(got2) == {0, 1, 2, 4, 5}


def test_wildcard_query(idx):
    got = _hit_map(idx, Q.wildcard("text", "?oin"))
    assert set(got) == {0, 1, 3, 5}
    got2 = _hit_map(idx, Q.wildcard("text", "uni*"))
    assert set(got2) == {4}


def test_range_query_numeric(idx):
    got = _hit_map(idx, Q.range("stars", lower=2, upper=4, range_type="Int"))
    assert set(got) == {0, 4, 5}
    # exclusive bounds
    got2 = _hit_map(
        idx, Q.range("stars", lower=2, upper=4, include_lower=False, include_upper=False)
    )
    assert set(got2) == {0}


def test_keyword_field_term(idx):
    got = _hit_map(idx, Q.term("lang", "py"))
    assert set(got) == {0, 1, 4}


def test_drilldown(idx):
    got = _hit_map(idx, Q.drilldown("lang", ["java"]))
    assert set(got) == {2}


def test_quantized_scoring_end_to_end(spark):
    """quantized=True scores with the SmallFloat-rounded dl — the
    Lucene-8 parity mode (SURVEY §1.4). dl=20 quantizes to 20 exactly?
    no: 20 -> (20>>1&7|8)<<1 = 20; use dl=19 -> 18."""
    import math

    from meresco_lucene_spark.query.bm25 import quantize_dl
    import numpy as np

    words = ["filler%d" % i for i in range(18)] + ["target"]  # dl = 19
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": [" ".join(words), "target two"]})
    ix = InvertedIndex.build(
        spark.createDataFrame(pdf), id_col="doc_id", text_cols=["text"],
        quantized=True, cache=False,
    )
    got = {r["doc_id"]: r["score"] for r in hits(ix, Q.term("text", "target")).collect()}
    n, avgdl = 2, (19 + 2) / 2
    q19 = int(quantize_dl(np.array([19]))[0])
    assert q19 == 18  # the quantization actually changes this dl
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    expect0 = idf * 1 / (1 + K1 * (1 - B + B * q19 / avgdl))
    assert abs(got[0] - expect0) < 1e-9
    # unquantized differs
    expect0_raw = idf * 1 / (1 + K1 * (1 - B + B * 19 / avgdl))
    assert abs(got[0] - expect0_raw) > 1e-6


def test_quantized_norms_change_dl(idx):
    # dl=5 is <8 so exact; craft check via norm_dl column equality instead
    rows = {r["doc_id"]: (r["dl"], r["norm_dl"]) for r in idx.lengths_for("text").collect()}
    for d, (dl, ndl) in rows.items():
        assert ndl <= dl


# ---------------------------------------------------------------- search()


def test_pagination_semantics(idx):
    """LuceneTest.java:363-394: total is always the full count; page is
    hits[start:stop]."""
    q = Q.term("text", "join")  # matches docs 0,1,3,5
    full = search(idx, q, start=0, stop=10)
    assert full.total == 4
    assert len(full.hits) == 4
    r = search(idx, q, start=1, stop=10)
    assert r.total == 4 and len(r.hits) == 3
    r = search(idx, q, start=0, stop=2)
    assert r.total == 4 and len(r.hits) == 2
    r = search(idx, q, start=2, stop=2)
    assert r.total == 4 and len(r.hits) == 0
    r = search(idx, q, start=1, stop=2)
    assert r.total == 4 and len(r.hits) == 1
    r = search(idx, q, start=0, stop=0)
    assert r.total == 4 and len(r.hits) == 0


def test_sort_by_field_missing_values(idx):
    # stars: doc3 is null. STRING_LAST-style: nulls last in asc.
    r = search(
        idx,
        Q.matchall(),
        sort_keys=[{"sortBy": "stars", "sortDescending": False, "missingValue": "STRING_LAST"}],
        stop=10,
    )
    assert [h.id for h in r.hits] == [1, 4, 0, 5, 2, 3]
    r = search(
        idx,
        Q.matchall(),
        sort_keys=[{"sortBy": "stars", "sortDescending": True, "missingValue": "STRING_FIRST"}],
        stop=10,
    )
    assert [h.id for h in r.hits] == [2, 5, 0, 4, 1, 3]


def test_sort_numeric_missing_fill(idx):
    # numeric missing value filled with -MAX -> doc3 first ascending
    r = search(
        idx,
        Q.matchall(),
        sort_keys=[{"sortBy": "stars", "sortDescending": False, "missingValue": -(2**31)}],
        stop=10,
    )
    assert [h.id for h in r.hits] == [3, 1, 4, 0, 5, 2]


def test_search_stored_fields(idx):
    r = search(idx, Q.term("text", "unique_term"), stored_fields=["lang", "stars"])
    assert r.hits[0].fields == {"lang": "py", "stars": 2}


def test_filter_and_exclude_queries(idx):
    r = search(
        idx,
        Q.term("text", "join"),
        filter_queries=[Q.term("lang", "py")],
        stop=10,
    )
    assert {h.id for h in r.hits} == {0, 1}
    r = search(
        idx,
        Q.term("text", "join"),
        exclude_queries=[Q.term("lang", "py")],
        stop=10,
    )
    assert {h.id for h in r.hits} == {3, 5}


def test_facet_counts(idx):
    r = search(idx, Q.matchall(), facets=[{"fieldname": "lang", "maxTerms": 10}])
    assert r.drilldownData == [
        {
            "fieldname": "lang",
            "terms": [
                {"term": "py", "count": 3},
                {"term": "go", "count": 1},
                {"term": "java", "count": 1},
            ],
        }
    ]


def test_facet_max_terms(idx):
    r = search(idx, Q.matchall(), facets=[{"fieldname": "lang", "maxTerms": 1}])
    assert r.drilldownData[0]["terms"] == [{"term": "py", "count": 3}]


def test_dedup(idx):
    """DeDupFilterSuperCollector semantics: one hit per dedup-key group,
    duplicateCount per group, totalWithDuplicates = pre-dedup count."""
    r = search(idx, Q.matchall(), dedup_field="lang", stop=10)
    assert r.totalWithDuplicates == 6
    # groups: py(3), java(1), go(1), null->self (1 doc: doc5)
    assert r.total == 4
    by_id = {h.id: h for h in r.hits}
    py_hit = [h for h in r.hits if h.duplicateCount == 3]
    assert len(py_hit) == 1
