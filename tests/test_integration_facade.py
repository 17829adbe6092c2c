"""The reference's integration corpus + query goldens, through the
CLIENT API (LuceneCore / MultiLuceneSpark) — the last reference test
layer (test/_integration/lucenetest.py:45-242) recast against the
facade, the way a reference deployment actually drives the engine:
wire-format addDocument field dicts, executeQuery / prefixSearch /
executeComposedQuery calls, identifier-keyed delete.

The LOW-level recast of the same goldens (DataFrame index + executor)
lives in tests/test_integration_corpus.py. Since round 5 the facade
covers the full set: per-field Dutch stemming via the analyzer setting
and hierarchical facet paths via FacetField "path" arrays are client-API
surface too. Skipped when the reference tree is absent."""

import os

import pytest
from pyspark.sql import functions as F

from meresco_lucene_spark.core import LuceneCore, MultiLuceneSpark
from meresco_lucene_spark.query.ir import Q
from test_integration_corpus import _parse_dir

DATA = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not available"
)


def _main_fields(row: dict) -> list[dict]:
    """The integration server's field routing (helper/server.py) as
    wire-format dicts: analyzed text fields, an untokenized.field2 facet
    copy, int doc-values, and the join key the upload derives from the
    record number."""
    out = []
    for name in ("field1", "field2", "field3", "field4", "field5",
                 "field_missing"):
        v = row.get(name)
        if isinstance(v, str):
            out.append({"type": "TextField", "name": name, "value": v})
    for name in ("intfield1", "intfield2", "intfield3", "intfield_missing"):
        v = row.get(name)
        if v is not None:
            out.append({"type": "IntField", "name": name, "value": int(v)})
    if isinstance(row.get("field2"), str):
        out.append({"type": "FacetField", "name": "untokenized.field2",
                    "value": row["field2"]})
    out.append({"type": "KeyField", "name": "__key__.field",
                "value": row["id"].split(":")[-1]})
    return out


@pytest.fixture(scope="module")
def main_core(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("facade_int"))
    core = LuceneCore(spark, root, name="main", commit_count=10_000,
                      n_shards=4)
    for row in _parse_dir(f"{DATA}/main"):
        core.addDocument(identifier=row["id"], fields=_main_fields(row))
    core.commit()
    return core


@pytest.fixture(scope="module")
def main2_core(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("facade_int2"))
    core = LuceneCore(spark, root, name="main2", commit_count=10_000,
                      n_shards=4)
    for row in _parse_dir(f"{DATA}/main2"):
        fields = []
        for name in ("field1", "field2", "field3"):
            v = row.get(name)
            if isinstance(v, str):
                fields.append({"type": "TextField", "name": name, "value": v})
        fields.append({"type": "FacetField", "name": "untokenized.field2",
                       "value": row["field2"]})
        fields.append({"type": "KeyField", "name": "__key__.field",
                       "value": str(row["__key__.field"])})
        for name in ("groupfield", "sort1", "sort2"):
            fields.append({"type": "IntField", "name": name,
                           "value": int(row[name])})
        core.addDocument(identifier=row["id"], fields=fields)
    core.commit()
    return core


def test_query_counts(main_core):
    """lucenetest.py testQuery."""
    assert main_core.executeQuery(Q.term("field2", "value2")).total == 10
    assert main_core.executeQuery(Q.term("field1", "value1")).total == 2
    assert main_core.executeQuery(Q.matchall()).total == 100
    assert main_core.numDocs() == 100


def test_record_ids(main_core):
    """lucenetest.py testRecordIds: all 100 identifiers come back."""
    r = main_core.executeQuery(Q.matchall(), stop=100)
    assert {h.id for h in r.hits} == {f"record:{i}" for i in range(1, 101)}


def test_start_record_pagination(main_core):
    """lucenetest.py testStartRecord: page [51:61) of a stable order
    equals that slice of the full result."""
    sort = [{"sortBy": "intfield1", "sortDescending": False}]
    full = main_core.executeQuery(Q.matchall(), sortKeys=sort, stop=100)
    page = main_core.executeQuery(
        Q.matchall(), sortKeys=sort, start=50, stop=60
    )
    assert [h.id for h in page.hits] == [h.id for h in full.hits][50:60]


def test_sort_keys(main_core):
    """lucenetest.py testSortKeys: intfield1 asc -> record:1..10,
    desc -> record:100..91."""
    r = main_core.executeQuery(
        Q.matchall(),
        sortKeys=[{"sortBy": "intfield1", "sortDescending": False}],
        stop=10,
    )
    assert [h.id for h in r.hits] == [f"record:{i}" for i in range(1, 11)]
    r = main_core.executeQuery(
        Q.matchall(),
        sortKeys=[{"sortBy": "intfield1", "sortDescending": True}],
        stop=10,
    )
    assert [h.id for h in r.hits] == [f"record:{i}" for i in range(100, 90, -1)]


def test_sort_missing_values(main_core):
    """lucenetest.py testSortKeysWithMissingValues: 10 field_missing=test
    docs; docs without intfield_missing sort LAST both directions."""
    r = main_core.executeQuery(
        Q.term("field_missing", "test"),
        sortKeys=[{"sortBy": "intfield_missing", "sortDescending": True,
                   "missingValue": -(2**62)}],
        storedFields=["intfield_missing"],
        stop=10,
    )
    assert r.total == 10
    got = [h.fields["intfield_missing"] for h in r.hits]
    assert got[:7] == [66775, 187, 64, 42, 17, -5, -308]
    assert got[7:] == [None, None, None]
    r = main_core.executeQuery(
        Q.term("field_missing", "test"),
        sortKeys=[{"sortBy": "intfield_missing", "sortDescending": False,
                   "missingValue": 2**62}],
        storedFields=["intfield_missing"],
        stop=10,
    )
    got = [h.fields["intfield_missing"] for h in r.hits]
    assert got[:7] == [-308, -5, 17, 42, 64, 187, 66775]
    assert got[7:] == [None, None, None]


def test_facet(main_core):
    """lucenetest.py testFacet: value0..9 count 10 each except value1=9."""
    r = main_core.executeQuery(
        Q.matchall(),
        facets=[{"fieldname": "untokenized.field2", "maxTerms": 10}],
    )
    got = {t["term"]: t["count"] for t in r.drilldownData[0]["terms"]}
    expect = {f"value{i}": 10 for i in range(10)}
    expect["value1"] = 9
    assert got == expect


def test_autocomplete(main_core):
    """lucenetest.py testAutocomplete, recast against prefixSearch
    (Lucene.java:629-666 — the reference test drives the separate
    shingle-suggestion HTTP service, whose recast lives in
    test_suggest.py): completions of 'va' over field2 rank by docFreq,
    and value1 (df 9 vs 10 for its siblings) comes last."""
    r = main_core.prefixSearch("field2", "va", limit=10)
    assert set(r.hits) == {f"value{i}" for i in range(10)}
    assert r.hits[-1] == "value1"


def test_join(main_core, main2_core):
    """lucenetest.py testJoin: filtered main x main2 key join with a
    remote-core facet — 19 hits, exact id set, exact facet counts."""
    from meresco_lucene_spark.compose.composedquery import ComposedQuery

    multi = MultiLuceneSpark(
        {"main": main_core, "main2": main2_core}, default_core="main"
    )
    cq = ComposedQuery("main", queries={"main": Q.matchall()}, start=0, stop=100)
    cq.add_match("main", "__key__.field", "main2", "__key__.field")
    cq.add_filter_query(
        "main", Q.or_(Q.term("field2", "value0"), Q.term("field2", "value1"))
    )
    cq.add_facet("main2", {"fieldname": "untokenized.field2", "maxTerms": 5})
    cq.stored_fields = ["__id__"]
    r = multi.executeComposedQuery(cq)
    assert r.total == 19
    expect_ids = {
        "record:10", "record:11", "record:20", "record:21", "record:30",
        "record:31", "record:40", "record:41", "record:50", "record:51",
        "record:60", "record:61", "record:70", "record:71", "record:80",
        "record:81", "record:90", "record:91", "record:100",
    }
    assert {h.fields["__id__"] for h in r.hits} == expect_ids
    facet = r.drilldownData[0]
    assert facet["fieldname"] == "untokenized.field2"
    got = [(t["term"], t["count"]) for t in facet["terms"]]
    assert got[0] == ("value3", 27)
    assert got[1] == ("value0", 22)
    assert set(got[2:]) == {("value5", 19), ("value7", 19), ("value9", 19)}


def test_dedup(main_core, main2_core):
    """lucenetest.py testDedup: main has unique keys (dup count 1);
    main2 collapses 1000 records into 10 groups of 100."""
    r = main_core.executeQuery(
        Q.matchall(), dedupField="__key__.field", stop=3
    )
    assert r.total == 100
    assert r.totalWithDuplicates == 100
    assert [h.duplicateCount for h in r.hits] == [1, 1, 1]

    r = main2_core.executeQuery(
        Q.matchall(),
        dedupField="groupfield",
        dedupSortField={"sortBy": "sort1", "sortDescending": True},
        stop=100,
    )
    assert r.total == 10
    assert r.totalWithDuplicates == 1000
    assert [h.duplicateCount for h in r.hits] == [100] * 10


def test_add_delete(main_core):
    """lucenetest.py testAddDelete — LAST (mutates the module core, then
    restores the live set): add testrecord:1, find it by __id__, delete
    it, gone; live count back at 100."""
    main_core.addDocument(
        identifier="testrecord:1",
        fields=[{"type": "TextField", "name": "field1",
                 "value": "add delete test record"}],
    )
    main_core.commit()
    r = main_core.executeQuery(Q.term("__id__", "testrecord:1"))
    assert r.total == 1 and r.hits[0].id == "testrecord:1"
    assert main_core.numDocs() == 101
    main_core.delete(identifier="testrecord:1")
    main_core.commit()
    assert main_core.executeQuery(Q.term("__id__", "testrecord:1")).total == 0
    assert main_core.numDocs() == 100


def test_dutch_stemming_via_analyzer_setting(spark, tmp_path):
    """lucenetest.py testDutchStemming through the client API: a core
    configured with the reference's analyzer setting
    (lucenesettings.py:58-70, MerescoDutchStemmingAnalyzer with
    stemmingFields) indexes field4/field5 with keyword-repeat stemming —
    field5=katten matches the original form, field4=kat matches via the
    stemmed emission."""
    core = LuceneCore(
        spark, str(tmp_path), name="dutch", n_shards=2,
        analyzer={"type": "MerescoDutchStemmingAnalyzer",
                  "stemmingFields": ["field4", "field5"]},
    )
    for row in _parse_dir(f"{DATA}/main"):
        fields = [
            {"type": "TextField", "name": n, "value": row[n]}
            for n in ("field4", "field5")
            if isinstance(row.get(n), str)
        ]
        if fields:
            core.addDocument(identifier=row["id"], fields=fields)
    core.commit()
    # query through the reference client path: CQL converted with the
    # core's analyzer (queryexpressiontolucenequerydict.py:152-166 —
    # 'katten' post-analyses to [katten, kat] -> OR), so field5=katten
    # matches record:1's "hond en kat" via the stem and field4=kat
    # matches "honden en katten" via the index-side keyword-repeat
    from meresco_lucene_spark.query.cql import cql_to_query

    stem = ("field4", "field5")
    q = cql_to_query("field5=katten", stemming_fields=stem)
    assert core.executeQuery(q).total == 1
    q = cql_to_query("field4=kat", stemming_fields=stem)
    assert core.executeQuery(q).total == 1
    with pytest.raises(ValueError, match="No support for type"):
        LuceneCore(spark, str(tmp_path), name="bad", n_shards=2,
                   analyzer={"type": "NopeAnalyzer"})._ensure_store(
            samples=[{"f": ("text", "x")}])


def test_hierarchical_facet_via_facade(spark, tmp_path):
    """lucenetest.py testFieldHierarchicalDrilldown + Search through the
    client API: FacetField carries a PATH array on the wire
    (DocumentStringToDocument.java:145-152), drilldown counts come back
    per level, and an exact-path drilldown query matches 3 records."""
    core = LuceneCore(spark, str(tmp_path), name="hier",
                      commit_count=10_000, n_shards=2)
    for row in _parse_dir(f"{DATA}/main"):
        fields = [{"type": "TextField", "name": "field1",
                   "value": row["field1"]}]
        if row.get("fieldHier"):
            fields.append({"type": "FacetField",
                           "name": "untokenized.fieldHier",
                           "path": row["fieldHier"]})
        core.addDocument(identifier=row["id"], fields=fields)
    core.commit()
    r = core.executeQuery(
        Q.matchall(),
        facets=[{"fieldname": "untokenized.fieldHier", "maxTerms": 10}],
    )
    top = {t["term"]: t["count"] for t in r.drilldownData[0]["terms"]}
    assert top == {"parent0": 50, "parent1": 50}
    r = core.executeQuery(
        Q.matchall(),
        facets=[{"fieldname": "untokenized.fieldHier", "maxTerms": 10,
                 "path": ["parent0"]}],
    )
    sub = {t["term"]: t["count"] for t in r.drilldownData[0]["terms"]}
    # raw-corpus truth (see test_integration_corpus.py note: the
    # reference suite asserts 17/17/16 only because earlier tests
    # mutated record state before it ran)
    assert sub == {"child0": 16, "child1": 17, "child2": 17}
    # testFieldHierarchicalSearch: exact path -> 3 records
    r = core.executeQuery(
        Q.drilldown("untokenized.fieldHier",
                    ["parent0", "child1", "grandchild2"])
    )
    assert r.total == 3
    # drilldownFieldnames walks the levels
    assert core.drilldownFieldnames().hits == ["untokenized.fieldHier"]
    assert set(core.drilldownFieldnames(
        path=["untokenized.fieldHier"]).hits) == {"parent0", "parent1"}
    assert set(core.drilldownFieldnames(
        path=["untokenized.fieldHier", "parent0"]).hits) == {
        "child0", "child1", "child2"}
