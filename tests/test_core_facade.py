"""LuceneCore facade (core.py): the reference's client `Lucene` API
(_lucene.py:75-170) driven the way reference call sites drive it —
wire-format field dicts, JSON query dicts, identifier-keyed updates and
deletes, one-pass executeQuery with facets/sort/dedup/suggestions."""

import pytest

from meresco_lucene_spark.core import LuceneCore
from meresco_lucene_spark.query.ir import MUST, Q

DOCS = [
    ("id:1", "fast table engines win", "en", 10),
    ("id:2", "slow table engines lose", "en", 20),
    ("id:3", "fast vector engines win", "de", 30),
]


def _fields(text, lang, n):
    return [
        {"type": "TextField", "name": "body", "value": text},
        {"type": "FacetField", "name": "lang", "value": lang},
        {"type": "IntField", "name": "n", "value": n},
    ]


@pytest.fixture()
def core(spark, tmp_path):
    c = LuceneCore(spark, str(tmp_path), name="main", n_shards=2)
    for ident, text, lang, n in DOCS:
        c.addDocument(identifier=ident, fields=_fields(text, lang, n))
    c.commit()
    return c


def test_add_commit_query_returns_identifiers(core):
    r = core.executeQuery(
        {"type": "TermQuery", "term": {"field": "body", "value": "fast"}}
    )
    assert r.total == 2
    assert {h.id for h in r.hits} == {"id:1", "id:3"}
    assert all(h.score > 0 for h in r.hits)


def test_update_is_delete_then_add(core):
    core.addDocument(
        identifier="id:1", fields=_fields("zznew body only", "en", 11)
    )
    core.commit()
    assert core.numDocs() == 3
    r = core.executeQuery(Q.term("body", "fast"))
    assert {h.id for h in r.hits} == {"id:3"}
    r = core.executeQuery(Q.term("body", "zznew"))
    assert {h.id for h in r.hits} == {"id:1"}


def test_delete_by_identifier_and_by_query(core):
    core.delete(identifier="id:2")
    core.commit()
    assert core.numDocs() == 2
    core.delete(
        luceneQuery={"type": "TermQuery", "term": {"field": "body", "value": "vector"}}
    )
    assert core.numDocs() == 1
    r = core.executeQuery(Q.matchall())
    assert {h.id for h in r.hits} == {"id:1"}


def test_execute_query_full_surface(core):
    r = core.executeQuery(
        Q.boolean((MUST, Q.term("body", "engines"))),
        facets=[{"fieldname": "lang", "maxTerms": 10}],
        sortKeys=[{"sortBy": "n", "sortDescending": True}],
        storedFields=["n"],
        stop=2,
    )
    assert r.total == 3
    assert [h.id for h in r.hits] == ["id:3", "id:2"]  # n desc, page 2
    assert r.hits[0].fields["n"] == 30
    terms = {t["term"]: t["count"] for t in r.drilldownData[0]["terms"]}
    assert terms == {"en": 2, "de": 1}


def test_dedup_field(core):
    r = core.executeQuery(Q.matchall(), dedupField="lang")
    assert r.totalWithDuplicates == 3
    assert r.total == 2
    counts = {h.id: h.duplicateCount for h in r.hits}
    assert sum(counts.values()) == 3


def test_prefix_search_and_fieldnames(core):
    r = core.prefixSearch("body", "en", showCount=True)
    assert r.hits == [("engines", 3)]
    names = core.fieldnames().hits
    assert "body" in names and "lang" in names
    assert core.drilldownFieldnames().hits == ["lang"]
    assert set(core.drilldownFieldnames(path=["lang"]).hits) == {"en", "de"}


def test_suggestion_request(core):
    r = core.executeQuery(
        Q.matchall(),
        suggestionRequest=dict(suggests=["tabel"], count=2, field="body"),
    )
    assert r.suggestions == {"tabel": ["table"]}
    # a word already in the index gets no suggestions (SUGGEST_WHEN_NOT_IN_INDEX)
    r = core.executeQuery(
        Q.matchall(),
        suggestionRequest=dict(suggests=["table"], count=2, field="body"),
    )
    assert r.suggestions == {"table": []}


def test_similar_documents_by_identifier(spark, tmp_path):
    """MLT needs a corpus big enough that df <= max_freq*N admits
    shared terms (the reference's CommonTermsQuery maxFreq cutoff
    behaves identically): 25 docs, two of them sharing a rare term."""
    c = LuceneCore(spark, str(tmp_path), name="mlt", n_shards=2)
    for i in range(25):
        extra = " zzrare" if i in (1, 2) else ""
        c.addDocument(
            identifier=f"id:{i}",
            fields=[{"type": "TextField", "name": "body",
                     "value": f"common words doc{i}{extra}"}],
        )
    c.commit()
    r = c.similarDocuments("id:1")
    ids = [h.id for h in r.hits]
    assert "id:2" in ids and "id:1" not in ids
    # page semantics (the reference delegates to executeQuery's default
    # stop=10 page): total counts ALL candidates, hits carry the page
    assert r.total == len(ids)
    paged = c.similarDocuments("id:1", stop=1)
    assert len(paged.hits) == 1 and paged.total == r.total


def test_similar_documents_paging_past_ten(spark, tmp_path):
    """ADVICE r5: total must count ALL candidates (not a baked-in
    top-10 cap) and pages starting at/after row 10 must be non-empty
    when candidates exist there."""
    c = LuceneCore(spark, str(tmp_path), name="mltp", n_shards=2)
    for i in range(20):
        extra = " zzrare" if i < 16 else ""
        c.addDocument(
            identifier=f"id:{i}",
            fields=[{"type": "TextField", "name": "body",
                     "value": f"common words doc{i}{extra}"}],
        )
    c.commit()
    r = c.similarDocuments("id:1", max_freq=0.9, stop=20)
    assert r.total == 15  # 16 sharers minus the seed itself
    assert len(r.hits) == 15
    tail = c.similarDocuments("id:1", max_freq=0.9, start=12, stop=15)
    assert len(tail.hits) == 3 and tail.total == 15


def test_auto_commit_at_commit_count(spark, tmp_path):
    c = LuceneCore(spark, str(tmp_path), name="auto", commit_count=2, n_shards=2)
    c.addDocument(identifier="a", fields=[{"type": "TextField", "name": "t", "value": "one doc"}])
    assert c.numDocs() == 0  # buffered, not yet searchable
    c.addDocument(identifier="b", fields=[{"type": "TextField", "name": "t", "value": "two doc"}])
    assert c.numDocs() == 2  # commit_count reached -> auto-commit


def test_reopen_in_new_handle(spark, tmp_path, core):
    fresh = LuceneCore(spark, str(tmp_path), name="main")
    r = fresh.executeQuery(Q.term("body", "table"))
    assert {h.id for h in r.hits} == {"id:1", "id:2"}


def test_unknown_field_rejected(core):
    core.addDocument(
        identifier="id:9",
        fields=[{"type": "TextField", "name": "other", "value": "x"}],
    )
    with pytest.raises(ValueError, match="pinned field set"):
        core.commit()


def test_multi_lucene_composed_query(spark, tmp_path):
    """MultiLuceneSpark routes single-core queries by core name and runs
    composed key-join queries over every core's current snapshot — the
    reference's MultiLucene observable (multilucene.py:39-75) with
    LuceneCore handles in place of HTTP connections."""
    from meresco_lucene_spark.compose.composedquery import ComposedQuery
    from meresco_lucene_spark.core import MultiLuceneSpark

    a = LuceneCore(spark, str(tmp_path), name="coreA", n_shards=2)
    for i in range(6):
        a.addDocument(
            identifier=f"a:{i}",
            fields=[
                {"type": "TextField", "name": "ta", "value": f"alpha doc {i}"},
                {"type": "LongField", "name": "K", "value": i},
            ],
        )
    a.commit()
    b = LuceneCore(spark, str(tmp_path), name="coreB", n_shards=2)
    for i in range(6):
        b.addDocument(
            identifier=f"b:{i}",
            fields=[
                {"type": "StringField", "name": "flag",
                 "value": "true" if i % 2 == 0 else "false"},
                {"type": "LongField", "name": "K", "value": i},
            ],
        )
    b.commit()

    multi = MultiLuceneSpark({"coreA": a, "coreB": b}, default_core="coreA")
    r = multi.executeQuery(Q.term("ta", "alpha"))
    assert r.total == 6
    r = multi.executeQuery(core="coreB", luceneQuery=Q.term("flag", "true"))
    assert r.total == 3

    cq = ComposedQuery("coreA", queries={"coreA": Q.matchall()})
    cq.set_core_query("coreB", Q.term("flag", "true"))
    cq.add_match("coreA", "K", "coreB", "K")
    r = multi.executeComposedQuery(cq)
    assert r.total == 3  # coreA docs whose K joins a flag=true coreB doc
    assert len(r.hits) == 3

    # the same query POSTed as the reference's asDict() wire dict — the
    # full client loop: wire dict in, JSON response out
    # (composedquery.py:250-258 fromDict; luceneresponse.py:38-43 asJson)
    r2 = multi.executeComposedQuery(cq.to_dict())
    assert [h.id for h in r2.hits] == [h.id for h in r.hits]
    from meresco_lucene_spark.query.executor import LuceneResponse

    r3 = LuceneResponse.fromJson(r2.asJson())
    assert r3.total == 3
    assert [h.id for h in r3.hits] == [h.id for h in r2.hits]
    assert all(isinstance(h.score, float) for h in r3.hits)


def test_clustered_execute_query(spark, tmp_path):
    """executeQuery(clustering=True) returns the reference's ClusterHit
    shape (Lucene.java:365-414): near-identical docs collapse into one
    representative carrying topDocs (identifier-resolved) + topTerms;
    singleton docs come back as plain hits; every doc appears once."""
    c = LuceneCore(spark, str(tmp_path), name="cl", n_shards=2)
    for i in range(4):  # a tight cluster: same term vector
        c.addDocument(
            identifier=f"dup:{i}",
            fields=[{"type": "TextField", "name": "body",
                     "value": "identical cluster content words"}],
        )
    c.addDocument(
        identifier="solo",
        fields=[{"type": "TextField", "name": "body",
                 "value": "completely different cluster text"}],
    )
    c.commit()
    r = c.executeQuery(Q.term("body", "cluster"), clustering=True)
    assert r.total == 5
    all_ids = {h.id for h in r.hits}
    member_ids = {
        d["identifier"] for h in r.hits if h.topDocs for d in h.topDocs
    }
    # the 4 duplicates surfaced through ONE representative hit
    dup_hits = [h for h in r.hits if h.id.startswith("dup:")]
    assert len(dup_hits) == 1
    assert {f"dup:{i}" for i in range(4)} <= member_ids
    assert dup_hits[0].topTerms  # PageRank term ranking present
    assert "solo" in all_ids


def test_failed_commit_keeps_buffer_recommittable(core):
    """ADVICE r4: a failed commit must not drop accepted ops — the
    reference's addDocument+commit cycle never loses ops on an
    IndexWriter failure. The buffer is cleared only after commit_batch
    durably returns."""
    core.addDocument(
        identifier="id:ok",
        fields=_fields("buffered survivor text", "en", 40),
    )
    core.addDocument(
        identifier="id:bad",
        fields=[{"type": "TextField", "name": "unknownfield", "value": "x"}],
    )
    with pytest.raises(ValueError, match="pinned field set"):
        core.commit()
    assert core.numDocs() == 3  # nothing half-committed
    # repair the bad op (last-write-wins by identifier) and retry: BOTH
    # buffered ops commit — nothing was discarded by the failure
    core.addDocument(identifier="id:bad", fields=_fields("repaired", "de", 41))
    core.commit()
    assert core.numDocs() == 5
    r = core.executeQuery(Q.term("body", "survivor"))
    assert {h.id for h in r.hits} == {"id:ok"}


def test_first_commit_spec_is_union_of_batch(spark, tmp_path):
    """ADVICE r4: the pinned field spec is the UNION of fields across
    every add in the first commit, not the first document's fields — a
    heterogeneous first batch must not pin a too-narrow spec and then
    reject its own siblings."""
    c = LuceneCore(spark, str(tmp_path), name="union", n_shards=2)
    c.addDocument(
        identifier="narrow",
        fields=[{"type": "TextField", "name": "body", "value": "only body"}],
    )
    c.addDocument(identifier="wide", fields=_fields("body and more", "en", 7))
    c.commit()
    assert c.numDocs() == 2
    r = c.executeQuery(Q.term("body", "more"), storedFields=["n"])
    assert r.hits[0].fields["n"] == 7
    # later commits may use any pinned field, including ones the very
    # first document lacked
    c.addDocument(identifier="later", fields=_fields("third doc", "de", 8))
    c.commit()
    assert c.numDocs() == 3


def test_first_commit_conflicting_kinds_raise(spark, tmp_path):
    c = LuceneCore(spark, str(tmp_path), name="conflict", n_shards=2)
    c.addDocument(
        identifier="a",
        fields=[{"type": "TextField", "name": "f", "value": "text here"}],
    )
    c.addDocument(
        identifier="b", fields=[{"type": "IntField", "name": "f", "value": 3}]
    )
    with pytest.raises(ValueError, match="conflicting field kinds"):
        c.commit()
    # nothing persisted: the spec file must not pin a wrong schema
    import os

    assert not os.path.exists(os.path.join(c.root, "_core_fields.json"))


def test_suggest_modes_reference_goldens(spark, tmp_path):
    """The reference's suggest-mode tests recast
    (LuceneTest.java:574-617, modes JsonQueryConverter.java:177-187):
    field5 holds 'value2' only; 'value0'/'valeu' are suggestable into
    it; SUGGEST_MORE_POPULAR requires candidate df > word df;
    SUGGEST_ALWAYS suggests even for in-index words."""
    c = LuceneCore(spark, str(tmp_path), name="sugg", n_shards=2)
    c.addDocument(
        identifier="id:0",
        fields=[
            {"type": "TextField", "name": "field1", "value": "value0"},
            {"type": "TextField", "name": "field5", "value": "value2"},
        ],
    )
    c.commit()
    # testSuggestions: both words suggest 'value2' in field5
    r = c.executeQuery(
        Q.matchall(),
        suggestionRequest=dict(
            suggests=["value0", "valeu"], count=2, field="field5"
        ),
    )
    assert r.suggestions["value0"] == ["value2"]
    assert r.suggestions["valeu"] == ["value2"]

    # testSuggestionsSuggestMorePopular: field0 df('value')=1, df('valeu')=2
    m = LuceneCore(spark, str(tmp_path), name="pop", n_shards=2)
    m.addDocument(identifier="id:0", fields=[
        {"type": "TextField", "name": "field0", "value": "value"}])
    m.addDocument(identifier="id:1", fields=[
        {"type": "TextField", "name": "field0", "value": "valeu"}])
    m.addDocument(identifier="id:2", fields=[
        {"type": "TextField", "name": "field0", "value": "valeu"}])
    m.commit()
    r = m.executeQuery(
        Q.matchall(),
        suggestionRequest=dict(suggests=["value"], count=2, field="field0"),
    )
    assert r.suggestions["value"] == []  # in index, default mode
    r = m.executeQuery(
        Q.matchall(),
        suggestionRequest=dict(
            suggests=["value"], count=2, field="field0",
            mode="SUGGEST_MORE_POPULAR",
        ),
    )
    assert r.suggestions["value"][0] == "valeu"
    # the more-popular constraint is strict: 'valeu' (df 2) gets nothing
    # from 'value' (df 1)
    r = m.executeQuery(
        Q.matchall(),
        suggestionRequest=dict(
            suggests=["valeu"], count=2, field="field0",
            mode="SUGGEST_MORE_POPULAR",
        ),
    )
    assert r.suggestions["valeu"] == []
    # SUGGEST_ALWAYS: in-index words still get their neighbors
    r = m.executeQuery(
        Q.matchall(),
        suggestionRequest=dict(
            suggests=["value"], count=2, field="field0", mode="SUGGEST_ALWAYS"
        ),
    )
    assert "valeu" in r.suggestions["value"]
    with pytest.raises(ValueError, match="unknown suggest mode"):
        m.executeQuery(
            Q.matchall(),
            suggestionRequest=dict(
                suggests=["value"], count=1, field="field0", mode="NOPE"
            ),
        )


def test_delete_by_query_never_collects_to_driver(core, monkeypatch):
    """VERDICT r4 #2: the facade's delete-by-query goes through the
    frame-path tombstone commit (IncrementalIndexStore.delete_matching)
    — the matched ids must never be materialized on the driver."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):  # pragma: no cover - should never run
        raise AssertionError("delete(luceneQuery=) collected to the driver")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    core.delete(luceneQuery=Q.term("body", "vector"))
    monkeypatch.undo()
    assert core.numDocs() == 2
    r = core.executeQuery(Q.matchall())
    assert {h.id for h in r.hits} == {"id:1", "id:2"}


def test_delete_by_query_no_match_commits_nothing(core):
    gens_before = core._ensure_store()._gens()
    core.delete(luceneQuery=Q.term("body", "zznothere"))
    assert core._ensure_store()._gens() == gens_before
    assert core.numDocs() == 3


def test_numdocs_is_snapshot_cached(spark, tmp_path, core, monkeypatch):
    """VERDICT r4 #6: numDocs is O(1) after the first call per snapshot
    (the reference's numDocs is O(1) reader metadata). The count
    persists beside the store, so a FRESH handle at the same tip serves
    it without any Spark job."""
    from pyspark.sql import DataFrame

    # create tombstones so the count is not a metadata-only case
    core.addDocument(identifier="id:1", fields=_fields("updated body", "en", 11))
    core.commit()
    assert core.numDocs() == 3  # first call per snapshot: one count job
    def _boom(self, *a, **k):  # pragma: no cover
        raise AssertionError("numDocs ran a Spark count after caching")

    monkeypatch.setattr(DataFrame, "count", _boom)
    assert core.numDocs() == 3  # cached: no job
    fresh = LuceneCore(spark, str(tmp_path), name="main")
    assert fresh.numDocs() == 3  # cross-session: served from disk cache


def test_clustered_pagination_skips_preceding_cluster(spark, tmp_path):
    """ADVICE r4: with start > 0, a cluster whose first member ranked
    before `start` is SKIPPED on the page (the reference's seen-set walk
    over the full topDocs slice), not re-emitted under a later member as
    a duplicate representative."""
    c = LuceneCore(spark, str(tmp_path), name="clpage", n_shards=2)
    for i in range(4):  # tight cluster, highest tf for 'cluster'
        c.addDocument(
            identifier=f"dup:{i}",
            fields=[{"type": "TextField", "name": "body",
                     "value": "cluster cluster cluster identical content"}],
        )
    c.addDocument(
        identifier="solo",
        fields=[{"type": "TextField", "name": "body",
                 "value": "completely different cluster text"}],
    )
    c.commit()
    full = c.executeQuery(Q.term("body", "cluster"), clustering=True, stop=10)
    assert [h.id for h in full.hits][0].startswith("dup:")  # cluster ranks first
    page = c.executeQuery(
        Q.term("body", "cluster"), clustering=True, start=1, stop=10
    )
    ids = [h.id for h in page.hits]
    assert ids == ["solo"]  # the cluster was page-0 material: skipped, not duplicated


def test_latlon_field_and_distance_query(spark, tmp_path):
    """LatLonField wire format (DocumentStringToDocument.java:153-157:
    value [lat, lon]) + the reference's DistanceQuery JSON
    (JsonQueryConverter.java:333-339) through the facade."""
    c = LuceneCore(spark, str(tmp_path), name="geo", n_shards=2)
    pts = {"ams": (52.37, 4.89), "rtm": (51.92, 4.48), "ber": (52.52, 13.40)}
    for ident, (lat, lon) in pts.items():
        c.addDocument(identifier=ident, fields=[
            {"type": "TextField", "name": "body", "value": f"city {ident}"},
            {"type": "LatLonField", "name": "geo", "value": [lat, lon]},
        ])
    c.commit()
    # 80 km around Amsterdam: Rotterdam in, Berlin out
    r = c.executeQuery({"type": "DistanceQuery", "field": "geo",
                        "lat": 52.37, "lon": 4.89, "radius": 80_000.0})
    assert {h.id for h in r.hits} == {"ams", "rtm"}
