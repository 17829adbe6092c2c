"""F7: query-translation goldens (queryexpressiontolucenequerydicttest.py:44-228)
recast onto the Q IR dict round-trip + the CQL front-end. Pure Python."""

from meresco_lucene_spark.query.cql import cql_to_query
from meresco_lucene_spark.query.ir import FILTER, MUST, MUST_NOT, SHOULD, Q


def test_term_query_dict():
    d = {"type": "TermQuery", "term": {"field": "field", "value": "value"}}
    q = Q.from_dict(d)
    assert q.type == "TermQuery" and q.field == "field" and q.value == "value"
    assert q.to_dict() == d


def test_boolean_and_dict():
    d = {
        "type": "BooleanQuery",
        "clauses": [
            {"type": "TermQuery", "term": {"field": "field1", "value": "value1"}, "occur": "MUST"},
            {"type": "TermQuery", "term": {"field": "field2", "value": "value2"}, "occur": "MUST"},
        ],
    }
    q = Q.from_dict(d)
    assert [occ for occ, _ in q.clauses] == [MUST, MUST]
    assert q.to_dict() == d


def test_nested_not_dict():
    d = {
        "type": "BooleanQuery",
        "clauses": [
            {"type": "TermQuery", "term": {"field": "field1", "value": "value1"}, "occur": "MUST"},
            {
                "type": "BooleanQuery",
                "occur": "MUST_NOT",
                "clauses": [
                    {"type": "TermQuery", "term": {"field": "field2", "value": "value2"}, "occur": "MUST"},
                    {"type": "TermQuery", "term": {"field": "field3", "value": "value3"}, "occur": "MUST"},
                ],
            },
        ],
    }
    q = Q.from_dict(d)
    assert q.clauses[1][0] == MUST_NOT
    assert q.clauses[1][1].type == "BooleanQuery"
    assert q.to_dict() == d


def test_phrase_dict():
    d = {
        "type": "PhraseQuery",
        "terms": [
            {"field": "unqualified", "value": "cats"},
            {"field": "unqualified", "value": "dogs"},
        ],
    }
    q = Q.from_dict(d)
    assert q.terms == ("cats", "dogs")
    assert q.to_dict() == d


def test_range_dict_roundtrip():
    d = {
        "type": "RangeQuery",
        "field": "intfield",
        "rangeType": "Int",
        "lowerTerm": 1,
        "upperTerm": 10,
        "includeLower": True,
        "includeUpper": False,
    }
    q = Q.from_dict(d)
    assert q.lower == 1 and q.upper == 10 and not q.include_upper
    assert q.to_dict() == d


# --------------------------------------------------------------- CQL parse


def test_cql_unqualified_term_lowercased():
    # testRightHandSideIsLowercase: term 'CaT' -> lowercase term
    q = cql_to_query("CaT")
    assert q == Q.term("unqualified", "cat")


def test_cql_matchall():
    assert cql_to_query("*").type == "MatchAllDocsQuery"


def test_cql_field_term():
    assert cql_to_query("field = value") == Q.term("field", "value")


def test_cql_boolean_and_or_not():
    q = cql_to_query("field1=value1 AND field2=value2")
    assert q == Q.and_(Q.term("field1", "value1"), Q.term("field2", "value2"))
    q = cql_to_query("field1=value1 OR field2=value2")
    assert q == Q.or_(Q.term("field1", "value1"), Q.term("field2", "value2"))
    q = cql_to_query("field1=value1 NOT field2=value2")
    assert q == Q.boolean(
        (MUST, Q.term("field1", "value1")), (MUST_NOT, Q.term("field2", "value2"))
    )


def test_cql_left_assoc_nesting():
    q = cql_to_query("a=1 AND b=2 OR c=3")
    assert q.type == "BooleanQuery"
    assert q.clauses[0][0] == SHOULD
    inner = q.clauses[0][1]
    assert inner == Q.and_(Q.term("a", "1"), Q.term("b", "2"))


def test_cql_parens():
    q = cql_to_query("a=1 AND (b=2 OR c=3)")
    assert q.clauses[1][1] == Q.or_(Q.term("b", "2"), Q.term("c", "3"))


def test_cql_phrase():
    # multi-token analyzed value -> PhraseQuery (:166-172)
    q = cql_to_query('"cats dogs"')
    assert q == Q.phrase("unqualified", "cats", "dogs")
    q = cql_to_query('field = "Cats Dogs"')
    assert q == Q.phrase("field", "cats", "dogs")


def test_cql_prefix_and_wildcard():
    q = cql_to_query("field = pre*")
    assert q == Q.prefix("field", "pre")
    q = cql_to_query("field = ???*")
    assert q == Q.wildcard("field", "???*")
    # single char + * is NOT a prefix query per the :257 regex (needs >=2)
    q = cql_to_query("field = a*")
    assert q.type == "TermQuery"


def test_cql_ranges():
    q = cql_to_query("intfield >= 2")
    assert q.type == "RangeQuery" and q.lower == 2 and q.include_lower
    q = cql_to_query("intfield < 10")
    assert q.upper == 10 and not q.include_upper and q.lower is None


def test_cql_exact():
    q = cql_to_query('field exact "The Exact Value"')
    assert q == Q.term("field", "the exact value")


def test_cql_unqualified_expansion():
    q = cql_to_query("value", unqualified_fields=[("aField", 1.0), ("oField", 2.0)])
    assert q.type == "BooleanQuery"
    assert q.clauses[0] == (SHOULD, Q.term("aField", "value"))
    assert q.clauses[1] == (SHOULD, Q.term("oField", "value", boost=2.0))


def test_lucene_response_json_round_trip():
    """LuceneResponse.asJson/fromJson with the reference's tagged-Hit
    codec (luceneresponsetest.py:35-43 testJson; luceneresponse.py:
    49-65: Hit serializes as {"__class__": "Hit", ...})."""
    import json

    from meresco_lucene_spark.query.executor import Hit, LuceneResponse

    r = LuceneResponse(
        total=3,
        hits=[Hit(id="1", score=1.5), Hit(id="2", score=0.5,
                                          fields={"title": "t"})],
        drilldownData=[{"terms": [], "fieldname": "field"}],
    )
    payload = r.asJson(sort_keys=True)
    raw = json.loads(payload)
    assert raw["hits"][0]["__class__"] == "Hit"
    r2 = LuceneResponse.fromJson(payload)
    assert r2.total == 3
    assert [h.id for h in r2.hits] == ["1", "2"]
    assert r2.hits[1].fields == {"title": "t"}
    assert r2.drilldownData == [{"terms": [], "fieldname": "field"}]

    # unknown keys from a reference (Java) response survive as attributes
    foreign = json.dumps({
        "total": 1, "queryTime": 12,
        "hits": [{"__class__": "Hit", "id": "x", "score": 0.1,
                  "sortValues": ["a"]}],
    })
    r3 = LuceneResponse.fromJson(foreign)
    assert r3.queryTime == 12 and r3.hits[0].sortValues == ["a"]

    # empty members are omitted on the wire; total/hits always present
    lean = json.loads(LuceneResponse(total=0, hits=[]).asJson())
    assert lean == {"total": 0, "hits": []}

    # ADVICE r5: a member explicitly set to a non-default EMPTY value
    # survives serialization (the reference emits every set attribute)
    withempty = json.loads(
        LuceneResponse(total=0, hits=[], suggestions={}).asJson()
    )
    assert withempty == {"total": 0, "hits": [], "suggestions": {}}
