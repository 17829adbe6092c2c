"""Query IR: the engine's portable query representation.

Mirrors the reference's JSON query-dict IR — the wire format produced by
``queryexpressiontolucenequerydict.py`` and materialized by
``JsonQueryConverter.convertToQuery`` (JsonQueryConverter.java:189-236) —
so reference query fixtures can be replayed verbatim via
:meth:`Q.from_dict`.  Builders (:meth:`Q.term` etc.) are the ergonomic
Python-side API.

Occur semantics (reference OCCUR map queryexpressiontolucenequerydict.py:259-263):
MUST (scoring, conjunctive), SHOULD (scoring, disjunctive), MUST_NOT
(anti), FILTER (non-scoring conjunctive).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

MUST = "MUST"
SHOULD = "SHOULD"
MUST_NOT = "MUST_NOT"
FILTER = "FILTER"


@dataclass(frozen=True)
class Q:
    type: str
    boost: float = 1.0
    # TermQuery / PrefixQuery / WildcardQuery / DrillDown
    field: str | None = None
    value: Any = None
    # PhraseQuery
    terms: tuple[str, ...] = ()
    # BooleanQuery: clauses [(occur, Q)]
    clauses: tuple[tuple[str, "Q"], ...] = ()
    # RangeQuery
    range_type: str | None = None  # 'String' | 'Int' | 'Long' | 'Double'
    lower: Any = None
    upper: Any = None
    include_lower: bool = True
    include_upper: bool = True

    # ----------------------------------------------------------- builders
    @staticmethod
    def matchall(boost: float = 1.0) -> "Q":
        return Q(type="MatchAllDocsQuery", boost=boost)

    @staticmethod
    def term(field: str, value: str, boost: float = 1.0) -> "Q":
        return Q(type="TermQuery", field=field, value=value, boost=boost)

    @staticmethod
    def phrase(field: str, *terms: str, boost: float = 1.0) -> "Q":
        return Q(type="PhraseQuery", field=field, terms=tuple(terms), boost=boost)

    @staticmethod
    def prefix(field: str, prefix: str, boost: float = 1.0) -> "Q":
        return Q(type="PrefixQuery", field=field, value=prefix, boost=boost)

    @staticmethod
    def wildcard(field: str, pattern: str, boost: float = 1.0) -> "Q":
        return Q(type="WildcardQuery", field=field, value=pattern, boost=boost)

    @staticmethod
    def range(
        field: str,
        lower: Any = None,
        upper: Any = None,
        include_lower: bool = True,
        include_upper: bool = True,
        range_type: str = "String",
    ) -> "Q":
        return Q(
            type="RangeQuery",
            field=field,
            lower=lower,
            upper=upper,
            include_lower=include_lower,
            include_upper=include_upper,
            range_type=range_type,
        )

    @staticmethod
    def boolean(*clauses: tuple[str, "Q"], boost: float = 1.0) -> "Q":
        return Q(type="BooleanQuery", clauses=tuple(clauses), boost=boost)

    @staticmethod
    def and_(*qs: "Q") -> "Q":
        return Q.boolean(*[(MUST, q) for q in qs])

    @staticmethod
    def or_(*qs: "Q") -> "Q":
        return Q.boolean(*[(SHOULD, q) for q in qs])

    @staticmethod
    def not_(base: "Q", *nots: "Q") -> "Q":
        return Q.boolean((MUST, base), *[(MUST_NOT, q) for q in nots])

    @staticmethod
    def distance(field: str, lat: float, lon: float, max_meters: float) -> "Q":
        """Geo distance query (reference Q8: LatLonPoint.newDistanceQuery,
        JsonQueryConverter.java:333-339; client converts km -> m,
        queryexpressiontolucenequerydict.py:252)."""
        return Q(
            type="DistanceQuery", field=field, value=(lat, lon), lower=max_meters
        )

    @staticmethod
    def drilldown(dim: str, path: list[str], boost: float = 1.0) -> "Q":
        """Facet drilldown term (reference JsonQueryConverter.java:353-369:
        term ``$facets:dim/path``)."""
        return Q(type="DrillDown", field=dim, terms=tuple(path), boost=boost)

    # ------------------------------------------------------- dict round-trip
    @staticmethod
    def from_dict(d: dict) -> "Q":
        """Parse the reference JSON query-dict IR."""
        t = d["type"]
        boost = float(d.get("boost", 1.0))
        if t == "MatchAllDocsQuery":
            return Q.matchall(boost)
        if t == "TermQuery":
            return Q.term(d["term"]["field"], d["term"]["value"], boost)
        if t == "PhraseQuery":
            terms = [x["value"] for x in d["terms"]]
            return Q.phrase(d["terms"][0]["field"], *terms, boost=boost)
        if t == "PrefixQuery":
            return Q.prefix(d["term"]["field"], d["term"]["value"], boost)
        if t == "WildcardQuery":
            return Q.wildcard(d["term"]["field"], d["term"]["value"], boost)
        if t == "RangeQuery":
            return Q(
                type="RangeQuery",
                field=d["field"],
                range_type=d.get("rangeType", "String"),
                lower=d.get("lowerTerm"),
                upper=d.get("upperTerm"),
                include_lower=bool(d.get("includeLower", True)),
                include_upper=bool(d.get("includeUpper", True)),
                boost=boost,
            )
        if t == "BooleanQuery":
            clauses = tuple(
                (c["occur"], Q.from_dict(c)) for c in d["clauses"]
            )
            return Q(type="BooleanQuery", clauses=clauses, boost=boost)
        if t == "DistanceQuery":
            # the reference wire key is "radius" (JsonQueryConverter.
            # java:333-339); "maxDistance" kept for back-compat
            return Q.distance(
                d["field"], d["lat"], d["lon"],
                d["radius"] if "radius" in d else d["maxDistance"],
            )
        raise ValueError(f"unknown query type: {t}")

    def to_dict(self) -> dict:
        d: dict[str, Any] = {"type": self.type}
        if self.boost != 1.0:
            d["boost"] = self.boost
        if self.type in ("TermQuery", "PrefixQuery", "WildcardQuery"):
            d["term"] = {"field": self.field, "value": self.value}
        elif self.type == "PhraseQuery":
            d["terms"] = [{"field": self.field, "value": v} for v in self.terms]
        elif self.type == "RangeQuery":
            d.update(
                field=self.field,
                rangeType=self.range_type,
                lowerTerm=self.lower,
                upperTerm=self.upper,
                includeLower=self.include_lower,
                includeUpper=self.include_upper,
            )
        elif self.type == "BooleanQuery":
            d["clauses"] = [dict(c.to_dict(), occur=occ) for occ, c in self.clauses]
        elif self.type == "DistanceQuery":
            # wire shape of JsonQueryConverter.java:333-339
            d.update(
                field=self.field,
                lat=self.value[0],
                lon=self.value[1],
                radius=self.lower,
            )
        return d
