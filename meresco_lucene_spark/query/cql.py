"""CQL front-end (reference Q13): CQL string -> Q IR.

The reference parses CQL with the external ``cqlparser`` into a
QueryExpression AST and converts it to the JSON query-dict IR
(converttocomposedquery.py:60-62, queryexpressiontolucenequerydict.py).
This is a self-contained recursive-descent parser for the same dialect
subset the reference's tests exercise:

  expr        := clause ((AND | OR | NOT) clause)*     (left-assoc;
                                                        NOT == AND NOT)
  clause      := index relation term | term | '(' expr ')'
  relation    := '=' | '==' | 'exact' | '>' | '<' | '>=' | '<='
  term        := '"..."' | word
  '*'                         -> MatchAllDocsQuery
  trailing '*' (>=2 word chars, queryexpressiontolucenequerydict.py:257)
                              -> PrefixQuery
  '???*'                      -> WildcardQuery
  analyzed multi-token value  -> PhraseQuery (:166-172)

Unqualified terms search ``unqualified_fields`` — [(field, boost)];
multiple fields expand to a SHOULD BooleanQuery (:107-125).
'exact'/'==' keeps the raw (lowercased) value as one term against the
untokenized field variant.
"""

from __future__ import annotations

import re

from meresco_lucene_spark.analysis.tokenizer import tokenize_text
from meresco_lucene_spark.query.ir import MUST, MUST_NOT, SHOULD, Q

_TOKEN_SPLIT = re.compile(
    r"\s*(\(|\)|>=|<=|==|=|>|<|\"[^\"]*\"|[^\s()<>=]+)"
)
_PREFIX_RE = re.compile(r"^[\w-]{2,}\*$")  # :257


class CqlSyntaxError(ValueError):
    pass


def _lex(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_SPLIT.match(s, pos)
        if not m:
            if s[pos:].strip():
                raise CqlSyntaxError(f"cannot lex at: {s[pos:]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


class _Parser:
    def __init__(
        self,
        tokens: list[str],
        unqualified_fields: list[tuple[str, float]],
        stemming_fields: tuple[str, ...] = (),
    ):
        self.toks = tokens
        self.i = 0
        self.unq = unqualified_fields
        self.stemming = frozenset(stemming_fields)

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise CqlSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def parse(self) -> Q:
        q = self.expr()
        if self.peek() is not None:
            raise CqlSyntaxError(f"trailing input: {self.toks[self.i:]}")
        return q

    def expr(self) -> Q:
        left = self.clause()
        while self.peek() and self.peek().upper() in ("AND", "OR", "NOT"):
            op = self.next().upper()
            right = self.clause()
            if op == "AND":
                left = Q.boolean((MUST, left), (MUST, right))
            elif op == "OR":
                left = Q.boolean((SHOULD, left), (SHOULD, right))
            else:  # NOT == AND NOT (cql semantics)
                left = Q.boolean((MUST, left), (MUST_NOT, right))
        return left

    def clause(self) -> Q:
        t = self.next()
        if t == "(":
            q = self.expr()
            if self.next() != ")":
                raise CqlSyntaxError("expected )")
            return q
        nxt = self.peek()
        if nxt in (">=", "<=", ">", "<", "=", "==", "exact"):
            rel = self.next()
            value = self._unquote(self.next())
            return self._relation(t, rel, value)
        return self._unqualified(self._unquote(t))

    @staticmethod
    def _unquote(t: str) -> str:
        return t[1:-1] if len(t) >= 2 and t[0] == '"' and t[-1] == '"' else t

    def _relation(self, field: str, rel: str, value: str) -> Q:
        if rel in (">", "<", ">=", "<="):
            num = _maybe_number(value)
            return Q.range(
                field,
                lower=num if rel in (">", ">=") else None,
                upper=num if rel in ("<", "<=") else None,
                include_lower=rel == ">=",
                include_upper=rel == "<=",
                range_type="Double" if isinstance(num, float) else "Int"
                if isinstance(num, int)
                else "String",
            )
        if rel in ("==", "exact"):
            # untokenized exact term (reference 'untokenized.' convention)
            return Q.term(field, value.lower())
        return self._term_or_phrase(field, value, boost=1.0)

    def _term_or_phrase(self, field: str, value: str, boost: float) -> Q:
        if value == "*":
            return Q.matchall()
        if re.fullmatch(r"\?*\*", value):
            return Q.wildcard(field, value, boost=boost)
        if _PREFIX_RE.match(value):
            return Q.prefix(field, value[:-1].lower(), boost=boost)
        analyzed = tokenize_text(value)
        if not analyzed:
            return Q.term(field, "", boost=boost)
        if len(analyzed) == 1:
            tok = analyzed[0]
            if field in self.stemming:
                # the reference's query-side analysis for Dutch-stemmed
                # fields (queryexpressiontolucenequerydict.py:152-166 +
                # MerescoDutchStemmingAnalyzer.post_analyzer): a single
                # token post-analyses to [original, stem] and becomes an
                # OR of term queries when they differ
                from meresco_lucene_spark.analysis.dutch import dutch_stem

                stem = dutch_stem(tok)
                if stem != tok:
                    return Q.boolean(
                        (SHOULD, Q.term(field, tok, boost=boost)),
                        (SHOULD, Q.term(field, stem, boost=boost)),
                    )
            return Q.term(field, tok, boost=boost)
        # multi-token values become a PhraseQuery of the PRE-analysis
        # tokens — the reference applies post-analysis (stemming) only
        # in the single-token branch, exactly as here
        return Q.phrase(field, *analyzed, boost=boost)

    def _unqualified(self, value: str) -> Q:
        if value == "*":
            return Q.matchall()
        qs = [
            self._term_or_phrase(fld, value, boost) for fld, boost in self.unq
        ]
        if len(qs) == 1:
            return qs[0]
        return Q.boolean(*[(SHOULD, q) for q in qs])


def cql_to_query(
    cql: str,
    unqualified_fields: list[tuple[str, float]] | None = None,
    stemming_fields: tuple[str, ...] = (),
) -> Q:
    """``stemming_fields``: fields whose single-token terms also match
    their Dutch stem (the reference converter built with a
    MerescoDutchStemmingAnalyzer, lucenesettings.py:58-70)."""
    return _Parser(
        _lex(cql),
        unqualified_fields or [("unqualified", 1.0)],
        stemming_fields=stemming_fields,
    ).parse()


def _maybe_number(v: str):
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v
