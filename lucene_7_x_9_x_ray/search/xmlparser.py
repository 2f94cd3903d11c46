"""XML query parser: the CoreParser element set.

Re-creates the org.apache.lucene.queryparser.xml surface (s84
queryparser/src/java/org/apache/lucene/queryparser/xml/CoreParser.java:58
builder registry + the builders/ package): an XML tree maps 1:1 onto the
engine's query nodes. Supported elements (the CoreParser defaults that
this engine's query tree expresses):

  <TermQuery boost=...>text</TermQuery>
  <TermsQuery>space separated terms</TermsQuery>        (TermInSet)
  <BooleanQuery minimumNumberShouldMatch=...>
      <Clause occurs="must|should|mustNot|filter">...</Clause>+
  <DisjunctionMaxQuery tieBreaker=...> <sub/>+
  <ConstantScoreQuery boost=...> <sub/>
  <BoostQuery boost=...> <sub/>                          (BoostingQueryBuilder role)
  <MatchAllDocsQuery/>
  <PointRangeQuery fieldName=... lowerTerm=... upperTerm=...>
  <UserQuery>classic query parser syntax</UserQuery>
  <SpanTerm>text</SpanTerm>
  <SpanNear slop=... inOrder=...> <span sub/>+
  <SpanOr> <span sub/>+
  <SpanFirst end=...> <span sub/>
  <SpanNot> <Include>...</Include> <Exclude>...</Exclude>

Like the reference, unknown elements raise ParserException analogues, and
span sub-elements must be span-typed.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from . import queries as Q


class XMLParserError(ValueError):
    """ParserException analogue."""


_OCCURS = {
    "must": Q.MUST,
    "should": Q.SHOULD,
    "mustnot": Q.MUST_NOT,
    "filter": Q.FILTER,
}


def _text(el) -> str:
    return (el.text or "").strip()


def _float(el, name: str, default: float) -> float:
    return float(el.get(name, default))


def _build_span(el, analyzer) -> Q.Query:
    q = _build(el, analyzer)
    if not isinstance(q, Q.SPAN_QUERY_TYPES):
        raise XMLParserError(f"<{el.tag}> is not a span query")
    return q


def _build(el, analyzer) -> Q.Query:
    tag = el.tag
    if tag == "TermQuery":
        toks = analyzer.tokens(_text(el))
        if len(toks) != 1:
            raise XMLParserError(f"TermQuery text must analyze to one term: {_text(el)!r}")
        return Q.TermQuery(toks[0], boost=_float(el, "boost", 1.0),
                           field=el.get("fieldName", ""))
    if tag == "TermsQuery":
        toks = analyzer.tokens(_text(el))
        if not toks:
            return Q.MatchNoDocsQuery()
        return Q.TermInSetQuery(tuple(sorted(set(toks))))
    if tag == "BooleanQuery":
        clauses = []
        for c in el:
            if c.tag != "Clause":
                raise XMLParserError(f"BooleanQuery child must be <Clause>, got <{c.tag}>")
            occurs = c.get("occurs", "should").lower()
            if occurs not in _OCCURS:
                raise XMLParserError(f"unknown occurs={occurs!r}")
            subs = list(c)
            if len(subs) != 1:
                raise XMLParserError("<Clause> must wrap exactly one query element")
            clauses.append((_OCCURS[occurs], _build(subs[0], analyzer)))
        msm = int(el.get("minimumNumberShouldMatch", 0))
        return Q.BooleanQuery.build(clauses, min_should_match=msm)
    if tag == "DisjunctionMaxQuery":
        subs = tuple(_build(c, analyzer) for c in el)
        return Q.DisjunctionMaxQuery(subs, tie_breaker=_float(el, "tieBreaker", 0.0))
    if tag == "ConstantScoreQuery":
        (sub,) = list(el)
        return Q.ConstantScoreQuery(_build(sub, analyzer), boost=_float(el, "boost", 1.0))
    if tag == "BoostQuery":
        (sub,) = list(el)
        return Q.BoostQuery(_build(sub, analyzer), boost=_float(el, "boost", 1.0))
    if tag == "MatchAllDocsQuery":
        return Q.MatchAllDocsQuery()
    if tag == "PointRangeQuery":
        lo = el.get("lowerTerm")
        hi = el.get("upperTerm")
        return Q.NumericRangeQuery(
            el.get("fieldName", ""),
            None if lo is None else float(lo),
            None if hi is None else float(hi),
        )
    if tag == "UserQuery":
        from .queries import parse_classic

        return parse_classic(_text(el), analyzer)
    if tag == "SpanTerm":
        toks = analyzer.tokens(_text(el))
        if len(toks) != 1:
            raise XMLParserError(f"SpanTerm must analyze to one term: {_text(el)!r}")
        return Q.SpanTermQuery(toks[0])
    if tag == "SpanNear":
        subs = tuple(_build_span(c, analyzer) for c in el)
        in_order = el.get("inOrder", "true").lower() == "true"
        return Q.SpanNearQuery(subs, slop=int(el.get("slop", 0)), in_order=in_order)
    if tag == "SpanOr":
        return Q.SpanOrQuery(tuple(_build_span(c, analyzer) for c in el))
    if tag == "SpanFirst":
        (sub,) = list(el)
        return Q.SpanFirstQuery(_build_span(sub, analyzer), end=int(el.get("end", 1)))
    if tag == "SpanNot":
        inc = el.find("Include")
        exc = el.find("Exclude")
        if inc is None or exc is None:
            raise XMLParserError("SpanNot needs <Include> and <Exclude>")
        (iq,) = list(inc)
        (eq,) = list(exc)
        return Q.SpanNotQuery(_build_span(iq, analyzer), _build_span(eq, analyzer))
    raise XMLParserError(f"unknown query element <{tag}>")


def parse_xml_query(xml_text: str, analyzer) -> Q.Query:
    """Parse one XML query document into the engine's query tree."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise XMLParserError(f"malformed XML: {e}") from e
    return _build(root, analyzer)
