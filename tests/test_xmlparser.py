"""XML query parser (queryparser/xml CoreParser element set)."""

import pytest

from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.xmlparser import XMLParserError, parse_xml_query

AN = get_analyzer("standard")


def test_element_mapping():
    q = parse_xml_query(
        '<BooleanQuery minimumNumberShouldMatch="2">'
        '<Clause occurs="should"><TermQuery boost="2.0">Key</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>bad</TermQuery></Clause>'
        '<Clause occurs="filter"><MatchAllDocsQuery/></Clause>'
        "</BooleanQuery>",
        AN,
    )
    assert q.min_should_match == 2
    assert q.clauses[0].query == Q.TermQuery("key", boost=2.0)
    assert q.clauses[1].occur == Q.MUST_NOT
    assert q.clauses[2].occur == Q.FILTER

    dm = parse_xml_query(
        '<DisjunctionMaxQuery tieBreaker="0.3"><TermQuery>a</TermQuery>'
        "<TermQuery>b</TermQuery></DisjunctionMaxQuery>", AN)
    assert dm.tie_breaker == 0.3

    sp = parse_xml_query(
        '<SpanNear slop="2" inOrder="false"><SpanTerm>a</SpanTerm>'
        '<SpanOr><SpanTerm>b</SpanTerm><SpanTerm>c</SpanTerm></SpanOr></SpanNear>',
        AN)
    assert sp == Q.SpanNearQuery(
        (Q.SpanTermQuery("a"),
         Q.SpanOrQuery((Q.SpanTermQuery("b"), Q.SpanTermQuery("c")))),
        slop=2, in_order=False)

    nr = parse_xml_query(
        '<PointRangeQuery fieldName="length" lowerTerm="30" upperTerm="60"/>', AN)
    assert nr == Q.NumericRangeQuery("length", 30.0, 60.0)

    uq = parse_xml_query("<UserQuery>key hash</UserQuery>", AN)
    assert isinstance(uq, Q.BooleanQuery)

    sn = parse_xml_query(
        "<SpanNot><Include><SpanTerm>a</SpanTerm></Include>"
        "<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>", AN)
    assert isinstance(sn, Q.SpanNotQuery)

    ts = parse_xml_query("<TermsQuery>a b a</TermsQuery>", AN)
    assert ts == Q.TermInSetQuery(("a", "b"))


def test_errors():
    for bad in (
        "<Unknown/>",
        "<BooleanQuery><TermQuery>a</TermQuery></BooleanQuery>",  # no Clause
        '<BooleanQuery><Clause occurs="zap"><TermQuery>a</TermQuery></Clause></BooleanQuery>',
        "<SpanNear><TermQuery>a</TermQuery></SpanNear>",  # non-span child
        "<TermQuery>two words</TermQuery>",
        "not xml <",
    ):
        with pytest.raises(XMLParserError):
            parse_xml_query(bad, AN)
