"""SimpleQueryParser tests (SimpleQueryParser.java:99 semantics): tree
shapes, the never-throws tolerance contract, negation wrapping, phrase
slop, prefix/fuzzy operators, multi-field weight expansion, and the
simple_topk gate vs its SQL oracle at sf0.001.
"""

from __future__ import annotations

import duckdb

from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.simpleparser import parse_simple

AN = get_analyzer("standard")
SF = "/root/testdata/sf0.001"


def _p(s: str, **kw):
    return parse_simple(s, AN, **kw)


def test_basic_operators_and_fold():
    assert _p("key") == Q.TermQuery("key", boost=1.0, field="")
    # same-operator clauses flatten into ONE BooleanQuery
    q = _p("key hash value")
    assert isinstance(q, Q.BooleanQuery) and len(q.clauses) == 3
    assert {c.occur for c in q.clauses} == {Q.SHOULD}
    q = _p("key + hash")
    assert [c.occur for c in q.clauses] == [Q.MUST, Q.MUST]
    q = _p("key | hash")
    assert [c.occur for c in q.clauses] == [Q.SHOULD, Q.SHOULD]
    # operator change NESTS the previous tree (buildQueryTree java:350-356)
    q = _p("key | hash + value")
    assert [c.occur for c in q.clauses] == [Q.MUST, Q.MUST]
    inner = q.clauses[0].query
    assert [c.occur for c in inner.clauses] == [Q.SHOULD, Q.SHOULD]


def test_negation_wraps_with_matchall():
    q = _p("table -the")
    wrapped = q.clauses[1].query
    assert [c.occur for c in wrapped.clauses] == [Q.MUST_NOT, Q.SHOULD]
    assert isinstance(wrapped.clauses[1].query, Q.MatchAllDocsQuery)
    # double negation cancels (java:262-265)
    q2 = _p("table --the")
    assert q2.clauses[1].query == Q.TermQuery("the", boost=1.0, field="")


def test_phrase_prefix_fuzzy():
    assert _p('"key table"') == Q.PhraseQuery(terms=("key", "table"),
                                              slop=0, field="")
    assert _p('"key table"~2') == Q.PhraseQuery(terms=("key", "table"),
                                                slop=2, field="")
    assert _p("wind*") == Q.PrefixQuery("wind")
    assert _p("tabel~1") == Q.FuzzyQuery("tabel", max_edits=1)
    assert _p("tabel~9") == Q.FuzzyQuery("tabel", max_edits=2)  # capped


def test_group_precedence():
    q = _p("(key | hash) + value")
    assert [c.occur for c in q.clauses] == [Q.MUST, Q.MUST]
    assert len(q.clauses[0].query.clauses) == 2


def test_multi_field_weights():
    q = _p("table", weights={"": 1.0, "title": 2.0})
    assert isinstance(q, Q.BooleanQuery)
    assert (Q.TermQuery("table", boost=1.0, field="") ==
            q.clauses[0].query)
    assert (Q.TermQuery("table", boost=2.0, field="title") ==
            q.clauses[1].query)


def test_tolerance_never_raises():
    """The SimpleQueryParser contract: malformed input degrades, never
    throws (class javadoc)."""
    for bad in ["", "(((", ")))", '"unterminated', "~", "*", "+ | -",
                "a AND ( b", 'x~y', "\\", "-(", '""', "a~~2"]:
        _p(bad)  # must not raise


def test_simple_topk_gate_matches_oracle(ray_session):
    import __ray_entry__ as E

    mine = E.queries()["simple_topk"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(E.oracle_sql()["simple_topk"]).df()
    key = ["query_id", "rank"]
    mine = mine.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert mine[["query_id", "rank", "doc_id", "score_r"]].equals(
        want[["query_id", "rank", "doc_id", "score_r"]]
    )
