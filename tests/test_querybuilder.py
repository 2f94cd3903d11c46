"""QueryBuilder query-time synonym expansion (util/QueryBuilder.java)."""

from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.querybuilder import (
    create_boolean_query,
    create_phrase_query,
)

AN = get_analyzer("standard")


def test_boolean_query_shapes():
    """Plain tokens -> TermQuery clauses; synonym-stacked tokens ->
    SynonymQuery; empty text -> MatchNoDocs."""
    q = create_boolean_query(AN, "the table", {"table": ("desk",)})
    assert isinstance(q, Q.BooleanQuery)
    leaves = [c.query for c in q.clauses]
    assert leaves[0] == Q.TermQuery("the")
    assert leaves[1] == Q.SynonymQuery(("table", "desk"))
    assert all(c.occur == Q.SHOULD for c in q.clauses)

    q2 = create_boolean_query(AN, "a b", None, operator=Q.MUST)
    assert all(c.occur == Q.MUST for c in q2.clauses)

    assert isinstance(create_boolean_query(AN, "", None), Q.MatchNoDocsQuery)


def test_synonyms_match_analyzed_tokens_and_dedup():
    """Rules key on ANALYZED tokens (lowercased); duplicate outputs fold."""
    q = create_boolean_query(AN, "Table", {"table": ("desk", "desk", "table")})
    leaf = q.clauses[0].query
    assert leaf == Q.SynonymQuery(("table", "desk"))


def test_phrase_query_upgrade():
    """All-single positions -> PhraseQuery (slop allowed); any stacked
    position -> MultiPhraseQuery (slop rejected, like the reference's
    plain createPhraseQuery overloads)."""
    q = create_phrase_query(AN, "key hash", None, slop=2)
    assert q == Q.PhraseQuery(("key", "hash"), slop=2)

    q2 = create_phrase_query(AN, "key hash", {"hash": ("digest",)})
    assert q2 == Q.MultiPhraseQuery((("key",), ("hash", "digest")))

    import pytest

    with pytest.raises(ValueError):
        create_phrase_query(AN, "key hash", {"hash": ("digest",)}, slop=1)
