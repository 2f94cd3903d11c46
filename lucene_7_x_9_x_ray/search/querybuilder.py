"""QueryBuilder with query-time synonym expansion.

Re-creates the org.apache.lucene.util.QueryBuilder surface (s84 core
util/QueryBuilder.java:70 createBooleanQuery / :110 createPhraseQuery) for
the single-token-synonym case: the analyzer tokenizes the query text, a
synonym map (the SynonymGraphFilter role, applied query-side) stacks
alternative terms onto a position, and the builder emits the exact query
shapes the reference produces —

- boolean context: positions with one term -> TermQuery; positions with
  stacked terms -> SynonymQuery (QueryBuilder.analyzeBoolean /
  newSynonymQuery, QueryBuilder.java:544);
- phrase context: any stacked position upgrades the whole phrase to
  MultiPhraseQuery (analyzeMultiPhrase, QueryBuilder.java:616), else a
  plain PhraseQuery.

Multi-word synonym rules (graph paths of different lengths) are out of
scope — they need the full token-graph articulation-point walk
(analyzeGraphBoolean); single-word rules cover the SynonymQuery /
MultiPhraseQuery production paths that the scoring engine implements.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from . import queries as Q


def _positions(
    analyzer, text: str, synonyms: Mapping[str, Sequence[str]] | None
) -> list[tuple[str, ...]]:
    """Analyzed token positions, each a (term, *stacked synonyms) tuple.
    Synonym keys are matched against ANALYZED tokens (the reference applies
    the synonym filter after tokenization/lowercasing), and stacked terms
    are deduplicated preserving order."""
    syn = synonyms or {}
    out: list[tuple[str, ...]] = []
    for tok in analyzer.tokens(text):
        stack = [tok]
        for s in syn.get(tok, ()):
            if s not in stack:
                stack.append(s)
        out.append(tuple(stack))
    return out


def create_boolean_query(
    analyzer,
    text: str,
    synonyms: Mapping[str, Sequence[str]] | None = None,
    operator: str = Q.SHOULD,
    min_should_match: int = 0,
) -> Q.Query:
    """QueryBuilder.createBooleanQuery: one clause per token position with
    the given occur operator; stacked positions become SynonymQuery."""
    positions = _positions(analyzer, text, synonyms)
    if not positions:
        return Q.MatchNoDocsQuery()
    clauses: list[tuple[str, Q.Query]] = []
    for stack in positions:
        leaf = Q.TermQuery(stack[0]) if len(stack) == 1 else Q.SynonymQuery(stack)
        clauses.append((operator, leaf))
    return Q.BooleanQuery.build(clauses, min_should_match=min_should_match)


def create_phrase_query(
    analyzer,
    text: str,
    synonyms: Mapping[str, Sequence[str]] | None = None,
    slop: int = 0,
) -> Q.Query:
    """QueryBuilder.createPhraseQuery: PhraseQuery when every position has
    one term, MultiPhraseQuery as soon as any position stacks synonyms
    (slop is only supported on the plain-phrase path, like the reference's
    createPhraseQuery(field, queryText, phraseSlop))."""
    positions = _positions(analyzer, text, synonyms)
    if not positions:
        return Q.MatchNoDocsQuery()
    if all(len(stack) == 1 for stack in positions):
        return Q.PhraseQuery(tuple(s[0] for s in positions), slop=slop)
    if slop:
        raise ValueError("slop is not supported on MultiPhraseQuery")
    return Q.MultiPhraseQuery(tuple(positions))
