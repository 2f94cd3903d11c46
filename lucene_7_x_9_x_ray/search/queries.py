"""Query tree: the engine's relational surface (SURVEY.md §2.4).

Dataclass query nodes mirroring the reference's query semantics (behavior
re-created, not ported):
- TermQuery (TermQuery.java:39), BooleanQuery with MUST/SHOULD/MUST_NOT/
  FILTER + minimumNumberShouldMatch (BooleanQuery.java, BooleanWeight.java),
- BoostQuery/ConstantScoreQuery/MatchAllDocsQuery/MatchNoDocsQuery
  (scoring wrappers, ConstantScoreQuery.java:202, BoostQuery.java:130),
- multi-term queries that REWRITE against the sorted term dictionary:
  PrefixQuery (sorted-dict range scan, PrefixQuery.java:110), TermRangeQuery
  (TermRangeQuery.java:181), WildcardQuery/RegexpQuery (regex filter over
  the dict, AutomatonQuery equivalent), FuzzyQuery (edit-distance <= 2 scan,
  FuzzyQuery.java + LevenshteinAutomata.java:34), TermInSetQuery
  (TermInSetQuery.java:357), SynonymQuery (summed-tf as one term,
  SynonymQuery.java), DisjunctionMaxQuery (max + tiebreak*sum,
  DisjunctionMaxQuery.java:30), PhraseQuery (positions, PhraseQuery.java).
- parse_query = QueryBuilder.createBooleanQuery equivalent
  (util/QueryBuilder.java:59-114): analyze the text with the SAME analyzer
  as the index, one TermQuery per token, combined with SHOULD or MUST.

Rewrite model: ``rewrite(query, term_dict)`` expands multi-term queries to
primitive Term/Boolean trees (constant-score rewrite, MultiTermQuery.java:366
CONSTANT_SCORE_REWRITE default), so scorers only ever see primitives.
"""

from __future__ import annotations

import math
import re as _re
from dataclasses import dataclass

import numpy as np

MUST = "MUST"
SHOULD = "SHOULD"
MUST_NOT = "MUST_NOT"
FILTER = "FILTER"


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0
    # indexed field to score against; "" = the index's primary field.
    # The FieldInfos-style dynamic schema (s84 index/FieldInfos.java,
    # document/FieldType.java:32): each field has its own postings, norms
    # and collection statistics.
    field: str = ""
    # Artificial aggregated TermStatistics attached by BlendedTermQuery's
    # rewrite (TermStates.accumulateStatistics role): -1 = use the index's
    # own docFreq / totalTermFreq for this (field, term).
    df_override: int = -1
    ttf_override: int = -1


@dataclass(frozen=True)
class BooleanClause:
    occur: str
    query: Query


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...]
    min_should_match: int = 0

    @staticmethod
    def build(clauses: list[tuple[str, Query]], min_should_match: int = 0) -> "BooleanQuery":
        return BooleanQuery(
            clauses=tuple(BooleanClause(o, q) for o, q in clauses),
            min_should_match=min_should_match,
        )


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class DocSetQuery(Query):
    """Matches an explicit GLOBAL docID set at constant score 0 — the
    doc-values / column-scan side of IndexOrDocValuesQuery
    (IndexOrDocValuesQuery.java:202): metadata predicates evaluated over
    the stored columns become a FILTER clause doc set."""

    doc_ids: tuple[int, ...]  # sorted global docIDs


@dataclass(frozen=True)
class NumericRangeQuery(Query):
    """Constant-score (0) range predicate over a stored NUMERIC per-doc
    column — the PointRangeQuery/NumericDocValues plan integrated into the
    query tree (s84 search/PointRangeQuery.java:428 semantics via the
    doc-values side of IndexOrDocValuesQuery): evaluated per segment as a
    vectorized mask over SegmentReader.doc_values(col), cacheable by the
    per-reader FilterCache. Timestamps compare as int64 microseconds."""

    col: str
    lower: int | float | None = None
    upper: int | float | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class NumericSetQuery(Query):
    """Constant-score (0) set-membership predicate over a stored NUMERIC
    per-doc column — the PointInSetQuery role (s84 core
    search/PointInSetQuery.java:54; LuceneDemo TestPointInSetQuery
    surface) on the doc-values plan: docs whose column value is IN the
    given set match. Evaluated per segment as one vectorized np.isin mask
    (nulls never match); FilterCache-able like the range twin."""

    col: str
    values: tuple[float, ...]


@dataclass(frozen=True)
class StringDocValuesQuery(Query):
    """Constant-score (0) equality predicate over a stored STRING per-doc
    column — the SORTED-doc-values side of IndexOrDocValuesQuery
    (IndexOrDocValuesQuery.java:202; DocValuesType.SORTED,
    index/DocValuesType.java:24-56): evaluated per segment as one
    vectorized ``col == value`` mask over SegmentReader.doc_values(col),
    FilterCache-able like the numeric twin. No driver-side doc list is
    ever built (the docmap stays where the segment lives)."""

    col: str
    value: str


@dataclass(frozen=True)
class SortedSetDocValuesQuery(Query):
    """Constant-score (0) set-membership predicate over a MULTI-VALUED
    stored string column: matches docs whose value SET contains ``value``
    (SortedSetDocValuesField.newSlowSetQuery role over
    DocValuesType.SORTED_SET, s84 Lucene80DocValuesFormat.java:133).
    Evaluated per segment as one vectorized equality mask over the
    flattened list column; FilterCache-able."""

    col: str
    value: str


@dataclass(frozen=True)
class StringDocValuesPrefixQuery(Query):
    """Constant-score (0) taxonomy-path predicate over a stored STRING
    per-doc column: matches docs whose value equals ``path`` or starts
    with ``path + "/"`` — DrillDownQuery's dimension clause
    (facet/DrillDownQuery.java:42 term(dim, path...) on the drill-down
    field; a non-leaf path matches its whole subtree). Evaluated per
    segment as one vectorized startswith mask; FilterCache-able."""

    col: str
    path: str


@dataclass(frozen=True)
class DocValuesFieldExistsQuery(Query):
    """Docs whose stored doc-values column is non-null — the
    DocValuesFieldExistsQuery role (s84 search/DocValuesFieldExistsQuery
    .java:125): the docmap column's validity bitmap IS the match set;
    constant score 0 (FILTER-side)."""

    col: str


@dataclass(frozen=True)
class NormsFieldExistsQuery(Query):
    """Docs that have >= 1 indexed token in ``field`` — the
    NormsFieldExistsQuery role (s84 search/NormsFieldExistsQuery.java:94):
    a doc with no tokens in the field stores norm byte 0
    (SmallFloat.intToByte4(0) == 0), so the field's norms array answers
    existence with one vectorized compare; constant score 0."""

    field: str


@dataclass(frozen=True)
class GeoDistanceQuery(Query):
    """Constant-score (0) geo radius predicate over stored lat/lon
    doc-values columns — the LatLonPoint.newDistanceQuery role
    (LuceneDemo/.../LatLonPointDistanceQueryTest.java surface): docs whose
    haversine distance from (lat, lon) is <= radius_m match. Evaluated as
    a vectorized mask per segment (a bounding-box prefilter cuts the
    trigonometry to candidate rows); FILTER-cacheable like the other
    doc-values predicates."""

    lat_col: str
    lon_col: str
    lat: float
    lon: float
    radius_m: float


@dataclass(frozen=True)
class GeoBoxQuery(Query):
    """Constant-score (0) geo bounding-box predicate over stored lat/lon
    doc-values columns — the LatLonPoint.newBoxQuery role (s84 core
    document/LatLonPoint.java:210): docs with min_lat <= lat <= max_lat
    AND min_lon <= lon <= max_lon match. Boxes crossing the antimeridian
    (min_lon > max_lon) match the OR of the two wrapped lon intervals,
    like the reference's two-range rewrite. Evaluated as one vectorized
    mask per segment; FILTER-cacheable."""

    lat_col: str
    lon_col: str
    min_lat: float
    max_lat: float
    min_lon: float
    max_lon: float


@dataclass(frozen=True)
class FunctionRangeQuery(Query):
    """Constant-score (0) predicate over a COMPUTED per-doc value — the
    queries/function FunctionRangeQuery role (s84 queries/src/java/org/
    apache/lucene/queries/function/FunctionRangeQuery.java:38): docs whose
    compiled-expression value (over doc-values columns; missing numerics
    bind 0, the ValueSource missing contract) falls in [lower, upper]
    match. Evaluated per segment as one vectorized expression + mask;
    FILTER-cacheable."""

    expression: str
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class GeoPolygonQuery(Query):
    """Constant-score (0) point-in-polygon predicate over stored lat/lon
    doc-values columns — the LatLonPoint.newPolygonQuery role (s84 core
    document/LatLonPoint.java:236 + geo/Polygon.java): docs whose point
    lies inside the simple polygon match (even-odd crossing rule,
    vectorized per segment with a bounding-box prefilter). Vertices are
    (lat, lon) pairs; the ring closes implicitly."""

    lat_col: str
    lon_col: str
    vertices: tuple[tuple[float, float], ...]


@dataclass(frozen=True)
class CoveringQuery(Query):
    """sandbox CoveringQuery (s84 sandbox/src/java/org/apache/lucene/
    search/CoveringQuery.java:42 + CoveringScorer.java:96-162): SHOULD
    clauses with a PER-DOC minimum match count from a LongValuesSource —
    here a compiled expressions-module formula over doc-values columns.
    minMatch = max(1, long(value)); docs whose source has no value never
    match (advanceExact miss -> Long.MAX_VALUE, CoveringScorer.java:135);
    score = double sum of the matching clauses' scores, one float32
    cast."""

    queries: tuple[Query, ...]
    min_expr: str


@dataclass(frozen=True)
class FeatureQuery(Query):
    """FeatureField static-feature scoring (s84 core document/
    FeatureField.java:229-400): the per-doc feature value is freq-ENCODED
    at index time (floatToIntBits(v) >>> 15 — only the top 8 mantissa
    bits survive the round-trip) and scored norm-free by one of three
    monotone functions of the decoded value f:

      log:        f32(boost * ln(f32(a + f)))                (java:260)
      saturation: f32(boost * f32(1 - f32(pivot / f32(f + pivot))))
                                                             (java:327)
      sigmoid:    f32(boost * (1 - pivot^a / (f^a + pivot^a))) (java:386)

    Docs whose feature column is NULL don't match (no feature term was
    indexed for them)."""

    col: str
    function: str = "saturation"  # "log" | "saturation" | "sigmoid"
    pivot: float = 1.0
    a: float = 1.0  # log scalingFactor / sigmoid exponent
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionScoreQuery(Query):
    """Re-score a query from a per-doc VALUE source (s84 queries/.../
    function/FunctionScoreQuery.java:47 — DoubleValuesSource semantics):
    combine="replace" makes the value the score (the class's base
    behavior); "multiply" is the boostByValue composition. ``function``
    maps the raw doc-values column ("identity" | "log1p"); arithmetic is
    float64 with one final float32 cast (SQL-oracle-matched)."""

    query: Query
    source_col: str
    function: str = "log1p"
    combine: str = "multiply"
    boost: float = 1.0


@dataclass(frozen=True)
class ExpressionScoreQuery(Query):
    """Re-score a query with a compiled arithmetic EXPRESSION over
    ``_score`` and doc-values columns — the ``expressions`` module
    surface (s84 expressions/js/JavascriptCompiler.java:1 grammar;
    Expression.getDoubleValuesSource + FunctionScoreQuery composition,
    expressions/Expression.java:36).  The expression's free variables
    bind ``_score`` to the sub-query's float32 score and every other
    name to the like-named doc-values column; arithmetic is float64
    throughout (Lucene: all expression ops are double) with one final
    float32 cast, same discipline as FunctionScoreQuery."""

    query: Query
    expression: str
    boost: float = 1.0


@dataclass(frozen=True)
class SynonymQuery(Query):
    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = ""


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    queries: tuple[Query, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0
    field: str = ""


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """High/low-frequency split term query (s84 queries/src/java/org/
    apache/lucene/queries/CommonTermsQuery.java:61): at rewrite time each
    term is classified by document frequency against maxTermFrequency
    (a fraction of maxDoc in [0,1), or an absolute count >= 1); low-freq
    terms form one sub-boolean (occur = low_freq_occur) that the outer
    query requires (MUST), high-freq terms one sub-boolean (occur =
    high_freq_occur) that only contributes score (SHOULD). When no
    low-freq term exists the high group upgrades to a MUST conjunction
    (buildQuery's slow-query guard). minShouldMatch values < 1 are
    fractions of the group's optional clause count (Math.round)."""

    terms: tuple[str, ...]
    high_freq_occur: str = SHOULD
    low_freq_occur: str = SHOULD
    max_term_frequency: float = 0.01
    low_freq_boost: float = 1.0
    high_freq_boost: float = 1.0
    low_freq_min_should_match: float = 0.0
    high_freq_min_should_match: float = 0.0
    field: str = ""

    def __post_init__(self):
        if self.high_freq_occur == MUST_NOT or self.low_freq_occur == MUST_NOT:
            raise ValueError(
                "highFreqOccur/lowFreqOccur should be MUST or SHOULD but was MUST_NOT"
            )

    @staticmethod
    def _min_nr_should_match(f: float, num_optional: int) -> int:
        if f >= 1.0 or f == 0.0:
            return int(f)
        return int(math.floor(f * num_optional + 0.5))  # Math.round

    def rewrite_with_stats(self, df_of, max_doc: int) -> Query:
        """buildQuery (CommonTermsQuery.java:139-201) against collected
        term stats: ``df_of(term)`` returns the term's docFreq."""
        if not self.terms:
            return MatchNoDocsQuery()
        if len(self.terms) == 1:
            return TermQuery(self.terms[0], field=self.field)
        frac_cut = int(
            math.ceil(float(np.float32(self.max_term_frequency) * np.float32(max_doc)))
        )
        low: list[Query] = []
        high: list[Query] = []
        for t in self.terms:
            df = int(df_of(t))
            if df == 0:  # null TermStates -> low-freq group
                low.append(TermQuery(t, field=self.field))
            elif (self.max_term_frequency >= 1.0 and df > self.max_term_frequency) or (
                df > frac_cut
            ):
                high.append(TermQuery(t, field=self.field))
            else:
                low.append(TermQuery(t, field=self.field))
        low_occur, high_occur = self.low_freq_occur, self.high_freq_occur
        low_mns = high_mns = 0
        if low_occur == SHOULD and low:
            low_mns = self._min_nr_should_match(
                self.low_freq_min_should_match, len(low)
            )
        if high_occur == SHOULD and high:
            high_mns = self._min_nr_should_match(
                self.high_freq_min_should_match, len(high)
            )
        if not low and high_mns == 0 and high_occur != MUST:
            # no low-freq terms: conjunction guard against slow queries
            high_occur = MUST
        clauses: list[tuple[str, Query]] = []
        if low:
            lq: Query = BooleanQuery.build(
                [(low_occur, q) for q in low], min_should_match=low_mns
            )
            clauses.append((MUST, BoostQuery(lq, self.low_freq_boost)))
        if high:
            hq: Query = BooleanQuery.build(
                [(high_occur, q) for q in high], min_should_match=high_mns
            )
            clauses.append((SHOULD, BoostQuery(hq, self.high_freq_boost)))
        return BooleanQuery.build(clauses)


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with one or MORE terms per position — the query
    QueryBuilder.createPhraseQuery produces whenever the analyzer emits
    stacked (synonym) tokens (s84 search/MultiPhraseQuery.java:58,
    util/QueryBuilder.java analyzeMultiPhrase). Each slot matches the
    UNION of its terms' postings (UnionPostingsEnum: merged position
    streams, no dedup); scoring weight = float32 of the double sum of
    per-term idfs over ALL terms in termArrays order
    (MultiPhraseWeight ctor flattening)."""

    positions: tuple[tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0
    field: str = ""

    def flat_terms(self) -> tuple[str, ...]:
        return tuple(t for slot in self.positions for t in slot)


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """Blended term statistics across fields/terms (s84
    core/src/java/org/apache/lucene/search/BlendedTermQuery.java:49) — the
    cross-field query behind "treat title:foo and body:foo as one term".

    rewrite (BlendedTermQuery.java rewrite + adjustFrequencies): build one
    ARTIFICIAL TermStatistics shared by every member — docFreq = max over
    members' own docFreq, totalTermFreq = sum over members' totalTermFreq
    (TermStates.accumulateStatistics) — then score each member as a plain
    TermQuery over its OWN field's postings/norms/CollectionStatistics but
    with the blended stats, combined by the RewriteMethod:

    - "dismax": DisjunctionMaxQuery(tie_breaker) (DisjunctionMaxRewrite;
      the class javadoc recommends tieBreakerMultiplier = 0.01, the
      DISJUNCTION_MAX_REWRITE constant uses 1.0).
    - "boolean": SHOULD-only BooleanQuery (BOOLEAN_REWRITE).

    ``boosts`` aligns with ``terms`` (Builder.add(term, boost): the boost
    wraps the member in a BoostQuery, whose weight-creation fold means the
    leaf weight = float32(boost) * idf — folded into TermQuery.boost here,
    the same fold the engine's term_weight applies); empty = all 1.0.
    """

    terms: tuple[tuple[str, str], ...]  # (field, term) members
    boosts: tuple[float, ...] = ()
    rewrite_method: str = "dismax"  # "dismax" | "boolean"
    tie_breaker: float = 0.01

    def rewrite_with_stats(self, df_of, ttf_of) -> Query:
        """BlendedTermQuery.rewrite against collected stats: ``df_of(field,
        term)`` / ``ttf_of(field, term)`` return the member's own docFreq /
        totalTermFreq from the searcher's CollectionStats."""
        if not self.terms:
            return MatchNoDocsQuery()
        boosts = self.boosts or tuple(1.0 for _ in self.terms)
        df = max(int(df_of(f, t)) for f, t in self.terms)
        ttf = sum(int(ttf_of(f, t)) for f, t in self.terms)
        subs: list[Query] = [
            TermQuery(t, boost=b, field=f, df_override=df, ttf_override=ttf)
            for (f, t), b in zip(self.terms, boosts)
        ]
        if self.rewrite_method == "boolean":
            return BooleanQuery.build([(SHOULD, q) for q in subs])
        return DisjunctionMaxQuery(tuple(subs), tie_breaker=self.tie_breaker)


@dataclass(frozen=True)
class IntervalQuery(Query):
    """queries/intervals IntervalQuery (s84 IntervalQuery.java:75): ranks
    docs by the saturation of the minimal-interval sloppy frequency.
    ``source`` is an IntervalsSource tree from search/intervals.py
    (TermInterval / OrderedIntervals / UnorderedIntervals / MaxGaps /
    MaxWidth / Disjunction / Containing / ContainedBy / NotContaining /
    NotContainedBy — the Intervals.* factory surface)."""

    source: object
    pivot: float = 1.0
    boost: float = 1.0
    field: str = ""


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """queries/payloads PayloadScoreQuery over a single-term span (s84
    queries/payloads/PayloadScoreQuery.java:47): combines the float32
    payload factors at the term's matching positions with ``func``
    (min / max / sum / average — the PayloadFunction implementations);
    missing payloads contribute factor 1. With ``include_span_score`` the
    payload score multiplies the BM25 term score (TermSpans width 0 makes
    the span score exactly BM25 at freq = tf); without it, the payload
    score stands alone (and boost is ignored, as in the reference)."""

    term: str
    func: str = "max"
    include_span_score: bool = True
    boost: float = 1.0
    field: str = ""


@dataclass(frozen=True)
class SpanPayloadCheckQuery(Query):
    """queries/payloads SpanPayloadCheckQuery over a single-term span
    (s84 queries/payloads/SpanPayloadCheckQuery.java:53): a span position
    matches only when its payload EQUALS ``payload`` (byte equality in the
    reference; float32 equality here — the .pay stream stores the decoded
    float). Positions without a payload never match (a null payload fails
    the equality check). Scoring is the surviving spans' SpanScorer
    sloppy freq (width 0 -> freq = match count) against the term's full
    statistics — filtering spans does not change the weight's idf."""

    term: str
    payload: float
    boost: float = 1.0
    field: str = ""


@dataclass(frozen=True)
class ToParentBlockJoinQuery(Query):
    """join module ToParentBlockJoinQuery (s84 join/.../
    ToParentBlockJoinQuery.java:63): documents index as contiguous blocks
    (children first, parent last); a parent matches iff any of its
    children matches ``child``, scored by ``score_mode`` over the matching
    children (avg / max / total / min / none — ScoreMode.java). The parent
    bitset is the doc-values column ``parent_col`` (the QueryBitSetProducer
    role)."""

    child: Query
    score_mode: str = "avg"
    parent_col: str = "is_parent"
    boost: float = 1.0


@dataclass(frozen=True)
class ToChildBlockJoinQuery(Query):
    """join module ToChildBlockJoinQuery (s84 join/.../
    ToChildBlockJoinQuery.java:43): the inverse block join — every child
    of a parent matched by ``parent`` matches, scored with the parent's
    score verbatim."""

    parent: Query
    parent_col: str = "is_parent"
    boost: float = 1.0


# --- span queries (search/spans module) -------------------------------------


@dataclass(frozen=True)
class SpanTermQuery(Query):
    """spans module SpanTermQuery (s84 search/spans/SpanTermQuery.java):
    every occurrence is a width-0 span [p, p+1); scored by SpanScorer's
    sloppy-freq accumulation (freq = tf since width = 0)."""

    term: str
    field: str = ""
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """spans module SpanNearQuery (s84 search/spans/SpanNearQuery.java:138):
    clause spans within ``slop``, ordered (NearSpansOrdered) or unordered
    (NearSpansUnordered). Clauses are restricted to SpanTermQuery (the
    reference demo's shape, LuceneDemo8.7.0 SpanNearQueryTest.java)."""

    clauses: tuple[Query, ...]
    slop: int = 0
    in_order: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """spans module SpanOrQuery (s84 search/spans/SpanOrQuery.java): the
    position-queue disjunction of its clause spans. Over term clauses the
    result is the merged position list (width-1 spans), so it composes as
    a clause of SpanNear/SpanFirst/SpanNot without losing the width-1
    invariants."""

    clauses: tuple[Query, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class SpanPositionRangeQuery(Query):
    """spans module SpanPositionRangeQuery (s84 search/spans/
    SpanPositionRangeQuery.java:41): match spans with start >= ``start``
    and end <= ``end``."""

    match: Query
    start: int
    end: int
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """spans module SpanFirstQuery (s84 search/spans/SpanFirstQuery.java:40
    — SpanPositionRangeQuery with start=0): match spans that END at or
    before ``end``."""

    match: Query
    end: int
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """spans module SpanNotQuery (s84 search/spans/SpanNotQuery.java:58):
    include spans with no exclude span overlapping [start-pre, end+post);
    scoring stats come from the include side only (SpanNotWeight
    extractTermStates)."""

    include: Query
    exclude: Query
    pre: int = 0
    post: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class SpanContainingQuery(Query):
    """spans module SpanContainingQuery (s84 search/spans/
    SpanContainingQuery.java:33): spans from ``big`` that contain at
    least one span of ``little`` (big.start <= little.start and
    little.end <= big.end); emitted spans (and widths) are big's.
    Scoring stats come from BOTH sides (SpanContainQuery.java:100
    extractTermStates folds big then little)."""

    big: Query
    little: Query
    boost: float = 1.0


@dataclass(frozen=True)
class SpanWithinQuery(Query):
    """spans module SpanWithinQuery (s84 search/spans/
    SpanWithinQuery.java:33): spans from ``little`` that lie inside a
    span of ``big``; emitted spans (and widths) are little's. Scoring
    stats come from both sides, like SpanContainingQuery."""

    big: Query
    little: Query
    boost: float = 1.0


SPAN_QUERY_TYPES = (
    SpanTermQuery, SpanNearQuery, SpanOrQuery, SpanFirstQuery,
    SpanPositionRangeQuery, SpanNotQuery, SpanContainingQuery,
    SpanWithinQuery
)


# --- multi-term (dict-rewritten) queries -----------------------------------


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # * = any run, ? = one char


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str  # anchored full-match regex over terms


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2
    prefix_length: int = 0


@dataclass(frozen=True)
class TermInSetQuery(Query):
    terms: tuple[str, ...]


MAX_CLAUSE_COUNT = 1024  # BooleanQuery.maxClauseCount default


class TooManyClauses(Exception):
    pass


def _expand_to_constant_score(matched: list[str]) -> Query:
    if not matched:
        return MatchNoDocsQuery()
    if len(matched) > MAX_CLAUSE_COUNT:
        raise TooManyClauses(f"{len(matched)} terms > {MAX_CLAUSE_COUNT}")
    inner = BooleanQuery.build([(SHOULD, TermQuery(t)) for t in matched])
    return ConstantScoreQuery(inner)


# exclusive upper bound for a prefix scan: prefix + the max code point, so
# terms whose next char is supplementary-plane (> U+FFFF) are included
# (only a term containing literal U+10FFFF — a noncharacter the analyzer
# never emits — could sort above it)
_PREFIX_CEILING = chr(0x10FFFF)


def _dict_range(term_dict: np.ndarray, lo: str, hi_exclusive: str | None) -> list[str]:
    a = int(np.searchsorted(term_dict, lo, side="left"))
    b = len(term_dict) if hi_exclusive is None else int(
        np.searchsorted(term_dict, hi_exclusive, side="left")
    )
    return [str(t) for t in term_dict[a:b]]


def _edit_distance_le(a: str, b: str, k: int) -> bool:
    """Banded Levenshtein <= k (the LevenshteinAutomata-equivalent check)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = max(1, i - k)
        hi = min(len(b), i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        for j in range(hi + 1, len(b) + 1):
            cur[j] = k + 1
        prev = cur
        if min(prev) > k:
            return False
    return prev[len(b)] <= k


def _expand_wildcard(term_dict: np.ndarray, pattern: str) -> list[str]:
    """Dictionary terms matching a *//? wildcard, in sorted term order,
    scanning only the constant-prefix dict range (WildcardQuery rewrite)."""
    rx = _re.compile(
        "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c)
            for c in pattern
        )
    )
    pfx = pattern.split("*")[0].split("?")[0]
    cand = (
        _dict_range(term_dict, pfx, pfx + _PREFIX_CEILING)
        if pfx
        else [str(t) for t in term_dict]
    )
    return [t for t in cand if rx.fullmatch(t)]


def _expand_fuzzy(
    term_dict: np.ndarray, term: str, max_edits: int, prefix_length: int
) -> list[str]:
    """Dictionary terms within Levenshtein max_edits, sorted term order."""
    pfx = term[:prefix_length]
    cand = (
        _dict_range(term_dict, pfx, pfx + _PREFIX_CEILING)
        if pfx
        else [str(t) for t in term_dict]
    )
    return [t for t in cand if _edit_distance_le(t, term, max_edits)]


def parse_complex_phrase(
    text: str,
    term_dict: np.ndarray,
    slop: int = 0,
    fuzzy_max_edits: int = 2,
) -> Query:
    """ComplexPhraseQueryParser analogue (s84 queryparser/.../complexPhrase/
    ComplexPhraseQueryParser.java:66): a quoted phrase whose tokens may be
    wildcards (``ha*``, ``h?sh``) or fuzzies (``kei~1``, bare ``kei~`` =
    maxEdits 2). Each such token expands against the dictionary into that
    position's term set (sorted term order) and the phrase compiles to a
    MultiPhraseQuery; an empty expansion makes the phrase unmatchable
    (the reference rewrites to MatchNoDocsQuery when a clause has no
    matching terms)."""
    body = text.strip()
    if body.startswith('"') and body.endswith('"') and len(body) >= 2:
        body = body[1:-1]
    slots: list[tuple[str, ...]] = []
    for raw in body.split():
        tok = raw.lower()
        m = _re.fullmatch(r"(.+?)~(\d)?", tok)
        if "*" in tok or "?" in tok:
            slot = _expand_wildcard(term_dict, tok)
        elif m:
            edits = int(m.group(2)) if m.group(2) is not None else fuzzy_max_edits
            slot = _expand_fuzzy(term_dict, m.group(1), edits, 0)
        else:
            slot = [tok]
        if not slot:
            return MatchNoDocsQuery()
        if len(slot) > MAX_CLAUSE_COUNT:
            raise TooManyClauses(f"{len(slot)} terms > {MAX_CLAUSE_COUNT}")
        slots.append(tuple(slot))
    if not slots:
        return MatchNoDocsQuery()
    return MultiPhraseQuery(positions=tuple(slots), slop=slop)


def rewrite(query: Query, term_dict: np.ndarray) -> Query:
    """Expand multi-term queries against a sorted term dictionary.

    ``term_dict`` is the (merged) sorted term array; for a multi-segment
    index pass the union dictionary of the query's candidate segments.
    """
    if isinstance(query, PrefixQuery):
        return _expand_to_constant_score(
            _dict_range(term_dict, query.prefix, query.prefix + _PREFIX_CEILING)
        )
    if isinstance(query, TermRangeQuery):
        lo = query.lower if query.lower is not None else ""
        a = int(np.searchsorted(term_dict, lo, side="left" if query.include_lower else "right"))
        if query.upper is None:
            b = len(term_dict)
        else:
            b = int(
                np.searchsorted(
                    term_dict, query.upper, side="right" if query.include_upper else "left"
                )
            )
        return _expand_to_constant_score([str(t) for t in term_dict[a:b]])
    if isinstance(query, WildcardQuery):
        return _expand_to_constant_score(
            _expand_wildcard(term_dict, query.pattern)
        )
    if isinstance(query, RegexpQuery):
        rx = _re.compile(query.pattern)
        return _expand_to_constant_score([str(t) for t in term_dict if rx.fullmatch(str(t))])
    if isinstance(query, FuzzyQuery):
        return _expand_to_constant_score(
            _expand_fuzzy(term_dict, query.term, query.max_edits, query.prefix_length)
        )
    if isinstance(query, TermInSetQuery):
        present = set(query.terms) & set(map(str, term_dict))
        return _expand_to_constant_score(sorted(present))
    if isinstance(query, BooleanQuery):
        return BooleanQuery(
            clauses=tuple(
                BooleanClause(c.occur, rewrite(c.query, term_dict)) for c in query.clauses
            ),
            min_should_match=query.min_should_match,
        )
    if isinstance(query, (BoostQuery, ConstantScoreQuery, FunctionScoreQuery, ExpressionScoreQuery)):
        return type(query)(**{**query.__dict__, "query": rewrite(query.query, term_dict)})
    if isinstance(query, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            queries=tuple(rewrite(q, term_dict) for q in query.queries),
            tie_breaker=query.tie_breaker,
        )
    if isinstance(query, CoveringQuery):
        return CoveringQuery(
            queries=tuple(rewrite(q, term_dict) for q in query.queries),
            min_expr=query.min_expr,
        )
    return query


_MULTI_TERM_TYPES = (
    PrefixQuery, TermRangeQuery, WildcardQuery, RegexpQuery, FuzzyQuery, TermInSetQuery,
)


def needs_rewrite(query: Query) -> bool:
    """True iff the tree contains a multi-term query that must be expanded
    against the term dictionary — lets searchers skip the dictionary-union
    work for the common Term/Boolean/Phrase case."""
    if isinstance(query, _MULTI_TERM_TYPES):
        return True
    if isinstance(query, BooleanQuery):
        return any(needs_rewrite(c.query) for c in query.clauses)
    if isinstance(query, (BoostQuery, ConstantScoreQuery, FunctionScoreQuery, ExpressionScoreQuery)):
        return needs_rewrite(query.query)
    if isinstance(query, DisjunctionMaxQuery):
        return any(needs_rewrite(q) for q in query.queries)
    if isinstance(query, CoveringQuery):
        return any(needs_rewrite(q) for q in query.queries)
    return False


def collect_terms(query: Query) -> set[str]:
    """All scoring/filtering terms referenced by a (rewritten) query."""
    out: set[str] = set()
    if isinstance(query, TermQuery):
        out.add(query.term)
    elif isinstance(query, PayloadScoreQuery):
        out.add(query.term)
    elif isinstance(query, PhraseQuery):
        out.update(query.terms)
    elif isinstance(query, MultiPhraseQuery):
        out.update(query.flat_terms())
    elif isinstance(query, (SynonymQuery, CommonTermsQuery)):
        out.update(query.terms)
    elif isinstance(query, BlendedTermQuery):
        out.update(t for _, t in query.terms)
    elif isinstance(query, BooleanQuery):
        for c in query.clauses:
            out |= collect_terms(c.query)
    elif isinstance(query, (BoostQuery, ConstantScoreQuery, FunctionScoreQuery, ExpressionScoreQuery)):
        out |= collect_terms(query.query)
    elif isinstance(query, ToParentBlockJoinQuery):
        out |= collect_terms(query.child)
    elif isinstance(query, ToChildBlockJoinQuery):
        out |= collect_terms(query.parent)
    elif isinstance(query, SpanTermQuery):
        out.add(query.term)
    elif isinstance(query, (SpanNearQuery, SpanOrQuery)):
        for q in query.clauses:
            out |= collect_terms(q)
    elif isinstance(query, (SpanFirstQuery, SpanPositionRangeQuery)):
        out |= collect_terms(query.match)
    elif isinstance(query, SpanNotQuery):
        out |= collect_terms(query.include) | collect_terms(query.exclude)
    elif isinstance(query, (DisjunctionMaxQuery, CoveringQuery)):
        for q in query.queries:
            out |= collect_terms(q)
    return out


def collect_field_terms(query: Query) -> set[tuple[str, str]]:
    """All (field, term) pairs referenced by a (rewritten) query; field ""
    is the primary field. The per-field CollectionStatistics/TermStatistics
    gathering step of IndexSearcher.createWeight works from this set."""
    out: set[tuple[str, str]] = set()
    if isinstance(query, TermQuery):
        out.add((query.field, query.term))
    elif isinstance(query, (PayloadScoreQuery, SpanPayloadCheckQuery)):
        out.add((query.field, query.term))
    elif isinstance(query, (PhraseQuery, SynonymQuery, CommonTermsQuery)):
        out.update((query.field, t) for t in query.terms)
    elif isinstance(query, BlendedTermQuery):
        out.update(query.terms)
    elif isinstance(query, MultiPhraseQuery):
        out.update((query.field, t) for t in query.flat_terms())
    elif isinstance(query, BooleanQuery):
        for c in query.clauses:
            out |= collect_field_terms(c.query)
    elif isinstance(query, (BoostQuery, ConstantScoreQuery, FunctionScoreQuery, ExpressionScoreQuery)):
        out |= collect_field_terms(query.query)
    elif isinstance(query, ToParentBlockJoinQuery):
        out |= collect_field_terms(query.child)
    elif isinstance(query, ToChildBlockJoinQuery):
        out |= collect_field_terms(query.parent)
    elif isinstance(query, SpanTermQuery):
        out.add((query.field, query.term))
    elif isinstance(query, (SpanNearQuery, SpanOrQuery)):
        for q in query.clauses:
            out |= collect_field_terms(q)
    elif isinstance(query, (SpanFirstQuery, SpanPositionRangeQuery)):
        out |= collect_field_terms(query.match)
    elif isinstance(query, SpanNotQuery):
        out |= collect_field_terms(query.include) | collect_field_terms(query.exclude)
    elif isinstance(query, (SpanContainingQuery, SpanWithinQuery)):
        out |= collect_field_terms(query.big) | collect_field_terms(query.little)
    elif isinstance(query, (DisjunctionMaxQuery, CoveringQuery)):
        for q in query.queries:
            out |= collect_field_terms(q)
    elif type(query).__name__ == "TermAutomatonQuery":
        out.update((query.field, t) for t in query.terms)
    return out


def parse_query(text: str, analyzer, operator: str = SHOULD, min_should_match: int = 0) -> Query:
    """QueryBuilder.createBooleanQuery equivalent: analyze -> boolean."""
    tokens = analyzer.tokens(text)
    if not tokens:
        return MatchNoDocsQuery()
    if len(tokens) == 1:
        return TermQuery(tokens[0])
    occur = MUST if operator == MUST else SHOULD
    return BooleanQuery.build(
        [(occur, TermQuery(t)) for t in tokens], min_should_match=min_should_match
    )


def parse_multifield(
    text: str,
    fields: list[tuple[str, float]],
    analyzer,
    operator: str = SHOULD,
) -> Query:
    """MultiFieldQueryParser.parse(query, fields, analyzer) analogue (s84
    queryparser/classic/MultiFieldQueryParser.java:58,268): each analyzed
    token expands to a SHOULD disjunction of per-field TermQueries (with
    per-field boosts — the Map<String,Float> boosts ctor), and the token
    groups combine under ``operator`` (the parser's default OR / AND). A
    single field or a single token collapses like the reference's
    single-clause BooleanQuery rewrite."""
    tokens = analyzer.tokens(text)
    if not tokens:
        return MatchNoDocsQuery()
    groups: list[Query] = []
    for tok in tokens:
        leaves = [TermQuery(tok, boost=b, field=f) for f, b in fields]
        groups.append(
            leaves[0] if len(leaves) == 1
            else BooleanQuery.build([(SHOULD, lq) for lq in leaves])
        )
    if len(groups) == 1:
        return groups[0]
    occur = MUST if operator == MUST else SHOULD
    return BooleanQuery.build([(occur, g) for g in groups])


# --- classic query-parser surface (QueryParserBase.java:117 analogue) -------

_CLASSIC_TOKEN_RE = _re.compile(
    r'[+-]?(?:\w+:)?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'  # [field:]"phrase"~slop^boost
    r"|\[\S+ TO \S+\]"                         # [a TO b] inclusive range
    r"|\{\S+ TO \S+\}"                         # {a TO b} exclusive range
    r"|[+-]?(?:\w+:)?\("                       # group open (modifier / field scope)
    r"|\)(?:\^\d+(?:\.\d+)?)?"                 # group close (with ^boost)
    r"|[^\s()]+"
)
_BOOST_RE = _re.compile(r"\^(\d+(?:\.\d+)?)$")
_FIELD_RE = _re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", _re.DOTALL)
_PHRASE_RE = _re.compile(r'^"([^"]*)"(?:~(\d+))?$')
_FUZZY_RE = _re.compile(r"^(\w+)~(\d)?$")


class QueryParseError(ValueError):
    pass


def _classic_single(tok: str, analyzer, field: str, boost: float) -> Query | None:
    """One clause body -> query node (term / phrase / wildcard / fuzzy /
    prefix / range), field- and boost-aware."""
    m = _PHRASE_RE.match(tok)
    if m is not None:
        body = m.group(1)
        slop = int(m.group(2)) if m.group(2) else 0
        if "(" in body:
            # multi-phrase syntax: "a (b|c) d" — a parenthesized group is
            # one phrase position whose |-separated alternatives match as
            # a union (QueryBuilder.analyzeMultiPhrase outcome for an
            # analyzer that stacks synonym tokens at one position)
            slots: list[tuple[str, ...]] = []
            for part in body.split():
                if part.startswith("(") and part.endswith(")"):
                    alts: list[str] = []
                    for alt in part[1:-1].split("|"):
                        ts = analyzer.tokens(alt)
                        if len(ts) != 1:
                            raise QueryParseError(
                                "multi-phrase alternative must analyze to one term: "
                                + alt
                            )
                        alts.append(ts[0])
                    if not alts:
                        raise QueryParseError("empty multi-phrase group")
                    slots.append(tuple(alts))
                else:
                    # a bare token may analyze to several sequential terms,
                    # each its own single-term position
                    slots.extend((t,) for t in analyzer.tokens(part))
            if not slots:
                return None
            if all(len(s) == 1 for s in slots):
                terms = tuple(s[0] for s in slots)
                if len(terms) == 1:
                    return TermQuery(terms[0], boost=boost, field=field)
                return PhraseQuery(terms=terms, slop=slop, boost=boost, field=field)
            return MultiPhraseQuery(
                positions=tuple(slots), slop=slop, boost=boost, field=field
            )
        terms = tuple(analyzer.tokens(body))
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], boost=boost, field=field)
        return PhraseQuery(terms=terms, slop=slop, boost=boost, field=field)
    if (tok.startswith("[") or tok.startswith("{")) and tok.endswith(("]", "}")):
        if field:
            raise QueryParseError("range queries support only the primary field")
        lo, hi = tok[1:-1].split(" TO ")
        q: Query = TermRangeQuery(
            lo.lower(), hi.lower(),
            include_lower=tok.startswith("["), include_upper=tok.endswith("]"),
        )
        return BoostQuery(q, boost) if boost != 1.0 else q
    fz = _FUZZY_RE.match(tok)
    if fz is not None:
        if field:
            raise QueryParseError("fuzzy queries support only the primary field")
        q = FuzzyQuery(fz.group(1).lower(), max_edits=int(fz.group(2) or 2))
        return BoostQuery(q, boost) if boost != 1.0 else q
    if "*" in tok or "?" in tok:
        if field:
            raise QueryParseError("wildcard queries support only the primary field")
        body = tok.lower()
        if body.endswith("*") and "*" not in body[:-1] and "?" not in body:
            q = PrefixQuery(body[:-1])
        else:
            q = WildcardQuery(body)
        return BoostQuery(q, boost) if boost != 1.0 else q
    terms = analyzer.tokens(tok)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0], boost=boost, field=field)
    inner = BooleanQuery.build([(SHOULD, TermQuery(t, field=field)) for t in terms])
    return BoostQuery(inner, boost) if boost != 1.0 else inner


def parse_classic(text: str, analyzer, default_field: str = "") -> Query:
    """Classic query-parser surface: ``field:term``, quoted phrases with
    optional ``~slop``, ``AND`` / ``OR`` / ``NOT``, leading ``+``/``-``,
    ``^boost``, wildcards/prefix/fuzzy/ranges (primary field), and
    parenthesized grouping ``(a OR b) AND c`` with optional group modifier
    (``+(...)`` / ``-(...)``), trailing group boost (``(...)^2``), and
    field scoping of a whole group (``title:(a b)`` — the scoped field
    becomes the group's default field; inner ``field:`` specs override).
    Semantics follow the classic parser's clause model
    (QueryParserBase.java:117 — Clause recursion on '(' producing a nested
    BooleanQuery clause): default operator OR (SHOULD); AND upgrades both
    neighbours to MUST; NOT / ``-`` mark MUST_NOT; ``+`` marks MUST."""
    toks = _CLASSIC_TOKEN_RE.findall(text)
    i, q = _parse_clauses(toks, 0, analyzer, default_field, depth=0)
    if i < len(toks):  # stray ')' at top level
        raise QueryParseError("unbalanced ')' in query")
    return q if q is not None else MatchNoDocsQuery()


def _parse_clauses(
    toks: list[str], i: int, analyzer, default_field: str, depth: int
) -> tuple[int, Query | None]:
    """Parse a clause list until end-of-tokens or an unconsumed ')' (left
    for the caller holding the matching '('). Returns (next index, query or
    None if the list produced no clauses)."""
    clauses: list[tuple[str, Query]] = []
    pending_must = False
    pending_not = False
    while i < len(toks):
        tok = toks[i]
        if tok.startswith(")"):
            if depth == 0:
                raise QueryParseError("unbalanced ')' in query")
            break
        i += 1
        if tok == "AND" or tok == "&&":
            if clauses and clauses[-1][0] == SHOULD:
                clauses[-1] = (MUST, clauses[-1][1])
            pending_must = True
            continue
        if tok == "OR" or tok == "||":
            pending_must = False
            continue
        if tok == "NOT" or tok == "!":
            pending_not = True
            continue
        occur = SHOULD
        if tok.endswith("("):
            body = tok
            if body[0] == "+":
                occur = MUST
                body = body[1:]
            elif body[0] == "-":
                occur = MUST_NOT
                body = body[1:]
            # field-scoped group "field:( ... )": the scoped field is the
            # group's default field (inner field: specs still override)
            group_field = default_field
            if len(body) > 1:
                group_field = body[:-2]  # strip ":("
            i, sub = _parse_clauses(toks, i, analyzer, group_field, depth + 1)
            if i >= len(toks) or not toks[i].startswith(")"):
                raise QueryParseError("unbalanced '(' in query")
            close = toks[i]
            i += 1
            if pending_not:
                occur = MUST_NOT
            elif pending_must and occur == SHOULD:
                occur = MUST
            pending_must = pending_not = False
            if sub is None:  # empty group: contributes no clause
                continue
            bm = _BOOST_RE.search(close)
            if bm is not None:
                sub = BoostQuery(sub, float(bm.group(1)))
            clauses.append((occur, sub))
            continue
        if tok.startswith("+") and len(tok) > 1:
            occur = MUST
            tok = tok[1:]
        elif tok.startswith("-") and len(tok) > 1:
            occur = MUST_NOT
            tok = tok[1:]
        if pending_not:
            occur = MUST_NOT
        elif pending_must and occur == SHOULD:
            occur = MUST
        pending_must = pending_not = False

        boost = 1.0
        if not tok.startswith('"'):
            bm = _BOOST_RE.search(tok)
            if bm is not None:
                boost = float(bm.group(1))
                tok = tok[: bm.start()]
        else:
            bm = _BOOST_RE.search(tok)
            if bm is not None and not tok.endswith('"'):
                boost = float(bm.group(1))
                tok = tok[: bm.start()]
        field = default_field
        fm = _FIELD_RE.match(tok)
        if fm is not None and not tok.startswith('"'):
            field, tok = fm.group(1), fm.group(2)
        q = _classic_single(tok, analyzer, field, boost)
        if q is not None:
            clauses.append((occur, q))
    if not clauses:
        return i, None
    if len(clauses) == 1 and clauses[0][0] == SHOULD:
        return i, clauses[0][1]
    return i, BooleanQuery.build(clauses)
