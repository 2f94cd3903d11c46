"""Exhaustive vectorized per-segment query evaluation (the oracle + bulk path).

This is the BooleanScorer/bulk-scorer equivalent (SURVEY.md §2.4): decode
whole posting lists into numpy arrays and evaluate the boolean tree with
sorted-array set operations (ConjunctionDISI / DisiPriorityQueue /
ReqExclScorer semantics as intersect / union / setdiff — SURVEY.md §2.5
"set ops on doc sets"). It scores every match, so it is also the
CheckHits-style exhaustive oracle the WAND scorer duels against
(test-framework/.../search/CheckHits.java:595-603 pattern).

Float discipline for rank identity: leaf scores are float32 from the BM25
kernel; every combining node sums its children in float64 and casts the
result to float32, matching the reference's double-accumulate-then-float
(e.g. DisjunctionSumScorer / ConjunctionScorer score()).

Boolean semantics (BooleanWeight / Boolean2ScorerSupplier.java:89-205):
- candidates = AND(MUST, FILTER), minus OR(MUST_NOT), with
  #matched SHOULD >= minimumNumberShouldMatch;
- SHOULD-only queries require >= max(1, msm) matches;
- score = sum over MUST + matched SHOULD clauses (FILTER contributes 0);
- MUST_NOT/FILTER-only queries produce constant score 0 matches for
  FILTER, no matches for a lone MUST_NOT.
"""

from __future__ import annotations

import numpy as np

from ..functions.bm25 import BM25
from ..state.segment import SegmentReader
from . import queries as Q

__all__ = ["CollectionStats", "eval_query", "term_scores"]

# dense bulk-scoring cutover: per-query transient = doc_count * 10 bytes
# (float64 acc + uint16 counts); above this, fall back to sort-based union.
# Serving shards at 10^12-doc scale partition the doc space well below it.
_MAX_DENSE_DOCS = 1 << 24


class FilterCache:
    """LRU cache of FILTER-clause doc sets per reader — the LRUQueryCache
    analogue (search/LRUQueryCache.java): filter queries are score-free,
    so their matching doc sets are reusable across queries. Attached
    lazily to readers; keys are the (hashable, frozen) query nodes."""

    def __init__(self, max_entries: int = 256):
        from collections import OrderedDict

        self.max_entries = max_entries
        self._d: "OrderedDict" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
            self.hits += 1
        else:
            self.misses += 1
        return v

    def put(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        if len(self._d) > self.max_entries:
            self._d.popitem(last=False)


def _filter_docs(reader, query, stats, bm25) -> np.ndarray:
    """Evaluate a FILTER clause's doc set through the reader's LRU cache."""
    cache = getattr(reader, "filter_cache", None)
    if cache is None:
        cache = FilterCache()
        try:
            reader.filter_cache = cache
        except AttributeError:  # readers with __slots__: evaluate uncached
            return eval_query(reader, query, stats, bm25)[0]
    try:
        cached = cache.get(query)
    except TypeError:  # unhashable query node
        return eval_query(reader, query, stats, bm25)[0]
    if cached is not None:
        return cached
    docs = eval_query(reader, query, stats, bm25)[0]
    cache.put(query, docs)
    return docs


class CollectionStats:
    """Global (cross-segment) collection + term statistics for scoring.

    The reference computes idf/avgdl from the statistics of ALL segments
    (IndexSearcher.createWeight -> CollectionStatistics/TermStatistics,
    SURVEY.md §3.2 step 3); per-segment scoring with global stats is what
    makes scores comparable across partitions.
    """

    def __init__(
        self,
        doc_count: int,
        sum_total_term_freq: int,
        term_df: dict,
        term_ttf: dict,
        field_df: dict | None = None,
        field_ttf: dict | None = None,
        field_sttf: dict | None = None,
        field_doc_count: dict | None = None,
    ):
        self.doc_count = doc_count
        self.sum_total_term_freq = sum_total_term_freq
        self.term_df = term_df  # primary-field term -> docFreq
        self.term_ttf = term_ttf
        # non-primary fields: (field, term) -> df/ttf, field -> sttf/docCount
        self.field_df = field_df or {}
        self.field_ttf = field_ttf or {}
        self.field_sttf = field_sttf or {}
        self.field_doc_count = field_doc_count or {}

    def df(self, term: str, field: str = "") -> int:
        if not field:
            return self.term_df.get(term, 0)
        return self.field_df.get((field, term), 0)

    def ttf(self, term: str, field: str = "") -> int:
        """The term's totalTermFreq (TermStatistics.totalTermFreq) —
        consumed by LM similarities."""
        if not field:
            return self.term_ttf.get(term, 0)
        return self.field_ttf.get((field, term), 0)

    def sttf(self, field: str = "") -> int:
        """Per-field sumTotalTermFreq (avgdl numerator)."""
        if not field:
            return self.sum_total_term_freq
        return self.field_sttf.get(field, 0)

    def n_docs(self, field: str = "") -> int:
        """Per-field docCount (docs WITH the field — BM25Similarity uses the
        field's CollectionStatistics.docCount, not maxDoc)."""
        if not field:
            return self.doc_count
        return self.field_doc_count.get(field, 0)

    def to_tuple(self) -> tuple:
        """Broadcastable form (ray.put / actor args) incl. field stats."""
        return (
            self.doc_count, self.sum_total_term_freq, self.term_df,
            self.term_ttf, self.field_df, self.field_ttf, self.field_sttf,
            self.field_doc_count,
        )

    @classmethod
    def from_tuple(cls, t: tuple) -> "CollectionStats":
        return cls(*t)


def _in_sorted(a: np.ndarray, b_sorted: np.ndarray) -> np.ndarray:
    """Boolean mask: which elements of a occur in sorted array b."""
    if len(b_sorted) == 0 or len(a) == 0:
        return np.zeros(len(a), dtype=bool)
    idx = np.searchsorted(b_sorted, a)
    idx = np.minimum(idx, len(b_sorted) - 1)
    return b_sorted[idx] == a


def _view(reader, field: str):
    """Resolve the reader serving ``field`` ("" = the reader itself)."""
    if not field:
        return reader
    fv = getattr(reader, "field_view", None)
    if fv is None:
        raise ValueError(
            f"{type(reader).__name__} has no per-field data (field={field!r})"
        )
    return fv(field)


def term_scores(
    reader: SegmentReader, term: str, stats: CollectionStats, bm25: BM25,
    boost: float = 1.0, field: str = "",
    df_override: int = -1, ttf_override: int = -1,
) -> tuple[np.ndarray, np.ndarray]:
    """TermQuery leaf: decode postings, score all docs (TermScorer.java:29).
    Scoring uses the FIELD's statistics (df over its postings, its own
    docCount/avgdl) and the field's norm bytes. ``df_override`` /
    ``ttf_override`` >= 0 substitute artificial aggregated TermStatistics
    (BlendedTermQuery rewrite, TermStates.accumulateStatistics)."""
    fr = _view(reader, field)
    tp = fr.term_postings(term)
    if tp is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    docs, freqs = tp.decode()
    df = stats.df(term, field) if df_override < 0 else df_override
    ttf = stats.ttf(term, field) if ttf_override < 0 else ttf_override
    tw = bm25.term_weight(
        df, stats.n_docs(field), stats.sttf(field), boost, ttf=ttf,
    )
    scores = tw.score(freqs, fr.norms[docs])
    return docs, scores.astype(np.float32, copy=False)


def _empty() -> tuple[np.ndarray, np.ndarray]:
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)


def eval_query(
    reader: SegmentReader, query: Q.Query, stats: CollectionStats, bm25: BM25
) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate a (rewritten) query over one segment.

    Returns (local docIDs ascending, float32 scores aligned).
    """
    if isinstance(query, Q.TermQuery):
        return term_scores(
            reader, query.term, stats, bm25, query.boost, query.field,
            df_override=query.df_override, ttf_override=query.ttf_override,
        )

    if isinstance(query, Q.MatchAllDocsQuery):
        docs = np.arange(reader.doc_count, dtype=np.int64)
        return docs, np.full(len(docs), np.float32(query.boost), dtype=np.float32)

    if isinstance(query, Q.MatchNoDocsQuery):
        return _empty()

    if isinstance(query, Q.DocSetQuery):
        # global docID set intersected with this reader's doc range,
        # rebased to local ids; constant score 0 (a FILTER-side query)
        ids = np.asarray(query.doc_ids, dtype=np.int64)
        lo, hi = reader.doc_base, reader.doc_base + reader.doc_count
        ids = ids[(ids >= lo) & (ids < hi)] - reader.doc_base
        return ids, np.zeros(len(ids), dtype=np.float32)

    if isinstance(query, Q.NumericRangeQuery):
        # doc-values range; constant score 0 (FILTER-side). Readers with a
        # block index (docmap row-group min/max stats — the BKD analogue,
        # state/segment.py range_docs_pruned) skip/accept whole blocks;
        # others fall back to the vectorized full-column mask.
        rng_fn = getattr(reader, "doc_values_range_docs", None)
        if rng_fn is not None:
            docs = rng_fn(
                query.col, query.lower, query.upper,
                query.include_lower, query.include_upper,
            )
            return docs, np.zeros(len(docs), dtype=np.float32)
        vals = reader.doc_values(query.col)
        mask = np.ones(len(vals), dtype=bool)
        if query.lower is not None:
            mask &= (vals >= query.lower) if query.include_lower else (vals > query.lower)
        if query.upper is not None:
            mask &= (vals <= query.upper) if query.include_upper else (vals < query.upper)
        docs = np.flatnonzero(mask).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.StringDocValuesQuery):
        # vectorized per-segment equality mask over the stored string
        # column; constant score 0 (FILTER-side, FilterCache-able). The
        # SORTED-doc-values plan of IndexOrDocValuesQuery — no global doc
        # list ever leaves the segment.
        vals = reader.doc_values(query.col)
        docs = np.flatnonzero(vals == query.value).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.SortedSetDocValuesQuery):
        # multi-valued set membership: equality mask over the flattened
        # list column, parent indices of hits are the matching docs
        # (each doc's values are distinct, so no dedup pass is needed —
        # np.unique guards anyway for non-set inputs)
        import pyarrow.compute as _pc

        lst = reader.doc_values_list(query.col)
        mask = _pc.equal(_pc.list_flatten(lst), query.value)
        parents = _pc.list_parent_indices(lst).to_numpy()
        docs = np.unique(parents[mask.to_numpy(zero_copy_only=False)]).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.StringDocValuesPrefixQuery):
        # DrillDownQuery dimension clause: path == p OR path startswith
        # "p/" (subtree match), one vectorized mask per segment.
        vals = reader.doc_values(query.col)
        u = vals.astype("U") if vals.dtype == object else vals
        mask = (u == query.path) | np.char.startswith(u, query.path + "/")
        if vals.dtype == object:
            # astype("U") renders None as the literal "None"; a null path
            # must never match (e.g. prefix "No")
            mask &= np.not_equal(vals, None)
        docs = np.flatnonzero(mask).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.DocValuesFieldExistsQuery):
        # the docmap column's validity bitmap IS the doc set
        # (DocValuesFieldExistsQuery.java:125)
        valid = reader.doc_values_valid(query.col)
        docs = np.flatnonzero(valid).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.NormsFieldExistsQuery):
        # norm byte 0 == no tokens in the field for this doc
        # (NormsFieldExistsQuery.java:94; intToByte4(0) == 0)
        fr = _view(reader, query.field)
        norms = fr.norms
        if not isinstance(norms, np.ndarray):  # SegmentedNorms view
            norms = norms[np.arange(len(norms), dtype=np.int64)]
        docs = np.flatnonzero(norms != 0).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.GeoDistanceQuery):
        from .geo import EARTH_RADIUS_M, haversine_m

        lat = np.asarray(reader.doc_values(query.lat_col), dtype=np.float64)
        lon = np.asarray(reader.doc_values(query.lon_col), dtype=np.float64)
        # bounding-box prefilter: only candidate rows pay the haversine
        dlat_max = np.degrees(query.radius_m / EARTH_RADIUS_M)
        coslat = max(np.cos(np.radians(query.lat)), 1e-12)
        dlon_max = np.degrees(query.radius_m / (EARTH_RADIUS_M * coslat))
        cand = np.flatnonzero(
            (np.abs(lat - query.lat) <= dlat_max)
            & (np.abs((lon - query.lon + 180.0) % 360.0 - 180.0) <= dlon_max)
        )
        if len(cand) == 0:
            return _empty()
        dist = haversine_m(query.lat, query.lon, lat[cand], lon[cand])
        docs = cand[dist <= query.radius_m].astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.FunctionRangeQuery):
        from ..functions.expressions import compile_expression

        expr = compile_expression(query.expression)
        bind = {}
        for var in expr.variables:
            col = np.asarray(reader.doc_values(var), dtype=np.float64)
            bind[var] = np.nan_to_num(col, nan=0.0)
        vals = expr.evaluate(bind)
        if np.isscalar(vals) or getattr(vals, "ndim", 1) == 0:
            vals = np.full(reader.doc_count, float(vals), dtype=np.float64)
        mask = np.ones(len(vals), dtype=bool)
        if query.lower is not None:
            mask &= (vals >= query.lower) if query.include_lower else (vals > query.lower)
        if query.upper is not None:
            mask &= (vals <= query.upper) if query.include_upper else (vals < query.upper)
        docs = np.flatnonzero(mask).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.NumericSetQuery):
        vals = np.asarray(reader.doc_values(query.col), dtype=np.float64)
        mask = np.isin(vals, np.asarray(query.values, dtype=np.float64))
        mask &= ~np.isnan(vals)  # missing values never match
        docs = np.flatnonzero(mask).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.GeoPolygonQuery):
        from .geo import point_in_polygon

        lat = np.asarray(reader.doc_values(query.lat_col), dtype=np.float64)
        lon = np.asarray(reader.doc_values(query.lon_col), dtype=np.float64)
        vs = query.vertices
        # bounding-box prefilter: only candidate rows run the crossing test
        min_la, max_la = min(v[0] for v in vs), max(v[0] for v in vs)
        min_lo, max_lo = min(v[1] for v in vs), max(v[1] for v in vs)
        cand = np.flatnonzero(
            (lat >= min_la) & (lat <= max_la) & (lon >= min_lo) & (lon <= max_lo)
        )
        if len(cand) == 0:
            return _empty()
        inside = point_in_polygon(lat[cand], lon[cand], list(vs))
        docs = cand[inside].astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.GeoBoxQuery):
        lat = np.asarray(reader.doc_values(query.lat_col), dtype=np.float64)
        lon = np.asarray(reader.doc_values(query.lon_col), dtype=np.float64)
        mask = (lat >= query.min_lat) & (lat <= query.max_lat)
        if query.min_lon <= query.max_lon:
            mask &= (lon >= query.min_lon) & (lon <= query.max_lon)
        else:  # antimeridian crossing: two wrapped lon ranges (OR)
            mask &= (lon >= query.min_lon) | (lon <= query.max_lon)
        docs = np.flatnonzero(mask).astype(np.int64)
        return docs, np.zeros(len(docs), dtype=np.float32)

    if isinstance(query, Q.CoveringQuery):
        # CoveringScorer: per-doc clause-match count vs the dynamic
        # minimum from the LongValuesSource expression
        from ..functions.expressions import compile_expression

        subs = [eval_query(reader, sub, stats, bm25) for sub in query.queries]
        subs = [(d, s) for d, s in subs if len(d)]
        if not subs:
            return _empty()
        docs_cat = np.concatenate([d for d, _ in subs])
        scores_cat = np.concatenate([s.astype(np.float64) for _, s in subs])
        order = np.argsort(docs_cat, kind="stable")
        ds, ss = docs_cat[order], scores_cat[order]
        starts = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
        uniq = ds[starts].astype(np.int64)
        counts = np.diff(np.r_[starts, len(ds)])
        sums = np.add.reduceat(ss, starts)
        expr = compile_expression(query.min_expr)
        bind = {
            v: np.asarray(reader.doc_values(v)[uniq], dtype=np.float64)
            for v in expr.variables
        }
        mv = np.asarray(expr.evaluate(bind), dtype=np.float64)
        if mv.ndim == 0:
            mv = np.full(len(uniq), float(mv), dtype=np.float64)
        # advanceExact miss (NaN value) -> unreachable minimum
        minmatch = np.where(np.isnan(mv), np.inf,
                            np.maximum(1.0, np.trunc(mv)))
        keep = counts >= minmatch
        return uniq[keep], sums[keep].astype(np.float32)

    if isinstance(query, Q.FeatureQuery):
        # FeatureField (FeatureField.java:229-400): docs = feature-column
        # validity; value goes through the freq-encoding round-trip
        # (floatToIntBits >>> 15 << 15 — top 8 mantissa bits) before the
        # scoring function, exactly like the indexed feature term's freq
        import math as _math

        valid = reader.doc_values_valid(query.col)
        docs = np.flatnonzero(valid).astype(np.int64)
        if len(docs) == 0:
            return _empty()
        raw = np.ascontiguousarray(
            np.asarray(reader.doc_values(query.col)[docs], dtype=np.float64)
            .astype(np.float32)
        )
        f = (raw.view(np.uint32) & np.uint32(0xFFFF8000)).view(np.float32)
        if query.function == "log":
            s = (
                np.float64(query.boost)
                * np.log((np.float32(query.a) + f).astype(np.float64))
            ).astype(np.float32)
        elif query.function == "saturation":
            p32 = np.float32(query.pivot)
            s = np.float32(query.boost) * (np.float32(1.0) - p32 / (f + p32))
        elif query.function == "sigmoid":
            pp = _math.pow(query.pivot, query.a)
            s = (
                np.float64(query.boost)
                * (1.0 - pp / (np.power(f.astype(np.float64), query.a) + pp))
            ).astype(np.float32)
        else:
            raise ValueError(f"unknown feature function {query.function!r}")
        return docs, s.astype(np.float32)

    if isinstance(query, Q.FunctionScoreQuery):
        docs, base = eval_query(reader, query.query, stats, bm25)
        if len(docs) == 0:
            return docs, base
        vals = np.asarray(reader.doc_values(query.source_col)[docs], dtype=np.float64)
        if query.function == "log1p":
            vals = np.log1p(vals)
        elif query.function != "identity":
            raise ValueError(f"unknown score function {query.function!r}")
        if query.combine == "multiply":
            out = base.astype(np.float64) * vals
        elif query.combine == "replace":
            out = vals
        else:
            raise ValueError(f"unknown combine {query.combine!r}")
        if query.boost != 1.0:
            out = out * np.float64(query.boost)
        return docs, out.astype(np.float32)

    if isinstance(query, Q.ExpressionScoreQuery):
        # expressions-module surface: compile once (lru-cached by source),
        # bind _score + doc-values columns, evaluate vectorized per segment
        from ..functions.expressions import compile_expression

        docs, base = eval_query(reader, query.query, stats, bm25)
        if len(docs) == 0:
            return docs, base
        expr = compile_expression(query.expression)
        bind: dict = {}
        for var in expr.variables:
            if var == "_score":
                bind[var] = base.astype(np.float64)
            else:
                bind[var] = np.asarray(
                    reader.doc_values(var)[docs], dtype=np.float64
                )
        out = expr.evaluate(bind)
        if np.isscalar(out) or out.ndim == 0:
            out = np.full(len(docs), float(out), dtype=np.float64)
        if query.boost != 1.0:
            out = out * np.float64(query.boost)
        return docs, out.astype(np.float32)

    if isinstance(query, Q.BoostQuery):
        # BoostQuery multiplies the sub-score (BoostQuery.java:130)
        docs, scores = eval_query(reader, query.query, stats, bm25)
        return docs, (np.float32(query.boost) * scores).astype(np.float32)

    if isinstance(query, Q.ConstantScoreQuery):
        docs, _ = eval_query(reader, query.query, stats, bm25)
        return docs, np.full(len(docs), np.float32(query.boost), dtype=np.float32)

    if isinstance(query, Q.SynonymQuery):
        # one pseudo-term: summed tf, df = max over members, ttf = sum
        # (SynonymQuery.java TermStatistics aggregation)
        fr = _view(reader, query.field)
        all_docs: list[np.ndarray] = []
        all_freqs: list[np.ndarray] = []
        for t in query.terms:
            tp = fr.term_postings(t)
            if tp is not None:
                d, f = tp.decode()
                all_docs.append(d)
                all_freqs.append(f)
        if not all_docs:
            return _empty()
        docs_cat = np.concatenate(all_docs)
        freqs_cat = np.concatenate(all_freqs).astype(np.int64)
        docs, inv = np.unique(docs_cat, return_inverse=True)
        freqs = np.zeros(len(docs), dtype=np.int64)
        np.add.at(freqs, inv, freqs_cat)
        df = max(stats.df(t, query.field) for t in query.terms)
        tw = bm25.term_weight(
            df, stats.n_docs(query.field), stats.sttf(query.field), query.boost,
            ttf=sum(stats.ttf(t, query.field) for t in query.terms),
        )
        return docs, tw.score(freqs, fr.norms[docs]).astype(np.float32, copy=False)

    if isinstance(query, Q.DisjunctionMaxQuery):
        subs = [eval_query(reader, q, stats, bm25) for q in query.queries]
        subs = [(d, s) for d, s in subs if len(d)]
        if not subs:
            return _empty()
        docs = np.unique(np.concatenate([d for d, _ in subs]))
        maxes = np.full(len(docs), -np.inf, dtype=np.float32)
        sums = np.zeros(len(docs), dtype=np.float64)
        for d, s in subs:
            pos = np.searchsorted(docs, d)
            np.maximum.at(maxes, pos, s)
            np.add.at(sums, pos, s.astype(np.float64))
        # max + tieBreaker * (sum of the others) (DisjunctionMaxQuery.java:30)
        others = sums - maxes.astype(np.float64)
        out = (maxes.astype(np.float64) + np.float64(query.tie_breaker) * others).astype(np.float32)
        return docs, out

    if isinstance(query, Q.PhraseQuery):
        return _eval_phrase(reader, query, stats, bm25)

    if isinstance(query, Q.MultiPhraseQuery):
        return _eval_multi_phrase(reader, query, stats, bm25)

    if isinstance(query, Q.IntervalQuery):
        from .intervals import eval_interval_query

        return eval_interval_query(reader, query, stats, bm25)

    if isinstance(query, Q.PayloadScoreQuery):
        from .payloads import eval_payload_query

        return eval_payload_query(reader, query, stats, bm25)

    if isinstance(query, Q.SpanPayloadCheckQuery):
        from .payloads import eval_span_payload_check

        return eval_span_payload_check(reader, query, stats, bm25)

    if isinstance(query, Q.ToParentBlockJoinQuery):
        from .blockjoin import eval_blockjoin

        return eval_blockjoin(reader, query, stats, bm25)

    if isinstance(query, Q.ToChildBlockJoinQuery):
        from .blockjoin import eval_tochild_blockjoin

        return eval_tochild_blockjoin(reader, query, stats, bm25)

    if isinstance(query, Q.SPAN_QUERY_TYPES):
        from .spans import eval_span

        return eval_span(reader, query, stats, bm25)

    if type(query).__name__ == "TermAutomatonQuery":
        from .termautomaton import eval_term_automaton

        return eval_term_automaton(reader, query, stats, bm25)

    if isinstance(query, Q.BooleanQuery):
        return _eval_boolean(reader, query, stats, bm25)

    if isinstance(query, Q.CommonTermsQuery):
        # rewrite against GLOBAL collected stats (CommonTermsQuery.rewrite
        # collects TermStates across all leaves before classifying), then
        # evaluate the resulting boolean tree
        rewritten = query.rewrite_with_stats(
            lambda t: stats.df(t, query.field), stats.n_docs(query.field)
        )
        return eval_query(reader, rewritten, stats, bm25)

    if isinstance(query, Q.BlendedTermQuery):
        # blend ONE artificial TermStatistics (df = max, ttf = sum) over
        # GLOBAL collected stats, then evaluate the dismax/boolean tree of
        # stat-overridden TermQueries (BlendedTermQuery.java:274 rewrite)
        rewritten = query.rewrite_with_stats(
            lambda f, t: stats.df(t, f), lambda f, t: stats.ttf(t, f)
        )
        return eval_query(reader, rewritten, stats, bm25)

    raise TypeError(f"unrewritten or unknown query type: {type(query).__name__}")


def _sloppy_freq(adj_lists: list[np.ndarray], slop: int) -> float:
    """Sloppy phrase frequency of one document — a faithful transcription
    of SloppyPhraseMatcher.nextMatch for the no-repeats case
    (solr-8.4.0/lucene/core/.../search/SloppyPhraseMatcher.java:165-201):
    traverse offset-adjusted positions with a (position, offset) min-heap,
    always advancing the least PhrasePosition; every emitted match adds
    sloppyWeight = 1/(1+matchLength), accumulated in float32 as
    PhraseScorer does. adj_lists[i] = positions of term i minus i."""
    import heapq

    n = len(adj_lists)
    idx = [0] * n
    pos = [int(l[0]) for l in adj_lists]
    end = max(pos)
    heap = [(pos[o], o) for o in range(n)]
    heapq.heapify(heap)

    def advance(o: int) -> bool:
        nonlocal end
        idx[o] += 1
        if idx[o] >= len(adj_lists[o]):
            return False
        pos[o] = int(adj_lists[o][idx[o]])
        if pos[o] > end:
            end = pos[o]
        return True

    one = np.float32(1.0)
    freq = np.float32(0.0)
    positioned = True
    while positioned:
        p, o = heapq.heappop(heap)
        match_len = end - p
        nxt = heap[0][0]
        emitted = False
        while True:
            if not advance(o):
                positioned = False
                if match_len <= slop:
                    freq = np.float32(freq + one / np.float32(1 + match_len))
                break
            p = pos[o]
            if p > nxt:
                heapq.heappush(heap, (p, o))
                if match_len <= slop:
                    freq = np.float32(freq + one / np.float32(1 + match_len))
                    emitted = True
                    break
                p, o = heapq.heappop(heap)
                nxt = heap[0][0]
                match_len = end - p
            else:
                ml2 = end - p
                if ml2 < match_len:
                    match_len = ml2
        if emitted:
            continue
    return float(freq)


class _PP:
    """PhrasePositions analogue: adj = term positions minus query offset, so
    equal .position across pps means an in-order phrase alignment
    (PhrasePositions.java:52-58)."""

    __slots__ = ("adj", "i", "position", "offset", "ord", "rpt_group", "rpt_ind")

    def __init__(self, adj, offset):
        self.adj = adj
        self.offset = offset
        self.ord = offset
        self.rpt_group = -1
        self.rpt_ind = 0
        self.i = -1
        self.position = 0

    def first_position(self) -> bool:
        self.i = -1
        return self.next_position()

    def next_position(self) -> bool:
        self.i += 1
        if self.i < len(self.adj):
            self.position = int(self.adj[self.i])
            return True
        return False


def _pp_key(pp: _PP):
    # PhraseQueue.lessThan order: (position, offset, ord)
    return (pp.position, pp.offset, pp.ord)


def _sloppy_freq_repeats(adj_lists: list[np.ndarray], terms, slop: int) -> float:
    """Sloppy phrase frequency WITH repeated terms — a faithful
    transcription of SloppyPhraseMatcher's rptGroups machinery for the
    single-term-per-position case (SloppyPhraseMatcher.java:279-358 group
    detection + advanceRepeatGroups:433-465 + advanceRpts:278-318):
    same-term PhrasePositions form a group sorted by query offset; per doc
    the j-th member starts j positions in; whenever an advance makes two
    group members land on the same token (tpPos = position + offset), the
    LESSER of the pair advances until the collision clears. The traversal
    and float32 sloppyWeight accumulation match nextMatch:165-196."""
    pps = [_PP(adj_lists[o], o) for o in range(len(adj_lists))]
    by_term: dict = {}
    for pp, t in zip(pps, terms):
        by_term.setdefault(t, []).append(pp)
    rpt_groups = [g for g in by_term.values() if len(g) > 1]  # offset-sorted
    for gi, g in enumerate(rpt_groups):
        for j, pp in enumerate(g):
            pp.rpt_group = gi
            pp.rpt_ind = j

    end = -(1 << 62)

    def advance_pp(pp: _PP) -> bool:
        nonlocal end
        if not pp.next_position():
            return False
        if pp.position > end:
            end = pp.position
        return True

    def collide(pp: _PP) -> _PP | None:
        tp = pp.position + pp.offset
        for pp2 in rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return pp2
        return None

    def lesser(a: _PP, b: _PP) -> _PP:
        if a.position < b.position or (a.position == b.position and a.offset < b.offset):
            return a
        return b

    def advance_rpts(pp: _PP) -> bool:
        if pp.rpt_group < 0:
            return True
        while True:
            other = collide(pp)
            if other is None:
                return True
            loser = lesser(pp, other)
            if not advance_pp(loser):
                return False
            # (re-queue bookkeeping is unnecessary here: the queue below
            # derives order from live pp state at every pop)

    # init: place first positions, then stagger each repeat group
    for pp in pps:
        pp.first_position()
    for g in rpt_groups:
        for j in range(1, len(g)):
            for _ in range(j):
                if not g[j].next_position():
                    return 0.0
    queue = list(pps)
    for pp in pps:
        if pp.position > end:
            end = pp.position

    def pq_pop() -> _PP:
        m = min(queue, key=_pp_key)
        queue.remove(m)
        return m

    one = np.float32(1.0)
    freq = np.float32(0.0)
    positioned = True
    while positioned:
        pp = pq_pop()
        match_length = end - pp.position
        next_pos = min(queue, key=_pp_key).position
        emitted = False
        while True:
            if not advance_pp(pp):
                positioned = False
                break
            if rpt_groups and not advance_rpts(pp):
                positioned = False
                break
            if pp.position > next_pos:
                queue.append(pp)
                if match_length <= slop:
                    freq = np.float32(freq + one / np.float32(1 + match_length))
                    emitted = True
                    break
                pp = pq_pop()
                next_pos = min(queue, key=_pp_key).position
                match_length = end - pp.position
            else:
                ml2 = end - pp.position
                if ml2 < match_length:
                    match_length = ml2
        if not positioned and not emitted and match_length <= slop:
            freq = np.float32(freq + one / np.float32(1 + match_length))
    return float(freq)


def _positions_cursor(per_term, cand: np.ndarray):
    """Index arrays for slicing each term's flat position stream per
    candidate doc: (locs[i] = candidate row in term i's doc list,
    offs[i] = per-doc offsets into the stream). Shared by the phrase and
    span evaluators."""
    locs, offs = [], []
    for d, f, _p in per_term:
        off = np.zeros(len(f) + 1, dtype=np.int64)
        np.cumsum(f, out=off[1:])
        locs.append(np.searchsorted(d, cand))
        offs.append(off)
    return locs, offs


def sum_idf_weight(terms, field: str, stats: CollectionStats, bm25: BM25,
                   boost: float):
    """One SimScorer whose idf is the DOUBLE sum of per-term float32 idfs
    in the given order (BM25Similarity idfExplain over TermStatistics[] —
    PhraseWeight passes terms with repeats in phrase order, SpanWeight a
    deduped sorted set; the caller picks)."""
    idf_total = np.float32(
        sum(float(bm25.idf(stats.df(t, field), stats.n_docs(field))) for t in terms)
    )
    from ..functions.bm25 import BM25TermWeight

    return BM25TermWeight(
        weight=np.float32(boost) * idf_total,
        cache=bm25.norm_cache(bm25.avgdl(stats.sttf(field), stats.n_docs(field))),
    )


def _eval_phrase(
    reader, query: Q.PhraseQuery, stats: CollectionStats, bm25: BM25
) -> tuple[np.ndarray, np.ndarray]:
    """PhraseQuery over the positions index.

    slop=0: ExactPhraseMatcher semantics — a doc matches when some
    position p has term_i at p+i for every i; freq = number of such p.
    slop>0: SloppyPhraseMatcher traversal with float sloppy frequency —
    _sloppy_freq for the common no-repeats case, _sloppy_freq_repeats
    (the rptGroups machinery) when a term occurs more than once.
    Scoring follows PhraseWeight: one SimScorer whose idf is the DOUBLE
    sum of the per-term float idfs (BM25Similarity idfExplain over
    TermStatistics[]), freq = (sloppy) phrase freq."""
    if len(query.terms) == 1:
        # PhraseQuery.rewrite collapses one-term phrases to a TermQuery
        # (s84 search/PhraseQuery.java rewrite), so slop never reaches the
        # matcher; scoring is plain TermQuery scoring
        return term_scores(reader, query.terms[0], stats, bm25, query.boost, query.field)
    has_repeats = len(set(query.terms)) != len(query.terms)
    fr = _view(reader, query.field)
    if not getattr(fr, "has_positions", False):
        raise ValueError(
            "PhraseQuery requires an index built with index_positions=True"
        )
    per_term = []
    for t in query.terms:
        tpp = fr.term_positions(t)
        if tpp is None:
            return _empty()
        per_term.append(tpp)

    # conjunction of doc lists
    cand = per_term[0][0]
    for d, _f, _p in per_term[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    if len(cand) == 0:
        return _empty()

    # per-candidate phrase-match counting on the decoded position streams
    locs, offs = _positions_cursor(per_term, cand)
    freqs = np.zeros(len(cand), dtype=np.float64)
    for ci in range(len(cand)):
        if query.slop == 0:
            li = locs[0][ci]
            match = per_term[0][2][offs[0][li] : offs[0][li + 1]]
            for ti in range(1, len(per_term)):
                li = locs[ti][ci]
                pos_i = per_term[ti][2][offs[ti][li] : offs[ti][li + 1]]
                match = np.intersect1d(match, pos_i - ti, assume_unique=True)
                if len(match) == 0:
                    break
            freqs[ci] = len(match)
        else:
            adj_lists = []
            for ti in range(len(per_term)):
                li = locs[ti][ci]
                adj_lists.append(
                    per_term[ti][2][offs[ti][li] : offs[ti][li + 1]] - ti
                )
            if has_repeats:
                freqs[ci] = _sloppy_freq_repeats(adj_lists, query.terms, query.slop)
            else:
                freqs[ci] = _sloppy_freq(adj_lists, query.slop)
    keep = freqs > 0
    cand, freqs = cand[keep], freqs[keep]
    if len(cand) == 0:
        return _empty()

    tw = sum_idf_weight(query.terms, query.field, stats, bm25, query.boost)
    scores = tw.score(freqs, fr.norms[cand]).astype(np.float32, copy=False)
    return cand, scores


def _union_term_positions(fr, terms) -> tuple | None:
    """UnionPostingsEnum equivalent (s84 search/MultiPhraseQuery.java:478-
    560): the merged postings of every term at one phrase position —
    docs = union of the term doc lists, per-doc positions = the
    position-sorted concatenation of each term's positions (no dedup,
    matching the PriorityQueue merge). Returns the same (docs, freqs,
    flat_positions) shape as SegmentReader.term_positions, or None when
    no term exists."""
    parts = []
    for t in terms:
        tpp = fr.term_positions(t)
        if tpp is not None:
            parts.append(tpp)
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    docs_all = np.concatenate([np.repeat(d, f) for d, f, _ in parts])
    pos_all = np.concatenate([p for _, _, p in parts])
    order = np.lexsort((pos_all, docs_all))
    docs_all = docs_all[order]
    pos_all = pos_all[order]
    docs, freqs = np.unique(docs_all, return_counts=True)
    return docs, freqs, pos_all


def _eval_multi_phrase(
    reader, query: "Q.MultiPhraseQuery", stats: CollectionStats, bm25: BM25
) -> tuple[np.ndarray, np.ndarray]:
    """MultiPhraseQuery over the positions index (s84
    search/MultiPhraseQuery.java:58): each phrase position holds one or
    more terms; the slot's postings are the union of its terms' postings
    (_union_term_positions), and the phrase matcher runs unchanged over
    the unions. slop=0 follows ExactPhraseMatcher (count of alignment
    positions); slop>0 the SloppyPhraseMatcher no-repeats traversal —
    slots sharing a term would need the rptGroups machinery over union
    enums (SloppyPhraseMatcher.java:279-358), which is out of scope and
    rejected explicitly. Scoring follows MultiPhraseWeight: one SimScorer
    whose idf is the double sum of per-term float32 idfs over ALL terms
    in termArrays order (ctor flattening), freq = (sloppy) phrase freq."""
    if len(query.positions) == 1:
        slot = query.positions[0]
        # MultiPhraseQuery.rewrite: one slot of one term -> TermQuery; one
        # slot of many terms scores each doc by the union freq with the
        # summed idf weight (degenerate phrase of length 1)
        if len(slot) == 1:
            return term_scores(reader, slot[0], stats, bm25, query.boost, query.field)
    if query.slop > 0:
        seen: set[str] = set()
        for slot in query.positions:
            if any(t in seen for t in slot):
                raise ValueError(
                    "sloppy MultiPhraseQuery with a term repeated across "
                    "positions (rptGroups over union postings) is not supported"
                )
            seen.update(slot)
    fr = _view(reader, query.field)
    if not getattr(fr, "has_positions", False):
        raise ValueError(
            "MultiPhraseQuery requires an index built with index_positions=True"
        )
    per_slot = []
    for slot in query.positions:
        u = _union_term_positions(fr, slot)
        if u is None:
            return _empty()
        per_slot.append(u)

    cand = per_slot[0][0]
    for d, _f, _p in per_slot[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    if len(cand) == 0:
        return _empty()

    locs, offs = _positions_cursor(per_slot, cand)
    freqs = np.zeros(len(cand), dtype=np.float64)
    for ci in range(len(cand)):
        if query.slop == 0:
            li = locs[0][ci]
            match = per_slot[0][2][offs[0][li] : offs[0][li + 1]]
            for ti in range(1, len(per_slot)):
                li = locs[ti][ci]
                pos_i = per_slot[ti][2][offs[ti][li] : offs[ti][li + 1]]
                match = np.intersect1d(match, pos_i - ti)
                if len(match) == 0:
                    break
            freqs[ci] = len(match)
        else:
            adj_lists = []
            for ti in range(len(per_slot)):
                li = locs[ti][ci]
                adj_lists.append(
                    per_slot[ti][2][offs[ti][li] : offs[ti][li + 1]] - ti
                )
            freqs[ci] = _sloppy_freq(adj_lists, query.slop)
    keep = freqs > 0
    cand, freqs = cand[keep], freqs[keep]
    if len(cand) == 0:
        return _empty()

    tw = sum_idf_weight(query.flat_terms(), query.field, stats, bm25, query.boost)
    scores = tw.score(freqs, fr.norms[cand]).astype(np.float32, copy=False)
    return cand, scores


def _eval_boolean(
    reader: SegmentReader, query: Q.BooleanQuery, stats: CollectionStats, bm25: BM25
) -> tuple[np.ndarray, np.ndarray]:
    musts, shoulds, filters, must_nots = [], [], [], []
    for c in query.clauses:
        if c.occur == Q.MUST:
            musts.append(eval_query(reader, c.query, stats, bm25))
        elif c.occur == Q.SHOULD:
            shoulds.append(eval_query(reader, c.query, stats, bm25))
        elif c.occur == Q.FILTER:
            filters.append(_filter_docs(reader, c.query, stats, bm25))
        elif c.occur == Q.MUST_NOT:
            must_nots.append(eval_query(reader, c.query, stats, bm25)[0])
        else:
            raise ValueError(f"bad occur {c.occur}")

    msm = query.min_should_match

    # candidate doc set
    if musts or filters:
        cand = None
        for d, _ in musts:
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        for d in filters:
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        if msm > 0 and shoulds:
            cnt = np.zeros(len(cand), dtype=np.int64)
            for d, _ in shoulds:
                cnt += _in_sorted(cand, d)
            cand = cand[cnt >= msm]
        elif msm > 0 and not shoulds:
            cand = cand[:0]
    elif shoulds:
        need = max(1, msm)
        if reader.doc_count <= _MAX_DENSE_DOCS:
            # dense bulk-scoring fast path (BooleanScorer.java:33-40 window
            # accumulation, whole-segment window): clause docIDs are unique
            # within a posting list, so plain fancy-index adds accumulate
            # scores in float64 and match counts in one pass — no sort.
            acc = np.zeros(reader.doc_count, dtype=np.float64)
            cnt = np.zeros(reader.doc_count, dtype=np.uint16)
            for d, s in shoulds:
                if len(d):
                    acc[d] += s.astype(np.float64)
                    cnt[d] += 1
            cand = np.flatnonzero(cnt >= need).astype(np.int64)
            if len(cand) == 0:
                return _empty()
            for d in must_nots:
                cand = cand[~_in_sorted(cand, d)]
            if len(cand) == 0:
                return _empty()
            return cand, acc[cand].astype(np.float32)
        all_d = np.concatenate([d for d, _ in shoulds]) if shoulds else np.empty(0, np.int64)
        if len(all_d) == 0:
            return _empty()
        docs_u, counts = np.unique(all_d, return_counts=True)
        cand = docs_u[counts >= need]
    else:
        return _empty()  # MUST_NOT-only matches nothing

    if len(cand) == 0:
        return _empty()

    for d in must_nots:
        cand = cand[~_in_sorted(cand, d)]
    if len(cand) == 0:
        return _empty()

    # sum scoring clauses (MUST + matched SHOULD) in float64, cast once
    acc = np.zeros(len(cand), dtype=np.float64)
    for d, s in musts + shoulds:
        mask = _in_sorted(cand, d)
        if mask.any():
            pos = np.searchsorted(d, cand[mask])
            acc[mask] += s[pos].astype(np.float64)
    return cand, acc.astype(np.float32)
