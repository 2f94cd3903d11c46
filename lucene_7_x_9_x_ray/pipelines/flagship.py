"""Flagship pipeline: documents -> Common-Crawl-style pages -> Ray index
build -> term-shuffle merge -> BM25/WAND query serving, as driver-checkable
tables.

Every public function takes ``sf_dir`` (a driver testdata directory) and
returns a small ``pyarrow.Table`` whose values are reproduced exactly by
the matching SQL in ``oracles.py``. The index is built once per sf_dir
under /tmp and reused (build_index's per-segment resume makes re-entry
cheap); global docIDs equal ``documents.doc_id`` because partition plans
order by (file, row) lineage and the documents file is a single sorted
table (stages/build.py plan_partitions determinism).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..functions.smallfloat import BYTE4_DECODE_TABLE
from ..functions.rounding import round_half_away
from ..search import queries as Q
from ..search.merged import open_searcher
from ..search.searcher import IndexSearcher
from ..sources.pages import pages_from_documents, write_pages_parquet
from ..stages.build import BuildConfig, build_index
from ..stages.merge import MergeConfig, merge_index

CACHE_ROOT = "/tmp/lucene_ray_cache"

# (query_id, terms, k, offset) — the TestBM25Similarity/TestWANDScorer-style
# reference query set (FIXTURES.md F5): head/torso/tail/absent single terms
# plus 2-, 3- and 5-clause SHOULD disjunctions, and a searchAfter page.
BM25_QUERY_SPECS: list[tuple[str, list[str], int, int]] = [
    ("t_the", ["the"], 10, 0),
    ("t_table", ["table"], 10, 0),
    ("t_dup", ["dup"], 10, 0),
    ("t_absent", ["zzzmissing"], 10, 0),
    ("dj_key_hash", ["key", "hash"], 10, 0),
    ("dj_window_batch_spark", ["window", "batch", "spark"], 10, 0),
    ("dj5", ["slow", "fast", "merge", "sort", "scan"], 10, 0),
    ("dj_key_hash_page2", ["key", "hash"], 10, 10),
]

# (query_id, musts, shoulds, must_nots, msm)
BOOLEAN_COUNT_SPECS: list[tuple[str, list[str], list[str], list[str], int]] = [
    ("and_key_hash", ["key", "hash"], [], [], 0),
    ("msm2_window_batch_spark", [], ["window", "batch", "spark"], [], 2),
    ("table_not_the", ["table"], [], ["the"], 0),
    ("must_value_not_line_group", ["value"], [], ["line", "group"], 0),
]

# exact-phrase query set: (query_id, phrase terms, k)
PHRASE_SPECS: list[tuple[str, list[str], int]] = [
    ("ph_key_hash", ["key", "hash"], 10),
    ("ph_the_table", ["the", "table"], 10),
    ("ph3_row_scan_slow", ["row", "scan", "slow"], 10),
]

# multi-phrase query set: (query_id, slots, k) — each slot is the list of
# alternative terms at that phrase position (MultiPhraseQuery.java:58);
# mp_union1 is the degenerate one-slot union, mp_parse round-trips the
# classic-parser "a (b|c) d" syntax
MULTIPHRASE_SPECS: list[tuple[str, list[list[str]], int]] = [
    ("mp_key_hashvalue", [["key"], ["hash", "value"]], 10),
    ("mp_thebig_table", [["the", "big"], ["table"]], 10),
    ("mp3_row_scansort_slowfast", [["row"], ["scan", "sort"], ["slow", "fast"]], 10),
    ("mp_union1", [["key", "hash"]], 10),
]

POSTINGS_TERMS = ["the", "table", "dup"]
FACET_TERM = "table"
GROUPED_TOPK_TERMS = ["key", "hash"]
GROUPED_TOPK_PER_GROUP = 2
DIVERSIFIED_TERMS = ["window", "batch", "spark"]
DIVERSIFIED_K = 12
DIVERSIFIED_MAX_PER_KEY = 3
# numeric range-facet buckets over the doc-length doc-values column:
# [0,30) short, [30,60) mid, [60,inf) long (corpus dl spans 10-99)
FACET_RANGE_EDGES = [30, 60]
FACET_RANGE_LABELS = ["len_00_29", "len_30_59", "len_60_up"]

_SEARCHERS: dict[str, tuple[IndexSearcher, IndexSearcher]] = {}


def _cache_dir(sf_dir: str) -> str:
    # v8: lang indexed as its own field (BM25NBClassifier scores the class
    # term); v7: tags multi-valued (SORTED_SET) stored column; v6:
    # facet_path stored column (taxonomy facets + drill-down); v5: on-disk
    # FORMAT_VERSION 2 (postings regions lead with a fmt_id byte — codec
    # SPI); v4 added the nullable score_hint stored column, v3 the title
    # field, v2 the positions .pos artifact
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(CACHE_ROOT, f"idx_{key}_v8")


def _variant_cache_dir(sf_dir: str, variant: str) -> str:
    return _cache_dir(sf_dir) + f"_{variant}"


def build_flagship_index(
    sf_dir: str, use_ray: bool = True, postings_format: str = "for"
) -> str:
    """documents.parquet -> page-shaped parquet -> segments -> merged index.

    Returns the index dir. Exercises the full north-rule chain: html
    wrapping + byte-identical extraction verification (verify_extract),
    multi-partition build with lineage docIDs, and the salted term-shuffle
    merge. ``postings_format`` selects the codec-SPI postings format
    ("pfor" builds the patched-FOR variant index in its own cache dir;
    results must be identical — the encoding never touches scores).
    """
    root = (
        _cache_dir(sf_dir)
        if postings_format == "for"
        else _variant_cache_dir(sf_dir, postings_format)
    )
    index_dir = os.path.join(root, "index")
    done_flag = os.path.join(index_dir, "merged", "merged.json")
    if os.path.exists(done_flag):
        return index_dir
    os.makedirs(root, exist_ok=True)

    pages_path = os.path.join(root, "pages.parquet")
    if not os.path.exists(pages_path):
        pages = pages_from_documents(sf_dir, with_html=True)
        # row groups sized for ~8 build partitions (segments) at any sf
        write_pages_parquet(
            pages, pages_path + ".tmp", rows_per_row_group=max(128, pages.num_rows // 8)
        )
        os.replace(pages_path + ".tmp", pages_path)

    from ..stages.build import FieldSpec

    cfg = BuildConfig(
        verify_extract=True,
        target_docs_per_segment=10**9,
        # multi-field schema: title (first TITLE_TOKENS body tokens) indexed
        # as its own field with per-field postings/norms/stats
        extra_fields=(
            FieldSpec("title", "title", index_positions=True),
            # class field for the classification module: single-token
            # StringField-style per-doc value, BM25-scorable
            FieldSpec("lang", "lang"),
        ),
        # nullable user doc-values column -> DocValuesFieldExistsQuery gate;
        # facet_path -> taxonomy facet dimension (source/lang);
        # tags -> multi-valued SORTED_SET doc values
        store_cols=("score_hint", "facet_path", "tags"),
        postings_format=postings_format,
    )
    # target=1e9 keeps one row-group range per partition spec; the row-group
    # size above is what actually fixes the segment count.
    cfg.target_docs_per_segment = max(128, _pages_rows(pages_path) // 8)
    if use_ray:
        build_index([pages_path], index_dir, cfg)
    else:
        from ..stages.build import build_index_local

        build_index_local([pages_path], index_dir, cfg)

    mcfg = MergeConfig(n_shards=8, hot_df_threshold=10**9)
    if use_ray:
        merge_index(index_dir, mcfg)
    else:
        from ..stages.merge import merge_index_local

        merge_index_local(index_dir, mcfg)
    return index_dir


def _pages_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def get_searchers(sf_dir: str) -> tuple[IndexSearcher, IndexSearcher]:
    """(merged searcher, segment searcher) for sf_dir, cached in-process."""
    key = os.path.abspath(sf_dir)
    if key not in _SEARCHERS:
        index_dir = build_flagship_index(sf_dir)
        _SEARCHERS[key] = (
            open_searcher(index_dir, prefer_merged=True),
            IndexSearcher(index_dir),
        )
    return _SEARCHERS[key]


def _doc_ids_from_urls(urls: list[str]) -> list[int]:
    # pages_from_documents urls are "https://docs.example/d/{doc_id}"
    return [int(u.rsplit("/", 1)[1]) for u in urls]


def _bm25_query_table(searcher) -> pa.Table:
    """Run BM25_QUERY_SPECS on any searcher -> (query_id, rank, doc_id,
    score_r) rows (shared by the merged-index and NRT-append gates)."""
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, k, offset in BM25_QUERY_SPECS:
        query = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms])
        if offset == 0:
            td = searcher.search(query, k=k)
        else:
            anchor = searcher.search(query, k=offset)
            if len(anchor.doc_ids) < offset:
                continue
            after = (float(anchor.scores[-1]), int(anchor.doc_ids[-1]))
            td = searcher.search_after(query, k=k, after=after)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def q_bm25_topk(sf_dir: str) -> pa.Table:
    """Reference query set top-k: (query_id, rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    return _bm25_query_table(merged)


def q_bm25_topk_pfor(sf_dir: str) -> pa.Table:
    """The same reference query set over an index built with the "pfor"
    postings format (codec SPI, s84 codecs/lucene84/PForUtil.java:33).
    Shares bm25_topk's SQL oracle: packing with patched exceptions must
    never change a docID or a float32 score."""
    index_dir = build_flagship_index(sf_dir, postings_format="pfor")
    return _bm25_query_table(open_searcher(index_dir, prefer_merged=True))


def build_docsonly_index(sf_dir: str) -> str:
    """Variant index with IndexOptions.DOCS (index_freqs=False,
    index_positions=False): every stored freq is 1, ttf == df, and avgdl
    degrades to mean distinct-terms-per-doc (IndexOptionTest demo)."""
    build_flagship_index(sf_dir)  # ensures pages.parquet exists (cached)
    pages_path = os.path.join(_cache_dir(sf_dir), "pages.parquet")
    root = _variant_cache_dir(sf_dir, "docsonly")
    index_dir = os.path.join(root, "index")
    done_flag = os.path.join(index_dir, "merged", "merged.json")
    if os.path.exists(done_flag):
        return index_dir
    os.makedirs(root, exist_ok=True)
    cfg = BuildConfig(
        index_positions=False,
        index_freqs=False,
        target_docs_per_segment=max(128, _pages_rows(pages_path) // 8),
    )
    build_index([pages_path], index_dir, cfg)
    merge_index(index_dir, MergeConfig(n_shards=8, hot_df_threshold=10**9))
    return index_dir


def q_bm25_topk_docsonly(sf_dir: str) -> pa.Table:
    """The reference query set over the DOCS-only variant index: BM25 with
    freq() == 1 everywhere and the degraded DOCS-only collection stats
    (avgdl = mean distinct terms per doc). Oracle: bm25_docsonly_topk_sql."""
    index_dir = build_docsonly_index(sf_dir)
    return _bm25_query_table(open_searcher(index_dir, prefer_merged=True))


def build_flagship_index_nrt(sf_dir: str) -> str:
    """Two-generation NRT build: the first half of the pages is committed
    AND merged (generation 1); the second half is then appended as new
    segments via append_index WITHOUT re-merging (generation 2). The
    merged artifact is therefore stale — exactly the state a live index
    is in between an NRT append and the next background merge."""
    from ..stages.build import FieldSpec, append_index

    root = _cache_dir(sf_dir) + "_nrt"
    index_dir = os.path.join(root, "index")
    done_flag = os.path.join(root, "nrt_done.json")
    if os.path.exists(done_flag):
        return index_dir
    os.makedirs(root, exist_ok=True)

    pages = pages_from_documents(sf_dir, with_html=True)
    half = max(1, pages.num_rows // 2)
    pa_path = os.path.join(root, "pages_a.parquet")
    pb_path = os.path.join(root, "pages_b.parquet")
    write_pages_parquet(pages.slice(0, half), pa_path,
                        rows_per_row_group=max(128, half // 4))
    write_pages_parquet(pages.slice(half), pb_path,
                        rows_per_row_group=max(128, (pages.num_rows - half) // 4))

    cfg = BuildConfig(
        verify_extract=True,
        target_docs_per_segment=max(128, half // 4),
        extra_fields=(FieldSpec("title", "title", index_positions=True),),
    )
    build_index([pa_path], index_dir, cfg)
    merge_index(index_dir, MergeConfig(n_shards=4, hot_df_threshold=10**9))
    append_index([pb_path], index_dir, cfg)

    from ..state.manifest import atomic_write_json

    atomic_write_json(done_flag, {"doc_count": pages.num_rows})
    return index_dir


def q_bm25_topk_after_append(sf_dir: str) -> pa.Table:
    """The NRT gate (round-2 VERDICT item #4): reference query set served
    AFTER an append, through the reopen path — results must equal a
    from-scratch build of the union, which is exactly what the shared
    bm25_topk SQL oracle computes over the full documents table.

    open_searcher detects (by segment-set fingerprint) that the merged
    artifact predates the appended generation and serves from segments;
    global BM25 stats come from the re-aggregated generation-2 manifest,
    so scores are identical to the single-build index."""
    index_dir = build_flagship_index_nrt(sf_dir)
    key = "nrt:" + os.path.abspath(sf_dir)
    if key not in _SEARCHERS:
        s = open_searcher(index_dir)  # stale merged -> per-segment searcher
        _SEARCHERS[key] = (s, s)
    return _bm25_query_table(_SEARCHERS[key][0])


def q_phrase_topk(sf_dir: str) -> pa.Table:
    """Exact PhraseQuery top-k over the positions index:
    (query_id, rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, k in PHRASE_SPECS:
        td = merged.search(Q.PhraseQuery(terms=tuple(terms)), k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def q_multiphrase_topk(sf_dir: str) -> pa.Table:
    """MultiPhraseQuery top-k (per-position term disjunction over union
    postings, MultiPhraseQuery.java:58): (query_id, rank, doc_id,
    score_r). The last spec additionally re-parses through the classic
    '"a (b|c) d"' syntax and asserts the parsed tree equals the spec —
    the parser hook is exercised on the gate path itself."""
    from ..functions.analysis import StandardAnalyzer

    merged, _ = get_searchers(sf_dir)
    parsed = Q.parse_classic('"row (scan|sort) (slow|fast)"', StandardAnalyzer())
    assert parsed == Q.MultiPhraseQuery(
        positions=(("row",), ("scan", "sort"), ("slow", "fast"))
    ), parsed
    qids, ranks, docs, scores = [], [], [], []
    for qid, slots, k in MULTIPHRASE_SPECS:
        q = Q.MultiPhraseQuery(positions=tuple(tuple(s) for s in slots))
        td = merged.search(q, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# span gate: (query_id, kind, clauses, param, k) — each clause is a tuple
# of terms (len > 1 = a SpanOrQuery of those terms); kind "ord"/"unord"
# (param = slop), "first" (param = end), "not" (param = (pre, post)),
# "or" (standalone SpanOrQuery, param unused)
SPAN_TOPK_SPECS: list[tuple[str, str, tuple, object, int]] = [
    ("sp_ord2", "ord", (("key",), ("hash",)), 3, 10),
    ("sp_ord3", "ord", (("data",), ("join",), ("sort",)), 8, 10),
    ("sp_unord", "unord", (("window",), ("batch",)), 2, 10),
    ("sp_first", "first", (("join",),), 5, 10),
    ("sp_not", "not", (("join",), ("order",)), (1, 2), 10),
    ("sp_or", "or", (("key", "hash"),), None, 10),
    ("sp_ord_or", "ord", (("window", "stream"), ("batch",)), 4, 10),
    ("sp_range", "range", (("data",),), (3, 9), 10),
    # nested span tree: near(near(key, hash, slop=4), value, slop=6) —
    # the inner near's slop-filtered matches are the outer's sub-spans
    ("sp_ord_nest", "ord_nest", (("key",), ("hash",), ("value",)), (4, 6), 10),
    # SpanContaining / SpanWithin: big = ordered near of the first two
    # clauses (slop = param), little = the third clause's term
    ("sp_contain", "containing", (("data",), ("join",), ("the",)), 6, 10),
    ("sp_within", "within", (("data",), ("join",), ("the",)), 6, 10),
]


def _span_query_from_spec(kind: str, clauses: tuple, param) -> Q.Query:
    def sub(terms: tuple) -> Q.Query:
        if len(terms) == 1:
            return Q.SpanTermQuery(terms[0])
        return Q.SpanOrQuery(tuple(Q.SpanTermQuery(t) for t in terms))

    subs = tuple(sub(ts) for ts in clauses)
    if kind == "ord":
        return Q.SpanNearQuery(subs, slop=int(param), in_order=True)
    if kind == "unord":
        return Q.SpanNearQuery(subs, slop=int(param), in_order=False)
    if kind == "first":
        return Q.SpanFirstQuery(subs[0], end=int(param))
    if kind == "not":
        pre, post = param
        return Q.SpanNotQuery(subs[0], subs[1], pre=pre, post=post)
    if kind == "or":
        if len(subs) != 1:
            raise ValueError("'or' span specs take exactly one clause tuple")
        return subs[0]
    if kind == "range":
        start, end = param
        return Q.SpanPositionRangeQuery(subs[0], start=start, end=end)
    if kind == "ord_nest":
        # near-of-near: inner ordered near of the first two clauses is
        # itself a clause of the outer ordered near (width > 1 sub-spans)
        islop, oslop = param
        inner = Q.SpanNearQuery(subs[:2], slop=int(islop), in_order=True)
        return Q.SpanNearQuery((inner, subs[2]), slop=int(oslop), in_order=True)
    if kind in ("containing", "within"):
        big = Q.SpanNearQuery(subs[:2], slop=int(param), in_order=True)
        cls = Q.SpanContainingQuery if kind == "containing" else Q.SpanWithinQuery
        return cls(big=big, little=subs[2])
    raise ValueError(kind)


def q_span_topk(sf_dir: str) -> pa.Table:
    """Span-query top-k (the search/spans module: SpanNear ordered and
    unordered, SpanFirst, SpanNot): (query_id, rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, kind, terms, param, k in SPAN_TOPK_SPECS:
        td = merged.search(_span_query_from_spec(kind, terms, param), k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# two-term no-repeats sloppy phrases: ORACLE-EXACT via the zigzag-chain
# closed form of SloppyPhraseMatcher (see oracles.sloppy_phrase2_topk_sql;
# equivalence to the heap transcription is duel-tested exhaustively in
# tests/test_search.py::test_sloppy_two_term_chain_closed_form)
SLOPPY_PHRASE2_SPECS: list[tuple[str, list[str], int, int]] = [
    ("sp_key_hash_s2", ["key", "hash"], 2, 10),
    ("sp_row_scan_s3", ["row", "scan"], 3, 10),
]
SLOPPY_PHRASE_SPECS: list[tuple[str, list[str], int, int]] = [
    # repeated term -> the rptGroups matcher path (_sloppy_freq_repeats);
    # ORACLE-EXACT for the [A, B, A] shape via the flattened three-cursor
    # state machine (oracles.sloppy_phrase_rpt_topk_sql)
    ("sp_rpt_the_key_the_s2", ["the", "key", "the"], 2, 10),
]


def _sloppy_query_table(merged, specs) -> pa.Table:
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, slop, k in specs:
        td = merged.search(Q.PhraseQuery(terms=tuple(terms), slop=slop), k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def q_phrase_sloppy2_topk(sf_dir: str) -> pa.Table:
    """Two-term no-repeats sloppy PhraseQuery top-k — ORACLE-EXACT: the
    SloppyPhraseMatcher heap traversal reduces, for two phrase positions,
    to a zigzag anchor chain (q0 = max of first adjusted positions; each
    match gap = anchor minus the largest other-list position <= anchor;
    next anchor = smallest other-list position > anchor), which
    oracles.sloppy_phrase2_topk_sql walks with a recursive CTE."""
    merged, _ = get_searchers(sf_dir)
    return _sloppy_query_table(merged, SLOPPY_PHRASE2_SPECS)


def q_phrase_sloppy_topk(sf_dir: str) -> pa.Table:
    """Sloppy PhraseQuery with a REPEATED term (rptGroups matcher path —
    scorers._sloppy_freq_repeats) — ORACLE-EXACT: for the [A, B, A] shape
    the group machinery flattens to a three-cursor state machine (the
    stagger pins i0 < i2, so collisions degenerate to "bump the staggered
    cursor"), which oracles.sloppy_phrase_rpt_topk_sql walks with a
    recursive CTE; equivalence to the heap transcription is duel-tested
    exhaustively in tests/test_search.py::
    test_sloppy_repeat_flat_state_machine and the semantics are pinned by
    tests/test_pipelines.py::test_sloppy_phrase_javadoc_examples."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, slop, k in SLOPPY_PHRASE_SPECS:
        td = merged.search(Q.PhraseQuery(terms=tuple(terms), slop=slop), k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# multi-field query set: (query_id, kind, [(field, term, boost)], k).
# "" = body (primary field), "title" = the extra indexed field. Exercises
# per-field df/docCount/avgdl/norms (FieldInfos-style schema) end to end.
FIELD_TOPK_SPECS: list[tuple[str, str, list[tuple[str, str, float]], int]] = [
    ("ft_title_table", "sum", [("title", "table", 1.0)], 10),
    ("ft_title_key2_body_key", "sum", [("title", "key", 2.0), ("", "key", 1.0)], 10),
    ("ft_title_the_body_hash", "sum", [("title", "the", 1.0), ("", "hash", 1.0)], 10),
    ("ft_dismax_title_body_table", "dismax", [("title", "table", 1.0), ("", "table", 1.0)], 10),
]


def q_field_topk(sf_dir: str) -> pa.Table:
    """Multi-field BM25 top-k (title vs body with per-field statistics):
    (query_id, rank, doc_id, score_r). Queries scoring the title field run
    on the per-segment searcher (merged routes them there automatically)."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, kind, clauses, k in FIELD_TOPK_SPECS:
        leaves = [Q.TermQuery(t, boost=b, field=f) for f, t, b in clauses]
        if kind == "sum":
            query: Q.Query = Q.BooleanQuery.build([(Q.SHOULD, lq) for lq in leaves])
        else:
            query = Q.DisjunctionMaxQuery(queries=tuple(leaves), tie_breaker=0.3)
        td = merged.search(query, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# classic-parser gate: each query is a STRING compiled by parse_classic;
# the oracle spec alongside states the expected semantics in field_topk_sql
# terms, so the parser's clause model is verified end to end against SQL.
PARSED_TOPK_SPECS: list[tuple[str, str, str, list[tuple[str, str, float]], int]] = [
    ("p_or", "key hash", "sum", [("", "key", 1.0), ("", "hash", 1.0)], 10),
    ("p_and", "key AND hash", "must", [("", "key", 1.0), ("", "hash", 1.0)], 10),
    ("p_not", "table NOT the", "not", [("", "table", 1.0), ("", "the", 1.0)], 10),
    (
        "p_title_boost",
        "title:table^2 value",
        "sum",
        [("title", "table", 2.0), ("", "value", 1.0)],
        10,
    ),
    # parenthesized grouping (QueryParserBase.java:117 clause recursion):
    # the group compiles to a nested BooleanQuery clause — inner scores
    # accumulate double -> one float32 cast, outer re-accumulates.
    (
        "p_group_and",
        "(key OR hash) AND value",
        "or_and",
        [("", "key", 1.0), ("", "hash", 1.0), ("", "value", 1.0)],
        10,
    ),
    (
        "p_group_not",
        "hash AND (value NOT the)",
        "and_notgroup",
        [("", "hash", 1.0), ("", "value", 1.0), ("", "the", 1.0)],
        10,
    ),
    (
        "p_group_exclude",
        "-(the value) hash",
        "sum_notgroup",
        [("", "hash", 1.0), ("", "the", 1.0), ("", "value", 1.0)],
        10,
    ),
    (
        "p_field_group",
        "title:(table value) hash",
        "group_sum",
        [("title", "table", 1.0), ("title", "value", 1.0), ("", "hash", 1.0)],
        10,
    ),
]


SIMPLE_TOPK_SPECS: list[tuple[str, str, str, list[tuple[str, str, float]], int]] = [
    # SimpleQueryParser strings (search/simpleparser.py): qid, string,
    # oracle kind, compiled clause structure, k
    ("s_or", "key | hash", "sum", [("", "key", 1.0), ("", "hash", 1.0)], 10),
    ("s_and", "key + hash", "must", [("", "key", 1.0), ("", "hash", 1.0)], 10),
    ("s_ws", "key hash", "sum", [("", "key", 1.0), ("", "hash", 1.0)], 10),
    (
        "s_group",
        "(key | hash) + value",
        "or_and",
        [("", "key", 1.0), ("", "hash", 1.0), ("", "value", 1.0)],
        10,
    ),
    (
        "s_neg",
        "table -the",
        "sum_negmatchall",
        [("", "table", 1.0), ("", "the", 1.0)],
        10,
    ),
]
# multi-field weight map for the s_fields spec (newDefaultQuery expansion)
SIMPLE_FIELDS_SPEC = (
    "s_fields", "table", "sum",
    [("", "table", 1.0), ("title", "table", 2.0)], 10,
)
SIMPLE_FIELD_WEIGHTS = {"": 1.0, "title": 2.0}


def q_simple_topk(sf_dir: str) -> pa.Table:
    """SimpleQueryParser strings -> top-k: (query_id, rank, doc_id,
    score_r). The tolerant +/|/- web-box syntax (SimpleQueryParser.java:99)
    compiles through parse_simple and must score identically to the SQL of
    its declared clause structure; s_fields exercises the multi-field
    weight expansion (newDefaultQuery, java:574-583)."""
    from ..search.simpleparser import parse_simple

    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    specs = [(q, s, k) for q, s, _kind, _cls, k in SIMPLE_TOPK_SPECS]
    specs.append((SIMPLE_FIELDS_SPEC[0], SIMPLE_FIELDS_SPEC[1],
                  SIMPLE_FIELDS_SPEC[4]))
    for qid, qstr, k in specs:
        weights = SIMPLE_FIELD_WEIGHTS if qid == "s_fields" else None
        query = parse_simple(qstr, merged.analyzer, weights=weights)
        td = merged.search(query, k=k, total_hits_threshold=1 << 30)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def q_parsed_topk(sf_dir: str) -> pa.Table:
    """Classic query-parser strings -> top-k: (query_id, rank, doc_id,
    score_r). Each string compiles through parse_classic (field:term,
    AND/OR/NOT, ^boost — QueryParserBase.java:117 surface) and must score
    identically to the SQL of its declared clause structure."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, qstr, _kind, _clauses, k in PARSED_TOPK_SPECS:
        query = Q.parse_classic(qstr, merged.analyzer)
        td = merged.search(query, k=k, total_hits_threshold=1 << 30)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


LANG_FILTER_TERMS = ("the", "table")
LANG_FILTER_LANG = "en"
LANG_FILTER_K = 10


def q_bm25_lang_filtered(sf_dir: str) -> pa.Table:
    """BM25 disjunction restricted by a metadata predicate: the stored
    ``lang`` column evaluated as a per-segment StringDocValuesQuery FILTER
    clause (the SORTED-doc-values plan of IndexOrDocValuesQuery,
    IndexOrDocValuesQuery.java:202) — the mask is computed where each
    segment lives and FilterCache-d; no driver-side doc list:
    (rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    query = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(t)) for t in LANG_FILTER_TERMS]
        + [(Q.FILTER, Q.StringDocValuesQuery("lang", LANG_FILTER_LANG))]
    )
    td = merged.search(query, k=LANG_FILTER_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


# numeric-range FILTER gate: docs 64..~20% of the corpus by warc_ts.
# pages derive warc_ts = EPOCH_2025 + doc_id * 1e6 (sources/pages.py), so
# a timestamp range maps exactly to a doc_id range the SQL oracle can state.
TS_FILTER_TERMS = ("key", "table")
TS_FILTER_LO_DOC = 64
TS_FILTER_K = 10


def q_bm25_ts_filtered(sf_dir: str) -> pa.Table:
    """BM25 disjunction restricted by a NUMERIC range predicate evaluated
    as a query clause: NumericRangeQuery over the stored warc_ts doc-values
    column (the PointRangeQuery / IndexOrDocValuesQuery numeric plan inside
    the searcher, not a relational pre-filter): (rank, doc_id, score_r)."""
    from ..sources.pages import EPOCH_2025

    merged, seg = get_searchers(sf_dir)
    hi_doc = max(TS_FILTER_LO_DOC + 10, seg.doc_count // 5)
    lo_ts = EPOCH_2025 + TS_FILTER_LO_DOC * 1_000_000
    hi_ts = EPOCH_2025 + hi_doc * 1_000_000
    query = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(t)) for t in TS_FILTER_TERMS]
        + [(Q.FILTER, Q.NumericRangeQuery("warc_ts", lo_ts, hi_ts))]
    )
    td = merged.search(query, k=TS_FILTER_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


# the matching oracle predicate, scale-adaptive inside the SQL itself
TS_FILTER_WHERE_SQL = (
    f"doc_id BETWEEN {TS_FILTER_LO_DOC} AND "
    f"greatest({TS_FILTER_LO_DOC + 10}, (SELECT count(*) FROM documents) // 5)"
)


MLT_SRC_DOC = 7
MLT_K = 10


def q_mlt_topk(sf_dir: str) -> pa.Table:
    """MoreLikeThis (query-by-document): interesting terms of doc 7's text
    (tf x idf ranking, MLT defaults) -> SHOULD disjunction -> BM25 top-k:
    (rank, doc_id, score_r). The liked doc itself ranks (MLT like(text)
    semantics; callers typically drop it)."""
    import duckdb

    from ..search.mlt import mlt_query

    merged, _ = get_searchers(sf_dir)
    like_text = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet' WHERE doc_id = {MLT_SRC_DOC}"
    ).fetchone()[0]
    query = mlt_query(merged, like_text)
    td = merged.search(query, k=MLT_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


RESCORE_FIRST_TERMS = ("key", "hash")
RESCORE_QUERY_TERM = "table"
RESCORE_WEIGHT = 2.0
RESCORE_FIRST_K = 40
RESCORE_TOP_N = 10


def q_rescored_topk(sf_dir: str) -> pa.Table:
    """QueryRescorer two-phase ranking (QueryRescorer.java:57-186): BM25
    disjunction top-40 first pass, rescored by a second TermQuery with
    combined = f32(first + weight * second), re-sorted, top-10:
    (rank, doc_id, score_r)."""
    from ..search.rescorer import query_rescore

    merged, _ = get_searchers(sf_dir)
    first = merged.search(
        Q.BooleanQuery.build(
            [(Q.SHOULD, Q.TermQuery(t)) for t in RESCORE_FIRST_TERMS]
        ),
        k=RESCORE_FIRST_K,
    )
    td = query_rescore(merged, first, Q.TermQuery(RESCORE_QUERY_TERM),
                       RESCORE_WEIGHT, RESCORE_TOP_N)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


def q_sort_rescored_topk(sf_dir: str) -> pa.Table:
    """SortRescorer (SortRescorer.java:42): the BM25 first-pass top-40
    re-sorted by the length doc-values field DESC (tie: docID), top-10,
    first-pass scores preserved: (rank, doc_id, dl, score_r)."""
    from ..search.rescorer import sort_rescore

    merged, _ = get_searchers(sf_dir)
    first = merged.search(
        Q.BooleanQuery.build(
            [(Q.SHOULD, Q.TermQuery(t)) for t in RESCORE_FIRST_TERMS]
        ),
        k=RESCORE_FIRST_K,
    )
    td, vals = sort_rescore(merged, first, "length", True, RESCORE_TOP_N)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "dl": pa.array([int(v) for v in vals], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


COVERING_TERMS = ("key", "hash", "table", "window")
COVERING_MIN_EXPR = "1 + length % 3"  # per-doc dynamic minimum (1..3)
COVERING_K = 15


def q_covering_topk(sf_dir: str) -> pa.Table:
    """sandbox CoveringQuery (CoveringQuery.java:42): four SHOULD term
    clauses, per-doc minimum match count = 1 + length%3 via the
    expressions-module LongValuesSource analogue; score = the matching
    clauses' double sum -> float32: (rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    query = Q.CoveringQuery(
        queries=tuple(Q.TermQuery(t) for t in COVERING_TERMS),
        min_expr=COVERING_MIN_EXPR,
    )
    td = merged.search(query, k=COVERING_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


FEATURE_TOPK_SPECS: list[tuple[str, str, float, float, float]] = [
    # (query_id, function, pivot, a, boost) over the score_hint column
    ("f_log", "log", 0.0, 1.0, 1.0),
    ("f_satu", "saturation", 100.0, 0.0, 2.0),
    ("f_sigm", "sigmoid", 100.0, 2.0, 1.0),
]
FEATURE_TOPK_K = 10


def q_feature_topk(sf_dir: str) -> pa.Table:
    """FeatureField static-feature ranking (FeatureField.java:229-400
    analogue): the sparse score_hint doc-values column scored by the
    log / saturation / sigmoid feature functions, norm-free, top-k:
    (query_id, rank, doc_id, score_r). NULL-feature docs never match
    (the feature term is absent from them)."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, fn, pivot, a, boost in FEATURE_TOPK_SPECS:
        query = Q.FeatureQuery("score_hint", function=fn, pivot=pivot,
                               a=a, boost=boost)
        td = merged.search(query, k=FEATURE_TOPK_K)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


FUNCTION_TOPK_TERMS = ("key", "table")
FUNCTION_TOPK_K = 10


def q_function_topk(sf_dir: str) -> pa.Table:
    """FunctionScoreQuery (FunctionScoreQuery.java:47 analogue): BM25
    disjunction boosted by log1p(doc length) from the doc-values column:
    (rank, doc_id, score_r). Uses the SEGMENT searcher (doc-values live on
    segment docmaps; the merged reader serves them identically)."""
    merged, _ = get_searchers(sf_dir)
    inner = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(t)) for t in FUNCTION_TOPK_TERMS]
    )
    query = Q.FunctionScoreQuery(inner, source_col="length", function="log1p",
                                 combine="multiply")
    td = merged.search(query, k=FUNCTION_TOPK_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


EXPR_TOPK_TERMS = ("table", "hash")
EXPR_TOPK_K = 10
# exercises the whole expression grammar: precedence, ternary, comparison,
# 1- and 2-arg functions, division — over _score and the length doc-values
EXPR_TOPK_EXPR = (
    "0.3*_score + ln(1 + length)*(_score > 1 ? 1.5 : 1.0)"
    " + sqrt(min(length, 64))/8"
)


def q_expr_topk(sf_dir: str) -> pa.Table:
    """ExpressionScoreQuery (the expressions-module surface,
    s84 expressions/js/JavascriptCompiler.java grammar): BM25 disjunction
    re-scored by a compiled arithmetic expression over _score and the
    length doc-values column: (rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    inner = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(t)) for t in EXPR_TOPK_TERMS]
    )
    query = Q.ExpressionScoreQuery(inner, expression=EXPR_TOPK_EXPR)
    td = merged.search(query, k=EXPR_TOPK_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


SCORING_VARIANT_TERMS = ("key", "hash")
SCORING_VARIANTS_K = 10


def q_scoring_variants(sf_dir: str) -> pa.Table:
    """Non-disjunction scoring operators (SynonymQuery, DisjunctionMax,
    boosted clauses, MUST+optional-SHOULD): (query_id, rank, doc_id,
    score_r), each reproduced exactly by oracles.scoring_variants_sql."""
    merged, _ = get_searchers(sf_dir)
    ta, tb = SCORING_VARIANT_TERMS
    cases = [
        (f"syn_{ta}_{tb}", Q.SynonymQuery(terms=(ta, tb))),
        (
            f"dismax_{ta}_{tb}",
            Q.DisjunctionMaxQuery(
                queries=(Q.TermQuery(ta), Q.TermQuery(tb)), tie_breaker=0.3
            ),
        ),
        (
            f"boost_{ta}2_{tb}",
            Q.BooleanQuery.build(
                [(Q.SHOULD, Q.TermQuery(ta, boost=2.0)), (Q.SHOULD, Q.TermQuery(tb))]
            ),
        ),
        (
            f"must_{ta}_opt_{tb}",
            Q.BooleanQuery.build(
                [(Q.MUST, Q.TermQuery(ta)), (Q.SHOULD, Q.TermQuery(tb))]
            ),
        ),
    ]
    qids, ranks, docs, scores = [], [], [], []
    for qid, query in cases:
        td = merged.search(query, k=SCORING_VARIANTS_K)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# similarity registry gate: the same 2-term disjunction scored under each
# non-default Similarity (IndexSearcher.setSimilarity role) — exact oracle.
SIMILARITY_TOPK_SPECS: list[tuple[str, str]] = [
    ("classic", "classic"),        # TFIDF (ClassicSimilarity.java:44-72)
    ("legacy", "bm25legacy"),      # 7.x BM25 (s75 BM25Similarity.java:257-294)
    ("lmd", "lmdirichlet"),        # LM Dirichlet mu=2000 (LMDirichletSimilarity)
    ("dfr", "dfr"),                # DFR G/B/H2 c=1 (DFRSimilarity)
    ("ib", "ib"),                  # IB LL/DF/H1 c=1 (IBSimilarity)
    ("dfi", "dfi"),                # DFI standardized (DFISimilarity)
    ("lmjm", "lmjelinekmercer(lambda=0.7)"),  # LM Jelinek-Mercer (long-query lambda)
    ("bool", "boolean"),           # BooleanSimilarity (score = query boost)
    ("axf1", "axiomaticf1exp"),    # Axiomatic F1EXP (AxiomaticF1EXP.java)
    ("axf2", "axiomaticf2exp"),    # Axiomatic F2EXP (AxiomaticF2EXP.java)
    ("axf3", "axiomaticf3log(queryLen=2)"),  # Axiomatic F3LOG, real query length
    # misc/SweetSpotSimilarity: plateau lengthNorm over the corpus's
    # 10-99 dl range + baselineTf — params mirrored in the SQL kernel
    ("sweet", "sweetspot(min=30,max=60,steepness=0.5,tf_base=1.5,tf_min=2)"),
]
SIMILARITY_TOPK_TERMS = ("key", "hash")
SIMILARITY_TOPK_K = 10


def q_parsed_topk_served(sf_dir: str) -> pa.Table:
    """The classic-parser query set scored by the actor-pool serving
    stage: each actor memory-maps the merged index once and compiles the
    query STRING itself (parse_classic against the actor's analyzer) —
    results must equal the driver-side parsed path and the same SQL
    oracle exactly: (query_id, rank, doc_id, score_r)."""
    from ..stages.serve import serve_parsed_queries

    index_dir = build_flagship_index(sf_dir)
    specs = [(qid, qstr, k) for qid, qstr, _kind, _cls, k in PARSED_TOPK_SPECS]
    t = serve_parsed_queries(index_dir, specs, concurrency=2)
    scores_r = [round_half_away(s, 4) for s in t["score"].to_pylist()]
    return pa.table(
        {
            "query_id": t["query_id"],
            "rank": t["rank"],
            "doc_id": t["doc_id"],
            "score_r": pa.array(scores_r, pa.float64()),
        }
    )


def q_similarity_topk(sf_dir: str) -> pa.Table:
    """Similarity-registry variants over one 2-term SHOULD disjunction:
    (query_id, rank, doc_id, score_r). Each spec opens a searcher with
    get_similarity(spec) — ClassicSimilarity (TFIDF) and the 7.x BM25
    ((k1+1) numerator) — and must reproduce oracles.similarity_topk_sql
    float32-exactly."""
    from ..functions.bm25 import get_similarity
    from ..search.merged import MergedIndexSearcher

    index_dir = build_flagship_index(sf_dir)
    ta, tb = SIMILARITY_TOPK_TERMS
    query = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(ta)), (Q.SHOULD, Q.TermQuery(tb))]
    )
    qids, ranks, docs, scores = [], [], [], []
    for qid, spec in SIMILARITY_TOPK_SPECS:
        searcher = MergedIndexSearcher(index_dir, bm25=get_similarity(spec))
        td = searcher.search(query, k=SIMILARITY_TOPK_K)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# CommonTermsQuery gate: (query_id, terms, high_occur, low_occur,
# max_term_frequency, low_mns, high_mns, k). The 31-word Zipf corpus puts
# every common term at df/N ~ 0.75-0.8 and "dup" at ~0.05, so mtf=0.5
# splits them; ct_abs30 exercises the absolute (>=1) threshold branch and
# ct_all_high the empty-low-group conjunction guard.
COMMONTERMS_SPECS: list[tuple[str, list[str], str, str, float, float, float, int]] = [
    ("ct_should", ["the", "table", "dup"], Q.SHOULD, Q.SHOULD, 0.5, 0.0, 0.0, 10),
    ("ct_low_must", ["the", "dup", "key"], Q.SHOULD, Q.MUST, 0.5, 0.0, 0.0, 10),
    ("ct_high_mns", ["the", "table", "key", "dup"], Q.SHOULD, Q.SHOULD, 0.5, 0.0, 0.5, 10),
    ("ct_all_high", ["the", "table"], Q.SHOULD, Q.SHOULD, 0.5, 0.0, 0.0, 10),
    ("ct_abs30", ["table", "dup"], Q.SHOULD, Q.SHOULD, 30.0, 0.0, 0.0, 10),
    ("ct_high_must", ["the", "key", "dup"], Q.MUST, Q.SHOULD, 0.5, 0.0, 0.0, 10),
]


def q_commonterms_topk(sf_dir: str) -> pa.Table:
    """CommonTermsQuery top-k (df-split high/low frequency groups,
    CommonTermsQuery.java:61): (query_id, rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, ho, lo, mtf, lmns, hmns, k in COMMONTERMS_SPECS:
        q = Q.CommonTermsQuery(
            terms=tuple(terms), high_freq_occur=ho, low_freq_occur=lo,
            max_term_frequency=mtf, low_freq_min_should_match=lmns,
            high_freq_min_should_match=hmns,
        )
        td = merged.search(q, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# BlendedTermQuery gate: (query_id, members [(field, term)], boosts,
# rewrite_method, tie_breaker, k). bl_cross* blend the SAME term across
# body and title (the cross-field use the class exists for: one artificial
# df = max over both fields' df feeds both leaves); bl_dismax/bl_bool
# blend two body terms with very different df so the blended idf visibly
# differs from the per-term idf; bl_boost exercises the member boost fold.
BLENDED_SPECS: list[
    tuple[str, list[tuple[str, str]], tuple[float, ...], str, float, int]
] = [
    ("bl_dismax", [("", "the"), ("", "dup")], (), "dismax", 0.01, 10),
    ("bl_bool", [("", "table"), ("", "dup")], (), "boolean", 0.0, 10),
    ("bl_boost", [("", "key"), ("", "dup")], (2.0, 1.0), "dismax", 0.1, 10),
    ("bl_cross", [("", "table"), ("title", "table")], (), "dismax", 0.01, 10),
    ("bl_cross_bool", [("", "key"), ("title", "key")], (), "boolean", 0.0, 10),
]


def q_blended_topk(sf_dir: str) -> pa.Table:
    """BlendedTermQuery top-k (cross-field blended term statistics,
    BlendedTermQuery.java:49): (query_id, rank, doc_id, score_r). Each
    member scores its own field's postings/norms with ONE artificial
    docFreq = max over members (totalTermFreq = sum), combined dismax
    (tie_breaker) or SHOULD-boolean per the rewrite method."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, members, boosts, method, tie, k in BLENDED_SPECS:
        q = Q.BlendedTermQuery(
            terms=tuple(members), boosts=boosts,
            rewrite_method=method, tie_breaker=tie,
        )
        td = merged.search(q, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def q_similarity_topk_served(sf_dir: str) -> pa.Table:
    """The similarity-registry query set scored by the actor-pool serving
    stage (setSimilarity at the actor): each actor binds a cached searcher
    per requested Similarity spec over its one mmapped index — results
    must equal the driver-side q_similarity_topk path and the same SQL
    oracle exactly: (query_id, rank, doc_id, score_r)."""
    from ..stages.serve import serve_similarity_queries

    index_dir = build_flagship_index(sf_dir)
    ta, tb = SIMILARITY_TOPK_TERMS
    specs = [
        (qid, [ta, tb], SIMILARITY_TOPK_K, sim)
        for qid, sim in SIMILARITY_TOPK_SPECS
    ]
    t = serve_similarity_queries(index_dir, specs, concurrency=2)
    scores_r = [round_half_away(s, 4) for s in t["score"].to_pylist()]
    return pa.table(
        {
            "query_id": t["query_id"],
            "rank": t["rank"],
            "doc_id": t["doc_id"],
            "score_r": pa.array(scores_r, pa.float64()),
        }
    )


def q_bm25_topk_served(sf_dir: str) -> pa.Table:
    """Same reference query set, but scored by the actor-pool serving stage
    (stages/serve.py): each actor memory-maps the merged index once and
    batches of queries stream through — results must equal the driver-side
    searcher path (and the SQL oracle) exactly."""
    from ..stages.serve import serve_queries

    index_dir = build_flagship_index(sf_dir)
    specs = [(qid, terms, k) for qid, terms, k, off in BM25_QUERY_SPECS if off == 0]
    t = serve_queries(index_dir, specs, concurrency=2)
    scores_r = [round_half_away(s, 4) for s in t["score"].to_pylist()]
    return pa.table(
        {
            "query_id": t["query_id"],
            "rank": t["rank"],
            "doc_id": t["doc_id"],
            "score_r": pa.array(scores_r, pa.float64()),
        }
    )


def q_boolean_counts(sf_dir: str) -> pa.Table:
    """Boolean-query match counts: (query_id, n)."""
    merged, _ = get_searchers(sf_dir)
    qids, ns = [], []
    for qid, musts, shoulds, must_nots, msm in BOOLEAN_COUNT_SPECS:
        clauses = [(Q.MUST, Q.TermQuery(t)) for t in musts]
        clauses += [(Q.SHOULD, Q.TermQuery(t)) for t in shoulds]
        clauses += [(Q.MUST_NOT, Q.TermQuery(t)) for t in must_nots]
        query = Q.BooleanQuery.build(clauses, min_should_match=msm)
        qids.append(qid)
        ns.append(merged.count(query))
    return pa.table({"query_id": pa.array(qids, pa.string()), "n": pa.array(ns, pa.int64())})


def q_term_stats(sf_dir: str) -> pa.Table:
    """Merged-index term dictionary: (term, doc_freq, total_term_freq)."""
    merged, _ = get_searchers(sf_dir)
    terms = [str(t) for t in merged.term_dict_union()]
    dfs, ttfs = [], []
    for t in terms:
        stats = merged.collection_stats({t})
        dfs.append(stats.term_df[t])
        ttfs.append(stats.term_ttf[t])
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "doc_freq": pa.array(dfs, pa.int64()),
            "total_term_freq": pa.array(ttfs, pa.int64()),
        }
    )


def q_postings(sf_dir: str) -> pa.Table:
    """Decoded merged posting lists for head/torso/tail terms:
    (term, doc_id, freq) — round-trips the whole tokenize -> invert ->
    block-encode -> shuffle-merge -> decode chain."""
    merged, _ = get_searchers(sf_dir)
    out_t, out_d, out_f = [], [], []
    for term in POSTINGS_TERMS:
        for r in merged.readers:  # MergedReader: doc_base=0, global docIDs
            tp = r.term_postings(term)
            if tp is None:
                continue
            docs, freqs = tp.decode()
            for d, f in zip(docs + r.doc_base, freqs):
                out_t.append(term)
                out_d.append(int(d))
                out_f.append(int(f))
    return pa.table(
        {
            "term": pa.array(out_t, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "freq": pa.array(out_f, pa.int64()),
        }
    )


def q_doc_lengths(sf_dir: str) -> pa.Table:
    """(doc_id, dl, norm_len): analyzer token count + the SmallFloat-decoded
    length actually stored in the segment norms (.nvd analogue)."""
    _, seg = get_searchers(sf_dir)
    doc_ids, dls, nlens = [], [], []
    for r in seg.readers:
        dm = r.docmap()
        ids = _doc_ids_from_urls(dm["url"].to_pylist())
        exact_lens = dm["length"].to_pylist()  # analyzer token count per doc
        lens_from_norms = BYTE4_DECODE_TABLE[r.norms]
        for local, gid in enumerate(ids):
            doc_ids.append(gid)
            dls.append(int(exact_lens[local]))
            nlens.append(int(lens_from_norms[local]))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
            "norm_len": pa.array(nlens, pa.int64()),
        }
    )


def q_field_exists_match(sf_dir: str) -> pa.Table:
    """FieldExists matches: (kind, doc_id) — round-2 VERDICT item #6.

    dv_exists_score_hint: DocValuesFieldExistsQuery over the nullable
    score_hint stored column (validity bitmap IS the doc set,
    s84 search/DocValuesFieldExistsQuery.java:125); SQL mirror is the
    IS NOT NULL predicate. dv_exists_lang: the all-valid path.
    norms_exists_title: NormsFieldExistsQuery over the title field's
    norms (s84 search/NormsFieldExistsQuery.java:94)."""
    _, seg = get_searchers(sf_dir)
    specs: list[tuple[str, Q.Query]] = [
        ("dv_exists_score_hint", Q.DocValuesFieldExistsQuery("score_hint")),
        ("dv_exists_lang", Q.DocValuesFieldExistsQuery("lang")),
        ("norms_exists_title", Q.NormsFieldExistsQuery("title")),
    ]
    from ..search.scorers import eval_query

    kinds, docs = [], []
    for kind, query in specs:
        stats = seg.collection_stats(Q.collect_field_terms(query))
        for r in seg.readers:
            d, _s = eval_query(r, query, stats, seg.bm25)
            for gd in d + r.doc_base:
                kinds.append(kind)
                docs.append(int(gd))
    return pa.table({"kind": pa.array(kinds, pa.string()), "doc_id": pa.array(docs, pa.int64())})


def q_multiterm_match(sf_dir: str) -> pa.Table:
    """Prefix / wildcard / fuzzy / range matches: (kind, doc_id)."""
    merged, _ = get_searchers(sf_dir)
    specs: list[tuple[str, Q.Query]] = [
        ("prefix_ta", Q.PrefixQuery("ta")),
        ("wildcard_s_w", Q.WildcardQuery("s*w")),
        ("fuzzy_tabel_1", Q.FuzzyQuery("tabel", max_edits=1)),
        ("range_q_to_t", Q.TermRangeQuery("q", "t")),
        ("regexp_av", Q.RegexpQuery("[av].*e")),
        ("inset_3", Q.TermInSetQuery(("table", "key", "zzznosuch"))),
    ]
    kinds, docs = [], []
    for kind, query in specs:
        rewritten = Q.rewrite(query, merged.term_dict_union())
        stats = merged.collection_stats(Q.collect_terms(rewritten))
        from ..search.scorers import eval_query

        for r in merged.readers:
            d, _s = eval_query(r, rewritten, stats, merged.bm25)
            for gd in d + r.doc_base:
                kinds.append(kind)
                docs.append(int(gd))
    return pa.table({"kind": pa.array(kinds, pa.string()), "doc_id": pa.array(docs, pa.int64())})


def _matched_rows_dataset(
    sf_dir: str,
    terms: list[str],
    per_seg_topk_per_lang: int = 0,
    with_length: bool = False,
    with_path: bool = False,
    with_tags: bool = False,
):
    """Distributed matched-docs relation: one Ray task per SEGMENT evaluates
    the SHOULD-disjunction where the segment lives and emits (doc_id, lang,
    score) for ITS matches only — the docmap join happens segment-locally,
    so only matched rows (or per-lang top-k partials) enter any shuffle.

    Global collection stats are gathered once on the driver (tiny dicts)
    and broadcast via ray.put — the IndexSearcher.createWeight split: stats
    global, scoring per-leaf (facet/GroupingSearch collector semantics,
    s84 facet/.../SortedSetDocValuesFacetCounts.java:68,
    grouping/GroupingSearch.java:43)."""
    import ray
    import ray.data as rd

    from ..functions.bm25 import BM25
    from ..search.scorers import CollectionStats, eval_query
    from ..state.segment import SegmentReader

    from ..state.livedocs import load_tombstones

    index_dir = build_flagship_index(sf_dir)
    _, seg = get_searchers(sf_dir)
    stats = seg.collection_stats({(("", t)) for t in terms})
    # tombstones ride the broadcast so the per-segment match tasks apply
    # the live-docs filter exactly like merged.search does (the .liv mask)
    stats_ref = ray.put(
        (stats.doc_count, stats.sum_total_term_freq, stats.term_df, stats.term_ttf,
         load_tombstones(index_dir))
    )
    seg_dirs = [
        {"seg_dir": os.path.join(index_dir, "segments", s["seg_name"]),
         "doc_base": int(s["doc_base"])}
        for s in seg.manifest.segments
    ]

    def run(batch: pa.Table) -> pa.Table:
        dc, sttf, tdf, tttf, tombs = ray.get(stats_ref)
        st = CollectionStats(dc, sttf, tdf, tttf)
        bm25 = BM25()
        query = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms])
        out = []
        for row in batch.to_pylist():
            r = SegmentReader(row["seg_dir"])
            docs, scores = eval_query(r, query, st, bm25)
            if len(docs) and len(tombs):
                # drop deleted docs (sorted-array membership on global ids)
                gids_all = docs + row["doc_base"]
                idx = np.searchsorted(tombs, gids_all)
                idx = np.minimum(idx, len(tombs) - 1)
                live = tombs[idx] != gids_all
                docs, scores = docs[live], scores[live]
            if len(docs) == 0:
                continue
            dm = r.docmap()
            idx = pa.array(docs)
            urls = dm["url"].take(idx).to_pylist()
            langs = np.asarray(dm["lang"].take(idx).to_pylist(), dtype=object)
            gids = np.asarray(_doc_ids_from_urls(urls), dtype=np.int64)
            dls = (
                dm["length"].take(idx).to_numpy(zero_copy_only=False).astype(np.int64)
                if with_length
                else None
            )
            paths = (
                np.asarray(dm["facet_path"].take(idx).to_pylist(), dtype=object)
                if with_path
                else None
            )
            tags = dm["tags"].take(idx) if with_tags else None
            if per_seg_topk_per_lang:
                # per-segment per-lang partial top-k (combiner): the final
                # per-lang reduce only ever sees n_segments * k rows per lang
                keep_idx = []
                for lang in np.unique(langs):
                    li = np.flatnonzero(langs == lang)
                    order = np.lexsort((gids[li], -scores[li].astype(np.float64)))
                    keep_idx.append(li[order[:per_seg_topk_per_lang]])
                sel = np.concatenate(keep_idx)
                gids, langs, scores = gids[sel], langs[sel], scores[sel]
                if dls is not None:
                    dls = dls[sel]
                if paths is not None:
                    paths = paths[sel]
                if tags is not None:
                    tags = tags.take(pa.array(sel))
            cols = {
                "doc_id": pa.array(gids),
                "lang": pa.array(langs, pa.string()),
                "score": pa.array(scores.astype(np.float32)),
            }
            if dls is not None:
                cols["dl"] = pa.array(dls, pa.int64())
            if paths is not None:
                cols["path"] = pa.array(paths, pa.string())
            if tags is not None:
                cols["tags"] = tags
            out.append(pa.table(cols))
        if not out:
            empty = {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "score": pa.array([], pa.float32()),
            }
            if with_length:
                empty["dl"] = pa.array([], pa.int64())
            if with_path:
                empty["path"] = pa.array([], pa.string())
            if with_tags:
                empty["tags"] = pa.array([], pa.list_(pa.string()))
            return pa.table(empty)
        return pa.concat_tables(out)

    return rd.from_items(seg_dirs, override_num_blocks=len(seg_dirs)).map_batches(
        run, batch_size=1, batch_format="pyarrow"
    )


def q_facet_assoc(sf_dir: str) -> pa.Table:
    """Association facets (TaxonomyFacetSumIntAssociations, s84 facet/src/
    java/org/apache/lucene/facet/taxonomy/TaxonomyFacetSumIntAssociations.
    java:33): per taxonomy path, the SUM of each matching doc\'s int
    association value — here the ``length`` doc-values column — over docs
    matching FACET_TERM. The rollup is a Ray Data groupby-sum over the
    matched-rows Dataset (facet counts never pass through a driver dict)."""
    from ray.data.aggregate import Sum

    rows = (
        _matched_rows_dataset(sf_dir, [FACET_TERM], with_length=True,
                              with_path=True)
        .groupby("path")
        .aggregate(Sum(on="dl", alias_name="total"))
        .take_all()
    )
    rows.sort(key=lambda r: r["path"])
    return pa.table(
        {
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "total": pa.array([int(r["total"]) for r in rows], pa.int64()),
        }
    )


def q_facet_lang(sf_dir: str) -> pa.Table:
    """Facet counts (SSDV-facet analogue): lang histogram of docs matching
    the facet term — matched rows stay a Dataset; the histogram is a Ray
    Data groupby(lang).count(), not a driver dict."""
    from ray.data.aggregate import Count

    rows = (
        _matched_rows_dataset(sf_dir, [FACET_TERM])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: r["lang"])
    return pa.table(
        {
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        }
    )


def q_facet_length_ranges(sf_dir: str) -> pa.Table:
    """Numeric range facet (LongRangeFacetCounts / LongValueFacetCounts
    role, s84 facet/.../LongValueFacetCounts.java:51): histogram of doc
    LENGTH buckets over docs matching the facet term. The length is the
    ``length`` doc-values column of each segment's docmap — bucketization
    is a vectorized searchsorted inside map_batches; the count is a Ray
    Data groupby, never a driver dict."""
    from ray.data.aggregate import Count

    edges = np.asarray(FACET_RANGE_EDGES, dtype=np.int64)
    labels = np.asarray(FACET_RANGE_LABELS, dtype=object)

    def bucketize(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy()
        idx = np.searchsorted(edges, dl, side="right")
        return pa.table({"bucket": pa.array(labels[idx], pa.string())})

    rows = (
        _matched_rows_dataset(sf_dir, [FACET_TERM], with_length=True)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: r["bucket"])
    return pa.table(
        {
            "bucket": pa.array([r["bucket"] for r in rows], pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        }
    )


DRILLDOWN_PATH = "src1"  # level-1 taxonomy node (subtree = all its langs)
DRILLDOWN_K = 10

# multi-valued (SORTED_SET) doc-values gates over the tags column
TAGS_FILTER_TERMS = ("window", "batch")
TAGS_FILTER_VALUE = "len_30_59"  # the mid length-bucket tag
TAGS_FILTER_K = 10


def q_facet_tags(sf_dir: str) -> pa.Table:
    """SORTED_SET doc-values facet counts (SortedSetDocValuesFacetCounts,
    s84 facet/.../sortedset/SortedSetDocValuesFacetCounts.java:68): docs
    matching the facet term counted once per DISTINCT value of their
    multi-valued ``tags`` column. The list column rides the matched-rows
    Dataset; flattening is one vectorized map_batches; the count is a Ray
    groupby: (tag, n)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        lst = batch["tags"].combine_chunks()
        return pa.table({"tag": pc.list_flatten(lst)})

    rows = (
        _matched_rows_dataset(sf_dir, [FACET_TERM], with_tags=True)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("tag")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: r["tag"])
    return pa.table(
        {
            "tag": pa.array([r["tag"] for r in rows], pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        }
    )


def q_bm25_tags_filtered(sf_dir: str) -> pa.Table:
    """BM25 disjunction restricted by multi-valued set membership: the
    ``tags`` SORTED_SET column evaluated as a per-segment
    SortedSetDocValuesQuery FILTER clause: (rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    query = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(t)) for t in TAGS_FILTER_TERMS]
        + [(Q.FILTER, Q.SortedSetDocValuesQuery("tags", TAGS_FILTER_VALUE))]
    )
    td = merged.search(query, k=TAGS_FILTER_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


def q_facet_taxonomy(sf_dir: str) -> pa.Table:
    """Hierarchical taxonomy facet counts (FastTaxonomyFacetCounts role,
    s84 facet/.../taxonomy/FastTaxonomyFacetCounts.java:41; demo
    LuceneDemo9.1.0 StringValuesFacetCount.java): docs matching the facet
    term counted at EVERY prefix level of their ``facet_path`` doc-values
    column ("source/lang" -> one count row for "source" and one for
    "source/lang"). The prefix explosion is a vectorized map_batches over
    the matched-rows Dataset; the rollup is a Ray Data groupby — counts
    never aggregate on the driver: (path, n)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def explode_prefixes(batch: pa.Table) -> pa.Table:
        full = batch["path"]
        # level-1 prefix = text before the first '/'
        lvl1 = pc.list_element(pc.split_pattern(full, "/", max_splits=1), 0)
        return pa.table({"path": pa.concat_arrays(
            [lvl1.combine_chunks().cast(pa.string()), full.combine_chunks()]
        )})

    rows = (
        _matched_rows_dataset(sf_dir, [FACET_TERM], with_path=True)
        .map_batches(explode_prefixes, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: r["path"])
    return pa.table(
        {
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        }
    )


def q_facet_drilldown(sf_dir: str) -> pa.Table:
    """DrillDownQuery (facet/DrillDownQuery.java:42): the facet-term BM25
    query restricted to one taxonomy subtree — the dimension clause is a
    per-segment StringDocValuesPrefixQuery FILTER (path == node or under
    "node/"), so drilling into the level-1 node keeps every leaf below it:
    (rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    query = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(FACET_TERM)),
         (Q.FILTER, Q.StringDocValuesPrefixQuery("facet_path", DRILLDOWN_PATH))]
    )
    td = merged.search(query, k=DRILLDOWN_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


# scored query-time join (JoinUtil.createJoinQuery, s84
# join/JoinUtil.java:90,131,414): from-side query scores aggregated per
# join value, to-side docs filtered to collected values and scored with
# their key's aggregate.
JOIN_FROM_TERM = "key"
JOIN_TOPK_K = 10
JOIN_SCORE_MODES = ("total", "max", "avg", "none")


def q_facet_drillsideways(sf_dir: str) -> pa.Table:
    """DrillSideways (facet/DrillSideways.java:63): drilling down on one
    dimension (taxonomy node DRILLDOWN_PATH of the ``path`` dim) returns,
    in one pass, (a) facet counts for the DRILLED dim computed with its
    own filter EXCLUDED — the level-1 taxonomy histogram over ALL docs
    matching the base query — and (b) facet counts of the OTHER dim
    (lang) over the fully drilled-down doc set.

    Single streaming pass (the DrillSidewaysScorer one-collector model):
    the matched-rows Dataset carries path + lang; one map_batches emits
    ("path", level-1 node) rows for every match and ("lang", value) rows
    only for matches inside the drilled subtree; one Ray groupby counts:
    (dim, value, n)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def emit(batch: pa.Table) -> pa.Table:
        full = batch["path"].combine_chunks()
        lvl1 = pc.list_element(
            pc.split_pattern(full, "/", max_splits=1), 0
        ).cast(pa.string())
        in_drill = pc.equal(lvl1, DRILLDOWN_PATH)
        langs = batch["lang"].combine_chunks().filter(in_drill)
        dims = pa.concat_arrays(
            [
                pa.array(["path"] * len(lvl1), pa.string()),
                pa.array(["lang"] * len(langs), pa.string()),
            ]
        )
        vals = pa.concat_arrays([lvl1, langs.combine_chunks()
                                 if isinstance(langs, pa.ChunkedArray) else langs])
        return pa.table({"dim": dims, "value": vals})

    rows = (
        _matched_rows_dataset(sf_dir, [FACET_TERM], with_path=True)
        .map_batches(emit, batch_format="pyarrow")
        .groupby(["dim", "value"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: (r["dim"], r["value"]))
    return pa.table(
        {
            "dim": pa.array([r["dim"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        }
    )


def q_join_topk(sf_dir: str) -> pa.Table:
    """Scored query-time join: from-side = docs matching JOIN_FROM_TERM,
    join key = the level-1 taxonomy node (source) of each doc, to-side =
    EVERY doc under a collected key, scored with the key's aggregate under
    each ScoreMode (Total/Max/Avg/None — TermsWithScoreCollector.java:
    float32 `scoreSums[ord] += scorer.score()` in global doc order; avg
    divides the float sum by the int count once at the end; None scores a
    constant 1).

    Distribution: from-side matches come from the per-segment
    matched-rows Dataset (scores computed where segments live); the
    per-key fold is a hash-partitioned groupby(key).map_groups — the
    float32 sequential fold happens inside the key's group, ordered by
    doc_id exactly like the single-threaded Lucene collector; the
    aggregate table (one row per distinct join value) is tiny and
    broadcast via ray.put; the to-side pass attaches scores and keeps a
    per-batch partial top-k, so the driver reduce sees only
    blocks x k rows: (query_id, rank, doc_id, score_r)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from .common import sized_read

    def fold_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group["doc_id"])
        s = group["score"].take(order).to_numpy().astype(np.float32, copy=False)
        total = np.float32(0.0)
        for v in s:  # the literal float32 += of TermsWithScoreCollector
            total = np.float32(total + np.float32(v))
        return pa.table(
            {
                "key": group["path"].slice(0, 1).cast(pa.string()),
                "total": pa.array([float(total)], pa.float32()),
                "max": pa.array([float(s.max())], pa.float32()),
                "avg": pa.array([float(np.float32(total / np.float32(len(s))))],
                                 pa.float32()),
            }
        )

    def lvl1(batch: pa.Table) -> pa.Table:
        key = pc.list_element(pc.split_pattern(batch["path"], "/", max_splits=1), 0)
        return pa.table(
            {"doc_id": batch["doc_id"], "score": batch["score"],
             "path": key.cast(pa.string())}
        )

    agg_rows = (
        _matched_rows_dataset(sf_dir, [JOIN_FROM_TERM], with_path=True)
        .map_batches(lvl1, batch_format="pyarrow")
        .groupby("path")
        .map_groups(fold_group, batch_format="pyarrow")
        .take_all()  # one row per distinct join value — tiny by nature
    )
    agg = {r["key"]: r for r in agg_rows}
    agg_ref = ray.put(agg)

    def to_side(batch: pa.Table) -> pa.Table:
        a = ray.get(agg_ref)
        keys = np.asarray(batch["source"].to_pylist(), dtype=object)
        doc_ids = batch["doc_id"].to_numpy()
        hit = np.array([k in a for k in keys], dtype=bool)
        doc_ids, keys = doc_ids[hit], keys[hit]
        out = []
        for mode in JOIN_SCORE_MODES:
            scores = (
                np.ones(len(keys), dtype=np.float32)
                if mode == "none"
                else np.array([a[k][mode] for k in keys], dtype=np.float32)
            )
            # per-batch partial top-k combiner (score desc, doc_id asc)
            order = np.lexsort((doc_ids, -scores.astype(np.float64)))
            sel = order[:JOIN_TOPK_K]
            out.append(pa.table(
                {"query_id": pa.array([f"join_{mode}"] * len(sel), pa.string()),
                 "doc_id": pa.array(doc_ids[sel], pa.int64()),
                 "score": pa.array(scores[sel], pa.float32())}
            ))
        return pa.concat_tables(out)

    parts = (
        sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
        .map_batches(to_side, batch_format="pyarrow")
        .take_all()  # blocks x modes x k partial rows only
    )
    qids, ranks, docs, scores = [], [], [], []
    for mode in JOIN_SCORE_MODES:
        qid = f"join_{mode}"
        rows = [r for r in parts if r["query_id"] == qid]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        for rank, r in enumerate(rows[:JOIN_TOPK_K], start=1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(r["doc_id"]))
            scores.append(round_half_away(float(np.float32(r["score"])), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def q_grouped_topk(sf_dir: str) -> pa.Table:
    """Grouped top-k (GroupingSearch analogue): per-lang top-n docs by BM25
    for the flagship disjunction — per-segment per-lang partial top-k
    inside the match tasks, final reduce via groupby(lang).map_groups."""

    def lang_topk(group: pa.Table) -> pa.Table:
        scores = group["score"].to_numpy()
        gids = group["doc_id"].to_numpy()
        order = np.lexsort((gids, -scores.astype(np.float64)))[:GROUPED_TOPK_PER_GROUP]
        return pa.table(
            {
                "lang": group["lang"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": pa.array(gids[order]),
                "score": pa.array(scores[order]),
            }
        )

    parts = (
        _matched_rows_dataset(
            sf_dir, list(GROUPED_TOPK_TERMS), per_seg_topk_per_lang=GROUPED_TOPK_PER_GROUP
        )
        .groupby("lang")
        .map_groups(lang_topk, batch_format="pyarrow")
        .take_all()
    )
    parts.sort(key=lambda r: (r["lang"], r["rank"]))
    return pa.table(
        {
            "lang": pa.array([r["lang"] for r in parts], pa.string()),
            "rank": pa.array([int(r["rank"]) for r in parts], pa.int64()),
            "doc_id": pa.array([int(r["doc_id"]) for r in parts], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(r["score"]), 4) for r in parts], pa.float64()
            ),
        }
    )


DV_UPDATE_RANGE = (50, 150)   # inclusive range-count window
DV_UPDATE_FILTER_LO = 100     # topk FILTER lower bound
DV_UPDATE_TERM = "table"
DV_UPDATE_K = 10


def q_dv_update(sf_dir: str) -> pa.Table:
    """Numeric doc-values updates (IndexWriter.updateNumericDocValue,
    s84 index/DocValuesUpdate.java:36): hardlink-copy the flagship index,
    patch score_hint for every doc_id %% 5 == 0 to (doc_id*3+7) %% 250
    (overriding values AND filling previously-missing ones), reopen, and
    serve three DV read paths through the patched reader: a pruned range
    count, a field-exists count (validity patch), and a BM25 top-k with a
    DV-range FILTER clause. Rows: (kind, rank, doc_id, val_r)."""
    import shutil

    from ..state.dvupdates import DV_UPDATES_FILE, update_numeric_doc_values

    base = build_flagship_index(sf_dir)
    root = _variant_cache_dir(sf_dir, "dvup")
    index_dir = os.path.join(root, "index")
    if not os.path.exists(os.path.join(index_dir, DV_UPDATES_FILE)):
        if os.path.exists(index_dir):
            shutil.rmtree(index_dir)
        os.makedirs(root, exist_ok=True)
        shutil.copytree(base, index_dir, copy_function=os.link)
        _, seg_s = get_searchers(sf_dir)
        update_numeric_doc_values(
            index_dir, "score_hint",
            {d: (d * 3 + 7) % 250 for d in range(0, seg_s.doc_count, 5)},
        )
    key = "dvup:" + os.path.abspath(sf_dir)
    if key not in _SEARCHERS:
        s = open_searcher(index_dir)
        _SEARCHERS[key] = (s, s)
    merged = _SEARCHERS[key][0]

    lo, hi = DV_UPDATE_RANGE
    td_range = merged.search(
        Q.BooleanQuery.build(
            [(Q.FILTER, Q.NumericRangeQuery("score_hint", lo, hi))]
        ),
        k=1, total_hits_threshold=1 << 30,
    )
    td_exists = merged.search(
        Q.BooleanQuery.build(
            [(Q.FILTER, Q.DocValuesFieldExistsQuery("score_hint"))]
        ),
        k=1, total_hits_threshold=1 << 30,
    )
    td_top = merged.search(
        Q.BooleanQuery.build(
            [(Q.SHOULD, Q.TermQuery(DV_UPDATE_TERM)),
             (Q.FILTER, Q.NumericRangeQuery("score_hint", DV_UPDATE_FILTER_LO, None))]
        ),
        k=DV_UPDATE_K,
    )
    kinds = ["range_count", "exists_count"]
    ranks = [0, 0]
    docs = [0, 0]
    vals = [float(td_range.total_hits), float(td_exists.total_hits)]
    for r, (d, s) in enumerate(zip(td_top.doc_ids, td_top.scores), start=1):
        kinds.append("topk")
        ranks.append(r)
        docs.append(int(d))
        vals.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "val_r": pa.array(vals, pa.float64()),
        }
    )


# ComplexPhraseQueryParser gate specs: (query_id, quoted phrase, k) —
# wildcard slots (ha*, s*, h?sh), a fuzzy slot (kei~1), and an
# empty-expansion phrase (zz* -> MatchNoDocs)
COMPLEXPHRASE_SPECS: list[tuple[str, str, int]] = [
    ("cp_key_hastar", '"key ha*"', 10),
    ("cp_sstar_merge", '"s* merge"', 10),
    ("cp_fuzzy_kei", '"kei~1 hash"', 10),
    ("cp_qmark", '"h?sh table"', 10),
    ("cp_nohit", '"zz* hash"', 5),
]


def q_complexphrase_topk(sf_dir: str) -> pa.Table:
    """ComplexPhraseQueryParser gate (ComplexPhraseQueryParser.java:66):
    each spec's quoted phrase parses against the merged dictionary into a
    MultiPhraseQuery (wildcard/fuzzy slots expand at parse time) and runs
    through the standard search path: (query_id, rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    tdict = merged.term_dict_union()
    qids, ranks, docs, scores = [], [], [], []
    for qid, phrase, k in COMPLEXPHRASE_SPECS:
        q = Q.parse_complex_phrase(phrase, tdict)
        td = merged.search(q, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# WordBreakSpellChecker gate specs — breaks: out-of-dictionary compounds
# (wb_bigdatascan / wb_sortmergejoin only resolve via the 2-change
# recursion); combines: adjacent query-word runs whose concat is a
# dictionary word
WORDBREAK_BREAK_SPECS: list[tuple[str, str, int]] = [
    ("wb_keyhash", "keyhash", 5),
    ("wb_thetable", "thetable", 5),
    ("wb_bigdatascan", "bigdatascan", 5),
    ("wb_sortmergejoin", "sortmergejoin", 8),
    ("wb_nohit", "zzqq", 3),
]
WORDBREAK_COMBINE_SPECS: list[tuple[str, str, int]] = [
    ("cb_table", "tab le", 3),
    ("cb_window", "wind ow", 3),
    ("cb_nohit", "foo bar", 3),
]


def q_wordbreak(sf_dir: str) -> pa.Table:
    """WordBreakSpellChecker gate (WordBreakSpellChecker.java:45-230):
    break suggestions (max_changes=2, NUM_CHANGES_THEN_SUMMED_FREQUENCY)
    and two-word combine suggestions over the merged dictionary:
    (query_id, kind, rank, suggestion, changes, freq_sum)."""
    from ..search.suggest import WordBreakSpellChecker

    merged, _ = get_searchers(sf_dir)
    wb = WordBreakSpellChecker(merged, max_changes=2)
    qids, kinds, ranks, sugs, chgs, fsums = [], [], [], [], [], []
    for qid, text, n in WORDBREAK_BREAK_SPECS:
        for r, s in enumerate(wb.suggest_word_breaks(text, n), start=1):
            qids.append(qid)
            kinds.append("break")
            ranks.append(r)
            sugs.append(" ".join(s.words))
            chgs.append(s.changes)
            fsums.append(s.freq_sum)
    for qid, text, n in WORDBREAK_COMBINE_SPECS:
        for r, s in enumerate(
            wb.suggest_word_combinations(text.split(" "), n), start=1
        ):
            qids.append(qid)
            kinds.append("combine")
            ranks.append(r)
            sugs.append(s.words[0])
            chgs.append(s.changes)
            fsums.append(s.freq_sum)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "suggestion": pa.array(sugs, pa.string()),
            "changes": pa.array(chgs, pa.int64()),
            "freq_sum": pa.array(fsums, pa.int64()),
        }
    )


def q_diversified_topk(sf_dir: str) -> pa.Table:
    """Diversified top-k (DiversifiedTopDocsCollector.java:48): global BM25
    top-k for the disjunction with at most MAX_PER_KEY hits per lang key.
    Per-segment per-lang top-MAX_PER_KEY partials (any doc in the global
    diversified set is in its key's global top MAX_PER_KEY, which is in
    the union of per-segment per-key tops), groupby(lang) combine, then
    the greedy (score desc, docID) driver selection over keys*MAX rows."""
    from ..search.topk import diversified_top_k

    def lang_top(group: pa.Table) -> pa.Table:
        scores = group["score"].to_numpy()
        gids = group["doc_id"].to_numpy()
        order = np.lexsort((gids, -scores.astype(np.float64)))
        return group.take(pa.array(order[:DIVERSIFIED_MAX_PER_KEY]))

    parts = (
        _matched_rows_dataset(
            sf_dir, list(DIVERSIFIED_TERMS),
            per_seg_topk_per_lang=DIVERSIFIED_MAX_PER_KEY,
        )
        .groupby("lang")
        .map_groups(lang_top, batch_format="pyarrow")
        .take_all()
    )
    docs = np.asarray([int(r["doc_id"]) for r in parts], dtype=np.int64)
    langs = np.asarray([r["lang"] for r in parts], dtype=object)
    scores = np.asarray([float(r["score"]) for r in parts], dtype=np.float32)
    sel = diversified_top_k(
        docs, langs, scores, DIVERSIFIED_K, DIVERSIFIED_MAX_PER_KEY
    )
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
            "doc_id": pa.array(docs[sel]),
            "lang": pa.array([str(v) for v in langs[sel]], pa.string()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in scores[sel]], pa.float64()
            ),
        }
    )


# --- suggest module gates (search/suggest.py) ------------------------------

# (prefix_id, prefix, n) — prefixes chosen so every sf's 31-word Zipf
# vocabulary yields multi-term completion lists with distinct weights
COMPLETION_SPECS: list[tuple[str, str, int]] = [
    ("c_s", "s", 4),
    ("c_c", "c", 5),
    ("c_b", "b", 5),
    ("c_f", "f", 5),
    ("c_qu", "qu", 3),
]

# (query_id, text, n) — misspellings absent from the vocabulary (so the
# default SUGGEST_WHEN_NOT_IN_INDEX mode proceeds) plus one present term
# ("table") pinning the mode's empty-result contract. "srot" exercises a
# transposition (Damerau primitive edit) AND the accuracy=0.5 boundary
# (slow at distance 2 over min-length 4 scores exactly 0.5 -> kept).
SPELLCHECK_SPECS: list[tuple[str, str, int]] = [
    ("sp_tabel", "tabel", 5),
    ("sp_srot", "srot", 5),
    ("sp_quary", "quary", 5),
    ("sp_windwo", "windwo", 5),
    ("sp_colum", "colum", 5),
    ("sp_table_present", "table", 5),
]


def q_suggest_completion(sf_dir: str) -> pa.Table:
    """CompletionSuggester gate: (prefix_id, rank, term, weight) — top-N
    prefix completions by corpus total_term_freq from the merged term
    dictionary (shard-range pruned scan)."""
    from ..search.suggest import CompletionSuggester

    merged, _ = get_searchers(sf_dir)
    sug = CompletionSuggester(merged)
    pids, ranks, terms, weights = [], [], [], []
    for pid, pfx, n in COMPLETION_SPECS:
        for r, s in enumerate(sug.lookup(pfx, n), start=1):
            pids.append(pid)
            ranks.append(r)
            terms.append(s.term)
            weights.append(s.freq)
    return pa.table(
        {
            "prefix_id": pa.array(pids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "weight": pa.array(weights, pa.int64()),
        }
    )


# (query_id, infix query, n) — last token is a prefix, earlier tokens
# exact (AnalyzingInfixSuggester lookup contract); suggestions are the
# 8-token page titles weighted by n_chars
INFIX_SPECS: list[tuple[str, str, int]] = [
    ("inf_val", "val", 5),
    ("inf_ta", "ta", 5),
    ("inf_str", "str", 5),
    ("inf_row", "row", 5),
    ("inf_the_ta", "the ta", 5),
    ("inf_key_hash_w", "key hash w", 5),
]


def q_suggest_infix(sf_dir: str) -> pa.Table:
    """AnalyzingInfixSuggester gate: (query_id, rank, doc_id, suggestion,
    weight) — token-start infix matches over the page titles, weight =
    n_chars, ranked weight desc with doc_id ties ascending."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..search.suggest import InfixSuggester
    from ..sources.pages import TITLE_TOKENS

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    titles = pc.binary_join(
        pc.list_slice(pc.split_pattern(docs["text"].combine_chunks(), " "),
                      0, TITLE_TOKENS),
        " ",
    )
    sug = InfixSuggester().build(
        docs["doc_id"].to_numpy(),
        titles.to_numpy(zero_copy_only=False),
        docs["n_chars"].to_numpy(),
    )
    qids, ranks, dids, texts, weights = [], [], [], [], []
    for qid, q, n in INFIX_SPECS:
        for r, s in enumerate(sug.lookup(q, n), start=1):
            qids.append(qid)
            ranks.append(r)
            dids.append(s.key)
            texts.append(s.text)
            weights.append(s.weight)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(dids, pa.int64()),
            "suggestion": pa.array(texts, pa.string()),
            "weight": pa.array(weights, pa.int64()),
        }
    )


def q_spellcheck(sf_dir: str) -> pa.Table:
    """DirectSpellChecker gate: (query_id, rank, term, score_r, freq) with
    reference defaults (maxEdits=2, minPrefix=1, accuracy=0.5,
    SUGGEST_WHEN_NOT_IN_INDEX)."""
    from ..search.suggest import DirectSpellChecker

    merged, _ = get_searchers(sf_dir)
    sc = DirectSpellChecker(merged)
    qids, ranks, terms, scores, freqs = [], [], [], [], []
    for qid, text, n in SPELLCHECK_SPECS:
        for r, s in enumerate(sc.suggest_similar(text, n), start=1):
            qids.append(qid)
            ranks.append(r)
            terms.append(s.term)
            scores.append(round_half_away(s.score, 4))
            freqs.append(s.freq)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "score_r": pa.array(scores, pa.float64()),
            "freq": pa.array(freqs, pa.int64()),
        }
    )


# FuzzySuggester gate: (query_id, key, n) with reference defaults
# (max_edits=1, non_fuzzy_prefix=1, min_fuzzy_length=3, exact_first).
# fz_jion/fz_vlaue pin the transposition primitive, fz_ke the
# below-min-fuzzy-length exact-prefix path, fz_sort the EXACT_FIRST rule
# (present key outranks weight), fz_cable the non-fuzzy first character
# ("table" is 1 edit away but its first char differs -> no rows).
FUZZY_SUGGEST_SPECS: list[tuple[str, str, int]] = [
    ("fz_tabel", "tabel", 5),
    ("fz_jion", "jion", 5),
    ("fz_sprk", "sprk", 5),
    ("fz_vlaue", "vlaue", 5),
    ("fz_ke", "ke", 5),
    ("fz_sort", "sort", 5),
    ("fz_cable", "cable", 5),
    # 4 candidates (scan, small, spark, stream) at distance 1, n=3 —
    # exercises weight-desc ranking AND top-n truncation
    ("fz_sta", "sta", 3),
]


def q_suggest_fuzzy(sf_dir: str) -> pa.Table:
    """FuzzySuggester gate: (query_id, rank, term, weight) — Levenshtein-
    automaton prefix completions over the merged term dictionary, weight =
    corpus total_term_freq, exact key first then weight desc / term asc."""
    from ..search.suggest import FuzzySuggester

    merged, _ = get_searchers(sf_dir)
    sug = FuzzySuggester(merged)
    qids, ranks, terms, weights = [], [], [], []
    for qid, key, n in FUZZY_SUGGEST_SPECS:
        for r, s in enumerate(sug.lookup(key, n), start=1):
            qids.append(qid)
            ranks.append(r)
            terms.append(s.term)
            weights.append(s.freq)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "weight": pa.array(weights, pa.int64()),
        }
    )


# FreeTextSuggester gate: (query_id, key, n). ft_the_ / ft_key_ predict
# continuations (trailing space upgrades to the bigram model only);
# ft_the_ta / ft_key_va complete a fragment with bigram+unigram backoff;
# ft_qu is a context-free unigram lookup; ft_zz_ta backs off to unigrams
# after an unseen bigram context (backoff 0.4).
FREETEXT_SPECS: list[tuple[str, str, int]] = [
    ("ft_the_", "the ", 5),
    ("ft_key_", "key ", 5),
    ("ft_the_ta", "the ta", 5),
    ("ft_key_va", "key va", 5),
    ("ft_qu", "qu", 5),
    ("ft_zz_ta", "zz ta", 5),
]


def q_suggest_freetext(sf_dir: str) -> pa.Table:
    """FreeTextSuggester gate: (query_id, rank, suggestion, score_r) — a
    bigram stupid-backoff language model fitted by a DISTRIBUTED gram
    count (per-batch combiner inside map_batches, then one
    vocabulary-sized groupby sum — shingles never leave their partition),
    broadcast to the driver-side model for lookups."""
    from ray.data.aggregate import Sum

    from ..pipelines.common import sized_read
    from ..search.suggest import FreeTextSuggester

    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["text"])
    agg = (
        ds.map_batches(_gram_count_batch, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    # vocabulary-bounded aggregate (|V| + |V|^2 rows max) — safe to collect
    for batch in agg.iter_batches(batch_format="pyarrow"):
        for g, c in zip(batch["gram"].to_pylist(), batch["cnt"].to_pylist()):
            (big if " " in g else uni)[g] = int(c)
    sug = FreeTextSuggester(grams=2).build_from_counts(
        {1: uni, 2: big}, tot_tokens=sum(uni.values())
    )
    qids, ranks, texts, scores = [], [], [], []
    for qid, key, n in FREETEXT_SPECS:
        for r, s in enumerate(sug.lookup(key, n), start=1):
            qids.append(qid)
            ranks.append(r)
            texts.append(s.text)
            scores.append(round_half_away(s.score, 9))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "suggestion": pa.array(texts, pa.string()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def _gram_count_batch(batch: pa.Table) -> pa.Table:
    """Per-batch unigram+bigram partial counts (the pre-aggregation
    combiner): whitespace split, flatten, shift-pair within rows, one
    np.unique per order. Bigrams never cross document boundaries."""
    import pyarrow.compute as pc

    lists = pc.split_pattern(batch["text"].combine_chunks(), " ")
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(object)
    lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
    uni_t, uni_c = np.unique(flat, return_counts=True)
    # mask off each row's last token for the left side of the bigram
    ends = np.cumsum(lens) - 1  # flat index of each row's last token
    keep = np.ones(len(flat), dtype=bool)
    keep[ends[lens > 0]] = False
    w1 = flat[keep]
    w2 = flat[1:][keep[:-1]] if len(flat) else flat[:0]
    big_t, big_c = np.unique(w1 + " " + w2, return_counts=True) if len(w1) else (
        np.array([], dtype=object), np.array([], dtype=np.int64),
    )
    return pa.table(
        {
            "gram": pa.array(
                np.concatenate([uni_t, big_t]).tolist(), pa.string()
            ),
            "cnt": pa.array(np.concatenate([uni_c, big_c]), pa.int64()),
        }
    )


# --- payload queries (queries/payloads module) -------------------------------

# (query_id, term, func, include_span_score, k)
PAYLOAD_TOPK_SPECS: list[tuple[str, str, str, bool, int]] = [
    ("pay_max_join", "join", "max", True, 10),
    ("pay_min_merge", "merge", "min", True, 10),
    ("pay_sum_scan", "scan", "sum", False, 10),
    ("pay_avg_table", "table", "average", False, 10),
    ("pay_avg_window", "window", "average", True, 10),
]

# payload fixture: token at 0-based position pos gets payload
# ((3*len + pos) % 8) * 0.25 unless pos % 3 == 2 (left bare -> factor 1 at
# query time, exercising the null-payload path). All values are multiples
# of 0.25, so float32 sums are exact and order-independent — the SQL
# mirror (oracles.payload_topk_sql) reproduces scores bit-for-bit.
_PAY_SUFFIXES = None


def decorate_payload_texts(text_col) -> pa.Array:
    """Vectorized DelimitedPayload decoration of a space-tokenized text
    column (the batch transform a real ingest would run in map_batches):
    explode -> per-token payload suffix -> rejoin."""
    import pyarrow.compute as pc

    global _PAY_SUFFIXES
    if _PAY_SUFFIXES is None:
        _PAY_SUFFIXES = np.array([f"|{k * 0.25}" for k in range(8)], dtype=object)
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    lists = pc.split_pattern(text_col, " ")
    flat = lists.flatten()
    offs = lists.offsets.to_numpy().astype(np.int64)
    toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
    counts = np.diff(offs)
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    pos = np.arange(len(toks), dtype=np.int64) - offs[:-1][doc_idx]
    lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
    k = (3 * lens + pos) % 8
    dec = np.where(pos % 3 != 2, toks + _PAY_SUFFIXES[k], toks)
    dec_list = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(dec, pa.string()))
    return pc.binary_join(dec_list, " ")


def build_payload_index(sf_dir: str) -> str:
    """Variant index with per-position payloads: documents text decorated
    by decorate_payload_texts, whitespace analyzer (the delimiter must
    survive tokenization — DelimitedPayloadTokenFilter contract), built
    multi-partition and pull-merged so payload streams cross the merge."""
    root = _variant_cache_dir(sf_dir, "payload")
    index_dir = os.path.join(root, "index")
    done_flag = os.path.join(index_dir, "merged", "merged.json")
    if os.path.exists(done_flag):
        return index_dir
    os.makedirs(root, exist_ok=True)
    pages_path = os.path.join(root, "pages.parquet")
    if not os.path.exists(pages_path):
        pages = pages_from_documents(sf_dir, with_html=False)
        pages = pages.set_column(
            pages.column_names.index("text"),
            "text",
            decorate_payload_texts(pages["text"]),
        )
        write_pages_parquet(
            pages, pages_path + ".tmp", rows_per_row_group=max(128, pages.num_rows // 8)
        )
        os.replace(pages_path + ".tmp", pages_path)
    cfg = BuildConfig(
        analyzer="whitespace",
        payload_delimiter="|",
        target_docs_per_segment=max(128, _pages_rows(pages_path) // 8),
    )
    build_index([pages_path], index_dir, cfg)
    merge_index(index_dir, MergeConfig(n_shards=8, hot_df_threshold=10**9))
    return index_dir


def q_payload_topk(sf_dir: str) -> pa.Table:
    """PayloadScoreQuery gate over the payload variant index:
    (query_id, rank, doc_id, score_r) for min/max/sum/average payload
    functions, with and without the BM25 span-score multiply."""
    index_dir = build_payload_index(sf_dir)
    searcher = open_searcher(index_dir, prefer_merged=True)
    qids, ranks, docs, scores = [], [], [], []
    for qid, term, func, inc, k in PAYLOAD_TOPK_SPECS:
        td = searcher.search(
            Q.PayloadScoreQuery(term, func=func, include_span_score=inc), k=k
        )
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# --- block join (join module) ------------------------------------------------

# (query_id, term, score_mode, k)
BLOCKJOIN_TOPK_SPECS: list[tuple[str, str, str, int]] = [
    ("bj_avg_join", "join", "avg", 10),
    ("bj_max_merge", "merge", "max", 10),
    ("bj_total_scan", "scan", "total", 10),
    ("bj_min_window", "window", "min", 10),
    ("bj_avg_table", "table", "avg", 10),
]

BLOCKJOIN_CHUNK_W = 24  # child docs = 24-token windows of each document
# parent rows: the "pdoc" marker + a parent-only language token "pl_<lang>"
# (both absent from the corpus vocabulary, so parent queries never match
# children and child queries never match parents)
BLOCKJOIN_PARENT_TEXT = "pdoc"
BLOCKJOIN_PARENT_CHUNK = 999_999  # chunk_id sentinel for parent rows

# ToChildBlockJoin gate: (query_id, parent SHOULD terms, k)
TOCHILD_TOPK_SPECS: list[tuple[str, tuple[str, ...], int]] = [
    ("tc_es", ("pdoc", "pl_es"), 10),
    ("tc_zh", ("pdoc", "pl_zh"), 10),
    ("tc_pdoc", ("pdoc",), 10),
]


def build_blockjoin_index(sf_dir: str) -> str:
    """Variant index of document BLOCKS: each source doc becomes its
    24-token chunk children followed by one parent row (text = the "pdoc"
    marker + "pl_<lang>", never matching child queries — the reference's
    contract that the child query must not hit parents, and vice versa).
    ``is_parent``, ``orig_doc`` and ``chunk_id`` ride the docmap as
    doc-values; parquet row groups align to block boundaries so blocks
    never span build partitions (the IndexWriter.addDocuments
    leaf-locality guarantee)."""
    import pyarrow.parquet as _pq

    root = _variant_cache_dir(sf_dir, "blockjoin2")
    index_dir = os.path.join(root, "index")
    done_flag = os.path.join(index_dir, "merged", "merged.json")
    if os.path.exists(done_flag):
        return index_dir
    os.makedirs(root, exist_ok=True)
    pages_path = os.path.join(root, "pages.parquet")
    if not os.path.exists(pages_path):
        docs = _pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        ).sort_by([("doc_id", "ascending")])
        w = BLOCKJOIN_CHUNK_W
        urls, texts, langs, is_parent, orig, chunk_ids = [], [], [], [], [], []
        block_starts = [0]
        for did, text, lang in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
        ):
            toks = text.split(" ")
            n_chunks = max((len(toks) + w - 1) // w, 1)
            for k in range(n_chunks):
                urls.append(f"https://docs.example/c/{did}/{k}")
                texts.append(" ".join(toks[k * w : (k + 1) * w]))
                langs.append(lang)
                is_parent.append(0)
                orig.append(did)
                chunk_ids.append(k)
            urls.append(f"https://docs.example/p/{did}")
            texts.append(f"{BLOCKJOIN_PARENT_TEXT} pl_{lang}")
            langs.append(lang)
            is_parent.append(1)
            orig.append(did)
            chunk_ids.append(BLOCKJOIN_PARENT_CHUNK)
            block_starts.append(len(urls))
        n = len(urls)
        table = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "is_parent": pa.array(is_parent, pa.int64()),
                "orig_doc": pa.array(orig, pa.int64()),
                "chunk_id": pa.array(chunk_ids, pa.int64()),
            }
        )
        # row groups cut ONLY at block boundaries, ~8 groups
        target = max(64, n // 8)
        cuts = [0]
        for b in block_starts[1:]:
            if b - cuts[-1] >= target or b == n:
                cuts.append(b)
        if cuts[-1] != n:
            cuts.append(n)
        with _pq.ParquetWriter(pages_path + ".tmp", table.schema) as wr:
            for a, b in zip(cuts[:-1], cuts[1:]):
                wr.write_table(table.slice(a, b - a))
        os.replace(pages_path + ".tmp", pages_path)
    cfg = BuildConfig(
        analyzer="whitespace",
        store_cols=("is_parent", "orig_doc", "chunk_id"),
        target_docs_per_segment=max(64, _pages_rows(pages_path) // 8),
    )
    build_index([pages_path], index_dir, cfg)
    merge_index(index_dir, MergeConfig(n_shards=8, hot_df_threshold=10**9))
    return index_dir


def q_blockjoin_topk(sf_dir: str) -> pa.Table:
    """ToParentBlockJoinQuery gate over the block variant index:
    (query_id, rank, doc_id = parent's source doc, score_r) for every
    ScoreMode, ranked by the aggregated child BM25 score."""
    index_dir = build_blockjoin_index(sf_dir)
    searcher = open_searcher(index_dir, prefer_merged=True)
    orig = np.asarray(searcher.readers[0].doc_values("orig_doc"))
    qids, ranks, docs, scores = [], [], [], []
    for qid, term, mode, k in BLOCKJOIN_TOPK_SPECS:
        q = Q.ToParentBlockJoinQuery(Q.TermQuery(term), score_mode=mode)
        td = searcher.search(q, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(orig[int(d)]))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


def q_tochild_topk(sf_dir: str) -> pa.Table:
    """ToChildBlockJoinQuery gate: children inherit the parent's BM25
    score for a parent query over the parent-only vocabulary (pdoc +
    pl_<lang>). (query_id, rank, doc_id = source doc, chunk_id,
    score_r)."""
    index_dir = build_blockjoin_index(sf_dir)
    searcher = open_searcher(index_dir, prefer_merged=True)
    r0 = searcher.readers[0]
    orig = np.asarray(r0.doc_values("orig_doc"))
    chunk = np.asarray(r0.doc_values("chunk_id"))
    qids, ranks, docs, chunks, scores = [], [], [], [], []
    for qid, terms, k in TOCHILD_TOPK_SPECS:
        parent_q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms])
        td = searcher.search(Q.ToChildBlockJoinQuery(parent_q), k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(orig[int(d)]))
            chunks.append(int(chunk[int(d)]))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "chunk_id": pa.array(chunks, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# --- interval queries (queries/intervals module) ----------------------------

# (query_id, kind, terms, max_gaps, k) — kinds:
#   ordered / unordered          over the term tuple
#   maxgaps                      2-term ordered filtered to gaps <= max_gaps
#   or_ordered (t0, t1, t2)      ordered(t0, or(t1, t2))
#   containing (t0, t1, t2)      containing(unordered(t0, t1), t2)
#   not_containing (t0, t1, t2)  notContaining(unordered(t0, t1), t2)
#   contained_by (t0, t1, t2)    containedBy(t0, unordered(t1, t2))
INTERVAL_TOPK_SPECS: list[tuple[str, str, tuple[str, ...], int | None, int]] = [
    ("iv_ord2", "ordered", ("join", "merge"), None, 10),
    ("iv_ord3", "ordered", ("scan", "fast", "key"), None, 10),
    ("iv_unord2", "unordered", ("window", "batch"), None, 10),
    ("iv_gap2", "maxgaps", ("table", "row"), 2, 10),
    ("iv_or2", "or_ordered", ("join", "merge", "scan"), None, 10),
    ("iv_cont", "containing", ("window", "batch", "key"), None, 10),
    ("iv_ncont", "not_containing", ("window", "batch", "key"), None, 10),
    ("iv_cby", "contained_by", ("key", "window", "batch"), None, 10),
]


def _interval_source(kind: str, terms: tuple[str, ...], max_gaps):
    from ..search.intervals import (
        ContainedByIntervals,
        ContainingIntervals,
        DisjunctionIntervals,
        MaxGapsIntervals,
        NotContainingIntervals,
        OrderedIntervals,
        TermInterval,
        UnorderedIntervals,
    )

    leaves = tuple(TermInterval(t) for t in terms)
    if kind == "ordered":
        return OrderedIntervals(leaves)
    if kind == "unordered":
        return UnorderedIntervals(leaves)
    if kind == "maxgaps":
        return MaxGapsIntervals(max_gaps, OrderedIntervals(leaves))
    if kind == "or_ordered":
        return OrderedIntervals((leaves[0], DisjunctionIntervals(leaves[1:])))
    if kind == "containing":
        return ContainingIntervals(UnorderedIntervals(leaves[:2]), leaves[2])
    if kind == "not_containing":
        return NotContainingIntervals(UnorderedIntervals(leaves[:2]), leaves[2])
    if kind == "contained_by":
        return ContainedByIntervals(leaves[0], UnorderedIntervals(leaves[1:]))
    raise ValueError(kind)


def q_interval_topk(sf_dir: str) -> pa.Table:
    """IntervalQuery gate: minimal-interval ordered/unordered/maxgaps
    ranking (saturation score, pivot=1): (query_id, rank, doc_id,
    score_r)."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, kind, terms, gaps, k in INTERVAL_TOPK_SPECS:
        query = Q.IntervalQuery(source=_interval_source(kind, terms, gaps))
        td = merged.search(query, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Geo gates: LatLonPoint.newDistanceQuery / newBoxQuery predicates and the
# LatLonDocValuesField.newDistanceSort top-k over a variant index whose
# lat/lon doc-values columns derive deterministically from doc_id — the
# same integer-lattice formula is reproduced verbatim in the SQL oracle
# (oracles.geo_ctes), so both sides score identical coordinates.
GEO_CENTER = (12.0, 34.0)
GEO_RADIUS_M = 2_000_000.0
GEO_BOX = (-20.0, 25.0, 10.0, 80.0)  # min_lat, max_lat, min_lon, max_lon
# simple (convex) polygon over the lattice region: (lat, lon) vertices
GEO_POLYGON = ((0.0, -30.0), (40.0, 0.0), (30.0, 60.0), (-10.0, 70.0), (-30.0, 10.0))
GEO_K = 15


def geo_lat_lon(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic coordinates on a 0.01-degree lattice:
    lat = ((doc_id*7919) % 18000)/100 - 90, lon = ((doc_id*104729) %
    36000)/100 - 180. Integer arithmetic then one exact double divide —
    bit-identical between numpy and the DuckDB oracle."""
    d = np.asarray(doc_ids, dtype=np.int64)
    lat = ((d * 7919) % 18000) / 100.0 - 90.0
    lon = ((d * 104729) % 36000) / 100.0 - 180.0
    return lat, lon


def build_geo_index(sf_dir: str) -> str:
    """Variant index whose pages carry lat/lon columns (stored as NUMERIC
    doc values via store_cols) — the LatLonDocValuesField fixture."""
    root = _variant_cache_dir(sf_dir, "geo")
    index_dir = os.path.join(root, "index")
    done_flag = os.path.join(index_dir, "merged", "merged.json")
    if os.path.exists(done_flag):
        return index_dir
    os.makedirs(root, exist_ok=True)
    pages_path = os.path.join(root, "pages.parquet")
    if not os.path.exists(pages_path):
        pages = pages_from_documents(sf_dir, with_html=False)
        lat, lon = geo_lat_lon(np.arange(pages.num_rows, dtype=np.int64))
        pages = pages.append_column("lat", pa.array(lat, pa.float64()))
        pages = pages.append_column("lon", pa.array(lon, pa.float64()))
        write_pages_parquet(
            pages, pages_path + ".tmp", rows_per_row_group=max(128, pages.num_rows // 8)
        )
        os.replace(pages_path + ".tmp", pages_path)
    cfg = BuildConfig(
        store_cols=("lat", "lon"),
        target_docs_per_segment=max(128, _pages_rows(pages_path) // 8),
    )
    build_index([pages_path], index_dir, cfg)
    merge_index(index_dir, MergeConfig(n_shards=8, hot_df_threshold=10**9))
    return index_dir


def _geo_searcher(sf_dir: str) -> IndexSearcher:
    key = "geo:" + os.path.abspath(sf_dir)
    if key not in _SEARCHERS:
        s = open_searcher(build_geo_index(sf_dir))
        _SEARCHERS[key] = (s, s)
    return _SEARCHERS[key][0]


def q_geo_match(sf_dir: str) -> pa.Table:
    """Geo predicate gate: kind='radius' rows match GeoDistanceQuery
    (haversine <= GEO_RADIUS_M around GEO_CENTER); kind='box' rows match
    GeoBoxQuery over GEO_BOX; kind='polygon' rows match GeoPolygonQuery
    over GEO_POLYGON (even-odd crossing test). All run as FILTER clauses
    (constant score) through the searcher: (kind, doc_id)."""
    s = _geo_searcher(sf_dir)
    kinds: list[str] = []
    docs: list[int] = []
    radius = Q.GeoDistanceQuery("lat", "lon", *GEO_CENTER, GEO_RADIUS_M)
    td = s.search(
        Q.BooleanQuery.build([(Q.FILTER, radius)]),
        k=s.doc_count, total_hits_threshold=1 << 62,
    )
    for d in sorted(int(x) for x in td.doc_ids):
        kinds.append("radius")
        docs.append(d)
    box = Q.GeoBoxQuery("lat", "lon", *GEO_BOX)
    td = s.search(
        Q.BooleanQuery.build([(Q.FILTER, box)]),
        k=s.doc_count, total_hits_threshold=1 << 62,
    )
    for d in sorted(int(x) for x in td.doc_ids):
        kinds.append("box")
        docs.append(d)
    poly = Q.GeoPolygonQuery("lat", "lon", GEO_POLYGON)
    td = s.search(
        Q.BooleanQuery.build([(Q.FILTER, poly)]),
        k=s.doc_count, total_hits_threshold=1 << 62,
    )
    for d in sorted(int(x) for x in td.doc_ids):
        kinds.append("polygon")
        docs.append(d)
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "doc_id": pa.array(docs, pa.int64()),
        }
    )


def q_geo_nearest(sf_dir: str) -> pa.Table:
    """Distance-sort gate (LatLonDocValuesField.newDistanceSort role):
    top-GEO_K docs nearest GEO_CENTER via per-segment vectorized haversine
    partials + heap merge: (rank, doc_id, dist_r) with dist_r the distance
    in meters rounded to 0.1 m (trig ulp noise is ~1e-9 m — far below the
    rounding grid)."""
    from ..search.geo import distance_sort_topk

    s = _geo_searcher(sf_dir)
    top = distance_sort_topk(s, "lat", "lon", *GEO_CENTER, GEO_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(top) + 1), pa.int64()),
            "doc_id": pa.array([d for _, d in top], pa.int64()),
            "dist_r": pa.array(
                [round_half_away(dist, 1) for dist, _ in top], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# misc-module gates: HighFreqTerms and DocValuesStats
HIGH_FREQ_N = 10
DV_STATS_COL = "score_hint"


def q_high_freq_terms(sf_dir: str) -> pa.Table:
    """HighFreqTerms gate (misc/HighFreqTerms.java:47): the top-N terms of
    the merged dictionary by docFreq and by totalTermFreq (one vectorized
    pass over the shard term tables): (order_by, rank, term, doc_freq,
    total_term_freq)."""
    from ..search.misc import high_freq_terms

    merged, _ = get_searchers(sf_dir)
    orders, ranks, terms, dfs, ttfs = [], [], [], [], []
    for order in ("df", "ttf"):
        for r, (t, df, ttf) in enumerate(
            high_freq_terms(merged, HIGH_FREQ_N, order), start=1
        ):
            orders.append(order)
            ranks.append(r)
            terms.append(t)
            dfs.append(df)
            ttfs.append(ttf)
    return pa.table(
        {
            "order_by": pa.array(orders, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "doc_freq": pa.array(dfs, pa.int64()),
            "total_term_freq": pa.array(ttfs, pa.int64()),
        }
    )


def q_dv_stats(sf_dir: str) -> pa.Table:
    """DocValuesStats gate (misc/DocValuesStats.java:28) over the nullable
    score_hint doc-values column: (stat, val_r) for count / missing / min /
    max / mean / variance / stdev (population moments)."""
    from ..search.misc import doc_values_stats

    merged, _ = get_searchers(sf_dir)
    stats = doc_values_stats(merged, DV_STATS_COL)
    names = ["count", "missing", "min", "max", "mean", "variance", "stdev"]
    return pa.table(
        {
            "stat": pa.array(names, pa.string()),
            "val_r": pa.array(
                [round_half_away(stats[n], 4) for n in names], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# QueryBuilder synonym-expansion gate: (qid, query text, synonym map, kind, k)
# — kind "bool" produces TermQuery/SynonymQuery clauses
# (QueryBuilder.analyzeBoolean), kind "phrase" produces
# PhraseQuery/MultiPhraseQuery (analyzeMultiPhrase). "digest" is absent
# from the corpus: the union must tolerate zero-posting synonyms.
SYNONYM_TOPK_SPECS: list[tuple[str, str, dict[str, tuple[str, ...]], str, int]] = [
    ("synb_table_row", "the table", {"table": ("row",)}, "bool", 10),
    ("synb_multi", "key hash", {"key": ("value", "line"), "hash": ("digest",)}, "bool", 10),
    ("synp_key_hashvalue", "key hash", {"hash": ("value",)}, "phrase", 10),
    ("synp_plain", "key hash", {}, "phrase", 10),
]


def synonym_positions(
    text: str, synonyms: dict[str, tuple[str, ...]]
) -> list[tuple[str, ...]]:
    """Analyzed (term, *synonyms) position stacks for one spec — shared by
    the gate (via querybuilder) and the SQL oracle generator so both sides
    expand identically."""
    from ..functions.analysis import get_analyzer
    from ..search.querybuilder import _positions

    return _positions(get_analyzer("standard"), text, synonyms)


def q_synonym_topk(sf_dir: str) -> pa.Table:
    """Query-time synonym expansion through QueryBuilder: each spec's text
    is analyzed, single-word synonym rules stack terms onto positions, and
    the builder emits SynonymQuery clauses (bool kind) or a
    MultiPhraseQuery upgrade (phrase kind): (query_id, rank, doc_id,
    score_r)."""
    from ..search.querybuilder import create_boolean_query, create_phrase_query

    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, syn, kind, k in SYNONYM_TOPK_SPECS:
        if kind == "bool":
            query = create_boolean_query(merged.analyzer, text, syn)
        else:
            query = create_phrase_query(merged.analyzer, text, syn)
        td = merged.search(query, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Surround-parser gate: (qid, surround query string, equivalent span spec
# for the shared span oracle (kind, clauses, slop-param)) — distances are
# 1-based in the syntax and translate to slop = distance - 1
# (surround/query/DistanceQuery.java getSpanNearQuery).
SURROUND_TOPK_SPECS: list[tuple[str, str, tuple]] = [
    ("su_w", "3w(key, hash)", ("ord", (("key",), ("hash",)), 2)),
    ("su_n", "3N(window, batch)", ("unord", (("window",), ("batch",)), 2)),
    ("su_or_w", "5W(OR(window, stream), batch)",
     ("ord", (("window", "stream"), ("batch",)), 4)),
    ("su_infix", "data 9w join", ("ord", (("data",), ("join",)), 8)),
    ("su_nest", "7W(5W(key, hash), value)",
     ("ord_nest", (("key",), ("hash",), ("value",)), (4, 6))),
]
SURROUND_K = 10


def q_surround_topk(sf_dir: str) -> pa.Table:
    """Surround query parser gate: each spec's query STRING parses to a
    span tree (prefix/infix W and N, OR-in-distance, nested distance) and
    scores through the span machinery: (query_id, rank, doc_id,
    score_r)."""
    from ..search.surround import parse_surround

    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, _spec in SURROUND_TOPK_SPECS:
        td = merged.search(parse_surround(text), k=SURROUND_K)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# TermAutomatonQuery gate: two automatons —
#  ta_branch: shared-prefix branching paths  key->(hash|value), and the
#             3-token path window->batch->spark;
#  ta_prefix: prefix-accept chain batch(acc)->batch(acc), exercising the
#             accept-EVENT counting (each "batch" token and each
#             consecutive pair both count, overlapping included).
# Each spec carries the accepted paths + termID order for the oracle.
TERMAUTOMATON_SPECS: list[tuple[str, list[list[str]], list[str]]] = [
    ("ta_branch",
     [["key", "hash"], ["key", "value"], ["window", "batch", "spark"]],
     ["key", "hash", "value", "window", "batch", "spark"]),
    ("ta_prefix", [["batch"], ["batch", "batch"]], ["batch"]),
]
TERMAUTOMATON_K = 10


def _build_termautomaton(qid: str):
    from ..search.termautomaton import TermAutomatonBuilder

    b = TermAutomatonBuilder()
    if qid == "ta_branch":
        s0, s1, s2 = b.create_state(), b.create_state(), b.create_state()
        s3, s4, s5 = b.create_state(), b.create_state(), b.create_state()
        b.add_transition(s0, s1, "key")
        b.add_transition(s1, s2, "hash")
        b.add_transition(s1, s2, "value")
        b.add_transition(s0, s3, "window")
        b.add_transition(s3, s4, "batch")
        b.add_transition(s4, s5, "spark")
        b.set_accept(s2)
        b.set_accept(s5)
    elif qid == "ta_prefix":
        s0, s1, s2 = b.create_state(), b.create_state(), b.create_state()
        b.add_transition(s0, s1, "batch")
        b.add_transition(s1, s2, "batch")
        b.set_accept(s1)
        b.set_accept(s2)
    else:
        raise ValueError(qid)
    return b.finish()


def q_termautomaton_topk(sf_dir: str) -> pa.Table:
    """Sandbox TermAutomatonQuery gate: automaton freq = accept events
    over consecutive token positions, idf = per-term sum in termID order:
    (query_id, rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, _paths, _terms in TERMAUTOMATON_SPECS:
        td = merged.search(_build_termautomaton(qid), k=TERMAUTOMATON_K)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Expression-sort gate: top-k by a compiled doc-values expression
# (Expression.getSortField / ExpressionValueSource) — missing score_hint
# values bind as 0, `length` is the analyzer token count stored per doc.
EXPR_SORT_SOURCE = "score_hint + length * 2.0"
EXPR_SORT_K = 12


def q_expr_sort_topn(sf_dir: str) -> pa.Table:
    """(rank, doc_id, val_r): top-EXPR_SORT_K docs by EXPR_SORT_SOURCE
    descending, docID tie-break — per-segment vectorized evaluate +
    argpartition partials, heap merge."""
    from ..search.sortedfield import expression_sort_topn

    merged, _ = get_searchers(sf_dir)
    top = expression_sort_topn(merged, EXPR_SORT_SOURCE, EXPR_SORT_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(top) + 1), pa.int64()),
            "doc_id": pa.array([d for _, d in top], pa.int64()),
            "val_r": pa.array(
                [round_half_away(v, 4) for v, _ in top], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# SpanPayloadCheckQuery gate over the payload variant index: positions
# whose payload equals the spec value survive; freq = surviving count.
# Values are exact multiples of 0.25 (the fixture's payload lattice).
PAYLOAD_CHECK_SPECS: list[tuple[str, str, float, int]] = [
    ("pc_join_050", "join", 0.5, 10),
    ("pc_merge_125", "merge", 1.25, 10),
    ("pc_scan_000", "scan", 0.0, 10),
    ("pc_table_175", "table", 1.75, 10),
]


def q_payload_check(sf_dir: str) -> pa.Table:
    """SpanPayloadCheckQuery gate: (query_id, rank, doc_id, score_r) —
    BM25 at the payload-filtered position count, full term statistics."""
    index_dir = build_payload_index(sf_dir)
    searcher = open_searcher(index_dir, prefer_merged=True)
    qids, ranks, docs, scores = [], [], [], []
    for qid, term, value, k in PAYLOAD_CHECK_SPECS:
        td = searcher.search(Q.SpanPayloadCheckQuery(term, payload=value), k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# MultiFieldQueryParser gate: (qid, query text, [(field, boost)], k) —
# each token expands to a SHOULD disjunction over the fields; token
# groups combine SHOULD (parser default OR).
MULTIFIELD_TOPK_SPECS: list[tuple[str, str, list[tuple[str, float]], int]] = [
    ("mf_key_hash", "key hash", [("title", 1.0), ("", 1.0)], 10),
    ("mf_title2_table", "table", [("title", 2.0), ("", 1.0)], 10),
    ("mf_three", "window batch spark", [("title", 1.5), ("", 1.0)], 10),
]


def q_multifield_topk(sf_dir: str) -> pa.Table:
    """MultiFieldQueryParser gate: (query_id, rank, doc_id, score_r) —
    nested boolean scoring (inner per-token field disjunction casts
    float32, outer SHOULD re-accumulates), title routed to its per-field
    statistics."""
    from ..search.queries import parse_multifield

    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, fields, k in MULTIFIELD_TOPK_SPECS:
        query = parse_multifield(text, fields, merged.analyzer)
        td = merged.search(query, k=k)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


FACET_VALUE_K = 10


def q_facet_value_counts(sf_dir: str) -> pa.Table:
    """Per-VALUE numeric facet (LongValueFacetCounts.getAllChildren /
    getTopChildren role, s84 facet/.../LongValueFacetCounts.java:51):
    exact counts of each distinct doc-length value among docs matching
    FACET_TERM, top-K by (count desc, value asc): (val, n). The count is
    a Ray groupby over segment-local matched rows; only the K-row result
    reaches the driver."""
    from ray.data.aggregate import Count

    rows = (
        _matched_rows_dataset(sf_dir, [FACET_TERM], with_length=True)
        .groupby("dl")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: (-int(r["n"]), int(r["dl"])))
    top = rows[:FACET_VALUE_K]
    return pa.table(
        {
            "val": pa.array([int(r["dl"]) for r in top], pa.int64()),
            "n": pa.array([int(r["n"]) for r in top], pa.int64()),
        }
    )


# PointInSetQuery gate: docs whose LENGTH doc value is in a fixed set,
# composed with a scoring term — (rank, doc_id, score_r)
NUMSET_VALUES = (20, 35, 50, 65, 80)
NUMSET_TERM = "table"
NUMSET_K = 12


def q_numeric_set_topk(sf_dir: str) -> pa.Table:
    """NumericSetQuery (PointInSetQuery role) as a FILTER beside a BM25
    SHOULD term: (rank, doc_id, score_r)."""
    merged, _ = get_searchers(sf_dir)
    query = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(NUMSET_TERM)),
         (Q.FILTER, Q.NumericSetQuery("length", tuple(float(v) for v in NUMSET_VALUES)))]
    )
    td = merged.search(query, k=NUMSET_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# XML query parser gate: (qid, xml string) — each document maps onto the
# query-tree; scored results reuse the matching closed-form oracles.
XML_TOPK_SPECS: list[tuple[str, str]] = [
    ("xml_bool",
     '<BooleanQuery><Clause occurs="should"><TermQuery>key</TermQuery></Clause>'
     '<Clause occurs="should"><TermQuery>hash</TermQuery></Clause></BooleanQuery>'),
    ("xml_dismax",
     '<DisjunctionMaxQuery tieBreaker="0.3"><TermQuery>key</TermQuery>'
     '<TermQuery>hash</TermQuery></DisjunctionMaxQuery>'),
    ("xml_user", "<UserQuery>window batch spark</UserQuery>"),
    ("xml_span",
     '<SpanNear slop="3" inOrder="true"><SpanTerm>key</SpanTerm>'
     '<SpanTerm>hash</SpanTerm></SpanNear>'),
    ("xml_filtered",
     '<BooleanQuery><Clause occurs="should"><TermQuery>table</TermQuery></Clause>'
     '<Clause occurs="filter"><PointRangeQuery fieldName="length" lowerTerm="30" '
     'upperTerm="60"/></Clause></BooleanQuery>'),
]
XML_K = 10


def q_xml_topk(sf_dir: str) -> pa.Table:
    """XML CoreParser gate: each spec's XML document parses to a query
    tree and scores: (query_id, rank, doc_id, score_r)."""
    from ..search.xmlparser import parse_xml_query

    merged, _ = get_searchers(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, xml in XML_TOPK_SPECS:
        td = merged.search(parse_xml_query(xml, merged.analyzer), k=XML_K)
        for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(int(d))
            scores.append(round_half_away(float(s), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )


# context-filtered completion: (prefix_id, prefix, context lang, n)
CONTEXT_COMPLETION_SPECS: list[tuple[str, str, str, int]] = [
    ("cs_ta_en", "ta", "en", 5),
    ("cs_s_de", "s", "de", 5),
    ("cs_w_zh", "w", "zh", 5),
]


def q_suggest_context(sf_dir: str) -> pa.Table:
    """ContextSuggestField gate: prefix completions weighted by
    within-context total term frequency: (prefix_id, rank, term,
    weight)."""
    from ..search.suggest import ContextCompletionSuggester

    merged, _ = get_searchers(sf_dir)
    sug = ContextCompletionSuggester(merged, context_col="lang")
    pids, ranks, terms, weights = [], [], [], []
    for pid, pfx, ctx, n in CONTEXT_COMPLETION_SPECS:
        for r, s in enumerate(sug.lookup(pfx, ctx, n), start=1):
            pids.append(pid)
            ranks.append(r)
            terms.append(s.term)
            weights.append(s.freq)
    return pa.table(
        {
            "prefix_id": pa.array(pids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "weight": pa.array(weights, pa.int64()),
        }
    )


# FunctionRangeQuery gate: expression value range as a FILTER beside a
# scoring term
FNRANGE_EXPR = "score_hint + length * 2.0"
FNRANGE_LO, FNRANGE_HI = 150.0, 400.0
FNRANGE_TERM = "key"
FNRANGE_K = 10


def q_function_range_topk(sf_dir: str) -> pa.Table:
    """FunctionRangeQuery gate: BM25 term restricted to docs whose
    computed expression value lies in [lo, hi]: (rank, doc_id,
    score_r)."""
    merged, _ = get_searchers(sf_dir)
    query = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(FNRANGE_TERM)),
         (Q.FILTER, Q.FunctionRangeQuery(FNRANGE_EXPR, FNRANGE_LO, FNRANGE_HI))]
    )
    td = merged.search(query, k=FNRANGE_K)
    return pa.table(
        {
            "rank": pa.array(range(1, len(td.doc_ids) + 1), pa.int64()),
            "doc_id": pa.array([int(d) for d in td.doc_ids], pa.int64()),
            "score_r": pa.array(
                [round_half_away(float(s), 4) for s in td.scores], pa.float64()
            ),
        }
    )


# BlendedInfixSuggester gate: single-token (prefix) queries, reciprocal
# position blender — (query_id, prefix, n)
BLENDED_INFIX_SPECS: list[tuple[str, str, int]] = [
    ("bi_ta", "ta", 8),
    ("bi_s", "s", 8),
    ("bi_ke", "ke", 8),
]


def q_suggest_blended(sf_dir: str) -> pa.Table:
    """BlendedInfixSuggester gate: infix candidates over the page titles
    with weight * 1/(first-match-position + 1) reciprocal blending:
    (query_id, rank, doc_id, score_r)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..search.suggest import BlendedInfixSuggester
    from ..sources.pages import TITLE_TOKENS

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    titles = pc.binary_join(
        pc.list_slice(pc.split_pattern(docs["text"].combine_chunks(), " "),
                      0, TITLE_TOKENS),
        " ",
    )
    sug = BlendedInfixSuggester(blender="position_reciprocal").build(
        docs["doc_id"].to_numpy(),
        titles.to_numpy(zero_copy_only=False),
        docs["n_chars"].to_numpy(),
    )
    qids, ranks, dids, scores = [], [], [], []
    for qid, q, n in BLENDED_INFIX_SPECS:
        for r, s in enumerate(sug.lookup(q, n), start=1):
            qids.append(qid)
            ranks.append(r)
            dids.append(s.key)
            scores.append(round_half_away(float(s.weight), 4))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(dids, pa.int64()),
            "score_r": pa.array(scores, pa.float64()),
        }
    )
