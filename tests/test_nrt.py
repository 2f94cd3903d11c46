"""NRT append + reopen semantics (round-2 VERDICT item #4).

The reference's most common post-build operation: append new documents as
new segments, commit a new manifest generation, reopen readers cheaply
(DirectoryReader.openIfChanged, s84 index/DirectoryReader.java:154; blog
NRT article), and keep serving — results must equal a from-scratch build
of the union, and compaction must compose with appended generations.
"""

from __future__ import annotations

import numpy as np

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.merged import (
    MergedIndexSearcher,
    open_if_changed,
    open_searcher,
)
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
from lucene_7_x_9_x_ray.stages.build import BuildConfig, append_index, build_index
from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index
from lucene_7_x_9_x_ray.state.checkindex import check_index

PROBES = [
    Q.TermQuery("t00000"),
    Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("t00002")), (Q.SHOULD, Q.TermQuery("t00030"))]
    ),
    Q.PhraseQuery(terms=("t00000", "t00001")),
]


def _two_files(tmp_path):
    p1 = str(tmp_path / "pages_000.parquet")
    p2 = str(tmp_path / "pages_001.parquet")
    write_pages_parquet(generate_pages(300, seed=41, vocab_size=60, mean_tokens=22),
                        p1, rows_per_row_group=75)
    write_pages_parquet(generate_pages(200, seed=42, vocab_size=60, mean_tokens=22),
                        p2, rows_per_row_group=50)
    return p1, p2


def _assert_same_results(sa, sb):
    for q in PROBES:
        ta = sa.search(q, k=30, total_hits_threshold=1 << 30)
        tb = sb.search(q, k=30, total_hits_threshold=1 << 30)
        assert list(ta.doc_ids) == list(tb.doc_ids), q
        assert np.array_equal(ta.scores, tb.scores), q


def test_append_openifchanged_matches_fresh_union(ray_session, tmp_path):
    p1, p2 = _two_files(tmp_path)
    cfg = BuildConfig(target_docs_per_segment=75)

    idx = str(tmp_path / "idx")
    build_index([p1], idx, cfg)
    merge_index(idx, MergeConfig(n_shards=4, hot_df_threshold=10**9))

    s1 = open_searcher(idx)
    assert isinstance(s1, MergedIndexSearcher)  # fresh merged serves
    assert open_if_changed(s1) is None  # nothing changed yet

    m = append_index([p2], idx, cfg)
    assert m.doc_count == 500 and m.version == 2

    # stale merged artifact must NOT serve the old doc space
    s2 = open_searcher(idx)
    assert not isinstance(s2, MergedIndexSearcher)
    assert s2.doc_count == 500

    s2 = IndexSearcher(idx)
    assert open_if_changed(s2) is None  # s2 already on gen 2

    # the live reopen loop: searcher open on gen 2, another append lands,
    # open_if_changed returns a successor SHARING the old readers (cheap
    # NRT reopen) with only the appended segments cold-opened
    p3 = str(tmp_path / "pages_002.parquet")
    write_pages_parquet(generate_pages(100, seed=43, vocab_size=60, mean_tokens=22),
                        p3, rows_per_row_group=50)
    append_index([p3], idx, cfg)
    s3 = open_if_changed(s2)
    assert s3 is not None and s3.doc_count == 600
    shared = {id(r) for r in s2.readers}
    assert sum(1 for r in s3.readers if id(r) in shared) == len(s2.readers)

    # union equivalence: counts, docIDs and scores equal a from-scratch
    # build over all three inputs
    idx_u = str(tmp_path / "idx_union")
    build_index([p1, p2, p3], idx_u, cfg)
    su = IndexSearcher(idx_u)
    assert su.doc_count == s3.doc_count
    assert su.sum_total_term_freq == s3.sum_total_term_freq
    _assert_same_results(s3, su)
    check_index(idx)

    # re-merge picks the appended generation up; merged serves again
    merge_index(idx, MergeConfig(n_shards=4, hot_df_threshold=10**9))
    s4 = open_searcher(idx)
    assert isinstance(s4, MergedIndexSearcher) and s4.doc_count == 600
    _assert_same_results(s4, su)


def test_append_config_mismatch_refused(ray_session, tmp_path):
    p1, p2 = _two_files(tmp_path)
    idx = str(tmp_path / "idx")
    build_index([p1], idx, BuildConfig(target_docs_per_segment=100))
    import pytest

    with pytest.raises(ValueError, match="config mismatch"):
        append_index([p2], idx, BuildConfig(analyzer="english",
                                            target_docs_per_segment=100))
    from lucene_7_x_9_x_ray.stages.build import FieldSpec

    with pytest.raises(ValueError, match="config mismatch"):
        append_index([p2], idx, BuildConfig(
            target_docs_per_segment=100,
            extra_fields=(FieldSpec("title", "title"),),
        ))


def test_compaction_after_append(ray_session, tmp_path):
    """Compaction over a multi-generation index (built + appended
    segments) preserves results and passes check_index — the
    TieredMergePolicy x NRT interplay."""
    from lucene_7_x_9_x_ray.stages.compact import CompactionPolicy, compact_index

    p1, p2 = _two_files(tmp_path)
    cfg = BuildConfig(target_docs_per_segment=75)
    idx = str(tmp_path / "idx")
    build_index([p1], idx, cfg)  # 4 segments
    append_index([p2], idx, cfg)  # +3 segments (gen 2)

    before = IndexSearcher(idx)
    res0 = [before.search(q, k=30, total_hits_threshold=1 << 30) for q in PROBES]

    m = compact_index(idx, CompactionPolicy(max_merge_at_once=4))
    assert len(m.segments) < 7
    out = check_index(idx)
    assert out["doc_count"] == 500

    after = open_if_changed(before)
    assert after is not None  # compaction replaced segments -> new gen
    for q, td0 in zip(PROBES, res0):
        td1 = after.search(q, k=30, total_hits_threshold=1 << 30)
        assert list(td0.doc_ids) == list(td1.doc_ids)
        assert np.array_equal(td0.scores, td1.scores)
