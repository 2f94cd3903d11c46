"""BKD-analogue numeric pruning (round-2 VERDICT stretch item #9).

The docmap parquet row-group min/max footer statistics form a per-block
index; NumericRangeQuery resolves each block to the PointRangeQuery
IntersectVisitor relations (s84 search/PointRangeQuery.java:428,
util/bkd/BKDWriter.java:79): OUTSIDE blocks cost no IO, INSIDE blocks
emit docID runs without decoding values, only CROSSES blocks are read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.sources.pages import write_pages_parquet
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
from lucene_7_x_9_x_ray.state import segment as segmod


@pytest.fixture()
def ts_index(tmp_path, monkeypatch):
    """1200 docs, warc_ts strictly increasing, 8-row-group docmaps
    (DV_BLOCK_ROWS shrunk so block pruning engages at test scale)."""
    monkeypatch.setattr(segmod, "DV_BLOCK_ROWS", 75)
    n = 1200
    rng = np.random.default_rng(3)
    vocab = [f"w{i:02d}" for i in range(40)]
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa.array(
                np.arange(n) * 1_000_000, type=pa.timestamp("us")
            ),  # 1s apart
            "text": [" ".join(rng.choice(vocab, size=12)) for _ in range(n)],
            "lang": ["en"] * n,
        }
    )
    p = str(tmp_path / "pages.parquet")
    write_pages_parquet(t, p, rows_per_row_group=600)
    idx = str(tmp_path / "idx")
    build_index_local([p], idx, BuildConfig(target_docs_per_segment=600))
    return IndexSearcher(idx)


def _range_query(lo_us, hi_us):
    return Q.BooleanQuery.build(
        [(Q.MUST, Q.MatchAllDocsQuery())]
        + [(Q.FILTER, Q.NumericRangeQuery("warc_ts", lo_us, hi_us))]
    )


def test_block_pruning_counters_and_equivalence(ts_index):
    s = ts_index
    # narrow band: docs 300..449 inclusive -> inside segment 0 only
    lo, hi = 300 * 1_000_000, 449 * 1_000_000
    td = s.search(_range_query(lo, hi), k=2000, total_hits_threshold=1 << 30)
    assert sorted(int(d) for d in td.doc_ids) == list(range(300, 450))

    stats = {}
    for r in s.readers:
        for k, v in (getattr(r, "dv_prune_stats", None) or {}).items():
            stats[k] = stats.get(k, 0) + v
    # 2 segments x 8 blocks = 16; the band covers blocks 4..5 of segment 0
    # fully (75-aligned: 300..374, 375..449) and touches no others
    assert stats.get("blocks_skipped", 0) >= 12  # all of segment 1 + rest of 0
    assert stats.get("blocks_inside", 0) >= 2  # fully-covered blocks decode nothing
    assert stats.get("blocks_scanned", 0) <= 2

    # unbounded below / above, exclusive bounds — same answers as a
    # full-column mask
    vals = np.concatenate([r.doc_values("warc_ts") for r in s.readers])
    for q_lo, q_hi, incl_lo, incl_hi in [
        (None, 100 * 1_000_000, True, False),
        (1100 * 1_000_000, None, False, True),
        (599 * 1_000_000, 600 * 1_000_000, True, True),
        (0, 0, True, True),
        (2000 * 1_000_000, None, True, True),  # empty
    ]:
        q = Q.BooleanQuery.build(
            [(Q.MUST, Q.MatchAllDocsQuery())]
            + [(Q.FILTER, Q.NumericRangeQuery("warc_ts", q_lo, q_hi,
                                              include_lower=incl_lo,
                                              include_upper=incl_hi))]
        )
        td = s.search(q, k=2000, total_hits_threshold=1 << 30)
        mask = np.ones(len(vals), dtype=bool)
        if q_lo is not None:
            mask &= (vals >= q_lo) if incl_lo else (vals > q_lo)
        if q_hi is not None:
            mask &= (vals <= q_hi) if incl_hi else (vals < q_hi)
        want = sorted(np.flatnonzero(mask).tolist())
        assert sorted(int(d) for d in td.doc_ids) == want, (q_lo, q_hi)


def test_merged_reader_prunes_blocks(ts_index, tmp_path):
    """The merged searcher routes ranges through the same per-segment
    block index (global docIDs, pruning counters accumulate)."""
    import ray  # noqa: F401  (merge_index needs a live session)
    from lucene_7_x_9_x_ray.search.merged import open_searcher
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index_local

    idx = ts_index.index_dir
    merge_index_local(idx, MergeConfig(n_shards=2, hot_df_threshold=10**9))
    ms = open_searcher(idx)
    lo, hi = 300 * 1_000_000, 449 * 1_000_000
    td = ms.search(_range_query(lo, hi), k=2000, total_hits_threshold=1 << 30)
    assert sorted(int(d) for d in td.doc_ids) == list(range(300, 450))
    st = ms.readers[0].dv_prune_stats
    assert st.get("blocks_skipped", 0) >= 12
