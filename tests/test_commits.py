"""Snapshot / deletion-policy tests (state/commits.py): pinning a commit
defers segment deletion through compaction AND delete-reclaim, the
snapshot reader serves the exact pre-merge results, and release sweeps
the deferred dirs."""

from __future__ import annotations

import os

import numpy as np

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index
from lucene_7_x_9_x_ray.stages.compact import (
    CompactionPolicy,
    compact_index,
    reclaim_deletes,
)
from lucene_7_x_9_x_ray.state.commits import (
    gc_unreferenced,
    list_snapshots,
    open_snapshot,
    protected_segments,
    release_snapshot,
    snapshot_commit,
)
from lucene_7_x_9_x_ray.state.livedocs import delete_docs

PROBES = [
    Q.TermQuery("t00000"),
    Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("t00002")), (Q.SHOULD, Q.TermQuery("t00030"))]
    ),
]


def _build(tmp_path):
    p = str(tmp_path / "pages.parquet")
    write_pages_parquet(
        generate_pages(300, seed=43, vocab_size=60, mean_tokens=22),
        p, rows_per_row_group=75,
    )
    idx = str(tmp_path / "idx")
    build_index([p], idx, BuildConfig(target_docs_per_segment=75))  # 4 segments
    return idx


def _results(searcher):
    return [
        (list(map(int, td.doc_ids)), [float(np.float32(s)) for s in td.scores])
        for td in (searcher.search(q, k=30, total_hits_threshold=1 << 30) for q in PROBES)
    ]


def test_snapshot_pins_segments_through_compaction(ray_session, tmp_path):
    idx = _build(tmp_path)
    before = IndexSearcher(idx)
    res0 = _results(before)
    old_segs = {s["seg_name"] for s in before.manifest.segments}

    snap = snapshot_commit(idx)
    assert protected_segments(idx) == old_segs
    compact_index(idx, CompactionPolicy(max_merge_at_once=4))

    # replaced segment dirs are DEFERRED, not deleted
    on_disk = set(os.listdir(os.path.join(idx, "segments")))
    assert old_segs <= on_disk
    # the pinned commit still serves the exact original results
    snap_searcher = open_snapshot(idx, snap)
    assert _results(snap_searcher) == res0
    # the live index moved on (fewer segments), same results
    now = IndexSearcher(idx)
    assert len(now.manifest.segments) < len(old_segs)
    assert _results(now) == res0

    # release: registry empties and the orphaned dirs are swept
    release_snapshot(idx, snap)
    assert list_snapshots(idx) == {}
    on_disk = set(os.listdir(os.path.join(idx, "segments")))
    assert not (old_segs - {s["seg_name"] for s in now.manifest.segments}) & on_disk
    assert _results(IndexSearcher(idx)) == res0


def test_snapshot_is_delete_stable_through_reclaim(ray_session, tmp_path):
    idx = _build(tmp_path)
    before = IndexSearcher(idx)
    res0 = _results(before)

    snap = snapshot_commit(idx)
    # delete a third of the docs, then reclaim (renumbers the docID space
    # and switches the tombstone generation)
    delete_docs(idx, list(range(0, 300, 3)))
    reclaim_deletes(idx, deletes_pct_threshold=0.0, force=True)

    # current index reflects the deletes; the snapshot does not
    snap_res = _results(open_snapshot(idx, snap))
    assert snap_res == res0
    now_res = _results(IndexSearcher(idx))
    assert now_res != res0

    release_snapshot(idx, snap)
    # commits dir cleaned, gc idempotent
    assert gc_unreferenced(idx) == []
    assert not any(
        f.startswith(snap) for f in os.listdir(os.path.join(idx, "commits"))
    )


def test_snapshot_before_any_deletes_is_frozen(ray_session, tmp_path):
    # regression: a snapshot taken when NO tombstone file exists yet must
    # not see deletes applied afterwards (the pinned manifest must never
    # point at the mutable live tombstone generation)
    idx = _build(tmp_path)
    res0 = _results(IndexSearcher(idx))
    snap = snapshot_commit(idx)
    delete_docs(idx, list(range(0, 300, 2)))
    assert _results(open_snapshot(idx, snap)) == res0
    assert _results(IndexSearcher(idx)) != res0
    release_snapshot(idx, snap)


def test_snapshot_ids_never_reused_after_release(ray_session, tmp_path):
    # regression: ids come from a monotonic counter — releasing an older
    # snapshot must not make the next snapshot collide with a live one
    idx = _build(tmp_path)
    s0 = snapshot_commit(idx)
    s1 = snapshot_commit(idx)
    release_snapshot(idx, s0)
    s2 = snapshot_commit(idx)
    assert len({s0, s1, s2}) == 3
    assert set(list_snapshots(idx)) == {s1, s2}
    release_snapshot(idx, s1)
    release_snapshot(idx, s2)


def test_gc_never_touches_unmanifested_segment_dirs(ray_session, tmp_path):
    # regression: gc only sweeps dirs the deletion policy deferred — a
    # completed-but-unmanifested partition (the build/append resume
    # window) must survive a release+gc
    idx = _build(tmp_path)
    stray = os.path.join(idx, "segments", "seg_inflight_999")
    os.makedirs(stray)
    with open(os.path.join(stray, "stats.json"), "w") as f:
        f.write("{}")
    snap = snapshot_commit(idx)
    compact_index(idx, CompactionPolicy(max_merge_at_once=4))
    release_snapshot(idx, snap)
    assert os.path.isdir(stray)  # untouched by the sweep
    assert gc_unreferenced(idx) == []


def test_numeric_dv_updates(ray_session, tmp_path):
    """updateNumericDocValue analogue: patched values/validity are visible
    to readers opened AFTER the update; already-open readers keep their
    generation; range reads re-admit patched docs by NEW value; norms and
    postings are untouched (scores of unfiltered queries identical)."""
    import os
    import shutil

    import numpy as np

    from lucene_7_x_9_x_ray.pipelines.flagship import build_flagship_index
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.merged import open_searcher
    from lucene_7_x_9_x_ray.state.dvupdates import update_numeric_doc_values

    base = build_flagship_index("/root/testdata/sf0.001")
    idx = str(tmp_path / "index")
    shutil.copytree(base, idx, copy_function=os.link)

    before = open_searcher(idx)
    old_vals = before.readers[0].doc_values("score_hint").copy()
    old_valid = before.readers[0].doc_values_valid("score_hint").copy()
    td_before = before.search(Q.TermQuery("table"), k=10)

    n = update_numeric_doc_values(idx, "score_hint", {0: 999, 3: 123, 5: 77})
    assert n == 3
    # last-write-wins merge on re-update
    n = update_numeric_doc_values(idx, "score_hint", {3: 124})
    assert n == 3

    after = open_searcher(idx)
    vals = after.readers[0].doc_values("score_hint")
    valid = after.readers[0].doc_values_valid("score_hint")
    assert vals[0] == 999 and vals[3] == 124 and vals[5] == 77
    # doc 0 and 3 were NULL (doc_id % 3 == 0) — update sets validity
    assert not old_valid[0] and valid[0] and valid[3]
    # already-open reader still serves the pre-update generation
    assert np.array_equal(
        before.readers[0].doc_values("score_hint"), old_vals, equal_nan=True
    )

    # range read through the pruned path honors the patch
    docs = after.readers[0].doc_values_range_docs("score_hint", 900, None, True, True)
    assert 0 in docs.tolist()
    docs2 = after.readers[0].doc_values_range_docs("score_hint", None, 130, True, True)
    assert 3 in docs2.tolist() and 5 in docs2.tolist()

    # scoring paths untouched: same top-k, same float scores
    td_after = after.search(Q.TermQuery("table"), k=10)
    assert list(map(int, td_after.doc_ids)) == list(map(int, td_before.doc_ids))
    assert [float(s) for s in td_after.scores] == [float(s) for s in td_before.scores]
