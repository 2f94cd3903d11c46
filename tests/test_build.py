"""Build pipeline: planning determinism, resume-from-checkpoint, extraction
invariant, manifest commit semantics (FIXTURES.md F7)."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from lucene_7_x_9_x_ray.sources.pages import extract_text, generate_pages, wrap_html, write_pages_parquet
from lucene_7_x_9_x_ray.stages.build import (
    BuildConfig,
    build_index_local,
    build_one_segment,
    plan_partitions,
)
from lucene_7_x_9_x_ray.state.manifest import IndexManifest


@pytest.fixture(scope="module")
def pages_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pages")
    t = generate_pages(1000, seed=5, vocab_size=300, mean_tokens=40)
    return write_pages_parquet(t, str(tmp / "pages.parquet"), rows_per_row_group=100)


def test_plan_is_deterministic_and_covers_input(pages_file):
    cfg = BuildConfig(target_docs_per_segment=250)
    a = plan_partitions([pages_file], cfg)
    b = plan_partitions([pages_file], cfg)
    assert a == b
    assert sum(s["n_rows"] for s in a) == 1000
    # doc_base prefix sums consistent
    base = 0
    for s in a:
        assert s["doc_base"] == base
        base += s["n_rows"]
    # row-group ranges tile the file exactly
    md = pq.ParquetFile(pages_file).metadata
    covered = sorted((s["rg_start"], s["rg_end"]) for s in a)
    assert covered[0][0] == 0 and covered[-1][1] == md.num_row_groups
    for (s1, e1), (s2, _) in zip(covered, covered[1:]):
        assert e1 == s2


def test_extraction_byte_identity(pages_file):
    """Per-row north-rule invariant: html -> text is byte-identical."""
    t = pq.read_table(pages_file, columns=["html", "text"])
    for h, x in zip(t["html"].to_pylist()[:50], t["text"].to_pylist()[:50]):
        assert extract_text(h) == x
    # and stable: same bytes in, same bytes out
    h0 = wrap_html("sömé ünïcode 漢字", "T")
    assert extract_text(h0) == extract_text(h0) == "sömé ünïcode 漢字"


def test_build_with_verify_extract(pages_file, tmp_path):
    man = build_index_local(
        [pages_file], str(tmp_path / "idx"),
        BuildConfig(target_docs_per_segment=300, verify_extract=True),
    )
    assert man.doc_count == 1000
    assert len(man.segments) == 4


def test_resume_skips_completed_partitions(pages_file, tmp_path):
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(target_docs_per_segment=250)
    man1 = build_index_local([pages_file], idx, cfg)
    mtimes = {
        d: os.path.getmtime(os.path.join(d, "postings.bin"))
        for d in glob.glob(os.path.join(idx, "segments", "seg_*"))
    }
    man2 = build_index_local([pages_file], idx, cfg)  # re-run
    assert all(s["resumed"] for s in man2.segments)
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(d, "postings.bin")) == m  # untouched
    assert man1.doc_count == man2.doc_count
    assert [s["seg_name"] for s in man1.segments] == [s["seg_name"] for s in man2.segments]


def test_resume_after_partial_build_matches_clean(pages_file, tmp_path):
    """Kill-after-1-partition fixture (F7): partial + resume == clean."""
    cfg = BuildConfig(target_docs_per_segment=250)
    clean = str(tmp_path / "clean")
    partial = str(tmp_path / "partial")
    build_index_local([pages_file], clean, cfg)

    specs = plan_partitions([pages_file], cfg)
    os.makedirs(os.path.join(partial, "segments"), exist_ok=True)
    build_one_segment(specs[0], cfg, os.path.join(partial, "segments"))
    # no manifest yet: the "crash" happened before commit
    assert not os.path.exists(os.path.join(partial, "manifest.json"))
    man = build_index_local([pages_file], partial, cfg)  # resume
    assert man.segments[0]["resumed"] and not man.segments[1]["resumed"]

    for seg in ("seg_000000", "seg_000001"):
        a = open(os.path.join(clean, "segments", seg, "postings.bin"), "rb").read()
        b = open(os.path.join(partial, "segments", seg, "postings.bin"), "rb").read()
        assert a == b  # byte-identical artifacts
    mc = IndexManifest.load(clean)
    mp = IndexManifest.load(partial)
    assert mc.doc_count == mp.doc_count
    assert mc.sum_total_term_freq == mp.sum_total_term_freq


def test_stale_checkpoint_is_rebuilt(pages_file, tmp_path):
    """A segment whose lineage doesn't match its spec is NOT reused."""
    cfg = BuildConfig(target_docs_per_segment=250)
    idx = str(tmp_path / "idx")
    build_index_local([pages_file], idx, cfg)
    # tamper: change the recorded lineage of segment 1
    stats_path = os.path.join(idx, "segments", "seg_000001", "stats.json")
    st = json.load(open(stats_path))
    st["lineage_rg_start"] = 999
    json.dump(st, open(stats_path, "w"))
    specs = plan_partitions([pages_file], cfg)
    out = build_one_segment(specs[1], cfg, os.path.join(idx, "segments"))
    # the tampered dir already exists, so the rebuild keeps the committed
    # winner (concurrent-writer rule) — but it must NOT report resumed
    assert not out.resumed


def test_manifest_lists_segments_in_doc_base_order(pages_file, tmp_path):
    man = build_index_local(
        [pages_file], str(tmp_path / "idx"), BuildConfig(target_docs_per_segment=300)
    )
    bases = [s["doc_base"] for s in man.segments]
    assert bases == sorted(bases)
    assert man.sum_total_term_freq == sum(s["sum_total_term_freq"] for s in man.segments)


def test_ray_build_matches_local(pages_file, tmp_path, ray_session):
    """The distributed build produces byte-identical artifacts to the
    single-process build (determinism under Ray scheduling)."""
    from lucene_7_x_9_x_ray.stages.build import build_index

    cfg = BuildConfig(target_docs_per_segment=250)
    local = str(tmp_path / "local")
    dist = str(tmp_path / "dist")
    build_index_local([pages_file], local, cfg)
    man = build_index([pages_file], dist, cfg)
    assert man.doc_count == 1000
    for seg in [s["seg_name"] for s in man.segments]:
        a = open(os.path.join(local, "segments", seg, "postings.bin"), "rb").read()
        b = open(os.path.join(dist, "segments", seg, "postings.bin"), "rb").read()
        assert a == b
        sa = json.load(open(os.path.join(local, "segments", seg, "stats.json")))
        sb = json.load(open(os.path.join(dist, "segments", seg, "stats.json")))
        assert sa["lineage_fingerprint"] == sb["lineage_fingerprint"]


def test_incremental_append_preserves_docids(ray_session, tmp_path):
    """Appending a later-sorting input file resumes existing segments
    unchanged (lineage docIDs stable) and indexes only the new file —
    the NRT/incremental-build analogue of segments_N append."""
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index
    from lucene_7_x_9_x_ray.state.manifest import IndexManifest

    p1 = str(tmp_path / "pages_000.parquet")
    p2 = str(tmp_path / "pages_001.parquet")
    write_pages_parquet(generate_pages(200, seed=1, vocab_size=50, mean_tokens=20), p1,
                        rows_per_row_group=100)
    write_pages_parquet(generate_pages(150, seed=2, vocab_size=50, mean_tokens=20), p2,
                        rows_per_row_group=100)

    idx = str(tmp_path / "idx")
    cfg = BuildConfig(target_docs_per_segment=100)
    m1 = build_index([p1], idx, cfg)
    assert m1.doc_count == 200
    m2 = build_index([p1, p2], idx, cfg)
    assert m2.doc_count == 350
    resumed = [s for s in m2.segments if s.get("resumed")]
    fresh = [s for s in m2.segments if not s.get("resumed")]
    assert len(resumed) == 2 and len(fresh) == 2  # p1's segments untouched
    bases = [s["doc_base"] for s in sorted(m2.segments, key=lambda s: s["doc_base"])]
    assert bases == [0, 100, 200, 300]
