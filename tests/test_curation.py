"""Curation-op tests: n-gram window construction, planted contamination,
sampling determinism, chunk geometry, and gate-vs-oracle parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_7_x_9_x_ray.pipelines import curation as C

SF = "/root/testdata/sf0.001"


def test_ngram_strings_windows():
    toks = np.asarray(["a", "b", "c", "d"], dtype=object)
    assert list(C._ngram_strings(toks, 2)) == ["a b", "b c", "c d"]
    assert list(C._ngram_strings(toks, 4)) == ["a b c d"]
    assert len(C._ngram_strings(toks, 5)) == 0


def test_row_ngram_hashes_respect_doc_boundaries():
    batch = pa.table({"doc_id": [0, 1], "text": ["a b c", "c d e"]})
    hashes, parents = C._row_ngram_hashes(batch, 3)
    # one 3-gram per doc; the cross-boundary windows ("b c c", "c c d")
    # must not appear
    assert list(parents) == [0, 1]
    from lucene_7_x_9_x_ray.functions.hashing import md5_lower64

    assert hashes[0] == np.uint64(md5_lower64("a b c"))
    assert hashes[1] == np.uint64(md5_lower64("c d e"))


def test_decontaminate_flags_planted_overlap(ray_session, tmp_path):
    """A corpus doc sharing one 5-gram with a benchmark doc flags
    contaminated; unrelated docs do not."""
    import pyarrow.parquet as pq

    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = {
        "doc_id": [0, 1, 2],  # doc 0: benchmark (0 % 7 == 0)
        "text": [
            bench_text,
            "xx alpha beta gamma delta epsilon yy",  # shares a 5-gram
            "totally unrelated words here now okay",
        ],
        "lang": ["en"] * 3,
    }
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table(rows), str(sf / "documents.parquet"))
    got = C.q_decontaminate(str(sf))
    flags = dict(zip(got["doc_id"].to_pylist(), got["contaminated"].to_pylist()))
    assert flags == {1: True, 2: False}


def test_stratified_sample_deterministic(ray_session):
    a = C.q_stratified_sample(SF)
    b = C.q_stratified_sample(SF)
    key = [("doc_id", "ascending")]
    assert a.sort_by(key).equals(b.sort_by(key))
    # zh keeps everything, de keeps ~25%
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
    n_zh = pc.sum(pc.equal(docs["lang"], "zh")).as_py()
    got_zh = pc.sum(pc.equal(a["lang"], "zh")).as_py()
    assert got_zh == n_zh
    n_de = pc.sum(pc.equal(docs["lang"], "de")).as_py()
    got_de = pc.sum(pc.equal(a["lang"], "de")).as_py()
    assert 0 < got_de < n_de


def test_chunk_windows_geometry(ray_session, tmp_path):
    import pyarrow.parquet as pq

    text_long = " ".join(f"w{i}" for i in range(C.CHUNK_W + 5))
    rows = {"doc_id": [10, 11], "text": [text_long, "short doc"], "lang": ["en", "en"]}
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table(rows), str(sf / "documents.parquet"))
    got = C.q_chunk_windows(str(sf)).sort_by(
        [("doc_id", "ascending"), ("chunk_id", "ascending")]
    )
    rows_out = got.to_pylist()
    assert [(r["doc_id"], r["chunk_id"], r["n_tokens"]) for r in rows_out] == [
        (10, 0, C.CHUNK_W),
        (10, 1, 5),
        (11, 0, 2),
    ]
    import hashlib

    assert rows_out[1]["chunk_md5"] == hashlib.md5(
        " ".join(f"w{i}" for i in range(C.CHUNK_W, C.CHUNK_W + 5)).encode()
    ).hexdigest()


def test_curation_gates_oracle_parity(ray_session):
    import duckdb as _dd

    con = _dd.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    for qfn, osql, key in [
        (C.q_decontaminate, C.oracle_decontaminate_sql(), [("doc_id", "ascending")]),
        (C.q_stratified_sample, C.oracle_stratified_sample_sql(), [("doc_id", "ascending")]),
        (
            C.q_chunk_windows,
            C.oracle_chunk_windows_sql(),
            [("doc_id", "ascending"), ("chunk_id", "ascending")],
        ),
    ]:
        got = qfn(SF)
        want = con.sql(osql).arrow()
        assert got.sort_by(key).equals(want.cast(got.schema).sort_by(key))
        assert got.num_rows > 0


def test_pack_sequences_prefix_sum_and_oracle(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # hand-checkable geometry: SEQ_LEN=128; docs of 100, 60, 200 tokens
    texts = [" ".join(f"t{i}" for i in range(n)) for n in (100, 60, 200)]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "text": texts}), str(sf / "documents.parquet")
    )
    got = C.q_pack_sequences(str(sf)).sort_by([("doc_id", "ascending")]).to_pylist()
    assert [(r["tok_start"], r["n_tokens"], r["seq_first"], r["seq_last"]) for r in got] == [
        (0, 100, 0, 0),      # tokens 0-99 inside seq 0
        (100, 60, 0, 1),     # 100-159 straddles the 128 boundary
        (160, 200, 1, 2),    # 160-359 spans seqs 1-2
    ]

    import duckdb as _dd

    con = _dd.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    got2 = C.q_pack_sequences(SF)
    want = con.sql(C.oracle_pack_sequences_sql()).arrow()
    key = [("doc_id", "ascending")]
    assert got2.sort_by(key).equals(want.cast(got2.schema).sort_by(key))
    # packing is gapless: sum of lengths == final offset + final length
    rows = got2.sort_by(key).to_pylist()
    assert rows[-1]["tok_start"] + rows[-1]["n_tokens"] == sum(r["n_tokens"] for r in rows)


def test_pack_sequences_rejects_unsorted_blocks(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": [5, 3], "text": ["a b", "c d"]}),
        str(sf / "documents.parquet"),
    )
    with pytest.raises(Exception, match="doc_id-ordered"):
        C.q_pack_sequences(str(sf))


def test_source_caps_combiner_and_oracle(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # source s0 has cap+3 docs interleaved with s1's — the kept set must be
    # the cap lowest doc_ids of s0 plus all of s1
    cap = C.PER_SOURCE_CAP
    n0 = cap + 3
    # s0: every even doc_id (n0 of them, over the cap); s1: the first 5 odd
    # doc_ids only (under the cap)
    doc_ids = [i for i in range(2 * n0) if i % 2 == 0 or i < 10]
    sources = ["s0" if i % 2 == 0 else "s1" for i in doc_ids]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": doc_ids, "source": sources, "text": ["x"] * len(doc_ids)}),
        str(sf / "documents.parquet"),
    )
    got = C.q_source_caps(str(sf)).sort_by([("doc_id", "ascending")]).to_pylist()
    kept0 = [r["doc_id"] for r in got if r["source"] == "s0"]
    kept1 = [r["doc_id"] for r in got if r["source"] == "s1"]
    assert kept0 == [i for i in doc_ids if i % 2 == 0][:cap]
    assert kept1 == [1, 3, 5, 7, 9]  # under the cap: all kept

    import duckdb as _dd

    con = _dd.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    got2 = C.q_source_caps(SF)
    want = con.sql(C.oracle_source_caps_sql()).arrow()
    key = [("doc_id", "ascending")]
    assert got2.sort_by(key).equals(want.cast(got2.schema).sort_by(key))
    assert got2.num_rows > 0


def test_corpus_to_sequences_composition(ray_session):
    """The composed filter->pack pipeline: survivors pack gaplessly in
    doc_id order and match the SQL mirror exactly."""
    import duckdb as _dd

    got = C.q_corpus_to_sequences(SF).sort_by([("doc_id", "ascending")])
    con = _dd.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    want = con.sql(C.oracle_corpus_to_sequences_sql()).arrow()
    assert got.equals(want.cast(got.schema).sort_by([("doc_id", "ascending")]))
    rows = got.to_pylist()
    assert 0 < len(rows) < 500  # the filter actually dropped documents
    # gapless packing over survivors
    assert rows[0]["tok_start"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["tok_start"] == a["tok_start"] + a["n_tokens"]


def test_mixture_sample_hits_target_shares(tmp_path, ray_session):
    """The water-level rates keep the binding source whole (rate 1.0) and
    bring every source's EXPECTED sampled token mass to its target share;
    the keep set is deterministic across re-runs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_7_x_9_x_ray.pipelines import curation

    rng = np.random.default_rng(13)
    rows = []
    # src0 (head, weight 3) has FEW tokens -> binding; src9 (tail) has many
    for i in range(40):
        rows.append((i, "src0", " ".join(["a"] * int(rng.integers(5, 10)))))
    for i in range(40, 400):
        rows.append((i, "src9", " ".join(["b"] * int(rng.integers(20, 40)))))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": [r[1] for r in rows],
            "text": [r[2] for r in rows],
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet")
    kept = curation.q_mixture_sample(sf)
    kept2 = curation.q_mixture_sample(sf)
    a = sorted(kept.to_pylist(), key=lambda r: r["doc_id"])
    assert a == sorted(kept2.to_pylist(), key=lambda r: r["doc_id"])  # deterministic
    by_src = {s: [r["doc_id"] for r in a if r["source"] == s] for s in ("src0", "src9")}
    # binding head source keeps EVERYTHING (rate 1.0)
    assert len(by_src["src0"]) == 40
    # tail source downsamples: expected rate = (tok0*wt/3) * 1/(wt*tok9/1)
    tok0 = sum(len(r[2].split()) for r in rows if r[1] == "src0")
    tok9 = sum(len(r[2].split()) for r in rows if r[1] == "src9")
    expected_rate = (tok0 / 3.0) / tok9
    got_rate = len(by_src["src9"]) / 360
    assert abs(got_rate - expected_rate) < 0.1  # hash-threshold concentration
