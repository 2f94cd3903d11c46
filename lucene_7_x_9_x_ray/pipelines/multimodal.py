"""Multimodal column plumbing: opaque binary payloads through actor-pool
map_batches stages.

The page table's ``html:binary`` column stands in for image/audio/video
payloads: the stage below shows the real Ray-side plumbing (schema, actor
pool with per-actor init, small batch sizes for large binaries, typed
output layout) while the actual media decode is stubbed — the container
has no image/audio libraries, so ``decode_real=True`` raises
NotImplementedError and the default path computes deterministic fake
features from the payload bytes (hash-derived, SQL-oracle-checkable).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.hashing import md5_lower64, md5_upper64
from .dedup import _to_table

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)

MEDIA_BATCH_SIZE = 64  # large-binary stages keep batches small


class MediaFeatureStage:
    """Actor-pool stage: 'decode' binary payloads and emit typed metadata.

    __init__ = the once-per-actor model/codec load (stubbed); __call__ =
    per-batch vectorized feature extraction. For a real image pipeline the
    fake block is replaced by the decode; everything else stays.
    """

    def __init__(self, decode_real: bool = False):
        self.decode_real = decode_real
        self.model = "fake-decoder-v1"  # model-load stand-in, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_real:
            raise NotImplementedError(
                "real media decode needs image/audio libs not present in this "
                "container; wire PIL/ffmpeg here and delete the fake path"
            )
        import numpy as np
        import pyarrow.compute as pc

        html = batch["html"].combine_chunks()
        nbytes = pc.binary_length(html).cast(pa.int64())
        # payloads are ASCII html by construction: Arrow regex kernel for
        # the title; per-payload md5 stays the hashlib helper (C digest,
        # one call per row — the only non-kernel step of the stub)
        ext = pc.extract_regex(html.cast(pa.string()), r"<title>(?P<t>[^<]*)</title>")
        titles = pc.coalesce(pc.struct_field(ext, "t"), "")
        payloads = html.to_pylist()
        lo = np.fromiter(
            (md5_lower64(b) for b in payloads), dtype=np.uint64, count=len(payloads)
        )
        hi = np.fromiter(
            (md5_upper64(b) for b in payloads), dtype=np.uint64, count=len(payloads)
        )
        # doc_id = the trailing numeric path element, tolerant of any URL
        # prefix shape (the page fixture uses ".../d/{doc_id}")
        doc_ids = pc.struct_field(
            pc.extract_regex(batch["url"], r"/(?P<id>\d+)$"), "id"
        ).cast(pa.int64())
        return pa.table(
            {
                "doc_id": doc_ids,
                "n_bytes": nbytes,
                "title": titles,
                "fake_w": pa.array((64 + (lo % 1024)).astype(np.int64), pa.int64()),
                "fake_h": pa.array((64 + (hi % 1024)).astype(np.int64), pa.int64()),
            }
        )


def q_multimodal_meta(sf_dir: str) -> pa.Table:
    """Decode-stub features over the derived page payloads."""
    import ray.data as rd

    from .flagship import build_flagship_index, _cache_dir
    import os

    build_flagship_index(sf_dir)  # ensures pages.parquet exists
    pages_path = os.path.join(_cache_dir(sf_dir), "pages.parquet")
    ds = rd.read_parquet(pages_path, columns=["url", "html"]).map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=2,
    )
    return _to_table(ds)


def oracle_multimodal_sql(relation: str = "documents") -> str:
    """The page payload is reconstructible from documents (wrap_html), so
    the fake features are SQL-expressible: md5_number_lower/upper of the
    page string reproduce the byte hashes (ASCII payloads)."""
    from ..sources.pages import TITLE_TOKENS

    title = (
        f"array_to_string(list_slice(string_split(text, ' '), 1, {TITLE_TOKENS}), ' ')"
    )
    html = (
        f"'<html><head><title>' || {title} || '</title></head><body>' || text || '</body></html>'"
    )
    return f"""SELECT doc_id,
       CAST(octet_length(encode({html})) AS BIGINT) AS n_bytes,
       {title} AS title,
       CAST(64 + md5_number_lower({html}) % 1024 AS BIGINT) AS fake_w,
       CAST(64 + md5_number_upper({html}) % 1024 AS BIGINT) AS fake_h
FROM {relation}"""


class MediaResizeStage:
    """Actor-pool resize stage: aspect-preserving fit into a target box.

    Real plumbing (per-actor init, small batches, typed output), stubbed
    pixels: the input dimensions are the decode stub's hash-derived
    (fake_w, fake_h) and the stage computes the exact letterbox geometry a
    real resampler would use — scale = min(tw/w, th/h) in DOUBLE, output
    dims floor-clamped to >= 1. ``decode_real=True`` raises like the
    decode stub."""

    def __init__(self, target_w: int = 256, target_h: int = 256,
                 decode_real: bool = False):
        if decode_real:
            raise NotImplementedError(
                "real resampling needs image libs not present here"
            )
        self.tw, self.th = int(target_w), int(target_h)
        self.kernel = "fake-lanczos3"  # resampler-load stand-in

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        feats = MediaFeatureStage()(batch)
        w = feats["fake_w"].to_numpy().astype(np.float64)
        h = feats["fake_h"].to_numpy().astype(np.float64)
        scale = np.minimum(self.tw / w, self.th / h)
        out_w = np.maximum(1, np.floor(w * scale)).astype(np.int64)
        out_h = np.maximum(1, np.floor(h * scale)).astype(np.int64)
        return pa.table(
            {
                "doc_id": feats["doc_id"],
                "in_w": feats["fake_w"],
                "in_h": feats["fake_h"],
                "out_w": pa.array(out_w, pa.int64()),
                "out_h": pa.array(out_h, pa.int64()),
            }
        )


FRAME_SAMPLE_TARGET = 8   # frames to keep per payload
FRAME_BYTES_PER_FRAME = 97


class FrameSampleStage:
    """Actor-pool frame-sampling stage — the row FAN-OUT multimodal shape
    (one input payload -> many frame rows, the flat_map contract). The
    'video' length derives from the payload size (1 + n_bytes // 97
    frames), sampling keeps every step-th frame with step = max(1,
    n_frames // target), and each emitted frame carries a deterministic
    signature — a real pipeline would emit the decoded frame tensor with
    identical plumbing."""

    def __init__(self, target: int = FRAME_SAMPLE_TARGET,
                 decode_real: bool = False):
        if decode_real:
            raise NotImplementedError(
                "real frame extraction needs ffmpeg, not present here"
            )
        self.target = int(target)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        html = batch["html"].combine_chunks()
        nbytes = pc.binary_length(html).cast(pa.int64()).to_numpy()
        doc_ids = pc.struct_field(
            pc.extract_regex(batch["url"], r"/(?P<id>\d+)$"), "id"
        ).cast(pa.int64()).to_numpy()
        n_frames = 1 + nbytes // FRAME_BYTES_PER_FRAME
        step = np.maximum(1, n_frames // self.target)
        n_keep = (n_frames + step - 1) // step  # frames 0, step, 2*step, ...
        parent = np.repeat(np.arange(len(doc_ids)), n_keep)
        # per-row ranks 0..n_keep-1, vectorized (arange minus start offset)
        starts = np.zeros(len(doc_ids), dtype=np.int64)
        np.cumsum(n_keep[:-1], out=starts[1:])
        rank = np.arange(int(n_keep.sum()), dtype=np.int64) - starts[parent]
        frame_idx = rank * step[parent]
        d = doc_ids[parent]
        sig = (d * 1_000_003 + frame_idx) % 2_147_483_647
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int64()),
                "frame_sig": pa.array(sig, pa.int64()),
            }
        )


def _pages_ds(sf_dir: str):
    import os

    import ray.data as rd

    from .flagship import _cache_dir, build_flagship_index

    build_flagship_index(sf_dir)
    pages_path = os.path.join(_cache_dir(sf_dir), "pages.parquet")
    return rd.read_parquet(pages_path, columns=["url", "html"])


def q_multimodal_resize(sf_dir: str) -> pa.Table:
    """Resize-planning stage over the page payloads: (doc_id, in_w, in_h,
    out_w, out_h)."""
    ds = _pages_ds(sf_dir).map_batches(
        MediaResizeStage, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=2,
    )
    return _to_table(ds)


def q_multimodal_frames(sf_dir: str) -> pa.Table:
    """Frame-sampling fan-out over the page payloads: (doc_id, frame_idx,
    frame_sig) — one row per kept frame."""
    ds = _pages_ds(sf_dir).map_batches(
        FrameSampleStage, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=2,
    )
    return _to_table(ds)


def oracle_multimodal_resize_sql(relation: str = "documents") -> str:
    """Mirror of MediaResizeStage over the reconstructed payload: the same
    DOUBLE letterbox arithmetic on the hash-derived input dims."""
    from ..sources.pages import TITLE_TOKENS

    title = (
        f"array_to_string(list_slice(string_split(text, ' '), 1, {TITLE_TOKENS}), ' ')"
    )
    html = (
        f"'<html><head><title>' || {title} || '</title></head><body>' || text || '</body></html>'"
    )
    return f"""WITH dims AS (
  SELECT doc_id,
         CAST(64 + md5_number_lower({html}) % 1024 AS BIGINT) AS in_w,
         CAST(64 + md5_number_upper({html}) % 1024 AS BIGINT) AS in_h
  FROM {relation})
SELECT doc_id, in_w, in_h,
       CAST(greatest(1, floor(in_w * least(256.0 / in_w, 256.0 / in_h))) AS BIGINT) AS out_w,
       CAST(greatest(1, floor(in_h * least(256.0 / in_w, 256.0 / in_h))) AS BIGINT) AS out_h
FROM dims"""


def oracle_multimodal_frames_sql(relation: str = "documents") -> str:
    """Mirror of FrameSampleStage: n_frames from the payload byte length,
    every step-th frame via generate_series, signature arithmetic."""
    from ..sources.pages import TITLE_TOKENS

    title = (
        f"array_to_string(list_slice(string_split(text, ' '), 1, {TITLE_TOKENS}), ' ')"
    )
    html = (
        f"'<html><head><title>' || {title} || '</title></head><body>' || text || '</body></html>'"
    )
    return f"""WITH v AS (
  SELECT doc_id,
         1 + octet_length(encode({html})) // {FRAME_BYTES_PER_FRAME} AS n_frames
  FROM {relation}),
s AS (SELECT doc_id, n_frames,
             greatest(1, n_frames // {FRAME_SAMPLE_TARGET}) AS step FROM v)
SELECT doc_id,
       CAST(unnest(generate_series(0, n_frames - 1, CAST(step AS BIGINT))) AS BIGINT) AS frame_idx,
       CAST((doc_id * 1000003 + unnest(generate_series(0, n_frames - 1, CAST(step AS BIGINT)))) % 2147483647 AS BIGINT) AS frame_sig
FROM s"""
