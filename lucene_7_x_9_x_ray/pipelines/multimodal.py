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
