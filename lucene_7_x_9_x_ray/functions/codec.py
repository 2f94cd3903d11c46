"""Block postings codec: docID-delta FOR bit-packing + block-max impacts.

Behavioral reference (semantics re-created, storage redesigned for Arrow):
- 128-entry packed blocks, fixed width per block:
  solr-8.4.0/lucene/core/.../codecs/lucene84/ForUtil.java:31-34 (BLOCK_SIZE).
- Delta-encode strictly-increasing docIDs then pack; all-1 deltas collapse
  to a zero-width marker: ForDeltaUtil.java:57-93.
- Tail (< 128 remaining) postings: the reference uses VInts
  (Lucene84PostingsWriter.java:374-387); we pack the tail at its own fixed
  width instead — same compression role, simpler random access. Deviation
  documented here and in SURVEY.md §2.7.
- Per-block competitive (freq, norm) impacts = pareto frontier (higher freq
  AND lower norm dominate): CompetitiveImpactAccumulator.java:77-129.
- Multi-level skip lists (Lucene84SkipWriter.java:151-203) are replaced by a
  flat per-block last_doc array — O(log nblocks) `advance` via searchsorted,
  which beats pointer-chasing skips in a columnar layout.

All encode/decode paths are numpy-vectorized (np.packbits/np.unpackbits with
little-endian bit order); no Python loop over postings, only over blocks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "BLOCK_SIZE",
    "EncodedPostings",
    "encode_postings",
    "decode_docs",
    "decode_freqs",
    "compute_impacts",
    "block_bounds",
]

BLOCK_SIZE = 128  # ForUtil.BLOCK_SIZE


def _pack_block(values: np.ndarray, width: int) -> bytes:
    """Bit-pack non-negative ints at `width` bits each (<= 63, so docIDs up
    to 10^12-scale corpora fit), little-endian bit order."""
    if width == 0:
        return b""
    v = values.astype(np.uint64)
    bits = (v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)
    return np.packbits(bits.astype(np.uint8).ravel(), bitorder="little").tobytes()


def _unpack_block(buf: memoryview, count: int, width: int) -> np.ndarray:
    """Inverse of _pack_block -> uint64[count]."""
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    nbytes = (count * width + 7) // 8
    raw = np.frombuffer(buf[:nbytes], dtype=np.uint8)
    bits = np.unpackbits(raw, bitorder="little")[: count * width]
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits.reshape(count, width).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64
    )


def _packed_nbytes(counts: np.ndarray, widths: np.ndarray) -> np.ndarray:
    return (counts.astype(np.int64) * widths.astype(np.int64) + 7) // 8


def block_bounds(doc_freq: int) -> tuple[int, np.ndarray]:
    """(num_blocks, per-block counts) for a posting list of length doc_freq."""
    nblocks = (doc_freq + BLOCK_SIZE - 1) // BLOCK_SIZE
    counts = np.full(nblocks, BLOCK_SIZE, dtype=np.int64)
    tail = doc_freq % BLOCK_SIZE
    if tail:
        counts[-1] = tail
    return nblocks, counts


def compute_impacts(freqs: np.ndarray, norms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pareto frontier of (freq, norm) pairs for one block.

    A pair is competitive iff no other pair has freq >= AND norm <= it
    (CompetitiveImpactAccumulator semantics). Returns (freqs asc, norms asc),
    deduplicated.
    """
    order = np.lexsort((norms, -freqs.astype(np.int64)))  # freq desc, norm asc
    f_sorted = freqs[order]
    n_sorted = norms[order].astype(np.int64)
    running_min = np.minimum.accumulate(n_sorted)
    first = np.ones(len(order), dtype=bool)
    first[1:] = n_sorted[1:] < running_min[:-1]
    keep_f = f_sorted[first][::-1].astype(np.int32)
    keep_n = n_sorted[first][::-1].astype(np.uint8)
    return keep_f, keep_n


@dataclass
class EncodedPostings:
    """One term's encoded posting list (all fields -> binary parquet cells)."""

    doc_freq: int
    total_term_freq: int
    docs_blob: bytes
    freqs_blob: bytes
    last_docs: bytes  # int64 LE per block
    doc_widths: bytes  # uint8 per block
    freq_widths: bytes  # uint8 per block
    imp_counts: bytes  # uint8 per block
    imp_freqs: bytes  # int32 LE, concatenated frontiers
    imp_norms: bytes  # uint8, concatenated frontiers


def encode_postings(
    docs: np.ndarray, freqs: np.ndarray, norms: np.ndarray
) -> EncodedPostings:
    """Encode one term's postings.

    docs: strictly-increasing segment-local docIDs (int64/int32)
    freqs: per-doc term frequency (>= 1)
    norms: per-doc norm byte (uint8), aligned with docs (for impacts)
    """
    df = len(docs)
    assert df > 0
    docs = np.asarray(docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.uint8)

    deltas = np.empty(df, dtype=np.int64)
    deltas[0] = docs[0] + 1  # delta from virtual previous doc -1
    np.subtract(docs[1:], docs[:-1], out=deltas[1:])
    deltas -= 1  # deltas >= 1 always; store delta-1 so dense runs pack to width 0

    nblocks, counts = block_bounds(df)
    starts = np.zeros(nblocks, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])

    doc_parts: list[bytes] = []
    freq_parts: list[bytes] = []
    doc_widths = np.empty(nblocks, dtype=np.uint8)
    freq_widths = np.empty(nblocks, dtype=np.uint8)
    last_docs = np.empty(nblocks, dtype=np.int64)
    imp_counts = np.empty(nblocks, dtype=np.uint8)
    imp_f_parts: list[np.ndarray] = []
    imp_n_parts: list[np.ndarray] = []

    fm1 = freqs - 1
    for bi in range(nblocks):
        s, c = starts[bi], counts[bi]
        d = deltas[s : s + c]
        f = fm1[s : s + c]
        dw = int(d.max()).bit_length()
        fw = int(f.max()).bit_length()
        doc_widths[bi] = dw
        freq_widths[bi] = fw
        doc_parts.append(_pack_block(d, dw))
        freq_parts.append(_pack_block(f, fw))
        last_docs[bi] = docs[s + c - 1]
        kf, kn = compute_impacts(freqs[s : s + c].astype(np.int32), norms[s : s + c])
        imp_counts[bi] = len(kf)
        imp_f_parts.append(kf)
        imp_n_parts.append(kn)

    return EncodedPostings(
        doc_freq=df,
        total_term_freq=int(freqs.sum()),
        docs_blob=b"".join(doc_parts),
        freqs_blob=b"".join(freq_parts),
        last_docs=last_docs.tobytes(),
        doc_widths=doc_widths.tobytes(),
        freq_widths=freq_widths.tobytes(),
        imp_counts=imp_counts.tobytes(),
        imp_freqs=np.concatenate(imp_f_parts).astype(np.int32).tobytes(),
        imp_norms=np.concatenate(imp_n_parts).astype(np.uint8).tobytes(),
    )


def encode_positions(pos_stream: np.ndarray, freqs: np.ndarray) -> tuple[bytes, int]:
    """Encode one term's concatenated per-doc token positions.

    pos_stream holds each posting's positions ascending, doc after doc
    (length == total_term_freq); deltas restart at every doc boundary
    (Lucene84PostingsWriter position deltas). Returns (packed bytes, width).
    """
    if len(pos_stream) == 0:
        return b"", 0
    pos_stream = np.asarray(pos_stream, dtype=np.int64)
    deltas = np.empty(len(pos_stream), dtype=np.int64)
    deltas[0] = pos_stream[0]
    np.subtract(pos_stream[1:], pos_stream[:-1], out=deltas[1:])
    starts = np.zeros(len(freqs), dtype=np.int64)
    np.cumsum(np.asarray(freqs, dtype=np.int64)[:-1], out=starts[1:])
    deltas[starts] = pos_stream[starts]  # delta restarts at doc boundaries
    width = int(deltas.max()).bit_length()
    return _pack_block(deltas, width), width


def decode_positions(
    blob, width: int, freqs: np.ndarray
) -> np.ndarray:
    """Inverse of encode_positions -> int64 positions stream."""
    freqs = np.asarray(freqs, dtype=np.int64)
    total = int(freqs.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    deltas = _unpack_block(memoryview(blob), total, width).astype(np.int64)
    cums = np.cumsum(deltas)
    starts = np.zeros(len(freqs), dtype=np.int64)
    np.cumsum(freqs[:-1], out=starts[1:])
    # subtract each doc's incoming prefix so cumsum restarts per doc
    base = cums[starts] - deltas[starts]
    return cums - np.repeat(base, freqs)


def _block_offsets(counts: np.ndarray, widths: np.ndarray) -> np.ndarray:
    sizes = _packed_nbytes(counts, widths)
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return offsets


def _unpack_all(
    blob, widths: np.ndarray, counts: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Unpack every block of a region into one int64 array, vectorized.

    Full 128-entry blocks are grouped BY WIDTH and each group decodes in a
    single unpackbits + weighted-sum over a (n_blocks, bytes) gather — the
    per-block Python loop only runs over the handful of distinct widths
    (plus the one tail block). This is the bulk-decode fast path the
    exhaustive scorer sits on.
    """
    nblocks = len(counts)
    total = int(counts.sum())
    out = np.empty(total, dtype=np.int64)
    starts = np.zeros(nblocks, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    raw = np.frombuffer(blob, dtype=np.uint8, count=int(offsets[-1]))

    full = nblocks - 1 if counts[-1] != BLOCK_SIZE else nblocks
    w_arr = widths[:full].astype(np.int64)
    for w in np.unique(w_arr):
        sel = np.flatnonzero(w_arr == w)
        dst = (starts[sel][:, None] + np.arange(BLOCK_SIZE)[None, :]).ravel()
        if w == 0:
            out[dst] = 0
            continue
        bpb = BLOCK_SIZE * int(w) // 8
        gather = raw[(offsets[sel][:, None] + np.arange(bpb)[None, :])]
        if w == 8:
            out[dst] = gather.ravel()
            continue
        if w == 16:
            out[dst] = gather.view(np.uint16).ravel()
            continue
        bits = np.unpackbits(gather, axis=1, bitorder="little")
        # float64 matmul hits BLAS and is exact below 2^53 (w <= 52 always
        # holds: widths are docID-delta/freq bit lengths)
        weights = np.exp2(np.arange(w, dtype=np.float64))
        vals = bits.reshape(len(sel) * BLOCK_SIZE, int(w)).astype(np.float64) @ weights
        out[dst] = vals.astype(np.int64)
    if full < nblocks:  # tail block
        bi = nblocks - 1
        tail = _unpack_block(
            memoryview(blob)[int(offsets[bi]) :], int(counts[bi]), int(widths[bi])
        )
        out[int(starts[bi]) :] = tail.astype(np.int64)
    return out


def decode_docs(
    docs_blob,
    doc_widths: np.ndarray,
    doc_freq: int,
    first_block: int = 0,
    last_block: int | None = None,
    base: int = -1,
) -> np.ndarray:
    """Decode docIDs for blocks [first_block, last_block) -> int64 array.

    Each block's first delta is relative to the previous block's last doc,
    so a partial decode starting at ``first_block > 0`` must pass
    ``base = last_docs[first_block - 1]``; the default base of -1 is the
    virtual previous doc before block 0.
    """
    nblocks, counts = block_bounds(doc_freq)
    if last_block is None:
        last_block = nblocks
    offsets = _block_offsets(counts, doc_widths)
    if first_block == 0 and last_block == nblocks:
        deltas = _unpack_all(docs_blob, doc_widths, counts, offsets)
        deltas += 1
        return np.cumsum(deltas) + base
    mv = memoryview(docs_blob)
    parts = []
    for bi in range(first_block, last_block):
        d = _unpack_block(mv[offsets[bi] :], int(counts[bi]), int(doc_widths[bi]))
        parts.append(d.astype(np.int64) + 1)
    if not parts:
        return np.empty(0, dtype=np.int64)
    deltas = np.concatenate(parts)
    return np.cumsum(deltas) + base


def decode_freqs(
    freqs_blob, freq_widths: np.ndarray, doc_freq: int, first_block: int = 0, last_block: int | None = None
) -> np.ndarray:
    nblocks, counts = block_bounds(doc_freq)
    if last_block is None:
        last_block = nblocks
    offsets = _block_offsets(counts, freq_widths)
    if first_block == 0 and last_block == nblocks:
        vals = _unpack_all(freqs_blob, freq_widths, counts, offsets)
        return (vals + 1).astype(np.int32)
    mv = memoryview(freqs_blob)
    parts = []
    for bi in range(first_block, last_block):
        f = _unpack_block(mv[offsets[bi] :], int(counts[bi]), int(freq_widths[bi]))
        parts.append(f.astype(np.int32) + 1)
    if not parts:
        return np.empty(0, dtype=np.int32)
    return np.concatenate(parts)
