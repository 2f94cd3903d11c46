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
    "PostingsFormat",
    "register_postings_format",
    "get_postings_format",
    "format_by_id",
]

BLOCK_SIZE = 128  # ForUtil.BLOCK_SIZE


# ---------------------------------------------------------------------------
# postings-format SPI (Codec.java:43 forName/availableCodecs analogue)
# ---------------------------------------------------------------------------


class PostingsFormat:
    """One packed-ints strategy for doc-delta / freq blocks.

    The pluggable-codec seam (s84 codecs/Codec.java:43 SPI;
    codecs/lucene84/PForUtil.java:33 is the "pfor" built-in's reference):
    every postings region starts with this format's ``fmt_id`` byte, so
    readers, the merge shuffle and compaction dispatch per REGION with no
    side-channel — mixed-format indexes decode transparently and re-encode
    at the writer's configured format.

    ``plan(values, bvstart, bcount)`` -> (widths int64[B], masked values,
    exc) chooses each block's base bit width and, optionally, patch
    exceptions ``exc = (counts uint8[B], pos uint8[E], high uint8[E])``
    (None for exception-free formats). ``E`` rows are sorted by (block,
    pos); ``high`` is the value's bits above the base width.
    """

    name: str = ""
    fmt_id: int = -1

    def plan(self, values, bvstart, bcount, widths_full):
        raise NotImplementedError


class ForPostingsFormat(PostingsFormat):
    """Plain FOR: per-block width = bit width of the block max, no
    exceptions (ForUtil.java:31 semantics — the default)."""

    name = "for"
    fmt_id = 0

    def plan(self, values, bvstart, bcount, widths_full):
        return widths_full, values, None


class PForPostingsFormat(PostingsFormat):
    """Patched FOR: per-block base width chosen so that a few outlier
    values ("exceptions") store only their low bits in the packed block,
    with the high bits (one byte each) patched back at decode
    (s84 codecs/lucene84/PForUtil.java:48-81: (position, highByte) pairs
    appended after the packed block). Documented deviation: the reference
    caps at 3 exceptions with width = max(bits(4th-largest), maxBits-8);
    we allow up to 7 and pick the width minimizing packed bytes +
    2 bytes/exception — same decode semantics (scores never depend on
    encoding), strictly never-larger blocks under the cost model.
    Positions streams stay plain FOR (one width per term), as before."""

    name = "pfor"
    fmt_id = 1
    MAX_EXCEPTIONS = 7

    def plan(self, values, bvstart, bcount, widths_full):
        B = len(bcount)
        if B == 0 or len(values) == 0:
            return widths_full, values, (
                np.zeros(0, np.uint8), np.zeros(0, np.uint8), np.zeros(0, np.uint8)
            )
        v = np.asarray(values, dtype=np.int64)
        bcount = np.asarray(bcount, dtype=np.int64)
        bvstart = np.asarray(bvstart, dtype=np.int64)
        # blocks tile `values` contiguously -> one lexsort groups each
        # block's values ascending; the top-e of a block are its run's tail
        vblock = np.repeat(np.arange(B, dtype=np.int64), bcount)
        order = np.lexsort((v, vblock))
        sv = v[order]
        ends = np.cumsum(bcount)
        E = self.MAX_EXCEPTIONS + 1  # e = 0..7 exceptions considered
        cand_idx = ends[:, None] - 1 - np.arange(E, dtype=np.int64)[None, :]
        valid = cand_idx >= (ends - bcount)[:, None]
        cand_w = bit_widths(sv[np.clip(cand_idx, 0, len(sv) - 1)].ravel()).reshape(B, E)
        blockmax = sv[ends - 1]
        # an exception's high bits must fit one byte (PForUtil's invariant)
        ok_high = (blockmax[:, None] >> np.minimum(cand_w, 63)) <= 255
        sizes = (bcount[:, None] * cand_w + 7) // 8 + 2 * np.arange(E, dtype=np.int64)[None, :]
        sizes = np.where(valid & ok_high, sizes, np.int64(1) << 60)
        best_e = np.argmin(sizes, axis=1)  # ties -> fewest exceptions
        widths = cand_w[np.arange(B), best_e]
        exc_counts = best_e.astype(np.int64)
        tot = int(exc_counts.sum())
        if tot == 0:
            return widths, v, (
                exc_counts.astype(np.uint8), np.zeros(0, np.uint8), np.zeros(0, np.uint8)
            )
        eoff = np.zeros(B + 1, np.int64)
        np.cumsum(exc_counts, out=eoff[1:])
        bidx = np.repeat(np.arange(B, dtype=np.int64), exc_counts)
        k = np.arange(tot, dtype=np.int64) - eoff[bidx]
        sorted_pos = ends[bidx] - exc_counts[bidx] + k  # the top-e run, asc
        orig_idx = order[sorted_pos]
        w_b = widths[bidx]
        pos_in_block = orig_idx - bvstart[bidx]
        masked = v.copy()
        masked[orig_idx] = v[orig_idx] & ((np.int64(1) << w_b) - 1)
        high = (v[orig_idx] >> w_b).astype(np.int64)
        so = np.lexsort((pos_in_block, bidx))  # canonical (block, pos) order
        return widths, masked, (
            exc_counts.astype(np.uint8),
            pos_in_block[so].astype(np.uint8),
            high[so].astype(np.uint8),
        )


_FORMATS: dict[str, PostingsFormat] = {}
_FORMATS_BY_ID: dict[int, PostingsFormat] = {}


def register_postings_format(fmt: PostingsFormat) -> None:
    """SPI registration (Codec.forName's NamedSPILoader role); a format
    registered here is encodable via BuildConfig.postings_format and
    decodable from any region carrying its fmt_id byte."""
    if not fmt.name or fmt.fmt_id < 0 or fmt.fmt_id > 255:
        raise ValueError(f"invalid postings format {fmt.name!r}/{fmt.fmt_id}")
    existing = _FORMATS_BY_ID.get(fmt.fmt_id)
    if existing is not None and existing.name != fmt.name:
        raise ValueError(
            f"fmt_id {fmt.fmt_id} already registered to {existing.name!r}"
        )
    _FORMATS[fmt.name] = fmt
    _FORMATS_BY_ID[fmt.fmt_id] = fmt


def get_postings_format(name: str) -> PostingsFormat:
    try:
        return _FORMATS[name]
    except KeyError:
        raise ValueError(
            f"unknown postings format {name!r} (registered: {sorted(_FORMATS)})"
        ) from None


def format_by_id(fmt_id: int) -> PostingsFormat:
    try:
        return _FORMATS_BY_ID[fmt_id]
    except KeyError:
        raise ValueError(f"unknown postings format id {fmt_id}") from None


register_postings_format(ForPostingsFormat())
register_postings_format(PForPostingsFormat())


def apply_exceptions(
    out: np.ndarray,
    sel: np.ndarray,
    widths: np.ndarray,
    exc: tuple,
    out_starts: np.ndarray,
) -> None:
    """Patch PFOR exceptions into decoded base values, in place.

    ``out`` holds the concatenated base-width values of the blocks in
    ``sel`` (docs: the raw deltas BEFORE +1/cumsum); ``out_starts[i]`` is
    block sel[i]'s first index in ``out``; ``exc`` = (counts, pos, high)
    per-TERM arrays. Pure scatter — vectorized, no per-exception Python."""
    exc_counts, exc_pos, exc_high = exc
    ec = np.asarray(exc_counts, dtype=np.int64)
    cnt = ec[sel]
    tot = int(cnt.sum())
    if tot == 0:
        return
    eoff = np.zeros(len(ec) + 1, np.int64)
    np.cumsum(ec, out=eoff[1:])
    soff = np.zeros(len(sel), np.int64)
    np.cumsum(cnt[:-1], out=soff[1:])
    srow = np.repeat(np.arange(len(sel), dtype=np.int64), cnt)
    k = np.arange(tot, dtype=np.int64) - soff[srow]
    src = eoff[sel[srow]] + k
    dst = np.asarray(out_starts, dtype=np.int64)[srow] + np.asarray(exc_pos)[src].astype(np.int64)
    out[dst] |= np.asarray(exc_high)[src].astype(np.int64) << np.asarray(widths)[sel[srow]].astype(np.int64)


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


def bit_widths(maxima: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length over non-negative int64 maxima."""
    m = np.asarray(maxima, dtype=np.int64)
    w = np.zeros(len(m), dtype=np.int64)
    nz = m > 0
    w[nz] = np.floor(np.log2(m[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 can land one low at exact powers of two — fix up exactly
    bad = nz & ((m >> np.minimum(w, 63)) > 0)
    w[bad] += 1
    return w


def pack_blocks(
    values: np.ndarray, block_counts: np.ndarray, block_widths: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Pack MANY bit-packed blocks in one vectorized pass.

    ``values`` holds every block's values back to back (block i contributes
    block_counts[i] values packed at block_widths[i] bits, little-endian,
    each block padded to a byte boundary — byte-identical to concatenating
    per-block _pack_block outputs). Returns (packed uint8 array,
    byte offsets[B+1]). This is the whole-segment encode fast path: one
    bit-scatter + one np.packbits instead of a Python call per block.
    """
    counts = np.asarray(block_counts, dtype=np.int64)
    widths = np.asarray(block_widths, dtype=np.int64)
    nbytes = _packed_nbytes(counts, widths)
    byte_off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=byte_off[1:])
    total_bytes = int(byte_off[-1])
    if total_bytes == 0 or len(values) == 0:
        return np.zeros(total_bytes, dtype=np.uint8), byte_off

    v = np.asarray(values, dtype=np.int64)
    w_per_value = np.repeat(widths, counts)
    base_bits = np.repeat(byte_off[:-1] * 8, counts)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    local_idx = np.arange(len(v), dtype=np.int64) - np.repeat(starts, counts)
    val_bit_start = base_bits + local_idx * w_per_value

    maxw = int(widths.max())
    if maxw == 0:
        return np.zeros(total_bytes, dtype=np.uint8), byte_off
    # one scatter per bit plane (≤ maxw vectorized passes; no (N, w)
    # temporaries — those dominate wall time at millions of values)
    out = np.zeros(total_bytes * 8, dtype=np.uint8)
    for k in range(maxw):
        selk = w_per_value > k
        if not selk.any():
            continue
        out[val_bit_start[selk] + k] = ((v[selk] >> k) & 1).astype(np.uint8)
    return np.packbits(out, bitorder="little"), byte_off


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


class SegmentEncoding:
    """Whole-segment batch encoding of many terms' postings (+ positions).

    Produced by encode_segment_terms: all packed streams are built in a
    few vectorized passes (pack_blocks) instead of per-term encode calls;
    ``term_region(ti)`` assembles term ti's postings.bin region
    byte-identically to _region_blobs(encode_postings(...)).
    """

    __slots__ = (
        "n_terms", "dfs", "ttfs", "nbs", "bstart", "bcount",
        "last_docs", "dwidths", "fwidths", "imp_counts", "imp_freqs",
        "imp_norms", "imp_term_off", "docs_packed", "docs_off",
        "freqs_packed", "freqs_off", "pos_packed", "pos_off", "pos_widths",
        "fmt_id", "dexc", "fexc", "dexc_off", "fexc_off",
    )

    def term_region(self, ti: int) -> tuple[bytes, int, int, int, int]:
        """(region bytes, n_blocks, n_imp, len_docs, len_freqs) for term ti.
        Every region starts with its postings-format id byte (the Codec SPI
        dispatch point); len_docs/len_freqs are the PACKED blob lengths."""
        b0, b1 = int(self.bstart[ti]), int(self.bstart[ti + 1])
        i0, i1 = int(self.imp_term_off[ti]), int(self.imp_term_off[ti + 1])
        d0, d1 = int(self.docs_off[b0]), int(self.docs_off[b1])
        f0, f1 = int(self.freqs_off[b0]), int(self.freqs_off[b1])
        parts = [
            bytes([self.fmt_id]),
            self.last_docs[b0:b1].tobytes(),
            self.dwidths[b0:b1].astype(np.uint8).tobytes(),
            self.fwidths[b0:b1].astype(np.uint8).tobytes(),
            self.imp_counts[b0:b1].astype(np.uint8).tobytes(),
            self.imp_freqs[i0:i1].astype(np.int32).tobytes(),
            self.imp_norms[i0:i1].astype(np.uint8).tobytes(),
        ]
        if self.fmt_id != 0:
            de0, de1 = int(self.dexc_off[b0]), int(self.dexc_off[b1])
            fe0, fe1 = int(self.fexc_off[b0]), int(self.fexc_off[b1])
            parts.extend(
                (
                    self.dexc[0][b0:b1].tobytes(),
                    self.fexc[0][b0:b1].tobytes(),
                    self.dexc[1][de0:de1].tobytes(),
                    self.dexc[2][de0:de1].tobytes(),
                    self.fexc[1][fe0:fe1].tobytes(),
                    self.fexc[2][fe0:fe1].tobytes(),
                )
            )
        parts.append(self.docs_packed[d0:d1].tobytes())
        parts.append(self.freqs_packed[f0:f1].tobytes())
        region = b"".join(parts)
        return region, b1 - b0, i1 - i0, d1 - d0, f1 - f0

    def term_positions_blob(self, ti: int) -> tuple[bytes, int, int]:
        """(pos blob bytes, pos width, len) for term ti (positions mode)."""
        p0, p1 = int(self.pos_off[ti]), int(self.pos_off[ti + 1])
        return self.pos_packed[p0:p1].tobytes(), int(self.pos_widths[ti]), p1 - p0


def encode_segment_terms(
    docs: np.ndarray,
    freqs: np.ndarray,
    norms_aligned: np.ndarray,
    term_starts: np.ndarray,
    term_ends: np.ndarray,
    pos_stream: np.ndarray | None = None,
    postings_format: str = "for",
) -> SegmentEncoding:
    """Batch-encode every term of a segment in vectorized passes.

    docs/freqs are the (term, doc)-sorted posting triples (term boundaries
    in term_starts/term_ends); norms_aligned[i] is the norm byte of the
    doc at position i (aligned with docs); pos_stream (optional) holds
    positions in the same global order, expanded per occurrence.
    Semantically identical to per-term encode_postings + encode_positions
    (asserted by tests)."""
    T = len(term_starts)
    enc = SegmentEncoding()
    docs = np.asarray(docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    term_starts = np.asarray(term_starts, dtype=np.int64)
    term_ends = np.asarray(term_ends, dtype=np.int64)
    enc.n_terms = T
    enc.dfs = (term_ends - term_starts).astype(np.int64)

    # docID deltas with restarts at term boundaries (store delta-1)
    deltas = np.empty(len(docs), dtype=np.int64)
    if len(docs):
        deltas[1:] = docs[1:] - docs[:-1] - 1
        deltas[term_starts] = docs[term_starts]
    fm1 = freqs - 1

    # global block table: nbs[t] blocks per term, 128 values except tails
    nbs = (enc.dfs + BLOCK_SIZE - 1) // BLOCK_SIZE
    enc.nbs = nbs
    B = int(nbs.sum())
    bstart = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(nbs, out=bstart[1:])
    enc.bstart = bstart
    bterm = np.repeat(np.arange(T, dtype=np.int64), nbs)
    local_b = np.arange(B, dtype=np.int64) - np.repeat(bstart[:-1], nbs)
    bcount = np.where(
        local_b < nbs[bterm] - 1,
        BLOCK_SIZE,
        enc.dfs[bterm] - (nbs[bterm] - 1) * BLOCK_SIZE,
    ).astype(np.int64)
    enc.bcount = bcount
    bvstart = term_starts[bterm] + local_b * BLOCK_SIZE

    # per-block maxima -> widths (reduceat: blocks tile the value range)
    if B:
        dmax = np.maximum.reduceat(deltas, bvstart)
        fmax = np.maximum.reduceat(fm1, bvstart)
    else:
        dmax = fmax = np.empty(0, dtype=np.int64)
    fmt = get_postings_format(postings_format)
    enc.fmt_id = fmt.fmt_id
    enc.dwidths, d_store, enc.dexc = fmt.plan(deltas, bvstart, bcount, bit_widths(dmax))
    enc.fwidths, f_store, enc.fexc = fmt.plan(fm1, bvstart, bcount, bit_widths(fmax))
    enc.last_docs = docs[bvstart + bcount - 1] if B else np.empty(0, np.int64)
    for attr, e in (("dexc_off", enc.dexc), ("fexc_off", enc.fexc)):
        off = np.zeros(B + 1, np.int64)
        if e is not None:
            np.cumsum(np.asarray(e[0], dtype=np.int64), out=off[1:])
        setattr(enc, attr, off)

    enc.docs_packed, enc.docs_off = pack_blocks(d_store, bcount, enc.dwidths)
    enc.freqs_packed, enc.freqs_off = pack_blocks(f_store, bcount, enc.fwidths)

    # per-block competitive (freq, norm) pareto frontiers
    imp_counts = np.empty(B, dtype=np.int64)
    imp_f_parts: list[np.ndarray] = []
    imp_n_parts: list[np.ndarray] = []
    norms_aligned = np.asarray(norms_aligned, dtype=np.uint8)
    for bi in range(B):
        s = int(bvstart[bi])
        c = int(bcount[bi])
        kf, kn = compute_impacts(
            freqs[s : s + c].astype(np.int32), norms_aligned[s : s + c]
        )
        imp_counts[bi] = len(kf)
        imp_f_parts.append(kf)
        imp_n_parts.append(kn)
    enc.imp_counts = imp_counts
    enc.imp_freqs = (
        np.concatenate(imp_f_parts) if imp_f_parts else np.empty(0, np.int32)
    )
    enc.imp_norms = (
        np.concatenate(imp_n_parts) if imp_n_parts else np.empty(0, np.uint8)
    )
    imp_term_off = np.zeros(T + 1, dtype=np.int64)
    if B:
        per_term_imps = np.add.reduceat(imp_counts, bstart[:-1])
        np.cumsum(per_term_imps, out=imp_term_off[1:])
    enc.imp_term_off = imp_term_off

    # positions: delta restarts at every posting (doc) boundary, one width
    # per term, each term's stream padded to a byte (== encode_positions)
    if pos_stream is not None and len(pos_stream):
        pos_stream = np.asarray(pos_stream, dtype=np.int64)
        pd = np.empty(len(pos_stream), dtype=np.int64)
        pd[1:] = pos_stream[1:] - pos_stream[:-1]
        posting_starts = np.zeros(len(freqs), dtype=np.int64)
        np.cumsum(freqs[:-1], out=posting_starts[1:])
        pd[posting_starts] = pos_stream[posting_starts]
        ttfs_arr = np.add.reduceat(freqs, term_starts) if T else np.empty(0, np.int64)
        # term token boundaries in the stream
        term_tok_starts = np.zeros(T, dtype=np.int64)
        np.cumsum(ttfs_arr[:-1], out=term_tok_starts[1:])
        pmax = np.maximum.reduceat(pd, term_tok_starts)
        enc.pos_widths = bit_widths(pmax)
        enc.pos_packed, enc.pos_off = pack_blocks(pd, ttfs_arr, enc.pos_widths)
        enc.ttfs = ttfs_arr
    else:
        enc.pos_packed = np.empty(0, np.uint8)
        enc.pos_off = np.zeros(T + 1, dtype=np.int64)
        enc.pos_widths = np.zeros(T, dtype=np.int64)
        enc.ttfs = (
            np.add.reduceat(freqs, term_starts) if T and len(freqs) else np.zeros(T, np.int64)
        )
    return enc


def _block_offsets(counts: np.ndarray, widths: np.ndarray) -> np.ndarray:
    sizes = _packed_nbytes(counts, widths)
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return offsets


def _unpack_all(
    blob, widths: np.ndarray, counts: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Unpack every block of a region into one int64 array, vectorized —
    the sel=everything case of _unpack_subset (one width-grouped gather
    per distinct width; only the tail block decodes individually). This is
    the bulk-decode fast path the exhaustive scorer sits on."""
    return _unpack_subset(blob, widths, counts, offsets, np.arange(len(counts), dtype=np.int64))


def _unpack_subset(
    blob, widths: np.ndarray, counts: np.ndarray, offsets: np.ndarray, sel: np.ndarray
) -> np.ndarray:
    """_unpack_all over an ARBITRARY sorted subset of blocks: full blocks
    group by width and decode in one gather each; the only per-block Python
    work is the (at most one) tail block. Returns the subset's raw values
    concatenated in block order."""
    n = len(sel)
    sub_counts = counts[sel]
    total = int(sub_counts.sum())
    out = np.empty(total, dtype=np.int64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(sub_counts[:-1], out=starts[1:])
    raw = np.frombuffer(blob, dtype=np.uint8, count=int(offsets[-1]))
    full_rows = np.flatnonzero(sub_counts == BLOCK_SIZE)
    w_arr = widths[sel[full_rows]].astype(np.int64)
    for w in np.unique(w_arr):
        rows = full_rows[w_arr == w]
        dst = (starts[rows][:, None] + np.arange(BLOCK_SIZE)[None, :]).ravel()
        if w == 0:
            out[dst] = 0
            continue
        bpb = BLOCK_SIZE * int(w) // 8
        gather = raw[(offsets[sel[rows]][:, None] + np.arange(bpb)[None, :])]
        if w == 8:
            out[dst] = gather.ravel()
            continue
        if w == 16:
            out[dst] = gather.view(np.uint16).ravel()
            continue
        bits = np.unpackbits(gather, axis=1, bitorder="little")
        weights = np.exp2(np.arange(w, dtype=np.float64))
        vals = bits.reshape(len(rows) * BLOCK_SIZE, int(w)).astype(np.float64) @ weights
        out[dst] = vals.astype(np.int64)
    for r in np.flatnonzero(sub_counts != BLOCK_SIZE):  # tail block (<=1)
        bi = int(sel[r])
        vals = _unpack_block(
            memoryview(blob)[int(offsets[bi]) :], int(counts[bi]), int(widths[bi])
        )
        out[int(starts[r]) : int(starts[r]) + int(counts[bi])] = vals.astype(np.int64)
    return out


def decode_docs_blocks(
    docs_blob, doc_widths: np.ndarray, doc_freq: int, last_docs: np.ndarray,
    block_ids: np.ndarray, exc: tuple | None = None,
) -> np.ndarray:
    """Decode docIDs of an arbitrary sorted subset of blocks in one
    vectorized pass — the scattered-candidate lookup path of the MaxScore
    scorer. Per-block delta cumsums rebase on last_docs[b-1]. ``exc``
    (PFOR) patches delta high bits before the cumsum."""
    nblocks, counts = block_bounds(doc_freq)
    offsets = _block_offsets(counts, doc_widths)
    sel = np.asarray(block_ids, dtype=np.int64)
    deltas = _unpack_subset(docs_blob, doc_widths, counts, offsets, sel)
    if exc is not None:
        sub = counts[sel]
        starts0 = np.zeros(len(sel), np.int64)
        np.cumsum(sub[:-1], out=starts0[1:])
        apply_exceptions(deltas, sel, doc_widths, exc, starts0)
    deltas += 1
    bases = np.where(sel > 0, last_docs[np.maximum(sel - 1, 0)], -1)
    sub_counts = counts[sel]
    ends = np.cumsum(sub_counts)
    starts = ends - sub_counts
    docs = np.cumsum(deltas)
    # per-block rebase: subtract the running total at each block start, add base
    seg_offset = np.repeat(docs[starts] - deltas[starts] - bases, sub_counts)
    return docs - seg_offset


def decode_freqs_blocks(
    freqs_blob, freq_widths: np.ndarray, doc_freq: int, block_ids: np.ndarray,
    exc: tuple | None = None,
) -> np.ndarray:
    nblocks, counts = block_bounds(doc_freq)
    offsets = _block_offsets(counts, freq_widths)
    sel = np.asarray(block_ids, dtype=np.int64)
    vals = _unpack_subset(freqs_blob, freq_widths, counts, offsets, sel)
    if exc is not None:
        sub = counts[sel]
        starts0 = np.zeros(len(sel), np.int64)
        np.cumsum(sub[:-1], out=starts0[1:])
        apply_exceptions(vals, sel, freq_widths, exc, starts0)
    return (vals + 1).astype(np.int32)


def decode_docs(
    docs_blob,
    doc_widths: np.ndarray,
    doc_freq: int,
    first_block: int = 0,
    last_block: int | None = None,
    base: int = -1,
    exc: tuple | None = None,
) -> np.ndarray:
    """Decode docIDs for blocks [first_block, last_block) -> int64 array.

    Each block's first delta is relative to the previous block's last doc,
    so a partial decode starting at ``first_block > 0`` must pass
    ``base = last_docs[first_block - 1]``; the default base of -1 is the
    virtual previous doc before block 0. ``exc`` (PFOR) patches delta high
    bits before the cumsum.
    """
    nblocks, counts = block_bounds(doc_freq)
    if last_block is None:
        last_block = nblocks
    offsets = _block_offsets(counts, doc_widths)
    if first_block == 0 and last_block == nblocks:
        deltas = _unpack_all(docs_blob, doc_widths, counts, offsets)
        if exc is not None:
            starts0 = np.zeros(nblocks, np.int64)
            np.cumsum(counts[:-1], out=starts0[1:])
            apply_exceptions(deltas, np.arange(nblocks, dtype=np.int64),
                             doc_widths, exc, starts0)
        deltas += 1
        return np.cumsum(deltas) + base
    if first_block >= last_block:
        return np.empty(0, dtype=np.int64)
    # ranged decode down the same width-grouped vectorized path: slice the
    # blob at the range's byte offsets and rebase the per-block offsets
    mv = memoryview(docs_blob)
    sl = slice(first_block, last_block)
    rel = offsets[first_block : last_block + 1] - offsets[first_block]
    deltas = _unpack_all(
        mv[offsets[first_block] : offsets[last_block]],
        doc_widths[sl], counts[sl], rel,
    )
    if exc is not None:
        sel = np.arange(first_block, last_block, dtype=np.int64)
        starts0 = np.zeros(len(sel), np.int64)
        np.cumsum(counts[sl][:-1], out=starts0[1:])
        apply_exceptions(deltas, sel, doc_widths, exc, starts0)
    deltas += 1
    return np.cumsum(deltas) + base


def decode_freqs(
    freqs_blob, freq_widths: np.ndarray, doc_freq: int, first_block: int = 0,
    last_block: int | None = None, exc: tuple | None = None,
) -> np.ndarray:
    nblocks, counts = block_bounds(doc_freq)
    if last_block is None:
        last_block = nblocks
    offsets = _block_offsets(counts, freq_widths)
    if first_block == 0 and last_block == nblocks:
        vals = _unpack_all(freqs_blob, freq_widths, counts, offsets)
        if exc is not None:
            starts0 = np.zeros(nblocks, np.int64)
            np.cumsum(counts[:-1], out=starts0[1:])
            apply_exceptions(vals, np.arange(nblocks, dtype=np.int64),
                             freq_widths, exc, starts0)
        return (vals + 1).astype(np.int32)
    if first_block >= last_block:
        return np.empty(0, dtype=np.int32)
    mv = memoryview(freqs_blob)
    sl = slice(first_block, last_block)
    rel = offsets[first_block : last_block + 1] - offsets[first_block]
    vals = _unpack_all(
        mv[offsets[first_block] : offsets[last_block]],
        freq_widths[sl], counts[sl], rel,
    )
    if exc is not None:
        sel = np.arange(first_block, last_block, dtype=np.int64)
        starts0 = np.zeros(len(sel), np.int64)
        np.cumsum(counts[sl][:-1], out=starts0[1:])
        apply_exceptions(vals, sel, freq_widths, exc, starts0)
    return (vals + 1).astype(np.int32)
