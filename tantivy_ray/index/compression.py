"""Posting-list block compression — delta + bitpacked 128-doc blocks with
skip entries and block-max (WAND) metadata.

Functional re-expression of the reference's posting format
(/root/reference/src/postings/compression/mod.rs:3-77 — COMPRESSION_BLOCK_SIZE
= 128, delta + bitpack; /root/reference/src/postings/skip.rs:55-90 — per-block
skip entry: last_doc, bitwidths, block-max (fieldnorm_id, tf) pair;
/root/reference/src/postings/serializer.rs:404-428 — the pair stored is the
one maximizing the segment-local tf factor).

Differences (documented, results-equivalent):
- the tail block (<128 docs) is bitpacked like full blocks instead of
  vint-encoded (same information, simpler vectorized decode);
- skip data is laid out struct-of-arrays so a reader can view it zero-copy
  with ``np.frombuffer`` on an mmap.

Per-term blob layout (little-endian):
    u32 doc_freq
    u32 n_blocks
    -- skip section (SoA) --
    u32[n_blocks]  last_doc
    u8 [n_blocks]  doc_bitwidth
    u8 [n_blocks]  tf_bitwidth
    u8 [n_blocks]  wand_fieldnorm_id
    u32[n_blocks]  wand_tf
    u32[n_blocks]  data_offset        (relative to data section start)
    -- data section --
    per block: bitpacked doc deltas then bitpacked tfs
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

COMPRESSION_BLOCK_SIZE = 128

_BIT_WEIGHTS = (1 << np.arange(32, dtype=np.uint64))


def bit_width(max_value: int) -> int:
    """Bits needed to represent max_value (0 → 0 bits)."""
    return int(max_value).bit_length()


def _bit_widths(values: np.ndarray) -> np.ndarray:
    """Vectorized bit_length over a uint32 array (exact: v+1 <= 2^32 is
    float64-exact, log2 of it never lands epsilon-under an integer)."""
    return np.ceil(np.log2(values.astype(np.float64) + 1.0)).astype(np.uint8)


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack uint32 values into `width`-bit little-endian-bit-order codes."""
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint32)) & 1).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def bitunpack(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of bitpack. `buf` is a uint8 array (may be an mmap view)."""
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    bits = np.unpackbits(buf, count=n * width, bitorder="little").reshape(n, width)
    return (bits.astype(np.uint64) * _BIT_WEIGHTS[:width]).sum(axis=1).astype(np.uint32)


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8


def encode_term_postings(
    docs: np.ndarray,
    tfs: np.ndarray,
    fieldnorm_ids: np.ndarray,
    local_tf_cache: np.ndarray,
    fids_per_posting: bool = False,
) -> bytes:
    """Encode one term's posting list.

    docs: strictly increasing uint32 doc ids; tfs: uint32 term freqs;
    fieldnorm_ids: uint8 fieldnorm ids — indexed by doc id by default, or
    aligned 1:1 with ``docs`` when ``fids_per_posting=True`` (the merge
    path carries posting-aligned fids; a doc-indexed array there would be
    an O(global-corpus) allocation per term group);
    local_tf_cache: 256-entry f32 cache built from the SEGMENT-LOCAL average
    fieldnorm (reference serializer.rs:120-135) used only to select the
    block-max (fieldnorm_id, tf) pair.
    """
    n = len(docs)
    docs = np.ascontiguousarray(docs, dtype=np.uint32)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint32)
    nb = (n + COMPRESSION_BLOCK_SIZE - 1) // COMPRESSION_BLOCK_SIZE

    deltas = np.empty(n, dtype=np.uint32)
    deltas[0] = docs[0] + 1  # delta from virtual previous doc -1
    np.subtract(docs[1:], docs[:-1], out=deltas[1:])

    if fids_per_posting:
        fids = np.ascontiguousarray(fieldnorm_ids, dtype=np.uint8)
    else:
        fids = fieldnorm_ids[docs]
    tf_factor = tfs.astype(np.float32) / (
        tfs.astype(np.float32) + local_tf_cache[fids]
    )

    # Per-block stats, vectorized: full 128-doc blocks reshape to
    # (n_full, 128); the (<128) tail block is handled separately.  A full
    # block's packed payload is 16*width bytes (128*w bits, always whole
    # bytes), so all full blocks sharing a width pack in ONE bitpack call
    # and slice apart — the mirror of decode_all's width grouping.
    B = COMPRESSION_BLOCK_SIZE
    n_full = n // B
    last_doc = docs[np.minimum(np.arange(1, nb + 1) * B, n) - 1]
    doc_bw = np.zeros(nb, dtype=np.uint8)
    tf_bw = np.zeros(nb, dtype=np.uint8)
    wand_fid = np.empty(nb, dtype=np.uint8)
    wand_tf = np.empty(nb, dtype=np.uint32)

    if n_full > 0:
        dv = deltas[:n_full * B].reshape(n_full, B)
        tv = tfs[:n_full * B].reshape(n_full, B)
        doc_bw[:n_full] = _bit_widths(dv.max(axis=1))
        tf_bw[:n_full] = _bit_widths(tv.max(axis=1))
        best = (np.argmax(tf_factor[:n_full * B].reshape(n_full, B), axis=1)
                + np.arange(n_full) * B)
        wand_fid[:n_full] = fids[best]
        wand_tf[:n_full] = tfs[best]
    if n_full < nb:
        s = n_full * B
        doc_bw[-1] = bit_width(int(deltas[s:].max()))
        tf_bw[-1] = bit_width(int(tfs[s:].max()))
        best = s + int(np.argmax(tf_factor[s:]))
        wand_fid[-1] = fids[best]
        wand_tf[-1] = tfs[best]

    doc_payload: List[Optional[bytes]] = [None] * nb
    tf_payload: List[Optional[bytes]] = [None] * nb
    for arr_bw, view, payload in (
        (doc_bw, deltas, doc_payload),
        (tf_bw, tfs, tf_payload),
    ):
        for w in np.unique(arr_bw[:n_full]):
            w = int(w)
            idx = np.flatnonzero(arr_bw[:n_full] == w)
            if w == 0:
                for i in idx:
                    payload[i] = b""
                continue
            packed = bitpack(
                view[:n_full * B].reshape(n_full, B)[idx].ravel(), w)
            sz = 16 * w  # packed bytes per full block at this width
            for j, i in enumerate(idx):
                payload[i] = packed[j * sz:(j + 1) * sz]
        if n_full < nb:
            payload[-1] = bitpack(view[n_full * B:], int(arr_bw[-1]))

    chunks: List[bytes] = [
        doc_payload[b] + tf_payload[b] for b in range(nb)]
    lens = np.fromiter((len(c) for c in chunks), dtype=np.uint32, count=nb)
    data_off = np.zeros(nb, dtype=np.uint32)
    np.cumsum(lens[:-1], out=data_off[1:])

    header = np.array([n, nb], dtype=np.uint32).tobytes()
    skip = (
        last_doc.tobytes()
        + doc_bw.tobytes()
        + tf_bw.tobytes()
        + wand_fid.tobytes()
        + wand_tf.tobytes()
        + data_off.tobytes()
    )
    return header + skip + b"".join(chunks)


class TermPostingsReader:
    """Zero-copy cursor over one term's encoded blob (mmap-friendly)."""

    __slots__ = (
        "doc_freq", "n_blocks", "last_doc", "doc_bw", "tf_bw",
        "wand_fid", "wand_tf", "data_off", "_data",
    )

    def __init__(self, buf: np.ndarray):
        """buf: uint8 ndarray view of the term's blob."""
        header = np.frombuffer(buf[:8], dtype=np.uint32)
        self.doc_freq = int(header[0])
        nb = self.n_blocks = int(header[1])
        o = 8
        self.last_doc = np.frombuffer(buf[o:o + 4 * nb], dtype=np.uint32); o += 4 * nb
        self.doc_bw = np.frombuffer(buf[o:o + nb], dtype=np.uint8); o += nb
        self.tf_bw = np.frombuffer(buf[o:o + nb], dtype=np.uint8); o += nb
        self.wand_fid = np.frombuffer(buf[o:o + nb], dtype=np.uint8); o += nb
        self.wand_tf = np.frombuffer(buf[o:o + 4 * nb], dtype=np.uint32); o += 4 * nb
        self.data_off = np.frombuffer(buf[o:o + 4 * nb], dtype=np.uint32); o += 4 * nb
        # re-class a memmap payload view to plain ndarray (zero-copy):
        # np.memmap.__array_finalize__ otherwise rides along on EVERY
        # block slice in the decode hot loops (profiled at 1.5M calls /
        # 2.1 s over a 3600-query WAND run)
        self._data = buf[o:].view(np.ndarray)

    def block_count(self, b: int) -> int:
        if b + 1 < self.n_blocks:
            return COMPRESSION_BLOCK_SIZE
        return self.doc_freq - b * COMPRESSION_BLOCK_SIZE

    def decode_block(self, b: int) -> Tuple[np.ndarray, np.ndarray]:
        """→ (docs, tfs) for block b."""
        cnt = self.block_count(b)
        dbw = int(self.doc_bw[b])
        tbw = int(self.tf_bw[b])
        start = int(self.data_off[b])
        dsize = packed_size(cnt, dbw)
        deltas = bitunpack(self._data[start:start + dsize], cnt, dbw)
        tfs = bitunpack(self._data[start + dsize:start + dsize + packed_size(cnt, tbw)],
                        cnt, tbw)
        base = np.uint32(self.last_doc[b - 1]) if b > 0 else np.uint32(0)
        docs = np.cumsum(deltas, dtype=np.uint32)
        docs += base if b > 0 else np.uint32(0)
        docs -= 1 if b == 0 else 0
        return docs, tfs

    def decode_all(self) -> Tuple[np.ndarray, np.ndarray]:
        """→ (docs, tfs) for the whole list.

        Full 128-doc blocks are decoded in batches grouped by bit width
        (one unpackbits + one matmul per distinct width instead of one per
        block) — posting lists overwhelmingly share widths across blocks,
        so head terms decode in O(#distinct widths) python steps."""
        n = self.doc_freq
        if n == 0:
            z = np.empty(0, dtype=np.uint32)
            return z, z
        nb = self.n_blocks
        n_full = nb if n % COMPRESSION_BLOCK_SIZE == 0 else nb - 1
        docs = np.empty(n, dtype=np.uint32)
        tfs = np.empty(n, dtype=np.uint32)
        B = COMPRESSION_BLOCK_SIZE
        if n_full > 0:
            doc_bw = np.asarray(self.doc_bw[:n_full])
            tf_bw = np.asarray(self.tf_bw[:n_full])
            offs = np.asarray(self.data_off[:n_full], dtype=np.int64)
            # base doc per block: -1 (virtual) then previous last_doc
            bases = np.empty(n_full, dtype=np.int64)
            bases[0] = -1
            bases[1:] = np.asarray(self.last_doc[:n_full - 1], dtype=np.int64)
            docs_view = docs[:n_full * B].reshape(n_full, B)
            tfs_view = tfs[:n_full * B].reshape(n_full, B)
            for w in np.unique(doc_bw):
                w = int(w)
                idx = np.flatnonzero(doc_bw == w)
                if w == 0:
                    deltas = np.zeros((len(idx), B), dtype=np.uint32)
                else:
                    size = packed_size(B, w)
                    buf = np.concatenate(
                        [self._data[offs[i]:offs[i] + size] for i in idx])
                    deltas = bitunpack(buf, len(idx) * B, w).reshape(len(idx), B)
                docs_view[idx] = (
                    np.cumsum(deltas, axis=1, dtype=np.int64)
                    + bases[idx][:, None]
                ).astype(np.uint32)
            for w in np.unique(tf_bw):
                w = int(w)
                idx = np.flatnonzero(tf_bw == w)
                if w == 0:
                    tfs_view[idx] = 0
                else:
                    size = packed_size(B, w)
                    buf = np.concatenate([
                        self._data[offs[i] + packed_size(B, int(doc_bw[i])):
                                   offs[i] + packed_size(B, int(doc_bw[i])) + size]
                        for i in idx
                    ])
                    tfs_view[idx] = bitunpack(
                        buf, len(idx) * B, w).reshape(len(idx), B)
        if n_full < nb:
            tdocs, ttfs = self.decode_block(nb - 1)
            docs[n_full * B:] = tdocs
            tfs[n_full * B:] = ttfs
        return docs, tfs

