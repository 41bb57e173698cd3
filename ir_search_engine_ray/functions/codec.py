"""Posting-list compression: delta-gap + varint (LEB128).

Replaces the reference's bit-level Elias gamma/delta codecs
(``pyindex/utils.py:4-19``, ``util/Utils.java:73-98``) with byte-aligned
varints per the north rule.  The reference codecs carry two latent bugs the
rebuild must not reproduce (SURVEY.md F3): the Python writer packs gamma codes
into uint16 (overflows for gaps needing >16 bits,
``pyindex/compressed_index.py:32``) and Java's ``gapToBytes`` returns an
all-zero array (``util/Utils.java:87-98``).  This codec is round-trip-correct
for arbitrary uint64 values; property tests in ``tests/test_textproc.py`` cover
gaps beyond 2**16 and 2**32.

Encoding of a posting list (doc_ids strictly increasing, tfs parallel):

- ``doc_ids`` -> gaps (first id raw, then diffs), each gap varint-encoded;
- ``tfs`` -> each value varint-encoded (tfs are small and skewed to 1).

Both directions are vectorized with numpy (no per-int Python loop): encode
computes every value's byte-length, carves per-value output slots, and fills
all 7-bit groups with strided writes; decode classifies continuation bits to
find value boundaries and reduces 7-bit groups per value.
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of output bytes per value: ceil(bit_length / 7), minimum 1
    nbits = np.full(v.shape, 1, dtype=np.int64)
    tmp = v.copy()
    mask = tmp >= np.uint64(128)
    while mask.any():
        tmp[mask] >>= np.uint64(7)
        nbits[mask] += 1
        mask = tmp >= np.uint64(128)
    ends = np.cumsum(nbits)
    total = int(ends[-1])
    out = np.empty(total, dtype=np.uint8)
    starts = ends - nbits
    # fill byte k of every value that has >= k+1 bytes
    maxlen = int(nbits.max())
    shifted = v.copy()
    for k in range(maxlen):
        sel = nbits > k
        pos = starts[sel] + k
        chunk = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
        # set continuation bit unless this is the value's last byte
        cont = (nbits[sel] - 1) > k
        out[pos] = chunk | (cont.astype(np.uint8) << 7)
        shifted[sel] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode an LEB128 byte string to a uint64 array (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    # value index of each byte = number of completed values before it
    value_idx = np.zeros(raw.size, dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last[:-1])
    n_values = int(is_last.sum())
    if not is_last[-1]:
        raise ValueError("truncated varint stream")
    # byte position within its value
    starts = np.zeros(n_values, dtype=np.int64)
    starts[1:] = np.nonzero(is_last)[0][:-1] + 1
    pos_in_value = np.arange(raw.size, dtype=np.int64) - starts[value_idx]
    out = np.zeros(n_values, dtype=np.uint64)
    payload = (raw & 0x7F).astype(np.uint64) << (pos_in_value * 7).astype(np.uint64)
    np.add.at(out, value_idx, payload)
    return out


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Delta-gap + varint encode a posting list sorted by doc_id."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.size and np.any(np.diff(ids) <= 0):
        raise ValueError("doc_ids must be strictly increasing")
    gaps = np.empty_like(ids)
    if ids.size:
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return varint_encode(gaps), varint_encode(np.asarray(tfs))


def _binary_column_bytes(col: "object") -> tuple[np.ndarray, np.ndarray]:
    """Arrow binary column -> (uint8 data, int64 per-row byte boundaries).

    Zero-copy view onto the column's offsets/data buffers; boundaries are
    rebased so ``data[boundaries[i]:boundaries[i+1]]`` is row i's payload.
    """
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    if arr.null_count:
        raise ValueError("binary column must not contain nulls")
    width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=width)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ]
    return data, offsets - offsets[0]


def varint_decode_column(col) -> tuple[np.ndarray, np.ndarray]:
    """Decode a whole Arrow binary column of varint streams in ONE pass.

    -> (flat uint64 values across all rows, int64 per-row value counts).
    Equivalent to ``[varint_decode(row) for row in col]`` without the
    per-row Python loop — used by the merge/finalize/query hot paths.
    """
    raw, bounds = _binary_column_bytes(col)
    n_rows = bounds.size - 1
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_rows, dtype=np.int64)
    is_last = (raw & 0x80) == 0
    # every non-empty row's final byte must terminate a value (cheap O(rows)
    # validation; avoids materializing a bytes-length cumsum)
    row_ends = bounds[1:]
    nonempty = bounds[:-1] < row_ends
    if not np.all(is_last[row_ends[nonempty] - 1]):
        raise ValueError("truncated varint stream")
    counts = np.zeros(n_rows, dtype=np.int64)
    if nonempty.any():
        # reduceat segments between consecutive non-empty row starts cover
        # each row exactly (empty rows contribute no bytes)
        counts[nonempty] = np.add.reduceat(is_last, bounds[:-1][nonempty])
    ends_pos = np.flatnonzero(is_last)
    n_values = ends_pos.size
    starts = np.empty(n_values, dtype=np.int64)
    starts[0] = 0
    np.add(ends_pos[:-1], 1, out=starts[1:])
    nbytes = np.empty(n_values, dtype=np.int64)
    np.subtract(ends_pos, starts, out=nbytes)
    nbytes += 1
    # gather byte k of every value that has one (<= 10 iterations) — a
    # strided gather per 7-bit group beats a scatter-add over every byte,
    # and masking AFTER the gather keeps intermediates value-sized
    out = np.zeros(n_values, dtype=np.uint64)
    sel = np.arange(n_values)
    k = 0
    while sel.size:
        chunk = raw[starts[sel] + k]
        out[sel] |= (chunk & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * k)
        k += 1
        sel = sel[nbytes[sel] > k]
    return out, counts


def decode_postings_column(id_col, tf_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode whole columns of encoded posting lists in one vectorized pass.

    -> (flat doc_ids int64, flat tfs int32, per-row lengths int64).  The
    per-row delta-gap cumsum is recovered from the global cumsum by
    subtracting each row's preceding prefix (rows start with an absolute id).
    """
    gaps, lens = varint_decode_column(id_col)
    tfs, tf_lens = varint_decode_column(tf_col)
    if not np.array_equal(lens, tf_lens):
        raise ValueError("doc_id / tf stream length mismatch")
    csum = np.cumsum(gaps.astype(np.int64))
    row_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    prefix = np.where(row_starts > 0, csum[row_starts - 1], 0)
    doc_ids = csum - np.repeat(prefix, lens)
    return doc_ids, tfs.astype(np.int32), lens


def decode_postings(id_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` -> (doc_ids int64, tfs int32)."""
    gaps = varint_decode(id_bytes).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = varint_decode(tf_bytes).astype(np.int32)
    if doc_ids.size != tfs.size:
        raise ValueError("doc_id / tf stream length mismatch")
    return doc_ids, tfs
