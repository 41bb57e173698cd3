"""Compatibility exporter: the reference's three on-disk index formats.

The serving index is the salt-partitioned chunk/parquet layout
(pipelines/index_build.py).  A user of the reference engine also gets its
three single-file binary formats (SURVEY.md S4-S6; ``README.md:29-31``,
``index/Compression.java:64-197``, ``pyindex/inverted_index.py:51-85``,
``pyindex/compressed_index.py:11-84``), re-expressed here as an export
utility over a built index:

- ``uncompressed``: fixed-width term dictionary + raw (doc_id, tf) pairs +
  per-term pointer records;
- ``gamma``: length-prefixed term dictionary, per-term postings as first
  doc_id raw + Elias-gamma gaps + raw tfs, pointer records with a term
  pointer every ``block_k`` terms;
- ``delta_front``: front-coded term dictionary blocks of ``block_k`` +
  Elias-delta gaps.

Each export is a triple of files (``dict.bin``, ``postings.bin``,
``ptr.bin``) plus ``docinfo.bin`` — the reference's file layout, with
documented deviations: integers are little-endian uint64 where the
reference used 4-byte ints (doc_ids overflow int32 at target scale), and
per-term gap streams are byte-aligned with an explicit byte length so the
pointer file addresses bytes (the reference's bit-packed variants carry
round-trip bugs — see functions/legacy_codec.py).

This is a driver-side utility for interchange/inspection, not the serving
path: the legacy formats are inherently one global term-sorted file.  At
scale you would export per term-range shard; the format functions are pure
and reusable for that.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import decode_postings_column
from ..functions.legacy_codec import (
    delta_encode,
    front_code_block,
    gamma_encode,
)

FORMATS = ("uncompressed", "gamma", "delta_front")


def _merged_postings(meta) -> tuple[list[str], list[np.ndarray], list[np.ndarray]]:
    """All terms in lexicographic order with their full (cross-salt) posting
    lists — salt-order concatenation is doc_id-sorted by construction."""
    t = pa.concat_tables([pq.read_table(f) for f in meta.shard_files()])
    if t.num_rows == 0:
        return [], [], []
    ids_flat, tfs_flat, lens = decode_postings_column(t["id_bytes"], t["tf_bytes"])
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(lens)
    by_term: dict[str, list[int]] = {}
    for row, term in enumerate(t["term"].to_pylist()):
        by_term.setdefault(term, []).append(row)
    terms = sorted(by_term)
    ids_out, tfs_out = [], []
    for term in terms:
        rows = by_term[term]  # shard files were read salt-ascending
        ids_out.append(
            np.concatenate([ids_flat[offsets[r] : offsets[r + 1]] for r in rows])
        )
        tfs_out.append(
            np.concatenate([tfs_flat[offsets[r] : offsets[r + 1]] for r in rows])
        )
    return terms, ids_out, tfs_out


def _write_docinfo(meta, out: Path) -> None:
    t = pq.read_table(meta.out_dir / "doclen")
    t = t.sort_by("doc_id")
    arr = np.column_stack(
        [
            t["doc_id"].to_numpy(),
            t["max_tf"].to_numpy(),
            t["doc_len"].to_numpy(),
        ]
    ).astype("<u8")
    (out / "docinfo.bin").write_bytes(arr.tobytes())


def export_legacy_index(meta, out_dir: str | Path, fmt: str, block_k: int = 8) -> dict:
    """Export a built index to one reference-style binary format.

    Returns size stats (the reference's headline comparison, ``stats.md:14-24``).
    """
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    terms, ids_list, tfs_list = _merged_postings(meta)

    dict_buf = bytearray()
    post_buf = bytearray()
    ptr_buf = bytearray()

    if fmt == "uncompressed":
        width = max((len(t.encode()) for t in terms), default=1)
        ptr_buf += struct.pack("<Q", width)
        for term, ids, tfs in zip(terms, ids_list, tfs_list):
            term_ptr = len(dict_buf)
            posting_ptr = len(post_buf)
            dict_buf += term.encode().ljust(width, b"\0")
            pairs = np.column_stack([ids, tfs]).astype("<u8")
            post_buf += pairs.tobytes()
            ptr_buf += struct.pack("<QQQ", len(ids), term_ptr, posting_ptr)
    else:
        encode = gamma_encode if fmt == "gamma" else delta_encode
        if fmt == "gamma":
            for term in terms:
                b = term.encode()
                dict_buf += struct.pack("<H", len(b)) + b
        else:  # front-coded blocks of block_k
            for i in range(0, len(terms), block_k):
                blob = front_code_block(terms[i : i + block_k]).encode()
                ptr_buf += struct.pack("<Q", len(dict_buf))  # block term_ptr
                dict_buf += struct.pack("<H", len(blob)) + blob
        term_ptr = 0
        for i, (term, ids, tfs) in enumerate(zip(terms, ids_list, tfs_list)):
            posting_ptr = len(post_buf)
            gaps = np.empty_like(ids)
            gaps[0] = ids[0] + 1  # gamma/delta cannot code 0; shift first id
            np.subtract(ids[1:], ids[:-1], out=gaps[1:])
            coded = encode(gaps)
            post_buf += struct.pack("<QI", int(ids[0]), len(coded))
            post_buf += coded
            post_buf += np.asarray(tfs, dtype="<u4").tobytes()
            ptr_buf += struct.pack("<QQ", len(ids), posting_ptr)
            if fmt == "gamma":
                if i % block_k == 0:
                    ptr_buf += struct.pack("<Q", term_ptr)
                term_ptr += 2 + len(term.encode())

    (out / "dict.bin").write_bytes(bytes(dict_buf))
    (out / "postings.bin").write_bytes(bytes(post_buf))
    (out / "ptr.bin").write_bytes(bytes(ptr_buf))
    _write_docinfo(meta, out)
    sizes = {
        f.name: (out / f.name).stat().st_size
        for f in out.iterdir()
        if f.suffix == ".bin"
    }
    return {"format": fmt, "n_terms": len(terms), "sizes": sizes,
            "total_bytes": sum(sizes.values())}


def read_legacy_postings(
    out_dir: str | Path, fmt: str, block_k: int = 8
) -> dict[str, list[tuple[int, int]]]:
    """Round-trip reader (tests/inspection): {term: [(doc_id, tf), ...]}."""
    from ..functions.legacy_codec import delta_decode, front_decode_block, gamma_decode

    out = Path(out_dir)
    dict_buf = (out / "dict.bin").read_bytes()
    post_buf = (out / "postings.bin").read_bytes()
    ptr_buf = (out / "ptr.bin").read_bytes()

    terms: list[str] = []
    records: list[tuple[int, int]] = []  # (df, posting_ptr)
    if fmt == "uncompressed":
        (width,) = struct.unpack_from("<Q", ptr_buf, 0)
        off = 8
        while off < len(ptr_buf):
            df, term_ptr, posting_ptr = struct.unpack_from("<QQQ", ptr_buf, off)
            off += 24
            terms.append(
                dict_buf[term_ptr : term_ptr + width].rstrip(b"\0").decode()
            )
            records.append((df, posting_ptr))
        out_map = {}
        for term, (df, pp) in zip(terms, records):
            arr = np.frombuffer(post_buf, dtype="<u8", count=2 * df, offset=pp)
            out_map[term] = [
                (int(arr[2 * i]), int(arr[2 * i + 1])) for i in range(df)
            ]
        return out_map

    if fmt == "gamma":
        off = 0
        while off < len(dict_buf):
            (ln,) = struct.unpack_from("<H", dict_buf, off)
            terms.append(dict_buf[off + 2 : off + 2 + ln].decode())
            off += 2 + ln
        decode = gamma_decode
        off = 0
        i = 0
        while off < len(ptr_buf):
            df, posting_ptr = struct.unpack_from("<QQ", ptr_buf, off)
            off += 16
            if i % block_k == 0:
                off += 8  # skip the interleaved term_ptr
            records.append((df, posting_ptr))
            i += 1
    else:
        # dict: [block term_ptrs ...][(df, posting_ptr) ...]; ptr file starts
        # with one uint64 per block, then the per-term records — recover the
        # split from the block count
        n_blocks = 0
        off = 0
        terms = []
        while off < len(dict_buf):
            (ln,) = struct.unpack_from("<H", dict_buf, off)
            blob = dict_buf[off + 2 : off + 2 + ln].decode()
            terms.extend(front_decode_block(blob))
            off += 2 + ln
            n_blocks += 1
        decode = delta_decode
        off = 8 * n_blocks
        while off < len(ptr_buf):
            df, posting_ptr = struct.unpack_from("<QQ", ptr_buf, off)
            off += 16
            records.append((df, posting_ptr))

    out_map = {}
    for term, (df, pp) in zip(terms, records):
        first, nbytes = struct.unpack_from("<QI", post_buf, pp)
        gaps = decode(post_buf[pp + 12 : pp + 12 + nbytes], count=df)
        ids = np.cumsum(gaps)
        ids[0] = first  # gap[0] was shifted by +1 at encode
        ids[1:] = first + np.cumsum(gaps[1:])
        tfs = np.frombuffer(
            post_buf, dtype="<u4", count=df, offset=pp + 12 + nbytes
        )
        out_map[term] = [(int(d), int(t)) for d, t in zip(ids, tfs)]
    return out_map
