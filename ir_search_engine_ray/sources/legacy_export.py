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

This is an interchange/inspection utility, not the serving path: the
legacy formats are inherently one global term-sorted file.  The export
STREAMS: a k-way merge over the per-salt chunk files (each already
term-sorted; one record batch per file in memory at a time) feeds the
encoders term by term, and the three output files are appended
incrementally — no stage ever holds the whole index.
"""

from __future__ import annotations

import heapq
import struct
from pathlib import Path
from typing import Iterator

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


def _chunk_rows(f: Path) -> Iterator[tuple[str, np.ndarray, np.ndarray]]:
    """One chunk file -> (term, ids, tfs) rows in file (= term) order,
    decoding one record batch at a time (vectorized, bounded memory)."""
    pf = pq.ParquetFile(f)
    for batch in pf.iter_batches(columns=["term", "id_bytes", "tf_bytes"]):
        t = pa.Table.from_batches([batch])
        ids_flat, tfs_flat, lens = decode_postings_column(
            t["id_bytes"], t["tf_bytes"]
        )
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        for i, term in enumerate(t["term"].to_pylist()):
            yield term, ids_flat[offs[i] : offs[i + 1]], tfs_flat[offs[i] : offs[i + 1]]


def _iter_merged_postings(meta) -> Iterator[tuple[str, np.ndarray, np.ndarray]]:
    """All terms in lexicographic order with their full (cross-salt) posting
    lists, streamed.  ``heapq.merge`` is stable, and shard files iterate
    salt-ascending, so same-term rows concatenate doc_id-sorted by
    construction."""
    merged = heapq.merge(
        *[_chunk_rows(f) for f in meta.shard_files()], key=lambda r: r[0]
    )
    cur: str | None = None
    ids_parts: list[np.ndarray] = []
    tfs_parts: list[np.ndarray] = []
    for term, ids, tfs in merged:
        if term != cur:
            if cur is not None:
                yield cur, np.concatenate(ids_parts), np.concatenate(tfs_parts)
            cur, ids_parts, tfs_parts = term, [], []
        ids_parts.append(ids)
        tfs_parts.append(tfs)
    if cur is not None:
        yield cur, np.concatenate(ids_parts), np.concatenate(tfs_parts)


def _term_dict_stats(meta) -> tuple[int, int]:
    """(n_terms_global, max term byte width) from a column-pruned pass over
    the chunk term columns — the only extra pass the fixed-width
    'uncompressed' dictionary needs, one file in memory at a time."""
    import pyarrow.compute as pc

    terms_seen = 0
    width = 1
    uniq_parts: list[pa.Array] = []
    for f in meta.shard_files():
        col = pq.read_table(f, columns=["term"])["term"]
        if len(col):
            width = max(width, int(pc.max(pc.binary_length(col)).as_py()))
            uniq_parts.append(pc.unique(col.combine_chunks()))
    if uniq_parts:
        terms_seen = len(pc.unique(pa.concat_arrays(uniq_parts)))
    return terms_seen, width


def _write_docinfo(meta, out: Path) -> None:
    """Stream doclen partials in doc_id order: each partial file covers a
    doc range; write range files in ascending doc_lo order, falling back to
    a full sort only if ranges ever overlap (they cannot for a build's
    batch partition, but hand-made dirs get correctness over streaming)."""
    files = sorted((meta.out_dir / "doclen").glob("*.parquet"))
    spans = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "max_tf", "doc_len"])
        if t.num_rows == 0:
            continue
        t = t.sort_by("doc_id")
        spans.append((int(t["doc_id"][0].as_py()), int(t["doc_id"][-1].as_py()), t))
    spans.sort(key=lambda s: s[0])
    disjoint = all(
        spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1)
    )
    with open(out / "docinfo.bin", "wb") as fh:
        if disjoint:
            for _lo, _hi, t in spans:
                arr = np.column_stack(
                    [
                        t["doc_id"].to_numpy(),
                        t["max_tf"].to_numpy(),
                        t["doc_len"].to_numpy(),
                    ]
                ).astype("<u8")
                fh.write(arr.tobytes())
        elif spans:
            t = pa.concat_tables([t for _l, _h, t in spans]).sort_by("doc_id")
            arr = np.column_stack(
                [
                    t["doc_id"].to_numpy(),
                    t["max_tf"].to_numpy(),
                    t["doc_len"].to_numpy(),
                ]
            ).astype("<u8")
            fh.write(arr.tobytes())


def export_legacy_index(meta, out_dir: str | Path, fmt: str, block_k: int = 8) -> dict:
    """Export a built index to one reference-style binary format, streaming.

    One term in memory at a time: the merged-postings generator feeds the
    encoders, and dict/postings/ptr files are appended as the stream
    advances (``delta_front``'s block-pointer prologue goes through a temp
    file so ptr.bin keeps its [block ptrs][term records] layout).  Returns
    size stats (the reference's headline comparison, ``stats.md:14-24``).
    """
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    n_terms = 0
    dict_len = 0
    post_len = 0
    with open(out / "dict.bin", "wb") as dfh, open(
        out / "postings.bin", "wb"
    ) as pfh, open(out / "ptr.bin", "wb") as rfh:
        if fmt == "uncompressed":
            _n, width = _term_dict_stats(meta)
            rfh.write(struct.pack("<Q", width))
            for term, ids, tfs in _iter_merged_postings(meta):
                b = term.encode().ljust(width, b"\0")
                dfh.write(b)
                pfh.write(np.column_stack([ids, tfs]).astype("<u8").tobytes())
                rfh.write(struct.pack("<QQQ", len(ids), dict_len, post_len))
                dict_len += len(b)
                post_len += 16 * len(ids)
                n_terms += 1
        elif fmt == "gamma":
            term_ptr = 0
            for i, (term, ids, tfs) in enumerate(_iter_merged_postings(meta)):
                b = term.encode()
                dfh.write(struct.pack("<H", len(b)) + b)
                gaps = np.empty_like(ids)
                gaps[0] = ids[0] + 1  # gamma cannot code 0; shift first id
                np.subtract(ids[1:], ids[:-1], out=gaps[1:])
                coded = gamma_encode(gaps)
                pfh.write(struct.pack("<QI", int(ids[0]), len(coded)))
                pfh.write(coded)
                pfh.write(np.asarray(tfs, dtype="<u4").tobytes())
                rfh.write(struct.pack("<QQ", len(ids), post_len))
                if i % block_k == 0:
                    rfh.write(struct.pack("<Q", term_ptr))
                term_ptr += 2 + len(b)
                post_len += 12 + len(coded) + 4 * len(ids)
                n_terms += 1
        else:  # delta_front: block ptrs prologue, then per-term records
            block_terms: list[str] = []
            tmp_records = out / "ptr.terms.tmp"

            def flush_block() -> None:
                nonlocal dict_len
                if not block_terms:
                    return
                blob = front_code_block(block_terms).encode()
                rfh.write(struct.pack("<Q", dict_len))  # block term_ptr
                dfh.write(struct.pack("<H", len(blob)) + blob)
                dict_len += 2 + len(blob)
                block_terms.clear()

            with open(tmp_records, "wb") as tfh:
                for term, ids, tfs in _iter_merged_postings(meta):
                    block_terms.append(term)
                    if len(block_terms) == block_k:
                        flush_block()
                    gaps = np.empty_like(ids)
                    gaps[0] = ids[0] + 1  # delta cannot code 0
                    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
                    coded = delta_encode(gaps)
                    pfh.write(struct.pack("<QI", int(ids[0]), len(coded)))
                    pfh.write(coded)
                    pfh.write(np.asarray(tfs, dtype="<u4").tobytes())
                    tfh.write(struct.pack("<QQ", len(ids), post_len))
                    post_len += 12 + len(coded) + 4 * len(ids)
                    n_terms += 1
                flush_block()
            with open(tmp_records, "rb") as tfh:
                while chunk := tfh.read(1 << 20):
                    rfh.write(chunk)
            tmp_records.unlink()

    _write_docinfo(meta, out)
    sizes = {
        f.name: (out / f.name).stat().st_size
        for f in out.iterdir()
        if f.suffix == ".bin"
    }
    return {"format": fmt, "n_terms": n_terms, "sizes": sizes,
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
