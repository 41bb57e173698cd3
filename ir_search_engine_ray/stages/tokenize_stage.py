"""Tokenize + per-document term counting: the SPIMI block stage.

The analogue of the reference's invert loop (``index/Indexer.java:90-117`` +
``index/SPIMI.java:111-117``) decomposed for Ray Data: each ``map_batches``
task tokenizes a batch of turns and emits the *complete* per-(term, doc) term
frequencies for those turns — a "SPIMI block".  Because one document is one
row, a batch always holds whole documents, so the per-(term, doc) counts are
exact with no cross-batch combining.

Map-side partitioning (the scale-critical design): the tokenizer knows each
doc's salt (``doc_id // range_size`` — contiguous doc-id range buckets, see
stages/merge.py) and writes its triples PARTITIONED BY SALT — exactly like a
MapReduce map task writing per-reducer runs.  The downstream merge then just
reads its own partition: the "shuffle" is file placement, not a Ray
all-to-all, and each reduce partition is independently resumable.

File format for the runs: ONE Arrow IPC file per batch with ONE RECORD BATCH
PER SALT (salt list + per-salt row counts in the schema metadata).  The IPC
file format is random-access per record batch, so a reduce task extracts
just its salt's batches by footer offset — per-salt reads WITHOUT writing
batches × salts separate files (that M×R small-file explosion made file
creation, not tokenization, the dominant cost of this stage) and without
re-reading other salts' data.

Per-batch doc lengths (``doc_len = sum tf``, ``max_tf``) are exact locally
(whole docs per batch) and are written to the doclen directory in the same
pass — no ``groupby(doc_id)`` shuffle ever runs.

Two operating modes:

- ``TokenizeCount`` returns the triples as the batch output (streaming, no
  disk) — used for ad-hoc queries and tests;
- ``TokenizeWriteBlocks`` checkpoints the per-batch run file + doclen
  partial with atomic renames and returns per-salt lineage manifest rows.
  File names are content-derived (doc-id range + count + CRC), so retries
  and re-runs are idempotent: existing files are skipped, not rewritten.

The tokenizer instance (with its memo cache) lives once per worker process
(reference's stem memo cache, ``index/Indexer.java:26-39``, generalized).
"""

from __future__ import annotations

import json
import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.manifest import atomic_write_bytes
from ..textproc import TokenPipeline

TRIPLES_SCHEMA = pa.schema(
    [("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int32())]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("file", pa.string()),
        ("kind", pa.string()),  # "block" | "doclen"
        ("salt", pa.int32()),  # -1 for doclen
        ("batch_index", pa.int32()),  # record-batch index in the file; -1 doclen
        ("doc_lo", pa.int64()),
        ("doc_hi", pa.int64()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
        ("skipped", pa.bool_()),
    ]
)


class TokenizeCount:
    """Batch of (doc_id, text) -> batch of (term, doc_id, tf)."""

    def __init__(self, mode: str = "full") -> None:
        self.pipe = TokenPipeline(mode)

    def _triples(self, batch: pa.Table) -> tuple[pa.Table, int]:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        terms: list[str] = []
        docs: list[int] = []
        tfs: list[int] = []
        n_tokens = 0
        pipe = self.pipe
        for doc_id, text in zip(doc_ids, texts):
            counts = pipe.term_counts(text)
            if not counts:
                continue
            terms.extend(counts.keys())
            docs.extend([doc_id] * len(counts))
            tfs.extend(counts.values())
            n_tokens += sum(counts.values())
        table = pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "tf": pa.array(tfs, type=pa.int32()),
            }
        )
        return table, n_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        table, _ = self._triples(batch)
        return table


def _block_meta(salts: list[int], rows: list[int], tokens: list[int]) -> dict:
    return {
        b"spimi": json.dumps(
            {"salts": salts, "rows": rows, "tokens": tokens}
        ).encode()
    }


def read_block_meta(path: Path) -> dict:
    """Footer-only read of a run file's per-salt layout."""
    with pa.OSFile(str(path), "rb") as f:
        reader = pa.ipc.open_file(f)
        return json.loads(reader.schema.metadata[b"spimi"].decode())


def read_block_batches(path: str, indices: list[int]) -> list[pa.RecordBatch]:
    """Random-access read of selected record batches: the IPC footer gives
    each batch's offset, so only the requested salts' bytes are read."""
    with pa.OSFile(path, "rb") as f:
        reader = pa.ipc.open_file(f)
        return [reader.get_batch(int(i)) for i in indices]


class TokenizeWriteBlocks(TokenizeCount):
    """Tokenize and checkpoint each batch as one salt-partitioned SPIMI run
    file plus a doclen partial."""

    def __init__(
        self, mode: str, blocks_dir: str, doclen_dir: str, range_size: int
    ) -> None:
        super().__init__(mode)
        self.blocks_dir = Path(blocks_dir)
        self.doclen_dir = Path(doclen_dir)
        self.range_size = max(1, range_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return MANIFEST_SCHEMA.empty_table()
        doc_ids = batch["doc_id"].to_numpy()
        lo, hi, n = int(doc_ids.min()), int(doc_ids.max()), len(doc_ids)
        crc = zlib.crc32(np.ascontiguousarray(doc_ids).tobytes())
        stem = f"{lo:012d}-{hi:012d}-{n}-{crc:08x}"
        blk_path = self.blocks_dir / f"block-{stem}.arrow"
        dl_path = self.doclen_dir / f"doclen-{stem}.parquet"
        rows: list[dict] = []

        # resume fast-path: the doclen partial is written LAST, so its
        # existence implies this batch's run file is complete
        if dl_path.exists():
            if blk_path.exists():
                meta = read_block_meta(blk_path)
                for i, (salt, nr, nt) in enumerate(
                    zip(meta["salts"], meta["rows"], meta["tokens"])
                ):
                    rows.append(
                        _mrow(blk_path.name, "block", salt, i, lo, hi, nr, nt, True)
                    )
            prev = pq.read_table(dl_path, columns=["doc_len"])
            rows.append(
                _mrow(
                    dl_path.name,
                    "doclen",
                    -1,
                    -1,
                    lo,
                    hi,
                    prev.num_rows,
                    # real token total so the driver can sum doc_len from
                    # the manifest alone (no extra pass over doclen files)
                    int(pa.compute.sum(prev["doc_len"]).as_py() or 0),
                    True,
                )
            )
            return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)

        triples, n_tokens = self._triples(batch)
        t_ids = triples["doc_id"].to_numpy()
        t_tfs = triples["tf"].to_numpy()
        # sorting by doc_id also groups salts (salt is monotone in doc_id)
        # and makes every run doc_id-sorted — the merge's fast-path invariant
        order = np.argsort(t_ids, kind="stable")
        salts = (t_ids // self.range_size).astype(np.int64)
        grouped = triples.take(pa.array(order)).combine_chunks()
        # dictionary-encode terms once per run (all salt slices share the
        # dictionary) + lz4 frames: the runs are the build's dominant I/O,
        # and raw strings made them ~6x larger
        import pyarrow.compute as pc

        grouped = grouped.set_column(
            0, "term", pc.dictionary_encode(grouped["term"].combine_chunks())
        )
        sorted_salts = salts[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(sorted_salts)) + 1, [len(sorted_salts)])
        )
        salt_vals = [int(s) for s in sorted_salts[bounds[:-1]]]
        salt_rows = [int(b - a) for a, b in zip(bounds[:-1], bounds[1:])]
        salt_tokens = [
            int(t_tfs[order[a:b]].sum()) for a, b in zip(bounds[:-1], bounds[1:])
        ]

        def write_run(tmp: Path) -> None:
            schema = grouped.schema.with_metadata(
                _block_meta(salt_vals, salt_rows, salt_tokens)
            )
            opts = pa.ipc.IpcWriteOptions(compression="lz4")
            with pa.OSFile(str(tmp), "wb") as sink:
                with pa.ipc.new_file(sink, schema, options=opts) as writer:
                    for a, b in zip(bounds[:-1], bounds[1:]):
                        part = grouped.slice(a, b - a)
                        for rb in part.to_batches():
                            writer.write_batch(rb)

        written = atomic_write_bytes(blk_path, write_run)
        for i, (salt, nr, nt) in enumerate(zip(salt_vals, salt_rows, salt_tokens)):
            rows.append(
                _mrow(blk_path.name, "block", salt, i, lo, hi, nr, nt, not written)
            )

        # exact per-doc lengths: every doc's postings are fully in `triples`
        uniq, inv = np.unique(t_ids, return_inverse=True)
        dl = np.zeros(uniq.size, dtype=np.int64)
        mx = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(dl, inv, t_tfs)
        np.maximum.at(mx, inv, t_tfs)
        dl_tbl = pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "doc_len": pa.array(dl, type=pa.int64()),
                "max_tf": pa.array(mx, type=pa.int64()),
            }
        )
        written = atomic_write_bytes(
            dl_path, lambda tmp: pq.write_table(dl_tbl, tmp)
        )
        rows.append(
            _mrow(
                dl_path.name,
                "doclen",
                -1,
                -1,
                lo,
                hi,
                dl_tbl.num_rows,
                n_tokens,
                not written,
            )
        )
        return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)


def _mrow(file, kind, salt, batch_index, lo, hi, n_rows, n_tokens, skipped):
    return {
        "file": file,
        "kind": kind,
        "salt": int(salt),
        "batch_index": int(batch_index),
        "doc_lo": lo,
        "doc_hi": hi,
        "n_rows": int(n_rows),
        "n_tokens": int(n_tokens),
        "skipped": bool(skipped),
    }


_WRITER_CACHE: dict[tuple, TokenizeWriteBlocks] = {}


def tokenize_write_blocks(
    batch: pa.Table, *, mode: str, blocks_dir: str, doclen_dir: str, range_size: int
) -> pa.Table:
    """Task-form of :class:`TokenizeWriteBlocks` with a per-worker-process
    instance cache.

    Ray reuses worker processes across batches, so the pipeline (compiled
    regexes, stem memo cache) is built once per process — the same
    amortization an actor pool gives, WITHOUT the actor-pool cold start
    (spawning + importing in N fresh actor processes was the dominant cost
    of the build at high parallelism, and tasks share the already-warm
    default worker pool with the upstream read)."""
    key = (mode, blocks_dir, doclen_dir, range_size)
    writer = _WRITER_CACHE.get(key)
    if writer is None:
        writer = _WRITER_CACHE[key] = TokenizeWriteBlocks(
            mode, blocks_dir, doclen_dir, range_size
        )
    return writer(batch)
