"""Tokenize + per-document term counting: the SPIMI block stage.

The analogue of the reference's invert loop (``index/Indexer.java:90-117`` +
``index/SPIMI.java:111-117``) decomposed for Ray Data: each ``map_batches``
task tokenizes a batch of turns and emits the *complete* per-(term, doc) term
frequencies for those turns — a "SPIMI block".  Because one document is one
row, a batch always holds whole documents, so the per-(term, doc) counts are
exact with no cross-batch combining.

Map-side partitioning (the scale-critical design): the tokenizer knows each
doc's salt (``doc_id // range_size`` — contiguous doc-id range buckets, see
stages/merge.py) and writes its triples PARTITIONED BY SALT —
``block-s{salt}-... .parquet`` — exactly like a MapReduce map task writing
per-reducer runs.  The downstream merge then just groups files by salt: the
"shuffle" is file placement, not a Ray all-to-all, and each reduce partition
is independently resumable.  Per-batch doc lengths (``doc_len = sum tf``,
``max_tf``) are exact locally (whole docs per batch) and are written to the
doclen directory in the same pass — no ``groupby(doc_id)`` shuffle ever runs.

Two operating modes:

- ``TokenizeCount`` returns the triples as the batch output (streaming, no
  disk) — used for ad-hoc queries and tests;
- ``TokenizeWriteBlocks`` checkpoints per-salt block files + the doclen
  partial with atomic renames and returns per-file lineage manifest rows.
  File names are content-derived (doc-id range + count + CRC), so retries
  and re-runs are idempotent: existing files are skipped, not rewritten.

The tokenizer instance (with its memo cache) lives in ``__init__`` — once per
actor process, not per batch (reference's stem memo cache,
``index/Indexer.java:26-39``, generalized).
"""

from __future__ import annotations

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


class TokenizeWriteBlocks(TokenizeCount):
    """Tokenize and checkpoint each batch as salt-partitioned SPIMI runs
    plus a doclen partial."""

    def __init__(
        self, mode: str, blocks_dir: str, doclen_dir: str, range_size: int
    ) -> None:
        super().__init__(mode)
        self.blocks_dir = Path(blocks_dir)
        self.doclen_dir = Path(doclen_dir)
        self.range_size = max(1, range_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        lo, hi, n = int(doc_ids.min()), int(doc_ids.max()), len(doc_ids)
        crc = zlib.crc32(np.ascontiguousarray(doc_ids).tobytes())
        stem = f"{lo:012d}-{hi:012d}-{n}-{crc:08x}"
        rows: list[dict] = []

        # resume fast-path: the doclen partial is written LAST, so its
        # existence implies every per-salt block file of this batch exists
        if (self.doclen_dir / f"doclen-{stem}.parquet").exists():
            for f in sorted(self.blocks_dir.glob(f"block-s*-{stem}.parquet")):
                rows.append(
                    {
                        "file": f.name,
                        "kind": "block",
                        "salt": int(f.name.split("-")[1][1:]),
                        "doc_lo": lo,
                        "doc_hi": hi,
                        "n_rows": pq.read_metadata(f).num_rows,
                        "n_tokens": -1,
                        "skipped": True,
                    }
                )
            rows.append(
                {
                    "file": f"doclen-{stem}.parquet",
                    "kind": "doclen",
                    "salt": -1,
                    "doc_lo": lo,
                    "doc_hi": hi,
                    "n_rows": n,
                    "n_tokens": -1,
                    "skipped": True,
                }
            )
            return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)

        triples, n_tokens = self._triples(batch)
        t_ids = triples["doc_id"].to_numpy()
        salts = (t_ids // self.range_size).astype(np.int32)
        for salt in np.unique(salts):
            part = triples.filter(pa.array(salts == salt))
            name = f"block-s{int(salt):06d}-{stem}.parquet"
            written = atomic_write_bytes(
                self.blocks_dir / name, lambda tmp: pq.write_table(part, tmp)
            )
            rows.append(
                {
                    "file": name,
                    "kind": "block",
                    "salt": int(salt),
                    "doc_lo": lo,
                    "doc_hi": hi,
                    "n_rows": part.num_rows,
                    "n_tokens": int(part["tf"].to_numpy().sum()),
                    "skipped": not written,
                }
            )

        # exact per-doc lengths: every doc's postings are fully in `triples`
        uniq, inv = np.unique(t_ids, return_inverse=True)
        dl = np.zeros(uniq.size, dtype=np.int64)
        mx = np.zeros(uniq.size, dtype=np.int64)
        t_tfs = triples["tf"].to_numpy()
        np.add.at(dl, inv, t_tfs)
        np.maximum.at(mx, inv, t_tfs)
        dl_tbl = pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "doc_len": pa.array(dl, type=pa.int64()),
                "max_tf": pa.array(mx, type=pa.int64()),
            }
        )
        dl_name = f"doclen-{stem}.parquet"
        written = atomic_write_bytes(
            self.doclen_dir / dl_name, lambda tmp: pq.write_table(dl_tbl, tmp)
        )
        rows.append(
            {
                "file": dl_name,
                "kind": "doclen",
                "salt": -1,
                "doc_lo": lo,
                "doc_hi": hi,
                "n_rows": dl_tbl.num_rows,
                "n_tokens": n_tokens,
                "skipped": not written,
            }
        )
        return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)
