"""Tokenize + per-document term counting: the SPIMI block stage.

The analogue of the reference's invert loop (``index/Indexer.java:90-117`` +
``index/SPIMI.java:111-117``) decomposed for Ray Data: each ``map_batches``
task tokenizes a batch of turns and emits the *complete* per-(term, doc) term
frequencies for those turns — a "SPIMI block".  Because one document is one
row, a batch always holds whole documents, so the per-(term, doc) counts are
exact with no cross-batch combining; the global ``groupby('term')`` merge
(stages/merge.py) only ever concatenates disjoint doc sets.

Two operating modes:

- ``TokenizeCount`` returns the triples as the batch output (streaming, no
  disk) — used for ad-hoc queries and tests;
- ``TokenizeWriteBlocks`` additionally checkpoints each block to
  ``blocks/block-*.parquet`` with an atomic rename and returns a one-row
  lineage manifest (doc range, row/token/term counts, content hash).  A
  restarted build re-runs the map cheaply but skips tokenization+write for
  blocks whose file already exists — the per-partition resume required by the
  north rule.  Block names are content-derived (doc-id range + count + CRC),
  so retries and reruns are idempotent.

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
    """Tokenize and checkpoint each batch as an on-disk SPIMI block."""

    def __init__(self, mode: str, blocks_dir: str) -> None:
        super().__init__(mode)
        self.blocks_dir = Path(blocks_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        lo, hi, n = int(doc_ids.min()), int(doc_ids.max()), len(doc_ids)
        crc = zlib.crc32(np.ascontiguousarray(doc_ids).tobytes())
        name = f"block-{lo:012d}-{hi:012d}-{n}-{crc:08x}.parquet"
        path = self.blocks_dir / name
        if path.exists():
            meta = pq.read_metadata(path)
            return _manifest_row(name, lo, hi, n, meta.num_rows, -1, skipped=True)
        triples, n_tokens = self._triples(batch)
        written = atomic_write_bytes(path, lambda tmp: pq.write_table(triples, tmp))
        return _manifest_row(
            name, lo, hi, n, triples.num_rows, n_tokens, skipped=not written
        )


def _manifest_row(
    name: str, lo: int, hi: int, n_docs: int, n_rows: int, n_tokens: int, skipped: bool
) -> pa.Table:
    return pa.table(
        {
            "block": [name],
            "doc_lo": pa.array([lo], type=pa.int64()),
            "doc_hi": pa.array([hi], type=pa.int64()),
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "n_rows": pa.array([n_rows], type=pa.int64()),
            "n_tokens": pa.array([n_tokens], type=pa.int64()),
            "skipped": pa.array([skipped], type=pa.bool_()),
        }
    )
