"""Sequence packing: assign documents to fixed-size training sequences.

The standard LM data-prep step: concatenate documents in a deterministic
order and chunk the token stream into sequences of ``max_tokens`` — each
doc's placement is ``seq_id = floor(exclusive_prefix_sum(n_tokens) /
max_tokens)`` with its offset inside that sequence.  Exactly SQL-mirrorable
with one window function, which is the oracle.

Scale design — a distributed EXCLUSIVE PREFIX SUM without a global sort:

1. per-batch map emits (doc_id, n_tokens) plus a deterministic bucket key
   ``doc_id // bucket_size`` (partitioning-INDEPENDENT, unlike block
   position);
2. a (bucket -> sum) groupby whose output is ``N / bucket_size`` rows —
   metadata-sized, cumsum'd on the driver into per-bucket base offsets
   (the same bounded-collect shape as the build's stage manifests);
3. ``groupby(bucket).map_groups``: each bucket sorts its own docs by
   doc_id, local cumsum + broadcast base = the exact global prefix.

Every stage is a map or a bounded groupby; no all-to-all sort of the
corpus.  ``bucket_size`` bounds per-task work (default 64k docs/bucket).

A doc whose tokens straddle a boundary spans sequences
``seq_id .. seq_id_end`` — both reported; callers that forbid splitting
can treat ``seq_id != seq_id_end`` as a retry-with-padding signal.

No reference analogue; first-class training-data operator per the round
brief.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

_TOKEN = re.compile(r"[a-z]+")


def pack_sequences(
    docs_ds: ray.data.Dataset,
    *,
    max_tokens: int = 2048,
    bucket_size: int = 65536,
) -> ray.data.Dataset:
    """(doc_id, n_tokens, seq_id, seq_offset, seq_id_end) per document.

    ``seq_offset`` is the doc's first-token position inside ``seq_id``;
    ``seq_id_end`` is where its last token lands (== seq_id when the doc
    doesn't straddle a boundary).  Zero-token docs occupy no space: they
    report the boundary position they float at (seq_id_end == seq_id)."""

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        n = np.array(
            [len(_TOKEN.findall(t.lower())) for t in batch["text"].to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(n),
                "bucket": pa.array(ids // bucket_size),
            }
        )

    counted = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )
    # bounded: one row per bucket
    bucket_rows = counted.groupby("bucket").sum("n_tokens").take_all()
    buckets = sorted(int(r["bucket"]) for r in bucket_rows)
    sums = {int(r["bucket"]): int(r["sum(n_tokens)"]) for r in bucket_rows}
    base, bases = 0, {}
    for b in buckets:
        bases[b] = base
        base += sums[b]
    bases_ref = ray.put(bases)

    def place(group: pa.Table) -> pa.Table:
        bases_local = ray.get(bases_ref)
        g = group.sort_by([("doc_id", "ascending")])
        n = g["n_tokens"].to_numpy()
        start = bases_local[int(g["bucket"][0].as_py())] + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        end = start + np.maximum(n - 1, 0)  # last-token position (n>0)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": pa.array(n),
                "seq_id": pa.array(start // max_tokens),
                "seq_offset": pa.array(start % max_tokens),
                "seq_id_end": pa.array(
                    np.where(n > 0, end // max_tokens, start // max_tokens)
                ),
            }
        )

    return counted.groupby("bucket").map_groups(place, batch_format="pyarrow")


def chunk_documents(
    docs_ds: ray.data.Dataset,
    *,
    window: int = 128,
    stride: int = 96,
) -> ray.data.Dataset:
    """Sliding-window token chunking: split each document into
    ``window``-token chunks starting every ``stride`` tokens — the
    context-length splitting step of an LM data pipeline.

    Chunk rule (deliberately simple so the DuckDB oracle mirrors it
    exactly): starts at 0, stride, 2*stride, ... while the start is inside
    the token stream; the final chunks may be shorter than ``window``
    (stride < window ⇒ overlapping chunks; stride > window ⇒ gapped
    sampling — both allowed).  Tokenless docs emit nothing.

    Output: (doc_id, chunk_id, start_tok, n_tokens, text) — chunk_id is
    start_tok // stride, text is the space-joined token window.

    Scale: pure per-batch map over a pruned 2-column read, no shuffle; the
    output streams straight to a sink.  Row explosion is bounded by
    ceil(doc_tokens / stride) per doc."""
    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, got {window}, {stride}")

    def chunks(batch: pa.Table) -> pa.Table:
        out_doc: list[np.ndarray] = []
        out_start: list[np.ndarray] = []
        texts: list[str] = []
        lens: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].to_numpy(), batch["text"].to_pylist()
        ):
            toks = _TOKEN.findall(text.lower())
            n = len(toks)
            if n == 0:
                continue
            starts = np.arange(0, n, stride, dtype=np.int64)
            out_doc.append(np.full(starts.size, doc_id, dtype=np.int64))
            out_start.append(starts)
            for s in starts:
                w = toks[s : s + window]
                lens.append(len(w))
                texts.append(" ".join(w))
        if not out_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "chunk_id": pa.array([], type=pa.int64()),
                    "start_tok": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        start = np.concatenate(out_start)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc)),
                "chunk_id": pa.array(start // stride),
                "start_tok": pa.array(start),
                "n_tokens": pa.array(lens, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow"
    )
