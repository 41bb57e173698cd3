"""Build-time term weighting and per-document cosine norms (A7).

The reference recomputes every posting's weighted tf and every document's L2
norm on EVERY query (``search/QueryParser.java:108-133`` walks the whole
index and mutates it).  The rebuild computes the same float64 values once at
build time, per weighting scheme (w1 / w2), and stores the *normalized*
weight ``wn(t,d) = w(t,d) / ||d_w||`` directly in the index shards:

    score(d) = sum_t wn(t,d) * w(t,q) / ||q||

so the query path needs NO doc-side side-tables at all — the doclen/norm
lookups that would otherwise be a per-query join (or an un-broadcastable
10^12-row table on every actor) are folded into the shards.  Per-chunk maxima
of wn (chunks are contiguous doc-id ranges = natural blocks) give block-max
upper bounds for WAND.

Two passes over the chunked postings:

1. ``weight_partials``: decode chunk -> w1/w2 per posting -> per-batch partial
   sums of w^2 per doc (combiner) -> ``groupby('doc_id').sum`` -> norms.
2. ``finalize_chunks``: decode chunk -> wn1/wn2 lists + chunk maxima.

Broadcast side-state: doc_len / max_tf / norms as dense numpy arrays indexed
by doc_id (dense ids make this O(1) zero-copy via ``ray.put``), df as a
term->int dict.  Scale note: at 10^12 docs these arrays don't broadcast; the
scale path keeps doclen/norms range-partitioned on disk keyed by the same
doc-range buckets as the chunk salt, and each task loads only the ranges its
chunks touch (chunks are doc-range-contiguous by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max, Sum

from ..functions.codec import decode_postings
from ..functions.scoring import w1_weight, w2_weight


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def doclen_table(triples_ds: ray.data.Dataset) -> ray.data.Dataset:
    """doc_len = sum(tf), max_tf = max(tf) per doc (A2/A3, intended
    semantics: doc_len counts non-stopword tokens = sum of index-term tfs)."""
    return triples_ds.groupby("doc_id").aggregate(Sum("tf"), Max("tf"))


def _decode_batch(batch: pa.Table):
    """Decode a batch of chunk rows -> flat arrays + per-row offsets."""
    ids_list = [
        decode_postings(i.as_py(), t.as_py())
        for i, t in zip(batch["id_bytes"], batch["tf_bytes"])
    ]
    lens = np.array([len(x[0]) for x in ids_list], dtype=np.int64)
    doc_ids = (
        np.concatenate([x[0] for x in ids_list])
        if ids_list
        else np.empty(0, np.int64)
    )
    tfs = (
        np.concatenate([x[1] for x in ids_list])
        if ids_list
        else np.empty(0, np.int32)
    )
    return doc_ids, tfs, lens


def weight_partials(
    batch: pa.Table, *, doclen_ref, maxtf_ref, df_ref, N: int, avgdl: float
) -> pa.Table:
    """Chunk rows -> per-doc partial sums of squared weights (pre-aggregated
    inside the task so the groupby shuffles partials, not postings)."""
    doc_ids, tfs, lens = _decode_batch(batch)
    if doc_ids.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "nsq1": pa.array([], type=pa.float64()),
                "nsq2": pa.array([], type=pa.float64()),
            }
        )
    doc_len = _get(doclen_ref)
    max_tf = _get(maxtf_ref)
    df_map = _get(df_ref)
    df_per_row = np.array([df_map[t] for t in batch["term"].to_pylist()], np.int64)
    dfs = np.repeat(df_per_row, lens)
    w1 = w1_weight(tfs, max_tf[doc_ids], dfs, N)
    w2 = w2_weight(tfs, doc_len[doc_ids], dfs, N, avgdl)
    uniq, inv = np.unique(doc_ids, return_inverse=True)
    nsq1 = np.zeros(uniq.size)
    nsq2 = np.zeros(uniq.size)
    np.add.at(nsq1, inv, w1 * w1)
    np.add.at(nsq2, inv, w2 * w2)
    return pa.table(
        {
            "doc_id": pa.array(uniq, type=pa.int64()),
            "nsq1": pa.array(nsq1, type=pa.float64()),
            "nsq2": pa.array(nsq2, type=pa.float64()),
        }
    )


def norms_table(
    chunks_ds: ray.data.Dataset, doclen_ref, maxtf_ref, df_ref, N: int, avgdl: float
) -> ray.data.Dataset:
    partials = chunks_ds.map_batches(
        weight_partials,
        fn_kwargs={
            "doclen_ref": doclen_ref,
            "maxtf_ref": maxtf_ref,
            "df_ref": df_ref,
            "N": N,
            "avgdl": avgdl,
        },
        batch_format="pyarrow",
    )
    return partials.groupby("doc_id").aggregate(Sum("nsq1"), Sum("nsq2"))


def finalize_chunks(
    batch: pa.Table,
    *,
    doclen_ref,
    maxtf_ref,
    df_ref,
    norm1_ref,
    norm2_ref,
    N: int,
    avgdl: float,
) -> pa.Table:
    """Chunk rows -> shard rows with normalized weights and block maxima."""
    doc_ids, tfs, lens = _decode_batch(batch)
    df_map = _get(df_ref)
    df_per_row = np.array(
        [df_map[t] for t in batch["term"].to_pylist()], dtype=np.int64
    )
    if doc_ids.size:
        doc_len = _get(doclen_ref)
        max_tf = _get(maxtf_ref)
        norm1 = _get(norm1_ref)
        norm2 = _get(norm2_ref)
        dfs = np.repeat(df_per_row, lens)
        w1 = w1_weight(tfs, max_tf[doc_ids], dfs, N)
        w2 = w2_weight(tfs, doc_len[doc_ids], dfs, N, avgdl)
        wn1 = w1 / norm1[doc_ids]
        wn2 = w2 / norm2[doc_ids]
    else:
        wn1 = wn2 = np.empty(0, np.float64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    wn1_col = pa.ListArray.from_arrays(pa.array(offsets), pa.array(wn1))
    wn2_col = pa.ListArray.from_arrays(pa.array(offsets), pa.array(wn2))
    max1 = np.array(
        [wn1[a:b].max() if b > a else 0.0 for a, b in zip(offsets, offsets[1:])]
    )
    max2 = np.array(
        [wn2[a:b].max() if b > a else 0.0 for a, b in zip(offsets, offsets[1:])]
    )
    return pa.table(
        {
            "term": batch["term"],
            "salt": batch["salt"],
            "df": pa.array(df_per_row, type=pa.int64()),
            "n": pa.array(lens, type=pa.int64()),
            "id_bytes": batch["id_bytes"],
            "tf_bytes": batch["tf_bytes"],
            "wn1": wn1_col,
            "wn2": wn2_col,
            "max_wn1": pa.array(max1, type=pa.float64()),
            "max_wn2": pa.array(max2, type=pa.float64()),
        }
    )
