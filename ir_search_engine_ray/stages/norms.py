"""Per-salt finalization: term weighting, cosine norms, shard rows (A7).

The reference recomputes every posting's weighted tf and every document's L2
norm on EVERY query (``search/QueryParser.java:108-133`` walks the whole
index and mutates it).  The rebuild computes the same float64 values once at
build time, per weighting scheme (w1 / w2), and stores the *normalized*
weight ``wn(t,d) = w(t,d) / ||d_w||`` directly in the index shards:

    score(d) = sum_t wn(t,d) * w(t,q) / ||q||

so the query path needs NO doc-side side-tables at all.  Per-chunk maxima of
wn (chunks are contiguous doc-id ranges = natural blocks) give block-max
upper bounds for WAND.

Locality argument (why this stage needs NO shuffle): a salt partition is a
doc-id range and holds ALL postings of its documents — so ``doc_len``,
``max_tf`` and the L2 norms are exact local computations inside one salt
task.  The only global inputs are scalars (N, avgdl) and the df table.  df
is broadcast via ``ray.put`` (term -> df dict, Zipf-small relative to
postings); at 10^12-doc scale with a huge vocabulary the df table is instead
written term-range-partitioned and each salt task streams only the term
ranges its chunk file contains (chunk rows are term-sorted, so that read is
a single merge pass).

Everything is vectorized: posting columns are decoded with the one-pass
column decoder (functions/codec.py), weights/norms use numpy scatter-reduce,
chunk maxima use ``np.maximum.reduceat``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import decode_postings_column
from ..functions.scoring import w1_weight, w2_weight

NORMS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("nsq1", pa.float64()), ("nsq2", pa.float64())]
)


def finalize_salt(
    chunks: pa.Table, df_map: dict[str, int], N: int, avgdl: float
) -> tuple[pa.Table, pa.Table]:
    """One salt's merged chunk rows -> (norms table, shard table).

    Returns per-doc squared-norm sums (the ``norms/`` artifact) and the
    final shard rows with normalized weights + block maxima.
    """
    if chunks.num_rows == 0:
        shard = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "salt": pa.array([], type=pa.int32()),
                "df": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "id_bytes": pa.array([], type=pa.binary()),
                "tf_bytes": pa.array([], type=pa.binary()),
                "wn1": pa.array([], type=pa.list_(pa.float64())),
                "wn2": pa.array([], type=pa.list_(pa.float64())),
                "max_wn1": pa.array([], type=pa.float64()),
                "max_wn2": pa.array([], type=pa.float64()),
            }
        )
        return NORMS_SCHEMA.empty_table(), shard

    doc_ids, tfs, lens = decode_postings_column(
        chunks["id_bytes"], chunks["tf_bytes"]
    )
    if doc_ids.size >= 2**31:
        raise ValueError("salt partition too large; raise salt_buckets")
    df_per_row = np.array(
        [df_map[t] for t in chunks["term"].to_pylist()], dtype=np.int64
    )
    dfs = np.repeat(df_per_row, lens)

    # local doc stats: the salt range holds all postings of its docs
    uniq, inv = np.unique(doc_ids, return_inverse=True)
    doc_len = np.zeros(uniq.size, dtype=np.int64)
    max_tf = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(doc_len, inv, tfs)
    np.maximum.at(max_tf, inv, tfs)

    w1 = w1_weight(tfs, max_tf[inv], dfs, N)
    w2 = w2_weight(tfs, doc_len[inv], dfs, N, avgdl)
    nsq1 = np.zeros(uniq.size)
    nsq2 = np.zeros(uniq.size)
    np.add.at(nsq1, inv, w1 * w1)
    np.add.at(nsq2, inv, w2 * w2)
    norms_tbl = pa.table(
        {
            "doc_id": pa.array(uniq, type=pa.int64()),
            "nsq1": pa.array(nsq1, type=pa.float64()),
            "nsq2": pa.array(nsq2, type=pa.float64()),
        }
    )

    norm1 = np.sqrt(nsq1)
    norm2 = np.sqrt(nsq2)
    norm1[norm1 == 0] = 1.0  # all-zero-weight docs never score; avoid 0/0
    norm2[norm2 == 0] = 1.0
    wn1 = w1 / norm1[inv]
    wn2 = w2 / norm2[inv]

    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    offsets[1:] = np.cumsum(lens)
    wn1_col = pa.ListArray.from_arrays(pa.array(offsets), pa.array(wn1))
    wn2_col = pa.ListArray.from_arrays(pa.array(offsets), pa.array(wn2))
    # every chunk row has df_chunk >= 1 postings, so reduceat is safe
    max1 = np.maximum.reduceat(wn1, offsets[:-1].astype(np.int64))
    max2 = np.maximum.reduceat(wn2, offsets[:-1].astype(np.int64))
    shard = pa.table(
        {
            "term": chunks["term"],
            "salt": chunks["salt"],
            "df": pa.array(df_per_row, type=pa.int64()),
            "n": pa.array(lens, type=pa.int64()),
            "id_bytes": chunks["id_bytes"],
            "tf_bytes": chunks["tf_bytes"],
            "wn1": wn1_col,
            "wn2": wn2_col,
            "max_wn1": pa.array(max1, type=pa.float64()),
            "max_wn2": pa.array(max2, type=pa.float64()),
        }
    )
    return norms_tbl, shard
