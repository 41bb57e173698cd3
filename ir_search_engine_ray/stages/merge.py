"""Posting-list merge: the one real shuffle, with explicit skew handling.

Reference semantics: group the (term, doc, tf) stream by term; postings sorted
by doc_id; df = number of postings (``index/SPIMI.java:89-117``, A1/A4 in
SURVEY.md).  The reference does this in one in-heap SortedMap; here it is a
salted ``groupby`` over the SPIMI-block triples.

Skew / salting: Zipf head terms (the reference corpus already has df=730/1398
for "flow", ``stats.md:37``; at 10^12 turns a head posting list is multi-TB)
would make single-term groups unboundedly large.  The group key is therefore
``(term, salt)`` with ``salt = doc_id // range_size`` — contiguous doc-id
range buckets, applied to EVERY term:

- every merge group is bounded by ``range_size`` docs, no matter how skewed
  the term distribution (a head term becomes S bounded chunks; a tail term
  with df < S occupies only the buckets it appears in, so total chunk rows
  never exceed total postings);
- a term's full posting list is the concatenation of its chunks in salt
  order — already doc_id-sorted, no re-sort, and no task ever materializes a
  head term's full list (SURVEY.md §4 "Skew");
- salt ranges double as DOC-PARTITIONED query shards: an actor holding all
  chunks of one salt range can score its documents against every query term
  locally, so per-actor top-k heaps merge into a correct global top-k
  (term-partitioned serving could not bound a doc's score locally).

Each merged chunk is immediately delta-gap + varint compressed (F3), so the
shuffle output and the shards hold compressed bytes, not int64 lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions.codec import encode_postings

CHUNK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df_chunk", pa.int64()),
        ("id_bytes", pa.binary()),
        ("tf_bytes", pa.binary()),
    ]
)


def range_size_for(n_docs: int, salt_buckets: int) -> int:
    return max(1, -(-n_docs // max(1, salt_buckets)))


def add_salt(batch: pa.Table, *, range_size: int) -> pa.Table:
    """Adds the chunking key: the doc-id range bucket."""
    salt = (batch["doc_id"].to_numpy() // max(1, range_size)).astype(np.int32)
    return batch.append_column("salt", pa.array(salt, type=pa.int32()))


def merge_chunk_group(group: pa.Table) -> pa.Table:
    """One (term, salt) group -> one compressed posting-list chunk row.

    Doc sets of SPIMI blocks are disjoint (a doc is one row of one batch), so
    within a group every doc_id is unique; sortedness is imposed here rather
    than assumed from arrival order (SURVEY.md §2.9 invariant).
    """
    doc_ids = group["doc_id"].to_numpy()
    tfs = group["tf"].to_numpy()
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfs = tfs[order]
    id_bytes, tf_bytes = encode_postings(doc_ids, tfs)  # raises on duplicates
    return pa.table(
        {
            "term": [group["term"][0].as_py()],
            "salt": pa.array([group["salt"][0].as_py()], type=pa.int32()),
            "df_chunk": pa.array([len(doc_ids)], type=pa.int64()),
            "id_bytes": pa.array([id_bytes], type=pa.binary()),
            "tf_bytes": pa.array([tf_bytes], type=pa.binary()),
        }
    )


def merge_postings(
    triples_ds: ray.data.Dataset, n_docs: int, salt_buckets: int
) -> ray.data.Dataset:
    """triples -> chunked, compressed posting lists (the A1 shuffle)."""
    range_size = range_size_for(n_docs, salt_buckets)
    salted = triples_ds.map_batches(
        add_salt, fn_kwargs={"range_size": range_size}, batch_format="pyarrow"
    )
    return salted.groupby(["term", "salt"]).map_groups(
        merge_chunk_group, batch_format="pyarrow"
    )


def df_table(chunks_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Full per-term df = sum of chunk dfs (A4)."""
    return chunks_ds.groupby("term").aggregate(Sum("df_chunk"))
