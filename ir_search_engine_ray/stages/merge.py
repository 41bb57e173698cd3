"""Posting-list merge per salt partition, with explicit skew handling.

Reference semantics: group the (term, doc, tf) stream by term; postings sorted
by doc_id; df = number of postings (``index/SPIMI.java:89-117``, A1/A4 in
SURVEY.md).  The reference does this in one in-heap SortedMap; here the merge
is a per-partition reduce over map-side-partitioned SPIMI runs.

Skew / salting: Zipf head terms (the reference corpus already has df=730/1398
for "flow", ``stats.md:37``; at 10^12 turns a head posting list is multi-TB)
would make single-term groups unboundedly large.  The partition key is
therefore ``salt = doc_id // range_size`` — contiguous doc-id range buckets,
applied to EVERY term:

- every merge partition is bounded by ``range_size`` docs no matter how
  skewed the term distribution (a head term becomes S bounded chunks; a tail
  term occupies only the buckets it appears in, so total chunk rows never
  exceed total postings) — at 10^12 turns ``salt_buckets`` scales with N so
  ``range_size`` stays constant;
- a term's full posting list is the concatenation of its chunks in salt
  order — already doc_id-sorted, no re-sort, and no task ever materializes a
  head term's full list (SURVEY.md §4 "Skew");
- salt ranges double as DOC-PARTITIONED query shards: an actor holding all
  chunks of one salt range can score its documents against every query term
  locally, so per-actor top-k heaps merge into a correct global top-k
  (term-partitioned serving could not bound a doc's score locally);
- because the tokenize stage already wrote its runs partitioned by salt
  (stages/tokenize_stage.py), "shuffling" here is just grouping files by the
  salt in their name — one task per salt reads only its own runs; there is
  no Ray all-to-all and no per-(term,salt) Python group callback.

Each merged chunk is immediately delta-gap + varint compressed (F3), so the
merge output and the shards hold compressed bytes, not int64 lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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


def merge_salt_table(triples: pa.Table, salt: int) -> pa.Table:
    """All SPIMI-run triples of ONE salt partition -> compressed chunk rows.

    Fast path: when the triples arrive doc_id-non-decreasing (the normal
    case — each run is written doc-sorted and the caller concatenates runs
    by ascending ``doc_lo``; ranges are disjoint when the input is in conv
    order), a single STABLE sort on the term code yields per-term
    doc-sorted postings for free — the distributed form of the reference's
    monotone-docId invariant (``index/SPIMI.java:89-97``, the
    insertion-ordered posting maps).  Interleaved runs (unsorted input
    files) fall back to a full (term, doc) lexsort.

    Vectorized via term DICTIONARY ENCODING: strings are hashed to int32
    codes once (Arrow C++), the sort is a stable numpy radix sort over int
    codes, boundary detection is an int diff, and the term strings are
    materialized once per DISTINCT term for the output rows — no
    object-dtype string array over the full posting stream.

    Doc sets of SPIMI runs are disjoint (a doc is one row of one batch), so
    within a partition every (term, doc_id) is unique — ``encode_postings``
    raises on violations, which also catches any caller that broke the
    doc-order precondition (SURVEY.md §2.9 invariant).
    """
    if triples.num_rows == 0:
        return CHUNK_SCHEMA.empty_table()
    import pyarrow.compute as pc

    term_col = triples["term"].combine_chunks()  # unifies run dictionaries
    enc = (
        term_col
        if pa.types.is_dictionary(term_col.type)
        else pc.dictionary_encode(term_col)
    )
    dictionary = enc.dictionary
    codes = enc.indices.to_numpy()
    # rank[dict_index] = lexicographic position of that term
    rank = np.empty(len(dictionary), dtype=np.int64)
    sorted_dict_idx = np.asarray(pc.array_sort_indices(dictionary).to_numpy())
    rank[sorted_dict_idx] = np.arange(len(dictionary))
    doc_ids = triples["doc_id"].to_numpy()
    tfs = triples["tf"].to_numpy()
    if np.all(doc_ids[1:] >= doc_ids[:-1]):
        # common case: runs arrived globally doc-sorted — one stable sort
        order = np.argsort(rank[codes], kind="stable")
    else:
        # runs interleave doc ranges (e.g. unsorted input files): full sort
        order = np.lexsort((doc_ids, rank[codes]))
    key = rank[codes][order]
    doc_ids = doc_ids[order]
    tfs = tfs[order]
    change = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(key)]))
    id_bytes: list[bytes] = []
    tf_bytes: list[bytes] = []
    for s, e in zip(starts, ends):
        ib, tb = encode_postings(doc_ids[s:e], tfs[s:e])
        id_bytes.append(ib)
        tf_bytes.append(tb)
    term_col = dictionary.take(
        pa.array(sorted_dict_idx[key[starts]], type=pa.int64())
    )
    return pa.table(
        {
            "term": term_col,
            "salt": pa.array(
                np.full(starts.size, salt, dtype=np.int32), type=pa.int32()
            ),
            "df_chunk": pa.array(ends - starts, type=pa.int64()),
            "id_bytes": pa.array(id_bytes, type=pa.binary()),
            "tf_bytes": pa.array(tf_bytes, type=pa.binary()),
        }
    )
