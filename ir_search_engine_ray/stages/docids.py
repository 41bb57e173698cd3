"""Deterministic dense doc_id assignment under stable turn ordering.

The reference assigns dense doc_ids by enumerating a sorted filename list
(``index/Indexer.java:74-88``).  Here a document is one transcript turn keyed
by ``(conv_id, turn_idx)`` (BASELINE.json), and the doc_id must be the rank of
that key under the global ``(conv_id, turn_idx)`` sort — *without* a global
sort-then-enumerate pass, which would be an all-to-all shuffle whose output
enumeration is partition-dependent.

Instead: one small ``groupby('conv_id')`` aggregate yields each conversation's
turn count; a prefix sum over conv_ids in sorted order yields each
conversation's base offset; then ``doc_id = base[conv_id] + turn_idx`` is a
pure per-row map — deterministic under ANY partitioning of the input, which is
what makes posting lists reproducible and retries idempotent.

Scale note (10^12 turns ≈ 3·10^10 conversations): the offsets table no longer
fits on the driver; the same construction then runs hierarchically (range-
partition conv_ids, per-range prefix sums + one tiny top-level pass) and the
offset table is broadcast per range.  At sandbox scale the offsets dict is a
few MB and is shipped once via ``ray.put`` (read per actor, not per batch).

Requires turn_idx to be dense 0..n-1 within each conversation (validated from
the same aggregate); duplicate ``(conv_id, turn_idx)`` keys would violate the
doc-key uniqueness invariant (SURVEY.md §2.7) and fail validation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _conv_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (conv_id, partial count, partial max turn)."""
    g = batch.select(["conv_id", "turn_idx"]).group_by("conv_id").aggregate(
        [("turn_idx", "count"), ("turn_idx", "max")]
    )
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "n": g["turn_idx_count"],
            "max_turn": g["turn_idx_max"],
        }
    )


def conversation_offsets(ds: ray.data.Dataset) -> tuple[dict[str, int], int]:
    """-> ({conv_id: base_doc_id}, total_doc_count).

    Pre-aggregated inside ``map_batches`` (combiner), final merge on the
    driver over conversation-sized partials — no Ray all-to-all for what is
    a vocabulary-of-conversations-sized aggregate.  Validates turn density:
    within a conversation, turn_idx must be exactly 0..count-1 (so
    ``base + turn_idx`` is a bijection onto 0..N-1).
    """
    refs = ds.map_batches(_conv_partial, batch_format="pyarrow").to_arrow_refs()
    parts = [t for t in ray.get(refs) if t.num_rows]
    if not parts:
        return {}, 0
    agg = (
        pa.concat_tables(parts)
        .group_by("conv_id")
        .aggregate([("n", "sum"), ("max_turn", "max")])
        .sort_by("conv_id")
    )
    offsets: dict[str, int] = {}
    base = 0
    for conv_id, n, max_turn in zip(
        agg["conv_id"].to_pylist(),
        agg["n_sum"].to_pylist(),
        agg["max_turn_max"].to_pylist(),
    ):
        if max_turn != n - 1:
            raise ValueError(
                f"conversation {conv_id!r} has non-dense or duplicate "
                f"turn_idx (count={n}, max={max_turn})"
            )
        offsets[conv_id] = base
        base += n
    return offsets, base


def conversation_offsets_table(
    ds: ray.data.Dataset, *, hierarchical: bool = False
) -> pa.Table:
    """(conv_id, base, n_turns) table under global conv_id order — the
    persisted form of the offsets (``convs.parquet``).

    ``hierarchical=False``: the driver-merge fast path
    (:func:`conversation_offsets`), right while the conversation table fits
    one process.

    ``hierarchical=True``: the scale path promised in the module docstring —
    per-batch combiners feed a distributed ``groupby(conv_id)`` then a
    range-partitioning ``sort(conv_id)``; each sorted range VALIDATES turn
    density and computes its local prefix sums in a Ray task, and the driver
    touches only per-range totals (one tiny top-level prefix pass) plus the
    final buffer concatenation for the broadcastable result.  No
    conversation-count-sized dict and no per-conversation Python loop exist
    anywhere; identical output to the fast path (asserted in tests).
    """
    if not hierarchical:
        offsets, total = conversation_offsets(ds)
        convs = sorted(offsets)
        bases = np.array([offsets[c] for c in convs], dtype=np.int64)
        sizes = np.empty(len(convs), dtype=np.int64)
        if len(convs):
            sizes[:-1] = bases[1:] - bases[:-1]
            sizes[-1] = total - bases[-1]
        return pa.table(
            {
                "conv_id": pa.array(convs, type=pa.string()),
                "base": pa.array(bases),
                "n_turns": pa.array(sizes),
            }
        )

    from ray.data.aggregate import Max, Sum

    agg = (
        ds.map_batches(_conv_partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n"), Max("max_turn"))
        .sort("conv_id")
    )
    refs = [r for r in agg.to_arrow_refs()]

    @ray.remote
    def localize(t: pa.Table) -> tuple[pa.Table, int]:
        """Validate density and compute the range-local exclusive prefix."""
        n = t["sum(n)"].to_numpy().astype(np.int64)
        max_turn = t["max(max_turn)"].to_numpy().astype(np.int64)
        bad = np.flatnonzero(max_turn != n - 1)
        if bad.size:
            c = t["conv_id"][int(bad[0])].as_py()
            raise ValueError(
                f"conversation {c!r} has non-dense or duplicate turn_idx "
                f"(count={int(n[bad[0]])}, max={int(max_turn[bad[0]])})"
            )
        local = np.zeros(n.size, dtype=np.int64)
        np.cumsum(n[:-1], out=local[1:])
        return (
            pa.table(
                {
                    "conv_id": t["conv_id"],
                    "base": pa.array(local),
                    "n_turns": pa.array(n),
                }
            ),
            int(n.sum()),
        )

    pieces = ray.get([localize.remote(r) for r in refs])
    pieces = [(t, tot) for t, tot in pieces if t.num_rows]
    if not pieces:
        return pa.table(
            {
                "conv_id": pa.array([], type=pa.string()),
                "base": pa.array([], type=pa.int64()),
                "n_turns": pa.array([], type=pa.int64()),
            }
        )
    range_base = 0
    out = []
    for t, tot in pieces:
        if range_base:
            t = t.set_column(
                1, "base", pa.array(t["base"].to_numpy() + range_base)
            )
        out.append(t)
        range_base += tot
    return pa.concat_tables(out)


def offsets_arrays(offsets: dict[str, int]) -> tuple[pa.Array, np.ndarray]:
    """Broadcast form of the offsets table: (sorted conv_id Arrow array,
    parallel base array).  Arrow/numpy deserialize as buffer copies —
    unpickling a large Python dict per task was a super-linear cost once
    conversation counts reached the hundreds of thousands."""
    convs = sorted(offsets)
    return (
        pa.array(convs, type=pa.string()),
        np.array([offsets[c] for c in convs], dtype=np.int64),
    )


def assign_doc_ids(batch: pa.Table, *, offsets_ref) -> pa.Table:
    """``map_batches`` fn: adds ``doc_id = base[conv_id] + turn_idx``.

    ``offsets_ref`` is a ``ray.put`` handle holding the
    :func:`offsets_arrays` pair (a plain dict is also accepted for tests) —
    the broadcast pattern: shipped to the object store once, fetched from
    the local cache per task (not re-serialized per batch).  The batch work
    is dictionary-encode + one hashed ``index_in`` over the batch's DISTINCT
    conv_ids + a gather — no per-row Python.
    """
    offs = (
        ray.get(offsets_ref) if isinstance(offsets_ref, ray.ObjectRef) else offsets_ref
    )
    if isinstance(offs, dict):
        offs = offsets_arrays(offs)
    conv_arr, bases = offs
    enc = pc.dictionary_encode(batch["conv_id"]).combine_chunks()
    pos = pc.index_in(enc.dictionary, value_set=conv_arr)
    if pos.null_count:
        missing = enc.dictionary.filter(pc.is_null(pos)).to_pylist()
        raise KeyError(f"conv_ids not in offsets table: {missing[:5]}")
    uniq_bases = bases[pos.to_numpy(zero_copy_only=False)]
    doc_id = uniq_bases[enc.indices.to_numpy()] + batch["turn_idx"].to_numpy().astype(
        np.int64
    )
    return batch.append_column("doc_id", pa.array(doc_id, type=pa.int64()))


def docmap_table(offsets: dict[str, int], total: int) -> pa.Table:
    """Materialized (doc_id, conv_id, turn_idx) mapping — the analogue of the
    reference's docId->filename workaround (``search/Driver.java:114-124``)."""
    convs = sorted(offsets)
    sizes = [
        (offsets[c2] if i + 1 < len(convs) else total) - offsets[c1]
        for i, (c1, c2) in enumerate(zip(convs, convs[1:] + [convs[-1]]))
    ]
    conv_col = np.repeat(np.array(convs, dtype=object), sizes)
    turn_col = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(total, dtype=np.int64)),
            "conv_id": pa.array(conv_col, type=pa.string()),
            "turn_idx": pa.array(turn_col, type=pa.int32()),
        }
    )


def doc_ids_to_keys(
    doc_ids: np.ndarray, offsets: dict[str, int], total: int
) -> tuple[list[str], np.ndarray]:
    """Vectorized doc_id -> (conv_id, turn_idx) via binary search on bases."""
    convs = sorted(offsets)
    bases = np.array([offsets[c] for c in convs], dtype=np.int64)
    pos = np.searchsorted(bases, doc_ids, side="right") - 1
    conv_ids = [convs[i] for i in pos]
    turns = doc_ids - bases[pos]
    return conv_ids, turns.astype(np.int32)
