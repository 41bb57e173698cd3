"""Deterministic dataset splitting + corpus accounting.

Training pipelines need reproducible, machine-independent hold-out
assignment: ``assign_splits`` maps each doc_id through the same
splitmix-style 64-bit mixer the SimHash oracle uses (pure modular
arithmetic — the DuckDB oracle reproduces it bit for bit) and buckets the
hash into weighted splits.  Properties:

- deterministic across runs, partitionings and cluster sizes (pure
  function of doc_id and seed);
- stable under corpus growth: adding documents never reassigns existing
  ones (each doc's split depends only on its own id);
- a pure per-batch ``map_batches`` — no shuffle, no state.

``corpus_stats`` is the one-row accounting rollup (docs / tokens / BPE-ish
pieces) a curation run reports — per-batch combiners, vocabulary-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import _SM_ADD, _SM_MUL1, _SM_MUL2
from .textstats import _BPE_ISH, _tokens

DEFAULT_SPLITS = (("train", 98), ("val", 1), ("test", 1))


def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    """The SQL-mirrorable splitmix-style mixer over uint64 ids."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(seed)
        z = z + _SM_ADD
        z ^= z >> np.uint64(30)
        z = z * _SM_MUL1
        z ^= z >> np.uint64(27)
        z = z * _SM_MUL2
        z ^= z >> np.uint64(31)
    return z


def assign_splits(
    docs_ds: ray.data.Dataset,
    *,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    seed: int = 7,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Add a ``split`` column: weighted deterministic assignment by
    hashed id.  Weights are integral per-mille-style shares; a doc lands
    in the split whose cumulative weight range contains
    ``mix64(id) % total_weight``."""
    names = [n for n, _w in splits]
    weights = np.array([w for _n, w in splits], dtype=np.uint64)
    if (weights <= 0).any():
        raise ValueError("split weights must be positive")
    bounds = np.cumsum(weights)
    total = np.uint64(bounds[-1])

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        bucket = _mix64(ids, seed) % total
        idx = np.searchsorted(bounds, bucket, side="right")
        col = pa.array(np.array(names, dtype=object)[idx], type=pa.string())
        return batch.append_column("split", col)

    return docs_ds.map_batches(tag, batch_format="pyarrow")


def split_counts(
    docs_ds: ray.data.Dataset,
    *,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    seed: int = 7,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per split: doc count + token count (the hold-out accounting)."""
    from ray.data.aggregate import Count, Sum

    def with_tokens(batch: pa.Table) -> pa.Table:
        n = [len(_tokens(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "split": batch["split"],
                "n_tokens": pa.array(n, type=pa.int64()),
            }
        )

    tagged = assign_splits(
        docs_ds, splits=splits, seed=seed, id_col=id_col
    ).map_batches(with_tokens, batch_format="pyarrow")
    g = tagged.groupby("split").aggregate(Count(), Sum("n_tokens"))
    return g.map_batches(
        lambda b: pa.table(
            {
                "split": b["split"],
                "n_docs": b["count()"].cast(pa.int64()),
                "n_tokens": b["sum(n_tokens)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def corpus_stats(docs_ds: ray.data.Dataset) -> pa.Table:
    """One-row corpus accounting: docs, [a-z]+ tokens, BPE-ish pieces.

    Per-batch integer partials -> one tiny driver sum (no shuffle)."""
    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks = sum(len(_tokens(t)) for t in texts)
        pieces = sum(
            sum(1 for m in _BPE_ISH.findall(t) if not m.isspace())
            for t in texts
        )
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], type=pa.int64()),
                "n_tokens": pa.array([toks], type=pa.int64()),
                "n_pieces": pa.array([pieces], type=pa.int64()),
            }
        )

    parts = docs_ds.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table(
        {
            "n_docs": pa.array(
                [sum(r["n_docs"] for r in parts)], type=pa.int64()
            ),
            "n_tokens": pa.array(
                [sum(r["n_tokens"] for r in parts)], type=pa.int64()
            ),
            "n_pieces": pa.array(
                [sum(r["n_pieces"] for r in parts)], type=pa.int64()
            ),
        }
    )


def stratified_sample(
    docs_ds: ray.data.Dataset,
    *,
    by: str,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    seed: int = 11,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic per-stratum downsampling: keep a row iff
    ``mix64(id) % 10000 < rates_bp[stratum]`` (basis points, 0..10000).

    The training-data rebalancing step (e.g. downweight English, keep all
    low-resource languages): the same growth-stable hashed-id property as
    ``assign_splits`` — a row's fate depends only on its own id and the
    stratum rate, so samples are reproducible across runs, partitionings
    and corpus growth, and nested samples are monotone (raising a rate
    only ADDS rows).  Pure per-batch map, no shuffle; integral basis
    points keep the DuckDB oracle bit-exact (no float thresholds)."""
    for k, v in rates_bp.items():
        if not 0 <= int(v) <= 10000:
            raise ValueError(f"rate for {k!r} must be in [0, 10000] bp")
    if not 0 <= int(default_bp) <= 10000:
        raise ValueError("default_bp must be in [0, 10000]")

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        bucket = _mix64(ids, seed) % np.uint64(10000)
        strata = batch[by].to_pylist()
        thr = np.array(
            [int(rates_bp.get(s, default_bp)) for s in strata],
            dtype=np.uint64,
        )
        return batch.filter(pa.array(bucket < thr))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


MIX_MOD = 1 << 20  # hash-bucket resolution for target-mix thresholds


def target_mix_sample(
    docs_ds: ray.data.Dataset,
    *,
    by: str,
    weights_ppm: dict[str, int],
    total: int,
    seed: int = 17,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Sample to TARGET mixture proportions — the data-mixing step of a
    training run: stratum ``s`` should contribute ``weights_ppm[s]/1e6 *
    total`` documents to the sampled corpus (parts-per-million integer
    weights).  Unlike :func:`stratified_sample` (fixed per-stratum RATES),
    the keep rate here is derived from the OBSERVED stratum counts:

        thr_s  = min(MIX_MOD, (w_ppm * total * MIX_MOD) // (n_s * 1_000_000))
        keep   iff  mix64(id, seed) % MIX_MOD < thr_s

    so the expected stratum yield is ``min(n_s, w_ppm/1e6 * total)`` — a
    stratum smaller than its target is kept whole (the clamp), never
    upsampled.  All-integer threshold arithmetic keeps the DuckDB oracle
    bit-exact.  Strata absent from ``weights_ppm`` are dropped.

    Scale: one stratum-cardinality ``groupby(by).count()`` (driver state
    is O(strata), like pack_sequences' bucket sums), then a pure
    per-batch filter map — no data-sized shuffle."""
    if total <= 0:
        raise ValueError("total must be positive")
    for k, v in weights_ppm.items():
        if int(v) < 0:
            raise ValueError(f"weight for {k!r} must be >= 0 ppm")
    counts = {
        r[by]: int(r["count()"])
        for r in docs_ds.groupby(by).count().take_all()
    }
    thr = {
        s: min(
            MIX_MOD,
            (int(weights_ppm.get(s, 0)) * total * MIX_MOD)
            // (n * 1_000_000),
        )
        for s, n in counts.items()
        if n > 0
    }

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        bucket = _mix64(ids, seed) % np.uint64(MIX_MOD)
        strata = batch[by].to_pylist()
        t = np.array([thr.get(s, 0) for s in strata], dtype=np.uint64)
        return batch.filter(pa.array(bucket < t))

    return docs_ds.map_batches(keep, batch_format="pyarrow")
