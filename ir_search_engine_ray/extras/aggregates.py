"""Distributed exact aggregates: quantiles and per-group heavy hitters.

Both follow the build's combiner discipline — per-batch partial counts
inside ``map_batches`` FIRST, so the shuffle exchanges (key, count) rows,
never raw values:

- :func:`exact_quantiles` — exact order statistics of an integer-ish
  column via a distributed value histogram.  The groupby output is one row
  per DISTINCT value (doc lengths, char counts, token counts: thousands of
  distinct values regardless of corpus row count), so the driver-side
  cumsum is metadata-sized by construction — the same bounded-collect
  argument as the build's stage manifests.  Quantile semantics are locked
  to the LOWER order statistic: value at 0-based rank ``floor(q * (n-1))``
  of the sorted multiset — mirrored explicitly in the SQL oracle with
  window functions (never ``quantile_disc``, whose interpolation choice
  would be an implicit dependency).

- :func:`top_terms_per_group` — per-group top-k heavy hitters with a
  deterministic (count DESC, term ASC) tie-break.  Stage 1 pre-aggregates
  (group, term) counts inside each batch (Zipf vocabularies collapse well
  before the exchange); stage 2 is a vocabulary-of-terms-sized groupby;
  stage 3 takes top-k per group — k-sized output per group.

No reference analogue; first-class training-data operators per the round
brief.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

_TOKEN = re.compile(r"[a-z]+")


def exact_quantiles(
    ds: ray.data.Dataset, col: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
) -> pa.Table:
    """(quantile, value) rows: exact lower-order-statistic quantiles."""

    def batch_hist(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch[col].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"value": pa.array(vals.astype(np.int64)),
             "cnt": pa.array(counts.astype(np.int64))}
        )

    hist = (
        ds.select_columns([col])
        .map_batches(batch_hist, batch_format="pyarrow")
        .groupby("value")
        .sum("cnt")
    )
    # one row per distinct value — bounded, the documented small collect
    rows = hist.take_all()
    values = np.array([r["value"] for r in rows], dtype=np.int64)
    counts = np.array([r["sum(cnt)"] for r in rows], dtype=np.int64)
    order = np.argsort(values)
    values, counts = values[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if cum.size else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = int(np.floor(q * (n - 1)))  # 0-based lower order statistic
        idx = int(np.searchsorted(cum, rank + 1))
        out_q.append(q)
        out_v.append(int(values[idx]))
    return pa.table(
        {
            "quantile": pa.array(out_q, type=pa.float64()),
            "value": pa.array(out_v, type=pa.int64()),
        }
    )


def top_terms_per_group(
    docs_ds: ray.data.Dataset,
    *,
    group_col: str = "lang",
    k: int = 10,
) -> ray.data.Dataset:
    """(group, term, cnt, rank) — top-k simple-split terms per group."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        agg: Counter = Counter()
        for g, text in zip(
            batch[group_col].to_pylist(), batch["text"].to_pylist()
        ):
            for t in _TOKEN.findall(text.lower()):
                agg[(g, t)] += 1
        groups, terms, cnts = [], [], []
        for (g, t), c in agg.items():
            groups.append(g)
            terms.append(t)
            cnts.append(c)
        return pa.table(
            {
                group_col: pa.array(groups, type=pa.string()),
                "term": pa.array(terms, type=pa.string()),
                "cnt": pa.array(cnts, type=pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        t = group.sort_by([("cnt", "descending"), ("term", "ascending")])
        t = t.slice(0, k)
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1), type=pa.int64())
        )

    summed = (
        docs_ds.select_columns([group_col, "text"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby([group_col, "term"])
        .sum("cnt")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["cnt" if c == "sum(cnt)" else c for c in batch.column_names]
        )

    return (
        summed.map_batches(rename, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(topk, batch_format="pyarrow")
    )


def exact_quantiles_by(
    ds: ray.data.Dataset,
    col: str,
    by: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> ray.data.Dataset:
    """(group, quantile, value): :func:`exact_quantiles` per group.

    Same histogram discipline, never a per-group value collect: stage 1
    reduces each batch to (group, value, cnt) partials, stage 2 is the
    (group, value) groupby, stage 3 computes each group's quantiles from
    its HISTOGRAM rows (distinct-value-bounded) in one map_groups task —
    a group's raw rows never co-locate, only its value histogram does."""

    def batch_hist(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # numpy-pure combine: dictionary-encode the group, pack
        # (group_code, value) into one int64 key, np.unique counts it
        enc = pc.dictionary_encode(batch[by].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        vals = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if vals.size and (vals.min() < 0 or vals.max() >= (1 << 40)):
            raise ValueError(
                f"exact_quantiles_by expects {col} in [0, 2^40)"
            )
        key = (codes << 40) | vals
        uniq, counts = np.unique(key, return_counts=True)
        u_codes = (uniq >> 40).astype(np.int64)
        u_vals = uniq & ((1 << 40) - 1)
        return pa.table(
            {
                by: enc.dictionary.take(pa.array(u_codes)),
                "value": pa.array(u_vals.astype(np.int64)),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    def group_quantiles(group: pa.Table) -> pa.Table:
        vals = group["value"].to_numpy()
        cnts = group["cnt"].to_numpy()
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            rank = int(np.floor(q * (n - 1)))
            out_q.append(q)
            out_v.append(int(vals[int(np.searchsorted(cum, rank + 1))]))
        key = group[by][0]
        return pa.table(
            {
                by: pa.array([key.as_py()] * len(out_q), type=group[by].type),
                "quantile": pa.array(out_q, type=pa.float64()),
                "value": pa.array(out_v, type=pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["cnt" if c == "sum(cnt)" else c for c in batch.column_names]
        )

    return (
        ds.select_columns([by, col])
        .map_batches(batch_hist, batch_format="pyarrow")
        .groupby([by, "value"])
        .sum("cnt")
        .map_batches(rename, batch_format="pyarrow")
        .groupby(by)
        .map_groups(group_quantiles, batch_format="pyarrow")
    )


def tfidf_postings(
    docs_ds: ray.data.Dataset,
    *,
    n_docs: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, term, tf, w) — the vector-space document model as exploded
    weighted postings, w = tf * ln(N / df) / ln(N) rounded to 6.

    The distributed-join form of the engine's weighting math: per-batch
    (doc_id, term, tf) explode, a (term) groupby for df (vocabulary-sized
    rows), then a hash JOIN of postings against the df table on term —
    no vocabulary broadcast, both sides stream.  The inverted-index build
    (pipelines/index_build.py) remains the scale path for SERVING; this
    operator exports the same weights as a flat table for downstream
    training/analysis jobs."""

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        doc_ids, terms, tfs = [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for term, tf in Counter(_TOKEN.findall(text.lower())).items():
                doc_ids.append(did)
                terms.append(term)
                tfs.append(tf)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "term": pa.array(terms, type=pa.string()),
                "tf": pa.array(tfs, type=pa.int64()),
            }
        )

    if n_docs is None:
        n_docs = docs_ds.count()
    if n_docs < 2:
        # w divides by ln(N): N=1 gives 0/0 (NaN for df=1), N=0 is vacuous
        raise ValueError(
            f"tfidf_postings needs n_docs >= 2 (ln(N) is the w denominator); "
            f"got {n_docs}"
        )
    # tf_ds feeds TWO consumers (the df groupby and the join's left side);
    # without materializing, lazy execution re-runs the explode per consumer
    tf_ds = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    ).materialize()
    df_ds = tf_ds.groupby("term").count().map_batches(
        lambda b: b.rename_columns(
            ["df" if c == "count()" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    if num_partitions is None:
        import ray

        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    joined = tf_ds.join(df_ds, join_type="inner", on=("term",),
                        num_partitions=num_partitions)

    def weigh(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy().astype(np.float64)
        df = batch["df"].to_numpy().astype(np.float64)
        w = np.round(tf * np.log(n_docs / df) / np.log(n_docs), 6)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "term": batch["term"],
                "tf": batch["tf"],
                "w": pa.array(w, type=pa.float64()),
            }
        )

    return joined.map_batches(weigh, batch_format="pyarrow")
