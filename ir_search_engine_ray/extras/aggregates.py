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
