"""Semi-structured (JSON) column operators.

Event/telemetry tables carry a JSON properties column; training pipelines
need it flattened into typed columns before anything downstream can be
vectorized.  ``flatten_json`` extracts named fields per row (one streaming
``map_batches``, stdlib ``json`` — per-row parse is the irreducible cost
of a text-encoded column; flattening ONCE at ingest is exactly how a
100 TB pipeline amortizes it).  ``json_field_rollup`` is the grouped
aggregate over one numeric field — per-batch combiners, group-cardinality
shuffle only.

DuckDB mirrors both via its native ``json_extract``; missing keys and
malformed JSON yield nulls, matching the oracle's semantics.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data


def flatten_json(
    batch: pa.Table,
    *,
    col: str = "props",
    fields: dict[str, pa.DataType],
    keep: tuple[str, ...] = (),
) -> pa.Table:
    """Per row: parse ``col`` and pull each requested field into its own
    typed column (null on missing key, wrong type, or parse failure)."""
    texts = batch[col].to_pylist()
    parsed = []
    for t in texts:
        try:
            v = json.loads(t) if t is not None else None
            parsed.append(v if isinstance(v, dict) else None)
        except (ValueError, TypeError):
            parsed.append(None)
    cols: dict = {k: batch[k] for k in keep}
    for name, typ in fields.items():
        vals = [None if p is None else p.get(name) for p in parsed]
        if pa.types.is_integer(typ):
            vals = [v if isinstance(v, int) and not isinstance(v, bool)
                    else None for v in vals]
        elif pa.types.is_floating(typ):
            vals = [float(v) if isinstance(v, (int, float))
                    and not isinstance(v, bool) else None for v in vals]
        elif pa.types.is_string(typ):
            vals = [v if isinstance(v, str) else None for v in vals]
        cols[name] = pa.array(vals, type=typ)
    return pa.table(cols)


def json_field_rollup(
    events_ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    col: str = "props",
    field: str = "k",
) -> ray.data.Dataset:
    """(group, n_events, n_with_field, sum_field): grouped aggregate over
    one integer JSON field — combiner partials inside each batch first, so
    the shuffle exchanges one row per (batch, group)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat = flatten_json(
            batch, col=col, fields={field: pa.int64()}, keep=(group_col,)
        )
        groups = flat[group_col].to_pylist()
        vals = flat[field].to_numpy(zero_copy_only=False)
        agg: dict[str, list[int]] = {}
        for g, v in zip(groups, vals):
            a = agg.setdefault(g, [0, 0, 0])
            a[0] += 1
            if v is not None and not np.isnan(v):
                a[1] += 1
                a[2] += int(v)
        return pa.table(
            {
                group_col: pa.array(list(agg), type=pa.string()),
                "n_events": pa.array([a[0] for a in agg.values()],
                                     type=pa.int64()),
                "n_with_field": pa.array([a[1] for a in agg.values()],
                                         type=pa.int64()),
                "sum_field": pa.array([a[2] for a in agg.values()],
                                      type=pa.int64()),
            }
        )

    g = (
        events_ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .sum(["n_events", "n_with_field", "sum_field"])
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [c.removeprefix("sum(").removesuffix(")") for c in batch.column_names]
        )

    return g.map_batches(rename, batch_format="pyarrow")
