"""Temporal operators over the events table: tumbling windows + sessions.

The reference engine has no streaming/windowing surface (SURVEY.md §2.9);
these are the windowed-aggregate and session-window operators a large-scale
training-data pipeline needs, expressed Ray-Data-first:

- ``tumbling_counts``: fixed windows are a pure row function (truncate the
  timestamp), so the aggregate is per-batch combiners + one vocabulary-sized
  ``groupby`` — never an all-to-all of raw events;
- ``sessionize``: session windows (gap-based) need per-key event ordering;
  ``groupby(user_id).map_groups`` hash-partitions by user and the per-user
  gap detection is vectorized numpy.  Partitioning assumption: one user's
  events fit one task (true at any realistic skew); for a pathological
  mega-user pass ``split_us`` — per-key time-range pre-splitting with
  boundary segment merge, bit-identical output;
- ``hopping_counts``: overlapping fixed windows via an explode-combiner —
  same vocabulary-sized groupby as tumbling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

HOUR_US = 3_600_000_000


def _tumbling_partial(batch: pa.Table, *, window_us: int) -> pa.Table:
    ts = batch["ts"].cast(pa.int64()).to_numpy()
    win = (ts // window_us) * window_us
    t = pa.table(
        {
            "window_start": pa.array(win, type=pa.int64()),
            "event_type": batch["event_type"],
            "n_events": pa.array(np.ones(len(win), dtype=np.int64)),
            "sum_value": batch["value"],
        }
    )
    g = t.group_by(["window_start", "event_type"]).aggregate(
        [("n_events", "sum"), ("sum_value", "sum")]
    )
    return pa.table(
        {
            "window_start": g["window_start"],
            "event_type": g["event_type"],
            "n_events": g["n_events_sum"],
            "sum_value": g["sum_value_sum"],
        }
    )


def tumbling_counts(
    events_ds: ray.data.Dataset, *, window_us: int = HOUR_US
) -> ray.data.Dataset:
    """Per (tumbling window, event_type): event count + value sum."""
    from ray.data.aggregate import Sum

    # select BEFORE the map: projection cannot push past map_batches, and
    # the events table carries a fat props column this aggregate never reads
    partials = events_ds.select_columns(
        ["ts", "event_type", "value"]
    ).map_batches(
        _tumbling_partial, fn_kwargs={"window_us": window_us}, batch_format="pyarrow"
    )
    g = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("n_events"), Sum("sum_value")
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": b["window_start"].cast(pa.timestamp("us")),
                "event_type": b["event_type"],
                "n_events": b["sum(n_events)"].cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(b["sum(sum_value)"].to_numpy(zero_copy_only=False), 6)
                ),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow")


def tumbling_distinct_users(
    events_ds: ray.data.Dataset, *, window_us: int = HOUR_US
) -> ray.data.Dataset:
    """Per tumbling window: EXACT distinct user count.

    Scale shape: the per-batch combiner collapses to distinct
    (window_start, user_id) pairs BEFORE any exchange, one
    ``groupby(window, user)`` dedups globally (the only data-sized
    shuffle — pairs, never events), then the per-window count is a
    window-cardinality-sized second groupby of (window, 1) rows.  For
    approximate counts at lower shuffle cost see
    ``sketches.hll_distinct_by``."""
    from ray.data.aggregate import Count

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        w = (ts // window_us) * window_us
        u = batch["user_id"].to_numpy()
        uniq = np.unique(np.stack([w, u], axis=1), axis=0)
        return pa.table(
            {
                "window_start": pa.array(uniq[:, 0]),
                "user_id": pa.array(uniq[:, 1]),
            }
        )

    dedup = (
        events_ds.select_columns(["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["window_start", "user_id"])
        .aggregate(Count())
    )
    g = (
        dedup.map_batches(
            lambda b: b.select(["window_start"]), batch_format="pyarrow"
        )
        .groupby("window_start")
        .aggregate(Count())
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": b["window_start"].cast(pa.timestamp("us")),
                "n_users": b["count()"].cast(pa.int64()),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow")


def hopping_counts(
    events_ds: ray.data.Dataset,
    *,
    window_us: int = HOUR_US,
    hop_us: int = HOUR_US // 4,
) -> ray.data.Dataset:
    """Per (hopping window, event_type): event count + value sum.

    Overlapping fixed windows of length ``window_us`` starting every
    ``hop_us`` (``window_us`` must be a multiple); an event belongs to
    ``window_us // hop_us`` windows, so the per-batch combiner EXPLODES
    each event into its windows (a k-fold fan-out of tiny rows) and
    pre-aggregates before the same vocabulary-sized groupby as
    :func:`tumbling_counts` — raw events are still never exchanged."""
    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    k = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        base = (ts // hop_us) * hop_us
        # windows [base - j*hop, base - j*hop + window) for j in 0..k-1
        starts = (base[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_us).ravel()
        rep = np.repeat(np.arange(ts.size), k)
        t = pa.table(
            {
                "window_start": pa.array(starts, type=pa.int64()),
                "event_type": batch["event_type"].take(pa.array(rep)),
                "n_events": pa.array(np.ones(starts.size, dtype=np.int64)),
                "sum_value": batch["value"].take(pa.array(rep)),
            }
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")]
        )
        return pa.table(
            {
                "window_start": g["window_start"],
                "event_type": g["event_type"],
                "n_events": g["n_events_sum"],
                "sum_value": g["sum_value_sum"],
            }
        )

    from ray.data.aggregate import Sum

    g = (
        events_ds.select_columns(["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n_events"), Sum("sum_value"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": b["window_start"].cast(pa.timestamp("us")),
                "event_type": b["event_type"],
                "n_events": b["sum(n_events)"].cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(b["sum(sum_value)"].to_numpy(zero_copy_only=False), 6)
                ),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow")


def _sessions_for_user(group: pa.Table, *, gap_us: int) -> pa.Table:
    ts = np.sort(group["ts"].cast(pa.int64()).to_numpy())
    new_session = np.ones(ts.size, dtype=np.int64)
    new_session[1:] = (np.diff(ts) > gap_us).astype(np.int64)
    sess_idx = np.cumsum(new_session) - 1
    n_sessions = int(sess_idx[-1]) + 1 if ts.size else 0
    starts = np.flatnonzero(new_session)
    ends = np.concatenate((starts[1:], [ts.size])) - 1
    uid = group["user_id"][0].as_py()
    return pa.table(
        {
            "user_id": pa.array(np.full(n_sessions, uid), type=pa.int64()),
            "session_idx": pa.array(np.arange(n_sessions), type=pa.int64()),
            "n_events": pa.array(ends - starts + 1, type=pa.int64()),
            "session_start": pa.array(ts[starts], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "session_end": pa.array(ts[ends], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )


def sessionize(
    events_ds: ray.data.Dataset,
    *,
    gap_us: int = 30 * 60 * 1_000_000,
    split_us: int | None = None,
) -> ray.data.Dataset:
    """Gap-based session windows per user (session ends after ``gap_us`` of
    inactivity); emits one row per (user, session).

    Default: one task per user (fine at any realistic skew).  For a
    pathological mega-user whose events exceed one task, pass ``split_us``
    to pre-split each user's timeline into fixed time ranges: per
    (user, range) tasks compute LOCAL session segments (bounded work), and
    a per-user second pass merges segments across range boundaries (its
    input is one row per SEGMENT, orders of magnitude smaller than the
    events) and renumbers.  Bit-identical output to the default path
    (asserted in tests)."""
    sel = events_ds.select_columns(["user_id", "ts"])
    if split_us is None:
        return sel.groupby("user_id").map_groups(
            _sessions_for_user, fn_kwargs={"gap_us": gap_us},
            batch_format="pyarrow",
        )

    def add_range(b: pa.Table) -> pa.Table:
        rng = b["ts"].cast(pa.int64()).to_numpy() // split_us
        return b.append_column("rng", pa.array(rng, type=pa.int64()))

    def range_segments(group: pa.Table) -> pa.Table:
        ts = np.sort(group["ts"].cast(pa.int64()).to_numpy())
        new = np.ones(ts.size, dtype=bool)
        new[1:] = np.diff(ts) > gap_us
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [ts.size])) - 1
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(starts.size, uid), type=pa.int64()
                ),
                "seg_start": pa.array(ts[starts], type=pa.int64()),
                "seg_end": pa.array(ts[ends], type=pa.int64()),
                "n_events": pa.array(ends - starts + 1, type=pa.int64()),
            }
        )

    def merge_user(group: pa.Table) -> pa.Table:
        order = np.argsort(group["seg_start"].to_numpy(), kind="stable")
        s = group["seg_start"].to_numpy()[order]
        e = group["seg_end"].to_numpy()[order]
        n = group["n_events"].to_numpy()[order]
        new = np.ones(s.size, dtype=np.int64)
        new[1:] = (s[1:] - e[:-1] > gap_us).astype(np.int64)
        idx = np.cumsum(new) - 1
        n_sessions = int(idx[-1]) + 1
        first = np.flatnonzero(new)
        starts = s[first]
        last = np.concatenate((first[1:], [s.size])) - 1
        ends = e[last]
        counts = np.zeros(n_sessions, dtype=np.int64)
        np.add.at(counts, idx, n)
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(np.full(n_sessions, uid), type=pa.int64()),
                "session_idx": pa.array(
                    np.arange(n_sessions), type=pa.int64()
                ),
                "n_events": pa.array(counts, type=pa.int64()),
                "session_start": pa.array(starts, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(ends, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    segs = (
        sel.map_batches(add_range, batch_format="pyarrow")
        .groupby(["user_id", "rng"])
        .map_groups(range_segments, batch_format="pyarrow")
    )
    return segs.groupby("user_id").map_groups(
        merge_user, batch_format="pyarrow"
    )


def rolling_user_stats(
    events_ds: ray.data.Dataset, *, split_us: int | None = None
) -> ray.data.Dataset:
    """Per-event running aggregates over each user's ordered history:
    (event_id, user_id, ts, cum_n, cum_value) with the cumulative event
    count and value sum under the deterministic (ts, event_id) order —
    the ROWS-UNBOUNDED-PRECEDING windowed aggregate, Ray-Data-first.

    Same partitioning contract as ``sessionize``: one user's events per
    task, vectorized cumsum inside.  The running sum is sequential
    (np.cumsum) to match the SQL window frame's left-to-right
    accumulation; cum_value is rounded to 6 decimals on both sides.

    For a pathological mega-user whose events exceed one task, pass
    ``split_us`` (mirroring ``sessionize``): per (user, time-range) tasks
    compute LOCAL cumsums (bounded work) and emit one carry row per range;
    the carries — one row per SEGMENT, orders of magnitude fewer than the
    events — prefix-sum per user and join back onto the local rows by
    (user, range).  Counts compose exactly.  The value sum regroups float
    addition at range boundaries, so a cum_value can differ from the
    strictly sequential sum by up to ~(#ranges) ulps — after the 6-decimal
    rounding this flips a digit only when the sequential value sits within
    that ulp distance of a 0.5e-6 boundary (probability ~1e-9 per row;
    note SQL engines' windowed sums also regroup via segment trees, so
    "strictly sequential" is itself not what oracles compute).  Exact
    bitwise parity with sequential accumulation is fundamentally
    incompatible with segment-parallel summation; this is the standard
    trade, stated honestly rather than hidden.
    """
    sel = events_ds.select_columns(["event_id", "user_id", "ts", "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid = group["event_id"].to_numpy()
        val = group["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": group["user_id"].take(pa.array(order)),
                "ts": group["ts"].take(pa.array(order)),
                "cum_n": pa.array(
                    np.arange(1, ts.size + 1, dtype=np.int64)
                ),
                "cum_value": pa.array(
                    np.round(np.cumsum(val[order]), 6), type=pa.float64()
                ),
            }
        )

    if split_us is None:
        return sel.groupby("user_id").map_groups(
            per_user, batch_format="pyarrow"
        )

    types = dict(zip(sel.schema().names, sel.schema().types))
    ts_type = types["ts"]

    def add_range(b: pa.Table) -> pa.Table:
        rng = b["ts"].cast(pa.int64()).to_numpy() // split_us
        return b.append_column("rng", pa.array(rng, type=pa.int64()))

    def local_cumsums(group: pa.Table) -> pa.Table:
        """Per-event LOCAL running stats for one (user, range), plus ONE
        carry row (``is_carry=True``) holding the range totals.  The
        carry's cum_value is the last element of the SEQUENTIAL local
        cumsum, so composed prefixes reproduce the unsplit accumulation
        order.  The carry marker is a dedicated boolean column — never a
        sentinel event_id, which a real event could collide with — and
        the id/user columns keep their INPUT types (the carry row repeats
        the group's first values; it is filtered out downstream)."""
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid_col = group["event_id"].combine_chunks()
        val = group["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid_col.to_numpy(zero_copy_only=False), ts))
        csum = np.cumsum(val[order])
        n = ts.size
        rng = group["rng"][0].as_py()
        order_arr = pa.array(order)
        uid_col = group["user_id"].combine_chunks()
        return pa.table(
            {
                "event_id": pa.concat_arrays(
                    [eid_col.take(order_arr), eid_col.slice(0, 1)]
                ),
                "user_id": pa.concat_arrays(
                    [uid_col.take(order_arr), uid_col.slice(0, 1)]
                ),
                "ts": pa.concat_arrays(
                    [
                        group["ts"].take(order_arr).combine_chunks(),
                        pa.nulls(1, type=ts_type),
                    ]
                ),
                "rng": pa.array(np.full(n + 1, rng), type=pa.int64()),
                "is_carry": pa.array(
                    np.arange(n + 1, dtype=np.int64) == n
                ),
                "loc_n": pa.array(
                    np.concatenate(
                        [np.arange(1, n + 1, dtype=np.int64), [n]]
                    ),
                    type=pa.int64(),
                ),
                "loc_value": pa.array(
                    np.concatenate([csum, [csum[-1]]]), type=pa.float64()
                ),
            }
        )

    local = (
        sel.map_batches(add_range, batch_format="pyarrow")
        .groupby(["user_id", "rng"])
        .map_groups(local_cumsums, batch_format="pyarrow")
        .materialize()  # feeds two consumers (carries + per-event rows)
    )
    import pyarrow.compute as pc

    carries = local.map_batches(
        lambda b: b.filter(b["is_carry"]).select(
            ["user_id", "rng", "loc_n", "loc_value"]
        ),
        batch_format="pyarrow",
    )

    def user_offsets(group: pa.Table) -> pa.Table:
        """Exclusive prefix over the user's range carries (rng-sorted):
        the (count, sum) offset each range adds to its local cumsums."""
        rng = group["rng"].to_numpy()
        order = np.argsort(rng, kind="stable")
        n = group["loc_n"].to_numpy()[order]
        v = group["loc_value"].to_numpy(zero_copy_only=False)[order]
        off_n = np.concatenate([[0], np.cumsum(n)[:-1]])
        off_v = np.concatenate([[0.0], np.cumsum(v)[:-1]])
        return pa.table(
            {
                "user_id": group["user_id"].take(pa.array(order)),
                "rng": pa.array(rng[order], type=pa.int64()),
                "off_n": pa.array(off_n, type=pa.int64()),
                "off_value": pa.array(off_v, type=pa.float64()),
            }
        )

    offsets = carries.groupby("user_id").map_groups(
        user_offsets, batch_format="pyarrow"
    )
    per_event = local.map_batches(
        lambda b: b.filter(pc.invert(b["is_carry"])).drop_columns(
            ["is_carry"]
        ),
        batch_format="pyarrow",
    )
    # Ray's sort-based groupby can emit EMPTY ZERO-COLUMN blocks, and
    # map_batches never invokes the UDF on empty blocks, so they cannot be
    # schema-repaired in-stream; the join's partition assembly then dies on
    # the schema-less block ("no match for FieldRef").  Filter them at the
    # block level — the documented dedup workaround.  Each filter forces
    # its side pipeline to execute before the join starts; `local` (the
    # expensive shared scan) is materialized once above, so the extra cost
    # is the two small derivations, not a recompute of the groupby.
    from .dedup import _nonempty_blocks

    ev_refs, _ = _nonempty_blocks(per_event)
    off_refs, _ = _nonempty_blocks(offsets)
    if not ev_refs or not off_refs:
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("event_id", types["event_id"]),
                    ("user_id", types["user_id"]),
                    ("ts", ts_type),
                    ("cum_n", pa.int64()),
                    ("cum_value", pa.float64()),
                ]
            ).empty_table()
        )
    num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    joined = ray.data.from_arrow_refs(ev_refs).join(
        ray.data.from_arrow_refs(off_refs),
        join_type="inner",
        on=("user_id", "rng"),
        num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "cum_n": pa.compute.add(b["off_n"], b["loc_n"]),
                "cum_value": pa.array(
                    np.round(
                        b["off_value"].to_numpy(zero_copy_only=False)
                        + b["loc_value"].to_numpy(zero_copy_only=False),
                        6,
                    ),
                    type=pa.float64(),
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
