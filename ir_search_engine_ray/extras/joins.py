"""As-of join: match each left row to the latest right row at-or-before it
(per key) — the temporal join Ray Data lacks natively.

Classic uses: event attribution (purchase -> most recent prior click),
joining metrics to the last config change, trade -> latest quote.  DuckDB
has a native ``ASOF JOIN``, which is the correctness oracle.

Ray-Data-native implementation (composition, not a raw-actor shuffle): tag
both sides, ``union``, one ``groupby(by).map_groups`` — the single
all-to-all is the hash shuffle on the join key, identical in shape to any
equi-join.  Inside a group both sides are sorted once and every left row
resolves with one vectorized ``np.searchsorted``; no per-row Python.

Partitioning: by default one key's rows fit one task — fine at any
realistic key cardinality (a key with billions of rows is a data-model
smell).  For a pathological mega-key BOTH joins take ``split_us``, the
same opt-in pre-split family as ``windows.sessionize``: ``asof_join``
carries each range's last right row forward (segment-sized side stages,
see :func:`_asof_split`), ``interval_join_multi`` replicates intervals
into the ranges they overlap.  Output is identical to the unsplit path
(asserted in tests); not auto-enabled because it changes the execution
plan, which should be an explicit caller choice.

Tie semantics (locked, hash-stable): when several right rows share the
matched timestamp, the reported ``matched_<on>`` is that timestamp (always
deterministic); requested value columns come from the LAST such row under
a full (on, *value_cols) sort — deterministic for any input order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_SIDE = "__asof_side"


def _project(ds: ray.data.Dataset, cols: list[str], side: int,
             all_cols: list[str], types: dict) -> ray.data.Dataset:
    """Project to the union schema, null-padding the other side's columns."""

    def fix(batch: pa.Table) -> pa.Table:
        out: dict = {}
        for c in all_cols:
            if c in batch.column_names:
                out[c] = batch[c].cast(types[c])
            else:
                out[c] = pa.nulls(batch.num_rows, type=types[c])
        out[_SIDE] = pa.array(
            np.full(batch.num_rows, side, dtype=np.int8), type=pa.int8()
        )
        return pa.table(out)

    return ds.select_columns(cols).map_batches(fix, batch_format="pyarrow")


def asof_join(
    left_ds: ray.data.Dataset,
    right_ds: ray.data.Dataset,
    *,
    by: str,
    on: str,
    left_cols: list[str],
    right_value_cols: list[str] | None = None,
    strict: bool = False,
    split_us: int | None = None,
) -> ray.data.Dataset:
    """For each left row: the latest right row with ``right.on <= left.on``
    (``<`` when ``strict``) and equal ``by`` key.

    Output: ``left_cols`` + ``matched_<on>`` (null when no prior right row)
    + ``matched_<col>`` for each requested right value column.

    ``split_us`` (int64 units of ``on``; the mega-key scale path, same
    family as ``sessionize``/``rolling_user_stats``/``interval_join_multi``)
    changes the shuffle key to (key, time-range) and carries each range's
    LAST right row forward so in-range resolution stays exact: per-range
    last rights reduce map-side (combiner), a per-key segment pass derives
    each left range's carry (the latest right row of any EARLIER range),
    and the final (key, range) group resolves against in-range rights plus
    that one carry row — identical output to the unsplit path, per-task
    work bounded by the range.  Rows moved by the extra stages are one per
    SEGMENT, never per event.
    """
    right_value_cols = right_value_cols or []
    if split_us is not None and split_us <= 0:
        raise ValueError(f"split_us must be positive, got {split_us}")
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(dict.fromkeys([by, on, *left_cols]))
    rcols = list(dict.fromkeys([by, on, *right_value_cols]))
    all_cols = list(dict.fromkeys(lcols + rcols))
    types = {c: (ltypes.get(c) or rtypes.get(c)) for c in all_cols}
    left_p = _project(left_ds, lcols, 0, all_cols, types)
    right_p = _project(right_ds, rcols, 1, all_cols, types)
    on_type = types[on]
    out_left = lcols

    def join_group(group: pa.Table) -> pa.Table:
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        is_left = side == 0
        lrows = group.filter(pa.array(is_left))
        rrows = group.filter(pa.array(~is_left))
        lcount = lrows.num_rows
        if lcount == 0:
            return pa.table(
                {
                    **{c: pa.array([], type=types[c]) for c in out_left},
                    f"matched_{on}": pa.array([], type=on_type),
                    **{
                        f"matched_{c}": pa.array([], type=types[c])
                        for c in right_value_cols
                    },
                }
            )
        lon = lrows[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if rrows.num_rows:
            # full sort on (on, *value_cols): the LAST row per timestamp is
            # the deterministic tie-winner
            rrows = rrows.sort_by(
                [(on, "ascending")]
                + [(c, "ascending") for c in right_value_cols]
            )
            ron = rrows[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
            sidx = np.searchsorted(
                ron, lon, side="left" if strict else "right"
            ) - 1
        else:
            ron = np.empty(0, dtype=np.int64)
            sidx = np.full(lcount, -1, dtype=np.int64)
        have = sidx >= 0
        cols: dict = {c: lrows[c] for c in out_left}
        if ron.size == 0:
            cols[f"matched_{on}"] = pa.nulls(lcount, type=on_type)
            for c in right_value_cols:
                cols[f"matched_{c}"] = pa.nulls(lcount, type=types[c])
            return pa.table(cols)
        safe = np.clip(sidx, 0, None)
        m_on = np.where(have, ron[safe], 0)
        m_arr = pa.array(m_on, type=pa.int64())
        if on_type != pa.int64():
            m_arr = m_arr.cast(on_type)
        if not have.all():
            m_arr = pa.compute.if_else(
                pa.array(~have), pa.nulls(lcount, type=on_type), m_arr
            )
        cols[f"matched_{on}"] = m_arr
        for c in right_value_cols:
            vals = rrows[c].take(pa.array(safe))
            if not have.all():
                vals = pa.compute.if_else(
                    pa.array(~have), pa.nulls(lcount, type=types[c]), vals
                )
            cols[f"matched_{c}"] = vals
        return pa.table(cols)

    if split_us is None:
        return left_p.union(right_p).groupby(by).map_groups(
            join_group, batch_format="pyarrow"
        )
    return _asof_split(
        left_p,
        right_p,
        join_group,
        by=by,
        on=on,
        value_cols=right_value_cols,
        split_us=split_us,
    )


def _asof_split(
    left_p: ray.data.Dataset,
    right_p: ray.data.Dataset,
    join_group,
    *,
    by: str,
    on: str,
    value_cols: list[str],
    split_us: int,
) -> ray.data.Dataset:
    """The asof mega-key path (see :func:`asof_join` docstring).

    Stages (rows moved by the side stages are one per SEGMENT):
    1. tag both sides with ``rng = on // split_us``;
    2. ``rightons``: the last right row per (key, range) under the tie
       sort — map-side combiner (same function) then a segment-sized
       groupby reduce;
    3. ``left_ranges``: one representative left row per (key, range) —
       same combiner/reduce shape;
    4. ``carries``: per key, each left range's carry = the righton of the
       latest EARLIER range (vectorized searchsorted over the key's
       segments), re-tagged to the left range with side marker 2;
    5. final ``groupby((key, range))``: the ORIGINAL join_group — it
       already treats every non-left side as a right candidate, and a
       carry's ``on`` is strictly below the range start so the (on,
       value_cols) tie sort stays correct.
    """
    from .dedup import _nonempty_blocks

    RNG = "__asof_rng"
    # materialize the tagged sides ONCE: each feeds both a segment side
    # stage (forced eagerly by the empty-block filter below) and the final
    # union — without this the upstream pipeline would execute twice, and
    # a nondeterministic upstream (sample/shuffle) would give the carries
    # a DIFFERENT row set than the final join sees
    lt = _tag_on_ranges(
        left_p, on, split_us, "asof_join", rng_col=RNG
    ).materialize()
    rt = _tag_on_ranges(
        right_p, on, split_us, "asof_join", rng_col=RNG
    ).materialize()
    sort_keys = (
        [(by, "ascending"), (RNG, "ascending"), (on, "ascending")]
        + [(c, "ascending") for c in value_cols]
    )

    def seg_last(b: pa.Table) -> pa.Table:
        """Last row per (key, range) under the tie sort — serves as both
        the map-side combiner and the per-group reducer."""
        if b.num_rows == 0:
            return b
        b = b.sort_by(sort_keys)
        kb = b[by].to_numpy(zero_copy_only=False)
        kr = b[RNG].to_numpy(zero_copy_only=False)
        bound = np.flatnonzero((kb[1:] != kb[:-1]) | (kr[1:] != kr[:-1]))
        idx = np.concatenate([bound, [b.num_rows - 1]])
        return b.take(pa.array(idx))

    def seg_per_range(ds: ray.data.Dataset) -> ray.data.Dataset:
        return (
            ds.map_batches(seg_last, batch_format="pyarrow")
            .groupby([by, RNG])
            .map_groups(seg_last, batch_format="pyarrow")
        )

    rightons = seg_per_range(rt)
    left_ranges = seg_per_range(lt)

    def carry_group(g: pa.Table) -> pa.Table:
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        rons = g.filter(pa.array(side == 1))
        needs = g.filter(pa.array(side == 0))
        if rons.num_rows == 0 or needs.num_rows == 0:
            return g.slice(0, 0)
        rons = rons.sort_by([(RNG, "ascending")])
        rr = rons[RNG].to_numpy(zero_copy_only=False)
        nr = needs[RNG].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rr, nr, side="left") - 1
        have = idx >= 0
        if not have.any():
            return g.slice(0, 0)
        out = rons.take(pa.array(idx[have]))
        out = out.set_column(
            out.column_names.index(RNG),
            RNG,
            pa.array(nr[have], type=pa.int64()),
        )
        return out.set_column(
            out.column_names.index(_SIDE),
            _SIDE,
            pa.array(
                np.full(out.num_rows, 2, dtype=np.int8), type=pa.int8()
            ),
        )

    # segment-sized tables come out of groupbys, which can emit empty
    # ZERO-COLUMN blocks that crash downstream groupbys — filter at the
    # block level (the documented dedup workaround)
    ron_refs, _ = _nonempty_blocks(rightons)
    lr_refs, _ = _nonempty_blocks(left_ranges)
    u = lt.union(rt)
    if ron_refs and lr_refs:
        carries = (
            ray.data.from_arrow_refs(ron_refs)
            .union(ray.data.from_arrow_refs(lr_refs))
            .groupby(by)
            .map_groups(carry_group, batch_format="pyarrow")
        )
        c_refs, _ = _nonempty_blocks(carries)
        if c_refs:
            u = u.union(ray.data.from_arrow_refs(c_refs))
    return u.groupby([by, RNG]).map_groups(
        join_group, batch_format="pyarrow"
    )



_IJ_RNG = "__ij_rng"


def _int64_no_nulls(col, name: str, caller: str) -> np.ndarray:
    """int64 view of a column for range math; nulls raise a CLEAR error —
    the unsplit paths' null behavior is unspecified, and letting a null
    silently become NaN here would poison the range keys."""
    arr = col.cast(pa.int64())
    if arr.null_count:
        raise ValueError(
            f"{caller}: column {name!r} contains nulls — the split_us "
            "path requires non-null timestamps/bounds (filter them first)"
        )
    return arr.to_numpy(zero_copy_only=False)


def _tag_on_ranges(
    ds: ray.data.Dataset,
    on: str,
    split_us: int,
    caller: str,
    rng_col: str = _IJ_RNG,
) -> ray.data.Dataset:
    """Append the time-range key ``on // split_us`` to every row."""

    def tag(b: pa.Table) -> pa.Table:
        r = _int64_no_nulls(b[on], on, caller) // split_us
        return b.append_column(rng_col, pa.array(r, type=pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def _replicate_interval_ranges(
    ds: ray.data.Dataset, start: str, end: str, split_us: int, caller: str
) -> ray.data.Dataset:
    """Replicate each interval into every time range it overlaps
    (np.repeat run expansion, one output row per (interval, range))."""

    def explode(b: pa.Table) -> pa.Table:
        sv = _int64_no_nulls(b[start], start, caller)
        ev = _int64_no_nulls(b[end], end, caller)
        if np.any(sv > ev):
            raise ValueError(
                f"{caller}: inverted interval (start > end) — check the "
                "start/end column arguments"
            )
        lo_r = sv // split_us
        counts = ev // split_us - lo_r + 1
        total = int(counts.sum())
        idx = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
        first = np.cumsum(counts) - counts
        rng = (
            np.arange(total, dtype=np.int64)
            - np.repeat(first, counts)
            + np.repeat(lo_r, counts)
        )
        return b.take(pa.array(idx)).append_column(
            _IJ_RNG, pa.array(rng, type=pa.int64())
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def interval_join(
    left_ds: ray.data.Dataset,
    intervals_ds: ray.data.Dataset,
    *,
    by: str,
    on: str,
    start: str,
    end: str,
    left_cols: list[str],
    interval_cols: list[str],
    split_us: int | None = None,
) -> ray.data.Dataset:
    """Range join: match each left row to the interval containing it
    (``start <= on <= end``, equal ``by`` key) — e.g. events -> sessions,
    metrics -> deploy windows.

    Same one-shuffle shape as :func:`asof_join` (tag, union,
    ``groupby(by).map_groups``); inside a group the intervals sort by
    ``start`` once and each left row resolves with one searchsorted probe.

    Assumption (VALIDATED, not silent): one key's intervals do not overlap,
    so a left row has at most one match — true for session windows, deploy
    windows, validity ranges.  Overlapping intervals raise ``ValueError``
    pointing at :func:`interval_join_multi`, the multi-match form with
    multiplying output.  Unmatched left rows keep nulls (left-join
    semantics).

    ``split_us`` (mega-key path, same contract as
    :func:`interval_join_multi`): shuffle on (key, time-range) with
    intervals replicated per overlapped range — identical output, per-task
    work bounded by the range.  The overlap validation stays complete:
    two truly overlapping intervals always share at least one range, so
    the per-range check still sees them together.
    """
    if split_us is not None and split_us <= 0:
        raise ValueError(f"split_us must be positive, got {split_us}")
    lschema = left_ds.schema()
    rschema = intervals_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(dict.fromkeys([by, on, *left_cols]))
    rcols = list(dict.fromkeys([by, start, end, *interval_cols]))
    all_cols = list(dict.fromkeys(lcols + rcols))
    types = {c: (ltypes.get(c) or rtypes.get(c)) for c in all_cols}
    left_p = _project(left_ds, lcols, 0, all_cols, types)
    ivl_p = _project(intervals_ds, rcols, 1, all_cols, types)
    if split_us is None:
        u = left_p.union(ivl_p)
        group_keys: list[str] = [by]
    else:
        u = _tag_on_ranges(left_p, on, split_us, "interval_join").union(
            _replicate_interval_ranges(
                ivl_p, start, end, split_us, "interval_join"
            )
        )
        group_keys = [by, _IJ_RNG]

    def join_group(group: pa.Table) -> pa.Table:
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        is_left = side == 0
        lrows = group.filter(pa.array(is_left))
        rrows = group.filter(pa.array(~is_left))
        lcount = lrows.num_rows
        cols: dict = {c: lrows[c] for c in lcols}
        # validate BEFORE any early return: a key whose intervals overlap
        # must raise even when that key has no left rows in this dataset
        # ("VALIDATED, not silent" must not be data-dependent)
        if rrows.num_rows:
            rrows = rrows.sort_by([(start, "ascending")])
            starts = rrows[start].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ends = rrows[end].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if np.any(starts[1:] <= ends[:-1]):
                key = rrows[by][0].as_py()
                raise ValueError(
                    f"interval_join: overlapping intervals for key {key!r} "
                    "— this operator requires non-overlapping intervals per "
                    "key (use interval_join_multi for the multi-match form)"
                )
        if lcount == 0 or rrows.num_rows == 0:
            for c in interval_cols:
                cols[f"matched_{c}"] = pa.nulls(lcount, type=types[c])
            return pa.table(cols)
        lon = lrows[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(starts, lon, side="right") - 1
        safe = np.clip(idx, 0, None)
        have = (idx >= 0) & (lon <= ends[safe])
        for c in interval_cols:
            vals = rrows[c].take(pa.array(safe))
            if not have.all():
                vals = pa.compute.if_else(
                    pa.array(~have), pa.nulls(lcount, type=types[c]), vals
                )
            cols[f"matched_{c}"] = vals
        return pa.table(cols)

    return u.groupby(group_keys).map_groups(join_group, batch_format="pyarrow")


def interval_join_multi(
    left_ds: ray.data.Dataset,
    intervals_ds: ray.data.Dataset,
    *,
    by: str,
    on: str,
    start: str,
    end: str,
    left_cols: list[str],
    interval_cols: list[str],
    how: str = "inner",
    split_us: int | None = None,
) -> ray.data.Dataset:
    """Multi-match range join: one output row per (left row, containing
    interval) with ``start <= on <= end`` and equal ``by`` key — intervals
    MAY overlap (events -> concurrent campaign windows, metrics ->
    overlapping experiment cohorts).  The single-match, non-overlapping
    form is :func:`interval_join`.

    Same one-shuffle shape (tag, ``union``, ``groupby(by).map_groups``).
    Inside a group the LEFT rows sort by ``on`` once; each interval's
    matches are then a CONTIGUOUS run of that sorted array, so the pair
    list is built with two vectorized ``searchsorted`` probes (run bounds
    per interval) and one ``np.repeat`` index expansion — O((n_left +
    n_intervals) log n_left + output) work per group, never the
    O(n_left x n_intervals) cross product, and no per-row Python.  The
    output is inherently multiplying (that is the semantics); compute is
    proportional to what is emitted.

    ``how="left"`` additionally emits each unmatched left row once with
    null ``matched_*`` columns; ``how="inner"`` (default) drops them.

    Partitioning: by default one key's rows fit one task (fine at any
    realistic key cardinality).  For a pathological mega-key, pass
    ``split_us`` (int64 units of the ``on``/``start``/``end`` columns —
    microseconds for timestamps, mirroring ``windows.sessionize``): the
    shuffle key becomes (key, time-range), each left row lands in exactly
    ONE range and each interval is REPLICATED into every range it
    overlaps, so every match is found exactly once — identical output, no
    dedup pass, and per-task work bounded by the range.  Interval
    replication factor is ~interval_length/split_us; pick split_us at or
    above the typical interval length.  An explicit caller choice, not
    auto-enabled (it changes the execution plan).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if split_us is not None and split_us <= 0:
        raise ValueError(f"split_us must be positive, got {split_us}")
    lschema = left_ds.schema()
    rschema = intervals_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(dict.fromkeys([by, on, *left_cols]))
    rcols = list(dict.fromkeys([by, start, end, *interval_cols]))
    all_cols = list(dict.fromkeys(lcols + rcols))
    types = {c: (ltypes.get(c) or rtypes.get(c)) for c in all_cols}
    left_p = _project(left_ds, lcols, 0, all_cols, types)
    ivl_p = _project(intervals_ds, rcols, 1, all_cols, types)
    if split_us is None:
        u = left_p.union(ivl_p)
        group_keys: list[str] = [by]
    else:
        u = _tag_on_ranges(
            left_p, on, split_us, "interval_join_multi"
        ).union(
            _replicate_interval_ranges(
                ivl_p, start, end, split_us, "interval_join_multi"
            )
        )
        group_keys = [by, _IJ_RNG]

    def join_group(group: pa.Table) -> pa.Table:
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        is_left = side == 0
        lrows = group.filter(pa.array(is_left))
        rrows = group.filter(pa.array(~is_left))
        lcount = lrows.num_rows

        def no_match() -> pa.Table:
            if how == "left":
                cols = {c: lrows[c] for c in lcols}
                n = lcount
            else:
                cols = {c: pa.array([], type=types[c]) for c in lcols}
                n = 0
            for c in interval_cols:
                cols[f"matched_{c}"] = pa.nulls(n, type=types[c])
            return pa.table(cols)

        # validate BEFORE any early return: inverted intervals (e.g.
        # swapped start/end arguments) must raise even for keys with no
        # left rows — the check must not be data-dependent
        if rrows.num_rows:
            starts = rrows[start].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ends = rrows[end].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if np.any(starts > ends):
                key = rrows[by][0].as_py()
                raise ValueError(
                    f"interval_join_multi: inverted interval (start > end) "
                    f"for key {key!r} — check the start/end column arguments"
                )
        if lcount == 0 or rrows.num_rows == 0:
            return no_match()
        lrows = lrows.sort_by([(on, "ascending")])
        lon = lrows[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(lon, starts, side="left")
        hi = np.searchsorted(lon, ends, side="right")
        # start <= end is validated above, so hi >= lo by monotonicity
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return no_match()
        iidx = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
        run_start = np.cumsum(counts) - counts
        lidx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(run_start, counts)
            + np.repeat(lo, counts)
        )
        if how == "left":
            matched = np.bincount(lidx, minlength=lcount) > 0
            miss = np.flatnonzero(~matched)
            lidx = np.concatenate([lidx, miss])
        l_take = pa.array(lidx)
        cols: dict = {c: lrows[c].take(l_take) for c in lcols}
        i_take = pa.array(iidx)
        for c in interval_cols:
            vals = rrows[c].take(i_take)
            if lidx.size > iidx.size:
                vals = pa.chunked_array(
                    [
                        vals.combine_chunks() if isinstance(
                            vals, pa.ChunkedArray
                        ) else vals,
                        pa.nulls(lidx.size - iidx.size, type=types[c]),
                    ]
                )
            cols[f"matched_{c}"] = vals
        return pa.table(cols)

    return u.groupby(group_keys).map_groups(join_group, batch_format="pyarrow")
