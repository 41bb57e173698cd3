"""HyperLogLog distinct-count sketch: the bounded-memory cardinality path.

``corpus_stats`` / ``groupby().count()`` answers COUNT(DISTINCT x) exactly
by shuffling one row per distinct value — correct, but the output (and the
shuffle) grows with the cardinality.  At web scale (distinct URLs, user
ids, shingles) the standard tool is the HyperLogLog register array
(Flajolet et al. 2007): fixed ``m = 2^p`` bytes PER BATCH regardless of
row count, combined by elementwise max — associative, commutative and
idempotent, so the estimate is EXACTLY the same for any partitioning of
the input (asserted in tests; this determinism is also what makes the
driver's rows-only hash check meaningful).

Shape: one ``map_batches`` pass emits each batch's non-zero registers as
``(register, rho)`` rows; a register-indexed ``groupby(...).max()`` —
at most ``m`` rows through the shuffle, constant in the corpus — and the
driver applies the classic bias corrections (linear counting below
2.5m, the 2^64 large-range correction above) to the merged array.

Accuracy: the standard error is ``1.04 / sqrt(m)`` (~1.6% at p=12).  NOT
oracle-comparable against DuckDB's ``approx_count_distinct`` (a different
HLL implementation); correctness evidence is the relative-error bound and
partitioning-invariance tests plus the exact linear-counting regime on
small inputs.

No reference analogue; first-class training-data operator per the round
brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max

_HASH_SEED = b"hll-v1:"


def _hash64(values: list) -> np.ndarray:
    """Deterministic (process-independent) 64-bit hashes of arbitrary
    scalar values via blake2b over a canonical text encoding."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.blake2b(
                _HASH_SEED + repr(v).encode(), digest_size=8
            ).digest(),
            "little",
        )
    return out


def _splitmix64(ids: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (bijective, avalanche-complete) —
    the integer-column fast path for the HLL register hash.  Orders of
    magnitude faster than per-value blake2b and equally deterministic;
    bijectivity means distinct ints get distinct, uniform-looking
    hashes, which is exactly what the register/rho split needs."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _column_hash64(arr) -> np.ndarray:
    """64-bit hashes of a NULL-FREE arrow array/chunked-array: vectorized
    splitmix64 for integer columns (user ids, fingerprints — the
    web-scale cardinality case), blake2b text encoding otherwise.

    The branch keys on the column TYPE only: a per-batch null_count
    branch would hash the same value differently across batches of one
    dataset (splitmix in null-free blocks, blake2b elsewhere), silently
    inflating HLL estimates and breaking partition invariance.  Callers
    drop nulls first — count-distinct semantics ignore them."""
    if arr.null_count:
        raise ValueError("_column_hash64 requires a null-free array")
    if pa.types.is_integer(arr.type):
        return _splitmix64(
            arr.to_numpy(zero_copy_only=False).astype(np.int64)
        )
    return _hash64(arr.to_pylist())


def _register_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Split 64-bit hashes into (register, rho): the top ``p`` bits pick
    the register, rho is the 1-based position of the leftmost 1-bit in
    the remaining bits (all-zero remainder -> 64 - p + 1).  Shared by the
    global and grouped HLL combiners so the bit arithmetic can never
    drift between them."""
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    nz = rest != 0
    lead = np.full(h.size, 64 - p + 1, dtype=np.int64)
    if nz.any():
        # leading zeros via a branchless integer binary search
        top = rest[nz]
        bits = np.zeros(top.size, dtype=np.int64)
        cur = top.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = cur >= (np.uint64(1) << np.uint64(shift))
            bits[big] += shift
            cur[big] >>= np.uint64(shift)
        lead[nz] = 64 - 1 - bits + 1  # leading zeros + 1
    return reg, lead


def _batch_registers(batch: pa.Table, *, col: str, p: int) -> pa.Table:
    m = 1 << p
    # nulls are not values: count-distinct ignores them (and the hash
    # kernel requires null-free input — see _column_hash64)
    arr = batch[col].combine_chunks().drop_null()
    if len(arr) == 0:
        return pa.table(
            {
                "register": pa.array([], type=pa.int32()),
                "rho": pa.array([], type=pa.int8()),
            }
        )
    h = _column_hash64(arr)
    reg, lead = _register_rho(h, p)
    # max rho per register within the batch (combiner): dense scatter-max
    # into the m-slot array — ~70x faster than the lexsort equivalent
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, reg, lead)
    hot = np.nonzero(regs)[0]
    return pa.table(
        {
            "register": pa.array(hot.astype(np.int32)),
            "rho": pa.array(regs[hot].astype(np.int8)),
        }
    )


def hll_registers(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> np.ndarray:
    """The merged ``2^p`` register array (elementwise max across the whole
    dataset) — at most ``2^p`` rows ever cross the shuffle."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    merged = (
        ds.map_batches(
            _batch_registers,
            fn_kwargs={"col": col, "p": p},
            batch_format="pyarrow",
        )
        .groupby("register")
        .aggregate(Max("rho"))
        .take_all()
    )  # <= 2^p rows by construction
    regs = np.zeros(1 << p, dtype=np.int64)
    for r in merged:
        regs[r["register"]] = r["max(rho)"]
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate from a register array (classic
    Flajolet constants + linear-counting small-range correction)."""
    m = regs.size
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    raw = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if raw <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * float(np.log(m / zeros))
    two64 = float(2**64)
    if raw > two64 / 30.0:
        return -two64 * float(np.log1p(-raw / two64))
    return float(raw)


def hll_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> pa.Table:
    """One-row ``(estimate, p)`` table: the approximate COUNT(DISTINCT
    col), deterministic for a given input regardless of partitioning."""
    est = hll_estimate(hll_registers(ds, col, p))
    return pa.table(
        {
            "estimate": pa.array([int(round(est))], type=pa.int64()),
            "p": pa.array([p], type=pa.int64()),
        }
    )


def sampled_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    *,
    id_col: str = "doc_id",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    sample: int = 65536,
    seed: int = 7,
) -> pa.Table:
    """(quantile, value) rows from a seeded deterministic uniform sample —
    the bounded-memory quantile path for columns whose DISTINCT count is
    corpus-sized.

    ``aggregates.exact_quantiles`` is exact, but its value-histogram
    shuffle is bounded by the number of distinct values — right for
    integer-ish columns (doc lengths), wrong for continuous scores
    (logprobs, cosines) at corpus scale.  This estimator keeps the
    ``sample`` rows whose seeded id-hash ranks are globally smallest (the
    same order-free selection as ``ann.sample_embeddings``): every batch
    emits its local smallest-``sample`` (rank, value) pairs — a bounded
    partial, no shuffle — and the driver folds them into an O(sample)
    buffer.  Quantiles are lower order statistics of the sampled values,
    matching exact_quantiles' rank convention.

    Deterministic and partition-invariant: the rank is a pure function of
    the id, so the selected set — and therefore the estimate — does not
    depend on block count or row order (asserted in tests).  ``id_col``
    must be unique per row (like ``ann.sample_embeddings``): duplicate
    ids tie in rank, and tie-breaks are position- (hence partition-)
    dependent.  When the
    corpus has at most ``sample`` rows the sample IS the corpus and the
    result is EXACT (equal to ``exact_quantiles``, and SQL-oracle
    comparable); above that the quantile-rank error is the standard
    sampling bound O(1/sqrt(sample)) in quantile mass.
    """
    from .ann import _sample_ranks

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        r = _sample_ranks(ids, seed)
        if r.size > sample:
            keep = np.argpartition(r, sample - 1)[:sample]
            r, vals = r[keep], vals[keep]
        return pa.table(
            {
                "rank": pa.array(r.view(np.int64)),
                "value": pa.array(vals),
            }
        )

    best_r: np.ndarray | None = None
    best_v: np.ndarray | None = None
    for b in (
        ds.select_columns([id_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows == 0:
            continue
        r = b["rank"].to_numpy().view(np.uint64)
        v = b["value"].to_numpy(zero_copy_only=False)
        if best_r is not None:
            r = np.concatenate([best_r, r])
            v = np.concatenate([best_v, v])
        if r.size > sample:
            keep = np.argpartition(r, sample - 1)[:sample]
            r, v = r[keep], v[keep]
        best_r, best_v = r, v
    out_type = (
        pa.int64()
        if best_v is not None and np.issubdtype(best_v.dtype, np.integer)
        else pa.float64()
    )
    if best_v is None or best_v.size == 0:
        return pa.table(
            {
                "quantile": pa.array([], type=pa.float64()),
                "value": pa.array([], type=out_type),
            }
        )
    vals = np.sort(best_v)
    s = vals.size
    out_q = [float(q) for q in qs]
    out_v = [vals[int(np.floor(q * (s - 1)))] for q in qs]
    return pa.table(
        {
            "quantile": pa.array(out_q, type=pa.float64()),
            "value": pa.array(out_v, type=out_type),
        }
    )


def _mg_compress(
    items: np.ndarray, counts: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries reduction to at most ``m`` counters: subtract the
    (m+1)-th largest count from every counter and keep the positive ones
    (Agarwal et al., Mergeable Summaries).  Each call removes at least
    (m+1) x kth total mass, so the cumulative undercount of any item over
    a whole run is < n / (m+1)."""
    if items.size <= m:
        return items, counts
    kth = np.partition(counts, counts.size - (m + 1))[counts.size - (m + 1)]
    keep = counts > kth
    return items[keep], counts[keep] - kth


def frequent_items(
    ds: ray.data.Dataset,
    col: str,
    *,
    phi: float,
    counters: int | None = None,
) -> pa.Table:
    """EXACT heavy hitters — every value whose count exceeds
    ``floor(phi * n)`` (n = non-null rows), with its exact count — in two
    bounded-memory, shuffle-free passes.

    A plain ``groupby(col).count()`` shuffles one row per DISTINCT value —
    at web scale (terms, URLs, shingles) that is corpus-sized.  The
    standard fix is candidates-then-recount: pass 1 runs a Misra-Gries
    summary (``m`` counters, default ``ceil(2/phi)``) per batch — exact
    in-batch ``value_counts`` compressed by :func:`_mg_compress` — and the
    driver folds the bounded partials into one m-counter summary.  MG
    guarantees every value with true count > n/(m+1) survives, and
    ``m >= 2/phi`` makes n/(m+1) < the reporting threshold, so the
    survivor set is a SUPERSET of the answer for ANY partitioning.
    Pass 2 broadcasts the <= m candidates and exactly recounts ONLY them
    (per-batch ``is_in`` filter + ``value_counts`` partials, folded on the
    driver) — so the final counts, and the thresholded answer, are EXACT
    and partition-invariant (asserted in tests), unlike a one-pass sketch.

    Driver memory is O(m); each pass moves O(m) rows per batch; the input
    is consumed twice (recomputed if lazy — the price of two passes).
    Raises if ``phi * n < 1`` (threshold 0 would need every distinct
    value as a candidate; raise ``counters`` or use an exact groupby).
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    m = int(counters) if counters is not None else int(np.ceil(2.0 / phi))
    if m + 1 <= 1.0 / phi:
        raise ValueError(
            f"counters={m} too small for phi={phi}: need counters+1 > 1/phi"
        )

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].combine_chunks().drop_null()
        if pa.types.is_dictionary(v.type):
            v = v.cast(v.type.value_type)
        vc = pc.value_counts(v)
        items = vc.field("values")
        counts = vc.field("counts").to_numpy()
        keep_i, keep_c = _mg_compress(
            np.arange(len(items), dtype=np.int64), counts, m
        )
        out_items = items.take(pa.array(keep_i))
        # one null-item marker row per batch carries the non-null row
        # count so the driver learns n without a second aggregate
        return pa.table(
            {
                "item": pa.concat_arrays(
                    [out_items, pa.array([None], type=out_items.type)]
                ),
                "cnt": pa.array(
                    np.concatenate([keep_c, [len(v)]]), type=pa.int64()
                ),
            }
        )

    summary: dict = {}
    n = 0
    item_type = None
    src = ds.select_columns([col])
    for b in src.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if item_type is None and b.num_rows:
            item_type = b["item"].type
        for it, c in zip(b["item"].to_pylist(), b["cnt"].to_pylist()):
            if it is None:
                n += c
            else:
                summary[it] = summary.get(it, 0) + c
        if len(summary) > 2 * m:
            arr = np.fromiter(summary.values(), dtype=np.int64)
            keys = np.array(list(summary.keys()), dtype=object)
            ki, kc = _mg_compress(keys, arr, m)
            summary = dict(zip(ki.tolist(), kc.tolist()))
    if item_type is None:
        item_type = pa.string()
    thr = int(np.floor(phi * n))
    if n and thr < n / (m + 1):
        raise ValueError(
            f"phi*n ({phi * n:.2f}) too small for counters={m}: the "
            "candidate guarantee needs floor(phi*n) >= n/(counters+1); "
            "raise counters or phi"
        )
    if not summary:
        return pa.table(
            {col: pa.array([], type=item_type),
             "cnt": pa.array([], type=pa.int64())}
        )

    cand = pa.array(list(summary.keys()), type=item_type)

    def recount(batch: pa.Table) -> pa.Table:
        v = batch[col].combine_chunks().drop_null()
        if pa.types.is_dictionary(v.type):
            v = v.cast(v.type.value_type)
        v = v.filter(pc.is_in(v, value_set=cand))
        vc = pc.value_counts(v)
        return pa.table(
            {"item": vc.field("values"),
             "cnt": pa.array(vc.field("counts").to_numpy(), type=pa.int64())}
        )

    exact: dict = {}
    for b in src.map_batches(recount, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for it, c in zip(b["item"].to_pylist(), b["cnt"].to_pylist()):
            exact[it] = exact.get(it, 0) + c
    hits = [(it, c) for it, c in exact.items() if c > thr]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return pa.table(
        {
            col: pa.array([h[0] for h in hits], type=item_type),
            "cnt": pa.array([h[1] for h in hits], type=pa.int64()),
        }
    )


def _batch_registers_by(
    batch: pa.Table, *, col: str, by: str, p: int
) -> pa.Table:
    """Per-(group, register) max-rho partial for one batch — the grouped
    form of :func:`_batch_registers` (at most groups x 2^p rows, in
    practice the sparse non-zero registers only)."""
    varr = batch[col].combine_chunks()
    gcol = batch[by].combine_chunks()
    if pa.types.is_dictionary(gcol.type):
        gcol = gcol.cast(gcol.type.value_type)
    empty = pa.table(
        {
            "group": pa.array([], type=gcol.type),
            "register": pa.array([], type=pa.int32()),
            "rho": pa.array([], type=pa.int8()),
        }
    )
    # drop rows with a null value (not a distinct value) or a null group
    # key: a null dictionary code casts to INT64_MIN, whose *m offset
    # wraps to 0 and corrupts the first group's registers
    ok = pa.compute.and_(
        pa.compute.is_valid(varr), pa.compute.is_valid(gcol)
    )
    if not pa.compute.all(ok).as_py():
        varr = varr.filter(ok)
        gcol = gcol.filter(ok)
    if len(varr) == 0:
        return empty
    dict_enc = gcol.dictionary_encode()
    gcode = dict_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    h = _column_hash64(varr)
    reg, lead = _register_rho(h, p)
    m = 1 << p
    ngroups = len(dict_enc.dictionary)
    if ngroups * m <= (1 << 23):
        # dense (group x register) scatter-max — the fast path when the
        # batch's group fan-out is modest (<= 64 MiB of slots)
        dense = np.zeros(ngroups * m, dtype=np.int64)
        np.maximum.at(dense, gcode * m + reg, lead)
        hot = np.nonzero(dense)[0]
        g_out, reg_out, rho_out = hot // m, hot % m, dense[hot]
    else:
        # high-fanout fallback: sort-based first-per-(group, register)
        order = np.lexsort((-lead, reg, gcode))
        g_s, reg_s, lead_s = gcode[order], reg[order], lead[order]
        first = np.ones(reg_s.size, dtype=bool)
        first[1:] = (np.diff(g_s) != 0) | (np.diff(reg_s) != 0)
        g_out, reg_out, rho_out = g_s[first], reg_s[first], lead_s[first]
    return pa.table(
        {
            "group": dict_enc.dictionary.take(pa.array(g_out)),
            "register": pa.array(reg_out.astype(np.int32)),
            "rho": pa.array(rho_out.astype(np.int8)),
        }
    )


def hll_distinct_by(
    ds: ray.data.Dataset, col: str, by: str, p: int = 12
) -> ray.data.Dataset:
    """(group, estimate, p) — approximate COUNT(DISTINCT col) PER GROUP,
    the grouped form of :func:`hll_distinct`.

    Same discipline as ``exact_quantiles_by``: stage 1 reduces each batch
    to its per-(group, register) max-rho partials (bounded by the batch's
    group fan-out x the sparse register count, never its row count),
    stage 2 is a (group, register) groupby max — at most 2^p rows per
    group through the shuffle regardless of group cardinality — and
    stage 3 folds each group's sparse registers into the bias-corrected
    estimate in one map_groups task.  A group's raw values never
    co-locate; only its constant-size register summary does.  Max-merge
    is associative/commutative/idempotent, so every estimate is EXACTLY
    partition-invariant (asserted in tests), and small groups fall in the
    linear-counting regime where the estimate is exact."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p

    def estimate_group(group: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.int64)
        idx = group["register"].to_numpy(zero_copy_only=False)
        rho = group["rho"].to_numpy(zero_copy_only=False)
        regs[idx] = rho  # already max-merged by the groupby
        return pa.table(
            {
                by: group["group"].slice(0, 1),
                "estimate": pa.array(
                    [int(round(hll_estimate(regs)))], type=pa.int64()
                ),
                "p": pa.array([p], type=pa.int64()),
            }
        )

    return (
        ds.select_columns([col, by])
        .map_batches(
            _batch_registers_by,
            fn_kwargs={"col": col, "by": by, "p": p},
            batch_format="pyarrow",
        )
        .groupby(["group", "register"])
        .aggregate(Max("rho"))
        .rename_columns({"max(rho)": "rho"})
        .groupby("group")
        .map_groups(estimate_group, batch_format="pyarrow")
    )
