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


def _batch_registers(batch: pa.Table, *, col: str, p: int) -> pa.Table:
    m = 1 << p
    vals = batch[col].to_pylist()
    if not vals:
        return pa.table(
            {
                "register": pa.array([], type=pa.int32()),
                "rho": pa.array([], type=pa.int8()),
            }
        )
    h = _hash64(vals)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = position of the leftmost 1-bit in the remaining bits (1-based);
    # all-zero remainder -> 64 - p + 1
    nz = rest != 0
    lead = np.full(h.size, 64 - p + 1, dtype=np.int64)
    if nz.any():
        # count leading zeros via float64 exponent-free integer log2
        top = rest[nz]
        bits = np.zeros(top.size, dtype=np.int64)
        cur = top.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = cur >= (np.uint64(1) << np.uint64(shift))
            bits[big] += shift
            cur[big] >>= np.uint64(shift)
        lead[nz] = 64 - 1 - bits + 1  # leading zeros + 1
    # max rho per register within the batch (combiner)
    order = np.lexsort((-lead, reg))
    reg_s, lead_s = reg[order], lead[order]
    first = np.ones(reg_s.size, dtype=bool)
    first[1:] = np.diff(reg_s) != 0
    return pa.table(
        {
            "register": pa.array(reg_s[first].astype(np.int32)),
            "rho": pa.array(lead_s[first].astype(np.int8)),
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
