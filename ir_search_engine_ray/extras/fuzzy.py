"""Fuzzy vocabulary lookup: SymSpell-style deletion-neighborhood matching.

Spell-correction / query-relaxation primitive: given a small set of probe
strings (misspelled query terms), find every vocabulary term within
Levenshtein distance ``max_edits``.  The scalable shape is Garbe's SymSpell
construction (public, 2012): if ``lev(q, t) <= d`` then the sets of strings
reachable from ``q`` and ``t`` by at most ``d`` character DELETIONS
intersect — so candidate generation is a hash probe, never a scan of edit
variants with insertions/substitutions (alphabet-sized blowup) and never a
brute-force distance against every vocabulary term.

Distribution discipline (the same broadcast shape as
:mod:`..extras.decontam`):

- The probe-side deletion neighborhood (``O(len^d)`` variants per probe,
  probes are query-sized — tiny) is built on the driver and shipped once
  via ``ray.put``; every map task reads it from the local object-store
  cache.
- The VOCABULARY streams through ``map_batches``; a batch is first
  length-filtered vectorized (``|len(term) - len(probe)| <= d`` is
  necessary), then only the surviving terms — for a natural-language
  vocabulary and short probes, a sliver of each batch — walk the per-term
  deletion loop.  The per-term work is over the *vocabulary* (which grows
  ~sqrt(corpus) by Heaps' law), never over the corpus rows.
- Hash hits are verified with an exact banded Levenshtein (the deletion
  intersection is necessary, not sufficient), so the output is exact —
  which is what makes a DuckDB ``levenshtein()`` cross-join a valid oracle.
- Map-only: no shuffle; the result is match-sized and keeps streaming (the
  caller decides whether to collect it).

No reference analogue; first-class training-data/IR operator per the round
brief (query-side robustness for retrieval over noisy web text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_OUT_SCHEMA = pa.schema(
    [
        ("query", pa.string()),
        ("term", pa.string()),
        ("dist", pa.int64()),
        ("df", pa.int64()),
    ]
)


def _deletions(term: str, d: int) -> set[str]:
    """All strings reachable from ``term`` by at most ``d`` deletions
    (including ``term`` itself)."""
    frontier = {term}
    out = {term}
    for _ in range(d):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def lev_leq(a: str, b: str, d: int) -> int | None:
    """Exact Levenshtein distance if ``<= d``, else ``None``.

    Two-row DP with a band early-abort: once every cell in the current row
    exceeds ``d`` the true distance cannot come back under it (row minima
    are non-decreasing along the DP).
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return None
    if la > lb:  # iterate over the shorter string's rows
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min > d:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= d else None


def build_probe_neighborhood(
    probes: list[str], max_edits: int
) -> tuple[dict[str, list[int]], list[str], np.ndarray]:
    """Driver-side broadcast payload: deletion-variant -> probe indices,
    the probe list, and the sorted array of vocabulary lengths that could
    possibly match any probe (the vectorized pre-filter)."""
    variant_map: dict[str, list[int]] = {}
    for qi, q in enumerate(probes):
        for v in _deletions(q, max_edits):
            variant_map.setdefault(v, []).append(qi)
    lens = sorted(
        {
            ln
            for q in probes
            for ln in range(max(1, len(q) - max_edits), len(q) + max_edits + 1)
        }
    )
    return variant_map, list(probes), np.asarray(lens, dtype=np.int64)


def _probe_batch(
    batch: pa.Table, *, payload_ref, max_edits: int
) -> pa.Table:
    payload = (
        ray.get(payload_ref)
        if isinstance(payload_ref, ray.ObjectRef)
        else payload_ref
    )
    variant_map, probes, ok_lens = payload
    lens = pc.utf8_length(batch["term"]).to_numpy().astype(np.int64)
    mask = np.isin(lens, ok_lens)
    if not mask.any():
        return _OUT_SCHEMA.empty_table()
    sub = batch.filter(pa.array(mask))
    terms = sub["term"].to_pylist()
    dfs = sub["df"].to_numpy(zero_copy_only=False)
    out_q: list[str] = []
    out_t: list[str] = []
    out_d: list[int] = []
    out_df: list[int] = []
    for term, df in zip(terms, dfs):
        cand: set[int] = set()
        for v in _deletions(term, max_edits):
            hit = variant_map.get(v)
            if hit:
                cand.update(hit)
        for qi in cand:
            dist = lev_leq(probes[qi], term, max_edits)
            if dist is not None:
                out_q.append(probes[qi])
                out_t.append(term)
                out_d.append(dist)
                out_df.append(int(df))
    return pa.table(
        {
            "query": pa.array(out_q, type=pa.string()),
            "term": pa.array(out_t, type=pa.string()),
            "dist": pa.array(out_d, type=pa.int64()),
            "df": pa.array(out_df, type=pa.int64()),
        }
    )


def fuzzy_vocab_lookup(
    vocab_ds: ray.data.Dataset, probes: list[str], max_edits: int = 1
) -> ray.data.Dataset:
    """Every ``(query, term, dist, df)`` with ``lev(query, term) <= max_edits``.

    ``vocab_ds`` carries ``(term, df)`` rows (e.g. the output of the df
    stage).  Map-only over the vocabulary; the probe neighborhood is
    broadcast once.  Exact by construction (hash candidates are
    Levenshtein-verified), so ``SELECT ... WHERE levenshtein(q, term) <= d``
    is the oracle.
    """
    if max_edits < 1:
        raise ValueError(f"max_edits must be >= 1, got {max_edits}")
    if not probes:
        raise ValueError("probes must be non-empty")
    if len(set(probes)) != len(probes):
        raise ValueError("probes must be distinct")
    payload_ref = ray.put(build_probe_neighborhood(list(probes), max_edits))
    return vocab_ds.map_batches(
        _probe_batch,
        fn_kwargs={"payload_ref": payload_ref, "max_edits": max_edits},
        batch_format="pyarrow",
    )
