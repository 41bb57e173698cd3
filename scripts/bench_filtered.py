"""Filtered-query latency: pruned algorithms vs exhaustive under a
metadata filter (round-5 filter-aware pruning evidence for BASELINE.md).

The round-4 code applied filters by zeroing disallowed accumulator cells
AFTER full scoring, so maxscore / block-max WAND did the same work as
exhaustive on filtered queries.  Round 5 masks each term's postings inside
``_gather`` and recomputes windows/upper bounds over the restriction, so
the pruned algorithms skip disallowed-doc work while staying exact.

Usage (expects an attr-built index, e.g. the sf1 fixture index)::

    python scripts/bench_filtered.py /dev/shm/graft_r5_sf1_idx \
        /tmp/graft_fixtures/sf1/queries.parquet

Prints one JSON line: per-algorithm p50/p95 latency with and without the
``role=user`` filter, plus an identity check (every algorithm must return
the same ranking).
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

# `python scripts/bench_filtered.py` puts scripts/ (not the repo root) on
# sys.path; Ray workers resolve the package from the driver cwd, so run
# this from the repo root.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq
import ray

from ir_search_engine_ray.pipelines.index_build import IndexMeta
from ir_search_engine_ray.pipelines.query import QueryConfig, QueryEngine

ALGOS = ("exhaustive", "maxscore", "block_max_wand")


def measure(eng: QueryEngine, texts: list[str], algo: str, filters, reps=3):
    lat: list[float] = []
    for text in texts:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            eng.query(text, "w2", 10, algo, filters=filters)
            best = min(best, time.perf_counter() - t0)
        lat.append(best * 1e3)
    qs = statistics.quantiles(lat, n=20)
    return {"p50_ms": round(statistics.median(lat), 2), "p95_ms": round(qs[18], 2)}


def main() -> None:
    idx_dir, queries_path = sys.argv[1], sys.argv[2]
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    meta = IndexMeta.load(idx_dir)
    eng = QueryEngine(meta, QueryConfig(scheme="w2"))
    texts = [
        r["text"] for r in pq.read_table(queries_path).to_pylist()
    ][:50]
    filters = {"role": "user"}
    # warm the actors, the df cache and the memoized filter mask
    for t in texts[:5]:
        for algo in ALGOS:
            eng.query(t, "w2", 10, algo)
            eng.query(t, "w2", 10, algo, filters=filters)
    # identity: all algorithms agree exactly, filtered and unfiltered
    for t in texts:
        base = eng.query(t, "w2", 10, "exhaustive", filters=filters)
        for algo in ALGOS[1:]:
            got = eng.query(t, "w2", 10, algo, filters=filters)
            assert got == base, (t, algo)
    out = {"index": idx_dir, "n_queries": len(texts), "filter": "role=user"}
    for algo in ALGOS:
        out[algo] = {
            "unfiltered": measure(eng, texts, algo, None),
            "filtered": measure(eng, texts, algo, filters),
        }
    ray.shutdown()
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
