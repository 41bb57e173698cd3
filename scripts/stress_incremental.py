"""Incremental-ingest stress: matching a new shard against a persisted
baseline must scale with the SHARD, not the baseline, and leave driver
memory flat.

Builds a synthetic baseline of ``n_base`` documents (from a shared
template vocabulary so near-dups are realistic), exports its content
hashes and LSH/sketch tables once, then ingests a new shard of
``n_new`` docs where a known fraction are exact copies and another
fraction near-copies (one token mutated) of baseline docs.  Reports:

- export seconds (the one-off baseline cost);
- exact-vs-baseline seconds (`exact_dedup_against`) and survivor count
  — must equal the planted fresh+near count exactly;
- near-dup-vs-baseline seconds (`minhash_pairs_against`) and matched
  new-doc count — every planted EXACT copy must match (bucket identity);
  near copies sit at jaccard ~0.7-0.95 where 16x4 banding's per-pair
  recall is 1-(1-j^4)^16 >= ~0.99, so the asserted floor is 0.95;
- peak driver RSS delta across the matching phase (flat = the
  partition-tagged shuffles keep all per-doc state worker-side).

Usage (from the repo root)::

    python scripts/stress_incremental.py [n_base=100000] [n_new=20000]
"""
from __future__ import annotations

import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ir_search_engine_ray.extras import dedup


def _word(i: int) -> str:
    s = ""
    i = int(i)
    while True:
        s = chr(97 + i % 26) + s
        i //= 26
        if i == 0:
            return "w" + s


def make_docs(ids: np.ndarray, rng: np.random.Generator) -> list[str]:
    vocab = np.array([_word(i) for i in range(20000)])
    out = []
    for _ in ids:
        n = rng.integers(20, 60)
        out.append(" ".join(vocab[rng.integers(0, vocab.size, n)]))
    return out


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    rng = np.random.default_rng(5)

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    base_ids = np.arange(n_base, dtype=np.int64)
    base_texts = make_docs(base_ids, rng)
    base = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(base_ids), "text": pa.array(base_texts)})
    ).repartition(32)

    # new shard: 10% exact copies, 10% near copies (one token swapped),
    # 80% fresh
    n_exact = n_new // 10
    n_near = n_new // 10
    n_fresh = n_new - n_exact - n_near
    pick = rng.integers(0, n_base, n_exact + n_near)
    exact_texts = [base_texts[i] for i in pick[:n_exact]]
    near_texts = []
    for i in pick[n_exact:]:
        toks = base_texts[i].split()
        toks[int(rng.integers(0, len(toks)))] = "zzmutated"
        near_texts.append(" ".join(toks))
    fresh_texts = make_docs(np.arange(n_fresh), rng)
    new_ids = np.arange(n_base, n_base + n_new, dtype=np.int64)
    new_texts = exact_texts + near_texts + fresh_texts
    new = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(new_ids), "text": pa.array(new_texts)})
    ).repartition(16)

    t0 = time.perf_counter()
    hashes = dedup.export_content_hashes(base).materialize()
    buckets, sketches = dedup.export_neardup_baseline(base)
    buckets = buckets.materialize()
    sketches = sketches.materialize()
    export_s = time.perf_counter() - t0

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    t0 = time.perf_counter()
    surv = dedup.exact_dedup_against(new, hashes).materialize()
    exact_s = time.perf_counter() - t0
    n_surv = surv.count()
    # every planted exact copy (and only those) must fall away; the
    # survivor count is the DISTINCT unseen texts (two near copies of the
    # same base doc mutated at the same position collide within the shard)
    expected = len(set(near_texts + fresh_texts))
    assert n_surv == expected, (n_surv, expected)

    t0 = time.perf_counter()
    pairs = dedup.minhash_pairs_against(
        new, buckets, sketches, threshold=0.5
    ).materialize()
    near_s = time.perf_counter() - t0
    matched_new = {
        int(x)
        for b in pairs.to_arrow_refs()
        for x in ray.get(b)["doc_a"].to_pylist()
    }
    exact_planted = set(range(n_base, n_base + n_exact))
    near_planted = set(range(n_base + n_exact, n_base + n_exact + n_near))
    assert not exact_planted - matched_new, "exact copy missed (impossible: bucket identity)"
    near_recall = len(near_planted & matched_new) / max(len(near_planted), 1)
    assert near_recall >= 0.95, f"near-copy recall {near_recall:.3f}"

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    print(
        json.dumps(
            {
                "n_base": n_base,
                "n_new": n_new,
                "export_s": round(export_s, 2),
                "exact_against_s": round(exact_s, 2),
                "exact_survivors": n_surv,
                "neardup_against_s": round(near_s, 2),
                "matched_new_docs": len(matched_new),
                "planted_copies": n_exact + n_near,
                "near_copy_recall": round(near_recall, 4),
                "driver_rss_delta_mb": round((rss1 - rss0) / 1024, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
