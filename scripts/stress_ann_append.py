"""Append-IVF stress: appending is O(new vectors), not a rebuild.

Tiles the driver embeddings table T times (distinct vec_ids per tile) to
get a corpus of n vectors, builds the persisted IVF index over the first
``base_frac`` of them, appends the rest as a generation tree, and reports:

- build seconds over the base  vs  append seconds over the delta
  (the append must cost roughly the delta's share of a full build, NOT a
  retrain+rewrite - that is the point of the generation layout);
- pruned-probe query time on the appended index;
- EXACTNESS: full-probe top-k over the appended index == brute-force
  cosine top-k over the whole corpus.

Usage (from the repo root)::

    python scripts/stress_ann_append.py [tiles=40] [base_frac=0.75]
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ir_search_engine_ray.extras.ann import cosine_topk
from ir_search_engine_ray.extras.ann_index import (
    AnnIndex,
    append_ann_index,
    build_ann_index,
)

SRC = "/root/testdata/sf0.1/embeddings.parquet"


def tiled(tiles: int) -> ray.data.Dataset:
    import pyarrow.parquet as pq

    base = pq.read_table(SRC, columns=["vec_id", "embedding"])
    n = base.num_rows

    def tile(b: pa.Table, t: int) -> pa.Table:
        ids = b["vec_id"].to_numpy() + np.int64(t) * n
        return pa.table({"vec_id": pa.array(ids), "embedding": b["embedding"]})

    ds = ray.data.from_arrow([tile(base, t) for t in range(tiles)])
    return ds.repartition(64)


def main() -> None:
    tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    base_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.75
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n_per = pq.read_metadata(SRC).num_rows
    n = tiles * n_per
    cut = int(n * base_frac)
    ds = tiled(tiles)
    base = ds.map_batches(
        lambda b: b.filter(pc.less(b["vec_id"], cut)), batch_format="pyarrow"
    )
    extra = ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["vec_id"], cut)),
        batch_format="pyarrow",
    )
    root = Path(tempfile.mkdtemp(prefix="graft_ann_stress_"))
    out = root / "idx"
    try:
        t0 = time.perf_counter()
        build_ann_index(base, out)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        append_ann_index(extra, out, retrain_frac=1.0)
        t_append = time.perf_counter() - t0
        idx = AnnIndex(out)
        q = np.array(
            ds.take(1)[0]["embedding"], dtype=np.float64
        )
        t0 = time.perf_counter()
        pruned = idx.query(q, k=10, nprobe=8, exclude=0)
        t_pruned = time.perf_counter() - t0
        t0 = time.perf_counter()
        full = idx.query(q, k=10, nprobe=idx.meta["nlist"], exclude=0)
        t_full = time.perf_counter() - t0
        exact = cosine_topk(ds, q, k=10, exclude=0)
        ok = full.equals(exact)
        result = {
            "n_vectors": n,
            "base_rows": cut,
            "appended_rows": n - cut,
            "nlist": idx.meta["nlist"],
            "build_s": round(t_build, 1),
            "append_s": round(t_append, 1),
            "append_per_row_vs_build": round(
                (t_append / max(n - cut, 1)) / (t_build / max(cut, 1)), 2
            ),
            "pruned_query_s": round(t_pruned, 2),
            "full_probe_query_s": round(t_full, 2),
            "full_probe_equals_exact": bool(ok),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()
    sys.stdout.flush()
    print(json.dumps(result), flush=True)
    assert result["full_probe_equals_exact"]


if __name__ == "__main__":
    main()
