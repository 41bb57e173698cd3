"""Persisted IVF index: build the cluster assignment ONCE, query many times.

:func:`.ann.ivf_topk` retrains and reassigns per call — right for a
one-shot query, wasteful for a query workload.  This module persists the
IVF artifact the way the inverted index persists postings:

- ``build_ann_index`` trains centroids (bounded distributed sample,
  :func:`.ann.train_centroids`), assigns every vector once
  (``map_batches``), and writes the assignment as hive-partitioned parquet
  — ONE DIRECTORY PER CLUSTER (``assign/cluster=<c>/``).  The partition
  directory is the pruning unit: a query touches ``nprobe`` directories
  and never lists, opens or reads the rest — the same
  read-only-what-you-probe shape that makes IVF work at 100 TB.  Writes
  go to a temp dir and rename into place; the marker carries the
  (row count, dim, nlist) fingerprint so a stale or partial build is
  never silently served.
- ``AnnIndex`` loads ONLY the centroids (nlist x dim — driver-sized by
  construction) and serves ``query(vec, k, nprobe)`` via a pruned
  ``read_parquet`` of the probed cluster directories piped into the
  brute-force cosine kernel.

With ``nprobe == nlist`` the result is exactly the brute-force top-k
(asserted in tests), which is what makes the exact oracle valid for the
pruned path.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .ann import assign_clusters, cosine_topk, train_centroids

_MARKER = "_ANN_SUCCESS"


def build_ann_index(
    emb_ds: ray.data.Dataset,
    out_dir: str | Path,
    *,
    nlist: int | None = None,
    id_col: str = "vec_id",
    spherical: bool = True,
) -> dict:
    """Train + assign + persist; returns the marker payload.

    Refuses to replace an existing NON-INDEX directory (no ``_ANN_SUCCESS``
    marker and not empty) — a mistyped output path must not be deleted; a
    previous index (marker present) or leftover ``.tmp`` is replaced."""
    out = Path(out_dir)
    if out.exists() and any(out.iterdir()) and not (out / _MARKER).exists():
        raise FileExistsError(
            f"{out} exists, is non-empty and is not a previous ANN index "
            f"(no {_MARKER}) — refusing to overwrite; remove it explicitly"
        )
    cent = train_centroids(emb_ds, nlist, id_col=id_col, spherical=spherical)
    if cent.size == 0:
        raise ValueError("cannot build an ANN index over an empty dataset")
    cent_ref = ray.put(cent)
    assigned = emb_ds.map_batches(
        assign_clusters,
        fn_kwargs={"cent_ref": cent_ref, "id_col": id_col},
        batch_format="pyarrow",
    )
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    (tmp / "assign").mkdir(parents=True)
    # sort by cluster BEFORE the hive write: without it every (block,
    # cluster) pair becomes its own tiny file — blocks x nlist files (34k
    # observed for a 200k-row build).  Sorted, each block spans a few
    # clusters, so the layout is ~n_blocks + nlist files.  The sort is one
    # all-to-all proportional to the data — the standard price of a
    # clustered layout, same class as the build's doc-id sort.
    assigned.sort("cluster").write_parquet(
        str(tmp / "assign"), partition_cols=["cluster"]
    )
    n_rows = sum(
        pq.read_metadata(p).num_rows for p in (tmp / "assign").rglob("*.parquet")
    )
    d = cent.shape[1]
    off = np.arange(0, (cent.shape[0] + 1) * d, d, dtype=np.int32)
    pq.write_table(
        pa.table(
            {
                "cluster": pa.array(
                    np.arange(cent.shape[0], dtype=np.int32)
                ),
                "centroid": pa.ListArray.from_arrays(
                    pa.array(off), pa.array(cent.ravel())
                ),
            }
        ),
        tmp / "centroids.parquet",
    )
    marker = {
        "n_rows": int(n_rows),
        "dim": int(d),
        "nlist": int(cent.shape[0]),
        "id_col": id_col,
        "spherical": bool(spherical),
    }
    (tmp / _MARKER).write_text(json.dumps(marker))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return marker


class AnnIndex:
    """Query-side handle: centroids in memory (nlist x dim), assignments
    read per query from only the probed cluster directories."""

    def __init__(self, out_dir: str | Path) -> None:
        self.out_dir = Path(out_dir)
        marker = self.out_dir / _MARKER
        if not marker.exists():
            raise FileNotFoundError(
                f"no completed ANN index under {self.out_dir} "
                f"(missing {_MARKER}) — run build_ann_index first"
            )
        self.meta = json.loads(marker.read_text())
        t = pq.read_table(self.out_dir / "centroids.parquet")
        flat = t["centroid"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        self.centroids = flat.reshape(self.meta["nlist"], self.meta["dim"])

    def probe_clusters(self, query_vec: np.ndarray, nprobe: int) -> np.ndarray:
        q = np.asarray(query_vec, dtype=np.float64)
        if self.meta["spherical"]:
            q = q / max(float(np.linalg.norm(q)), 1e-30)
        d = ((self.centroids - q) ** 2).sum(axis=1)
        return np.argsort(d)[: min(nprobe, self.centroids.shape[0])]

    def query(
        self,
        query_vec: np.ndarray,
        k: int = 10,
        *,
        nprobe: int = 4,
        exclude: int | None = None,
    ) -> pa.Table:
        probe = self.probe_clusters(query_vec, nprobe)
        dirs = [
            str(self.out_dir / "assign" / f"cluster={int(c)}")
            for c in probe
        ]
        # a LIST of paths must be files, not dirs, for ray's parquet reader
        files = [
            str(f)
            for d in dirs
            if Path(d).is_dir()
            for f in sorted(Path(d).glob("*.parquet"))
        ]
        if not files:
            return pa.table(
                {
                    self.meta["id_col"]: pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        ds = ray.data.read_parquet(files)
        return cosine_topk(
            ds, np.asarray(query_vec, dtype=np.float64), k,
            id_col=self.meta["id_col"], exclude=exclude,
        )
