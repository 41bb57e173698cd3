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
- ``append_ann_index`` grows the index WITHOUT a retrain or a rewrite:
  new vectors are assigned to the EXISTING centroids and written as a new
  GENERATION tree (``assign-g0001/cluster=<c>/``); the marker's
  ``generations`` list is what queries read, and it is rewritten
  atomically only after the generation directory is fully in place — a
  crash mid-append is invisible (the half-written generation is never
  listed, so never served), mirroring ``pipelines.index_build.append_index``'s
  discipline.  Append cost is O(new vectors); the price is that centroids
  drift from the data as appends accumulate, so recall on the PRUNED
  (nprobe < nlist) path can degrade — past ``retrain_frac`` appended rows
  the append warns to rebuild (full-probe stays exact regardless).
- ``AnnIndex`` loads ONLY the centroids (nlist x dim — driver-sized by
  construction) and serves ``query(vec, k, nprobe)`` via a pruned
  ``read_parquet`` of the probed cluster directories, across every live
  generation, piped into the brute-force cosine kernel.

With ``nprobe == nlist`` the result is exactly the brute-force top-k
(asserted in tests, appended generations included), which is what makes
the exact oracle valid for the pruned path.
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
    n_rows, max_id, _min_id = _tree_stats(tmp / "assign", id_col)
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
        # append bookkeeping: queries read exactly these trees; append adds
        # a new one and rewrites this marker atomically (see append_ann_index)
        "generations": ["assign"],
        "max_vec_id": None if max_id is None else int(max_id),
        "n_base_rows": int(n_rows),
        "n_appended": 0,
    }
    (tmp / _MARKER).write_text(json.dumps(marker))
    # crash-safe swap: rename the live index ASIDE (instant) instead of
    # deleting it before the promote — a crash anywhere in this window
    # leaves either the old index at ``out`` or a complete copy at
    # ``.old``, never zero queryable indexes; the old copy is removed only
    # after the new one is in place
    old = out.with_name(out.name + ".old")
    shutil.rmtree(old, ignore_errors=True)
    if out.exists():
        os.replace(out, old)
    os.replace(tmp, out)
    shutil.rmtree(old, ignore_errors=True)
    return marker


def _tree_stats(
    tree: Path, id_col: str
) -> tuple[int, int | None, int | None]:
    """(row count, max id, min id) of a written assignment tree, from the
    parquet FOOTERS (row counts + column min/max statistics) — no data
    read; falls back to reading the id column of any file whose stats are
    absent.  The min rides along so append-id validation needs no extra
    full pass over the (possibly computed) input dataset."""
    n = 0
    mx: int | None = None
    mn: int | None = None
    for p in tree.rglob("*.parquet"):
        md = pq.read_metadata(p)
        n += md.num_rows
        if md.num_rows == 0:
            continue
        idx = md.schema.names.index(id_col)
        file_mx: int | None = None
        file_mn: int | None = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                file_mx = None
                break
            file_mx = st.max if file_mx is None else max(file_mx, st.max)
            file_mn = st.min if file_mn is None else min(file_mn, st.min)
        if file_mx is None:  # stats missing: read just the id column
            col = pq.read_table(p, columns=[id_col])[id_col]
            file_mx = int(pa.compute.max(col).as_py())
            file_mn = int(pa.compute.min(col).as_py())
        mx = int(file_mx) if mx is None else max(mx, int(file_mx))
        mn = int(file_mn) if mn is None else min(mn, int(file_mn))
    return n, mx, mn


def append_ann_index(
    emb_ds: ray.data.Dataset,
    out_dir: str | Path,
    *,
    retrain_frac: float = 0.5,
) -> dict:
    """Append new vectors to a persisted IVF index WITHOUT retraining or
    rewriting: assign them to the EXISTING centroids and write one new
    generation tree (``assign-gNNNN/cluster=<c>/``), then atomically
    rewrite the marker to include it — O(new vectors) total, and a crash
    anywhere before the marker rewrite leaves the index exactly as it was
    (the orphan generation is never listed, so never served, and the next
    append overwrites it).

    Requirements mirror the text index's ``append_index``: new ``id_col``
    values must sort strictly after every indexed one (duplicate ids would
    be served twice) and the embedding dim must match.

    Centroids are NOT retrained, so bucket balance drifts as appends
    accumulate: full-probe results stay exact forever, but pruned
    (``nprobe < nlist``) recall can degrade.  Once cumulative appended
    rows exceed ``retrain_frac`` x the base build's rows, a warning
    recommends a fresh ``build_ann_index`` — the documented re-train
    threshold."""
    out = Path(out_dir)
    marker_path = out / _MARKER
    if not marker_path.exists():
        raise FileNotFoundError(
            f"no completed ANN index under {out} (missing {_MARKER}) — "
            "run build_ann_index first"
        )
    meta = json.loads(marker_path.read_text())
    id_col = meta["id_col"]
    head = emb_ds.take(1)
    if not head:
        return meta  # empty append: no-op
    got_dim = len(head[0]["embedding"])
    if got_dim != meta["dim"]:
        raise ValueError(
            f"appended embeddings have dim {got_dim}, index has "
            f"dim {meta['dim']}"
        )
    t = pq.read_table(out / "centroids.parquet")
    flat = t["centroid"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    cent = flat.reshape(meta["nlist"], meta["dim"])
    cent_ref = ray.put(cent)
    assigned = emb_ds.map_batches(
        assign_clusters,
        fn_kwargs={"cent_ref": cent_ref, "id_col": id_col},
        batch_format="pyarrow",
    )
    gens = list(meta.get("generations", ["assign"]))
    gen = f"assign-g{len(gens):04d}"
    tmp = out / (gen + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    assigned.sort("cluster").write_parquet(
        str(tmp), partition_cols=["cluster"]
    )
    n_new, new_max, new_min = _tree_stats(tmp, id_col)
    # id validation from the written tree's FOOTER stats, not a dedicated
    # min() pass over the input (which would re-execute a computed
    # embedding pipeline); a failed check removes the tmp tree and leaves
    # the index exactly as it was
    if (
        meta.get("max_vec_id") is not None
        and new_min is not None
        and new_min <= meta["max_vec_id"]
    ):
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            f"appended {id_col} values must sort after every indexed one "
            f"(got min {new_min} <= indexed max {meta['max_vec_id']}) — "
            "duplicate ids would be served twice"
        )
    shutil.rmtree(out / gen, ignore_errors=True)  # orphan of a prior crash
    os.replace(tmp, out / gen)
    prev_max = meta.get("max_vec_id")
    new_meta = {
        **meta,
        "n_rows": int(meta["n_rows"] + n_new),
        "generations": gens + [gen],
        "max_vec_id": (
            new_max if prev_max is None
            else (prev_max if new_max is None else max(prev_max, new_max))
        ),
        "n_base_rows": int(meta.get("n_base_rows", meta["n_rows"])),
        "n_appended": int(meta.get("n_appended", 0) + n_new),
    }
    marker_tmp = out / (_MARKER + ".tmp")
    marker_tmp.write_text(json.dumps(new_meta))
    os.replace(marker_tmp, marker_path)
    if new_meta["n_appended"] > retrain_frac * max(new_meta["n_base_rows"], 1):
        import logging

        logging.getLogger(__name__).warning(
            "ANN index %s has %d appended rows vs %d base rows "
            "(> retrain_frac=%.2f): centroids were trained before the "
            "appends, so pruned-probe recall may be degraded — rebuild "
            "with build_ann_index to retrain",
            out, new_meta["n_appended"], new_meta["n_base_rows"],
            retrain_frac,
        )
    return new_meta


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
        # every live generation tree (base build + appends) contributes its
        # probed cluster directories; trees not listed in the marker (e.g.
        # a crashed append's orphan) are never read
        dirs = [
            str(self.out_dir / gen / f"cluster={int(c)}")
            for gen in self.meta.get("generations", ["assign"])
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
