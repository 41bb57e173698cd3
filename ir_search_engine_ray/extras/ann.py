"""Similarity search over an embedding column (``list<float>``).

- ``cosine_topk``: brute-force baseline — per batch, one float64 matmul of
  the batch matrix against the broadcast query vector(s), per-batch local
  top-k, tiny global merge.  No shuffle; scales linearly with corpus size and
  is embarrassingly parallel.
- ``ivf_topk``: the scale path — a driver-side k-means (few iterations over a
  bounded sample) produces centroids; every vector is assigned to its nearest
  centroid once (``map_batches``); queries probe only the ``nprobe`` nearest
  centroid partitions.  Exactness is traded for reading ~nprobe/nlist of the
  corpus; with nprobe == nlist it degenerates to exact brute force (asserted
  in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col].combine_chunks()
    n = len(arr)
    if n == 0:  # reshape(0, -1) cannot infer a width
        return np.zeros((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _topk_partial(
    batch: pa.Table, *, q_ref, k: int, id_col: str, exclude: int | None
) -> pa.Table:
    q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
    mat = _batch_matrix(batch)
    ids = batch[id_col].to_numpy()
    if exclude is not None:
        keep = ids != exclude
        mat, ids = mat[keep], ids[keep]
    if ids.size == 0:
        return pa.table(
            {id_col: pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}
        )
    norms = np.linalg.norm(mat, axis=1)
    qn = np.linalg.norm(q)
    cos = (mat @ q) / np.maximum(norms * qn, 1e-30)
    part = _local_topk(cos, ids, k)
    return pa.table(
        {
            id_col: pa.array(ids[part], type=pa.int64()),
            "cosine": pa.array(cos[part], type=pa.float64()),
        }
    )


def _local_topk(cos: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Per-batch top-k indices with the GLOBAL tie-break (cosine desc,
    id asc).  A bare argpartition keeps an arbitrary tie subset, which
    makes the merged result depend on block layout when scores tie
    exactly (e.g. duplicate vectors); selecting everything at or above
    the k-th score and lexsorting keeps the partial deterministic and
    minimal-id, so the merge is layout-independent."""
    take = min(k, cos.size)
    if take == cos.size:
        cand = np.arange(cos.size)
    else:
        kth = np.partition(-cos, take - 1)[take - 1]
        cand = np.flatnonzero(-cos <= kth)  # all with cos >= k-th largest
    order = np.lexsort((ids[cand], -cos[cand]))[:take]
    return cand[order]


def cosine_topk(
    emb_ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    exclude: int | None = None,
) -> pa.Table:
    """Exact cosine top-k; ties break on ascending id."""
    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))
    partial = emb_ds.map_batches(
        _topk_partial,
        fn_kwargs={"q_ref": q_ref, "k": k, "id_col": id_col, "exclude": exclude},
        batch_format="pyarrow",
    )
    rows = partial.take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    cos = np.array([r["cosine"] for r in rows], dtype=np.float64)
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order]),
            "cosine": pa.array(np.round(cos[order], 6)),
        }
    )


def _batch_topk_partial(
    batch: pa.Table, *, q_ref, k: int, id_col: str, exclude_self: bool
) -> pa.Table:
    """Partial top-k for a MATRIX of query vectors: one matmul per batch
    covers every query (batched inference shape), then a per-query
    argpartition over the batch's rows."""
    q_ids, q_mat = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
    mat = _batch_matrix(batch)
    ids = batch[id_col].to_numpy()
    if ids.size == 0:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    qn = np.maximum(np.linalg.norm(q_mat, axis=1), 1e-30)
    cos = (mat @ q_mat.T) / (norms[:, None] * qn[None, :])  # (n, n_q)
    if exclude_self:
        cos[ids[:, None] == q_ids[None, :]] = -np.inf
    take = min(k, ids.size)
    # per-query deterministic local top-k (see _local_topk: a bare
    # argpartition keeps arbitrary tie subsets, layout-dependent)
    part = np.empty((take, q_ids.size), dtype=np.int64)
    for qi in range(q_ids.size):
        part[:, qi] = _local_topk(cos[:, qi], ids, take)
    qcol = np.repeat(q_ids, take)
    rows = part.T.ravel()
    vals = cos[rows, np.repeat(np.arange(q_ids.size), take)]
    keep = np.isfinite(vals)
    return pa.table(
        {
            "query_id": pa.array(qcol[keep], type=pa.int64()),
            id_col: pa.array(ids[rows][keep], type=pa.int64()),
            "cosine": pa.array(vals[keep], type=pa.float64()),
        }
    )


def cosine_topk_batch(
    emb_ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k for a batch of queries in one corpus pass.

    The query matrix is broadcast once; every corpus batch answers ALL
    queries with a single matmul — the batched form of
    :func:`cosine_topk` (N queries cost one pass, not N passes).  Ties
    break on ascending id per query."""
    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((q_ids, np.asarray(query_mat, dtype=np.float64)))
    partial = emb_ds.map_batches(
        _batch_topk_partial,
        fn_kwargs={
            "q_ref": q_ref,
            "k": k,
            "id_col": id_col,
            "exclude_self": exclude_self,
        },
        batch_format="pyarrow",
    )
    t = pa.concat_tables(
        [b for b in partial.iter_batches(batch_format="pyarrow")]
    )
    qc = t["query_id"].to_numpy()
    ids = t[id_col].to_numpy()
    cos = t["cosine"].to_numpy()
    out_q, out_i, out_c = [], [], []
    for q in q_ids:
        m = qc == q
        order = np.lexsort((ids[m], -cos[m]))[:k]
        out_q.append(np.full(order.size, q, dtype=np.int64))
        out_i.append(ids[m][order])
        out_c.append(np.round(cos[m][order], 6))
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_i)),
            "cosine": pa.array(np.concatenate(out_c)),
        }
    )


def _sample_ranks(ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64-style seeded finalizer: a bijective uint64 hash of the id
    — a deterministic uniform rank, independent of row/block order."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) + np.uint64(
            0x9E3779B97F4A7C15 * (seed + 1) & 0xFFFFFFFFFFFFFFFF
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def sample_embeddings(
    emb_ds: ray.data.Dataset, sample: int, *, id_col: str = "vec_id",
    seed: int = 3,
) -> np.ndarray:
    """Distributed deterministic sample of ``sample`` embedding rows: the
    rows with the globally smallest seeded id-hash ranks.

    Every batch keeps only its local smallest-``sample`` ranks (bounded
    partials), and the driver folds partial blocks into a running
    smallest-``sample`` buffer — peak driver memory is O(sample + one
    block), never O(corpus), and the selected set is independent of
    partitioning/row order (the rank is a pure function of the id).  This
    replaces a ``limit(sample)`` head sample, which drew only from the
    first block(s) and was unrepresentative of a sharded corpus."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        r = _sample_ranks(ids, seed)
        if r.size > sample:
            keep = np.argpartition(r, sample - 1)[:sample]
            ids, r = ids[keep], r[keep]
            batch = batch.take(pa.array(keep))
        return pa.table(
            {
                "rank": pa.array(r.view(np.int64)),
                "sid": pa.array(ids),
                "embedding": batch["embedding"],
            }
        )

    best_r: np.ndarray | None = None
    best_i: np.ndarray | None = None
    best_m: np.ndarray | None = None
    for b in emb_ds.select_columns([id_col, "embedding"]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        r = b["rank"].to_numpy().view(np.uint64)
        i = b["sid"].to_numpy().astype(np.int64)
        m = _batch_matrix(b)
        if best_r is not None:
            r = np.concatenate([best_r, r])
            i = np.concatenate([best_i, i])
            m = np.concatenate([best_m, m], axis=0)
        if r.size > sample:
            keep = np.argpartition(r, sample - 1)[:sample]
            r, i, m = r[keep], i[keep], m[keep]
        best_r, best_i, best_m = r, i, m
    if best_r is None:
        return np.zeros((0, 0), dtype=np.float64)
    # Order by id, not rank: deterministic, and when the corpus fits inside
    # ``sample`` it reproduces the ordering a sequential head-read would see
    # (so small-scale results are unchanged by the distributed selection).
    return best_m[np.argsort(best_i, kind="stable")]


def train_centroids(
    emb_ds: ray.data.Dataset, nlist: int | None, *, sample: int = 4096,
    iters: int = 8, seed: int = 3, spherical: bool = False,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Driver-side mini k-means over a bounded DISTRIBUTED sample
    (deterministic: the sample is the globally smallest seeded id-hash
    ranks, independent of partitioning — see :func:`sample_embeddings`).

    ``nlist=None`` scales the partition count with the corpus:
    ~sqrt(n_rows), clamped to [8, 65536] — the standard IVF sizing, giving
    ~sqrt(N) vectors per bucket so probe cost and bucket-scan cost balance.
    The sample grows to cover at least 32 vectors per centroid.

    ``spherical=True`` trains on L2-normalized vectors and renormalizes
    centroids each iteration — the right bucketing when downstream
    assignment/similarity is cosine rather than euclidean."""
    if nlist is None:
        n_rows = emb_ds.count()
        nlist = int(np.clip(np.sqrt(max(n_rows, 1)), 8, 65536))
    sample = max(sample, 32 * nlist)
    mat = sample_embeddings(emb_ds, sample, id_col=id_col, seed=seed)
    if mat.size == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if spherical:
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(mat.shape[0], size=min(nlist, mat.shape[0]), replace=False)]
    for _ in range(iters):
        assign = _nearest_centroid(mat, cent)
        # vectorized per-centroid means: sort-by-assignment + reduceat —
        # O(sample log sample + sample * dim), never an O(nlist * sample)
        # per-centroid Python mask loop
        order = np.argsort(assign, kind="stable")
        a_s = assign[order]
        starts = np.flatnonzero(
            np.concatenate(([True], a_s[1:] != a_s[:-1]))
        )
        sums = np.add.reduceat(mat[order], starts, axis=0)
        labels = a_s[starts]
        counts = np.diff(np.concatenate((starts, [a_s.size])))
        cent[labels] = sums / counts[:, None]
        if spherical:
            cent = cent / np.maximum(
                np.linalg.norm(cent, axis=1, keepdims=True), 1e-30
            )
    return cent


def _nearest_centroid(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 via the matmul identity ``-2 x @ C.T + ||c||^2``
    (the per-row ``||x||^2`` term is constant under the argmin): a
    (rows, nlist) score matrix, NEVER the (rows, nlist, dim) broadcast
    temp — which at standard IVF sizing (nlist=4096, dim=768) would be
    ~25 GB per 1024-row batch.  Rows are chunked so the score matrix stays
    <=128 MB even at the nlist=65536 clamp."""
    chunk = max(16, (1 << 24) // max(cent.shape[0], 1))
    c2 = (cent * cent).sum(axis=1)
    out = np.empty(mat.shape[0], dtype=np.int64)
    for s in range(0, mat.shape[0], chunk):
        block = mat[s : s + chunk]
        out[s : s + chunk] = (c2 - 2.0 * (block @ cent.T)).argmin(axis=1)
    return out


def assign_clusters(batch: pa.Table, *, cent_ref, id_col: str) -> pa.Table:
    cent = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    # strip parquet pandas metadata: a pa.Schema WITH metadata is
    # unhashable and Ray's unify_schemas then warns "Failed to hash the
    # schemas" in every reduce of the downstream cluster sort
    batch = batch.replace_schema_metadata(None)
    if batch.num_rows == 0:
        return batch.append_column("cluster", pa.array([], type=pa.int32()))
    mat = _batch_matrix(batch)
    return batch.append_column(
        "cluster", pa.array(_nearest_centroid(mat, cent).astype(np.int32))
    )


def ivf_topk(
    emb_ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    exclude: int | None = None,
) -> pa.Table:
    """IVF: probe only the nprobe nearest centroid partitions."""
    q = np.asarray(query_vec, dtype=np.float64)
    cent = train_centroids(emb_ds, nlist, id_col=id_col)
    cent_ref = ray.put(cent)
    assigned = emb_ds.map_batches(
        assign_clusters,
        fn_kwargs={"cent_ref": cent_ref, "id_col": id_col},
        batch_format="pyarrow",
    )
    probe = np.argsort(((cent - q) ** 2).sum(axis=1))[: min(nprobe, cent.shape[0])]
    import pyarrow.compute as pc

    probe_set = pa.array(probe.astype(np.int32))
    probed = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b["cluster"], value_set=probe_set)),
        batch_format="pyarrow",
    )
    return cosine_topk(probed, q, k, id_col=id_col, exclude=exclude)


def _lsh_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n_rows, n_tables) uint64 bucket codes: sign bits of the projections
    onto each table's hyperplanes."""
    # mat (n, d) x planes (tables, planes, d) -> (tables, n, planes)
    proj = np.einsum("nd,tpd->tnp", mat, planes)
    bits = (proj > 0).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(planes.shape[1], dtype=np.uint64))
    return (bits * weights).sum(axis=2).T  # (n, tables)


def _probe_codes(code: int, n_planes: int, max_hamming: int) -> np.ndarray:
    """All bucket codes within ``max_hamming`` bit flips of ``code``."""
    from itertools import combinations

    out = [code]
    for h in range(1, max_hamming + 1):
        for flip in combinations(range(n_planes), h):
            c = code
            for b in flip:
                c ^= 1 << b
            out.append(c)
    return np.unique(np.array(out, dtype=np.uint64))


def lsh_topk(
    emb_ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    n_planes: int = 12,
    n_tables: int = 4,
    probe_hamming: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    exclude: int | None = None,
) -> pa.Table:
    """Random-hyperplane LSH top-k — the bucketed alternative to IVF.

    Seeded hyperplanes give every vector ``n_tables`` sign-bit bucket
    codes; a row is a CANDIDATE when any of its codes falls in the
    query's probe set (its own buckets plus all codes within
    ``probe_hamming`` bit flips, per table).  Candidates get exact cosine
    within their batch (tiny per-batch top-k partials, bounded merge) —
    so the corpus pass reads every row but does the expensive math only on
    the candidate fraction; no shuffle, no training step (vs IVF's
    k-means), deterministic for a fixed seed.  ``probe_hamming ==
    n_planes`` probes every bucket and degenerates to exact brute force
    (asserted in tests, mirroring ``ivf_topk``'s full-probe identity).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    rng = np.random.default_rng(seed)
    dim = q.size
    planes = rng.normal(size=(n_tables, n_planes, dim))
    q_codes = _lsh_codes(q[None, :], planes)[0]  # (tables,)
    probe = [
        _probe_codes(int(c), n_planes, probe_hamming) for c in q_codes
    ]
    bcast = ray.put((q, planes, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qv, pl, pr = ray.get(bcast) if isinstance(bcast, ray.ObjectRef) else bcast
        mat = _batch_matrix(batch)
        ids = batch[id_col].to_numpy()
        if exclude is not None:
            keep = ids != exclude
            mat, ids = mat[keep], ids[keep]
        if ids.size == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        codes = _lsh_codes(mat, pl)  # (n, tables)
        cand = np.zeros(ids.size, dtype=bool)
        for t in range(codes.shape[1]):
            idx = np.searchsorted(pr[t], codes[:, t])
            idx[idx == pr[t].size] = 0
            cand |= pr[t][idx] == codes[:, t]
        if not cand.any():
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        mat, ids = mat[cand], ids[cand]
        cos = (mat @ qv) / np.maximum(
            np.linalg.norm(mat, axis=1) * np.linalg.norm(qv), 1e-30
        )
        take = min(k, cos.size)
        part = np.argpartition(-cos, take - 1)[:take]
        return pa.table(
            {
                id_col: pa.array(ids[part], type=pa.int64()),
                "cosine": pa.array(cos[part], type=pa.float64()),
            }
        )

    rows = emb_ds.map_batches(partial, batch_format="pyarrow").take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    cos = np.array([r["cosine"] for r in rows], dtype=np.float64)
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order]),
            "cosine": pa.array(np.round(cos[order], 6)),
        }
    )


# ---------------------------------------------------------------------------
# distributed PCA (dimensionality reduction for embedding storage)


def pca_fit(
    emb_ds: ray.data.Dataset, n_components: int, col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, int]:
    """(mean, components, n) of a PCA fit over the embedding column.

    Two-moment combine: each batch contributes ``(sum, X^T X, count)`` —
    dim- and dim^2-sized partials independent of batch row count — which a
    native Sum aggregate over flattened moment rows reduces; the driver
    eigendecomposes the dim x dim covariance (embedding dims are hundreds
    to low thousands: the dim^2 driver work is constant in the corpus).
    Components carry a deterministic sign convention (the largest-|.|
    coordinate of each component is positive), so the fit is
    partitioning-independent.
    """

    def moments(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, col)
        if x.shape[0] == 0:  # empty block: contributes nothing
            return pa.table(
                {
                    "i": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.float64()),
                }
            )
        d = x.shape[1]
        s = x.sum(axis=0)
        g = x.T @ x
        row = np.concatenate(([float(x.shape[0])], s, g.ravel()))
        return pa.table(
            {
                "i": pa.array(np.arange(row.size, dtype=np.int64)),
                "v": pa.array(row),
            }
        )

    agg = (
        emb_ds.map_batches(moments, batch_format="pyarrow")
        .groupby("i")
        .sum("v")
        .take_all()
    )  # 1 + d + d^2 rows — dimension-sized, never corpus-sized
    flat = np.empty(len(agg))
    for r in agg:
        flat[r["i"]] = r["sum(v)"]
    n = int(flat[0])
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n}")
    d = int(round((np.sqrt(4 * (flat.size - 1) + 1) - 1) / 2))
    s, g = flat[1 : 1 + d], flat[1 + d :].reshape(d, d)
    if n_components < 1 or n_components > d:
        raise ValueError(f"n_components must be in [1, {d}], got {n_components}")
    mean = s / n
    cov = (g - np.outer(s, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (n_components, d)
    # deterministic sign: flip so each component's largest-|.| coord is +
    flips = np.sign(comps[np.arange(comps.shape[0]), np.abs(comps).argmax(axis=1)])
    comps *= flips[:, None]
    return mean, comps, n


def pca_project(
    emb_ds: ray.data.Dataset,
    n_components: int,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """``(id_col, projection: list<float64>)`` — each vector centered and
    projected onto the top principal components.  The fit is one
    moment-combine pass; the projection is a second map-only pass against
    the broadcast ``(mean, components)`` pair."""
    mean, comps, _n = pca_fit(emb_ds, n_components, col)
    ref = ray.put((mean, comps))

    def project(batch: pa.Table, *, pr) -> pa.Table:
        m, c = ray.get(pr) if isinstance(pr, ray.ObjectRef) else pr
        x = _batch_matrix(batch, col)
        if x.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "projection": pa.array(
                        [], type=pa.list_(pa.float64())
                    ),
                }
            )
        y = (x - m) @ c.T
        off = np.arange(
            0, (y.shape[0] + 1) * y.shape[1], y.shape[1], dtype=np.int32
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "projection": pa.ListArray.from_arrays(
                    pa.array(off), pa.array(y.ravel())
                ),
            }
        )

    return emb_ds.map_batches(
        project, fn_kwargs={"pr": ref}, batch_format="pyarrow"
    )
