"""Deduplication operators for training-data pipelines.

Four families over the ``documents`` table, each expressed Ray-Data-first:

- exact: hash-partition on the full text, keep the lowest doc_id per group
  (one ``groupby`` shuffle; SQL-oracle-checkable);
- MinHash + LSH: shingle -> vectorized minhash signatures -> band buckets ->
  ``groupby(bucket)`` candidate pairs -> exact-Jaccard verification;
- SimHash: 64-bit weighted token hash, candidate pairs via 16-bit band
  buckets within Hamming distance;
- n-gram Jaccard: exact similarity for a candidate pair set.

Scale notes: candidate generation is shuffle-based (buckets are the group
key) so no stage ever holds all pairs; verification is a hash join of the
pair list against the corpus on doc_id (``verify_jaccard`` — candidate
texts travel through the shuffle, never the driver); verified pairs resolve
to transitive clusters via ``connected_components`` (driver union-find over
the bounded pair set) or ``connected_components_distributed`` (min-label
propagation) beyond that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from .textstats import _tokens

# Mersenne prime 2^31 - 1: with a,b,h < 2^31 every a*h+b fits uint64, so the
# minhash permutations are exact pure-numpy uint64 arithmetic — an earlier
# 2^61-1 modulus forced object-dtype bigint multiplies (~50x slower)
_MERSENNE = (1 << 31) - 1


def _text_hash_cols(batch: pa.Table) -> pa.Table:
    """(h1, h2): the text's 128-bit blake2b as two int64 columns —
    collision probability ~2^-128, so grouping on it is exact dedup
    without ever shuffling text bytes."""
    import hashlib

    n = batch.num_rows
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    for i, t in enumerate(batch["text"].to_pylist()):
        d = hashlib.blake2b(t.encode(), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return batch.append_column(
        "h1", pa.array(h1.view(np.int64))
    ).append_column("h2", pa.array(h2.view(np.int64)))


def exact_dedup(docs_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per distinct text: surviving (minimum) doc_id + copy count.

    Groups on the 128-bit content hash, not the text itself: the shuffle
    exchanges (h1, h2, doc_id) rows — 24 bytes per doc regardless of
    document size — instead of moving the corpus bytes as group keys."""
    hashed = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _text_hash_cols, batch_format="pyarrow"
    ).map_batches(
        lambda b: b.select(["h1", "h2", "doc_id"]), batch_format="pyarrow"
    )
    g = hashed.groupby(["h1", "h2"]).aggregate(Min("doc_id"), Count())
    return g.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["min(doc_id)"],
                "n_copies": b["count()"],
            }
        ),
        batch_format="pyarrow",
    )


def exact_dedup_normalized(docs_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Whitespace/punctuation-insensitive exact dedup: groups on the
    order-sensitive token-stream fingerprint (textstats.doc_fingerprint),
    so "Hello,  world!" and "hello world" collapse while genuinely
    different token streams never do (modulo the 61-bit rolling hash).
    Same shuffle shape as :func:`exact_dedup`: only (fingerprint, doc_id)
    rows move."""
    from .textstats import doc_fingerprint

    fp = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        doc_fingerprint, batch_format="pyarrow"
    )
    g = fp.groupby("fingerprint").aggregate(Min("doc_id"), Count())
    return g.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["min(doc_id)"],
                "n_copies": b["count()"],
            }
        ),
        batch_format="pyarrow",
    )


_POLY_B = np.uint64(1099511628211)  # FNV prime; uint64 wraparound is the mix


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique k-token shingle hashes, vectorized: one crc per TOKEN, then a
    rolling polynomial over token-hash windows — no per-shingle string
    joins (hashing the joined strings cost k x more hash work)."""
    import zlib

    toks = _tokens(text)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
    if len(toks) < k:
        h = np.uint64(0)
        for v in th:
            h = h * _POLY_B + v
        return np.array([h], dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(th, k)
    powers = _POLY_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def _shingles(text: str, k: int) -> set[int]:
    """Set view of :func:`_shingle_hashes` (tests / set algebra)."""
    return set(_shingle_hashes(text, k).tolist())


def _perm_params(num_perm: int, seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    batch: pa.Table, *, num_perm: int, shingle_k: int
) -> pa.Table:
    """Vectorized minhash: for each doc, sig_i = min over shingles of
    (a_i * h + b_i) mod M."""
    a, b = _perm_params(num_perm)
    sigs = np.full((batch.num_rows, num_perm), _MERSENNE, dtype=np.int64)
    for r, text in enumerate(batch["text"].to_pylist()):
        sh = _shingle_hashes(text, shingle_k) % np.uint64(_MERSENNE)
        if sh.size == 0:
            continue
        # (num_perm, n_shingles) -> min along shingles; exact in uint64
        vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        sigs[r] = vals.min(axis=1).astype(np.int64)
    off = np.arange(0, (batch.num_rows + 1) * num_perm, num_perm, dtype=np.int32)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "sig": pa.ListArray.from_arrays(pa.array(off), pa.array(sigs.ravel())),
        }
    )


N_SHUFFLE_PARTS = 64  # coarse hash partitions for the bucket shuffle


def band_buckets(batch: pa.Table, *, bands: int) -> pa.Table:
    """Explode each signature into (band, bucket_hash, doc_id) rows, plus
    the coarse shuffle-partition key ``part = hash(band,bucket) % P``.

    Fully vectorized: the fixed-width signature column is reshaped to
    ``(n_docs, bands, rows_per_band)`` and each band row is folded into one
    64-bit polynomial hash with ``rows_per_band`` vector ops — no Python
    loop over docs or bands.  Bucket equality <=> band equality (collision
    probability ~2^-64 per bucket)."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "band": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int32()),
            }
        )
    sig_col = batch["sig"].combine_chunks()
    flat = sig_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    num_perm = flat.size // n
    r = num_perm // bands
    sigs = flat.view(np.uint64).reshape(n, bands, r)
    with np.errstate(over="ignore"):
        h = np.zeros((n, bands), dtype=np.uint64)
        for j in range(r):
            h = h * _POLY_B + sigs[:, :, j]
    bucket = h.view(np.int64).ravel()  # row-major: doc-major, band-minor
    band = np.tile(np.arange(bands, dtype=np.int32), n)
    doc = np.repeat(batch["doc_id"].to_numpy(), bands)
    with np.errstate(over="ignore"):
        part = ((bucket * 1_000_003 + band) % N_SHUFFLE_PARTS).astype(np.int32)
    return pa.table(
        {
            "band": pa.array(band),
            "bucket": pa.array(bucket),
            "doc_id": pa.array(doc, type=pa.int64()),
            "part": pa.array(part),
        }
    )


def _pairs_from_partition(group: pa.Table) -> pa.Table:
    """One shuffle partition (MANY buckets) -> candidate pairs, vectorized.

    Grouping on a coarse partition key instead of per-bucket keeps the
    shuffle semantics but avoids a Python callback per (band, bucket) group
    — the per-group overhead, not the pair math, dominated the old
    ``groupby(band, bucket).map_groups`` formulation."""
    band = group["band"].to_numpy()
    bucket = group["bucket"].to_numpy()
    doc = group["doc_id"].to_numpy()
    order = np.lexsort((doc, bucket, band))
    band, bucket, doc = band[order], bucket[order], doc[order]
    change = np.flatnonzero((np.diff(band) != 0) | (np.diff(bucket) != 0)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [doc.size]))
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        iu, ju = np.triu_indices(n, 1)
        a_out.append(doc[s + iu])
        b_out.append(doc[s + ju])
    a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
    b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
    return pa.table(
        {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
    )


def _dedup_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """A pair found in several buckets collapses to one row (native hash
    aggregate, not a per-group Python callback)."""
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Count())
        .map_batches(
            lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow"
        )
    )


def minhash_lsh_pairs(
    docs_ds: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs (doc_a < doc_b), deduplicated."""
    sigs = docs_ds.map_batches(
        minhash_signatures,
        fn_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
    )
    buckets = sigs.map_batches(
        band_buckets, fn_kwargs={"bands": bands}, batch_format="pyarrow"
    )
    pairs = buckets.groupby("part").map_groups(
        _pairs_from_partition, batch_format="pyarrow"
    )
    return _dedup_pairs(pairs)


@ray.remote
def _block_num_rows(t: pa.Table) -> int:
    return t.num_rows


def _nonempty_block_refs(ds: ray.data.Dataset) -> list:
    """Refs of ``ds``'s non-empty blocks.

    Ray's sort-based aggregate can emit EMPTY ZERO-COLUMN blocks, and
    map_batches never invokes the UDF on empty blocks (so the schema cannot
    be repaired in-stream); ``Dataset.join`` then fails with "No match for
    key field" when such a block — or a fully empty input — reaches an
    aggregator.  Row counts are checked in tasks next to the blocks (refs
    only on the driver); the cost is an execution barrier on ``ds``, which
    a join forces anyway."""
    refs = ds.to_arrow_refs()
    nrows = ray.get([_block_num_rows.remote(r) for r in refs])
    return [r for r, n in zip(refs, nrows) if n]


def verify_jaccard(
    pairs_ds: ray.data.Dataset,
    docs_ds: ray.data.Dataset,
    *,
    shingle_k: int = 3,
    threshold: float = 0.7,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact word-shingle Jaccard for each candidate pair; keeps pairs at or
    above ``threshold``.

    Distributed as two hash joins of the pair list against the corpus on
    doc_id (``Dataset.join``): candidate texts travel through the shuffle,
    never through the driver — no corpus-sized broadcast, no stage whose
    memory grows with the number of documents.  Only candidate docs'
    texts are ever moved (the join is inner on the pair side).

    ``num_partitions`` defaults to cluster_CPUs // 16 per join: aggregator
    actor spin-up dominates below millions of candidate pairs (measured:
    2 partitions verify the same pair set ~1.5x faster than 8 on 32 CPUs),
    both joins' actor pools coexist in one streaming DAG, and oversizing
    them deadlocks scheduling on small clusters.  Size it to the candidate
    pair volume when calling at real scale."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 16)
    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
    )
    pair_refs = _nonempty_block_refs(pairs_ds)
    doc_refs = _nonempty_block_refs(docs_ds.select_columns(["doc_id", "text"]))
    if not pair_refs or not doc_refs:
        # the join operator cannot take a fully empty side; an empty
        # candidate set (or corpus) verifies to an empty pair set
        return ray.data.from_arrow(out_schema.empty_table())
    docs_sel = ray.data.from_arrow_refs(doc_refs)
    j = ray.data.from_arrow_refs(pair_refs)
    for side in ("a", "b"):
        # the hash join drops the right key column; only "text" needs a
        # side-specific name before the second join adds its twin.  The
        # join's own empty output partitions are zero-column blocks too, so
        # normalize again before the second join (see _drop_empty_blocks).
        j = j.join(
            docs_sel,
            join_type="inner",
            num_partitions=num_partitions,
            on=(f"doc_{side}",),
            right_on=("doc_id",),
        ).map_batches(
            lambda b, side=side: b.rename_columns(
                [f"text_{side}" if c == "text" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        if side == "a":
            mid_refs = _nonempty_block_refs(j)
            if not mid_refs:  # no candidate doc_a survived the inner join
                return ray.data.from_arrow(out_schema.empty_table())
            j = ray.data.from_arrow_refs(mid_refs)

    def verify(batch: pa.Table) -> pa.Table:
        jac = np.empty(batch.num_rows, dtype=np.float64)
        for i, (ta, tb) in enumerate(
            zip(batch["text_a"].to_pylist(), batch["text_b"].to_pylist())
        ):
            sa = _shingle_hashes(ta, shingle_k)
            sb = _shingle_hashes(tb, shingle_k)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac[i] = inter / union if union else 0.0
        t = pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "jaccard": pa.array(np.round(jac, 6), type=pa.float64()),
            }
        )
        return t.filter(pa.compute.field("jaccard") >= threshold)

    return j.map_batches(verify, batch_format="pyarrow")


def _group_cosine_pairs(
    group: pa.Table, *, threshold: float, id_col: str, round_to: int
) -> pa.Table:
    """All (a < b) pairs within one cluster group at/above threshold.

    Per-vector normalization is independent of the group, so cosines are
    bit-identical to the all-pairs baseline for any pair the buckets
    surface."""
    ids = group[id_col].to_numpy()
    flat = (
        group["embedding"].combine_chunks().flatten()
        .to_numpy(zero_copy_only=False).astype(np.float64)
    )
    mat = flat.reshape(ids.size, -1)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    cos = mat @ mat.T
    keep = (cos >= threshold) & (ids[:, None] < ids[None, :])
    r, c = np.nonzero(keep)
    return pa.table(
        {
            "vec_a": pa.array(ids[r], type=pa.int64()),
            "vec_b": pa.array(ids[c], type=pa.int64()),
            "cosine": pa.array(np.round(cos[r, c], round_to), type=pa.float64()),
        }
    )


def connected_components(
    pairs_ds: ray.data.Dataset, *, a_col: str = "doc_a", b_col: str = "doc_b"
) -> ray.data.Dataset:
    """Near-duplicate pairs -> duplicate CLUSTERS: (doc_id, cluster_id)
    for every doc appearing in a pair, cluster_id = the minimum doc_id
    reachable through the pair graph (so the cluster survivor under
    min-id policy is the row where doc_id == cluster_id).

    Union-find over the STREAMED pair batches on the driver: state is
    O(distinct docs in pairs) — the near-duplicate set, orders of
    magnitude smaller than the corpus, never the corpus itself (the
    guide's "union-find on the driver only if the candidate set is
    provably small" case).  At a pair volume where even that breaks,
    the same contract is computed distributed with O(log n) rounds of
    large-star/small-star min-label propagation (an iterated
    groupby(node).min(label)); the output schema is unchanged."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for batch in pairs_ds.select_columns([a_col, b_col]).iter_batches(
        batch_format="pyarrow"
    ):
        for a, b in zip(batch[a_col].to_pylist(), batch[b_col].to_pylist()):
            ra = find(parent.setdefault(a, a))
            rb = find(parent.setdefault(b, b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)  # min-id becomes the root
    nodes = np.array(sorted(parent), dtype=np.int64)
    labels = np.array([find(int(n)) for n in nodes], dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(nodes),
                "cluster_id": pa.array(labels),
            }
        )
    )


def connected_components_distributed(
    pairs_ds: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 50,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed form of :func:`connected_components` — min-label
    propagation, for pair graphs too large for driver union-find.

    State is two Datasets: the (bidirectional) edge list and a
    (node, label) table initialized to ``min(node, nearest neighbor)``.
    Each round joins labels onto edge destinations, propagates the
    neighbor's label to the source, and takes the per-node min; labels
    only decrease, so an unchanged label SUM is convergence.  Rounds
    needed = graph diameter in the worst case (near-dup components are
    shallow in practice); every round's join inputs are rebuilt without
    Ray's zero-column empty blocks (see :func:`_nonempty_block_refs`)."""
    from ray.data.aggregate import Min

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 16)

    def both_dirs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [b[a_col].combine_chunks(), b[b_col].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [b[b_col].combine_chunks(), b[a_col].combine_chunks()]
                ),
            }
        )

    edge_refs = _nonempty_block_refs(
        pairs_ds.map_batches(both_dirs, batch_format="pyarrow")
    )
    empty = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    if not edge_refs:
        return ray.data.from_arrow(empty.empty_table())
    edges = ray.data.from_arrow_refs(edge_refs).materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        lab = np.minimum(b["src"].to_numpy(), b["min(dst)"].to_numpy())
        return pa.table(
            {"node": b["src"], "label": pa.array(lab, type=pa.int64())}
        )

    labels = edges.groupby("src").aggregate(Min("dst")).map_batches(
        init_labels, batch_format="pyarrow"
    )
    prev_sum = None
    for _round in range(max_rounds):
        label_refs = _nonempty_block_refs(labels)
        labels = ray.data.from_arrow_refs(label_refs).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        msgs = edges.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b["src"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label"))
            .map_batches(
                lambda b: pa.table(
                    {"node": b["node"], "label": b["min(label)"]}
                ),
                batch_format="pyarrow",
            )
        )
    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b["node"], "cluster_id": b["label"]}
        ),
        batch_format="pyarrow",
    )


def embedding_cosine_pairs(
    emb_ds: ray.data.Dataset,
    threshold: float,
    *,
    id_col: str = "vec_id",
    round_to: int = 6,
    nlist: int = 16,
    assign_k: int = 4,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs via IVF buckets — the primary,
    scale-shaped path.

    Each vector is assigned to its ``assign_k`` nearest of ``nlist``
    k-means centroids (bounded driver-side training, extras/ann.py), the
    exploded (cluster, vec) rows shuffle once on cluster, and each cluster
    group generates its exact-cosine pairs locally; a final (vec_a, vec_b)
    groupby collapses pairs found in several shared clusters.  No stage
    materializes the corpus on the driver and no broadcast has to hold the
    full matrix — compute is O(sum of cluster sizes squared) instead of
    O(N^2).

    A pair is found iff the two vectors share at least one of their
    ``assign_k`` clusters, so recall < 1 is possible for pairs straddling
    bucket boundaries; tests assert recall == 1.0 vs the all-pairs baseline
    (:func:`embedding_cosine_pairs_allpairs`) at sandbox scale, and the
    driver's exact SQL oracle enforces the same.  Raise ``assign_k``
    (towards ``nlist``) to trade compute for recall."""
    from . import ann

    cent = ann.train_centroids(emb_ds, nlist, spherical=True)
    if cent.shape[0] == 0:  # empty corpus: no centroids, no pairs
        return ray.data.from_arrow(
            pa.schema(
                [("vec_a", pa.int64()), ("vec_b", pa.int64()),
                 ("cosine", pa.float64())]
            ).empty_table()
        )
    cent_ref = ray.put(cent)
    k = min(assign_k, cent.shape[0])

    def explode_assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        ids = batch[id_col].to_numpy()
        flat = (
            batch["embedding"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.float64)
        )
        mat = flat.reshape(ids.size, -1)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        # spherical assignment: nearest centroids by cosine (centroids are
        # unit-norm, so max dot == min angle)
        near = np.argpartition(-(mat @ c.T), k - 1, axis=1)[:, :k].astype(
            np.int32
        )
        n = ids.size
        rep = np.repeat(np.arange(n), k)
        return pa.table(
            {
                "cluster": pa.array(near.ravel()),
                id_col: pa.array(ids[rep], type=pa.int64()),
                "embedding": batch["embedding"].take(pa.array(rep)),
            }
        )

    exploded = emb_ds.select_columns([id_col, "embedding"]).map_batches(
        explode_assign, batch_format="pyarrow"
    )
    pairs = exploded.groupby("cluster").map_groups(
        lambda g: _group_cosine_pairs(
            g, threshold=threshold, id_col=id_col, round_to=round_to
        ),
        batch_format="pyarrow",
    )
    return (
        pairs.groupby(["vec_a", "vec_b"])
        .aggregate(Min("cosine"))
        .map_batches(
            lambda b: pa.table(
                {
                    "vec_a": b["vec_a"],
                    "vec_b": b["vec_b"],
                    "cosine": b["min(cosine)"],
                }
            ),
            batch_format="pyarrow",
        )
    )


def embedding_cosine_pairs_allpairs(
    emb_ds: ray.data.Dataset,
    threshold: float,
    *,
    id_col: str = "vec_id",
    round_to: int = 6,
) -> ray.data.Dataset:
    """Exact all-pairs baseline: batch-x-broadcast matmuls over a
    driver-materialized corpus matrix.  O(N^2) compute and the broadcast
    must fit worker memory — kept ONLY as the small-scale oracle/recall
    reference for :func:`embedding_cosine_pairs`; never the serving path."""
    t = pa.concat_tables(
        [b for b in emb_ds.select_columns([id_col, "embedding"]).iter_batches(
            batch_format="pyarrow"
        )]
    )
    ids = t[id_col].to_numpy()
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        b_ids = batch[id_col].to_numpy()
        b_mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        b_mat /= np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-30)
        cos = b_mat @ all_mat.T
        keep = (cos >= threshold) & (b_ids[:, None] < all_ids[None, :])
        r, c = np.nonzero(keep)
        return pa.table(
            {
                "vec_a": pa.array(b_ids[r], type=pa.int64()),
                "vec_b": pa.array(all_ids[c], type=pa.int64()),
                "cosine": pa.array(np.round(cos[r, c], round_to), type=pa.float64()),
            }
        )

    return emb_ds.map_batches(pairs, batch_format="pyarrow")


# SimHash token hash: 64-bit char polynomial + a splitmix64-style finalizer.
# The multipliers keep their top bit CLEAR so the DuckDB oracle can mirror
# every step with HUGEINT modular arithmetic ((2^64-1) * (2^63-1) < 2^127,
# no 128-bit overflow); numpy uint64 wraparound gives the identical values
# here.  Bit diffusion measured ~0.47..0.52 per bit over a 2k vocabulary.
_SM_ADD = np.uint64(0x9E3779B97F4A7C15)
_SM_MUL1 = np.uint64(0x3F58476D1CE4E5B9)
_SM_MUL2 = np.uint64(0x14D049BB133111EB)
_U64 = 0xFFFFFFFFFFFFFFFF

_CHARPOLY_MEMO: dict[str, int] = {}


def _char_poly64(tok: str) -> int:
    h = _CHARPOLY_MEMO.get(tok)
    if h is None:
        h = 0
        for c in tok:
            h = (h * 31 + ord(c)) & _U64
        _CHARPOLY_MEMO[tok] = h
    return h


def _token_hashes64(toks: list[str]) -> np.ndarray:
    """Vectorized finalize over the per-token char polynomials."""
    with np.errstate(over="ignore"):
        z = np.fromiter(
            (_char_poly64(t) for t in toks), dtype=np.uint64, count=len(toks)
        )
        z = z + _SM_ADD
        z ^= z >> np.uint64(30)
        z = z * _SM_MUL1
        z ^= z >> np.uint64(27)
        z = z * _SM_MUL2
        z ^= z >> np.uint64(31)
    return z


def _token_hash64(tok: str) -> np.uint64:
    return _token_hashes64([tok])[0]


def simhash_signatures(batch: pa.Table, *, bits: int = 64) -> pa.Table:
    """Classic SimHash over token unigrams weighted by tf.

    Per doc: Counter for tfs (one pass), then one (n_distinct, bits) matrix
    accumulation — no per-token Python inner loop and no O(L^2) rescans.
    Signatures are stored biased by -2^63 as int64 (order-preserving; the
    top-bit flip cancels in every XOR/Hamming computation downstream)."""
    from collections import Counter

    shifts = np.arange(bits, dtype=np.uint64)
    out = np.empty(batch.num_rows, dtype=np.int64)
    for r, text in enumerate(batch["text"].to_pylist()):
        cnt = Counter(_tokens(text))
        if not cnt:
            out[r] = -(1 << 63)
            continue
        tfs = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
        hs = _token_hashes64(list(cnt.keys()))
        bitm = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((2 * bitm - 1) * tfs[:, None]).sum(axis=0)
        sig = int(np.bitwise_or.reduce((acc > 0).astype(np.uint64) << shifts))
        out[r] = sig - (1 << 63)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(out, type=pa.int64()),
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no bitwise_count)."""
    b = np.unpackbits(x.view(np.uint8))
    return b.reshape(-1, 64).sum(axis=1).astype(np.int32)


def simhash_candidate_pairs(
    docs_ds: ray.data.Dataset, *, max_hamming: int = 3
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: bucket on each of the four 16-bit bands
    (any pair within Hamming distance 3 of a 64-bit hash agrees exactly on
    at least one band), then verify the Hamming distance.  Same coarse-
    partition shuffle as MinHash (see ``_pairs_from_partition``)."""
    sigs = docs_ds.map_batches(simhash_signatures, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        sh = batch["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        bands_out, bucket_out, doc_out, sig_out = [], [], [], []
        for bi in range(4):
            bucket = (sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            bands_out.append(np.full(doc.size, bi, dtype=np.int32))
            bucket_out.append(bucket.astype(np.int64))
            doc_out.append(doc)
            sig_out.append(sh.view(np.int64))
        band = np.concatenate(bands_out)
        bucket = np.concatenate(bucket_out)
        return pa.table(
            {
                "band": pa.array(band),
                "bucket": pa.array(bucket),
                "doc_id": pa.array(np.concatenate(doc_out)),
                "simhash": pa.array(np.concatenate(sig_out)),
                "part": pa.array(
                    ((bucket * 1_000_003 + band) % N_SHUFFLE_PARTS).astype(
                        np.int32
                    )
                ),
            }
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        band = group["band"].to_numpy()
        bucket = group["bucket"].to_numpy()
        doc = group["doc_id"].to_numpy()
        sig = group["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        order = np.lexsort((doc, bucket, band))
        band, bucket, doc, sig = band[order], bucket[order], doc[order], sig[order]
        change = np.flatnonzero((np.diff(band) != 0) | (np.diff(bucket) != 0)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [doc.size]))
        a_out, b_out, h_out = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, 1)
            ham = _popcount64(sig[s + iu] ^ sig[s + ju])
            keep = ham <= max_hamming
            a_out.append(doc[s + iu[keep]])
            b_out.append(doc[s + ju[keep]])
            h_out.append(ham[keep])
        a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        h = np.concatenate(h_out) if h_out else np.empty(0, np.int32)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(h, type=pa.int32()),
            }
        )

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pyarrow")
    )
    from ray.data.aggregate import Min

    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming"))
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_a": b["doc_a"],
                    "doc_b": b["doc_b"],
                    "hamming": b["min(hamming)"].cast(pa.int32()),
                }
            ),
            batch_format="pyarrow",
        )
    )
