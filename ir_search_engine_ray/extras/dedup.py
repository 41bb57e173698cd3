"""Deduplication operators for training-data pipelines.

Four families over the ``documents`` table, each expressed Ray-Data-first:

- exact: hash-partition on the full text, keep the lowest doc_id per group
  (one ``groupby`` shuffle; SQL-oracle-checkable);
- MinHash + LSH: shingle -> vectorized minhash signatures -> band buckets ->
  ``groupby(bucket)`` candidate pairs -> exact-Jaccard verification;
- SimHash: 64-bit weighted token hash, candidate pairs via 16-bit band
  buckets within Hamming distance;
- n-gram Jaccard: exact similarity for a candidate pair set
  (``verify_jaccard``), and a standalone EXACT similarity self-join
  (``ngram_jaccard_pairs``) whose prefix-filter candidates are
  recall-1.0 by construction — no LSH parameters.

Scale notes: candidate generation is shuffle-based (buckets are the group
key) so no stage ever holds all pairs; verification auto-picks its
strategy from the candidate count (``verify_jaccard`` — a bounded
broadcast small-side join below ``BROADCAST_PAIRS_MAX``, a partition-
tagged sort-shuffle co-location above it); verified pairs resolve to
transitive clusters via ``connected_components`` (driver union-find over
the bounded pair set) or ``connected_components_distributed`` (min-label
propagation) beyond that; set-difference filters (curate's near-dup drop)
are the distributed ``anti_join_ids``.
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
    # schema metadata (parquet reads carry pandas metadata) makes the
    # schema unhashable, and Ray's unify_schemas then logs "Failed to hash
    # the schemas" on every downstream groupby reduce — strip it here,
    # where batches enter the dedup shuffles
    batch = batch.replace_schema_metadata(None)
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


def export_content_hashes(docs_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(h1, h2) 128-bit content hashes of a corpus — the persistable
    baseline for :func:`exact_dedup_against`.  24 bytes per doc, so a
    100 TB corpus's hash set is a few TB of parquet that incremental
    ingests scan instead of the corpus itself."""
    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(_text_hash_cols, batch_format="pyarrow")
        .map_batches(lambda b: b.select(["h1", "h2"]), batch_format="pyarrow")
    )


def _h_rows_view(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(n,) structured view over two int64 columns for exact 128-bit set
    ops (np.isin / np.unique over pairs without tuple boxing)."""
    a = np.ascontiguousarray(np.stack([h1, h2], axis=1))
    return a.view([("a", np.int64), ("b", np.int64)]).reshape(-1)


def _hash_tagged_union(
    new_docs_ds: ray.data.Dataset,
    baseline_hashes_ds: ray.data.Dataset,
    P: int,
) -> ray.data.Dataset:
    """(h1, h2, doc_id, part) rows co-partitioning a new shard's content
    hashes (real doc_ids) with a baseline hash export (doc_id = -1) on
    the 128-bit hash — the shared scaffolding of
    :func:`exact_dedup_against` and :func:`ids_in_baseline`; each
    supplies only its per-partition kernel."""
    hashed = (
        new_docs_ds.select_columns(["doc_id", "text"])
        .map_batches(_text_hash_cols, batch_format="pyarrow")
        .map_batches(
            lambda b: b.select(["h1", "h2", "doc_id"]), batch_format="pyarrow"
        )
    )

    def _part(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (
                (h1.view(np.uint64) * np.uint64(1_000_003) + h2.view(np.uint64))
                % np.uint64(P)
            ).astype(np.int32)

    def tag(is_baseline: bool):
        def f(b: pa.Table) -> pa.Table:
            b = b.replace_schema_metadata(None)
            h1 = b["h1"].to_numpy()
            h2 = b["h2"].to_numpy()
            doc = (
                pa.array(np.full(len(h1), -1, dtype=np.int64))
                if is_baseline
                else b["doc_id"].cast(pa.int64())
            )
            return pa.table(
                {
                    "h1": pa.array(h1),
                    "h2": pa.array(h2),
                    "doc_id": doc,
                    "part": pa.array(_part(h1, h2)),
                }
            )

        return f

    return hashed.map_batches(tag(False), batch_format="pyarrow").union(
        baseline_hashes_ds.map_batches(tag(True), batch_format="pyarrow")
    )


def exact_dedup_against(
    new_docs_ds: ray.data.Dataset,
    baseline_hashes_ds: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Incremental exact dedup: survivors of a NEW shard against an
    already-ingested corpus — (doc_id, n_copies) for each distinct new
    text whose 128-bit content hash appears NOWHERE in the baseline hash
    set, with the minimum doc_id surviving within the shard (same
    semantics as :func:`exact_dedup` restricted to unseen content).

    The baseline is a (h1, h2) dataset (:func:`export_content_hashes`,
    typically persisted parquet), so the old corpus is never re-read or
    re-shuffled: both sides hash-partition on the content hash — one
    partition-tagged union + ``groupby(part)`` shuffle of 24-byte rows,
    the ``anti_join_ids`` shape widened to a 128-bit key."""
    P = num_partitions or N_SHUFFLE_PARTS
    u = _hash_tagged_union(new_docs_ds, baseline_hashes_ds, P)

    def resolve(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy()
        h1 = group["h1"].to_numpy()
        h2 = group["h2"].to_numpy()
        is_base = doc == -1
        new_keys = _h_rows_view(h1[~is_base], h2[~is_base])
        if new_keys.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_copies": pa.array([], type=pa.int64()),
                }
            )
        seen = ~np.isin(new_keys, np.unique(_h_rows_view(h1[is_base], h2[is_base])))
        nd = doc[~is_base][seen]
        nk = new_keys[seen]
        order = np.argsort(nk, kind="stable")  # groups pairs; stable keeps row order
        nk, nd = nk[order], nd[order]
        uniq, starts, counts = np.unique(nk, return_index=True, return_counts=True)
        # min doc_id per group: a per-segment reduce over the sorted layout
        surv = np.array(
            [nd[s : s + c].min() for s, c in zip(starts, counts)], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(surv),
                "n_copies": pa.array(counts.astype(np.int64)),
            }
        )

    return u.groupby("part").map_groups(resolve, batch_format="pyarrow")


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
    (a_i * h + b_i) mod M.

    The doc loop is deliberate: each iteration is one (num_perm,
    n_shingles) vector op, and measured against the fully-flattened
    alternative (one (num_perm, total_shingles) op + segmented
    ``minimum.reduceat``) the per-doc ``min(axis=1)`` is 3-5x FASTER —
    reduceat's per-segment reduction loop costs far more than the short
    contiguous reductions it replaces."""
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
    dedupe: bool = True,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs (doc_a < doc_b), deduplicated.

    ``dedupe=False`` skips the (doc_a, doc_b) dedup shuffle — a pair found
    in several LSH buckets then appears several times.  Callers that feed
    the candidates straight into :func:`verify_jaccard` should pass False:
    verification collapses duplicates in both its strategies, so the extra
    shuffle job buys nothing there."""
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
    return _dedup_pairs(pairs) if dedupe else pairs


def _prefix_len(sizes: np.ndarray, threshold: float) -> np.ndarray:
    """Prefix-filter length per set size ``s``: ``s - ceil(t*s) + 1``.

    Soundness: ``jaccard(A, B) >= t`` forces ``|A ∩ B| >= t * |A ∪ B| >=
    t * |A|``, so B must hit A outside A's largest ``ceil(t*|A|) - 1``
    elements — i.e. inside ANY fixed prefix of length
    ``|A| - ceil(t*|A|) + 1`` under a global total order (Chaudhuri et al.,
    "A Primitive Operator for Similarity Joins", ICDE 2006).  The order
    used here is the shingle-hash value itself."""
    need = np.ceil(threshold * sizes - 1e-9).astype(np.int64)
    return np.clip(sizes - need + 1, 1, sizes)


def prefix_filter_rows(
    batch: pa.Table, *, shingle_k: int, threshold: float, hot_ref=None
) -> pa.Table:
    """Per doc: (shingle, doc_id, set_size, part) rows for the doc's PREFIX
    shingles only — the first ``|S| - ceil(t*|S|) + 1`` shingle hashes under
    the global total order.  Every pair with exact Jaccard >= t shares at
    least one prefix shingle on BOTH sides (see :func:`_prefix_len`), so
    grouping on the shingle yields recall-1.0 candidates with no LSH
    parameter to tune.

    Ordering: any global total order is sound.  The default is ascending
    hash value (free — ``_shingle_hashes`` returns sorted uniques).  With
    ``hot_ref`` (a broadcast ``(hot_shingles_sorted, hot_rank)`` pair from
    :func:`_sampled_hot_shingles`), the order becomes rarest-first: shingles
    NOT in the hot table sort first by hash, hot ones last by ascending
    sampled frequency — so the candidate-generating prefixes avoid the hot
    shingles that would otherwise build O(m^2) groups.  The estimate only
    shapes the order, never correctness."""
    hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
    hot_sh, hot_rank = hot if hot is not None else (None, None)
    sh_out: list[np.ndarray] = []
    doc_out: list[np.ndarray] = []
    size_out: list[np.ndarray] = []
    pos_out: list[np.ndarray] = []
    for doc_id, text in zip(
        batch["doc_id"].to_numpy(), batch["text"].to_pylist()
    ):
        sh = np.sort(_shingle_hashes(text, shingle_k))
        s = sh.size
        if s == 0:
            continue
        if hot_sh is not None and hot_sh.size:
            pos = np.searchsorted(hot_sh, sh)
            safe = np.minimum(pos, hot_sh.size - 1)
            is_hot = hot_sh[safe] == sh
            # rare: hash >> 1 keeps the key below 2^63; hot: 2^63 + rank,
            # hottest rank largest, so it lands at the very end
            key = sh >> np.uint64(1)
            key[is_hot] = np.uint64(1 << 63) + hot_rank[safe[is_hot]]
            sh = sh[np.argsort(key, kind="stable")]
        p = int(_prefix_len(np.array([s], dtype=np.int64), threshold)[0])
        sh_out.append(sh[:p])
        doc_out.append(np.full(p, doc_id, dtype=np.int64))
        size_out.append(np.full(p, s, dtype=np.int64))
        pos_out.append(np.arange(p, dtype=np.int64))
    if not sh_out:
        return pa.table(
            {
                "shingle": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "size": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int32()),
            }
        )
    sh = np.concatenate(sh_out)
    return pa.table(
        {
            "shingle": pa.array(sh.view(np.int64)),
            "doc_id": pa.array(np.concatenate(doc_out)),
            "size": pa.array(np.concatenate(size_out)),
            "pos": pa.array(np.concatenate(pos_out)),
            "part": pa.array((sh % np.uint64(N_SHUFFLE_PARTS)).astype(np.int32)),
        }
    )


def _sized_pairs_partition(group: pa.Table, threshold: float) -> pa.Table:
    """One coarse shuffle partition (MANY shingles) -> size- and
    position-filtered candidate pairs, vectorized like
    :func:`_pairs_from_partition`.

    Two sound pruning bounds run before verification:

    - length filter: ``jaccard <= min(|A|,|B|) / max(|A|,|B|)``, so pairs
      with ``min < t * max`` never qualify;
    - PPJoin positional filter (Xiao et al., WWW 2008): at a shared
      prefix shingle sitting at positions (pa, pb) of the two docs'
      global orders, the overlap is at most ``1 + min(|A|-pa-1,
      |B|-pb-1)``, while ``jaccard >= t`` needs overlap >=
      ``ceil(t/(1+t) * (|A|+|B|))``.  Dropping occurrences that fail the
      bound keeps recall 1.0: for a TRUE pair the bound holds at its
      FIRST shared occurrence (overlap <= ubound there), so the pair is
      still generated — later shared occurrences only produced duplicate
      candidates anyway."""
    shingle = group["shingle"].to_numpy()
    doc = group["doc_id"].to_numpy()
    size = group["size"].to_numpy()
    pos = group["pos"].to_numpy()
    order = np.lexsort((doc, shingle))
    shingle, doc, size, pos = (
        shingle[order], doc[order], size[order], pos[order]
    )
    change = np.flatnonzero(np.diff(shingle) != 0) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [doc.size]))
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        iu, ju = np.triu_indices(n, 1)
        sa, sb = size[s + iu], size[s + ju]
        ok = np.minimum(sa, sb) + 1e-9 >= threshold * np.maximum(sa, sb)
        if ok.any():
            pa_, pb_ = pos[s + iu], pos[s + ju]
            alpha = np.ceil(
                threshold / (1.0 + threshold) * (sa + sb) - 1e-9
            )
            ub = 1 + np.minimum(sa - pa_ - 1, sb - pb_ - 1)
            ok &= ub >= alpha
        a_out.append(doc[s + iu[ok]])
        b_out.append(doc[s + ju[ok]])
    a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
    b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
    return pa.table(
        {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
    )


# rarest-first ordering: how many hottest shingles to pin to the END of the
# global order, and what fraction of docs (1/mod, splitmix-selected on
# doc_id — deterministic and partition-invariant) estimate their frequency
HOT_SHINGLES_MAX = 4096
DF_SAMPLE_MOD = 16


def _sampled_hot_shingles(
    docs_ds: ray.data.Dataset,
    *,
    shingle_k: int,
    top: int = HOT_SHINGLES_MAX,
    sample_mod: int = DF_SAMPLE_MOD,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Estimate the ``top`` most frequent shingles from a deterministic
    1/``sample_mod`` doc sample; returns ``(hot_sorted, rank)`` where
    ``hot_sorted`` is ascending by hash (for searchsorted membership) and
    ``rank[i]`` is hot_sorted[i]'s position by ASCENDING estimated df
    (ties by hash) — the hottest shingle gets the largest rank and sorts
    last in every doc's prefix order.  The sample's vocabulary shuffle is
    the only extra exchange; its size is bounded by the sampled docs'
    distinct shingles, and the broadcast is capped at ``top`` entries."""
    from ray.data.aggregate import Sum

    from .splits import _mix64

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = _mix64(ids.astype(np.uint64), seed=3) % sample_mod == 0
        parts = [
            _shingle_hashes(t, shingle_k)
            for t in batch.filter(pa.array(keep))["text"].to_pylist()
        ]
        parts = [p for p in parts if p.size]
        if not parts:
            return pa.table(
                {
                    "shingle": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                }
            )
        u, c = np.unique(np.concatenate(parts), return_counts=True)
        return pa.table(
            {
                "shingle": pa.array(u.view(np.int64)),
                "df": pa.array(c.astype(np.int64)),
            }
        )

    g = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(counts, batch_format="pyarrow")
        .groupby("shingle")
        .aggregate(Sum("df"))
    )
    hot_tbl = (
        g.map_batches(
            # a shingle seen once in the sample is noise, not heat
            lambda b: b.filter(pa.compute.greater(b["sum(df)"], 1)),
            batch_format="pyarrow",
        )
        .sort("sum(df)", descending=True)
        .limit(top)
        .to_pandas()
    )
    if hot_tbl.empty:
        return None
    sh = hot_tbl["shingle"].to_numpy().astype(np.int64).view(np.uint64)
    df = hot_tbl["sum(df)"].to_numpy().astype(np.int64)
    # rank by (df asc, hash asc): a permutation aligned to hash-sorted order
    by_freq = np.lexsort((sh, df))
    rank_of = np.empty(sh.size, dtype=np.uint64)
    rank_of[by_freq] = np.arange(sh.size, dtype=np.uint64)
    order = np.argsort(sh)
    return sh[order], rank_of[order]


def ngram_jaccard_candidates(
    docs_ds: ray.data.Dataset,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
    order: str = "hash",
) -> ray.data.Dataset:
    """EXACT-recall candidate pairs for ``jaccard >= threshold`` via prefix
    filtering — the AllPairs-family alternative to MinHash+LSH: no
    probabilistic banding, so the true pair set is a provable subset of the
    candidates (the verify step then makes precision exact too).

    Shuffle shape matches ``minhash_lsh_pairs``: one map stage emits
    O(prefix) 28-byte rows per doc (never the text), one coarse
    ``groupby(part)`` co-locates shingle groups, pair generation is
    vectorized per partition.  Duplicated candidates (pairs sharing several
    prefix shingles) are collapsed by :func:`verify_jaccard`, exactly like
    multi-bucket LSH candidates.

    ``order="df"`` adds a sampled document-frequency pre-pass
    (:func:`_sampled_hot_shingles`) and broadcasts the hot table once via
    ``ray.put``, pinning the estimated-hottest shingles to the END of the
    global order so prefixes avoid them — the rarest-first heuristic that
    keeps boilerplate-heavy corpora from building O(m^2) candidate groups.
    The pair set is identical under either order (exactness is
    order-independent); only the candidate count changes."""
    if order not in ("hash", "df"):
        raise ValueError(f"order must be 'hash' or 'df', got {order!r}")
    hot_ref = None
    if order == "df":
        hot = _sampled_hot_shingles(docs_ds, shingle_k=shingle_k)
        if hot is not None:
            hot_ref = ray.put(hot)
    rows = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        prefix_filter_rows,
        fn_kwargs={
            "shingle_k": shingle_k,
            "threshold": threshold,
            "hot_ref": hot_ref,
        },
        batch_format="pyarrow",
    )

    def pairs(group: pa.Table) -> pa.Table:
        return _sized_pairs_partition(group, threshold)

    return rows.groupby("part").map_groups(pairs, batch_format="pyarrow")


def ngram_jaccard_pairs(
    docs_ds: ray.data.Dataset,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
    order: str = "hash",
) -> ray.data.Dataset:
    """Exact n-gram Jaccard similarity self-join: ALL pairs (doc_a < doc_b)
    with word-shingle Jaccard >= ``threshold`` — recall 1.0 by the prefix
    filter, precision 1.0 by exact verification.  Output schema matches the
    verified minhash path: (doc_a, doc_b, jaccard).  ``order="df"`` enables
    the sampled rarest-first prefix order (same result, fewer candidates on
    boilerplate-heavy corpora)."""
    cands = ngram_jaccard_candidates(
        docs_ds, shingle_k=shingle_k, threshold=threshold, order=order
    )
    return verify_jaccard(
        cands, docs_ds, shingle_k=shingle_k, threshold=threshold
    )


@ray.remote
def _block_num_rows(t: pa.Table) -> int:
    return t.num_rows


def _nonempty_block_refs(ds: ray.data.Dataset) -> list:
    """Refs of ``ds``'s non-empty blocks.

    Ray's sort-based aggregate can emit EMPTY ZERO-COLUMN blocks, and
    map_batches never invokes the UDF on empty blocks (so the schema cannot
    be repaired in-stream); downstream groupbys/joins then fail on the
    schema-less block.  Row counts are checked in tasks next to the blocks
    (refs only on the driver); the cost is an execution barrier on ``ds``,
    which the consumers here force anyway."""
    refs, _ = _nonempty_blocks(ds)
    return refs


def _nonempty_blocks(ds: ray.data.Dataset) -> tuple[list, int]:
    """(non-empty block refs, total row count) — the row count rides along
    free and drives small-side strategy choices."""
    refs = ds.to_arrow_refs()
    nrows = ray.get([_block_num_rows.remote(r) for r in refs])
    return [r for r, n in zip(refs, nrows) if n], int(sum(nrows))


# pairs at/below this count take the broadcast (small-side) verify path:
# driver state is O(pairs), never O(corpus).  Above it, the partitioned
# two-shuffle path runs — no driver-side structure at any size.
BROADCAST_PAIRS_MAX = 50_000

# the broadcast path's driver state is really O(pairs x shingles-per-doc):
# long documents can blow the pair-count ceiling's intent.  Sketch BYTES are
# metered block-by-block while assembling the driver map; crossing this
# ceiling abandons the broadcast and reruns as the partitioned path, so
# driver peak memory is bounded by ceiling + one block regardless of doc
# length.
BROADCAST_SKETCH_BYTES_MAX = 256 * 1024 * 1024

VERIFY_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)


def _sorted_intersect_size(sa: np.ndarray, sb: np.ndarray) -> int:
    """|sa ∩ sb| for SORTED unique uint64 arrays via one searchsorted —
    measured ~3x faster than np.intersect1d's concat+sort on the short
    (tens-of-elements) sketch arrays the verify loop runs millions of
    times."""
    if sa.size > sb.size:
        sa, sb = sb, sa
    pos = np.searchsorted(sb, sa)
    valid = pos < sb.size
    return int(np.count_nonzero(sb[pos[valid]] == sa[valid]))


def _verify_pairs_kernel(group: pa.Table, threshold: float) -> pa.Table:
    """Shared per-partition exact-Jaccard verification: rows are
    (doc_a, doc_b, key, sh) with each pair appearing once per side and
    ``sh`` the key-doc's sorted shingle sketch.  Used by both
    :func:`verify_jaccard` and :func:`verify_jaccard_sketches` so the
    pair semantics can never drift.

    Shape note (measured): the per-pair loop IS the fast form.  A fully
    "vectorized" rewrite — flat (pair_id, value, side) rows, one big
    3-key lexsort, adjacency bincount — ran 6-9x SLOWER at 100k pairs x
    54-element sketches (7k vs 60-78k pairs/s single-core): the
    per-segment short reductions beat one huge sort, the same lesson as
    the minhash layout note on ``minhash_signatures``.  Within the loop
    family, ``.as_py()``-vs-``to_pylist`` and intersect1d-vs-searchsorted
    are all within noise; the loop's per-group numpy-call overhead
    dominates either way."""
    da = group["doc_a"].to_numpy()
    db = group["doc_b"].to_numpy()
    key = group["key"].to_numpy()
    order = np.lexsort((key, db, da))
    da, db, key = da[order], db[order], key[order]
    sh_list = group["sh"].take(pa.array(order)).to_pylist()
    change = np.flatnonzero((np.diff(da) != 0) | (np.diff(db) != 0)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [da.size]))
    buf_memo: dict[int, np.ndarray] = {}

    def sketch_at(i: int) -> np.ndarray:
        k = int(key[i])
        got = buf_memo.get(k)
        if got is None:
            got = np.frombuffer(sh_list[i], dtype=np.uint64)
            buf_memo[k] = got
        return got

    oa, ob, oj = [], [], []
    for s, e in zip(starts, ends):
        ks = key[s:e]
        # sides match by VALUE (cross-set pairs don't order doc_a/doc_b);
        # duplicate candidate rows collapse here, missing-side pairs drop
        ia = np.flatnonzero(ks == da[s])
        ib = np.flatnonzero(ks == db[s])
        if ia.size == 0 or ib.size == 0:
            continue
        sa = sketch_at(int(s + ia[0]))
        sb = sketch_at(int(s + ib[0]))
        inter = _sorted_intersect_size(sa, sb)
        union = sa.size + sb.size - inter
        j = round(inter / union, 6) if union else 0.0
        if j >= threshold:
            oa.append(int(da[s]))
            ob.append(int(db[s]))
            oj.append(j)
    return pa.table(
        {
            "doc_a": pa.array(oa, type=pa.int64()),
            "doc_b": pa.array(ob, type=pa.int64()),
            "jaccard": pa.array(oj, type=pa.float64()),
        }
    )


def _pair_jaccard(
    da: np.ndarray, db: np.ndarray, sh_map: dict[int, np.ndarray], threshold: float
) -> pa.Table:
    """Exact Jaccard for pair arrays given per-doc shingle-hash arrays;
    pairs with a missing side are dropped (inner-join semantics)."""
    oa: list[int] = []
    ob: list[int] = []
    oj: list[float] = []
    for a, b in zip(da.tolist(), db.tolist()):
        sa = sh_map.get(a)
        sb = sh_map.get(b)
        if sa is None or sb is None:
            continue
        inter = _sorted_intersect_size(sa, sb)
        union = sa.size + sb.size - inter
        j = round(inter / union, 6) if union else 0.0
        if j >= threshold:
            oa.append(a)
            ob.append(b)
            oj.append(j)
    return pa.table(
        {
            "doc_a": pa.array(oa, type=pa.int64()),
            "doc_b": pa.array(ob, type=pa.int64()),
            "jaccard": pa.array(oj, type=pa.float64()),
        }
    )


def verify_jaccard(
    pairs_ds: ray.data.Dataset,
    docs_ds: ray.data.Dataset,
    *,
    shingle_k: int = 3,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    broadcast_pairs_max: int | None = None,
) -> ray.data.Dataset:
    """Exact word-shingle Jaccard for each candidate pair; keeps pairs at or
    above ``threshold``.  Auto-strategy on the CANDIDATE count (known free
    from the pair blocks), mirroring the build's ``df_distributed`` switch:

    - **broadcast path** (pairs <= ``broadcast_pairs_max``): the guide's
      "broadcast the small side" join — the needed doc_ids (<= 2x pairs)
      ship once via ``ray.put``, ONE streaming ``map_batches`` pass over
      the corpus computes shingle sketches for just those docs, and the
      pair-bounded sketch table verifies in place.  Zero shuffles, zero
      join operators; driver/broadcast state is O(pairs) with an explicit
      ceiling, never O(corpus).
    - **partitioned path** (above the ceiling, or forced with
      ``broadcast_pairs_max=0``): no driver-side structure of any size.
      Corpus rows and pair rows (exploded to both sides) are hash-tagged by
      doc_id and co-located by ONE ``groupby(part)`` sort shuffle — corpus
      text crosses the wire once (the former two-``Dataset.join`` form
      moved it twice and paid two aggregator-pool spin-ups); each partition
      attaches shingle sketches to its pair sides, and a second,
      PAIR-BOUNDED shuffle on (doc_a, doc_b) brings the two sketches
      together for the exact Jaccard.
    """
    if broadcast_pairs_max is None:
        broadcast_pairs_max = BROADCAST_PAIRS_MAX
    pair_refs, n_pairs = _nonempty_blocks(pairs_ds)
    if not pair_refs:
        return ray.data.from_arrow(VERIFY_SCHEMA.empty_table())
    docs_sel = docs_ds.select_columns(["doc_id", "text"])

    if n_pairs <= broadcast_pairs_max:
        pair_tbl = pa.concat_tables(
            [t.select(["doc_a", "doc_b"]) for t in ray.get(pair_refs)]
        )
        # a candidate surfacing from several buckets verifies (and reports)
        # once — mirrors the partitioned path's per-group collapse
        uniq = np.unique(
            np.stack(
                [pair_tbl["doc_a"].to_numpy(), pair_tbl["doc_b"].to_numpy()],
                axis=1,
            ),
            axis=0,
        )
        da, db = uniq[:, 0], uniq[:, 1]
        need_ref = ray.put(pa.array(np.unique(np.concatenate([da, db]))))

        def sketch(batch: pa.Table) -> pa.Table:
            need = ray.get(need_ref) if isinstance(need_ref, ray.ObjectRef) else need_ref
            hit = batch.filter(
                pa.compute.is_in(batch["doc_id"], value_set=need)
            )
            sh = [
                _shingle_hashes(t, shingle_k).tobytes()
                for t in hit["text"].to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": hit["doc_id"],
                    "sh": pa.array(sh, type=pa.large_binary()),
                }
            )

        sk_refs, _n = _nonempty_blocks(
            docs_sel.map_batches(sketch, batch_format="pyarrow")
        )
        # assemble the driver map block-by-block with a running BYTE meter:
        # the pair-count ceiling alone leaves driver memory proportional to
        # document length (ADVICE r3); crossing the byte ceiling abandons
        # the broadcast and falls through to the partitioned path below
        sh_map: dict[int, np.ndarray] | None = {}
        sketch_bytes = 0
        for ref in sk_refs:
            t = ray.get(ref)
            for d, s in zip(t["doc_id"].to_numpy(), t["sh"].to_pylist()):
                sketch_bytes += len(s)
                sh_map[int(d)] = np.frombuffer(s, dtype=np.uint64)
            if sketch_bytes > BROADCAST_SKETCH_BYTES_MAX:
                sh_map = None  # free before the partitioned rerun
                break
        if sh_map is not None:
            return ray.data.from_arrow(
                _pair_jaccard(da, db, sh_map, threshold)
            )

    # ---- partitioned path ------------------------------------------------
    P = num_partitions or N_SHUFFLE_PARTS
    pairs = ray.data.from_arrow_refs(pair_refs)
    # the pair side's null-text placeholder must carry the CORPUS text type
    # (large_string is common for big parquet); a hardcoded pa.string()
    # hands union two mismatched schemas (ADVICE r3)
    _dsch = docs_sel.schema()
    text_type = dict(zip(_dsch.names, _dsch.types))["text"]

    def tag_docs(b: pa.Table) -> pa.Table:
        key = b["doc_id"].to_numpy().astype(np.int64)
        n = len(key)
        return pa.table(
            {
                "key": pa.array(key),
                "doc_a": pa.array(np.full(n, -1, dtype=np.int64)),
                "doc_b": pa.array(np.full(n, -1, dtype=np.int64)),
                "text": b["text"].cast(text_type),
                "part": pa.array((key % P).astype(np.int32)),
            }
        )

    def tag_pairs(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.int64)
        bb = b["doc_b"].to_numpy().astype(np.int64)
        key = np.concatenate([a, bb])  # each pair lands on BOTH sides' parts
        return pa.table(
            {
                "key": pa.array(key),
                "doc_a": pa.array(np.concatenate([a, a])),
                "doc_b": pa.array(np.concatenate([bb, bb])),
                "text": pa.nulls(len(key), type=text_type),
                "part": pa.array((key % P).astype(np.int32)),
            }
        )

    u = docs_sel.map_batches(tag_docs, batch_format="pyarrow").union(
        pairs.map_batches(tag_pairs, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "key": pa.array([], type=pa.int64()),
                "sh": pa.array([], type=pa.large_binary()),
                "part2": pa.array([], type=pa.int32()),
            }
        )
        is_pair = pa.compute.not_equal(group["doc_a"], -1)
        prows = group.filter(is_pair)
        if prows.num_rows == 0:
            return empty
        drows = group.filter(pa.compute.invert(is_pair))
        texts = dict(zip(drows["key"].to_numpy(), drows["text"].to_pylist()))
        keys = prows["key"].to_numpy()
        # one sketch per DISTINCT needed doc, not per pair row
        sketches: dict[int, bytes] = {}
        for k in np.unique(keys):
            t = texts.get(int(k))
            if t is not None:
                sketches[int(k)] = _shingle_hashes(t, shingle_k).tobytes()
        sh = [sketches.get(int(k)) for k in keys]
        ok = np.array([s is not None for s in sh], dtype=bool)
        if not ok.any():
            return empty
        da = prows["doc_a"].to_numpy()[ok]
        db = prows["doc_b"].to_numpy()[ok]
        with np.errstate(over="ignore"):
            part2 = (
                (da.astype(np.uint64) * np.uint64(1_000_003)
                 + db.astype(np.uint64)) % np.uint64(P)
            ).astype(np.int32)
        return pa.table(
            {
                "doc_a": pa.array(da),
                "doc_b": pa.array(db),
                "key": pa.array(keys[ok]),
                "sh": pa.array(
                    [s for s in sh if s is not None], type=pa.large_binary()
                ),
                "part2": pa.array(part2),
            }
        )

    staged = u.groupby("part").map_groups(attach, batch_format="pyarrow")
    mid_refs, _n = _nonempty_blocks(staged)
    if not mid_refs:
        return ray.data.from_arrow(VERIFY_SCHEMA.empty_table())
    staged = ray.data.from_arrow_refs(mid_refs)

    def verify(group: pa.Table) -> pa.Table:
        return _verify_pairs_kernel(group, threshold)

    return staged.groupby("part2").map_groups(verify, batch_format="pyarrow")


def ids_in_baseline(
    docs_ds: ray.data.Dataset,
    baseline_hashes_ds: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """doc_ids of ``docs_ds`` whose 128-bit content hash appears in the
    baseline export — the membership complement of
    :func:`exact_dedup_against`, for pipelines that need a DROP list to
    anti-join (curate's incremental gate).  Same partition-tagged
    24-byte-row shuffle (:func:`_hash_tagged_union`); no driver-side
    structure."""
    P = num_partitions or N_SHUFFLE_PARTS
    u = _hash_tagged_union(docs_ds, baseline_hashes_ds, P)

    def probe(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy()
        h1 = group["h1"].to_numpy()
        h2 = group["h2"].to_numpy()
        is_base = doc == -1
        new_keys = _h_rows_view(h1[~is_base], h2[~is_base])
        if new_keys.size == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        hit = np.isin(
            new_keys, np.unique(_h_rows_view(h1[is_base], h2[is_base]))
        )
        return pa.table({"doc_id": pa.array(doc[~is_base][hit])})

    return u.groupby("part").map_groups(probe, batch_format="pyarrow")


def minhash_sketches(
    docs_ds: ray.data.Dataset, *, shingle_k: int = 3
) -> ray.data.Dataset:
    """(doc_id, sh) — each doc's sorted-unique shingle-hash array as one
    binary blob, the exact-Jaccard evidence :func:`verify_jaccard_sketches`
    consumes without re-reading text."""

    def sketch(batch: pa.Table) -> pa.Table:
        sh = [
            _shingle_hashes(t, shingle_k).tobytes()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sh": pa.array(sh, type=pa.large_binary()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        sketch, batch_format="pyarrow"
    )


def export_neardup_baseline(
    docs_ds: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Persistable near-dup baseline of an ingested corpus: (band-bucket
    rows, shingle sketches).  Both are metadata-sized relative to the
    text (bands x 12 B + sketch bytes per doc); an incremental ingest
    matches new docs against these via :func:`minhash_pairs_against`
    without ever touching the old corpus again — the near-dup sibling of
    :func:`export_content_hashes`."""
    sigs = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        minhash_signatures,
        fn_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
    )
    buckets = sigs.map_batches(
        band_buckets, fn_kwargs={"bands": bands}, batch_format="pyarrow"
    ).map_batches(
        lambda b: b.select(["band", "bucket", "doc_id"]),
        batch_format="pyarrow",
    )
    return buckets, minhash_sketches(docs_ds, shingle_k=shingle_k)


def _cross_pairs_from_partition(group: pa.Table) -> pa.Table:
    """One coarse partition -> NEW x BASE candidate pairs only (never
    new-new or base-base): within each (band, bucket) run, the new-side
    and base-side index sets cross-product, vectorized."""
    band = group["band"].to_numpy()
    bucket = group["bucket"].to_numpy()
    doc = group["doc_id"].to_numpy()
    is_new = group["is_new"].to_numpy().astype(bool)
    order = np.lexsort((doc, bucket, band))
    band, bucket, doc, is_new = (
        band[order], bucket[order], doc[order], is_new[order]
    )
    change = np.flatnonzero((np.diff(band) != 0) | (np.diff(bucket) != 0)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [doc.size]))
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        seg_new = doc[s:e][is_new[s:e]]
        seg_base = doc[s:e][~is_new[s:e]]
        if seg_new.size == 0 or seg_base.size == 0:
            continue
        a_out.append(np.repeat(seg_new, seg_base.size))
        b_out.append(np.tile(seg_base, seg_new.size))
    a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
    b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
    return pa.table(
        {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
    )


def verify_jaccard_sketches(
    pairs_ds: ray.data.Dataset,
    sketches_ds: ray.data.Dataset,
    *,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    broadcast_pairs_max: int | None = None,
) -> ray.data.Dataset:
    """:func:`verify_jaccard` over PRECOMPUTED sketches instead of corpus
    text — same auto-strategy (bounded broadcast below the pair ceiling,
    partition-tagged two-shuffle above), same output schema, but the
    attach stage ships sketch blobs, never text, so baseline docs verify
    from their export alone."""
    if broadcast_pairs_max is None:
        broadcast_pairs_max = BROADCAST_PAIRS_MAX
    pair_refs, n_pairs = _nonempty_blocks(pairs_ds)
    if not pair_refs:
        return ray.data.from_arrow(VERIFY_SCHEMA.empty_table())
    sk = sketches_ds.map_batches(
        lambda b: b.select(["doc_id", "sh"]).replace_schema_metadata(None),
        batch_format="pyarrow",
    )

    if n_pairs <= broadcast_pairs_max:
        pair_tbl = pa.concat_tables(
            [t.select(["doc_a", "doc_b"]) for t in ray.get(pair_refs)]
        )
        uniq = np.unique(
            np.stack(
                [pair_tbl["doc_a"].to_numpy(), pair_tbl["doc_b"].to_numpy()],
                axis=1,
            ),
            axis=0,
        )
        da, db = uniq[:, 0], uniq[:, 1]
        need_ref = ray.put(pa.array(np.unique(np.concatenate([da, db]))))

        def hits(batch: pa.Table) -> pa.Table:
            need = ray.get(need_ref) if isinstance(need_ref, ray.ObjectRef) else need_ref
            return batch.filter(
                pa.compute.is_in(batch["doc_id"], value_set=need)
            )

        sk_refs, _n = _nonempty_blocks(
            sk.map_batches(hits, batch_format="pyarrow")
        )
        sh_map: dict[int, np.ndarray] | None = {}
        sketch_bytes = 0
        for ref in sk_refs:
            t = ray.get(ref)
            for d, s in zip(t["doc_id"].to_numpy(), t["sh"].to_pylist()):
                sketch_bytes += len(s)
                sh_map[int(d)] = np.frombuffer(s, dtype=np.uint64)
            if sketch_bytes > BROADCAST_SKETCH_BYTES_MAX:
                sh_map = None
                break
        if sh_map is not None:
            return ray.data.from_arrow(
                _pair_jaccard(da, db, sh_map, threshold)
            )

    # ---- partitioned path: identical shape to verify_jaccard's, with the
    # sketch column standing in for text (the attach stage just forwards it)
    P = num_partitions or N_SHUFFLE_PARTS
    pairs = ray.data.from_arrow_refs(pair_refs)

    def tag_sketches(b: pa.Table) -> pa.Table:
        key = b["doc_id"].to_numpy().astype(np.int64)
        n = len(key)
        return pa.table(
            {
                "key": pa.array(key),
                "doc_a": pa.array(np.full(n, -1, dtype=np.int64)),
                "doc_b": pa.array(np.full(n, -1, dtype=np.int64)),
                "sh": b["sh"].cast(pa.large_binary()),
                "part": pa.array((key % P).astype(np.int32)),
            }
        )

    def tag_pairs(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.int64)
        bb = b["doc_b"].to_numpy().astype(np.int64)
        key = np.concatenate([a, bb])
        return pa.table(
            {
                "key": pa.array(key),
                "doc_a": pa.array(np.concatenate([a, a])),
                "doc_b": pa.array(np.concatenate([bb, bb])),
                "sh": pa.nulls(len(key), type=pa.large_binary()),
                "part": pa.array((key % P).astype(np.int32)),
            }
        )

    u = sk.map_batches(tag_sketches, batch_format="pyarrow").union(
        pairs.map_batches(tag_pairs, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "key": pa.array([], type=pa.int64()),
                "sh": pa.array([], type=pa.large_binary()),
                "part2": pa.array([], type=pa.int32()),
            }
        )
        is_pair = pa.compute.not_equal(group["doc_a"], -1)
        prows = group.filter(is_pair)
        if prows.num_rows == 0:
            return empty
        drows = group.filter(pa.compute.invert(is_pair))
        sketches = dict(
            zip(drows["key"].to_numpy(), drows["sh"].to_pylist())
        )
        keys = prows["key"].to_numpy()
        sh = [sketches.get(int(k)) for k in keys]
        ok = np.array([s is not None for s in sh], dtype=bool)
        if not ok.any():
            return empty
        da = prows["doc_a"].to_numpy()[ok]
        db = prows["doc_b"].to_numpy()[ok]
        with np.errstate(over="ignore"):
            part2 = (
                (da.astype(np.uint64) * np.uint64(1_000_003)
                 + db.astype(np.uint64)) % np.uint64(P)
            ).astype(np.int32)
        return pa.table(
            {
                "doc_a": pa.array(da),
                "doc_b": pa.array(db),
                "key": pa.array(keys[ok]),
                "sh": pa.array(
                    [s for s in sh if s is not None], type=pa.large_binary()
                ),
                "part2": pa.array(part2),
            }
        )

    staged = u.groupby("part").map_groups(attach, batch_format="pyarrow")
    mid_refs, _n = _nonempty_blocks(staged)
    if not mid_refs:
        return ray.data.from_arrow(VERIFY_SCHEMA.empty_table())
    staged = ray.data.from_arrow_refs(mid_refs)

    def verify(group: pa.Table) -> pa.Table:
        return _verify_pairs_kernel(group, threshold)

    return staged.groupby("part2").map_groups(verify, batch_format="pyarrow")


def minhash_pairs_against(
    new_docs_ds: ray.data.Dataset,
    baseline_buckets_ds: ray.data.Dataset,
    baseline_sketches_ds: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """Incremental near-dup: (doc_a=new, doc_b=baseline, jaccard) pairs
    where a NEW doc's exact word-shingle Jaccard against an
    already-ingested doc reaches ``threshold`` — candidates from shared
    LSH band buckets (new signatures computed in-flight, baseline buckets
    from :func:`export_neardup_baseline`), verification from sketch
    blobs.  The baseline corpus text is never read.

    ``num_perm``/``bands``/``shingle_k`` must match the export's (bucket
    equality is meaningless across parameterizations).  doc_ids must be
    distinct across the two sides — the standard monotone-id contract of
    the ingest path (``append_index`` enforces the same).  New-vs-new
    duplicates are a plain :func:`minhash_lsh_pairs` over the shard."""
    new_sigs = new_docs_ds.select_columns(["doc_id", "text"]).map_batches(
        minhash_signatures,
        fn_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
    )
    new_buckets = new_sigs.map_batches(
        band_buckets, fn_kwargs={"bands": bands}, batch_format="pyarrow"
    )

    def tag(is_new: bool):
        def f(b: pa.Table) -> pa.Table:
            b = b.replace_schema_metadata(None)
            bucket = b["bucket"].to_numpy()
            band = b["band"].to_numpy()
            with np.errstate(over="ignore"):
                part = (
                    (bucket.view(np.uint64) * np.uint64(1_000_003)
                     + band.astype(np.uint64)) % np.uint64(N_SHUFFLE_PARTS)
                ).astype(np.int32)
            return pa.table(
                {
                    "band": pa.array(band.astype(np.int32)),
                    "bucket": pa.array(bucket),
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "is_new": pa.array(
                        np.full(len(band), is_new, dtype=bool)
                    ),
                    "part": pa.array(part),
                }
            )

        return f

    u = new_buckets.map_batches(tag(True), batch_format="pyarrow").union(
        baseline_buckets_ds.map_batches(tag(False), batch_format="pyarrow")
    )
    cands = u.groupby("part").map_groups(
        _cross_pairs_from_partition, batch_format="pyarrow"
    )
    sketches = minhash_sketches(new_docs_ds, shingle_k=shingle_k).union(
        baseline_sketches_ds
    )
    return verify_jaccard_sketches(cands, sketches, threshold=threshold)


def anti_join_ids(
    ds: ray.data.Dataset,
    ids_ds: ray.data.Dataset,
    *,
    on: str = "doc_id",
    ids_col: str = "doc_b",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose ``on`` value appears NOWHERE in
    ``ids_ds[ids_col]`` — a distributed left-anti semi-join.

    One partition-tagged union + ``groupby(part)`` sort shuffle: both sides
    hash on the id, each partition drops its local matches.  No driver-side
    id set, no broadcast — the exclusion side may be any size (the curate
    pipeline's near-dup drop list is a corpus-scale fraction at web crawl
    dup rates).  Column order/types of ``ds`` are preserved; row order is
    shuffle order (downstream consumers must not rely on it)."""
    P = num_partitions or N_SHUFFLE_PARTS
    schema = ds.schema()
    if schema is None:  # empty/schema-less left side: nothing to filter
        return ds
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    if "__drop" in names or on not in names:
        raise ValueError(f"anti_join_ids: bad schema {names}")

    def tag_left(b: pa.Table) -> pa.Table:
        # drop schema metadata (parquet reads carry pandas metadata): a
        # pa.Schema WITH metadata is unhashable, and Ray's unify_schemas
        # warns "Failed to hash the schemas" on every union/reduce block
        # when the two union sides differ only in metadata
        b = b.replace_schema_metadata(None)
        key = b[on].to_numpy().astype(np.int64)
        return b.append_column(
            "__drop", pa.array(np.zeros(len(key), dtype=bool))
        ).append_column("part", pa.array((key % P).astype(np.int32)))

    def tag_right(b: pa.Table) -> pa.Table:
        key = np.unique(b[ids_col].to_numpy().astype(np.int64))
        cols: dict[str, pa.Array] = {}
        for n in names:
            if n == on:
                # cast to the LEFT side's id type so union sees one schema
                cols[n] = pa.array(key, type=pa.int64()).cast(types[n])
            else:
                cols[n] = pa.nulls(len(key), type=types[n])
        t = pa.table(cols)
        return t.append_column(
            "__drop", pa.array(np.ones(len(key), dtype=bool))
        ).append_column("part", pa.array((key % P).astype(np.int32)))

    right_refs, n_right = _nonempty_blocks(
        ids_ds.select_columns([ids_col])
    )
    if not right_refs:  # nothing to drop
        return ds
    u = ds.map_batches(tag_left, batch_format="pyarrow").union(
        ray.data.from_arrow_refs(right_refs).map_batches(
            tag_right, batch_format="pyarrow"
        )
    )

    def keep(group: pa.Table) -> pa.Table:
        drop_mask = group["__drop"].to_numpy(zero_copy_only=False)
        keys = group[on].to_numpy()
        drop_keys = keys[drop_mask]
        left = group.filter(pa.array(~drop_mask)).select(names)
        if drop_keys.size == 0:
            return left
        ok = ~np.isin(left[on].to_numpy(), drop_keys)
        return left.filter(pa.array(ok))

    return u.groupby("part").map_groups(keep, batch_format="pyarrow")


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


# pair volume at/above which cluster resolution routes to the distributed
# min-label propagation by default (mirrors the build's DF_DISTRIBUTED_ROWS
# auto-switch): below it, driver union-find state is provably bounded
CC_DISTRIBUTED_PAIRS = 2_000_000


def connected_components(
    pairs_ds: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    distributed: bool | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs -> duplicate CLUSTERS: (doc_id, cluster_id)
    for every doc appearing in a pair, cluster_id = the minimum doc_id
    reachable through the pair graph (so the cluster survivor under
    min-id policy is the row where doc_id == cluster_id).

    Auto-strategy on the pair count (``distributed=None``; the pair blocks
    already know their row counts, so the check is free):

    - below ``CC_DISTRIBUTED_PAIRS``: union-find over the STREAMED pair
      batches on the driver — state is O(distinct docs in pairs), the
      near-duplicate set, orders of magnitude smaller than the corpus
      (the guide's "union-find on the driver only if the candidate set is
      provably small" case);
    - at/above it (or forced): the same contract computed distributed with
      O(diameter) rounds of min-label propagation (an iterated
      groupby(node).min(label), :func:`connected_components_distributed`);
      output schema identical, equivalence asserted in tests."""
    if distributed is None or not distributed:
        refs, n_pairs = _nonempty_blocks(
            pairs_ds.select_columns([a_col, b_col])
        )
        if not refs:
            return ray.data.from_arrow(
                pa.schema(
                    [("doc_id", pa.int64()), ("cluster_id", pa.int64())]
                ).empty_table()
            )
        pairs_ds = ray.data.from_arrow_refs(refs)
        if distributed is None:
            distributed = n_pairs >= CC_DISTRIBUTED_PAIRS
    if distributed:
        return connected_components_distributed(
            pairs_ds, a_col=a_col, b_col=b_col
        )
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
    converged = False
    for _round in range(max_rounds):
        label_refs = _nonempty_block_refs(labels)
        labels = ray.data.from_arrow_refs(label_refs).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            converged = True
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
    if not converged:
        # labels only decrease, so an unchanged sum IS convergence; an
        # exhausted loop whose final propagation still changed the sum
        # means some component (diameter > max_rounds) holds SPLIT — i.e.
        # wrong — cluster labels.  Never return those silently.
        final_sum = labels.sum("label")
        if final_sum != prev_sum:
            raise RuntimeError(
                f"connected_components_distributed did not converge in "
                f"{max_rounds} rounds (label sum still changing); raise "
                f"max_rounds — component diameter exceeds it"
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
    method: str = "ivf",
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
    (towards ``nlist``) to trade compute for recall — or pass
    ``method="exact"`` to opt into the all-pairs baseline explicitly when
    guaranteed recall matters more than O(N^2) compute."""
    if method == "exact":
        return embedding_cosine_pairs_allpairs(
            emb_ds, threshold, id_col=id_col, round_to=round_to
        )
    if method != "ivf":
        raise ValueError(f"method must be 'ivf' or 'exact', got {method!r}")
    from . import ann

    cent = ann.train_centroids(emb_ds, nlist, spherical=True, id_col=id_col)
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
# long-lived workers stream unbounded vocabularies through SimHash; cap the
# per-process memo so it never grows past the hot head of the distribution
_CHARPOLY_MEMO_MAX = 1_000_000


def _char_poly64(tok: str) -> int:
    h = _CHARPOLY_MEMO.get(tok)
    if h is None:
        h = 0
        for c in tok:
            h = (h * 31 + ord(c)) & _U64
        if len(_CHARPOLY_MEMO) >= _CHARPOLY_MEMO_MAX:
            _CHARPOLY_MEMO.clear()
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
