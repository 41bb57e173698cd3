"""Benchmark decontamination: flag training documents that overlap an
evaluation set by exact word n-grams.

The standard training-data hygiene step (the n-gram collision method
popularized by the GPT-2/GPT-3 appendices and C4): a training document is
CONTAMINATED when it shares at least ``min_hits`` contiguous ``n``-word
n-grams with any benchmark document.  Tokenization is the simple
SQL-parity split (lowercase, ``[^a-z]+`` delimiters) so the DuckDB oracle
can mirror the semantics exactly.

Scale design (100 TB corpus, small benchmark):

- The benchmark side is an EVAL SET — megabytes by definition, not a
  second corpus.  Its distinct n-grams are collected to one deterministic
  sorted ``uint64`` hash array and broadcast once via ``ray.put``; every
  corpus batch probes it with a vectorized ``np.searchsorted``.  8 bytes
  per benchmark n-gram ⇒ even a 10M-n-gram suite is an 80 MB broadcast,
  read zero-copy from the object store by every task.
- The corpus side streams: one ``map_batches`` pass, no shuffle, no
  per-doc Python in the probe (hashing is per distinct n-gram, probing is
  one searchsorted per batch).
- If the "benchmark" ever IS corpus-sized, this operator is the wrong
  shape — that is near-dup detection between two corpora; use
  ``dedup.minhash_lsh_pairs`` on the union instead (documented, not
  auto-switched: a quietly-different algorithm at a size threshold would
  change semantics).

No reference analogue (the reference engine has no corpus hygiene);
first-class training-data operator per the round brief.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

_TOKEN = re.compile(r"[a-z]+")


def _ngram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct 64-bit hashes of the text's word n-grams (simple split)."""
    toks = _TOKEN.findall(text.lower())
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    out = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
            )
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )
    return out


def benchmark_ngram_ref(
    benchmark_ds: ray.data.Dataset, *, n: int = 8, text_col: str = "text"
):
    """Collect the benchmark's distinct n-gram hashes into one sorted array
    and ``ray.put`` it (broadcast once, read by every probe task).

    The per-batch partials are hash arrays, so the driver only ever holds
    benchmark-sized data — the documented small side."""
    parts: list[np.ndarray] = []
    for batch in benchmark_ds.select_columns([text_col]).iter_batches(
        batch_format="pyarrow"
    ):
        for t in batch[text_col].to_pylist():
            parts.append(_ngram_hashes(t, n))
    if parts:
        allh = np.unique(np.concatenate(parts))
    else:
        allh = np.empty(0, dtype=np.uint64)
    return ray.put(allh)


class ContaminationScan:
    """Actor-pool stage: per doc, how many of its distinct n-grams appear
    in the broadcast benchmark set (``ray.get`` once per actor)."""

    def __init__(self, bench_ref, n: int, min_hits: int) -> None:
        self.bench = ray.get(bench_ref)
        self.n = n
        self.min_hits = min_hits

    def __call__(self, batch: pa.Table) -> pa.Table:
        hits = np.empty(batch.num_rows, dtype=np.int64)
        for i, text in enumerate(batch["text"].to_pylist()):
            h = _ngram_hashes(text, self.n)
            if h.size == 0 or self.bench.size == 0:
                hits[i] = 0
                continue
            idx = np.searchsorted(self.bench, h)
            idx[idx == self.bench.size] = 0
            hits[i] = int((self.bench[idx] == h).sum())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_overlap_ngrams": pa.array(hits),
                "contaminated": pa.array(hits >= self.min_hits),
            }
        )


def contamination_scan(
    docs_ds: ray.data.Dataset,
    benchmark_ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_hits: int = 1,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_overlap_ngrams, contaminated) for every document."""
    bench_ref = benchmark_ngram_ref(benchmark_ds, n=n)
    # autoscaling pool: min 1 actor so a small cluster's CPUs aren't all
    # pinned by the pool while the upstream read still needs slots
    return docs_ds.map_batches(
        ContaminationScan,
        fn_constructor_args=(bench_ref, n, min_hits),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
    )


def decontaminate(
    docs_ds: ray.data.Dataset,
    benchmark_ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_hits: int = 1,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """The filter form: only uncontaminated documents survive, full rows."""
    bench_ref = benchmark_ngram_ref(benchmark_ds, n=n)

    class Drop(ContaminationScan):
        def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D401
            flags = super().__call__(batch)
            keep = pa.compute.invert(flags["contaminated"])
            return batch.filter(keep)

    return docs_ds.map_batches(
        Drop,
        fn_constructor_args=(bench_ref, n, min_hits),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
    )
