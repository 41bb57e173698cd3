"""End-to-end training-data curation pipeline over the ``documents`` table.

The composed form of the extras operators — the pipeline a pre-training data
team actually runs (filter -> dedup -> near-dedup -> account), expressed as
one streaming Ray Data chain:

1. quality + language gate: one fused ``map_batches`` pass computes token
   count, alpha ratio, stopword ratio and the language guess, and filters in
   place (no separate filter stage, no second tokenize);
2. exact dedup: ``groupby(text)`` keeps the minimum doc_id per distinct
   text (the group key IS the text, so survivors need no join back);
3. near-dup removal: MinHash-LSH candidates among survivors, join-verified
   exact Jaccard (extras/dedup.py), then every doc appearing as the HIGHER
   id of a verified pair is dropped — deterministic, order-free, and
   exactly expressible in SQL for the oracle;
4. accounting: surviving (doc_id, n_tokens, n_pieces) — what the kept
   corpus will cost to train on.

Scale shape: stages 1-2 are one map pass + one hash shuffle; stage 3's drop
set is bounded by the near-duplicate count (pairs, not corpus — broadcast
via ``ray.put``); stage 4 re-tokenizes only survivors.  Nothing driver-side
grows with corpus size except the near-dup id set.

Reference scope note: the reference engine has no curation pipeline; this
is part of the beyond-reference training-data mandate (SURVEY.md §2.10a).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min

from ..extras import dedup, textstats

# defaults chosen to be meaningful on the synthetic documents table:
# drop ultra-short docs, keep mostly-alphabetic prose, keep English
MIN_TOKENS = 5
MIN_ALPPHA_RATIO = 0.5
JACCARD_THRESHOLD = 0.5


def quality_lang_gate(
    batch: pa.Table,
    *,
    min_tokens: int = MIN_TOKENS,
    min_alpha_ratio: float = MIN_ALPPHA_RATIO,
    lang: str | None = "en",
) -> pa.Table:
    """Fused quality+language filter: one tokenize pass per batch."""
    texts = batch["text"].to_pylist()
    tok_lists = [textstats._tokens(t) for t in texts]
    n_tokens = np.array([len(ts) for ts in tok_lists], dtype=np.int64)
    n_chars = np.maximum(
        np.array([len(t) for t in texts], dtype=np.int64), 1
    )
    # ASCII letters only (not str.isalpha): keeps the ratio exactly
    # reproducible by the SQL oracle's [a-zA-Z] regexp
    n_alpha = np.array(
        [sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in t) for t in texts],
        dtype=np.int64,
    )
    keep = (n_tokens >= min_tokens) & (n_alpha / n_chars >= min_alpha_ratio)
    if lang is not None:
        langs = textstats.lang_id(batch)["lang_guess"].to_pylist()
        keep &= np.array([lg == lang for lg in langs])
    return batch.select(["doc_id", "text"]).filter(pa.array(keep))


def exact_survivors(docs_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, text) with the minimum doc_id per distinct text.

    Groups on the text itself because the survivors' TEXT must come out of
    the shuffle anyway (the near-dup stage consumes it) — unlike
    ``dedup.exact_dedup``, which groups on a 128-bit content hash and never
    moves text bytes when only ids/counts are needed."""
    g = docs_ds.groupby("text").aggregate(Min("doc_id"))
    return g.map_batches(
        lambda b: pa.table({"doc_id": b["min(doc_id)"], "text": b["text"]}),
        batch_format="pyarrow",
    )


def neardup_drop_ids(
    docs_ds: ray.data.Dataset, *, threshold: float = JACCARD_THRESHOLD
) -> np.ndarray:
    """doc_ids to drop: the doc_b side of every verified near-dup pair.

    Bounded by the number of near-duplicate PAIRS (not the corpus); the
    unique-id set is what gets broadcast back into the filter stage."""
    pairs = dedup.verify_jaccard(
        dedup.minhash_lsh_pairs(docs_ds), docs_ds, threshold=threshold
    )
    drop: set[int] = set()
    for b in pairs.select_columns(["doc_b"]).iter_batches(batch_format="pyarrow"):
        drop.update(b["doc_b"].to_pylist())
    return np.array(sorted(drop), dtype=np.int64)


def curate(
    docs_ds: ray.data.Dataset,
    *,
    min_tokens: int = MIN_TOKENS,
    min_alpha_ratio: float = MIN_ALPPHA_RATIO,
    lang: str | None = "en",
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> ray.data.Dataset:
    """documents -> curated (doc_id, n_tokens, n_pieces), streaming."""
    gated = docs_ds.map_batches(
        quality_lang_gate,
        fn_kwargs={
            "min_tokens": min_tokens,
            "min_alpha_ratio": min_alpha_ratio,
            "lang": lang,
        },
        batch_format="pyarrow",
    )
    # survivors feed THREE consumers (LSH signatures, the verify join's doc
    # side, the final accounting pass); without materializing, Ray's lazy
    # execution re-runs the gate + dedup shuffle once per consumer.  Blocks
    # stay in the (spillable) object store — cache beats recompute here.
    survivors = exact_survivors(gated).materialize()
    drop = neardup_drop_ids(survivors, threshold=jaccard_threshold)
    drop_ref = ray.put(pa.array(drop))

    def account(batch: pa.Table) -> pa.Table:
        drop_arr = ray.get(drop_ref) if isinstance(drop_ref, ray.ObjectRef) else drop_ref
        if len(drop_arr):
            batch = batch.filter(
                pc.invert(pc.is_in(batch["doc_id"], value_set=drop_arr))
            )
        toks = textstats.token_count(batch)
        pieces = textstats.token_count_bpe(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": toks["n_tokens"],
                "n_pieces": pieces["n_pieces"],
            }
        )

    return survivors.map_batches(account, batch_format="pyarrow")
