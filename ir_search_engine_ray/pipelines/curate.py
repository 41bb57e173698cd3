"""End-to-end training-data curation pipeline over the ``documents`` table.

The composed form of the extras operators — the pipeline a pre-training data
team actually runs (filter -> dedup -> near-dedup -> account), expressed as
one streaming Ray Data chain:

1. quality + language gate: one fused ``map_batches`` pass computes token
   count, alpha ratio, stopword ratio and the language guess, and filters in
   place (no separate filter stage, no second tokenize);
2. exact dedup: a partition-tagged groupby keyed on the 128-bit content
   hash keeps the minimum doc_id per distinct text — the exchange
   hashes/sorts 16 bytes per row, with the text riding as a value column
   (survivors need no join back and the near-dup stage consumes the text);
3. near-dup removal: MinHash-LSH candidates among survivors, verified
   exact Jaccard (extras/dedup.py), then every doc appearing as the HIGHER
   id of a verified pair is dropped — deterministic, order-free, and
   exactly expressible in SQL for the oracle.  The drop is a DISTRIBUTED
   left-anti join of survivors against the verified pairs' ``doc_b``
   column (``dedup.anti_join_ids``): at web-crawl dup rates the drop list
   is a corpus-scale fraction, so no driver-side id set and no broadcast
   exist anywhere in this pipeline;
4. accounting: surviving (doc_id, n_tokens, n_pieces) — what the kept
   corpus will cost to train on.

Scale shape: stages 1-2 are one map pass + one hash shuffle; stage 3 is
the verify strategy (extras/dedup.py auto-picks broadcast vs partitioned
on the CANDIDATE count) plus one survivor-sized anti-join shuffle; stage 4
re-tokenizes only survivors.  Nothing driver-side grows with the corpus.

Reference scope note: the reference engine has no curation pipeline; this
is part of the beyond-reference training-data mandate (SURVEY.md §2.10a).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

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
    n_alpha = textstats.ascii_alpha_counts(batch["text"])
    keep = (n_tokens >= min_tokens) & (n_alpha / n_chars >= min_alpha_ratio)
    if lang is not None:
        # reuse tok_lists: guess_langs on the already-tokenized docs
        # (lang_id would tokenize every text a second time)
        langs = textstats.guess_langs(tok_lists)
        keep &= np.array([lg == lang for lg in langs])
    return batch.select(["doc_id", "text"]).filter(pa.array(keep))


def _emit_baseline(kept_ds: ray.data.Dataset, out_dir: str) -> None:
    """Append ``kept_ds``'s dedup exports (hashes/, buckets/, sketches/)
    into ``out_dir``.  Guarantees each subdir exists with at least one
    parquet file — Ray's write_parquet emits nothing for an empty
    dataset, and a wave that keeps zero docs must still leave a readable
    (empty) baseline for the next wave's reads."""
    import pyarrow.parquet as _pq
    from pathlib import Path as _Path

    dedup.export_content_hashes(kept_ds).write_parquet(f"{out_dir}/hashes")
    eb, es = dedup.export_neardup_baseline(kept_ds)
    eb.write_parquet(f"{out_dir}/buckets")
    es.write_parquet(f"{out_dir}/sketches")
    empties = {
        "hashes": pa.schema([("h1", pa.int64()), ("h2", pa.int64())]),
        "buckets": pa.schema(
            [("band", pa.int32()), ("bucket", pa.int64()), ("doc_id", pa.int64())]
        ),
        "sketches": pa.schema(
            [("doc_id", pa.int64()), ("sh", pa.large_binary())]
        ),
    }
    for sub, schema in empties.items():
        d = _Path(out_dir) / sub
        d.mkdir(parents=True, exist_ok=True)
        if not any(d.glob("*.parquet")):
            _pq.write_table(schema.empty_table(), d / "empty.parquet")


def exact_survivors(docs_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, text) with the minimum doc_id per distinct text.

    The shuffle KEY is the 128-bit content hash (``dedup._text_hash_cols``)
    — the exchange hashes/sorts 16 bytes per row instead of the full text —
    while the text rides along as a VALUE column (the survivors' text must
    come out of the shuffle anyway: the near-dup stage consumes it).  One
    coarse partition-tagged groupby; inside a partition the min-doc_id per
    (h1, h2) run is a vectorized lexsort + first-of-run mask, no per-group
    Python."""
    P = dedup.N_SHUFFLE_PARTS

    def tag(b: pa.Table) -> pa.Table:
        hb = dedup._text_hash_cols(b.select(["doc_id", "text"]))
        part = (hb["h1"].to_numpy().view(np.uint64) % P).astype(np.int32)
        return hb.append_column("part", pa.array(part))

    def survivors(group: pa.Table) -> pa.Table:
        h1 = group["h1"].to_numpy()
        h2 = group["h2"].to_numpy()
        ids = group["doc_id"].to_numpy()
        order = np.lexsort((ids, h2, h1))
        first = np.ones(order.size, dtype=bool)
        first[1:] = (np.diff(h1[order]) != 0) | (np.diff(h2[order]) != 0)
        return group.select(["doc_id", "text"]).take(pa.array(order[first]))

    return (
        docs_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(survivors, batch_format="pyarrow")
    )


def curate(
    docs_ds: ray.data.Dataset,
    *,
    min_tokens: int = MIN_TOKENS,
    min_alpha_ratio: float = MIN_ALPPHA_RATIO,
    lang: str | None = "en",
    jaccard_threshold: float = JACCARD_THRESHOLD,
    min_logprob: float | None = None,
    max_dup_span_frac: float | None = None,
    span_k: int = 8,
    baseline_hashes: ray.data.Dataset | None = None,
    baseline_neardup: tuple[ray.data.Dataset, ray.data.Dataset] | None = None,
    emit_baseline_dir: str | None = None,
) -> ray.data.Dataset:
    """documents -> curated (doc_id, n_tokens, n_pieces), streaming.

    Two opt-in round-4 gates (both ``None`` by default — the driver
    oracle's staging is unchanged unless enabled):

    - ``min_logprob``: after the quality gate, drop docs whose mean
      unigram log-probability under the gated corpus's own distribution
      (:func:`..extras.textstats.unigram_logprob`) falls below the
      threshold — the LM-quality filter slot.
    - ``max_dup_span_frac``: after near-dup removal, drop docs where
      duplicated cross-doc ``span_k``-gram spans
      (:func:`..extras.spans.exact_span_dedup`) cover more than this
      fraction of the doc's tokens — the boilerplate-mass gate.  The
      flag set is computed with a native per-doc Sum aggregate over the
      tagged union of the accounting and span tables, then applied as
      the same distributed anti-join as the near-dup drop — still no
      driver-side id structure anywhere.

    Incremental-ingest gates (opt-in, for curating a NEW shard into an
    already-curated corpus; both are the persisted exports of
    ``extras.dedup`` so the old corpus is never re-read):

    - ``baseline_hashes``: (h1, h2) content-hash export
      (:func:`..extras.dedup.export_content_hashes`); exact-dup survivors
      whose content already exists in the baseline are dropped via
      :func:`..extras.dedup.ids_in_baseline` + the standard anti-join.
    - ``baseline_neardup``: (buckets, sketches) export
      (:func:`..extras.dedup.export_neardup_baseline`); survivors that
      near-match a baseline doc at ``jaccard_threshold``
      (:func:`..extras.dedup.minhash_pairs_against`) are dropped the
      same way — in addition to the within-shard near-dup drop.
    - ``emit_baseline_dir``: after the drops, write THIS run's kept docs'
      exports (``hashes/``, ``buckets/``, ``sketches/``) into the
      directory — appending new files next to any existing ones, so the
      same directory is a ROLLING baseline: each wave curates against it
      and then adds its own survivors for the next wave.  (Parquet row
      sets union by directory; export parameters must stay constant
      across waves.)"""
    gated = docs_ds.map_batches(
        quality_lang_gate,
        fn_kwargs={
            "min_tokens": min_tokens,
            "min_alpha_ratio": min_alpha_ratio,
            "lang": lang,
        },
        batch_format="pyarrow",
    )
    if min_logprob is not None:
        from ..extras import textstats as _ts

        # unigram_logprob consumes its input twice (count pass + scoring
        # pass): cache the gate once for it and the downstream stages
        gated = gated.materialize()
        if gated.count() == 0:
            # nothing survived the quality gate: skip the logprob pass
            # (whose corpus-distribution fit would raise on zero tokens).
            # A rolling baseline must still be (re)created on this path so
            # the next wave's reads find it.
            if emit_baseline_dir is not None:
                _emit_baseline(gated, emit_baseline_dir)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([], type=pa.int64()),
                        "n_tokens": pa.array([], type=pa.int64()),
                        "n_pieces": pa.array([], type=pa.int64()),
                    }
                )
            )
        thr = float(min_logprob)

        def low_ids(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.select(["doc_id"]).filter(pc.less(b["logprob"], thr))

        low = _ts.unigram_logprob(gated).map_batches(
            low_ids, batch_format="pyarrow"
        )
        gated = dedup.anti_join_ids(gated, low, on="doc_id", ids_col="doc_id")
    # survivors feed THREE consumers (LSH signatures, the verify's doc
    # side, the anti-join's left side); without materializing, Ray's lazy
    # execution re-runs the gate + dedup shuffle once per consumer.  Blocks
    # stay in the (spillable) object store — cache beats recompute here.
    survivors = exact_survivors(gated).materialize()
    if baseline_hashes is not None:
        seen = dedup.ids_in_baseline(survivors, baseline_hashes)
        survivors = dedup.anti_join_ids(
            survivors, seen, on="doc_id", ids_col="doc_id"
        ).materialize()
    pairs = dedup.verify_jaccard(
        dedup.minhash_lsh_pairs(survivors, dedupe=False), survivors,
        threshold=jaccard_threshold,
    )
    # distributed left-anti join: drop the doc_b side of every verified
    # pair — NO driver-collected id structure anywhere in the curate DAG
    kept = dedup.anti_join_ids(survivors, pairs, on="doc_id", ids_col="doc_b")
    if baseline_neardup is not None:
        base_buckets, base_sketches = baseline_neardup
        cross = dedup.minhash_pairs_against(
            survivors, base_buckets, base_sketches,
            threshold=jaccard_threshold,
        )
        # the NEW doc is the pair's doc_a side here
        kept = dedup.anti_join_ids(kept, cross, on="doc_id", ids_col="doc_a")
    if emit_baseline_dir is not None:
        # kept feeds the exports AND the accounting below: cache once
        kept = kept.materialize()
        _emit_baseline(kept, emit_baseline_dir)

    def account(batch: pa.Table) -> pa.Table:
        toks = textstats.token_count(batch)
        pieces = textstats.token_count_bpe(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": toks["n_tokens"],
                "n_pieces": pieces["n_pieces"],
            }
        )

    if max_dup_span_frac is None:
        return kept.map_batches(account, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    from ..extras import spans as _spans

    # kept feeds both the accounting and the span scan
    kept = kept.materialize()
    accounted = kept.map_batches(account, batch_format="pyarrow")
    span_stats = _spans.exact_span_dedup(
        kept.select_columns(["doc_id", "text"]), k=span_k
    )

    def tag_tok(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        return pa.table(
            {"doc_id": b["doc_id"], "n_tok": b["n_tokens"], "dup_tok": z}
        )

    def tag_dup(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        return pa.table(
            {"doc_id": b["doc_id"], "n_tok": z, "dup_tok": b["dup_tokens"]}
        )

    merged = (
        accounted.map_batches(tag_tok, batch_format="pyarrow")
        .union(span_stats.map_batches(tag_dup, batch_format="pyarrow"))
        .groupby("doc_id")
        .aggregate(Sum("n_tok"), Sum("dup_tok"))
    )
    frac = float(max_dup_span_frac)

    def flagged_ids(b: pa.Table) -> pa.Table:
        n = b["sum(n_tok)"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = b["sum(dup_tok)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        keep = d > frac * np.maximum(n, 1.0)
        return b.select(["doc_id"]).filter(pa.array(keep))

    flagged = merged.map_batches(flagged_ids, batch_format="pyarrow")
    return dedup.anti_join_ids(
        accounted, flagged, on="doc_id", ids_col="doc_id"
    )
