"""Command-line entry points (`ray job submit`-able).

    python -m ir_search_engine_ray build  TRANSCRIPTS OUT [--mode ...] ...
    python -m ir_search_engine_ray query  INDEX_DIR "text" [--phrase|--explain|--snippet]
    python -m ir_search_engine_ray batch-query INDEX_DIR QUERIES.parquet [...]
    python -m ir_search_engine_ray ingest-docs CORPUS_DIR OUT
    python -m ir_search_engine_ray dedup DOCUMENTS.parquet OUT --method ...
    python -m ir_search_engine_ray curate DOCUMENTS.parquet OUT [...]
    python -m ir_search_engine_ray pii DOCUMENTS.parquet OUT [--redact-only]
    python -m ir_search_engine_ray decontam DOCUMENTS.parquet BENCH.parquet OUT
    python -m ir_search_engine_ray pack DOCUMENTS.parquet OUT --max-tokens 2048
    python -m ir_search_engine_ray stats INDEX_DIR [--term flow]
    python -m ir_search_engine_ray fuzzy INDEX_DIR "probe terms" [--max-edits 2]
    python -m ir_search_engine_ray export INDEX_DIR OUT --format gamma

On a cluster: ``ray job submit --working-dir . -- python -m
ir_search_engine_ray build s3://.../transcripts /mnt/index``.  The CLI owns
the Ray session (guarded init so it also composes with an already-running
driver); the library itself never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")


def _cmd_build(args) -> None:
    from .config import IndexConfig
    from .pipelines.index_build import build_index

    _ensure_ray()
    meta = build_index(
        args.transcripts,
        args.out,
        IndexConfig(
            mode=args.mode,
            salt_buckets=args.salt_buckets,
            tokenize_batch_size=args.batch_size,
            attr_cols=tuple(args.attrs.split(",")) if args.attrs else (),
        ),
        append=args.append,
    )
    payload = {
        "out_dir": str(meta.out_dir),
        "N": meta.N,
        "n_terms": meta.n_terms,
        "n_postings": meta.n_postings,
        "avg_doc_len": meta.avg_doc_len,
        "salt_buckets": meta.salt_buckets,
    }
    if getattr(args, "positions", False):
        from .pipelines.positions import build_positions

        pm = build_positions(meta.out_dir)
        payload["positions_rows"] = pm["n_rows"]
    print(json.dumps(payload))


def _engine(args):
    from .config import QueryConfig
    from .pipelines.index_build import IndexMeta
    from .pipelines.query import QueryEngine

    meta = IndexMeta.load(args.index_dir)
    cfg = QueryConfig(
        scheme=args.scheme,
        top_k=args.k,
        num_actors=args.actors,
        algorithm=args.algorithm,
    )
    return QueryEngine(meta, cfg)


def _headlines(eng, rows: list[dict]) -> None:
    """Annotate result rows with a 60-char headline from the source turn —
    the reference Driver's result formatting (rank, name, score, headline;
    ``search/Driver.java:88-105``).  Reads ONLY the result conversations
    from the index's recorded input lineage (predicate pushdown)."""
    import pyarrow.parquet as pq

    stats = json.loads((eng.meta.out_dir / "stats.json").read_text())
    paths = [ln["path"] for ln in stats["lineage"]]
    need = sorted({r["conv_id"] for r in rows})
    if not need:
        return
    t = pq.read_table(
        paths,
        columns=["conv_id", "turn_idx", "text"],
        filters=[("conv_id", "in", need)],
    )
    by_key = dict(
        zip(
            zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()),
            t["text"].to_pylist(),
        )
    )
    for r in rows:
        r["headline"] = by_key[(r["conv_id"], r["turn_idx"])][:60]


def _parse_filters(specs: list[str] | None) -> dict | None:
    """--filter role=user --filter tool=search,calculator -> dict."""
    if not specs:
        return None
    filters: dict[str, list[str]] = {}
    for spec in specs:
        col, _, val = spec.partition("=")
        if not col or not val:
            raise SystemExit(f"--filter wants col=value, got {spec!r}")
        filters.setdefault(col, []).extend(val.split(","))
    return filters


def _cmd_query(args) -> None:
    _ensure_ray()
    eng = _engine(args)
    filters = _parse_filters(args.filter)
    if args.slop and not args.phrase:
        raise SystemExit("--slop requires --phrase")
    if args.phrase:
        rows = eng.phrase_query(args.text, args.scheme, args.k,
                                filters=filters, slop=args.slop,
                                fuzzy=args.fuzzy)
    elif args.explain:
        rows = eng.explain(args.text, args.scheme, args.k,
                           filters=filters, fuzzy=args.fuzzy)
    else:
        rows = eng.query(args.text, args.scheme, args.k, args.algorithm,
                         filters=filters, fuzzy=args.fuzzy)
    if args.snippet:
        _headlines(eng, rows)
    for r in rows:
        print(json.dumps(r))


def _cmd_batch_query(args) -> None:
    import pyarrow.parquet as pq

    _ensure_ray()
    eng = _engine(args)
    t = pq.read_table(args.queries)
    texts = t["text"].to_pylist()
    qids = (
        t["query_id"].to_pylist() if "query_id" in t.schema.names
        else list(range(len(texts)))
    )
    all_results = eng.query_many(
        texts, filters=_parse_filters(args.filter), fuzzy=args.fuzzy
    )
    if args.snippet:
        flat = [r for rows in all_results for r in rows]
        _headlines(eng, flat)
    for qid, results in zip(qids, all_results):
        for r in results:
            print(json.dumps({"query_id": qid, **r}))


def _cmd_ingest_docs(args) -> None:
    from .sources.transcripts import docs_dir_to_transcripts

    _fresh_out_dir(args.out, args.overwrite)
    _ensure_ray()
    out = docs_dir_to_transcripts(args.docs_dir, args.out, glob=args.glob)
    import pyarrow.parquet as pq

    n = pq.read_table(out, columns=["conv_id"]).num_rows
    print(json.dumps({"out": out, "n_docs": n}))


def _cmd_ingest_jsonl(args) -> None:
    from .sources.transcripts import jsonl_to_transcripts

    _fresh_out_dir(args.out, args.overwrite)
    _ensure_ray()
    out = jsonl_to_transcripts(
        args.jsonl_path,
        args.out,
        glob=args.glob,
        text_field=args.text_field,
        id_field=args.id_field,
    )
    import pyarrow.parquet as pq

    n = pq.read_table(out, columns=["conv_id"]).num_rows
    print(json.dumps({"out": out, "n_docs": n}))


def _fresh_out_dir(path: str, overwrite: bool) -> None:
    """Refuse to append into a non-empty output dir: a re-run of
    ``write_parquet`` would otherwise ADD files next to the old ones and
    silently double the data."""
    import shutil
    from pathlib import Path

    p = Path(path)
    # recursive: exports like neardup-export land parquet in SUBDIRS
    if p.exists() and any(p.glob("**/*.parquet")):
        if not overwrite:
            raise SystemExit(
                f"output dir {path} already holds parquet files; "
                "pass --overwrite to replace it"
            )
        shutil.rmtree(p)


def _cmd_dedup(args) -> None:
    import ray.data

    _ensure_ray()
    from .extras import dedup

    _fresh_out_dir(args.out, args.overwrite)
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    if args.method == "exact" and args.baseline:
        base = ray.data.read_parquet(args.baseline, override_num_blocks=8)
        if {"h1", "h2"} <= set(base.schema().names):
            hashes = base  # a prior hash-export
        else:
            hashes = dedup.export_content_hashes(base)
        out = dedup.exact_dedup_against(docs, hashes)
    elif args.method == "exact":
        out = dedup.exact_dedup(docs)
    elif args.method == "hash-export":
        out = dedup.export_content_hashes(docs)
    elif args.method == "neardup-export":
        buckets, sketches = dedup.export_neardup_baseline(docs)
        buckets.write_parquet(f"{args.out}/buckets")
        sketches.write_parquet(f"{args.out}/sketches")
        import pyarrow.parquet as pq

        print(
            json.dumps(
                {
                    "method": args.method,
                    "out": args.out,
                    "n_rows": pq.read_table(
                        f"{args.out}/sketches", columns=["doc_id"]
                    ).num_rows,
                }
            )
        )
        return
    elif args.method == "minhash" and args.baseline:
        base_buckets = ray.data.read_parquet(f"{args.baseline}/buckets")
        base_sketches = ray.data.read_parquet(f"{args.baseline}/sketches")
        out = dedup.minhash_pairs_against(
            docs, base_buckets, base_sketches, threshold=args.threshold
        )
    elif args.method == "exact-normalized":
        out = dedup.exact_dedup_normalized(docs)
    elif args.method == "minhash":
        pairs = dedup.minhash_lsh_pairs(docs, dedupe=False)
        out = dedup.verify_jaccard(pairs, docs, threshold=args.threshold)
    elif args.method == "jaccard":
        out = dedup.ngram_jaccard_pairs(docs, threshold=args.threshold)
    elif args.method == "simhash":
        out = dedup.simhash_candidate_pairs(docs, max_hamming=args.max_hamming)
    elif args.method == "spans":
        from .extras.spans import exact_span_dedup

        out = exact_span_dedup(
            docs.select_columns(["doc_id", "text"]), k=args.span_k
        )
    else:  # clusters
        pairs = dedup.verify_jaccard(
            dedup.minhash_lsh_pairs(docs, dedupe=False), docs, threshold=args.threshold
        )
        out = dedup.connected_components(pairs)
    out.write_parquet(args.out)
    import pyarrow.parquet as pq

    from pathlib import Path as _Path

    # an all-duplicates incremental run is legitimately empty, and
    # write_parquet emits no files for an empty dataset
    if any(_Path(args.out).glob("*.parquet")):
        n_rows = pq.read_table(args.out).num_rows
    else:
        n_rows = 0
    print(json.dumps({"method": args.method, "out": args.out, "n_rows": n_rows}))


def _cmd_curate(args) -> None:
    import ray.data

    _ensure_ray()
    from .pipelines.curate import curate

    _fresh_out_dir(args.out, args.overwrite)
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    baseline_hashes = (
        ray.data.read_parquet(args.baseline_hashes)
        if args.baseline_hashes
        else None
    )
    baseline_neardup = (
        (
            ray.data.read_parquet(f"{args.baseline_neardup}/buckets"),
            ray.data.read_parquet(f"{args.baseline_neardup}/sketches"),
        )
        if args.baseline_neardup
        else None
    )
    out = curate(
        docs,
        min_tokens=args.min_tokens,
        min_alpha_ratio=args.min_alpha_ratio,
        lang=None if args.lang == "any" else args.lang,
        jaccard_threshold=args.jaccard,
        min_logprob=args.min_logprob,
        max_dup_span_frac=args.max_dup_span_frac,
        baseline_hashes=baseline_hashes,
        baseline_neardup=baseline_neardup,
        emit_baseline_dir=args.emit_baseline,
    )
    out.write_parquet(args.out)
    import pyarrow.parquet as pq
    from pathlib import Path as _Path

    # a fully-deduped incremental shard is legitimately empty
    if any(_Path(args.out).glob("*.parquet")):
        t = pq.read_table(args.out, columns=["n_tokens"])
        n_docs = t.num_rows
        total = int(
            __import__("pyarrow").compute.sum(t["n_tokens"]).as_py() or 0
        )
    else:
        n_docs, total = 0, 0
    print(
        json.dumps(
            {"out": args.out, "n_docs": n_docs, "total_tokens": total}
        )
    )


def _cmd_freq(args) -> None:
    """Exact heavy hitters over a parquet column (count > floor(phi*n));
    --tokens treats the column as text and counts its simple-split token
    stream instead of whole values.  Bounded result -> JSON lines."""
    import ray.data

    _ensure_ray()
    from .extras import sketches

    ds = ray.data.read_parquet(
        args.parquet, columns=[args.col], override_num_blocks=16
    )
    col = args.col
    if args.tokens:
        import re

        import pyarrow as pa

        tok = re.compile(r"[a-z]+")
        src_col = col

        def to_terms(batch):
            out = []
            for text in batch[src_col].to_pylist():
                out.extend(tok.findall(text.lower()))
            return pa.table({"term": pa.array(out, type=pa.string())})

        ds = ds.map_batches(to_terms, batch_format="pyarrow")
        col = "term"
    t = sketches.frequent_items(
        ds, col, phi=args.phi, counters=args.counters
    )
    for item, cnt in zip(t[col].to_pylist(), t["cnt"].to_pylist()):
        print(json.dumps({col: item, "cnt": cnt}))


def _parse_weights(spec: str) -> list[tuple[str, int]]:
    """'name=int,name=int' -> ordered pairs; shared by split and mix."""
    pairs = []
    for part in spec.split(","):
        name, _, w = part.partition("=")
        if not name or not w:
            raise SystemExit(
                f"malformed weights entry {part!r}: expected name=integer"
            )
        pairs.append((name, int(w)))
    return pairs


def _dir_row_count(path) -> int:
    """Row count of a parquet dir from FOOTER metadata only — no data
    read (the _tree_stats discipline)."""
    import pyarrow.parquet as pq
    from pathlib import Path

    return sum(
        pq.read_metadata(f).num_rows for f in Path(path).glob("*.parquet")
    )


def _cmd_split(args) -> None:
    """Deterministic weighted split assignment, written as hive
    partitions (one directory per split -> selective later reads)."""
    import ray.data

    _ensure_ray()
    from .extras import splits as _splits

    _fresh_out_dir(args.out, args.overwrite)
    pairs = _parse_weights(args.weights)
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    out = _splits.assign_splits(
        docs, splits=tuple(pairs), seed=args.seed
    )
    out.write_parquet(args.out, partition_cols=["split"])
    from pathlib import Path

    counts = {}
    for name, _w in pairs:
        part_dir = Path(args.out) / f"split={name}"
        counts[name] = _dir_row_count(part_dir) if part_dir.exists() else 0
    print(json.dumps({"out": args.out, "n_docs": counts}))


def _cmd_mix(args) -> None:
    """Target-proportion data mixing: sample each stratum toward
    weights_ppm/1e6 * total docs (small strata kept whole)."""
    import ray.data

    _ensure_ray()
    from .extras import splits as _splits

    _fresh_out_dir(args.out, args.overwrite)
    weights = dict(_parse_weights(args.weights))
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    out = _splits.target_mix_sample(
        docs, by=args.by, weights_ppm=weights, total=args.total
    )
    out.write_parquet(args.out)
    n = _dir_row_count(args.out)
    print(json.dumps({"out": args.out, "n_docs": n, "total_target": args.total}))


def _cmd_pmi(args) -> None:
    """Top bigram collocations of a documents table by PMI (ties by
    count desc, ngram asc) — bounded result -> JSON lines."""
    import ray.data

    _ensure_ray()
    from .extras import textstats

    docs = ray.data.read_parquet(
        args.documents, columns=["doc_id", "text"], override_num_blocks=16
    )
    # distributed sort + limit: only the top rows ever reach the driver
    # (a web-scale bigram vocabulary must not to_pandas in full)
    out = (
        textstats.bigram_pmi(docs, min_count=args.min_count)
        .sort(["pmi", "count", "ngram"], descending=[True, True, False])
        .limit(args.top)
        .to_pandas()
        .sort_values(
            ["pmi", "count", "ngram"],
            ascending=[False, False, True],
            ignore_index=True,
        )
    )
    for r in out.itertuples(index=False):
        print(
            json.dumps(
                {"ngram": r.ngram, "count": int(r.count), "pmi": r.pmi}
            )
        )


def _cmd_quantiles(args) -> None:
    """Quantiles of a parquet column: exact distinct-value-histogram path
    by default, or the bounded-memory sampled sketch with --sample."""
    import ray.data

    _ensure_ray()
    from .extras import aggregates, sketches

    qs = tuple(float(x) for x in args.qs.split(","))
    if args.sample:
        ds = ray.data.read_parquet(
            args.parquet, columns=[args.id_col, args.col],
            override_num_blocks=16,
        )
        t = sketches.sampled_quantiles(
            ds, args.col, id_col=args.id_col, qs=qs, sample=args.sample
        )
    else:
        ds = ray.data.read_parquet(
            args.parquet, columns=[args.col], override_num_blocks=16
        )
        t = aggregates.exact_quantiles(ds, args.col, qs=qs)
    for q, v in zip(t["quantile"].to_pylist(), t["value"].to_pylist()):
        print(json.dumps({"quantile": q, "value": v}))


def _cmd_distinct(args) -> None:
    """Approximate COUNT(DISTINCT col) via the HyperLogLog sketch —
    global, or per group with --by.  Bounded result -> JSON lines."""
    import ray.data

    _ensure_ray()
    from .extras import sketches

    cols = [args.col] + ([args.by] if args.by else [])
    ds = ray.data.read_parquet(
        args.parquet, columns=cols, override_num_blocks=16
    )
    if args.by:
        t = sketches.hll_distinct_by(ds, args.col, args.by, p=args.p)
        for row in t.to_pandas().sort_values(args.by).to_dict("records"):
            print(json.dumps(
                {args.by: row[args.by], "estimate": int(row["estimate"]),
                 "p": int(row["p"])}
            ))
    else:
        t = sketches.hll_distinct(ds, args.col, p=args.p)
        print(json.dumps(
            {"estimate": t["estimate"][0].as_py(), "p": t["p"][0].as_py()}
        ))


def _cmd_pii(args) -> None:
    import ray.data

    _ensure_ray()
    from .extras import pii

    _fresh_out_dir(args.out, args.overwrite)
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    out = docs.map_batches(pii.pii_scan, batch_format="pyarrow")
    if args.redact_only:
        out = out.select_columns(["doc_id", "text_redacted"])
    out.write_parquet(args.out)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if args.redact_only:
        n_docs = pq.read_table(args.out, columns=["doc_id"]).num_rows
        print(json.dumps({"out": args.out, "n_docs": n_docs}))
    else:
        t = pq.read_table(args.out, columns=["n_pii"])
        print(
            json.dumps(
                {
                    "out": args.out,
                    "n_docs": t.num_rows,
                    "total_pii": int(pc.sum(t["n_pii"]).as_py() or 0),
                }
            )
        )


def _cmd_decontam(args) -> None:
    import ray.data

    _ensure_ray()
    from .extras import decontam

    _fresh_out_dir(args.out, args.overwrite)
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    bench = ray.data.read_parquet(args.benchmark)
    if args.scan_only:
        out = decontam.contamination_scan(
            docs, bench, n=args.ngram, min_hits=args.min_hits
        )
    else:
        out = decontam.decontaminate(
            docs, bench, n=args.ngram, min_hits=args.min_hits
        )
    out.write_parquet(args.out)
    import pyarrow.parquet as pq

    n = pq.read_table(args.out, columns=["doc_id"]).num_rows
    print(json.dumps({"out": args.out, "n_rows": n, "scan": args.scan_only}))


def _cmd_pack(args) -> None:
    import ray.data

    _ensure_ray()
    from .extras import packing

    _fresh_out_dir(args.out, args.overwrite)
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    out = packing.pack_sequences(docs, max_tokens=args.max_tokens)
    out.write_parquet(args.out)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(args.out, columns=["seq_id_end", "n_tokens"])
    print(
        json.dumps(
            {
                "out": args.out,
                "n_docs": t.num_rows,
                "n_sequences": int(pc.max(t["seq_id_end"]).as_py() or 0) + 1,
                "total_tokens": int(pc.sum(t["n_tokens"]).as_py() or 0),
                "max_tokens": args.max_tokens,
            }
        )
    )


def _cmd_chunk(args) -> None:
    import ray.data

    _ensure_ray()
    from .extras import packing

    _fresh_out_dir(args.out, args.overwrite)
    docs = ray.data.read_parquet(args.documents, override_num_blocks=16)
    out = packing.chunk_documents(
        docs, window=args.window, stride=args.stride
    )
    out.write_parquet(args.out)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(args.out, columns=["doc_id", "n_tokens"])
    print(
        json.dumps(
            {
                "out": args.out,
                "n_chunks": t.num_rows,
                "n_docs": len(pc.unique(t["doc_id"])),
                "total_tokens": int(pc.sum(t["n_tokens"]).as_py() or 0),
                "window": args.window,
                "stride": args.stride,
            }
        )
    )


def _cmd_export(args) -> None:
    from .pipelines.index_build import IndexMeta
    from .sources.legacy_export import export_legacy_index

    meta = IndexMeta.load(args.index_dir)
    print(json.dumps(export_legacy_index(meta, args.out, args.format)))


def _cmd_ann_build(args) -> None:
    import ray.data

    _ensure_ray()
    from .extras.ann_index import build_ann_index

    emb = ray.data.read_parquet(
        args.embeddings,
        columns=[args.id_col, "embedding"],
        override_num_blocks=16,
    )
    marker = build_ann_index(
        emb, args.out, nlist=args.nlist, id_col=args.id_col
    )
    print(json.dumps({"out": args.out, **marker}))


def _cmd_ann_append(args) -> None:
    import ray.data

    _ensure_ray()
    from .extras.ann_index import AnnIndex, append_ann_index

    id_col = AnnIndex(args.index_dir).meta["id_col"]
    emb = ray.data.read_parquet(
        args.embeddings,
        columns=[id_col, "embedding"],
        override_num_blocks=16,
    )
    marker = append_ann_index(
        emb, args.index_dir, retrain_frac=args.retrain_frac
    )
    print(json.dumps({"out": args.index_dir, **marker}))


def _cmd_ann_query(args) -> None:
    import numpy as np
    import pyarrow.parquet as pq

    _ensure_ray()
    from .extras.ann_index import AnnIndex

    idx = AnnIndex(args.index_dir)
    id_col = idx.meta["id_col"]
    t = pq.read_table(
        args.embeddings, columns=[id_col, "embedding"],
        filters=[(id_col, "==", args.vec_id)],
    )
    if t.num_rows != 1:
        raise SystemExit(f"{id_col}={args.vec_id}: {t.num_rows} rows found")
    q = np.array(t["embedding"][0].as_py(), dtype=np.float64)
    out = idx.query(q, k=args.k, nprobe=args.nprobe, exclude=args.vec_id)
    for r in out.to_pylist():
        print(json.dumps(r))


def _cmd_fuzzy(args) -> None:
    """SymSpell fuzzy lookup of probe terms against the index vocabulary —
    the index's df parts are exactly the (term, df) table the lookup
    streams, so this is a map-only scan of the lexicon, never the corpus."""
    _ensure_ray()
    from pathlib import Path

    import ray.data

    from .extras.fuzzy import fuzzy_vocab_lookup

    vocab = ray.data.read_parquet(str(Path(args.index_dir) / "df"))
    out = fuzzy_vocab_lookup(
        vocab, args.terms.split(), max_edits=args.max_edits
    )
    rows = sorted(
        out.take_all(),
        key=lambda r: (r["query"], r["dist"], -r["df"], r["term"]),
    )
    for r in rows:
        print(json.dumps(r))


def _cmd_stats(args) -> None:
    """Index inspection (the reference's stats.md surface): collection
    stats, optionally one term's df/tf and coded size."""
    from .functions.codec import decode_postings
    from .pipelines.index_build import IndexMeta

    meta = IndexMeta.load(args.index_dir)
    out = {
        "N": meta.N,
        "n_terms": meta.n_terms,
        "n_postings": meta.n_postings,
        "avg_doc_len": meta.avg_doc_len,
        "total_doc_len": meta.total_doc_len,
        "salt_buckets": meta.salt_buckets,
        "mode": meta.mode,
    }
    from pathlib import Path

    from .pipelines.positions import positions_available

    attrs = Path(args.index_dir) / "attrs"
    out["sidecars"] = {
        "positions": positions_available(args.index_dir),
        "attrs": attrs.is_dir(),
    }
    if args.term:
        import pyarrow.parquet as pq

        df = tf = coded = 0
        for f in meta.shard_files():
            t = pq.read_table(f)
            for term, idb, tfb in zip(
                t["term"].to_pylist(),
                t["id_bytes"].to_pylist(),
                t["tf_bytes"].to_pylist(),
            ):
                if term == args.term:
                    ids, tfs = decode_postings(idb, tfb)
                    df += len(ids)
                    tf += int(tfs.sum())
                    coded += len(idb) + len(tfb)
        out["term"] = {
            "term": args.term, "df": df, "tf": tf, "coded_bytes": coded,
            "uncoded_bytes": 16 * df,
        }
    print(json.dumps(out))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="ir_search_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) the index")
    b.add_argument("transcripts")
    b.add_argument("out")
    b.add_argument("--mode", default="full",
                   choices=("full", "full_nostem", "full_lemma", "simple"))
    b.add_argument("--salt-buckets", type=int, default=32)
    b.add_argument("--batch-size", type=int, default=None,
                   help="tokenize batch size; default auto (n/64 clamped)")
    b.add_argument("--append", action="store_true",
                   help="extend an existing index with NEW input files only "
                        "(delta cost; config is taken from the index)")
    b.add_argument("--attrs", default=None,
                   help="comma-separated input columns to index as "
                        "filterable doc attributes (e.g. role,tool)")
    b.add_argument("--positions", action="store_true",
                   help="also build/refresh the positional sidecar (phrase "
                        "verify in O(postings), no corpus re-read; opt-in — "
                        "the sidecar is token-stream-sized)")
    b.set_defaults(fn=_cmd_build)

    def query_args(q):
        q.add_argument("index_dir")
        q.add_argument("--scheme", default="w2", choices=("w1", "w2"))
        q.add_argument("--k", type=int, default=10)
        q.add_argument("--actors", type=int, default=4)
        q.add_argument(
            "--algorithm",
            default="block_max_wand",
            choices=("exhaustive", "maxscore", "block_max_wand"),
        )
        q.add_argument("--snippet", action="store_true",
                       help="add a 60-char headline from the source turn")

    q = sub.add_parser("query", help="one query -> top-k JSON lines")
    query_args(q)
    q.add_argument("text")
    q.add_argument("--filter", action="append", metavar="COL=VAL[,VAL...]",
                   help="restrict to docs matching an attribute (index "
                        "must be built with --attrs); repeatable")
    q.add_argument("--explain", action="store_true",
                   help="include per-term score contributions")
    q.add_argument("--phrase", action="store_true",
                   help="match the text as a contiguous normalized phrase")
    q.add_argument("--slop", type=int, default=0, metavar="N",
                   help="with --phrase: allow the terms (in order) to span "
                        "up to N extra token positions (0 = contiguous)")
    q.add_argument("--fuzzy", action="store_true",
                   help="rewrite out-of-vocabulary query terms to their "
                        "closest indexed term (edit distance 1) first")
    q.set_defaults(fn=_cmd_query)

    bq = sub.add_parser("batch-query", help="parquet query set -> JSON lines")
    query_args(bq)
    bq.add_argument("queries", help="parquet with text [, query_id] columns")
    bq.add_argument("--filter", action="append", metavar="COL=VAL[,VAL...]",
                    help="restrict every query to docs matching an "
                         "attribute (index must be built with --attrs)")
    bq.add_argument("--fuzzy", action="store_true",
                    help="rewrite out-of-vocabulary query terms to their "
                         "closest indexed term (edit distance 1) first")
    bq.set_defaults(fn=_cmd_batch_query)

    g = sub.add_parser(
        "ingest-docs",
        help="reference-style one-doc-per-file corpus dir -> transcripts parquet",
    )
    g.add_argument("docs_dir")
    g.add_argument("out")
    g.add_argument("--glob", default="*")
    g.add_argument("--overwrite", action="store_true")
    g.set_defaults(fn=_cmd_ingest_docs)

    gj = sub.add_parser(
        "ingest-jsonl",
        help="JSONL shard file/dir -> transcripts parquet",
    )
    gj.add_argument("jsonl_path")
    gj.add_argument("out")
    gj.add_argument("--glob", default="*.jsonl")
    gj.add_argument("--text-field", default="text")
    gj.add_argument("--id-field", default=None)
    gj.add_argument("--overwrite", action="store_true")
    gj.set_defaults(fn=_cmd_ingest_jsonl)

    d = sub.add_parser(
        "dedup",
        help="documents parquet -> dedup output "
        "(survivors, near-dup pairs, or duplicate clusters)",
    )
    d.add_argument("documents")
    d.add_argument("out")
    d.add_argument(
        "--method",
        default="exact",
        choices=("exact", "exact-normalized", "minhash", "jaccard",
                 "simhash", "clusters", "spans", "hash-export",
                 "neardup-export"),
    )
    d.add_argument(
        "--baseline", default=None,
        help="incremental ingest dedup: for exact, a parquet of a prior "
        "hash-export (h1,h2) or of baseline documents; for minhash, a "
        "prior neardup-export dir (buckets/ + sketches/) — new docs match "
        "against it without re-reading the baseline corpus",
    )
    d.add_argument("--span-k", type=int, default=8,
                   help="spans method: duplicated-gram length in tokens")
    d.add_argument("--threshold", type=float, default=0.5,
                   help="Jaccard threshold (minhash/jaccard/clusters)")
    d.add_argument("--max-hamming", type=int, default=3)
    d.add_argument("--overwrite", action="store_true")
    d.set_defaults(fn=_cmd_dedup)

    c = sub.add_parser(
        "curate",
        help="documents parquet -> curated training set "
        "(quality/lang gate, exact + near dedup, token accounting)",
    )
    c.add_argument("documents", help="documents parquet (doc_id, text, ...)")
    c.add_argument("out", help="output parquet directory")
    c.add_argument("--min-tokens", type=int, default=5)
    c.add_argument("--min-alpha-ratio", type=float, default=0.5)
    c.add_argument("--lang", default="en", help="language gate, or 'any'")
    c.add_argument("--jaccard", type=float, default=0.5,
                   help="near-dup drop threshold")
    c.add_argument("--min-logprob", type=float, default=None,
                   help="drop docs whose mean unigram log-probability "
                        "under the gated corpus falls below this")
    c.add_argument("--max-dup-span-frac", type=float, default=None,
                   help="drop docs where cross-doc duplicated 8-gram "
                        "spans cover more than this token fraction")
    c.add_argument("--baseline-hashes", default=None,
                   help="dedup hash-export parquet of the already-curated "
                        "corpus: drop new docs whose content exists there")
    c.add_argument("--baseline-neardup", default=None,
                   help="dedup neardup-export dir (buckets/ + sketches/): "
                        "also drop new docs near-matching the baseline")
    c.add_argument("--emit-baseline", default=None,
                   help="append this run's kept docs' exports (hashes/, "
                        "buckets/, sketches/) into DIR — a rolling "
                        "baseline: next wave passes --baseline-hashes "
                        "DIR/hashes --baseline-neardup DIR")
    c.add_argument("--overwrite", action="store_true")
    c.set_defaults(fn=_cmd_curate)

    pi = sub.add_parser(
        "pii",
        help="documents parquet -> per-doc PII counts + redacted text",
    )
    pi.add_argument("documents")
    pi.add_argument("out")
    pi.add_argument("--redact-only", action="store_true",
                    help="write only (doc_id, text_redacted)")
    pi.add_argument("--overwrite", action="store_true")
    pi.set_defaults(fn=_cmd_pii)

    dc = sub.add_parser(
        "decontam",
        help="drop (or flag) documents overlapping a benchmark by n-grams",
    )
    dc.add_argument("documents")
    dc.add_argument("benchmark", help="parquet with a text column (eval set)")
    dc.add_argument("out")
    dc.add_argument("--ngram", type=int, default=8)
    dc.add_argument("--min-hits", type=int, default=1)
    dc.add_argument("--scan-only", action="store_true",
                    help="write per-doc overlap counts instead of filtering")
    dc.add_argument("--overwrite", action="store_true")
    dc.set_defaults(fn=_cmd_decontam)

    pk = sub.add_parser(
        "pack",
        help="documents parquet -> fixed-token training-sequence placement",
    )
    pk.add_argument("documents")
    pk.add_argument("out")
    pk.add_argument("--max-tokens", type=int, default=2048)
    pk.add_argument("--overwrite", action="store_true")
    pk.set_defaults(fn=_cmd_pack)

    ck = sub.add_parser(
        "chunk",
        help="documents parquet -> sliding-window token chunks "
        "(context-length splitting)",
    )
    ck.add_argument("documents")
    ck.add_argument("out")
    ck.add_argument("--window", type=int, default=128)
    ck.add_argument("--stride", type=int, default=96)
    ck.add_argument("--overwrite", action="store_true")
    ck.set_defaults(fn=_cmd_chunk)

    ab = sub.add_parser(
        "ann-build",
        help="embeddings parquet -> persisted IVF index "
             "(one directory per cluster; queries read only probed dirs)",
    )
    ab.add_argument("embeddings")
    ab.add_argument("out")
    ab.add_argument("--nlist", type=int, default=None,
                    help="cluster count (default ~sqrt(n))")
    ab.add_argument("--id-col", default="vec_id")
    ab.set_defaults(fn=_cmd_ann_build)

    aa = sub.add_parser(
        "ann-append",
        help="append new vectors to a persisted IVF index as a new "
             "generation (no retrain/rewrite; ids must sort after "
             "indexed ones)",
    )
    aa.add_argument("index_dir")
    aa.add_argument("embeddings")
    aa.add_argument("--retrain-frac", type=float, default=0.5,
                    help="warn to rebuild once appended rows exceed this "
                         "fraction of the base build")
    aa.set_defaults(fn=_cmd_ann_append)

    aq = sub.add_parser(
        "ann-query",
        help="query a persisted IVF index by an existing vector id",
    )
    aq.add_argument("index_dir")
    aq.add_argument("embeddings", help="parquet holding the query vector")
    aq.add_argument("--vec-id", type=int, required=True)
    aq.add_argument("--k", type=int, default=10)
    aq.add_argument("--nprobe", type=int, default=4)
    aq.set_defaults(fn=_cmd_ann_query)

    fz = sub.add_parser(
        "fuzzy",
        help="fuzzy vocabulary lookup: spell-correct probe terms against "
             "the index lexicon (SymSpell deletion neighborhood)",
    )
    fz.add_argument("index_dir")
    fz.add_argument("terms", help="space-separated probe terms")
    fz.add_argument("--max-edits", type=int, default=1, choices=(1, 2))
    fz.set_defaults(fn=_cmd_fuzzy)

    fr = sub.add_parser(
        "freq",
        help="exact heavy hitters over a parquet column (MG + recount)",
    )
    fr.add_argument("parquet")
    fr.add_argument("col")
    fr.add_argument("--phi", type=float, default=0.005,
                    help="report values with count > floor(phi*n)")
    fr.add_argument("--counters", type=int, default=None,
                    help="MG counter budget (default ceil(2/phi))")
    fr.add_argument("--tokens", action="store_true",
                    help="count the column's simple-split token stream")
    fr.set_defaults(fn=_cmd_freq)

    sp = sub.add_parser(
        "split",
        help="deterministic weighted train/val/test split -> hive dirs",
    )
    sp.add_argument("documents")
    sp.add_argument("out")
    sp.add_argument("--weights", default="train=98,val=1,test=1",
                    help="name=weight comma list (integral shares)")
    sp.add_argument("--seed", type=int, default=7)
    sp.add_argument("--overwrite", action="store_true")
    sp.set_defaults(fn=_cmd_split)

    mx = sub.add_parser(
        "mix",
        help="target-proportion data mixing over a stratum column",
    )
    mx.add_argument("documents")
    mx.add_argument("out")
    mx.add_argument("--by", default="source")
    mx.add_argument("--weights", required=True,
                    help="stratum=ppm comma list (parts per million)")
    mx.add_argument("--total", type=int, required=True,
                    help="target sampled corpus size in docs")
    mx.add_argument("--overwrite", action="store_true")
    mx.set_defaults(fn=_cmd_mix)

    pm = sub.add_parser(
        "pmi",
        help="top bigram collocations of a documents table by PMI",
    )
    pm.add_argument("documents")
    pm.add_argument("--min-count", type=int, default=2)
    pm.add_argument("--top", type=int, default=50)
    pm.set_defaults(fn=_cmd_pmi)

    qu = sub.add_parser(
        "quantiles",
        help="column quantiles: exact histogram, or sampled with --sample",
    )
    qu.add_argument("parquet")
    qu.add_argument("col")
    qu.add_argument("--qs", default="0.25,0.5,0.75,0.95",
                    help="comma-separated quantiles")
    qu.add_argument("--sample", type=int, default=None,
                    help="bounded-memory sampled sketch with this cap")
    qu.add_argument("--id-col", default="doc_id",
                    help="id column for the deterministic sample ranks")
    qu.set_defaults(fn=_cmd_quantiles)

    di = sub.add_parser(
        "distinct",
        help="approximate COUNT(DISTINCT col) via HyperLogLog (+ --by group)",
    )
    di.add_argument("parquet")
    di.add_argument("col")
    di.add_argument("--by", default=None, help="estimate per this group column")
    di.add_argument("--p", type=int, default=12,
                    help="register precision (2^p registers)")
    di.set_defaults(fn=_cmd_distinct)

    st = sub.add_parser("stats", help="index stats (+ optional per-term probe)")
    st.add_argument("index_dir")
    st.add_argument("--term", default=None,
                    help="probe one term: df, total tf, coded size")
    st.set_defaults(fn=_cmd_stats)

    e = sub.add_parser("export", help="export legacy reference index formats")
    e.add_argument("index_dir")
    e.add_argument("out")
    e.add_argument("--format", default="gamma",
                   choices=("uncompressed", "gamma", "delta_front"))
    e.set_defaults(fn=_cmd_export)

    args = p.parse_args(argv)
    args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
