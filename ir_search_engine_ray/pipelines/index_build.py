"""End-to-end index build: transcripts parquet -> on-disk sharded index.

Rebuild of the reference's ``Indexer.buildIndex`` + ``Compression`` lifecycle
(``index/Indexer.java:72-142``, SURVEY.md §3.2) as a staged Ray Data pipeline
(SURVEY.md §3.4), with MAP-SIDE PARTITIONING instead of a Ray all-to-all:

    read_parquet (pruned columns)
      -> conversation_offsets (small groupby)          [stage convs]
      -> AssignDocId + TokenizeWriteBlocks: per-batch tokenize writes
         SALT-PARTITIONED SPIMI runs + exact doclen partials
                                                       [stage blocks]
      -> one merge task per salt: concat runs, sort(term, doc_id),
         delta-gap varint compress                     [stage chunks]
      -> driver-side vocabulary combine of per-salt dfs  [stage df]

The chunks are the serving shards: query actors load chunks + df and derive
doc stats, cosine norms and normalized weights at load time (stages/norms.py
rationale — materializing them would double index size and build I/O).

Why this beats a ``groupby('term')`` exchange at 10^12 turns: the salt
(``doc_id // range_size``) is chosen at tokenize time, so the "shuffle" is
file placement — each reduce partition reads only its own runs, every merge
task is bounded by ``range_size`` documents regardless of term skew (a Zipf
head term becomes one bounded chunk per salt, never one giant group), and the
doc side-stats (doc_len / max_tf / L2 norms) are EXACT LOCAL computations
inside the salt because a salt range owns all postings of its documents — no
``groupby(doc_id)`` shuffle, no broadcast doc-side tables.  The only global
exchanges left are vocabulary-sized: the per-conversation offset table and
the df table.

Every stage directory is checkpointed with a fingerprinted ``_SUCCESS``
marker (state/manifest.py); a restarted build skips completed stages, and
within every stage each file is deterministically named and written
atomically, so partial stage re-runs skip completed partitions.  All
intermediates are partitioned Parquet, never one giant file.

Output layout under ``out_dir``::

    convs.parquet      conv_id -> (base doc_id, n_turns)     [docmap seed]
    blocks/            salt-partitioned SPIMI runs (term, doc_id, tf)
    doclen/            doc_id, doc_len, max_tf  (exact per-batch partials)
    chunks/            chunk-s*.parquet compressed postings = serving shards
    df/                term -> df
    stats.json         N, avgdl, counts, config, lineage, stage metrics
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import IndexConfig
from ..stages.docids import assign_doc_ids, conversation_offsets_table
from ..stages.merge import merge_salt_table, range_size_for
from ..stages.tokenize_stage import (
    TRIPLES_SCHEMA,
    read_block_batches,
    tokenize_write_blocks,
)
from ..state.manifest import (
    atomic_write_bytes,
    atomic_write_json,
    begin_stage,
    input_lineage,
    mark_stage_complete,
    stage_complete,
)
from ..sources.transcripts import read_transcripts, transcript_paths


@dataclass
class IndexMeta:
    out_dir: Path
    N: int
    avg_doc_len: float
    total_doc_len: int
    n_terms: int
    n_postings: int
    range_size: int
    salt_buckets: int
    mode: str
    config: dict[str, Any]

    @classmethod
    def load(cls, out_dir: str | Path) -> "IndexMeta":
        out = Path(out_dir)
        stats = json.loads((out / "stats.json").read_text())
        return cls(
            out_dir=out,
            N=stats["N"],
            avg_doc_len=stats["avg_doc_len"],
            total_doc_len=stats["total_doc_len"],
            n_terms=stats["n_terms"],
            n_postings=stats["n_postings"],
            range_size=stats["range_size"],
            salt_buckets=stats["salt_buckets"],
            mode=stats["mode"],
            config=stats["config"],
        )

    def offsets(self) -> dict[str, int]:
        t = pq.read_table(self.out_dir / "convs.parquet")
        return dict(zip(t["conv_id"].to_pylist(), t["base"].to_pylist()))

    def df_map(self) -> dict[str, int]:
        """Whole-vocabulary df dict — a TEST/DEBUG and small-vocabulary
        query-parsing convenience (QueryConfig.df_in_memory=True).  The
        build path and the scale serving path never call this: they stream
        term-range df parts (stages/norms.py DfStore) and read the
        vocabulary totals from the df stage marker."""
        t = pq.read_table(self.out_dir / "df", columns=["term", "df"])
        return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    def shard_files(self) -> list[Path]:
        """The serving shards are the per-salt chunk files themselves."""
        return sorted((self.out_dir / "chunks").glob("chunk-s*.parquet"))


def _merge_salt_task(chunks_dir: str):
    """Per-salt reduce task: extract this salt's record batches from each
    run file (footer random access — only this salt's bytes are read),
    merge+compress, write one chunk file."""

    def run(item: dict) -> dict:
        salt = int(item["salt"])
        batches: list[pa.RecordBatch] = []
        for f, idx in zip(item["files"], item["indices"]):
            batches.extend(read_block_batches(str(f), [int(idx)]))
        triples = (
            pa.Table.from_batches(batches)
            if batches
            else TRIPLES_SCHEMA.empty_table()
        )
        chunk = merge_salt_table(triples, salt)
        path = Path(chunks_dir) / f"chunk-s{salt:06d}.parquet"
        written = atomic_write_bytes(path, lambda tmp: pq.write_table(chunk, tmp))
        return {
            "salt": salt,
            "n_terms": chunk.num_rows,
            "n_rows": triples.num_rows,
            "skipped": not written,
        }

    return run


def _per_salt(items: list[dict], fn) -> list[dict]:
    """Run one coarse task per salt partition through Ray Data (streaming,
    retried, one task per item)."""
    if not items:
        return []
    return (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map(fn)
        .take_all()
    )


def _df_stage(
    df_dir: Path, fp: str, chunk_files: list[Path], config: IndexConfig
) -> dict[str, Any]:
    """The df combine (A4) as a reusable stage: per-salt ``df_chunk`` rows
    from every chunk file -> term-sorted, range-sidecar'd df parts, with
    per-part ``n_terms``/``sum(df)`` recorded in the stage marker so finalize
    never re-reads the vocabulary.  Shared by :func:`build_index` and
    :func:`append_index` (an append reruns exactly this stage over the
    extended chunk set — the combine is vocabulary-sized either way)."""
    begin_stage(df_dir, fp, keep_partials=False)
    distributed = config.df_distributed
    if distributed is None:
        from ..config import DF_DISTRIBUTED_ROWS

        chunk_rows = sum(pq.read_metadata(f).num_rows for f in chunk_files)
        distributed = chunk_rows >= DF_DISTRIBUTED_ROWS
    ranges: dict[str, tuple[str, str]] = {}
    if distributed and chunk_files:
        from ray.data.aggregate import Sum

        agg = (
            ray.data.read_parquet(
                [str(f) for f in chunk_files],
                columns=["term", "df_chunk"],
            )
            .groupby("term")
            .aggregate(Sum("df_chunk"))
            .sort("term")
        )

        @ray.remote
        def write_part(t: pa.Table, path: str):
            if t.num_rows == 0:
                return None
            out_t = pa.table(
                {
                    "term": t["term"],
                    "df": t["sum(df_chunk)"].cast(pa.int64()),
                }
            )
            atomic_write_bytes(
                Path(path), lambda tmp: pq.write_table(out_t, tmp)
            )
            # per-part vocabulary stats ride back with the range info so
            # finalize never has to re-read the df table (at a
            # billion-term vocabulary that read undid the distributed
            # combine's memory win)
            return (
                Path(path).name,
                t["term"][0].as_py(),
                t["term"][-1].as_py(),
                t.num_rows,
                int(pa.compute.sum(out_t["df"]).as_py() or 0),
            )

        infos = ray.get(
            [
                write_part.remote(r, str(df_dir / f"part-{i:05d}.parquet"))
                for i, r in enumerate(agg.to_arrow_refs())
            ]
        )
        n_terms = n_postings = 0
        for info in infos:
            if info:
                ranges[info[0]] = (info[1], info[2])
                n_terms += info[3]
                n_postings += info[4]
        n_parts = len(ranges)
    else:
        parts = [
            pq.read_table(f, columns=["term", "df_chunk"])
            for f in chunk_files
        ]
        if parts:
            df_agg = (
                pa.concat_tables(parts)
                .group_by("term")
                .aggregate([("df_chunk", "sum")])
                .sort_by("term")
            )
            df_out = pa.table(
                {
                    "term": df_agg["term"],
                    "df": df_agg["df_chunk_sum"].cast(pa.int64()),
                }
            )
        else:
            df_out = pa.table(
                {"term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64())}
            )
        n_terms = df_out.num_rows
        n_postings = int(pa.compute.sum(df_out["df"]).as_py() or 0)
        rows_per = max(1, int(config.df_part_rows))
        n_parts = max(1, -(-df_out.num_rows // rows_per))
        for p in range(n_parts):
            piece = df_out.slice(p * rows_per, rows_per)
            name = f"part-{p:05d}.parquet"
            atomic_write_bytes(
                df_dir / name,
                lambda tmp, piece=piece: pq.write_table(piece, tmp),
            )
            if piece.num_rows:
                ranges[name] = (
                    piece["term"][0].as_py(),
                    piece["term"][-1].as_py(),
                )
            else:
                ranges[name] = ("", "")
    atomic_write_json(df_dir / "_ranges.json", ranges)
    return mark_stage_complete(
        df_dir,
        fp,
        n_parts=n_parts,
        distributed=bool(distributed),
        n_terms=int(n_terms),
        n_postings=int(n_postings),
    )


def _attrs_stage(
    attrs_dir: Path,
    fp: str,
    paths: list[str],
    attr_cols: list[str],
    conv_arr,
    base_arr,
    N: int,
    config: IndexConfig,
) -> None:
    """Doc-attribute sidecar: per read batch, one doc-id-sorted parquet
    named by its doc range (``attr-d<lo>-d<hi>.parquet``) so a serving
    shard opens only the files overlapping its own range.  Deterministic
    and idempotent like blocks: batch boundaries derive from N alone,
    file names from content ranges, writes are atomic, and stray files
    from other partitionings are dropped before the marker lands."""
    from ..stages.docids import assign_doc_ids

    if stage_complete(attrs_dir, fp) is not None:
        return
    begin_stage(attrs_dir, fp, keep_partials=True)
    batch_size = config.tokenize_batch_size or min(
        32768, max(8192, -(-N // 64))
    )
    n_batches = max(1, -(-N // batch_size))
    ds = read_transcripts(
        paths,
        columns=["conv_id", "turn_idx", *attr_cols],
        override_num_blocks=n_batches,
    )
    offsets_ref = ray.put((conv_arr, base_arr))
    dir_str = str(attrs_dir)

    def write_batch(batch: pa.Table) -> pa.Table:
        t = batch.select(["doc_id", *attr_cols]).sort_by(
            [("doc_id", "ascending")]
        )
        lo = int(t["doc_id"][0].as_py())
        hi = int(t["doc_id"][-1].as_py())
        name = f"attr-d{lo:012d}-d{hi:012d}.parquet"
        dest = Path(dir_str) / name
        if not dest.exists():
            atomic_write_bytes(dest, lambda tmp: pq.write_table(t, tmp))
        return pa.table(
            {"file": pa.array([name]), "n_rows": pa.array([t.num_rows])}
        )

    manifest = (
        ds.map_batches(
            assign_doc_ids,
            fn_kwargs={"offsets_ref": offsets_ref},
            batch_format="pyarrow",
            batch_size=None,
        )
        .map_batches(write_batch, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    listed = {m["file"] for m in manifest}
    for f in attrs_dir.glob("attr-d*.parquet"):
        if f.name not in listed:
            f.unlink()
    n_rows = int(sum(m["n_rows"] for m in manifest))
    if n_rows != N:
        raise RuntimeError(
            f"attrs stage wrote {n_rows} rows, expected N={N}"
        )
    mark_stage_complete(
        attrs_dir, fp, n_files=len(manifest), n_rows=n_rows,
        attr_cols=attr_cols,
    )


def build_index(
    transcripts: str | Path,
    out_dir: str | Path,
    config: IndexConfig | None = None,
    *,
    concurrency: int | None = None,
    append: bool = False,
) -> IndexMeta:
    """Build (or resume building) the index. Idempotent; returns metadata.

    ``append=True`` routes to :func:`append_index`: only input files not in
    the existing index's lineage are tokenized and only the salt partitions
    they touch are re-merged (``config`` is then taken from the existing
    index, not the argument)."""
    if append:
        return append_index(transcripts, out_dir, concurrency=concurrency)
    config = config or IndexConfig()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = transcript_paths(transcripts)
    lineage = input_lineage(paths)
    fp = (
        config.fingerprint()
        + "-"
        + hashlib.sha256(json.dumps(lineage, sort_keys=True).encode()).hexdigest()[:16]
    )
    metrics: dict[str, Any] = {}
    t_start = time.perf_counter()
    _t_prev = t_start

    def _lap(stage: str) -> None:
        nonlocal _t_prev
        now = time.perf_counter()
        metrics[f"t_{stage}"] = round(now - _t_prev, 3)
        _t_prev = now

    # ---- stage: convs (doc_id base offsets; the stable-turn-ordering seed)
    convs_path = out / "convs.parquet"
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if stage_complete(out / "stage_convs", fp) is None:
        # a single input file is split into row-group ranges: without the
        # override Ray sizes read tasks by bytes and a small file count caps
        # parallelism far below the CPU count
        ds = read_transcripts(
            paths, columns=["conv_id", "turn_idx"], override_num_blocks=2 * cpus
        )
        hier = config.offsets_hierarchical
        if hier is None:
            from ..config import HIER_OFFSETS_ROWS

            # parquet footer metadata, not ds.count(): the threshold check
            # must not cost a Ray job of its own
            n_rows = sum(pq.read_metadata(p).num_rows for p in paths)
            hier = n_rows >= HIER_OFFSETS_ROWS
        tbl = conversation_offsets_table(ds, hierarchical=bool(hier))
        # bounded row groups: serving's streamed ConvResolver prunes reads
        # by row-group footer stats, so group size caps its working set
        atomic_write_bytes(
            convs_path,
            lambda tmp: pq.write_table(tbl, tmp, row_group_size=65536),
        )
        (out / "stage_convs").mkdir(exist_ok=True)
        mark_stage_complete(
            out / "stage_convs",
            fp,
            n_convs=tbl.num_rows,
            N=int(pa.compute.sum(tbl["n_turns"]).as_py() or 0),
            hierarchical=bool(hier),
        )
    convs = pq.read_table(convs_path)
    # broadcast form straight from the persisted table — no dict and no
    # per-conversation Python loop anywhere in the build
    conv_arr = convs["conv_id"].combine_chunks()
    base_arr = convs["base"].to_numpy()
    N = int(pa.compute.sum(convs["n_turns"]).as_py() or 0)
    metrics["n_convs"] = convs.num_rows
    _lap("convs")
    range_size = config.range_size_override or range_size_for(
        N, config.salt_buckets
    )

    # ---- stage: blocks (tokenize -> salt-partitioned SPIMI runs + doclen)
    blocks_dir = out / "blocks"
    doclen_dir = out / "doclen"
    marker = stage_complete(blocks_dir, fp)
    if marker is None:
        begin_stage(blocks_dir, fp, keep_partials=True)
        begin_stage(doclen_dir, fp, keep_partials=True)
        # one read block per tokenize batch, sized from N alone so batch
        # boundaries (and the content-derived block file names) do not
        # depend on the parallelism level; batch_size=None keeps
        # batch == block, avoiding a re-bundling barrier between the read
        # and the fused tokenize
        batch_size = config.tokenize_batch_size or min(
            32768, max(8192, -(-N // 64))
        )
        n_batches = max(1, -(-N // batch_size))
        ds = read_transcripts(paths, override_num_blocks=n_batches)
        offsets_ref = ray.put((conv_arr, base_arr))
        manifest = (
            ds.map_batches(
                assign_doc_ids,
                fn_kwargs={"offsets_ref": offsets_ref},
                batch_format="pyarrow",
                batch_size=None,
            )
            .map_batches(
                tokenize_write_blocks,
                fn_kwargs={
                    "mode": config.mode,
                    "blocks_dir": str(blocks_dir),
                    "doclen_dir": str(doclen_dir),
                    "range_size": range_size,
                },
                batch_format="pyarrow",
                concurrency=concurrency,
                batch_size=None,
            )
            .take_all()
        )
        # batch boundaries may shift between runs at different parallelism:
        # drop any same-fingerprint leftover files this run did not produce,
        # or downstream reads would double-count their postings
        listed = {m["file"] for m in manifest}
        for f in list(blocks_dir.glob("block-*.arrow")) + list(
            doclen_dir.glob("doclen-*.parquet")
        ):
            if f.name not in listed:
                f.unlink()
        atomic_write_json(blocks_dir / "manifest.json", {"files": manifest})
        # doclen manifest rows carry exact per-batch token totals (also on
        # the resume path), so total_doc_len needs no extra pass
        total_doc_len = int(
            sum(m["n_tokens"] for m in manifest if m["kind"] == "doclen")
        )
        marker = mark_stage_complete(
            blocks_dir,
            fp,
            n_files=len(manifest),
            n_posting_rows=int(
                sum(m["n_rows"] for m in manifest if m["kind"] == "block")
            ),
            n_tokens=total_doc_len,
            total_doc_len=total_doc_len,
        )
    _lap("blocks")
    total_doc_len = int(marker["total_doc_len"])
    avgdl = total_doc_len / N if N else 0.0

    # ---- stage: attrs (optional doc-attribute sidecar for filtered
    # retrieval: doc-id-sorted (doc_id, *attr_cols) parquet per batch,
    # range-named so serving prunes files by name — one extra
    # column-pruned pass over the input, no shuffle)
    if config.attr_cols:
        _attrs_stage(
            out / "attrs", fp, paths, list(config.attr_cols),
            conv_arr, base_arr, N, config,
        )
        _lap("attrs")

    # per-salt run locations from the persisted manifest (file + record-batch
    # index inside it), ordered by doc range so concatenated runs arrive
    # doc_id-sorted (the merge's monotone-docId precondition)
    man_rows = json.loads((blocks_dir / "manifest.json").read_text())["files"]
    by_salt: dict[int, list[tuple[str, int]]] = {}
    for m in sorted(
        (m for m in man_rows if m["kind"] == "block"),
        key=lambda m: int(m["doc_lo"]),
    ):
        by_salt.setdefault(int(m["salt"]), []).append(
            (str(blocks_dir / m["file"]), int(m["batch_index"]))
        )

    # ---- stage: chunks (per-salt merge reduce: the A1 "shuffle" is file
    # placement — no Ray all-to-all)
    chunks_dir = out / "chunks"
    if stage_complete(chunks_dir, fp) is None:
        begin_stage(chunks_dir, fp, keep_partials=True)
        items = [
            {
                "salt": s,
                "files": [f for f, _ in fl],
                "indices": [i for _, i in fl],
            }
            for s, fl in sorted(by_salt.items())
        ]
        merge_manifest = _per_salt(items, _merge_salt_task(str(chunks_dir)))
        mark_stage_complete(
            chunks_dir,
            fp,
            chunks=sorted(
                (
                    {k: (v if isinstance(v, bool) else int(v)) for k, v in m.items()}
                    for m in merge_manifest
                ),
                key=lambda m: m["salt"],
            ),
        )
    chunk_files = sorted(chunks_dir.glob("chunk-s*.parquet"))
    _lap("chunks")

    # ---- stage: df (A4 — vocabulary-sized combine over chunk rows; the
    # chunk files already hold per-salt dfs, so the combine is a column-
    # pruned read of (term, df_chunk) + one groupby.  Auto strategy: one
    # driver process at sandbox scale, or a term-partitioned ray.data
    # groupby + range sort once the row count passes DF_DISTRIBUTED_ROWS —
    # the only Ray all-to-all in the build, exchanging (term, int) rows,
    # never postings.  Either way the output is term-sorted parts with a
    # range sidecar so serving actors stream only their lexicon's parts
    # (stages/norms.py DfStore).)
    df_dir = out / "df"
    df_marker = stage_complete(df_dir, fp)
    if df_marker is None:
        df_marker = _df_stage(df_dir, fp, chunk_files, config)
    # vocabulary stats come from the stage marker (per-part sums recorded at
    # write time) — the build never re-materializes the df table
    if "n_terms" not in df_marker:
        # marker written by an older build: backfill its stats once
        t = pq.read_table(df_dir, columns=["df"])
        extra = {k: v for k, v in df_marker.items() if k != "fingerprint"}
        extra.update(
            n_terms=t.num_rows,
            n_postings=int(pa.compute.sum(t["df"]).as_py() or 0),
        )
        df_marker = mark_stage_complete(df_dir, fp, **extra)
    n_terms = int(df_marker["n_terms"])
    n_postings = int(df_marker["n_postings"])
    _lap("df")

    # NOTE: no norms stage — the chunks ARE the serving shards.  Doc stats
    # and cosine norms (A2/A3/A7) are exact local functions of a salt's
    # postings (stages/norms.py) and are computed once per query-actor load,
    # not per query and not as build I/O; the doc-length table the north
    # rule names is the doclen/ partials written free during tokenize.

    stats = {
        "fingerprint": fp,
        "N": N,
        "avg_doc_len": avgdl,
        "total_doc_len": total_doc_len,
        "n_terms": n_terms,
        "n_postings": int(n_postings),
        "range_size": range_size,
        "salt_buckets": config.salt_buckets,
        "mode": config.mode,
        "config": json.loads(json.dumps(config.__dict__)),
        "lineage": lineage,
        "build_seconds": time.perf_counter() - t_start,
        "metrics": metrics,
    }
    atomic_write_json(out / "stats.json", stats)
    return IndexMeta(
        out_dir=out,
        N=N,
        avg_doc_len=avgdl,
        total_doc_len=total_doc_len,
        n_terms=n_terms,
        n_postings=int(n_postings),
        range_size=range_size,
        salt_buckets=config.salt_buckets,
        mode=config.mode,
        config=stats["config"],
    )


def _manifest_key(m: dict) -> tuple:
    return (m["file"], m["kind"], int(m["salt"]), int(m["batch_index"]))


def append_index(
    transcripts: str | Path,
    out_dir: str | Path,
    *,
    concurrency: int | None = None,
) -> IndexMeta:
    """Incrementally extend an existing index with NEW input files.

    The 100-TB operational capability the reference approximates with its
    rebuild-on-cache-miss driver (``search/Driver.java:26-41``): a daily
    crawl delta should cost O(delta), not O(corpus).  Only files absent from
    the index's recorded lineage are tokenized (into fresh doc-id ranges
    starting at the old N), and only the salt partitions those new doc ids
    land in are re-merged — every untouched chunk file keeps its exact
    bytes.  The df combine and the conv-offset table are recomputed (both
    are metadata-sized, and the df stage auto-distributes), and the salt
    RANGE SIZE is pinned to the original build's, so salts only ever grow at
    the tail.

    Constraints (validated, ValueError on violation):

    - every appended conversation must be NEW (no turns added to an indexed
      conversation — that would renumber doc_ids), and
    - appended conv_ids must sort AFTER every indexed conv_id, because
      doc_id is the rank under the global (conv_id, turn_idx) order and
      serving binary-searches the conv table on (conv_id, base) assuming
      both are monotone together.  Time-prefixed conversation keys (the
      normal shape of an append-only corpus) satisfy this for free; an
      interleaving delta needs a full rebuild.

    Under those constraints the appended index is BYTE-IDENTICAL in chunks/
    and df/ to a one-shot build of the full corpus with
    ``IndexConfig(range_size_override=<original range_size>)`` (asserted in
    tests).  Idempotent/resumable like the build: already-appended files are
    detected via lineage and skipped; a crash mid-append re-runs only the
    missing pieces (content-named block files, deterministic chunk bytes).
    """
    out = Path(out_dir)
    stats_old = json.loads((out / "stats.json").read_text())
    config = IndexConfig(**stats_old["config"])
    range_size = int(stats_old["range_size"])
    N_old = int(stats_old["N"])
    known = {row["path"] for row in stats_old["lineage"]}
    new_paths = [p for p in transcript_paths(transcripts) if p not in known]
    if not new_paths:
        return IndexMeta.load(out)
    lineage_all = input_lineage(sorted(known) + new_paths)
    fp = (
        config.fingerprint()
        + "-"
        + hashlib.sha256(
            json.dumps(lineage_all, sort_keys=True).encode()
        ).hexdigest()[:16]
    )
    metrics: dict[str, Any] = {"appended_files": len(new_paths)}
    t_start = time.perf_counter()
    _t_prev = t_start

    def _lap(stage: str) -> None:
        nonlocal _t_prev
        now = time.perf_counter()
        metrics[f"t_{stage}"] = round(now - _t_prev, 3)
        _t_prev = now

    # ---- stage: convs — offsets for the NEW conversations only, shifted to
    # start at N_old; the persisted table is extended by a bounded streaming
    # copy (row-group in, row-group out), never materialized whole
    convs_path = out / "convs.parquet"
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if stage_complete(out / "stage_convs", fp) is None:
        # os.replace is the extension's commit point; a crash between it and
        # the marker leaves the table extended with no marker, so detect
        # "already extended" by row count before re-running.  The _STARTED
        # record pins WHICH delta the crashed extension was for (fp hashes
        # config + full lineage): retrying a crashed append with a DIFFERENT
        # delta must not silently reuse the half-extended table (ADVICE r3)
        # — the skipped files' conversations would be missing from it and
        # the blocks stage would die with a distant assign_doc_ids KeyError.
        convs_stage = out / "stage_convs"
        started_path = convs_stage / "_STARTED"
        n_convs_old = int(stats_old["metrics"]["n_convs"])
        if pq.read_metadata(convs_path).num_rows != n_convs_old:
            started_fp = None
            if started_path.exists():
                try:
                    started_fp = json.loads(
                        started_path.read_text()
                    ).get("fingerprint")
                except (OSError, json.JSONDecodeError):
                    started_fp = None
            if started_fp != fp:
                raise ValueError(
                    "append_index: convs.parquet is already extended past "
                    f"the recorded {n_convs_old} conversations, but the "
                    "extension was started for a different delta "
                    f"(recorded fingerprint {started_fp!r} != this run's "
                    f"{fp!r}). Retry the crashed append with its original "
                    "input files, or rebuild the index from scratch."
                )
        else:
            convs_stage.mkdir(parents=True, exist_ok=True)
            atomic_write_json(started_path, {"fingerprint": fp})
            ds = read_transcripts(
                new_paths,
                columns=["conv_id", "turn_idx"],
                override_num_blocks=2 * cpus,
            )
            hier = config.offsets_hierarchical
            if hier is None:
                from ..config import HIER_OFFSETS_ROWS

                n_rows = sum(pq.read_metadata(p).num_rows for p in new_paths)
                hier = n_rows >= HIER_OFFSETS_ROWS
            new_tbl = conversation_offsets_table(ds, hierarchical=bool(hier))
            if new_tbl.num_rows == 0:
                raise ValueError("appended input contains no conversations")
            pf_old = pq.ParquetFile(convs_path)
            last = pf_old.read_row_group(
                pf_old.metadata.num_row_groups - 1, columns=["conv_id"]
            )
            old_max = last["conv_id"][-1].as_py()
            new_min = new_tbl["conv_id"][0].as_py()  # table is conv-sorted
            if new_min <= old_max:
                raise ValueError(
                    f"appended conv_ids must sort after every indexed "
                    f"conv_id (doc_id is the rank under global "
                    f"(conv_id, turn_idx) order): new min {new_min!r} <= "
                    f"indexed max {old_max!r}. Re-key the delta or rebuild "
                    "from scratch."
                )
            new_tbl = new_tbl.set_column(
                1, "base", pa.compute.add(new_tbl["base"], N_old)
            )

            def _copy_extend(tmp: Path) -> None:
                with pq.ParquetWriter(tmp, pf_old.schema_arrow) as w:
                    for rb in pf_old.iter_batches(batch_size=65536):
                        w.write_batch(rb)
                    for rb in new_tbl.cast(pf_old.schema_arrow).to_batches(
                        max_chunksize=65536
                    ):
                        w.write_batch(rb)

            tmp = convs_path.with_name(f".{convs_path.name}.append.tmp")
            _copy_extend(tmp)
            os.replace(tmp, convs_path)
        # N = last base + last n_turns (base is the global prefix sum);
        # exact whether this run extended the table or a crashed one did
        pf = pq.ParquetFile(convs_path)
        lastg = pf.read_row_group(
            pf.metadata.num_row_groups - 1, columns=["base", "n_turns"]
        )
        mark_stage_complete(
            out / "stage_convs",
            fp,
            n_convs=int(pf.metadata.num_rows),
            N=int(lastg["base"][-1].as_py()) + int(lastg["n_turns"][-1].as_py()),
            appended=True,
        )
    conv_marker = stage_complete(out / "stage_convs", fp)
    N = int(conv_marker["N"])
    metrics["n_convs"] = int(conv_marker["n_convs"])
    _lap("convs")

    # ---- stage: blocks — tokenize ONLY the new files into new runs beside
    # the old ones (no begin_stage: that would clear the old fingerprint's
    # files; block names are content-derived so retries still skip)
    blocks_dir = out / "blocks"
    doclen_dir = out / "doclen"
    old_man = json.loads((blocks_dir / "manifest.json").read_text())["files"]
    marker = stage_complete(blocks_dir, fp)
    if marker is None:
        atomic_write_json(blocks_dir / "_STARTED", {"fingerprint": fp})
        atomic_write_json(doclen_dir / "_STARTED", {"fingerprint": fp})
        # offsets broadcast covers NEW conversations only: new batches can
        # reference no old conv_id (validated disjoint above)
        new_convs = pq.read_table(
            convs_path,
            filters=[("base", ">=", N_old)],
            columns=["conv_id", "base"],
        )
        offsets_ref = ray.put(
            (
                new_convs["conv_id"].combine_chunks(),
                new_convs["base"].to_numpy(),
            )
        )
        n_new = N - N_old
        batch_size = config.tokenize_batch_size or min(
            32768, max(8192, -(-n_new // 64))
        )
        n_batches = max(1, -(-n_new // batch_size))
        ds = read_transcripts(new_paths, override_num_blocks=n_batches)
        new_man = (
            ds.map_batches(
                assign_doc_ids,
                fn_kwargs={"offsets_ref": offsets_ref},
                batch_format="pyarrow",
                batch_size=None,
            )
            .map_batches(
                tokenize_write_blocks,
                fn_kwargs={
                    "mode": config.mode,
                    "blocks_dir": str(blocks_dir),
                    "doclen_dir": str(doclen_dir),
                    "range_size": range_size,
                },
                batch_format="pyarrow",
                concurrency=concurrency,
                batch_size=None,
            )
            .take_all()
        )
        # merge manifests (a resumed append may see its own rows in the old
        # manifest already — key dedupe keeps one copy) and drop strays
        seen: dict[tuple, dict] = {}
        for m in old_man + new_man:
            seen.setdefault(_manifest_key(m), m)
        man_rows = list(seen.values())
        listed = {m["file"] for m in man_rows}
        for f in list(blocks_dir.glob("block-*.arrow")) + list(
            doclen_dir.glob("doclen-*.parquet")
        ):
            if f.name not in listed:
                f.unlink()
        atomic_write_json(blocks_dir / "manifest.json", {"files": man_rows})
        total_doc_len = int(
            sum(m["n_tokens"] for m in man_rows if m["kind"] == "doclen")
        )
        marker = mark_stage_complete(
            blocks_dir,
            fp,
            n_files=len(man_rows),
            n_posting_rows=int(
                sum(m["n_rows"] for m in man_rows if m["kind"] == "block")
            ),
            n_tokens=total_doc_len,
            total_doc_len=total_doc_len,
            appended_runs=len(new_man),
        )
    _lap("blocks")
    total_doc_len = int(marker["total_doc_len"])
    avgdl = total_doc_len / N if N else 0.0

    # attrs sidecar: regenerated over the full (old + new) input — one
    # column-pruned pass over metadata-thin columns; file-name determinism
    # keeps unchanged ranges' files in place
    if config.attr_cols:
        convs_full = pq.read_table(convs_path, columns=["conv_id", "base"])
        _attrs_stage(
            out / "attrs", fp, sorted(known) + new_paths,
            list(config.attr_cols),
            convs_full["conv_id"].combine_chunks(),
            convs_full["base"].to_numpy(), N, config,
        )
        _lap("attrs")

    man_rows = json.loads((blocks_dir / "manifest.json").read_text())["files"]

    # ---- stage: chunks — re-merge ONLY the salts the new doc range touches
    # (all >= N_old // range_size; every other chunk file is untouched)
    chunks_dir = out / "chunks"
    if stage_complete(chunks_dir, fp) is None:
        atomic_write_json(chunks_dir / "_STARTED", {"fingerprint": fp})
        affected = {
            int(m["salt"])
            for m in man_rows
            if m["kind"] == "block" and int(m["doc_hi"]) >= N_old
        }
        by_salt: dict[int, list[tuple[str, int]]] = {}
        for m in sorted(
            (m for m in man_rows if m["kind"] == "block"),
            key=lambda m: int(m["doc_lo"]),
        ):
            if int(m["salt"]) in affected:
                by_salt.setdefault(int(m["salt"]), []).append(
                    (str(blocks_dir / m["file"]), int(m["batch_index"]))
                )
        for s in affected:
            stale = chunks_dir / f"chunk-s{s:06d}.parquet"
            if stale.exists():
                stale.unlink()
        items = [
            {
                "salt": s,
                "files": [f for f, _ in fl],
                "indices": [i for _, i in fl],
            }
            for s, fl in sorted(by_salt.items())
        ]
        merged = _per_salt(items, _merge_salt_task(str(chunks_dir)))
        old_chunk_meta = {
            int(c["salt"]): c
            for c in json.loads(
                (chunks_dir / "_SUCCESS").read_text()
            ).get("chunks", [])
            if int(c["salt"]) not in affected
        }
        for m in merged:
            old_chunk_meta[int(m["salt"])] = {
                k: (v if isinstance(v, bool) else int(v)) for k, v in m.items()
            }
        mark_stage_complete(
            chunks_dir,
            fp,
            chunks=sorted(old_chunk_meta.values(), key=lambda m: m["salt"]),
            appended_salts=sorted(affected),
        )
        metrics["remerged_salts"] = len(affected)
    chunk_files = sorted(chunks_dir.glob("chunk-s*.parquet"))
    _lap("chunks")

    # ---- stage: df — full recombine over the extended chunk set (the same
    # vocabulary-sized cost as one build's df stage; auto-distributes)
    df_dir = out / "df"
    df_marker = stage_complete(df_dir, fp)
    if df_marker is None:
        df_marker = _df_stage(df_dir, fp, chunk_files, config)
    n_terms = int(df_marker["n_terms"])
    n_postings = int(df_marker["n_postings"])
    _lap("df")

    stats = {
        "fingerprint": fp,
        "N": N,
        "avg_doc_len": avgdl,
        "total_doc_len": total_doc_len,
        "n_terms": n_terms,
        "n_postings": n_postings,
        "range_size": range_size,
        "salt_buckets": config.salt_buckets,
        "mode": config.mode,
        "config": stats_old["config"],
        "lineage": lineage_all,
        "build_seconds": time.perf_counter() - t_start,
        "metrics": metrics,
        "appended": stats_old.get("appended", 0) + 1,
    }
    atomic_write_json(out / "stats.json", stats)
    if (out / "positions" / "_SUCCESS").exists():
        # the sidecar's fingerprint no longer matches: phrase queries
        # silently fall back to the re-tokenize verify until refreshed
        import logging

        logging.getLogger(__name__).warning(
            "append_index: the positional sidecar under %s is now STALE — "
            "re-run pipelines.positions.build_positions(out_dir) (or "
            "`build --append --positions`) to refresh it in O(delta)",
            out / "positions",
        )
    return IndexMeta(
        out_dir=out,
        N=N,
        avg_doc_len=avgdl,
        total_doc_len=total_doc_len,
        n_terms=n_terms,
        n_postings=n_postings,
        range_size=range_size,
        salt_buckets=config.salt_buckets,
        mode=config.mode,
        config=stats["config"],
    )
