"""End-to-end index build: transcripts parquet -> on-disk sharded index.

Rebuild of the reference's ``Indexer.buildIndex`` + ``Compression`` lifecycle
(``index/Indexer.java:72-142``, SURVEY.md §3.2) as a staged Ray Data pipeline
(SURVEY.md §3.4):

    read_parquet (pruned columns)
      -> conversation_offsets (small groupby)      [stage convs]
      -> AssignDocId + TokenizeWriteBlocks          [stage blocks: SPIMI blocks]
      -> groupby(doc_id) doclen/max_tf              [stage doclen]
      -> salted groupby(term, salt) merge+compress  [stage chunks]
      -> groupby(term) df                           [stage df]
      -> weight partials -> groupby(doc_id) norms   [stage norms]
      -> normalized weights + block maxima -> doc-partitioned shards
                                                    [stage shards]

Every stage directory is checkpointed with a fingerprinted ``_SUCCESS``
marker (state/manifest.py); a restarted build skips completed stages, and
within the blocks/shards stages each file is content-named and written
atomically so partial stage re-runs skip completed partitions.  All
intermediates are partitioned Parquet, never one giant file.

Output layout under ``out_dir``::

    convs.parquet      conv_id -> (base doc_id, n_turns)     [docmap seed]
    blocks/            SPIMI block triples (term, doc_id, tf) + manifest
    doclen/            doc_id, doc_len, max_tf
    chunks/            merged compressed chunks
    df/                term -> df
    norms/             doc_id -> per-scheme L2 norms
    shards/part-SSSSS.parquet   final index, one file per doc-range shard
    stats.json         N, avgdl, counts, config, lineage, stage metrics
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import IndexConfig
from ..stages.docids import assign_doc_ids, conversation_offsets
from ..stages.merge import df_table, merge_postings, range_size_for
from ..stages.norms import doclen_table, finalize_chunks, norms_table
from ..stages.tokenize_stage import TokenizeWriteBlocks
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
        t = pq.read_table(self.out_dir / "df", columns=["term", "df"])
        return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    def shard_files(self) -> list[Path]:
        return sorted((self.out_dir / "shards").glob("part-*.parquet"))


def _dense_array(
    table: pa.Table, key: str, val: str, n: int, dtype=np.float64
) -> np.ndarray:
    arr = np.zeros(n, dtype=dtype)
    arr[table[key].to_numpy()] = table[val].to_numpy()
    return arr


def _write_shard_factory(shards_dir: str):
    def write_shard(group: pa.Table) -> pa.Table:
        sid = int(group["salt"][0].as_py())
        path = Path(shards_dir) / f"part-{sid:05d}.parquet"
        ordered = group.sort_by([("term", "ascending")])
        written = atomic_write_bytes(path, lambda tmp: pq.write_table(ordered, tmp))
        return pa.table(
            {
                "shard": pa.array([sid], type=pa.int32()),
                "n_rows": pa.array([group.num_rows], type=pa.int64()),
                "n_postings": pa.array(
                    [int(pa.compute.sum(group["n"]).as_py() or 0)], type=pa.int64()
                ),
                "skipped": pa.array([not written], type=pa.bool_()),
            }
        )

    return write_shard


def build_index(
    transcripts: str | Path,
    out_dir: str | Path,
    config: IndexConfig | None = None,
    *,
    concurrency: int | None = None,
) -> IndexMeta:
    """Build (or resume building) the index. Idempotent; returns metadata."""
    config = config or IndexConfig()
    if concurrency is None:
        # actor-pool width for the stateful tokenize stage: leave headroom for
        # the upstream read tasks — a fixed pool equal to all CPUs starves the
        # reader and deadlocks the streaming executor
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = transcript_paths(transcripts)
    lineage = input_lineage(paths)
    fp = config.fingerprint() + "-" + str(hash(json.dumps(lineage, sort_keys=True)))
    metrics: dict[str, Any] = {}
    t_start = time.perf_counter()

    # ---- stage: convs (doc_id base offsets; the stable-turn-ordering seed)
    convs_path = out / "convs.parquet"
    if stage_complete(out / "stage_convs", fp) is None:
        ds = read_transcripts(paths, columns=["conv_id", "turn_idx"])
        offsets, N = conversation_offsets(ds)
        convs_sorted = sorted(offsets)
        bases = [offsets[c] for c in convs_sorted]
        sizes = [
            (bases[i + 1] if i + 1 < len(bases) else N) - bases[i]
            for i in range(len(bases))
        ]
        atomic_write_bytes(
            convs_path,
            lambda tmp: pq.write_table(
                pa.table(
                    {
                        "conv_id": pa.array(convs_sorted, type=pa.string()),
                        "base": pa.array(bases, type=pa.int64()),
                        "n_turns": pa.array(sizes, type=pa.int64()),
                    }
                ),
                tmp,
            ),
        )
        (out / "stage_convs").mkdir(exist_ok=True)
        mark_stage_complete(out / "stage_convs", fp, n_convs=len(offsets), N=N)
    convs = pq.read_table(convs_path)
    offsets = dict(zip(convs["conv_id"].to_pylist(), convs["base"].to_pylist()))
    N = int(pa.compute.sum(convs["n_turns"]).as_py())
    metrics["n_convs"] = len(offsets)
    range_size = range_size_for(N, config.salt_buckets)

    # ---- stage: blocks (tokenize -> SPIMI blocks with per-block lineage)
    blocks_dir = out / "blocks"
    if stage_complete(blocks_dir, fp) is None:
        begin_stage(blocks_dir, fp, keep_partials=True)
        ds = read_transcripts(paths)
        offsets_ref = ray.put(offsets)
        manifest = (
            ds.map_batches(
                assign_doc_ids,
                fn_kwargs={"offsets_ref": offsets_ref},
                batch_format="pyarrow",
                batch_size=config.tokenize_batch_size,
            )
            .map_batches(
                TokenizeWriteBlocks,
                fn_constructor_args=(config.mode, str(blocks_dir)),
                batch_format="pyarrow",
                concurrency=concurrency,
                batch_size=config.tokenize_batch_size,
            )
            .take_all()
        )
        # batch boundaries may shift between runs at different parallelism:
        # drop any same-fingerprint leftover blocks this run did not produce,
        # or downstream reads would double-count their postings
        listed = {b["block"] for b in manifest}
        for f in blocks_dir.glob("block-*.parquet"):
            if f.name not in listed:
                f.unlink()
        atomic_write_json(blocks_dir / "manifest.json", {"blocks": manifest})
        mark_stage_complete(
            blocks_dir,
            fp,
            n_blocks=len(manifest),
            n_posting_rows=int(sum(b["n_rows"] for b in manifest)),
            n_tokens=int(sum(max(0, b["n_tokens"]) for b in manifest)),
        )
    block_files = sorted(str(f) for f in blocks_dir.glob("block-*.parquet"))

    def triples_ds() -> ray.data.Dataset:
        return ray.data.read_parquet(block_files)

    # ---- stage: doclen (A2/A3)
    doclen_dir = out / "doclen"
    if stage_complete(doclen_dir, fp) is None:
        begin_stage(doclen_dir, fp, keep_partials=False)
        dl = doclen_table(triples_ds())
        dl = dl.rename_columns({"sum(tf)": "doc_len", "max(tf)": "max_tf"})
        dl.write_parquet(str(doclen_dir))
        mark_stage_complete(doclen_dir, fp)
    doclen_tbl = pq.read_table(doclen_dir, columns=["doc_id", "doc_len", "max_tf"])
    total_doc_len = int(pa.compute.sum(doclen_tbl["doc_len"]).as_py() or 0)
    avgdl = total_doc_len / N if N else 0.0

    # ---- stage: chunks (the salted A1 merge shuffle)
    chunks_dir = out / "chunks"
    if stage_complete(chunks_dir, fp) is None:
        begin_stage(chunks_dir, fp, keep_partials=False)
        chunks = merge_postings(triples_ds(), N, config.salt_buckets)
        chunks.write_parquet(str(chunks_dir))
        mark_stage_complete(chunks_dir, fp)

    def chunks_ds() -> ray.data.Dataset:
        return ray.data.read_parquet(str(chunks_dir))

    # ---- stage: df (A4)
    df_dir = out / "df"
    if stage_complete(df_dir, fp) is None:
        begin_stage(df_dir, fp, keep_partials=False)
        df = df_table(chunks_ds()).rename_columns({"sum(df_chunk)": "df"})
        df.write_parquet(str(df_dir))
        mark_stage_complete(df_dir, fp)
    df_tbl = pq.read_table(df_dir, columns=["term", "df"])
    n_terms = df_tbl.num_rows
    df_map = dict(zip(df_tbl["term"].to_pylist(), df_tbl["df"].to_pylist()))

    # broadcast doc side-tables once (dense doc_ids -> flat arrays)
    doclen_ref = ray.put(_dense_array(doclen_tbl, "doc_id", "doc_len", N))
    maxtf_ref = ray.put(_dense_array(doclen_tbl, "doc_id", "max_tf", N))
    df_ref = ray.put(df_map)

    # ---- stage: norms (A7 — per-scheme L2 norms, computed once at build)
    norms_dir = out / "norms"
    if stage_complete(norms_dir, fp) is None:
        begin_stage(norms_dir, fp, keep_partials=False)
        norms = norms_table(chunks_ds(), doclen_ref, maxtf_ref, df_ref, N, avgdl)
        norms = norms.rename_columns({"sum(nsq1)": "nsq1", "sum(nsq2)": "nsq2"})
        norms.write_parquet(str(norms_dir))
        mark_stage_complete(norms_dir, fp)
    norms_tbl = pq.read_table(norms_dir)
    norm1 = np.sqrt(_dense_array(norms_tbl, "doc_id", "nsq1", N))
    norm2 = np.sqrt(_dense_array(norms_tbl, "doc_id", "nsq2", N))
    norm1[norm1 == 0] = 1.0  # zero-term docs never score; avoid 0/0
    norm2[norm2 == 0] = 1.0

    # ---- stage: shards (normalized weights + block maxima, doc-partitioned)
    shards_dir = out / "shards"
    if stage_complete(shards_dir, fp) is None:
        begin_stage(shards_dir, fp, keep_partials=True)
        final = chunks_ds().map_batches(
            finalize_chunks,
            fn_kwargs={
                "doclen_ref": doclen_ref,
                "maxtf_ref": maxtf_ref,
                "df_ref": df_ref,
                "norm1_ref": ray.put(norm1),
                "norm2_ref": ray.put(norm2),
                "N": N,
                "avgdl": avgdl,
            },
            batch_format="pyarrow",
        )
        shard_manifest = (
            final.groupby("salt")
            .map_groups(_write_shard_factory(str(shards_dir)), batch_format="pyarrow")
            .take_all()
        )
        mark_stage_complete(
            shards_dir,
            fp,
            shards=sorted(
                (
                    {k: (v if isinstance(v, bool) else int(v)) for k, v in m.items()}
                    for m in shard_manifest
                ),
                key=lambda m: m["shard"],
            ),
        )

    n_postings = sum(df_map.values())
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
