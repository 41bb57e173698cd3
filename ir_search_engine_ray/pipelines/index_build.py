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
      -> groupby(term) df over chunk rows (vocab-sized) [stage df]
      -> one finalize task per salt: local doc stats + norms,
         normalized weights, block maxima -> shard + norms files
                                                       [stage shards]

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
    chunks/            chunk-s*.parquet merged compressed chunks, one per salt
    df/                term -> df
    norms/             norms-s*.parquet  doc_id -> per-scheme squared norms
    shards/part-*.parquet   final index, one file per doc-range shard
    stats.json         N, avgdl, counts, config, lineage, stage metrics
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import IndexConfig
from ..stages.docids import assign_doc_ids, conversation_offsets
from ..stages.merge import merge_salt_table, range_size_for
from ..stages.norms import finalize_salt
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


def _merge_salt_task(chunks_dir: str):
    """Per-salt reduce task: read this salt's runs, merge+compress, write."""

    def run(item: dict) -> dict:
        salt = int(item["salt"])
        triples = pa.concat_tables([pq.read_table(f) for f in item["files"]])
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


def _finalize_salt_task(
    shards_dir: str, norms_dir: str, df_ref, N: int, avgdl: float
):
    """Per-salt finalize task: chunk file -> norms file + shard file."""

    def run(item: dict) -> dict:
        salt = int(item["salt"])
        chunks = pq.read_table(item["file"])
        df_map = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) else df_ref
        norms_tbl, shard = finalize_salt(chunks, df_map, N, avgdl)
        atomic_write_bytes(
            Path(norms_dir) / f"norms-s{salt:06d}.parquet",
            lambda tmp: pq.write_table(norms_tbl, tmp),
        )
        written = atomic_write_bytes(
            Path(shards_dir) / f"part-{salt:05d}.parquet",
            lambda tmp: pq.write_table(shard, tmp),
        )
        return {
            "shard": salt,
            "n_rows": shard.num_rows,
            "n_postings": int(pa.compute.sum(shard["n"]).as_py() or 0),
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
    fp = (
        config.fingerprint()
        + "-"
        + hashlib.sha256(json.dumps(lineage, sort_keys=True).encode()).hexdigest()[:16]
    )
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
    N = int(pa.compute.sum(convs["n_turns"]).as_py() or 0)
    metrics["n_convs"] = len(offsets)
    range_size = range_size_for(N, config.salt_buckets)

    # ---- stage: blocks (tokenize -> salt-partitioned SPIMI runs + doclen)
    blocks_dir = out / "blocks"
    doclen_dir = out / "doclen"
    marker = stage_complete(blocks_dir, fp)
    if marker is None:
        begin_stage(blocks_dir, fp, keep_partials=True)
        begin_stage(doclen_dir, fp, keep_partials=True)
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
                fn_constructor_args=(
                    config.mode,
                    str(blocks_dir),
                    str(doclen_dir),
                    range_size,
                ),
                batch_format="pyarrow",
                concurrency=concurrency,
                batch_size=config.tokenize_batch_size,
            )
            .take_all()
        )
        # batch boundaries may shift between runs at different parallelism:
        # drop any same-fingerprint leftover files this run did not produce,
        # or downstream reads would double-count their postings
        listed = {m["file"] for m in manifest}
        for f in list(blocks_dir.glob("block-*.parquet")) + list(
            doclen_dir.glob("doclen-*.parquet")
        ):
            if f.name not in listed:
                f.unlink()
        atomic_write_json(blocks_dir / "manifest.json", {"files": manifest})
        dl_files = sorted(str(f) for f in doclen_dir.glob("doclen-*.parquet"))
        total_doc_len = int(
            ray.data.read_parquet(dl_files, columns=["doc_len"]).sum("doc_len")
            or 0
        ) if dl_files else 0
        marker = mark_stage_complete(
            blocks_dir,
            fp,
            n_files=len(manifest),
            n_posting_rows=int(
                sum(m["n_rows"] for m in manifest if m["kind"] == "block")
            ),
            n_tokens=int(
                sum(max(0, m["n_tokens"]) for m in manifest if m["kind"] == "doclen")
            ),
            total_doc_len=total_doc_len,
        )
    total_doc_len = int(marker["total_doc_len"])
    avgdl = total_doc_len / N if N else 0.0
    block_files = sorted(blocks_dir.glob("block-*.parquet"))
    by_salt: dict[int, list[str]] = {}
    for f in block_files:
        by_salt.setdefault(int(f.name.split("-")[1][1:]), []).append(str(f))

    # ---- stage: chunks (per-salt merge reduce: the A1 "shuffle" is file
    # placement — no Ray all-to-all)
    chunks_dir = out / "chunks"
    if stage_complete(chunks_dir, fp) is None:
        begin_stage(chunks_dir, fp, keep_partials=True)
        items = [
            {"salt": s, "files": fl} for s, fl in sorted(by_salt.items())
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

    # ---- stage: df (A4 — vocabulary-sized groupby over chunk rows)
    df_dir = out / "df"
    if stage_complete(df_dir, fp) is None:
        begin_stage(df_dir, fp, keep_partials=False)
        df = (
            ray.data.read_parquet(
                [str(f) for f in chunk_files], columns=["term", "df_chunk"]
            )
            .groupby("term")
            .aggregate(Sum("df_chunk"))
            .rename_columns({"sum(df_chunk)": "df"})
        )
        df.write_parquet(str(df_dir))
        mark_stage_complete(df_dir, fp)
    df_tbl = pq.read_table(df_dir, columns=["term", "df"])
    n_terms = df_tbl.num_rows
    df_map = dict(zip(df_tbl["term"].to_pylist(), df_tbl["df"].to_pylist()))

    # ---- stage: shards (per-salt finalize: local norms + normalized
    # weights + block maxima; A7 done once at build, never per query)
    shards_dir = out / "shards"
    norms_dir = out / "norms"
    if stage_complete(shards_dir, fp) is None:
        begin_stage(shards_dir, fp, keep_partials=True)
        begin_stage(norms_dir, fp, keep_partials=True)
        df_ref = ray.put(df_map)
        items = [
            {"salt": int(f.name[7:13]), "file": str(f)} for f in chunk_files
        ]
        shard_manifest = _per_salt(
            items,
            _finalize_salt_task(str(shards_dir), str(norms_dir), df_ref, N, avgdl),
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
