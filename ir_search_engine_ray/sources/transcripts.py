"""Transcripts source: column-pruned Parquet read + schema validation.

The analogue of the reference's directory-lister / file-reader sources
(``index/Indexer.java:72-117``, ``pyindex/tokenizer.py:46-55``) — except the
corpus arrives as a Parquet table of conversation turns, so the "source" is
``ray.data.read_parquet`` with only the columns the index needs.  Reading
``role``/``tool``/``ts`` here would ship dead payload through every downstream
stage, so they are pruned at the read (they are metadata, not indexed text).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import ray.data

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

INDEX_COLUMNS = ["conv_id", "turn_idx", "text"]


def transcript_paths(path: str | Path | list[str]) -> list[str]:
    if isinstance(path, list):
        return path
    p = Path(path)
    if p.is_dir():
        files = sorted(str(f) for f in p.glob("*.parquet"))
        if not files:
            raise FileNotFoundError(f"no parquet files under {p}")
        return files
    return [str(p)]


def read_transcripts(
    path: str | Path,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read the transcripts table, pruned to the indexing columns."""
    return ray.data.read_parquet(
        transcript_paths(path),
        columns=columns or INDEX_COLUMNS,
        override_num_blocks=override_num_blocks,
    )


def docs_dir_to_transcripts(
    path: str | Path,
    out_parquet_dir: str | Path,
    *,
    glob: str = "*",
    encoding: str = "utf-8",
    rows_per_file: int = 4096,
) -> str:
    """Reference-style corpus source: a directory/glob of one-document-per-
    file text/SGML files (``index/Indexer.java:74-88`` lists and sorts
    filenames; ``pyindex/tokenizer.py:46-59`` globs ``Cranfield/*``) ->
    transcripts-shaped parquet, so every pipeline in this repo runs on the
    reference's own corpora unchanged.

    Mapping: ``conv_id`` = the file's name (the reference's external doc
    key), ``turn_idx`` = 0 (one doc per file); doc_ids then enumerate files
    in sorted-name order exactly like the reference.  Tag stripping stays
    in the tokenizer (``textproc.normalize_text``), not here — the raw text
    is preserved for snippets.  The read is distributed
    (``read_binary_files`` over the sorted file list); the parquet rewrite
    makes the one-time conversion resumable and every later read
    column-pruned.
    """
    import pyarrow.parquet as pq

    p = Path(path)
    files = sorted(str(f) for f in p.glob(glob) if Path(f).is_file())
    if not files:
        raise FileNotFoundError(f"no files matching {glob!r} under {p}")
    out = Path(out_parquet_dir)
    out.mkdir(parents=True, exist_ok=True)

    def decode(batch: dict) -> pa.Table:
        names = [Path(x).name for x in batch["path"]]
        texts = [bytes(b).decode(encoding, errors="replace") for b in batch["bytes"]]
        n = len(names)
        return pa.table(
            {
                "conv_id": pa.array(names, type=pa.string()),
                "turn_idx": pa.array([0] * n, type=pa.int32()),
                "role": pa.array(["doc"] * n, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "tool": pa.array([""] * n, type=pa.string()),
                "ts": pa.array([0] * n, type=pa.int64()).cast(pa.timestamp("us")),
            }
        )

    ds = ray.data.read_binary_files(files, include_paths=True).map_batches(
        decode, batch_format="numpy", batch_size=rows_per_file
    )
    ds.write_parquet(str(out))
    # normalize ray's output names so transcript_paths glob finds them
    if not list(out.glob("*.parquet")):
        raise RuntimeError(f"write_parquet produced no files under {out}")
    # sanity: the table round-trips with the expected schema
    pq.read_table(str(out), columns=INDEX_COLUMNS)
    return str(out)


def jsonl_to_transcripts(
    path: str | Path,
    out_parquet_dir: str | Path,
    *,
    glob: str = "*.jsonl",
    text_field: str = "text",
    id_field: str | None = None,
) -> str:
    """JSONL corpus source: a file or directory of newline-delimited JSON
    shards -> transcripts-shaped parquet, the common interchange format of
    web-scale text dumps.

    Each shard parses with pyarrow's vectorized NDJSON reader (one Ray task
    per shard — shard count is the parallelism unit, as usual for JSONL
    dumps).  ``conv_id`` comes from ``id_field`` when given, else
    ``<shard-name>:<row>`` (deterministic: rows keep file order).  The
    rewrite to parquet makes the one-time conversion resumable and every
    later read column-pruned, exactly like ``docs_dir_to_transcripts``.
    """
    import pyarrow.parquet as pq

    p = Path(path)
    if p.is_dir():
        files = sorted(str(f) for f in p.glob(glob) if Path(f).is_file())
        if not files:
            raise FileNotFoundError(f"no files matching {glob!r} under {p}")
    else:
        files = [str(p)]
    out = Path(out_parquet_dir)
    out.mkdir(parents=True, exist_ok=True)

    def decode(batch: dict) -> pa.Table:
        import io

        from pyarrow import json as pa_json

        out_tbls = []
        for path_, data in zip(batch["path"], batch["bytes"]):
            t = pa_json.read_json(io.BytesIO(bytes(data)))
            if text_field not in t.column_names:
                raise ValueError(
                    f"{path_}: JSONL rows lack the {text_field!r} field "
                    f"(have {t.column_names})"
                )
            n = t.num_rows
            text = t[text_field].cast(pa.string())
            if id_field is not None:
                if id_field not in t.column_names:
                    raise ValueError(
                        f"{path_}: JSONL rows lack the {id_field!r} field"
                    )
                conv = t[id_field].cast(pa.string())
            else:
                name = Path(path_).name
                conv = pa.array(
                    [f"{name}:{i}" for i in range(n)], type=pa.string()
                )
            out_tbls.append(
                pa.table(
                    {
                        "conv_id": conv,
                        "turn_idx": pa.array([0] * n, type=pa.int32()),
                        "role": pa.array(["doc"] * n, type=pa.string()),
                        "text": text,
                        "tool": pa.array([""] * n, type=pa.string()),
                        "ts": pa.array([0] * n, type=pa.int64()).cast(
                            pa.timestamp("us")
                        ),
                    }
                )
            )
        return pa.concat_tables(out_tbls)

    ds = ray.data.read_binary_files(files, include_paths=True).map_batches(
        decode, batch_format="numpy", batch_size=1
    )
    ds.write_parquet(str(out))
    if not list(out.glob("*.parquet")):
        raise RuntimeError(f"write_parquet produced no files under {out}")
    pq.read_table(str(out), columns=INDEX_COLUMNS)
    return str(out)
