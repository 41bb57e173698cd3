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
