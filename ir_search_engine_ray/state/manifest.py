"""Checkpoint / resume state for the index build.

The reference's resume story is a whole-index pickle cache
(``search/Driver.java:26-61``, ``pyindex/driver.py:11-22``).  The rebuild
replaces it with per-stage and per-partition checkpoints (north rule:
"resumable from checkpoint with per-partition lineage + metrics"):

- every stage directory gets a ``_SUCCESS`` JSON marker carrying a
  fingerprint of (input lineage, config) plus stage metrics; a restarted
  build skips stages whose marker matches;
- within the tokenize stage, each SPIMI block file is written atomically
  (tmp + rename) under a content-derived deterministic name, so a re-run
  skips blocks that already exist and re-tokenizes only missing ones;
- shard writes work the same way (atomic + ``.done`` markers).

Atomic rename on the same filesystem makes all markers crash-safe.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Any

SUCCESS = "_SUCCESS"


def atomic_write_json(path: Path, payload: dict[str, Any]) -> None:
    tmp = path.with_name(f".{path.name}.{uuid.uuid4().hex}.tmp")
    tmp.write_text(json.dumps(payload, indent=2, sort_keys=True))
    os.replace(tmp, path)


def atomic_write_bytes(path: Path, write_fn) -> bool:
    """Write a file atomically via ``write_fn(tmp_path)``; returns False if
    ``path`` already exists (idempotent skip for retried tasks)."""
    if path.exists():
        return False
    tmp = path.with_name(f".{path.name}.{uuid.uuid4().hex}.tmp")
    write_fn(tmp)
    if path.exists():  # lost a race with a retry — keep the winner
        os.remove(tmp)
        return False
    os.replace(tmp, path)
    return True


def stage_complete(stage_dir: Path, fingerprint: str) -> dict[str, Any] | None:
    """Return the stage's marker payload iff it completed with this
    fingerprint (else None -> stage must (re)run)."""
    marker = stage_dir / SUCCESS
    if not marker.exists():
        return None
    try:
        payload = json.loads(marker.read_text())
    except (OSError, json.JSONDecodeError):
        return None
    if payload.get("fingerprint") != fingerprint:
        return None
    return payload


def mark_stage_complete(
    stage_dir: Path, fingerprint: str, **metrics: Any
) -> dict[str, Any]:
    payload = {"fingerprint": fingerprint, **metrics}
    atomic_write_json(stage_dir / SUCCESS, payload)
    return payload


def begin_stage(stage_dir: Path, fingerprint: str, keep_partials: bool) -> None:
    """Prepare a stage directory for (re)execution.

    - ``keep_partials=True`` (blocks / shards, whose files are content-named
      and written atomically): partial output from a previous run with the
      SAME fingerprint is kept so completed partitions are skipped; anything
      from a different fingerprint is cleared.
    - ``keep_partials=False`` (``write_parquet`` stages, whose file names are
      run-random): the directory is always cleared — a re-run would otherwise
      APPEND a second copy of every row next to the stale one.
    """
    import shutil

    started = stage_dir / "_STARTED"
    keep = False
    if keep_partials and started.exists():
        try:
            keep = json.loads(started.read_text()).get("fingerprint") == fingerprint
        except (OSError, json.JSONDecodeError):
            keep = False
    if stage_dir.exists() and not keep:
        shutil.rmtree(stage_dir)
    stage_dir.mkdir(parents=True, exist_ok=True)
    atomic_write_json(started, {"fingerprint": fingerprint})


def input_lineage(paths: list[str]) -> list[dict[str, Any]]:
    """Input-file lineage: path + size (testdata is read-only, size is a
    sufficient change detector in this sandbox)."""
    out = []
    for p in sorted(paths):
        st = os.stat(p)
        out.append({"path": p, "bytes": st.st_size})
    return out
