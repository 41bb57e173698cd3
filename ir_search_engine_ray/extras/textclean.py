"""Intra-document repetition removal (C4-style line dedup).

The C4 cleaning rule: within one document, keep only the FIRST occurrence
of each exact line — scraped pages repeat nav bars, footers and boilerplate
blocks, and repeated spans measurably hurt LM training.  Pure per-document
work: a single streaming ``map_batches``, no shuffle, trivially correct at
any scale.

Line definition: text is split on newlines when it has any; corpora
without line structure (like the synthetic fixtures) pass ``line_tokens=k``
to reflow the simple-split token stream into fixed ``k``-token lines first.
Both forms are exactly SQL-expressible, so the operator has a full DuckDB
oracle (counts AND the cleaned text itself hash-checked).

No reference analogue; first-class training-data operator per the round
brief.
"""

from __future__ import annotations

import re

import pyarrow as pa

_TOKEN = re.compile(r"[a-z]+")


def _doc_lines(text: str, line_tokens: int | None) -> list[str]:
    if line_tokens is None:
        return text.split("\n")
    toks = _TOKEN.findall(text.lower())
    return [
        " ".join(toks[i : i + line_tokens])
        for i in range(0, len(toks), line_tokens)
    ]


def dedup_lines(batch: pa.Table, *, line_tokens: int | None = None) -> pa.Table:
    """Per doc: (doc_id, n_lines, n_kept, text_clean) with duplicate lines
    (exact string match) dropped, first occurrence kept, original order."""
    n_lines_col, n_kept_col, clean_col = [], [], []
    for text in batch["text"].to_pylist():
        lines = _doc_lines(text, line_tokens)
        seen: set[str] = set()
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        n_lines_col.append(len(lines))
        n_kept_col.append(len(kept))
        clean_col.append("\n".join(kept))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines_col, type=pa.int64()),
            "n_kept": pa.array(n_kept_col, type=pa.int64()),
            "text_clean": pa.array(clean_col, type=pa.string()),
        }
    )
