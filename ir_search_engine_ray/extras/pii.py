"""PII detection and redaction over text columns.

Training-data hygiene stage: find and mask email addresses, IPv4
addresses, US-style phone numbers and SSN-shaped ids.  Patterns are
RE2-compatible (no backreferences/lookarounds except the word boundaries
DuckDB's RE2 supports) so the DuckDB oracle runs the IDENTICAL regexes via
``regexp_extract_all`` / ``regexp_replace(..., 'g')`` — the Ray output and
the SQL output agree byte-for-byte on counts and redacted text.

Single-pass ``map_batches`` transform: compiled patterns live in module
globals (compiled once per worker process at import), no shuffle, no
per-row Python beyond the regex engine itself.  At 100 TB this is a pure
streaming map; the only knob that matters is batch size vs text width.

No reference analogue; first-class training-data operator per the round
brief.
"""

from __future__ import annotations

import re

import pyarrow as pa

# Order matters: earlier categories are redacted first, so an SSN-shaped
# run inside an already-redacted email can't double-fire.  Each pattern is
# RE2-safe and mirrored verbatim into the SQL oracle.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
)

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def pii_scan(batch: pa.Table) -> pa.Table:
    """Per doc: count per PII category + the fully redacted text.

    Counts are taken against the PROGRESSIVELY redacted text (category
    order above), matching the oracle's chained ``regexp_replace``: a
    phone-shaped run inside an email is counted once, as the email."""
    texts = batch["text"].to_pylist()
    counts = {name: [] for name, _p, _r in _COMPILED}
    redacted = []
    for t in texts:
        cur = t
        for name, pat, repl in _COMPILED:
            found = pat.findall(cur)
            counts[name].append(len(found))
            if found:
                cur = pat.sub(repl, cur)
        redacted.append(cur)
    cols: dict = {"doc_id": batch["doc_id"]}
    for name, _p, _r in _COMPILED:
        cols[f"n_{name}"] = pa.array(counts[name], type=pa.int64())
    cols["n_pii"] = pa.array(
        [sum(counts[n][i] for n, _p, _r in _COMPILED) for i in range(len(texts))],
        type=pa.int64(),
    )
    cols["text_redacted"] = pa.array(redacted, type=pa.string())
    return pa.table(cols)
