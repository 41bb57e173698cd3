"""Deterministic synthetic transcripts + query-set generator.

The driver's testdata (`/root/testdata/sf*/`) has no transcripts table, so the
input table fixed by BASELINE.json's input_hint —
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` — is synthesized here, deterministically (fixed seeds, no
wall-clock), at a scale proportional to the testdata scale factor.  See
FIXTURES.md for the spec this implements:

- ~2,000 content words with Zipf(s=1.1) frequencies (head terms appear in most
  docs — exercises the salted groupby('term') merge), built from syllables
  plus derivational suffixes so the Porter stemmer conflates surface forms;
- the reference stopword list mixed in at ~35% token rate;
- low-rate "nasty" tokens exercising the TokenFilter cascade
  (``preprocess/TokenFilter.java:15-33``): dotted acronyms, meaningful dashes,
  numbers-only, digit-prefixed, punctuation edges;
- turn length log-normal, clamped to 5..200 tokens, first token always a
  content word (so every turn has >= 1 index term);
- conversations of 8..64 turns, ``conv-%06d`` ids, dense 0-based ``turn_idx``,
  roles cycling user/assistant/tool, ``ts`` monotone within a conversation.

Scale: ``n_turns = int(2_000_000 * sf)`` (sf0.001 -> 2k, sf0.01 -> 20k,
sf0.1 -> 200k).  Files are written atomically (tmp dir + rename) so concurrent
callers and the DuckDB oracle always see a complete fixture.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = Path(os.environ.get("GRAFT_FIXTURE_ROOT", "/tmp/graft_fixtures"))
VOCAB_SEED = 7
BASE_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

_SYLLABLES = [
    "flow", "mach", "aero", "therm", "press", "turb", "lam", "visc", "shock",
    "bound", "layer", "wing", "noz", "jet", "heat", "cond", "rad", "son",
    "velo", "grad", "stat", "dyn", "plas", "ion", "magn", "hydro", "gas",
    "fluid", "vort", "wake", "lift", "drag", "span", "chord", "foil", "blade",
    "rot", "osc", "damp", "stiff", "elas", "stress", "strain", "fatig",
    "crack", "weld", "alloy", "steel", "titan", "compos",
]
_SUFFIXES = ["", "", "", "", "s", "ing", "ed", "ation", "ness", "ity", "al", "ive"]

_NASTY = [
    "u.s.a.", "i.b.m.", "mach-3", "re-entry", "x-15", "1400", "3.5",
    "10degree", "(flow)", "wing,", "''", "--", "a/b", "ph.d.", "co-axial",
]

_TOOLS = ["search", "calculator", "code_exec", "retrieval"]


def build_vocab(n_words: int = 2000, seed: int = VOCAB_SEED) -> list[str]:
    """Deterministic synthetic content vocabulary (lowercase ASCII words)."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = []
    seen = set()
    while len(vocab) < n_words:
        n_syl = int(rng.integers(1, 4))
        word = "".join(rng.choice(_SYLLABLES) for _ in range(n_syl))
        word += _SUFFIXES[int(rng.integers(0, len(_SUFFIXES)))]
        if word not in seen and len(word) > 2:
            seen.add(word)
            vocab.append(word)
    return vocab


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


def generate_transcripts(n_turns: int, seed: int = 0) -> pa.Table:
    """Generate the transcripts table with ~``n_turns`` rows (exact count
    depends on the final conversation's length; always >= n_turns)."""
    from .textproc.stopwords import STOPWORDS

    rng = np.random.default_rng(seed)
    vocab = np.array(build_vocab(), dtype=object)
    stop = np.array(sorted(STOPWORDS), dtype=object)
    nasty = np.array(_NASTY, dtype=object)
    zipf_cum = np.cumsum(_zipf_probs(len(vocab)))

    # conversation sizes until we cover n_turns
    conv_sizes = []
    total = 0
    while total < n_turns:
        size = int(rng.integers(8, 65))
        conv_sizes.append(size)
        total += size
    conv_sizes = np.array(conv_sizes)
    n_rows = int(conv_sizes.sum())
    n_convs = len(conv_sizes)

    conv_idx = np.repeat(np.arange(n_convs), conv_sizes)
    conv_ids = np.array([f"conv-{i:06d}" for i in range(n_convs)], dtype=object)
    turn_idx = np.concatenate([np.arange(s) for s in conv_sizes]).astype(np.int32)

    roles = np.array(["user", "assistant", "tool"], dtype=object)[turn_idx % 3]
    tool_pick = np.array(_TOOLS, dtype=object)[
        rng.integers(0, len(_TOOLS), size=n_rows)
    ]
    tools = np.where(roles == "tool", tool_pick, "")

    ts = (
        BASE_EPOCH_US
        + conv_idx.astype(np.int64) * 3_600_000_000
        + turn_idx.astype(np.int64) * 7_000_000
    )

    # token counts per turn: log-normal clamped to [5, 200]
    lens = np.clip(
        np.exp(rng.normal(3.2, 0.8, size=n_rows)).astype(np.int64), 5, 200
    )
    total_tokens = int(lens.sum())

    # token type: 0=content, 1=stopword, 2=nasty
    kind = rng.choice(
        np.array([0, 1, 2], dtype=np.int8), size=total_tokens, p=[0.62, 0.35, 0.03]
    )
    # force first token of each turn to be content
    starts = np.cumsum(lens) - lens
    kind[starts] = 0

    content_pick = vocab[np.searchsorted(zipf_cum, rng.random(total_tokens))]
    stop_pick = stop[rng.integers(0, len(stop), size=total_tokens)]
    nasty_pick = nasty[rng.integers(0, len(nasty), size=total_tokens)]
    tokens = np.where(kind == 0, content_pick, np.where(kind == 1, stop_pick, nasty_pick))

    # vectorized join: tokens as Arrow list columns -> binary_join, in row
    # slices so each token array stays under the 32-bit string-offset limit
    import pyarrow.compute as pc

    tok_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=tok_offsets[1:])
    text_chunks = []
    step = 1_000_000
    for r0 in range(0, n_rows, step):
        r1 = min(r0 + step, n_rows)
        t0, t1 = tok_offsets[r0], tok_offsets[r1]
        offs = (tok_offsets[r0 : r1 + 1] - t0).astype(np.int32)
        tok_arr = pa.array(tokens[t0:t1], type=pa.string())
        if isinstance(tok_arr, pa.ChunkedArray):
            tok_arr = tok_arr.combine_chunks()
        text_chunks.append(
            pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), tok_arr),
                " ",
            )
        )
    texts = pa.chunked_array(text_chunks)

    return pa.table(
        {
            "conv_id": pa.array(conv_ids[conv_idx], type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": texts,
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def generate_queries(n_queries: int = 20, seed: int = 1) -> pa.Table:
    """Reference-style query set: free text mixing head/tail content words,
    stopwords, hyphenated/punctuated tokens and out-of-vocab terms (the
    "Term not found" path, ``search/QueryParser.java:162-165``)."""
    rng = np.random.default_rng(seed)
    vocab = build_vocab()
    head = vocab[:50]
    tail = vocab[200:]
    fillers = ["what", "is", "the", "of", "for", "how", "can"]
    oov = ["xylophone", "zzyzx", "quixotic"]
    texts = []
    for qi in range(n_queries):
        parts = [fillers[int(rng.integers(0, len(fillers)))]]
        for _ in range(int(rng.integers(2, 6))):
            src = head if rng.random() < 0.5 else tail
            parts.append(src[int(rng.integers(0, len(src)))])
        if qi % 5 == 0:
            parts.append(_NASTY[int(rng.integers(0, len(_NASTY)))])
        if qi % 7 == 0:
            parts.append(oov[int(rng.integers(0, len(oov)))])
        texts.append(" ".join(parts))
    return pa.table(
        {
            "query_id": pa.array(np.arange(n_queries, dtype=np.int32)),
            "text": texts,
        }
    )


def sf_name(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> 'sf0.01' (also accepts bare 'sf0.01')."""
    name = Path(sf_dir).name
    if not name.startswith("sf"):
        raise ValueError(f"cannot infer scale factor from {sf_dir!r}")
    return name


def n_turns_for_sf(sf_dir: str) -> int:
    return max(200, int(2_000_000 * float(sf_name(sf_dir)[2:])))


ROWS_PER_FILE = 8192
_MARKER = "_SUCCESS_v2"  # bump when the fixture layout changes


def fixture_dir(sf_dir: str, n_turns: int | None = None) -> Path:
    """Return (and lazily, atomically create) the fixture dir for a scale.

    Layout: ``<root>/<sfname>/transcripts/part-*.parquet`` + ``queries.parquet``.
    The transcripts table is written as MANY files (like any real corpus at
    scale) — a single giant file caps ``read_parquet`` at one read task,
    which serializes the whole ingest.
    """
    name = sf_name(sf_dir)
    out = FIXTURE_ROOT / name
    if (out / _MARKER).exists():
        return out
    n = n_turns if n_turns is not None else n_turns_for_sf(sf_dir)
    tmp = FIXTURE_ROOT / f".tmp-{name}-{os.getpid()}"
    if tmp.exists():
        shutil.rmtree(tmp)
    (tmp / "transcripts").mkdir(parents=True)
    tbl = generate_transcripts(n)
    for i in range(0, tbl.num_rows, ROWS_PER_FILE):
        pq.write_table(
            tbl.slice(i, ROWS_PER_FILE),
            tmp / "transcripts" / f"part-{i // ROWS_PER_FILE:05d}.parquet",
        )
    pq.write_table(generate_queries(), tmp / "queries.parquet")
    (tmp / _MARKER).touch()
    if (out / _MARKER).exists():  # another process won the race
        shutil.rmtree(tmp)
    else:
        if out.exists():  # stale pre-v2 layout
            shutil.rmtree(out)
        os.rename(tmp, out)
    return out
