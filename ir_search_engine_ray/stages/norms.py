"""Doc stats + cosine norms + normalized weights, derived from the chunks.

The reference recomputes every posting's weighted tf and every document's L2
norm on EVERY query (``search/QueryParser.java:108-133`` walks the whole
index per query and mutates it).  The rebuild computes them ONCE per serving
session at query-actor LOAD time — not per query, and not as a build stage:

- the on-disk index stores only compressed postings (stages/merge.py chunks)
  plus the doclen table written free during tokenize.  Materializing
  normalized weights (two float64 lists per posting) or a separate norms
  table would add build I/O for values that are a cheap vectorized function
  of what a shard actor already holds;
- a salt partition is a contiguous doc-id range holding ALL postings of its
  documents, so ``doc_len``, ``max_tf`` and the per-scheme L2 norms are
  exact LOCAL computations — dense bincount/scatter over the range, no
  shuffle, no sort, no broadcast doc-side tables;
- the only global inputs are scalars (N, avgdl) and the df table, broadcast
  via ``ray.put`` (term -> df dict, Zipf-small relative to postings).  At a
  vocabulary too large to broadcast, df is written term-range-partitioned
  and each actor streams only the term ranges its chunk rows contain (chunk
  rows are term-sorted, so that read is a single merge pass).

Weights are bit-identical to the reference semantics: w1/w2 kernels in
functions/scoring.py (incl. the Java integer-division idf quirk), norms
accumulated in posting order (same float64 operation order everywhere).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.codec import decode_postings_column
from ..functions.scoring import w1_weight, w2_weight


class DfStore:
    """Streaming access to the term-range-partitioned df table.

    The build writes ``df/part-*.parquet`` as term-sorted slices of bounded
    size (IndexConfig.df_part_rows).  A serving actor calls
    :meth:`lookup` with its LOCAL lexicon and reads only the parts whose
    term range overlaps it, filtering each part against the needed set —
    peak memory is one part plus the local lexicon, never the global
    vocabulary.  This is the scale path promised in the module docstring;
    ``load_all`` is the driver-side convenience for query parsing (one
    process, vocabulary-sized by design).
    """

    def __init__(self, df_dir: str | Path) -> None:
        import json

        d = Path(df_dir)
        self.files = sorted(d.glob("part-*.parquet"))
        ranges_file = d / "_ranges.json"
        if ranges_file.exists():
            by_name = json.loads(ranges_file.read_text())
            self.ranges = [tuple(by_name[f.name]) for f in self.files]
        else:
            # no sidecar (e.g. hand-built dir): every part may overlap
            self.ranges = [None] * len(self.files)

    def lookup(self, terms) -> dict[str, int]:
        need = sorted(set(terms))
        if not need:
            return {}
        lo, hi = need[0], need[-1]
        need_arr = pa.array(need, type=pa.string())
        out: dict[str, int] = {}
        for f, rng in zip(self.files, self.ranges):
            if rng is not None and (rng[1] < lo or rng[0] > hi):
                continue
            t = pq.read_table(f, columns=["term", "df"])
            t = t.filter(pc.is_in(t["term"], value_set=need_arr))
            out.update(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        return out

    def load_all(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for f in self.files:
            t = pq.read_table(f, columns=["term", "df"])
            out.update(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        return out

NORMS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("doc_len", pa.int64()),
        ("max_tf", pa.int64()),
        ("nsq1", pa.float64()),
        ("nsq2", pa.float64()),
    ]
)


def _decode_with_stats(chunks: pa.Table, df_map: dict[str, int], N: int, avgdl: float):
    """Decode chunk rows and compute exact local doc stats + weights.

    -> (doc_ids, tfs, lens, per-posting dense offsets, dense doc stats dict)
    where dense arrays span [doc_ids.min(), doc_ids.max()].
    """
    doc_ids, tfs, lens = decode_postings_column(
        chunks["id_bytes"], chunks["tf_bytes"]
    )
    df_per_row = np.array(
        [df_map[t] for t in chunks["term"].to_pylist()], dtype=np.int64
    )
    dfs = np.repeat(df_per_row, lens)
    lo = int(doc_ids.min())
    span = int(doc_ids.max()) - lo + 1
    off = doc_ids - lo
    doc_len = np.bincount(off, weights=tfs, minlength=span).astype(np.int64)
    max_tf = np.zeros(span, dtype=np.int64)
    np.maximum.at(max_tf, off, tfs)

    w1 = w1_weight(tfs, max_tf[off], dfs, N)
    w2 = w2_weight(tfs, doc_len[off], dfs, N, avgdl)
    nsq1 = np.bincount(off, weights=w1 * w1, minlength=span)
    nsq2 = np.bincount(off, weights=w2 * w2, minlength=span)
    stats = {
        "lo": lo,
        "doc_len": doc_len,
        "max_tf": max_tf,
        "nsq1": nsq1,
        "nsq2": nsq2,
    }
    return doc_ids, tfs, lens, off, (w1, w2), stats


def salt_stats_table(
    chunks: pa.Table, df_map: dict[str, int], N: int, avgdl: float
) -> pa.Table:
    """Chunk rows -> doc-stats/norms table (one row per posted doc).

    Derivable artifact — exposed for tests/debugging and as the A2/A3/A7
    parity surface; the serving path computes the same values in-process.
    """
    if chunks.num_rows == 0:
        return NORMS_SCHEMA.empty_table()
    _ids, _tfs, _lens, _off, _w, s = _decode_with_stats(chunks, df_map, N, avgdl)
    posted = np.flatnonzero(s["doc_len"])
    return pa.table(
        {
            "doc_id": pa.array(posted + s["lo"], type=pa.int64()),
            "doc_len": pa.array(s["doc_len"][posted], type=pa.int64()),
            "max_tf": pa.array(s["max_tf"][posted], type=pa.int64()),
            "nsq1": pa.array(s["nsq1"][posted], type=pa.float64()),
            "nsq2": pa.array(s["nsq2"][posted], type=pa.float64()),
        }
    )


def load_weights(
    chunks: pa.Table, df_map: dict[str, int], N: int, avgdl: float
) -> tuple[np.ndarray, np.ndarray, dict[str, np.ndarray]]:
    """Chunk rows -> (flat doc_ids, per-row lengths, {scheme: flat wn}).

    The query-actor load path: normalized weight
    ``wn(t,d) = w(t,d) / ||d_w||`` per posting, all local.
    """
    doc_ids, _tfs, lens, off, (w1, w2), s = _decode_with_stats(
        chunks, df_map, N, avgdl
    )
    norm1 = np.sqrt(s["nsq1"])
    norm2 = np.sqrt(s["nsq2"])
    norm1[norm1 == 0] = 1.0  # all-zero-weight docs never score; avoid 0/0
    norm2[norm2 == 0] = 1.0
    wn = {"w1": w1 / norm1[off], "w2": w2 / norm2[off]}
    return doc_ids, lens, wn
