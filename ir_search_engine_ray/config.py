"""Pipeline configuration.

The reference's knobs (``useStemming``, ``weightFunction``, ``topK``,
compression codes, blocking factor — SURVEY.md §2.10) plus the
distribution-specific knobs the reference never needed: salting, shard and
worker counts, batch sizes.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class IndexConfig:
    # text semantics
    mode: str = "full"  # "full" = tokenfilter+stopword+porter; "simple" = SQL-parity
    # distribution: salt = doc_id // ceil(N / salt_buckets) chunks every
    # term's posting list by contiguous doc-id range; the ranges double as
    # the doc-partitioned query shards (see stages/merge.py)
    salt_buckets: int = 8
    # None = auto: n_turns/64 clamped to [8192, 32768] — data-derived (so
    # batch boundaries and block file names are identical at every
    # parallelism level) while small inputs still fan out wide enough to
    # fill a machine.  An explicit value pins it.
    tokenize_batch_size: int | None = None
    # df table partitioning: rows per term-sorted df parquet part.  Serving
    # actors stream only the parts overlapping their local lexicon instead
    # of receiving a whole-vocabulary broadcast dict (stages/norms.py).
    df_part_rows: int = 65536
    # conversation-offsets strategy: None = auto (hierarchical once the
    # input row count passes HIER_OFFSETS_ROWS), True/False = force.  The
    # hierarchical path (stages/docids.py) keeps per-conversation work off
    # the driver entirely.
    offsets_hierarchical: bool | None = None
    # df combine strategy: None = auto (distributed groupby+sort once the
    # per-salt (term, df_chunk) row count passes DF_DISTRIBUTED_ROWS),
    # True/False = force.  The driver path concatenates all chunk df
    # columns in one process; the distributed path never does.
    df_distributed: bool | None = None
    # pin the salt range size instead of deriving it from (N, salt_buckets).
    # An appended index keeps its original range size (salt layout is fixed
    # at first build), so a one-shot rebuild only byte-matches an appended
    # one when built with the same pinned value (see append_index).
    range_size_override: int | None = None
    # document attribute columns (e.g. ("role",)) copied from the input
    # into a doc-id-sorted sidecar at build time, enabling metadata-
    # filtered retrieval (QueryEngine.query(filters={"role": "user"})).
    # Empty (the default) writes no sidecar and changes nothing.
    attr_cols: tuple[str, ...] | list[str] = ()

    def fingerprint(self) -> str:
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True).encode()
        ).hexdigest()[:16]


HIER_OFFSETS_ROWS = 10_000_000
DF_DISTRIBUTED_ROWS = 5_000_000


@dataclass(frozen=True)
class QueryConfig:
    scheme: str = "w2"     # "w2" = the BM25/Okapi variant (primary), or "w1"
    top_k: int = 10
    num_actors: int = 4
    algorithm: str = "exhaustive"  # "exhaustive" | "maxscore" | "block_max_wand"
    # False: the driver holds NO vocabulary-sized df table — query-term dfs
    # stream from the partitioned df parquet on demand (memoized), for
    # vocabularies beyond driver memory.  True (default) loads df once.
    df_in_memory: bool = True
    # conv-offset residency: None = auto (in-memory below
    # convmap.OFFSETS_IN_MEMORY_ROWS conversations, else footer-pruned
    # row-group streaming), True/False = force.  The streamed mode keeps the
    # engine free of any conversation-count-sized structure.
    offsets_in_memory: bool | None = None
    # phrase verify strategy: None = auto (use the positional sidecar when
    # one exists and matches the index fingerprint, else re-tokenize the
    # candidate docs); True = require the sidecar (raise if absent/stale);
    # False = always re-tokenize.  See pipelines/positions.py.
    use_positions: bool | None = None
