"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()`` — flagship pipeline at sf0.001: build the full-mode inverted
  index over the synthesized transcripts fixture and run the 20-query
  reference-style set through the actor-pool BM25 engine.
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + training-data extras); each takes an ``sf_dir``.
- ``oracle_sql()`` — DuckDB oracles for the SQL-expressible subset; the
  full-pipeline (TokenFilter + Porter) entries are rows-only here and are
  verified rank-identically against the pure-Python oracle in pytest.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pandas as pd
    import pyarrow.parquet as pq

    from ir_search_engine_ray.config import QueryConfig
    from ir_search_engine_ray.datagen import fixture_dir
    from ir_search_engine_ray.pipelines.entry_queries import cached_index
    from ir_search_engine_ray.pipelines.query import QueryEngine

    sf_dir = "sf0.001"
    meta = cached_index(sf_dir, "full")
    eng = QueryEngine(meta, QueryConfig(scheme="w2", top_k=10))
    qt = pq.read_table(fixture_dir(sf_dir) / "queries.parquet")
    rows = []
    for qid, text in zip(qt["query_id"].to_pylist(), qt["text"].to_pylist()):
        for r in eng.query(text):
            rows.append({"query_id": qid, **r})
    return pd.DataFrame(
        rows,
        columns=["query_id", "rank", "doc_id", "conv_id", "turn_idx", "score"],
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from ir_search_engine_ray.pipelines.entry_queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from ir_search_engine_ray.pipelines.entry_queries import build_oracle_sql

    # generating the fixture here guarantees the SQL's read_parquet targets
    # exist regardless of driver call order (idempotent, atomic)
    return build_oracle_sql("/root/testdata/sf0.01")
