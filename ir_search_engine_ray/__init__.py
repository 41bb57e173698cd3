"""ir_search_engine_ray — a Ray-Data-native inverted-index + BM25 query engine.

A from-scratch rebuild of the capabilities of the reference engine
(siddhantsahu/ir-search-engine, read-only checkout at /root/reference) on top of
``ray.data.Dataset`` pipelines: tokenization / stopword / Porter stemming run as
``map_batches`` over zero-copy Arrow batches of transcript turns, posting lists
are built by map-side salt partitioning + per-salt merges (no all-to-all of
postings), postings are delta-gap + varint compressed, and query-time top-k BM25 retrieval runs on a stateful actor
pool. See SURVEY.md at the repo root for the full blueprint and the
file:line citations into the reference that pin each behavior.

The library never calls ``ray.init()`` / ``ray.shutdown()`` — sessions are owned
by bench.py, CLI entry points and the pytest fixture (driver contract).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public API (keeps `import ir_search_engine_ray` light)
    if name in ("build_index", "IndexMeta"):
        from .pipelines import index_build

        return getattr(index_build, name)
    if name == "QueryEngine":
        from .pipelines.query import QueryEngine

        return QueryEngine
    if name in ("IndexConfig", "QueryConfig"):
        from . import config

        return getattr(config, name)
    if name == "curate":
        from .pipelines.curate import curate

        return curate
    if name == "TokenPipeline":
        from .textproc import TokenPipeline

        return TokenPipeline
    raise AttributeError(name)
