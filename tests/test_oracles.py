"""Driver-parity checks for the newly oracled extras queries.

Runs the same comparison the round driver does (columns sorted by name,
rows sorted, NATIVE dtypes — no casting, so a HUGEINT-vs-int64 drift fails
here before it fails in CORRECTNESS) for the queries whose DuckDB oracles
encode non-trivial arithmetic: the BPE-ish piece count (RE2-safe pattern),
the char-polynomial doc fingerprint, exact all-pairs Jaccard (minhash) and
the HUGEINT-mirrored SimHash.  Also asserts the recall-1.0 claims that make
the exact SQL oracles valid for the bucketed/banded candidate paths.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"  # the driver's correctness scale


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _assert_query_matches_oracle(con, name: str, ray_session):
    from ir_search_engine_ray.pipelines.entry_queries import (
        build_oracle_sql,
        build_queries,
    )

    got = _canon(_to_pandas(build_queries()[name](SF)))
    want = _canon(con.execute(build_oracle_sql(SF)[name]).df())
    assert list(got.columns) == list(want.columns)
    assert got.dtypes.to_dict() == want.dtypes.to_dict(), (
        f"native dtype drift: {got.dtypes.to_dict()} vs {want.dtypes.to_dict()}"
    )
    pd.testing.assert_frame_equal(got, want)


ORACLED = [
        "token_count_bpe",
        "phrase_simple",
        "phrase_positions",
        "boolean_simple",
        "bigram_counts",
        "bigram_pmi",
        "dataset_split",
        "corpus_stats",
        "dedup_exact_normalized",
        "doc_fingerprint",
        "minhash_pairs",
        "jaccard_pairs",
        "minhash_against",
        "simhash_pairs",
        "curated_docs",
        "dedup_clusters",
        "ann_ivf_full",
        "ann_append_full",
        "ann_lsh_full",
        "ann_batch_topk",
        "event_windows_hopping",
        "window_distinct_users",
        "decontam_scan",
        "pii_scan",
        "asof_attribution",
        "line_dedup",
        "doclen_quantiles",
        "doclen_quantiles_sampled",
        "frequent_terms",
        "top_terms_lang",
        "pack_sequences",
        "chunk_documents",
        "event_session_join",
        "event_campaign_join",
        "rolling_user_stats",
        "stratified_sample",
        "target_mix",
        "json_flatten",
        "json_rollup",
        "repetition_signals",
        "topk_w2_filtered",
        "doclen_quantiles_by_lang",
        "tfidf_postings",
        "fuzzy_terms",
        "proximity_simple",
        "proximity_positions",
        "span_dedup",
        "unigram_logprob",
        # the remaining oracled queries (rounds 1-2; previously gated only
        # by the driver snapshot) — the full 56-oracle contract now has a
        # uniform in-repo gate
        "ann_cosine_topk",
        "ann_filtered",
        "collection_stats_simple",
        "dedup_exact",
        "dedup_incremental",
        "df_simple",
        "doclen_simple",
        "docmap",
        "embedding_neardup",
        "event_windows",
        "index_stats_full",
        "lang_id",
        "postings_simple",
        "quality_signals",
        "sessions",
        "token_count",
        "topk_w1_simple",
        "topk_w2_simple",
        "topk_w2_snippet",
]


def test_oracle_gate_is_complete():
    """Every query with an oracle_sql entry must be in the gated list —
    a new oracled query can't silently skip the in-repo oracle gate."""
    from ir_search_engine_ray.pipelines.entry_queries import build_oracle_sql

    assert set(ORACLED) == set(build_oracle_sql(SF).keys())


@pytest.mark.parametrize("name", ORACLED)
def test_new_oracles_match(con, name, ray_session):
    _assert_query_matches_oracle(con, name, ray_session)


def test_embedding_bucketed_recall_is_total(ray_session):
    """The IVF-bucketed near-dup path must equal the exact all-pairs
    baseline at this scale (the driver's SQL oracle is exact)."""
    import ray.data

    from ir_search_engine_ray.extras import dedup

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    bucketed = _canon(dedup.embedding_cosine_pairs(ds, threshold=0.4).to_pandas())
    exact = _canon(
        dedup.embedding_cosine_pairs_allpairs(ds, threshold=0.4).to_pandas()
    )
    pd.testing.assert_frame_equal(bucketed, exact)


def test_minhash_lsh_recall_is_total(con, ray_session):
    """Verified LSH candidates == exact all-pairs Jaccard at this scale:
    every true pair's Jaccard is far enough above threshold that the
    16-band/4-row candidate probability rounds to 1."""
    import ray.data

    from ir_search_engine_ray.extras import dedup
    from ir_search_engine_ray.pipelines.entry_queries import build_oracle_sql

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", override_num_blocks=8)
    pairs = dedup.minhash_lsh_pairs(docs)
    got = _canon(dedup.verify_jaccard(pairs, docs, threshold=0.5).to_pandas())
    want = _canon(con.execute(build_oracle_sql(SF)["minhash_pairs"]).df())
    pd.testing.assert_frame_equal(got, want)
