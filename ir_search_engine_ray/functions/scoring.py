"""Term-weighting and scoring math.

Bit-for-bit float64 reimplementation of the reference's two weighting schemes
(``search/QueryParser.java:71-101``), including the quirk that ``N / df`` is
Java *integer* division in both (``(double)(this.collectionSize / df)``), so
idf = ln(floor(N/df)) / ln(N) and is exactly 0.0 when df > N/2.

- w1 "max-tf variant"  (QueryParser.java:78-84):
    (0.4 + 0.6 * ln(tf + 0.5) / ln(maxTf + 1)) * ln(floor(N/df)) / ln(N)
  and 0.0 when tf == 0 or maxTf == 0 or df == 0.

- w2 "Okapi/BM25 variant"  (QueryParser.java:94-101):
    0.4 + 0.6 * (tf / (tf + 0.5 + 1.5 * docLen/avgDocLen))
              * ln(floor(N/df)) / ln(N)
  and 0.0 when tf == 0 or docLen == 0 or df == 0.  Note the 0.4 floor applies
  to every posting of every query term (even idf == 0 head terms).

Query-side weights are always w1-style with the query's own tf / maxTf and
the *index* df (QueryParser.java:141-146); a term absent from the index has
df = 0 hence weight 0.0.

Final score (QueryParser.java:155-183):
    score(d) = [ sum_t w(t,d) * w(t,q) ] / ||d_w|| / ||q||
with ||d_w|| = sqrt(sum over ALL index terms of w(t,d)^2) computed fresh per
scheme (the reference accumulates this across queries into mutable index
state, QueryParser.java:129-130 — a query-order-dependent bug; the rebuild
and its oracle use clean per-scheme norms, per SURVEY.md §5/A7) and
||q|| = sqrt(sum over query terms of w(t,q)^2).

Tie-break for top-k: (score desc, doc_id asc) — the reference's tie order is
HashMap-iteration-dependent, i.e. unspecified (QueryParser.java:186-190).
"""

from __future__ import annotations

import math

import numpy as np

SCHEMES = ("w1", "w2")


def idf(N: int, df: np.ndarray | int) -> np.ndarray | float:
    """ln(floor(N/df)) / ln(N), with the Java integer-division quirk."""
    return np.log(np.floor_divide(N, df).astype(np.float64)) / math.log(N)


def w1_weight(tf, max_tf, df, N: int):
    """Vectorized w1; inputs may be scalars or numpy arrays."""
    tf = np.asarray(tf, dtype=np.float64)
    max_tf = np.asarray(max_tf, dtype=np.float64)
    dfa = np.asarray(df, dtype=np.int64)
    ok = (tf != 0) & (max_tf != 0) & (dfa != 0)
    if np.all(ok):
        # hot path (index side: tf/max_tf/df are all >= 1 by construction):
        # straight-line kernels, no masks, no gather/scatter copies
        out = (0.4 + 0.6 * np.log(tf + 0.5) / np.log(max_tf + 1.0)) * idf(N, dfa)
        return out if out.shape else float(out)
    out = np.zeros(np.broadcast(tf, max_tf, dfa).shape, dtype=np.float64)
    if not np.any(ok):
        return out if out.shape else float(out)
    tf_ok = np.broadcast_to(tf, out.shape)[ok]
    mtf_ok = np.broadcast_to(max_tf, out.shape)[ok]
    df_ok = np.broadcast_to(dfa, out.shape)[ok]
    val = (0.4 + 0.6 * np.log(tf_ok + 0.5) / np.log(mtf_ok + 1.0)) * idf(N, df_ok)
    out[ok] = val
    return out if out.shape else float(out)


def w2_weight(tf, doc_len, df, N: int, avg_doc_len: float):
    """Vectorized w2 (the BM25 variant)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    dfa = np.asarray(df, dtype=np.int64)
    ok = (tf != 0) & (dl != 0) & (dfa != 0)
    if np.all(ok):
        out = 0.4 + 0.6 * (tf / (tf + 0.5 + 1.5 * (dl / avg_doc_len))) * idf(N, dfa)
        return out if out.shape else float(out)
    out = np.zeros(np.broadcast(tf, dl, dfa).shape, dtype=np.float64)
    if not np.any(ok):
        return out if out.shape else float(out)
    tf_ok = np.broadcast_to(tf, out.shape)[ok]
    dl_ok = np.broadcast_to(dl, out.shape)[ok]
    df_ok = np.broadcast_to(dfa, out.shape)[ok]
    val = 0.4 + 0.6 * (tf_ok / (tf_ok + 0.5 + 1.5 * (dl_ok / avg_doc_len))) * idf(
        N, df_ok
    )
    out[ok] = val
    return out if out.shape else float(out)


def query_weights(
    q_tfs: dict[str, int], df_by_term: dict[str, int], N: int
) -> tuple[dict[str, float], float]:
    """Per-term query weights (always w1-style) and the query norm ||q||.

    ``df_by_term`` maps a query term to its index df (0 / missing = absent).
    """
    if not q_tfs:
        return {}, 0.0
    max_tf = max(q_tfs.values())
    weights: dict[str, float] = {}
    norm_sq = 0.0
    for term, tf in q_tfs.items():
        w = float(w1_weight(tf, max_tf, df_by_term.get(term, 0), N))
        weights[term] = w
        norm_sq += w * w
    return weights, math.sqrt(norm_sq)


def topk_from_scores(
    doc_ids: np.ndarray, scores: np.ndarray, k: int
) -> list[tuple[int, float]]:
    """Top-k with the locked tie-break (score desc, doc_id asc).

    Partition once to find the k-th score, keep every candidate at or above
    it (ties included), then lexsort only those — O(n + c log c) with c the
    candidate count, instead of a full O(n log n) sort.
    """
    n = doc_ids.size
    if n == 0:
        return []
    if n > k:
        kth = np.partition(scores, n - k)[n - k]
        cand = np.nonzero(scores >= kth)[0]
    else:
        cand = np.arange(n)
    order = np.lexsort((doc_ids[cand], -scores[cand]))
    top = cand[order][:k]
    return [(int(doc_ids[i]), float(scores[i])) for i in top]
