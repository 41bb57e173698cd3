"""Pure-Python single-process oracle engine.

Implements the locked-in reference semantics end-to-end with plain dicts — no
Ray, no Arrow — as the golden source of truth for the distributed pipeline
(SURVEY.md §5).  Every numeric choice is pinned to the reference:

- doc_id: dense 0-based rank of (conv_id, turn_idx) under global sort
  ("stable turn ordering", BASELINE.json) — the analogue of the reference's
  sorted-filename enumeration (``index/Indexer.java:74-88``);
- postings built in doc_id order, tf per (term, doc) (``index/SPIMI.java``);
- doc_len = count of non-stopword post-filter tokens, max_tf = true max tf
  (the *intended* semantics; the reference Java path off-by-ones doc_len via
  a docLen=1 constructor and passes df into max_tf — SURVEY.md A2/A3);
- N = number of rows; avg_doc_len = sum(doc_len)/N;
- w1 / w2 / query weights / cosine norms / tie-break: see functions/scoring.py.

Shares the tokenizer verbatim with the distributed build, so any divergence a
test catches is in the distributed plumbing, not the text semantics.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from .functions.scoring import query_weights, w1_weight, w2_weight
from .textproc import TokenPipeline


@dataclass
class OracleIndex:
    mode: str
    # term -> list[(doc_id, tf)] sorted by doc_id
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)
    max_tf: dict[int, int] = field(default_factory=dict)
    docmap: list[tuple[str, int]] = field(default_factory=list)  # doc_id -> key
    N: int = 0
    avg_doc_len: float = 0.0
    # scheme -> doc_id -> ||d_w|| (sqrt of sum of squared weights)
    norms: dict[str, dict[int, float]] = field(default_factory=dict)

    def df(self, term: str) -> int:
        plist = self.postings.get(term)
        return len(plist) if plist else 0


def build_oracle_index(
    rows: list[tuple[str, int, str]], mode: str = "full"
) -> OracleIndex:
    """``rows``: (conv_id, turn_idx, text) in any order."""
    pipe = TokenPipeline(mode)
    idx = OracleIndex(mode=mode)
    ordered = sorted(rows, key=lambda r: (r[0], r[1]))
    idx.N = len(ordered)
    idx.docmap = [(conv_id, turn_idx) for conv_id, turn_idx, _ in ordered]
    for doc_id, (_conv, _turn, text) in enumerate(ordered):
        counts = pipe.term_counts(text)
        idx.doc_len[doc_id] = sum(counts.values())
        idx.max_tf[doc_id] = max(counts.values()) if counts else 0
        for term, tf in counts.items():
            idx.postings.setdefault(term, []).append((doc_id, tf))
    # doc_ids were appended in increasing order; assert the SPIMI invariant
    for plist in idx.postings.values():
        assert all(a[0] < b[0] for a, b in zip(plist, plist[1:]))
    idx.avg_doc_len = sum(idx.doc_len.values()) / idx.N if idx.N else 0.0
    _compute_norms(idx)
    return idx


def _doc_weight(idx: OracleIndex, scheme: str, tf: int, doc_id: int, df: int) -> float:
    if scheme == "w1":
        return float(w1_weight(tf, idx.max_tf[doc_id], df, idx.N))
    return float(w2_weight(tf, idx.doc_len[doc_id], df, idx.N, idx.avg_doc_len))


def _compute_norms(idx: OracleIndex) -> None:
    """Per-scheme fresh norms (reference's computeTermWeights pass, made
    build-time and side-effect-free — SURVEY.md A7)."""
    for scheme in ("w1", "w2"):
        norm_sq: dict[int, float] = {}
        for term, plist in idx.postings.items():
            df = len(plist)
            for doc_id, tf in plist:
                w = _doc_weight(idx, scheme, tf, doc_id, df)
                norm_sq[doc_id] = norm_sq.get(doc_id, 0.0) + w * w
        idx.norms[scheme] = {d: math.sqrt(v) for d, v in norm_sq.items()}


def oracle_query(
    idx: OracleIndex, text: str, scheme: str = "w2", k: int = 10
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score), tie-break (score desc, doc_id asc)."""
    pipe = TokenPipeline(idx.mode)
    q_tfs = Counter(pipe(text))
    df_by_term = {t: idx.df(t) for t in q_tfs}
    weights, q_norm = query_weights(dict(q_tfs), df_by_term, idx.N)
    scores: dict[int, float] = {}
    for term, w_tq in weights.items():
        plist = idx.postings.get(term)
        if not plist:
            continue  # "Term not found in index" path
        df = len(plist)
        for doc_id, tf in plist:
            w_td = _doc_weight(idx, scheme, tf, doc_id, df)
            scores[doc_id] = scores.get(doc_id, 0.0) + w_td * w_tq
    # Locked semantics: zero-score docs are dropped (a doc whose every
    # matched weight is 0 has norm 0 for w1; the reference would compute
    # 0/0 = NaN and let Java's NaN-sorts-first quirk rank it — we exclude
    # instead, on both oracle and engine, so results may have < k rows).
    norms = idx.norms[scheme]
    out = [
        (doc_id, s / norms[doc_id] / q_norm)
        for doc_id, s in scores.items()
        if s > 0.0
    ]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]
