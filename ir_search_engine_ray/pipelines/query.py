"""Query-time top-k retrieval on a stateful actor pool.

Rebuild of the reference's query path (``search/QueryParser.java:135-191``,
``search/Driver.java:64-105``) for a doc-partitioned shard layout:

- the driver parses the query with the SAME tokenizer as the build (reference
  parses queries with the document pipeline, ``QueryParser.java:47-68``),
  computes w1-style query weights against the broadcast df map
  (``QueryParser.java:141-146``) and the query norm ||q||;
- each ``IndexShardActor`` pins one or more doc-range shards (lexicon +
  normalized postings decoded into numpy arrays at load time) and scores its
  document range against every query term found in its local lexicon —
  because shards partition by DOCUMENT, a doc's full score is computed by
  exactly one actor, so per-actor bounded top-k heaps merge into a correct
  global top-k on the driver;
- scoring algorithms: ``exhaustive`` (vectorized term-at-a-time),
  ``maxscore`` (term-at-a-time with upper-bound pruning of low-impact terms)
  and ``block_max_wand`` (doc-at-a-time with per-chunk block maxima and a
  bounded min-heap).  All three return identical results (asserted in tests);
  upper bounds are on the NORMALIZED weights stored in the shards, so cosine
  normalization (``QueryParser.java:176-183``) cannot break bound safety
  (SURVEY.md §7 "WAND correctness under cosine normalization").

Actors are plain ``@ray.remote`` classes rather than a Dataset stage because
query serving is request/response over pinned mutable-free state — the one
place SURVEY.md §1.3/T4 sanctions dropping below the Dataset API.  Batch
(dataset-of-queries) scoring is provided separately for throughput runs.
"""

from __future__ import annotations

import heapq
from collections import Counter
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import ray

from ..config import QueryConfig
from ..functions.codec import decode_postings
from ..functions.scoring import query_weights, topk_from_scores
from ..stages.docids import doc_ids_to_keys
from ..textproc import TokenPipeline
from .index_build import IndexMeta


class ShardState:
    """Decoded in-memory form of one or more doc-range shards (plain class,
    reused by the Ray actor and by local/batch scoring)."""

    def __init__(self, files: list[str]) -> None:
        self.terms: dict[str, list[int]] = {}
        self.doc_ids: list[np.ndarray] = []
        self.wn: dict[str, list[np.ndarray]] = {"w1": [], "w2": []}
        self.block_max: dict[str, np.ndarray] = {}
        self.doc_lo = np.iinfo(np.int64).max
        self.doc_hi = -1
        max1: list[float] = []
        max2: list[float] = []
        for f in files:
            t = pq.read_table(f)
            for i in range(t.num_rows):
                ids, _tfs = decode_postings(
                    t["id_bytes"][i].as_py(), t["tf_bytes"][i].as_py()
                )
                row = len(self.doc_ids)
                self.doc_ids.append(ids)
                self.wn["w1"].append(np.asarray(t["wn1"][i].as_py(), dtype=np.float64))
                self.wn["w2"].append(np.asarray(t["wn2"][i].as_py(), dtype=np.float64))
                max1.append(t["max_wn1"][i].as_py())
                max2.append(t["max_wn2"][i].as_py())
                self.terms.setdefault(t["term"][i].as_py(), []).append(row)
                if ids.size:
                    self.doc_lo = min(self.doc_lo, int(ids[0]))
                    self.doc_hi = max(self.doc_hi, int(ids[-1]))
        self.block_max = {
            "w1": np.array(max1, dtype=np.float64),
            "w2": np.array(max2, dtype=np.float64),
        }

    def _gather(self, terms: list[str], scheme: str):
        """(chunk rows, per-term upper bound) for the query terms present."""
        found = []
        for qi, term in enumerate(terms):
            rows = self.terms.get(term)
            if rows:
                found.append((qi, rows))
        return found

    def score_exhaustive(
        self, terms: list[str], weights: np.ndarray, scheme: str, k: int
    ) -> list[tuple[int, float]]:
        found = self._gather(terms, scheme)
        if not found:
            return []
        span = self.doc_hi - self.doc_lo + 1
        acc = np.zeros(span, dtype=np.float64)
        for qi, rows in found:
            wq = weights[qi]
            for row in rows:
                ids = self.doc_ids[row]
                acc[ids - self.doc_lo] += self.wn[scheme][row] * wq
        nz = np.flatnonzero(acc)
        return topk_from_scores(nz + self.doc_lo, acc[nz], k)

    def score_maxscore(
        self, terms: list[str], weights: np.ndarray, scheme: str, k: int
    ) -> list[tuple[int, float]]:
        """Term-at-a-time with upper-bound pruning: process terms in
        descending (max contribution) order; once the accumulated candidate
        set is final for the top-k threshold, skip terms whose bound cannot
        lift a NEW doc into the heap (they still score existing candidates).
        """
        found = self._gather(terms, scheme)
        if not found:
            return []
        bm = self.block_max[scheme]
        # per query-term upper bound on contribution = wq * max chunk wn
        ubs = []
        for qi, rows in found:
            ub = weights[qi] * max(bm[r] for r in rows)
            ubs.append((ub, qi, rows))
        ubs.sort(key=lambda x: -x[0])
        span = self.doc_hi - self.doc_lo + 1
        acc = np.zeros(span, dtype=np.float64)
        touched = np.zeros(span, dtype=bool)
        remaining_ub = sum(u[0] for u in ubs)
        threshold = -np.inf
        for ub, qi, rows in ubs:
            if threshold > remaining_ub:  # no new doc can ever qualify
                # restrict scoring to already-touched docs
                for row in rows:
                    ids = self.doc_ids[row] - self.doc_lo
                    mask = touched[ids]
                    acc[ids[mask]] += self.wn[scheme][row][mask] * weights[qi]
            else:
                for row in rows:
                    ids = self.doc_ids[row] - self.doc_lo
                    acc[ids] += self.wn[scheme][row] * weights[qi]
                    touched[ids] = True
            remaining_ub -= ub
            if np.count_nonzero(touched) >= k:
                nzt = np.flatnonzero(touched)
                if nzt.size >= k:
                    threshold = np.partition(acc[nzt], nzt.size - k)[nzt.size - k]
        nz = np.flatnonzero(touched)
        return topk_from_scores(nz + self.doc_lo, acc[nz], k)

    def score_block_max_wand(
        self, terms: list[str], weights: np.ndarray, scheme: str, k: int
    ) -> list[tuple[int, float]]:
        """Doc-at-a-time WAND with block (chunk) maxima and a bounded
        min-heap (north-star algorithm).  Cursors advance over each query
        term's chunk list; the pivot rule skips documents whose upper-bound
        sum cannot beat the current k-th score."""
        found = self._gather(terms, scheme)
        if not found:
            return []
        bm = self.block_max[scheme]
        cursors = []  # [ids array, wn array, pos, ub, wq]
        for qi, rows in found:
            wq = weights[qi]
            ids = np.concatenate([self.doc_ids[r] for r in rows])
            wn = np.concatenate([self.wn[scheme][r] for r in rows])
            ub = wq * max(bm[r] for r in rows)
            cursors.append([ids, wn, 0, ub, wq])
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        while True:
            live = [c for c in cursors if c[2] < len(c[0])]
            if not live:
                break
            live.sort(key=lambda c: c[0][c[2]])
            # pivot: first term where cumulative UB exceeds threshold
            theta = heap[0][0] if len(heap) >= k else -np.inf
            ub_sum = 0.0
            pivot_doc = None
            for c in live:
                ub_sum += c[3]
                if ub_sum > theta or len(heap) < k:
                    pivot_doc = int(c[0][c[2]])
                    break
            if pivot_doc is None:
                break  # no doc can beat theta
            # advance all cursors to pivot_doc; fully score it
            score = 0.0
            for c in live:
                ids, wn, pos = c[0], c[1], c[2]
                pos = int(np.searchsorted(ids, pivot_doc, side="left"))
                c[2] = pos
                if pos < len(ids) and ids[pos] == pivot_doc:
                    score += wn[pos] * c[4]
                    c[2] = pos + 1
            cand = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, cand)
            elif cand > heap[0]:
                heapq.heapreplace(heap, cand)
        out = [(-nd, s) for s, nd in heap]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    def score(self, terms, weights, scheme, k, algorithm) -> list[tuple[int, float]]:
        fn = {
            "exhaustive": self.score_exhaustive,
            "maxscore": self.score_maxscore,
            "block_max_wand": self.score_block_max_wand,
        }[algorithm]
        out = fn(terms, np.asarray(weights, dtype=np.float64), scheme, k)
        # locked semantics: zero-score docs are never returned (see oracle.py)
        return [(d, s) for d, s in out if s > 0.0]


@ray.remote
class IndexShardActor:
    def __init__(self, files: list[str]) -> None:
        self.state = ShardState(files)

    def score(self, terms, weights, scheme, k, algorithm):
        return self.state.score(terms, weights, scheme, k, algorithm)

    def ready(self) -> bool:
        return True


class QueryEngine:
    """Driver-side facade: parse, weight, fan out, merge (O3/O4)."""

    def __init__(
        self,
        meta: IndexMeta,
        config: QueryConfig | None = None,
        *,
        local: bool = False,
    ) -> None:
        self.meta = meta
        self.config = config or QueryConfig()
        self.pipe = TokenPipeline(meta.mode)
        self.df_map = meta.df_map()
        self.offsets = meta.offsets()
        files = [str(f) for f in meta.shard_files()]
        if not files:
            raise FileNotFoundError(f"no shards under {meta.out_dir}")
        n = min(self.config.num_actors, len(files))
        groups = [files[i::n] for i in range(n)]
        self.local = local
        if local:
            self.states = [ShardState(g) for g in groups]
        else:
            self.actors = [IndexShardActor.remote(g) for g in groups]
            ray.get([a.ready.remote() for a in self.actors])

    def parse(self, text: str) -> tuple[list[str], np.ndarray, float]:
        """Query terms in first-occurrence order + weights + ||q||
        (bag-of-words per ``search/Query.java:18-29``)."""
        q_tfs = Counter(self.pipe(text))
        weights, q_norm = query_weights(dict(q_tfs), self.df_map, self.meta.N)
        terms = list(q_tfs)
        return terms, np.array([weights[t] for t in terms]), q_norm

    def query(
        self,
        text: str,
        scheme: str | None = None,
        k: int | None = None,
        algorithm: str | None = None,
    ) -> list[dict]:
        scheme = scheme or self.config.scheme
        k = k or self.config.top_k
        algorithm = algorithm or self.config.algorithm
        terms, weights, q_norm = self.parse(text)
        if not terms or q_norm == 0.0:
            return []
        if self.local:
            partials = [s.score(terms, weights, scheme, k, algorithm) for s in self.states]
        else:
            partials = ray.get(
                [a.score.remote(terms, weights, scheme, k, algorithm) for a in self.actors]
            )
        merged = [(doc, s) for part in partials for doc, s in part]
        merged.sort(key=lambda t: (-t[1], t[0]))
        top = merged[:k]
        doc_arr = np.array([d for d, _ in top], dtype=np.int64)
        convs, turns = (
            doc_ids_to_keys(doc_arr, self.offsets, self.meta.N)
            if top
            else ([], np.array([], dtype=np.int32))
        )
        return [
            {
                "rank": r + 1,
                "doc_id": int(doc),
                "conv_id": convs[r],
                "turn_idx": int(turns[r]),
                "score": s / q_norm,
            }
            for r, (doc, s) in enumerate(top)
        ]
