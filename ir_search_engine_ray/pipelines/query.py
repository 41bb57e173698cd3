"""Query-time top-k retrieval on a stateful actor pool.

Rebuild of the reference's query path (``search/QueryParser.java:135-191``,
``search/Driver.java:64-105``) for a doc-partitioned shard layout:

- the driver parses the query with the SAME tokenizer as the build (reference
  parses queries with the document pipeline, ``QueryParser.java:47-68``),
  computes w1-style query weights against the broadcast df map
  (``QueryParser.java:141-146``) and the query norm ||q||;
- each ``IndexShardActor`` pins one or more doc-range shards (lexicon +
  normalized postings decoded into per-term numpy arrays at load time) and
  scores its document range against every query term found in its local
  lexicon — because shards partition by DOCUMENT, a doc's full score is
  computed by exactly one actor, so per-actor bounded top-k heaps merge into
  a correct global top-k on the driver;
- scoring algorithms: ``exhaustive`` (vectorized term-at-a-time),
  ``maxscore`` (term-at-a-time with upper-bound pruning of low-impact terms)
  and ``block_max_wand`` (block-max pruning with a bounded min-heap; see
  below).  All three return identical results (asserted in tests); upper
  bounds are on the NORMALIZED weights stored in the shards, so cosine
  normalization (``QueryParser.java:176-183``) cannot break bound safety
  (SURVEY.md §7 "WAND correctness under cosine normalization").

Block-max WAND, adapted to doc-range shards: postings are doc_id-sorted, so
"blocks" are fixed doc-id WINDOWS (``WINDOW`` docs).  At load time each term
gets per-window maxima of its normalized weights; at query time the window
upper bound is ``sum_t wq_t * window_max_t`` (exactly the classic block-max
bound), windows are visited in DESCENDING bound order, and a bounded k-min-
heap supplies the threshold theta: the first window whose bound falls below
theta proves no remaining document can enter the heap, so everything after
it is skipped without being scored.  Scoring inside a surviving window is
vectorized (searchsorted slice + scatter-add) — no per-document Python loop,
unlike a classic cursor implementation.

Actors are plain ``@ray.remote`` classes rather than a Dataset stage because
query serving is request/response over pinned mutable-free state — the one
place SURVEY.md §1.3/T4 sanctions dropping below the Dataset API.
"""

from __future__ import annotations

import heapq
from collections import Counter
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..config import QueryConfig
from ..functions.scoring import query_weights, topk_from_scores
from ..textproc import TokenPipeline
from .index_build import IndexMeta

WINDOW = 4096  # docs per block-max window

# per-worker-process TokenPipeline cache for the distributed phrase verify
_PIPE_CACHE: dict[str, TokenPipeline] = {}


@dataclass
class _TermData:
    ids: np.ndarray        # doc_ids, sorted ascending
    wn: dict[str, np.ndarray]      # scheme -> normalized weights, same order
    win_ids: np.ndarray    # windows this term touches (ascending)
    seg_starts: np.ndarray  # start offset of each window segment in ids
    wmax: dict[str, np.ndarray]    # scheme -> per-window max of wn
    ub: dict[str, float]   # scheme -> overall max of wn


class ShardState:
    """Decoded in-memory form of one or more doc-range shards (plain class,
    reused by the Ray actor and by local/batch scoring).

    A shard = the per-salt chunk files (compressed postings).  Doc stats,
    cosine norms and normalized weights are derived here at LOAD time — one
    vectorized pass per actor, never per query — from (tf, df, N, avgdl):
    the shard's doc range holds all postings of its documents, so the stats
    are exact local computations (stages/norms.py rationale).  Chunk files
    are read in salt (= doc-range) order, so each term's concatenated
    postings arrive already doc_id-sorted.
    """

    def __init__(
        self,
        files: list[str],
        df_source: dict[str, int] | str,
        N: int,
        avgdl: float,
        attrs_dir: str | None = None,
    ) -> None:
        import pyarrow.compute as pc

        from ..stages.norms import DfStore, load_weights

        self.attrs_dir = attrs_dir
        self._attr_cache: dict[str, tuple[np.ndarray, list]] = {}
        self._mask_cache: dict[tuple, np.ndarray] = {}
        tables = [pq.read_table(f) for f in sorted(files)]
        t = pa.concat_tables(tables) if tables else None
        self.terms: dict[str, _TermData] = {}
        self.df_local_size = 0
        if t is None or t.num_rows == 0:
            self.doc_lo, self.doc_hi = 0, -1
            return
        if isinstance(df_source, (str, Path)):
            # stream only the df rows for terms present in this shard's
            # chunks (the norms.py scale path) — never the full vocabulary
            local_terms = pc.unique(t["term"]).to_pylist()
            df_map = DfStore(df_source).lookup(local_terms)
        else:
            df_map = df_source
        self.df_local_size = len(df_map)
        ids_flat, lens, wn_flat = load_weights(t, df_map, N, avgdl)
        self.doc_lo = int(ids_flat.min())
        self.doc_hi = int(ids_flat.max())
        # ONE stable sort groups every term's postings contiguously while
        # preserving salt (= doc) order, so all per-term arrays below are
        # zero-copy views — a per-term concat loop dominated load time
        enc = pc.dictionary_encode(t["term"].combine_chunks())
        codes = np.repeat(enc.indices.to_numpy(), lens)
        order = np.argsort(codes, kind="stable")
        codes = codes[order]
        ids_s = ids_flat[order]
        wn_s = {s: w[order] for s, w in wn_flat.items()}
        win = (ids_s - self.doc_lo) // WINDOW
        # segment = run of equal (term, window); term boundary always starts
        # a new segment, so per-term windows slice out of the global arrays
        new_term = np.empty(codes.size, dtype=bool)
        new_term[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new_term[1:])
        new_seg = new_term.copy()
        new_seg[1:] |= win[1:] != win[:-1]
        seg_starts_all = np.flatnonzero(new_seg)
        wmax_all = {
            s: np.maximum.reduceat(wn_s[s], seg_starts_all) for s in wn_s
        }
        win_ids_all = win[seg_starts_all]
        # per-term spans over postings and over segments
        term_starts = np.flatnonzero(new_term)
        term_ends = np.concatenate((term_starts[1:], [codes.size]))
        seg_of_term = np.cumsum(new_term[seg_starts_all]) - 1
        seg_term_starts = np.flatnonzero(
            np.concatenate(([True], np.diff(seg_of_term) > 0))
        )
        seg_term_ends = np.concatenate((seg_term_starts[1:], [seg_starts_all.size]))
        dictionary = enc.dictionary.to_pylist()
        for i, (ts, te, ss, se) in enumerate(
            zip(term_starts, term_ends, seg_term_starts, seg_term_ends)
        ):
            term = dictionary[int(codes[ts])]
            wn = {s: wn_s[s][ts:te] for s in wn_s}
            wmax = {s: wmax_all[s][ss:se] for s in wmax_all}
            self.terms[term] = _TermData(
                ids=ids_s[ts:te],
                wn=wn,
                win_ids=win_ids_all[ss:se],
                seg_starts=seg_starts_all[ss:se] - ts,
                wmax=wmax,
                ub={s: float(wmax[s].max()) for s in wmax},
            )

    def _gather(
        self,
        terms: list[str],
        weights: np.ndarray,
        scheme: str,
        mask: np.ndarray | None = None,
    ):
        """(query weight, term data) for the query terms present locally,
        in the CANONICAL processing order: descending ``wq * ub``, stable
        (ties keep query order).  Every scoring algorithm iterates this
        same order, so each doc's contributions are added in the identical
        float sequence — exhaustive / maxscore / block-max WAND produce
        BIT-IDENTICAL scores, not merely close ones (float addition is not
        associative; per-algorithm orders diverged by one ulp at sf1).

        With ``mask`` (an allowed-docs span mask from :meth:`allowed_mask`)
        each term's postings are RESTRICTED to allowed docs and the
        window/upper-bound stats recomputed over the restriction — so the
        pruned algorithms stay exact under metadata filters while skipping
        disallowed-doc work: a bound over the masked postings is by
        construction filter-aware."""
        found = [
            (float(weights[qi]), self.terms[term])
            for qi, term in enumerate(terms)
            if term in self.terms and weights[qi] != 0.0
        ]
        if mask is not None:
            masked = []
            for wq, d in found:
                sel = mask[d.ids - self.doc_lo]
                if not sel.any():
                    continue
                ids = d.ids[sel]
                wn = d.wn[scheme][sel]
                win = (ids - self.doc_lo) // WINDOW
                new_seg = np.empty(ids.size, dtype=bool)
                new_seg[0] = True
                np.not_equal(win[1:], win[:-1], out=new_seg[1:])
                seg_starts = np.flatnonzero(new_seg)
                wmax = np.maximum.reduceat(wn, seg_starts)
                masked.append(
                    (
                        wq,
                        _TermData(
                            ids=ids,
                            wn={scheme: wn},
                            win_ids=win[seg_starts],
                            seg_starts=seg_starts,
                            wmax={scheme: wmax},
                            ub={scheme: float(wmax.max())},
                        ),
                    )
                )
            found = masked
        return sorted(found, key=lambda x: -(x[0] * x[1].ub[scheme]))

    @property
    def _span(self) -> int:
        return self.doc_hi - self.doc_lo + 1

    def score_exhaustive(
        self,
        terms: list[str],
        weights: np.ndarray,
        scheme: str,
        k: int,
        mask: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        found = self._gather(terms, weights, scheme, mask)
        if not found:
            return []
        acc = np.zeros(self._span, dtype=np.float64)
        for wq, d in found:
            acc[d.ids - self.doc_lo] += d.wn[scheme] * wq
        nz = np.flatnonzero(acc)
        return topk_from_scores(nz + self.doc_lo, acc[nz], k)

    # -- metadata-filtered retrieval (attrs sidecar) --------------------

    def _attr_codes(self, col: str) -> tuple[np.ndarray, list]:
        """Span-aligned dictionary codes for one attribute column, loaded
        once per actor from only the sidecar files overlapping this
        shard's doc range (pruned by the range-encoded file names)."""
        got = self._attr_cache.get(col)
        if got is not None:
            return got
        if self.attrs_dir is None:
            raise ValueError(
                "index has no attrs sidecar — rebuild with "
                "IndexConfig(attr_cols=(...)) to enable filtered queries"
            )
        import pyarrow.compute as pc

        parts = []
        for f in sorted(Path(self.attrs_dir).glob("attr-d*.parquet")):
            stem = f.stem  # attr-d<lo>-d<hi>
            lo = int(stem.split("-d")[1])
            hi = int(stem.split("-d")[2])
            if hi < self.doc_lo or lo > self.doc_hi:
                continue
            parts.append(pq.read_table(f, columns=["doc_id", col]))
        codes = np.full(self._span, -1, dtype=np.int32)
        dictionary: list = []
        if parts:
            t = pa.concat_tables(parts)
            ids = t["doc_id"].to_numpy()
            sel = (ids >= self.doc_lo) & (ids <= self.doc_hi)
            enc = pc.dictionary_encode(t[col].combine_chunks())
            codes[ids[sel] - self.doc_lo] = enc.indices.to_numpy(
                zero_copy_only=False
            )[sel]
            dictionary = enc.dictionary.to_pylist()
        self._attr_cache[col] = (codes, dictionary)
        return codes, dictionary

    def allowed_mask(self, filters: dict) -> np.ndarray:
        """Boolean span mask of docs matching EVERY filter (value or
        collection of values per attribute column).  Memoized per filter
        key: a query workload typically reuses a handful of filters, and
        the mask build is span-sized work that would otherwise repeat on
        every query."""
        key = tuple(
            (col, (want,) if isinstance(want, str) else tuple(sorted(want)))
            for col, want in sorted(filters.items())
        )
        cached = self._mask_cache.get(key)
        if cached is not None:
            return cached
        mask = np.ones(self._span, dtype=bool)
        for col, want in filters.items():
            codes, dictionary = self._attr_codes(col)
            vals = (
                {want} if isinstance(want, str) else set(want)
            )
            keep = [i for i, v in enumerate(dictionary) if v in vals]
            mask &= np.isin(codes, np.array(keep, dtype=np.int32))
        if len(self._mask_cache) >= 64:  # bound a long-lived actor's cache
            self._mask_cache.clear()
        self._mask_cache[key] = mask
        return mask

    def score_maxscore(
        self,
        terms: list[str],
        weights: np.ndarray,
        scheme: str,
        k: int,
        mask: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        """Term-at-a-time with upper-bound pruning: process terms in
        descending (max contribution) order; once the top-k threshold
        exceeds the sum of remaining bounds, a term can no longer lift a
        NEW doc into the heap — it then only scores already-touched docs.
        ``mask`` restricts to allowed docs with bounds recomputed over the
        restriction (see :meth:`_gather`) — exact filtered pruning."""
        found = self._gather(terms, weights, scheme, mask)
        if not found:
            return []
        # found is already in descending wq*ub order (the canonical order
        # every algorithm shares — see _gather)
        ubs = [(wq * d.ub[scheme], wq, d) for wq, d in found]
        span = self._span
        acc = np.zeros(span, dtype=np.float64)
        touched = np.zeros(span, dtype=bool)
        remaining_ub = sum(u for u, _, _ in ubs)
        threshold = -np.inf
        for ub, wq, d in ubs:
            ids = d.ids - self.doc_lo
            if threshold > remaining_ub:
                mask = touched[ids]
                acc[ids[mask]] += d.wn[scheme][mask] * wq
            else:
                acc[ids] += d.wn[scheme] * wq
                touched[ids] = True
            remaining_ub -= ub
            nzt = np.flatnonzero(touched)
            if nzt.size >= k:
                threshold = np.partition(acc[nzt], nzt.size - k)[nzt.size - k]
        nz = np.flatnonzero(touched)
        return topk_from_scores(nz + self.doc_lo, acc[nz], k)

    def score_block_max_wand(
        self,
        terms: list[str],
        weights: np.ndarray,
        scheme: str,
        k: int,
        mask: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        """Block-max WAND over doc-id windows with a bounded min-heap (see
        module docstring).  theta = k-th best score so far; a window whose
        block-max bound is strictly below theta — and every window after
        it in descending-bound order — is skipped entirely.  ``mask``
        restricts to allowed docs with block maxima recomputed over the
        restriction (see :meth:`_gather`) — exact filtered pruning."""
        found = self._gather(terms, weights, scheme, mask)
        if not found:
            return []
        n_win = (self._span + WINDOW - 1) // WINDOW
        ub = np.zeros(n_win, dtype=np.float64)
        for wq, d in found:
            ub[d.win_ids] += d.wmax[scheme] * wq  # win_ids unique per term
        order = np.argsort(-ub, kind="stable")
        heap: list[tuple[float, int]] = []  # (score, -doc_id) bounded min-heap
        theta = -np.inf
        acc = np.empty(WINDOW, dtype=np.float64)
        for w in order:
            w_ub = ub[w]
            if w_ub <= 0.0 or (len(heap) >= k and w_ub < theta):
                break  # no remaining window can beat theta
            lo = self.doc_lo + int(w) * WINDOW
            hi = lo + WINDOW
            acc[:] = 0.0
            for wq, d in found:
                s, e = np.searchsorted(d.ids, (lo, hi))
                if s < e:
                    acc[d.ids[s:e] - lo] += d.wn[scheme][s:e] * wq
            if len(heap) >= k:
                cand_idx = np.flatnonzero(acc >= theta)
            else:
                cand_idx = np.flatnonzero(acc)
            for i in cand_idx:
                cand = (float(acc[i]), -(lo + int(i)))
                if len(heap) < k:
                    heapq.heappush(heap, cand)
                    if len(heap) == k:
                        theta = heap[0][0]
                elif cand > heap[0]:
                    heapq.heapreplace(heap, cand)
                    theta = heap[0][0]
        out = [(-nd, s) for s, nd in heap]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    def docs_with_all(
        self,
        terms: list[str],
        exclude_terms: list[str] | None = None,
        filters: dict | None = None,
    ) -> list[int]:
        """Local doc_ids containing EVERY term (AND semantics), minus docs
        containing any ``exclude_terms`` (NOT semantics) — the phrase /
        boolean candidate generator.  ``filters`` additionally restricts
        to docs matching the attribute filters (attrs sidecar).  A doc's
        postings all live in one shard, so per-shard results concatenate
        into the global set."""
        datas = []
        for t in set(terms):
            d = self.terms.get(t)
            if d is None:
                return []
            datas.append(d)
        datas.sort(key=lambda d: d.ids.size)  # start from the rarest term
        ids = datas[0].ids
        for d in datas[1:]:
            ids = np.intersect1d(ids, d.ids, assume_unique=True)
            if ids.size == 0:
                break
        for t in set(exclude_terms or ()):
            if ids.size == 0:
                break
            d = self.terms.get(t)
            if d is not None:
                ids = ids[~np.isin(ids, d.ids, assume_unique=True)]
        if filters and ids.size:
            mask = self.allowed_mask(filters)
            ids = ids[mask[ids - self.doc_lo]]
        return ids.tolist()

    def term_weights(
        self, terms: list[str], doc_ids: list[int], scheme: str
    ) -> np.ndarray:
        """(len(doc_ids), len(terms)) matrix of normalized doc-side weights
        wn(t, d) — the per-term score breakdown surface (the reference's
        sparse-vector debug output, ``search/SparseVector.java:33-47``)."""
        docs = np.asarray(doc_ids, dtype=np.int64)
        out = np.zeros((docs.size, len(terms)), dtype=np.float64)
        for qi, term in enumerate(terms):
            d = self.terms.get(term)
            if d is None:
                continue
            pos = np.searchsorted(d.ids, docs)
            ok = (pos < d.ids.size) & (d.ids[np.minimum(pos, d.ids.size - 1)] == docs)
            out[ok, qi] = d.wn[scheme][pos[ok]]
        return out

    def score(
        self, terms, weights, scheme, k, algorithm, filters=None
    ) -> list[tuple[int, float]]:
        w = np.asarray(weights, dtype=np.float64)
        fn = {
            "exhaustive": self.score_exhaustive,
            "maxscore": self.score_maxscore,
            "block_max_wand": self.score_block_max_wand,
        }[algorithm]
        if filters:
            # filter-aware pruning: every algorithm takes the allowed-docs
            # mask; the pruned ones recompute their upper bounds over the
            # masked postings (so no allowed doc is ever pruned away, and
            # disallowed windows/postings are skipped instead of scored)
            out = fn(terms, w, scheme, k, mask=self.allowed_mask(filters))
        else:
            out = fn(terms, w, scheme, k)
        # locked semantics: zero-score docs are never returned (see oracle.py)
        return [(d, s) for d, s in out if s > 0.0]


@ray.remote
class IndexShardActor:
    def __init__(
        self, files: list[str], df_source, N: int, avgdl: float,
        attrs_dir: str | None = None,
    ) -> None:
        # df_source: a path to the partitioned df dir (streamed, scale
        # path), a ray.put dict handle, or a plain dict (tests)
        if isinstance(df_source, ray.ObjectRef):
            df_source = ray.get(df_source)
        self.state = ShardState(files, df_source, N, avgdl, attrs_dir)

    def df_local_size(self) -> int:
        return self.state.df_local_size

    def score(self, terms, weights, scheme, k, algorithm, filters=None):
        return self.state.score(terms, weights, scheme, k, algorithm, filters)

    def score_many(self, queries, scheme, k, algorithm, filters=None):
        """Batch form: [(terms, weights), ...] -> list of partial top-ks."""
        return [
            self.state.score(t, w, scheme, k, algorithm, filters)
            for t, w in queries
        ]

    def docs_with_all(self, terms, exclude_terms=None, filters=None):
        return self.state.docs_with_all(terms, exclude_terms, filters)

    def term_weights(self, terms, doc_ids, scheme):
        return self.state.term_weights(terms, doc_ids, scheme)

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
        # query-term weighting needs global dfs.  Default: one df table on
        # the driver (vocabulary-sized, load once).  df_in_memory=False
        # streams only the queried terms' rows from the partitioned df
        # parquet (memoized) — no vocabulary-sized structure anywhere.
        if self.config.df_in_memory:
            self.df_map: dict[str, int] | None = meta.df_map()
        else:
            from ..stages.norms import DfStore

            self.df_map = None
            self._df_store = DfStore(meta.out_dir / "df")
            self._df_cache: dict[str, int] = {}
        # doc_id -> (conv_id, turn_idx) resolution: in-memory arrays below
        # the residency threshold, footer-pruned row-group reads of
        # convs.parquet above it (stages/convmap.py) — the engine never has
        # to hold the conversation table
        from ..stages.convmap import ConvResolver

        self._resolver = ConvResolver(
            meta.out_dir / "convs.parquet",
            in_memory=self.config.offsets_in_memory,
        )
        # misspelling -> vocabulary term (or None when nothing is within
        # max_edits), filled lazily by fuzzy_replacements
        self._fuzzy_memo: dict[str, str | None] = {}
        files = [str(f) for f in meta.shard_files()]
        if not files:
            raise FileNotFoundError(f"no shards under {meta.out_dir}")
        n = min(self.config.num_actors, len(files))
        # contiguous doc-range groups per actor (files are salt-ordered)
        groups = [g.tolist() for g in np.array_split(np.array(files), n)]
        self.local = local
        N, avgdl = meta.N, meta.avg_doc_len
        df_dir = str(meta.out_dir / "df")
        attrs = meta.out_dir / "attrs"
        attrs_dir = str(attrs) if attrs.is_dir() else None
        if local:
            src = self.df_map if self.df_map is not None else df_dir
            self.states = [
                ShardState(g, src, N, avgdl, attrs_dir) for g in groups
            ]
        else:
            self.actors = [
                IndexShardActor.remote(g, df_dir, N, avgdl, attrs_dir)
                for g in groups
            ]
            ray.get([a.ready.remote() for a in self.actors])

    def _query_dfs(self, terms) -> dict[str, int]:
        """Streamed-df mode: resolve dfs for just these terms (memoized;
        a term absent from the index memoizes as 0)."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            found = self._df_store.lookup(missing)
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return self._df_cache

    def parse(
        self, text: str, fuzzy: bool = False
    ) -> tuple[list[str], np.ndarray, float]:
        """Query terms in first-occurrence order + weights + ||q||
        (bag-of-words per ``search/Query.java:18-29``).  ``fuzzy=True``
        first rewrites out-of-vocabulary terms via
        :meth:`fuzzy_replacements`."""
        toks = self.pipe(text)
        if fuzzy and toks:
            repl = self.fuzzy_replacements(list(dict.fromkeys(toks)))
            toks = [repl.get(t, t) for t in toks]
        q_tfs = Counter(toks)
        dfs = self.df_map if self.df_map is not None else self._query_dfs(q_tfs)
        weights, q_norm = query_weights(dict(q_tfs), dfs, self.meta.N)
        terms = list(q_tfs)
        return terms, np.array([weights[t] for t in terms]), q_norm

    def fuzzy_replacements(
        self, terms: list[str], max_edits: int = 1
    ) -> dict[str, str]:
        """For each term ABSENT from the index vocabulary, its closest
        vocabulary term within ``max_edits`` (min distance, then max df,
        then term ASC — deterministic); unmatched OOV terms are omitted.

        Each replacement costs one map-only SymSpell scan of the
        vocabulary-sized df parts (:mod:`..extras.fuzzy`) — a lexicon
        read, never a corpus read — and is memoized per engine, so a
        query workload pays per DISTINCT misspelling, not per query."""
        if self.df_map is not None:
            dfs: dict[str, int] = self.df_map
            oov = [t for t in terms if not dfs.get(t)]
        else:
            dfs = self._query_dfs(terms)
            oov = [t for t in terms if not dfs[t]]
        need = [t for t in oov if t not in self._fuzzy_memo]
        if need:
            import ray.data

            from ..extras.fuzzy import fuzzy_vocab_lookup

            vocab = ray.data.read_parquet(str(self.meta.out_dir / "df"))
            rows = fuzzy_vocab_lookup(vocab, need, max_edits).take_all()
            best: dict[str, tuple] = {}
            for r in rows:  # match-sized, never vocabulary-sized
                key = (r["dist"], -r["df"], r["term"])
                if r["query"] not in best or key < best[r["query"]][0]:
                    best[r["query"]] = (key, r["term"])
            for t in need:
                self._fuzzy_memo[t] = best[t][1] if t in best else None
        return {
            t: self._fuzzy_memo[t]
            for t in oov
            if self._fuzzy_memo.get(t) is not None
        }

    def _finish(self, partials, k: int, q_norm: float) -> list[dict]:
        merged = [(doc, s) for part in partials for doc, s in part]
        merged.sort(key=lambda t: (-t[1], t[0]))
        top = merged[:k]
        doc_arr = np.array([d for d, _ in top], dtype=np.int64)
        convs, turns = self._resolver.resolve(doc_arr)
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

    def query(
        self,
        text: str,
        scheme: str | None = None,
        k: int | None = None,
        algorithm: str | None = None,
        filters: dict | None = None,
        fuzzy: bool = False,
    ) -> list[dict]:
        """Top-k; ``filters={"role": "user"}`` (value or collection per
        attribute column) restricts retrieval to matching documents —
        requires an index built with ``IndexConfig(attr_cols=(...))``.
        Scores are unchanged by filtering (cosine norms are per-doc), so
        the filtered top-k is exactly the allowed subset's ranking.
        ``fuzzy=True`` rewrites out-of-vocabulary query terms to their
        closest vocabulary term first (:meth:`fuzzy_replacements`); a
        fully in-vocabulary query is untouched."""
        scheme = scheme or self.config.scheme
        k = k or self.config.top_k
        algorithm = algorithm or self.config.algorithm
        terms, weights, q_norm = self.parse(text, fuzzy=fuzzy)
        if not terms or q_norm == 0.0:
            return []
        if self.local:
            partials = [
                s.score(terms, weights, scheme, k, algorithm, filters)
                for s in self.states
            ]
        else:
            partials = ray.get(
                [
                    a.score.remote(terms, weights, scheme, k, algorithm, filters)
                    for a in self.actors
                ]
            )
        return self._finish(partials, k, q_norm)

    def explain(
        self,
        text: str,
        scheme: str | None = None,
        k: int | None = None,
        filters: dict | None = None,
        fuzzy: bool = False,
    ) -> list[dict]:
        """Top-k results with the per-query-term score breakdown: each result
        row carries ``terms: {term: contribution}`` where contribution =
        wn(t,d) * w(t,q) / ||q|| and the contributions sum to the score
        (reference's debug sparse-vector dump, ``search/Driver.java:94-104``,
        off the hot path).  ``filters``/``fuzzy`` behave exactly as in
        :meth:`query`, so an OOV rewrite or a filtered ranking can be
        debugged with the terms that actually scored it."""
        scheme = scheme or self.config.scheme
        k = k or self.config.top_k
        results = self.query(text, scheme, k, filters=filters, fuzzy=fuzzy)
        if not results:
            return results
        terms, weights, q_norm = self.parse(text, fuzzy=fuzzy)
        docs = [r["doc_id"] for r in results]
        if self.local:
            mats = [s.term_weights(terms, docs, scheme) for s in self.states]
        else:
            mats = ray.get(
                [a.term_weights.remote(terms, docs, scheme) for a in self.actors]
            )
        wn = np.sum(mats, axis=0)  # each doc is owned by exactly one shard
        for r, row in zip(results, wn):
            r["terms"] = {
                t: float(row[qi] * weights[qi] / q_norm)
                for qi, t in enumerate(terms)
                if row[qi] != 0.0 and weights[qi] != 0.0
            }
        return results

    def phrase_query(
        self,
        text: str,
        scheme: str | None = None,
        k: int | None = None,
        *,
        max_candidates: int = 1_000_000,
        filters: dict | None = None,
        slop: int = 0,
        fuzzy: bool = False,
    ) -> list[dict]:
        """Phrase search without a positional index: candidate docs are the
        AND-intersection of the phrase terms' postings (per shard actor,
        rarest-first), then a DISTRIBUTED verify re-tokenizes only the
        candidate docs (read from the index's recorded input lineage,
        pruned to candidate conversations) and checks for the terms as a
        CONTIGUOUS run; verified docs are scored with the same normalized
        cosine scoring as :meth:`query` and top-k ranked.

        ``slop > 0`` relaxes contiguity to the ORDERED sloppy-phrase
        predicate: the terms must appear in order within a window of
        ``len(terms) + slop`` token positions (span minus the phrase
        length at most ``slop``); ``slop=0`` is exactly the contiguous
        phrase.  Both verify mechanisms (positional sidecar and candidate
        re-tokenize) implement the same predicate.

        Matching is over the INDEX TERM stream — stopwords removed and (in
        full mode) Porter applied — i.e. "boundary layers" matches
        "boundary layer" in full mode, the standard normalized-phrase
        semantics.  Verify cost is linear in candidates (bounded by the
        rarest term's df), never the corpus; ``max_candidates`` guards the
        pathological all-common-terms phrase.  ``fuzzy=True`` rewrites OOV
        phrase terms via :meth:`fuzzy_replacements` before matching (a
        misspelled phrase otherwise has an empty candidate set)."""
        scheme = scheme or self.config.scheme
        k = k or self.config.top_k
        terms = self.pipe(text)
        if fuzzy and terms:
            repl = self.fuzzy_replacements(list(dict.fromkeys(terms)))
            terms = [repl.get(t, t) for t in terms]
        if not terms:
            return []
        uniq = list(dict.fromkeys(terms))
        if self.local:
            cand_parts = [
                s.docs_with_all(uniq, None, filters) for s in self.states
            ]
        else:
            cand_parts = ray.get(
                [a.docs_with_all.remote(uniq, None, filters)
                 for a in self.actors]
            )
        cand = np.sort(np.concatenate([np.array(p, dtype=np.int64)
                                       for p in cand_parts])
                       if any(cand_parts) else np.empty(0, np.int64))
        if cand.size == 0:
            return []
        if cand.size > max_candidates:
            raise ValueError(
                f"{cand.size} phrase candidates exceed max_candidates="
                f"{max_candidates}; refine the phrase"
            )
        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        if len(terms) > 1:
            if self._use_positions():
                from .positions import verify_phrase_positions

                cand = verify_phrase_positions(
                    self.meta.out_dir, self.meta.range_size, cand, terms,
                    slop=slop,
                )
            else:
                cand = self._verify_phrase(cand, terms, slop=slop)
            if cand.size == 0:
                return []
        # exact cosine scores for the verified docs (same math as query())
        q_tfs = Counter(terms)
        dfs = self.df_map if self.df_map is not None else self._query_dfs(q_tfs)
        weights_map, q_norm = query_weights(dict(q_tfs), dfs, self.meta.N)
        if q_norm == 0.0:
            return []
        wq = np.array([weights_map[t] for t in uniq])
        docs = cand.tolist()
        if self.local:
            mats = [s.term_weights(uniq, docs, scheme) for s in self.states]
        else:
            mats = ray.get(
                [a.term_weights.remote(uniq, docs, scheme) for a in self.actors]
            )
        wn = np.sum(mats, axis=0)  # each doc owned by exactly one shard
        scores = (wn @ wq) / q_norm
        keep = scores > 0.0
        return self._finish(
            [list(zip(cand[keep].tolist(), scores[keep].tolist()))], k, 1.0
        )

    def boolean_query(
        self,
        must: str,
        must_not: str = "",
        scheme: str | None = None,
        k: int | None = None,
        filters: dict | None = None,
    ) -> list[dict]:
        """Boolean retrieval: docs containing EVERY normalized term of
        ``must`` and NONE of ``must_not``, ranked by the bag-of-words
        cosine of the must terms (same scoring as :meth:`query`).  The
        candidate set comes from per-shard posting intersections/exclusions
        — no corpus scan."""
        scheme = scheme or self.config.scheme
        k = k or self.config.top_k
        terms = self.pipe(must)
        if not terms:
            return []
        uniq = list(dict.fromkeys(terms))
        not_terms = list(dict.fromkeys(self.pipe(must_not))) if must_not else []
        if self.local:
            parts = [
                s.docs_with_all(uniq, not_terms, filters) for s in self.states
            ]
        else:
            parts = ray.get(
                [a.docs_with_all.remote(uniq, not_terms, filters)
                 for a in self.actors]
            )
        cand = np.sort(
            np.concatenate([np.array(p, dtype=np.int64) for p in parts])
            if any(parts)
            else np.empty(0, np.int64)
        )
        if cand.size == 0:
            return []
        q_tfs = Counter(terms)
        dfs = self.df_map if self.df_map is not None else self._query_dfs(q_tfs)
        weights_map, q_norm = query_weights(dict(q_tfs), dfs, self.meta.N)
        if q_norm == 0.0:
            return []
        wq = np.array([weights_map[t] for t in uniq])
        docs = cand.tolist()
        if self.local:
            mats = [s.term_weights(uniq, docs, scheme) for s in self.states]
        else:
            mats = ray.get(
                [a.term_weights.remote(uniq, docs, scheme) for a in self.actors]
            )
        wn = np.sum(mats, axis=0)
        scores = (wn @ wq) / q_norm
        keep = scores > 0.0
        return self._finish(
            [list(zip(cand[keep].tolist(), scores[keep].tolist()))], k, 1.0
        )

    def _source_paths(self, need_convs: list[str] | None = None) -> list[str]:
        """The index's recorded input files; with ``need_convs``, pruned to
        files whose conv_id range (parquet footer row-group stats) overlaps
        the needed conversations — file-level predicate pushdown for the
        verify read."""
        import json

        stats = json.loads((self.meta.out_dir / "stats.json").read_text())
        paths = [ln["path"] for ln in stats["lineage"]]
        if not need_convs:
            return paths
        from .positions import prune_paths_by_conv

        return prune_paths_by_conv(paths, need_convs[0], need_convs[-1])

    def _use_positions(self) -> bool:
        """Resolve QueryConfig.use_positions against the on-disk sidecar.
        None = auto-use when present AND fingerprint-fresh; True requires
        it; False ignores it.  The availability probe is memoized (it reads
        stats.json + the marker once)."""
        want = self.config.use_positions
        if want is False:
            return False
        got = getattr(self, "_positions_ok", None)
        if got is None:
            from .positions import positions_available

            got = self._positions_ok = positions_available(self.meta.out_dir)
        if want is True and not got:
            raise FileNotFoundError(
                f"use_positions=True but no fresh positional sidecar under "
                f"{self.meta.out_dir}/positions — run "
                "pipelines.positions.build_positions(out_dir) "
                "(or rebuild with --positions)"
            )
        return got

    def proximity_query(
        self,
        text: str,
        slop: int,
        scheme: str | None = None,
        k: int | None = None,
        *,
        max_candidates: int = 1_000_000,
        filters: dict | None = None,
        fuzzy: bool = False,
    ) -> list[dict]:
        """Ordered sloppy-phrase search: :meth:`phrase_query` with the
        contiguity requirement relaxed to a span allowance of ``slop``
        extra token positions (Lucene-style ordered slop)."""
        return self.phrase_query(
            text, scheme, k,
            max_candidates=max_candidates, filters=filters, slop=slop,
            fuzzy=fuzzy,
        )

    def _verify_phrase(
        self, cand: np.ndarray, terms: list[str], slop: int = 0
    ) -> np.ndarray:
        """Distributed contiguous-run (``slop=0``) or ordered-sloppy-run
        check over ONLY the candidate docs."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        from ..stages.docids import assign_doc_ids

        # the broadcast offsets pair is RESTRICTED to the candidate
        # conversations (bounded by the rarest term's df) — never the full
        # conversation table, in either resolver mode
        need_convs = self._resolver.convs_for(cand)
        offsets_ref = ray.put(self._resolver.pair_for_convs(need_convs))
        need_ref = ray.put(pa.array(need_convs, type=pa.string()))
        cand_ref = ray.put(pa.array(cand))
        mode = self.meta.mode
        phrase = tuple(terms)

        def check(batch: pa.Table) -> pa.Table:
            needs = ray.get(need_ref)
            batch = batch.filter(pc.is_in(batch["conv_id"], value_set=needs))
            if batch.num_rows == 0:
                return pa.table({"doc_id": pa.array([], type=pa.int64())})
            batch = assign_doc_ids(batch, offsets_ref=offsets_ref)
            cands = ray.get(cand_ref)
            batch = batch.filter(pc.is_in(batch["doc_id"], value_set=cands))
            pipe = _PIPE_CACHE.get(mode)
            if pipe is None:
                pipe = _PIPE_CACHE[mode] = TokenPipeline(mode)
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            tok_lists = [pipe(tx) for tx in batch["text"].to_pylist()]
            # Vectorized contiguous-run check over the whole batch at once:
            # flatten all token lists into one unicode array, window-compare
            # against the phrase, and mask windows that cross doc boundaries.
            n = len(phrase)
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64,
                count=len(tok_lists),
            )
            flat: list[str] = []
            for t in tok_lists:
                flat.extend(t)
            size = len(flat)
            if size < n:
                return pa.table({"doc_id": pa.array([], type=pa.int64())})
            arr = np.array(flat, dtype=np.str_)
            doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
            if slop > 0:
                # same keys + greedy chain as the positional sidecar path
                from .positions import _POS_MASK, chain_spans

                starts_off = np.repeat(
                    np.cumsum(lens) - lens, lens
                )
                pos_in_doc = np.arange(size, dtype=np.int64) - starts_off
                keys = (doc_of << np.int64(32)) | pos_in_doc
                seq = [keys[arr == t] for t in phrase]  # each sorted
                s_keys, e_keys = chain_spans(seq)
                span = (e_keys & _POS_MASK) - (s_keys & _POS_MASK)
                ok = s_keys[span <= n - 1 + slop]
                hit = np.unique(ok >> np.int64(32))
                return pa.table(
                    {"doc_id": pa.array(doc_ids[hit], type=pa.int64())}
                )
            nwin = size - n + 1
            m = arr[:nwin] == phrase[0]
            for j in range(1, n):
                m &= arr[j : nwin + j] == phrase[j]
            if n > 1:  # window must start and end inside the same doc
                m &= doc_of[:nwin] == doc_of[n - 1 :]
            hit = np.unique(doc_of[:nwin][m])
            return pa.table(
                {"doc_id": pa.array(doc_ids[hit], type=pa.int64())}
            )

        ds = ray.data.read_parquet(
            self._source_paths(need_convs),
            columns=["conv_id", "turn_idx", "text"],
        ).map_batches(check, batch_format="pyarrow")
        got = np.array(
            [r["doc_id"] for r in ds.take_all()], dtype=np.int64
        )
        return np.sort(got)

    def query_many(
        self,
        texts: list[str],
        scheme: str | None = None,
        k: int | None = None,
        algorithm: str | None = None,
        filters: dict | None = None,
        fuzzy: bool = False,
    ) -> list[list[dict]]:
        """Batch scoring: ONE round-trip per actor for the whole query set
        (throughput path; per-query fan-out is the latency path).  The
        optional ``filters`` apply to every query in the batch; ``fuzzy``
        rewrites OOV terms per query (the memo makes repeats free)."""
        scheme = scheme or self.config.scheme
        k = k or self.config.top_k
        algorithm = algorithm or self.config.algorithm
        parsed = [self.parse(t, fuzzy=fuzzy) for t in texts]
        live = [
            (i, terms, weights, q_norm)
            for i, (terms, weights, q_norm) in enumerate(parsed)
            if terms and q_norm != 0.0
        ]
        results: list[list[dict]] = [[] for _ in texts]
        if not live:
            return results
        payload = [(terms, weights) for _, terms, weights, _ in live]
        if self.local:
            per_actor = [
                [s.score(t, w, scheme, k, algorithm, filters) for t, w in payload]
                for s in self.states
            ]
        else:
            per_actor = ray.get(
                [
                    a.score_many.remote(payload, scheme, k, algorithm, filters)
                    for a in self.actors
                ]
            )
        for j, (i, _terms, _weights, q_norm) in enumerate(live):
            partials = [actor_out[j] for actor_out in per_actor]
            results[i] = self._finish(partials, k, q_norm)
        return results
