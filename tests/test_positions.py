"""Positional sidecar (pipelines/positions.py): phrase verify without the
corpus re-read.

Contract under test: phrase results are IDENTICAL with and without the
sidecar; the sidecar is resumable (per-file lineage skip), refreshes in
O(delta) after an append, and is never used stale (fingerprint gate)."""

import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

POS_OUT = Path("/tmp/graft_test_positions_idx")


def _phrases_from(corpus_dir: Path, mode: str, n: int = 3) -> list[str]:
    """n multi-term phrases mined from the corpus token stream (so they
    actually hit), plus a repeated-term phrase and a no-match phrase."""
    from ir_search_engine_ray.textproc import TokenPipeline

    pipe = TokenPipeline(mode)
    t = pq.read_table(corpus_dir, columns=["text"])
    got = []
    for text in t["text"].to_pylist():
        toks = pipe(text)
        if len(toks) >= 6:
            got.append(" ".join(toks[2:5]))
            if len(got) >= n:
                break
    dup = toks[2]
    return got + [f"{dup} {dup}", "zzznomatch qqqnomatch"]


@pytest.fixture(scope="module")
def pos_built(ray_session, corpus):
    from ir_search_engine_ray.pipelines import positions
    from ir_search_engine_ray.pipelines.index_build import build_index

    shutil.rmtree(POS_OUT, ignore_errors=True)
    meta = build_index(str(corpus / "transcripts"), POS_OUT, concurrency=2)
    # tiny row groups so the term-stat row-group pruning actually prunes
    marker = positions.build_positions(POS_OUT, row_group_size=64)
    return meta, marker


class TestPositions:
    def test_marker_and_files(self, pos_built):
        meta, marker = pos_built
        n_salts = -(-meta.N // meta.range_size)
        assert marker["n_salts"] == n_salts
        files = sorted((POS_OUT / "positions").glob("pos-*.parquet"))
        assert len(files) == n_salts
        # files are (term, doc_id)-sorted with live statistics
        t = pq.read_table(files[0])
        pairs = list(zip(t["term"].to_pylist(), t["doc_id"].to_pylist()))
        assert pairs == sorted(pairs)

    def test_phrase_identity_with_and_without(self, pos_built, corpus):
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines.query import QueryEngine

        meta, _ = pos_built
        e_no = QueryEngine(
            meta, QueryConfig(num_actors=2, use_positions=False)
        )
        e_pos = QueryEngine(
            meta, QueryConfig(num_actors=2, use_positions=True)
        )
        for p in _phrases_from(corpus / "transcripts", meta.mode):
            assert e_pos.phrase_query(p) == e_no.phrase_query(p), p

    def test_positions_are_token_stream_offsets(self, pos_built, corpus):
        """Spot-check: a (term, doc) row's positions are exactly the term's
        indices in the doc's pipeline token stream."""
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.textproc import TokenPipeline

        meta, _ = pos_built
        pipe = TokenPipeline(meta.mode)
        t = pq.read_table(corpus / "transcripts").sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        text0 = t["text"][0].as_py()
        toks = pipe(text0)
        assert toks
        term = toks[0]
        want = [i for i, tk in enumerate(toks) if tk == term]
        pos_t = pq.read_table(POS_OUT / "positions")
        row = pos_t.filter(
            pc.and_(
                pc.equal(pos_t["term"], term), pc.equal(pos_t["doc_id"], 0)
            )
        )
        assert row.num_rows == 1
        assert row["positions"][0].as_py() == want

    def test_rebuild_skips_all_files(self, pos_built):
        from ir_search_engine_ray.pipelines import positions

        meta, marker = pos_built
        # marker intact: returns the cached payload, no work
        again = positions.build_positions(POS_OUT, row_group_size=64)
        assert again == marker
        # marker gone but files fresh: every salt skips via lineage hash
        (POS_OUT / "positions" / "_SUCCESS").unlink()
        redo = positions.build_positions(POS_OUT, row_group_size=64)
        assert redo["n_skipped"] == redo["n_salts"]

    def test_same_size_source_edit_triggers_rebuild(self, pos_built):
        """The per-salt lineage hash covers (size, mtime_ns) of the pruned
        source files (round-5 fix): an in-place edit that preserves file
        size must NOT keep serving the stale positions file once the index
        is rebuilt — simulated here by bumping mtime only."""
        import json
        import os

        from ir_search_engine_ray.pipelines import positions

        stats = json.loads((POS_OUT / "stats.json").read_text())
        for ln in stats["lineage"]:
            st = os.stat(ln["path"])
            os.utime(ln["path"], ns=(st.st_atime_ns, st.st_mtime_ns + 1_000))
        (POS_OUT / "positions" / "_SUCCESS").unlink()
        redo = positions.build_positions(POS_OUT, row_group_size=64)
        assert redo["n_skipped"] == 0  # every salt saw the changed lineage

    def test_streamed_resolver_builds_identical_sidecar(
        self, pos_built, tmp_path
    ):
        """offsets_in_memory=False (the 100-TB footer-pruned ConvResolver
        mode) must produce byte-for-byte the same per-salt files."""
        import shutil as sh

        from ir_search_engine_ray.pipelines import positions

        clone = tmp_path / "idx_streamed"
        sh.copytree(POS_OUT, clone, ignore=sh.ignore_patterns("positions"))
        m = positions.build_positions(
            clone, row_group_size=64, offsets_in_memory=False
        )
        assert m["n_skipped"] == 0
        a = sorted((POS_OUT / "positions").glob("pos-*.parquet"))
        b = sorted((clone / "positions").glob("pos-*.parquet"))
        assert [f.name for f in a] == [f.name for f in b]
        for fa, fb in zip(a, b):
            assert fa.read_bytes() == fb.read_bytes(), fa.name

    def test_use_positions_true_requires_sidecar(
        self, ray_session, built, corpus
    ):
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(built, QueryConfig(num_actors=2, use_positions=True))
        phrase = _phrases_from(corpus / "transcripts", built.mode, n=1)[0]
        assert eng.query(phrase)  # the terms do have candidates
        with pytest.raises(FileNotFoundError, match="positional sidecar"):
            eng.phrase_query(phrase)

    def test_append_staleness_and_delta_refresh(
        self, ray_session, corpus, tmp_path
    ):
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines import positions
        from ir_search_engine_ray.pipelines.index_build import (
            append_index,
            build_index,
        )
        from ir_search_engine_ray.pipelines.query import QueryEngine

        t = pq.read_table(corpus / "transcripts")
        convs = sorted(set(t["conv_id"].to_pylist()))
        cut = len(convs) - 3
        d0, d1 = tmp_path / "base", tmp_path / "delta"
        for d, chunk in ((d0, convs[:cut]), (d1, convs[cut:])):
            d.mkdir()
            pq.write_table(
                t.filter(pc.is_in(t["conv_id"], value_set=pa.array(chunk))),
                d / "part-00000.parquet",
            )
        out = tmp_path / "idx"
        build_index(str(d0), out, concurrency=2)
        m0 = positions.build_positions(out, row_group_size=64)
        assert positions.positions_available(out)
        meta = append_index(str(d1), out, concurrency=2)
        # appended index invalidates the sidecar (never silently stale)
        assert not positions.positions_available(out)
        e_auto = QueryEngine(meta, QueryConfig(num_actors=2))
        e_no = QueryEngine(
            meta, QueryConfig(num_actors=2, use_positions=False)
        )
        phrases = _phrases_from(d1, meta.mode, n=2)
        # auto mode falls back to re-tokenize while stale
        for p in phrases:
            assert e_auto.phrase_query(p) == e_no.phrase_query(p), p
        m1 = positions.build_positions(out, row_group_size=64)
        assert positions.positions_available(out)
        # O(delta): every full old salt whose (range, lineage) is unchanged
        # was skipped, and the sidecar grew to the new salt count
        assert m1["n_salts"] >= m0["n_salts"]
        old_full_salts = meta.N // meta.range_size and (
            m0["n_salts"] - 1
        )  # the old tail salt's doc_hi moved, so at most it rebuilds
        assert m1["n_skipped"] >= old_full_salts
        e_pos = QueryEngine(
            meta, QueryConfig(num_actors=2, use_positions=True)
        )
        for p in phrases + _phrases_from(d0, meta.mode, n=2):
            assert e_pos.phrase_query(p) == e_no.phrase_query(p), p


class TestPositionsKillResume:
    def test_sigkill_mid_positions_then_resume(
        self, ray_session, corpus, tmp_path
    ):
        """Hard-kill a positions build mid-stage; resuming must keep the
        completed per-salt files (lineage-hash skip) and converge to files
        byte-identical to an uninterrupted build."""
        import os
        import signal
        import shutil as sh
        import subprocess
        import sys
        import time

        from ir_search_engine_ray.pipelines import positions
        from ir_search_engine_ray.pipelines.index_build import build_index

        out = tmp_path / "idx"
        build_index(str(corpus / "transcripts"), out, concurrency=2)
        clean = tmp_path / "idx_clean"
        sh.copytree(out, clean)
        positions.build_positions(clean, row_group_size=64)

        script = (
            "import ray; ray.init(address='local', num_cpus=2, "
            "include_dashboard=False, logging_level='ERROR')\n"
            "from ir_search_engine_ray.pipelines.positions import "
            "build_positions\n"
            f"build_positions({str(out)!r}, row_group_size=64)\n"
        )
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            cwd="/root/repo",
            start_new_session=True,  # SIGKILL the whole group: the child's
            # private Ray cluster (gcs/raylet) has no atexit after SIGKILL
        )
        pos_dir = out / "positions"
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if len(list(pos_dir.glob("pos-*.parquet"))) >= 2:
                    break
                if proc.poll() is not None:
                    # finished first is a valid resume test — but a CRASH
                    # (import error, ray.init failure) is neither a kill
                    # nor a finish and would silently skip the scenario
                    assert proc.returncode == 0, (
                        f"positions subprocess crashed rc={proc.returncode}"
                    )
                    break
                time.sleep(0.05)
            else:
                pytest.fail("positions subprocess never produced files")
        finally:
            if proc.poll() is None:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                proc.wait()

        n_partial = len(list(pos_dir.glob("pos-*.parquet")))
        marker = positions.build_positions(out, row_group_size=64)
        assert marker["n_salts"] == len(
            list(pos_dir.glob("pos-*.parquet"))
        )
        if proc.returncode and proc.returncode < 0 and n_partial:
            # files completed before the kill were skipped, not rewritten
            assert marker["n_skipped"] >= min(n_partial, marker["n_salts"])
        want = {
            f.name: f.read_bytes()
            for f in sorted((clean / "positions").glob("pos-*.parquet"))
        }
        got = {
            f.name: f.read_bytes()
            for f in sorted(pos_dir.glob("pos-*.parquet"))
        }
        assert got == want


class TestPositionsBatchTableProperty:
    def test_matches_naive_grouping_property(self, ray_session):
        """Hypothesis: for ANY batch of token streams, the vectorized
        lexsort grouping equals the naive per-token dict build — same
        groups, same position lists, (term, doc_id)-sorted output."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ir_search_engine_ray.pipelines.positions import (
            positions_batch_table,
        )
        from ir_search_engine_ray.textproc import TokenPipeline

        pipe = TokenPipeline("simple")
        vocab = ["blade", "rotor", "wing", "flow", "mach"]

        @given(
            st.lists(
                st.lists(st.sampled_from(vocab), max_size=12),
                min_size=1,
                max_size=8,
            )
        )
        @settings(max_examples=80, deadline=None)
        def check(docs):
            texts = [" ".join(d) for d in docs]
            doc_ids = np.arange(100, 100 + len(docs), dtype=np.int64)
            out = positions_batch_table(doc_ids, texts, pipe)
            naive: dict = {}
            for did, toks in zip(doc_ids, docs):
                for i, tk in enumerate(toks):
                    naive.setdefault((tk, int(did)), []).append(i)
            got = {
                (t, d): p
                for t, d, p in zip(
                    out["term"].to_pylist(),
                    out["doc_id"].to_pylist(),
                    out["positions"].to_pylist(),
                )
            }
            assert got == naive
            keys = list(
                zip(out["term"].to_pylist(), out["doc_id"].to_pylist())
            )
            assert keys == sorted(keys)

        check()


class TestPositionsBatchTable:
    def test_matches_manual_grouping(self, ray_session):
        from ir_search_engine_ray.pipelines.positions import (
            positions_batch_table,
        )
        from ir_search_engine_ray.textproc import TokenPipeline

        pipe = TokenPipeline("simple")
        # note: positions index the FILTERED token stream (stopwords like
        # "a" are gone before positions are assigned) — same stream the
        # phrase matcher walks
        texts = ["blade a rotor a blade wing", "wing wing wing", "", "rotor"]
        doc_ids = np.array([10, 11, 12, 13], dtype=np.int64)
        out = positions_batch_table(doc_ids, texts, pipe)
        got = {
            (t, d): p
            for t, d, p in zip(
                out["term"].to_pylist(),
                out["doc_id"].to_pylist(),
                out["positions"].to_pylist(),
            )
        }
        want = {
            ("blade", 10): [0, 2],
            ("rotor", 10): [1],
            ("wing", 10): [3],
            ("wing", 11): [0, 1, 2],
            ("rotor", 13): [0],
        }
        assert got == want
        # table-level (term, doc_id) order
        keys = list(
            zip(out["term"].to_pylist(), out["doc_id"].to_pylist())
        )
        assert keys == sorted(keys)


class TestProximity:
    """Ordered sloppy-phrase search: slop=0 is the contiguous phrase; both
    verify mechanisms implement the same minimal-span greedy predicate."""

    @staticmethod
    def _ref_matches(toks, terms, slop):
        """Pure-Python reference predicate: exists ordered occurrence with
        span <= len(terms) - 1 + slop (greedy min-span per start)."""
        import bisect

        n = len(terms)
        poss = [[i for i, t in enumerate(toks) if t == q] for q in terms]
        if any(not p for p in poss):
            return False
        for i1 in poss[0]:
            cur, ok = i1, True
            for j in range(1, n):
                nxt = bisect.bisect_right(poss[j], cur)
                if nxt == len(poss[j]):
                    ok = False
                    break
                cur = poss[j][nxt]
            if ok and cur - i1 <= n - 1 + slop:
                return True
        return False

    def test_chain_spans_matches_brute(self):
        from ir_search_engine_ray.pipelines.positions import (
            _POS_MASK,
            chain_spans,
        )

        rng = np.random.default_rng(7)
        vocab = list("abcde")
        for trial in range(150):
            docs = {
                d: [vocab[i] for i in rng.integers(0, 5, rng.integers(3, 12))]
                for d in range(6)
            }
            n = int(rng.integers(2, 4))
            terms = [vocab[i] for i in rng.integers(0, 5, n)]
            slop = int(rng.integers(0, 4))
            seq = []
            for q in terms:
                ks = [
                    (d << 32) | i
                    for d, toks in docs.items()
                    for i, t in enumerate(toks)
                    if t == q
                ]
                seq.append(np.array(sorted(ks), dtype=np.int64))
            s, e = chain_spans(seq)
            span = (e & _POS_MASK) - (s & _POS_MASK)
            got = set((s[span <= n - 1 + slop] >> np.int64(32)).tolist())
            want = {
                d for d, toks in docs.items()
                if self._ref_matches(toks, terms, slop)
            }
            assert got == want, (trial, terms, slop)

    def test_slop_zero_equals_phrase(self, pos_built, corpus):
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines.query import QueryEngine

        meta, _ = pos_built
        for use_pos in (False, True):
            eng = QueryEngine(
                meta, QueryConfig(num_actors=2, use_positions=use_pos)
            )
            for p in _phrases_from(corpus / "transcripts", meta.mode):
                assert eng.proximity_query(p, 0) == eng.phrase_query(p), (
                    use_pos, p,
                )

    def test_proximity_reference_semantics(self, pos_built, corpus):
        """Matched doc SET equals the pure-Python predicate over the whole
        corpus, on BOTH verify paths, across slop values — including a spec
        whose source occurrence needs slop exactly (rejected one tighter)."""
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.textproc import TokenPipeline

        meta, _ = pos_built
        pipe = TokenPipeline(meta.mode)
        t = pq.read_table(corpus / "transcripts").sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        streams = [pipe(x) for x in t["text"].to_pylist()]
        src = next(s for s in streams if len(s) >= 8)
        specs = [
            ([src[2], src[4]], 1),          # gap 1: needs slop >= 1
            ([src[2], src[4]], 0),          # may or may not match elsewhere
            ([src[1], src[4], src[6]], 2),  # 3 terms, span 5, slack 2
            ([src[2], src[5]], 3),
        ]
        engines = [
            QueryEngine(meta, QueryConfig(num_actors=2, use_positions=up))
            for up in (False, True)
        ]
        for terms, slop in specs:
            want = {
                d for d, toks in enumerate(streams)
                if self._ref_matches(toks, terms, slop)
            }
            for up, eng in zip((False, True), engines):
                got = {
                    r["doc_id"]
                    for r in eng.proximity_query(" ".join(terms), slop,
                                                 "w2", meta.N)
                }
                assert got == want, (up, terms, slop)
        # the mined gap-1 spec must match its source doc at slop=1 …
        src_id = streams.index(src)
        assert src_id in {
            r["doc_id"]
            for r in engines[0].proximity_query(
                f"{src[2]} {src[4]}", 1, "w2", meta.N
            )
        }
        with pytest.raises(ValueError, match="slop"):
            engines[0].proximity_query("a b", -1)


class TestChainSpansProperty:
    def test_chain_spans_matches_brute_property(self):
        """Hypothesis: for ANY per-doc token streams, ANY phrase and ANY
        slop, the greedy chain kernel's matched-doc set equals the
        brute-force ordered-occurrence predicate."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ir_search_engine_ray.pipelines.positions import (
            _POS_MASK,
            chain_spans,
        )

        vocab = list("abcd")

        @given(
            st.lists(
                st.lists(st.sampled_from(vocab), max_size=10),
                min_size=1,
                max_size=5,
            ),
            st.lists(st.sampled_from(vocab), min_size=2, max_size=4),
            st.integers(min_value=0, max_value=4),
        )
        @settings(max_examples=150, deadline=None)
        def check(docs, terms, slop):
            n = len(terms)
            seq = []
            for q in terms:
                ks = [
                    (d << 32) | i
                    for d, toks in enumerate(docs)
                    for i, t in enumerate(toks)
                    if t == q
                ]
                seq.append(np.array(sorted(ks), dtype=np.int64))
            s, e = chain_spans(seq)
            span = (e & _POS_MASK) - (s & _POS_MASK)
            got = set((s[span <= n - 1 + slop] >> np.int64(32)).tolist())
            want = {
                d
                for d, toks in enumerate(docs)
                if TestProximity._ref_matches(toks, terms, slop)
            }
            assert got == want, (docs, terms, slop)

        check()


class TestLevLeqProperty:
    def test_lev_leq_matches_naive_property(self):
        """Hypothesis: the banded early-exit DP agrees with the full
        Levenshtein DP for ANY word pair and bound."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ir_search_engine_ray.extras.fuzzy import lev_leq

        word = st.text(alphabet="abc", max_size=8)

        @given(word, word, st.integers(min_value=1, max_value=4))
        @settings(max_examples=300, deadline=None)
        def check(a, b, d):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1,
                            prev[j - 1] + (ca != cb))
                    )
                prev = cur
            true = prev[-1]
            got = lev_leq(a, b, d)
            assert got == (true if true <= d else None), (a, b, d)

        check()
