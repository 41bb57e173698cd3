"""Pipeline equivalence, rank identity, determinism and resume tests.

Strategy per SURVEY.md §5: the Ray pipeline's artifacts are compared against
the pure-Python oracle on a small synthesized corpus; the query actor path is
compared rank-for-rank and score-for-score (1e-9) against the oracle; the
build must be bit-stable under re-partitioned, re-ordered input; a resumed
build must skip completed work and produce an identical index.
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEST_SF = "sf0.0002"  # ~400 turns — fast builds
OUT = Path("/tmp/graft_test_index")



@pytest.fixture(scope="session")
def oracle_idx(corpus):
    from ir_search_engine_ray.oracle import build_oracle_index

    t = pq.read_table(corpus / "transcripts")
    rows = list(
        zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["text"].to_pylist(),
        )
    )
    return build_oracle_index(rows, "full")


def _engine_postings(out_dir):
    """chunks -> {term: [(doc_id, tf)]} with salt-order concatenation."""
    from ir_search_engine_ray.functions.codec import decode_postings

    t = pq.read_table(Path(out_dir) / "chunks")
    rows = sorted(
        zip(
            t["term"].to_pylist(),
            t["salt"].to_pylist(),
            t["id_bytes"].to_pylist(),
            t["tf_bytes"].to_pylist(),
        )
    )
    out = {}
    for term, _salt, idb, tfb in rows:
        ids, tfs = decode_postings(idb, tfb)
        out.setdefault(term, []).extend(zip(ids.tolist(), tfs.tolist()))
    return out


class TestIndexEquivalence:
    def test_stats(self, built, oracle_idx):
        assert built.N == oracle_idx.N
        assert built.n_terms == len(oracle_idx.postings)
        assert built.avg_doc_len == pytest.approx(oracle_idx.avg_doc_len, rel=1e-12)

    def test_postings_exact(self, built, oracle_idx):
        got = _engine_postings(built.out_dir)
        assert set(got) == set(oracle_idx.postings)
        for term, plist in oracle_idx.postings.items():
            assert got[term] == plist, term

    def test_doclen_exact(self, built, oracle_idx):
        t = pq.read_table(built.out_dir / "doclen")
        got_len = dict(zip(t["doc_id"].to_pylist(), t["doc_len"].to_pylist()))
        got_max = dict(zip(t["doc_id"].to_pylist(), t["max_tf"].to_pylist()))
        assert got_len == {d: v for d, v in oracle_idx.doc_len.items() if v > 0}
        assert got_max == {d: v for d, v in oracle_idx.max_tf.items() if v > 0}

    def test_df_exact(self, built, oracle_idx):
        t = pq.read_table(built.out_dir / "df")
        got = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        assert got == {t: len(p) for t, p in oracle_idx.postings.items()}

    def test_norms_match(self, built, oracle_idx):
        """The derived doc-stats/norms surface (stages/norms.py, the same
        computation the query actors run at load) matches the oracle."""
        from ir_search_engine_ray.stages.norms import salt_stats_table

        df_map = built.df_map()
        for f in built.shard_files():
            t = salt_stats_table(
                pq.read_table(f), df_map, built.N, built.avg_doc_len
            )
            for row_doc, dl, mx, nsq1, nsq2 in zip(
                t["doc_id"].to_pylist(),
                t["doc_len"].to_pylist(),
                t["max_tf"].to_pylist(),
                t["nsq1"].to_pylist(),
                t["nsq2"].to_pylist(),
            ):
                assert dl == oracle_idx.doc_len[row_doc]
                assert mx == oracle_idx.max_tf[row_doc]
                assert np.sqrt(nsq1) == pytest.approx(
                    oracle_idx.norms["w1"][row_doc], rel=1e-9
                )
                assert np.sqrt(nsq2) == pytest.approx(
                    oracle_idx.norms["w2"][row_doc], rel=1e-9
                )


class TestDeterminism:
    def test_repartitioned_shuffled_input_same_index(
        self, ray_session, corpus, built, tmp_path
    ):
        """Rows shuffled and split across 3 files + different batch size must
        yield the exact same posting lists (stable turn ordering)."""
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index

        t = pq.read_table(corpus / "transcripts")
        rng = np.random.default_rng(5)
        perm = rng.permutation(t.num_rows)
        shuffled = t.take(perm)
        splits = np.array_split(np.arange(t.num_rows), 3)
        in_dir = tmp_path / "shuffled"
        in_dir.mkdir()
        for i, idx in enumerate(splits):
            pq.write_table(shuffled.take(idx), in_dir / f"part-{i}.parquet")
        meta2 = build_index(
            str(in_dir),
            tmp_path / "idx2",
            IndexConfig(tokenize_batch_size=777),
            concurrency=2,
        )
        assert meta2.N == built.N
        assert _engine_postings(meta2.out_dir) == _engine_postings(built.out_dir)

    def test_duplicate_turn_key_rejected(self, ray_session, corpus, tmp_path):
        import pyarrow as pa

        from ir_search_engine_ray.pipelines.index_build import build_index

        t = pq.read_table(corpus / "transcripts")
        dup = pa.concat_tables([t, t.slice(0, 5)])
        pq.write_table(dup, tmp_path / "dup.parquet")
        with pytest.raises(ValueError, match="non-dense or duplicate"):
            build_index(str(tmp_path / "dup.parquet"), tmp_path / "idx_dup")


class TestRankIdentity:
    @pytest.mark.parametrize("scheme", ["w2", "w1"])
    def test_all_queries_all_algorithms(self, built, oracle_idx, corpus, scheme):
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.oracle import oracle_query

        eng = QueryEngine(built)
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        for qt in queries:
            want = oracle_query(oracle_idx, qt, scheme, 10)
            for alg in ("exhaustive", "maxscore", "block_max_wand"):
                got = eng.query(qt, scheme, 10, alg)
                assert [r["doc_id"] for r in got] == [d for d, _ in want], (qt, alg)
                assert np.allclose(
                    [r["score"] for r in got],
                    [s for _, s in want],
                    rtol=1e-9,
                    atol=1e-12,
                ), (qt, alg)

    def test_block_max_wand_multi_window_pruning(
        self, built, corpus, monkeypatch
    ):
        """With the default WINDOW the test corpus fits one block, so the
        pruning path never runs; shrink the window so every query crosses
        many blocks and assert all algorithms still agree exactly."""
        import ir_search_engine_ray.pipelines.query as qmod

        monkeypatch.setattr(qmod, "WINDOW", 64)  # 400 docs -> ~7 windows
        eng = qmod.QueryEngine(built, local=True)
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        for scheme in ("w2", "w1"):
            for k in (1, 3, 10):
                for qt in queries:
                    ex = eng.query(qt, scheme, k, "exhaustive")
                    for alg in ("maxscore", "block_max_wand"):
                        got = eng.query(qt, scheme, k, alg)
                        assert [r["doc_id"] for r in got] == [
                            r["doc_id"] for r in ex
                        ], (qt, alg, scheme, k)
                        assert np.allclose(
                            [r["score"] for r in got],
                            [r["score"] for r in ex],
                            rtol=1e-12,
                        )

    def test_empty_stopword_oov_queries(self, built):
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(built)
        assert eng.query("") == []
        assert eng.query("the of and by that") == []
        assert eng.query("zzyzxzzz qqqqqx") == []

    def test_explain_contributions_sum_to_score(self, built):
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(built)
        for scheme in ("w2", "w1"):
            rows = eng.explain("flow mach press therm heat", scheme, 5)
            assert rows
            for r in rows:
                assert sum(r["terms"].values()) == pytest.approx(
                    r["score"], rel=1e-9
                )
                assert all(v > 0 for v in r["terms"].values())

    def test_result_rows_carry_conv_keys(self, built, oracle_idx):
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(built)
        got = eng.query("flow mach press therm heat", "w2", 5)
        for r in got:
            assert oracle_idx.docmap[r["doc_id"]] == (r["conv_id"], r["turn_idx"])


class TestResume:
    def test_full_rebuild_is_noop(self, ray_session, built, corpus):
        from ir_search_engine_ray.pipelines.index_build import build_index

        shard = built.shard_files()[0]
        mtime = shard.stat().st_mtime_ns
        build_index(str(corpus / "transcripts"), OUT, concurrency=2)
        assert shard.stat().st_mtime_ns == mtime  # nothing rewritten

    def test_partial_shard_resume(self, ray_session, built, corpus):
        """Kill-mid-stage simulation: drop the chunks stage marker and one
        chunk (= serving shard) file; the resumed build must rewrite only
        the missing partition and end with an identical index."""
        from ir_search_engine_ray.pipelines.index_build import build_index

        shards = built.shard_files()
        victim, survivor = shards[0], shards[1]
        survivor_mtime = survivor.stat().st_mtime_ns
        before = pq.read_table(victim)
        (built.out_dir / "chunks" / "_SUCCESS").unlink()
        victim.unlink()
        build_index(str(corpus / "transcripts"), OUT, concurrency=2)
        marker = json.loads((built.out_dir / "chunks" / "_SUCCESS").read_text())
        by_salt = {m["salt"]: m for m in marker["chunks"]}
        assert by_salt[int(victim.stem[7:])]["skipped"] is False
        assert by_salt[int(survivor.stem[7:])]["skipped"] is True
        assert survivor.stat().st_mtime_ns == survivor_mtime
        after = pq.read_table(victim)
        assert before.equals(after)

    def test_blocks_partial_resume(self, ray_session, built, corpus):
        """Per-batch resume inside the tokenize stage: drop the stage marker
        and one run file; the rebuild re-tokenizes only the missing batch
        (other batches hit the doclen fast-path) and the index is
        unchanged."""
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index

        out = Path("/tmp/graft_test_blocks_resume")
        shutil.rmtree(out, ignore_errors=True)
        cfg = IndexConfig(tokenize_batch_size=128)
        build_index(str(corpus / "transcripts"), out, cfg, concurrency=2)
        blocks = sorted((out / "blocks").glob("block-*.arrow"))
        doclens = sorted((out / "doclen").glob("doclen-*.parquet"))
        assert len(blocks) > 1
        victim_b, victim_d = blocks[0], doclens[0]
        survivor = blocks[1]
        survivor_mtime = survivor.stat().st_mtime_ns
        postings_before = _engine_postings(out)
        (out / "blocks" / "_SUCCESS").unlink()
        victim_b.unlink()
        victim_d.unlink()
        # chunk markers must also re-run since runs were rewritten
        (out / "chunks" / "_SUCCESS").unlink()
        for f in sorted((out / "chunks").glob("chunk-s*.parquet")):
            f.unlink()
        build_index(str(corpus / "transcripts"), out, cfg, concurrency=2)
        assert survivor.stat().st_mtime_ns == survivor_mtime
        assert _engine_postings(out) == postings_before


class TestKillResume:
    def test_sigkill_mid_build_then_resume(self, ray_session, built, corpus, tmp_path):
        """Hard-kill a build subprocess mid-tokenize; resuming with the same
        config must skip the completed blocks and converge to the exact same
        index as an uninterrupted build (north rule: resumable from
        checkpoint with per-partition lineage)."""
        import json as _json
        import os
        import signal
        import subprocess
        import sys
        import time

        out = tmp_path / "killed_idx"
        script = (
            "import ray; ray.init(address='local', num_cpus=2, "
            "include_dashboard=False, logging_level='ERROR')\n"
            "from ir_search_engine_ray.config import IndexConfig\n"
            "from ir_search_engine_ray.pipelines.index_build import build_index\n"
            f"build_index({str(corpus / 'transcripts')!r}, {str(out)!r}, "
            "IndexConfig(tokenize_batch_size=64))\n"
        )
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        blocks = out / "blocks"
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if len(list(blocks.glob("block-*.arrow"))) >= 2:
                    break
                if proc.poll() is not None:
                    break  # finished before we could kill — still a valid run
                time.sleep(0.05)
            else:
                pytest.fail("subprocess build never produced blocks")
        finally:
            if proc.poll() is None:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()

        n_partial = len(list(blocks.glob("block-*.arrow")))
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index

        meta = build_index(
            str(corpus / "transcripts"),
            out,
            IndexConfig(tokenize_batch_size=64),
            concurrency=2,
        )
        assert _engine_postings(out) == _engine_postings(built.out_dir)
        assert meta.N == built.N
        man = _json.loads((blocks / "manifest.json").read_text())["files"]
        skipped_blocks = [m for m in man if m["kind"] == "block" and m["skipped"]]
        if n_partial:  # the kill landed mid-stage: completed runs were reused
            assert skipped_blocks


class TestDocIdAssignment:
    def test_unknown_conv_id_rejected(self, ray_session):
        import pyarrow as pa

        from ir_search_engine_ray.stages.docids import (
            assign_doc_ids,
            offsets_arrays,
        )

        batch = pa.table(
            {
                "conv_id": pa.array(["conv-a", "conv-MISSING"]),
                "turn_idx": pa.array([0, 1], type=pa.int32()),
                "text": pa.array(["x", "y"]),
            }
        )
        offs = offsets_arrays({"conv-a": 0})
        with pytest.raises(KeyError, match="conv-MISSING"):
            assign_doc_ids(batch, offsets_ref=offs)

    def test_dict_and_array_broadcast_agree(self, ray_session):
        import pyarrow as pa

        from ir_search_engine_ray.stages.docids import (
            assign_doc_ids,
            offsets_arrays,
        )

        offsets = {"a": 0, "b": 7, "c": 19}
        batch = pa.table(
            {
                "conv_id": pa.array(["b", "a", "c", "b"]),
                "turn_idx": pa.array([2, 0, 5, 0], type=pa.int32()),
                "text": pa.array(["", "", "", ""]),
            }
        )
        via_dict = assign_doc_ids(batch, offsets_ref=offsets)["doc_id"].to_pylist()
        via_arrays = assign_doc_ids(
            batch, offsets_ref=offsets_arrays(offsets)
        )["doc_id"].to_pylist()
        assert via_dict == via_arrays == [9, 0, 24, 7]


class TestReferenceQuerySet:
    def test_reference_queries_rank_identical(self, built, oracle_idx):
        """The reference repo's own 20-query set (hw.queries.formatted),
        run against the fixture corpus: engine == oracle, rank for rank,
        score for score, every algorithm (the north rule's rank-identity
        surface on the reference's query inputs)."""
        qfile = Path("/root/reference/hw.queries.formatted")
        if not qfile.exists():
            pytest.skip("reference checkout not present")
        from ir_search_engine_ray.oracle import oracle_query
        from ir_search_engine_ray.pipelines.query import QueryEngine

        queries = [q.strip() for q in qfile.read_text().splitlines() if q.strip()]
        assert len(queries) == 20
        eng = QueryEngine(built)
        n_nonempty = 0
        for scheme in ("w2", "w1"):
            for qt in queries:
                want = oracle_query(oracle_idx, qt, scheme, 10)
                n_nonempty += bool(want)
                for alg in ("exhaustive", "maxscore", "block_max_wand"):
                    got = eng.query(qt, scheme, 10, alg)
                    assert [r["doc_id"] for r in got] == [d for d, _ in want]
                    assert np.allclose(
                        [r["score"] for r in got],
                        [s for _, s in want],
                        rtol=1e-9,
                        atol=1e-12,
                    )
        # the aero-themed vocabulary overlaps the reference's aero queries,
        # so this must not be a vacuous all-empty comparison
        assert n_nonempty > 10


class TestPartitionedDfServing:
    def test_streamed_df_equals_broadcast_dict(
        self, ray_session, built, corpus, tmp_path
    ):
        """Serving actors stream only their local term ranges from the
        partitioned df table (stages/norms.py DfStore); forcing many tiny
        parts must change neither the loaded lexicon nor any score."""
        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine, ShardState
        from ir_search_engine_ray.stages.norms import DfStore

        meta = build_index(
            str(corpus / "transcripts"),
            tmp_path / "idx",
            IndexConfig(df_part_rows=16),
            concurrency=2,
        )
        df_dir = meta.out_dir / "df"
        assert len(list(df_dir.glob("part-*.parquet"))) > 10
        df_map = meta.df_map()
        files = [str(f) for f in meta.shard_files()][:2]
        via_dict = ShardState(files, df_map, meta.N, meta.avg_doc_len)
        via_path = ShardState(files, str(df_dir), meta.N, meta.avg_doc_len)
        # the streamed shard loaded exactly its local lexicon, not the vocab
        assert via_path.df_local_size == len(via_path.terms)
        assert set(via_path.terms) == set(via_dict.terms)
        for term in via_dict.terms:
            np.testing.assert_array_equal(
                via_dict.terms[term].ids, via_path.terms[term].ids
            )
            for s in ("w1", "w2"):
                np.testing.assert_array_equal(
                    via_dict.terms[term].wn[s], via_path.terms[term].wn[s]
                )
        # end to end through the actor pool (actors get the df DIR)
        eng = QueryEngine(meta, QueryConfig(num_actors=2))
        local = QueryEngine(meta, QueryConfig(num_actors=2), local=True)
        sizes = [
            __import__("ray").get(a.df_local_size.remote()) for a in eng.actors
        ]
        assert all(0 < s <= meta.n_terms for s in sizes)
        for qt in ("flow mach wing", "pressure boundary layer", "the of"):
            assert eng.query(qt) == local.query(qt)


class TestHierarchicalOffsets:
    def test_hierarchical_equals_fast_path(self, ray_session, corpus, tmp_path):
        """Forcing the range-partitioned offsets path (threshold 0) must
        produce a bit-identical convs table AND a bit-identical index."""
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.sources.transcripts import read_transcripts
        from ir_search_engine_ray.stages.docids import conversation_offsets_table

        src = str(corpus / "transcripts")
        ds = read_transcripts(src, columns=["conv_id", "turn_idx"])
        fast = conversation_offsets_table(ds, hierarchical=False)
        hier = conversation_offsets_table(ds, hierarchical=True)
        assert fast.equals(hier.combine_chunks().cast(fast.schema))

        m_fast = build_index(
            src, tmp_path / "fast", IndexConfig(offsets_hierarchical=False)
        )
        m_hier = build_index(
            src, tmp_path / "hier", IndexConfig(offsets_hierarchical=True)
        )
        assert _engine_postings(m_fast.out_dir) == _engine_postings(m_hier.out_dir)

    def test_hierarchical_validates_density(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ir_search_engine_ray.stages.docids import conversation_offsets_table

        t = pa.table(
            {
                "conv_id": pa.array(["a", "a", "b"]),
                "turn_idx": pa.array([0, 2, 0], type=pa.int32()),
            }
        )
        with pytest.raises(Exception, match="non-dense|duplicate"):
            conversation_offsets_table(
                ray.data.from_arrow(t), hierarchical=True
            )


class TestJsonlSource:
    def test_jsonl_roundtrip_build_query(self, ray_session, tmp_path):
        """JSONL shards -> transcripts parquet -> build -> query; conv_ids
        are shard:row when no id field is given, shard-order-stable."""
        import json as _json

        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.sources.transcripts import (
            jsonl_to_transcripts,
        )

        src = tmp_path / "shards"
        src.mkdir()
        (src / "a.jsonl").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"text": "boundary layer flow study", "extra": 1},
                    {"text": "heat transfer in nozzles"},
                ]
            )
        )
        (src / "b.jsonl").write_text(
            _json.dumps({"text": "mach number effects on wing flow"})
        )
        out = jsonl_to_transcripts(src, tmp_path / "transcripts")

        import pyarrow.parquet as pq

        t = pq.read_table(out).sort_by("conv_id")
        assert t["conv_id"].to_pylist() == [
            "a.jsonl:0",
            "a.jsonl:1",
            "b.jsonl:0",
        ]

        meta = build_index(out, tmp_path / "idx", IndexConfig())
        assert meta.N == 3
        eng = QueryEngine(meta, QueryConfig(num_actors=1))
        got = eng.query("boundary layer")
        assert got and got[0]["conv_id"] == "a.jsonl:0"

    def test_jsonl_id_field_and_missing_text(self, ray_session, tmp_path):
        import json as _json

        import pytest

        from ir_search_engine_ray.sources.transcripts import (
            jsonl_to_transcripts,
        )

        f = tmp_path / "c.jsonl"
        f.write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"url": "u1", "content": "alpha beta"},
                    {"url": "u2", "content": "gamma delta"},
                ]
            )
        )
        out = jsonl_to_transcripts(
            f,
            tmp_path / "t1",
            text_field="content",
            id_field="url",
        )
        import pyarrow.parquet as pq

        t = pq.read_table(out).sort_by("conv_id")
        assert t["conv_id"].to_pylist() == ["u1", "u2"]
        assert t["text"].to_pylist() == ["alpha beta", "gamma delta"]

        with pytest.raises(Exception, match="lack the 'text'"):
            jsonl_to_transcripts(f, tmp_path / "t2")


class TestDocsDirSource:
    def test_docs_dir_roundtrip_build_query(self, ray_session, tmp_path):
        """Reference-style corpus: a dir of one-doc-per-file SGML files ->
        transcripts parquet -> full build -> query; doc_ids enumerate files
        in sorted-name order like the reference's filename sort."""
        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.sources.transcripts import (
            docs_dir_to_transcripts,
        )

        docs = {
            "cranfield0001": "<TITLE>boundary layer flow</TITLE> experimental study of flow",
            "cranfield0002": "<TEXT>heat transfer in supersonic nozzles</TEXT>",
            "cranfield0003": "the mach number effects on wing flow",
        }
        src = tmp_path / "corpus"
        src.mkdir()
        for name, text in docs.items():
            (src / name).write_text(text)
        out = docs_dir_to_transcripts(src, tmp_path / "transcripts")

        import pyarrow.parquet as pq

        t = pq.read_table(out).sort_by("conv_id")
        assert t["conv_id"].to_pylist() == sorted(docs)
        assert t["turn_idx"].to_pylist() == [0, 0, 0]

        meta = build_index(out, tmp_path / "idx", IndexConfig())
        assert meta.N == 3
        eng = QueryEngine(meta, QueryConfig(num_actors=1))
        got = eng.query("boundary layer")
        assert got and got[0]["conv_id"] == "cranfield0001"
        # tags were stripped by the tokenizer, not indexed as terms
        assert eng.query("TITLE") == [] and eng.query("text") == []
        assert eng.query("mach")[0]["conv_id"] == "cranfield0003"
        # the reference's integer-division idf quirk: df=2 of N=3 docs ->
        # ln(3 // 2) = 0 -> the term carries zero weight, no results
        assert eng.query("flow", k=3) == []


class TestStreamedDfParse:
    def test_no_driver_df_table_same_results(self, ray_session, built):
        """df_in_memory=False: the driver resolves only queried terms from
        the partitioned df parquet — results identical, including OOV and
        all-stopword queries."""
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines.query import QueryEngine

        mem = QueryEngine(built, QueryConfig(num_actors=2))
        stream = QueryEngine(
            built, QueryConfig(num_actors=2, df_in_memory=False)
        )
        assert stream.df_map is None
        for qt in (
            "flow mach wing",
            "pressure boundary layer",
            "zzzqxv unknownterm",
            "the of and",
            "",
        ):
            assert stream.query(qt) == mem.query(qt)
        # the memo holds only queried terms, never the vocabulary
        assert 0 < len(stream._df_cache) < built.n_terms


class TestStreamedConvOffsets:
    def test_streamed_resolver_same_results(
        self, ray_session, built, corpus, tmp_path
    ):
        """offsets_in_memory=False: top-k doc_ids resolve to conversation
        keys via footer-pruned row-group reads of convs.parquet — results
        identical to the in-memory path (VERDICT r2 "what's wrong #3"
        done-condition: threshold forced to streaming)."""
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines.index_build import IndexMeta
        from ir_search_engine_ray.pipelines.query import QueryEngine

        # rewrite convs.parquet with tiny row groups so pruning is real
        idx = tmp_path / "idx"
        shutil.copytree(built.out_dir, idx)
        convs = pq.read_table(idx / "convs.parquet")
        (idx / "convs.parquet").unlink()
        pq.write_table(convs, idx / "convs.parquet", row_group_size=3)
        n_groups = pq.read_metadata(idx / "convs.parquet").num_row_groups
        assert n_groups > 2
        meta = IndexMeta.load(idx)

        mem = QueryEngine(built, QueryConfig(num_actors=2))
        stream = QueryEngine(
            meta, QueryConfig(num_actors=2, offsets_in_memory=False)
        )
        assert not stream._resolver.in_memory
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        any_rows = False
        for qt in queries[:6]:
            got = stream.query(qt)
            assert got == mem.query(qt)
            any_rows = any_rows or bool(got)
        assert any_rows
        # the resolver held only the touched row groups, never the table
        assert 0 < len(stream._resolver._cache) <= n_groups

        # phrase search: the broadcast offsets pair is restricted to the
        # candidate conversations and built via conv_id row-group lookups
        t = pq.read_table(corpus / "transcripts")
        phrase = " ".join(t["text"][0].as_py().split()[:3])
        assert stream.phrase_query(phrase) == mem.phrase_query(phrase)

    def test_resolver_modes_agree_exhaustively(self, ray_session, built, tmp_path):
        """Every doc_id resolves identically in both modes, and
        pair_for_convs round-trips every conversation."""
        import numpy as np

        from ir_search_engine_ray.stages.convmap import ConvResolver

        src = built.out_dir / "convs.parquet"
        convs = pq.read_table(src)
        small = tmp_path / "convs.parquet"
        pq.write_table(convs, small, row_group_size=8)
        mem = ConvResolver(src, in_memory=True)
        stream = ConvResolver(small, in_memory=False)
        all_docs = np.arange(built.N, dtype=np.int64)
        rng = np.random.default_rng(7)
        rng.shuffle(all_docs)
        c1, t1 = mem.resolve(all_docs)
        c2, t2 = stream.resolve(all_docs)
        assert c1 == c2
        assert (t1 == t2).all()
        all_convs = convs["conv_id"].to_pylist()
        a1, b1 = mem.pair_for_convs(all_convs)
        a2, b2 = stream.pair_for_convs(all_convs)
        assert a1 == a2
        assert (b1 == b2).all()
        with pytest.raises(KeyError):
            stream.pair_for_convs(["__not_a_conv__"])


class TestDistributedDfCombine:
    def test_distributed_df_equals_driver_combine(
        self, ray_session, built, corpus, tmp_path
    ):
        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine

        meta = build_index(
            str(corpus / "transcripts"),
            tmp_path / "idx",
            IndexConfig(df_distributed=True),
            concurrency=2,
        )
        assert meta.df_map() == built.df_map()
        assert meta.n_terms == built.n_terms
        # ranges sidecar present and consistent with the parts
        import json

        ranges = json.loads((meta.out_dir / "df" / "_ranges.json").read_text())
        files = sorted((meta.out_dir / "df").glob("part-*.parquet"))
        assert {f.name for f in files} == set(ranges)
        eng = QueryEngine(meta, QueryConfig(num_actors=2))
        base = QueryEngine(built, QueryConfig(num_actors=2))
        for qt in ("flow mach wing", "pressure boundary layer"):
            assert eng.query(qt) == base.query(qt)


class TestSaltInvariance:
    def test_salt_buckets_do_not_change_results(
        self, ray_session, built, corpus, tmp_path
    ):
        """salt_buckets is a layout/parallelism knob: different values must
        yield identical posting lists and identical query results."""
        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine

        meta4 = build_index(
            str(corpus / "transcripts"),
            tmp_path / "s4",
            IndexConfig(salt_buckets=4),
            concurrency=2,
        )
        assert meta4.salt_buckets != built.salt_buckets
        assert _engine_postings(meta4.out_dir) == _engine_postings(built.out_dir)
        e4 = QueryEngine(meta4, QueryConfig(num_actors=2))
        e_base = QueryEngine(built, QueryConfig(num_actors=2))
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        for qt in queries[:8]:
            for scheme in ("w2", "w1"):
                assert e4.query(qt, scheme) == e_base.query(qt, scheme), (
                    qt,
                    scheme,
                )


class TestPhraseQuery:
    def test_phrase_matches_only_contiguous(self, ray_session, tmp_path):
        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.sources.transcripts import (
            docs_dir_to_transcripts,
        )

        docs = {
            "doc1": "alpha turbine blade resonance beta",
            "doc2": "turbine resonance with a blade somewhere",  # words, not phrase
            "doc3": "spinning turbine blade resonance observed",
            "doc4": "nothing related here at all",
        }
        # filler keeps N/df > 1 so the reference idf quirk (ln(N//df)=0)
        # does not zero the phrase terms on this tiny corpus
        for i in range(8):
            docs[f"fill{i}"] = f"unrelated filler text number {i} aero engine"
        src = tmp_path / "corpus"
        src.mkdir()
        for name, text in docs.items():
            (src / name).write_text(text)
        out = docs_dir_to_transcripts(src, tmp_path / "transcripts")
        meta = build_index(out, tmp_path / "idx", IndexConfig())
        eng = QueryEngine(meta, QueryConfig(num_actors=2))
        got = eng.phrase_query("turbine blade resonance")
        names = {r["conv_id"] for r in got}
        assert names == {"doc1", "doc3"}
        # bag query (no phrase) also surfaces doc2
        bag = {r["conv_id"] for r in eng.query("turbine blade resonance")}
        assert "doc2" in bag
        # full-mode normalization applies: plural form matches via Porter
        got2 = eng.phrase_query("turbine blades resonance")
        assert {r["conv_id"] for r in got2} == {"doc1", "doc3"}
        # single-term and no-match phrases
        assert eng.phrase_query("resonance")
        assert eng.phrase_query("alpha beta") == []
        # phrase scores equal the bag scores for the matching docs
        by_doc = {r["conv_id"]: r["score"] for r in eng.query(
            "turbine blade resonance", k=10)}
        for r in got:
            assert r["score"] == pytest.approx(by_doc[r["conv_id"]], rel=1e-12)

    def test_boolean_query(self, ray_session, built, corpus):
        """MUST/NOT semantics: results contain every must term, none of the
        excluded terms, and score exactly like the must bag."""
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(built)
        got = eng.boolean_query("flow", "wing", k=30)
        assert got
        bag = {r["doc_id"]: r["score"] for r in eng.query("flow", k=30000)}
        excluded = {r["doc_id"] for r in eng.query("wing", k=30000)}
        for r in got:
            assert r["doc_id"] in bag
            assert r["doc_id"] not in excluded
            assert r["score"] == pytest.approx(bag[r["doc_id"]], rel=1e-12)
        # empty must / fully-excluded cases
        assert eng.boolean_query("", "flow") == []
        assert eng.boolean_query("flow", "flow") == []


class TestScalePathResume:
    def test_kill_resume_with_hier_offsets_and_distributed_df(
        self, ray_session, built, corpus, tmp_path
    ):
        """The round's scale paths (hierarchical conversation offsets +
        distributed df combine) must resume from a SIGKILL exactly like the
        defaults and converge to the identical index."""
        import os
        import signal
        import subprocess
        import sys
        import time

        out = tmp_path / "killed_scale_idx"
        cfg = (
            "IndexConfig(tokenize_batch_size=64, offsets_hierarchical=True, "
            "df_distributed=True)"
        )
        script = (
            "import ray; ray.init(address='local', num_cpus=2, "
            "include_dashboard=False, logging_level='ERROR')\n"
            "from ir_search_engine_ray.config import IndexConfig\n"
            "from ir_search_engine_ray.pipelines.index_build import build_index\n"
            f"build_index({str(corpus / 'transcripts')!r}, {str(out)!r}, {cfg})\n"
        )
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        blocks = out / "blocks"
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if len(list(blocks.glob("block-*.arrow"))) >= 2:
                    break
                if proc.poll() is not None:
                    break
                time.sleep(0.05)
            else:
                pytest.fail("subprocess build never produced blocks")
        finally:
            if proc.poll() is None:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()

        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index

        meta = build_index(
            str(corpus / "transcripts"),
            out,
            IndexConfig(
                tokenize_batch_size=64,
                offsets_hierarchical=True,
                df_distributed=True,
            ),
            concurrency=2,
        )
        assert meta.N == built.N
        assert _engine_postings(out) == _engine_postings(built.out_dir)
        assert meta.df_map() == built.df_map()


class TestAppend:
    """Incremental append (append_index): delta-cost extension of an index.

    Byte-identity contract: under the append constraints (new conversations
    only, conv_ids sorting after the indexed ones) the appended index's
    chunks/ and df/ are byte-identical to a one-shot build of the full
    corpus pinned to the original salt range size."""

    @pytest.fixture(scope="class")
    def split_corpus(self, corpus, tmp_path_factory):
        """The fixture transcripts split into three conv-ordered slices."""
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("append_corpus")
        t = pq.read_table(corpus / "transcripts")
        convs = sorted(set(t["conv_id"].to_pylist()))
        cuts = [convs[: len(convs) // 2], convs[len(convs) // 2 : -2], convs[-2:]]
        dirs = []
        for i, chunk in enumerate(cuts):
            d = root / f"slice{i}"
            d.mkdir()
            import pyarrow.compute as pc

            part = t.filter(pc.is_in(t["conv_id"], value_set=pa.array(chunk)))
            pq.write_table(part, d / "part-00000.parquet")
            dirs.append(d)
        return root, dirs

    def _bytes(self, d: Path) -> dict[str, bytes]:
        return {
            f.name: f.read_bytes()
            for f in sorted(d.glob("*.parquet"))
        }

    def test_append_matches_oneshot_bytes(
        self, ray_session, split_corpus, tmp_path
    ):
        import pyarrow.parquet as pq

        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import (
            append_index,
            build_index,
        )

        root, dirs = split_corpus
        inc = tmp_path / "inc"
        m0 = build_index(str(dirs[0]), inc, concurrency=2)
        m1 = build_index(str(dirs[1]), inc, concurrency=2, append=True)
        assert m1.N > m0.N
        assert m1.range_size == m0.range_size
        m2 = append_index(str(dirs[2]), inc, concurrency=2)
        assert m2.N > m1.N

        # one-shot over all three slices, salt layout pinned to the first
        # build's range size
        full_dir = tmp_path / "full_in"
        full_dir.mkdir()
        for i, d in enumerate(dirs):
            (full_dir / f"part-{i:05d}.parquet").symlink_to(
                d / "part-00000.parquet"
            )
        one = tmp_path / "oneshot"
        mo = build_index(
            str(full_dir),
            one,
            IndexConfig(range_size_override=m0.range_size),
            concurrency=2,
        )
        assert (m2.N, m2.n_terms, m2.n_postings, m2.total_doc_len) == (
            mo.N,
            mo.n_terms,
            mo.n_postings,
            mo.total_doc_len,
        )
        assert self._bytes(inc / "chunks") == self._bytes(one / "chunks")
        assert self._bytes(inc / "df") == self._bytes(one / "df")
        assert (inc / "df" / "_ranges.json").read_text() == (
            one / "df" / "_ranges.json"
        ).read_text()
        # conv table logically identical (written in two shapes)
        ti = pq.read_table(inc / "convs.parquet")
        to = pq.read_table(one / "convs.parquet")
        assert ti.combine_chunks().equals(to.combine_chunks())

        # serving equivalence on top of byte identity
        from ir_search_engine_ray.pipelines.query import QueryEngine

        qi = QueryEngine(m2, local=True)
        qo = QueryEngine(mo, local=True)
        for text in ("flow mach number", "boundary layer", "experimental"):
            assert qi.query(text, k=5) == qo.query(text, k=5)

    def test_append_is_idempotent(self, ray_session, split_corpus, tmp_path):
        from ir_search_engine_ray.pipelines.index_build import (
            append_index,
            build_index,
        )

        root, dirs = split_corpus
        out = tmp_path / "idx"
        build_index(str(dirs[0]), out, concurrency=2)
        m1 = append_index(str(dirs[1]), out, concurrency=2)
        chunks1 = self._bytes(out / "chunks")
        # same delta again: no new files -> no-op
        m2 = append_index(str(dirs[1]), out, concurrency=2)
        assert m2.N == m1.N
        assert self._bytes(out / "chunks") == chunks1

    def test_append_rejects_interleaved_convs(
        self, ray_session, split_corpus, tmp_path
    ):
        from ir_search_engine_ray.pipelines.index_build import (
            append_index,
            build_index,
        )

        root, dirs = split_corpus
        out = tmp_path / "idx"
        # index the MIDDLE slice; appending the first (conv_ids sort before)
        # must be refused — doc_id is the global (conv_id, turn_idx) rank
        build_index(str(dirs[1]), out, concurrency=2)
        with pytest.raises(ValueError, match="sort after"):
            append_index(str(dirs[0]), out, concurrency=2)

    def test_append_rejects_existing_conversation(
        self, ray_session, split_corpus, tmp_path
    ):
        import pyarrow.parquet as pq

        from ir_search_engine_ray.pipelines.index_build import (
            append_index,
            build_index,
        )

        root, dirs = split_corpus
        out = tmp_path / "idx"
        build_index(str(dirs[0]), out, concurrency=2)
        # re-ship slice0's rows under a different file name: same conv_ids
        dup = tmp_path / "dup_in"
        dup.mkdir()
        t = pq.read_table(dirs[0] / "part-00000.parquet")
        pq.write_table(t, dup / "part-99999.parquet")
        with pytest.raises(ValueError, match="sort after"):
            append_index(str(dup), out, concurrency=2)

    def test_append_crash_recovery_checks_delta(
        self, ray_session, split_corpus, tmp_path, monkeypatch
    ):
        """A crash between the convs.parquet commit (os.replace) and the
        stage marker leaves the table extended; a retry with a DIFFERENT
        delta must be refused loudly (the _STARTED record pins the delta —
        ADVICE r3), while a retry with the SAME delta completes and matches
        a clean append."""
        from ir_search_engine_ray.pipelines import index_build

        root, dirs = split_corpus
        out = tmp_path / "idx"
        index_build.build_index(str(dirs[0]), out, concurrency=2)

        real = index_build.mark_stage_complete
        calls = {"n": 0}

        def boom(stage_dir, fp, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("simulated crash after convs commit")
            return real(stage_dir, fp, **kw)

        monkeypatch.setattr(index_build, "mark_stage_complete", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            index_build.append_index(str(dirs[1]), out, concurrency=2)
        monkeypatch.setattr(index_build, "mark_stage_complete", real)
        # convs.parquet is extended but the stage has no marker for the
        # append's fingerprint (the build's own marker may still be there)
        from ir_search_engine_ray.state.manifest import stage_complete

        started = json.loads(
            (out / "stage_convs" / "_STARTED").read_text()
        )["fingerprint"]
        assert stage_complete(out / "stage_convs", started) is None

        # a retry with a DIFFERENT delta must not silently reuse the table
        with pytest.raises(ValueError, match="different delta"):
            index_build.append_index(str(dirs[2]), out, concurrency=2)

        # the ORIGINAL delta resumes cleanly and matches an uncrashed append
        m = index_build.append_index(str(dirs[1]), out, concurrency=2)
        clean = tmp_path / "clean"
        index_build.build_index(str(dirs[0]), clean, concurrency=2)
        mc = index_build.append_index(str(dirs[1]), clean, concurrency=2)
        assert (m.N, m.n_terms, m.n_postings) == (mc.N, mc.n_terms, mc.n_postings)
        assert self._bytes(out / "chunks") == self._bytes(clean / "chunks")


class TestLemmaMode:
    """mode='full_lemma': the reference's lemma-index behavior
    (``index/Indexer.java:82-103`` with useStemming off) via the
    deterministic rule lemmatizer — distributed build, query serving and
    pure-Python oracle all share the pipeline."""

    def test_lemma_build_rank_identity(self, ray_session, corpus, tmp_path):
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.oracle import build_oracle_index, oracle_query
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine

        meta = build_index(
            str(corpus / "transcripts"),
            tmp_path / "idx",
            IndexConfig(mode="full_lemma"),
            concurrency=2,
        )
        assert meta.mode == "full_lemma"
        t = pq.read_table(corpus / "transcripts")
        rows = list(
            zip(
                t["conv_id"].to_pylist(),
                t["turn_idx"].to_pylist(),
                t["text"].to_pylist(),
            )
        )
        oidx = build_oracle_index(rows, "full_lemma")
        eng = QueryEngine(meta)
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        for qt in queries[:8]:
            want = oracle_query(oidx, qt, "w2", 10)
            got = eng.query(qt, "w2", 10)
            assert [r["doc_id"] for r in got] == [d for d, _ in want], qt
            assert np.allclose(
                [r["score"] for r in got], [s for _, s in want], rtol=1e-9
            ), qt

    def test_lemma_index_differs_from_stemmed(self, ray_session, corpus, tmp_path, built):
        """A lemma index is a different artifact than a Porter index — the
        reference user's useStemming switch changes the on-disk terms."""
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index

        meta = build_index(
            str(corpus / "transcripts"),
            tmp_path / "idx2",
            IndexConfig(mode="full_lemma"),
            concurrency=2,
        )
        lemma_terms = set(_engine_postings(meta.out_dir))
        stem_terms = set(_engine_postings(built.out_dir))
        assert lemma_terms != stem_terms
        # lemma terms are real surface lemmas, not Porter truncations
        assert not {t for t in lemma_terms if t.endswith(("studi", "famili"))}


class TestFilteredQuery:
    """Metadata-filtered retrieval via the attrs sidecar
    (IndexConfig(attr_cols=...) + QueryEngine.query(filters=...))."""

    @pytest.fixture(scope="class")
    def attr_built(self, ray_session, corpus, tmp_path_factory):
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index

        out = tmp_path_factory.mktemp("attr_idx") / "idx"
        return build_index(
            str(corpus / "transcripts"),
            out,
            IndexConfig(attr_cols=("role", "tool")),
            concurrency=2,
        )

    @pytest.fixture(scope="class")
    def doc_attrs(self, corpus):
        """doc_id -> (role, tool) under the global (conv_id, turn_idx) order."""
        t = pq.read_table(
            corpus / "transcripts",
            columns=["conv_id", "turn_idx", "role", "tool"],
        ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        return list(zip(t["role"].to_pylist(), t["tool"].to_pylist()))

    def test_filtered_equals_postfiltered_full_ranking(
        self, ray_session, attr_built, corpus, doc_attrs
    ):
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(attr_built, local=True)
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        for qt in queries[:6]:
            full = eng.query(qt, "w2", attr_built.N, "exhaustive")
            for filters, pred in [
                ({"role": "user"}, lambda a: a[0] == "user"),
                ({"tool": ["search", "calculator"]},
                 lambda a: a[1] in ("search", "calculator")),
                ({"role": ["assistant", "tool"], "tool": "search"},
                 lambda a: a[0] in ("assistant", "tool") and a[1] == "search"),
            ]:
                got = eng.query(qt, "w2", 10, filters=filters)
                want = [r for r in full if pred(doc_attrs[r["doc_id"]])][:10]
                assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want], (qt, filters)
                assert np.allclose(
                    [g["score"] for g in got], [w["score"] for w in want]
                ), (qt, filters)

    def test_filtered_pruned_algorithms_match_exhaustive(
        self, ray_session, attr_built, corpus
    ):
        """Filter-aware pruning (round 5): maxscore and block-max WAND under
        filters recompute their bounds over the masked postings, so the
        filtered top-k must be IDENTICAL to exhaustive masked scoring."""
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(attr_built, local=True)
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        for qt in queries[:6]:
            for filters in [
                {"role": "user"},
                {"tool": ["search", "calculator"]},
                {"role": ["assistant", "tool"], "tool": "search"},
            ]:
                base = eng.query(qt, "w2", 10, "exhaustive", filters=filters)
                for algo in ("maxscore", "block_max_wand"):
                    got = eng.query(qt, "w2", 10, algo, filters=filters)
                    assert got == base, (qt, filters, algo)

    def test_actor_path_matches_local(self, ray_session, attr_built, corpus):
        from ir_search_engine_ray.config import QueryConfig
        from ir_search_engine_ray.pipelines.query import QueryEngine

        cfg = QueryConfig(num_actors=2)
        loc = QueryEngine(attr_built, cfg, local=True)
        act = QueryEngine(attr_built, cfg)
        qt = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()[0]
        f = {"role": "user"}
        assert loc.query(qt, "w2", 10, filters=f) == act.query(
            qt, "w2", 10, filters=f
        )

    def test_unattributed_index_raises(self, ray_session, built, corpus):
        from ir_search_engine_ray.pipelines.query import QueryEngine

        eng = QueryEngine(built, local=True)
        qt = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()[0]
        with pytest.raises(Exception, match="attrs sidecar"):
            eng.query(qt, "w2", 10, filters={"role": "user"})


class TestAppendWithAttrs:
    def test_append_extends_attr_sidecar(self, ray_session, corpus, tmp_path):
        """An appended index with attr_cols keeps filtered retrieval exact
        over the FULL doc range (old + new)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine

        t = pq.read_table(corpus / "transcripts")
        convs = sorted(set(t["conv_id"].to_pylist()))
        half = convs[: len(convs) // 2]
        a_dir, b_dir = tmp_path / "a", tmp_path / "b"
        for d, keep in ((a_dir, half), (b_dir, convs[len(convs) // 2:])):
            d.mkdir()
            pq.write_table(
                t.filter(pc.is_in(t["conv_id"], value_set=pa.array(keep))),
                d / "part.parquet",
            )
        out = tmp_path / "idx"
        m0 = build_index(
            str(a_dir), out, IndexConfig(attr_cols=("role",)), concurrency=2
        )
        m1 = build_index(str(b_dir), out, concurrency=2, append=True)
        assert m1.N > m0.N

        # one-shot reference with the same pinned salt layout
        full = tmp_path / "full_in"
        full.mkdir()
        (full / "pa.parquet").symlink_to(a_dir / "part.parquet")
        (full / "pb.parquet").symlink_to(b_dir / "part.parquet")
        mo = build_index(
            str(full),
            tmp_path / "oneshot",
            IndexConfig(
                attr_cols=("role",), range_size_override=m0.range_size
            ),
            concurrency=2,
        )
        qa = QueryEngine(m1, local=True)
        qo = QueryEngine(mo, local=True)
        any_hits = False
        for text in ("flow mach number", "experimental results"):
            got = qa.query(text, "w2", 10, filters={"role": "user"})
            want = qo.query(text, "w2", 10, filters={"role": "user"})
            assert got == want
            any_hits = any_hits or bool(got)
        assert any_hits  # the sidecar actually admits user-turn docs


class TestFilteredPhraseBoolean:
    def test_phrase_and_boolean_respect_filters(self, ray_session, corpus, tmp_path):
        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine

        meta = build_index(
            str(corpus / "transcripts"),
            tmp_path / "idx",
            IndexConfig(attr_cols=("role",)),
            concurrency=2,
        )
        t = pq.read_table(
            corpus / "transcripts",
            columns=["conv_id", "turn_idx", "role"],
        ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        roles = t["role"].to_pylist()
        eng = QueryEngine(meta, local=True)

        # pick a phrase that verifies somewhere: reuse a 2-token run from a
        # mid-corpus doc's token stream
        from ir_search_engine_ray.textproc import TokenPipeline

        pipe = TokenPipeline("full")
        texts = pq.read_table(corpus / "transcripts", columns=["text"])
        phrase = None
        for txt in texts["text"].to_pylist():
            toks = pipe(txt)
            if len(toks) >= 4:
                phrase = " ".join(toks[1:3])
                break
        assert phrase
        full = eng.phrase_query(phrase, "w2", meta.N)
        filt = eng.phrase_query(phrase, "w2", 10, filters={"role": "user"})
        want = [r for r in full if roles[r["doc_id"]] == "user"][:10]
        assert [r["doc_id"] for r in filt] == [r["doc_id"] for r in want]

        fullb = eng.boolean_query("flow", "", "w2", meta.N)
        filtb = eng.boolean_query("flow", "", "w2", 10, filters={"role": "user"})
        wantb = [r for r in fullb if roles[r["doc_id"]] == "user"][:10]
        assert [r["doc_id"] for r in filtb] == [r["doc_id"] for r in wantb]
        assert all(roles[r["doc_id"]] == "user" for r in filtb)


class TestAttrsResume:
    def test_sigkill_mid_attrs_then_resume(self, ray_session, corpus, tmp_path):
        """Kill a build during/after the attrs stage; resuming must produce
        a complete, exact sidecar (every doc_id present once) and filtered
        queries identical to an uninterrupted attrs build."""
        import os
        import signal
        import subprocess
        import sys
        import time

        from ir_search_engine_ray.config import IndexConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine

        out = tmp_path / "killed_attr_idx"
        script = (
            "import ray; ray.init(address='local', num_cpus=2, "
            "include_dashboard=False, logging_level='ERROR')\n"
            "from ir_search_engine_ray.config import IndexConfig\n"
            "from ir_search_engine_ray.pipelines.index_build import build_index\n"
            f"build_index({str(corpus / 'transcripts')!r}, {str(out)!r}, "
            "IndexConfig(tokenize_batch_size=64, attr_cols=('role',)))\n"
        )
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        attrs = out / "attrs"
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if len(list(attrs.glob("attr-d*.parquet"))) >= 1:
                    break
                if proc.poll() is not None:
                    break
                time.sleep(0.05)
        finally:
            if proc.poll() is None:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()

        meta = build_index(
            str(corpus / "transcripts"),
            out,
            IndexConfig(tokenize_batch_size=64, attr_cols=("role",)),
            concurrency=2,
        )
        # sidecar complete and exact: every doc exactly once
        t = pq.read_table(attrs)
        ids = np.sort(t["doc_id"].to_numpy())
        assert ids.tolist() == list(range(meta.N))

        ref = build_index(
            str(corpus / "transcripts"),
            tmp_path / "clean_idx",
            IndexConfig(tokenize_batch_size=64, attr_cols=("role",)),
            concurrency=2,
        )
        qa = QueryEngine(meta, local=True)
        qb = QueryEngine(ref, local=True)
        queries = pq.read_table(corpus / "queries.parquet")["text"].to_pylist()
        for qt in queries[:4]:
            assert qa.query(qt, "w2", 10, filters={"role": "user"}) == qb.query(
                qt, "w2", 10, filters={"role": "user"}
            )


class TestResolverProgressGuard:
    def test_pair_for_convs_bad_hints_still_resolve(
        self, ray_session, built, tmp_path
    ):
        """pair_for_convs with a pathological (non-monotone) min-conv hint
        array — the shape missing row-group statistics produce — must still
        resolve every key (linear walk right instead of looping on the same
        group forever; ADVICE r3) and still KeyError on a missing key."""
        from ir_search_engine_ray.stages.convmap import ConvResolver

        src = built.out_dir / "convs.parquet"
        convs_tbl = pq.read_table(src)
        small = tmp_path / "convs.parquet"
        pq.write_table(convs_tbl, small, row_group_size=4)
        res = ConvResolver(small, in_memory=False)
        assert not res.in_memory and len(res._rg_conv_min) >= 3

        want = ConvResolver(src, in_memory=True)
        all_convs = convs_tbl["conv_id"].to_pylist()
        a_want, b_want = want.pair_for_convs(all_convs)

        # poison every hint after the first: the binary search now lands on
        # row group 0 for every key, the step-back guard cannot help, and
        # only the no-progress walk right reaches the true group
        res._rg_conv_min = [res._rg_conv_min[0]] + ["\U0010ffff"] * (
            len(res._rg_conv_min) - 1
        )
        a_got, b_got = res.pair_for_convs(all_convs)
        assert a_got == a_want
        assert (b_got == b_want).all()

        with pytest.raises(KeyError):
            res.pair_for_convs(["\U0010fffe_not_a_conv"])


class TestFuzzyQueryExpansion:
    def test_oov_rewrite_matches_corrected_query(
        self, ray_session, tmp_path
    ):
        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.sources.transcripts import (
            docs_dir_to_transcripts,
        )

        docs = {
            "doc1": "spanwise pressure measurement on the turbine housing",
            "doc2": "pressure rises across the spanwise station rows",
            "doc3": "nothing related in this one at all honestly",
        }
        for i in range(8):
            docs[f"fill{i}"] = f"unrelated filler text number {i} aero rig"
        src = tmp_path / "corpus"
        src.mkdir()
        for name, text in docs.items():
            (src / name).write_text(text)
        out = docs_dir_to_transcripts(src, tmp_path / "transcripts")
        meta = build_index(out, tmp_path / "idx", IndexConfig())
        for df_mem in (True, False):
            eng = QueryEngine(
                meta, QueryConfig(num_actors=2, df_in_memory=df_mem)
            )
            # "spanwis" is the Porter stem in the index; the misspelling
            # "spanwize" pipes to "spanwiz" (OOV, distance 1 from it)
            assert eng.query("spanwize") == [], df_mem
            assert eng.query("spanwize", fuzzy=True) == eng.query(
                "spanwise"
            ), df_mem
            got = eng.query("spanwize pressure", fuzzy=True)
            want = eng.query("spanwise pressure")
            assert got == want and got, df_mem
            # in-vocabulary queries are untouched by fuzzy
            assert eng.query("pressure turbine", fuzzy=True) == eng.query(
                "pressure turbine"
            ), df_mem
            # nothing within one edit: still empty, and memoized None
            assert eng.query("qqqqzzzzxxxx", fuzzy=True) == [], df_mem
            assert eng.query("qqqqzzzzxxxx", fuzzy=True) == [], df_mem
            # replacements map is deterministic and memoized
            repl = eng.fuzzy_replacements(["spanwiz"])
            assert repl == eng.fuzzy_replacements(["spanwiz"])
            assert repl["spanwiz"] == "spanwis", df_mem
            # the batch path applies the same rewrite per query
            batch = eng.query_many(
                ["spanwize", "pressure turbine"], fuzzy=True
            )
            assert batch[0] == eng.query("spanwise"), df_mem
            assert batch[1] == eng.query("pressure turbine"), df_mem
            # phrase + proximity accept the rewrite too
            assert eng.phrase_query("spanwize pressure") == [], df_mem
            assert eng.phrase_query(
                "spanwize pressure", fuzzy=True
            ) == eng.phrase_query("spanwise pressure"), df_mem
            assert eng.proximity_query(
                "spanwize rises", 2, fuzzy=True
            ) == eng.proximity_query("spanwise rises", 2), df_mem


class TestEndToEndRecipe:
    def test_jsonl_to_training_data_and_index(self, ray_session, tmp_path):
        """The README's end-to-end recipe as one test: JSONL shards ->
        curate (with a rolling baseline) -> chunk -> pack, plus an index
        build + query over the same corpus.  Every stage consumes the
        previous stage's real on-disk output."""
        import json as _json

        import pyarrow.parquet as pq
        import ray.data

        from ir_search_engine_ray.config import IndexConfig, QueryConfig
        from ir_search_engine_ray.extras import packing
        from ir_search_engine_ray.pipelines.curate import curate
        from ir_search_engine_ray.pipelines.index_build import build_index
        from ir_search_engine_ray.pipelines.query import QueryEngine
        from ir_search_engine_ray.sources.transcripts import (
            jsonl_to_transcripts,
        )

        # 1. ingest: two JSONL shards, one near-dup and one exact dup
        src = tmp_path / "shards"
        src.mkdir()
        rows = [
            {"text": "the boundary layer flow over the wing was measured"},
            {"text": "the boundary layer flow over the wing was measured"},  # exact dup
            {"text": "heat transfer in the supersonic nozzle was the study"},
            {"text": "x y"},  # fails the quality gate (too short)
        ]
        (src / "a.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in rows[:2])
        )
        (src / "b.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in rows[2:])
        )
        tr_dir = jsonl_to_transcripts(src, tmp_path / "tr")

        # 2. curate over the ingested docs (transcripts map 1 doc per row
        #    here; treat conv order as doc_id like the index does)
        t = pq.read_table(tr_dir).sort_by("conv_id")
        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(t.num_rows, dtype=np.int64)
                    ),
                    "text": t["text"],
                }
            )
        )
        kept = curate(
            docs, emit_baseline_dir=str(tmp_path / "roll")
        ).to_pandas()
        # exact dup collapsed, short doc gated, two survivors
        assert len(kept) == 2

        # 3. chunk + pack the survivors
        kept_ids = pa.array(kept["doc_id"].to_numpy())
        surv = docs.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(b["doc_id"], value_set=kept_ids)
            ),
            batch_format="pyarrow",
        )
        chunks = packing.chunk_documents(
            surv, window=4, stride=3
        ).to_pandas()
        assert set(chunks["doc_id"]) == set(kept["doc_id"])
        packed = packing.pack_sequences(surv, max_tokens=8).to_pandas()
        assert packed["n_tokens"].sum() == kept["n_tokens"].sum()

        # 4. index + query the ingested corpus
        meta = build_index(tr_dir, tmp_path / "idx", IndexConfig())
        eng = QueryEngine(meta, QueryConfig(num_actors=1))
        got = eng.query("boundary layer")
        assert got and got[0]["conv_id"] == "a.jsonl:0"
