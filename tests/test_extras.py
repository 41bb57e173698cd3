"""Training-data extras: dedup, ANN, text analysis, multimodal plumbing.

Each operator is checked against a small hand-constructed corpus with known
answers, and (where it matters for distributed correctness) across different
partitionings of the same input.
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows, num_blocks=1):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(num_blocks) if num_blocks > 1 else ds


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    (2, "completely different content about thermal boundary layers in flow"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (4, "le chat est sur la table et il est content avec le lait"),
]


class TestDedup:
    def test_exact_dedup(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        out = dedup.exact_dedup(_docs_ds(CORPUS)).to_pandas()
        surv = dict(zip(out["doc_id"], out["n_copies"]))
        assert surv[0] == 2  # doc 3 collapsed into doc 0 (min doc_id wins)
        assert 3 not in surv
        assert surv[1] == 1 and surv[2] == 1

    def test_minhash_finds_near_dup(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(CORPUS, num_blocks=2)
        pairs = dedup.minhash_lsh_pairs(docs)
        verified = dedup.verify_jaccard(pairs, docs, threshold=0.5).to_pandas()
        got = {tuple(p) for p in verified[["doc_a", "doc_b"]].itertuples(index=False)}
        assert (0, 1) in got  # near-dup pair
        assert (0, 3) in got  # exact dup pair (jaccard 1.0)
        assert all({a, b} & {2, 4} == set() for a, b in got)  # no false pairs

    def test_jaccard_values_exact(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(CORPUS)
        pairs = dedup.minhash_lsh_pairs(docs)
        out = dedup.verify_jaccard(pairs, docs, threshold=0.0).to_pandas()
        jac = {
            (a, b): j
            for a, b, j in out[["doc_a", "doc_b", "jaccard"]].itertuples(index=False)
        }
        assert jac[(0, 3)] == 1.0
        # 12-token docs differing in final token: 10 shared / 12 total 3-shingles
        sa = dedup._shingles(CORPUS[0][1], 3)
        sb = dedup._shingles(CORPUS[1][1], 3)
        expect = round(len(sa & sb) / len(sa | sb), 6)
        assert jac[(0, 1)] == expect

    def test_simhash_identical_docs_hamming_zero(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        out = dedup.simhash_candidate_pairs(
            _docs_ds(CORPUS), max_hamming=8
        ).to_pandas()
        ham = {
            (a, b): h
            for a, b, h in out[["doc_a", "doc_b", "hamming"]].itertuples(index=False)
        }
        assert ham[(0, 3)] == 0


class TestIncrementalDedup:
    def test_baseline_drops_seen_content(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        base = _docs_ds([(0, "seen before text"), (1, "also old news")])
        new = _docs_ds(
            [
                (10, "seen before text"),   # in baseline -> dropped
                (11, "brand new content"),  # unseen, 2 copies
                (12, "brand new content"),
                (13, "also old news"),      # in baseline -> dropped
                (14, "another fresh doc"),
            ],
            num_blocks=2,
        )
        out = dedup.exact_dedup_against(
            new, dedup.export_content_hashes(base)
        ).to_pandas()
        surv = dict(zip(out["doc_id"], out["n_copies"]))
        assert surv == {11: 2, 14: 1}

    @pytest.mark.parametrize("num_blocks", [1, 3])
    def test_empty_baseline_equals_exact_dedup(self, ray_session, num_blocks):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        rows = [(i, f"doc {'x' * (i % 4)}") for i in range(12)]
        new = _docs_ds(rows, num_blocks=num_blocks)
        empty = ray.data.from_arrow(
            pa.table(
                {
                    "h1": pa.array([], type=pa.int64()),
                    "h2": pa.array([], type=pa.int64()),
                }
            )
        )
        got = (
            dedup.exact_dedup_against(new, empty)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        want = (
            dedup.exact_dedup(new)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(got, want)

    def test_everything_seen_returns_empty(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(CORPUS)
        out = dedup.exact_dedup_against(
            _docs_ds([(100 + i, t) for i, (_, t) in enumerate(CORPUS)]),
            dedup.export_content_hashes(docs),
        )
        assert out.count() == 0


class TestNearDupAgainst:
    BASE = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "completely different content about thermal boundary layers"),
    ]
    NEW = [
        (100, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of base 0
        (101, "the quick brown fox jumps over the lazy dog near the river bend"),  # exact dup of new 100
        (102, "entirely unrelated musings on distributed query planning"),
    ]

    def _run(self, ray_session, roundtrip_dir=None):
        from ir_search_engine_ray.extras import dedup

        base = _docs_ds(self.BASE)
        new = _docs_ds(self.NEW, num_blocks=2)
        buckets, sketches = dedup.export_neardup_baseline(base)
        if roundtrip_dir is not None:
            bdir = f"{roundtrip_dir}/buckets"
            sdir = f"{roundtrip_dir}/sketches"
            buckets.write_parquet(bdir)
            sketches.write_parquet(sdir)
            import ray.data

            buckets = ray.data.read_parquet(bdir)
            sketches = ray.data.read_parquet(sdir)
        out = dedup.minhash_pairs_against(
            new, buckets, sketches, threshold=0.5
        ).to_pandas()
        if out.empty:
            return {}
        return {
            (a, b): j
            for a, b, j in out[["doc_a", "doc_b", "jaccard"]].itertuples(
                index=False
            )
        }

    def test_new_vs_base_only(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        got = self._run(ray_session)
        sa = dedup._shingles(self.BASE[0][1], 3)
        sb = dedup._shingles(self.NEW[0][1], 3)
        expect = round(len(sa & sb) / len(sa | sb), 6)
        # both near-dup copies match base 0; the new-new exact pair
        # (100, 101) and base-base pairs must NOT appear
        assert got == {(100, 0): expect, (101, 0): expect}

    def test_export_roundtrips_through_parquet(self, ray_session, tmp_path):
        assert self._run(ray_session, roundtrip_dir=str(tmp_path)) == self._run(
            ray_session
        )

    def test_sketch_verify_paths_agree(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(self.BASE + self.NEW)
        pairs = _docs_ds([])  # build pairs table directly instead
        import ray.data

        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([100, 101, 102], type=pa.int64()),
                    "doc_b": pa.array([0, 0, 1], type=pa.int64()),
                }
            )
        )
        sk = dedup.minhash_sketches(docs)
        bc = dedup.verify_jaccard_sketches(
            pairs, sk, threshold=0.0
        ).to_pandas()
        part = dedup.verify_jaccard_sketches(
            pairs, sk, threshold=0.0, broadcast_pairs_max=0
        ).to_pandas()
        key = ["doc_a", "doc_b"]
        import pandas as pd

        pd.testing.assert_frame_equal(
            bc.sort_values(key, ignore_index=True),
            part.sort_values(key, ignore_index=True),
        )


class TestNgramJaccard:
    """Exact prefix-filtered Jaccard self-join: recall 1.0 is a theorem,
    so the whole pipeline must EQUAL brute-force all-pairs Jaccard."""

    @staticmethod
    def _brute_pairs(rows, k=3, threshold=0.5):
        from ir_search_engine_ray.extras import dedup

        shs = {d: dedup._shingles(t, k) for d, t in rows}
        out = {}
        ids = sorted(shs)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                sa, sb = shs[a], shs[b]
                if not sa or not sb:
                    continue
                j = round(len(sa & sb) / len(sa | sb), 6)
                if j >= threshold:
                    out[(a, b)] = j
        return out

    def test_corpus_pairs_and_values(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        got = dedup.ngram_jaccard_pairs(
            _docs_ds(CORPUS, num_blocks=2), threshold=0.5
        ).to_pandas()
        got_map = {
            (a, b): j
            for a, b, j in got[["doc_a", "doc_b", "jaccard"]].itertuples(
                index=False
            )
        }
        assert got_map == self._brute_pairs(CORPUS, threshold=0.5)
        assert got_map[(0, 3)] == 1.0

    @staticmethod
    def _w(i):
        # alphabetic-only token (the tokenizer is [a-z]+ — digits vanish)
        s = ""
        i = int(i)
        while True:
            s = chr(97 + i % 26) + s
            i //= 26
            if i == 0:
                return "w" + s

    @classmethod
    def _random_corpus(cls, n=48, seed=11):
        # clustered mutations around a few base docs so pair similarities
        # straddle the threshold in both directions
        rng = np.random.default_rng(seed)
        vocab = [cls._w(i) for i in range(30)]
        rows = []
        doc_id = 0
        for base in range(8):
            toks = [vocab[rng.integers(0, len(vocab))] for _ in range(14)]
            for variant in range(n // 8):
                t = list(toks)
                for _ in range(rng.integers(0, 7)):  # 0..6 point mutations
                    t[rng.integers(0, len(t))] = vocab[
                        rng.integers(0, len(vocab))
                    ]
                rows.append((doc_id, " ".join(t)))
                doc_id += 1
        return rows

    @pytest.mark.parametrize("num_blocks", [1, 4])
    @pytest.mark.parametrize("threshold", [0.3, 0.6])
    def test_matches_bruteforce_across_partitionings(
        self, ray_session, num_blocks, threshold
    ):
        from ir_search_engine_ray.extras import dedup

        rows = self._random_corpus()
        got = dedup.ngram_jaccard_pairs(
            _docs_ds(rows, num_blocks=num_blocks), threshold=threshold
        ).to_pandas()
        got_map = {
            (a, b): j
            for a, b, j in got[["doc_a", "doc_b", "jaccard"]].itertuples(
                index=False
            )
        }
        assert got_map == self._brute_pairs(rows, threshold=threshold)

    def test_candidates_superset_of_true_pairs(self, ray_session):
        """The recall-1.0 claim on the PRE-verify candidate set itself."""
        from ir_search_engine_ray.extras import dedup

        rows = self._random_corpus(seed=23)
        cands = dedup.ngram_jaccard_candidates(
            _docs_ds(rows, num_blocks=3), threshold=0.4
        ).to_pandas()
        cand_set = {
            tuple(p)
            for p in cands[["doc_a", "doc_b"]].itertuples(index=False)
        }
        true_pairs = set(self._brute_pairs(rows, threshold=0.4))
        assert true_pairs <= cand_set

    def test_threshold_one_keeps_only_identical_shingle_sets(
        self, ray_session
    ):
        from ir_search_engine_ray.extras import dedup

        got = dedup.ngram_jaccard_pairs(
            _docs_ds(CORPUS), threshold=1.0
        ).to_pandas()
        assert {(0, 3)} == {
            tuple(p) for p in got[["doc_a", "doc_b"]].itertuples(index=False)
        }

    @classmethod
    def _boilerplate_corpus(cls, n=64, seed=3):
        # every doc opens with the same 10-token boilerplate (hot shingles
        # in all docs) followed by distinct content
        rng = np.random.default_rng(seed)
        boiler = " ".join("boiler" + cls._w(i) for i in range(10))
        rows = []
        for d in range(n):
            tail = " ".join(
                cls._w(rng.integers(0, 4000)) for _ in range(10)
            )
            rows.append((d, f"{boiler} {tail}"))
        return rows

    def test_df_order_same_pairs_fewer_candidates(self, ray_session):
        """Rarest-first (sampled df) ordering must not change the verified
        pair set, and must cut candidates on a boilerplate-heavy corpus."""
        from ir_search_engine_ray.extras import dedup

        rows = self._boilerplate_corpus()
        docs = _docs_ds(rows, num_blocks=4)
        n_hash = dedup.ngram_jaccard_candidates(
            docs, threshold=0.5, order="hash"
        ).count()
        n_df = dedup.ngram_jaccard_candidates(
            docs, threshold=0.5, order="df"
        ).count()
        assert n_df < n_hash

        def pairset(order, threshold):
            df = dedup.ngram_jaccard_pairs(
                docs, threshold=threshold, order=order
            ).to_pandas()
            if df.empty:  # empty ray datasets drop their columns
                return {}
            return {
                (a, b): j
                for a, b, j in df[
                    ["doc_a", "doc_b", "jaccard"]
                ].itertuples(index=False)
            }

        # at 0.5 the boilerplate overlap (~0.29) is below threshold: both
        # orders must agree on the empty set; at 0.25 it is above, so the
        # df order must still find every boilerplate pair
        for t in (0.5, 0.25):
            got = pairset("df", t)
            assert got == pairset("hash", t)
            assert got == self._brute_pairs(rows, threshold=t)

    def test_df_order_rejects_unknown(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        with pytest.raises(ValueError):
            dedup.ngram_jaccard_candidates(
                _docs_ds(CORPUS), order="frequency"
            )

    def test_prefix_len_bounds(self):
        from ir_search_engine_ray.extras.dedup import _prefix_len

        sizes = np.array([10, 1, 7], dtype=np.int64)
        # t=0.5: ceil(5)=5 -> 6; ceil(0.5)=1 -> 1; ceil(3.5)=4 -> 4
        assert _prefix_len(sizes, 0.5).tolist() == [6, 1, 4]
        # t=1.0: prefix collapses to a single shingle
        assert _prefix_len(sizes, 1.0).tolist() == [1, 1, 1]
        # t->0: the whole set is the prefix (every doc pairs broadly)
        assert _prefix_len(sizes, 1e-9).tolist() == [10, 1, 7]


class TestANN:
    def _emb_ds(self, n=200, dim=16, seed=5):
        import ray.data

        rng = np.random.default_rng(seed)
        mat = rng.normal(size=(n, dim))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.tolist() for row in mat], type=pa.list_(pa.float64())
                ),
            }
        )
        return ray.data.from_arrow(t).repartition(4), mat

    def test_cosine_topk_matches_numpy(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb_ds()
        q = mat[0]
        got = ann.cosine_topk(ds, q, k=10, exclude=0).to_pandas()
        cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        cos[0] = -np.inf
        want_ids = np.lexsort((np.arange(len(cos)), -cos))[:10]
        assert got["vec_id"].tolist() == want_ids.tolist()
        assert np.allclose(got["cosine"], np.round(cos[want_ids], 6))

    def test_ivf_full_probe_is_exact(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb_ds(n=120)
        q = mat[7]
        exact = ann.cosine_topk(ds, q, k=5, exclude=7).to_pandas()
        ivf = ann.ivf_topk(
            ds, q, k=5, nlist=8, nprobe=8, exclude=7
        ).to_pandas()
        assert ivf["vec_id"].tolist() == exact["vec_id"].tolist()

    def test_ivf_partial_probe_recall(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb_ds(n=300)
        q = mat[11]
        exact = set(ann.cosine_topk(ds, q, k=10, exclude=11)["vec_id"].to_pylist())
        ivf = set(
            ann.ivf_topk(ds, q, k=10, nlist=8, nprobe=4, exclude=11)[
                "vec_id"
            ].to_pylist()
        )
        assert len(exact & ivf) >= 5  # approximate, but not garbage

    def test_sample_embeddings_spans_blocks_and_is_partition_invariant(
        self, ray_session
    ):
        import ray.data

        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb_ds(n=400)
        ids = np.arange(400, dtype=np.int64)
        ranks = ann._sample_ranks(ids, seed=3)
        want_ids = np.sort(ids[np.argpartition(ranks, 63)[:64]])
        got = ann.sample_embeddings(ds, 64, seed=3)
        assert got.shape == (64, 16)
        assert np.allclose(got, mat[want_ids])
        # The seeded-rank sample must draw from beyond the head block(s):
        # a limit(64) sample would have selected only ids < 100 (block 0 of 4).
        assert want_ids.max() >= 100 and want_ids.min() < 100
        # Partitioning-independent: same rows from a differently-sharded ds.
        t = pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(
                    [row.tolist() for row in mat], type=pa.list_(pa.float64())
                ),
            }
        )
        other = ray.data.from_arrow(t).repartition(13)
        assert np.allclose(ann.sample_embeddings(other, 64, seed=3), got)

    def test_train_centroids_auto_nlist(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb_ds(n=300)
        cent = ann.train_centroids(ds, None, iters=2)
        # nlist=None -> ~sqrt(300)=17, clamped to >=8
        assert cent.shape == (17, 16)
        assert np.isfinite(cent).all()


class TestEmbeddingNearDup:
    def test_matches_numpy_brute_force(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        rng = np.random.default_rng(9)
        base = rng.normal(size=(30, 8))
        # plant near-dups: rows 30..34 are noisy copies of rows 0..4
        noisy = base[:5] + rng.normal(scale=0.05, size=(5, 8))
        mat = np.vstack([base, noisy])
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(35, dtype=np.int64)),
                "embedding": pa.array(
                    [r.tolist() for r in mat], type=pa.list_(pa.float64())
                ),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        got = dedup.embedding_cosine_pairs(ds, threshold=0.95).to_pandas()
        got_pairs = {tuple(p) for p in got[["vec_a", "vec_b"]].itertuples(index=False)}
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = mn @ mn.T
        want = {
            (a, b)
            for a in range(35)
            for b in range(a + 1, 35)
            if cos[a, b] >= 0.95
        }
        assert got_pairs == want
        assert {(i, i + 30) for i in range(5)} <= want  # planted dups found


class TestTextStats:
    def test_token_count_and_lang(self, ray_session):
        from ir_search_engine_ray.extras import textstats

        ds = _docs_ds(CORPUS)
        tc = ds.map_batches(textstats.token_count, batch_format="pyarrow").to_pandas()
        counts = dict(zip(tc["doc_id"], tc["n_tokens"]))
        assert counts[0] == len(CORPUS[0][1].split())
        lang = ds.map_batches(textstats.lang_id, batch_format="pyarrow").to_pandas()
        langs = dict(zip(lang["doc_id"], lang["lang_guess"]))
        assert langs[0] == "en"
        assert langs[4] == "fr"

    def test_regex_char_counts_match_naive_loops(self):
        import pyarrow as pa

        from ir_search_engine_ray.extras.textstats import (
            _regex_char_counts,
            ascii_alpha_counts,
        )

        texts = [
            "Hello, World!", "", "1234 !!!", "éàç ok", "ΔxΔ y",
            "mixed İıß CASE", "tabs\tand\nnewlines OK",
        ]
        col = pa.array(texts)
        want_ascii = [
            sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in t)
            for t in texts
        ]
        assert list(ascii_alpha_counts(col)) == want_ascii
        # \pL == Unicode letters; matches isalpha on these inputs (no
        # Other_Alphabetic marks / Nl numerals present)
        want_alpha = [sum(c.isalpha() for c in t) for t in texts]
        assert list(_regex_char_counts(col, r"\pL+")) == want_alpha
        # chunked arrays take the combine_chunks path
        chunked = pa.chunked_array([texts[:3], texts[3:]])
        assert list(ascii_alpha_counts(chunked)) == want_ascii

    def test_fingerprint_order_sensitive(self, ray_session):
        from ir_search_engine_ray.extras import textstats

        ds = _docs_ds([(0, "alpha beta gamma"), (1, "gamma beta alpha"),
                       (2, "alpha, beta;  gamma!")])
        out = ds.map_batches(
            textstats.doc_fingerprint, batch_format="pyarrow"
        ).to_pandas()
        fp = dict(zip(out["doc_id"], out["fingerprint"]))
        assert fp[0] != fp[1]  # order matters
        assert fp[0] == fp[2]  # punctuation/whitespace does not


class TestMultimodal:
    def test_decode_features_shape_and_determinism(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import multimodal

        t = multimodal.synth_media_table(40)
        a = multimodal.decode_features(
            ray.data.from_arrow(t), feature_dim=8, batch_size=16
        ).to_pandas()
        b = multimodal.decode_features(
            ray.data.from_arrow(t).repartition(5), feature_dim=8, batch_size=4
        ).to_pandas()
        a = a.sort_values("media_id", ignore_index=True)
        b = b.sort_values("media_id", ignore_index=True)
        assert len(a) == 40
        assert all(len(f) == 8 for f in a["features"])
        assert a["payload_digest"].tolist() == b["payload_digest"].tolist()
        for fa, fb in zip(a["features"], b["features"]):
            assert np.allclose(fa, fb)

    def test_real_decode_gated_per_kind(self):
        from ir_search_engine_ray.extras import multimodal

        avail = multimodal.available_decoders()
        assert avail["audio"] is True  # stdlib wave — always live
        missing = [k for k, ok in avail.items() if not ok]
        if missing:
            # asking for an undecodable kind fails AT CONSTRUCTION
            with pytest.raises(NotImplementedError):
                multimodal.DecodeMedia(real=True, kinds=tuple(missing))
        # restricting to decodable kinds always constructs
        ok_kinds = tuple(k for k, ok in avail.items() if ok)
        multimodal.DecodeMedia(real=True, kinds=ok_kinds)

    def test_real_audio_decode_live(self, ray_session):
        """The real=True audio path end-to-end (stdlib WAV codec): RMS
        window features reflect actual signal energy, silence decodes to
        zero, identical payloads to identical features."""
        import ray.data

        from ir_search_engine_ray.extras import multimodal

        loud = multimodal.synth_wav(1000, 440.0, amplitude=0.9)
        quiet = multimodal.synth_wav(1000, 440.0, amplitude=0.1)
        silent = multimodal.synth_wav(1000, 440.0, amplitude=0.0)
        t = pa.table(
            {
                "media_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "kind": pa.array(["audio"] * 4),
                "payload": pa.array(
                    [loud, quiet, silent, loud], type=pa.binary()
                ),
                "width": pa.array([0] * 4, type=pa.int32()),
                "height": pa.array([0] * 4, type=pa.int32()),
                "duration_ms": pa.array([1000] * 4, type=pa.int32()),
            }
        )
        out = (
            multimodal.decode_features(
                ray.data.from_arrow(t),
                feature_dim=8,
                real=True,
                kinds=("audio",),
                batch_size=2,
            )
            .to_pandas()
            .sort_values("media_id", ignore_index=True)
        )
        f = [np.asarray(v) for v in out["features"]]
        assert all(len(v) == 8 for v in f)
        # sine RMS ~ amplitude/sqrt(2); windows are uniform for a pure tone
        assert np.allclose(f[0], 0.9 / np.sqrt(2), atol=0.01)
        assert np.allclose(f[1], 0.1 / np.sqrt(2), atol=0.01)
        assert np.allclose(f[2], 0.0)
        assert np.allclose(f[0], f[3])  # identical payloads

    @pytest.mark.skipif(
        not __import__(
            "ir_search_engine_ray.extras.multimodal",
            fromlist=["available_decoders"],
        ).available_decoders()["image"],
        reason="PIL not installed",
    )
    def test_real_image_decode_live(self, ray_session):  # pragma: no cover
        """Off-sandbox: PIL decode + resize round-trip on a generated PNG."""
        import io

        import ray.data
        from PIL import Image

        from ir_search_engine_ray.extras import multimodal

        def png(shade: int) -> bytes:
            buf = io.BytesIO()
            Image.new("L", (32, 32), color=shade).save(buf, format="PNG")
            return buf.getvalue()

        t = pa.table(
            {
                "media_id": pa.array([0, 1], type=pa.int64()),
                "kind": pa.array(["image", "image"]),
                "payload": pa.array([png(0), png(255)], type=pa.binary()),
                "width": pa.array([32, 32], type=pa.int32()),
                "height": pa.array([32, 32], type=pa.int32()),
                "duration_ms": pa.array([0, 0], type=pa.int32()),
            }
        )
        out = (
            multimodal.decode_features(
                ray.data.from_arrow(t), feature_dim=4, real=True,
                kinds=("image",),
            )
            .to_pandas()
            .sort_values("media_id", ignore_index=True)
        )
        assert np.allclose(out["features"][0], 0.0)
        assert np.allclose(out["features"][1], 1.0)
        resized = multimodal.resize_images(
            ray.data.from_arrow(t), 8, 8, real=True
        ).to_pandas()
        for p in resized["payload"]:
            assert Image.open(io.BytesIO(p)).size == (8, 8)


class TestWindows:
    def test_sessionize_gap_edges(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        gap = 60 * us
        # user 1: events at 0s, 30s, 91s (gap 61s > 60s -> two sessions);
        # user 2: single event
        t = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
                "ts": pa.array(
                    [0, 30 * us, 91 * us, 5 * us], type=pa.timestamp("us")
                ),
            }
        )
        out = (
            windows.sessionize(ray.data.from_arrow(t), gap_us=gap)
            .to_pandas()
            .sort_values(["user_id", "session_idx"], ignore_index=True)
        )
        assert out["n_events"].tolist() == [2, 1, 1]
        assert out["session_idx"].tolist() == [0, 1, 0]

    def test_sessionize_exact_gap_is_same_session(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        t = pa.table(
            {
                "user_id": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([0, 60 * us], type=pa.timestamp("us")),
            }
        )
        out = windows.sessionize(
            ray.data.from_arrow(t), gap_us=60 * us
        ).to_pandas()
        assert len(out) == 1 and out["n_events"][0] == 2

    def test_tumbling_counts(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        t = pa.table(
            {
                "ts": pa.array(
                    [10 * us, 3599 * us, 3600 * us, 7300 * us],
                    type=pa.timestamp("us"),
                ),
                "event_type": pa.array(["a", "a", "a", "b"]),
                "value": pa.array([1.0, 2.0, 4.0, 8.0]),
            }
        )
        out = (
            windows.tumbling_counts(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values(["window_start", "event_type"], ignore_index=True)
        )
        assert out["n_events"].tolist() == [2, 1, 1]
        assert out["sum_value"].tolist() == [3.0, 4.0, 8.0]

    @pytest.mark.parametrize("num_blocks", [1, 3])
    def test_tumbling_distinct_users(self, ray_session, num_blocks):
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        # hour 0: users {7, 7, 9} -> 2 distinct; hour 1: {7} -> 1
        t = pa.table(
            {
                "ts": pa.array(
                    [10 * us, 3599 * us, 200 * us, 3600 * us],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([7, 7, 9, 7], type=pa.int64()),
            }
        )
        out = (
            windows.tumbling_distinct_users(
                ray.data.from_arrow(t).repartition(num_blocks)
            )
            .to_pandas()
            .sort_values("window_start", ignore_index=True)
        )
        assert out["n_users"].tolist() == [2, 1]

    def test_resize_and_frame_sample(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import multimodal

        t = multimodal.synth_media_table(30)
        resized = multimodal.resize_images(
            ray.data.from_arrow(t), 64, 64
        ).to_pandas()
        assert len(resized) == 30
        imgs = resized[resized["kind"] == "image"]
        assert (imgs["width"] == 64).all() and (imgs["height"] == 64).all()
        others = resized[resized["kind"] != "image"]
        orig = t.to_pandas().set_index("media_id")
        assert (
            others.set_index("media_id")["width"]
            == orig.loc[others["media_id"]]["width"]
        ).all()

        frames = multimodal.sample_frames(
            ray.data.from_arrow(t), every_ms=5000
        ).to_pandas()
        vids = orig[orig["kind"] == "video"]
        want = int(sum(-(-d // 5000) for d in vids["duration_ms"]))
        assert len(frames) == want
        assert set(frames["media_id"]) <= set(vids.index)
        assert (frames["frame_ts_ms"] % 5000 == 0).all()

    def test_resize_real_gated_on_codec(self):
        from ir_search_engine_ray.extras import multimodal

        avail = multimodal.available_decoders()
        if avail["image"]:  # pragma: no cover
            multimodal.ResizeImages(32, 32, real=True)
        else:
            with pytest.raises(NotImplementedError):
                multimodal.ResizeImages(32, 32, real=True)
        if avail["video"]:  # pragma: no cover
            multimodal.SampleFrames(real=True)
        else:
            with pytest.raises(NotImplementedError):
                multimodal.SampleFrames(real=True)


class TestCurate:
    def test_curate_stages(self, ray_session):
        """Hand corpus: doc 3 (exact dup of 0) falls to exact dedup; doc 1
        (near dup of 0) falls to the Jaccard drop; doc 4 (French) falls to
        the language gate; docs 0 and 2 survive with their token counts."""
        from ir_search_engine_ray.pipelines.curate import curate

        out = curate(_docs_ds(CORPUS, num_blocks=2)).to_pandas()
        assert sorted(out["doc_id"]) == [0, 2]
        by_id = out.set_index("doc_id")
        assert by_id.loc[0, "n_tokens"] == len(CORPUS[0][1].split())

    def test_curate_incremental_baselines(self, ray_session):
        """Incremental shard vs an already-curated baseline: exact matches
        fall to the hash gate, near-matches to the cross near-dup gate,
        genuinely new content survives."""
        from ir_search_engine_ray.extras import dedup
        from ir_search_engine_ray.pipelines.curate import curate

        base_rows = [
            (0, "the quick brown fox jumps over the lazy dog near the river bank"),
            (1, "an entirely separate treatise on turbine blade cooling flows"),
        ]
        new_rows = [
            (100, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact == base 0
            (101, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of base 0
            (102, "fresh analysis of sediment transport in mountain stream networks"),
        ]
        base = _docs_ds(base_rows)
        hashes = dedup.export_content_hashes(base)
        buckets, sketches = dedup.export_neardup_baseline(base)
        out = curate(
            _docs_ds(new_rows, num_blocks=2),
            baseline_hashes=hashes,
            baseline_neardup=(buckets, sketches),
        ).to_pandas()
        assert sorted(out["doc_id"]) == [102]

        # hash gate alone: the near-dup (101) survives
        out2 = curate(
            _docs_ds(new_rows, num_blocks=2), baseline_hashes=hashes
        ).to_pandas()
        assert sorted(out2["doc_id"]) == [101, 102]

    def test_curate_rolling_baseline_two_waves(self, ray_session, tmp_path):
        """Wave 1 curates and emits its survivors' exports; wave 2 curates
        against that rolling dir — exact and near copies of wave-1 docs
        fall away, and wave 2's own survivors append into the dir."""
        import ray.data

        from ir_search_engine_ray.pipelines.curate import curate

        roll = str(tmp_path / "baseline")
        w1 = [
            (0, "the quick brown fox jumps over the lazy dog near the river bank"),
            (1, "notes on the cooling of the turbine blade and the duct flows"),
        ]
        out1 = curate(
            _docs_ds(w1), emit_baseline_dir=roll
        ).to_pandas()
        assert sorted(out1["doc_id"]) == [0, 1]

        w2 = [
            (100, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact == w1 doc 0
            (101, "notes on the cooling of the turbine blade and the duct walls"),     # near-dup of w1 doc 1
            (102, "fresh analysis of sediment transport in mountain stream networks"),
        ]
        out2 = curate(
            _docs_ds(w2, num_blocks=2),
            baseline_hashes=ray.data.read_parquet(f"{roll}/hashes"),
            baseline_neardup=(
                ray.data.read_parquet(f"{roll}/buckets"),
                ray.data.read_parquet(f"{roll}/sketches"),
            ),
            emit_baseline_dir=roll,
        ).to_pandas()
        assert sorted(out2["doc_id"]) == [102]

        # the rolling dir now holds wave-1 AND wave-2 survivors: a third
        # wave repeating doc 102's text must come out empty
        out3 = curate(
            _docs_ds([(200, w2[2][1])]),
            baseline_hashes=ray.data.read_parquet(f"{roll}/hashes"),
        ).to_pandas()
        assert len(out3) == 0

    def test_rolling_baseline_survives_empty_wave(self, ray_session, tmp_path):
        """A wave whose quality gate drops EVERYTHING (via the min_logprob
        early return) must still create/refresh the rolling baseline dirs
        so the next wave's reads find them (empty, not missing)."""
        import ray.data

        from ir_search_engine_ray.pipelines.curate import curate

        roll = str(tmp_path / "roll")
        out = curate(
            _docs_ds([(0, "xx")]),  # below min_tokens -> gate drops it
            min_logprob=-1.0,
            emit_baseline_dir=roll,
        ).to_pandas()
        assert len(out) == 0
        hashes = ray.data.read_parquet(f"{roll}/hashes")
        assert hashes.count() == 0
        # next wave curates against the empty baseline without error
        nxt = curate(
            _docs_ds([(10, "the quick brown fox jumps over the lazy dog")]),
            baseline_hashes=hashes,
            baseline_neardup=(
                ray.data.read_parquet(f"{roll}/buckets"),
                ray.data.read_parquet(f"{roll}/sketches"),
            ),
        ).to_pandas()
        assert sorted(nxt["doc_id"]) == [10]

    def test_curate_knobs(self, ray_session):
        from ir_search_engine_ray.pipelines.curate import curate

        # no language gate, impossible near-dup threshold: only the exact
        # dup should fall away
        out = curate(
            _docs_ds(CORPUS),
            lang=None,
            jaccard_threshold=1.1,
            min_tokens=1,
        ).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2, 4]


    def test_curate_logprob_gate(self, ray_session):
        """A doc of corpus-unique rare tokens scores far below the docs
        built from the shared vocabulary and falls to the min_logprob
        gate; everything else is unchanged."""
        from ir_search_engine_ray.pipelines.curate import curate

        common = "the quick brown fox jumps over the lazy dog again today"
        docs = [(i, common) for i in range(6)]
        # make each doc distinct so exact/near dedup keep them all
        docs = [(i, f"{t} marker{'x' * (i + 1)}") for i, t in docs]
        docs.append((9, "zzqj wvrk pltn bgfd xcvm qwer"))  # 6 rare tokens
        base = curate(
            _docs_ds(docs, 2), lang=None, jaccard_threshold=1.1,
            min_tokens=1,
        ).to_pandas()
        assert 9 in set(base["doc_id"])
        # doc 9's tokens are singletons (ln(1/72) ~ -4.28 each) while the
        # common-vocabulary docs average ~ -2.5: threshold between them
        gated = curate(
            _docs_ds(docs, 2), lang=None, jaccard_threshold=1.1,
            min_tokens=1, min_logprob=-3.5,
        ).to_pandas()
        assert 9 not in set(gated["doc_id"])
        assert sorted(gated["doc_id"]) == sorted(
            d for d in base["doc_id"] if d != 9
        )

    def test_curate_span_gate(self, ray_session):
        """Two docs share a long verbatim block covering most of their
        tokens; with max_dup_span_frac they both fall, while a doc with a
        small shared fraction survives."""
        from ir_search_engine_ray.pipelines.curate import curate

        block = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lamda mu nu xi omicron pi rho sigma tau upsilon")
        docs = [
            (0, block + " unique tailzero here"),
            (1, block + " different tailone words"),
            # shares only the first 8 tokens: a small fraction of its text
            (2, "alpha beta gamma delta epsilon zeta eta theta "
                "plus lots and lots of completely original content "
                "stretching far beyond the shared prefix block today"),
            (3, "entirely original document with no overlap whatsoever "
                "and enough tokens to pass the quality gate fine"),
        ]
        base = curate(
            _docs_ds(docs, 2), lang=None, jaccard_threshold=1.1,
            min_tokens=1,
        ).to_pandas()
        assert sorted(base["doc_id"]) == [0, 1, 2, 3]
        gated = curate(
            _docs_ds(docs, 2), lang=None, jaccard_threshold=1.1,
            min_tokens=1, max_dup_span_frac=0.5,
        ).to_pandas()
        assert sorted(gated["doc_id"]) == [2, 3]

class TestHoppingWindows:
    def test_hopping_counts(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        # window 60s hopping every 20s: event at t=50s belongs to windows
        # starting at 0s(?), 20s(?), 40s -> starts 40,20,0 with 60s length:
        # [0,60) yes, [20,80) yes, [40,100) yes
        t = pa.table(
            {
                "ts": pa.array([50 * us], type=pa.timestamp("us")),
                "event_type": pa.array(["a"]),
                "value": pa.array([2.0]),
            }
        )
        out = (
            windows.hopping_counts(
                ray.data.from_arrow(t), window_us=60 * us, hop_us=20 * us
            )
            .to_pandas()
            .sort_values("window_start", ignore_index=True)
        )
        starts = (out["window_start"].astype("int64") // us).tolist()
        assert starts == [0, 20, 40]
        assert out["n_events"].tolist() == [1, 1, 1]
        assert out["sum_value"].tolist() == [2.0, 2.0, 2.0]

    def test_window_must_be_hop_multiple(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import windows

        with pytest.raises(ValueError):
            windows.hopping_counts(
                ray.data.from_arrow(pa.table({"ts": pa.array([], type=pa.timestamp("us")),
                                              "event_type": pa.array([], type=pa.string()),
                                              "value": pa.array([], type=pa.float64())})),
                window_us=100, hop_us=33,
            )


class TestBatchANN:
    def test_batch_matches_single_query_topk(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = TestANN()._emb_ds(n=150)
        q_ids = np.arange(3, dtype=np.int64)
        batch = ann.cosine_topk_batch(
            ds, q_ids, mat[:3], k=7, exclude_self=True
        ).to_pandas()
        for q in q_ids:
            single = ann.cosine_topk(ds, mat[q], k=7, exclude=int(q)).to_pandas()
            got = batch[batch["query_id"] == q].reset_index(drop=True)
            assert got["vec_id"].tolist() == single["vec_id"].tolist()
            assert np.allclose(got["cosine"], single["cosine"])


class TestEmptyInputs:
    """A user pointing the pipelines at an empty table must get empty
    results, not crashes — every operator, end to end."""

    def _empty_docs(self):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )

    def _empty_emb(self):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        )

    def test_dedup_family_empty(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        docs = self._empty_docs()
        assert dedup.exact_dedup(docs).count() == 0
        pairs = dedup.minhash_lsh_pairs(docs)
        assert dedup.verify_jaccard(pairs, docs, threshold=0.5).count() == 0
        assert dedup.simhash_candidate_pairs(docs).count() == 0
        assert dedup.embedding_cosine_pairs(self._empty_emb(), 0.5).count() == 0

    def test_ann_empty(self, ray_session):
        import numpy as np

        from ir_search_engine_ray.extras import ann

        out = ann.cosine_topk(self._empty_emb(), np.ones(4), k=5)
        assert out.num_rows == 0

    def test_curate_empty(self, ray_session):
        from ir_search_engine_ray.pipelines.curate import curate

        assert curate(self._empty_docs()).count() == 0

    def test_textstats_empty(self, ray_session):
        from ir_search_engine_ray.extras import textstats

        docs = self._empty_docs()
        for fn in (
            textstats.token_count,
            textstats.token_count_bpe,
            textstats.quality_signals,
            textstats.lang_id,
            textstats.doc_fingerprint,
        ):
            assert docs.map_batches(fn, batch_format="pyarrow").count() == 0


class TestConnectedComponents:
    def test_chain_and_separate_clusters(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        pairs = pa.table(
            {
                "doc_a": pa.array([1, 2, 5, 8, 7], type=pa.int64()),
                "doc_b": pa.array([2, 3, 6, 9, 9], type=pa.int64()),
            }
        )
        out = dedup.connected_components(
            ray.data.from_arrow(pairs).repartition(2)
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        # chain 1-2-3 -> cluster 1; 5-6 -> 5; 7-9-8 (via shared 9) -> 7
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7}

    def test_empty_pairs(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        pairs = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
            }
        )
        assert dedup.connected_components(ray.data.from_arrow(pairs)).count() == 0


class TestMediaNearDup:
    def test_planted_duplicate_payload_found(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import multimodal

        t = multimodal.synth_media_table(30)
        # plant: media 30 is a byte-identical copy of media 0's payload
        dup = pa.table(
            {
                "media_id": pa.array([30], type=pa.int64()),
                "kind": t["kind"].slice(0, 1),
                "payload": t["payload"].slice(0, 1),
                "width": t["width"].slice(0, 1),
                "height": t["height"].slice(0, 1),
                "duration_ms": t["duration_ms"].slice(0, 1),
            }
        )
        ds = ray.data.from_arrow(pa.concat_tables([t, dup])).repartition(3)
        out = multimodal.media_neardup(ds, threshold=0.999).to_pandas()
        got = {tuple(p) for p in out[["media_a", "media_b"]].itertuples(index=False)}
        assert (0, 30) in got
        row = out[(out["media_a"] == 0) & (out["media_b"] == 30)]
        assert float(row["cosine"].iloc[0]) == 1.0


class TestDistributedCC:
    def test_matches_union_find(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        rng = np.random.default_rng(17)
        # random sparse graph incl. a long chain (forces several rounds)
        a = rng.integers(0, 60, size=40)
        b = rng.integers(0, 60, size=40)
        keep = a != b
        chain = np.arange(100, 110)
        pairs = pa.table(
            {
                "doc_a": pa.array(
                    np.concatenate([np.minimum(a, b)[keep], chain[:-1]]),
                    type=pa.int64(),
                ),
                "doc_b": pa.array(
                    np.concatenate([np.maximum(a, b)[keep], chain[1:]]),
                    type=pa.int64(),
                ),
            }
        )
        ds = ray.data.from_arrow(pairs).repartition(3)
        uf = dedup.connected_components(ds).to_pandas()
        dist = (
            dedup.connected_components_distributed(ds)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        uf = uf.sort_values("doc_id", ignore_index=True)
        assert uf.equals(dist)
        # the chain collapsed to its minimum
        got = dict(zip(dist["doc_id"], dist["cluster_id"]))
        assert all(got[int(n)] == 100 for n in chain)

    def test_empty(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        pairs = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
            }
        )
        assert (
            dedup.connected_components_distributed(
                ray.data.from_arrow(pairs)
            ).count()
            == 0
        )


class TestSessionizeSplit:
    def test_split_path_identical_to_default(self, ray_session):
        """Range-split sessionize (the mega-user scale path) must be
        bit-identical to the per-user path, including sessions spanning
        range boundaries."""
        import pandas as pd
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        rng = np.random.default_rng(23)
        rows = []
        for uid in range(5):
            t = 0
            for _ in range(rng.integers(20, 60)):
                t += int(rng.integers(1, 120)) * us  # gaps 1..119s, gap_us=60s
                rows.append((uid, t))
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        canon = lambda df: df.sort_values(
            ["user_id", "session_idx"], ignore_index=True
        )
        base = canon(windows.sessionize(ds, gap_us=60 * us).to_pandas())
        # split at 100s: many sessions straddle range boundaries
        split = canon(
            windows.sessionize(
                ds, gap_us=60 * us, split_us=100 * us
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(base, split)

    def test_exact_boundary_gap_merges_across_ranges(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        # events at 95s and 155s: in different 100s ranges, gap exactly 60s
        t = pa.table(
            {
                "user_id": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([95 * us, 155 * us], type=pa.timestamp("us")),
            }
        )
        out = windows.sessionize(
            ray.data.from_arrow(t), gap_us=60 * us, split_us=100 * us
        ).to_pandas()
        assert len(out) == 1 and out["n_events"][0] == 2


class TestNormalizedDedup:
    def test_punctuation_variants_collapse(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(
            [
                (0, "Hello,  world!"),
                (1, "hello world"),
                (2, "world hello"),  # order differs -> distinct
                (3, "hello world."),
            ]
        )
        out = dedup.exact_dedup_normalized(docs).to_pandas()
        surv = dict(zip(out["doc_id"], out["n_copies"]))
        assert surv == {0: 3, 2: 1}


class TestSplits:
    def test_assignment_stable_under_growth(self, ray_session):
        """Adding documents never reassigns existing ones, and the split
        distribution roughly follows the weights."""
        import ray.data

        from ir_search_engine_ray.extras import splits

        def tagged(n):
            t = pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(["x"] * n),
                }
            )
            out = splits.assign_splits(ray.data.from_arrow(t)).to_pandas()
            return dict(zip(out["doc_id"], out["split"]))

        small, big = tagged(500), tagged(2000)
        assert all(big[d] == s for d, s in small.items())
        from collections import Counter

        dist = Counter(big.values())
        assert 0.95 <= dist["train"] / 2000 <= 0.995
        assert dist["val"] > 0 and dist["test"] > 0

    def test_custom_weights_and_validation(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import splits

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(100, dtype=np.int64)),
                "text": pa.array(["x"] * 100),
            }
        )
        out = splits.assign_splits(
            ray.data.from_arrow(t), splits=(("a", 1), ("b", 1))
        ).to_pandas()
        assert set(out["split"]) == {"a", "b"}
        with pytest.raises(ValueError):
            splits.assign_splits(
                ray.data.from_arrow(t), splits=(("a", 0),)
            ).to_pandas()


class TestBigramPmi:
    @pytest.mark.parametrize("num_blocks", [1, 3])
    def test_known_values(self, ray_session, num_blocks):
        import math

        from ir_search_engine_ray.extras import textstats

        # corpus: "a b" x3 plus "a c" x1 -> T1=8, T2=4
        rows = [(0, "a b a b"), (1, "a b a c")]
        out = (
            textstats.bigram_pmi(
                _docs_ds(rows, num_blocks=num_blocks), min_count=2
            )
            .to_pandas()
            .set_index("ngram")
        )
        # bigrams in "a b a b": (a b) (b a) (a b); in "a b a c":
        # (a b) (b a) (a c) -> counts: "a b"=3, "b a"=2, "a c"=1
        assert sorted(out.index) == ["a b", "b a"]
        t1, t2 = 8.0, 6.0
        ca, cb_, cc = 4, 3, 1
        assert out.loc["a b", "count"] == 3
        assert out.loc["a b", "pmi"] == round(
            math.log(3 * t1 * t1 / (ca * cb_ * t2)), 6
        )
        assert out.loc["b a", "pmi"] == round(
            math.log(2 * t1 * t1 / (cb_ * ca * t2)), 6
        )


class TestTargetMix:
    @staticmethod
    def _mixed_ds(n_a=1000, n_b=100, num_blocks=1):
        import ray.data

        src = ["a"] * n_a + ["b"] * n_b
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(n_a + n_b, dtype=np.int64)
                ),
                "source": pa.array(src),
            }
        )
        ds = ray.data.from_arrow(t)
        return ds.repartition(num_blocks) if num_blocks > 1 else ds

    def test_targets_hit_and_clamp(self, ray_session):
        from ir_search_engine_ray.extras import splits

        # targets: a -> 50% of 200 = 100 of 1000 (10% rate);
        # b -> 50% of 200 = 100 > its 100 docs -> clamped, kept whole
        out = splits.target_mix_sample(
            self._mixed_ds(),
            by="source",
            weights_ppm={"a": 500000, "b": 500000},
            total=200,
        ).to_pandas()
        by = out.groupby("source").size()
        assert by["b"] == 100  # clamp keeps the whole small stratum
        assert 70 <= by["a"] <= 130  # ~100 expected, hashed-id binomial

    def test_partitioning_invariant_and_unweighted_dropped(
        self, ray_session
    ):
        from ir_search_engine_ray.extras import splits

        def run(nb):
            return (
                splits.target_mix_sample(
                    self._mixed_ds(num_blocks=nb),
                    by="source",
                    weights_ppm={"a": 1000000},
                    total=100,
                )
                .to_pandas()
                .sort_values("doc_id", ignore_index=True)
            )

        one, four = run(1), run(4)
        import pandas as pd

        pd.testing.assert_frame_equal(one, four)
        assert set(one["source"]) == {"a"}  # b has no weight -> dropped

    def test_validation(self, ray_session):
        from ir_search_engine_ray.extras import splits

        with pytest.raises(ValueError):
            splits.target_mix_sample(
                self._mixed_ds(10, 1),
                by="source",
                weights_ppm={"a": -1},
                total=5,
            )
        with pytest.raises(ValueError):
            splits.target_mix_sample(
                self._mixed_ds(10, 1),
                by="source",
                weights_ppm={"a": 1},
                total=0,
            )


class TestNgramCounts:
    def test_bigram_counts(self, ray_session):
        from ir_search_engine_ray.extras import textstats

        ds = _docs_ds([(0, "a b c a b"), (1, "a b x")], num_blocks=2)
        out = textstats.ngram_counts(ds, n=2).to_pandas()
        got = dict(zip(out["ngram"], out["count"]))
        assert got == {"a b": 3, "b c": 1, "c a": 1, "b x": 1}
        out2 = textstats.ngram_counts(ds, n=2, min_count=2).to_pandas()
        assert dict(zip(out2["ngram"], out2["count"])) == {"a b": 3}


class TestVerifyStrategies:
    def test_partitioned_path_equals_broadcast(self, ray_session):
        """broadcast_pairs_max=0 forces the partition-tagged shuffle path;
        it must produce the identical verified pair set."""
        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(CORPUS, num_blocks=2)
        pairs = dedup.minhash_lsh_pairs(docs)
        a = dedup.verify_jaccard(pairs, docs, threshold=0.3).to_pandas()
        b = dedup.verify_jaccard(
            pairs, docs, threshold=0.3, broadcast_pairs_max=0
        ).to_pandas()

        def key(df):
            return sorted(map(tuple, df.values.tolist()))

        assert key(a) == key(b)
        assert len(a) > 0

    def test_pair_with_missing_doc_dropped_both_paths(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(CORPUS)
        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([0, 0], type=pa.int64()),
                    "doc_b": pa.array([3, 999], type=pa.int64()),
                }
            )
        )
        for bmax in (0, 1000):
            out = dedup.verify_jaccard(
                pairs, docs, threshold=0.0, broadcast_pairs_max=bmax
            ).to_pandas()
            assert set(zip(out["doc_a"], out["doc_b"])) == {(0, 3)}, bmax

    def test_anti_join_ids(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        left = _docs_ds(CORPUS, num_blocks=2)
        ids = ray.data.from_arrow(
            pa.table({"doc_b": pa.array([1, 3, 3, 99], type=pa.int64())})
        )
        out = dedup.anti_join_ids(left, ids).to_pandas()
        assert sorted(out["doc_id"]) == [0, 2, 4]
        texts = dict(zip(out["doc_id"], out["text"]))
        assert texts[2] == CORPUS[2][1]  # payload columns survive intact
        empty = ray.data.from_arrow(
            pa.table({"doc_b": pa.array([], type=pa.int64())})
        )
        assert sorted(
            dedup.anti_join_ids(left, empty).to_pandas()["doc_id"]
        ) == [0, 1, 2, 3, 4]


class TestCurateScaleShape:
    def test_no_driver_id_collection_in_curate(self):
        """VERDICT r2 done-condition: the curate DAG holds no
        driver-collected id structure — enforced on the module source."""
        import inspect

        from ir_search_engine_ray.pipelines import curate

        src = inspect.getsource(curate)
        for banned in ("iter_batches", "take_all", "ray.put", "to_pandas"):
            assert banned not in src, banned


class TestCCAutoStrategy:
    def _pairs(self):
        import ray.data

        chain = np.arange(200, 212)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array(
                        np.concatenate([[0, 1], chain[:-1]]), type=pa.int64()
                    ),
                    "doc_b": pa.array(
                        np.concatenate([[1, 5], chain[1:]]), type=pa.int64()
                    ),
                }
            )
        ).repartition(2)

    def test_forced_modes_agree(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        ds = self._pairs()
        uf = (
            dedup.connected_components(ds, distributed=False)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        dist = (
            dedup.connected_components(ds, distributed=True)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert uf.equals(dist)

    def test_auto_threshold_routes_to_distributed(self, ray_session, monkeypatch):
        from ir_search_engine_ray.extras import dedup

        called = {}
        real = dedup.connected_components_distributed

        def spy(*a, **k):
            called["hit"] = True
            return real(*a, **k)

        monkeypatch.setattr(dedup, "connected_components_distributed", spy)
        monkeypatch.setattr(dedup, "CC_DISTRIBUTED_PAIRS", 1)
        out = dedup.connected_components(self._pairs()).to_pandas()
        assert called.get("hit")
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got[211] == 200 and got[5] == 0

    def test_unconverged_distributed_cc_raises(self, ray_session):
        from ir_search_engine_ray.extras import dedup

        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.connected_components_distributed(
                self._pairs(), max_rounds=2
            ).to_pandas()


class TestEmbeddingMethodParam:
    def test_method_exact_delegates_to_allpairs(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import dedup

        rng = np.random.default_rng(3)
        mat = rng.normal(size=(20, 6))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(20, dtype=np.int64)),
                "embedding": pa.array(
                    [r.tolist() for r in mat], type=pa.list_(pa.float64())
                ),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        exact = dedup.embedding_cosine_pairs(
            ds, threshold=0.5, method="exact"
        ).to_pandas()
        base = dedup.embedding_cosine_pairs_allpairs(ds, 0.5).to_pandas()

        def key(df):
            return sorted(map(tuple, df.values.tolist()))

        assert key(exact) == key(base)
        with pytest.raises(ValueError):
            dedup.embedding_cosine_pairs(ds, threshold=0.5, method="bogus")


class TestDecontam:
    def test_planted_overlap_flags(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import decontam

        bench_text = "alpha beta gamma delta epsilon zeta eta theta"
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        # contains the benchmark 5-gram run
                        "xx alpha beta gamma delta epsilon yy",
                        # shuffled words: no contiguous 5-gram overlap
                        "epsilon delta gamma beta alpha zeta",
                        "totally unrelated text about other things here",
                        # shorter than n tokens
                        "tiny doc",
                    ]
                ),
            }
        )
        bench = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([99], type=pa.int64()),
                      "text": pa.array([bench_text])})
        )
        out = (
            decontam.contamination_scan(
                ray.data.from_arrow(docs), bench, n=5, min_hits=1
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["contaminated"].tolist() == [True, False, False, False]
        assert out["n_overlap_ngrams"].tolist()[0] == 1

    def test_decontaminate_filters(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import decontam

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(
                    ["one two three four five six", "safe words only right here"]
                ),
            }
        )
        bench = ray.data.from_arrow(
            pa.table({"text": pa.array(["zero one two three four five"])})
        )
        kept = decontam.decontaminate(
            ray.data.from_arrow(docs), bench, n=5
        ).to_pandas()
        assert kept["doc_id"].tolist() == [1]


class TestPii:
    def test_counts_and_redaction(self, ray_session):
        from ir_search_engine_ray.extras import pii

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(
                    [
                        "mail a@b.com or x.y+z@sub.example.org ip 10.0.3.7 "
                        "call 555-123-4567 ssn 123-45-6789",
                        "no pii here",
                    ]
                ),
            }
        )
        out = pii.pii_scan(t).to_pydict()
        assert out["n_email"] == [2, 0]
        assert out["n_ipv4"] == [1, 0]
        assert out["n_phone"] == [1, 0]
        assert out["n_ssn"] == [1, 0]
        assert out["n_pii"] == [5, 0]
        red = out["text_redacted"][0]
        assert "[EMAIL]" in red and "[IP]" in red
        assert "[PHONE]" in red and "[SSN]" in red
        assert "a@b.com" not in red and "10.0.3.7" not in red
        assert out["text_redacted"][1] == "no pii here"

    def test_progressive_order_no_double_count(self, ray_session):
        from ir_search_engine_ray.extras import pii

        # the SSN-shaped digits live inside an email local part: the email
        # category claims them first, ssn must not fire
        t = pa.table(
            {
                "doc_id": pa.array([0], type=pa.int64()),
                "text": pa.array(["reach 123-45-6789@example.com today"]),
            }
        )
        out = pii.pii_scan(t).to_pydict()
        assert out["n_email"] == [1]
        assert out["n_ssn"] == [0]


class TestAsofJoin:
    def test_backward_match_and_nulls(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import joins

        left = pa.table(
            {
                "k": pa.array([1, 1, 2, 3], type=pa.int64()),
                "ts": pa.array([10, 5, 7, 9], type=pa.int64()),
                "lid": pa.array([100, 101, 102, 103], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1, 1, 2], type=pa.int64()),
                "ts": pa.array([3, 7, 12, 7], type=pa.int64()),
                "v": pa.array([30, 70, 120, 700], type=pa.int64()),
            }
        )
        out = (
            joins.asof_join(
                ray.data.from_arrow(left),
                ray.data.from_arrow(right),
                by="k",
                on="ts",
                left_cols=["lid"],
                right_value_cols=["v"],
            )
            .to_pandas()
            .sort_values("lid", ignore_index=True)
        )
        # lid 100 (k1,ts10) -> right ts7; lid 101 (k1,ts5) -> ts3;
        # lid 102 (k2,ts7) -> ts7 (non-strict: equal matches);
        # lid 103 (k3) -> no right side at all -> null
        assert out["matched_ts"].tolist()[:3] == [7, 3, 7]
        assert pd_isna(out["matched_ts"][3])
        assert out["matched_v"].tolist()[:3] == [70, 30, 700]

    def test_strict_excludes_equal(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import joins

        left = pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "ts": pa.array([7], type=pa.int64()),
                "lid": pa.array([1], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([7, 3], type=pa.int64()),
            }
        )
        out = joins.asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            by="k",
            on="ts",
            left_cols=["lid"],
            strict=True,
        ).to_pandas()
        assert out["matched_ts"].tolist() == [3]

    def test_tie_takes_last_by_value_sort(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import joins

        left = pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "ts": pa.array([9], type=pa.int64()),
                "lid": pa.array([1], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([9, 9], type=pa.int64()),
                "v": pa.array([5, 2], type=pa.int64()),
            }
        )
        out = joins.asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            by="k",
            on="ts",
            left_cols=["lid"],
            right_value_cols=["v"],
        ).to_pandas()
        # deterministic tie-break: last row under (ts, v) sort -> v=5
        assert out["matched_v"].tolist() == [5]

    @pytest.mark.parametrize("strict", [False, True])
    def test_split_path_identical(self, ray_session, strict):
        """split_us (mega-key carry-forward path) must equal the unsplit
        result exactly: sparse-rights keys where the carry reaches back
        MANY empty ranges, ties at range boundaries, keys with no rights
        at all, and lefts before the first right (null match)."""
        import pandas as pd
        import ray.data

        from ir_search_engine_ray.extras import joins

        rng = np.random.default_rng(41)
        n_l, n_r = 200, 60
        left = pa.table(
            {
                "k": pa.array(rng.integers(0, 5, n_l), type=pa.int64()),
                "ts": pa.array(rng.integers(0, 300, n_l), type=pa.int64()),
                "lid": pa.array(np.arange(n_l), type=pa.int64()),
            }
        )
        # key 4 gets NO rights; key 3's rights all sit in the first range
        rk = rng.integers(0, 3, n_r)
        rts = rng.integers(0, 300, n_r)
        rk = np.concatenate([rk, [3, 3]])
        rts = np.concatenate([rts, [1, 2]])
        right = pa.table(
            {
                "k": pa.array(rk, type=pa.int64()),
                "ts": pa.array(rts, type=pa.int64()),
                "v": pa.array(
                    rng.integers(0, 9, rk.size), type=pa.int64()
                ),
            }
        )
        kw = dict(
            by="k", on="ts", left_cols=["lid"], right_value_cols=["v"],
            strict=strict,
        )
        canon = lambda df: df.sort_values("lid", ignore_index=True)
        base = canon(
            joins.asof_join(
                ray.data.from_arrow(left).repartition(3),
                ray.data.from_arrow(right).repartition(2),
                **kw,
            ).to_pandas()
        )
        split = canon(
            joins.asof_join(
                ray.data.from_arrow(left).repartition(3),
                ray.data.from_arrow(right).repartition(2),
                split_us=20,
                **kw,
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(base, split)
        assert base["matched_ts"].notna().any()
        assert base["matched_ts"].isna().any()  # key 4 + early lefts

    def test_split_rejects_bad_split(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import joins

        t = pa.table({"k": pa.array([1]), "ts": pa.array([1]),
                      "lid": pa.array([1])})
        with pytest.raises(ValueError, match="split_us"):
            joins.asof_join(
                ray.data.from_arrow(t), ray.data.from_arrow(t),
                by="k", on="ts", left_cols=["lid"], split_us=-5,
            )

    def test_split_rejects_null_timestamps(self, ray_session):
        """Nulls in the range column raise a CLEAR error on the split path
        (a null would otherwise silently poison the range keys)."""
        import ray.data

        from ir_search_engine_ray.extras import joins

        left = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([5, None], type=pa.int64()),
                "lid": pa.array([0, 1], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "ts": pa.array([3], type=pa.int64()),
            }
        )
        with pytest.raises(Exception, match="contains nulls"):
            joins.asof_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                by="k", on="ts", left_cols=["lid"], split_us=10,
            ).to_pandas()


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


class TestTextClean:
    def test_newline_dedup(self, ray_session):
        from ir_search_engine_ray.extras import textclean

        t = pa.table(
            {
                "doc_id": pa.array([0], type=pa.int64()),
                "text": pa.array(["nav\nbody one\nnav\nbody two\nnav"]),
            }
        )
        out = textclean.dedup_lines(t).to_pydict()
        assert out["n_lines"] == [5]
        assert out["n_kept"] == [3]
        assert out["text_clean"] == ["nav\nbody one\nbody two"]

    def test_reflow_dedup(self, ray_session):
        from ir_search_engine_ray.extras import textclean

        # 'a b a b' in 2-token lines -> 'a b' twice -> kept once
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["a b a b c", ""]),
            }
        )
        out = textclean.dedup_lines(t, line_tokens=2).to_pydict()
        assert out["n_lines"] == [3, 0]
        assert out["n_kept"] == [2, 0]
        assert out["text_clean"] == ["a b\nc", ""]


class TestAggregates:
    def test_exact_quantiles_lower_order_stat(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import aggregates

        # values 1..10; q=0.5 -> rank floor(0.5*9)=4 -> value 5
        t = pa.table({"v": pa.array(list(range(1, 11)), type=pa.int64())})
        out = aggregates.exact_quantiles(
            ray.data.from_arrow(t).repartition(3), "v", qs=(0.0, 0.5, 1.0)
        ).to_pydict()
        assert out["value"] == [1, 5, 10]

    def test_quantiles_with_duplicates(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import aggregates

        t = pa.table({"v": pa.array([7] * 99 + [100], type=pa.int64())})
        out = aggregates.exact_quantiles(
            ray.data.from_arrow(t), "v", qs=(0.5, 0.95, 1.0)
        ).to_pydict()
        assert out["value"] == [7, 7, 100]

    def test_top_terms_tie_break(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import aggregates

        t = pa.table(
            {
                "lang": pa.array(["en", "en", "fr"]),
                "text": pa.array(["zz aa zz aa bb", "aa", "oui oui non"]),
            }
        )
        out = (
            aggregates.top_terms_per_group(
                ray.data.from_arrow(t), group_col="lang", k=2
            )
            .to_pandas()
            .sort_values(["lang", "rank"], ignore_index=True)
        )
        # en: aa(3) beats zz(2) on count; fr: oui(2), non(1)
        assert out["term"].tolist() == ["aa", "zz", "oui", "non"]
        assert out["rank"].tolist() == [1, 2, 1, 2]


class TestIntervalJoin:
    def _run(self, left, right, **kw):
        import ray.data

        from ir_search_engine_ray.extras import joins

        return joins.interval_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), **kw
        ).to_pandas()

    def test_containment_and_nulls(self, ray_session):
        left = pa.table(
            {
                "k": pa.array([1, 1, 1, 2], type=pa.int64()),
                "ts": pa.array([5, 15, 25, 5], type=pa.int64()),
                "lid": pa.array([0, 1, 2, 3], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "lo": pa.array([0, 20], type=pa.int64()),
                "hi": pa.array([10, 30], type=pa.int64()),
                "iv": pa.array([100, 200], type=pa.int64()),
            }
        )
        out = self._run(
            left, right, by="k", on="ts", start="lo", end="hi",
            left_cols=["lid"], interval_cols=["iv"],
        ).sort_values("lid", ignore_index=True)
        got = out["matched_iv"].tolist()
        assert got[0] == 100  # ts 5 in [0,10]
        assert np.isnan(got[1])  # ts 15 in the gap
        assert got[2] == 200  # ts 25 in [20,30]
        assert np.isnan(got[3])  # key 2 has no intervals

    def test_boundaries_inclusive(self, ray_session):
        left = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([0, 10], type=pa.int64()),
                "lid": pa.array([0, 1], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "lo": pa.array([0], type=pa.int64()),
                "hi": pa.array([10], type=pa.int64()),
                "iv": pa.array([7], type=pa.int64()),
            }
        )
        out = self._run(
            left, right, by="k", on="ts", start="lo", end="hi",
            left_cols=["lid"], interval_cols=["iv"],
        )
        assert out["matched_iv"].tolist() == [7, 7]

    def test_split_path_identical(self, ray_session):
        """split_us (range-tagged left + per-range interval replication)
        must equal the unsplit single-match result, including unmatched
        nulls and intervals spanning several ranges."""
        import pandas as pd

        rng = np.random.default_rng(17)
        n_l, n_iv = 120, 10
        left = pa.table(
            {
                "k": pa.array(rng.integers(0, 4, n_l), type=pa.int64()),
                "ts": pa.array(rng.integers(0, 200, n_l), type=pa.int64()),
                "lid": pa.array(np.arange(n_l), type=pa.int64()),
            }
        )
        # non-overlapping per key: one interval per (key, slot of 50)
        ks, los, his, ivs = [], [], [], []
        for k in range(4):
            for slot in range(4):
                if rng.random() < 0.7:
                    lo = slot * 50 + int(rng.integers(0, 10))
                    ks.append(k)
                    los.append(lo)
                    his.append(lo + int(rng.integers(5, 35)))
                    ivs.append(len(ivs))
        right = pa.table(
            {
                "k": pa.array(ks, type=pa.int64()),
                "lo": pa.array(los, type=pa.int64()),
                "hi": pa.array(his, type=pa.int64()),
                "iv": pa.array(ivs, type=pa.int64()),
            }
        )
        kw = dict(
            by="k", on="ts", start="lo", end="hi",
            left_cols=["lid"], interval_cols=["iv"],
        )
        canon = lambda df: df.sort_values("lid", ignore_index=True)
        base = canon(self._run(left, right, **kw))
        split = canon(self._run(left, right, split_us=15, **kw))
        pd.testing.assert_frame_equal(base, split)
        assert base["matched_iv"].notna().any()
        assert base["matched_iv"].isna().any()

    def test_overlap_raises(self, ray_session):
        left = pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "ts": pa.array([5], type=pa.int64()),
                "lid": pa.array([0], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "lo": pa.array([0, 5], type=pa.int64()),
                "hi": pa.array([10, 20], type=pa.int64()),
                "iv": pa.array([1, 2], type=pa.int64()),
            }
        )
        with pytest.raises(Exception, match="overlapping"):
            self._run(
                left, right, by="k", on="ts", start="lo", end="hi",
                left_cols=["lid"], interval_cols=["iv"],
            )


class TestIntervalJoinMulti:
    def _run(self, left, right, **kw):
        import ray.data

        from ir_search_engine_ray.extras import joins

        return joins.interval_join_multi(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            **kw,
        ).to_pandas()

    def _fixture(self, seed=7, n_left=80, n_iv=12, n_keys=3):
        rng = np.random.default_rng(seed)
        left = pa.table(
            {
                "k": pa.array(
                    rng.integers(0, n_keys, n_left), type=pa.int64()
                ),
                "ts": pa.array(
                    rng.integers(0, 100, n_left), type=pa.int64()
                ),
                "lid": pa.array(np.arange(n_left), type=pa.int64()),
            }
        )
        lo = rng.integers(0, 90, n_iv)
        right = pa.table(
            {
                "k": pa.array(rng.integers(0, n_keys, n_iv), type=pa.int64()),
                "lo": pa.array(lo, type=pa.int64()),
                "hi": pa.array(lo + rng.integers(5, 40, n_iv),
                               type=pa.int64()),
                "iv": pa.array(np.arange(n_iv), type=pa.int64()),
            }
        )
        return left, right

    @staticmethod
    def _brute_pairs(left, right):
        lp, rp = left.to_pandas(), right.to_pandas()
        pairs = set()
        for _, lr in lp.iterrows():
            for _, rr in rp.iterrows():
                if lr.k == rr.k and rr.lo <= lr.ts <= rr.hi:
                    pairs.add((lr.lid, rr.iv))
        return pairs

    def test_inner_matches_brute_force(self, ray_session):
        left, right = self._fixture()
        out = self._run(
            left, right, by="k", on="ts", start="lo", end="hi",
            left_cols=["lid"], interval_cols=["iv"],
        )
        got = set(zip(out["lid"], out["matched_iv"]))
        want = self._brute_pairs(left, right)
        assert got == want and len(out) == len(want)  # no dup rows
        # overlap actually exercised: some left row matched >1 interval
        assert out["lid"].duplicated().any()

    def test_left_emits_unmatched_once_with_nulls(self, ray_session):
        left, right = self._fixture(seed=11)
        out = self._run(
            left, right, by="k", on="ts", start="lo", end="hi",
            left_cols=["lid"], interval_cols=["iv"], how="left",
        )
        want = self._brute_pairs(left, right)
        matched_lids = {lid for lid, _ in want}
        got_matched = set(
            zip(out.loc[out["matched_iv"].notna(), "lid"],
                out.loc[out["matched_iv"].notna(), "matched_iv"])
        )
        assert got_matched == want
        unmatched = out.loc[out["matched_iv"].isna(), "lid"]
        assert set(unmatched) == set(range(left.num_rows)) - matched_lids
        assert not unmatched.duplicated().any()
        assert len(out) == len(want) + len(unmatched)

    def test_boundaries_inclusive_both_ends(self, ray_session):
        left = pa.table(
            {
                "k": pa.array([1, 1, 1], type=pa.int64()),
                "ts": pa.array([0, 10, 11], type=pa.int64()),
                "lid": pa.array([0, 1, 2], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "lo": pa.array([0, 10], type=pa.int64()),
                "hi": pa.array([10, 20], type=pa.int64()),
                "iv": pa.array([100, 200], type=pa.int64()),
            }
        )
        out = self._run(
            left, right, by="k", on="ts", start="lo", end="hi",
            left_cols=["lid"], interval_cols=["iv"],
        )
        got = sorted(zip(out["lid"], out["matched_iv"]))
        assert got == [(0, 100), (1, 100), (1, 200), (2, 200)]

    def test_bad_how_raises(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import joins

        left, right = self._fixture()
        with pytest.raises(ValueError, match="how"):
            joins.interval_join_multi(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                by="k", on="ts", start="lo", end="hi",
                left_cols=["lid"], interval_cols=["iv"], how="outer",
            )

    def test_inverted_interval_raises(self, ray_session):
        """start > end (e.g. swapped column arguments) is a loud error,
        not a silent empty result — mirrors interval_join's validation."""
        left, right = self._fixture()
        with pytest.raises(Exception, match="inverted interval"):
            self._run(
                left, right, by="k", on="ts", start="hi", end="lo",
                left_cols=["lid"], interval_cols=["iv"],
            )

    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_split_path_identical(self, ray_session, how):
        """split_us (the mega-key scale path: left rows range-tagged,
        intervals replicated per overlapped range) returns exactly the
        unsplit result — including intervals spanning MANY ranges."""
        import pandas as pd

        left, right = self._fixture(seed=23, n_left=120, n_iv=15)
        kw = dict(
            by="k", on="ts", start="lo", end="hi",
            left_cols=["lid"], interval_cols=["iv"], how=how,
        )
        canon = lambda df: df.sort_values(
            ["lid", "matched_iv"], ignore_index=True
        )
        base = canon(self._run(left, right, **kw))
        # split_us=7: typical interval length ~5-40, so most intervals
        # replicate into several ranges
        split = canon(self._run(left, right, split_us=7, **kw))
        pd.testing.assert_frame_equal(base, split)
        assert base["lid"].duplicated().any()  # overlap exercised

    def test_split_rejects_bad_split(self, ray_session):
        left, right = self._fixture()
        with pytest.raises(ValueError, match="split_us"):
            self._run(
                left, right, by="k", on="ts", start="lo", end="hi",
                left_cols=["lid"], interval_cols=["iv"], split_us=0,
            )

    def test_validation_not_data_dependent(self, ray_session):
        """The inverted-interval check fires even for a key that has NO
        left rows (validation must run before the empty-group early
        return) — and interval_join's overlap check behaves the same."""
        import ray.data

        from ir_search_engine_ray.extras import joins

        left = pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "ts": pa.array([5], type=pa.int64()),
                "lid": pa.array([0], type=pa.int64()),
            }
        )
        bad = pa.table(  # key 2: inverted interval; key 2 has no left rows
            {
                "k": pa.array([2], type=pa.int64()),
                "lo": pa.array([10], type=pa.int64()),
                "hi": pa.array([0], type=pa.int64()),
                "iv": pa.array([1], type=pa.int64()),
            }
        )
        with pytest.raises(Exception, match="inverted interval"):
            self._run(
                left, bad, by="k", on="ts", start="lo", end="hi",
                left_cols=["lid"], interval_cols=["iv"],
            )
        overlapping = pa.table(  # key 2: overlapping; no left rows for it
            {
                "k": pa.array([2, 2], type=pa.int64()),
                "lo": pa.array([0, 5], type=pa.int64()),
                "hi": pa.array([10, 20], type=pa.int64()),
                "iv": pa.array([1, 2], type=pa.int64()),
            }
        )
        with pytest.raises(Exception, match="overlapping"):
            joins.interval_join(
                ray.data.from_arrow(left),
                ray.data.from_arrow(overlapping),
                by="k", on="ts", start="lo", end="hi",
                left_cols=["lid"], interval_cols=["iv"],
            ).to_pandas()


class TestRollingStats:
    def test_cumulative_matches_pandas(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        t = pa.table(
            {
                "event_id": pa.array([3, 1, 2, 4], type=pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
                "ts": pa.array(
                    [20 * us, 10 * us, 10 * us, 5 * us],
                    type=pa.timestamp("us"),
                ),
                "value": pa.array([1.5, 2.0, 3.0, 7.0]),
            }
        )
        out = (
            windows.rolling_user_stats(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values(["user_id", "cum_n"], ignore_index=True)
        )
        # user 1 order: (ts10,eid1), (ts10,eid2), (ts20,eid3)
        assert out["event_id"].tolist() == [1, 2, 3, 4]
        assert out["cum_n"].tolist() == [1, 2, 3, 1]
        assert out["cum_value"].tolist() == [2.0, 5.0, 6.5, 7.0]

    def test_split_path_identical_to_default(self, ray_session):
        """Range-split rolling stats (the mega-user scale path) must equal
        the per-user path after the 6-decimal rounding, including events
        straddling range boundaries — mirrors TestSessionizeSplit."""
        import pandas as pd
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        rng = np.random.default_rng(31)
        rows = []
        eid = 0
        for uid in range(6):
            t = 0
            for _ in range(int(rng.integers(30, 80))):
                t += int(rng.integers(1, 40)) * us
                rows.append((eid, uid, t, round(float(rng.uniform(0, 50)), 2)))
                eid += 1
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows], type=pa.float64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        canon = lambda df: df.sort_values(
            ["user_id", "cum_n"], ignore_index=True
        )[["event_id", "user_id", "ts", "cum_n", "cum_value"]]
        base = canon(windows.rolling_user_stats(ds).to_pandas())
        # 100s ranges: every user's history spans many ranges
        split = canon(
            windows.rolling_user_stats(ds, split_us=100 * us).to_pandas()
        )
        pd.testing.assert_frame_equal(base, split)
        assert base["cum_n"].max() > 1

    def test_split_handles_negative_event_id(self, ray_session):
        """Regression: the carry marker is a dedicated column, not an
        event_id=-1 sentinel — a REAL event with id -1 must come through
        the split path intact (it used to be dropped and double-join the
        rest of its range)."""
        import pandas as pd
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        t = pa.table(
            {
                "event_id": pa.array([-1, 1, 2], type=pa.int64()),
                "user_id": pa.array([7, 7, 7], type=pa.int64()),
                "ts": pa.array(
                    [10 * us, 150 * us, 260 * us], type=pa.timestamp("us")
                ),
                "value": pa.array([10.0, 1.0, 2.0]),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        canon = lambda df: df.sort_values(
            ["user_id", "cum_n"], ignore_index=True
        )[["event_id", "user_id", "ts", "cum_n", "cum_value"]]
        base = canon(windows.rolling_user_stats(ds).to_pandas())
        split = canon(
            windows.rolling_user_stats(ds, split_us=100 * us).to_pandas()
        )
        pd.testing.assert_frame_equal(base, split)
        assert split["event_id"].tolist() == [-1, 1, 2]
        assert split["cum_value"].tolist() == [10.0, 11.0, 13.0]

    def test_split_preserves_user_id_type(self, ray_session):
        """Regression: split mode must not coerce user_id to int64 — a
        string-keyed corpus gets the same schema and values on both
        paths."""
        import pandas as pd
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        t = pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "user_id": pa.array(["alice", "alice", "bob", "alice"]),
                "ts": pa.array(
                    [5 * us, 150 * us, 20 * us, 260 * us],
                    type=pa.timestamp("us"),
                ),
                "value": pa.array([1.0, 2.0, 7.0, 3.0]),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        canon = lambda df: df.sort_values(
            ["user_id", "cum_n"], ignore_index=True
        )[["event_id", "user_id", "ts", "cum_n", "cum_value"]]
        base = canon(windows.rolling_user_stats(ds).to_pandas())
        split = canon(
            windows.rolling_user_stats(ds, split_us=100 * us).to_pandas()
        )
        pd.testing.assert_frame_equal(base, split)
        assert split["user_id"].tolist() == ["alice"] * 3 + ["bob"]

    def test_split_single_range_user(self, ray_session):
        """A user entirely inside one range exercises the off=0 carry."""
        import ray.data

        from ir_search_engine_ray.extras import windows

        us = 1_000_000
        t = pa.table(
            {
                "event_id": pa.array([0, 1], type=pa.int64()),
                "user_id": pa.array([9, 9], type=pa.int64()),
                "ts": pa.array([3 * us, 5 * us], type=pa.timestamp("us")),
                "value": pa.array([1.0, 2.0], type=pa.float64()),
            }
        )
        out = (
            windows.rolling_user_stats(
                ray.data.from_arrow(t), split_us=3600 * us
            )
            .to_pandas()
            .sort_values("cum_n", ignore_index=True)
        )
        assert out["cum_n"].tolist() == [1, 2]
        assert out["cum_value"].tolist() == [1.0, 3.0]


class TestStratifiedSample:
    def test_rates_and_determinism(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import splits

        t = pa.table(
            {
                "doc_id": pa.array(list(range(2000)), type=pa.int64()),
                "lang": pa.array((["en"] * 3 + ["fr"])[i % 4] for i in range(2000)),
            }
        )
        ds = ray.data.from_arrow(t)
        a = splits.stratified_sample(
            ds, by="lang", rates_bp={"en": 5000, "fr": 10000}
        ).to_pandas()
        b = splits.stratified_sample(
            ds.repartition(7), by="lang", rates_bp={"en": 5000, "fr": 10000}
        ).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partition-proof
        n_en = (a["lang"] == "en").sum()
        assert abs(n_en / 1500 - 0.5) < 0.06  # ~50% of en kept
        assert (a["lang"] == "fr").sum() == 500  # 100% of fr kept

    def test_nested_samples_monotone(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import splits

        t = pa.table(
            {
                "doc_id": pa.array(list(range(1000)), type=pa.int64()),
                "lang": pa.array(["en"] * 1000),
            }
        )
        ds = ray.data.from_arrow(t)
        small = set(
            splits.stratified_sample(ds, by="lang", rates_bp={"en": 2000})
            .to_pandas()["doc_id"]
        )
        big = set(
            splits.stratified_sample(ds, by="lang", rates_bp={"en": 6000})
            .to_pandas()["doc_id"]
        )
        assert small <= big  # raising a rate only adds rows

    def test_default_rate_and_validation(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import splits

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "lang": pa.array(["xx", "xx"]),
            }
        )
        out = splits.stratified_sample(
            ray.data.from_arrow(t), by="lang", rates_bp={"en": 100}
        ).to_pandas()
        assert len(out) == 0  # unknown stratum -> default 0 bp
        with pytest.raises(ValueError, match="bp"):
            splits.stratified_sample(
                ray.data.from_arrow(t), by="lang", rates_bp={"en": 10001}
            )


class TestSemistructured:
    def test_flatten_handles_malformed(self, ray_session):
        from ir_search_engine_ray.extras import semistructured

        t = pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
                "props": pa.array(
                    [
                        '{"k": 7, "s": "x"}',
                        '{"s": "only string"}',   # missing k
                        "not json at all",         # malformed
                        None,                      # null cell
                        '{"k": "seven"}',          # wrong type
                        "[1, 2]",                  # non-object json
                    ]
                ),
            }
        )
        out = semistructured.flatten_json(
            t, col="props",
            fields={"k": pa.int64(), "s": pa.string()},
            keep=("event_id",),
        ).to_pydict()
        assert out["k"] == [7, None, None, None, None, None]
        assert out["s"] == ["x", "only string", None, None, None, None]

    def test_rollup_counts(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import semistructured

        t = pa.table(
            {
                "event_type": pa.array(["a", "a", "b", "b"]),
                "props": pa.array(
                    ['{"k": 1}', "bad", '{"k": 5}', '{"k": 10}']
                ),
            }
        )
        out = (
            semistructured.json_field_rollup(
                ray.data.from_arrow(t).repartition(2), field="k"
            )
            .to_pandas()
            .sort_values("event_type", ignore_index=True)
        )
        assert out["n_events"].tolist() == [2, 2]
        assert out["n_with_field"].tolist() == [1, 2]
        assert out["sum_field"].tolist() == [1, 15]


class TestRepetition:
    def test_duplicate_ngram_fractions(self, ray_session):
        from ir_search_engine_ray.extras import textstats

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "nav bar nav bar nav bar",  # pure boilerplate loop
                        "all words here are fully distinct",
                        "xy",                        # single token: no grams
                    ]
                ),
            }
        )
        out = textstats.repetition_signals(t).to_pydict()
        # doc0 tokens: nav bar nav bar nav bar -> 5 bigrams, all of
        # ('nav','bar') x3 / ('bar','nav') x2 -> every occurrence duplicated
        assert out["n_2grams"] == [5, 5, 0]
        assert out["n_dup_2grams"] == [5, 0, 0]
        assert out["n_3grams"] == [4, 4, 0]
        assert out["n_dup_3grams"] == [4, 0, 0]


class TestGroupedQuantilesAndTfidf:
    def test_grouped_quantiles_match_per_group_serial(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import aggregates

        rng = np.random.default_rng(13)
        langs = np.array(["en", "fr"])[rng.integers(0, 2, size=400)]
        vals = rng.integers(10, 500, size=400)
        t = pa.table(
            {
                "lang": pa.array(langs.tolist()),
                "n_chars": pa.array(vals, type=pa.int64()),
            }
        )
        out = (
            aggregates.exact_quantiles_by(
                ray.data.from_arrow(t).repartition(5), "n_chars", "lang",
                qs=(0.0, 0.5, 1.0),
            )
            .to_pandas()
            .sort_values(["lang", "quantile"], ignore_index=True)
        )
        for lang in ("en", "fr"):
            sub = np.sort(vals[langs == lang])
            got = out[out["lang"] == lang]["value"].tolist()
            want = [
                int(sub[int(np.floor(q * (sub.size - 1)))])
                for q in (0.0, 0.5, 1.0)
            ]
            assert got == want, lang

    def test_tfidf_join_matches_serial(self, ray_session):
        import math

        import ray.data

        from ir_search_engine_ray.extras import aggregates

        texts = ["apple banana apple", "banana cherry", "apple cherry date"]
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        out = (
            aggregates.tfidf_postings(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .set_index(["doc_id", "term"])
        )
        df = {"apple": 2, "banana": 2, "cherry": 2, "date": 1}
        assert out.loc[(0, "apple")]["tf"] == 2
        for (did, term), row in out.iterrows():
            want = round(
                row["tf"] * math.log(3 / df[term]) / math.log(3), 6
            )
            assert row["w"] == want, (did, term)


class TestLshAnn:
    def _emb(self, n=200, dim=16, seed=5):
        import ray.data

        rng = np.random.default_rng(seed)
        mat = rng.normal(size=(n, dim))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [r.tolist() for r in mat], type=pa.list_(pa.float64())
                ),
            }
        )
        return ray.data.from_arrow(t).repartition(4), mat

    def test_full_probe_equals_exact(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb(n=120)
        q = mat[7]
        exact = ann.cosine_topk(ds, q, k=5, exclude=7).to_pandas()
        lsh = ann.lsh_topk(
            ds, q, k=5, n_planes=6, n_tables=2, probe_hamming=6, exclude=7
        ).to_pandas()
        assert lsh["vec_id"].tolist() == exact["vec_id"].tolist()
        assert lsh["cosine"].tolist() == exact["cosine"].tolist()

    def test_partial_probe_recall(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb(n=300)
        q = mat[11]
        exact = set(
            ann.cosine_topk(ds, q, k=10, exclude=11)["vec_id"].to_pylist()
        )
        lsh = set(
            ann.lsh_topk(
                ds, q, k=10, n_planes=10, n_tables=6, probe_hamming=2,
                exclude=11,
            )["vec_id"].to_pylist()
        )
        assert len(exact & lsh) >= 5  # approximate but not garbage

    def test_deterministic_across_partitionings(self, ray_session):
        from ir_search_engine_ray.extras import ann

        ds, mat = self._emb(n=150)
        a = ann.lsh_topk(ds, mat[3], k=8, exclude=3).to_pandas()
        b = ann.lsh_topk(
            ds.repartition(9), mat[3], k=8, exclude=3
        ).to_pandas()
        assert a["vec_id"].tolist() == b["vec_id"].tolist()


class TestAdviceR3Fixes:
    """Regression tests for the round-3 ADVICE items (extras side)."""

    def test_verify_jaccard_sketch_byte_ceiling_spills(
        self, ray_session, monkeypatch
    ):
        """The broadcast verify path is bounded by sketch BYTES, not just
        pair count: with a tiny byte ceiling it must abandon the broadcast
        mid-assembly and rerun partitioned — same verified pairs."""
        from ir_search_engine_ray.extras import dedup

        docs = _docs_ds(CORPUS, num_blocks=2)
        pairs = dedup.minhash_lsh_pairs(docs)
        want = dedup.verify_jaccard(pairs, docs, threshold=0.3).to_pandas()
        monkeypatch.setattr(dedup, "BROADCAST_SKETCH_BYTES_MAX", 1)
        got = dedup.verify_jaccard(
            pairs, docs, threshold=0.3, broadcast_pairs_max=10_000
        ).to_pandas()

        def key(df):
            return sorted(map(tuple, df.values.tolist()))

        assert key(got) == key(want)
        assert len(got) > 0

    def test_partitioned_verify_large_string_corpus(self, ray_session):
        """A large_string text column (the common big-parquet shape) must
        flow through the partitioned verify path: the pair side's null-text
        placeholder carries the corpus text type."""
        import ray.data

        from ir_search_engine_ray.extras import dedup

        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in CORPUS], type=pa.int64()),
                "text": pa.array(
                    [r[1] for r in CORPUS], type=pa.large_string()
                ),
            }
        )
        docs = ray.data.from_arrow(t).repartition(2)
        pairs = dedup.minhash_lsh_pairs(docs)
        out = dedup.verify_jaccard(
            pairs, docs, threshold=0.3, broadcast_pairs_max=0
        ).to_pandas()
        got = {tuple(p) for p in out[["doc_a", "doc_b"]].itertuples(index=False)}
        assert (0, 1) in got and (0, 3) in got

    def test_anti_join_large_string_and_narrow_id(self, ray_session):
        """anti_join_ids with a non-default id type and large_string payload:
        the right side's placeholder rows must match the left schema."""
        import ray.data

        from ir_search_engine_ray.extras import dedup

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int32()),
                "text": pa.array(
                    [r[1] for r in CORPUS], type=pa.large_string()
                ),
            }
        )
        left = ray.data.from_arrow(t).repartition(2)
        ids = ray.data.from_arrow(
            pa.table({"doc_b": pa.array([1, 3], type=pa.int64())})
        )
        out = dedup.anti_join_ids(left, ids).to_pandas()
        assert sorted(out["doc_id"]) == [0, 2, 4]

    def test_tfidf_rejects_single_doc(self, ray_session):
        from ir_search_engine_ray.extras import aggregates

        docs = _docs_ds(CORPUS[:1])
        with pytest.raises(ValueError, match="n_docs >= 2"):
            aggregates.tfidf_postings(docs)
        with pytest.raises(ValueError, match="n_docs >= 2"):
            aggregates.tfidf_postings(_docs_ds(CORPUS), n_docs=1)


class TestFuzzy:
    """SymSpell deletion-neighborhood lookup (extras/fuzzy.py)."""

    @staticmethod
    def _naive_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def test_lev_leq_matches_naive(self):
        from ir_search_engine_ray.extras.fuzzy import lev_leq

        words = ["", "a", "ab", "abc", "abcd", "bacd", "abxd", "xabcd",
                 "abd", "dcba", "abcde", "aabbcc", "kitten", "sitting"]
        for a in words:
            for b in words:
                true = self._naive_lev(a, b)
                for d in (1, 2, 3):
                    got = lev_leq(a, b, d)
                    if true <= d:
                        assert got == true, (a, b, d)
                    else:
                        assert got is None, (a, b, d)

    def test_lookup_matches_brute_force(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import fuzzy

        vocab_terms = [
            "model", "modal", "mode", "models", "modelz", "cat", "cart",
            "chart", "thermal", "termal", "theral", "boundary", "boundry",
        ]
        vocab = ray.data.from_arrow(
            pa.table(
                {
                    "term": pa.array(vocab_terms, type=pa.string()),
                    "df": pa.array(
                        list(range(1, len(vocab_terms) + 1)), type=pa.int64()
                    ),
                }
            )
        ).repartition(3)
        probes = ["model", "thermal", "boundury"]
        for d in (1, 2):
            out = fuzzy.fuzzy_vocab_lookup(vocab, probes, max_edits=d).to_pandas()
            got = {
                (r["query"], r["term"]): (r["dist"], r["df"])
                for _, r in out.iterrows()
            }
            want = {}
            for q in probes:
                for ti, t in enumerate(vocab_terms, 1):
                    dist = self._naive_lev(q, t)
                    if dist <= d:
                        want[(q, t)] = (dist, ti)
            assert got == want, f"d={d}"

    def test_lookup_empty_and_validation(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import fuzzy

        vocab = ray.data.from_arrow(
            pa.table(
                {
                    "term": pa.array(["zzzzzzzz"], type=pa.string()),
                    "df": pa.array([1], type=pa.int64()),
                }
            )
        )
        out = fuzzy.fuzzy_vocab_lookup(vocab, ["cat"], max_edits=1)
        # schema survives an all-empty result (ray's to_pandas drops the
        # columns of a fully empty dataset, so assert on the dataset schema)
        assert out.schema().names == ["query", "term", "dist", "df"]
        assert out.count() == 0
        with pytest.raises(ValueError, match="non-empty"):
            fuzzy.fuzzy_vocab_lookup(vocab, [], max_edits=1)
        with pytest.raises(ValueError, match="distinct"):
            fuzzy.fuzzy_vocab_lookup(vocab, ["a", "a"], max_edits=1)
        with pytest.raises(ValueError, match="max_edits"):
            fuzzy.fuzzy_vocab_lookup(vocab, ["a"], max_edits=0)

    def test_cli_fuzzy_over_index_lexicon(self, ray_session, built, capsys):
        """The fuzzy CLI verb streams the index's df parts as the
        vocabulary: a one-deletion misspelling of an indexed term recovers
        it; garbage probes return nothing."""
        import argparse
        import json as _json

        import pyarrow.parquet as pq

        from ir_search_engine_ray.cli import _cmd_fuzzy

        df_t = pq.read_table(str(built.out_dir) + "/df")
        term = next(
            t for t in df_t["term"].to_pylist() if len(t) >= 5
        )
        probe = term[:2] + term[3:]  # delete char 2
        _cmd_fuzzy(
            argparse.Namespace(
                index_dir=str(built.out_dir),
                terms=f"{probe} qqqqzzzz",
                max_edits=1,
            )
        )
        rows = [
            _json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        ]
        assert any(r["query"] == probe and r["term"] == term for r in rows)
        assert all(r["query"] != "qqqqzzzz" for r in rows)


class TestSpanDedup:
    """Exact-substring (k-gram span) dedup (extras/spans.py)."""

    SHARE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def _docs(self):
        return [
            (0, "intro words here " + self.SHARE + " tail piece"),
            (1, "other opening " + self.SHARE + " different ending words"),
            (2, "totally unrelated content with no overlap at all here"),
            # exactly the first 8 shared tokens
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
            # repeats ITS OWN 8-gram twice but shares with nobody: must
            # NOT appear (duplication is across distinct docs)
            (5, "solo run one two three four five six seven eight "
                "solo run one two three four five six seven eight"),
        ]

    def test_token_hash_memo_is_bounded(self):
        """The per-worker token-hash memo caps at _HASH_MEMO_MAX (round-5
        fix): a long-lived worker streaming a 100 TB vocabulary must not
        accumulate the full distinct-token set."""
        from ir_search_engine_ray.extras import spans

        spans._HASH_MEMO.clear()
        old_max = spans._HASH_MEMO_MAX
        try:
            spans._HASH_MEMO_MAX = 100
            vals = {t: spans._token_hash(t) for t in (f"tok{i}" for i in range(350))}
            assert len(spans._HASH_MEMO) <= 100
            # hashing stays deterministic across the cap resets
            for t, v in list(vals.items())[:50]:
                assert spans._token_hash(t) == v
        finally:
            spans._HASH_MEMO_MAX = old_max
            spans._HASH_MEMO.clear()

    def test_known_coverage_and_partition_independence(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import spans

        for nb in (1, 4):
            out = (
                spans.exact_span_dedup(_docs_ds(self._docs(), nb), k=8)
                .to_pandas()
                .sort_values("doc_id", ignore_index=True)
            )
            # docs 0/1 share the 10-token run: 3 8-gram starts, 10 covered
            got = {
                r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
                for _, r in out.iterrows()
            }
            assert got == {0: (3, 10), 1: (3, 10), 3: (1, 8)}, nb

    def test_validation_and_short_docs(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import spans

        ds = _docs_ds([(0, "too short"), (1, "too short")])
        # both docs shorter than k: no grams at all
        assert spans.exact_span_dedup(ds, k=8).count() == 0
        with pytest.raises(ValueError, match="k must be"):
            spans.exact_span_dedup(ds, k=1)


class TestUnigramLogprob:
    def test_scores_and_oov_floor(self, ray_session):
        import math

        from ir_search_engine_ray.extras import textstats

        docs = [
            (0, "the cat sat on the mat"),
            (1, "the the the the"),            # all head tokens: highest
            (2, "qzx wvu jkl"),                # all OOV under a tiny top_v
            (3, "12345 !!!"),                  # zero tokens: omitted
        ]
        # top_v=2 keeps only the 2 most frequent terms ("the", then the
        # count-1 tie broken by term asc: "cat")
        out = (
            textstats.unigram_logprob(_docs_ds(docs, 2), top_v=2)
            .to_pandas()
            .set_index("doc_id")
        )
        assert sorted(out.index) == [0, 1, 2]
        total = 6 + 4 + 3  # tokens of docs 0..2
        p_the = math.log(6 / total)
        p_cat = math.log(1 / total)
        floor = math.log(1 / total)
        want0 = round((2 * p_the + p_cat + 3 * floor) / 6, 6)
        assert out.loc[0, "logprob"] == want0
        assert out.loc[1, "logprob"] == round(p_the, 6)
        assert out.loc[2, "logprob"] == round(floor, 6)
        assert out.loc[1, "logprob"] > out.loc[0, "logprob"] > out.loc[
            2, "logprob"
        ]
        assert out.loc[0, "n_tokens"] == 6

    def test_validation(self, ray_session):
        from ir_search_engine_ray.extras import textstats

        with pytest.raises(ValueError, match="top_v"):
            textstats.unigram_logprob(_docs_ds([(0, "a b")]), top_v=0)
        with pytest.raises(ValueError, match="no tokens"):
            textstats.unigram_logprob(_docs_ds([(0, "123 !!")])).count()


class TestPCA:
    @staticmethod
    def _emb_ds(X, num_blocks=1):
        import ray.data

        n, d = X.shape
        off = np.arange(0, (n + 1) * d, d, dtype=np.int32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.ListArray.from_arrays(
                    pa.array(off), pa.array(X.ravel())
                ),
            }
        )
        ds = ray.data.from_arrow(t)
        return ds.repartition(num_blocks) if num_blocks > 1 else ds

    def test_projection_matches_numpy(self, ray_session):
        from ir_search_engine_ray.extras import ann

        rng = np.random.default_rng(42)
        X = rng.normal(size=(60, 8)) @ np.diag([5, 3, 2, 1, 0.5, 0.2, 0.1, 0.05])
        # numpy reference with the same sign convention
        mean = X.mean(axis=0)
        cov = np.cov(X, rowvar=False)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:3]
        comps = evecs[:, order].T
        flips = np.sign(
            comps[np.arange(3), np.abs(comps).argmax(axis=1)]
        )
        comps *= flips[:, None]
        want = (X - mean) @ comps.T
        for nb in (1, 4):
            got = (
                ann.pca_project(self._emb_ds(X, nb), 3)
                .to_pandas()
                .sort_values("vec_id", ignore_index=True)
            )
            mat = np.vstack(got["projection"].to_numpy())
            assert np.allclose(mat, want, atol=1e-9), nb
        # variance concentrates in the leading component
        v = want.var(axis=0)
        assert v[0] > v[1] > v[2]

    def test_validation(self, ray_session):
        from ir_search_engine_ray.extras import ann

        rng = np.random.default_rng(0)
        X = rng.normal(size=(5, 4))
        with pytest.raises(ValueError, match="n_components"):
            ann.pca_fit(self._emb_ds(X), 9)
        with pytest.raises(ValueError, match=">= 2 rows"):
            ann.pca_fit(self._emb_ds(X[:1]), 2)


class TestAnnIndex:
    """Persisted IVF index (extras/ann_index.py)."""

    def test_build_query_and_pruning(self, ray_session, tmp_path):
        import ray.data

        from ir_search_engine_ray.extras import ann
        from ir_search_engine_ray.extras.ann_index import (
            AnnIndex,
            build_ann_index,
        )

        rng = np.random.default_rng(11)
        n, d = 200, 16
        X = rng.normal(size=(n, d))
        off = np.arange(0, (n + 1) * d, d, dtype=np.int32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.ListArray.from_arrays(
                    pa.array(off), pa.array(X.ravel())
                ),
            }
        )
        emb = ray.data.from_arrow(t).repartition(4)
        out = tmp_path / "ann"
        marker = build_ann_index(emb, out, nlist=8)
        assert marker["n_rows"] == n and marker["nlist"] == 8
        # one directory per cluster — the pruning unit
        dirs = sorted(p.name for p in (out / "assign").iterdir())
        assert all(p.startswith("cluster=") for p in dirs)
        idx = AnnIndex(out)
        q = X[3]
        # full probe == exact brute force
        assert idx.query(q, k=10, nprobe=8, exclude=3).equals(
            ann.cosine_topk(emb, q, 10, exclude=3)
        )
        # partial probe returns the exact ranking RESTRICTED to the probed
        # clusters (verified against a manual filter of the same clusters)
        probe = idx.probe_clusters(q, 2)
        import pyarrow.parquet as pq

        member = set()
        for c in probe:
            cdir = out / "assign" / f"cluster={int(c)}"
            if cdir.is_dir():
                member |= set(
                    pq.read_table(cdir, columns=["vec_id"])[
                        "vec_id"
                    ].to_pylist()
                )
        got = idx.query(q, k=10, nprobe=2, exclude=3)
        assert set(got["vec_id"].to_pylist()) <= member
        restricted = emb.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(
                    b["vec_id"], value_set=pa.array(sorted(member))
                )
            ),
            batch_format="pyarrow",
        )
        assert got.equals(ann.cosine_topk(restricted, q, 10, exclude=3))

    def test_stale_or_missing_marker_refused(self, ray_session, tmp_path):
        from ir_search_engine_ray.extras.ann_index import AnnIndex

        with pytest.raises(FileNotFoundError, match="_ANN_SUCCESS"):
            AnnIndex(tmp_path / "nope")

    def test_empty_blocks_are_harmless(self, ray_session):
        """Filters can hand the moment/projection/assignment kernels an
        empty block; they must contribute nothing instead of crashing."""
        import ray.data

        from ir_search_engine_ray.extras import ann

        rng = np.random.default_rng(5)
        X = rng.normal(size=(30, 6))
        ds = TestPCA._emb_ds(X, 4)
        # an always-false filter produces empty downstream blocks
        empty = ds.map_batches(
            lambda b: b.slice(0, 0), batch_format="pyarrow"
        )
        got = ann.pca_project(ds.union(empty), 2).to_pandas()
        want = ann.pca_project(ds, 2).to_pandas()
        got = got.sort_values("vec_id", ignore_index=True)
        want = want.sort_values("vec_id", ignore_index=True)
        assert np.allclose(
            np.vstack(got["projection"]), np.vstack(want["projection"])
        )


    @staticmethod
    def _emb(X: np.ndarray, ids: np.ndarray, nb: int = 2):
        import ray.data

        n, d = X.shape
        off = np.arange(0, (n + 1) * d, d, dtype=np.int32)
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids.astype(np.int64)),
                    "embedding": pa.ListArray.from_arrays(
                        pa.array(off), pa.array(X.ravel())
                    ),
                }
            )
        ).repartition(nb)

    def test_append_stays_exact_across_generations(self, ray_session, tmp_path):
        """append_ann_index (round 5): new vectors land in a new generation
        tree assigned to the EXISTING centroids; full probe over the
        appended index == brute force over the union, pruned probe == the
        exact ranking restricted to the probed clusters' members across
        ALL generations, and an orphan generation from a crashed append is
        never served."""
        import pyarrow.parquet as pqt

        from ir_search_engine_ray.extras import ann
        from ir_search_engine_ray.extras.ann_index import (
            AnnIndex,
            append_ann_index,
            build_ann_index,
        )

        rng = np.random.default_rng(17)
        d = 12
        X = rng.normal(size=(200, d))
        base, extra, extra2 = X[:120], X[120:170], X[170:]
        out = tmp_path / "ann"
        build_ann_index(self._emb(base, np.arange(120)), out, nlist=6)
        # crash simulation: an orphan generation dir NOT in the marker
        orphan = out / "assign-g0001" / "cluster=0"
        orphan.mkdir(parents=True)
        pqt.write_table(
            pa.table(
                {
                    "vec_id": pa.array([999_999], type=pa.int64()),
                    "embedding": pa.ListArray.from_arrays(
                        pa.array([0, d], type=pa.int32()),
                        pa.array(np.zeros(d)),
                    ),
                }
            ),
            orphan / "junk.parquet",
        )
        q = X[7]
        got = AnnIndex(out).query(q, k=10, nprobe=6, exclude=7)
        assert 999_999 not in got["vec_id"].to_pylist()  # orphan unserved
        # append twice (the second proves generation numbering continues)
        m1 = append_ann_index(self._emb(extra, np.arange(120, 170)), out)
        assert m1["generations"] == ["assign", "assign-g0001"]
        assert m1["n_rows"] == 170 and m1["n_appended"] == 50
        m2 = append_ann_index(self._emb(extra2, np.arange(170, 200)), out)
        assert m2["generations"][-1] == "assign-g0002"
        assert m2["n_rows"] == 200 and m2["max_vec_id"] == 199
        idx = AnnIndex(out)
        union = self._emb(X, np.arange(200), 4)
        for qi in (3, 150, 185):
            qv = X[qi]
            # full probe == exact brute force over base + both appends
            assert idx.query(qv, k=10, nprobe=6, exclude=qi).equals(
                ann.cosine_topk(union, qv, 10, exclude=qi)
            ), qi
        # pruned probe == exact restricted to probed members, generations
        # included
        probe = idx.probe_clusters(q, 2)
        member = set()
        for gen in idx.meta["generations"]:
            for c in probe:
                cdir = out / gen / f"cluster={int(c)}"
                if cdir.is_dir():
                    member |= set(
                        pqt.read_table(cdir, columns=["vec_id"])[
                            "vec_id"
                        ].to_pylist()
                    )
        got = idx.query(q, k=10, nprobe=2, exclude=7)
        assert set(got["vec_id"].to_pylist()) <= member
        restricted = union.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(
                    b["vec_id"], value_set=pa.array(sorted(member))
                )
            ),
            batch_format="pyarrow",
        )
        assert got.equals(ann.cosine_topk(restricted, q, 10, exclude=7))

    def test_append_guards(self, ray_session, tmp_path, caplog):
        from ir_search_engine_ray.extras.ann_index import (
            append_ann_index,
            build_ann_index,
        )

        rng = np.random.default_rng(23)
        out = tmp_path / "ann"
        build_ann_index(self._emb(rng.normal(size=(60, 8)), np.arange(60)),
                        out, nlist=4)
        # overlapping ids are rejected (they would be served twice)
        with pytest.raises(ValueError, match="must sort after"):
            append_ann_index(
                self._emb(rng.normal(size=(10, 8)),
                          np.arange(55, 65)), out
            )
        # dim mismatch is rejected
        with pytest.raises(ValueError, match="dim"):
            append_ann_index(
                self._emb(rng.normal(size=(10, 5)),
                          np.arange(60, 70)), out
            )
        # no index -> explicit error
        with pytest.raises(FileNotFoundError, match="_ANN_SUCCESS"):
            append_ann_index(
                self._emb(rng.normal(size=(4, 8)),
                          np.arange(100, 104)),
                tmp_path / "nope",
            )
        # past retrain_frac the append warns to rebuild
        import logging

        with caplog.at_level(logging.WARNING,
                             logger="ir_search_engine_ray.extras.ann_index"):
            append_ann_index(
                self._emb(rng.normal(size=(40, 8)),
                          np.arange(60, 100)), out,
                retrain_frac=0.5,
            )
        assert any("retrain" in r.message for r in caplog.records)

    def test_rebuild_replaces_and_refuses_foreign_dirs(
        self, ray_session, tmp_path
    ):
        import ray.data

        from ir_search_engine_ray.extras.ann_index import (
            AnnIndex,
            build_ann_index,
        )

        rng = np.random.default_rng(3)
        X = rng.normal(size=(40, 8))
        off = np.arange(0, 41 * 8, 8, dtype=np.int32)
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(40, dtype=np.int64)),
                    "embedding": pa.ListArray.from_arrays(
                        pa.array(off), pa.array(X.ravel())
                    ),
                }
            )
        )
        out = tmp_path / "idx"
        build_ann_index(emb, out, nlist=4)
        # leftover tmp from a crashed build is swept by the next build
        (out.with_name(out.name + ".tmp")).mkdir()
        m2 = build_ann_index(emb, out, nlist=4)  # previous index: replaced
        assert m2["n_rows"] == 40
        assert AnnIndex(out).meta == m2
        # a non-index, non-empty directory is NEVER deleted
        foreign = tmp_path / "precious"
        foreign.mkdir()
        (foreign / "data.txt").write_text("do not delete")
        with pytest.raises(FileExistsError, match="refusing to overwrite"):
            build_ann_index(emb, foreign, nlist=4)
        assert (foreign / "data.txt").read_text() == "do not delete"

class TestCurateEmptyGate:
    def test_logprob_gate_on_emptied_corpus(self, ray_session):
        """If the quality gate drops everything, the logprob gate returns
        an empty typed result instead of raising from the distribution
        fit."""
        from ir_search_engine_ray.pipelines.curate import curate

        docs = [(0, "12345 !!!"), (1, "???")]  # zero alpha tokens
        out = curate(_docs_ds(docs), lang=None, min_logprob=-1.0)
        assert out.count() == 0
        # (ray's to_pandas drops the columns of a fully empty dataset, so
        # assert on the dataset schema)
        assert out.schema().names == ["doc_id", "n_tokens", "n_pieces"]


class TestHLL:
    """HyperLogLog cardinality sketch (extras/sketches.py)."""

    def test_accuracy_and_partition_invariance(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import sketches

        n = 50_000
        t = pa.table({"v": pa.array([f"u-{i}" for i in range(n)] * 2)})
        ests = []
        for nb in (1, 9):
            ds = (
                ray.data.from_arrow(t).repartition(nb)
                if nb > 1
                else ray.data.from_arrow(t)
            )
            est = sketches.hll_distinct(ds, "v", p=12)["estimate"][0].as_py()
            ests.append(est)
            # 3 sigma of the standard error 1.04/sqrt(2^12) ~ 4.9%
            assert abs(est - n) / n < 0.05, est
        # max-merge is associative/commutative/idempotent: the estimate is
        # EXACTLY partitioning-independent
        assert ests[0] == ests[1]

    def test_small_range_is_exact(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import sketches

        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(list("abcdefgh") * 5)})
        )
        # linear-counting regime: tiny cardinalities come out exact
        assert sketches.hll_distinct(ds, "v")["estimate"][0].as_py() == 8
        with pytest.raises(ValueError, match="p must be"):
            sketches.hll_registers(ds, "v", p=2)

    def test_nullable_int_column_ignores_nulls_and_stays_invariant(
        self, ray_session
    ):
        """Nulls are not values (count-distinct semantics), and the hash
        choice must depend on the column TYPE, never per-batch null
        presence — otherwise one user id hashes two ways across blocks
        and the estimate inflates with the partitioning."""
        import ray.data

        from ir_search_engine_ray.extras import sketches

        vals = list(range(12)) * 3 + [None] * 7
        t = pa.table({"v": pa.array(vals, type=pa.int64())})
        ests = set()
        for nb in (1, 5):
            ds = (
                ray.data.from_arrow(t).repartition(nb)
                if nb > 1
                else ray.data.from_arrow(t)
            )
            ests.add(
                sketches.hll_distinct(ds, "v")["estimate"][0].as_py()
            )
        assert ests == {12}  # exact in the linear-counting regime

    def test_grouped_null_group_and_value_rows_dropped(self, ray_session):
        """A null group code dictionary-encodes to a sentinel whose *m
        offset would wrap into group 0's registers; null groups and null
        values must be dropped, leaving other groups untouched."""
        import ray.data

        from ir_search_engine_ray.extras import sketches

        t = pa.table(
            {
                "v": pa.array([1, 2, 3, 4, 5, None, 6], type=pa.int64()),
                "grp": pa.array(["a", "a", None, "b", "b", "b", None]),
            }
        )
        out = sketches.hll_distinct_by(
            ray.data.from_arrow(t).repartition(2), "v", "grp"
        ).to_pandas()
        got = dict(zip(out["grp"], out["estimate"]))
        assert got == {"a": 2, "b": 2}

    def test_int_fast_path_accuracy_and_invariance(self, ray_session):
        """Null-free integer columns take the vectorized splitmix64 hash:
        same error bound and exact partition invariance as the blake2b
        path (which nullable/string columns keep)."""
        import ray.data

        from ir_search_engine_ray.extras import sketches

        n = 50_000
        t = pa.table(
            {"v": pa.array(list(range(n)) * 2, type=pa.int64())}
        )
        ests = []
        for nb in (1, 9):
            ds = (
                ray.data.from_arrow(t).repartition(nb)
                if nb > 1
                else ray.data.from_arrow(t)
            )
            est = sketches.hll_distinct(ds, "v", p=12)["estimate"][0].as_py()
            ests.append(est)
            assert abs(est - n) / n < 0.05, est
        assert ests[0] == ests[1]
        # nulls are dropped (count-distinct semantics) and the column
        # stays on the splitmix path regardless of null presence
        tn = pa.table({"v": pa.array([1, 2, None, 1], type=pa.int64())})
        got = sketches.hll_distinct(
            ray.data.from_arrow(tn), "v"
        )["estimate"][0].as_py()
        assert got == 2  # 1, 2 in the linear-counting regime

    def test_grouped_matches_global_per_group(self, ray_session):
        """hll_distinct_by(group g) == hll_distinct over g's rows alone
        (same registers, same estimate), for any partitioning; small
        groups are linear-counting exact."""
        import random

        import pyarrow.compute as pc
        import ray.data

        from ir_search_engine_ray.extras import sketches

        rows = []
        for g, k in (("a", 8), ("b", 700), ("c", 1)):
            for i in range(k):
                rows.extend([(g, f"{g}-{i}")] * 2)
        random.Random(5).shuffle(rows)
        t = pa.table(
            {
                "grp": pa.array([r[0] for r in rows]),
                "v": pa.array([r[1] for r in rows]),
            }
        )
        outs = []
        for nb in (1, 6):
            ds = (
                ray.data.from_arrow(t).repartition(nb)
                if nb > 1
                else ray.data.from_arrow(t)
            )
            df = (
                sketches.hll_distinct_by(ds, "v", "grp")
                .to_pandas()
                .sort_values("grp")
                .reset_index(drop=True)
            )
            outs.append(df)
            for g in ("a", "b", "c"):
                sub = ray.data.from_arrow(t.filter(pc.equal(t["grp"], g)))
                want = sketches.hll_distinct(sub, "v")["estimate"][0].as_py()
                got = int(df.loc[df["grp"] == g, "estimate"].iloc[0])
                assert got == want, (g, got, want)
        # tiny groups are exact; estimates partition-invariant everywhere
        assert int(outs[0].loc[outs[0]["grp"] == "a", "estimate"].iloc[0]) == 8
        assert int(outs[0].loc[outs[0]["grp"] == "c", "estimate"].iloc[0]) == 1
        assert outs[0].equals(outs[1])
        with pytest.raises(ValueError, match="p must be"):
            sketches.hll_distinct_by(
                ray.data.from_arrow(t), "v", "grp", p=2
            )

    def test_grouped_kernel_dense_and_fallback_agree(self):
        """_batch_registers_by's dense scatter-max path (small fan-out)
        and its lexsort fallback (fan-out x m over the slot budget) both
        equal per-group _batch_registers output."""
        import random

        from ir_search_engine_ray.extras.sketches import (
            _batch_registers,
            _batch_registers_by,
        )

        rnd = random.Random(7)
        groups = [f"g{i}" for i in range(40)]
        rows = [
            (rnd.choice(groups), rnd.randrange(200)) for _ in range(5000)
        ]
        batch = pa.table(
            {
                "grp": pa.array([r[0] for r in rows]),
                "v": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        )
        for p in (12, 18):  # 40 * 2^18 > the 2^23 slot budget -> fallback
            got = _batch_registers_by(batch, col="v", by="grp", p=p)
            gd = {}
            for g, r, rho in zip(
                got["group"].to_pylist(),
                got["register"].to_pylist(),
                got["rho"].to_pylist(),
            ):
                gd[(g, r)] = rho
            want = {}
            for g in groups:
                sub = batch.filter(
                    pa.compute.equal(batch["grp"], g)
                )
                ref = _batch_registers(sub, col="v", p=p)
                for r, rho in zip(
                    ref["register"].to_pylist(), ref["rho"].to_pylist()
                ):
                    want[(g, r)] = rho
            assert gd == want, p

    def test_rho_matches_reference_bit_math(self):
        import numpy as np

        from ir_search_engine_ray.extras.sketches import (
            _batch_registers,
            _hash64,
        )

        vals = [f"x{i}" for i in range(2000)]
        t = pa.table({"v": pa.array(vals)})
        got = _batch_registers(t, col="v", p=6)
        regs = dict(
            zip(got["register"].to_pylist(), got["rho"].to_pylist())
        )
        # naive reference: per value, register = top p bits, rho = leading
        # zeros of the remaining bits + 1
        want: dict[int, int] = {}
        for v, h in zip(vals, _hash64(vals)):
            h = int(h)
            reg = h >> 58
            rest = (h << 6) & ((1 << 64) - 1)
            rho = 59 if rest == 0 else (64 - rest.bit_length() + 1)
            want[reg] = max(want.get(reg, 0), rho)
        assert regs == want


class TestSampledQuantiles:
    """Bounded-memory sampled quantiles (extras/sketches.py)."""

    @staticmethod
    def _ds(values, num_blocks=1):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array(range(len(values)), type=pa.int64()),
                "v": pa.array(values),
            }
        )
        ds = ray.data.from_arrow(t)
        return ds.repartition(num_blocks) if num_blocks > 1 else ds

    def test_exact_below_cap_and_partition_invariant(self, ray_session):
        from ir_search_engine_ray.extras import aggregates, sketches

        rng = np.random.default_rng(11)
        vals = rng.integers(0, 500, size=3000).tolist()
        want = aggregates.exact_quantiles(self._ds(vals), "v")
        for nb in (1, 7):
            got = sketches.sampled_quantiles(
                self._ds(vals, nb), "v", id_col="doc_id", sample=4096
            )
            # sample >= corpus: the sample IS the corpus, result is exact
            assert got.equals(want), (got, want)

    def test_rank_error_bound_above_cap(self, ray_session):
        from ir_search_engine_ray.extras import sketches

        n, sample = 20_000, 2048
        rng = np.random.default_rng(5)
        vals = rng.normal(size=n)  # continuous: histograms can't bound this
        ordered = np.sort(vals)
        outs = []
        for nb in (1, 9):
            got = sketches.sampled_quantiles(
                self._ds(vals.tolist(), nb), "v", id_col="doc_id",
                sample=sample,
            )
            outs.append(got)
            for q, v in zip(
                got["quantile"].to_pylist(), got["value"].to_pylist()
            ):
                # realized quantile-rank of the estimate vs the target,
                # within 4/sqrt(sample) (~0.088) of q
                rank = np.searchsorted(ordered, v) / (n - 1)
                assert abs(rank - q) < 4 / np.sqrt(sample), (q, rank)
        # the rank is a pure function of the id: the selected sample — and
        # the estimate — is EXACTLY independent of partitioning
        assert outs[0].equals(outs[1])

    def test_empty_and_dtype(self, ray_session):
        import ray.data

        from ir_search_engine_ray.extras import sketches

        empty = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                }
            )
        )
        got = sketches.sampled_quantiles(empty, "v", id_col="doc_id")
        assert got.num_rows == 0
        assert got.schema.names == ["quantile", "value"]
        # float input stays float; int input comes back int64
        fl = sketches.sampled_quantiles(
            self._ds([0.5, 1.5, 2.5, 3.5]), "v", id_col="doc_id"
        )
        assert fl["value"].type == pa.float64()
        it = sketches.sampled_quantiles(
            self._ds([5, 1, 9, 3]), "v", id_col="doc_id"
        )
        assert it["value"].type == pa.int64()


class TestFrequentItems:
    """Exact heavy hitters via MG candidates + recount (extras/sketches.py)."""

    @staticmethod
    def _make(vals, num_blocks=1):
        import ray.data

        t = pa.table({"v": pa.array(vals)})
        ds = ray.data.from_arrow(t)
        return ds.repartition(num_blocks) if num_blocks > 1 else ds

    def test_exact_and_partition_invariant(self, ray_session):
        from collections import Counter

        from ir_search_engine_ray.extras import sketches

        rng = np.random.default_rng(3)
        vals = np.concatenate(
            [np.repeat(np.arange(10), 500),
             rng.integers(100, 5000, size=15000)]
        )
        rng.shuffle(vals)
        strs = [f"v{int(x)}" for x in vals]
        truth = Counter(strs)
        thr = int(np.floor(0.01 * len(strs)))
        want = sorted(
            ((k, c) for k, c in truth.items() if c > thr),
            key=lambda x: (-x[1], x[0]),
        )
        for nb in (1, 8):
            got = sketches.frequent_items(
                self._make(strs, nb), "v", phi=0.01, counters=256
            )
            assert (
                list(zip(got["v"].to_pylist(), got["cnt"].to_pylist()))
                == want
            )

    def test_small_counters_still_exact(self, ray_session):
        """The MG superset guarantee holds at the minimum legal counter
        budget — the recount pass makes the final answer exact anyway."""
        from collections import Counter

        from ir_search_engine_ray.extras import sketches

        rng = np.random.default_rng(9)
        vals = rng.zipf(1.3, size=30000)
        vals = vals[vals < 10_000]
        thr = int(np.floor(0.02 * len(vals)))
        truth = Counter(int(x) for x in vals)
        want = sorted(
            ((k, c) for k, c in truth.items() if c > thr),
            key=lambda x: (-x[1], x[0]),
        )
        got = sketches.frequent_items(
            self._make(vals.astype(np.int64), 6), "v", phi=0.02, counters=51
        )
        assert list(zip(got["v"].to_pylist(), got["cnt"].to_pylist())) == want
        assert got["v"].type == pa.int64()

    def test_guards(self, ray_session):
        from ir_search_engine_ray.extras import sketches

        ds = self._make(["a", "b"] * 50)
        with pytest.raises(ValueError, match="counters.*too small"):
            sketches.frequent_items(ds, "v", phi=0.01, counters=64)
        with pytest.raises(ValueError, match="phi must be"):
            sketches.frequent_items(ds, "v", phi=1.5)
        # phi*n < 1: threshold 0 cannot be served by a bounded candidate set
        with pytest.raises(ValueError, match="phi\\*n"):
            sketches.frequent_items(
                self._make([f"u{i}" for i in range(50)]), "v", phi=0.001
            )

    def test_cli_freq_and_quantiles(self, ray_session, tmp_path, capsys):
        """The freq / quantiles CLI verbs print JSON lines matching the
        library results (freq --tokens over text; quantiles exact ==
        sampled when the sample covers the file)."""
        import argparse
        import json as _json

        import pyarrow.parquet as pq

        from ir_search_engine_ray.cli import _cmd_freq, _cmd_quantiles

        t = pa.table(
            {
                "doc_id": pa.array(range(6), type=pa.int64()),
                "text": pa.array(
                    ["aa bb aa", "aa cc", "aa bb", "dd", "aa", "bb aa"]
                ),
                "n_chars": pa.array([8, 5, 5, 2, 2, 5], type=pa.int64()),
            }
        )
        f = str(tmp_path / "docs.parquet")
        pq.write_table(t, f)
        _cmd_freq(
            argparse.Namespace(
                parquet=f, col="text", phi=0.2, counters=None, tokens=True
            )
        )
        rows = [
            _json.loads(x) for x in capsys.readouterr().out.splitlines() if x
        ]
        # 11 tokens, thr = floor(0.2*11) = 2: aa(6) and bb(3) qualify
        assert rows == [
            {"term": "aa", "cnt": 6},
            {"term": "bb", "cnt": 3},
        ]
        for sample in (None, 100):
            _cmd_quantiles(
                argparse.Namespace(
                    parquet=f, col="n_chars", qs="0.5,0.95",
                    sample=sample, id_col="doc_id",
                )
            )
            out = [
                _json.loads(x)
                for x in capsys.readouterr().out.splitlines() if x
            ]
            # sorted [2,2,5,5,5,8]: ranks floor(.5*5)=2 and floor(.95*5)=4
            assert out == [
                {"quantile": 0.5, "value": 5},
                {"quantile": 0.95, "value": 5},
            ]

    def test_cli_distinct(self, ray_session, tmp_path, capsys):
        """The distinct CLI verb: global and --by grouped HLL estimates
        (linear-counting-exact at these cardinalities)."""
        import argparse
        import json as _json

        import pyarrow.parquet as pq

        from ir_search_engine_ray.cli import _cmd_distinct

        t = pa.table(
            {
                "g": pa.array(["x"] * 6 + ["y"] * 4),
                "u": pa.array(
                    ["a", "b", "c", "a", "b", "c", "d", "e", "d", "e"]
                ),
            }
        )
        f = str(tmp_path / "ev.parquet")
        pq.write_table(t, f)
        _cmd_distinct(argparse.Namespace(parquet=f, col="u", by=None, p=12))
        assert _json.loads(capsys.readouterr().out) == {
            "estimate": 5, "p": 12
        }
        _cmd_distinct(argparse.Namespace(parquet=f, col="u", by="g", p=12))
        rows = [
            _json.loads(x) for x in capsys.readouterr().out.splitlines() if x
        ]
        assert rows == [
            {"g": "x", "estimate": 3, "p": 12},
            {"g": "y", "estimate": 2, "p": 12},
        ]


class TestMGFoldProperty:
    def test_fold_superset_guarantee(self):
        """Hypothesis: the pure MG machinery frequent_items runs — exact
        per-batch value_counts compressed to m, driver fold with
        compression above 2m — keeps EVERY item whose true count exceeds
        n/(m+1), for any stream content, batch split and m."""
        from collections import Counter

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ir_search_engine_ray.extras.sketches import _mg_compress

        @given(
            st.lists(
                st.integers(min_value=0, max_value=30),
                min_size=1,
                max_size=400,
            ),
            st.integers(min_value=1, max_value=12),   # m
            st.integers(min_value=1, max_value=7),    # number of batches
            st.randoms(use_true_random=False),
        )
        @settings(max_examples=150, deadline=None)
        def check(stream, m, nb, rnd):
            idx = list(range(len(stream)))
            rnd.shuffle(idx)
            cuts = sorted(rnd.sample(range(len(stream) + 1), min(nb - 1, len(stream))))
            batches, prev = [], 0
            for c in cuts + [len(stream)]:
                batches.append([stream[i] for i in idx[prev:c]])
                prev = c
            summary: dict = {}
            for b in batches:
                cnt = Counter(b)
                items = np.array(list(cnt.keys()), dtype=np.int64)
                counts = np.array(list(cnt.values()), dtype=np.int64)
                ki, kc = _mg_compress(items, counts, m)
                for it, c in zip(ki.tolist(), kc.tolist()):
                    summary[it] = summary.get(it, 0) + c
                if len(summary) > 2 * m:
                    arr = np.fromiter(summary.values(), dtype=np.int64)
                    keys = np.fromiter(summary.keys(), dtype=np.int64)
                    ki, kc = _mg_compress(keys, arr, m)
                    summary = dict(zip(ki.tolist(), kc.tolist()))
            truth = Counter(stream)
            n = len(stream)
            for it, c in truth.items():
                if c > n / (m + 1):
                    assert it in summary, (it, c, n, m, summary)

        check()


class TestSpanKernelsProperty:
    def test_kernel_chain_matches_naive(self):
        """Hypothesis: gram_rows -> _dup_starts -> _doc_rollup (single
        partition, pure functions) equals a naive per-doc k-gram
        implementation: same flagged docs, span counts and interval-union
        coverage."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ir_search_engine_ray.extras.spans import (
            _doc_rollup,
            _dup_starts,
            gram_rows,
        )

        vocab = list("abc")
        K = 3

        @given(
            st.lists(
                st.lists(st.sampled_from(vocab), max_size=10),
                min_size=1,
                max_size=6,
            )
        )
        @settings(max_examples=120, deadline=None)
        def check(doc_toks):
            batch = pa.table(
                {
                    "doc_id": pa.array(
                        list(range(len(doc_toks))), type=pa.int64()
                    ),
                    "text": pa.array(
                        [" ".join(t) for t in doc_toks], type=pa.string()
                    ),
                }
            )
            grams = gram_rows(batch, k=K, parts=1)
            dup = _dup_starts(grams)
            dup = dup.append_column(
                "dpart", pa.array(np.zeros(dup.num_rows, dtype=np.int32))
            )
            out = _doc_rollup(dup, k=K)
            got = {
                r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
                for r in out.to_pylist()
            }
            # naive reference
            gmap: dict[tuple, set] = {}
            for d, toks in enumerate(doc_toks):
                for i in range(len(toks) - K + 1):
                    gmap.setdefault(tuple(toks[i : i + K]), set()).add(d)
            want = {}
            for d, toks in enumerate(doc_toks):
                starts = [
                    i
                    for i in range(len(toks) - K + 1)
                    if len(gmap[tuple(toks[i : i + K])]) > 1
                ]
                if starts:
                    covered = set()
                    for i in starts:
                        covered.update(range(i, i + K))
                    want[d] = (len(starts), len(covered))
            assert got == want, doc_toks

        check()


class TestAnnTieDeterminism:
    def test_duplicate_vectors_tie_break_by_id_any_layout(self, ray_session):
        """Exact ties (duplicate vectors) must come out (cosine desc, id
        asc) regardless of block layout — the per-batch partial used to
        keep an arbitrary argpartition tie subset."""
        import ray.data

        from ir_search_engine_ray.extras import ann

        rng = np.random.default_rng(2)
        d = 8
        v = rng.normal(size=d)
        n_dup, n_other = 30, 50
        X = np.vstack([np.tile(v, (n_dup, 1)), rng.normal(size=(n_other, d))])
        n = X.shape[0]
        off = np.arange(0, (n + 1) * d, d, dtype=np.int32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.ListArray.from_arrays(
                    pa.array(off), pa.array(X.ravel())
                ),
            }
        )
        want = None
        for nb in (1, 3, 11):
            ds = (
                ray.data.from_arrow(t).repartition(nb)
                if nb > 1
                else ray.data.from_arrow(t)
            )
            got = ann.cosine_topk(ds, v, k=10, exclude=0)
            assert got["vec_id"].to_pylist() == list(range(1, 11)), nb
            if want is None:
                want = got
            assert got.equals(want), nb
            # batched variant: same tie discipline per query
            bt = ann.cosine_topk_batch(
                ds, np.array([0], dtype=np.int64), v[None, :], k=10,
                exclude_self=True,
            )
            sub = bt.filter(
                pa.compute.equal(bt["query_id"], 0)
            )["vec_id"].to_pylist()
            assert sub[:9] == list(range(1, 10)), nb


class TestChunkCoverageProperty:
    @pytest.mark.parametrize(
        "window,stride", [(1, 1), (4, 3), (8, 8), (5, 2), (3, 7), (16, 5)]
    )
    def test_every_token_covered_and_rule_exact(
        self, ray_session, window, stride
    ):
        """For every doc length 0..40: chunk starts are exactly
        range(0, n, stride), slices are tokens[s:s+window], and (when
        stride <= window) every token index is covered by >= 1 chunk."""
        from ir_search_engine_ray.extras import packing

        texts = [
            " ".join(f"t{chr(97 + j % 26)}{chr(97 + j // 26)}" for j in range(n))
            for n in range(41)
        ]
        out = packing.chunk_documents(
            _ds_texts(texts), window=window, stride=stride
        ).to_pandas()
        for doc_id in range(41):
            n = doc_id  # doc i has i tokens
            toks = texts[doc_id].split()
            rows = out[out["doc_id"] == doc_id].sort_values("chunk_id")
            want_starts = list(range(0, n, stride))
            assert rows["start_tok"].tolist() == want_starts
            covered = set()
            for s, text in zip(rows["start_tok"], rows["text"]):
                want = toks[s : s + window]
                assert text.split() == want
                covered.update(range(s, min(s + window, n)))
            if stride <= window:
                assert covered == set(range(n))


def _ds_texts(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64)
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    ).repartition(3)


class TestPrefixFilterProperty:
    def test_pure_kernel_recall_superset(self):
        """Hypothesis over random corpora and thresholds: the PURE prefix
        kernel chain (prefix_filter_rows -> _sized_pairs_partition, no
        Ray) admits every pair whose exact shingle Jaccard reaches the
        threshold — the recall-1.0 theorem exercised adversarially."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ir_search_engine_ray.extras import dedup

        word = st.integers(min_value=0, max_value=12).map(
            lambda i: "w" + chr(97 + i)
        )
        doc = st.lists(word, min_size=1, max_size=12).map(" ".join)

        @given(
            st.lists(doc, min_size=2, max_size=10),
            st.floats(min_value=0.05, max_value=1.0),
        )
        @settings(max_examples=200, deadline=None)
        def check(texts, threshold):
            t = pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(len(texts), dtype=np.int64)
                    ),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
            rows = dedup.prefix_filter_rows(
                t, shingle_k=3, threshold=threshold
            )
            cands = dedup._sized_pairs_partition(rows, threshold)
            cand_set = set(
                zip(
                    cands["doc_a"].to_pylist(),
                    cands["doc_b"].to_pylist(),
                )
            )
            shs = {
                i: dedup._shingles(x, 3) for i, x in enumerate(texts)
            }
            for a in range(len(texts)):
                for b in range(a + 1, len(texts)):
                    sa, sb = shs[a], shs[b]
                    if not sa or not sb:
                        continue
                    j = len(sa & sb) / len(sa | sb)
                    if j >= threshold:
                        assert (a, b) in cand_set, (
                            texts, threshold, a, b, j
                        )

        check()


class TestSamplingCliVerbs:
    def test_split_and_mix_verbs(self, ray_session, tmp_path, capsys):
        import argparse
        import json as _json

        import pyarrow.parquet as pq

        from ir_search_engine_ray.cli import _cmd_mix, _cmd_split

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(200, dtype=np.int64)),
                "text": pa.array(["w"] * 200),
                "source": pa.array(["a"] * 150 + ["b"] * 50),
            }
        )
        f = str(tmp_path / "docs.parquet")
        pq.write_table(t, f)

        _cmd_split(
            argparse.Namespace(
                documents=f,
                out=str(tmp_path / "sp"),
                weights="train=80,test=20",
                seed=7,
                overwrite=False,
            )
        )
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        n = rep["n_docs"]
        assert n["train"] + n["test"] == 200
        assert n["train"] > n["test"] > 0
        # hive layout: selective read of one split works
        assert (
            pq.read_table(str(tmp_path / "sp" / "split=test")).num_rows
            == n["test"]
        )

        _cmd_mix(
            argparse.Namespace(
                documents=f,
                out=str(tmp_path / "mx"),
                by="source",
                weights="a=500000,b=500000",
                total=80,
                overwrite=False,
            )
        )
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        got = pq.read_table(str(tmp_path / "mx"), columns=["source"])
        bcount = got.filter(
            pa.compute.equal(got["source"], "b")
        ).num_rows
        # b targets 40 docs but only has 50; a targets 40 of 150
        assert rep["n_docs"] == got.num_rows
        assert 25 <= bcount <= 50
