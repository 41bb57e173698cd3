"""Sequence packing: distributed prefix-sum placement of docs into
fixed-token training sequences."""

import numpy as np
import pyarrow as pa


def _ds(texts, num_blocks=1, ids=None):
    import ray.data

    ids = ids if ids is not None else list(range(len(texts)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(num_blocks) if num_blocks > 1 else ds


class TestPacking:
    def test_placement_matches_serial_prefix_sum(self, ray_session):
        from ir_search_engine_ray.extras import packing

        rng = np.random.default_rng(3)
        texts = [
            " ".join(f"w{j}" for j in range(rng.integers(0, 40)))
            for _ in range(200)
        ]
        out = (
            packing.pack_sequences(_ds(texts, num_blocks=5), max_tokens=64)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        # serial reference
        start = 0
        for i, t in enumerate(texts):
            n = len([w for w in t.split() if w])
            assert out["n_tokens"][i] == n
            assert out["seq_id"][i] == start // 64
            assert out["seq_offset"][i] == start % 64
            want_end = (start + n - 1) // 64 if n else start // 64
            assert out["seq_id_end"][i] == want_end
            start += n

    def test_bucketing_is_partitioning_independent(self, ray_session):
        from ir_search_engine_ray.extras import packing

        texts = [f"tok {'x ' * (i % 17)}" for i in range(300)]
        a = (
            packing.pack_sequences(
                _ds(texts, num_blocks=2), max_tokens=32, bucket_size=50
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        b = (
            packing.pack_sequences(
                _ds(texts, num_blocks=11), max_tokens=32, bucket_size=64
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        for col in ("n_tokens", "seq_id", "seq_offset", "seq_id_end"):
            assert a[col].tolist() == b[col].tolist(), col

    def test_straddling_doc_reports_both_sequences(self, ray_session):
        from ir_search_engine_ray.extras import packing

        # doc0: 30 tokens, doc1: 10 tokens -> starts at 30, ends at 39,
        # straddles the 32-token boundary
        texts = [" ".join(["a"] * 30), " ".join(["b"] * 10)]
        out = (
            packing.pack_sequences(_ds(texts), max_tokens=32)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["seq_id"].tolist() == [0, 0]
        assert out["seq_id_end"].tolist() == [0, 1]
        assert out["seq_offset"].tolist() == [0, 30]


class TestChunking:
    def test_known_chunks(self, ray_session):
        from ir_search_engine_ray.extras import packing

        # 10 tokens, window=4, stride=3 -> starts 0,3,6,9
        toks = "aa bb cc dd ee ff gg hh ii jj"
        out = (
            packing.chunk_documents(_ds([toks]), window=4, stride=3)
            .to_pandas()
            .sort_values("chunk_id", ignore_index=True)
        )
        assert out["start_tok"].tolist() == [0, 3, 6, 9]
        assert out["chunk_id"].tolist() == [0, 1, 2, 3]
        assert out["n_tokens"].tolist() == [4, 4, 4, 1]
        assert out["text"].tolist() == [
            "aa bb cc dd",
            "dd ee ff gg",
            "gg hh ii jj",
            "jj",
        ]

    def test_tokenless_doc_emits_nothing(self, ray_session):
        from ir_search_engine_ray.extras import packing

        out = packing.chunk_documents(
            _ds(["123 456 !!!", "word"]), window=4, stride=4
        ).to_pandas()
        assert out["doc_id"].tolist() == [1]
        assert out["text"].tolist() == ["word"]

    def test_partitioning_invariant(self, ray_session):
        from ir_search_engine_ray.extras import packing

        texts = [
            " ".join(f"w{chr(97 + (i + j) % 26)}" for j in range(n))
            for i, n in enumerate([1, 5, 17, 40, 0, 33])
        ]

        def run(nb):
            df = packing.chunk_documents(
                _ds(texts, num_blocks=nb), window=8, stride=5
            ).to_pandas()
            return df.sort_values(
                ["doc_id", "chunk_id"], ignore_index=True
            )

        import pandas as pd

        pd.testing.assert_frame_equal(run(1), run(4))

    def test_gapped_stride_allowed(self, ray_session):
        from ir_search_engine_ray.extras import packing

        out = packing.chunk_documents(
            _ds(["aa bb cc dd ee ff"]), window=2, stride=4
        ).to_pandas()
        assert sorted(out["text"]) == ["aa bb", "ee ff"]

    def test_rejects_nonpositive(self, ray_session):
        import pytest

        from ir_search_engine_ray.extras import packing

        with pytest.raises(ValueError):
            packing.chunk_documents(_ds(["x"]), window=0, stride=1)
        with pytest.raises(ValueError):
            packing.chunk_documents(_ds(["x"]), window=4, stride=0)
