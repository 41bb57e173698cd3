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
