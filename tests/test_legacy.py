"""Legacy (reference-parity) codecs and index-format exporter.

Round-trip property tests for Elias gamma/delta and front coding — the
reference's own implementations do NOT round-trip (SURVEY.md F3 documents
the uint16 overflow and the all-zero gapToBytes) — plus full-format export/
readback equality against the engine's posting lists, and the reference's
headline claim that the coded formats are smaller (``stats.md:14-24``).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ir_search_engine_ray.functions.legacy_codec import (
    delta_decode,
    delta_encode,
    front_code_block,
    front_decode_block,
    gamma_decode,
    gamma_encode,
)


class TestEliasCodecs:
    @given(st.lists(st.integers(min_value=1, max_value=2**40), max_size=50))
    @settings(max_examples=60, deadline=None)
    def test_gamma_roundtrip(self, vals):
        assert gamma_decode(gamma_encode(vals), count=len(vals)).tolist() == vals

    @given(st.lists(st.integers(min_value=1, max_value=2**40), max_size=50))
    @settings(max_examples=60, deadline=None)
    def test_delta_roundtrip(self, vals):
        assert delta_decode(delta_encode(vals), count=len(vals)).tolist() == vals

    def test_known_vectors(self):
        # classic published gamma codes: 1->0, 2->100, 3->101, 4->11000
        assert gamma_decode(gamma_encode([1, 2, 3, 4, 13])).tolist() == [1, 2, 3, 4, 13]
        assert delta_decode(delta_encode([1, 2, 3, 16, 17])).tolist() == [1, 2, 3, 16, 17]

    def test_large_gaps_beyond_reference_bug(self):
        # the reference's uint16 packing overflowed here (compressed_index.py:32)
        vals = [2**16 + 1, 2**32 + 5, 2**40 - 1]
        assert gamma_decode(gamma_encode(vals)).tolist() == vals
        assert delta_decode(delta_encode(vals)).tolist() == vals

    def test_zero_rejected(self):
        with pytest.raises(ValueError):
            gamma_encode([0])
        with pytest.raises(ValueError):
            delta_encode([0])


class TestFrontCoding:
    def test_block_roundtrip(self):
        terms = ["press", "pressing", "pressur", "pressuris", "prest"]
        assert front_decode_block(front_code_block(terms)) == terms

    def test_no_common_prefix(self):
        terms = ["alpha", "beta", "gamma"]
        assert front_decode_block(front_code_block(terms)) == terms

    def test_single_and_empty(self):
        assert front_decode_block(front_code_block(["zoo"])) == ["zoo"]
        assert front_code_block([]) == ""
        assert front_decode_block("") == []

    @given(
        st.lists(
            st.text(alphabet="abcdefgh-", min_size=1, max_size=12),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_property(self, terms):
        terms = sorted(terms)
        assert front_decode_block(front_code_block(terms)) == terms


class TestExport:
    @pytest.fixture(scope="class")
    def exported(self, built, tmp_path_factory):
        from ir_search_engine_ray.sources.legacy_export import (
            FORMATS,
            export_legacy_index,
        )

        root = tmp_path_factory.mktemp("legacy")
        stats = {}
        for fmt in FORMATS:
            stats[fmt] = export_legacy_index(built, root / fmt, fmt)
        return root, stats

    def test_roundtrip_all_formats(self, built, exported):
        from ir_search_engine_ray.sources.legacy_export import (
            FORMATS,
            read_legacy_postings,
        )
        from tests.test_pipeline import _engine_postings

        want = _engine_postings(built.out_dir)
        root, _ = exported
        for fmt in FORMATS:
            got = read_legacy_postings(root / fmt, fmt)
            assert set(got) == set(want), fmt
            for term in want:
                assert got[term] == want[term], (fmt, term)

    def test_coded_formats_are_smaller(self, exported):
        _, stats = exported
        unc = stats["uncompressed"]["sizes"]["postings.bin"]
        assert stats["gamma"]["sizes"]["postings.bin"] < unc
        assert stats["delta_front"]["sizes"]["postings.bin"] < unc
        # front coding shrinks the dictionary vs the fixed-width layout
        assert (
            stats["delta_front"]["sizes"]["dict.bin"]
            < stats["uncompressed"]["sizes"]["dict.bin"]
        )

    def test_docinfo_matches_doclen(self, built, exported):
        import pyarrow.parquet as pq

        root, _ = exported
        arr = np.frombuffer(
            (root / "uncompressed" / "docinfo.bin").read_bytes(), dtype="<u8"
        ).reshape(-1, 3)
        t = pq.read_table(built.out_dir / "doclen").sort_by("doc_id")
        assert np.array_equal(arr[:, 0], t["doc_id"].to_numpy())
        assert np.array_equal(arr[:, 1], t["max_tf"].to_numpy())
        assert np.array_equal(arr[:, 2], t["doc_len"].to_numpy())
