"""Compression round-trip invariants (BASELINE.json:15 token-array equality)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsf import gorilla as G

rng = np.random.default_rng(7)


class TestIntCodec:
    @pytest.mark.parametrize("arr", [
        np.array([], dtype=np.int64),
        np.array([5]),
        np.array([5, 5]),
        np.array([0, 0, 0, 0]),
        np.arange(1000) * 3 + 17,                      # perfectly linear -> tiny
        rng.integers(0, 50257, 5000),
        rng.integers(-2**40, 2**40, 100),
        np.array([2**62, -2**62, 0, 2**62 - 1]),
    ])
    def test_roundtrip(self, arr):
        arr = np.asarray(arr, dtype=np.int64)
        assert np.array_equal(G.decompress_ints(G.compress_ints(arr)), arr)

    def test_linear_sequence_compresses_hard(self):
        arr = np.arange(10000) * 7 + 3
        assert len(G.compress_ints(arr)) < 40  # d2 == 0 everywhere

    @given(st.lists(st.integers(min_value=0, max_value=50256), max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_property(self, xs):
        arr = np.asarray(xs, dtype=np.int64)
        assert np.array_equal(G.decompress_ints(G.compress_ints(arr)), arr)


class TestFloatCodec:
    @pytest.mark.parametrize("arr", [
        np.array([]),
        np.array([3.14]),
        np.full(100, 2.5),
        rng.standard_normal(500),
        np.cumsum(rng.standard_normal(1000)) * 0.01 + 100.0,
        np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-310]),
    ])
    def test_roundtrip_bitexact(self, arr):
        arr = np.asarray(arr, dtype=np.float64)
        out = G.decompress_floats(G.compress_floats(arr))
        assert np.array_equal(arr.view(np.uint64), out.view(np.uint64))

    def test_row_matrix_matches_scalar_codec(self):
        """compress_float_rows blocks decode to the same values as
        per-row compress_floats (wire-format compatible)."""
        M = rng.standard_normal((40, 10)) + 50
        counts = np.array([10] * 30 + [7, 3, 1, 0] + [10] * 6)
        blocks = G.compress_float_rows(M, counts)
        for i, c in enumerate(counts):
            got = G.decompress_floats(blocks[i])
            want = M[i, :c]
            assert np.array_equal(got, want), i

    def test_smooth_series_ratio(self):
        arr = np.full(500, 12345.678)
        assert len(G.compress_floats(arr)) < 30


def test_batch_decompress_matches_single():
    import numpy as np
    from tsf import gorilla
    rng = np.random.default_rng(7)
    blocks, want = [], []
    for n in [0, 1, 2, 3, 10, 10, 10, 64, 7]:
        x = rng.normal(size=n)
        if n >= 3:
            x[0] = np.nan  # NaN payload must round-trip bit-exactly
        if n == 7:
            x[:] = 3.5     # constant block -> width 0 path
        blocks.append(gorilla.compress_floats(x))
        want.append(x)
    got = gorilla.decompress_float_rows(blocks)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.dtype == np.float64 and g.shape == w.shape
        assert np.array_equal(g.view(np.uint64), np.asarray(w).view(np.uint64))


class TestFullRangeProperties:
    """Full-domain property tests: ANY int64 sequence and ANY float64 bit
    pattern (incl. NaN payloads, denormals, infinities) must round-trip
    bit-exactly — the BASELINE.json token-array-equality invariant with
    no value-range assumptions."""

    @given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                    max_size=200))
    @settings(max_examples=80, deadline=None)
    def test_int_roundtrip_full_int64_range(self, xs):
        arr = np.asarray(xs, dtype=np.int64)
        assert np.array_equal(G.decompress_ints(G.compress_ints(arr)), arr)

    def test_int_roundtrip_wraparound_pair(self):
        """Regression: [-2^63, 2^63-1] has a delta that only exists in
        wrapped two's-complement; reconstruction overflowed Python->C
        long before the wrap-aware fix."""
        arr = np.array([-2**63, 2**63 - 1], dtype=np.int64)
        assert np.array_equal(G.decompress_ints(G.compress_ints(arr)), arr)

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    max_size=200))
    @settings(max_examples=80, deadline=None)
    def test_float_roundtrip_any_bitpattern(self, bits):
        arr = np.asarray(bits, dtype=np.uint64).view(np.float64)
        out = G.decompress_floats(G.compress_floats(arr))
        assert np.array_equal(arr.view(np.uint64), out.view(np.uint64))
