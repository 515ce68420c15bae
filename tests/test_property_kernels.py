"""Hypothesis property tests over the pure-numpy kernel surfaces:
threshold crossings vs direct scalar ports of the reference scans, and
window-assembly partitioning invariance. (The Gorilla codec has its own
hypothesis suite in test_gorilla.py.)"""

import numpy as np
from hypothesis import given, settings, strategies as st

from tsf import kernels as K
from tsf.rollup import _assemble_windows
from tests.test_kernels import ctx_of, firstcrossingacf_ref


def _firstcrossing_ref(r, threshold):
    r = np.asarray(r, dtype=np.float64)
    if r[0] < threshold:
        cand = np.nonzero(r > threshold)[0]
    elif r[0] > threshold:
        cand = np.nonzero(r < threshold)[0]
    else:
        return 1.0
    if cand.size == 0:
        return np.nan
    idx = int(cand[0]) + 1
    b, a = r[idx - 1], r[idx - 2]
    return idx - 1 + (threshold - a) / (b - a)


series = st.lists(st.integers(min_value=-50, max_value=50),
                  min_size=2, max_size=120)
thresholds = st.sampled_from([0.0, 0.5, -0.5, 3.0, -7.0, 25.0])


@settings(max_examples=200, deadline=None)
@given(series, thresholds)
def test_firstcrossing_matches_reference_scan(xs, thr):
    x = np.asarray(xs, dtype=np.float64)
    got = K._first_crossing(x[None, :], thr)[0]
    want = _firstcrossing_ref(x, thr)
    assert got == want or (np.isnan(got) and np.isnan(want)), \
        (xs, thr, got, want)


@settings(max_examples=150, deadline=None)
@given(series, thresholds)
def test_firstcrossingacf_matches_reference_scan(xs, thr):
    x = np.asarray(xs, dtype=np.float64)
    got = K._first_crossing_acf(x[None, :], np.array([x.size]),
                                threshold=thr)[0]
    want = firstcrossingacf_ref(x, thr)
    assert got == want or (np.isnan(got) and np.isnan(want)), \
        (xs, thr, got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=1000),
                         min_size=0, max_size=90),
                min_size=1, max_size=12),
       st.integers(min_value=1, max_value=16))
def test_assemble_windows_batch_composition_invariant(arrs, W):
    """Splitting a batch of ragged rows at ANY point yields the same
    stacked (window, length) content — the property that makes tier-0
    values independent of Arrow batch boundaries."""
    np_arrs = [np.asarray(a, dtype=np.float64) for a in arrs]
    M, n, row_of_win, local_w = _assemble_windows(np_arrs, W)
    # reassemble from an arbitrary split
    cut = len(np_arrs) // 2
    Ma, na, _, _ = _assemble_windows(np_arrs[:cut], W)
    Mb, nb, _, _ = _assemble_windows(np_arrs[cut:], W)
    assert np.array_equal(np.vstack([Ma, Mb]) if Ma.size or Mb.size
                          else np.zeros((0, W)), M)
    assert np.array_equal(np.concatenate([na, nb]), n)
    # per-window content equals the source slice
    for w in range(M.shape[0]):
        src = np_arrs[row_of_win[w]]
        lo = local_w[w] * W
        want = src[lo:lo + W]
        assert np.array_equal(M[w, :n[w]], want)
        assert (M[w, n[w]:] == 0).all()
