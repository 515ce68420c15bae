"""Kernel unit tests vs independent formulas + the reference's own
statistical property tests (mirrors /root/reference/test/runtests.jl)."""

import numpy as np
import pytest

from tsf import kernels as K
from tsf.registry import catalogue, default_rollup_features

rng = np.random.default_rng(42)


def ctx_of(x):
    x = np.asarray(x, dtype=np.float64)
    return K.WindowCtx(x[None, :], np.array([x.size]))


def naive_acf(x, k):
    """Biased demeaned ACF, direct formula (StatsBase convention)."""
    x = np.asarray(x, dtype=np.float64)
    mu = x.mean()
    d = x - mu
    return float((d[:-k] * d[k:]).sum() / (d * d).sum())


class TestACF:
    def test_matches_direct_formula_bitexact(self):
        x = rng.integers(0, 1000, 500).astype(np.float64)
        ctx = ctx_of(x)
        acf = ctx.get("acf")
        for k in range(1, 41):
            # same op order (vectorized product-sum over demeaned) -> exact
            assert acf[0, k - 1] == naive_acf(x, k)

    def test_ar1_decay(self):
        # AR(1) with phi=0.8: ACF(k) ~ 0.8^k (test/runtests.jl:411-419 analogue)
        n = 20000
        eps = rng.normal(0, 1, n)
        x = np.empty(n)
        x[0] = 0
        for t in range(1, n):
            x[t] = 0.8 * x[t - 1] + eps[t]
        ctx = ctx_of(x)
        acf = ctx.get("acf")[0]
        for k in (1, 2, 5):
            assert abs(acf[k - 1] - 0.8 ** k) < 0.03

    def test_constant_series_nan(self):
        ctx = ctx_of(np.full(100, 7.0))
        assert np.isnan(ctx.get("acf")[0]).all()

    def test_short_series_lag_bounds(self):
        ctx = ctx_of(rng.normal(0, 1, 5))
        acf = ctx.get("acf")[0]
        assert np.isfinite(acf[:4]).all()
        assert np.isnan(acf[4:]).all()


def pacf_regression_ref(x, max_lag):
    """Independent scalar reimplementation of StatsBase pacf
    ``method=:regression`` (/root/reference/src/StatsBase.jl:17-19 via
    ext/StatsBaseExt.jl:6): per-lag OLS of x_t on [1, x_{t-1}..x_{t-l}]
    with an EXPLICIT design matrix + lstsq — a construction path fully
    independent of the engine's prefix-sum normal equations."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    out = np.full(max_lag, np.nan)
    for l in range(1, max_lag + 1):
        if n < 2 * l + 1:
            continue
        X = np.ones((n - l, l + 1))
        for j in range(1, l + 1):
            X[:, j] = x[l - j:n - j]
        if np.linalg.matrix_rank(X.T @ X) < l + 1:
            continue
        coef, *_ = np.linalg.lstsq(X, x[l:], rcond=None)
        out[l - 1] = coef[-1]
    return out


class TestPACF:
    def test_matches_independent_ols(self):
        # engine (prefix-sum normal equations, closed forms at lags 1-2)
        # vs explicit-design lstsq, across fixture families
        cases = [
            rng.integers(0, 2000, 300).astype(np.float64),
            rng.normal(0, 1, 500),
            rng.integers(0, 50, 25).astype(np.float64),
        ]
        for x in cases:
            ctx = K.WindowCtx(x[None, :], np.array([x.size]),
                              req={"pacf": 10})
            got = ctx.get("pacf")[0]
            want = pacf_regression_ref(x, 10)
            both = np.isfinite(got) & np.isfinite(want)
            assert both.sum() >= 8
            np.testing.assert_allclose(got[both], want[both],
                                       rtol=1e-9, atol=1e-10)

    def test_lag1_is_ols_slope_not_acf(self):
        # :regression pacf_1 is the OLS slope of x_t on x_{t-1} with
        # intercept over t=1..n-1 — NOT the biased ACF at lag 1
        x = rng.integers(0, 100, 50).astype(np.float64)
        a, b = x[:-1], x[1:]
        m = a.size
        slope = (m * (a * b).sum() - a.sum() * b.sum()) \
            / (m * (a * a).sum() - a.sum() ** 2)
        got = ctx_of(x).get("pacf")[0, 0]
        assert got == pytest.approx(slope, rel=1e-12)

    def test_ragged_batch_matches_single(self):
        xs = [rng.normal(0, 1, n) for n in (7, 40, 100)]
        W = 100
        M = np.zeros((3, W))
        n = np.zeros(3, dtype=np.int64)
        for i, x in enumerate(xs):
            M[i, :x.size] = x
            n[i] = x.size
        batch = K.WindowCtx(M, n, req={"pacf": 8}).get("pacf")
        for i, x in enumerate(xs):
            want = pacf_regression_ref(x, 8)
            both = np.isfinite(batch[i]) & np.isfinite(want)
            np.testing.assert_allclose(batch[i][both], want[both], rtol=1e-9)
            # under-determined lags (n < 2l+1) are NaN, never garbage
            lags = np.arange(1, 9)
            assert np.isnan(batch[i][n[i] < 2 * lags + 1]).all()

    def test_constant_window_nan(self):
        assert np.isnan(ctx_of(np.full(60, 3.0)).get("pacf")[0]).all()

    def test_ar1_cutoff(self):
        # AR(1): PACF(1) ~ phi, PACF(k>1) ~ 0
        n = 50000
        eps = rng.normal(0, 1, n)
        x = np.empty(n)
        x[0] = 0
        for t in range(1, n):
            x[t] = 0.6 * x[t - 1] + eps[t]
        pacf = ctx_of(x).get("pacf")[0]
        assert abs(pacf[0] - 0.6) < 0.02
        assert np.abs(pacf[1:10]).max() < 0.03


def firstcrossingacf_ref(x, threshold=0.0):
    """Direct scalar translation of the reference's chunked scan
    (src/StatsBase.jl:44-64), INCLUDING the chunk-boundary rule
    (a = lastr of the CURRENT chunk when idx == 1)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < 2:
        return np.nan
    L = min(100, n - 1)
    d = x - x.mean()
    denom = (d * d).sum()
    if denom == 0:
        return np.nan

    def r_at(k):
        return (d[:-k] * d[k:]).sum() / denom

    r1 = np.sign(r_at(1))
    th = threshold * r1
    i = 1
    lags = np.arange(1, L + 1)
    while i * L < n:
        r = np.array([r_at(int(k)) for k in lags]) * r1
        lastr = r[-1]
        below = r < th
        if below.any():
            idx = int(below.argmax()) + 1  # 1-based within chunk
            b = r[idx - 1]
            a = lastr if idx == 1 else r[idx - 2]
            gidx = idx + (i - 1) * L
            return gidx - 1 + (th - a) / (b - a)
        lags = lags + L
        i += 1
    return np.nan


class TestTimescale:
    def test_matches_reference_scalar_scan(self):
        # slow-decay AR(1)s whose crossings land past lag 100 (multi-chunk)
        for seed, phi in [(0, 0.95), (1, 0.99), (2, 0.995), (3, 0.98)]:
            r = np.random.default_rng(seed)
            n = 2000
            eps = r.normal(0, 1, n)
            x = np.empty(n)
            x[0] = 0.0
            for t in range(1, n):
                x[t] = phi * x[t - 1] + eps[t]
            got = K.k_acf_timescale(ctx_of(x))[0]
            want = firstcrossingacf_ref(x)
            assert got == want or (np.isnan(got) and np.isnan(want)), \
                (seed, got, want)

    def test_chunk_boundary_quirk(self):
        # cos(2*pi*t/402): ACF ~ cos(2*pi*k/402), first negative at lag
        # 101 = the FIRST lag of the reference's second 100-lag chunk, so
        # `a` must be the SAME chunk's last value (r[200]), not r[100]
        t = np.arange(1000)
        x = np.cos(2 * np.pi * t / 402.0)
        got = K.k_acf_timescale(ctx_of(x))[0]
        want = firstcrossingacf_ref(x)
        assert np.isfinite(want)
        assert got == want
        # and the quirk is actually exercised: interpolating with r[100]
        # (the sensible bracketing value) gives a DIFFERENT answer
        d = x - x.mean()
        dn = (d * d).sum()
        r100 = (d[:-100] * d[100:]).sum() / dn
        r101 = (d[:-101] * d[101:]).sum() / dn
        sensible = 100 + (0.0 - r100) / (r101 - r100)
        assert got != pytest.approx(sensible, abs=1e-6)

    def test_tail_chunk_not_examined(self):
        # n=150 -> lagchunks=100, chunk 2 needs 2*100 < 150 == false, so
        # lags 101..149 are never scanned: a series whose ACF first
        # crosses past lag 100 yields NaN (reference returns nothing).
        # x = e0 + e1 - e148 - e149: r(1) = +1/2, r(k) = 0 for 2<=k<=146,
        # first negative at r(147) = -1/4 — inside the unexamined tail.
        n = 150
        x = np.zeros(n)
        x[0] = x[1] = 1.0
        x[-1] = x[-2] = -1.0
        d = x - x.mean()
        r147 = (d[:-147] * d[147:]).sum() / (d * d).sum()
        assert r147 < 0  # a full scan WOULD find a crossing
        got = K.k_acf_timescale(ctx_of(x))[0]
        want = firstcrossingacf_ref(x)
        assert np.isnan(want) and np.isnan(got)

    def test_sine_known_crossing(self):
        # reference test/runtests.jl:447-453: sin(0.01:0.01:10) -> 161<tau<163
        x = np.sin(np.arange(0.01, 10.005, 0.01))
        tau = K.k_acf_timescale(ctx_of(x))[0]
        assert 161 < tau < 163

    def test_no_crossing_nan(self):
        # monotone ramp: ACF stays positive over available lags of a short
        # strongly-trended series? use constant -> NaN path instead
        tau = K.k_acf_timescale(ctx_of(np.full(50, 3.0)))[0]
        assert np.isnan(tau)

    def test_anticorrelated_sign_handling(self):
        # alternating series: AC_1 < 0 -> sign correction searches upward
        x = np.array([1.0, -1.0] * 100) + rng.normal(0, 0.01, 200)
        tau = K.k_acf_timescale(ctx_of(x))[0]
        assert np.isfinite(tau) and tau > 0


class TestStats:
    def test_uniform_mean(self):
        # test/runtests.jl:68 analogue
        x = rng.random(10000)
        assert abs(K.k_mean(ctx_of(x))[0] - 0.5) < 0.02

    def test_std_ddof1_bitexact(self):
        x = rng.integers(0, 100, 50).astype(np.float64)
        s, ss, n = x.sum(), (x * x).sum(), 50
        expect = np.sqrt((ss - s * s / n) / (n - 1))
        assert K.k_std(ctx_of(x))[0] == expect

    def test_zscore_super(self):
        x = rng.normal(5, 2, 1000)
        z = ctx_of(x).get("z")[0]
        assert abs(np.nanmean(z)) < 1e-12
        assert abs(np.nanstd(z, ddof=1) - 1) < 1e-12

    def test_single_point(self):
        ctx = ctx_of(np.array([42.0]))
        assert K.k_mean(ctx)[0] == 42.0
        assert np.isnan(K.k_std(ctx)[0])
        assert K.k_cnt(ctx)[0] == 1


class TestHistmode:
    def test_bimodal(self):
        x = np.concatenate([np.full(70, 0.0), np.full(30, 10.0)])
        x = x + rng.normal(0, 0.01, 100)
        mode5 = K.k_histmode5(ctx_of(x))[0]
        # dominant mass at low values -> mode center in lowest bin (z-scored)
        z = (x - x.mean()) / x.std(ddof=1)
        assert mode5 < 0

    def test_constant_nan(self):
        assert np.isnan(K.k_histmode5(ctx_of(np.full(60, 2.0)))[0])


class TestRAD:
    def test_finite_on_noise(self):
        x = rng.normal(0, 1, 500)
        assert np.isfinite(K.k_rad(ctx_of(x))[0])
        assert np.isfinite(K.k_rad_raw(ctx_of(x))[0])

    def test_matches_scalar_reference_impl(self):
        # independent scalar reimplementation of src/StatsBase.jl:81-107
        def rad_scalar(z, do_abs=True):
            z = np.asarray(z, dtype=np.float64)
            if do_abs:
                z = np.abs(z - np.median(z))
            y, x = z[1:], z[:-1]
            med = np.median(x)
            sub = x < med
            s_sup = np.std(x[~sub], ddof=1)
            s_sub = np.std(x[sub], ddof=1)
            return np.std(y - x, ddof=1) * (1 / s_sup - 1 / s_sub)

        x = rng.normal(3, 2, 400)
        got = K.k_rad(ctx_of(x))[0]
        want = rad_scalar(x, True)
        assert np.isclose(got, want, rtol=1e-12)
        got = K.k_rad_raw(ctx_of(x))[0]
        want = rad_scalar(x, False)
        assert np.isclose(got, want, rtol=1e-12)

    def test_rad_tau_matches_scalar(self):
        # RAD(x, :τ, true) — src/StatsBase.jl:87-89: τ = round(Int,
        # firstcrossingacf(z)) of the centered-abs series, banker's rounding
        def rad_tau_scalar(z):
            z = np.asarray(z, dtype=np.float64)
            z = np.abs(z - np.median(z))
            c = firstcrossingacf_ref(z)
            if not np.isfinite(c):
                return np.nan
            tau = int(np.rint(c))
            y, x = z[tau:], z[:-tau]
            med = np.median(x)
            sub = x < med
            s_sup = np.std(x[~sub], ddof=1)
            s_sub = np.std(x[sub], ddof=1)
            return np.std(y - x, ddof=1) * (1 / s_sup - 1 / s_sub)

        for seed in range(4):
            r = np.random.default_rng(seed)
            n = 600
            eps = r.normal(0, 1, n)
            x = np.empty(n)
            x[0] = 0.0
            for t in range(1, n):
                x[t] = 0.9 * x[t - 1] + eps[t]
            got = K.k_rad_tau(ctx_of(x))[0]
            want = rad_tau_scalar(x)
            if np.isnan(want):
                assert np.isnan(got)
            else:
                assert np.isclose(got, want, rtol=1e-10), (seed, got, want)

    def test_rad_tau_no_crossing_nan(self):
        assert np.isnan(K.k_rad_tau(ctx_of(np.full(50, 2.0)))[0])


class TestAmplitude:
    def test_pure_tone_envelope(self):
        # analytic amplitude of a unit tone is ~1 (away from edge effects)
        t = np.arange(2000)
        x = np.sin(2 * np.pi * t / 40)
        mean_amp = K.k_amp_mean(ctx_of(x))[0]
        std_amp = K.k_amp_std(ctx_of(x))[0]
        assert abs(mean_amp - 1.0) < 0.02
        assert std_amp < 0.1

    def test_amplitude_scales_linearly(self):
        t = np.arange(1000)
        x = np.sin(2 * np.pi * t / 50)
        a1 = K.k_amp_mean(ctx_of(x))[0]
        a3 = K.k_amp_mean(ctx_of(3.0 * x))[0]
        assert np.isclose(a3, 3.0 * a1, rtol=1e-9)


class TestExactLengthHilbert:
    """The FFT Hilbert must run at EXACT length n per row (reference
    DSP.hilbert, ext/DSPExt.jl:6-14) — a zero-padded FFT is a different
    linear operator on the first n samples."""

    @staticmethod
    def naive_hilbert(x):
        # literal definition: DFT -> one-sided doubling -> inverse DFT,
        # O(N^2) sums, no FFT library involved
        n = x.size
        k = np.arange(n)
        Wm = np.exp(-2j * np.pi * np.outer(k, k) / n)
        X = Wm @ x.astype(complex)
        h = np.zeros(n)
        if n % 2 == 0:
            h[0] = h[n // 2] = 1.0
            h[1:n // 2] = 2.0
        else:
            h[0] = 1.0
            h[1:(n + 1) // 2] = 2.0
        return (Wm.conj().T @ (X * h)) / n

    def test_matches_naive_dft_on_ragged_lengths(self):
        # non-pow2 lengths of both parities — the exact deviation the
        # padded form had
        for n in (7, 12, 50, 97, 100, 129):
            x = rng.normal(0, 1, n)
            got = K.WindowCtx(x[None, :], np.array([n])).get("analytic")[0]
            want = self.naive_hilbert(x)
            assert np.allclose(got[:n], want, atol=1e-9), n

    def test_padded_row_equals_standalone(self):
        # a short row inside a wide padded matrix gets the SAME analytic
        # signal as evaluating it alone at its exact length
        n, W = 37, 128
        x = rng.normal(0, 1, n)
        M = np.zeros((3, W))
        M[1, :n] = x
        M[0, :W] = rng.normal(0, 1, W)
        M[2, :50] = rng.normal(0, 1, 50)
        a = K.WindowCtx(M, np.array([W, n, 50])).get("analytic")
        alone = K.WindowCtx(x[None, :], np.array([n])).get("analytic")[0]
        assert np.allclose(a[1, :n], alone[:n], atol=1e-12)
        assert np.allclose(a[1, n:], 0.0)
        # real part of the analytic signal is exactly the input
        assert np.allclose(a[1, :n].real, x, atol=1e-9)


class TestPhase:
    def test_plv_of_pure_tone_high(self):
        t = np.arange(1000)
        x = np.sin(2 * np.pi * t / 50)
        plv = K.k_plv_phase(ctx_of(x))[0]
        ppc = K.k_ppc_phase(ctx_of(x))[0]
        assert 0 <= plv <= 1 and ppc <= 1

    def test_ppc_closed_form_equals_pair_sum(self):
        # O(N) closed form == O(N^2) definition (ext/DSPExt.jl:16-32)
        ph = rng.uniform(-np.pi, np.pi, 60)
        n = ph.size
        pair = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                pair += np.cos(ph[i] - ph[j])
        want = 2 * pair / (n * (n - 1))
        c, s = np.cos(ph).sum(), np.sin(ph).sum()
        got = (c * c + s * s - n) / (n * (n - 1))
        assert np.isclose(got, want, atol=1e-10)


class TestPearsonProperty:
    def test_iid_identity(self):
        # reference test/runtests.jl:465: Pearson(randn) ~ I
        X = rng.normal(0, 1, (5, 2000))
        C = np.corrcoef(X)
        off = C - np.eye(5)
        assert np.abs(off).max() < 0.06


class TestRagged:
    def test_padded_matrix_equals_per_row(self):
        """Batch-of-windows path == one-window-at-a-time path, bit-exact."""
        fs = default_rollup_features()
        lens = [100, 37, 1, 100, 64]
        X = np.zeros((5, 100))
        rows = []
        for i, L in enumerate(lens):
            r = rng.integers(0, 3000, L).astype(np.float64)
            X[i, :L] = r
            rows.append(r)
        batch = fs.evaluate(X, np.array(lens))
        for i, r in enumerate(rows):
            # width=100: the summation tree depends on padded width, so
            # reproducing engine output for a partial window requires the
            # tier's W (see FeatureSet.evaluate_series docstring)
            single = fs.evaluate_series(r, width=100)
            for name in fs.names:
                a, b = batch[name][i], single[name]
                assert (a == b) or (np.isnan(a) and np.isnan(b)), (name, i, a, b)


class TestDecadeMeans:
    def test_values_and_ragged(self):
        X = np.zeros((2, 30))
        X[0] = np.arange(30)
        X[1, :7] = 5.0
        m, c = K.decade_means(X, np.array([30, 7]), 10)
        assert np.array_equal(m[0], [4.5, 14.5, 24.5])
        assert np.array_equal(c[0], [10, 10, 10])
        assert m[1][0] == 5.0 and c[1][0] == 7
        assert c[1][1] == 0


class TestFirstCrossing:
    def test_sine_zero_crossing_interpolated(self):
        t = np.arange(100) * 0.1 + 0.05
        x = np.sin(t)
        got = K.k_firstcrossing(ctx_of(x))[0]
        # sin crosses 0 at t=pi -> 1-based interpolated index
        # (pi - 0.05)/0.1 + 1 ~= 31.92 (reference is 1-based Julia)
        assert 31.5 < got < 32.3

    def test_sign_correction_negative_start(self):
        t = np.arange(100) * 0.1 + 0.05
        got = K.k_firstcrossing(ctx_of(-np.sin(t)))[0]
        assert 31.5 < got < 32.3  # same crossing, sign-corrected

    def test_no_crossing_nan(self):
        assert np.isnan(K.k_firstcrossing(ctx_of(np.ones(50)))[0])

    def test_zero_start_returns_one(self):
        # reference src/StatsBase.jl:34: first(r) == threshold -> 1
        x = np.zeros(10); x[5:] = 1.0
        assert K.k_firstcrossing(ctx_of(x))[0] == 1.0


class TestThresholdCrossings:
    """Reference threshold parameters (src/StatsBase.jl:29,44) at nonzero
    thresholds, vs direct scalar ports of the Julia scans."""

    @staticmethod
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
        idx = int(cand[0]) + 1  # 1-based, as the reference indexes
        b, a = r[idx - 1], r[idx - 2]
        return idx - 1 + (threshold - a) / (b - a)

    def test_firstcrossing_at_matches_reference(self):
        r = np.random.default_rng(3)
        for thr in (0.0, 0.4, -0.7, 2.5):
            for _ in range(25):
                x = r.normal(0, 1, 60)
                got = K.k_firstcrossing_at(thr)(ctx_of(x))[0]
                want = self._firstcrossing_ref(x, thr)
                assert got == want or (np.isnan(got) and np.isnan(want)), \
                    (thr, got, want)

    def test_firstcrossing_at_equal_start_returns_one(self):
        x = np.full(10, 0.5)
        x[5:] = 3.0
        assert K.k_firstcrossing_at(0.5)(ctx_of(x))[0] == 1.0

    def test_firstcrossing_at_zero_equals_default(self):
        r = np.random.default_rng(4)
        x = r.normal(0, 1, 80)
        a = K.k_firstcrossing(ctx_of(x))[0]
        b = K.k_firstcrossing_at(0.0)(ctx_of(x))[0]
        assert a == b or (np.isnan(a) and np.isnan(b))

    def test_acf_timescale_at_matches_reference(self):
        r = np.random.default_rng(5)
        for thr in (0.5, 0.2, -0.3):
            for phi in (0.9, 0.6, -0.8):  # -0.8: anticorrelated, r1 = -1
                n = 600
                eps = r.normal(0, 1, n)
                x = np.empty(n)
                x[0] = 0.0
                for t in range(1, n):
                    x[t] = phi * x[t - 1] + eps[t]
                got = K.k_acf_timescale_at(thr)(ctx_of(x))[0]
                want = firstcrossingacf_ref(x, thr)
                assert got == want or (np.isnan(got) and np.isnan(want)), \
                    (thr, phi, got, want)

    def test_acf_timescale_at_lag1_crossing_uses_lastr(self):
        # threshold high enough that |AC_1| < thr*r1: the crossing is at
        # global lag 1, where the reference's idx == 1 branch reads `a`
        # from the FIRST chunk's LAST lag (reachable only with nonzero
        # threshold)
        r = np.random.default_rng(6)
        x = r.normal(0, 1, 400)  # white noise: AC_1 ~ 0
        got = K.k_acf_timescale_at(0.9)(ctx_of(x))[0]
        want = firstcrossingacf_ref(x, 0.9)
        # a finite value PROVES the lastr branch ran: at global lag 1
        # there is no previous lag, so any other `a` would be NaN
        # (the quirk extrapolates — the value need not be in [0, 1])
        assert np.isfinite(want)
        assert got == want


def test_spd_solve_matches_lapack_and_flags_nonpd():
    """The thread-invariant Cholesky solve (no BLAS — LAPACK dgesv bits
    vary with OpenBLAS thread count, which Spark pins to 1 in workers
    but not in the driver) agrees with LAPACK to solver precision and
    flags non-PD rows instead of raising."""
    from tsf.kernels import _spd_solve
    rng = np.random.default_rng(7)
    for p in (4, 6, 10, 41):
        G = rng.normal(size=(64, p, p + 5))
        A = G @ G.transpose(0, 2, 1) + np.eye(p) * 1e-6
        b = rng.normal(size=(64, p))
        x, ok = _spd_solve(A, b)
        assert ok.all()
        xl = np.linalg.solve(A, b)
        assert np.allclose(x, xl, rtol=1e-6, atol=1e-8)
    A[0] = 0.0
    x, ok = _spd_solve(A, b)
    assert not ok[0] and ok[1:].all()
    assert np.isfinite(x).all()  # garbage rows stay NaN/inf-free


def test_pacf_bits_identical_in_spark_worker(spark):
    """PACF lag>=3 must produce the SAME BITS in a Spark python worker
    (OMP_NUM_THREADS=1) as in the driver — the property the no-BLAS
    solver exists for; np.linalg.solve violated it at lag 5."""
    from tsf.kernels import WindowCtx, _pacf
    rng = np.random.default_rng(3)
    M = rng.integers(0, 1000, size=(40, 100)).astype(np.float64)
    n = np.full(40, 100, dtype=np.int64)
    n[-1] = 37  # one ragged tail
    drv = _pacf(WindowCtx(M, n, req={"pacf": 5}))

    def worker(_):
        from tsf.kernels import WindowCtx as C, _pacf as f
        return [[float(v) for v in f(C(M, n, req={"pacf": 5})).ravel()]]

    wv = np.array(
        spark.sparkContext.parallelize([0], 1).flatMap(worker).collect()[0]
    ).reshape(drv.shape)
    eq = (wv == drv) | (np.isnan(wv) & np.isnan(drv))
    assert eq.all()
