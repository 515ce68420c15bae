"""Vectorized numpy feature kernels.

Semantics follow the reference library exactly (semantics only — clean-room
reimplementation, no code copied):

- ACF: biased, demeaned autocorrelation, StatsBase convention
  (``/root/reference/src/StatsBase.jl:6-8``): ``r(k) = sum_{t<=n-k}
  (x_t - mu)(x_{t+k} - mu) / sum_t (x_t - mu)^2``, lags 1..40.
- PACF: partial autocorrelation (``/root/reference/src/StatsBase.jl:17-19``).
  Deviation (documented): the reference delegates to StatsBase
  ``method=:regression`` (per-lag OLS); we use the Levinson-Durbin
  recursion on the biased ACF, which is vectorizable across windows.
  Our pytest oracle (`tsf.oracle`) implements the identical recursion, so
  the engine's bit-exactness contract is preserved.
- firstcrossing / firstcrossingacf: sign-corrected first threshold
  crossing of the ACF with linear interpolation between bracketing lags
  (``/root/reference/src/StatsBase.jl:29-64``). The reference's chunked
  early-exit loop is an optimization detail; one vectorized full-ACF pass
  computes the same value.
- RAD: rescaled auto-density criticality metric
  (``/root/reference/src/StatsBase.jl:81-107``): optional center-at-median
  + abs, delay embed at tau, median split, ``std(y-x) * (1/std(x[x>=med])
  - 1/std(x[x<med]))``; std is the corrected sample SD (ddof=1).
- z_score: ``(x - mean(x)) / std(x)`` with ddof=1
  (``/root/reference/src/TimeseriesFeatures.jl:25-27``).
- DN_HistogramMode_{5,10}: catch22-family histogram mode over the z-scored
  window (demanded by BASELINE.json north_rule; not in the reference
  source): 5/10 equal-width bins between min and max of z, mode = mean of
  centers of bins attaining the max count.
- Analytic signal / PLV / PPC (``/root/reference/ext/DSPExt.jl:6-46``):
  FFT Hilbert transform; PLV = ``abs(mean(exp(i x)))``; PPC via the O(N)
  closed form ``((sum cos)^2 + (sum sin)^2 - N) / (N (N-1))`` which equals
  the reference's O(N^2) pair sum exactly in exact arithmetic.

All kernels are vectorized **across windows**: input is a dense float64
matrix ``X`` of shape ``(n_windows, W)`` zero-padded past each window's
true length ``n`` (shape ``(n_windows,)``). Zero-padding of *demeaned*
values makes ragged windows free for ACF-style sums; mask-aware reductions
cover the rest. No per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np

ACF_MAX_LAG = 40  # reference ac_lags = 1:40 (src/StatsBase.jl:6)
PACF_MAX_LAG = 40


class WindowCtx:
    """Lazy, cached evaluation context for one batch of windows.

    This is the engine's SuperFeature common-subexpression-elimination:
    each named intermediate ("super": mask, mean, demeaned, z, acf, ...)
    is computed once per batch and shared by every leaf feature that
    needs it (reference contract: ``src/SuperFeatures.jl:87-117`` —
    distinct supers evaluated once via ``unique`` + ``indexin``).
    """

    def __init__(self, X: np.ndarray, n: np.ndarray):
        assert X.ndim == 2
        self.X = np.ascontiguousarray(X, dtype=np.float64)
        self.n = np.asarray(n, dtype=np.int64)
        self._cache: dict[str, np.ndarray] = {}

    @property
    def nw(self) -> int:
        return self.X.shape[0]

    @property
    def W(self) -> int:
        return self.X.shape[1]

    def get(self, name: str) -> np.ndarray:
        if name not in self._cache:
            self._cache[name] = INTERMEDIATES[name](self)
        return self._cache[name]


# ---------------------------------------------------------------- intermediates

def _mask(ctx: WindowCtx) -> np.ndarray:
    return np.arange(ctx.W)[None, :] < ctx.n[:, None]


def _sum(ctx: WindowCtx) -> np.ndarray:
    # X is zero-padded, so a plain sum is the masked sum. Pairwise float64
    # summation of integer-valued data is exact below 2^53.
    return ctx.X.sum(axis=1)


def _sumsq(ctx: WindowCtx) -> np.ndarray:
    return (ctx.X * ctx.X).sum(axis=1)


def _mean(ctx: WindowCtx) -> np.ndarray:
    with np.errstate(invalid="ignore", divide="ignore"):
        return ctx.get("sum") / ctx.n


def _std(ctx: WindowCtx) -> np.ndarray:
    # Corrected (ddof=1) sample SD from exact sums: matches
    # sqrt((sumsq - sum^2/n) / (n-1)) — the same expression our DuckDB
    # oracle SQL uses, so integer inputs give bit-identical values.
    n = ctx.n.astype(np.float64)
    s, ss = ctx.get("sum"), ctx.get("sumsq")
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (ss - s * s / n) / (n - 1.0)
        var = np.maximum(var, 0.0)  # guard tiny negative round-off
        out = np.sqrt(var)
    out[ctx.n < 2] = np.nan
    return out


def _demeaned(ctx: WindowCtx) -> np.ndarray:
    # (x - mu) masked to zero outside the window: zero-padding makes all
    # ACF overlap sums correct for ragged windows.
    d = ctx.X - ctx.get("mean")[:, None]
    d[~ctx.get("mask")] = 0.0
    return d


def _z(ctx: WindowCtx) -> np.ndarray:
    # z-score super (reference src/TimeseriesFeatures.jl:25-27); constant
    # window -> std 0 -> NaN, matching Julia 0/0 semantics.
    with np.errstate(invalid="ignore", divide="ignore"):
        z = ctx.get("demeaned") / ctx.get("std")[:, None]
    z[~ctx.get("mask")] = np.nan
    return z


def _acf_full(ctx: WindowCtx) -> np.ndarray:
    """Biased demeaned ACF at lags 1..W-1 for every window, one pass.

    Direct lag-loop (40-99 iterations of vectorized O(nw*W) work) —
    deterministic and exact-order-stable, unlike FFT round-off.
    Lags >= n are NaN. Windows with zero variance are NaN.
    """
    d = ctx.get("demeaned")
    nw, W = d.shape
    denom = (d * d).sum(axis=1)
    maxlag = W - 1
    out = np.full((nw, max(maxlag, 1)), np.nan)
    with np.errstate(invalid="ignore", divide="ignore"):
        for k in range(1, maxlag + 1):
            num = (d[:, :-k] * d[:, k:]).sum(axis=1)
            out[:, k - 1] = num / denom
    lag_idx = np.arange(1, maxlag + 1)
    out[lag_idx[None, :] >= ctx.n[:, None]] = np.nan
    out[denom == 0.0, :] = np.nan
    return out


def _acf(ctx: WindowCtx) -> np.ndarray:
    full = ctx.get("acf_full")
    k = min(ACF_MAX_LAG, full.shape[1])
    out = np.full((ctx.nw, ACF_MAX_LAG), np.nan)
    out[:, :k] = full[:, :k]
    return out


def _pacf(ctx: WindowCtx) -> np.ndarray:
    """PACF at lags 1..PACF_MAX_LAG via Levinson-Durbin, vectorized across
    windows (see module docstring for the documented deviation from the
    reference's :regression method)."""
    acf = ctx.get("acf")  # (nw, ACF_MAX_LAG), lags 1..40
    nw = ctx.nw
    K = PACF_MAX_LAG
    out = np.full((nw, K), np.nan)
    # r[0]=1, r[k]=acf[k-1]
    r = np.concatenate([np.ones((nw, 1)), acf[:, :K]], axis=1)
    phi_prev = np.zeros((nw, K + 1))
    err = np.ones(nw)
    with np.errstate(invalid="ignore", divide="ignore"):
        for k in range(1, K + 1):
            acc = r[:, k].copy()
            for j in range(1, k):
                acc = acc - phi_prev[:, j] * r[:, k - j]
            kappa = acc / err
            phi = phi_prev.copy()
            phi[:, k] = kappa
            for j in range(1, k):
                phi[:, j] = phi_prev[:, j] - kappa * phi_prev[:, k - j]
            err = err * (1.0 - kappa * kappa)
            out[:, k - 1] = kappa
            phi_prev = phi
    lag_idx = np.arange(1, K + 1)
    out[lag_idx[None, :] >= ctx.n[:, None]] = np.nan
    return out


def _analytic(ctx: WindowCtx) -> np.ndarray:
    """Analytic signal via FFT Hilbert transform (scipy.signal.hilbert
    formula, reimplemented; reference ext/DSPExt.jl:6-14). Complex output.
    Only meaningful for full windows; padded tails are excluded by NaN."""
    X = np.where(ctx.get("mask"), ctx.X, 0.0)
    nw, W = X.shape
    f = np.fft.fft(X, axis=1)
    h = np.zeros(W)
    if W % 2 == 0:
        h[0] = h[W // 2] = 1.0
        h[1:W // 2] = 2.0
    else:
        h[0] = 1.0
        h[1:(W + 1) // 2] = 2.0
    a = np.fft.ifft(f * h[None, :], axis=1)
    return a


def _analytic_phase(ctx: WindowCtx) -> np.ndarray:
    ph = np.angle(ctx.get("analytic"))
    return np.where(ctx.get("mask"), ph, np.nan)


def _analytic_amplitude(ctx: WindowCtx) -> np.ndarray:
    am = np.abs(ctx.get("analytic"))
    return np.where(ctx.get("mask"), am, np.nan)


INTERMEDIATES = {
    "mask": _mask,
    "sum": _sum,
    "sumsq": _sumsq,
    "mean": _mean,
    "std": _std,
    "demeaned": _demeaned,
    "z": _z,
    "acf_full": _acf_full,
    "acf": _acf,
    "pacf": _pacf,
    "analytic": _analytic,
    "analytic_phase": _analytic_phase,
    "analytic_amplitude": _analytic_amplitude,
}


# ---------------------------------------------------------------- leaf kernels

def k_cnt(ctx: WindowCtx) -> np.ndarray:
    return ctx.n.astype(np.float64)


def k_sum(ctx: WindowCtx) -> np.ndarray:
    return ctx.get("sum")


def k_min(ctx: WindowCtx) -> np.ndarray:
    v = np.where(ctx.get("mask"), ctx.X, np.inf).min(axis=1)
    return np.where(ctx.n > 0, v, np.nan)


def k_max(ctx: WindowCtx) -> np.ndarray:
    v = np.where(ctx.get("mask"), ctx.X, -np.inf).max(axis=1)
    return np.where(ctx.n > 0, v, np.nan)


def k_mean(ctx: WindowCtx) -> np.ndarray:
    return ctx.get("mean")


def k_std(ctx: WindowCtx) -> np.ndarray:
    return ctx.get("std")


def k_ac(lag: int):
    def f(ctx: WindowCtx) -> np.ndarray:
        return ctx.get("acf")[:, lag - 1]
    return f


def k_pacf(lag: int):
    def f(ctx: WindowCtx) -> np.ndarray:
        return ctx.get("pacf")[:, lag - 1]
    return f


def k_acf_timescale(ctx: WindowCtx) -> np.ndarray:
    """firstcrossingacf(x, 0): sign-corrected first zero crossing of the
    ACF with linear interpolation (src/StatsBase.jl:44-64), vectorized."""
    R = ctx.get("acf_full")  # (nw, W-1), lags 1..W-1, NaN past n-1
    nw = ctx.nw
    out = np.full(nw, np.nan)
    with np.errstate(invalid="ignore"):
        r1 = np.sign(R[:, 0])
        Rs = R * r1[:, None]
        below = Rs < 0.0  # NaN compares False -> never a crossing
        has = below.any(axis=1)
        idx = below.argmax(axis=1)  # first True per row (0-based lag-1 index)
        rows = np.nonzero(has)[0]
        i = idx[rows]
        b = Rs[rows, i]
        # a = previous sign-corrected value; at i==0 the reference's chunk
        # loop uses the previous chunk's last value — unreachable for
        # threshold 0 since Rs[:,0] = |AC_1| >= 0; guard with NaN.
        a = np.where(i > 0, Rs[rows, np.maximum(i - 1, 0)], np.nan)
        out[rows] = i + (0.0 - a) / (b - a)
    return out


def _histmode(ctx: WindowCtx, nbins: int) -> np.ndarray:
    z = ctx.get("z")  # NaN outside mask / for constant windows
    nw, W = z.shape
    fin = np.isfinite(z)
    any_fin = fin.any(axis=1)
    mn = np.min(np.where(fin, z, np.inf), axis=1)
    mx = np.max(np.where(fin, z, -np.inf), axis=1)
    mn[~any_fin] = np.nan
    mx[~any_fin] = np.nan
    width = (mx - mn) / nbins
    ok = np.isfinite(mn) & np.isfinite(mx)
    out = np.full(nw, np.nan)
    if not ok.any():
        return out
    with np.errstate(invalid="ignore", divide="ignore"):
        bi = np.floor((z - mn[:, None]) / width[:, None]).astype(np.float64)
    bi = np.clip(bi, 0, nbins - 1)
    valid = np.isfinite(z) & ok[:, None] & (width[:, None] > 0)
    flat = (np.arange(nw)[:, None] * nbins + bi)
    flat = flat[valid].astype(np.int64)
    counts = np.bincount(flat, minlength=nw * nbins).reshape(nw, nbins)
    maxc = counts.max(axis=1)
    centers = mn[:, None] + (np.arange(nbins)[None, :] + 0.5) * width[:, None]
    tie = counts == maxc[:, None]
    with np.errstate(invalid="ignore", divide="ignore"):
        mode = (centers * tie).sum(axis=1) / tie.sum(axis=1)
    good = ok & (maxc > 0) & (width > 0)
    out[good] = mode[good]
    return out


def k_histmode5(ctx: WindowCtx) -> np.ndarray:
    return _histmode(ctx, 5)


def k_histmode10(ctx: WindowCtx) -> np.ndarray:
    return _histmode(ctx, 10)


def _nanstd1(A: np.ndarray) -> np.ndarray:
    """Row-wise ddof=1 std ignoring NaN; rows with <2 finite values -> NaN."""
    cnt = np.isfinite(A).sum(axis=1).astype(np.float64)
    s = np.nansum(A, axis=1)
    ss = np.nansum(A * A, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (ss - s * s / cnt) / (cnt - 1.0)
        var = np.maximum(var, 0.0)
        out = np.sqrt(var)
    out[cnt < 2] = np.nan
    return out


def _rad(ctx: WindowCtx, do_abs: bool) -> np.ndarray:
    """RAD(x, tau=1, doAbs) — src/StatsBase.jl:81-107, vectorized with
    NaN-masked median splits."""
    Xn = np.where(ctx.get("mask"), ctx.X, np.nan)
    if Xn.shape[1] < 2:
        return np.full(ctx.nw, np.nan)
    short = ctx.n < 3  # emitted as NaN below; zero-fill avoids all-NaN warnings
    if short.any():
        Xn = np.where(short[:, None], 0.0, Xn)
    with np.errstate(invalid="ignore", divide="ignore"):
        if do_abs:
            med = np.nanmedian(np.where(ctx.n[:, None] > 0, Xn, np.nan), axis=1)
            Z = np.abs(Xn - med[:, None])
        else:
            Z = Xn
        x = Z[:, :-1]
        y = Z[:, 1:]
        medx = np.nanmedian(x, axis=1)
        sub = x < medx[:, None]          # NaN -> False
        sup = (~sub) & np.isfinite(x)
        sub_sd = _nanstd1(np.where(sub, x, np.nan))
        sup_sd = _nanstd1(np.where(sup, x, np.nan))
        sigma_dx = _nanstd1(y - x)
        out = sigma_dx * (1.0 / sup_sd - 1.0 / sub_sd)
    out[ctx.n < 3] = np.nan
    return out


def k_rad(ctx: WindowCtx) -> np.ndarray:
    return _rad(ctx, True)


def k_rad_raw(ctx: WindowCtx) -> np.ndarray:
    return _rad(ctx, False)


def k_plv_phase(ctx: WindowCtx) -> np.ndarray:
    """PLV of the analytic phase: abs(mean(exp(i*phi))) (ext/DSPExt.jl:36-40)."""
    ph = ctx.get("analytic_phase")
    c = np.nansum(np.cos(ph), axis=1)
    s = np.nansum(np.sin(ph), axis=1)
    n = np.isfinite(ph).sum(axis=1).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.sqrt(c * c + s * s) / n
    out[n == 0] = np.nan
    return out


def k_ppc_phase(ctx: WindowCtx) -> np.ndarray:
    """PPC (Vinck 2010 eq. 14) of the analytic phase via the O(N) closed
    form ((sum cos)^2 + (sum sin)^2 - N) / (N(N-1)) — equal to the
    reference's threaded O(N^2) pair loop (ext/DSPExt.jl:16-32)."""
    ph = ctx.get("analytic_phase")
    c = np.nansum(np.cos(ph), axis=1)
    s = np.nansum(np.sin(ph), axis=1)
    n = np.isfinite(ph).sum(axis=1).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = (c * c + s * s - n) / (n * (n - 1.0))
    out[n < 2] = np.nan
    return out


def decade_means(X: np.ndarray, n: np.ndarray, factor: int = 10):
    """Per-window means of consecutive groups of `factor` points — the
    downsample primitive for the tier cascade (segment-tree layout: a
    tier-N block stores these, and tier N+1 reads them instead of raw
    tokens). Returns (means (nw, W//factor ceil), counts (nw, groups))."""
    nw, W = X.shape
    g = -(-W // factor)
    pad = g * factor - W
    Xp = np.pad(X, ((0, 0), (0, pad)))
    mask = np.arange(W + pad)[None, :] < n[:, None]
    sums = (Xp * mask).reshape(nw, g, factor).sum(axis=2)
    cnts = mask.reshape(nw, g, factor).sum(axis=2)
    with np.errstate(invalid="ignore", divide="ignore"):
        means = sums / cnts
    return means, cnts
