"""FeatureSet algebra + super-dedup tests (mirrors reference "Features" /
"FeatureSet" / "SuperFeatures" test items, /root/reference/test/runtests.jl)."""

import time

import numpy as np
import pytest

from tsf import kernels as K
from tsf.registry import Feature, FeatureSet, catalogue

rng = np.random.default_rng(0)


def test_identity_by_name():
    a = Feature("f", K.k_mean, "one")
    b = Feature("f", K.k_std, "other")  # same name, different method
    assert a == b and hash(a) == hash(b)  # src/Features.jl:62-64 semantics


def test_indexing_and_slicing():
    fs = catalogue()
    assert fs["mean"].name == "mean"
    sub = fs[["mean", "std", "ac_1"]]
    assert sub.names == ["mean", "std", "ac_1"]
    assert fs[0].name == "cnt"
    assert "mean" in fs and "nope" not in fs


def test_set_algebra():
    fs = catalogue()
    a = fs[["mean", "std"]]
    b = fs[["std", "ac_1"]]
    assert (a + b).names == ["mean", "std", "ac_1"]       # union keeps LHS
    assert (a | b).names == ["mean", "std", "ac_1"]
    assert (a & b).names == ["std"]
    assert (a - b).names == ["mean"]
    assert (a + b) == (a | b)


def test_keyword_filter():
    fs = catalogue()
    corr = fs.with_keyword("correlation")
    assert "ac_1" in corr and "mean" not in corr


def test_feature_callable_single_series():
    # reference: 𝑓(1:10) == 55 for sum (src/Features.jl docstring)
    fs = catalogue()
    assert fs["sum_tok"](np.arange(1, 11)) == 55.0
    assert fs["cnt"](np.arange(1, 11)) == 10.0


def test_super_dedup_computes_intermediate_once(monkeypatch):
    """The reference contract: distinct supers evaluated once per batch
    (src/SuperFeatures.jl:96-110). Count acf_full invocations."""
    calls = {"acf": 0, "demeaned": 0}

    def counting(name):
        orig = K.INTERMEDIATES[name]

        def f(ctx):
            calls[name] += 1
            return orig(ctx)
        return f

    monkeypatch.setitem(K.INTERMEDIATES, "acf", counting("acf"))
    monkeypatch.setitem(K.INTERMEDIATES, "demeaned", counting("demeaned"))
    fs = catalogue()[[f"ac_{i}" for i in range(1, 41)] + ["acf_timescale"]]
    X = rng.normal(0, 1, (50, 100))
    fs.evaluate(X, np.full(50, 100))
    assert calls["acf"] == 1       # 40 AC leaves, ONE ACF pass
    assert calls["demeaned"] == 1  # shared with the timescale kernel


def test_super_dedup_speedup():
    """Performance-as-correctness (reference test/runtests.jl:548-558):
    40 AC features via the shared ACF must beat 40 independent ACF
    evaluations by >= 1.5x."""
    X = rng.normal(0, 1, (200, 100))
    n = np.full(200, 100)
    fs = catalogue()[[f"ac_{i}" for i in range(1, 41)]]

    t0 = time.perf_counter()
    for _ in range(3):
        fs.evaluate(X, n)
    fast = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(3):
        for f in fs:
            ctx = K.WindowCtx(X, n)  # fresh ctx -> no sharing
            f.method(ctx)
    slow = time.perf_counter() - t0
    assert fast < slow / 1.5, (fast, slow)


def test_dedup_fast_equals_slow_bitexact():
    """Reference test/runtests.jl:421-445: fast (shared) path output ==
    slow (independent) path output, exact equality."""
    X = rng.normal(0, 1, (30, 100))
    n = np.full(30, 100)
    fs = catalogue()[[f"ac_{i}" for i in range(1, 41)]]
    fast = fs.evaluate(X, n)
    for f in fs:
        ctx = K.WindowCtx(X, n)
        slow = f.method(ctx)
        assert np.array_equal(fast[f.name], slow, equal_nan=True)


def test_user_registered_super_feature():
    """Public SuperFeature API (reference src/SuperFeatures.jl:31-49):
    register a custom shared transform once, hang two leaves off it, and
    verify (a) values, (b) merge-naming, (c) the super runs ONCE per batch."""
    from tsf.registry import FeatureSet, register_intermediate, super_feature

    calls = {"n": 0}

    def my_super(ctx):
        calls["n"] += 1
        # first difference, NaN-padded to window width
        d = np.diff(ctx.X, axis=1)
        out = np.full_like(ctx.X, np.nan)
        out[:, :-1] = d
        out[np.arange(ctx.X.shape[1])[None, :] >= (ctx.n[:, None] - 1)] = np.nan
        return out

    f_mean = super_feature(lambda s: np.nanmean(s, axis=1),
                           "mean", "absdiff_t", my_super, merge=True)
    f_max = super_feature(lambda s: np.nanmax(s, axis=1),
                          "max", "absdiff_t", merge=True)
    assert f_mean.name == "mean_absdiff_t"  # SuperFeatures.jl:34 naming
    assert f_max.name == "max_absdiff_t"

    X = rng.normal(0, 1, (10, 50))
    n = np.full(10, 50)
    out = FeatureSet([f_mean, f_max]).evaluate(X, n)
    assert calls["n"] == 1  # CSE: one super pass for both leaves
    want_mean = np.diff(X, axis=1).mean(axis=1)
    np.testing.assert_allclose(out["mean_absdiff_t"], want_mean, rtol=1e-12)

    # re-declaring via super_feature is last-wins (rebuilding a
    # FeatureSet twice must not raise) ...
    f_again = super_feature(lambda s: np.nanmean(s, axis=1),
                            "mean", "absdiff_t", my_super, merge=True)
    assert f_again.name == "mean_absdiff_t"
    # ... but the explicit registry call stays strict about collisions
    import pytest as _pytest
    with _pytest.raises(ValueError):
        register_intermediate("absdiff_t", lambda ctx: ctx.X)
    # unknown super without a fn is refused
    with _pytest.raises(KeyError):
        super_feature(lambda s: s[:, 0], "x", "nope_super")
    del K.INTERMEDIATES["absdiff_t"]  # leave the global registry clean


def test_lagless_acf_super_leaf_gets_full_budget():
    """A custom lag-less leaf over the shared 'acf' matrix must see the
    FULL reference lag range even when low-lag ac_k leaves share the
    set: the lag budget is sized by max(requested lags, full-range for
    lag-less readers), so a feature's value cannot depend on which
    other features happen to be evaluated alongside it."""
    import numpy as np
    from tsf import kernels as K
    from tsf.registry import FeatureSet, catalogue, super_feature

    mean_acf = super_feature(lambda acf: np.nanmean(acf, axis=1),
                             "mean_acf", "acf")
    rng = np.random.default_rng(3)
    X = rng.normal(size=(6, 64))
    n = np.full(6, 64)
    alone = FeatureSet([mean_acf]).evaluate(X, n)["mean_acf"]
    with_ac1 = FeatureSet([catalogue()["ac_1"], mean_acf]) \
        .evaluate(X, n)["mean_acf"]
    assert np.array_equal(alone, with_ac1, equal_nan=True)
    # and the full range really is 40 lags, not ac_1's budget of 1
    ctx = K.WindowCtx(X, n, req={"acf": K.ACF_MAX_LAG})
    want = np.nanmean(ctx.get("acf"), axis=1)
    assert np.array_equal(alone, want, equal_nan=True)
