"""Feature / SuperFeature / FeatureSet registry.

Clean-room re-expression of the reference's metadata layer:

- ``Feature``: a kernel annotated with name / description / keywords;
  **identity and hashing are by name only** (reference
  ``src/Features.jl:39-44,62-64``).
- ``super``: the name of a shared intermediate ("super feature",
  ``src/SuperFeatures.jl:22-30``). Evaluation computes each distinct
  intermediate once per batch and fans out leaves — the reference's
  ``unique``/``indexin`` CSE (``src/SuperFeatures.jl:87-117``) is realized
  here by :class:`tsf.kernels.WindowCtx` cache lookups.
- ``FeatureSet``: ordered, name-indexed, supports ``+`` (vcat), ``|``
  (union, keeps LHS on collision), ``&`` (intersect), ``-`` (setdiff),
  slicing by name / index / list, and ``filter`` — reference
  ``src/FeatureSets.jl:38-96``, ``src/SuperFeatures.jl:140-162``.

Evaluation of a FeatureSet over a batch of windows is ONE pass over the
shared :class:`WindowCtx` producing a dict of float64 columns — this is
the engine's single-UDF-per-stage contract (never one Python UDF per
feature).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

import numpy as np

from tsf import kernels as K


@dataclass(frozen=True)
class Feature:
    """A named scalar functional over one window of a series."""

    name: str
    method: Callable[[K.WindowCtx], np.ndarray] = field(compare=False)
    description: str = field(default="", compare=False)
    keywords: tuple[str, ...] = field(default=(), compare=False)
    #: name of the shared intermediate this leaf reads (None = raw window);
    #: informational — the WindowCtx cache enforces compute-once regardless.
    super: str | None = field(default=None, compare=False)
    #: for lagged leaves (ac_k / pacf_k): the lag this leaf reads, so
    #: evaluation sizes the shared ACF/PACF pass to the max lag actually
    #: requested instead of the full reference range.
    lag: int | None = field(default=None, compare=False)

    def __hash__(self) -> int:  # identity by name (src/Features.jl:62-64)
        return hash(self.name)

    def __call__(self, x) -> float:
        """Evaluate on a single 1-D series (reference src/Features.jl:55)."""
        x = np.asarray(x, dtype=np.float64)
        ctx = K.WindowCtx(x[None, :], np.array([x.size]))
        return float(self.method(ctx)[0])


class FeatureSet:
    """Ordered, name-indexed collection of Features with set algebra."""

    def __init__(self, features: Iterable[Feature] = ()):
        self._feats: list[Feature] = []
        self._by_name: dict[str, Feature] = {}
        for f in features:
            self.append(f)

    # -- collection protocol -------------------------------------------------
    def append(self, f: Feature) -> None:
        if f.name in self._by_name:  # name-keyed: keep first (LHS) occurrence
            return
        self._feats.append(f)
        self._by_name[f.name] = f

    def __len__(self) -> int:
        return len(self._feats)

    def __iter__(self):
        return iter(self._feats)

    def __contains__(self, item) -> bool:
        name = item.name if isinstance(item, Feature) else item
        return name in self._by_name

    def __getitem__(self, key):
        if isinstance(key, str):
            return self._by_name[key]
        if isinstance(key, (list, tuple)):
            return FeatureSet(self[k] for k in key)
        if isinstance(key, slice):
            return FeatureSet(self._feats[key])
        return self._feats[key]

    def __delitem__(self, key) -> None:
        f = self[key]
        self._feats.remove(f)
        del self._by_name[f.name]

    @property
    def names(self) -> list[str]:
        return [f.name for f in self._feats]

    def filter(self, pred: Callable[[Feature], bool]) -> "FeatureSet":
        return FeatureSet(f for f in self._feats if pred(f))

    def with_keyword(self, kw: str) -> "FeatureSet":
        return self.filter(lambda f: kw in f.keywords)

    # -- set algebra (src/FeatureSets.jl:38-40, SuperFeatures.jl:140-162) ----
    def __add__(self, other) -> "FeatureSet":
        return FeatureSet([*self, *_lift(other)])

    __or__ = __add__  # union keeps LHS on name collision

    def __and__(self, other) -> "FeatureSet":
        names = {f.name for f in _lift(other)}
        return self.filter(lambda f: f.name in names)

    def __sub__(self, other) -> "FeatureSet":
        names = {f.name for f in _lift(other)}
        return self.filter(lambda f: f.name not in names)

    def __eq__(self, other) -> bool:
        return isinstance(other, FeatureSet) and self.names == other.names

    def __repr__(self) -> str:
        return f"FeatureSet({self.names})"

    # -- evaluation -----------------------------------------------------------

    #: rows per evaluation tile: every kernel makes tens of full passes
    #: over its batch, so tiles are sized to keep one tile's working set
    #: (~tile * W * 8B * a few intermediates) inside the CPU cache instead
    #: of streaming DRAM — measured ~1.5-2x kernel throughput and much
    #: better many-worker scaling (each worker stops fighting for the
    #: memory bus). Per-row independence makes tiling bit-invisible
    #: (enforced by tests/test_kernels.py::test_padded_matrix_equals_per_row).
    TILE_ROWS = 4096

    def evaluate(self, X: np.ndarray, n: np.ndarray,
                 return_type=None) -> dict[str, np.ndarray]:
        """One pass over a batch of windows -> {feature name: (nw,) array}.

        Distinct supers are computed once via the shared WindowCtx cache
        (reference src/SuperFeatures.jl:96-110); lagged supers (acf/pacf)
        are sized to the max lag any requested leaf reads.

        ``return_type``: optional numpy dtype for the OUTPUT arrays — the
        reference's positional output-type conversion
        (src/FeatureArrays.jl:217-222, src/SuperFeatures.jl:93-95).
        Kernels always compute in float64; the conversion is applied to
        the finished values (e.g. float32 to halve rollup storage)."""
        # lag budget per budgeted intermediate: a lag-annotated leaf
        # (ac_k / pacf_k) asks for its own lag; a LAG-LESS leaf reading
        # the same intermediate (e.g. a custom super_feature over the
        # whole 'acf' matrix) must force the FULL reference range —
        # otherwise its matrix would silently shrink to whatever lags
        # the other leaves in the set happen to request, making the
        # same named feature return different values per set composition
        full = {"acf": K.ACF_MAX_LAG, "pacf": K.PACF_MAX_LAG}
        req: dict[str, int] = {}
        for f in self:
            if f.super in full:
                want = f.lag if f.lag is not None else full[f.super]
                req[f.super] = max(req.get(f.super, 0), want)
        dt = np.dtype(return_type) if return_type is not None else np.float64
        nw = X.shape[0]
        if nw <= self.TILE_ROWS:
            ctx = K.WindowCtx(X, n, req=req)
            return {f.name: np.asarray(f.method(ctx),
                                       dtype=np.float64).astype(dt, copy=False)
                    for f in self}
        out = {f.name: np.empty(nw, dtype=dt) for f in self}
        for lo in range(0, nw, self.TILE_ROWS):
            hi = min(lo + self.TILE_ROWS, nw)
            ctx = K.WindowCtx(X[lo:hi], n[lo:hi], req=req)
            for f in self:
                out[f.name][lo:hi] = f.method(ctx)
        return out

    def evaluate_series(self, x, width: int | None = None) -> dict[str, float]:
        """Evaluate on one series. Note: numpy's pairwise summation tree
        depends on the padded matrix width, so a ragged window's values can
        differ in the last ULP between widths. The engine always uses the
        tier's fixed window W — pass ``width=W`` to reproduce engine output
        for a partial window exactly."""
        x = np.asarray(x, dtype=np.float64)
        w = max(width or 0, x.size)
        xp = np.zeros((1, w))
        xp[0, :x.size] = x
        out = self.evaluate(xp, np.array([x.size]))
        return {k: float(v[0]) for k, v in out.items()}

    @property
    def supers(self) -> list[str]:
        """Distinct shared intermediates, in first-use order."""
        seen: list[str] = []
        for f in self:
            if f.super is not None and f.super not in seen:
                seen.append(f.super)
        return seen


def register_intermediate(name: str, fn: Callable[[K.WindowCtx], np.ndarray],
                          overwrite: bool = False) -> None:
    """Register a shared transform ("super") under ``name``.

    ``fn`` receives the batch :class:`~tsf.kernels.WindowCtx` (raw window
    matrix ``ctx.X``, lengths ``ctx.n``, and any other cached
    intermediate via ``ctx.get``) and returns an array whose leading dim
    is the window count. Every leaf that names this super shares ONE
    evaluation per batch — the reference's ``unique``/``indexin`` CSE
    (src/SuperFeatures.jl:96-110)."""
    if name in K.INTERMEDIATES and K.INTERMEDIATES[name] is not fn \
            and not overwrite:
        raise ValueError(f"intermediate {name!r} already registered")
    K.INTERMEDIATES[name] = fn


def super_feature(leaf_fn: Callable[[np.ndarray], np.ndarray],
                  name: str,
                  super_name: str,
                  super_fn: Callable[[K.WindowCtx], np.ndarray] | None = None,
                  *, merge: bool = False, description: str = "",
                  keywords: tuple[str, ...] = ()) -> Feature:
    """User-facing SuperFeature construction (reference
    ``src/SuperFeatures.jl:31-49``): ``leaf_fn`` consumes the shared
    transform's output; ``merge=True`` reproduces the reference's merged
    naming ``Symbol(name, "_", super)`` (src/SuperFeatures.jl:34-36).

    ``super_fn`` may be omitted when the super is already registered
    (built-in intermediates like ``"z"``, ``"acf"``, ``"analytic_phase"``,
    or a prior :func:`register_intermediate`). Re-declaring a super here
    is last-wins (rebuilding the same FeatureSet twice — a per-job
    builder, a re-run notebook cell — must not raise); only the explicit
    :func:`register_intermediate` is strict about collisions."""
    if super_fn is not None:
        register_intermediate(super_name, super_fn, overwrite=True)
    elif super_name not in K.INTERMEDIATES:
        raise KeyError(f"unknown super {super_name!r}; pass super_fn")
    if merge:
        name = f"{name}_{super_name}"

    def method(ctx: K.WindowCtx) -> np.ndarray:
        return np.asarray(leaf_fn(ctx.get(super_name)), dtype=np.float64)

    return Feature(name, method, description, keywords, super=super_name)


def _lift(x) -> "FeatureSet":
    if isinstance(x, FeatureSet):
        return x
    if isinstance(x, Feature):
        return FeatureSet([x])
    return FeatureSet(x)


# ---------------------------------------------------------------- catalogue

def _stats() -> list[Feature]:
    mk = Feature
    feats = [
        mk("cnt", K.k_cnt, "Number of points in window", ("distribution",)),
        mk("sum_tok", K.k_sum, "Sum of values", ("distribution",)),
        mk("min_tok", K.k_min, "Minimum value", ("distribution",)),
        mk("max_tok", K.k_max, "Maximum value", ("distribution",)),
        mk("mean", K.k_mean, "Arithmetic mean", ("distribution",), super="mean"),
        mk("std", K.k_std, "Corrected sample SD (ddof=1)", ("distribution",), super="std"),
    ]
    return feats


def _acf_feats(max_lag: int = K.ACF_MAX_LAG) -> list[Feature]:
    # reference: AC = SuperFeatureSet over shared ACF (src/StatsBase.jl:10-15)
    return [
        Feature(f"ac_{l}", K.k_ac(l), f"Autocorrelation at lag {l}",
                ("correlation",), super="acf", lag=l)
        for l in range(1, max_lag + 1)
    ]


def _pacf_feats(max_lag: int = K.PACF_MAX_LAG) -> list[Feature]:
    # reference: Partial_AC over shared PACF (src/StatsBase.jl:21-27)
    return [
        Feature(f"pacf_{l}", K.k_pacf(l), f"Partial autocorrelation at lag {l}",
                ("correlation",), super="pacf", lag=l)
        for l in range(1, max_lag + 1)
    ]


def catalogue() -> FeatureSet:
    """The full feature catalogue (reference parity + north-rule additions)."""
    fs = FeatureSet(_stats())
    for f in _acf_feats():
        fs.append(f)
    for f in _pacf_feats():
        fs.append(f)
    fs.append(Feature("acf_timescale", K.k_acf_timescale,
                      "First zero-crossing of the ACF, linearly interpolated "
                      "(firstcrossingacf, src/StatsBase.jl:44-64)",
                      ("correlation", "timescale"), super="acf_denom"))
    fs.append(Feature("firstcrossing", K.k_firstcrossing,
                      "Sign-corrected first zero crossing of the raw window, "
                      "linearly interpolated (src/StatsBase.jl:29-42)",
                      ("timescale",), super="xnan"))
    fs.append(Feature("histmode5", K.k_histmode5,
                      "DN_HistogramMode_5 over z-scored window (catch22 family)",
                      ("distribution",), super="z"))
    fs.append(Feature("histmode10", K.k_histmode10,
                      "DN_HistogramMode_10 over z-scored window (catch22 family)",
                      ("distribution",), super="z"))
    fs.append(Feature("rad", K.k_rad,
                      "CR_RAD rescaled auto-density criticality metric, centered "
                      "(src/StatsBase.jl:109-111)", ("criticality",)))
    fs.append(Feature("rad_raw", K.k_rad_raw,
                      "CR_RAD_raw, uncentered (src/StatsBase.jl:112-114)",
                      ("criticality",)))
    fs.append(Feature("rad_tau", K.k_rad_tau,
                      "RAD(x, :τ, true): delay = rounded first ACF zero "
                      "crossing (src/StatsBase.jl:87-89)", ("criticality",)))
    fs.append(Feature("analytic_amp_mean", K.k_amp_mean,
                      "Mean analytic amplitude (Analytic_Amplitude leaf, "
                      "ext/DSPExt.jl:13-15)", ("amplitude",),
                      super="analytic_amplitude"))
    fs.append(Feature("analytic_amp_std", K.k_amp_std,
                      "SD (ddof=1) of the analytic amplitude",
                      ("amplitude",), super="analytic_amplitude"))
    fs.append(Feature("plv_phase", K.k_plv_phase,
                      "Phase-locking value of the analytic phase "
                      "(ext/DSPExt.jl:36-40)", ("phase",), super="analytic_phase"))
    fs.append(Feature("ppc_phase", K.k_ppc_phase,
                      "Pairwise phase consistency of the analytic phase, O(N) "
                      "closed form (ext/DSPExt.jl:16-32)", ("phase",),
                      super="analytic_phase"))
    return fs


#: default per-window feature set used by the tier rollup — the catch22-ish
#: subset named by the north rule plus continuous aggregates; full
#: ``catalogue()`` remains available to callers.
def default_rollup_features() -> FeatureSet:
    fs = FeatureSet(_stats())
    for f in _acf_feats(10):
        fs.append(f)
    for f in _pacf_feats(5):
        fs.append(f)
    for name in ("acf_timescale", "histmode5", "histmode10", "rad", "rad_raw"):
        fs.append(catalogue()[name])
    return fs
