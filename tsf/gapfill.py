"""Gap-fill over rolled-up rows: grid densify + LOCF + linear interpolation.

Operates at the rolled-up row level (rows << tokens, so classic Spark
window functions are cheap here — SURVEY.md §2.g). Generic over any
(key cols, index col, value cols) frame:

- :func:`densify` — explode the full index grid per key
  (``sequence(min..max)``) and left-join observed rows onto it.
- :func:`locf` — last observation carried forward via
  ``last(value, ignorenulls=True)`` over an unbounded-preceding window.
- :func:`linear` — linear interpolation between the bracketing observed
  points via last/next value+index pairs; falls back to LOCF at the tail
  (no next point) and stays null before the first observation.

`fill_method` marks each output row: exact | locf | linear | null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def densify(df: DataFrame, keys: list[str], idx: str,
            lo: int | None = None, hi: int | None = None) -> DataFrame:
    """One row per key per index in [lo, hi] (defaults: per-key min/max)."""
    agg = [F.min(idx).alias("_lo"), F.max(idx).alias("_hi")]
    bounds = df.groupBy(*keys).agg(*agg)
    lo_e = F.lit(lo) if lo is not None else F.col("_lo")
    hi_e = F.lit(hi) if hi is not None else F.col("_hi")
    grid = (bounds
            .withColumn(idx, F.explode(F.sequence(lo_e.cast("bigint"),
                                                  hi_e.cast("bigint"))))
            .drop("_lo", "_hi"))
    return grid.join(df, on=[*keys, idx], how="left")


def locf(df: DataFrame, keys: list[str], idx: str, values: list[str]) -> DataFrame:
    w = (Window.partitionBy(*keys).orderBy(idx)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = df
    for v in values:
        out = out.withColumn(v + "_filled", F.last(v, ignorenulls=True).over(w))
    return out


def linear(df: DataFrame, keys: list[str], idx: str, values: list[str],
           mark: bool = True) -> DataFrame:
    """Linear interpolation of null `values` between observed neighbours."""
    wprev = (Window.partitionBy(*keys).orderBy(idx)
             .rowsBetween(Window.unboundedPreceding, 0))
    wnext = (Window.partitionBy(*keys).orderBy(idx)
             .rowsBetween(0, Window.unboundedFollowing))
    out = df
    first_v = values[0]
    prev_i = F.last(F.when(F.col(first_v).isNotNull(), F.col(idx)), ignorenulls=True).over(wprev)
    next_i = F.first(F.when(F.col(first_v).isNotNull(), F.col(idx)), ignorenulls=True).over(wnext)
    out = out.withColumn("_pi", prev_i).withColumn("_ni", next_i)
    for v in values:
        pv = F.last(v, ignorenulls=True).over(wprev)
        nv = F.first(v, ignorenulls=True).over(wnext)
        frac = ((F.col(idx) - F.col("_pi"))
                / (F.col("_ni") - F.col("_pi"))).cast("double")
        interp = (F.when(F.col(v).isNotNull(), F.col(v))
                  .when(F.col("_pi").isNull(), F.lit(None))
                  .when(F.col("_ni").isNull(), pv)             # tail -> LOCF
                  .otherwise(pv + (nv - pv) * frac))
        out = out.withColumn(v + "_filled", interp)
    if mark:
        out = out.withColumn(
            "fill_method",
            F.when(F.col(first_v).isNotNull(), F.lit("exact"))
            .when(F.col("_pi").isNull(), F.lit("null"))
            .when(F.col("_ni").isNull(), F.lit("locf"))
            .otherwise(F.lit("linear")))
    return out.drop("_pi", "_ni")


def gapfill_rollup(rollup: DataFrame, values: list[str],
                   method: str = "linear") -> DataFrame:
    """Densify each doc's window grid (0..max window_id) and fill features."""
    base = densify(rollup, ["doc_id", "source", "tier"], "window_id", lo=0)
    if method == "locf":
        return locf(base, ["doc_id", "source", "tier"], "window_id", values)
    return linear(base, ["doc_id", "source", "tier"], "window_id", values)
