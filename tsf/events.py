"""Event-stream relational operators: gap sessionization + as-of join.

Two classic time-keyed operators a training-data/event pipeline needs and
plain Spark SQL lacks as primitives (SURVEY.md §2.e/§2.g adjacents; the
reference's closest analogue is the windowed pairing in
src/FeatureSets.jl — these are the event-table counterparts, built
Spark-first rather than ported):

- :func:`sessionize` — split each key's event stream into sessions at
  idle gaps > ``gap`` seconds (the standard web-log sessionization).
  Shape: ONE hash Exchange on the key. The boundary flag (lag + gap
  compare) and the running session ordinal (cumulative sum) are window
  functions over the same ``partitionBy(key) orderBy(ts, tiebreak)``
  sort, and the follow-up per-session aggregate groups by
  ``(key, session_no)`` — a superset of the window's hash partitioning,
  so Catalyst satisfies its ClusteredDistribution without a second
  Exchange (plan-asserted in tests/test_plans.py).

- :func:`asof_join` — for every left row, the single most recent right
  row with ``right.ts <= left.ts`` per key (inclusive; ties on ts break
  by the right tiebreak column, largest wins). NOT a range join: the
  classic union trick makes it one sort per key — union both sides with
  a side tag, window ``last(right_val, ignorenulls=True)`` over
  ``orderBy(ts, side, tiebreak)`` with the right side sorting FIRST at
  equal ts (side tag 0 < 1), then keep left rows. Shape: ONE hash
  Exchange on the key + one sort — no join operator at all, no
  O(n_left * n_right) pair blow-up, and skew only matters per key (the
  same key-salting used elsewhere applies if one key dominates).

Determinism: both operators order by (ts, side, tiebreak) — a TOTAL
order per key — so results are partitioning-invariant (same rows at any
cluster size), which is what makes them oracle-checkable by value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _us(c) -> Column:
    """Microseconds-since-epoch for TIMESTAMP *or* TIMESTAMP_NTZ input
    (parquet event tables read as NTZ): the cast interprets NTZ wall
    time in the session zone, pinned to UTC by tsf.session, so this is
    exactly DuckDB's ``epoch_us``."""
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_s: int = 1800, tiebreak: str = "event_id") -> DataFrame:
    """Append ``session_no`` (0-based per key) to each event row.

    A new session starts at the first event of a key and whenever the
    idle time since the previous event EXCEEDS ``gap_s`` seconds
    (boundary at ``delta > gap_s``; an exactly-gap_s-later event stays
    in the session).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(tiebreak))
    prev = F.lag(F.col(ts)).over(w)
    # micros arithmetic avoids double rounding of sub-second timestamps
    delta_us = _us(F.col(ts)) - _us(prev)
    boundary = F.when(prev.isNull() | (delta_us > gap_s * 1_000_000), 1) \
                .otherwise(0)
    return events.withColumn(
        "session_no",
        (F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("bigint"))


def session_stats(events: DataFrame, key: str = "user_id", ts: str = "ts",
                  gap_s: int = 1800, value: str = "value",
                  tiebreak: str = "event_id") -> DataFrame:
    """Per-session rollup: bounds, event count, exact quantized value sum.

    The value sum uses 1e-4-quantized bigint arithmetic (order-free, so
    the result is bit-identical at any partitioning — same convention as
    the hourly continuous aggregate in __spark_entry__).
    """
    s = sessionize(events, key, ts, gap_s, tiebreak)
    q = F.sum(F.floor(F.col(value) * F.lit(1e4) + F.lit(0.5)).cast("bigint"))
    return (s.groupBy(key, "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"),
                 (_us(F.max(ts)) - _us(F.min(ts))).alias("duration_us"),
                 (q.cast("double") / F.lit(1e4)).alias("sum_value")))


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: list[str], tiebreak: str,
              suffix: str = "_asof",
              tolerance_s: int | None = None) -> DataFrame:
    """Most-recent-prior join: left rows + latest right row at or before
    each left ts (per key). Right ties on ts resolve to the largest
    ``tiebreak``. Left rows with no prior right row keep NULLs.

    ``tolerance_s`` bounds staleness (pandas ``merge_asof`` semantics):
    a matched right row OLDER than tolerance_s seconds is discarded
    (NULLs), applied as a row-local post-filter on the picked struct —
    the window pass is unchanged, so tolerance costs nothing at scale.

    Returns all left columns plus ``<c>{suffix}`` for c in right_cols
    and ``<ts>{suffix}`` / ``<tiebreak>{suffix}`` (the matched row's
    identity, NULL when unmatched).
    """
    carried = [*right_cols, ts, tiebreak]
    # the matched row travels as ONE struct so its columns can never mix
    # across different right rows (a per-column last(ignorenulls) would,
    # whenever a right value column is legitimately NULL)
    packed = F.struct(*[F.col(c).alias(c) for c in carried])
    lhs = left.select(
        "*", F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(packed.alias("s")).schema["s"].dataType)
        .alias("_r"))
    # a NULL-ts right row sorts FIRST (ascending NULLS FIRST) with a
    # non-NULL packed struct, so every left row preceding all real right
    # rows would "match" it — a NULL timestamp can never be at-or-before
    # anything, so such rows are excluded up front
    right = right.where(F.col(ts).isNotNull())
    # the shared sort timestamp stays populated on BOTH sides (the right
    # row's other identity travels inside the struct); every remaining
    # left column is NULL on right rows
    rhs = right.select(
        F.col(key), F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, ts)],
        F.lit(0).alias("_side"),
        packed.alias("_r"))
    u = lhs.unionByName(rhs)
    # right rows sort before left at equal ts (_side 0 < 1) -> inclusive
    # <=; among right ties the largest tiebreak lands closest to the
    # left row, so last(ignorenulls) picks it
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts), F.col("_side"), F.col(f"_r.{tiebreak}"))
         .rowsBetween(Window.unboundedPreceding, 0))
    out = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    if tolerance_s is not None:
        fresh = (_us(F.col(ts)) - _us(F.col(f"_m.{ts}"))
                 <= int(tolerance_s) * 1_000_000)
        out = out.withColumn("_m", F.when(fresh, F.col("_m")))
    return (out.where(F.col("_side") == 1)
            .select(*left.columns,
                    *[F.col(f"_m.{c}").alias(f"{c}{suffix}")
                      for c in carried]))


def session_funnel(events: DataFrame, key: str = "user_id", ts: str = "ts",
                   gap_s: int = 1800, step_a: str = "view",
                   step_b: str = "click", type_col: str = "event_type",
                   tiebreak: str = "event_id") -> DataFrame:
    """Two-step conversion funnel per session: counts of each step and
    whether the session CONVERTED (some step-A event at-or-before some
    step-B event inside the same session; simultaneous counts, matching
    the inclusive as-of convention). Same single key-Exchange shape as
    session_stats — the funnel flags are conditional aggregates over the
    sessionized rows, no extra shuffle, no join."""
    s = sessionize(events, key, ts, gap_s, tiebreak)
    ts_us = _us(F.col(ts))
    first_a = F.min(F.when(F.col(type_col) == step_a, ts_us))
    last_b = F.max(F.when(F.col(type_col) == step_b, ts_us))
    return (s.groupBy(key, "session_no")
            .agg(F.count(F.when(F.col(type_col) == step_a, 1))
                 .alias("n_step_a"),
                 F.count(F.when(F.col(type_col) == step_b, 1))
                 .alias("n_step_b"),
                 (first_a <= last_b).alias("_conv"))
            .withColumn("converted", F.coalesce("_conv", F.lit(False)))
            .drop("_conv"))
