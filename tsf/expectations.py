"""Data-contract expectations: the AUDIT stage of write-audit-publish.

A rule set is validated in ONE aggregate pass (conditional sums with
map-side partial aggregation — the corpus never shuffles rows, only one
partial stats row per task crosses the Exchange), then unpivoted to one
row per rule: (rule, col, violations, total, pass). Wire it between
``icelite.append_to_branch`` and ``icelite.fast_forward``: violations
on the staged snapshot → ``drop_branch``; clean → publish (the pattern
Iceberg + Great-Expectations deployments run; pytest-pinned in
tests/test_icelite.py).

Rule kinds (``rules`` is a list of tuples):
- ``("not_null", col)`` — NULL values are violations.
- ``("in_range", col, lo, hi)`` — values outside [lo, hi]; NULL counts
  as a violation (use not_null to attribute them separately).
- ``("matches", col, regex)`` — values not matching (RE2-safe subset so
  the DuckDB oracle replays verbatim — the tsf/pii.py discipline);
  NULL violates.
- ``("min_length", col, n)`` — length(col) < n or NULL.
- ``("unique", col)`` — violations = total - count(DISTINCT col).

Everything is integer counting, so the DuckDB replay is bit-exact.

Scale shape (100 TB): all conditional-sum rules share one
partial-aggregated scan. ``unique`` adds Spark's exact distinct
(one (col)-keyed Exchange of DISTINCT values — corpus-sized for
high-cardinality columns); for audit gates on such columns at extreme
scale, the HLL sketch (:mod:`tsf.hll`) is the bounded-state estimate —
this operator keeps the EXACT count because an audit gate should not
pass on an estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _satisfied_sql(rule: tuple, duck: bool = False) -> str:
    kind = rule[0]
    if kind == "not_null":
        return f"{rule[1]} IS NOT NULL"
    if kind == "in_range":
        _, col, lo, hi = rule
        return f"coalesce({col} BETWEEN {lo} AND {hi}, false)"
    if kind == "matches":
        _, col, rx = rule
        m = (f"regexp_matches({col}, '{rx}')" if duck
             else f"{col} RLIKE '{rx}'")
        return f"coalesce({m}, false)"
    if kind == "min_length":
        _, col, n = rule
        return f"coalesce(length({col}) >= {int(n)}, false)"
    raise ValueError(f"unknown rule kind {rule[0]!r}")


def _rule_name(rule: tuple) -> str:
    return "_".join(str(p) for p in rule)


def audit_expectations(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Validate ``rules`` over ``df`` in one aggregate pass. Returns
    (rule, col, violations, total, pass) — one row per rule."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, r in enumerate(rules):
        if r[0] == "unique":
            aggs.append(F.countDistinct(F.col(r[1])).alias(f"_d{i}"))
        else:
            aggs.append(F.sum(
                F.expr(f"IF({_satisfied_sql(r)}, 0L, 1L)")).alias(f"_v{i}"))
    row = df.agg(*aggs)
    structs = []
    for i, r in enumerate(rules):
        viol = (F.col("_total") - F.col(f"_d{i}") if r[0] == "unique"
                else F.coalesce(F.col(f"_v{i}"), F.lit(0)))
        structs.append(F.struct(
            F.lit(_rule_name(r)).alias("rule"),
            F.lit(r[1]).alias("col"),
            viol.cast("long").alias("violations"),
            F.col("_total").cast("long").alias("total")))
    return (row.select(F.explode(F.array(*structs)).alias("r"))
               .select("r.*")
               .withColumn("pass", F.col("violations") == 0))


def audit_passes(df: DataFrame, rules: list[tuple]) -> bool:
    """True iff every rule passes — the WAP publish gate."""
    bad = audit_expectations(df, rules).where("NOT pass").count()
    return bad == 0


def audit_expectations_duckdb(table_sql: str, rules: list[tuple]) -> str:
    """DuckDB replay of :func:`audit_expectations` (same conditional
    sums, same NULL-violates semantics, same exact distinct)."""
    aggs = ["CAST(count(*) AS BIGINT) AS _total"]
    for i, r in enumerate(rules):
        if r[0] == "unique":
            aggs.append(f"CAST(count(DISTINCT {r[1]}) AS BIGINT) AS _d{i}")
        else:
            sat = _satisfied_sql(r, duck=True)
            aggs.append(f"CAST(sum(CASE WHEN {sat} THEN 0 ELSE 1 END) "
                        f"AS BIGINT) AS _v{i}")
    picks = []
    for i, r in enumerate(rules):
        viol = (f"_total - _d{i}" if r[0] == "unique"
                else f"coalesce(_v{i}, 0)")
        picks.append(
            f"SELECT '{_rule_name(r)}' AS rule, '{r[1]}' AS col, "
            f"CAST({viol} AS BIGINT) AS violations, _total AS total, "
            f"({viol}) = 0 AS pass FROM a")
    return (f"WITH t AS ({table_sql}), "
            f"a AS (SELECT {', '.join(aggs)} FROM t) "
            + " UNION ALL ".join(picks))
