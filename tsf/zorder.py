"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet/Iceberg file pruning works off per-file column min/max stats
(`tsf/icelite.py plan_files`). A layout sorted by ONE column gives tight
bounds on that column only — a predicate on a second dimension prunes
nothing. Interleaving the bits of two rank-bucketed dimensions into one
Z-order key and RANGE-partitioning by it keeps every file's bounding box
tight in BOTH dimensions, so 2-D box predicates skip files (what Delta
OPTIMIZE ZORDER BY / Iceberg's sort-order z-ordering do).

Scale shape (100 TB): the per-column min/max come from ONE tiny
aggregate row broadcast back (the corpus never shuffles for stats);
the key itself is a row-local integer fold; the ONLY corpus Exchange is
the RangePartitioning repartition that IS the requested layout — the
same shuffle a plain sort-by-one-column layout pays (plan-asserted:
no hashpartitioning Exchange anywhere).

Everything is integer arithmetic (equi-width buckets via BIGINT floor
division, bit interleave via shift/AND folds), so the DuckDB oracle
replays every key bit-for-bit.

Bounds: bucket math computes (x - min) * 2^bits in BIGINT — safe while
the column's value RANGE stays below 2^(63 - bits) (n_chars/n_tok-like
columns; not raw xxhash64 values).

Reference parity: the reference has no storage layer (in-memory Julia
arrays); this is part of the Spark-native persistence surface the north
rule adds (salted/bucketed Iceberg layout story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_BITS = 8


def _bucket_expr(col: str, mn: str, mx: str, bits: int) -> str:
    """Equi-width bucket in [0, 2^bits): floor((x-mn)*2^bits/(mx-mn+1)).
    Integer-exact; a constant column (mx == mn) lands in bucket 0."""
    nb = 1 << bits
    return (f"CAST(((CAST({col} AS BIGINT) - {mn}) * {nb}L) "
            f"div ({mx} - {mn} + 1L) AS BIGINT)")


def _interleave_expr(ba: str, bb: str, bits: int) -> str:
    """Morton interleave of two bucket values: bit i of ``ba`` lands at
    position 2i, bit i of ``bb`` at 2i+1 — one row-local fold."""
    return (f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
            f"acc + shiftleft(shiftright({ba}, CAST(i AS INT)) & 1L, "
            f"CAST(2 * i AS INT)) "
            f"+ shiftleft(shiftright({bb}, CAST(i AS INT)) & 1L, "
            f"CAST(2 * i + 1 AS INT)))")


def with_zorder(df: DataFrame, col_a: str, col_b: str,
                bits: int = DEFAULT_BITS) -> DataFrame:
    """Add ``b_a``/``b_b`` (equi-width rank buckets of the two integer
    columns) and ``zkey`` (their Morton interleave). One tiny min/max
    aggregate broadcasts back onto the unshuffled scan."""
    bits = int(bits)
    stats = df.agg(
        F.min(F.col(col_a).cast("long")).alias("_mn_a"),
        F.max(F.col(col_a).cast("long")).alias("_mx_a"),
        F.min(F.col(col_b).cast("long")).alias("_mn_b"),
        F.max(F.col(col_b).cast("long")).alias("_mx_b"))
    j = df.crossJoin(F.broadcast(stats))
    ba = _bucket_expr(col_a, "_mn_a", "_mx_a", bits)
    bb = _bucket_expr(col_b, "_mn_b", "_mx_b", bits)
    return (j.withColumn("b_a", F.expr(ba))
             .withColumn("b_b", F.expr(bb))
             .withColumn("zkey", F.expr(_interleave_expr("b_a", "b_b", bits)))
             .drop("_mn_a", "_mx_a", "_mn_b", "_mx_b"))


def zorder_layout(df: DataFrame, col_a: str, col_b: str,
                  num_files: int, bits: int = DEFAULT_BITS) -> DataFrame:
    """The write-side layout: range-partition by the Z-order key so
    each output file covers a compact Morton range — a tight bounding
    box in BOTH dimensions. Feed this straight to a parquet/icelite
    write; downstream 2-D box scans prune files off footer stats."""
    return (with_zorder(df, col_a, col_b, bits)
            .repartitionByRange(int(num_files), "zkey", col_a, col_b))


def zorder_duckdb(table_sql: str, col_a: str, col_b: str,
                  bits: int = DEFAULT_BITS, key: str = "doc_id") -> str:
    """DuckDB replay of :func:`with_zorder` over ``table_sql`` (a query
    producing ``key``, ``col_a``, ``col_b``) — same BIGINT bucket floor
    division, same interleave fold."""
    bits = int(bits)
    nb = 1 << bits

    def bucket(col, mn, mx):
        return (f"CAST(((CAST({col} AS BIGINT) - {mn}) * {nb}) "
                f"// ({mx} - {mn} + 1) AS BIGINT)")

    inter = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
             f"list_transform(range(0, {bits}), i -> "
             f"(((b_a >> i) & 1) << (2 * i)) "
             f"+ (((b_b >> i) & 1) << (2 * i + 1)))), (a, x) -> a + x)")
    return f"""
    WITH t AS ({table_sql}),
    s AS (SELECT CAST(min({col_a}) AS BIGINT) AS mn_a,
                 CAST(max({col_a}) AS BIGINT) AS mx_a,
                 CAST(min({col_b}) AS BIGINT) AS mn_b,
                 CAST(max({col_b}) AS BIGINT) AS mx_b
          FROM t),
    b AS (SELECT {key}, {bucket(col_a, "mn_a", "mx_a")} AS b_a,
                 {bucket(col_b, "mn_b", "mx_b")} AS b_b
          FROM t, s)
    SELECT {key}, b_a, b_b, {inter} AS zkey FROM b
    """
