"""HyperLogLog distinct counting — bounded-memory distinct n-grams per
source at any corpus size (Flajolet, Fusy, Gandouet & Meunier 2007).

Exact distinct counting (count(DISTINCT gram)) shuffles one row per
DISTINCT gram; at 100 TB the distinct web n-gram set is itself TB-sized,
so both the Exchange and the final per-group hash table are corpus-sized.
The sketch path bounds both to m registers per group no matter the corpus:

- gram hashes are row-local (xxhash64 over the n-token chain — the
  seeded hashInt chain `tsf/xxh64_sql.py` replays bit-exactly);
- register = low log2(m) hash bits, rank = trailing-zero count of the
  remaining bits + 1, derived with pure integer CASE arithmetic so both
  engines agree on every register bit-for-bit (no log2/float bit tricks);
- ONE (source, reg) hash Exchange after map-side partial max carries at
  most m rows per source per map task; the per-source reduce is m rows
  of metadata.  No gram, token or text column ever crosses an Exchange
  (plan-asserted in tests/test_hll.py).

The estimate stays bit-stable cross-engine: the harmonic sum is an
INTEGER (terms 2^(K-rank) are exact powers of two, summed in
DECIMAL/HUGEINT), and the one float step is alpha_m * m^2 * 2^K /
double(S) — a correctly-rounded IEEE cast plus one division on identical
integer inputs.  The small-range linear-counting correction (m*ln(m/V))
uses ln, which is NOT cross-engine bit-stable (the `word_freq_stats`
precedent), so ``correct=True`` is pytest-pinned against python math
instead of the DuckDB value oracle; the driver query runs the raw-branch
regime (distinct >> 2.5m).

Accuracy (pinned by tests): relative error ~1.04/sqrt(m); the estimate is
fully deterministic — same corpus, any partitioning, any cluster size ->
identical registers, identical estimate (register max is associative).

No counterpart in the reference (it has no sketches); this is
engine-side training-pipeline surface like `tsf/cms.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N = 3     # token n-gram length
M = 256   # registers (power of two); sigma ~ 1.04/sqrt(M) ~ 6.5%


def _p(m: int) -> int:
    p = m.bit_length() - 1
    if m < 16 or (1 << p) != m:
        raise ValueError(f"hll: m must be a power of two >= 16, got {m}")
    return p


def _rank_case(w: str, maxrank: int) -> str:
    """rank = trailing-zero count of ``w`` + 1 (w = 0 -> maxrank), as a
    pure integer CASE usable verbatim in Spark SQL and DuckDB: the mask
    (w & (2^k - 1)) = 2^(k-1) fires iff the lowest set bit is bit k-1."""
    whens = " ".join(
        f"WHEN ({w} & {(1 << k) - 1}) = {1 << (k - 1)} THEN {k}"
        for k in range(1, maxrank))
    return f"(CASE WHEN {w} = 0 THEN {maxrank} {whens} END)"


def _consts(m: int) -> tuple[int, int, float]:
    """(p, K, C): register bits, max rank (64-p+1), and the float
    numerator alpha_m * m^2 * 2^K shared verbatim by both engines."""
    p = _p(m)
    k = 64 - p + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    return p, k, alpha * m * m * float(1 << k)


def hll_registers(seq: DataFrame, n: int = N, m: int = M) -> DataFrame:
    """The sketch in tall form: (source, reg, r) — max rank per hit
    register; unseen registers are absent (rank 0).

    Scale shape: grams hash row-locally inside one transform lambda
    (docs shorter than n contribute nothing, like the empty product);
    explode -> partial max combines map-side, so the single Exchange is
    keyed on (source, reg) and bounded by m keys per source per task."""
    p, k, _ = _consts(m)
    args = ", ".join(f"tokens[i + {j}]" for j in range(n))
    grams = (f"CASE WHEN size(tokens) >= {n} THEN "
             f"transform(sequence(0, size(tokens) - {n}), "
             f"i -> xxhash64({args})) "
             f"ELSE CAST(array() AS array<bigint>) END")
    h = seq.select("source", F.explode(F.expr(grams)).alias("h"))
    rank = _rank_case(f"shiftrightunsigned(h, {p})", k)
    return (h.select("source",
                     F.expr(f"CAST((h & {m - 1}) AS INT)").alias("reg"),
                     F.expr(rank).cast("int").alias("rank"))
             .groupBy("source", "reg").agg(F.max("rank").alias("r")))


def hll_distinct(seq: DataFrame, n: int = N, m: int = M,
                 correct: bool = False) -> DataFrame:
    """Distinct token n-grams per source: (source, n_registers, v_zero,
    est).  ``correct=True`` applies the linear-counting small-range
    branch (E <= 2.5m and zero registers exist) — accurate but
    ln-based, so not DuckDB-value-replayable; see module docstring."""
    _, k, c = _consts(m)
    agg = (hll_registers(seq, n, m)
           .groupBy("source")
           .agg(F.count("*").alias("_np"),
                F.sum(F.expr(f"CAST(shiftleft(1L, {k} - r) AS DECIMAL(38,0))"))
                 .alias("_s1")))
    out = (agg
           .withColumn("v_zero", (F.lit(m) - F.col("_np")).cast("bigint"))
           .withColumn("_s", F.expr(
               f"_s1 + CAST(v_zero AS DECIMAL(38,0))"
               f" * CAST({1 << k} AS DECIMAL(38,0))"))
           .withColumn("est", F.lit(c) / F.col("_s").cast("double")))
    if correct:
        out = out.withColumn("est", F.when(
            (F.col("est") <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")))
            .otherwise(F.col("est")))
    return out.select("source", F.lit(m).alias("n_registers"),
                      "v_zero", "est")


# ------------------------------------------------------------- DuckDB replay

def hll_distinct_duckdb(seq_cte: str, n: int = N, m: int = M) -> str:
    """Replay of :func:`hll_distinct` (correct=False): same chained
    hashInt gram hashes, same register/rank bit arithmetic, same integer
    harmonic sum, same single float division."""
    from tsf.xxh64_sql import hash_int_layers
    p, k, c = _consts(m)
    fields = ", ".join(f"'t{j}': tokens[i + {j}]" for j in range(n))
    cols = ", ".join(f"(gg).t{j} AS t{j}" for j in range(n))
    g = (f"SELECT source, {cols} FROM ("
         f"SELECT source, unnest(list_transform("
         f"range(1, len(tokens) - {n} + 2), i -> {{{fields}}})) AS gg "
         f"FROM seq WHERE len(tokens) >= {n}) zz")
    q, prev = g, "42"
    for j in range(n):
        q = hash_int_layers(q, f"t{j}", prev, f"hh{j}", f"hg{j}")
        prev = f"hh{j}"
    u = (f"(CASE WHEN {prev} >= 0 THEN CAST({prev} AS HUGEINT) "
         f"ELSE CAST({prev} AS HUGEINT) + 18446744073709551616::HUGEINT END)")
    derived = (f"SELECT source, CAST(({prev} & {m - 1}) AS INT) AS reg, "
               f"CAST({u} // {m} AS BIGINT) AS w FROM ({q})")
    ranked = f"SELECT source, reg, {_rank_case('w', k)} AS rank FROM ({derived})"
    return f"""
    WITH seq AS ({seq_cte}),
    regs AS (SELECT source, reg, max(rank) AS r FROM ({ranked}) GROUP BY 1, 2),
    agg AS (SELECT source, count(*) AS np,
                   sum(CAST((1::BIGINT << ({k} - r)) AS HUGEINT)) AS s1
            FROM regs GROUP BY 1)
    SELECT source, {m} AS n_registers, CAST({m} - np AS BIGINT) AS v_zero,
           {c!r} / CAST(s1 + CAST({m} - np AS HUGEINT)
                        * {1 << k}::HUGEINT AS DOUBLE) AS est
    FROM agg ORDER BY source
    """
