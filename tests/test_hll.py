"""HyperLogLog distinct-n-gram sketch (tsf/hll.py).

Pins: bit-exact DuckDB replay of the full pipeline (chained hashInt gram
hashes -> register/rank bit arithmetic -> integer harmonic sum -> the
single float division), estimation accuracy vs the exact distinct count,
partitioning invariance (register max is associative), the pure-integer
rank CASE against a python bit-twiddling reference, the ln-based
linear-counting branch against python math, and the executed-plan scale
shape (two bounded Exchanges, no gram/token/text column shuffles)."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from tsf import hll
from tsf.io import sequences_duckdb_cte, sequences_from_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _seq_df(spark, rows, source="s"):
    return spark.createDataFrame(
        [(f"d{i}", list(map(int, t)), len(t), source)
         for i, t in enumerate(rows)],
        "doc_id string, tokens array<int>, n_tok int, source string")


def _duck(sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return con


def test_duckdb_replay_bit_exact(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    got = (hll.hll_distinct(seq, n=3, m=256).orderBy("source").toPandas())
    ora = (_duck(sf001).execute(
        hll.hll_distinct_duckdb(sequences_duckdb_cte(), n=3, m=256)).df())
    assert list(got["source"]) == list(ora["source"])
    assert (got["v_zero"].to_numpy().astype("int64")
            == ora["v_zero"].to_numpy().astype("int64")).all()
    # the whole point: the one float step is IEEE-identical cross-engine
    assert (got["est"].to_numpy() == ora["est"].to_numpy()).all()


def test_accuracy_vs_exact_distinct(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    est = {r["source"]: r["est"]
           for r in hll.hll_distinct(seq, n=3, m=256).collect()}
    true = {r["source"]: r["d"] for r in seq.where("n_tok >= 3").select(
        "source", F.expr("explode(transform(sequence(0, size(tokens) - 3), "
                         "i -> array(tokens[i], tokens[i+1], tokens[i+2])))")
        .alias("g")).groupBy("source").agg(
            F.countDistinct("g").alias("d")).collect()}
    assert set(est) == set(true)
    errs = [abs(est[s] - true[s]) / true[s] for s in true]
    assert max(errs) < 0.25, (errs, true)          # ~3.8 sigma at m=256
    assert np.mean(errs) < 0.10, errs              # typical ~ sigma = 6.5%


def test_partitioning_invariance(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    a = sorted(map(tuple, hll.hll_distinct(seq, m=256).collect()))
    b = sorted(map(tuple,
                   hll.hll_distinct(seq.repartition(13), m=256).collect()))
    assert a == b


def test_rank_case_matches_python_bit_twiddle(spark):
    # drive the CASE with adversarial w values through a real DataFrame
    ws = [0, 1, 2, 3, 4, 6, 8, 1 << 55, (1 << 56) - 1, 0b101000,
          (1 << 40) + (1 << 13), 1 << 20]
    df = spark.createDataFrame([(w,) for w in ws], "w long")
    got = {r["w"]: r["rank"] for r in df.select(
        "w", F.expr(hll._rank_case("w", 57)).alias("rank")).collect()}

    def ref(w):
        if w == 0:
            return 57
        return (w & -w).bit_length()  # trailing zeros + 1

    assert got == {w: ref(w) for w in ws}


def test_linear_counting_branch_matches_python(spark):
    # tiny vocabulary -> distinct << 2.5m -> the corrected estimate must
    # be m * ln(m / v_zero), and the raw branch would badly undershoot
    rows = [[i % 7, (i + 1) % 7, (i + 2) % 7, i % 5] for i in range(50)]
    seq = _seq_df(spark, rows)
    m = 64
    out = hll.hll_distinct(seq, n=3, m=m, correct=True).collect()[0]
    assert out["v_zero"] > 0
    expect = m * math.log(m / out["v_zero"])
    assert out["est"] == pytest.approx(expect, rel=1e-12)
    # and the small true distinct count is inside linear counting's range
    true = (seq.select(F.expr(
        "explode(transform(sequence(0, size(tokens) - 3), "
        "i -> array(tokens[i], tokens[i+1], tokens[i+2])))").alias("g"))
        .distinct().count())
    assert abs(out["est"] - true) / true < 0.35


def test_short_docs_contribute_nothing(spark):
    seq = _seq_df(spark, [[1], [1, 2], []])
    assert hll.hll_registers(seq, n=3, m=64).count() == 0
    longer = _seq_df(spark, [[1], [1, 2, 3], []])
    est = hll.hll_distinct(longer, n=3, m=64, correct=True).collect()
    assert len(est) == 1 and est[0]["v_zero"] == 63


def test_m_validation():
    with pytest.raises(ValueError):
        hll._p(100)
    with pytest.raises(ValueError):
        hll._p(8)


def test_plan_two_bounded_exchanges_no_token_shuffle(spark, sf001):
    """Scale shape: Exchange #1 keyed (source, reg) after a PARTIAL max
    (map-side combine caps it at m rows per source per task), Exchange
    #2 keyed (source); no gram hash, token or text column crosses
    either."""
    seq = sequences_from_documents(spark, sf001)
    out = hll.hll_distinct(seq, n=3, m=256)
    p = _plan(out)
    assert p.count("Exchange hashpartitioning") == 2, p
    ex = [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln]
    assert any("source" in ln and "reg" in ln for ln in ex), ex
    assert all("tokens" not in ln and "text" not in ln and " h#" not in ln
               for ln in ex), ex
    assert "partial_max" in p, p
