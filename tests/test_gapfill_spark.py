"""Gap-fill semantics on a hand-built frame with known expected values."""

import pytest
from pyspark.sql import functions as F

from tsf import gapfill


@pytest.fixture(scope="module")
def sparse(spark):
    rows = [
        ("a", 0, 10.0),
        ("a", 1, 20.0),
        ("a", 4, 50.0),   # gap 2,3 -> linear 30,40
        ("a", 6, None),   # explicit null at 6? keep absent instead
        ("b", 2, 7.0),
    ]
    rows = [r for r in rows if r[2] is not None]
    return spark.createDataFrame(rows, "k string, idx int, v double")


def test_densify(spark, sparse):
    out = gapfill.densify(sparse, ["k"], "idx").toPandas()
    a = out[out.k == "a"]
    assert sorted(a.idx) == [0, 1, 2, 3, 4]
    assert a[a.idx == 2].v.isna().all()


def test_locf(spark, sparse):
    dense = gapfill.densify(sparse, ["k"], "idx")
    out = gapfill.locf(dense, ["k"], "idx", ["v"]).toPandas()
    a = out[out.k == "a"].sort_values("idx")
    assert list(a.v_filled) == [10.0, 20.0, 20.0, 20.0, 50.0]


def test_linear_interp_and_methods(spark, sparse):
    dense = gapfill.densify(sparse, ["k"], "idx", lo=0, hi=6)
    out = gapfill.linear(dense, ["k"], "idx", ["v"]).toPandas()
    a = out[out.k == "a"].sort_values("idx")
    assert list(a.v_filled) == [10.0, 20.0, 30.0, 40.0, 50.0, 50.0, 50.0]
    assert list(a.fill_method) == ["exact", "exact", "linear", "linear",
                                   "exact", "locf", "locf"]
    b = out[out.k == "b"].sort_values("idx")
    # before first observation: stays null, marked 'null'
    assert list(b.fill_method) == ["null", "null", "exact", "locf", "locf",
                                   "locf", "locf"]
    assert b.v_filled.isna().sum() == 2


def test_gapfill_rollup_grid(spark):
    """Missing middle windows of a doc get filled from neighbours."""
    rows = [("d1", "web", 0, 0, 1.0), ("d1", "web", 0, 3, 7.0)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, tier int, window_id bigint, mean double")
    out = gapfill.gapfill_rollup(df, ["mean"]).toPandas().sort_values("window_id")
    assert list(out.mean_filled) == [1.0, 3.0, 5.0, 7.0]
    assert list(out.fill_method) == ["exact", "linear", "linear", "exact"]
