"""badwords_filter (tsf/textstats.py) and corpus_drift (tsf/dsir.py)."""

import re

from pyspark.sql import functions as F

from tsf import dsir, textstats


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, s, "en") for i, t, s in rows],
        "doc_id string, text string, source string, lang string")


def test_badwords_counts_and_modes(spark):
    df = _docs_df(spark, [("a", "x y slow z", "s"),
                          ("b", "x y z q", "s"),
                          ("c", "slow crash slow", "s"),
                          ("e", "", "s")])
    out = {r["doc_id"]: r for r in textstats.badwords_filter(
        df, words=("slow", "crash"), max_ppm=250_000).collect()}
    assert (out["a"]["n_words"], out["a"]["n_bad"]) == (4, 1)
    assert (out["c"]["n_words"], out["c"]["n_bad"]) == (3, 3)
    assert out["a"]["keep"] and out["b"]["keep"] and not out["c"]["keep"]
    assert out["e"]["keep"] and out["e"]["n_words"] == 0
    # max_ppm=0 is the strict C4 any-hit drop
    strict = {r["doc_id"]: r["keep"] for r in textstats.badwords_filter(
        df, words=("slow", "crash"), max_ppm=0).collect()}
    assert strict == {"a": False, "b": True, "c": False, "e": True}


def test_badwords_zero_exchange(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = textstats.badwords_filter(docs)
    out.count()
    p = _plan(out)
    assert "Exchange" not in p, p
    assert "Join" not in p, p


def test_drift_of_identical_slices_is_zero(spark):
    # A == B bucket-for-bucket -> every ln ratio is exactly 1 -> 0
    df = _docs_df(spark, [("a", "x y z x", "s0"), ("b", "q r x", "s1")])
    out = dsir.corpus_drift(df, "source IN ('s0','s1')",
                            "source IN ('s0','s1')", buckets=64).collect()
    assert len(out) > 0
    assert all(r["contrib_micro"] == 0 for r in out)
    assert out[0]["kl_total_micro_scaled"] == 0


def test_drift_detects_planted_shift(spark):
    rows = [(f"a{i}", "x y z " * 10, "new") for i in range(10)]
    rows += [(f"b{i}", "x y q " * 10, "ref") for i in range(10)]
    df = _docs_df(spark, rows)
    out = dsir.corpus_drift(df, "source = 'new'", "source = 'ref'",
                            buckets=256, k=5).collect()
    # 'z' is the A-only word: its bucket must be the top contributor
    zb = df.sparkSession.createDataFrame([("z",)], "g string") \
        .select(F.pmod(F.xxhash64("g"), F.lit(256)).alias("b")).first()["b"]
    assert out[0]["b"] == zb
    assert out[0]["c_a"] > 0 and out[0]["c_b"] == 0
    assert out[0]["kl_total_micro_scaled"] > 0


def test_drift_includes_empty_bucket_terms(spark):
    # Smoothed KL(A||B) sums over ALL B buckets: with n_a != n_b, each
    # bucket empty in both slices contributes ln((n_b+B)/(n_a+B)) != 0.
    # One occupied bucket ('x'), 15 empty ones — hand-fold both terms.
    import math
    B = 16
    df = _docs_df(spark, [("a", "x x x", "new"), ("b", "x", "ref")])
    out = dsir.corpus_drift(df, "source = 'new'", "source = 'ref'",
                            buckets=B, k=5).collect()
    assert len(out) == 1  # only the 'x' bucket is occupied
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (3, 1)
    lr = math.floor(math.log((3 + 1) * (1 + B) / ((1 + 1) * (3 + B)))
                    * 1e6 + 0.5)
    lr0 = math.floor(math.log((1 + B) / (3 + B)) * 1e6 + 0.5)
    assert r["contrib_micro"] == (3 + 1) * lr
    assert r["kl_total_micro_scaled"] == (3 + 1) * lr + (B - 1) * lr0


def test_drift_plan_shapes(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = dsir.corpus_drift(docs, "source = 'src1'", "source = 'src0'")
    out.collect()
    p = _plan(out)
    assert "TakeOrderedAndProject" in p, p
    assert "Sort " not in p.replace("TakeOrderedAndProject", ""), p
    assert p.count("BroadcastHashJoin") >= 1 or "BroadcastNestedLoopJoin" in p, p
    # the slice filter reaches the scan (docs outside A|B never explode)
    assert "PushedFilters: [" in p or "Filter" in p, p
    for ln in p.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln, ln
