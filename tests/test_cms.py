"""Count-min sketch (tsf/cms.py).

Pins: the one-sided error guarantee (estimate >= true count, always),
heavy-hitter recovery on a planted Zipf corpus, the dense-literal probe
path vs a naive per-candidate min, and the executed-plan scale shapes
(sketch build shuffles only (d, pos) int cells; the probe is row-local
with zero Exchange; top-k is TakeOrderedAndProject)."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsf import cms
from tsf.io import sequences_from_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _seq_df(spark, rows):
    return spark.createDataFrame(
        [(f"d{i}", list(map(int, t)), len(t), "s") for i, t in enumerate(rows)],
        "doc_id string, tokens array<int>, n_tok int, source string")


def test_estimate_never_undercounts(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    true = {r["token"]: r["c"] for r in
            seq.select(F.explode("tokens").alias("token"))
               .groupBy("token").agg(F.count("*").alias("c")).collect()}
    dense = cms._dense_sketch(cms.cms_sketch(seq).collect(),
                              cms.WIDTH, cms.DEPTH)
    cand = (seq.select(F.explode("tokens").alias("token")).distinct())
    est = {r["token"]: r["est"]
           for r in cms.cms_estimate(cand, dense).collect()}
    assert set(est) == set(true)
    assert all(est[t] >= true[t] for t in true)
    # sketch total per depth row == corpus token count (counters only
    # redistribute, never lose)
    n = sum(true.values())
    per_d = {d: 0 for d in range(cms.DEPTH)}
    for r in cms.cms_sketch(seq).collect():
        per_d[r["d"]] += r["cnt"]
    assert all(v == n for v in per_d.values())


def test_depth_one_estimate(spark):
    # least() needs >= 2 args; depth=1 must return the lone lookup
    df = _seq_df(spark, [[1, 1, 2]])
    dense = cms._dense_sketch(cms.cms_sketch(df, width=32, depth=1)
                              .collect(), 32, 1)
    cand = df.select(F.explode("tokens").alias("token")).distinct()
    est = {r["token"]: r["est"] for r in
           cms.cms_estimate(cand, dense, width=32, depth=1).collect()}
    assert est[1] >= 2 and est[2] >= 1
    with pytest.raises(ValueError):
        cms.cms_estimate(cand, dense, width=32, depth=0)


def test_planted_heavy_hitters_recovered(spark):
    rng = np.random.default_rng(5)
    # zipf-ish: token 7 in every doc x30, token 11 x10, noise across 5000
    rows = [[7] * 30 + [11] * 10 + rng.integers(100, 5100, 40).tolist()
            for _ in range(50)]
    df = _seq_df(spark, rows)
    top = cms.cms_topk(df, k=2, sample_ppm=1_000_000).collect()
    assert [r["token"] for r in top] == [7, 11]
    assert top[0]["est"] >= 1500 and top[1]["est"] >= 500


def test_sketch_exchange_carries_cells_not_tokens(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    sk = cms.cms_sketch(seq)
    sk.collect()
    p = _plan(sk)
    ex = [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln]
    sigs = {re.search(r"hashpartitioning\(([^)]*)\)", ln).group(1).rsplit(",", 1)[0]
            for ln in ex}
    assert len(sigs) == 1, p  # one shuffle, keyed on the (d, pos) cell
    assert "partial_count" in p, p
    for ln in ex:
        assert "tokens" not in ln and "token#" not in ln, ln


def test_probe_is_row_local_zero_exchange(spark):
    cand = spark.range(100).select(F.col("id").cast("int").alias("token"))
    dense = [0] * (cms.WIDTH * cms.DEPTH)
    est = cms.cms_estimate(cand, dense)
    est.count()
    assert "Exchange" not in _plan(est), _plan(est)


def test_topk_is_take_ordered(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    top = cms.cms_topk(seq, k=10)
    top.collect()
    p = _plan(top)
    assert "TakeOrderedAndProject" in p, p
    assert "Sort " not in p.replace("TakeOrderedAndProject", ""), p
