"""Hashed bigram LM perplexity (tsf/lm.py).

Pins: the score against a readable python reference on a two-register
fixture (reference-like docs score lower than gibberish), add-1
smoothing edge cases (unseen bigram / unseen prefix), empty and
one-word docs, the integer-compare filter, and the executed-plan scale
shapes (one-aggregate training pass; row-local scoring with zero
Exchange — the model rides in the plan as array literals)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsf import lm


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs_df(spark, rows):
    # rows: list of (doc_id, text, is_train)
    return spark.createDataFrame(
        [(i, t, "tr" if tr else "ev", "en") for i, t, tr in rows],
        "doc_id string, text string, source string, lang string")


def test_two_register_fixture_orders_docs(spark):
    rng = np.random.default_rng(9)
    clean_vocab = [f"w{i}" for i in range(20)]
    noise_vocab = [f"z{i}" for i in range(2000)]
    rows = []
    # training register: heavy bigram structure over a small vocabulary
    for i in range(30):
        ws = [clean_vocab[j % 20] for j in range(i, i + 40)]
        rows.append((f"t{i}", " ".join(ws), True))
    # eval: one doc in-register, one gibberish
    rows.append(("ev-clean", " ".join(clean_vocab[j % 20] for j in range(40)),
                 False))
    rows.append(("ev-noise", " ".join(rng.choice(noise_vocab, 40)), False))
    df = _docs_df(spark, rows)
    out = {r["doc_id"]: r for r in
           lm.lm_perplexity(df, "source = 'tr'", buckets=4096).collect()}
    assert out["ev-clean"]["nll_per_gram"] < out["ev-noise"]["nll_per_gram"]
    # gibberish = unseen prefixes: every gram costs ~ln(B) - ln(1)
    assert out["ev-noise"]["nll_per_gram"] == pytest.approx(
        math.log(4096), rel=0.05)
    for r in out.values():
        assert r["nll_micro"] >= 0


def test_score_matches_python_reference(spark):
    B = 64
    rows = [("a", "x y x y z", True), ("b", "x y q", False),
            ("c", "y x", False)]
    df = _docs_df(spark, rows)
    # python reference using Spark's own xxhash64 for bucketing (hash
    # parity is pinned separately in test_xxh64_sql)
    toks = {i: t.split() for i, t, _ in rows}
    allgrams = sorted({w for t in toks.values() for w in t}
                      | {f"{a} {b}" for t in toks.values()
                         for a, b in zip(t, t[1:])})
    hdf = spark.createDataFrame([(g,) for g in allgrams], "g string")
    hs = {r["g"]: r["b"] for r in
          hdf.select("g", F.pmod(F.xxhash64("g"), F.lit(B)).alias("b"))
             .collect()}
    c1, c2 = {}, {}
    for i, t, tr in rows:
        if not tr:
            continue
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            c1[hs[a]] = c1.get(hs[a], 0) + 1
            c2[hs[f"{a} {b}"]] = c2.get(hs[f"{a} {b}"], 0) + 1
    mic = lambda x: int(math.floor(math.log(x) * 1e6 + 0.5))
    exp = {}
    for i, t, _ in rows:
        ws = t.split()
        nll = sum(mic(c1.get(hs[a], 0) + B) - mic(c2.get(hs[f"{a} {b}"], 0) + 1)
                  for a, b in zip(ws, ws[1:]))
        exp[i] = (len(ws) - 1, nll)
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_micro"]) for r in
           lm.lm_perplexity(df, "source = 'tr'", buckets=B).collect()}
    assert got == exp


def test_empty_and_one_word_docs(spark):
    df = _docs_df(spark, [("a", "x y x y", True), ("e", "", False),
                          ("o", "solo", False)])
    out = {r["doc_id"]: r for r in
           lm.lm_perplexity(df, "source = 'tr'").collect()}
    for d in ("e", "o"):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["nll_micro"] == 0
        assert out[d]["nll_per_gram"] is None
    kept = lm.lm_filter(df, "source = 'tr'", 10_000_000).collect()
    assert {r["doc_id"] for r in kept} == {"a"}  # unscorable docs dropped


def test_scoring_plan_is_row_local_zero_exchange(spark, sf001):
    # the model rides in the plan as array literals; scoring must not
    # join or shuffle anything — one scan, per-row HOF folds only
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = lm.lm_perplexity(docs, "lang = 'en' AND source = 'src0'")
    out.count()
    p = _plan(out)
    assert "Exchange" not in p, p
    assert "Join" not in p, p


def test_training_is_one_aggregate_pass(spark, sf001):
    # both model tables from a single (which, bucket) aggregate: the
    # training job's plan has exactly one shuffle and one corpus scan
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    B = 4096
    tr = lm._occ(docs, "lang = 'en' AND source = 'src0'", B) \
           .where("is_t = 1")
    cells = tr.select(F.explode(F.array(
        F.struct(F.lit(0).alias("w"), F.col("b1").alias("b")),
        F.struct(F.lit(1).alias("w"), F.col("b2").alias("b")))).alias("c"))
    cnt = (cells.groupBy(F.col("c.w").alias("w"), F.col("c.b").alias("b"))
                .agg(F.count(F.lit(1)).alias("c")))
    cnt.count()
    p = _plan(cnt)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Scan parquet") == 1, p
    assert "partial_count" in p, p  # map-side combine before the shuffle
