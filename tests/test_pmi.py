"""Windowed PMI co-occurrence (tsf/pmi.py).

Pins: bit-exact DuckDB replay (vocab cut, windowed unordered pairs,
micro-nat ln terms, top-k order), the PMI definition against an
independent python recomputation, window/canonicalization semantics,
min_count and vocabulary gating, partitioning invariance, and the
executed-plan scale shape (two bounded Exchanges, membership/count
lookups as plan literals — no join, no token column shuffles)."""

import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from tsf import pmi
from tsf.io import sequences_duckdb_cte, sequences_from_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _seq_df(spark, rows, source="s"):
    return spark.createDataFrame(
        [(f"d{i}", list(map(int, t)), len(t), source)
         for i, t in enumerate(rows)],
        "doc_id string, tokens array<int>, n_tok int, source string")


def _py_pmi(rows, k_vocab, window, k_out, min_count):
    """Independent reference: plain python counters + math.log."""
    uni = Counter(t for r in rows for t in r)
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:k_vocab])
    n_tok = sum(vocab.values())
    pc = Counter()
    for r in rows:
        for i in range(len(r) - 1):
            for d in range(1, min(window, len(r) - 1 - i) + 1):
                a, b = sorted((r[i], r[i + d]))
                if a in vocab and b in vocab:
                    pc[(a, b)] += 1
    n_pairs = sum(pc.values())

    def lnm(c):
        return math.floor(math.log(float(c)) * 1e6 + 0.5)

    out = []
    for (a, b), c in pc.items():
        if c < min_count:
            continue
        micro = (lnm(c) + 2 * lnm(n_tok) - lnm(n_pairs)
                 - lnm(vocab[a]) - lnm(vocab[b]))
        out.append((a, b, c, vocab[a], vocab[b], micro))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:k_out], n_pairs


def test_duckdb_replay_bit_exact(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    got = pmi.pmi_topk(seq).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf001}/documents.parquet')")
    ora = con.execute(pmi.pmi_topk_duckdb(sequences_duckdb_cte())).df()
    assert len(got) == len(ora) == pmi.K_OUT
    for c in ["t1", "t2", "c_pair", "c1", "c2", "pmi_micro"]:
        assert (got[c].to_numpy().astype("int64")
                == ora[c].to_numpy().astype("int64")).all(), c


def test_matches_python_reference(spark):
    rows = [[1, 2, 3, 1, 2, 4, 9, 9], [2, 1, 1, 2, 5, 5, 5],
            [3, 3, 2, 1, 4, 1], [7, 8, 7, 8, 7, 8, 1]]
    got = [tuple(r) for r in pmi.pmi_topk(
        _seq_df(spark, rows), k_vocab=6, window=2, k_out=20,
        min_count=2).collect()]
    ref, _ = _py_pmi(rows, k_vocab=6, window=2, k_out=20, min_count=2)
    assert [g[:5] for g in got] == [r[:5] for r in ref]
    # libm ln may differ by an ulp between JVM and python at a floor
    # boundary; counts/order must be exact, micro-nats within 1
    assert all(abs(g[5] - r[5]) <= 1 for g, r in zip(got, ref))


def test_window_and_canonical_pairs(spark):
    # window=1: only adjacent; window=2 adds the distance-2 (1,3) pair;
    # pairs are unordered (t1 <= t2)
    seq = _seq_df(spark, [[3, 1, 2, 1]])
    w1 = {(r["t1"], r["t2"]): r["c_pair"] for r in
          pmi.pmi_topk(seq, k_vocab=5, window=1, min_count=1).collect()}
    assert w1 == {(1, 3): 1, (1, 2): 2}
    w2 = {(r["t1"], r["t2"]): r["c_pair"] for r in
          pmi.pmi_topk(seq, k_vocab=5, window=2, min_count=1).collect()}
    assert w2 == {(1, 3): 1, (1, 2): 2, (2, 3): 1, (1, 1): 1}


def test_vocab_gate_excludes_rare_tokens(spark):
    # k_vocab=2 keeps tokens 1 and 2 (most frequent); pairs touching 9
    # must not appear even though they co-occur
    seq = _seq_df(spark, [[1, 2, 1, 2, 9], [1, 2, 1, 9]])
    got = {(r["t1"], r["t2"]) for r in
           pmi.pmi_topk(seq, k_vocab=2, window=2, min_count=1).collect()}
    assert got and all(9 not in p for p in got)


def test_min_count_filter(spark):
    seq = _seq_df(spark, [[1, 2], [1, 2], [3, 4]])
    got = {(r["t1"], r["t2"]) for r in
           pmi.pmi_topk(seq, k_vocab=10, window=1, min_count=2).collect()}
    assert got == {(1, 2)}


def test_partitioning_invariance(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    a = [tuple(r) for r in pmi.pmi_topk(seq).collect()]
    b = [tuple(r) for r in pmi.pmi_topk(seq.repartition(13)).collect()]
    assert a == b


def test_empty_corpus_raises(spark):
    with pytest.raises(ValueError):
        pmi.pmi_topk(_seq_df(spark, [[]]))


def test_plan_two_bounded_exchanges_no_join(spark, sf001):
    """Scale shape: membership + unigram counts are plan literals (no
    join operator anywhere); Exchange #1 keyed on the pair struct after
    partial count (<= K^2 keys per task), Exchange #2 the bounded
    SinglePartition n_pairs window over <= K^2 aggregated rows; top-k is
    TakeOrderedAndProject; no token/text column crosses an Exchange."""
    seq = sequences_from_documents(spark, sf001)
    p = _plan(pmi.pmi_topk(seq))
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Exchange SinglePartition") == 1, p
    assert "TakeOrderedAndProject" in p, p
    assert "partial_count" in p, p
    ex = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert all("tokens" not in ln and "text" not in ln for ln in ex), ex
