"""T5 span corruption (tsf/sampling.py span_corrupt).

Pins: the exact T5 layout against a readable python reference (greedy
non-overlap, sentinel numbering, inputs/targets reconstruction),
round-trip invertibility (inputs + targets reassemble the original
tokens), edge cases (short docs, zero candidates, adjacent spans), and
the zero-Exchange row-local plan."""

import numpy as np
from pyspark.sql import functions as F

from tsf import sampling


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _seq_df(spark, rows):
    return spark.createDataFrame(
        [(f"d{i}", list(map(int, t)), len(t), "s") for i, t in enumerate(rows)],
        "doc_id string, tokens array<int>, n_tok int, source string")


def _ref(tokens, starts, L, base):
    """Readable reference given the candidate starts."""
    kept, last = [], -10**9
    for p in sorted(starts):
        if p >= last + L:
            kept.append(p)
            last = p
    inputs, targets, prev = [], [], 0
    for j, p in enumerate(kept):
        inputs += tokens[prev:p] + [base + j]
        targets += [base + j] + tokens[p:p + L]
        prev = p + L
    inputs += tokens[prev:]
    return kept, inputs, targets


def test_matches_reference_and_round_trips(spark, sf001):
    from tsf.io import sequences_from_documents
    seq = sequences_from_documents(spark, sf001)
    L, base = 3, sampling.SENTINEL_BASE
    rows = (seq.select(
        "doc_id", "tokens",
        F.expr(f"CASE WHEN size(tokens) >= {L} THEN "
               f"filter(sequence(0, size(tokens) - {L}), "
               f"p -> pmod(xxhash64(doc_id, CAST(p AS INT)), 1000000)"
               f" < 50000) ELSE CAST(array() AS array<int>) END")
        .alias("cand")).collect())
    cands = {r["doc_id"]: (r["tokens"], r["cand"]) for r in rows}
    out = {r["doc_id"]: r for r in sampling.span_corrupt(seq).collect()}
    assert set(out) == set(cands)
    some_spans = 0
    for d, (toks, cand) in cands.items():
        kept, inputs, targets = _ref(toks, cand, L, base)
        r = out[d]
        assert r["n_spans"] == len(kept)
        assert r["inputs"] == inputs
        assert r["targets"] == targets
        some_spans += len(kept)
        # round trip: substituting each sentinel's span back yields tokens
        rec, ti = [], 0
        for x in r["inputs"]:
            if x >= base:
                assert r["targets"][ti] == x
                rec += r["targets"][ti + 1:ti + 1 + L]
                ti += 1 + L
            else:
                rec.append(x)
        assert rec == toks
    assert some_spans > 0


def test_edges_short_docs_and_adjacent_spans(spark):
    # doc shorter than span -> untouched; empty doc -> untouched
    df = _seq_df(spark, [[1, 2], [], [5] * 12])
    out = {r["doc_id"]: r for r in
           sampling.span_corrupt(df, span_len=3, start_ppm=1_000_000)
           .collect()}
    assert out["d0"]["n_spans"] == 0 and out["d0"]["inputs"] == [1, 2]
    assert out["d1"]["inputs"] == [] and out["d1"]["targets"] == []
    # ppm=1e6: every position is a candidate -> spans tile greedily at
    # exact L strides: starts 0,3,6,9 over 12 tokens
    r = out["d2"]
    assert r["n_spans"] == 4
    assert r["inputs"] == [sampling.SENTINEL_BASE + j for j in range(4)]
    assert len(r["targets"]) == 4 * 4


def test_zero_exchange_row_local(spark, sf001):
    from tsf.io import sequences_from_documents
    seq = sequences_from_documents(spark, sf001)
    out = sampling.span_corrupt(seq)
    out.count()
    p = _plan(out)
    assert "Exchange" not in p, p
    assert "mapInPandas" not in p and "Python" not in p, p
