"""Fill-in-the-middle example builder (tsf/sampling.py fim_examples).

Pins: bit-exact DuckDB replay (gate, both hash draws, the rebuilt PSM
array), PSM layout semantics against python list slicing, the
deterministic gate rate, pass-through rows, empty/short-doc edges,
draw stability under corpus growth and partitioning, and the
executed-plan scale shape (fully row-local: ZERO Exchange, no UDF)."""

import duckdb
from pyspark.sql import functions as F

from tsf import sampling
from tsf.io import sequences_duckdb_cte, sequences_from_documents
from tsf.textstats import fp_expr


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _seq_df(spark, rows, ids=None):
    ids = ids or [f"d{i}" for i in range(len(rows))]
    return spark.createDataFrame(
        [(ids[i], list(map(int, t)), len(t), "s")
         for i, t in enumerate(rows)],
        "doc_id string, tokens array<int>, n_tok int, source string")


def _reduced(out):
    return out.select(
        "doc_id", "source", "fim", "lo", "hi",
        F.expr("CAST(size(out) AS INT)").alias("n_out"),
        F.expr(fp_expr("out")).alias("out_fp"))


def test_duckdb_replay_bit_exact(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    got = _reduced(sampling.fim_examples(seq)).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf001}/documents.parquet')")
    ora = con.execute(sampling.fim_examples_duckdb(sequences_duckdb_cte())
                      + " ORDER BY doc_id").df()
    assert list(got["doc_id"]) == list(ora["doc_id"])
    for c in ["fim", "lo", "hi", "n_out", "out_fp"]:
        assert (got[c].to_numpy().astype("int64")
                == ora[c].to_numpy().astype("int64")).all(), c


def test_psm_layout_matches_python(spark, sf001):
    seq = sequences_from_documents(spark, sf001).limit(80)
    rows = (sampling.fim_examples(seq)
            .join(seq.select("doc_id", "tokens"), "doc_id").collect())
    b = sampling.FIM_BASE
    n_fim = 0
    for r in rows:
        t = list(r["tokens"])
        if r["fim"] == 0:
            assert r["lo"] == r["hi"] == -1 and list(r["out"]) == t
        else:
            n_fim += 1
            lo, hi = r["lo"], r["hi"]
            assert 0 <= lo <= hi <= len(t)
            assert list(r["out"]) == ([b] + t[:lo] + [b + 1] + t[hi:]
                                      + [b + 2] + t[lo:hi])
    assert n_fim > 0


def test_gate_rate_and_extremes(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    n = seq.count()
    mid = sampling.fim_examples(seq, rate_ppm=500_000).where("fim = 1").count()
    assert abs(mid / n - 0.5) < 0.1
    assert sampling.fim_examples(seq, rate_ppm=0).where("fim = 1").count() == 0
    allf = sampling.fim_examples(seq, rate_ppm=1_000_000)
    assert allf.where("fim = 0").count() == 0


def test_empty_and_tiny_docs(spark):
    # force the gate on: every doc transforms, draws are pmod(h, n+1)
    out = {r["doc_id"]: r for r in sampling.fim_examples(
        _seq_df(spark, [[], [7], [1, 2]]), rate_ppm=1_000_000).collect()}
    b = sampling.FIM_BASE
    r0 = out["d0"]  # n=0: lo=hi=0, out = the three sentinels alone
    assert (r0["lo"], r0["hi"]) == (0, 0)
    assert list(r0["out"]) == [b, b + 1, b + 2]
    for r in out.values():  # all parts present, lengths add up
        n = len(r["out"]) - 3
        assert n in (0, 1, 2)


def test_draws_stable_under_growth_and_partitioning(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    full = {r["doc_id"]: tuple(r) for r in
            _reduced(sampling.fim_examples(seq)).collect()}
    half = {r["doc_id"]: tuple(r) for r in _reduced(
        sampling.fim_examples(seq.where("pmod(xxhash64(doc_id, 99), 2) = 0")))
        .collect()}
    assert half and all(full[k] == v for k, v in half.items())
    repart = {r["doc_id"]: tuple(r) for r in _reduced(
        sampling.fim_examples(seq.repartition(13))).collect()}
    assert repart == full


def test_plan_row_local_zero_exchange(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    p = _plan(sampling.fim_examples(seq))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


# ------------------------------------------------------------ SFT loss masks


def test_sft_examples_semantics(spark):
    """Mask layout: first n_prompt labels are -100, the rest equal the
    tokens; 1 <= n_prompt <= n_tok-1 for n_tok >= 2; a single-token doc
    gets n_prompt = 0 (fully trained); n_train = n_tok - n_prompt."""
    seq = _seq_df(spark, [[5, 6, 7, 8, 9], [3]])
    rows = {r["doc_id"]: r for r in
            sampling.sft_examples(seq).collect()}
    r = rows["d0"]
    h = r["n_prompt"]
    assert 1 <= h <= 4 and r["n_train"] == 5 - h
    assert r["labels"][:h] == [-100] * h
    assert r["labels"][h:] == [5, 6, 7, 8, 9][h:]
    s = rows["d1"]
    assert s["n_prompt"] == 0 and s["n_train"] == 1 and s["labels"] == [3]


def test_sft_examples_stable_and_row_local(spark, sf001):
    """Boundary draws survive corpus growth and repartitioning, and the
    plan is fully row-local (ZERO Exchange, no python UDF)."""
    seq = sequences_from_documents(spark, sf001)

    def red(df):
        return df.select("doc_id", "n_prompt",
                         F.expr(fp_expr("labels")).alias("fp"))

    full = {r["doc_id"]: tuple(r) for r in
            red(sampling.sft_examples(seq)).collect()}
    half = {r["doc_id"]: tuple(r) for r in red(sampling.sft_examples(
        seq.where("pmod(xxhash64(doc_id, 99), 2) = 0"))).collect()}
    assert half and all(full[k] == v for k, v in half.items())
    p = _plan(sampling.sft_examples(seq))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_sft_duckdb_replay_bit_exact(spark, sf001):
    """The committed cross-engine pin for sft_examples_duckdb (the
    fim replay precedent): boundary draw, lengths, and the masked
    label-array fingerprint, bit-for-bit on the sf0.001 corpus."""
    seq = sequences_from_documents(spark, sf001)
    got = (sampling.sft_examples(seq)
           .select("doc_id", "n_tok", "n_prompt", "n_train",
                   F.expr(fp_expr("labels")).alias("labels_fp"))
           .orderBy("doc_id").toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf001}/documents.parquet')")
    ora = con.execute(sampling.sft_examples_duckdb(sequences_duckdb_cte())
                      + " ORDER BY doc_id").df()
    assert list(got["doc_id"]) == list(ora["doc_id"])
    for c in ["n_tok", "n_prompt", "n_train", "labels_fp"]:
        assert (got[c].to_numpy().astype("int64")
                == ora[c].to_numpy().astype("int64")).all(), c
