"""Round-6 optimization pins: internals changed for speed must stay
bit-identical to their previous semantics."""

import numpy as np
import pytest

from tsf.pairwise import ksg1_mi_batch


class TestKsgIntPath:
    def test_int_path_bit_identical_to_float(self):
        rng = np.random.RandomState(11)
        B, N = 8, 64
        X = rng.randint(0, 50257, (B, N)).astype(np.float64)
        Y = rng.randint(0, 50257, (B, N)).astype(np.float64)
        a = ksg1_mi_batch(X, Y, k=20)
        b = ksg1_mi_batch(X, Y, k=20, assume_int=True)
        assert np.array_equal(a, b, equal_nan=True)

    def test_int_path_degenerate_window_nan(self):
        # >= k identical joint points -> NaN in both paths
        X = np.zeros((2, 64))
        Y = np.zeros((2, 64))
        X[1] = np.arange(64)
        Y[1] = np.arange(64) * 3 % 17
        a = ksg1_mi_batch(X, Y, k=20)
        b = ksg1_mi_batch(X, Y, k=20, assume_int=True)
        assert np.isnan(a[0]) and np.isnan(b[0])
        assert np.array_equal(a, b, equal_nan=True)


class TestPmiBitmap:
    def test_bitmap_matches_array_contains(self, spark):
        """pmi_topk's packed-bitmap membership must agree with the
        previous array_contains form (same vocab, same pairs)."""
        from pyspark.sql import functions as F

        from tsf.pmi import _pairs_expr, pmi_topk, top_vocab
        rows = [(f"d{i}", [int(x) for x in
                           np.random.RandomState(i).randint(0, 40, 30)],
                 30, "web") for i in range(20)]
        seq = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string")
        out = pmi_topk(seq, k_vocab=10, window=2, k_out=50, min_count=1)
        got = {(r.t1, r.t2): (r.c_pair, r.pmi_micro) for r in out.collect()}
        # reference: the old array_contains pair counting
        vocab = top_vocab(seq, 10)
        in_set = f"array({','.join(str(t) for t, _ in vocab)})"
        ref_pc = (seq.select(F.explode(F.expr(_pairs_expr(2))).alias("p"))
                  .where(F.expr(f"array_contains({in_set}, p.a)"
                                f" AND array_contains({in_set}, p.b)"))
                  .groupBy(F.col("p.a").alias("t1"),
                           F.col("p.b").alias("t2"))
                  .agg(F.count(F.lit(1)).alias("c")))
        ref = {(r.t1, r.t2): r.c for r in ref_pc.collect()}
        assert {k: v[0] for k, v in got.items()} == \
            {k: v for k, v in ref.items() if k in got}
        # every ref pair with enough count must appear unless cut by k_out
        assert len(got) == min(50, len(ref))


class TestSpreadRows:
    def test_narrow_scan_spreads_and_preserves_rows(self, spark, tmp_path):
        from tsf.spread import spread_rows
        p = str(tmp_path / "one")
        spark.range(1000).selectExpr(
            "cast(id as string) doc_id", "id * 2 v") \
            .coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        out = spread_rows(df, min_bytes=0)
        par = spark.sparkContext.defaultParallelism
        assert out.rdd.getNumPartitions() == par
        assert sorted(r.v for r in out.collect()) == \
            sorted(r.v for r in df.collect())

    def test_min_bytes_floor_noops_on_tiny_input(self, spark, tmp_path):
        from tsf.spread import spread_rows
        p = str(tmp_path / "tiny")
        spark.range(10).selectExpr("cast(id as string) doc_id") \
            .coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        assert spread_rows(df) is df  # default floor >> tiny file
