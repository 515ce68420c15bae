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


class TestFlatDotEquivalence:
    """The r6 flat dot-product expansions must match the interpreted
    fold bit-for-bit on conforming rows AND fall back to the fold's
    exact NULL/padding semantics on off-width / NULL rows."""

    def _frame(self, spark):
        rows = [
            (0, "a", [0.25, -1.5, 3.0, 0.125]),      # conforming width 4
            (1, "a", [1.0, 2.0]),                     # too short
            (2, "b", [1.0, 2.0, 3.0, 4.0, 5.0]),      # too long
            (3, "b", None),                            # NULL embedding
            (4, "a", [0.0, 0.0, 0.0, 0.0]),           # zero norm
        ]
        return spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<double>")

    def test_cosine_scores_matches_fold_reference(self, spark):
        from pyspark.sql import functions as F
        from tsf.similarity import EMB_DOUBLE, _dot, cosine_scores
        emb = self._frame(spark)
        q = [0.5, 0.25, -2.0, 1.0]
        got = {r["vec_id"]: r["cos"]
               for r in cosine_scores(emb, q).collect()}
        qlit = ("array(" + ",".join(f"cast({float(v)} as double)"
                                    for v in q) + ")")
        import numpy as np
        qn = float(np.sqrt(np.dot(q, q)))
        ref_cos = (F.expr(_dot(EMB_DOUBLE, qlit)) / F.nullif(
            F.sqrt(F.expr(_dot(EMB_DOUBLE, EMB_DOUBLE))) * F.lit(qn),
            F.lit(0.0)))
        ref = {r["vec_id"]: r["cos"] for r in emb.select(
            "vec_id", F.round(ref_cos, 6).alias("cos")).collect()}
        assert got == ref  # exact, including None for rows 1-4

    def test_hard_negatives_handles_offwidth_rows(self, spark):
        from tsf.similarity import hard_negatives
        out = hard_negatives(self._frame(spark), n_queries=2, k=2)
        rows = out.collect()
        # label-mismatch pairs exist; off-width/NULL rows score NULL cos
        # but still rank (NULLS LAST via desc) without erroring
        assert len(rows) > 0
        assert all(r["rnk"] <= 2 for r in rows)


class TestInPlaceXxh64:
    def test_into_matches_functional_path(self):
        from tsf.dedup import _np_xxh64_int, _np_xxh64_int_into
        rng = np.random.default_rng(3)
        seed = rng.integers(0, 2 ** 63, 4096,
                            dtype=np.int64).view(np.uint64)
        b = np.empty_like(seed)
        t = np.empty_like(seed)
        for i in (0, 1, 17, 31, 63, 2 ** 31 - 1):
            assert np.array_equal(_np_xxh64_int(i, seed),
                                  _np_xxh64_int_into(i, seed, b, t)), i

    def test_simhash_progressive_shift_counts(self):
        # ones-per-bit via (H >> j) & 1 vs the in-place progressive
        # shift must agree for negative (sign-extended) hashes too
        rng = np.random.default_rng(5)
        H = rng.integers(-2 ** 63, 2 ** 63 - 1, 1000, dtype=np.int64)
        off = np.array([0, 100, 500])
        work = H.copy()
        mask = np.empty_like(H)
        for j in range(64):
            ref = np.add.reduceat((H >> j) & 1, off)
            np.bitwise_and(work, 1, out=mask)
            got = np.add.reduceat(mask, off)
            assert np.array_equal(ref, got), j
            np.right_shift(work, 1, out=work)
