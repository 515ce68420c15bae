"""Similarity search over an embedding column (array<float>).

- :func:`cosine_scores` / :func:`cosine_topk` — brute-force cosine against
  a query vector, entirely JVM-side (`zip_with` dot product + precomputed
  norms): the correctness baseline. At scale this is one scan, no shuffle
  (topk = small driver-side take after a partial per-partition top-k that
  Catalyst's TakeOrderedAndProject already performs).
- :func:`lsh_buckets` / :func:`lsh_topk` — random-hyperplane LSH: sign-bit
  prefix bucket per vector; candidates share the query's bucket (with
  multi-probe over 1-bit flips), so the 100 TB path scans only matching
  buckets (partition pruning when the table is written bucketed by
  `bucket`).
- :func:`pairwise_pearson` — Pearson/Covariance matrices across vectors
  within a group (reference PairwiseFeatures semantics,
  /root/reference/src/PairwiseFeatures.jl:39-41): self-join within group.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

EMB_DOUBLE = "transform(embedding, x -> cast(x as double))"


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (s, v) -> s + v)"


def cosine_scores(emb: DataFrame, query: list[float]) -> DataFrame:
    """(vec_id, label, cos) against a constant query vector — JVM-only."""
    qlit = "array(" + ",".join(f"cast({float(v)} as double)" for v in query) + ")"
    qn = float(np.sqrt(np.dot(query, query)))
    cos = F.expr(_dot(EMB_DOUBLE, qlit)) / (
        F.sqrt(F.expr(_dot(EMB_DOUBLE, EMB_DOUBLE))) * F.lit(qn))
    return emb.select("vec_id", "label", F.round(cos, 6).alias("cos"))


def cosine_topk(emb: DataFrame, query: list[float], k: int = 10) -> DataFrame:
    return (cosine_scores(emb, query)
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


def cosine_threshold(emb: DataFrame, query: list[float], threshold: float) -> DataFrame:
    """Threshold variant — stable under float ties, used for the SQL oracle."""
    return cosine_scores(emb, query).where(F.col("cos") >= threshold)


def random_hyperplanes(dim: int, nbits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_buckets(emb: DataFrame, planes: np.ndarray) -> DataFrame:
    """Sign-bit bucket id per vector via JVM dot products (no Python)."""
    nbits = planes.shape[0]
    bucket = F.lit(0).cast("long")
    for i in range(nbits):
        plane = "array(" + ",".join(f"cast({float(v)} as double)"
                                    for v in planes[i]) + ")"
        bit = (F.expr(_dot(EMB_DOUBLE, plane)) > 0).cast("long")
        bucket = bucket + bit * F.lit(2 ** i)
    return emb.withColumn("bucket", bucket)


def lsh_topk(emb: DataFrame, query: list[float], k: int = 10,
             nbits: int = 8, seed: int = 7, multiprobe: int = 1) -> DataFrame:
    """ANN top-k: scan only the query's bucket (+ 1-bit-flip probes)."""
    planes = random_hyperplanes(len(query), nbits, seed)
    q = np.asarray(query, dtype=np.float64)
    qb = int(sum((planes[i] @ q > 0) << i for i in range(nbits)))
    probes = [qb] + [qb ^ (1 << i) for i in range(nbits)][: max(0, multiprobe * nbits)]
    bucketed = lsh_buckets(emb, planes).where(F.col("bucket").isin(probes))
    return (cosine_scores(bucketed, query)
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


def pairwise_pearson(emb: DataFrame, max_vec_id: int | None = None) -> DataFrame:
    """Pearson correlation + sample covariance for every vector pair within
    a label group (reference pairwise product semantics, N x N upper
    triangle). JVM expressions only; round(6) for oracle comparison."""
    d = emb.select("vec_id", "label", F.expr(EMB_DOUBLE).alias("v"))
    if max_vec_id is not None:
        d = d.where(F.col("vec_id") < max_vec_id)
    a, b = d.alias("a"), d.alias("b")
    n = F.expr("size(a.v)").cast("double")
    sx, sy = F.expr(_dot("a.v", "array_repeat(cast(1 as double), size(a.v))")), \
        F.expr(_dot("b.v", "array_repeat(cast(1 as double), size(b.v))"))
    sxy = F.expr(_dot("a.v", "b.v"))
    sxx = F.expr(_dot("a.v", "a.v"))
    syy = F.expr(_dot("b.v", "b.v"))
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = (sxy - sx * sy / n) / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.label").alias("label"),
                    F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(cov, 6).alias("cov"),
                    F.round(corr, 6).alias("pearson")))


def series_pairwise_pearson(rollup: DataFrame, window: int,
                            min_overlap: int = 3) -> DataFrame:
    """Reference-native pairwise operator (PairwiseFeatures.jl:39-41):
    Pearson + sample covariance between SERIES — the tier-0 window-mean
    series of two docs in the same source, aligned on window_id, over
    FULL windows only. Pure relational plan: self-equi-join on
    (source, window_id) then an aggregate over exact int64 window sums —
    the shuffle key makes every pair's overlap a co-located group (no
    N^2 blowup beyond same-source pairs), and integer sufficient
    statistics make the result bit-reproducible across engines and
    partitionings (float co-moment aggregation is order-dependent in its
    last ULPs, which flips 6-dp rounding)."""
    s = (rollup.where(F.col("cnt") == window)
         .select("doc_id", "source", "window_id",
                 F.col("sum_tok").cast("bigint").alias("s")))
    a, b = s.alias("a"), s.alias("b")
    n = F.col("n_overlap").cast("double")
    sa, sb = F.col("sum_a").cast("double"), F.col("sum_b").cast("double")
    sab = F.col("sum_ab").cast("double")
    saa, sbb = F.col("sum_aa").cast("double"), F.col("sum_bb").cast("double")
    cov = (sab - sa * sb / n) / (n - 1) / F.lit(float(window * window))
    pearson = ((n * sab - sa * sb)
               / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)))
    return (a.join(b, (F.col("a.source") == F.col("b.source"))
                   & (F.col("a.window_id") == F.col("b.window_id"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.source").alias("source"),
                     F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("n_overlap"),
                 F.sum("a.s").alias("sum_a"), F.sum("b.s").alias("sum_b"),
                 # products of int64 window sums can exceed int64 (window *
                 # token_max ~ 3e9 already wraps); decimal(19,0) operands
                 # make the product decimal(38,0) — exact for ANY two
                 # bigints, no silent wraparound (DuckDB oracle mirrors
                 # with HUGEINT). Cast to double only at the final formula.
                 F.sum(F.col("a.s").cast("decimal(19,0)")
                       * F.col("b.s").cast("decimal(19,0)")).alias("sum_ab"),
                 F.sum(F.col("a.s").cast("decimal(19,0)")
                       * F.col("a.s").cast("decimal(19,0)")).alias("sum_aa"),
                 F.sum(F.col("b.s").cast("decimal(19,0)")
                       * F.col("b.s").cast("decimal(19,0)")).alias("sum_bb"))
            .where(F.col("n_overlap") >= min_overlap)
            .select("source", "doc_a", "doc_b", "n_overlap",
                    F.round(pearson, 6).alias("pearson"),
                    F.round(cov, 6).alias("cov")))
