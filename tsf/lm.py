"""Hashed bigram language-model perplexity — the CCNet quality signal.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model trained on a clean reference corpus; low-perplexity
docs read like the reference, high-perplexity docs are boilerplate,
gibberish or the wrong language. This module is that filter with a
hashed bigram model (the fixed-memory form of a count LM — the same
bucket-hashing family as :mod:`tsf.dsir`):

    p(w_i | w_{i-1}) = (c2[b2(w_{i-1} w_i)] + 1) / (c1[b1(w_{i-1})] + B)

with counts from a ``train_where`` reference slice, add-1 smoothing
over ``buckets`` hash buckets, and the per-doc score

    nll(doc) = sum_i  ln(c1_i + B) - ln(c2_i + 1)        [>= 0]
    nll_per_gram = nll / n_bigrams        (mean negative log prob)

Bucket hashing mixes distinct prefixes into shared counters — the
standard hashed-LM approximation (same trade as DSIR / hashed
features); width ``buckets`` bounds model memory at any corpus size.

Cross-engine exactness (the repo's value-hash contract): grams use the
PRODUCTION xxhash64 (replayed bit-exactly via :mod:`tsf.xxh64_sql`);
each ln is micro-rounded to INTEGER MICRO-NATS the moment it is
computed, per BUCKET (not per occurrence), with one shared expression
string, so both engines evaluate ln on bit-identical doubles and the
per-doc score is a pure BIGINT sum — order-free under any
partitioning. The final mean is one IEEE division of exact integers.

Scale shape (100 TB): training is ONE pass — both model tables come
from a single (which, bucket) aggregate over the reference slice (the
previous two-aggregate form scanned and word-split the corpus once per
table), collected driver-side because the model is <= 2 x ``buckets``
counters BY CONSTRUCTION, independent of corpus size (the same bounded
-sketch-as-plan-literal pattern as :mod:`tsf.cms`). Scoring then rides
the model as two long-array literals in the plan and evaluates per doc
with row-local HOF lookups: ZERO joins, ZERO Exchange — no corpus byte
moves at all (plan-asserted). Two corpus scans total (train + score),
the irreducible shape of train-then-apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tsf.textstats import _WORDS

#: per-occurrence (prefix word, bigram string) structs — row-local
_PAIRS = (f"CASE WHEN size({_WORDS}) >= 2 THEN "
          f"zip_with(slice({_WORDS}, 1, size({_WORDS}) - 1), "
          f"slice({_WORDS}, 2, size({_WORDS}) - 1), "
          f"(a, b) -> struct(a AS p, concat(a, ' ', b) AS g)) "
          f"ELSE CAST(array() AS array<struct<p:string,g:string>>) END")

#: micro-nat ln of (count + k) — ONE format string used verbatim by
#: both engines so ln() sees bit-identical doubles
_LN_MICRO = ("CAST(floor(ln(CAST({c} AS DOUBLE) + {k}.0)"
             " * 1000000.0 + 0.5) AS BIGINT)")


def _occ(docs: DataFrame, train_where: str, buckets: int) -> DataFrame:
    B = int(buckets)
    return (docs.select(
                F.col("doc_id").cast("string").alias("doc_id"),
                F.expr(f"CAST(({train_where}) AS INT)").alias("is_t"),
                F.explode(F.expr(_PAIRS)).alias("o"))
            .select("doc_id", "is_t",
                    F.pmod(F.xxhash64("o.p"), F.lit(B)).alias("b1"),
                    F.pmod(F.xxhash64("o.g"), F.lit(B)).alias("b2")))


def lm_train_counts(docs: DataFrame, train_where: str,
                    buckets: int) -> tuple[list[int], list[int]]:
    """ONE model-building pass: prefix and bigram bucket counts via a
    single (which, bucket) aggregate (map-side partial, <= 2B groups
    per task), collected to two dense lists of <= ``buckets`` exact
    integer counters each — bounded model memory at any corpus size."""
    B = int(buckets)
    tr = _occ(docs, train_where, B).where("is_t = 1")
    cells = tr.select(F.explode(F.array(
        F.struct(F.lit(0).alias("w"), F.col("b1").alias("b")),
        F.struct(F.lit(1).alias("w"), F.col("b2").alias("b")))).alias("c"))
    rows = (cells.groupBy(F.col("c.w").alias("w"), F.col("c.b").alias("b"))
                 .agg(F.count(F.lit(1)).alias("c")).collect())
    dense: tuple[list[int], list[int]] = ([0] * B, [0] * B)
    for r in rows:
        dense[int(r["w"])][int(r["b"])] = int(r["c"])
    return dense


def lm_perplexity(docs: DataFrame, train_where: str,
                  buckets: int = 4096) -> DataFrame:
    """Per-document LM score: (doc_id, n_bigrams, nll_micro,
    nll_per_gram). Docs with < 2 words keep (0, 0, NULL).

    Scoring is row-local: the two count tables ride in the plan as
    long-array literals (bounded metadata, like the cms sketch) and
    each doc folds its bigram list through element_at lookups + the
    shared ``_LN_MICRO`` expression — zero joins, zero Exchange. The
    unseen defaults fall out of the dense arrays: c1=0 gives ln(0+B)
    (unseen prefix), c2=0 gives ln(0+1)=0 (unseen bigram), through the
    SAME expression — no third libm enters the contract."""
    B = int(buckets)
    c1, c2 = lm_train_counts(docs, train_where, B)
    lit1 = f"array({','.join(f'{v}L' for v in c1)})"
    lit2 = f"array({','.join(f'{v}L' for v in c2)})"
    ln1 = _LN_MICRO.format(
        c=f"element_at({lit1}, CAST(pmod(xxhash64(o.p), {B}) + 1 AS INT))",
        k=B)
    ln2 = _LN_MICRO.format(
        c=f"element_at({lit2}, CAST(pmod(xxhash64(o.g), {B}) + 1 AS INT))",
        k=1)
    return (docs
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    F.expr(_PAIRS).alias("_pairs"))
            .select("doc_id",
                    F.expr("size(_pairs)").cast("bigint").alias("n_bigrams"),
                    F.expr(f"aggregate(_pairs, 0L,"
                           f" (a, o) -> a + ({ln1}) - ({ln2}))")
                    .alias("nll_micro"))
            .select("doc_id", "n_bigrams", "nll_micro",
                    # NULL (not 0/0) when the doc has no bigrams to score
                    F.when(F.col("n_bigrams") > 0,
                           F.col("nll_micro").cast("double")
                           / (F.col("n_bigrams").cast("double") * 1e6))
                    .alias("nll_per_gram")))


def lm_filter(docs: DataFrame, train_where: str, max_nll_micro_per_gram: int,
              buckets: int = 4096) -> DataFrame:
    """Keep docs whose mean negative log prob is at most the threshold
    (micro-nats/gram, integer compare: nll_micro <= thr * n_bigrams —
    no float boundary). Docs with no bigrams are dropped (unscorable)."""
    w = lm_perplexity(docs, train_where, buckets)
    thr = int(max_nll_micro_per_gram)
    return (w.where(F.col("n_bigrams") > 0)
             .where(F.col("nll_micro") <= thr * F.col("n_bigrams"))
             .select("doc_id", "n_bigrams", "nll_micro"))


# ------------------------------------------------------- DuckDB replays

def _lm_ctes(train_where: str, B: int) -> str:
    """CTEs ending in ``wts`` = (doc_id, n_bigrams, nll_micro) — the
    production xxhash64 computed once per DISTINCT prefix/bigram."""
    from tsf.xxh64_sql import hash_bytes_layers
    gh = hash_bytes_layers("SELECT s FROM g", "s", "hs", "lm")
    unseen1 = f"(SELECT {_LN_MICRO.format(c='0', k=B)})"
    return f"""
    w AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                 CAST(({train_where}) AS INT) AS is_t,
                 list_filter(string_split(text, ' '),
                             x -> length(x) > 0) AS ws
          FROM documents),
    occ AS (SELECT doc_id, is_t, u.t.p AS p, u.t.g AS g
            FROM (SELECT doc_id, is_t,
                         list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                         i -> {{'p': ws[i], 'g': concat(ws[i], ' ', ws[i+1])}})
                         AS ps
                  FROM w) q, UNNEST(q.ps) AS u(t)),
    g AS (SELECT DISTINCT s FROM (SELECT p AS s FROM occ
                                  UNION SELECT g AS s FROM occ)),
    gh AS MATERIALIZED (SELECT s, hs FROM ({gh})),
    ob AS (SELECT o.doc_id, o.is_t,
                  ((h1.hs % {B}) + {B}) % {B} AS b1,
                  ((h2.hs % {B}) + {B}) % {B} AS b2
           FROM occ o JOIN gh h1 ON o.p = h1.s JOIN gh h2 ON o.g = h2.s),
    m1 AS (SELECT b1, {_LN_MICRO.format(c="count(*)", k=B)} AS m1
           FROM ob WHERE is_t = 1 GROUP BY 1),
    m2 AS (SELECT b2, {_LN_MICRO.format(c="count(*)", k=1)} AS m2
           FROM ob WHERE is_t = 1 GROUP BY 1),
    sc AS (SELECT ob.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                  CAST(sum(coalesce(m1.m1, {unseen1})
                           - coalesce(m2.m2, 0)) AS BIGINT) AS nll_micro
           FROM ob LEFT JOIN m1 USING (b1) LEFT JOIN m2 USING (b2)
           GROUP BY 1),
    wts AS (SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
                   coalesce(sc.n_bigrams, 0) AS n_bigrams,
                   coalesce(sc.nll_micro, 0) AS nll_micro
            FROM documents d
            LEFT JOIN sc ON CAST(d.doc_id AS VARCHAR) = sc.doc_id)
    """


def lm_perplexity_duckdb(train_where: str, buckets: int = 4096) -> str:
    return (f"WITH {_lm_ctes(train_where, int(buckets))}"
            f" SELECT doc_id, n_bigrams, nll_micro,"
            f" CASE WHEN n_bigrams > 0 THEN CAST(nll_micro AS DOUBLE)"
            f" / (CAST(n_bigrams AS DOUBLE) * 1e6) END AS nll_per_gram"
            f" FROM wts")


def lm_filter_duckdb(train_where: str, max_nll_micro_per_gram: int,
                     buckets: int = 4096) -> str:
    thr = int(max_nll_micro_per_gram)
    return (f"WITH {_lm_ctes(train_where, int(buckets))}"
            f" SELECT doc_id, n_bigrams, nll_micro FROM wts"
            f" WHERE n_bigrams > 0 AND nll_micro <= {thr} * n_bigrams")
