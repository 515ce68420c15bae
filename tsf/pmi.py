"""Windowed PMI co-occurrence over the top-K vocabulary (Church & Hanks
1990) — the word-association table behind embedding pipelines
(word2vec/GloVe preprocessing) and collocation-aware tokenizer audits.

    pmi(x, y) = ln( p(x,y) / (p(x) p(y)) )
              = ln c_xy + 2 ln N_tok - ln N_pairs - ln c_x - ln c_y

over unordered token pairs co-occurring within ``window`` positions.

Scale shape (100 TB): raw co-occurrence over an open web vocabulary is
pair-count-explosive (distinct pairs ~ vocab^2), so the operator
restricts to the top-K unigram vocabulary FIRST — K comes from one
vocab-bounded aggregate + TakeOrderedAndProject (the `vocab_topk`
shape; `tsf/cms.py` is the documented path when even the unigram vocab
must stay bounded), and rides into the pair scan as two PLAN LITERALS:
an int array for membership (row-local array_contains filter — no join)
and an int->count map for the unigram counts (row-local element_at — no
join). Pair generation is a row-local nested-transform flatten; the one
data Exchange is keyed (t1, t2) after map-side partial count and is
bounded by K^2 keys per task; the N_pairs total is a single-partition
window over those <= K^2 aggregated rows (bounded metadata). No token,
text or doc column crosses any Exchange (plan-asserted in
tests/test_pmi.py).

Cross-engine exactness (the repo's value-hash contract): every count is
an exact BIGINT; each ln is micro-rounded to INTEGER MICRO-NATS the
moment it is computed via the shared ``_LN_MICRO`` expression (the
`tsf/lm.py` convention), so `pmi_micro` is a pure integer sum/difference
— order-free under any partitioning — and the DuckDB oracle replays the
whole table bit-for-bit, including the (pmi_micro DESC, t1, t2) top-k
cut.

No counterpart in the reference (its pairwise operators correlate
series, not symbols); engine-side training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

WINDOW = 2      # co-occurrence distance (1 = adjacent bigrams only)
K_VOCAB = 150   # unigram vocabulary cap
K_OUT = 100     # output pairs
MIN_COUNT = 5   # standard PMI rare-pair guard

#: micro-nat ln of an exact positive integer — ONE format string used
#: verbatim by both engines so ln() sees bit-identical doubles
_LN_MICRO = ("CAST(floor(ln(CAST({c} AS DOUBLE))"
             " * 1000000.0 + 0.5) AS BIGINT)")


def top_vocab(seq: DataFrame, k_vocab: int = K_VOCAB) -> list[tuple[int, int]]:
    """The (token, count) top-K by (count DESC, token) — a total order,
    so the cut is deterministic; K rows of driver-side metadata."""
    rows = (seq.select(F.explode("tokens").alias("t"))
               .groupBy("t").agg(F.count(F.lit(1)).alias("c"))
               .orderBy(F.desc("c"), F.asc("t")).limit(int(k_vocab))
               .collect())
    return [(int(r["t"]), int(r["c"])) for r in rows]


def _pairs_expr(window: int) -> str:
    return (f"CASE WHEN size(tokens) >= 2 THEN flatten(transform("
            f"sequence(0, size(tokens) - 2), i -> transform("
            f"sequence(1, least({window}, size(tokens) - 1 - i)), d -> "
            f"struct(least(tokens[i], tokens[i + d]) AS a, "
            f"greatest(tokens[i], tokens[i + d]) AS b)))) "
            f"ELSE CAST(array() AS array<struct<a:int,b:int>>) END")


def pmi_topk(seq: DataFrame, k_vocab: int = K_VOCAB, window: int = WINDOW,
             k_out: int = K_OUT, min_count: int = MIN_COUNT) -> DataFrame:
    """Top-k in-vocabulary pairs by PMI: (t1, t2, c_pair, c1, c2,
    pmi_micro). ``pmi_micro`` = pmi in integer micro-nats."""
    vocab = top_vocab(seq, k_vocab)
    if not vocab:
        raise ValueError("pmi_topk: empty corpus (no tokens)")
    n_tok = sum(c for _, c in vocab)  # in-vocab occurrence total
    cmap = "map(" + ",".join(f"{t},{c}L" for t, c in vocab) + ")"
    ln = _LN_MICRO.format
    # membership as a packed-bitmap plan literal: element_at on an array
    # literal is O(1) vs array_contains' O(K) scan. The test runs as a
    # codegen'd WHERE after the explode — NOT inside a filter() over the
    # pair array: that variant keeps out-of-vocab pairs from ever
    # materializing as rows, but the interpreted per-element lambda
    # costs more than the rows save (interleaved x10 A/B: filter-in-
    # array 5.4 s, array_contains WHERE 4.0 s, bitmap WHERE 3.6 s).
    # Semantics identical to array_contains over the vocab list
    # (tokens are non-negative; > maxv tests false).
    maxv = max(t for t, _ in vocab)
    words = [0] * (maxv // 64 + 1)
    for t, _ in vocab:
        words[t // 64] |= 1 << (t % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    mask = f"array({','.join(str(w) + 'L' for w in words)})"

    def inv(x: str) -> str:
        return (f"({x} <= {maxv} AND (shiftright(element_at({mask}, "
                f"CAST({x} div 64 AS INT) + 1), "
                f"CAST({x} % 64 AS INT)) & 1) = 1)")

    pc = (seq.select(F.explode(F.expr(_pairs_expr(window))).alias("p"))
             .where(F.expr(f"{inv('p.a')} AND {inv('p.b')}"))
             .groupBy(F.col("p.a").alias("t1"), F.col("p.b").alias("t2"))
             .agg(F.count(F.lit(1)).alias("c_pair")))
    return (pc
            .withColumn("n_pairs",
                        F.sum("c_pair").over(Window.partitionBy()))
            .where(F.col("c_pair") >= int(min_count))
            .withColumn("c1", F.expr(f"element_at({cmap}, t1)"))
            .withColumn("c2", F.expr(f"element_at({cmap}, t2)"))
            .withColumn("pmi_micro", F.expr(
                f"({ln(c='c_pair')}) + 2 * ({ln(c=str(n_tok))})"
                f" - ({ln(c='n_pairs')}) - ({ln(c='c1')}) - ({ln(c='c2')})"))
            .orderBy(F.desc("pmi_micro"), "t1", "t2").limit(int(k_out))
            .select("t1", "t2", "c_pair", "c1", "c2", "pmi_micro"))


# ------------------------------------------------------------- DuckDB replay

def pmi_topk_duckdb(seq_cte: str, k_vocab: int = K_VOCAB,
                    window: int = WINDOW, k_out: int = K_OUT,
                    min_count: int = MIN_COUNT) -> str:
    """Replay of :func:`pmi_topk`: same (count DESC, token) vocab cut,
    same windowed unordered pairs, same micro-nat ln terms (shared
    ``_LN_MICRO`` text), same (pmi_micro DESC, t1, t2) top-k."""
    ln = _LN_MICRO.format
    # positions i in 1..len-1 (1-based), offsets d in 1..min(window, len-i)
    pairs = (f"SELECT (pp).a AS t1, (pp).b AS t2 FROM ("
             f"SELECT unnest(flatten(list_transform("
             f"range(1, len(tokens)), i -> list_transform("
             f"range(1, least({window}, len(tokens) - i) + 1), d -> "
             f"{{'a': least(tokens[i], tokens[i + d]), "
             f"'b': greatest(tokens[i], tokens[i + d])}})))) AS pp "
             f"FROM seq WHERE len(tokens) >= 2) z")
    return f"""
    WITH seq AS ({seq_cte}),
    vocab AS (SELECT t, count(*) AS c
              FROM (SELECT unnest(tokens) AS t FROM seq) u
              GROUP BY t ORDER BY c DESC, t LIMIT {int(k_vocab)}),
    ntok AS (SELECT sum(c) AS n_tok FROM vocab),
    pc AS (SELECT t1, t2, count(*) AS c_pair FROM ({pairs}) p
           WHERE t1 IN (SELECT t FROM vocab)
             AND t2 IN (SELECT t FROM vocab)
           GROUP BY t1, t2),
    tot AS (SELECT sum(c_pair) AS n_pairs FROM pc)
    SELECT t1, t2, c_pair, v1.c AS c1, v2.c AS c2,
           ({ln(c='c_pair')}) + 2 * ({ln(c='n_tok')})
           - ({ln(c='n_pairs')}) - ({ln(c='v1.c')}) - ({ln(c='v2.c')})
           AS pmi_micro
    FROM pc
    JOIN vocab v1 ON v1.t = pc.t1
    JOIN vocab v2 ON v2.t = pc.t2
    CROSS JOIN tot CROSS JOIN ntok
    WHERE c_pair >= {int(min_count)}
    ORDER BY pmi_micro DESC, t1, t2 LIMIT {int(k_out)}
    """
