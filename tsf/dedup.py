"""Deduplication operators over the documents table.

Scale notes (the point of each design):

- exact: groupBy on a 64-bit content hash — one shuffle of (hash, id),
  never the text. At 100 TB this is the cheapest possible exact pass.
- minhash LSH: shingles -> K minhashes -> B bands; candidate pairs come
  from an equi-join on (band, band_hash) buckets, so the cross product is
  per-bucket, never global. Self-join dedups with id< id ordering.
- simhash: 64-bit sketch via sign of hash-weighted bit sums; near-dups =
  equal sketch (or banded prefix for Hamming tolerance).
- ngram jaccard: exact verification on bucketed candidate pairs
  (SQL-expressible -> DuckDB oracle).
- embedding near-dup: cosine >= threshold within LSH-ish buckets
  (random-hyperplane sign prefix).

All hashing uses Spark's built-in xxhash64 (JVM, codegen) — Python only
where numpy vector math is genuinely needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WORDS = "filter(split(text, ' '), w -> length(w) > 0)"


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct text: keeper id + duplicate count."""
    return (docs
            .groupBy(F.xxhash64("text").alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_copies"))
            .select("keep_doc_id", "n_copies"))


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """Word k-gram shingle hashes per doc (distinct).

    The word array is materialized as a column FIRST: a split() inside the
    transform lambda would be re-evaluated per shingle position (Catalyst
    does not CSE inside higher-order-function lambdas) — O(words^2)."""
    return (docs
            .select("doc_id", F.expr(_WORDS).alias("ws"))
            .select("doc_id", F.explode(F.expr(
                f"array_distinct(transform(sequence(0, greatest(size(ws) - {k}, 0) - 1),"
                f" i -> xxhash64(concat_ws(' ', slice(ws, i + 1, {k})))))"
            )).alias("shingle")))


def minhash_signatures(docs: DataFrame, k: int = 3, num_hashes: int = 32) -> DataFrame:
    """(doc_id, sig array<long>) — minhash over shingle hashes.

    h_i(s) = xxhash64(s, i): computed as one JVM expression per hash by
    re-hashing the shingle with the hash index as a second column.
    """
    sh = shingles(docs, k)
    mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_pairs(docs: DataFrame, k: int = 3, num_hashes: int = 32,
                  bands: int = 8, threshold: float = 0.5) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + exact minhash-Jaccard filter."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, k, num_hashes)
    band_cols = F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.element_at("sig", b * rows + r + 1)
                              for r in range(rows)]).alias("bh"))
        for b in range(bands)])).alias("bb")
    banded = sig.select("doc_id", "sig", band_cols).select(
        "doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, ["band", "bh"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     (F.expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y),"
                             " v -> v))") / F.lit(num_hashes)).alias("est_jaccard"))
             .dropDuplicates(["doc_a", "doc_b"]))
    return pairs.where(F.col("est_jaccard") >= threshold)


def simhash(docs: DataFrame, k: int = 3) -> DataFrame:
    """64-bit SimHash per doc from shingle hashes (bit-majority), computed
    entirely with JVM array expressions."""
    sh = shingles(docs, k).groupBy("doc_id").agg(
        F.collect_list("shingle").alias("hs"))
    # for each bit j: sum over hashes of (bit set ? 1 : -1) > 0
    bit = ("aggregate(hs, cast(0 as bigint), (acc, h) -> acc + "
           "(case when (h >> {j}) % 2 != 0 then 1 else -1 end))")
    bits = [F.expr(f"case when ({bit.format(j=j)}) > 0 then 1L else 0L end")
            for j in range(64)]
    expr = bits[0]
    for j in range(1, 64):
        expr = expr + (bits[j] * F.lit(2 ** j if j < 63 else -(2 ** 63)))
    return sh.select("doc_id", expr.alias("simhash"))


def simhash_dups(docs: DataFrame, k: int = 3) -> DataFrame:
    s = simhash(docs, k)
    return (s.groupBy("simhash").agg(F.min("doc_id").alias("keep_doc_id"),
                                     F.count("*").alias("n_copies"))
            .where(F.col("n_copies") > 1))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Exact word-set Jaccard over bucketed candidate pairs (bucket =
    (source, lang, n_words div 10)) — the SQL-oracle-checkable variant."""
    d = (docs.select("doc_id", "source", "lang", F.expr(_WORDS).alias("w0"))
         .select("doc_id", "source", "lang",
                 F.expr("array_distinct(w0)").alias("ws"),
                 F.expr("size(w0) div 10").alias("lb")))
    a, b = d.alias("a"), d.alias("b")
    inter = F.expr("size(array_intersect(a.ws, b.ws))").cast("double")
    un = F.expr("size(array_union(a.ws, b.ws))").cast("double")
    return (a.join(b, (F.col("a.source") == F.col("b.source"))
                   & (F.col("a.lang") == F.col("b.lang"))
                   & (F.col("a.lb") == F.col("b.lb"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.round(inter / un, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def ngram_jaccard_duckdb(threshold: float = 0.3) -> str:
    w = "list_filter(string_split(text, ' '), w -> length(w) > 0)"
    return f"""
    WITH d AS (
      SELECT doc_id, source, lang, list_distinct({w}) AS ws,
             len({w}) // 10 AS lb
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.ws, b.ws)) * 1.0
                 / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6) AS jaccard
    FROM d a JOIN d b
      ON a.source = b.source AND a.lang = b.lang AND a.lb = b.lb
     AND a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.ws, b.ws)) * 1.0
                / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6) >= {threshold}
    """
