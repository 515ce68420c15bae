"""Text-analysis operators for the training-data pipeline (documents table).

All four are pure Spark SQL expressions (JVM-side, codegen'd — no Python),
and each has a DuckDB-equivalent SQL so the driver's oracle can replay it:

- token counting: whitespace words + the deterministic tokenizer (tsf.io).
- quality scoring: length / punctuation / stopword / uniqueness ratios.
- language ID: stopword-hit heuristic over small per-language stoplists.
- document fingerprinting: polynomial rolling hash of the token stream
  (fold with ``a*31 + x mod 2^31-1`` — expressible as ``aggregate`` in
  Spark and ``list_reduce`` in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
}

_WORDS = "filter(split(text, ' '), w -> length(w) > 0)"
FP_MOD = 2147483647  # 2^31 - 1


def _sw_arr(lang: str) -> str:
    return "array(" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + ")"


def _sw_list(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _r6(col):
    # tie-proof rounding, bit-compatible with DuckDB's floor formula
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def with_text_stats(docs: DataFrame) -> DataFrame:
    """doc_id + n_words, avg_word_len, stopword_ratio, uniq_ratio,
    quality (composite in [0,1] from the rounded intermediates)."""
    words = F.expr(_WORDS)
    n_words = F.size(words)
    sw = F.expr(
        f"size(filter({_WORDS}, w -> array_contains({_sw_arr('en')}, lower(w))))")
    uniq = F.expr(f"size(array_distinct({_WORDS}))")
    avg_len = F.expr(
        f"aggregate({_WORDS}, 0L, (a, w) -> a + length(w))") / n_words
    out = (docs
           .withColumn("n_words", n_words.cast("int"))
           .withColumn("avg_word_len", _r6(avg_len))
           .withColumn("stopword_ratio", _r6(sw / n_words))
           .withColumn("uniq_ratio", _r6(uniq / n_words)))
    quality = (
        F.least(F.col("n_words") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.col("stopword_ratio") * 2.0 * 0.3
        + F.col("uniq_ratio") * 0.3)
    return out.withColumn("quality", _r6(F.least(quality, F.lit(1.0))))


def text_stats_duckdb() -> str:
    w = "list_filter(string_split(text, ' '), w -> length(w) > 0)"
    r6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"
    sw = f"len(list_filter({w}, w -> list_contains({_sw_list('en')}, lower(w))))"
    base = f"""
      SELECT doc_id,
             CAST(len({w}) AS INT) AS n_words,
             {r6.format(x=f"list_sum(list_transform({w}, w -> length(w))) * 1.0 / len({w})")} AS avg_word_len,
             {r6.format(x=f"{sw} * 1.0 / len({w})")} AS stopword_ratio,
             {r6.format(x=f"len(list_distinct({w})) * 1.0 / len({w})")} AS uniq_ratio
      FROM documents
    """
    return f"""
    SELECT doc_id, n_words, avg_word_len, stopword_ratio, uniq_ratio,
           {r6.format(x="least(least(n_words / 64.0, 1.0) * 0.4 "
                        "+ stopword_ratio * 2.0 * 0.3 + uniq_ratio * 0.3, 1.0)")} AS quality
    FROM ({base})
    """


def with_langid(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID; deterministic tie-break en > de > fr."""
    cols = []
    for lang in ("en", "de", "fr"):
        cols.append(F.expr(
            f"size(filter({_WORDS}, w -> array_contains({_sw_arr(lang)}, lower(w))))"
        ).alias(f"_hits_{lang}"))
    d = docs.select("doc_id", "lang", *cols)
    best = (F.when((F.col("_hits_en") >= F.col("_hits_de"))
                   & (F.col("_hits_en") >= F.col("_hits_fr")), "en")
            .when(F.col("_hits_de") >= F.col("_hits_fr"), "de")
            .otherwise("fr"))
    return d.withColumn("pred_lang", best).drop("_hits_en", "_hits_de", "_hits_fr")


def langid_duckdb() -> str:
    w = "list_filter(string_split(text, ' '), w -> length(w) > 0)"
    hits = {lang: (f"len(list_filter({w}, w -> list_contains({_sw_list(lang)}, "
                   "lower(w))))") for lang in ("en", "de", "fr")}
    return f"""
    SELECT doc_id, lang,
           CASE WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['fr']} THEN 'en'
                WHEN {hits['de']} >= {hits['fr']} THEN 'de'
                ELSE 'fr' END AS pred_lang
    FROM documents
    """


def with_fingerprint(seq: DataFrame) -> DataFrame:
    """Polynomial rolling hash over the token array (mod 2^31-1)."""
    return seq.withColumn(
        "fingerprint",
        F.expr(f"aggregate(tokens, 0L, (a, x) -> (a * 31 + x) % {FP_MOD})"))


def fingerprint_duckdb(seq_cte: str) -> str:
    return f"""
    WITH seq AS ({seq_cte})
    SELECT doc_id,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(tokens, x -> CAST(x AS BIGINT))),
                (a, x) -> (a * 31 + x) % {FP_MOD}) AS BIGINT) AS fingerprint
    FROM seq
    """


#: GPT-2-ish pre-tokenizer regex, simplified to the dialect subset Spark's
#: regexp_extract_all and DuckDB's regexp_extract_all share: letter runs,
#: digit runs, single non-alnum-non-space marks.
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def with_token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace word count + BPE-ish regex token count + chars/token."""
    n_words = F.expr(f"size({_WORDS})")
    n_bpe = F.expr(f"size(regexp_extract_all(text, '{BPE_RE}', 0))")
    return docs.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        n_bpe.cast("int").alias("n_bpe_tokens"),
        _r6(F.length("text") / F.greatest(n_bpe, F.lit(1))).alias("chars_per_token"))


def token_counts_duckdb() -> str:
    w = "list_filter(string_split(text, ' '), w -> length(w) > 0)"
    return f"""
    SELECT doc_id,
           CAST(len({w}) AS INT) AS n_words,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS INT) AS n_bpe_tokens,
           floor(length(text) * 1.0 / greatest(len(regexp_extract_all(text, '{BPE_RE}')), 1)
                 * 1000000.0 + 0.5) / 1000000.0 AS chars_per_token
    FROM documents
    """
