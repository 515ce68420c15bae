"""DSIR importance resampling: semantics, exact fold, determinism."""

import math

from pyspark.sql import functions as F

from tsf import dsir


def _docs(spark):
    # two vocabularies: target-style docs ("alpha beta...") vs raw-style
    # ("zork quux..."); 8 target docs in src_t, 24 raw docs split over
    # two other sources, plus one doc mixing both styles and one empty
    tvoc = "alpha beta gamma delta alpha beta gamma delta"
    rvoc = "zork quux blarg mumble zork quux blarg mumble"
    rows = [(f"t{i:02d}", tvoc, "en", "src_t", len(tvoc))
            for i in range(8)]
    rows += [(f"r{i:02d}", rvoc, "en", f"src_{i % 2}", len(rvoc))
             for i in range(24)]
    rows.append(("m00", tvoc + " " + rvoc, "en", "src_0",
                 len(tvoc) + len(rvoc) + 1))
    rows.append(("e00", "", "en", "src_0", 0))
    return spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string,"
              " n_chars long")


TARGET = "source = 'src_t'"


def test_dsir_weights_pull_toward_target(spark):
    docs = _docs(spark)
    w = {r["doc_id"]: r for r in
         dsir.dsir_weights(docs, TARGET, buckets=64).collect()}
    assert len(w) == 34                       # every doc, empty included
    assert w["e00"]["n_grams"] == 0 and w["e00"]["logw_micro"] == 0
    t = [w[f"t{i:02d}"]["logw_micro"] for i in range(8)]
    r = [w[f"r{i:02d}"]["logw_micro"] for i in range(24)]
    assert min(t) > max(r)                    # target vocab outranks raw
    assert min(t) > w["m00"]["logw_micro"] > max(r)   # mixed in between


def test_dsir_weights_match_python_reference(spark):
    """The in-plan arithmetic == a readable python fold over the same
    hashed occurrences (buckets taken from Spark's xxhash64, the rest —
    smoothing, ln, micro-rounding, summing — recomputed in python)."""
    docs = _docs(spark)
    B = 64
    occ = docs.select(
        F.col("doc_id"),
        F.expr(f"CAST(({TARGET}) AS INT)").alias("is_t"),
        F.explode(F.expr(dsir._GRAMS)).alias("g"),
    ).withColumn("b", F.pmod(F.xxhash64("g"), F.lit(B))).collect()
    t_b, r_b = {}, {}
    for row in occ:
        r_b[row["b"]] = r_b.get(row["b"], 0) + 1
        t_b[row["b"]] = t_b.get(row["b"], 0) + row["is_t"]
    T, R = sum(t_b.values()), sum(r_b.values())
    lr = {b: math.floor(math.log(((t_b[b] + 1.0) * (R + B))
                                 / ((r_b[b] + 1.0) * (T + B)))
                        * 1e6 + 0.5) for b in r_b}
    want = {}
    for row in occ:
        want[row["doc_id"]] = want.get(row["doc_id"], 0) + lr[row["b"]]
    got = {r["doc_id"]: r["logw_micro"] for r in
           dsir.dsir_weights(docs, TARGET, buckets=B).collect()}
    for d, v in want.items():
        assert got[d] == v, (d, got[d], v)
    assert got["e00"] == 0


def test_dsir_sample_deterministic_topk(spark):
    docs = _docs(spark)
    a = dsir.dsir_sample(docs, TARGET, k=10, buckets=64).collect()
    b = dsir.dsir_sample(docs, TARGET, k=10, buckets=64).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 10
    keys = [r["key_micro"] for r in a]
    assert keys == sorted(keys, reverse=True)
    ids = {r["doc_id"] for r in a}
    assert ids <= {r["doc_id"] for r in docs.select("doc_id").collect()}
    # the target-style docs dominate the resample on this fixture
    assert sum(d.startswith("t") for d in ids) >= 7
