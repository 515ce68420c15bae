"""Deterministic mixing + sequence-packing layout operators."""

import numpy as np

from tsf import sampling


def _docs(spark, n=400):
    rows = [(f"d{i:04d}", f"src{i % 4}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, source string")


def test_mix_sample_deterministic_and_nested(spark):
    docs = _docs(spark)
    lo = {r["doc_id"] for r in
          sampling.mix_sample(docs, {"src0": 0.3}, default=0.0).collect()}
    lo2 = {r["doc_id"] for r in
           sampling.mix_sample(docs, {"src0": 0.3}, default=0.0).collect()}
    hi = {r["doc_id"] for r in
          sampling.mix_sample(docs, {"src0": 0.6}, default=0.0).collect()}
    assert lo == lo2                      # reproducible
    assert lo <= hi                       # nested: raising weight only adds
    assert all(d.endswith(("0", "4", "8"))  # src0 = i % 4 == 0
               for d in lo) is False or True  # membership checked below
    # all kept docs are src0 (default 0 drops everything else)
    srcs = {r["source"] for r in
            sampling.mix_sample(docs, {"src0": 0.3}, default=0.0).collect()}
    assert srcs <= {"src0"}
    # approximate rate on the 100-doc src0 stratum
    assert 10 <= len(lo) <= 50 and 40 <= len(hi) <= 80


def test_mix_sample_extremes(spark):
    docs = _docs(spark, 100)
    none = sampling.mix_sample(docs, {}, default=0.0).count()
    allr = sampling.mix_sample(docs, {}, default=1.0).count()
    assert none == 0 and allr == 100


def test_pack_examples_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        rows.append((f"d{i:03d}", [], int(rng.integers(0, 300)),
                     f"s{i % 2}"))
    # empty doc: must contribute nothing
    rows.append(("d900", [], 0, "s0"))
    seq = spark.createDataFrame(
        [(d, list(range(n)), n, s) for d, _, n, s in rows],
        "doc_id string, tokens array<int>, n_tok int, source string")
    L = 128
    got = sampling.pack_examples(seq, example_len=L, n_shards=1).toPandas()

    # brute force: concat per source in doc_id order, split at L
    import collections
    want = collections.defaultdict(lambda: [0, 0, None])  # ntok, ndocs, first
    for src in ("s0", "s1"):
        off = 0
        for d, _, n, s in sorted(rows):
            if s != src or n == 0:
                continue
            for e in range(off // L, (off + n - 1) // L + 1):
                k = (src, e)
                lo, hi = max(off, e * L), min(off + n, (e + 1) * L)
                want[k][0] += hi - lo
                want[k][1] += 1
                if want[k][2] is None:
                    want[k][2] = d
            off += n
    assert len(got) == len(want)
    for _, r in got.iterrows():
        w = want[(r["source"], r["example_id"])]
        assert (r["n_tok"], r["n_docs"], r["first_doc"]) == tuple(w), r


def test_pack_examples_sharded_full_examples(spark):
    """Sharding preserves totals: every token lands in exactly one
    example, and only each (source, shard) stream's LAST example may be
    partial."""
    seq = spark.createDataFrame(
        [(f"d{i:03d}", list(range(i % 7 + 1)), i % 7 + 1, "s")
         for i in range(80)],
        "doc_id string, tokens array<int>, n_tok int, source string")
    out = sampling.pack_examples(seq, example_len=16, n_shards=4).toPandas()
    assert out["n_tok"].sum() == sum(i % 7 + 1 for i in range(80))
    partial = out[out["n_tok"] < 16]
    assert len(partial) <= out.groupby(["source", "shard"]).ngroups
    # partial examples are each stream's last
    for (_, sh), grp in out.groupby(["source", "shard"]):
        g = grp.sort_values("example_id")
        assert (g["n_tok"].iloc[:-1] == 16).all()


def test_epoch_shuffle_reproducible_and_repermuting(spark):
    """Same epoch -> identical (shard, pos) layout regardless of input
    partitioning (the cluster-size-invariance the export contract
    needs); a different epoch produces a genuinely different
    permutation; positions are dense 1..n_shard within every shard."""
    seq = spark.createDataFrame(
        [(f"d{i:04d}", [1, 2], 2, "s") for i in range(300)],
        "doc_id string, tokens array<int>, n_tok int, source string")
    a = sampling.epoch_shuffle(seq, epoch=1, n_shards=4).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = sampling.epoch_shuffle(seq.repartition(13), epoch=1,
                               n_shards=4).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    c = sampling.epoch_shuffle(seq, epoch=2, n_shards=4).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert not a[["shard", "pos"]].equals(c[["shard", "pos"]])
    for _, grp in a.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # hash sharding is roughly balanced
    sizes = a.groupby("shard").size()
    assert len(sizes) == 4 and sizes.min() > 30


def test_dataset_split_deterministic_and_complete(spark, sf001):
    from tsf.io import sequences_from_documents
    from tsf.sampling import dataset_split
    seq = sequences_from_documents(spark, sf001)
    a = dataset_split(seq, seed=7).select("doc_id", "split").collect()
    b = dataset_split(seq.repartition(13), seed=7) \
        .select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    splits = {s for _, s in map(tuple, a)}
    assert splits <= {"train", "val", "test"}
    n = len(a)
    n_train = sum(1 for _, s in map(tuple, a) if s == "train")
    assert 0.8 * n <= n_train <= n  # 90% nominal, small-sample slack


def test_dataset_split_is_growth_stable(spark, sf001):
    """A doc's assignment must not change when the corpus grows — it is
    a pure function of (doc_id, seed)."""
    from tsf.io import sequences_from_documents
    from tsf.sampling import dataset_split
    seq = sequences_from_documents(spark, sf001)
    full = {r["doc_id"]: r["split"]
            for r in dataset_split(seq, seed=7).collect()}
    half = {r["doc_id"]: r["split"]
            for r in dataset_split(seq.where("doc_id % 2 = 0"),
                                   seed=7).collect()}
    assert all(full[k] == v for k, v in half.items())


def test_dataset_split_thresholds_reject_bad_fractions():
    import pytest
    from tsf.sampling import split_thresholds
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})
    assert split_thresholds({"a": 0.9, "b": 0.05, "c": 0.05}) == [
        ("a", 9000), ("b", 9500), ("c", 10000)]


def test_dataset_split_zero_exchange(spark, sf001):
    from tsf.io import sequences_from_documents
    from tsf.sampling import dataset_split
    seq = sequences_from_documents(spark, sf001)
    p = dataset_split(seq, seed=7)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in p, p


def test_chunk_examples_layout(spark):
    from pyspark.sql import Row
    from tsf.sampling import chunk_examples
    seq = spark.createDataFrame([
        Row(doc_id="a", source="s", n_tok=600,
            tokens=list(range(600))),
        Row(doc_id="b", source="s", n_tok=512,
            tokens=list(range(512))),
        Row(doc_id="c", source="s", n_tok=100,
            tokens=list(range(100))),
        Row(doc_id="d", source="s", n_tok=768,
            tokens=list(range(768))),
    ])
    got = {(r["doc_id"], r["chunk_id"]):
           (r["start"], r["n_tok_chunk"], r["is_tail"])
           for r in chunk_examples(seq, length=512, stride=256).collect()}
    assert got[("a", 0)] == (0, 512, False)
    assert got[("a", 1)] == (256, 344, True)   # tail covers 256..600
    assert got[("b", 0)] == (0, 512, False)    # exact fit: one chunk
    assert ("b", 1) not in got
    assert got[("c", 0)] == (0, 100, True)     # short doc: one tail chunk
    assert got[("d", 0)] == (0, 512, False)
    assert got[("d", 1)] == (256, 512, False)  # exact-stride final chunk
    assert ("d", 2) not in got
    # every token position of every doc is covered by >= 1 chunk
    for doc, n in [("a", 600), ("b", 512), ("c", 100), ("d", 768)]:
        spans = [(s, s + m) for (d_, _), (s, m, _) in got.items()
                 if d_ == doc]
        covered = set()
        for lo, hi in spans:
            covered.update(range(lo, hi))
        assert covered == set(range(n)), doc


def test_chunk_examples_zero_shuffle(spark, sf001):
    from tsf.io import sequences_from_documents
    from tsf.sampling import chunk_examples
    seq = sequences_from_documents(spark, sf001)
    p = chunk_examples(seq)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def _hash01_py(s: str) -> float:
    h, m, a = 7, 1103515245, 12345
    for ch in s:
        h = (h * m + ord(ch) + a) % 4294967296
    return h / 4294967296.0


def test_mix_temperature_rates_and_membership(spark):
    import math
    # skewed strata: 300 / 75 / 25 docs
    rows = ([(f"a{i:04d}", "big") for i in range(300)]
            + [(f"b{i:04d}", "mid") for i in range(75)]
            + [(f"c{i:04d}", "small") for i in range(25)])
    docs = spark.createDataFrame(rows, "doc_id string, source string")
    out = {r["doc_id"]: r for r in
           sampling.mix_temperature(docs, alpha=0.5).collect()}
    rates = {"big": math.sqrt(25 / 300), "mid": math.sqrt(25 / 75),
             "small": 1.0}
    # every keep decision and ppm rate matches the closed form exactly
    want = {d: s for d, s in rows if _hash01_py(d) < rates[s]}
    assert set(out) == set(want)
    assert all(r["rate_ppm"] == math.floor(rates[r["source"]] * 1_000_000)
               for r in out.values())
    # the smallest source is never subsampled
    assert sum(1 for r in out.values() if r["source"] == "small") == 25


def test_mix_temperature_nested_in_alpha(spark):
    docs = _docs(spark)  # 4 equal sources -> all rates 1.0 at any alpha
    assert sampling.mix_temperature(docs, alpha=0.0).count() == 400
    # skew it: drop most of src1..3
    skew = docs.where("source = 'src0' OR doc_id LIKE '%7'")
    kept = {}
    for alpha in (0.0, 0.5, 1.0):
        kept[alpha] = {r["doc_id"] for r in
                       sampling.mix_temperature(skew, alpha=alpha).collect()}
    assert kept[0.0] <= kept[0.5] <= kept[1.0]   # nested in temperature
    assert len(kept[1.0]) == skew.count()        # alpha=1: natural mix


def test_mix_temperature_plan_broadcasts_counts(spark):
    docs = _docs(spark)
    p = (sampling.mix_temperature(docs, alpha=0.5)
         ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # the only hash shuffle is the tiny per-source count aggregate
    assert p.count("Exchange hashpartitioning") == 1, p


def test_stratified_sample_exact_quota_nested_deterministic(spark):
    docs = _docs(spark)  # 4 sources x 100 docs
    s7 = sampling.stratified_sample(docs, 7, seed=3).collect()
    import collections
    per = collections.Counter(r["source"] for r in s7)
    assert per == {f"src{i}": 7 for i in range(4)}          # exact quota
    assert {r["rank"] for r in s7} == set(range(1, 8))       # dense ranks
    # deterministic + nested: quota-7 is a prefix of quota-15
    s7b = {(r["doc_id"], r["rank"])
           for r in sampling.stratified_sample(docs, 7, seed=3).collect()}
    s15 = {(r["doc_id"], r["rank"])
           for r in sampling.stratified_sample(docs, 15, seed=3).collect()}
    assert {(d, k) for d, k in s7b} <= s15
    assert s7b == {(r["doc_id"], r["rank"]) for r in s7}
    # a different seed draws a different sample
    other = {r["doc_id"]
             for r in sampling.stratified_sample(docs, 7, seed=4).collect()}
    assert other != {r["doc_id"] for r in s7}
    # quota above the stratum size keeps the whole stratum
    assert sampling.stratified_sample(docs, 1000, seed=3).count() == 400


def test_stratified_sample_plan_window_group_limit(spark, sf001):
    import __spark_entry__ as entrymod
    df = entrymod.q_stratified_sample(spark, sf001)
    p = df._jdf.queryExecution().executedPlan().toString()
    # the rank<=N filter must push a per-partition top-N BEFORE the
    # group Exchange: at 100 TB the shuffle moves O(groups x N) rows
    assert "WindowGroupLimit" in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_length_histogram_buckets_and_pad(spark):
    seq = spark.createDataFrame(
        [(1, 1, "s"), (2, 2, "s"), (3, 3, "s"), (4, 2048, "s"),
         (5, 2049, "s"), (6, 0, "s"), (7, 4095, "t")],
        "doc_id long, n_tok int, source string")
    out = {(r["source"], r["bucket_lo"]): r
           for r in sampling.length_histogram(seq, 2048).collect()}
    assert out[("s", 1)]["n_docs"] == 1            # n=1
    assert out[("s", 2)]["n_docs"] == 2            # n=2,3
    assert out[("s", 2048)]["n_docs"] == 2         # n=2048,2049
    assert out[("s", 0)]["n_docs"] == 1            # empty doc
    # pad to 2048: n=2048 wastes 0; n=2049 wastes 2047
    assert out[("s", 2048)]["pad_tok"] == 0 + 2047
    assert out[("t", 2048)]["sum_tok"] == 4095 and \
        out[("t", 2048)]["pad_tok"] == 1           # 4095 -> 2 examples
    assert out[("s", 0)]["pad_tok"] == 0
    # one Exchange, carrying (source, bucket) rows only
    p = (sampling.length_histogram(seq, 2048)
         ._jdf.queryExecution().executedPlan().toString())
    assert p.count("Exchange") == 1 and "partial_count" in p, p


def test_mix_temperature_token_budget(spark):
    """weight_col flattening: a source with FEW long docs and one with
    MANY short docs have equal token budgets -> both keep everything;
    by doc count the long-doc source would be subsampled."""
    rows = ([(f"a{i:03d}", "longdocs", 100) for i in range(10)]
            + [(f"b{i:03d}", "shortdocs", 10) for i in range(100)])
    docs = spark.createDataFrame(rows, "doc_id string, source string, "
                                       "n_chars int")
    by_tok = sampling.mix_temperature(docs, alpha=0.5,
                                      weight_col="n_chars")
    assert by_tok.count() == 110                       # budgets equal
    assert {r["rate_ppm"] for r in by_tok.collect()} == {1000000}
    by_doc = sampling.mix_temperature(docs, alpha=0.5)
    kept_long = by_doc.where("source = 'longdocs'").count()
    assert kept_long == 10                             # smallest stratum
    assert by_doc.where("source = 'shortdocs'").count() < 100


def _nfd_naive(lens_by_doc, L):
    """Reference NFD fold: docs sorted (len DESC, doc_id ASC); place in
    the current example if it fits, else close it and open a new one."""
    e, r, s = 0, L, 0
    out = {}
    for doc_id, ln in sorted(lens_by_doc.items(), key=lambda x: (-x[1], x[0])):
        ln = min(ln, L)
        if ln > r:
            e, r, s = e + 1, L, 0
        out[doc_id] = (e, s)
        r, s = r - ln, s + 1
    return out


def test_pack_nfd_matches_naive_simulation(spark):
    rng = np.random.default_rng(11)
    lens = {f"d{i:03d}": int(rng.integers(1, 40)) for i in range(180)}
    # length ties (the regular-layout fast path), exact-fit, and a
    # longer-than-example doc that must truncate to a full example
    lens.update({"t000": 70, "t001": 64, "t002": 64, "t003": 64})
    rows = [(d, list(range(min(n, 64))), n, "s") for d, n in lens.items()]
    rows.append(("z000", [], 0, "s"))            # empty doc: excluded
    seq = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    got = {r["doc_id"]: (r["example_id"], r["slot"])
           for r in sampling.pack_nfd(seq, example_len=64).collect()}
    assert "z000" not in got
    assert got == _nfd_naive(lens, 64)


def test_pack_nfd_fold_vs_naive_many_shapes(spark):
    """The bin-state recurrence == the doc-at-a-time fold on adversarial
    length mixes: all-equal, all-distinct, exact divisors, and random."""
    rng = np.random.default_rng(23)
    cases = [
        {f"a{i}": 8 for i in range(10)},                   # one bin
        {f"b{i:02d}": i + 1 for i in range(30)},           # all distinct
        {f"c{i:02d}": [32, 16, 8][i % 3] for i in range(24)},  # divisors
        {f"r{i:03d}": int(rng.integers(1, 33)) for i in range(150)},
    ]
    for lens in cases:
        rows = [(d, [], n, "s") for d, n in lens.items()]
        seq = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string")
        got = {r["doc_id"]: (r["example_id"], r["slot"])
               for r in sampling.pack_nfd(seq, example_len=32).collect()}
        assert got == _nfd_naive(lens, 32), lens


def test_pack_nfd_no_split_and_capacity(spark):
    rng = np.random.default_rng(5)
    lens = {f"d{i:03d}": int(rng.integers(1, 200)) for i in range(300)}
    rows = [(d, [], n, "s") for d, n in lens.items()]
    seq = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    df = sampling.pack_nfd(seq, example_len=128).toPandas()
    # every doc exactly once (no split), truncation flagged correctly
    assert len(df) == len(lens) and df["doc_id"].is_unique
    assert (df["truncated"] == (df["doc_id"].map(lens) > 128)).all()
    assert (df["len_used"] == df["doc_id"].map(lens).clip(upper=128)).all()
    # capacity: each example's fill <= L; slots contiguous from 0
    g = df.groupby("example_id")
    assert (g["len_used"].sum() <= 128).all()
    for _, grp in g:
        assert sorted(grp["slot"]) == list(range(len(grp)))
    # example ids contiguous from 0
    assert sorted(df["example_id"].unique()) == \
        list(range(df["example_id"].max() + 1))


# ------------------------------------------------------- global rank

def test_curriculum_rank_matches_global_window(spark):
    """Ranks from the two-phase range-partition idiom must equal a plain
    global window over the same total order, for any partition count,
    both directions, including tied scores (doc_id tie-break)."""
    from tsf.sampling import curriculum_rank
    rows = [(f"d{i:03d}", (i * 37) % 13) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id string, score long")
    want_asc = {r["doc_id"]: r["rank"] for r in docs.selectExpr(
        "doc_id", "row_number() over (order by score, doc_id) as rank"
    ).collect()}
    for n in (3, 17):
        got = {r["doc_id"]: r["rank"] for r in curriculum_rank(
            docs, "score", num_partitions=n).collect()}
        assert got == want_asc, n
    want_desc = {r["doc_id"]: r["rank"] for r in docs.selectExpr(
        "doc_id",
        "row_number() over (order by score desc, doc_id) as rank"
    ).collect()}
    got = {r["doc_id"]: r["rank"] for r in curriculum_rank(
        docs, "score", ascending=False, num_partitions=5).collect()}
    assert got == want_desc
