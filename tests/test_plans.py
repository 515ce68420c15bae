"""Physical-plan invariants — the scale-design claims, asserted.

Each test pins a property of the EXECUTED plan that the 100-TB design
depends on, so a regression that silently inserts a shuffle, a cartesian
product, or a full-width scan fails loudly here rather than showing up
as a 100x slowdown on a cluster."""

import pytest

from tsf.io import sequences_from_documents
from tsf.registry import catalogue
from tsf.rollup import next_tier, tier0

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tier0_has_no_shuffle_and_prunes_columns(spark, sf001):
    """Tier-0 rollup: tokens flow scan -> tokenize -> chunk -> kernel
    with NO Exchange (nothing re-shuffles raw tokens), and the parquet
    scan reads only the columns the query needs."""
    seq = sequences_from_documents(spark, sf001)
    t0 = tier0(seq, catalogue()[["cnt", "mean"]], window=20, blocks=False)
    p = _plan(t0)
    assert "Exchange" not in p, p
    scan = [ln for ln in p.splitlines() if "FileScan parquet" in ln][0]
    assert "text" in scan and "lang" not in scan, scan


def test_tier1_shuffles_blocks_not_tokens(spark, sf001):
    """The cascade exchanges only compressed rollup rows: the (single)
    shuffle sits ABOVE tier-0's kernel output, and no token/text column
    crosses it."""
    seq = sequences_from_documents(spark, sf001)
    fs = catalogue()[["cnt", "sum_tok", "min_tok", "max_tok", "mean",
                      "std"]]
    t1 = next_tier(tier0(seq, fs, window=20), 0, fs, window=20)
    p = _plan(t1)
    ex = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert ex, "expected the tier-derivation groupBy shuffle"
    assert all("tokens" not in ln and "text" not in ln for ln in ex), ex


def test_ivf_assignment_is_one_shuffle_free_projection(spark, sf001):
    """IVF cell assignment = a single projection over the scan — no
    Exchange, no join, no Python."""
    from tsf import similarity
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    cells = similarity.ivf_cells(emb, similarity.ivf_centroids(emb, 8))
    p = _plan(cells)
    assert "Exchange" not in p, p
    assert "Join" not in p and "InPandas" not in p, p


def test_ngram_dedup_has_no_cartesian_product(spark, sf001):
    """The exact n-gram Jaccard join must stay an equi-join on prefix
    shingles — never a cartesian/broadcast nested loop over docs."""
    from tsf import dedup
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(dedup.ngram_jaccard_pairs(docs, 0.3))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_pairwise_featureset_is_equi_join(spark, sf001):
    """The SuperPairwise self-join pairs windows via an equi-join on
    (source, window_id) — the N x N product exists only inside a join
    group, never as a cartesian plan node."""
    from tsf import pairwise
    seq = sequences_from_documents(spark, sf001)
    df = pairwise.pairwise_features(seq, ("plv", "ppc"), window=20)
    p = _plan(df)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_cosine_topk_uses_take_ordered(spark, sf001):
    """Top-k is a per-partition partial top-k (TakeOrderedAndProject),
    not a global sort."""
    from tsf import similarity
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    q = [float(x) for x in emb.where("vec_id = 0")
         .select("embedding").first()[0]]
    p = _plan(similarity.cosine_topk(emb, q, 10))
    assert "TakeOrderedAndProject" in p, p
    assert "Sort " not in p.replace("TakeOrderedAndProject", ""), p


def test_mix_sample_is_a_pushed_scan_filter(spark, sf001):
    """Deterministic mix sampling = scan + one JVM filter: no Exchange,
    no Python, no join — the cheapest possible pass at 100 TB."""
    from tsf import sampling
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = sampling.mix_sample(docs, {"src0": 0.5}, default=0.1)
    p = _plan(out)
    assert "Exchange" not in p, p
    assert "Join" not in p and "InPandas" not in p, p


def test_dim_stack_is_single_pass_no_shuffle(spark, sf001):
    """Multi-column DimStack map: ONE mapInPandas over the scan — no
    Exchange, no per-column re-scan (exactly one FileScan)."""
    from pyspark.sql import functions as F
    from tsf.rollup import dim_stack_features
    seq = sequences_from_documents(spark, sf001).where("n_tok >= 3")
    d = seq.withColumn("head", F.expr("slice(tokens, 1, 50)"))
    out = dim_stack_features(d, ["tokens", "head"],
                             catalogue()[["cnt", "mean"]])
    p = _plan(out)
    assert "Exchange" not in p, p
    assert p.count("FileScan") == 1, p


def test_pack_examples_single_width_shuffle(spark, sf001):
    """Sequence packing: the only wide operations are keyed by
    (source, shard[, example_id]) — no token/text column ever crosses an
    Exchange (the cumsum and the final aggregate move offsets, not
    payloads)."""
    from tsf import sampling
    seq = sequences_from_documents(spark, sf001)
    out = sampling.pack_examples(seq, example_len=512, n_shards=4)
    p = _plan(out)
    ex = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert ex, "expected the window/groupBy shuffles"
    assert all("tokens" not in ln and "text" not in ln for ln in ex), ex


def test_duplicate_groups_no_cartesian(spark):
    """CC propagation: every round is an equi-join — no
    CartesianProduct / BroadcastNestedLoopJoin in the fixpoint plan."""
    from tsf import dedup
    docs = spark.createDataFrame([(f"d{i}",) for i in range(30)],
                                 "doc_id string")
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(0, 28, 2)],
        "doc_a string, doc_b string")
    out = dedup.duplicate_groups(docs, pairs, max_iter=4)
    p = _plan(out)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_icelite_scan_pushes_residual_filters(spark, tmp_path):
    """icelite.scan reads an explicit pruned file list, and the residual
    predicate still reaches the parquet reader (PushedFilters) — manifest
    pruning and row-group pushdown compose rather than compete."""
    from pyspark.sql import functions as F

    from tsf import icelite
    from tsf.io import synth_sequences
    from tsf.registry import catalogue
    from tsf.rollup import tier0

    seq = synth_sequences(spark, 20, seed=5)
    roll = tier0(seq, catalogue()[["cnt", "mean"]], window=20,
                 blocks=False).select("doc_id", "source", "tier",
                                      "window_id", "cnt", "mean")
    path = str(tmp_path / "tbl")
    icelite.create(roll, path, [("identity", "source")])
    df = icelite.scan(spark, path, where=[("source", "==", "web"),
                                          ("window_id", "<=", 3)])
    df.count()
    p = _plan(df)
    scan = [ln for ln in p.splitlines() if "FileScan parquet" in ln][0]
    assert "PushedFilters" in scan and "window_id" in scan.split(
        "PushedFilters")[1], scan
    # manifest pruning already excluded the other sources' files
    assert all("_p_source=web" in f for f in df.inputFiles())


def test_vocab_topk_take_ordered_not_full_sort(spark, sf001):
    """Corpus heavy hitters: limit+order compiles to TakeOrderedAndProject
    (per-partition top-k then merge), never a global Sort of the whole
    vocabulary, and the word counts partial-aggregate before the shuffle."""
    import __spark_entry__ as entrymod
    df = entrymod.q_vocab_topk(spark, sf001)
    p = _plan(df)
    assert "TakeOrderedAndProject" in p, p
    assert "partial_count" in p or "HashAggregate" in p, p


def test_epoch_shuffle_single_exchange_on_shard(spark, sf001):
    """Epoch shuffle: exactly one hash Exchange, keyed on shard — the
    export shuffle moves each row once; no text/tokens column crosses
    it (only metadata rides the shuffle)."""
    import re

    import __spark_entry__ as entrymod
    p = _plan(entrymod.q_epoch_shuffle(spark, sf001))
    keys = re.findall(r"Exchange hashpartitioning\(([^)]+)", p)
    assert len(keys) == 1 and "shard" in keys[0], keys
    assert "tokens" not in keys[0] and "text" not in keys[0], keys


def test_gopher_quality_zero_shuffle_row_local(spark, sf001):
    """Repetition signals: fully row-local (array_sort + run-length
    `aggregate` HOFs), so the plan is Scan -> Project with ZERO
    Exchange, no Generate/explode and no join of any kind — nothing
    corpus-sized ever crosses the network at 100 TB (the old explode +
    two-groupBy form shuffled every distinct gram string once)."""
    import __spark_entry__ as entrymod
    p = _plan(entrymod.q_gopher_quality(spark, sf001))
    assert "Exchange" not in p, p
    assert "Join" not in p, p
    assert "Generate" not in p, p


def test_tpch_q3_broadcasts_customer_dim(spark):
    """The filtered customer dim broadcasts (no shuffle of the fact
    side for that join); the fact-fact join shuffles on orderkey; the
    top-20 is TakeOrderedAndProject, never a global sort."""
    import __spark_entry__ as e
    p = _plan(e.q_tpch_q3(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_events_cube_single_pass(spark):
    """CUBE computes all grouping sets via one Expand + one aggregate —
    not a union of per-set scans (one FileScan total)."""
    import __spark_entry__ as e
    p = _plan(e.q_events_cube(spark, "/root/testdata/sf0.001"))
    assert "Expand" in p, p
    assert p.count("FileScan parquet") == 1, p


def test_pack_nfd_metadata_only_shuffle_broadcast_bins(spark, sf001):
    """NFD no-split packing: the bin-state table broadcasts (never a
    shuffled join), the ONE hash Exchange is the within-length rank
    window carrying (doc_id, len) metadata — token/text columns never
    cross any Exchange."""
    from tsf import sampling
    seq = sequences_from_documents(spark, sf001)
    out = sampling.pack_nfd(seq, example_len=2048)
    p = _plan(out)
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    ex = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert all("tokens" not in ln and "text" not in ln for ln in ex), ex


def test_dsir_weights_broadcast_lr_no_text_shuffle(spark, sf001):
    """DSIR weights: the micro-nat log-ratio table joins by BROADCAST
    (never shuffled), and no Exchange carries raw text or gram strings
    wider than the bucketed aggregates."""
    from tsf import dsir
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = dsir.dsir_weights(docs, "lang = 'en' AND source = 'src0'",
                            buckets=64)
    p = _plan(out)
    assert "BroadcastHashJoin" in p, p
    ex = [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln]
    assert ex, "expected the bucket/doc aggregates"
    assert all("text" not in ln and " g#" not in ln for ln in ex), ex


def test_dsir_sample_take_ordered_not_global_sort(spark, sf001):
    from tsf import dsir
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = dsir.dsir_sample(docs, "lang = 'en' AND source = 'src0'",
                           k=10, buckets=64)
    p = _plan(out)
    assert "TakeOrderedAndProject" in p, p


def test_outlier_windows_zero_shuffle(spark, sf001):
    """Outlier sweep: doc stats + window sums are row-local HOF folds,
    the window fan-out is a Generate — ZERO Exchange."""
    from tsf.rollup import outlier_windows
    seq = sequences_from_documents(spark, sf001)
    p = _plan(outlier_windows(seq, window=20))
    assert "Exchange" not in p, p


def test_line_dedup_text_never_shuffles(spark, sf001):
    """Line dedup: raw text never crosses an Exchange — the exploded
    side projects (doc_id, ln, xxhash64(line)) before the hash-window
    shuffle, and dropped positions BROADCAST back onto the unshuffled
    documents scan. Exactly two hash Exchanges (h-window + per-doc
    dropped regroup)."""
    import re

    from tsf.dedup import line_dedup
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(line_dedup(docs, lw=4))
    assert "BroadcastHashJoin" in p, p
    keys = re.findall(r"Exchange hashpartitioning\(([^)]+)", p)
    assert len(keys) == 2, keys
    exlines = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert all("text" not in ln and "line" not in ln for ln in exlines), \
        exlines


def test_bm25_topk_take_ordered_broadcast_stats(spark, sf001):
    """BM25: per-doc tf folds are row-local (no explode, no inverted
    index); the one-row corpus-stats aggregate broadcasts back
    (BroadcastNestedLoopJoin); top-k is TakeOrderedAndProject, never a
    global sort; no hash Exchange anywhere."""
    from tsf.textstats import bm25_topk
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(bm25_topk(docs, k=20))
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastNestedLoopJoin" in p, p
    assert "Exchange hashpartitioning" not in p, p


def test_rolling_windows_single_rollup_row_exchange(spark, sf001):
    """Rolling rollup: window sums are row-local folds; the one
    Exchange carries (doc_id, window_id, two BIGINTs) rollup rows —
    never tokens or text."""
    import re

    from tsf.rollup import rolling_windows
    seq = sequences_from_documents(spark, sf001)
    p = _plan(rolling_windows(seq, window=20, k=4))
    keys = re.findall(r"Exchange hashpartitioning\(([^)]+)", p)
    assert len(keys) == 1 and "doc_id" in keys[0], keys
    exlines = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert all("tokens" not in ln and "text" not in ln
               for ln in exlines), exlines


def test_containment_has_no_cartesian_product(spark, sf001):
    """Asymmetric containment must pair docs via the prefix-shingle
    equi-join — never a cartesian/broadcast nested loop over docs."""
    from tsf import dedup
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(dedup.containment_pairs(docs, num=4, den=5))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_sketch_quantiles_plan_window_group_limit(spark, sf001):
    """The bottom-k sketch must prefilter map-side (WindowGroupLimit):
    each input partition ships only its local bottom-k to the group
    shuffle — the Exchange moves O(groups x k) rows, not the corpus.
    The quantile pick is a row-local sort_array over the <= k collected
    structs (no per-quantile window replay)."""
    from tsf.textstats import sketch_quantiles
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(sketch_quantiles(docs, k=64))
    assert "WindowGroupLimit" in p, p
    assert "CartesianProduct" not in p, p


def test_fertility_stats_single_bounded_exchange(spark, sf001):
    """One partial-combined aggregate: exactly one Exchange, keyed on
    (source, lang) sums — the text column never crosses it."""
    from tsf.textstats import fertility_stats
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(fertility_stats(docs))
    assert p.count("Exchange") == 1, p
    exlines = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert all("text" not in ln for ln in exlines), exlines
    assert "Join" not in p, p


def test_curriculum_rank_plan_range_partitioning(spark, sf001):
    """Global rank must NOT funnel the corpus through one partition:
    the corpus Exchange is RangePartitioning and the window runs within
    range partitions (no SinglePartition sort anywhere)."""
    from tsf.sampling import curriculum_rank
    from pyspark.sql import functions as F
    docs = (spark.read.parquet(f"{sf001}/documents.parquet")
            .select("doc_id", F.col("n_chars").alias("score")))
    out = curriculum_rank(docs, "score", num_partitions=8)
    p = _plan(out)
    assert "rangepartitioning" in p.lower(), p
    assert "SinglePartition" not in p, p
    out.sparkSession.catalog.clearCache()


def test_series_dynamics_zero_shuffle_no_generate(spark, sf001):
    """Whole-series dynamics: every statistic is one row-local fold —
    Scan -> Project only; ZERO Exchange, no Generate, no UDF."""
    from tsf.rollup import series_dynamics
    seq = sequences_from_documents(spark, sf001)
    p = _plan(series_dynamics(seq))
    assert "Exchange" not in p, p
    assert "Generate" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_hard_negatives_broadcast_and_window_group_limit(spark, sf001):
    """Hard-negative mining: the query set broadcasts (corpus
    embeddings never shuffle raw) and the per-query top-k is a
    WindowGroupLimit — the only hash Exchange carries local-top-k rows
    keyed by q_id."""
    from tsf.similarity import hard_negatives
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    p = _plan(hard_negatives(emb, n_queries=8, k=5))
    assert "BroadcastNestedLoopJoin" in p, p
    assert "WindowGroupLimit" in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_zorder_no_corpus_hash_exchange(spark, sf001):
    """Z-order key: min/max stats are one broadcast aggregate row; the
    key is a row-local fold — no hash Exchange touches the corpus; the
    layout's only corpus shuffle is the RangePartitioning that IS the
    requested file order."""
    from tsf.zorder import with_zorder, zorder_layout
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(with_zorder(docs, "n_chars", "doc_id", bits=8))
    assert "Exchange hashpartitioning" not in p, p
    assert "BroadcastExchange" in p, p
    p2 = _plan(zorder_layout(docs, "n_chars", "doc_id", 8, bits=8))
    assert "Exchange rangepartitioning" in p2, p2
    assert "Exchange hashpartitioning" not in p2, p2


def test_audit_expectations_single_pass(spark, sf001):
    """Expectations audit: all conditional-sum rules share one
    partial-aggregated scan (one SinglePartition Exchange of partial
    stats rows); the exact-unique rule adds exactly one keyed Exchange
    of DISTINCT values — nothing else shuffles."""
    from tsf.expectations import audit_expectations
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    rules = [("not_null", "text"), ("min_length", "text", 1),
             ("in_range", "n_chars", 0, 100), ("unique", "doc_id")]
    p = _plan(audit_expectations(docs, rules))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Exchange SinglePartition") == 1, p
    # without a unique rule the keyed Exchange disappears entirely
    p2 = _plan(audit_expectations(docs, rules[:3]))
    assert p2.count("Exchange hashpartitioning") == 0, p2


def test_series_changepoint_zero_shuffle_no_generate(spark, sf001):
    """CUSUM changepoint: one row-local BIGINT fold — Scan -> Project
    only; ZERO Exchange, no Generate, no UDF."""
    from tsf.rollup import series_changepoint
    seq = sequences_from_documents(spark, sf001)
    p = _plan(series_changepoint(seq))
    assert "Exchange" not in p, p
    assert "Generate" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_pairwise_dtw_equi_join_no_cartesian(spark, sf001):
    """DTW pairs same-source heads via an equi-join on source (never a
    cartesian) and runs ONE Arrow kernel pass after the pair
    repartition."""
    from tsf.pairwise import pairwise_dtw
    seq = sequences_from_documents(spark, sf001).where("n_tok >= 64")
    p = _plan(pairwise_dtw(seq, length=24, radius=6))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert p.count("MapInPandas") == 1, p


def test_series_lttb_zero_shuffle_one_kernel_pass(spark, sf001):
    """LTTB: ONE row-local Arrow kernel pass — Scan -> MapInPandas;
    ZERO Exchange, no join."""
    from tsf.rollup import series_lttb
    seq = sequences_from_documents(spark, sf001)
    p = _plan(series_lttb(seq, buckets=12))
    assert "Exchange" not in p, p
    assert "Join" not in p, p
    assert p.count("MapInPandas") == 1, p


def test_series_motif_equi_join_no_cartesian(spark, sf001):
    """Motif discovery: window explode is row-local, the self-join is
    an equi-join on doc_id (never a cartesian / BNLJ), the argmin a
    partial-aggregated struct-min."""
    from tsf.rollup import series_motif
    seq = sequences_from_documents(spark, sf001)
    p = _plan(series_motif(seq, window=32, max_windows=64))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "partial_min" in p or "partial_" in p, p


def test_series_sax_zero_shuffle_no_udf(spark, sf001):
    """SAX words: one row-local array_sort + segment sums — Scan ->
    Project only; ZERO Exchange, no Generate, no UDF."""
    from tsf.rollup import series_sax
    seq = sequences_from_documents(spark, sf001)
    p = _plan(series_sax(seq, segments=16))
    assert "Exchange" not in p, p
    assert "Generate" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
