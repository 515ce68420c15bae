"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline: tier-0 rollup + tier cascade throughput (rolled-up points/sec)
over a deterministic synthetic sequences table of the north-rule shape
(doc_id, tokens array<int32>, n_tok, source) generated JVM-side (no
driver-side data movement), plus the operator queries on the driver's
testdata at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  TSF_BENCH_DOCS      (default 6000)   synthetic docs
  TSF_BENCH_TOKENS    (default 10000)  mean tokens/doc (long tail x20 on ~1%)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tsf.caching import persist_scope  # noqa: E402
from tsf.registry import default_rollup_features  # noqa: E402
from tsf.rollup import next_tier, tier0  # noqa: E402
from tsf.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("TSF_BENCH_DOCS", "6000"))
MEAN_TOK = int(os.environ.get("TSF_BENCH_TOKENS", "10000"))
#: replication factor for the scaled operator-suite pass (0 disables)
OPS_SCALE = int(os.environ.get("TSF_BENCH_OPS_SCALE", "10"))


def synth_sequences_jvm(spark, n_docs: int, mean_tok: int):
    """Deterministic synthetic corpus generated entirely JVM-side:
    token i of doc d = xxhash64(d, i) mod vocab. ~1% of docs are 20x
    long-tail to exercise skew splitting."""
    base = mean_tok // 2
    return (spark.range(n_docs)
            .withColumn("doc_id", F.concat(F.lit("synth-"), F.col("id")))
            .withColumn("n_tok",
                        (F.lit(base) + F.pmod(F.xxhash64("doc_id"), F.lit(mean_tok)))
                        .cast("int"))
            .withColumn("n_tok",
                        F.when(F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(97)) == 0,
                               F.col("n_tok") * 20).otherwise(F.col("n_tok")))
            .withColumn("source",
                        F.element_at(F.array(F.lit("web"), F.lit("code"), F.lit("books")),
                                     (F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(3)) + 1).cast("int")))
            .withColumn("tokens",
                        F.expr("transform(sequence(1, n_tok), "
                               "i -> cast(pmod(xxhash64(doc_id, i), 50257) as int))"))
            .select("doc_id", "tokens", "n_tok", "source"))


SCRATCH = str(Path(__file__).resolve().parent / ".bench_scratch" / "sequences")


def materialize_corpus(spark) -> None:
    """Write the deterministic synthetic corpus to parquet ONCE so the
    headline times the rollup reading columnar storage (the real workload
    shape), not the JVM-side token synthesis."""
    marker = Path(SCRATCH) / f"_gen_{N_DOCS}_{MEAN_TOK}"
    if marker.exists():
        return
    import shutil
    shutil.rmtree(SCRATCH, ignore_errors=True)
    (synth_sequences_jvm(spark, N_DOCS, MEAN_TOK)
     .repartition(4 * CPUS)
     .write.mode("overwrite").parquet(SCRATCH))
    marker.touch()


def materialize_scaled_ops_fixture(spark) -> str:
    """A one-notch-larger operator fixture: documents / embeddings /
    events from $SPARK_GRAFT_SF_DIR replicated OPS_SCALE x with remapped
    ids (each doc's replicas get one extra distinguishing word, so dedup
    sees dense NEAR-duplicate groups instead of pure copies — the
    realistic dup-heavy shape). sf-dir timings stay comparable
    round-over-round; the scaled pass exposes plan scaling where
    sub-second sf0.1 timings are noise."""
    out = str(Path(__file__).resolve().parent / ".bench_scratch"
              / f"ops_x{OPS_SCALE}")
    marker = Path(out) / f"_gen_{OPS_SCALE}"
    if marker.exists():
        return out
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    k = OPS_SCALE
    reps = spark.range(k).withColumnRenamed("id", "rep")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (docs.crossJoin(reps)
         .withColumn("doc_id", F.concat(F.col("doc_id").cast("string"),
                                        F.lit("-r"), F.col("rep")))
         .withColumn("text", F.concat(F.col("text"), F.lit(" rep"),
                                      F.col("rep")))
         .drop("rep")
         .write.mode("overwrite").parquet(f"{out}/documents.parquet"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    (emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") * k + F.col("rep"))
        .drop("rep")
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    (ev.crossJoin(reps)
       .withColumn("user_id", F.col("user_id") * k + F.col("rep"))
       .drop("rep")
       .write.mode("overwrite").parquet(f"{out}/events.parquet"))
    marker.touch()
    return out


#: linear-plan queries worth re-timing on the scaled fixture (the
#: pairwise/near-dup quadratics are excluded: within-group pair counts
#: grow ~OPS_SCALE^2 by construction, which measures the fixture, not
#: the plan — except the three dedup sketches, kept deliberately to
#: watch the bucketed joins under dup-dense data)
X10_QS = ["tier0_rollup", "tier1_rollup", "series_acf", "acf_features",
          "firstcrossing", "dim_stack", "window_z", "events_hourly",
          "gapfill_linear", "dedup_exact", "dedup_minhash", "dedup_simhash",
          "stratified_sample", "length_histogram",
          # containment_pairs joins the excluded pairwise family: the x10
          # replicas mutually contain each other, so the qualifying pair
          # count grows ~OPS_SCALE^2 by construction (fixture, not plan)
          "dedup_ngram_jaccard", "dedup_groups", "mix_sample", "dsir_weights",
          # mix_temperature is timed separately below (schema-agnostic
          # skew slice: the driver query's doc_id % 4 assumes BIGINT ids)
          "pack_examples", "pack_nfd", "epoch_shuffle", "dataset_split",
          "curriculum_rank", "dup_span_stats", "outlier_windows", "rolling_rollup",
          "series_dynamics", "series_changepoint", "series_lttb",
          "series_motif", "series_sax",
          "hll_distinct", "pmi_topk", "fim_examples", "sft_examples",
          # line_dedup / bm25_topk cast doc_id to BIGINT for the oracle
          # hash; the x10 fixture's replica ids are strings, so they are
          # sf0.1-only here
          "simhash_check", "text_quality",
          # decontam_overlap is timed separately below with a
          # schema-agnostic benchmark slice (pmod(xxhash64(string), 7)):
          # the driver query's doc_id % 7 predicate assumes BIGINT ids
          # and the x10 fixture's replica ids are strings ('0-r0')
          "token_counts", "fertility_stats", "token_diversity",
          "gopher_quality", "word_freq_stats",
          "source_quantiles", "sketch_quantiles",
          "quality_classifier", "rand_proj",
          # bloom_decontam is timed separately below (schema-agnostic
          # benchmark + probe slices, like decontam_overlap);
          # semdedup joins the excluded pairwise family: the x10 fixture
          # grows cells 10x while production scales the CELL COUNT with
          # the corpus, so x10 times the fixture's quadratic, not the plan
          # sessionize/asof scale linearly on the replicated events
          # (user_id * k + rep keeps per-user group sizes constant);
          # pii_scrub is timed separately below (the driver query's
          # doc_id-derived injection assumes BIGINT ids)
          "sessionize_stats", "events_asof",
          "audit_expectations",
          "cosine_topk", "hard_negatives", "zorder_key",
          "ann_lsh_topk", "ann_ivf_topk",
          "media_features", "compression_roundtrip", "bpe_pair_counts",
          "cms_topk",
          # lm_perplexity / drift / badwords predicates (lang/source)
          # are schema-stable on the replicated fixture — include them
          "lm_perplexity", "badwords_filter", "corpus_drift",
          "span_corrupt",
          # winnow_candidates joins the pairwise family: dup-dense x10
          # grows per-hash occupancy quadratically by construction, so
          # only the row-local fingerprint selection is re-timed
          "winnow_fp"]
# frame_sample is excluded from the scaled pass: its cost is the fake
# decode MATERIALIZING every 8th image row (~MBs per doc by design), so
# at 10x it times the synthetic payload, not the plan.


def ann_quality_extras(spark, extras: dict) -> None:
    """Recall@10 vs exact cosine + scanned-candidate fraction for both
    ANN families — regressions in sketch quality or probe pruning become
    visible round-over-round instead of hiding behind green hashes."""
    from tsf import similarity as S
    import __spark_entry__ as em
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = em._query_vec(spark, SF_DIR)
    total = emb.count()
    exact = {r["vec_id"] for r in S.cosine_topk(emb, qv, 10).collect()}
    lsh = {r["vec_id"] for r in S.lsh_topk(emb, qv, 10).collect()}
    ivf = {r["vec_id"] for r in S.ivf_topk(emb, qv, 10).collect()}
    lsh_cand = S.lsh_candidates(emb, qv).count()
    ivf_cand = S.ivf_candidates(emb, qv).count()
    extras["ann_lsh_recall_at10"] = len(exact & lsh) / 10.0
    extras["ann_ivf_recall_at10"] = len(exact & ivf) / 10.0
    extras["ann_lsh_scan_frac"] = lsh_cand / total
    extras["ann_ivf_scan_frac"] = ivf_cand / total
    # The raw recall above is measured on the driver's embeddings table,
    # whose vectors are mutually near-orthogonal (top-10 cosines ~0.3-
    # 0.4 vs a ~0.3 background): in that regime NO sublinear ANN can
    # rank the "neighbors", so raw recall is a property of the data,
    # not the sketch. The planted metrics below measure the regime ANN
    # exists for: 10 true near neighbors (cos ~0.97) of the query are
    # unioned in, and recall counts how many the sketch surfaces.
    import numpy as np
    rng = np.random.default_rng(17)
    q = np.asarray(qv, dtype=np.float64)
    u = q / np.linalg.norm(q)
    dim = len(qv)
    planted_ids = list(range(10_000_000, 10_000_010))
    rows = [(pid,
             [float(x) for x in
              (u + 0.25 * rng.standard_normal(dim) / np.sqrt(dim))],
             -1) for pid in planted_ids]
    emb_p = emb.unionByName(spark.createDataFrame(rows, emb.schema))
    lsh_p = {r["vec_id"] for r in S.lsh_topk(emb_p, qv, 10).collect()}
    ivf_p = {r["vec_id"] for r in S.ivf_topk(emb_p, qv, 10).collect()}
    extras["ann_lsh_recall_planted"] = len(set(planted_ids) & lsh_p) / 10.0
    extras["ann_ivf_recall_planted"] = len(set(planted_ids) & ivf_p) / 10.0
    # trained (MLlib k-means) coarse quantizer vs the deterministic
    # first-N rule, through the SAME cents seam: planted recall,
    # scan fraction, and cell-occupancy balance (max cell share; 1/16 =
    # perfectly balanced). On skewed real-world embedding distributions
    # untrained cells give unbalanced occupancy -> scan_frac creep;
    # this row makes that visible round-over-round.
    km = S.ivf_train_centroids(emb, k=16, seed=7)
    det = S.ivf_centroids(emb, 16)
    ivf_k = {r["vec_id"] for r in S.ivf_topk(emb_p, qv, 10,
                                             cents=km).collect()}
    extras["ann_ivf_kmeans_recall_planted"] = (
        len(set(planted_ids) & ivf_k) / 10.0)
    extras["ann_ivf_kmeans_scan_frac"] = (
        S.ivf_candidates(emb, qv, cents=km).count() / total)

    def _max_cell_frac(cents):
        occ = (S.ivf_cells(emb, cents).groupBy("cell").count()
               .agg(F.max("count")).first()[0])
        return occ / total

    extras["ann_ivf_kmeans_max_cell_frac"] = round(_max_cell_frac(km), 3)
    extras["ann_ivf_det_max_cell_frac"] = round(_max_cell_frac(det), 3)
    # semdedup through the same cents seam: duplicate count under the
    # deterministic vs the trained quantizer (identical vectors always
    # share a cell under either; the counts differ only where the cell
    # boundaries cut near-dup neighborhoods apart)
    for tag, cents in (("det", det), ("kmeans", km)):
        with persist_scope():
            extras[f"semdedup_dups_{tag}"] = (
                S.semdedup(emb, threshold=0.3, cents=cents)
                .where("NOT keep").count())
    # recorded, not asserted: the hard >=0.9 planted-recall gate lives in
    # pytest (tests/test_pipeline_ops.py) where a failure is a test
    # failure; crashing the whole bench would cost the round's numbers
    extras["ann_planted_recall_ok"] = (
        extras["ann_lsh_recall_planted"] >= 0.9
        and extras["ann_ivf_recall_planted"] >= 0.9)
    # the ANN paths must actually prune: a scan fraction at/near 1.0
    # means the sketch degenerated into a full scan
    assert extras["ann_lsh_scan_frac"] < 0.9, extras
    assert extras["ann_ivf_scan_frac"] < 0.9, extras


def host_calibration() -> dict[str, float]:
    """Fixed-work host-speed probes, independent of Spark: the VM's
    throughput drifts up to ~2.5x minute-to-minute (hypervisor
    neighbors), so round-over-round query comparisons need a
    denominator. Best-of-3 of (a) a single-thread 1024^3 matmul (FLOP
    speed) and (b) a 256 MB memcpy (DRAM bandwidth — the rollup kernels
    are memory-bound)."""
    import numpy as np
    a = np.random.default_rng(0).standard_normal((1024, 1024))
    flops = 2 * 1024 ** 3
    best_mm = float("inf")
    for _ in range(3):
        t0 = time.time()
        a @ a
        best_mm = min(best_mm, time.time() - t0)
    buf = np.empty(1 << 25)  # 256 MB of float64
    best_cp = float("inf")
    for _ in range(3):
        t0 = time.time()
        buf.copy()
        best_cp = min(best_cp, time.time() - t0)
    return {"host_gflops": round(flops / best_mm / 1e9, 2),
            "host_memcpy_gbps": round(2 * buf.nbytes / best_cp / 1e9, 2)}


def main() -> None:
    spark = get_spark("tsf-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    extras.update(host_calibration())

    # ---- headline: tier-0 rollup + cascade on the synthetic corpus ----
    materialize_corpus(spark)
    seq = spark.read.parquet(SCRATCH)
    total_tokens = seq.agg(F.sum("n_tok")).first()[0]
    feats = default_rollup_features()

    # cold pass (JIT + python-worker pool + page-cache warm-up), then the
    # steady-state measurement — the scaling harness (bench/scaling.py)
    # also measures after a warm-up rep, so the two throughput numbers are
    # comparable round-over-round (round-1 reported cold-only and looked
    # ~3x slower than the scaling run on 4x fewer cores)
    t0 = time.time()
    tier0(seq, feats).count()
    extras["tier0_cold_sec"] = round(time.time() - t0, 3)
    # natural file-split partitioning (32MB splits; no token shuffle) —
    # skew chunking already spreads long docs across many rows.
    # best-of-2 warm reps (host-drift robustness, see the query loop)
    t0 = time.time()
    tier0(seq, feats).count()
    warm1 = time.time() - t0
    t0 = time.time()
    tier0_df = tier0(seq, feats).persist()
    n_t0 = tier0_df.count()
    timings["tier0_rollup_synth"] = min(warm1, time.time() - t0)
    extras["tier0_windows"] = n_t0
    extras["tier0_tokens"] = int(total_tokens)
    extras["tier0_points_per_sec"] = total_tokens / timings["tier0_rollup_synth"]

    t0 = time.time()
    t1df = next_tier(tier0_df, 0, feats).persist()
    n_t1 = t1df.count()
    n_t2 = next_tier(t1df, 1, feats).count()
    timings["tier_cascade_synth"] = time.time() - t0
    extras["tier1_windows"], extras["tier2_windows"] = n_t1, n_t2
    tier0_df.unpersist(); t1df.unpersist()

    # ---- operator queries on the driver's testdata ----
    qs = entrymod.queries()
    bench_qs = ["tier0_rollup", "tier1_rollup", "tier2_rollup", "retention_prune",
                "icelite_roundtrip", "icelite_retention", "icelite_evolve",
                "icelite_wap",
                "series_acf", "series_features", "acf_features",
                "kernel_features", "firstcrossing", "dim_stack",
                "events_hourly", "gapfill_locf",
                "gapfill_linear", "tpch_q1", "tpch_q3", "events_cube",
                "topk_orders", "vocab_topk", "dedup_exact",
                "dedup_minhash", "dedup_ngram_jaccard", "containment_pairs",
                "dedup_simhash",
                "dedup_groups", "dedup_keep_best", "dedup_lsh_groups",
                "dedup_matrix", "dedup_incremental",
                "mix_sample", "mix_temperature", "stratified_sample",
                "length_histogram",
                "pack_examples", "pack_nfd", "chunk_examples", "epoch_shuffle",
                "dataset_split", "curriculum_rank", "dup_span_stats", "remove_dup_spans",
                "dsir_weights", "dsir_sample",
                "simhash_check", "minhash_check", "window_z", "embedding_near_dups", "text_quality", "langid", "fingerprint",
                "audit_expectations",
                "cosine_topk", "hard_negatives", "zorder_key",
                "ann_lsh_topk", "ann_ivf_topk",
                "ann_lsh_topk_indexed", "ann_ivf_topk_indexed",
                "pairwise_pearson",
                "series_pairwise_pearson", "pairwise_phase_sync",
                "pairwise_mi", "pairwise_featureset", "pairwise_super_check",
                "token_counts", "fertility_stats", "token_diversity",
                "gopher_quality", "decontam_overlap",
                "quality_classifier", "bloom_decontam", "semdedup",
                "rand_proj",
                "word_freq_stats", "source_quantiles", "sketch_quantiles",
                "pii_scrub",
                "sessionize_stats", "session_funnel", "events_asof",
                "media_meta", "media_features",
                "frame_sample", "compression_roundtrip",
                "line_dedup", "bm25_topk", "outlier_windows",
                "rolling_rollup", "series_dynamics", "series_changepoint",
                "series_lttb", "series_motif", "series_sax", "pairwise_dtw", "bpe_pair_counts", "cms_topk",
                "hll_distinct", "pmi_topk", "fim_examples", "sft_examples",
                "lm_perplexity", "lm_filter", "badwords_filter",
                "corpus_drift", "span_corrupt", "winnow_fp",
                "winnow_candidates"]
    # best-of-2 per query: the host VM's throughput swings up to ~2.5x
    # minute-to-minute (hypervisor neighbors), and single-shot timings
    # made round-over-round comparisons mostly measure that drift
    for name in bench_qs:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            # persist_scope releases operator-internal caches after the
            # count; clearCache is the belt for anything unscoped. Both
            # run BETWEEN reps so rep 2 cannot silently reuse rep 1's
            # cached intermediates (CacheManager matches canonicalized
            # plans across actions) — both reps are honest cold runs.
            with persist_scope():
                qs[name](spark, SF_DIR).count()
            spark.catalog.clearCache()
            best = min(best, time.time() - t0)
        timings[name] = best

    # ---- scaled operator pass (one rep each; separate dict so sf-dir
    # per-query timings stay comparable round-over-round) ----
    timings_x10: dict[str, float] = {}
    if OPS_SCALE > 1:
        xdir = materialize_scaled_ops_fixture(spark)
        for name in X10_QS:
            t0 = time.time()
            with persist_scope():
                qs[name](spark, xdir).count()
            spark.catalog.clearCache()
            timings_x10[name] = time.time() - t0
        # decontam at x10 with a schema-agnostic benchmark slice (works
        # on BIGINT and string ids alike) so the broadcast-join path's
        # scale shape is actually measured on the dup-dense corpus
        from tsf import textstats as _ts
        docs_x10 = spark.read.parquet(f"{xdir}/documents.parquet")
        bench_x10 = docs_x10.where(
            "pmod(xxhash64(cast(doc_id as string)), 7) = 0")
        t0 = time.time()
        with persist_scope():
            _ts.decontam_overlap(docs_x10, bench_x10).count()
        spark.catalog.clearCache()
        timings_x10["decontam_overlap"] = time.time() - t0
        # bloom decontam at x10, same schema-agnostic benchmark slice,
        # FULL corpus probe (the probe is row-local — this times the
        # bitmap-literal scan shape the operator exists for)
        t0 = time.time()
        with persist_scope():
            bm_x10 = _ts.bloom_bitmap(bench_x10)
            _ts.bloom_decontam(
                docs_x10.where(
                    "pmod(xxhash64(cast(doc_id as string)), 7) != 0"),
                bm_x10).count()
        spark.catalog.clearCache()
        timings_x10["bloom_decontam"] = time.time() - t0
        # pii scrub at x10 on the raw replicated corpus (no id-derived
        # injection — the detector/redaction cost is what scales)
        from tsf import pii as _pii
        t0 = time.time()
        with persist_scope():
            _pii.pii_scrub(docs_x10).count()
        spark.catalog.clearCache()
        timings_x10["pii_scrub"] = time.time() - t0
        # temperature mixing at x10 with a schema-agnostic skew slice
        # (string replica ids): counts-aggregate + broadcast-rate shape
        from tsf import sampling as _samp
        t0 = time.time()
        with persist_scope():
            _samp.mix_temperature(
                docs_x10.where("source IN ('src0', 'src1') OR "
                               "pmod(xxhash64(cast(doc_id as string)), 4)"
                               " = 1"),
                alpha=0.5).count()
        spark.catalog.clearCache()
        timings_x10["mix_temperature"] = time.time() - t0
        # PRODUCTION (xxhash64) LSH->verify->CC on the dup-dense x10
        # fixture — the scale alternative to dedup_groups' exact
        # AllPairs pair generation, timed head-to-head on the same data
        from tsf import dedup as _dedup
        docs_x = spark.read.parquet(f"{xdir}/documents.parquet")
        t0 = time.time()
        with persist_scope():
            _dedup.lsh_dedup_groups(docs_x, threshold=0.3).count()
        spark.catalog.clearCache()
        timings_x10["lsh_dedup_groups_prod"] = time.time() - t0
        # apples-to-apples vs the x10 `dedup_groups` row, which (like
        # its driver query) runs the exact AllPairs+CC path on the
        # deterministic HALF corpus: same half through the LSH path
        t0 = time.time()
        with persist_scope():
            _dedup.lsh_dedup_groups(
                docs_x.where("length(text) % 2 = 0"),
                threshold=0.3).count()
        spark.catalog.clearCache()
        timings_x10["lsh_dedup_groups_prod_half"] = time.time() - t0
        # recall proxy on the fixture's OWN planted structure: every base
        # doc's OPS_SCALE replicas (1-word edits) should land in one
        # group; coherence = fraction of base docs whose replicas all
        # share a group_id (merges ACROSS bases don't count against it)
        with persist_scope():
            grp = _dedup.lsh_dedup_groups(docs_x, threshold=0.3)
            coh = (grp.withColumn(
                       "b", F.regexp_extract("doc_id", r"^(.*)-r\d+$", 1))
                   .groupBy("b")
                   .agg(F.countDistinct("group_id").alias("g"))
                   .agg(F.avg((F.col("g") == 1).cast("double")))
                   .first()[0])
        spark.catalog.clearCache()
        extras["lsh_dedup_replica_coherence_x10"] = round(float(coh), 3)

    # ---- BPE train/apply (timed outside the generic loop: the driver
    # queries share a learned-table module cache, which would make rep 2
    # of best-of-2 free — clear it so both reps train cold; apply is
    # timed as the production single-pass with a pre-learned table) ----
    from tsf import bpe as _bpe
    seq_sf = entrymod._seq(spark, SF_DIR)
    best = float("inf")
    merges = None
    for _ in range(2):
        entrymod._BPE_CACHE.clear()
        t0 = time.time()
        with persist_scope():
            merges, fin = _bpe.train_bpe(seq_sf, entrymod._BPE_MERGES)
            fin.unpersist()
        spark.catalog.clearCache()
        best = min(best, time.time() - t0)
    timings["bpe_train"] = best
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        with persist_scope():
            _bpe.apply_merges(seq_sf, merges, impl="arrow").count()
        spark.catalog.clearCache()
        best = min(best, time.time() - t0)
    timings["bpe_apply"] = best
    if OPS_SCALE > 1:
        seq_x = entrymod._seq(spark, xdir)
        t0 = time.time()
        with persist_scope():
            _bpe.apply_merges(seq_x, merges, impl="arrow").count()
        spark.catalog.clearCache()
        timings_x10["bpe_apply"] = time.time() - t0

    ann_quality_extras(spark, extras)

    total = sum(timings.values())
    out = {
        "metric": "tsf engine bench: tier0/1/2 rollup points/sec (synthetic "
                  f"{extras['tier0_tokens']} tokens) + operator suite at sf dir",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "queries_x10": {k: round(v, 3) for k, v in timings_x10.items()},
        "sf": SF_DIR,
        "cpus": CPUS,
        # the suite TOTAL grows as operators are added round-over-round;
        # compare rounds on tier0_points_per_sec (the north-rule metric)
        # and per-query timings, not on `value`
        "extras": {**{k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in extras.items()},
                   "n_queries": len(bench_qs),
                   # round-3 methodology change: caches are cleared
                   # BETWEEN best-of-2 reps (round-2 ADVICE: rep 2 of
                   # cache-using queries ran partially cached and 'best'
                   # understated real latency), so r3 per-query timings
                   # are honest cold runs — compare r2->r3 deltas against
                   # host_gflops/host_memcpy_gbps, not at face value
                   "timing_note": "best-of-2 cold (clearCache between "
                                  "reps since r3)"},
    }
    line = json.dumps(out)
    # stdout AND a file: the driver's stdout tail capture truncated the
    # r03 line mid-dict (BENCH_r03.json parsed null) — the file copy is
    # the durable record
    bench_dir = Path(__file__).resolve().parent / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "last_run.json").write_text(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
