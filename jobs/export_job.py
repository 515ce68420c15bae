"""spark-submit entrypoint: the full training-data export pipeline over
a documents table — quality filter (Gopher gates + optional
hashed-linear classifier) -> exact + near dedup -> decontaminate ->
PII-redact -> tokenize -> source mix -> train/val/test split -> epoch
shuffle -> partitioned parquet.

Every stage is one of the engine's oracle-checked operators; this job
adds only wiring and per-stage accounting. Ship it exactly like the
rollup job:

    python jobs/package.py                        # builds dist/tsf.zip
    spark-submit --master yarn --py-files dist/tsf.zip \
        jobs/export_job.py --input s3://bucket/documents \
        --output s3://bucket/export --epoch 0 \
        --mix 'web:0.3,code:1.0' --bench-pred 'doc_id % 7 = 0'

Local smoke (sandbox):

    spark-submit --master 'local[8]' --py-files dist/tsf.zip \
        jobs/export_job.py --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/export --near-dedup

Scale shape per stage (all reusing operator plans that are
plan-asserted in tests/): quality + PII are row-local (zero Exchange);
exact dedup is one content-hash aggregate; near dedup is banded LSH ->
verify -> connected components (no quadratic stage); decontam
broadcasts only the benchmark gram set; split assignment is row-local;
the epoch shuffle is ONE shard-keyed Exchange and the final write sorts
within shards only. Output layout: parquet partitioned by
(split, shard), rows within a shard file in epoch-shuffle `pos` order —
a trainer streams shard files in order and gets the reproducible global
permutation.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_mix(s: str | None) -> dict[str, float]:
    if not s:
        return {}
    return {k: float(v) for k, v in
            (part.split(":") for part in s.split(","))}


def parse_split(s: str) -> dict[str, float]:
    a, b, c = (float(x) for x in s.split(","))
    return {"train": a, "val": b, "test": c}


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from tsf import dedup, pii, sampling, textstats
    from tsf.io import TOKENIZE_SPARK

    stats: dict[str, int] = {}

    def mark(name: str, df):
        if not args.no_stats:
            stats[name] = df.count()
        return df

    docs = spark.read.parquet(args.input)
    mark("input_docs", docs)

    # 1. quality: Gopher repetition gates + minimum word count
    #    (row-local signals; the join back is doc_id-keyed)
    sig = textstats.with_repetition_signals(docs).where(
        f"gopher_pass AND n_words >= {args.min_words}")
    docs = docs.join(sig.select("doc_id"), "doc_id")
    mark("after_quality", docs)

    # 1b. model-based quality (optional): hashed-linear classifier gate
    #     (row-local inference; deterministic stand-in weights — swap a
    #     trained model through the same bucket seam)
    if args.classifier:
        ok = (textstats.quality_classifier(docs)
              .where("cls_pass").select("doc_id"))
        docs = docs.join(ok, "doc_id")
        mark("after_classifier", docs)

    # 2. exact dedup: one keeper per identical text
    keep = dedup.exact_dedup(docs).select(
        F.col("keep_doc_id").alias("doc_id"))
    docs = docs.join(keep, "doc_id")
    mark("after_exact_dedup", docs)

    # 3. near dedup (optional): LSH -> verify -> CC; keeper policy is
    #    group minimum (default) or the group's longest copy
    if args.near_dedup:
        g = dedup.lsh_dedup_groups(
            docs, threshold=args.near_threshold,
            checkpoint_dir=f"{args.output}/_cc_checkpoint")
        if args.keep_longest:
            keepers = dedup.keep_best(g, docs, "n_chars").select(
                F.col("keep_doc_id").alias("doc_id"))
        else:
            keepers = g.where("doc_id = group_id").select("doc_id")
        docs = (docs.withColumn("doc_id", F.col("doc_id").cast("string"))
                .join(keepers, "doc_id"))
        mark("after_near_dedup", docs)

    # 3b. history dedup (optional): probe the persisted minhash index —
    #     the daily-increment path; accepted docs fold into the index so
    #     the NEXT export run dedups against this one too
    index_exists = bool(args.index) and dedup.minhash_index_exists(
        spark, args.index)
    if index_exists:
        hist = dedup.dedup_against_index(
            spark, docs, args.index, args.near_threshold) \
            .select("new_doc_id").distinct() \
            .withColumnRenamed("new_doc_id", "doc_id")
        docs = docs.join(hist, "doc_id", "left_anti")
        mark("after_history_dedup", docs)

    # 4. benchmark decontamination (optional): drop the bench slice and
    #    every doc sharing an 8-gram with it
    if args.bench_pred:
        bench = spark.read.parquet(args.input).where(args.bench_pred)
        dirty = textstats.decontam_overlap(docs, bench).select("doc_id")
        docs = (docs.join(F.broadcast(bench.select("doc_id")
                                      .withColumn("doc_id",
                                                  F.col("doc_id")
                                                  .cast(docs.schema["doc_id"]
                                                        .dataType))),
                          "doc_id", "left_anti")
                .join(dirty, "doc_id", "left_anti"))
        mark("after_decontam", docs)

    # 5. PII redaction (row-local)
    docs = pii.redact(docs).drop("text") \
        .withColumnRenamed("text_redacted", "text")

    # 6. tokenize -> sequences shape
    seq = (docs.withColumn("tokens", F.expr(TOKENIZE_SPARK))
           .select(F.col("doc_id").cast("string").alias("doc_id"),
                   "tokens", F.size("tokens").cast("int").alias("n_tok"),
                   "source"))

    # 7. source mixing (optional)
    mix = parse_mix(args.mix)
    if mix:
        seq = sampling.mix_sample(seq, mix, default=args.mix_default)
        mark("after_mix", seq)

    # 8. split + epoch shuffle; tokens join back on doc_id AFTER the
    #    metadata-only shuffle so raw tokens cross no Exchange twice
    meta = sampling.epoch_shuffle(seq.select("doc_id", "source", "n_tok"),
                                  epoch=args.epoch, n_shards=args.shards)
    meta = sampling.dataset_split(meta, fractions=parse_split(args.split),
                                  seed=args.split_seed)
    out = seq.select("doc_id", "tokens").join(meta, "doc_id")

    out = out.persist()
    (out.repartition("split", "shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(f"{args.output}/sequences"))
    # stats come from the written frame itself: an export where every
    # doc deduped away lands as an EMPTY partitioned directory, which
    # parquet cannot re-read without a schema
    stats["written_docs"] = out.count()
    stats["written_tokens"] = out.agg(F.sum("n_tok")).first()[0] or 0
    if args.index and stats["written_docs"] > 0:
        # fold this export's survivors into the history index (the
        # FIRST run creates it; later runs append-only); doc_id type
        # must stay stable across runs, so re-read the original text
        # rows for the exported ids
        src = spark.read.parquet(args.input)
        accepted = src.join(
            out.select(F.col("doc_id")
                       .cast(src.schema["doc_id"].dataType)
                       .alias("doc_id")), "doc_id")
        if index_exists:
            # the tag makes a RETRIED export idempotent on the index
            # (same tag -> the retry overwrites its own batch
            # partitions); untagged runs get a unique tag (plain append)
            dedup.append_minhash_index(accepted, args.index,
                                       batch=args.index_batch)
        else:
            # the creating run stamps the SAME tag, so a retry that
            # finds the index half-created appends over its own batch
            # instead of doubling every signature (base + tag)
            dedup.build_minhash_index(accepted, args.index,
                                      batch=args.index_batch or "base")
    out.unpersist()
    return stats


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--min-words", type=int, default=1)
    p.add_argument("--classifier", action="store_true",
                   help="also gate on the hashed-linear quality "
                        "classifier score (cls_pass)")
    p.add_argument("--near-dedup", action="store_true")
    p.add_argument("--keep-longest", action="store_true",
                   help="near-dedup keeper policy: keep each group's "
                        "longest copy (n_chars, smallest-id ties) "
                        "instead of the min-id default")
    p.add_argument("--index", default=None,
                   help="persisted minhash index path: dedup this "
                        "export against ALL previous exports' docs and "
                        "fold the survivors in (daily-increment mode)")
    p.add_argument("--index-batch", default=None,
                   help="idempotence tag for the index append (e.g. "
                        "the run date): a retried export with the same "
                        "tag overwrites its own index increment "
                        "instead of appending twice")
    p.add_argument("--near-threshold", type=float, default=0.3)
    p.add_argument("--bench-pred", default=None,
                   help="SQL predicate selecting the benchmark slice")
    p.add_argument("--mix", default=None, help="'src:frac,...' weights")
    p.add_argument("--mix-default", type=float, default=1.0)
    p.add_argument("--split", default="0.9,0.05,0.05",
                   help="train,val,test fractions")
    p.add_argument("--split-seed", type=int, default=0)
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--no-stats", action="store_true",
                   help="skip per-stage counts (saves one job per stage)")
    args = p.parse_args(argv)

    from tsf.session import get_spark
    spark = get_spark("tsf-export")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    stats = run(spark, args)
    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    # through the Hadoop FS, not driver-local pathlib: --output may be
    # hdfs:///s3a:// from spark-submit (a local write would crash AFTER
    # a successful export and mark the whole job failed)
    from tsf.io import hadoop_write_text
    hadoop_write_text(spark, f"{args.output}/_export_stats.json",
                      json.dumps(stats, indent=1))
    return stats


if __name__ == "__main__":
    main()
