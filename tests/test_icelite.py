"""Iceberg-style snapshot semantics (tsf.icelite): atomic commits, time
travel, crash windows, hidden-partition + stats pruning, snapshot
expiry, and one-commit retention expiry."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tsf import icelite
from tsf.io import synth_sequences
from tsf.retention import retention_filter
from tsf.rollup import next_tier, tier0
from tsf.registry import catalogue

STATS = ["cnt", "sum_tok", "min_tok", "max_tok", "mean", "std"]


def _rollup(spark, n_docs=40, seed=7):
    seq = synth_sequences(spark, n_docs, seed=seed)
    fs = catalogue()[STATS]
    t0 = tier0(seq, fs, window=20, blocks=False)
    return t0.select("doc_id", "source", "tier", "window_id", "win_start",
                     "cnt", "sum_tok", "mean")


def _sorted_pdf(df):
    pdf = df.toPandas()
    return (pdf.sort_values(list(pdf.columns))
               .reset_index(drop=True)[sorted(pdf.columns)])


def _assert_same(a, b):
    import pandas as pd
    pd.testing.assert_frame_equal(_sorted_pdf(a), _sorted_pdf(b),
                                  check_dtype=False)


@pytest.fixture()
def table(spark, tmp_path):
    """A created table with one append on top (2 snapshots)."""
    roll = _rollup(spark).cache()
    path = str(tmp_path / "tbl")
    icelite.create(roll.where(F.col("doc_id") < "w"), path,
                   [("identity", "source"), ("bucket", "doc_id", 8)])
    icelite.append(roll.where(F.col("doc_id") >= "w"), path)
    yield path, roll
    roll.unpersist()


def test_roundtrip_and_history(spark, table):
    path, roll = table
    _assert_same(icelite.scan(spark, path), roll)
    h = icelite.history(path)
    assert [s["operation"] for s in h] == ["create", "append"]
    assert h[1]["parent_id"] == h[0]["snapshot_id"]
    assert h[1]["rows"] == roll.count()


def test_time_travel(spark, table):
    path, roll = table
    first = icelite.scan(spark, path, snapshot_id=1)
    _assert_same(first, roll.where(F.col("doc_id") < "w"))
    with pytest.raises(LookupError):
        icelite.scan(spark, path, snapshot_id=99)


def test_overwrite_partitions_is_scoped_and_time_travelable(spark, table):
    path, roll = table
    one_src = roll.select("source").first()[0]
    patched = (roll.where(F.col("source") == one_src)
                   .withColumn("mean", F.lit(0.0)))
    icelite.overwrite_partitions(patched, path)
    now = icelite.scan(spark, path)
    # overwritten partition has the patch, the rest is untouched
    _assert_same(now.where(F.col("source") == one_src), patched)
    _assert_same(now.where(F.col("source") != one_src),
                 roll.where(F.col("source") != one_src))
    # pre-overwrite snapshot still reads the original rows
    _assert_same(icelite.scan(spark, path, snapshot_id=2), roll)


def test_crash_windows_leave_table_readable(spark, table):
    """Data files staged without a commit are invisible; a claimed-but-
    unpointed metadata version (crash between claim and pointer swing)
    neither corrupts reads nor blocks the next commit."""
    path, roll = table
    before = _sorted_pdf(icelite.scan(spark, path))
    # crash window 1: staged data files, no commit
    icelite._write_data_files(roll.limit(5), path,
                              [["identity", "source"]])
    # crash window 2: dead claimed metadata version, CURRENT not moved
    dead = icelite._snap_path(path, 3)
    os.link(icelite._snap_path(path, 2), dead)
    after = _sorted_pdf(icelite.scan(spark, path))
    assert before.equals(after)
    # next commit skips the dead version and lands cleanly
    snap = icelite.append(roll.limit(0), path)
    assert snap["snapshot_id"] == 4 and snap["parent_id"] == 2
    assert _sorted_pdf(icelite.scan(spark, path)).equals(before)


def test_real_orphan_with_distinct_content_stays_invisible(
        spark, table, monkeypatch):
    """A REAL claimed-but-never-pointed snapshot — DISTINCT content,
    produced by crashing a writer between its hard-link claim and the
    pointer advance — must be invisible everywhere: scan, lineage (the
    streaming exactly-once gate), the next commit's parentage, and the
    pointer itself. (The sibling test above fabricates the orphan as a
    hard link of v2, whose content still says snapshot_id=2 — that
    shape cannot catch a fallback that resurrects the newest metadata
    file as table state, which is exactly the bug this pins.)"""
    path, roll = table
    before = _sorted_pdf(icelite.scan(spark, path))
    assert icelite._pointed_version(path) == 2   # pointer file IS written

    def crash(p, v):
        raise RuntimeError("crashed between claim and pointer advance")
    monkeypatch.setattr(icelite, "_advance_current", crash)
    with pytest.raises(RuntimeError, match="crashed between"):
        icelite.append(roll.limit(7), path,
                       extra={"batch_id": 99})   # claims v3, never points
    monkeypatch.undo()
    assert os.path.exists(icelite._snap_path(path, 3))   # orphan exists
    # the orphan's rows and its batch id are NOT table state
    assert _sorted_pdf(icelite.scan(spark, path)).equals(before)
    assert [s["snapshot_id"] for s in icelite.lineage(path)] == [1, 2]
    assert all(s["extra"].get("batch_id") != 99
               for s in icelite.lineage(path))
    # the retried batch lands as v4 with parent 2, orphan still skipped
    snap = icelite.append(roll.limit(7), path, extra={"batch_id": 99})
    assert snap["snapshot_id"] == 4 and snap["parent_id"] == 2
    assert icelite._pointed_version(path) == 4


def test_create_on_existing_table_refuses(spark, table):
    """create() over a live table would carry the old files forward
    under a new spec/schema — it must refuse; replace() is the swap."""
    path, roll = table
    with pytest.raises(FileExistsError, match="already exists"):
        icelite.create(roll.limit(1), path, [("identity", "source")])


def test_expire_on_missing_table_is_noop(tmp_path):
    out = icelite.expire_snapshots(str(tmp_path / "never_created"))
    assert out == {"expired_snapshots": 0, "removed_files": 0}


def test_identity_partition_pruning(spark, table):
    path, roll = table
    one_src = roll.select("source").first()[0]
    planned = icelite.plan_files(path, [("source", "==", one_src)])
    allf = icelite.plan_files(path)
    assert 0 < len(planned) < len(allf)
    assert all(f["partition"]["source"] == one_src for f in planned)
    got = icelite.scan(spark, path, [("source", "==", one_src)])
    # the physical scan reads ONLY the pruned file set
    assert len(got.inputFiles()) == len(planned)
    _assert_same(got, roll.where(F.col("source") == one_src))


def test_bucket_pruning_hidden_partition(spark, table):
    path, roll = table
    doc = roll.select("doc_id").first()[0]
    planned = icelite.plan_files(path, [("doc_id", "==", doc)],
                                 spark=spark)
    allf = icelite.plan_files(path)
    b = icelite.bucket_of(spark, doc, 8)
    assert 0 < len(planned) < len(allf)
    assert all(int(f["partition"]["bucket_doc_id"]) == b for f in planned)
    _assert_same(icelite.scan(spark, path, [("doc_id", "==", doc)]),
                 roll.where(F.col("doc_id") == doc))


def test_stats_pruning(spark, table):
    path, roll = table
    hi = roll.agg(F.max("window_id")).first()[0]
    # beyond every file's max -> manifest proves the scan empty
    assert icelite.plan_files(path, [("window_id", ">", hi)]) == []
    assert icelite.scan(spark, path,
                        [("window_id", ">", hi)]).count() == 0
    # a selective range keeps a real subset and stays exact
    sub = icelite.plan_files(path, [("window_id", ">=", hi)])
    assert 0 < len(sub) < len(icelite.plan_files(path))
    _assert_same(icelite.scan(spark, path, [("window_id", ">=", hi)]),
                 roll.where(F.col("window_id") >= hi))


def test_expire_snapshots(spark, table):
    path, roll = table
    one_src = roll.select("source").first()[0]
    icelite.overwrite_partitions(
        roll.where(F.col("source") == one_src)
            .withColumn("mean", F.lit(0.0)), path)   # snapshot 3
    now = _sorted_pdf(icelite.scan(spark, path))
    res = icelite.expire_snapshots(path, keep_last=1)
    assert res["expired_snapshots"] == 2 and res["removed_files"] > 0
    # current read unaffected, expired snapshots unreachable
    assert _sorted_pdf(icelite.scan(spark, path)).equals(now)
    with pytest.raises(LookupError):
        icelite.scan(spark, path, snapshot_id=1)
    # every surviving data file is referenced by the kept snapshot
    kept = {f["path"] for f in icelite.plan_files(path)}
    on_disk = {os.path.relpath(os.path.join(r, n), path)
               for r, _, ns in os.walk(os.path.join(path, "data"))
               for n in ns if n.endswith(".parquet")}
    assert on_disk == kept


def test_commit_conflict_exhaustion(spark, table, monkeypatch):
    path, roll = table
    # every version this writer tries is always already claimed
    real_link = os.link
    monkeypatch.setattr(
        icelite.os, "link",
        lambda src, dst: (_ for _ in ()).throw(FileExistsError(dst)))
    with pytest.raises(icelite.CommitConflict):
        icelite._commit(path, "append", [])
    monkeypatch.setattr(icelite.os, "link", real_link)


def test_retention_single_commit(spark, tmp_path):
    """Retention expiry through the snapshot layer: one atomic commit,
    logical equivalence with retention_filter, pre-retention time
    travel, and the coverage-safety interlock."""
    seq = synth_sequences(spark, 30, seed=11)
    fs = catalogue()[STATS]  # noqa: F841 — same set as the fixture
    t0 = tier0(seq, fs, window=20, blocks=True)
    t1 = next_tier(t0, 0, fs, window=20)
    cols = ["doc_id", "source", "tier", "window_id", "win_start",
            "cnt", "mean"]
    roll = t0.select(*cols).unionByName(t1.select(*cols)).cache()
    path = str(tmp_path / "ret")
    icelite.create(roll, path, [("identity", "tier"),
                                ("bucket", "doc_id", 4)])
    # unsafe policy (tier-1 pruned to nothing that covers tier-0 drops)
    with pytest.raises(ValueError, match="unsafe retention"):
        icelite.apply_retention(spark, path, {0: 1, 1: 1})
    n_before = len(icelite.history(path))
    out = icelite.apply_retention(spark, path, {0: 2})
    assert set(out) == {0}
    h = icelite.history(path)
    assert len(h) == n_before + 1 and h[-1]["operation"] == "retention"
    _assert_same(icelite.scan(spark, path),
                 retention_filter(roll, {0: 2}))
    # the pre-retention snapshot still holds every row
    _assert_same(icelite.scan(spark, path, snapshot_id=1), roll)
    roll.unpersist()


def test_manifest_shape(table):
    """Manifest entries carry what 100x planning needs: rows, bytes,
    partition tuple, min/max stats for plain columns."""
    path, _ = table
    files = icelite.plan_files(path)
    for f in files:
        assert f["rows"] > 0 and f["bytes"] > 0
        assert set(f["partition"]) == {"source", "bucket_doc_id"}
        assert "window_id" in f["stats"]
        lo, hi = f["stats"]["window_id"]
        assert lo <= hi
    # metadata is valid standalone JSON (no pickle, no code), and the
    # snapshot holds manifest REFS (with summaries), not inline files
    with open(icelite._snap_path(path, 1)) as fh:
        snap = json.load(fh)
    assert snap["format_version"] == 2
    assert "files" not in snap
    for ref in snap["manifests"]:
        assert ref["n_files"] > 0 and ref["rows"] > 0


def test_merge_into_cow(spark, table):
    """Copy-on-write MERGE: same-key rows replaced, new keys appended,
    ONE commit, and files outside the touched partitions carry over by
    manifest reference (no rewrite)."""
    path, roll = table
    one_src = roll.select("source").orderBy("source").first()[0]
    # updates: overwrite one source's rows (mean -> -1) + one new doc
    upd = (roll.where(F.col("source") == one_src)
               .withColumn("mean", F.lit(-1.0)))
    new_row = (roll.limit(1)
               .withColumn("doc_id", F.lit("zzz-new-00000"))
               .withColumn("source", F.lit(one_src)))
    updates = upd.unionByName(new_row)
    before = {f["path"]: f for f in icelite.plan_files(path)}
    untouched_before = {p for p, f in before.items()
                        if f["partition"]["source"] != one_src}
    snap = icelite.merge_into(spark, path, updates,
                              keys=["doc_id", "window_id"])
    assert snap["operation"] == "merge"
    after = {f["path"] for f in icelite.plan_files(path)}
    # untouched partitions: identical manifest entries, no rewrite
    assert untouched_before <= after
    # touched partition's old files are gone from the current snapshot
    assert not any(p in after for p, f in before.items()
                   if f["partition"]["source"] == one_src)
    # value semantics: upsert
    want = (roll.where(F.col("source") != one_src)
                .unionByName(updates))
    _assert_same(icelite.scan(spark, path), want)
    # pre-merge snapshot intact
    _assert_same(icelite.scan(spark, path, snapshot_id=2), roll)


def test_concurrent_appends_both_land(spark, table):
    """Two writers committing concurrently from the same parent: the
    loser of each version race retries against the winner's snapshot, so
    BOTH appends land (serialized, neither lost) — optimistic
    concurrency, Iceberg's commit-retry contract."""
    import threading

    path, roll = table
    rows_before = icelite.scan(spark, path).count()
    a = roll.limit(3).withColumn("doc_id", F.concat(F.lit("wa-"), "doc_id"))
    b = roll.limit(4).withColumn("doc_id", F.concat(F.lit("wb-"), "doc_id"))
    # pre-stage both writers' data files so the racing section is the
    # metadata commit itself (threads share one SparkSession safely, but
    # staging first maximizes claim-collision likelihood)
    fa = icelite._write_data_files(a, path, [["identity", "source"]])
    fb = icelite._write_data_files(b, path, [["identity", "source"]])
    errs = []

    def commit(files):
        try:
            icelite._commit(path, "append", files, retries=10)
        except Exception as exc:  # pragma: no cover - failure surface
            errs.append(exc)

    t1 = threading.Thread(target=commit, args=(fa,))
    t2 = threading.Thread(target=commit, args=(fb,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert icelite.scan(spark, path).count() == rows_before + 7
    lin = icelite.lineage(path)
    # strictly serialized history: each commit's parent is the previous
    for prev, cur in zip(lin, lin[1:]):
        assert icelite._read_snapshot(path, cur["snapshot_id"])[
            "parent_id"] == prev["snapshot_id"]


def test_compact_bin_packs_without_changing_state(spark, table):
    """compact() merges each partition's file shards into fewer files in
    ONE commit; table state is value-identical, untouched big files stay
    by reference, and the pre-compaction snapshot time-travels."""
    path, roll = table
    before_pdf = _sorted_pdf(icelite.scan(spark, path))
    files_before = icelite.plan_files(path)
    pre_snap = icelite._read_current(path)["snapshot_id"]
    res = icelite.compact(spark, path, target_bytes=1 << 30)
    assert res["compacted_partitions"] > 0
    assert res["files_after"] < res["files_before"]
    files_after = icelite.plan_files(path)
    assert len(files_after) < len(files_before)
    assert _sorted_pdf(icelite.scan(spark, path)).equals(before_pdf)
    assert _sorted_pdf(
        icelite.scan(spark, path, snapshot_id=pre_snap)).equals(before_pdf)
    # idempotent: a second pass finds nothing worth rewriting at this
    # shard count
    res2 = icelite.compact(spark, path, target_bytes=1 << 30)
    assert res2["compacted_partitions"] == 0


def test_compact_respects_target_bytes_per_partition(spark, table):
    """A partition whose small files sum to several target_bytes must
    pack into ~ceil(bytes/target) files, NOT collapse into one
    arbitrarily large file (the documented rewrite_data_files
    contract); table state stays value-identical."""
    path, roll = table
    for _ in range(4):                       # shard the partitions further
        icelite.append(roll, path)
    before_pdf = _sorted_pdf(icelite.scan(spark, path))
    by_part: dict = {}
    for f in icelite.plan_files(path):
        by_part.setdefault(tuple(sorted(f["partition"].items())),
                           []).append(f)
    # pick a target that makes the biggest partition worth >= 3 output
    # files while still qualifying as "small files" (the predicate needs
    # sum < target * (n_files - 1), i.e. n_files >= 5 at target=sum/3)
    sizes = {p: sum(f["bytes"] for f in fs) for p, fs in by_part.items()}
    big_p, big_bytes = max(sizes.items(), key=lambda kv: kv[1])
    target = max(1, big_bytes // 3)
    assert len(by_part[big_p]) >= 5, "fixture: need shards to pack"
    res = icelite.compact(spark, path, target_bytes=target, min_files=2)
    assert res["compacted_partitions"] > 0
    after = {}
    for f in icelite.plan_files(path):
        after.setdefault(tuple(sorted(f["partition"].items())),
                         []).append(f)
    n_big = len(after[big_p])
    want = -(-big_bytes // target)          # ceil
    assert n_big >= 2, f"collapsed to one file ({big_bytes}B > {target}B)"
    assert n_big <= want + 1                # packed near the target
    assert _sorted_pdf(icelite.scan(spark, path)).equals(before_pdf)


def test_rewrite_conflict_detected(spark, table):
    """A rewrite-style op (compact/merge) whose victim files were
    concurrently replaced must FAIL its commit instead of resurrecting
    the stale rows it rewrote (Iceberg's rewrite_data_files
    validation)."""
    path, roll = table
    victims = {f["path"] for f in icelite.plan_files(path)}
    # concurrent writer replaces everything between the rewrite's read
    # and its commit
    icelite.replace(roll.limit(10), path)
    with pytest.raises(icelite.CommitConflict, match="concurrent update"):
        icelite._commit(path, "compact", [],
                        remove_pred=lambda f: f["path"] in victims,
                        require_removed=victims)
    # a fresh compact against the NEW state succeeds
    before = _sorted_pdf(icelite.scan(spark, path))
    icelite.compact(spark, path, target_bytes=1 << 30)
    assert _sorted_pdf(icelite.scan(spark, path)).equals(before)

def test_append_reuses_parent_manifests(spark, table):
    """An append carries every parent manifest by REFERENCE (O(new
    files) metadata), it never rewrites the existing file list."""
    path, roll = table
    v1 = icelite._read_snapshot(path, 1)
    v2 = icelite._read_snapshot(path, 2)
    names1 = {r["name"] for r in v1["manifests"]}
    names2 = {r["name"] for r in v2["manifests"]}
    assert names1 < names2          # strict superset: old refs + new


def test_expire_keeps_current_despite_newer_orphan(spark, table):
    """A claimed-but-never-pointed version NEWER than CURRENT (writer
    crashed between hard-link claim and pointer advance) must not count
    toward keep_last: CURRENT survives expiry and the orphan is removed,
    never resurrected by _read_current's fallback."""
    path, roll = table
    now = _sorted_pdf(icelite.scan(spark, path))
    dead = icelite._snap_path(path, 3)          # orphan newer than v2
    os.link(icelite._snap_path(path, 2), dead)
    res = icelite.expire_snapshots(path, keep_last=1)
    # dropped: lineage ancestor v1 AND the orphan v3 — never CURRENT
    assert res["expired_snapshots"] == 2
    assert os.path.exists(icelite._snap_path(path, 2))
    assert not os.path.exists(dead)
    assert icelite._read_current(path)["snapshot_id"] == 2
    assert _sorted_pdf(icelite.scan(spark, path)).equals(now)


def test_retention_conflicts_with_concurrent_append(spark, tmp_path,
                                                    monkeypatch):
    """A concurrent append into a pruned tier between retention's scan
    and its commit fails the commit (CommitConflict) instead of being
    silently dropped by the tier-wide remove predicate."""
    from tsf import retention as ret_mod
    roll = _rollup(spark, n_docs=12).withColumn(
        "tier", F.lit(0)).cache()
    path = str(tmp_path / "race")
    icelite.create(roll, path, [("identity", "tier")])
    real_keep = ret_mod._keep_last
    fired = {"done": False}

    def keep_and_race(df, k):
        if not fired["done"]:
            fired["done"] = True       # concurrent writer lands here
            icelite.append(roll.limit(3), path)
        return real_keep(df, k)

    monkeypatch.setattr(ret_mod, "_keep_last", keep_and_race)
    with pytest.raises(icelite.CommitConflict, match="pruned tiers"):
        icelite.apply_retention(spark, path, {0: 2}, force=True)
    roll.unpersist()


def test_bucket_pruning_integer_column(spark, tmp_path):
    """Bucket pruning on a non-long column: the pruning literal is cast
    to the STORED column type before hashing (xxhash64 is
    type-dependent), so == predicates keep the right file instead of
    silently pruning everything."""
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "ints")
    icelite.create(df, path, [("bucket", "k", 8)])
    planned = icelite.plan_files(path, [("k", "==", 7)], spark=spark)
    assert 0 < len(planned) < len(icelite.plan_files(path))
    got = icelite.scan(spark, path, [("k", "==", 7)]).collect()
    assert [(r["k"], r["v"]) for r in got] == [(7, 14)]


def test_plan_files_scales_to_10k_entries(spark, tmp_path):
    """Pin the documented driver-side planning bound: a 10k-file
    snapshot plans in interactive time and pruning still applies."""
    import time as _t
    path = str(tmp_path / "big")
    icelite.create(spark.range(1).select(
        F.col("id").alias("window_id"),
        F.lit("a").alias("source")), path, [("identity", "source")])
    entries = [{"path": f"data/x/{i}.parquet", "rows": 10, "bytes": 100,
                "partition": {"source": f"s{i % 50}"},
                "stats": {"window_id": [i, i + 5]}}
               for i in range(10_000)]
    ref = icelite._write_manifest(path, entries)
    snap = icelite._read_snapshot(path, 1)
    snap["manifests"] = [ref]
    snap["snapshot_id"] = 99
    with open(icelite._snap_path(path, 99), "w") as fh:
        json.dump(snap, fh)
    t0 = _t.time()
    hit = icelite.plan_files(path, [("source", "==", "s7"),
                                    ("window_id", "<", 1000)],
                             snapshot_id=99)
    dt = _t.time() - t0
    assert len(hit) == 20           # 200 in s7, 1/10 under the stat cut
    assert dt < 2.0, f"10k-entry planning took {dt:.2f}s"


# ------------------------------------------------------------ schema evolution

def test_evolve_add_column_null_backfill(spark, table):
    """Add-column is metadata-only: zero data files touched, old files
    read NULL for the new column, new appends carry values, and the
    non-evolved columns still equal the pre-evolve table."""
    path, roll = table
    files_before = {f["path"] for f in icelite.snapshot_files(
        path, icelite._read_current(path))}
    icelite.evolve(path, add=[("quality", "bigint")])
    files_after = {f["path"] for f in icelite.snapshot_files(
        path, icelite._read_current(path))}
    assert files_after == files_before          # no rewrite, no new files
    got = icelite.scan(spark, path)
    assert got.schema["quality"].dataType.simpleString() == "bigint"
    assert got.where(F.col("quality").isNotNull()).count() == 0
    _assert_same(got.drop("quality"), roll)
    # an append WITH the column lands values; old rows stay NULL
    extra = (roll.limit(5)
             .withColumn("doc_id", F.concat(F.lit("evo-"), "doc_id"))
             .withColumn("quality", F.lit(7).cast("bigint")))
    icelite.append(extra, path)
    got2 = icelite.scan(spark, path)
    assert got2.where("quality = 7").count() == 5
    assert got2.where(F.col("quality").isNull()).count() == roll.count()
    # an append that OMITS the nullable column still reads back as NULL
    icelite.append(roll.limit(3).withColumn(
        "doc_id", F.concat(F.lit("old-shape-"), "doc_id")), path)
    assert icelite.scan(spark, path).where(
        F.col("quality").isNull()).count() == roll.count() + 3


def test_evolve_drop_column_and_time_travel(spark, table):
    """Dropped columns vanish from post-evolve reads but TIME TRAVEL to a
    pre-evolve snapshot still resolves them (per-snapshot schema)."""
    path, roll = table
    pre = icelite._read_current(path)["snapshot_id"]
    icelite.evolve(path, drop=["win_start"])
    got = icelite.scan(spark, path)
    assert "win_start" not in got.columns
    _assert_same(got, roll.drop("win_start"))
    tt = icelite.scan(spark, path, snapshot_id=pre)
    assert "win_start" in tt.columns
    _assert_same(tt, roll)


def test_evolve_compact_materializes_new_schema(spark, table):
    """compact() after evolve rewrites through the CURRENT schema, so
    the compacted files carry the evolved shape and state is unchanged."""
    path, roll = table
    icelite.evolve(path, add=[("quality", "bigint")])
    icelite.compact(spark, path)
    got = icelite.scan(spark, path)
    assert got.where(F.col("quality").isNotNull()).count() == 0
    _assert_same(got.drop("quality"), roll)


def test_evolve_validation(spark, table):
    path, _ = table
    with pytest.raises(ValueError):
        icelite.evolve(path)                          # nothing to do
    with pytest.raises(ValueError):
        icelite.evolve(path, add=[("mean", "double")])   # duplicate
    with pytest.raises(ValueError):
        icelite.evolve(path, drop=["nope"])              # missing
    with pytest.raises(ValueError):
        icelite.evolve(path, drop=["source"])            # partition source
    with pytest.raises(ValueError):
        icelite.evolve(path, add=[("_part_x", "int")])   # reserved
    h = icelite.history(path)
    assert [s["operation"] for s in h] == ["create", "append"]  # no commits


# ------------------------------------------------------------ branches (WAP)

def test_branch_append_invisible_until_publish(spark, table):
    """Write-audit-publish: staged branch commits never reach main
    readers; fast_forward makes them visible atomically."""
    path, roll = table
    main_before = _sorted_pdf(icelite.scan(spark, path))
    icelite.create_branch(path, "audit")
    extra = roll.limit(0)  # schema twin
    more = _rollup(spark, n_docs=12, seed=99).select(*roll.columns) \
        .withColumn("doc_id", F.concat(F.lit("b-"), "doc_id"))
    icelite.append_to_branch(more, path, "audit")
    # main unchanged; branch head sees both
    import pandas as pd
    pd.testing.assert_frame_equal(
        _sorted_pdf(icelite.scan(spark, path)), main_before)
    head = icelite.branch_head(path, "audit")
    branch_rows = icelite.scan(spark, path,
                               snapshot_id=head["snapshot_id"])
    assert branch_rows.count() == roll.count() + more.count()
    # audit passes -> publish; main now equals the branch head
    icelite.fast_forward(path, "audit")
    _assert_same(icelite.scan(spark, path), roll.unionByName(more))
    del extra


def test_branch_audit_failure_leaves_main_untouched(spark, table):
    path, roll = table
    icelite.create_branch(path, "audit")
    bad = _rollup(spark, n_docs=5, seed=3).select(*roll.columns) \
        .withColumn("doc_id", F.concat(F.lit("x-"), "doc_id"))
    icelite.append_to_branch(bad, path, "audit")
    icelite.drop_branch(path, "audit")        # audit failed
    _assert_same(icelite.scan(spark, path), roll)
    assert icelite.list_branches(path) == []
    with pytest.raises(LookupError):
        icelite.branch_head(path, "audit")


def test_fast_forward_rejects_diverged_main(spark, table):
    """If main gained a commit after the branch forked, a blind pointer
    swap would drop it — fast_forward must refuse."""
    path, roll = table
    icelite.create_branch(path, "audit")
    inc = _rollup(spark, n_docs=4, seed=11).select(*roll.columns) \
        .withColumn("doc_id", F.concat(F.lit("a-"), "doc_id"))
    icelite.append_to_branch(inc, path, "audit")
    # main moves independently
    inc2 = inc.withColumn("doc_id", F.concat(F.lit("m-"), "doc_id"))
    icelite.append(inc2, path)
    with pytest.raises(icelite.CommitConflict):
        icelite.fast_forward(path, "audit")
    # main keeps its own commit; branch unpublished
    assert icelite.scan(spark, path).count() == roll.count() + inc2.count()


def test_expire_keeps_branch_chain(spark, table):
    """Branch refs pin their snapshots: expire_snapshots must not
    reap a committed-but-unpublished branch head (it is reachable,
    not an orphan)."""
    path, roll = table
    icelite.create_branch(path, "audit")
    inc = _rollup(spark, n_docs=4, seed=5).select(*roll.columns) \
        .withColumn("doc_id", F.concat(F.lit("s-"), "doc_id"))
    head = icelite.append_to_branch(inc, path, "audit")
    icelite.expire_snapshots(path, keep_last=1)
    # branch head still scannable, publish still works
    assert icelite.scan(
        spark, path, snapshot_id=head["snapshot_id"]).count() \
        == roll.count() + inc.count()
    icelite.fast_forward(path, "audit")
    assert icelite.scan(spark, path).count() == roll.count() + inc.count()


def test_branch_name_validation_and_duplicates(spark, table):
    path, _ = table
    with pytest.raises(ValueError):
        icelite.create_branch(path, "../evil")
    icelite.create_branch(path, "ok-1")
    with pytest.raises(FileExistsError):
        icelite.create_branch(path, "ok-1")


def test_wap_with_expectations_gate(spark, table):
    """The full write-AUDIT-publish loop with a real audit operator:
    a staged append that violates the contract is dropped (main never
    sees it); the clean restage passes the gate and publishes."""
    from tsf.expectations import audit_passes
    path, roll = table
    rules = [("not_null", "doc_id"), ("in_range", "cnt", 1, 20)]

    # bad increment: cnt outside the contract range
    bad = _rollup(spark, n_docs=4, seed=21).select(*roll.columns) \
        .withColumn("doc_id", F.concat(F.lit("g-"), "doc_id")) \
        .withColumn("cnt", F.lit(999).cast(roll.schema["cnt"].dataType))
    icelite.create_branch(path, "audit")
    icelite.append_to_branch(bad, path, "audit")
    head = icelite.branch_head(path, "audit")
    staged = icelite.scan(spark, path, snapshot_id=head["snapshot_id"])
    assert not audit_passes(staged, rules)
    icelite.drop_branch(path, "audit")          # audit failed
    _assert_same(icelite.scan(spark, path), roll)

    # clean restage passes and publishes
    good = _rollup(spark, n_docs=4, seed=21).select(*roll.columns) \
        .withColumn("doc_id", F.concat(F.lit("g-"), "doc_id"))
    icelite.create_branch(path, "audit")
    icelite.append_to_branch(good, path, "audit")
    head = icelite.branch_head(path, "audit")
    staged = icelite.scan(spark, path, snapshot_id=head["snapshot_id"])
    assert audit_passes(staged, rules)
    icelite.fast_forward(path, "audit")
    _assert_same(icelite.scan(spark, path), roll.unionByName(good))


# --------------------------------------------------- bloom file pruning

def test_bloom_point_lookup_prunes_interleaved_ids(spark, tmp_path):
    """High-cardinality ids hash-scattered across files: every file's
    [min, max] spans the whole keyspace so footer stats prune NOTHING;
    the per-file blooms prune to (almost) the one true file."""
    ids = [f"{(i * 2654435761) % 2**32:08x}" for i in range(512)]
    df = spark.createDataFrame([(d, i) for i, d in enumerate(ids)],
                               "doc_id string, v long").repartition(8)
    path = str(tmp_path / "btbl")
    icelite.create(df, path, [], properties={"bloom_cols": ["doc_id"],
                                             "bloom_m": 2048})
    all_files = icelite.plan_files(path)
    assert len(all_files) >= 8
    target, absent = ids[137], "ffffffffff"
    kept = icelite.plan_files(path, where=[("doc_id", "==", target)])
    assert len(kept) <= 3, f"bloom should prune to ~1 file, kept {len(kept)}"
    assert icelite.scan(spark, path,
                        where=[("doc_id", "==", target)]).count() == 1
    kept_absent = icelite.plan_files(path,
                                     where=[("doc_id", "==", absent)])
    assert len(kept_absent) <= 1    # min/max alone would keep all 8


def test_bloom_survives_compact_and_append(spark, tmp_path):
    """Table properties (and so blooms) carry through append and
    compact — a rewrite that silently dropped them would quietly
    de-optimize every later point lookup."""
    ids = [f"{(i * 2654435761) % 2**32:08x}" for i in range(256)]
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(d, i) for i, d in enumerate(ids[lo:hi])],
        "doc_id string, v long").repartition(4)
    path = str(tmp_path / "btbl2")
    icelite.create(mk(0, 128), path, [],
                   properties={"bloom_cols": ["doc_id"]})
    icelite.append(mk(128, 256), path)
    icelite.compact(spark, path, target_bytes=1 << 30)
    files = icelite.plan_files(path)
    assert all("bloom" in f and "doc_id" in f["bloom"] for f in files), \
        "compact must rebuild blooms for the packed files"
    kept = icelite.plan_files(path, where=[("doc_id", "==", ids[7])])
    assert len(kept) < len(files) or len(files) == 1
    assert icelite.scan(spark, path,
                        where=[("doc_id", "==", ids[7])]).count() == 1
