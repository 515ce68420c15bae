"""Iceberg-style table format over parquet: atomic snapshot commits,
time travel, manifest-stat file pruning — in pure Python, for the
sandbox.

Why this exists. The north rule calls for "salted-key hash-partitioned
Iceberg tables bucketed by (source, doc_id)" with snapshot-atomic writes
(retention expiry, resume, audit trail). The REAL seam is
:func:`tsf.io.write_rollup(table=...)` — a DataFrameWriterV2 plan with
the exact partition spec — but no Iceberg runtime jar exists in this
container (pyspark's 287 bundled jars carry none, no ivy/maven cache, no
network), so snapshot semantics were untestable. This module reproduces
the SEMANTICS — the part of Iceberg the engine's correctness story
depends on — so they can be exercised end-to-end:

- **Atomic commits**: data files land first under a unique commit dir;
  the snapshot becomes visible only when its metadata file is claimed
  and the CURRENT pointer advances (same shape as Iceberg's
  HadoopTableOperations: write ``v<N>.metadata.json``, then swing
  ``version-hint.text``). A crash at ANY earlier point leaves the prior
  snapshot fully readable and at worst orphans unreferenced files
  (reclaimed by :func:`expire_snapshots`).
- **Optimistic concurrency**: the metadata file is claimed with a
  hard-link (EEXIST = lost race); losers re-derive their file list from
  the new current snapshot and retry, like Iceberg's commit retry.
- **Time travel**: every snapshot is immutable; read any retained
  version by id.
- **Hidden partitioning**: specs are ``("identity", col)`` and
  ``("bucket", col, n)`` — bucket values are ``pmod(xxhash64(col), n)``,
  computed at write time and recorded per file; a reader's equality
  predicate on the SOURCE column prunes to one bucket without the bucket
  ever appearing in the user schema (Iceberg's partition-transform
  story).
- **Manifest stats pruning**: per-file row counts and column min/max
  are read from parquet footers at commit time and stored in the
  manifest; :func:`plan_files` proves files out of a scan with them
  (what Iceberg manifests' ``lower_bounds``/``upper_bounds`` do).

Scale notes — explicit bounds (what changes at 100x, what holds):
- Snapshots reference IMMUTABLE manifest files (``metadata/m-*.json``);
  an append writes O(new files) metadata and carries untouched
  manifests by reference, like Iceberg's manifest list. Rewrite ops
  rewrite only the manifests they remove files from.
- **Driver-side planning bound**: :func:`plan_files` is a Python loop
  over every live file entry — O(total #files) per scan on the driver,
  with no manifest-level min/max skip. Practical ceiling ~10^5..10^6
  file entries (see ``tests/test_icelite.py`` 10k-file planning pin);
  past that, real Iceberg's manifest-tree pruning + distributed
  planning is the answer. Do NOT ship icelite itself at 100x.
- Data-file writes are full Spark jobs (any parallelism); only commit
  metadata is driver-side. Nothing in the commit path scales with ROWS,
  only with files touched.
- Local-FS atomicity primitives (``os.link``/``os.replace``/flock) are
  LOCAL-ONLY — they do not hold on object stores or NFS; a real
  deployment gets these primitives from Iceberg's catalog CAS — use
  ``write_rollup(table=...)``.

Reference parity: the reference has no storage layer at all (in-memory
Julia arrays, `src/FeatureArrays.jl`); this is the Spark-native
persistence the north rule adds around its computations.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType

_META = "metadata"
_DATA = "data"
_CURRENT = "CURRENT"
_PHELP = "_p_"          # helper partition-column prefix (dirs only)


class CommitConflict(RuntimeError):
    """Another writer committed the same version and retries ran out."""


# ------------------------------------------------------------ partition spec

def _spec_cols(spec: list[tuple]) -> list[str]:
    """Helper partition column name per spec entry (directory names)."""
    out = []
    for s in spec:
        if s[0] == "identity":
            out.append(f"{_PHELP}{s[1]}")
        elif s[0] == "bucket":
            out.append(f"{_PHELP}bucket_{s[1]}")
        else:
            raise ValueError(f"unknown partition transform {s[0]!r}")
    return out


def _with_partition_cols(df: DataFrame, spec: list[tuple]) -> DataFrame:
    """Duplicate partition sources into helper columns so partitionBy
    consumes the helpers and the REAL columns stay inside the files
    (explicit-file reads then need no partition-dir inference)."""
    for s in spec:
        if s[0] == "identity":
            df = df.withColumn(f"{_PHELP}{s[1]}", F.col(s[1]))
        else:  # bucket
            _, col, n = s
            df = df.withColumn(
                f"{_PHELP}bucket_{col}",
                F.pmod(F.xxhash64(F.col(col)), F.lit(int(n))).cast("int"))
    return df


def bucket_of(spark: SparkSession, value, n: int, dtype=None) -> int:
    """Driver-side bucket of a literal — one local 1-row job, so the
    Python side never re-implements xxhash64 (it must be bit-identical
    to what write-time Spark computed).

    ``dtype``: the TABLE COLUMN's Spark type. xxhash64 is type-dependent
    (a Python int literal arrives as LongType; hashing it against an
    IntegerType column's write-time buckets would mismatch and silently
    prune every matching file), so the literal is cast to the stored
    column type before hashing."""
    lit = F.lit(value)
    if dtype is not None:
        lit = lit.cast(dtype)
    return spark.range(1).select(
        F.pmod(F.xxhash64(lit), F.lit(int(n))).cast("int")
    ).first()[0]


# ------------------------------------------------------------ file stats

def _file_stats(path: str) -> tuple[int, int, dict]:
    """(rows, bytes, {col: [min, max]}) from the parquet footer. Columns
    lacking stats in any row group are omitted (no pruning on them)."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    bad: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name:          # nested/list columns: skip
                bad.add(name)
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    bad.add(name)
                    continue
            if not isinstance(lo, (int, float, str, bool)):
                bad.add(name)        # dates/decimals: not JSON-plain
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    stats = {k: [mins[k], maxs[k]] for k in mins if k not in bad}
    return md.num_rows, os.path.getsize(path), stats


def _parse_partition(rel_path: str) -> dict:
    """Partition values from hive-style helper dirs in a relative path."""
    vals: dict = {}
    for part in rel_path.split("/")[:-1]:
        if "=" not in part or not part.startswith(_PHELP):
            continue
        k, v = part.split("=", 1)
        v = urllib.parse.unquote(v)
        vals[k[len(_PHELP):]] = (None if v == "__HIVE_DEFAULT_PARTITION__"
                                 else v)
    return vals


# ------------------------------------------------------------ metadata io

def _meta_dir(path: str) -> str:
    return os.path.join(path, _META)


def _snap_path(path: str, version: int) -> str:
    return os.path.join(_meta_dir(path), f"v{version:08d}.metadata.json")


def _read_current(path: str) -> dict | None:
    """Current snapshot dict, via the CURRENT pointer (atomic replace,
    so a reader never needs a lock). NO pointer = NO committed state:
    a claimed-but-never-pointed metadata version (writer crashed
    between its hard-link claim and the pointer advance) must stay
    invisible — the exactly-once contract that lineage(), streaming
    replay and expire_snapshots() all lean on. (An earlier fallback to
    the highest parseable metadata file resurrected exactly those
    orphans as table state.) A pointer naming a missing file is real
    corruption and raises rather than guessing."""
    mdir = _meta_dir(path)
    try:
        with open(os.path.join(mdir, _CURRENT)) as fh:
            name = fh.read().strip()
    except FileNotFoundError:
        return None
    with open(os.path.join(mdir, name)) as fh:
        return json.load(fh)


# Manifests: a snapshot's file list is stored as refs to immutable
# manifest JSON files (metadata/m-<hex>.json), so an APPEND writes
# O(new files) metadata and carries every untouched manifest over by
# reference — the same reuse real Iceberg gets from its manifest list.
# Only rewrite-style ops (overwrite/merge/compact/retention) rewrite
# the manifests they remove files from. Legacy snapshots with an inline
# "files" list remain readable.

#: immutable-manifest content cache: {(table_path, name): entries}
_MANIFEST_CACHE: dict[tuple, list] = {}
_MANIFEST_CACHE_MAX = 256


def _write_manifest(path: str, entries: list[dict]) -> dict:
    """Persist one immutable manifest; return its snapshot-embedded ref
    (name + summary counts, so history() never needs to resolve it)."""
    mdir = _meta_dir(path)
    os.makedirs(mdir, exist_ok=True)
    name = f"m-{uuid.uuid4().hex}.json"
    tmp = os.path.join(mdir, f".tmp-{name}")
    with open(tmp, "w") as fh:
        json.dump({"files": entries}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(mdir, name))
    return {"name": name, "n_files": len(entries),
            "rows": sum(e["rows"] for e in entries),
            "bytes": sum(e["bytes"] for e in entries)}


def _manifest_entries(path: str, name: str) -> list[dict]:
    key = (os.path.abspath(path), name)
    hit = _MANIFEST_CACHE.get(key)
    if hit is None:
        with open(os.path.join(_meta_dir(path), name)) as fh:
            hit = json.load(fh)["files"]
        if len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_MAX:
            _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
        _MANIFEST_CACHE[key] = hit
    return hit


def snapshot_files(path: str, snap: dict) -> list[dict]:
    """Resolve a snapshot's full file-entry list (manifest refs or the
    legacy inline ``files`` form)."""
    if "files" in snap:
        return snap["files"]
    out: list[dict] = []
    for ref in snap["manifests"]:
        out.extend(_manifest_entries(path, ref["name"]))
    return out


def _snapshot_counts(path: str, snap: dict) -> tuple[int, int]:
    """(n_files, rows) without resolving manifests when refs carry
    summaries."""
    if "files" in snap:
        return (len(snap["files"]),
                sum(f["rows"] for f in snap["files"]))
    return (sum(r["n_files"] for r in snap["manifests"]),
            sum(r["rows"] for r in snap["manifests"]))


def _read_snapshot(path: str, snapshot_id: int) -> dict:
    p = _snap_path(path, snapshot_id)
    try:
        with open(p) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise LookupError(
            f"snapshot {snapshot_id} not found (expired or never "
            f"committed) at {path}") from None


def history(path: str) -> list[dict]:
    """Snapshot log, oldest first: id/operation/timestamp/file+row
    counts per retained snapshot."""
    mdir = _meta_dir(path)
    out = []
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".metadata.json"):
            continue
        with open(os.path.join(mdir, name)) as fh:
            s = json.load(fh)
        n_files, rows = _snapshot_counts(path, s)
        out.append({"snapshot_id": s["snapshot_id"],
                    "parent_id": s["parent_id"],
                    "operation": s["operation"],
                    "committed_ms": s["committed_ms"],
                    "extra": s.get("extra", {}),
                    "n_files": n_files,
                    "rows": rows})
    return out


# ------------------------------------------------------------ commit

# --------------------------------------------------- manifest bloom filters

def _bloom_conf(snap: dict | None) -> tuple[list[str], int]:
    """(bloom_cols, m_bits) from a snapshot's table properties."""
    props = (snap or {}).get("properties") or {}
    return list(props.get("bloom_cols") or []), int(props.get("bloom_m",
                                                              2048))


_BLOOM_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


def _bloom_positions(value, m: int):
    """k=3 bit positions for a value (int/str only — the equality-
    lookup types). Hashing str(value) keeps the write-side pyarrow
    native and the probe-side python literal in the same keyspace."""
    import hashlib
    for seed in _BLOOM_SEEDS:
        h = int.from_bytes(hashlib.blake2b(
            f"{seed}:{value}".encode(), digest_size=8).digest(), "big")
        yield h % m


def _file_bloom(fp: str, cols: list[str], m: int) -> dict:
    """Per-file bloom bitmap ({col: [m/64 longs]}) over the DISTINCT
    values of each configured column — read once per file at COMMIT
    time (one column read; the same moment the footer stats are
    harvested), so scans pay nothing."""
    import pyarrow.parquet as pq
    words = max(1, m // 64)
    avail = [c for c in cols]
    try:
        tbl = pq.read_table(fp, columns=avail)
    except Exception:
        return {}
    out = {}
    for c in avail:
        if c not in tbl.column_names:
            continue
        vals = {v for v in tbl.column(c).to_pylist()
                if isinstance(v, (int, str)) and not isinstance(v, bool)}
        if not vals:
            continue
        bits = [0] * words
        for v in vals:
            for p in _bloom_positions(v, words * 64):
                bits[p // 64] |= 1 << (p % 64)
        out[c] = bits
    return out


def _bloom_maybe_contains(bits: list[int], value) -> bool:
    m = len(bits) * 64
    return all(bits[p // 64] >> (p % 64) & 1 for p in
               _bloom_positions(value, m))


def _write_data_files(df: DataFrame, path: str, spec: list[tuple],
                      bloom: tuple[list[str], int] | None = None
                      ) -> list[dict]:
    """Stage `df` under data/<uuid>/ (a normal parallel Spark write) and
    return manifest entries. Nothing is visible until a commit
    references these files."""
    commit_dir = os.path.join(_DATA, uuid.uuid4().hex)
    full = os.path.join(path, commit_dir)
    w = _with_partition_cols(df, spec).write.mode("overwrite")
    pcols = _spec_cols(spec)
    if pcols:
        w = w.partitionBy(*pcols)
    w.parquet(full)
    bcols, bm = bloom if bloom is not None else ([], 0)
    entries = []
    for root, _dirs, names in os.walk(full):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(root, name)
            rel = os.path.relpath(fp, path)
            rows, nbytes, stats = _file_stats(fp)
            e = {"path": rel, "rows": rows, "bytes": nbytes,
                 "partition": _parse_partition(os.path.relpath(fp, full)),
                 "stats": stats}
            if bcols:
                bl = _file_bloom(fp, bcols, bm)
                if bl:
                    e["bloom"] = bl
            entries.append(e)
    return entries


def _commit(path: str, operation: str, new_files: list[dict],
            remove_pred=None, spec: list[tuple] | None = None,
            schema_json: str | None = None, retries: int = 3,
            extra: dict | None = None,
            require_removed: set | None = None,
            validate=None, branch: str | None = None,
            properties: dict | None = None) -> dict:
    """Optimistic snapshot commit. Derives the file list from the
    CURRENT snapshot (minus ``remove_pred`` matches, plus ``new_files``),
    claims the next metadata version with a hard-link (EEXIST = another
    writer won that version), then advances CURRENT under a lock file.
    On a lost race the file list is re-derived from the winner's
    snapshot and the commit retried — append/overwrite semantics are
    re-applied against the new base, as Iceberg does."""
    mdir = _meta_dir(path)
    os.makedirs(mdir, exist_ok=True)
    import fcntl
    with open(os.path.join(mdir, ".commit.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        return _commit_locked(path, operation, new_files, remove_pred,
                              spec, schema_json, retries, extra,
                              require_removed, validate, branch,
                              properties)


def _commit_locked(path: str, operation: str, new_files: list[dict],
                   remove_pred, spec, schema_json, retries: int,
                   extra: dict | None,
                   require_removed: set | None = None,
                   validate=None, branch: str | None = None,
                   properties: dict | None = None) -> dict:
    """The read-derive-claim-advance sequence, under the table's commit
    lock. The lock serializes WRITERS (readers never take it): without
    it, a writer could derive its file list from a stale CURRENT while
    claiming a version number scanned AFTER a competitor's claim — and
    silently drop that competitor's committed changes. Iceberg gets this
    serialization from the catalog's atomic compare-and-swap; on this FS
    the flock is that primitive. The claim-link EEXIST retry remains for
    versions orphaned by CRASHED writers (claimed, never pointed)."""
    mdir = _meta_dir(path)
    new_ref = _write_manifest(path, new_files) if new_files else None
    for _ in range(retries):
        cur = (_read_ref(path, branch) if branch is not None
               else _read_current(path))
        if validate is not None:
            # operation-specific conflict check against the snapshot the
            # commit will actually apply to (may raise CommitConflict)
            validate(cur)
        if require_removed is not None:
            # rewrite-style ops (compact, merge) replace SPECIFIC files
            # they read before taking the lock; if a concurrent commit
            # already replaced any of them, re-adding the rewritten copy
            # would resurrect stale rows next to the newer ones. Iceberg
            # fails rewrite_data_files the same way (validation against
            # the commit's starting snapshot); the caller re-reads and
            # retries.
            live = {f["path"]
                    for f in (snapshot_files(path, cur) if cur else [])}
            gone = require_removed - live
            if gone:
                raise CommitConflict(
                    f"concurrent update replaced {len(gone)} file(s) "
                    f"this {operation} rewrote (e.g. {sorted(gone)[0]}); "
                    f"re-read and retry")
        # manifest reuse: an untouched parent manifest carries over by
        # REFERENCE (O(new files) metadata per append); only manifests
        # remove_pred actually hits get rewritten minus their removals
        refs: list[dict] = []
        if cur is not None:
            if "files" in cur:           # legacy inline list: migrate
                kept = [f for f in cur["files"]
                        if not (remove_pred and remove_pred(f))]
                if kept:
                    refs.append(_write_manifest(path, kept))
            else:
                for ref in cur["manifests"]:
                    if remove_pred is None:
                        refs.append(ref)
                        continue
                    entries = _manifest_entries(path, ref["name"])
                    kept = [f for f in entries if not remove_pred(f)]
                    if len(kept) == len(entries):
                        refs.append(ref)
                    elif kept:
                        refs.append(_write_manifest(path, kept))
        if new_ref is not None:
            refs.append(new_ref)
        existing = [int(n[1:9]) for n in os.listdir(mdir)
                    if n.endswith(".metadata.json")]
        version = (max(existing) + 1) if existing else 1
        snap = {
            "format_version": 2,
            "snapshot_id": version,
            "parent_id": cur["snapshot_id"] if cur else None,
            "operation": operation,
            "committed_ms": int(time.time() * 1000),
            "partition_spec": (spec if spec is not None
                               else (cur["partition_spec"] if cur else [])),
            "schema": (schema_json if schema_json is not None
                       else (cur["schema"] if cur else None)),
            "properties": (properties if properties is not None
                           else (cur.get("properties", {}) if cur else {})),
            "extra": extra or {},
            "manifests": refs,
        }
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(snap, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, _snap_path(path, version))   # atomic claim
        except FileExistsError:
            os.unlink(tmp)
            continue                                   # lost race: retry
        os.unlink(tmp)
        if branch is not None:
            _advance_ref(path, branch, version)
        else:
            _advance_current(path, version)
        return snap
    raise CommitConflict(
        f"lost the commit race {retries} times at {path}")


def _pointed_version(path: str) -> int | None:
    """The version the CURRENT pointer file names, or None — read from
    the pointer FILE directly (never through a fallback: the just-
    claimed metadata must not masquerade as already-pointed)."""
    try:
        with open(os.path.join(_meta_dir(path), _CURRENT)) as fh:
            return int(fh.read().strip()[1:9])
    except (FileNotFoundError, ValueError):
        return None


def _advance_current(path: str, version: int) -> None:
    """Move the CURRENT pointer forward, never backward. Callers hold
    the commit lock (see _commit), so the read-compare-replace below is
    race-free; the os.replace keeps the pointer swap atomic for
    lock-free READERS."""
    mdir = _meta_dir(path)
    pointed = _pointed_version(path)
    if pointed is None or pointed < version:
        tmp = os.path.join(mdir, f".cur-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(os.path.basename(_snap_path(path, version)))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(mdir, _CURRENT))


# ------------------------------------------------------------ branches (WAP)

#: branch names are path-safe tokens (the ref file embeds the name)
_REF_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.-]*$")


def _ref_file(path: str, name: str) -> str:
    if not _REF_RE.match(name):
        raise ValueError(f"invalid branch name {name!r}")
    return os.path.join(_meta_dir(path), f"ref-{name}")


def _read_ref(path: str, name: str) -> dict | None:
    """Branch head snapshot dict, or None if the branch doesn't exist.
    Same orphan discipline as _read_current: the ref FILE is the only
    source of truth, and a ref naming a missing metadata file is real
    corruption and raises."""
    try:
        with open(_ref_file(path, name)) as fh:
            ref_name = fh.read().strip()
    except FileNotFoundError:
        return None
    with open(os.path.join(_meta_dir(path), ref_name)) as fh:
        return json.load(fh)


def _advance_ref(path: str, name: str, version: int) -> None:
    """Move a branch ref forward (same never-backward + atomic-replace
    rules as the CURRENT pointer; callers hold the commit lock)."""
    rf = _ref_file(path, name)
    try:
        with open(rf) as fh:
            pointed = int(fh.read().strip()[1:9])
    except (FileNotFoundError, ValueError):
        pointed = None
    if pointed is None or pointed < version:
        tmp = os.path.join(_meta_dir(path), f".ref-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(os.path.basename(_snap_path(path, version)))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, rf)


def list_branches(path: str) -> list[str]:
    mdir = _meta_dir(path)
    if not os.path.isdir(mdir):
        return []
    return sorted(n[4:] for n in os.listdir(mdir) if n.startswith("ref-"))


def create_branch(path: str, name: str,
                  snapshot_id: int | None = None) -> dict:
    """Create a named branch ref at ``snapshot_id`` (default: the
    CURRENT snapshot) — Iceberg's branch refs, the write side of the
    write-audit-publish pattern (compare Iceberg's
    `ALTER TABLE ... CREATE BRANCH`). Metadata-only: no data moves.
    Raises FileExistsError if the branch exists."""
    import fcntl
    mdir = _meta_dir(path)
    if not os.path.isdir(mdir):
        raise LookupError(f"no table at {path}")
    with open(os.path.join(mdir, ".commit.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if _read_ref(path, name) is not None:
            raise FileExistsError(f"branch {name!r} already exists")
        snap = (_read_snapshot(path, snapshot_id)
                if snapshot_id is not None else _read_current(path))
        if snap is None:
            raise LookupError(f"no committed snapshot at {path}")
        _advance_ref(path, name, snap["snapshot_id"])
        return snap


def drop_branch(path: str, name: str) -> None:
    """Delete a branch ref (metadata-only — the audit-failed path of
    WAP; the branch's unreachable snapshots fall to the next
    expire_snapshots())."""
    try:
        os.unlink(_ref_file(path, name))
    except FileNotFoundError:
        raise LookupError(f"no branch {name!r} at {path}") from None


def branch_head(path: str, name: str) -> dict:
    snap = _read_ref(path, name)
    if snap is None:
        raise LookupError(f"no branch {name!r} at {path}")
    return snap


def append_to_branch(df: DataFrame, path: str, name: str,
                     extra: dict | None = None) -> dict:
    """Snapshot-append onto a BRANCH head: the staged write of
    write-audit-publish. The new snapshot's parent is the branch head
    and only the branch ref advances — CURRENT (and every main-branch
    reader) never sees the rows until :func:`fast_forward`."""
    base = _read_ref(path, name)
    if base is None:
        raise LookupError(f"no branch {name!r} at {path} "
                          f"(create_branch() first)")
    files = _write_data_files(df, path, base["partition_spec"],
                              bloom=_bloom_conf(base))
    return _commit(path, "append", files, extra=extra, branch=name)


def fast_forward(path: str, name: str) -> dict:
    """Publish a branch: advance CURRENT to the branch head, but ONLY
    if the current main head is an ancestor of the branch head (the
    fast-forward condition — Iceberg's ``fast_forward`` procedure).
    If main gained commits since the branch forked, raises
    CommitConflict: a blind pointer swap would silently drop them;
    the caller rebases (re-stages onto a fresh branch) and retries.
    Runs under the table commit lock, so the ancestry check and the
    pointer advance are atomic vs concurrent writers."""
    import fcntl
    mdir = _meta_dir(path)
    with open(os.path.join(mdir, ".commit.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        head = _read_ref(path, name)
        if head is None:
            raise LookupError(f"no branch {name!r} at {path}")
        cur = _read_current(path)
        if cur is not None and cur["snapshot_id"] != head["snapshot_id"]:
            snap, ancestor = head, False
            while snap is not None:
                if snap["snapshot_id"] == cur["snapshot_id"]:
                    ancestor = True
                    break
                pid = snap["parent_id"]
                snap = (_read_snapshot(path, pid)
                        if pid is not None else None)
            if not ancestor:
                raise CommitConflict(
                    f"main has diverged from branch {name!r} "
                    f"(main at {cur['snapshot_id']}, not an ancestor of "
                    f"branch head {head['snapshot_id']}); rebase the "
                    f"branch and retry")
        _advance_current(path, head["snapshot_id"])
        return head


# ------------------------------------------------------------ public writes

def create(df: DataFrame, path: str, partition_by: list[tuple],
           extra: dict | None = None,
           properties: dict | None = None) -> dict:
    """Create the table with an initial snapshot of ``df``.
    ``partition_by``: ``("identity", col)`` / ``("bucket", col, n)``.
    ``extra``: JSON-plain metadata recorded on the snapshot (e.g. a
    streaming micro-batch id for exactly-once idempotence checks).
    ``properties``: table properties carried forward by every commit —
    ``{"bloom_cols": [col, ...], "bloom_m": bits}`` turns on per-file
    bloom filters for equality pruning (see :func:`plan_files`); size
    ``bloom_m`` (default 2048 bits) to ~10 bits per expected DISTINCT
    value per file.

    Refuses a path that already holds a committed table: a create over
    live state would carry the old files forward under a NEW partition
    spec/schema (silently doubled, mis-specced data) — use
    :func:`replace` to swap contents, or point at a fresh path."""
    if _read_current(path) is not None:
        raise FileExistsError(
            f"table already exists at {path}; use replace() to swap "
            f"its contents or create() at a fresh path")
    os.makedirs(path, exist_ok=True)
    files = _write_data_files(df, path, partition_by,
                              bloom=_bloom_conf({"properties":
                                                 properties or {}}))
    return _commit(path, "create", files, spec=partition_by,
                   schema_json=df.schema.json(), extra=extra,
                   properties=properties or {})


def append(df: DataFrame, path: str, extra: dict | None = None) -> dict:
    """Snapshot-append ``df`` (schema must match the table's)."""
    cur = _read_current(path)
    if cur is None:
        raise LookupError(f"no table at {path} (create() first)")
    files = _write_data_files(df, path, cur["partition_spec"],
                              bloom=_bloom_conf(cur))
    return _commit(path, "append", files, extra=extra)


def lineage(path: str) -> list[dict]:
    """CURRENT's ancestor chain (oldest first): the snapshots whose
    changes are actually IN the current table state. This deliberately
    excludes claimed-but-never-pointed metadata versions (a writer that
    died between claim and pointer advance): their changes are NOT in
    the table, so e.g. a replayed streaming batch must not treat them
    as committed. Stops at the oldest retained ancestor."""
    out = []
    snap = _read_current(path)
    while snap is not None:
        out.append({"snapshot_id": snap["snapshot_id"],
                    "operation": snap["operation"],
                    "extra": snap.get("extra", {})})
        pid = snap["parent_id"]
        if pid is None:
            break
        try:
            snap = _read_snapshot(path, pid)
        except LookupError:      # expired ancestor
            break
    out.reverse()
    return out


def overwrite_partitions(df: DataFrame, path: str) -> dict:
    """Dynamic partition overwrite: one atomic snapshot that drops every
    file whose partition tuple appears in ``df`` and adds ``df``'s
    files. (The parquet-layout equivalent needs a staged write plus a
    dead-partition sweep — here a crash anywhere leaves the old snapshot
    intact.)"""
    cur = _read_current(path)
    if cur is None:
        raise LookupError(f"no table at {path} (create() first)")
    spec = cur["partition_spec"]
    files = _write_data_files(df, path, spec, bloom=_bloom_conf(cur))
    touched = {tuple(sorted(f["partition"].items())) for f in files}
    return _commit(
        path, "overwrite", files,
        remove_pred=lambda f: tuple(sorted(f["partition"].items()))
        in touched)


def merge_into(spark: SparkSession, path: str, updates: DataFrame,
               keys: list[str]) -> dict:
    """Copy-on-write MERGE (upsert): ``updates`` rows replace same-key
    rows, new keys append — ONE atomic snapshot.

    Only files whose partition tuple appears in ``updates`` are
    rewritten (candidates found by applying the table's partition
    transforms to ``updates`` and collecting the distinct tuples — a
    bounded set, it is a partitioning); every other file carries over
    into the new snapshot UNTOUCHED, by manifest reference, with no IO.
    That is Iceberg's copy-on-write MERGE shape: write amplification is
    proportional to the partitions hit, not the table."""
    cur = _read_current(path)
    if cur is None:
        raise LookupError(f"no table at {path} (create() first)")
    spec = [tuple(s) for s in cur["partition_spec"]]
    pcols = _spec_cols(spec)
    hit = {
        tuple(str(r[c]) for c in pcols)
        for r in _with_partition_cols(updates, spec)
                 .select(*pcols).distinct().collect()}

    def touched(f: dict) -> bool:
        part = f["partition"]
        return tuple(
            str(part.get(c[len(_PHELP):])) for c in pcols) in hit

    cand = [f for f in snapshot_files(path, cur) if touched(f)]
    schema = StructType.fromJson(json.loads(cur["schema"]))
    if cand:
        existing = spark.read.schema(schema).parquet(
            *[os.path.join(path, f["path"]) for f in cand])
        survivors = existing.join(
            updates.select(*keys).distinct(), keys, "left_anti")
        merged = survivors.unionByName(updates.select(*existing.columns))
    else:
        merged = updates.select(*[f.name for f in schema.fields])
    new_files = _write_data_files(merged, path, spec,
                                  bloom=_bloom_conf(cur))
    return _commit(path, "merge", new_files, remove_pred=touched,
                   require_removed={f["path"] for f in cand})


def replace(df: DataFrame, path: str) -> dict:
    """Full-table replace as one snapshot: drops every previous file and
    adds ``df``'s. The publish primitive — a consumer mid-scan keeps the
    old snapshot; the pre-replace state stays time-travelable until
    expired."""
    cur = _read_current(path)
    if cur is None:
        raise LookupError(f"no table at {path} (create() first)")
    files = _write_data_files(df, path, cur["partition_spec"],
                              bloom=_bloom_conf(cur))
    return _commit(path, "replace", files, remove_pred=lambda f: True)


def evolve(path: str, add: list[tuple[str, str]] | None = None,
           drop: list[str] | None = None,
           extra: dict | None = None) -> dict:
    """Schema evolution as a METADATA-ONLY snapshot commit (Iceberg's
    add/drop column: zero data files touched, zero rewrites).

    ``add``: (name, spark-DDL-type) pairs appended as NULLABLE fields —
    existing files simply lack the column and every read through the
    evolved snapshot fills NULL (Spark's name-based parquet resolution
    under an explicit read schema), exactly Iceberg's null backfill.
    ``drop``: column names projected out of the table schema — the bytes
    stay in the files (and in pre-evolve snapshots, so TIME TRAVEL still
    reads the dropped column) but no post-evolve read resolves them.
    Rename is deliberately absent: Iceberg renames via field IDs; a
    name-based layer would silently orphan the old column's data, so
    spell it add + backfill + drop.

    Later appends may omit added nullable columns (reads fill NULL);
    compact()/merge_into() read through the CURRENT schema, so any
    rewrite materializes the evolved shape. Partition source columns
    cannot be dropped."""
    cur = _read_current(path)
    if cur is None:
        raise LookupError(f"no table at {path} (create() first)")
    add, drop = list(add or []), list(drop or [])
    if not add and not drop:
        raise ValueError("evolve(): nothing to do (no add, no drop)")
    schema = StructType.fromJson(json.loads(cur["schema"]))
    names = set(schema.fieldNames())
    dups = [n for n, _ in add if n in names]
    if dups:
        raise ValueError(f"evolve(): column(s) already exist: {dups}")
    missing = [n for n in drop if n not in names]
    if missing:
        raise ValueError(f"evolve(): cannot drop missing column(s): "
                         f"{missing}")
    part_src = {s[1] for s in cur["partition_spec"]}
    bad = [n for n in drop if n in part_src]
    if bad:
        raise ValueError(f"evolve(): column(s) {bad} source the "
                         f"partition spec; drop is not allowed")
    hidden = [n for n, _ in add if n.startswith("_part_")]
    if hidden:
        raise ValueError(f"evolve(): reserved column prefix: {hidden}")
    fields = [f for f in schema.fields if f.name not in set(drop)]
    if not fields:
        raise ValueError("evolve(): cannot drop every column")
    from pyspark.sql.types import _parse_datatype_string
    for name, ddl in add:
        fields.append(StructField(name, _parse_datatype_string(ddl),
                                  nullable=True))
    new_schema = StructType(fields)
    return _commit(path, "evolve", [], schema_json=new_schema.json(),
                   extra=extra)


# ------------------------------------------------------------ reads

_OPS = {
    "==": lambda lo, hi, v: not (v < lo or hi < v),
    "<=": lambda lo, hi, v: not (lo > v),
    ">=": lambda lo, hi, v: not (hi < v),
    "<":  lambda lo, hi, v: not (lo >= v),
    ">":  lambda lo, hi, v: not (hi <= v),
}


def _coerce(raw: str | None, like):
    """Partition values parse from dir names as strings; compare in the
    predicate literal's type."""
    if raw is None:
        return None
    if isinstance(like, bool):
        return raw == "true"
    if isinstance(like, int):
        return int(raw)
    if isinstance(like, float):
        return float(raw)
    return raw


def plan_files(path: str, where: list[tuple] | None = None,
               snapshot_id: int | None = None,
               spark: SparkSession | None = None) -> list[dict]:
    """Manifest-level scan planning: the file subset that can contain
    rows matching ``where`` (a list of ``(col, op, literal)``,
    conjunctive). Pruning sources, in order:

    1. identity-partition values (exact, any op),
    2. bucket-partition values (``==`` on the bucket's source column;
       needs ``spark`` to hash the literal),
    3. footer min/max stats (any op, conservative),
    4. per-file bloom filters (``==`` only, on the table's
       ``bloom_cols`` property) — the point-lookup pruner min/max can't
       be on high-cardinality columns whose values interleave across
       files (every file's [min, max] spans the probe). Iceberg gets
       this from parquet bloom filters / puffin; here the bitmap lives
       in the manifest entry, built once at commit time.

    A file survives unless one source PROVES it empty for the scan."""
    snap = (_read_snapshot(path, snapshot_id) if snapshot_id is not None
            else _read_current(path))
    if snap is None:
        raise LookupError(f"no table at {path}")
    where = where or []
    spec = {s[1]: s for s in snap["partition_spec"]}
    tschema = (StructType.fromJson(json.loads(snap["schema"]))
               if snap.get("schema") else None)
    bucket_cache: dict = {}
    out = []
    for f in snapshot_files(path, snap):
        keep = True
        for col, op, v in where:
            fn = _OPS[op]
            s = spec.get(col)
            if s and s[0] == "identity" and col in f["partition"]:
                pv = _coerce(f["partition"][col], v)
                if pv is None or not fn(pv, pv, v):
                    keep = False
                    break
            if (s and s[0] == "bucket" and op == "=="
                    and spark is not None):
                bcol = f"bucket_{col}"
                if bcol in f["partition"]:
                    if (col, v) not in bucket_cache:
                        dt = (tschema[col].dataType if tschema is not None
                              and col in tschema.fieldNames() else None)
                        bucket_cache[(col, v)] = bucket_of(
                            spark, v, s[2], dtype=dt)
                    if int(f["partition"][bcol]) != bucket_cache[(col, v)]:
                        keep = False
                        break
            st = f["stats"].get(col)
            if st is not None and not fn(st[0], st[1], v):
                keep = False
                break
            if op == "==":
                bl = f.get("bloom", {}).get(col)
                if bl is not None and not _bloom_maybe_contains(bl, v):
                    keep = False      # definitely absent from this file
                    break
        if keep:
            out.append(f)
    return out


def scan(spark: SparkSession, path: str, where: list[tuple] | None = None,
         snapshot_id: int | None = None) -> DataFrame:
    """Read the table (current or time-travel) with manifest pruning.
    ``where`` predicates are ALSO applied as DataFrame filters, so the
    result is exact even where pruning is conservative."""
    snap = (_read_snapshot(path, snapshot_id) if snapshot_id is not None
            else _read_current(path))
    if snap is None:
        raise LookupError(f"no table at {path}")
    schema = StructType.fromJson(json.loads(snap["schema"]))
    files = plan_files(path, where, snapshot_id=snap["snapshot_id"],
                       spark=spark)
    if not files:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(
        *[os.path.join(path, f["path"]) for f in files])
    for col, op, v in (where or []):
        expr = {"==": F.col(col) == v, "<=": F.col(col) <= v,
                ">=": F.col(col) >= v, "<": F.col(col) < v,
                ">": F.col(col) > v}[op]
        df = df.where(expr)
    return df


# ------------------------------------------------------------ maintenance

def compact(spark: SparkSession, path: str,
            target_bytes: int = 128 << 20,
            min_files: int = 2) -> dict:
    """Bin-pack small data files into ~``target_bytes`` files, one
    atomic commit — Iceberg's ``rewrite_data_files`` maintenance action
    (the small-file problem: every append/streaming commit adds files,
    and scan cost grows with file COUNT even when pruning is perfect).

    Partition-local: only partitions holding >= ``min_files`` files
    whose combined size undershoots target_bytes-per-file get rewritten
    (coalesced to ceil(bytes/target) files via a repartition on the
    partition's rows); all other files carry over by manifest reference.
    Table state is value-identical before and after — compaction is
    pure physical reorganization, and the pre-compaction snapshot stays
    time-travelable."""
    cur = _read_current(path)
    if cur is None:
        raise LookupError(f"no table at {path}")
    by_part: dict[tuple, list[dict]] = {}
    for f in snapshot_files(path, cur):
        by_part.setdefault(tuple(sorted(f["partition"].items())), []).append(f)
    todo = {p: fs for p, fs in by_part.items()
            if len(fs) >= min_files
            and sum(f["bytes"] for f in fs) < target_bytes * (len(fs) - 1)}
    if not todo:
        return {"compacted_partitions": 0, "files_before": 0,
                "files_after": 0}
    schema = StructType.fromJson(json.loads(cur["schema"]))
    victims = [f for fs in todo.values() for f in fs]
    victim_paths = {f["path"] for f in victims}
    spec = [tuple(s) for s in cur["partition_spec"]]
    # per-partition coalesce to each partition's OWN ceil(bytes/target)
    # file count, then a shuffle-free union: every task holds one
    # partition's rows, so the write emits exactly that many files per
    # dir. (A single repartition on the partition-tuple columns hashed
    # each partition into ONE task — one arbitrarily large output file
    # and a straggler write, regardless of target_bytes.)
    packed = None
    for _p, fs_ in sorted(todo.items()):
        n_i = max(1, -(-sum(f["bytes"] for f in fs_) // target_bytes))
        part = spark.read.schema(schema).parquet(
            *[os.path.join(path, f["path"]) for f in fs_]).coalesce(int(n_i))
        packed = part if packed is None else packed.unionByName(part)
    new_files = _write_data_files(packed, path, spec,
                                  bloom=_bloom_conf(cur))
    _commit(path, "compact", new_files,
            remove_pred=lambda f: f["path"] in victim_paths,
            require_removed=victim_paths)
    return {"compacted_partitions": len(todo),
            "files_before": len(victims), "files_after": len(new_files)}


def expire_snapshots(path: str, keep_last: int = 2,
                     orphan_grace_sec: float = 0.0) -> dict:
    """Garbage-collect: keep the newest ``keep_last`` snapshots of
    CURRENT's ANCESTOR CHAIN (always including CURRENT), delete older
    lineage metadata, orphaned metadata versions, and any data file no
    retained snapshot references. Time travel to an expired snapshot
    then raises LookupError — exactly Iceberg's expire_snapshots
    contract.

    The retained set is derived from CURRENT plus its parent chain, NOT
    from the newest metadata filenames: a claimed-but-never-pointed
    orphan version (a writer that crashed between its hard-link claim
    and the pointer advance) can carry a HIGHER version number than
    CURRENT, and counting it toward ``keep_last`` would push CURRENT's
    own metadata into the drop set — after which ``_read_current``'s
    fallback would resurrect the uncommitted orphan as the table state.
    Expiry runs under the table's commit flock; since claim AND pointer
    advance both happen under that lock, any claimed-but-unpointed
    version observed while holding it belongs to a DEAD writer and its
    metadata is safe to remove (subject to ``orphan_grace_sec``).

    ``orphan_grace_sec``: unreferenced data files (and orphan metadata)
    YOUNGER than this are kept — a concurrent writer stages its data
    files BEFORE taking the commit lock, so with live writers an
    aggressive sweep could delete a commit-in-flight's files (the reason
    Iceberg's remove_orphan_files defaults to a 3-day age threshold).
    The 0 default suits the single-writer sandbox; pass a real grace
    when writers overlap."""
    import fcntl
    import time as _time
    mdir = _meta_dir(path)
    if not os.path.isdir(mdir):   # never created: the documented no-op
        return {"expired_snapshots": 0, "removed_files": 0}
    with open(os.path.join(mdir, ".commit.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        now = _time.time()
        cur = _read_current(path)
        if cur is None:
            return {"expired_snapshots": 0, "removed_files": 0}
        # CURRENT's ancestor chain, newest first
        chain: list[int] = []
        snap = cur
        while snap is not None:
            chain.append(snap["snapshot_id"])
            pid = snap["parent_id"]
            if pid is None:
                break
            try:
                snap = _read_snapshot(path, pid)
            except LookupError:          # already-expired ancestor
                break
        keep_ids = set(chain[:max(1, keep_last)])
        # branch refs pin their whole ancestor chain (Iceberg's expire
        # keeps every snapshot reachable from a ref): a branch head is
        # committed-but-unpublished state, not an orphan
        for bname in list_branches(path):
            snap = _read_ref(path, bname)
            while snap is not None:
                if snap["snapshot_id"] in keep_ids:
                    break
                keep_ids.add(snap["snapshot_id"])
                chain.append(snap["snapshot_id"])
                pid = snap["parent_id"]
                if pid is None:
                    break
                try:
                    snap = _read_snapshot(path, pid)
                except LookupError:
                    break
        drop: list[str] = []
        for name in sorted(os.listdir(mdir)):
            if not name.endswith(".metadata.json"):
                continue
            vid = int(name[1:9])
            if vid in keep_ids:
                continue
            fp = os.path.join(mdir, name)
            if (vid not in chain
                    and now - os.path.getmtime(fp) < orphan_grace_sec):
                continue                 # possibly mid-crash-recovery: wait
            drop.append(name)
        # data files / manifests referenced by ANY surviving snapshot
        referenced: set = set()
        live_manifests: set = set()
        dropset = set(drop)
        for name in os.listdir(mdir):
            if name.endswith(".metadata.json") and name not in dropset:
                with open(os.path.join(mdir, name)) as fh:
                    s = json.load(fh)
                if "files" not in s:
                    live_manifests |= {r["name"] for r in s["manifests"]}
                referenced |= {f["path"] for f in snapshot_files(path, s)}
        removed_files = 0
        droot = os.path.join(path, _DATA)
        for root, _dirs, names in os.walk(droot, topdown=False):
            for name in names:
                fp = os.path.join(root, name)
                if (name.endswith(".parquet")
                        and os.path.relpath(fp, path) not in referenced
                        and now - os.path.getmtime(fp) >= orphan_grace_sec):
                    os.unlink(fp)
                    removed_files += 1
            if not os.listdir(root):
                os.rmdir(root)
        for name in drop:
            os.unlink(os.path.join(mdir, name))
        # manifests no surviving snapshot references (incl. commit-retry
        # orphans), same grace as data files
        removed_manifests = 0
        for name in os.listdir(mdir):
            fp = os.path.join(mdir, name)
            if (name.startswith("m-") and name.endswith(".json")
                    and name not in live_manifests
                    and now - os.path.getmtime(fp) >= orphan_grace_sec):
                os.unlink(fp)
                _MANIFEST_CACHE.pop((os.path.abspath(path), name), None)
                removed_manifests += 1
        return {"expired_snapshots": len(drop),
                "removed_files": removed_files,
                "removed_manifests": removed_manifests}


# ------------------------------------------------------------ retention

def apply_retention(spark: SparkSession, path: str,
                    policy: dict[int, int | None],
                    force: bool = False) -> dict[int, int]:
    """Retention expiry as ONE atomic snapshot commit (contrast
    :func:`tsf.retention.apply_retention`, the parquet-layout form that
    needs a staged write + dead-partition sweep): retained rows of every
    pruned tier are staged as new data files, then a single commit swaps
    them in for the tiers' old files. A crash anywhere before the commit
    leaves the table byte-identical; the pre-retention snapshot stays
    time-travelable until expired. The table must be partitioned with an
    identity spec on ``tier``. Same coverage-safety interlock as the
    parquet form. Returns {tier: rows_retained}."""
    from tsf.retention import _keep_last, coverage_gaps

    cur = _read_current(path)
    if cur is None:
        raise LookupError(f"no table at {path}")
    snap_id = cur["snapshot_id"]
    if not force:
        n_gaps = coverage_gaps(scan(spark, path, snapshot_id=snap_id),
                               policy).count()
        if n_gaps:
            raise ValueError(
                f"unsafe retention policy: {n_gaps} windows would be "
                f"dropped with no coarser-tier coverage (force=True to "
                f"override)")
    pruned = sorted(t for t, k in policy.items() if k is not None)
    tiers = {str(t) for t in pruned}
    # file set the staged rewrite is derived from, per pruned tier —
    # validated at commit time so a concurrent append/overwrite into a
    # pruned tier fails the commit instead of being silently dropped
    # (same rewrite-conflict rule merge_into/compact enforce via
    # require_removed)
    recorded = {f["path"] for f in snapshot_files(path, cur)
                if f["partition"].get("tier") in tiers}
    new_files: list[dict] = []
    out: dict[int, int] = {}
    for t in pruned:
        kept = _keep_last(scan(spark, path, where=[("tier", "==", t)],
                               snapshot_id=snap_id), policy[t])
        entries = _write_data_files(kept, path, cur["partition_spec"],
                                    bloom=_bloom_conf(cur))
        out[t] = sum(e["rows"] for e in entries)
        new_files += entries

    def _validate(now_cur):
        live = {f["path"]
                for f in (snapshot_files(path, now_cur) if now_cur else [])
                if f["partition"].get("tier") in tiers}
        if live != recorded:
            raise CommitConflict(
                f"concurrent update changed the pruned tiers' file set "
                f"({len(live - recorded)} added, "
                f"{len(recorded - live)} removed) since the retention "
                f"scan; re-run apply_retention")

    _commit(path, "retention", new_files,
            remove_pred=lambda f: f["partition"].get("tier") in tiers,
            validate=_validate)
    return out
