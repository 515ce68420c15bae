"""Model-based property test for the snapshot layer's op algebra:
random sequences of append / overwrite_partitions / merge_into /
compact / expire_snapshots are applied to BOTH an icelite table and a
plain-pandas model; after every op the table's scan must equal the
model. Compaction and expiry must be invisible to readers; every commit
must leave the parent chain intact."""

import shutil
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401

from tsf import icelite

SPEC = [("identity", "part"), ("bucket", "doc_id", 4)]
SCHEMA = "doc_id string, part string, val double"
PARTS = ["p0", "p1", "p2"]

rows_st = st.lists(
    st.tuples(st.integers(0, 14),           # doc index
              st.sampled_from(PARTS),
              st.integers(-50, 50)),        # value
    min_size=1, max_size=6,
).map(lambda rs: [(f"d{di:02d}", p, float(v)) for di, p, v in rs])

op_st = st.one_of(
    st.tuples(st.just("append"), rows_st),
    st.tuples(st.just("overwrite"), rows_st),
    st.tuples(st.just("merge"), rows_st),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("expire"), st.just(None)),
)


def _dedupe_keys(rows):
    """One row per (doc_id, part) within a single write (the model's
    replace semantics need unambiguous keys inside one batch)."""
    seen, out = set(), []
    for r in rows:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            out.append(r)
    return out


def _model_frame(rows):
    return pd.DataFrame(rows, columns=["doc_id", "part", "val"])


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(init=rows_st, ops=st.lists(op_st, min_size=1, max_size=5))
def test_icelite_ops_match_pandas_model(spark, init, ops):
    buckets: dict = {}

    def bk(doc):
        if doc not in buckets:
            buckets[doc] = icelite.bucket_of(spark, doc, 4)
        return buckets[doc]

    init = _dedupe_keys(init)
    path = tempfile.mkdtemp(prefix="icelite_prop_")
    try:
        model = _model_frame(init)
        icelite.create(spark.createDataFrame(init, SCHEMA), path, SPEC)
        for op, rows in ops:
            if rows is not None:
                rows = _dedupe_keys(rows)
            if op == "append":
                icelite.append(spark.createDataFrame(rows, SCHEMA), path)
                model = pd.concat([model, _model_frame(rows)],
                                  ignore_index=True)
            elif op == "overwrite":
                icelite.overwrite_partitions(
                    spark.createDataFrame(rows, SCHEMA), path)
                touched = {(r[1], bk(r[0])) for r in rows}
                keep = [i for i, m in model.iterrows()
                        if (m.part, bk(m.doc_id)) not in touched]
                model = pd.concat([model.loc[keep], _model_frame(rows)],
                                  ignore_index=True)
            elif op == "merge":
                icelite.merge_into(spark,
                                   path, spark.createDataFrame(rows, SCHEMA),
                                   keys=["doc_id", "part"])
                keys = {(r[0], r[1]) for r in rows}
                model = pd.concat(
                    [model[~model.apply(
                        lambda m: (m.doc_id, m.part) in keys, axis=1)],
                     _model_frame(rows)], ignore_index=True)
            elif op == "compact":
                icelite.compact(spark, path, target_bytes=1 << 30)
            elif op == "expire":
                icelite.expire_snapshots(path, keep_last=2)
            got = (icelite.scan(spark, path).toPandas()
                   .sort_values(["doc_id", "part", "val"])
                   .reset_index(drop=True))
            want = (model.sort_values(["doc_id", "part", "val"])
                    .reset_index(drop=True))
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # history is a strict parent chain ending at CURRENT
        lin = icelite.lineage(path)
        assert lin[-1]["snapshot_id"] == icelite._read_current(
            path)["snapshot_id"]
    finally:
        shutil.rmtree(path, ignore_errors=True)
