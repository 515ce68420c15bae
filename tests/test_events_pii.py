"""sessionize / asof_join / PII scrub — hand-computed fixtures + plan shape."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from tsf import events as E
from tsf import pii


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minute: int, second: int = 0, us: int = 0):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second, microseconds=us)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: events at 0, 10, 41, 42 min -> 31min idle > 1800s
        # splits a new session at 41
        Row(event_id=0, ts=_ts(0), user_id=1, event_type="view", value=1.0),
        Row(event_id=1, ts=_ts(10), user_id=1, event_type="click", value=2.0),
        Row(event_id=2, ts=_ts(41), user_id=1, event_type="view", value=3.0),
        Row(event_id=3, ts=_ts(42), user_id=1, event_type="click", value=4.0),
        # user 2: exactly-30-min gap stays ONE session (boundary is >)
        Row(event_id=4, ts=_ts(0), user_id=2, event_type="view", value=5.0),
        Row(event_id=5, ts=_ts(30), user_id=2, event_type="click", value=6.0),
        # user 3: click with NO prior view; then simultaneous views
        Row(event_id=6, ts=_ts(5), user_id=3, event_type="click", value=7.0),
        Row(event_id=7, ts=_ts(9), user_id=3, event_type="view", value=8.0),
        Row(event_id=8, ts=_ts(9), user_id=3, event_type="view", value=9.0),
        Row(event_id=9, ts=_ts(9), user_id=3, event_type="click", value=10.0),
    ]
    return spark.createDataFrame(rows)


def test_sessionize_boundaries(ev):
    got = {(r["event_id"]): r["session_no"]
           for r in E.sessionize(ev).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1,   # user 1 splits at 41min
                   4: 0, 5: 0,               # 30min gap is NOT > 1800s
                   6: 0, 7: 0, 8: 0, 9: 0}


def test_session_stats_values(ev):
    got = {(r["user_id"], r["session_no"]): r
           for r in E.session_stats(ev).collect()}
    s = got[(1, 0)]
    assert s["n_events"] == 2 and s["sum_value"] == 3.0
    assert s["duration_us"] == 10 * 60 * 1_000_000
    assert got[(1, 1)]["n_events"] == 2
    assert got[(2, 0)]["duration_us"] == 30 * 60 * 1_000_000


def test_asof_join_semantics(ev):
    clicks = ev.where("event_type = 'click'")
    views = ev.where("event_type = 'view'")
    j = E.asof_join(clicks, views, key="user_id", ts="ts",
                    right_cols=["value"], tiebreak="event_id")
    got = {r["event_id"]: (r["event_id_asof"], r["value_asof"])
           for r in j.collect()}
    assert got[1] == (0, 1.0)          # latest view at/before 10min
    assert got[3] == (2, 3.0)          # view at 41 <= click at 42
    assert got[5] == (4, 5.0)
    assert got[6] == (None, None)      # click before any view
    # simultaneous: views at 9min sort before the click at 9min
    # (inclusive <=); tie between the two views -> larger event_id wins
    assert got[9] == (8, 9.0)


def test_asof_join_null_right_value_keeps_row_atomic(spark):
    """A NULL value on the matched right row must surface as NULL, not
    fall through to an older right row's value (struct-atomic pick)."""
    left = spark.createDataFrame(
        [Row(event_id=10, ts=_ts(20), user_id=1, value=0.0)])
    right = spark.createDataFrame(
        [Row(event_id=0, ts=_ts(0), user_id=1, value=5.0),
         Row(event_id=1, ts=_ts(10), user_id=1, value=None)])
    j = E.asof_join(left, right, key="user_id", ts="ts",
                    right_cols=["value"], tiebreak="event_id").collect()[0]
    assert j["event_id_asof"] == 1 and j["value_asof"] is None


def test_asof_join_is_partitioning_invariant(ev):
    clicks = ev.where("event_type = 'click'")
    views = ev.where("event_type = 'view'")
    a = E.asof_join(clicks, views, "user_id", "ts", ["value"], "event_id")
    b = E.asof_join(clicks.repartition(7), views.repartition(3),
                    "user_id", "ts", ["value"], "event_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_session_stats_single_exchange(ev):
    """The window sort and the per-session aggregate share ONE hash
    Exchange on the key: HashPartitioning(user_id) satisfies the
    aggregate's ClusteredDistribution(user_id, session_no)."""
    df = E.session_stats(ev)
    p = _plan(df)
    assert p.count("Exchange hashpartitioning") == 1, p


def test_asof_join_has_no_join_operator(ev):
    """The as-of is union + window: no join node, no cartesian, one
    Exchange on the key."""
    clicks = ev.where("event_type = 'click'")
    views = ev.where("event_type = 'view'")
    j = E.asof_join(clicks, views, "user_id", "ts", ["value"], "event_id")
    p = _plan(j)
    assert "Join" not in p and "Cartesian" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


# ------------------------------------------------------------------ PII

def test_pii_detect_and_redact(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text="mail bob.smith+x@exa-mple.co.uk now"),
        Row(doc_id=1, text="call +1-555-0100 or +44-20-7946-0958"),
        Row(doc_id=2, text="host 10.0.255.3 and 192.168.1.1:8080"),
        Row(doc_id=3, text="clean text with at @ sign alone 1.2"),
        Row(doc_id=4, text="a@b.io x 10.1.2.3 y +1-555-123-4567"),
    ])
    out = {r["doc_id"]: r for r in pii.pii_scrub(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ipv4"]) == (1, 0, 0)
    assert out[0]["text_redacted"] == "mail <EMAIL> now"
    assert out[1]["n_phone"] == 2
    assert out[1]["text_redacted"] == "call <PHONE> or <PHONE>"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["text_redacted"] == "host <IP> and <IP>:8080"
    assert out[3]["pii_free"] and out[3]["text_redacted"] == out[3 ]["text_redacted"]
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (1, 1, 1)
    assert out[4]["text_redacted"] == "<EMAIL> x <IP> y <PHONE>"


def test_pii_ip_host_email_redacts_whole_address(spark):
    """An address with an IPv4 host must redact as ONE <EMAIL> — the
    email rule's IP-host arm; without it the IP rule eats only the host
    and the username survives as 'bob@<IP>'."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="contact bob@10.1.2.3 now"),
        Row(doc_id=1, text="bare host 10.1.2.3 stays an <IP> match"),
    ])
    out = {r["doc_id"]: r for r in pii.pii_scrub(docs).collect()}
    # counts are independent per-class passes (the embedded IP also
    # counts); REDACTION is sequential, email first, so the whole
    # address — username included — becomes one placeholder
    assert (out[0]["n_email"], out[0]["n_ipv4"]) == (1, 1)
    assert out[0]["text_redacted"] == "contact <EMAIL> now"
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (0, 1)


def test_pii_zero_exchange(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    df = pii.pii_scrub(docs)
    p = _plan(df)
    assert "Exchange" not in p, p


def test_sessionize_agrees_with_native_session_window(spark, sf001):
    """Cross-check against Spark's built-in session_window on real
    microsecond event data (no exact-gap ties, so the delta>gap vs
    delta>=gap boundary difference cannot fire): identical session
    bounds, counts and quantized sums."""
    from tsf import events as E
    ev = spark.read.parquet(f"{sf001}/events.parquet")
    ours = {(r["user_id"], r["session_start"]):
            (r["n_events"], r["session_end"], r["sum_value"])
            for r in E.session_stats(ev, gap_s=14400).collect()}
    q = F.sum(F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5))
              .cast("bigint"))
    native = (ev.groupBy("user_id",
                         F.session_window("ts", "14400 seconds").alias("sw"))
              .agg(F.count("*").alias("n"), F.min("ts").alias("lo"),
                   F.max("ts").alias("hi"),
                   (q.cast("double") / F.lit(1e4)).alias("sv")))
    theirs = {(r["user_id"], r["lo"]): (r["n"], r["hi"], r["sv"])
              for r in native.collect()}
    assert ours == theirs and len(ours) > 0


def test_stream_session_stats_matches_batch(spark, sf001, tmp_path):
    """Streaming sessionization (native session_window, availableNow)
    finalizes to exactly the batch operator's sessions."""
    from tsf import events as E, streaming
    ev = (spark.read.parquet(f"{sf001}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    evdir = str(tmp_path / "events")
    ev.write.parquet(evdir)
    stream = spark.readStream.schema(ev.schema).parquet(evdir)
    agg = streaming.stream_session_stats(stream, gap_s=14400)
    qr = (agg.writeStream.format("memory").queryName("sess_stream")
          .outputMode("complete").trigger(availableNow=True).start())
    qr.awaitTermination(120)
    got = {(r["user_id"], r["session_start"]):
           (r["n_events"], r["session_end"], r["sum_value"])
           for r in spark.sql("SELECT * FROM sess_stream").collect()}
    want = {(r["user_id"], r["session_start"].replace(tzinfo=None)):
            (r["n_events"], r["session_end"], r["sum_value"])
            for r in E.session_stats(ev, gap_s=14400).collect()}
    # memory-sink timestamps come back tz-aware; normalize before compare
    got = {(u, s.replace(tzinfo=None)): (n, e.replace(tzinfo=None), v)
           for (u, s), (n, e, v) in got.items()}
    want = {(u, s): (n, e.replace(tzinfo=None) if e.tzinfo else e, v)
            for (u, s), (n, e, v) in want.items()}
    assert got == want and len(got) > 0


# ------------------------------------------------- exact source quantiles

def test_source_quantiles_hand_fixture(spark):
    from tsf import textstats
    rows = [Row(doc_id=i, source="a", n_chars=v)
            for i, v in enumerate([10, 20, 30, 40])]
    rows += [Row(doc_id=10 + i, source="b", n_chars=v)
             for i, v in enumerate([5, 7, 9])]
    df = spark.createDataFrame(rows)
    got = {(r["source"], r["q"]): r["value"]
           for r in textstats.source_quantiles(
               df, col="n_chars", qs=(0.25, 0.5, 0.75, 1.0)).collect()}
    # type-1: value at rank ceil(q*n); a: n=4 -> ranks 1,2,3,4
    assert got == {("a", 0.25): 10.0, ("a", 0.5): 20.0,
                   ("a", 0.75): 30.0, ("a", 1.0): 40.0,
                   # b: n=3 -> ceil(.25*3)=1, ceil(.5*3)=2, ceil(.75*3)=3
                   ("b", 0.25): 5.0, ("b", 0.5): 7.0,
                   ("b", 0.75): 9.0, ("b", 1.0): 9.0}


def test_source_quantiles_single_window_pass(spark, sf001):
    """All quantiles come from ONE window pass: exactly one hash
    Exchange (the per-source sort), not one per requested q."""
    from tsf import textstats
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(textstats.source_quantiles(docs, col="n_chars"))
    assert p.count("Exchange hashpartitioning") == 1, p
    # two Window nodes (row_number sort-frame + count full-frame) share
    # that one source-keyed Exchange; a union-per-q form would have one
    # Exchange+Window PAIR per requested quantile
    assert p.count("Window") <= 2, p


def test_asof_join_tolerance(ev):
    """A match older than tolerance_s is discarded (merge_asof
    semantics): user 1's click at 42min matches the view at 41min under
    any tolerance >= 60s, but the click at 10min loses its 0min view
    under a 5-minute bound."""
    clicks = ev.where("event_type = 'click'")
    views = ev.where("event_type = 'view'")
    j = E.asof_join(clicks, views, key="user_id", ts="ts",
                    right_cols=["value"], tiebreak="event_id",
                    tolerance_s=300)
    got = {r["event_id"]: (r["event_id_asof"], r["value_asof"])
           for r in j.collect()}
    assert got[3] == (2, 3.0)          # 1min stale: kept
    assert got[1] == (None, None)      # 10min stale: discarded
    assert got[9] == (8, 9.0)          # simultaneous: zero staleness


def test_session_funnel_hand_fixture(ev):
    """user 1 session 0 (view@0 then click@10) converts; session 1
    (view@41, click@42) converts; user 3's single session has clicks
    both BEFORE and at the same ts as views — the inclusive first-view
    <= last-click rule converts it; user 2 converts (view@0, click@30)."""
    got = {(r["user_id"], r["session_no"]):
           (r["n_step_a"], r["n_step_b"], r["converted"])
           for r in E.session_funnel(ev).collect()}
    assert got[(1, 0)] == (1, 1, True)
    assert got[(1, 1)] == (1, 1, True)
    assert got[(2, 0)] == (1, 1, True)
    assert got[(3, 0)] == (2, 2, True)


def test_session_funnel_no_conversion(spark):
    """click strictly before the only view -> not converted; a session
    with no views or no clicks -> not converted."""
    rows = [Row(event_id=0, ts=_ts(0), user_id=9, event_type="click",
                value=0.0),
            Row(event_id=1, ts=_ts(1), user_id=9, event_type="view",
                value=0.0),
            Row(event_id=2, ts=_ts(0), user_id=10, event_type="view",
                value=0.0)]
    got = {r["user_id"]: r["converted"]
           for r in E.session_funnel(spark.createDataFrame(rows)).collect()}
    assert got == {9: False, 10: False}


def test_session_funnel_single_exchange(ev):
    p = _plan(E.session_funnel(ev))
    assert p.count("Exchange hashpartitioning") == 1, p


def test_asof_join_ignores_null_right_timestamps(spark):
    """A right row with NULL ts sorts NULLS-FIRST into every per-key
    frame; it must be excluded (a NULL timestamp is never at-or-before
    anything) so early left rows stay unmatched instead of matching it."""
    from tsf import events as ev
    left = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00")], "user_id int, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, None, 1, 9.0), (1, "2024-01-01 10:00:00", 2, 5.0)],
        "user_id int, ts string, event_id int, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = ev.asof_join(left, right, "user_id", "ts",
                       ["value"], tiebreak="event_id").collect()
    assert len(out) == 1
    assert out[0]["value_asof"] is None and out[0]["event_id_asof"] is None
