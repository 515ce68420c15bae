"""End-to-end spark-submit entrypoint: cascade + ledger resume + --retain."""

import pytest

from tsf.io import synth_sequences


def test_rollup_job_cascade_and_retain(spark, tmp_path):
    """The CLI path: 2-tier cascade commits through the ledger, --retain
    keeps each doc's newest k tier-0 windows, malformed --retain fails
    fast before any work."""
    import jobs.rollup_job as job

    src = str(tmp_path / "seq")
    synth_sequences(spark, 12, seed=9, longtail_max=3000).write.parquet(src)
    out, led = str(tmp_path / "out"), str(tmp_path / "led")
    job.main(["--input", src, "--output", out, "--ledger", led,
              "--tiers", "2", "--buckets", "4", "--window", "20",
              "--features", "cnt,sum_tok,min_tok,max_tok,mean,std",
              "--retain", "0:2"])
    import pandas as pd
    data = spark.read.parquet(out).toPandas()
    t0 = data[data.tier == 0]
    assert (t0.groupby("doc_id").size() <= 2).all()
    # retained windows are each doc's newest
    for doc, grp in t0.groupby("doc_id"):
        assert set(grp.window_id) == set(sorted(grp.window_id)[-len(grp):])
    assert (data.tier == 1).sum() > 0  # tier 1 untouched by the policy
    # ledger recorded both tiers
    led_df = spark.read.parquet(led).toPandas()
    assert set(led_df.tier) == {0, 1}

    with pytest.raises(SystemExit):
        job.main(["--input", src, "--output", out, "--ledger", led,
                  "--retain", "0:48,1"])


def test_rollup_job_publish(spark, tmp_path):
    """--publish lands the whole cascade as one atomic icelite snapshot;
    a second run publishes a NEW snapshot with the first still
    time-travelable."""
    from tsf import icelite
    import jobs.rollup_job as job

    src = str(tmp_path / "seq")
    synth_sequences(spark, 10, seed=3, longtail_max=2000).write.parquet(src)
    out, led = str(tmp_path / "out"), str(tmp_path / "led")
    pub = str(tmp_path / "pub")
    argv = ["--input", src, "--output", out, "--ledger", led,
            "--tiers", "2", "--buckets", "4", "--window", "20",
            "--features", "cnt,sum_tok,min_tok,max_tok,mean,std",
            "--publish", pub, "--publish-buckets", "4"]
    job.main(argv)
    import pandas as pd
    want = (spark.read.parquet(out)
            .drop("tier_p", "batch_id", "partition_id").toPandas())
    got = icelite.scan(spark, pub).toPandas()
    assert len(got) == len(want)
    cols = ["doc_id", "tier", "window_id"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True))
    # re-run: everything resumes as done, publish still commits anew
    job.main(argv)
    h = icelite.history(pub)
    assert [s["operation"] for s in h] == ["create", "replace"]
    assert h[0]["rows"] == h[1]["rows"] == len(want)
    # pruning works on the published table (tier identity partition)
    t1 = icelite.scan(spark, pub, where=[("tier", "==", 1)])
    assert 0 < t1.count() < len(want)
