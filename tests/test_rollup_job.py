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
