"""The ACTUAL ship path: `spark-submit --py-files dist/tsf.zip` as a
real subprocess (the in-process job.main tests cover semantics; this
covers the deployment seam the north rule names). The job script is
copied OUT of the repo so the driver can only import tsf from the zip —
the repo-root sys.path fallback points at the tmp dir and finds nothing.
"""

import shutil
import subprocess
from pathlib import Path

from tsf.io import synth_sequences

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = Path(__file__).resolve().parents[1]


def test_spark_submit_pyfiles_rollup(spark, tmp_path):
    import jobs.package as pkg

    src = str(tmp_path / "seq")
    synth_sequences(spark, 12, seed=9, longtail_max=3000).write.parquet(src)
    z = pkg.build(tmp_path / "tsf.zip")
    job = tmp_path / "rollup_job.py"
    shutil.copy(REPO / "jobs" / "rollup_job.py", job)
    out, led = str(tmp_path / "out"), str(tmp_path / "led")
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(z), str(job),
         "--input", src, "--output", out, "--ledger", led,
         "--tiers", "2", "--buckets", "4", "--window", "20",
         "--features", "cnt,sum_tok,min_tok,max_tok,mean,std"],
        capture_output=True, text=True, timeout=540, cwd=str(tmp_path))
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    # the submitted run's output equals the in-process run's, bit-exact
    import jobs.rollup_job as jobmod
    out2, led2 = str(tmp_path / "out2"), str(tmp_path / "led2")
    jobmod.main(["--input", src, "--output", out2, "--ledger", led2,
                 "--tiers", "2", "--buckets", "4", "--window", "20",
                 "--features", "cnt,sum_tok,min_tok,max_tok,mean,std"])
    a = spark.read.parquet(out).toPandas()
    b = spark.read.parquet(out2).toPandas()
    key = ["tier", "doc_id", "window_id"]
    a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
    assert a.columns.tolist() == b.columns.tolist()
    assert len(a) == len(b) > 0
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        same = (av == bv) | ((av != av) & (bv != bv))  # NaN == NaN
        assert same.all(), c
    # ledger committed every (tier, bucket)
    led_df = spark.read.parquet(led)
    assert led_df.where("tier = 0").count() == 4
