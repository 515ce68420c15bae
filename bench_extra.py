"""Optimization-round measurement harness (bench.py is FROZEN for the
driver's measurement — this file is the builder's instrument, guide §1).

Times individual driver queries in isolation with the same cold
methodology as bench.py (best-of-N, persist_scope + clearCache between
reps), on the sf dir and/or the x10 scaled fixture, and can dump
`.explain("formatted")` plans to a directory (plans/r06/...). Host
gflops probes bracket every run so cross-run comparisons can be
normalized for the VM's ~2.5x throughput drift.

Usage:
  python bench_extra.py [--x10] [--reps N] [--noop] [--plans DIR] \
                        [--plan-suffix _before] [--tag NAME] query ...
  python bench_extra.py --explain-only --plans plans/r06 query ...

--noop times `df.write.format("noop")` (computes every column) instead
of bench.py's `.count()`; use it to see what the optimizer prunes under
count. Results print as one JSON line and append to BENCH/extra_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--x10", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None)
    ap.add_argument("--plan-suffix", default="")
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from tsf.caching import persist_scope
    from tsf.session import get_spark

    def host_cal():
        import numpy as np
        a = np.random.default_rng(0).standard_normal((1024, 1024))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            a @ a
            best = min(best, time.time() - t0)
        return round(2 * 1024 ** 3 / best / 1e9, 2)

    spark = get_spark("tsf-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sf = SF_DIR
    if args.x10:
        sf = str(Path(__file__).resolve().parent / ".bench_scratch"
                 / "ops_x10")
        assert Path(sf).exists(), f"{sf} missing — run bench.py once"
    gf0 = host_cal()
    out = {"tag": args.tag, "sf": sf, "gflops_pre": gf0,
           "noop": args.noop, "queries": {}}
    for name in args.queries:
        fn = qs[name]
        if args.plans:
            Path(args.plans).mkdir(parents=True, exist_ok=True)
            with persist_scope():
                df = fn(spark, sf)
                plan = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            (Path(args.plans) / f"{name}{args.plan_suffix}.txt").write_text(
                plan)
            spark.catalog.clearCache()
        if args.explain_only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best, samples = float("inf"), []
        for _ in range(args.reps):
            t0 = time.time()
            with persist_scope():
                df = fn(spark, sf)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
            spark.catalog.clearCache()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out["queries"][name] = {"best": round(best, 3), "samples": samples}
    out["gflops_post"] = host_cal()
    line = json.dumps(out)
    print(line)
    bdir = Path(__file__).resolve().parent / "BENCH"
    bdir.mkdir(exist_ok=True)
    with open(bdir / "extra_runs.jsonl", "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
