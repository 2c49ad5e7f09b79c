"""Round-7 optimization harness (bench.py is FROZEN for measurement —
this file holds the extra instrumentation the optimization round needs):

* per-query isolation with the same session/config/methodology as
  bench.py (``--queries a,b,c``), timing ``.count()`` like the driver
  AND optionally a noop sink (guide §1.4) so the computation is timed
  with every column materialized;
* ``--repeats N`` best/median reporting;
* jobs are labelled (``setJobDescription``) so a UI/event-log read maps
  stages back to queries.

Usage:
    python bench_extra.py --queries q12_pip_skew,q3_knn --repeats 3
    python bench_extra.py --queries q1_pip_join --noop
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import bench  # noqa: E402  (reuses make_spark — identical session config)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main():
    args = sys.argv[1:]
    names = None
    repeats = 3
    use_noop = "--noop" in args
    no_warm = "--no-warmup" in args
    for i, a in enumerate(args):
        if a == "--queries":
            names = args[i + 1].split(",")
        if a == "--repeats":
            repeats = int(args[i + 1])
    spark = bench.make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    wl = bench.workload_map()
    if names is None:
        names = list(wl)
    out = {}
    for name in names:
        fn = wl[name]
        if not no_warm:
            spark.sparkContext.setJobDescription(f"warmup {name}")
            fn(spark, "/root/testdata/sf0.001").count()
        walls, rows = [], None
        for r in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            if use_noop:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                rows = -1
            else:
                rows = fn(spark, SF_DIR).count()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(_median(walls), 3),
            "min": min(walls),
            "walls": walls,
            "rows": rows,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out, "sf": SF_DIR, "cpus": CPUS, "noop": use_noop}))
    spark.stop()


if __name__ == "__main__":
    main()
