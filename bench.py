"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.md north rule): spatial-join rows/sec for the
point-in-polygon + tile-assignment workload.  Also times kNN, dedup,
ANN and text-quality pipelines.  ``python bench.py --scaling`` runs the
PIP join at two parallelism levels (local[N] vs local[4N]) on identical
input and reports throughput + scaling efficiency (the sandbox proxy
for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cpus: int, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pyshp_spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )


def _count(df) -> int:
    return df.count()


def run_queries(spark, sf_dir: str) -> tuple[dict, dict]:
    """Returns ({query: seconds}, {query: output_rows})."""
    import __spark_entry__ as em

    workloads = {
        "q1_pip_join": em.q_pip_join,
        "q2_tile_assign": em.q_tile_assign,
        "q3_knn": em.q_knn,
        "q4_spatial_anti": em.q_spatial_anti,
        "q5_minhash_sig": em.q_minhash_sig,
        "q6_token_jaccard": em.q_token_jaccard,
        "q7_ann_cosine": em.q_ann_cosine,
        "q8_text_quality": em.q_text_quality,
        "q9_cell_count": em.q_cell_count,
    }
    times, rows = {}, {}
    for name, fn in workloads.items():
        t0 = time.time()
        rows[name] = _count(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times, rows


def input_rows(spark, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()


def main():
    t_all = time.time()
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the JVM + Arrow path once (session/codegen startup noise)
    import __spark_entry__ as em

    em.q_pip_join(spark, "/root/testdata/sf0.001").count()
    times, rows = run_queries(spark, SF_DIR)
    n_points = input_rows(spark, SF_DIR)
    total = sum(times.values())
    # headline: PIP join throughput in input points/sec
    pip_rate = n_points / times["q1_pip_join"] if times["q1_pip_join"] else 0
    result = {
        "metric": "spatial-join points/sec (PIP filter-refine, sf lineitem-derived)",
        "value": round(pip_rate, 1),
        "unit": "rows/sec",
        "queries": times,
        "output_rows": rows,
        "input_points": n_points,
        "total_sec": round(total, 3),
        "wall_sec": round(time.time() - t_all, 3),
        "cpus": CPUS,
        "sf": SF_DIR,
    }
    spark.stop()
    print(json.dumps(result))


def scaling():
    """Same PIP-join job at local[N] and local[4N]: throughput both ways
    + scaling efficiency (sandbox proxy for N vs 4N executors)."""
    import __spark_entry__ as em

    n = max(2, CPUS // 4)
    out = {}
    for cpus in (n, 4 * n):
        spark = make_spark(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        em.q_pip_join(spark, "/root/testdata/sf0.001").count()  # warm-up
        t0 = time.time()
        rows = em.q_pip_join(spark, SF_DIR).count()
        dt = time.time() - t0
        pts = input_rows(spark, SF_DIR)
        out[f"local[{cpus}]"] = {
            "sec": round(dt, 3),
            "points_per_sec": round(pts / dt, 1),
            "output_rows": rows,
        }
        spark.stop()
    lo, hi = f"local[{n}]", f"local[{4 * n}]"
    speedup = out[hi]["points_per_sec"] / out[lo]["points_per_sec"]
    out["speedup_n_to_4n"] = round(speedup, 3)
    out["scaling_efficiency"] = round(speedup / 4.0, 3)
    out["sf"] = SF_DIR
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
