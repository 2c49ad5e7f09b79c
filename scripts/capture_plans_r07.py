"""Capture .explain("formatted") for round-7 optimization targets into
plans/r07/<query>_{before,after}.txt.

Usage: python scripts/capture_plans_r07.py before|after [q1,q2,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as em  # noqa: E402

DEFAULT = [
    "q1_pip_join", "q2_tile_assign", "q3_knn", "q4_spatial_anti",
    "q6_token_jaccard", "q10_minhash_pairs", "q11_embedding_dedup",
    "q12_pip_skew", "q19_zonal_stats", "q20_poly_contains",
    "q21_hole_assign",
]


def main():
    tag = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    import bench  # noqa: PLC0415

    wl = bench.workload_map()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r07",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = wl[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(fmt(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
