"""Local replica of the driver's correctness gate: run each
__spark_entry__ query and its DuckDB oracle side by side, compare
row count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        rows = df.collect()
        cols = sorted(df.columns)
        if name not in oracles:
            print(f"{name:18s} rows-only: {len(rows)} rows, cols={cols}")
            continue
        want = con.execute(oracles[name]).fetchall()
        wcols = sorted(d[0] for d in con.execute(oracles[name]).description)
        spark_set = sorted(
            tuple(canon(r[c]) for c in cols) for r in rows
        )
        idx = [d[0] for d in con.execute(oracles[name]).description]
        duck_set = sorted(
            tuple(canon(row[idx.index(c)]) for c in wcols) for row in want
        )
        ok = (len(rows) == len(want)) and (cols == wcols) and (spark_set == duck_set)
        status = "OK " if ok else "FAIL"
        print(f"{name:18s} {status} spark={len(rows)} duck={len(want)} cols={cols==wcols}")
        if not ok:
            failures += 1
            for i, (a, b) in enumerate(zip(spark_set, duck_set)):
                if a != b:
                    print("   first diff:", a, "vs", b)
                    break
            if len(spark_set) != len(duck_set):
                sa, sb = set(spark_set), set(duck_set)
                print("   only-spark:", list(sa - sb)[:3])
                print("   only-duck :", list(sb - sa)[:3])
    spark.stop()
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
