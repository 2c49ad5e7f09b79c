"""Ingest head-to-head: our parser vs the reference reader on the SAME
bytes, single core, best-of-N (BENCH.md "vs reference baseline" table).

Usage: python scripts/bench_ingest.py [repeats]
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyshp_spark.fixtures.polygons import fixture_shapefile_bytes  # noqa: E402
from pyshp_spark.sources.shapefile import shapefile_to_pandas  # noqa: E402

sys.path.insert(0, "/root/reference/src")
import shapefile as ref  # noqa: E402


def time_ours(shp, dbf, repeats):
    best = float("inf")
    n = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        df = shapefile_to_pandas(shp, dbf)
        best = min(best, time.perf_counter() - t0)
        n = len(df)
    return n, best


def time_ref(shp, shx, dbf, repeats):
    best = float("inf")
    n = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = ref.Reader(shp=io.BytesIO(shp), shx=io.BytesIO(shx), dbf=io.BytesIO(dbf))
        n = sum(1 for _ in r.iterShapeRecords())
        best = min(best, time.perf_counter() - t0)
    return n, best


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for scale, n_fix in (("blockgroups-scale", 663), ("merge-scale", 6630)):
        shp, shx, dbf = fixture_shapefile_bytes(n=n_fix, seed=42)
        n1, t1 = time_ours(shp, dbf, repeats)
        n2, t2 = time_ref(shp, shx, dbf, repeats)
        assert n1 == n2 == n_fix, (n1, n2, n_fix)
        print(
            f"{scale}: ours {n1 / t1:,.0f} rec/s ({t1 * 1e3:.1f} ms)  "
            f"reference {n2 / t2:,.0f} rec/s ({t2 * 1e3:.1f} ms)  "
            f"ratio {(n1 / t1) / (n2 / t2):.2f}x"
        )


if __name__ == "__main__":
    main()
