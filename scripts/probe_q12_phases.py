"""Phase decomposition for q12_pip_skew (guide §1): time, in ONE
session, (a) the salted SMJ candidate stage alone (bbox filter, no
refine, no wkb attach), (b) candidates + wkb attach, (c) the full query
(attach + Arrow refine).  Each phase repeats N times, min reported —
the deltas attribute the wall between shuffle/join work and the Python
boundary."""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from pyshp_spark.functions.bbox import point_in_bbox_expr  # noqa: E402
from pyshp_spark.operators import spatial as sp  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("REPEATS", "3"))


def salted_cand(points, polygons, x, y, grid, pcols, gcols, salt_k,
                attach_wkb: bool):
    build_src = polygons.select(*sp.POLYGON_META_COLS, *gcols)
    probe = sp._points_with_cell(points.select(*pcols), x, y, grid, salt_k)
    join_keys = [sp._P + "cell", sp._P + "salt"]
    dup_w = Window.partitionBy("wkb", *gcols).orderBy(F.lit(1))
    keyed = (
        build_src.withColumn(sp._P + "dup", F.row_number().over(dup_w))
        .withColumn(sp._P + "pid", F.xxhash64("wkb", *gcols, sp._P + "dup"))
        .withColumn(sp._P + "pid2", F.hash("wkb", *gcols, sp._P + "dup"))
        .drop(sp._P + "dup")
    )
    pid_keys = [sp._P + "pid", sp._P + "pid2"]
    build = sp._polygons_with_cells(keyed.drop("wkb"), grid, salt_k)
    cand = probe.join(build, on=join_keys, how="inner").where(
        point_in_bbox_expr(
            F.col(x), F.col(y),
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
        )
    ).select(*pcols, *gcols, *pid_keys)
    if attach_wkb:
        cand = cand.join(
            keyed.select(*pid_keys, "wkb"), on=pid_keys, how="inner"
        ).select(*pcols, *gcols, "wkb")
    return cand


def timeit(label, mk):
    walls = []
    for r in range(REPEATS):
        spark.sparkContext.setJobDescription(f"{label} rep{r}")
        t0 = time.time()
        n = mk().count()
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({label: {"min": min(walls), "walls": walls, "rows": n}}),
          flush=True)


spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
em.q_pip_skew(spark, "/root/testdata/sf0.001").count()  # warm up

pts = em._pts_skewed(spark, SF)
dia = em._diamond_wkb(em._diamonds(spark, SF))
pcols = ["point_id", "x", "y"]
gcols = ["oid"]

timeit("a_cand_only", lambda: salted_cand(
    pts, dia, "x", "y", em.ENTRY_GRID, pcols, gcols, 8, attach_wkb=False))
timeit("b_cand_wkb", lambda: salted_cand(
    pts, dia, "x", "y", em.ENTRY_GRID, pcols, gcols, 8, attach_wkb=True))
timeit("c_full", lambda: em.q_pip_skew(spark, SF))
timeit("d_distinct_coords", lambda: pts.select("x", "y").distinct())
spark.stop()
