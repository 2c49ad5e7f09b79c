"""Same-session A/B of the pair-refine boundary: mapInPandas (old) vs
mapInArrow (new) on the IDENTICAL salted-path candidate frame, walls
interleaved A,B,A,B,... (guide §1: isolate the one thing you change)."""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import bench  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pyshp_spark.kernels.rings import pip_pairs, rings_to_edges  # noqa: E402
from pyshp_spark.kernels.wkb import wkb_rings  # noqa: E402
from pyshp_spark.operators import spatial as sp  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("ROUNDS", "4"))

spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
em.q_pip_skew(spark, "/root/testdata/sf0.001").count()  # warm up

pts = em._pts_skewed(spark, SF)
dia = em._diamond_wkb(em._diamonds(spark, SF))
out = sp.point_in_polygon_join(
    pts, dia, x="x", y="y", grid=em.ENTRY_GRID, polygon_cols=["oid"],
    broadcast_polygons=False, salt_k=8,
)
# `out` is refine(cand); rebuild cand by re-running the operator
# internals up to the refine input is brittle — instead grab the refine
# child from the current implementation by re-deriving cand exactly as
# point_in_polygon_join does (copy of its tail, wkb attached):
from pyspark.sql.window import Window  # noqa: E402

from pyshp_spark.functions.bbox import point_in_bbox_expr  # noqa: E402

pcols, gcols = ["point_id", "x", "y"], ["oid"]
build_src = dia.select(*sp.POLYGON_META_COLS, *gcols)
probe = sp._points_with_cell(pts.select(*pcols), "x", "y", em.ENTRY_GRID, 8)
dup_w = Window.partitionBy("wkb", *gcols).orderBy(F.lit(1))
keyed = (
    build_src.withColumn(sp._P + "dup", F.row_number().over(dup_w))
    .withColumn(sp._P + "pid", F.xxhash64("wkb", *gcols, sp._P + "dup"))
    .withColumn(sp._P + "pid2", F.hash("wkb", *gcols, sp._P + "dup"))
    .drop(sp._P + "dup")
    .persist()
)
pid_keys = [sp._P + "pid", sp._P + "pid2"]
build = sp._polygons_with_cells(keyed.drop("wkb"), em.ENTRY_GRID, 8)
cand = probe.join(build, on=[sp._P + "cell", sp._P + "salt"], how="inner").where(
    point_in_bbox_expr(
        F.col("x"), F.col("y"),
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
    )
).select(*pcols, *gcols, *pid_keys)
cand = cand.join(
    keyed.select(*pid_keys, "wkb"), on=pid_keys, how="inner"
).select(*pcols, *gcols, "wkb")


def refine_pandas(df, x, y, drop_cols):
    from pyspark.sql.types import StructType  # noqa: PLC0415

    out_fields = [
        f for f in df.schema.fields
        if f.name != "wkb" and f.name not in drop_cols
    ]
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def refine(batches):
        edge_cache = {}
        for pdf in batches:
            pdf = pdf[pdf["wkb"].notna()]
            if len(pdf) == 0:
                yield pdf[out_cols]
                continue
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            codes, uniques = pd.factorize(pdf["wkb"])
            edges = []
            for w in uniques:
                b = bytes(w)
                e = edge_cache.get(b)
                if e is None:
                    e = rings_to_edges(wkb_rings(b))
                    edge_cache[b] = e
                edges.append(e)
            keep = pip_pairs(edges, codes, px, py)
            yield pdf.loc[keep, out_cols]

    return df.mapInPandas(refine, schema=out_schema)


drop = {"x", "y"}
variants = {
    "pandas": lambda: refine_pandas(cand, "x", "y", drop).select("point_id", "oid"),
    "arrow": lambda: sp._refine_pip(cand, "x", "y", drop_cols=drop).select(
        "point_id", "oid"
    ),
}
walls = {k: [] for k in variants}
rows = {}
for r in range(ROUNDS):
    for name, mk in variants.items():
        spark.sparkContext.setJobDescription(f"refine-{name} r{r}")
        t0 = time.time()
        rows[name] = mk().count()
        walls[name].append(round(time.time() - t0, 3))
        print(json.dumps({name: walls[name][-1]}), flush=True)
print(json.dumps({"walls": walls, "rows": rows, "sf": SF}))
spark.stop()
