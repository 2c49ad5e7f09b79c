"""Spatial join operators: filter -> refine, all DataFrame-native.

The reference's only spatial machinery is a per-record bbox test and a
scalar ray-cast (reference src/shapefile.py:856-914); joins over it
would be O(N*M) single-threaded loops.  Here the same kernels become a
three-stage distributed plan:

  1. FILTER  — equi-join on int64 grid cells (polygon side carries an
     exploded bbox cell cover, point side one cell).  Catalyst picks
     broadcast-hash when the polygon side is small (we hint it), else
     sort-merge with AQE skew splitting; optional salting spreads hot
     cells explicitly.
  2. PREFILTER — bbox overlap as a pure Column expression
     (codegen'd; reference semantics sf.py:856-861, inclusive <=).
  3. REFINE — vectorized even-odd ray-cast over Arrow batches
     (``mapInPandas``), parsing each distinct polygon WKB once per
     batch.  Bit-for-bit the reference's crossing test.

Because a point maps to exactly one cell, a (point, polygon) pair
appears at most once after the cell join — no dedup pass is needed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyshp_spark.functions.bbox import point_in_bbox_expr
from pyshp_spark.functions.cells import GRID, Grid, cell_cover_udf
from pyshp_spark.kernels.rings import pip_pairs, pip_pairs_flat, rings_to_edges, stack_edges
from pyshp_spark.kernels.wkb import wkb_rings

_P = "__ps_"  # internal column prefix

#: reserved polygon frame columns (geometry + bbox); every default
#: polygon_cols derivation excludes exactly this set — keep the three
#: join entry points and zonal_stats on ONE list so adding a reserved
#: column can never silently change an aggregation grain
POLYGON_META_COLS = ("wkb", "xmin", "ymin", "xmax", "ymax")


def _polygons_with_cells(
    polygons: DataFrame, grid: Grid, salt_k: int | None
) -> DataFrame:
    """Explode each polygon row into one row per cover cell (and salt)."""
    out = polygons.withColumn(
        _P + "cell",
        F.explode(
            cell_cover_udf(grid)(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
            )
        ),
    )
    if salt_k:
        out = out.withColumn(
            _P + "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1)))
        )
    return out


def _points_with_cell(
    points: DataFrame, x: str, y: str, grid: Grid, salt_k: int | None
) -> DataFrame:
    out = points.withColumn(_P + "cell", grid.cell_expr(F.col(x), F.col(y)))
    if salt_k:
        out = out.withColumn(
            _P + "salt",
            F.pmod(F.hash(F.col(x), F.col(y)), F.lit(salt_k)).cast("int"),
        )
    return out


def _refine_pip(df: DataFrame, x: str, y: str, keep_wkb: bool = False) -> DataFrame:
    """Arrow-batched even-odd ray-cast refine on candidate pairs.

    Expects columns ``wkb`` (polygon) and point coords; parses each
    distinct WKB once per batch and tests all its candidate points in
    one vectorized call.
    """
    out_fields = [f for f in df.schema.fields if keep_wkb or f.name != "wkb"]
    from pyspark.sql.types import StructType  # noqa: PLC0415

    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edge_cache: dict[bytes, np.ndarray] = {}
        for pdf in batches:
            # a null wkb would factorize to code -1 and negatively index
            # the edge arrays (silently testing the wrong polygon)
            pdf = pdf[pdf["wkb"].notna()]
            if len(pdf) == 0:
                yield pdf[out_cols]
                continue
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            # factorize distinct polygons once per batch (C-speed), parse
            # each distinct WKB once (cached across batches), then run
            # the fully vectorized pair kernel — no per-polygon loop
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


def _resolve_broadcast(
    polygons: DataFrame,
    broadcast_polygons,
    max_broadcast_rows: int,
    max_broadcast_bytes: int = 1_500_000_000,
) -> bool:
    """"auto" probes the build side with a LIMIT-bounded count (scans at
    most max_broadcast_rows+1 rows, so cheap even on a huge table) and
    falls back to the shuffle path when it is too big to broadcast.

    The guard is byte-aware, not just row-count-aware: a few million
    rows of small diamonds broadcast fine, but the same row count of
    large multipart WKB would OOM the driver toPandas.  Once the row
    probe passes (n is bounded), build-side bytes are measured EXACTLY
    with one sum(length(wkb)) scan — a LIMIT-based estimate can miss
    large rows sitting past the probed prefix, and this scan is cheap
    next to the broadcast collect that would follow anyway."""
    if broadcast_polygons != "auto":
        return bool(broadcast_polygons)
    n = polygons.limit(max_broadcast_rows + 1).count()
    if n > max_broadcast_rows:
        return False
    if n and "wkb" in polygons.columns:
        total_wkb = (
            polygons.select(F.length("wkb").alias("__l"))
            .agg(F.sum("__l"))
            .first()[0]
        ) or 0
        # 96 B/row slack for the bbox doubles + id attrs + pandas overhead
        if total_wkb + n * 96.0 > max_broadcast_bytes:
            return False
    return True


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    x: str = "x",
    y: str = "y",
    grid: Grid = GRID,
    broadcast_polygons: bool | str = "auto",
    salt_k: int | None = None,
    point_cols: list[str] | None = None,
    polygon_cols: list[str] | None = None,
    max_broadcast_rows: int = 4_000_000,
    max_broadcast_bytes: int = 1_500_000_000,
) -> DataFrame:
    """Inner join: each point row paired with every polygon containing it.

    ``polygons`` needs columns (wkb, xmin, ymin, xmax, ymax, ...).
    Containment semantics = even-odd ray-cast over all rings, matching
    the reference's organized exterior-minus-holes membership.

    Scale notes: the broadcast path is for dimension-sized polygon
    sets — geometries are parsed ONCE on the driver and shipped to
    executors as a broadcast variable of edge arrays, so the cell
    equi-join carries only a dense int polygon id (no WKB bytes ever
    cross Arrow on the fact side) and the probe side never shuffles.
    ``broadcast_polygons="auto"`` (default) probes the build-side size
    and picks broadcast vs sort-merge automatically; pass True/False to
    force, and optionally ``salt_k`` to pre-split hot cells on the
    shuffle path.
    """
    pcols = point_cols or [c for c in points.columns]
    gcols = polygon_cols or [
        c for c in polygons.columns if c not in POLYGON_META_COLS
    ]
    if not salt_k:
        if _resolve_broadcast(
            polygons, broadcast_polygons, max_broadcast_rows, max_broadcast_bytes
        ):
            return _pip_join_broadcast(points, polygons, x, y, grid, pcols, gcols)
        broadcast_polygons = False  # probe said too big: sort-merge path
    else:
        # salted path: the probe only decides the broadcast HINT on the
        # exploded build side
        broadcast_polygons = _resolve_broadcast(
            polygons, broadcast_polygons, max_broadcast_rows, max_broadcast_bytes
        )
    build_src = polygons.select(*POLYGON_META_COLS, *gcols)
    probe = _points_with_cell(points.select(*pcols), x, y, grid, salt_k)
    join_keys = [_P + "cell"] + ([_P + "salt"] if salt_k else [])
    if broadcast_polygons:
        build = F.broadcast(_polygons_with_cells(build_src, grid, salt_k))
        cand = probe.join(build, on=join_keys, how="inner").where(
            point_in_bbox_expr(
                F.col(x), F.col(y),
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            )
        ).select(*pcols, *gcols, "wkb")
        return _refine_pip(cand, x, y)

    # shuffle path: the exploded build side replicates each polygon row
    # x cover-cells x salt_k through the exchange — so ship only
    # (pid, bbox, attrs), never the WKB.  The geometry re-attaches to
    # the (much smaller) bbox-prefiltered candidate set with a plain
    # equi-join on the dense pid: unique key, so no skew, and AQE
    # broadcasts the dimension side when it fits.  The pid comes from
    # monotonically_increasing_id over an eagerly localCheckpoint-ed
    # frame, so both uses read the SAME materialized ids.
    keyed = build_src.withColumn(
        _P + "pid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    build = _polygons_with_cells(keyed.drop("wkb"), grid, salt_k)
    cand = probe.join(build, on=join_keys, how="inner").where(
        point_in_bbox_expr(
            F.col(x), F.col(y),
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
        )
    ).select(*pcols, *gcols, _P + "pid")
    cand = cand.join(
        keyed.select(_P + "pid", "wkb"), on=_P + "pid", how="inner"
    ).select(*pcols, *gcols, "wkb")
    return _refine_pip(cand, x, y)


_INDEX_CACHE: dict = {}
_INDEX_CACHE_MAX = 4


def clear_polygon_index_cache() -> None:
    """Drop all cached broadcast polygon indexes (call after mutating
    files underneath a path an index was built from — the cache keys on
    the query PLAN, not the data)."""
    while _INDEX_CACHE:
        _, old = _INDEX_CACHE.popitem()
        try:
            old.bc.unpersist()
        except Exception:
            pass


def _cached_polygon_index(polygons: DataFrame, grid: Grid,
                          polygon_cols: list[str] | None):
    """Session-scoped LRU over BroadcastPolygonIndex keyed by the
    polygon plan's semantic hash: repeated joins against the same
    dimension table (the steady-state workload shape) reuse the
    already-built broadcast instead of re-collecting and re-parsing.
    Evicted entries release their broadcast.  Keys are PLANS — if the
    files underneath a read path are rewritten in place, call
    :func:`clear_polygon_index_cache`."""
    try:
        key = (
            polygons.sparkSession.sparkContext.applicationId,
            polygons._jdf.queryExecution().analyzed().semanticHash(),
            grid,
            tuple(polygon_cols) if polygon_cols is not None else None,
        )
    except Exception:
        return BroadcastPolygonIndex(polygons, grid=grid, polygon_cols=polygon_cols)
    idx = _INDEX_CACHE.pop(key, None)
    if idx is None:
        idx = BroadcastPolygonIndex(polygons, grid=grid, polygon_cols=polygon_cols)
    _INDEX_CACHE[key] = idx  # re-insert = most recently used
    while len(_INDEX_CACHE) > _INDEX_CACHE_MAX:
        oldest = next(iter(_INDEX_CACHE))
        old = _INDEX_CACHE.pop(oldest)
        try:
            old.bc.unpersist()
        except Exception:
            pass
    return idx


class BroadcastPolygonIndex:
    """Build-once broadcast spatial index over a dimension-sized polygon
    set; probe many times with point DataFrames.

    The polygon side is collected once on the driver (the premise of a
    broadcast join), parsed into flat edge arrays + a CSR cell ->
    polygon-id index (a handful of numpy buffers — each Python worker
    deserializes the broadcast in ~ms), and broadcast once per session.
    Every probe is a single ``mapInPandas`` over the points doing index
    lookup, bbox prune and ray-cast refine inside the worker, emitting
    ONLY an array of matching polygon ids per point — candidate pairs
    never cross the Arrow channel (at 45M candidates that transfer, not
    the kernel, dominated a pair-row plan).  A JVM-side explode + tiny
    broadcast join reattaches polygon attribute columns.  No shuffle
    anywhere on the fact side."""

    def __init__(self, polygons: DataFrame, grid: Grid = GRID,
                 polygon_cols: list[str] | None = None):
        self.grid = grid
        self.gcols = polygon_cols if polygon_cols is not None else [
            c for c in polygons.columns
            if c not in POLYGON_META_COLS
        ]
        self._gfields = {f.name: f for f in polygons.schema.fields}
        spark = polygons.sparkSession
        self.spark = spark
        pol_pdf = polygons.select(
            *POLYGON_META_COLS, *self.gcols
        ).toPandas()
        self.pol_pdf = pol_pdf
        edges = [
            rings_to_edges(wkb_rings(bytes(w))) if w is not None else
            np.empty((0, 4), dtype=np.float64)
            for w in pol_pdf["wkb"]
        ]
        all_edges, edge_offsets = stack_edges(edges)
        bbox_arr = pol_pdf[["xmin", "ymin", "xmax", "ymax"]].to_numpy(
            dtype=np.float64
        )
        # null/NaN bboxes (NULL shapes from ingest) get an empty cover —
        # they can contain no point, and bbox_cover_np would raise on NaN
        covers = [
            np.empty(0, dtype=np.int64)
            if np.isnan(bbox_arr[pid]).any()
            else grid.bbox_cover_np(*bbox_arr[pid])
            for pid in range(len(pol_pdf))
        ]
        cover_pid = np.repeat(
            np.arange(len(pol_pdf), dtype=np.int64),
            [len(c) for c in covers],
        )
        cover_cell = (
            np.concatenate(covers) if covers else np.empty(0, dtype=np.int64)
        )
        order = np.argsort(cover_cell, kind="stable")
        sorted_cells = cover_cell[order]
        sorted_pids = cover_pid[order]
        uniq_cells, cell_starts = np.unique(sorted_cells, return_index=True)
        cell_offsets = np.concatenate([cell_starts, [len(sorted_cells)]])
        self.bc = spark.sparkContext.broadcast(
            (all_edges, edge_offsets, bbox_arr, uniq_cells, cell_offsets,
             sorted_pids)
        )
        self._gtable = None

    def gtable(self):
        from pyspark.sql.types import IntegerType, StructField, StructType  # noqa: PLC0415

        if self._gtable is None:
            gpdf = self.pol_pdf[self.gcols].copy()
            gpdf.insert(0, _P + "pid", np.arange(len(self.pol_pdf), dtype=np.int32))
            gschema = StructType(
                [StructField(_P + "pid", IntegerType())]
                + [self._gfields[g] for g in self.gcols]
            )
            self._gtable = self.spark.createDataFrame(gpdf, schema=gschema)
        return self._gtable

    def join_points(self, points: DataFrame, x: str = "x", y: str = "y",
                    point_cols: list[str] | None = None,
                    mode: str = "inner") -> DataFrame:
        """mode="inner": one output row per (point, containing polygon)
        pair, polygon attrs attached.  mode="semi"/"anti": the point
        rows inside at least one / outside every polygon — answered in
        the SAME single refine pass (the per-point match count is
        already computed), so neither costs a second scan or any
        shuffle."""
        from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType  # noqa: PLC0415

        if mode not in ("inner", "semi", "anti"):
            raise ValueError(f"unknown join mode {mode!r}")
        pcols = point_cols or list(points.columns)
        grid = self.grid
        bc = self.bc
        # the cell id is recomputed from (x, y) INSIDE the worker — it is
        # pure float math, and not shipping it saves an int64 Arrow
        # column on the fact side (the channel is the scaling bottleneck)
        probe = points.select(*pcols)
        point_fields = list(probe.schema.fields)
        if mode == "inner":
            out_schema = StructType(
                point_fields
                + [StructField(_P + "matches", ArrayType(IntegerType()))]
            )
        else:
            out_schema = StructType(point_fields)
        point_names = [f.name for f in point_fields]
        empty_i64 = np.empty(0, dtype=np.int64)

        def refine_slice(state, cells, px, py):
            """(point_idx, pid) matches for one cache-sized point slice.
            Every temporary stays ~L2-resident: on DRAM-bandwidth-bound
            hosts this is the difference between flat and near-linear
            multi-worker scaling."""
            (all_e, e_off, bboxes, idx_cells, idx_off, idx_pids) = state
            n = len(cells)
            pos = np.searchsorted(idx_cells, cells)
            pos_c = np.clip(pos, 0, max(len(idx_cells) - 1, 0))
            hit = (len(idx_cells) > 0) & (idx_cells[pos_c] == cells)
            starts = np.where(hit, idx_off[pos_c], 0)
            counts = np.where(hit, idx_off[pos_c + 1] - idx_off[pos_c], 0)
            total = int(counts.sum())
            if not total:
                return np.empty(0, np.int64), empty_i64
            point_idx = np.repeat(np.arange(n), counts)
            # flattened ranges: start_i + (0..count_i-1) per point
            head = np.concatenate([[0], np.cumsum(counts)[:-1]])
            within = np.arange(total) - np.repeat(head, counts)
            pair_pids = idx_pids[np.repeat(starts, counts) + within]
            # bbox prune (reference-inclusive semantics), then ray-cast
            bb = bboxes[pair_pids]
            tx = px[point_idx]
            ty = py[point_idx]
            m = (
                (bb[:, 0] <= tx) & (tx <= bb[:, 2])
                & (bb[:, 1] <= ty) & (ty <= bb[:, 3])
            )
            point_idx = point_idx[m]
            pair_pids = pair_pids[m]
            if len(pair_pids):
                inside = pip_pairs_flat(
                    all_e, e_off, pair_pids, px[point_idx], py[point_idx]
                )
                point_idx = point_idx[inside]
                pair_pids = pair_pids[inside]
            return point_idx, pair_pids

        SLICE = 8192

        def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            state = bc.value
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    out = pdf[point_names].copy()
                    if mode == "inner":
                        out[_P + "matches"] = []
                    yield out
                    continue
                px = pdf[x].to_numpy(dtype=np.float64)
                py = pdf[y].to_numpy(dtype=np.float64)
                cells = grid.cell_np(px, py)
                idx_parts = []
                pid_parts = []
                for s in range(0, n, SLICE):
                    pi, pp = refine_slice(
                        state, cells[s : s + SLICE], px[s : s + SLICE],
                        py[s : s + SLICE],
                    )
                    idx_parts.append(pi + s)
                    pid_parts.append(pp)
                point_idx = np.concatenate(idx_parts)
                pair_pids = np.concatenate(pid_parts)
                per_point = np.bincount(point_idx, minlength=n)
                if mode == "semi":
                    yield pdf.loc[per_point > 0, point_names]
                    continue
                if mode == "anti":
                    yield pdf.loc[per_point == 0, point_names]
                    continue
                splits = np.split(
                    pair_pids.astype(np.int32), np.cumsum(per_point)[:-1]
                )
                out = pdf[point_names].copy()
                out[_P + "matches"] = splits
                yield out[per_point > 0]

        matched = probe.mapInPandas(refine, schema=out_schema)
        if mode in ("semi", "anti"):
            return matched
        exploded = matched.select(
            *point_names, F.explode(_P + "matches").alias(_P + "pid")
        )
        if not self.gcols:
            return exploded.drop(_P + "pid")
        return (
            exploded.join(F.broadcast(self.gtable()), on=_P + "pid", how="inner")
            .select(*point_names, *self.gcols)
        )


def _pip_join_broadcast(points, polygons, x, y, grid, pcols, gcols):
    return _cached_polygon_index(
        polygons, grid, gcols
    ).join_points(points, x=x, y=y, point_cols=pcols)


def spatial_semi_join(
    points, polygons, x="x", y="y", grid=GRID,
    broadcast_polygons: bool | str = "auto", salt_k: int | None = None,
    max_broadcast_rows: int = 4_000_000,
    max_broadcast_bytes: int = 1_500_000_000, **kw,
) -> DataFrame:
    """Rows of ``points`` that fall inside at least one polygon.

    Row-level semantics on BOTH paths: every input row inside some
    polygon appears exactly once (duplicate input rows preserved).  The
    broadcast path answers from the SAME single refine pass as the
    inner join (per-point match counts are a by-product) — no pair
    explosion, no dedup shuffle.  The sort-merge fallback left_semi
    joins the points against the distinct matched point-values with
    null-safe equality (a row carrying a NULL in a non-coordinate
    column must still match its own matched tuple), which also
    preserves left multiplicity."""
    pcols = points.columns
    if not salt_k and _resolve_broadcast(
        polygons, broadcast_polygons, max_broadcast_rows, max_broadcast_bytes
    ):
        return _cached_polygon_index(polygons, grid, []).join_points(
            points, x=x, y=y, mode="semi"
        )
    matched = point_in_polygon_join(
        points, polygons, x=x, y=y, grid=grid, polygon_cols=[],
        broadcast_polygons=False, salt_k=salt_k, **kw
    )
    matched_vals = matched.select(*pcols).dropDuplicates(pcols)
    return points.join(
        matched_vals, on=_null_safe_cond(points, matched_vals, pcols),
        how="left_semi",
    )


def _null_safe_cond(left: DataFrame, right: DataFrame, cols: list[str]) -> Column:
    """Null-safe (<=>) equality over ``cols`` — plain column equality
    silently drops rows with a NULL in ANY joined column, diverging
    from dropDuplicates' group-by semantics (which treat NULLs equal)."""
    cond = left[cols[0]].eqNullSafe(right[cols[0]])
    for c in cols[1:]:
        cond = cond & left[c].eqNullSafe(right[c])
    return cond


def spatial_anti_join(
    points, polygons, x="x", y="y", grid=GRID,
    broadcast_polygons: bool | str = "auto", salt_k: int | None = None,
    max_broadcast_rows: int = 4_000_000,
    max_broadcast_bytes: int = 1_500_000_000, **kw,
) -> DataFrame:
    """Rows of ``points`` outside every polygon.

    Row-level semantics on BOTH paths (duplicate input rows preserved).
    Broadcast path: emitted directly from the single refine pass
    (``per_point == 0`` rows) — one scan, zero shuffles, no second PIP
    pipeline.  Sort-merge fallback: left_anti against the distinct
    matched point-values with null-safe equality (plain equality would
    wrongly KEEP a matched row whose non-coordinate column is NULL)."""
    pcols = points.columns
    if not salt_k and _resolve_broadcast(
        polygons, broadcast_polygons, max_broadcast_rows, max_broadcast_bytes
    ):
        return _cached_polygon_index(polygons, grid, []).join_points(
            points, x=x, y=y, mode="anti"
        )
    matched = point_in_polygon_join(
        points, polygons, x=x, y=y, grid=grid, polygon_cols=[],
        broadcast_polygons=False, salt_k=salt_k, **kw
    )
    matched_vals = matched.select(*pcols).dropDuplicates(pcols)
    return points.join(
        matched_vals, on=_null_safe_cond(points, matched_vals, pcols),
        how="left_anti",
    )


def tile_assignment(
    tiles: DataFrame,
    polygons: DataFrame,
    grid: Grid = GRID,
    mode: str = "center",
    tx: str = "tile_x",
    ty: str = "tile_y",
    zoom: str = "zoom",
    polygon_cols: list[str] | None = None,
    **kw,
) -> DataFrame:
    """Assign raster tiles to polygons.

    mode="center": tile assigned to the polygon(s) containing its
    center point (exact ray-cast semantics).
    mode="bbox": tile assigned to every polygon whose bbox overlaps the
    tile's lon/lat bbox (pure Column math + cell join, no UDF refine).
    """
    from pyshp_spark.functions.cells import tile_to_lonlat_cols  # noqa: PLC0415

    if mode == "center":
        lon, lat = tile_to_lonlat_cols(
            F.col(tx), F.col(ty), F.col(zoom), fx=F.lit(0.5), fy=F.lit(0.5)
        )
        pts = tiles.withColumn("__cx", lon).withColumn("__cy", lat)
        out = point_in_polygon_join(
            pts, polygons, x="__cx", y="__cy", grid=grid,
            polygon_cols=polygon_cols, **kw
        )
        return out.drop("__cx", "__cy")
    if mode == "bbox":
        lon0, lat1 = tile_to_lonlat_cols(F.col(tx), F.col(ty), F.col(zoom))
        lon1, lat0 = tile_to_lonlat_cols(
            F.col(tx) + F.lit(1), F.col(ty) + F.lit(1), F.col(zoom)
        )
        boxed = (
            tiles.withColumn("__txmin", lon0)
            .withColumn("__tymin", lat0)
            .withColumn("__txmax", lon1)
            .withColumn("__tymax", lat1)
        )
        gcols = polygon_cols or [
            c for c in polygons.columns
            if c not in POLYGON_META_COLS
        ]
        build = _polygons_with_cells(
            polygons.select("xmin", "ymin", "xmax", "ymax", *gcols), grid, None
        )
        cover = cell_cover_udf(grid)
        probe = boxed.withColumn(
            _P + "cell",
            F.explode(
                cover(
                    F.col("__txmin"), F.col("__tymin"),
                    F.col("__txmax"), F.col("__tymax"),
                )
            ),
        )
        cand = probe.join(F.broadcast(build), on=_P + "cell").where(
            (F.col("__txmin") <= F.col("xmax"))
            & (F.col("xmin") <= F.col("__txmax"))
            & (F.col("__tymin") <= F.col("ymax"))
            & (F.col("ymin") <= F.col("__tymax"))
        )
        # responsibility cell: the pair is emitted only from the cell
        # holding the overlap rectangle's min corner (in BOTH covers by
        # construction) — dedup is a codegen'd filter, zero shuffle
        cand = cand.where(
            F.col(_P + "cell")
            == grid.cell_expr(
                F.greatest(F.col("__txmin"), F.col("xmin")),
                F.greatest(F.col("__tymin"), F.col("ymin")),
            )
        )
        out_cols = tiles.columns + gcols
        return cand.select(*out_cols)
    raise ValueError(f"unknown tile_assignment mode {mode!r}")


def bbox_overlap_join(
    rects: DataFrame,
    boxes: DataFrame,
    grid: Grid = GRID,
    rect_cols: tuple[str, str, str, str] = ("rxmin", "rymin", "rxmax", "rymax"),
    out_cols: list[str] | None = None,
    broadcast_boxes: bool = True,
) -> DataFrame:
    """Generic rectangle x bbox overlap join (raster-tile -> polygon
    assignment on a plane grid): both sides explode to cell covers,
    equi-join on cell, bbox-overlap Column prefilter (reference
    semantics, inclusive <=), dedup multi-cell matches.  ``boxes`` needs
    xmin/ymin/xmax/ymax columns; no UDF refine (bbox semantics are the
    contract)."""
    rxmin, rymin, rxmax, rymax = rect_cols
    cover = cell_cover_udf(grid)
    build = boxes.withColumn(
        _P + "cell",
        F.explode(cover(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))),
    )
    if broadcast_boxes:
        build = F.broadcast(build)
    probe = rects.withColumn(
        _P + "cell",
        F.explode(cover(F.col(rxmin), F.col(rymin), F.col(rxmax), F.col(rymax))),
    )
    cand = probe.join(build, on=_P + "cell").where(
        (F.col(rxmin) <= F.col("xmax"))
        & (F.col("xmin") <= F.col(rxmax))
        & (F.col(rymin) <= F.col("ymax"))
        & (F.col("ymin") <= F.col(rymax))
    )
    # responsibility-cell dedup: of all cells the two covers share, the
    # pair is emitted only from the one containing the overlap
    # rectangle's min corner — same floor() arithmetic as the covers,
    # so exactly one join row survives; replaces a full-output
    # dropDuplicates shuffle with a codegen'd filter
    cand = cand.where(
        F.col(_P + "cell")
        == grid.cell_expr(
            F.greatest(F.col(rxmin), F.col("xmin")),
            F.greatest(F.col(rymin), F.col("ymin")),
        )
    )
    cols = out_cols or [c for c in rects.columns + boxes.columns if c != _P + "cell"]
    return cand.select(*cols)


# ------------------------------------------------------------------ kNN ----


def knn_brute(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    qx: str = "x",
    qy: str = "y",
    tx: str = "x",
    ty: str = "y",
    query_id: str = "query_id",
    target_cols: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Exact kNN by cross join + per-query window top-k.  The baseline
    (and the oracle-parity path); use :func:`knn_join` at scale.
    Distance column ``dist2`` is squared Euclidean (no sqrt -> exact
    float parity with SQL oracles)."""
    tcols = target_cols or [c for c in targets.columns]
    t = targets.select(*[F.col(c).alias("__t_" + c) for c in tcols])
    joined = queries.crossJoin(F.broadcast(t)).withColumn(
        "dist2",
        (F.col(qx) - F.col("__t_" + tx)) * (F.col(qx) - F.col("__t_" + tx))
        + (F.col(qy) - F.col("__t_" + ty)) * (F.col(qy) - F.col("__t_" + ty)),
    )
    order = [F.col("dist2")] + (
        [F.col("__t_" + tie_break)] if tie_break else []
    )
    w = Window.partitionBy(query_id).orderBy(*order)
    out = (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )
    renames = [F.col("__t_" + c).alias(c if c not in queries.columns else "t_" + c)
               for c in tcols]
    return out.select(*queries.columns, *renames, "dist2", "knn_rank")


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    grid: Grid = GRID,
    qx: str = "x",
    qy: str = "y",
    tx: str = "x",
    ty: str = "y",
    query_id: str = "query_id",
    target_cols: list[str] | None = None,
    tie_break: str | None = None,
    max_rounds: int = 6,
    brute_threshold: int | None = None,
) -> DataFrame:
    """Exact kNN via expanding cell-neighborhood search.

    Round r joins unresolved queries against targets within Chebyshev
    cell radius 2^r, keeps per-query top-k, and declares a query
    resolved when its k-th candidate distance is <= the guaranteed
    covered distance radius*min(dx,dy) (any nearer target must lie in
    an already-searched cell).  Unresolved queries escalate; the final
    round falls back to brute force for the (few) stragglers.  Driver
    only orchestrates rounds — all data work is joins + windows.

    ``brute_threshold`` is opt-in: when set, a target set at or below
    that many rows skips the rounds and runs the broadcast brute path
    (identical output).  The default (None) never runs the extra
    count() job — callers who know the target side is dimension-sized
    should call :func:`knn_brute` directly.

    Note: candidate accumulation dedups on (query_id, all target
    columns); target rows must be distinct on ``target_cols`` (pass an
    id column) or duplicate targets will collapse.
    """
    tcols = target_cols or [c for c in targets.columns]
    if brute_threshold is not None and targets.count() <= brute_threshold:
        return knn_brute(
            queries, targets, k, qx=qx, qy=qy, tx=tx, ty=ty,
            query_id=query_id, target_cols=tcols, tie_break=tie_break,
        )
    tgt = targets.withColumn(_P + "tcell", grid.cell_expr(F.col(tx), F.col(ty)))
    tgt = tgt.select(
        _P + "tcell", *[F.col(c).alias("__t_" + c) for c in tcols]
    ).cache()
    cached = [tgt]
    remaining = queries
    results = []
    for r in range(max_rounds):
        radius = 2**r
        if remaining.isEmpty():
            break
        # explode each query into its neighborhood cells at this radius
        q = remaining.withColumn(
            _P + "qcol", grid.col_expr(F.col(qx))
        ).withColumn(_P + "qrow", grid.row_expr(F.col(qy)))
        q = q.withColumn(
            _P + "dc", F.explode(F.sequence(F.lit(-radius), F.lit(radius)))
        ).withColumn(
            _P + "dr", F.explode(F.sequence(F.lit(-radius), F.lit(radius)))
        )
        if r > 0:
            # only the new ring (cells not covered by the previous radius)
            prev = 2 ** (r - 1)
            q = q.where(
                (F.abs(F.col(_P + "dc")) > prev) | (F.abs(F.col(_P + "dr")) > prev)
            )
        q = q.withColumn(
            _P + "tcell",
            (F.col(_P + "qcol") + F.col(_P + "dc"))
            + (F.col(_P + "qrow") + F.col(_P + "dr")) * F.lit(grid.width),
        )
        cand = q.join(tgt, on=_P + "tcell", how="inner").withColumn(
            "dist2",
            (F.col(qx) - F.col("__t_" + tx)) * (F.col(qx) - F.col("__t_" + tx))
            + (F.col(qy) - F.col("__t_" + ty)) * (F.col(qy) - F.col("__t_" + ty)),
        )
        cand = cand.drop(
            _P + "tcell", _P + "qcol", _P + "qrow", _P + "dc", _P + "dr"
        ).persist()
        cached.append(cand)
        results.append(cand)
        # resolved = queries whose k-th nearest candidate so far is provably
        # inside the searched radius
        acc = _union_all(results)
        safe_dist = (radius * min(grid.dx, grid.dy)) ** 2
        w = Window.partitionBy(query_id).orderBy("dist2")
        kth = (
            acc.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == k)
            .where(F.col("dist2") <= F.lit(safe_dist))
            .select(query_id)
        )
        remaining = remaining.join(kth, on=query_id, how="left_anti")

    if not remaining.isEmpty():
        # straggler fallback: queries still unresolved after max_rounds
        # (empty regions / degenerate grids) scan the whole target set.
        # Broadcast only when the target side passes the row guard —
        # hinting a broadcast of an unbounded table would OOM the
        # driver; past the guard Spark runs a distributed cartesian
        # (expensive but bounded, and the straggler set is tiny).
        t = targets.select(*[F.col(c).alias("__t_" + c) for c in tcols])
        if _resolve_broadcast(targets, "auto", 4_000_000):
            t = F.broadcast(t)
        results.append(
            remaining.crossJoin(t).withColumn(
                "dist2",
                (F.col(qx) - F.col("__t_" + tx)) * (F.col(qx) - F.col("__t_" + tx))
                + (F.col(qy) - F.col("__t_" + ty)) * (F.col(qy) - F.col("__t_" + ty)),
            )
        )
    if not results:
        # empty query set: the brute plan yields the correctly-shaped
        # empty result without touching the round machinery
        for df in cached:
            df.unpersist()
        return knn_brute(
            queries, targets, k, qx=qx, qy=qy, tx=tx, ty=ty,
            query_id=query_id, target_cols=tcols, tie_break=tie_break,
        )
    # dedup accumulated candidates on the FULL target tuple — deduping
    # on the first target column alone would collapse distinct targets
    # sharing that value and silently drop true nearest neighbors
    dedup_keys = [query_id] + ["__t_" + c for c in tcols]
    acc = _union_all(results).dropDuplicates(dedup_keys)
    order = [F.col("dist2")] + ([F.col("__t_" + tie_break)] if tie_break else [])
    w = Window.partitionBy(query_id).orderBy(*order)
    out = acc.withColumn("knn_rank", F.row_number().over(w)).where(
        F.col("knn_rank") <= k
    )
    qcols = queries.columns
    renames = [F.col("__t_" + c).alias(c if c not in qcols else "t_" + c)
               for c in tcols]
    out = out.select(*qcols, *renames, "dist2", "knn_rank")
    # the per-round caches fed eager orchestration (isEmpty/left_anti);
    # materialize the (small, <= queries*k-ish) result so they can be
    # released instead of leaking executor memory across calls
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def tile_pyramid(
    tiles: DataFrame,
    tx: str = "tile_x",
    ty: str = "tile_y",
    zoom_max: int = 6,
    zoom_min: int = 0,
    keys: list[str] | None = None,
) -> DataFrame:
    """Quadtree tile-pyramid rollup: per-tile row counts at every zoom
    from ``zoom_max`` down to ``zoom_min``, computed as a CASCADE —
    the input is scanned ONCE at the native zoom, and every coarser
    zoom re-aggregates the previous level's (4x smaller) output via
    the parent transform ``(tx div 2, ty div 2)``.  The 2-D analogue
    of temporal.rollup_counts: quadtree parents nest exactly, so the
    cascade equals aggregating the raw table at every level.

    Output: (zoom, tx, ty, *keys, n).  This is the tile-serving /
    density-map shape for a 10^12-image corpus georeferenced by tile
    (BASELINE north star): one corpus-sized shuffle at zoom_max, then
    each level shuffles only the previous level's tile counts
    (<= 4^zoom rows), never the corpus.
    """
    if zoom_min > zoom_max:
        raise ValueError("zoom_min must be <= zoom_max")
    keys = keys or []
    cur = (
        tiles.groupBy(
            F.col(tx).cast("long").alias("tx"),
            F.col(ty).cast("long").alias("ty"),
            *keys,
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = cur.withColumn("zoom", F.lit(zoom_max).cast("int"))
    for z in range(zoom_max - 1, zoom_min - 1, -1):
        cur = (
            cur.select(
                F.expr("tx div 2").alias("tx"),
                F.expr("ty div 2").alias("ty"),
                *keys,
                "n",
            )
            .groupBy("tx", "ty", *keys)
            .agg(F.sum("n").alias("n"))
        )
        out = out.unionByName(cur.withColumn("zoom", F.lit(z).cast("int")))
    return out.select("zoom", "tx", "ty", *keys, "n")


def tile_pyramid_sql(
    table: str,
    tx: str = "tile_x",
    ty: str = "tile_y",
    zoom_max: int = 6,
    zoom_min: int = 0,
    keys: list[str] | None = None,
) -> str:
    """DuckDB mirror of :func:`tile_pyramid`: each zoom aggregated
    directly from the raw table (exactly equal to the cascade because
    quadtree parents nest)."""
    keys = keys or []
    ks = "".join(f", {k}" for k in keys)
    kg = "".join(f", {k}" for k in keys)
    parts = []
    for z in range(zoom_max, zoom_min - 1, -1):
        d = 2 ** (zoom_max - z)
        parts.append(f"""
            SELECT CAST({z} AS INTEGER) AS zoom,
                   CAST({tx} AS BIGINT) // {d} AS tx,
                   CAST({ty} AS BIGINT) // {d} AS ty{ks},
                   CAST(count(*) AS BIGINT) AS n
            FROM {table} GROUP BY 1, 2, 3{kg}
        """)
    return " UNION ALL ".join(parts)


def zonal_stats(
    points: DataFrame,
    polygons: DataFrame,
    value_cols: list[str],
    x: str = "x",
    y: str = "y",
    grid: Grid = GRID,
    polygon_cols: list[str] | None = None,
    **join_kwargs,
) -> DataFrame:
    """Zonal statistics: per-polygon aggregates of point-carried values
    (count, sum, min, max, avg per value column) — the raster→vector
    reduction of a tile-georeferenced image corpus (e.g. mean decoded
    brightness or caption length per admin polygon).

    Plan shape = the PIP join's (broadcast-index / salted sort-merge,
    chosen by the same auto logic) followed by ONE hash aggregation on
    the polygon key with map-side partial aggs — the join output never
    materializes anywhere, Catalyst pipelines refine straight into the
    partial agg.  Output: (*polygon_cols, n_points, <c>_sum, <c>_min,
    <c>_max, <c>_avg per value column).
    """
    gcols = polygon_cols or [
        c
        for c in polygons.columns
        if c not in POLYGON_META_COLS
    ]
    joined = point_in_polygon_join(
        points,
        polygons,
        x=x,
        y=y,
        grid=grid,
        point_cols=[x, y, *value_cols],
        polygon_cols=gcols,
        **join_kwargs,
    )
    aggs = [F.count(F.lit(1)).alias("n_points")]
    for c in value_cols:
        aggs += [
            F.sum(c).alias(f"{c}_sum"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.avg(c).alias(f"{c}_avg"),
        ]
    return joined.groupBy(*gcols).agg(*aggs)
