"""Spark 4 Python Data Source for ESRI shapefiles.

The most idiomatic way to expose the ingest (SURVEY §2.1 S1/S3/S6):

    spark.dataSource.register(ShapefileDataSource)
    df = spark.read.format("shapefile").load("/data/shapes")  # dir or .shp

- one input partition per .shp file (the format's natural parallelism
  unit); executors parse bytes straight into Arrow RecordBatches;
- schema inferred once on the driver from the first file's headers;
- options: ``bbox="x0,y0,x1,y1"`` (spatial pushdown at the byte level,
  reference sf.py:1683-1687 semantics), ``fields="A,B"`` (dbf column
  projection), ``encoding=``;
- bbox-comparison FILTER PUSHDOWN: predicates on the xmin/ymin/xmax/
  ymax columns are translated into the parser's 32-byte-prefix bbox
  prune.  Filters are reported back as unhandled, so Spark re-applies
  them exactly — the pushdown is a pruning hint, never a correctness
  dependency (strict vs inclusive bounds therefore cannot diverge).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _paths(path: str) -> list[str]:
    if path.endswith(".shp"):
        return [path]
    out = sorted(glob.glob(os.path.join(path, "*.shp")))
    if not out:
        raise FileNotFoundError(f"no .shp files under {path}")
    return out


def _parse_bbox_option(s: str | None):
    if not s:
        return None
    vals = [float(v) for v in s.split(",")]
    if len(vals) != 4:
        raise ValueError("bbox option must be 'x0,y0,x1,y1'")
    return tuple(vals)


def _read_pair(shp_path: str, bbox, fields, encoding):
    from pyshp_spark.sources.shapefile import (  # noqa: PLC0415
        parse_dbf_bytes,
        parse_shp_bytes,
    )

    with open(shp_path, "rb") as f:
        shp = f.read()
    geoms = parse_shp_bytes(shp, bbox=bbox)
    dbf_path = shp_path[:-4] + ".dbf"
    if os.path.exists(dbf_path):
        with open(dbf_path, "rb") as f:
            dbf = f.read()
        attrs = parse_dbf_bytes(dbf, fields=fields, encoding=encoding)
        geoms = geoms.merge(attrs, on="oid", how="inner", sort=True)
    geoms.insert(0, "src", shp_path)
    return geoms


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ShapefileReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("shapefile data source requires a path")
        self._bbox = _parse_bbox_option(options.get("bbox"))
        f = options.get("fields")
        self._fields = [c.strip() for c in f.split(",")] if f else None
        self._encoding = options.get("encoding", "utf-8")
        self._schema = schema

    def partitions(self):
        return [_FilePartition(p) for p in _paths(self._path)]

    def read(self, partition):
        import pyarrow as pa  # noqa: PLC0415
        from pyspark.sql.pandas.types import to_arrow_schema  # noqa: PLC0415

        pdf = _read_pair(partition.path, self._bbox, self._fields, self._encoding)
        arrow_schema = to_arrow_schema(self._schema)
        # reindex (not select): a file missing the inferred dbf columns
        # (e.g. no sibling .dbf in a mixed directory) yields nulls there
        # instead of crashing the partition
        pdf = pdf.reindex(columns=[f.name for f in self._schema.fields])
        table = pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False)
        yield from table.to_batches()


class ShapefilePushdownReader(ShapefileReader):
    """Reader variant with bbox filter pushdown — only handed out when
    spark.sql.python.filterPushdown.enabled is true (Spark refuses any
    reader that merely DEFINES pushFilters otherwise)."""

    def pushFilters(self, filters):
        """Translate bbox-column comparisons into the byte-level bbox
        prune; every filter is returned (= not handled), so Spark still
        applies them exactly — pruning only, no correctness transfer."""
        x0, y0, x1, y1 = (
            self._bbox if self._bbox else (-float("inf"), -float("inf"),
                                           float("inf"), float("inf"))
        )
        for flt in filters:
            col = getattr(flt, "attribute", None)
            val = getattr(flt, "value", None)
            name = col[0] if col and len(col) == 1 else None
            if isinstance(flt, (GreaterThan, GreaterThanOrEqual)) and (
                name == "xmax"
            ):
                x0 = max(x0, float(val))
            elif isinstance(flt, (GreaterThan, GreaterThanOrEqual)) and (
                name == "ymax"
            ):
                y0 = max(y0, float(val))
            elif isinstance(flt, (LessThan, LessThanOrEqual)) and name == "xmin":
                x1 = min(x1, float(val))
            elif isinstance(flt, (LessThan, LessThanOrEqual)) and name == "ymin":
                y1 = min(y1, float(val))
        if any(v not in (float("inf"), -float("inf")) for v in (x0, y0, x1, y1)):
            self._bbox = (x0, y0, x1, y1)
        return filters  # Spark re-applies everything


def _pushdown_enabled() -> bool:
    try:
        from pyspark.sql import SparkSession  # noqa: PLC0415

        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        return (
            spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
            .lower()
            == "true"
        )
    except Exception:
        return False


def _wkb_to_payload(wkb: bytes):
    """WKB -> the single-node writer's shape payload (list of parts /
    point tuple / point array)."""
    import numpy as np  # noqa: PLC0415

    from pyshp_spark.kernels.wkb import (  # noqa: PLC0415
        WKB_LINESTRING,
        WKB_MULTILINESTRING,
        WKB_MULTIPOINT,
        WKB_MULTIPOLYGON,
        WKB_POINT,
        WKB_POLYGON,
        parse_wkb,
    )

    gtype, obj = parse_wkb(wkb)
    if gtype == WKB_POINT:
        a = np.asarray(obj, dtype=np.float64).reshape(-1, 2)
        return (float(a[0, 0]), float(a[0, 1]))
    if gtype == WKB_MULTIPOINT:
        return np.asarray(obj, dtype=np.float64).reshape(-1, 2)
    if gtype == WKB_LINESTRING:
        return [np.asarray(obj, dtype=np.float64).reshape(-1, 2)]
    if gtype == WKB_MULTILINESTRING:
        return [np.asarray(p, dtype=np.float64).reshape(-1, 2) for p in obj]
    if gtype == WKB_POLYGON:
        return [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in obj]
    if gtype == WKB_MULTIPOLYGON:
        return [
            np.asarray(r, dtype=np.float64).reshape(-1, 2)
            for rings in obj
            for r in rings
        ]
    raise ValueError(f"unsupported WKB geometry type {gtype}")


_GEOM_COLS = {
    "src", "oid", "shape_type", "wkb", "xmin", "ymin", "xmax", "ymax",
    "num_parts", "num_points", "z", "m", "part_types",
}


def _dbf_spec_for(field) -> tuple[str, str, int, int]:
    from pyspark.sql.types import (  # noqa: PLC0415
        BooleanType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    t = field.dataType
    if isinstance(t, (LongType, IntegerType, ShortType)):
        return (field.name, "N", 18, 0)
    if isinstance(t, (DoubleType, FloatType)):
        return (field.name, "N", 24, 8)
    if isinstance(t, BooleanType):
        return (field.name, "L", 1, 0)
    if isinstance(t, DateType):
        return (field.name, "D", 8, 0)
    if isinstance(t, StringType):
        return (field.name, "C", 80, 0)
    raise ValueError(
        f"column {field.name}: type {t} has no dbf encoding"
    )


from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import WriterCommitMessage  # noqa: E402


@dataclass
class _ShpCommitMessage(WriterCommitMessage):
    base: str | None = None


class ShapefileWriter(DataSourceWriter):
    """One .shp/.shx/.dbf set per non-empty partition (part-files, like
    any distributed sink), written through a STAGING directory: tasks
    write task-unique files under ``_staging-<job>/``; only files named
    in the commit messages of SUCCESSFUL tasks move into the output on
    commit (so failed/speculative retries leave no duplicates), the
    previous output is replaced only inside commit (overwrite mode),
    and abort removes the staging directory leaving the old output
    intact.  Requires ``shape_type`` and ``wkb`` columns; other
    primitive columns become dbf fields."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        import uuid  # noqa: PLC0415

        self._path = options.get("path")
        if not self._path:
            raise ValueError("shapefile writer requires a path")
        names = {f.name for f in schema.fields}
        if "shape_type" not in names or "wkb" not in names:
            raise ValueError("shapefile writer needs shape_type and wkb columns")
        self._schema = schema
        self._overwrite = overwrite
        self._attr_specs = [
            _dbf_spec_for(f) for f in schema.fields if f.name not in _GEOM_COLS
        ]
        self._staging = os.path.join(
            self._path, f"_staging-{uuid.uuid4().hex[:12]}"
        )
        os.makedirs(self._staging, exist_ok=True)

    def write(self, iterator):
        import uuid  # noqa: PLC0415

        from pyshp_spark.sources.shp_writer import (  # noqa: PLC0415
            write_dbf,
            write_shp,
        )

        attr_names = [s[0] for s in self._attr_specs]
        shapes, records = [], []
        for row in iterator:
            w = row["wkb"]
            stype = int(row["shape_type"])
            payload = _wkb_to_payload(bytes(w)) if w is not None else None
            z = list(row["z"]) if "z" in row.__fields__ and row["z"] is not None else None
            m = list(row["m"]) if "m" in row.__fields__ and row["m"] is not None else None
            pt = (
                list(row["part_types"])
                if "part_types" in row.__fields__ and row["part_types"] is not None
                else None
            )
            shapes.append((stype if payload is not None else 0, payload, z, m, pt))
            records.append([row[n] for n in attr_names])
        if not shapes:
            return _ShpCommitMessage(base=None)
        shp, shx = write_shp(shapes)
        dbf = write_dbf(self._attr_specs, records)
        base = f"part-{uuid.uuid4().hex[:12]}"
        for ext, data in (("shp", shp), ("shx", shx), ("dbf", dbf)):
            with open(os.path.join(self._staging, f"{base}.{ext}"), "wb") as f:
                f.write(data)
        return _ShpCommitMessage(base=base)

    def commit(self, messages):
        import shutil  # noqa: PLC0415

        if self._overwrite:
            for ext in ("shp", "shx", "dbf"):
                for p in glob.glob(os.path.join(self._path, f"*.{ext}")):
                    os.remove(p)
        for m in messages:
            base = getattr(m, "base", None)
            if not base:
                continue
            for ext in ("shp", "shx", "dbf"):
                os.replace(
                    os.path.join(self._staging, f"{base}.{ext}"),
                    os.path.join(self._path, f"{base}.{ext}"),
                )
        shutil.rmtree(self._staging, ignore_errors=True)

    def abort(self, messages):
        import shutil  # noqa: PLC0415

        shutil.rmtree(self._staging, ignore_errors=True)


class ShapefileDataSource(DataSource):
    """spark.read.format("shapefile").load(dir_or_shp) and
    df.write.format("shapefile").save(dir)."""

    @classmethod
    def name(cls) -> str:
        return "shapefile"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema  # noqa: PLC0415

        import pyarrow as pa  # noqa: PLC0415

        path = self.options.get("path")
        if not path:
            raise ValueError("shapefile data source requires a path")
        bbox = _parse_bbox_option(self.options.get("bbox"))
        f = self.options.get("fields")
        fields = [c.strip() for c in f.split(",")] if f else None
        sample = _read_pair(
            _paths(path)[0], bbox, fields, self.options.get("encoding", "utf-8")
        )
        table = pa.Table.from_pandas(sample.head(10), preserve_index=False)
        return from_arrow_schema(table.schema)

    def reader(self, schema: StructType) -> DataSourceReader:
        cls = ShapefilePushdownReader if _pushdown_enabled() else ShapefileReader
        return cls(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return ShapefileWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema: StructType):
        return ShapefileStreamReader(self.options, schema)


class ShapefileStreamReader(SimpleDataSourceStreamReader):
    """Streaming landing-directory source:
    ``spark.readStream.format("shapefile").load(dir)`` picks up each new
    .shp (+ sibling .dbf) exactly once.  The offset is the seen-file log
    — the same protocol as Spark's built-in FileStreamSource — so
    restarts resume from the checkpoint without reprocessing.  The
    simple (driver-side) reader variant is appropriate for a landing
    dir's arrival rate; a partition-parallel ``streamReader`` is the
    upgrade path for heavy backfills."""

    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("shapefile stream source requires a path")
        self._bbox = _parse_bbox_option(options.get("bbox"))
        f = options.get("fields")
        self._fields = [c.strip() for c in f.split(",")] if f else None
        self._encoding = options.get("encoding", "utf-8")
        self._schema = schema
        self._cols = [fld.name for fld in schema.fields]

    def initialOffset(self):
        return {"seen": []}

    def _rows_for(self, paths):
        # a list_iterator (not a generator): the engine copies/pickles
        # the prefetched batch into its offset cache, and generators
        # cannot be pickled
        rows = []
        for p in paths:
            pdf = _read_pair(p, self._bbox, self._fields, self._encoding)
            rows.extend(tuple(r) for r in pdf[self._cols].itertuples(index=False))
        return iter(rows)

    def read(self, start):
        seen = set(start.get("seen", []))
        now = sorted(glob.glob(os.path.join(self._path, "*.shp")))
        new = [p for p in now if p not in seen]
        end = {"seen": sorted(seen | set(new))}
        return self._rows_for(new), end

    def readBetweenOffsets(self, start, end):
        seen = set(start.get("seen", []))
        target = [p for p in end.get("seen", []) if p not in seen]
        return self._rows_for(sorted(target))

    def commit(self, end):
        pass
