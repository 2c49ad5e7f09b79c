"""Cross-implementation ingest checks: the REFERENCE writer produces the
bytes (all shape types, Z/M NODATA, encodings, corruption), our parser
must reproduce the reference reader's view of them."""

import io
import zipfile

import numpy as np
import pytest

from pyshp_spark.sources.shapefile import (
    parse_dbf_bytes,
    parse_shp_bytes,
    read_zip_shapefile,
)
from pyshp_spark.kernels.wkb import parse_wkb


def _write(ref, shape_calls, fields=None, records=None, encoding="utf8"):
    shp, shx, dbf = io.BytesIO(), io.BytesIO(), io.BytesIO()
    w = ref.Writer(shp=shp, shx=shx, dbf=dbf, encoding=encoding)
    for name, args in fields or [("ID", ("N", 10, 0))]:
        w.field(name, *args)
    for i, (call, args, kwargs) in enumerate(shape_calls):
        getattr(w, call)(*args, **kwargs)
        w.record(*(records.pop(0) if records else [i]))
    w.close()
    return shp.getvalue(), shx.getvalue(), dbf.getvalue()


class TestShapeTypes:
    def test_points(self, ref_shapefile):
        shp, _, _ = _write(
            ref_shapefile,
            [("point", (1.5, 2.5), {}), ("point", (-3.0, 4.0), {})],
        )
        df = parse_shp_bytes(shp)
        assert list(df.shape_type) == [1, 1]
        g, pts = parse_wkb(bytes(df.iloc[0].wkb))
        assert g == 1 and pts.tolist() == [[1.5, 2.5]]
        assert df.iloc[1].xmin == -3.0 and df.iloc[1].ymax == 4.0

    def test_pointz_and_m_nodata(self, ref_shapefile):
        shp_z, _, _ = _write(ref_shapefile, [("pointz", (1.0, 2.0, 3.0), {})])
        df = parse_shp_bytes(shp_z)
        assert list(df.shape_type) == [11]
        assert df.iloc[0].z == [3.0]
        shp_m, _, _ = _write(
            ref_shapefile, [("pointm", (5.0, 6.0), {"m": None})]
        )
        df = parse_shp_bytes(shp_m)
        assert list(df.shape_type) == [21]
        # reference encodes m=None as NODATA < -1e38 -> our parser None
        assert df.iloc[0].m == [None]

    def test_multipoint(self, ref_shapefile):
        shp, _, _ = _write(
            ref_shapefile,
            [("multipoint", ([(0, 0), (1, 1), (2, 0)],), {})],
        )
        df = parse_shp_bytes(shp)
        assert df.iloc[0].shape_type == 8
        assert df.iloc[0].num_points == 3
        g, pts = parse_wkb(bytes(df.iloc[0].wkb))
        assert g == 4 and len(pts) == 3

    def test_polyline_multipart(self, ref_shapefile):
        shp, _, _ = _write(
            ref_shapefile,
            [("line", ([[(0, 0), (1, 1)], [(2, 2), (3, 3), (4, 4)]],), {})],
        )
        df = parse_shp_bytes(shp)
        assert df.iloc[0].shape_type == 3
        assert df.iloc[0].num_parts == 2
        g, lines = parse_wkb(bytes(df.iloc[0].wkb))
        assert g == 5  # MultiLineString
        assert [len(l) for l in lines] == [2, 3]

    def test_polylinez_matches_reference(self, ref_shapefile):
        shp, _, _ = _write(
            ref_shapefile,
            [("linez", ([[(0, 0, 10), (1, 1, 20), (2, 2, 30)]],), {})],
        )
        df = parse_shp_bytes(shp)
        reader = ref_shapefile.Reader(shp=io.BytesIO(shp))
        ref_shape = reader.shape(0)
        assert df.iloc[0].shape_type == 13 == ref_shape.shapeType
        assert list(df.iloc[0].z) == list(ref_shape.z)
        # reference: missing M block -> all None
        assert list(df.iloc[0].m) == list(ref_shape.m)

    def test_null_shape(self, ref_shapefile):
        shp, _, _ = _write(ref_shapefile, [("null", (), {})])
        df = parse_shp_bytes(shp)
        assert df.iloc[0].shape_type == 0
        assert df.iloc[0].wkb is None
        assert np.isnan(df.iloc[0].xmin) or df.iloc[0].xmin is None


class TestDbfEdgeCases:
    def test_latin1_roundtrip(self, ref_shapefile):
        shp, _, dbf = _write(
            ref_shapefile,
            [("point", (0.0, 0.0), {})],
            fields=[("NAME", ("C", 40, 0))],
            records=[["café niño"]],
            encoding="latin1",
        )
        df = parse_dbf_bytes(dbf, encoding="latin1")
        assert df.iloc[0].NAME == "café niño"

    def test_date_and_logical(self, ref_shapefile):
        import datetime

        shp, _, dbf = _write(
            ref_shapefile,
            [("point", (0.0, 0.0), {}), ("point", (1.0, 1.0), {})],
            fields=[("D8", ("D", 8, 0)), ("FLAG", ("L", 1, 0))],
            records=[[datetime.date(2020, 2, 29), True], [None, None]],
        )
        mine = parse_dbf_bytes(dbf)
        ref = ref_shapefile.Reader(
            shp=io.BytesIO(shp), dbf=io.BytesIO(dbf)
        )
        recs = list(ref.iterRecords())
        assert mine.iloc[0].D8 == recs[0]["D8"] == datetime.date(2020, 2, 29)
        assert bool(mine.iloc[0].FLAG) == recs[0]["FLAG"] is True
        assert mine.iloc[1].D8 is None and recs[1]["D8"] is None
        assert mine.iloc[1].FLAG is None and recs[1]["FLAG"] is None

    def test_numeric_nulls(self, ref_shapefile):
        shp, _, dbf = _write(
            ref_shapefile,
            [("point", (0.0, 0.0), {})],
            fields=[("N0", ("N", 9, 0)), ("F2", ("N", 9, 2))],
            records=[[None, None]],
        )
        mine = parse_dbf_bytes(dbf)
        import pandas as pd

        assert pd.isna(mine.iloc[0].N0)
        assert pd.isna(mine.iloc[0].F2)


class TestCorruptTolerance:
    def test_truncated_shp(self, ref_shapefile):
        shp, _, _ = _write(
            ref_shapefile,
            [("point", (0.0, 0.0), {}), ("point", (1.0, 1.0), {})],
        )
        truncated = shp[: len(shp) - 10]
        df = parse_shp_bytes(truncated)
        assert len(df) == 1  # parses what it can, like the reference

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            parse_shp_bytes(b"\x00" * 200)


class TestZipSource:
    def test_zip_with_two_shapefiles(self, ref_shapefile):
        shp, shx, dbf = _write(
            ref_shapefile, [("point", (0.0, 0.0), {}), ("point", (1.0, 1.0), {})]
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("a.shp", shp)
            z.writestr("a.dbf", dbf)
            z.writestr("b.shp", shp)
        df = read_zip_shapefile(buf.getvalue())
        assert len(df) == 4
        assert set(df.src) == {"a.shp", "b.shp"}
        assert "ID" in df.columns  # a.dbf attrs present (NaN for b)
