"""__geo_interface__ equivalence vs the reference, on fixture shapefiles."""

import io
import json

import numpy as np
import pytest

from pyshp_spark.fixtures.polygons import fixture_shapefile_bytes
from pyshp_spark.functions.geojson import (
    geo_interface_from_wkb,
    rings_from_geojson,
    with_geojson,
)
from pyshp_spark.kernels.rings import is_cw
from pyshp_spark.sources.shapefile import parse_shp_bytes

N = 60


@pytest.fixture(scope="module")
def both(ref_shapefile):
    shp, _, _ = fixture_shapefile_bytes(n=N, seed=42)
    mine = parse_shp_bytes(shp)
    reader = ref_shapefile.Reader(shp=io.BytesIO(shp))
    return mine, reader


def _canon(d):
    return json.loads(json.dumps(d, sort_keys=True))


class TestGeoInterface:
    def test_every_fixture_shape_matches(self, both):
        mine, reader = both
        for i, shape in enumerate(reader.iterShapes()):
            got = geo_interface_from_wkb(
                bytes(mine.iloc[i].wkb), int(mine.iloc[i].shape_type)
            )
            assert _canon(got) == _canon(shape.__geo_interface__), f"oid {i}"

    def test_point_and_multipoint(self, ref_shapefile):
        from pyshp_spark.kernels.wkb import wkb_multipoint, wkb_point

        got = geo_interface_from_wkb(wkb_point(1.5, 2.5), 1)
        want = ref_shapefile.Point(1.5, 2.5).__geo_interface__
        assert _canon(got) == _canon(want)
        pts = [(0.0, 0.0), (1.0, 2.0)]
        got = geo_interface_from_wkb(wkb_multipoint(pts), 8)
        want = ref_shapefile.MultiPoint(points=list(pts)).__geo_interface__
        assert _canon(got) == _canon(want)

    def test_spark_udf(self, spark, both):
        mine, reader = both
        import pandas as pd
        from pyspark.sql.types import (
            BinaryType, IntegerType, LongType, StructField, StructType,
        )

        pdf = mine[["oid", "shape_type", "wkb"]]
        schema = StructType(
            [
                StructField("oid", LongType()),
                StructField("shape_type", IntegerType()),
                StructField("wkb", BinaryType()),
            ]
        )
        df = spark.createDataFrame(pdf, schema=schema)
        out = {r.oid: r.geojson for r in with_geojson(df).collect()}
        for i, shape in enumerate(reader.iterShapes()):
            assert json.loads(out[i]) == _canon(shape.__geo_interface__)


class TestFromGeojson:
    def test_rewind_on_import(self, ref_shapefile):
        # CCW exterior + CW hole get re-wound (reference sf.py:1493-1557)
        geoj = {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],  # CCW ext
                [[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]],  # CW hole
            ],
        }
        stype, rings = rings_from_geojson(geoj)
        assert stype == 5
        assert is_cw(rings[0]) and not is_cw(rings[1])
        ref = ref_shapefile.Shape._from_geojson(geoj)
        bounds = list(ref.parts) + [len(ref.points)]
        ref_rings = [
            np.asarray(ref.points[bounds[i] : bounds[i + 1]])
            for i in range(len(ref.parts))
        ]
        for a, b in zip(rings, ref_rings):
            np.testing.assert_array_equal(np.asarray(a), b)
