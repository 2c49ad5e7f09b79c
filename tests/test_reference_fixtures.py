"""Ingest parity against the reference's REAL fixture corpus.

Round-1 verification ran these comparisons by hand; this module pins
them as regression gates (reference goldens: test_shapefile.py:766,
789, 816 blockgroups; 1544-1563 REL.zip PolylineZ-without-M; 1315-1353
corrupt-tail tolerance; 596-621 multi-member / empty zips).  The
reference module itself is imported strictly as the oracle.
"""

import io
import zipfile

import numpy as np
import pytest

from pyshp_spark.sources.shapefile import (
    parse_dbf_bytes,
    parse_shp_bytes,
    read_zip_shapefile,
    shapefile_to_pandas,
)

FIXDIR = "/root/reference/tests/shapefiles"


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def blockgroups_bytes():
    return _read(f"{FIXDIR}/blockgroups.shp"), _read(f"{FIXDIR}/blockgroups.dbf")


def test_blockgroups_goldens(blockgroups_bytes):
    """Reference goldens: 663 records; record(3)[1:3]; shape(3) = 173 pts."""
    shp, dbf = blockgroups_bytes
    geoms = parse_shp_bytes(shp)
    attrs = parse_dbf_bytes(dbf)
    assert len(geoms) == 663
    assert len(attrs) == 663
    row3 = attrs[attrs.oid == 3].iloc[0]
    # record(3)[1:3] == ["060750601001", 4715] (test_shapefile.py:789)
    field_names = [c for c in attrs.columns if c != "oid"]
    assert row3[field_names[1]] == "060750601001"
    assert row3[field_names[2]] == 4715
    assert int(geoms[geoms.oid == 3].iloc[0].num_points) == 173


def test_blockgroups_full_attr_parity(ref_shapefile, blockgroups_bytes):
    """Every attribute of every record equals the reference's."""
    shp, dbf = blockgroups_bytes
    attrs = parse_dbf_bytes(dbf)
    r = ref_shapefile.Reader(shp=io.BytesIO(shp), dbf=io.BytesIO(dbf))
    field_names = [f[0] for f in r.fields[1:]]
    assert [c for c in attrs.columns if c != "oid"] == field_names
    ours = attrs.set_index("oid")
    for i, rec in enumerate(r.records()):
        mine = ours.loc[i]
        for name, want in zip(field_names, list(rec)):
            got = mine[name]
            if want is None:
                assert got is None or (isinstance(got, float) and np.isnan(got))
            else:
                assert got == want, (i, name, got, want)


def test_blockgroups_geometry_parity(ref_shapefile, blockgroups_bytes):
    """Per-shape point counts, part counts and bboxes match the reference."""
    shp, _dbf = blockgroups_bytes
    geoms = parse_shp_bytes(shp).set_index("oid")
    r = ref_shapefile.Reader(shp=io.BytesIO(shp))
    for i, shape in enumerate(r.iterShapes()):
        mine = geoms.loc[i]
        assert int(mine.num_points) == len(shape.points)
        assert int(mine.num_parts) == max(len(shape.parts), 0)
        bx = shape.bbox
        assert np.allclose(
            [mine.xmin, mine.ymin, mine.xmax, mine.ymax], list(bx), rtol=0, atol=0
        )


def test_rel_zip_polygonz_without_m():
    """REL.zip: PolygonZ records whose trailing M block is absent must
    ingest with z populated and m all-None (test_shapefile.py:1544-1563)."""
    df = read_zip_shapefile(f"{FIXDIR}/REL.zip")
    assert len(df) > 0
    assert (df.shape_type == 15).all()  # POLYGONZ
    for _, row in df.iterrows():
        assert row.z is not None and len(row.z) == row.num_points
        assert row.m is not None and all(v is None for v in row.m)


def test_rel_zip_matches_reference(ref_shapefile):
    zf = zipfile.ZipFile(f"{FIXDIR}/REL.zip")
    shp_name = next(n for n in zf.namelist() if n.lower().endswith(".shp"))
    shp = zf.read(shp_name)
    geoms = parse_shp_bytes(shp).set_index("oid")
    r = ref_shapefile.Reader(shp=io.BytesIO(shp))
    for i, shape in enumerate(r.iterShapes()):
        mine = geoms.loc[i]
        assert list(mine.z) == list(shape.z)
        assert list(mine.m) == list(shape.m)
        assert int(mine.num_points) == len(shape.points)


def test_corrupt_too_long_tolerated(ref_shapefile):
    """Junk bytes after the last record must be ignored, going strictly
    off header info (test_shapefile.py:1315-1353)."""
    shp = _read(f"{FIXDIR}/corrupt_too_long.shp")
    shx = _read(f"{FIXDIR}/corrupt_too_long.shx")
    dbf = _read(f"{FIXDIR}/corrupt_too_long.dbf")
    geoms = parse_shp_bytes(shp)
    attrs = parse_dbf_bytes(dbf)
    # the reference needs the .shx to bound the corrupt tail; our scan
    # bounds it from the header's declared file length alone
    r = ref_shapefile.Reader(
        shp=io.BytesIO(shp), shx=io.BytesIO(shx), dbf=io.BytesIO(dbf)
    )
    assert len(geoms) == len(r.shapes())
    assert len(attrs) == r.numRecords
    joined = shapefile_to_pandas(shp, dbf)
    assert len(joined) == len(geoms)


def test_latin1_encoding_parity(ref_shapefile):
    """latin1-encoded dbf strings decode identically to the reference."""
    shp = _read(f"{FIXDIR}/latin1.shp")
    dbf = _read(f"{FIXDIR}/latin1.dbf")
    attrs = parse_dbf_bytes(dbf, encoding="latin1")
    r = ref_shapefile.Reader(
        shp=io.BytesIO(shp), dbf=io.BytesIO(dbf), encoding="latin1"
    )
    field_names = [f[0] for f in r.fields[1:]]
    for i, rec in enumerate(r.records()):
        mine = attrs[attrs.oid == i].iloc[0]
        for name, want in zip(field_names, list(rec)):
            assert mine[name] == want, (i, name, mine[name], want)


def test_multishapefile_zip_members():
    """blockgroups_multishapefile.zip has two .shp members; both ingest,
    each tagged with its member name (test_shapefile.py:596-611)."""
    df = read_zip_shapefile(f"{FIXDIR}/blockgroups_multishapefile.zip")
    srcs = sorted(df["src"].unique())
    assert len(srcs) == 2
    counts = df.groupby("src").size()
    assert (counts == 663).all()


def test_empty_zipfile_errors():
    with pytest.raises(Exception):
        read_zip_shapefile(f"{FIXDIR}/empty_zipfile.zip")


def test_edit_fixture_parity(ref_shapefile):
    shp = _read(f"{FIXDIR}/edit.shp")
    dbf = _read(f"{FIXDIR}/edit.dbf")
    geoms = parse_shp_bytes(shp)
    attrs = parse_dbf_bytes(dbf)
    r = ref_shapefile.Reader(shp=io.BytesIO(shp), dbf=io.BytesIO(dbf))
    assert len(geoms) == len(r.shapes())
    assert len(attrs) == r.numRecords
    for i, shape in enumerate(r.iterShapes()):
        mine = geoms[geoms.oid == i].iloc[0]
        assert int(mine.num_points) == len(shape.points)
        assert int(mine.shape_type) == shape.shapeType


def test_merge_fixture_parity(ref_shapefile):
    shp = _read(f"{FIXDIR}/merge.shp")
    dbf = _read(f"{FIXDIR}/merge.dbf")
    geoms = parse_shp_bytes(shp)
    attrs = parse_dbf_bytes(dbf)
    r = ref_shapefile.Reader(shp=io.BytesIO(shp), dbf=io.BytesIO(dbf))
    assert len(geoms) == len(r.shapes())
    field_names = [f[0] for f in r.fields[1:]]
    # spot-check full attr parity on a sample of rows
    ours = attrs.set_index("oid")
    n = r.numRecords
    for i in (0, n // 2, n - 1):
        rec = r.record(i)
        mine = ours.loc[i]
        for name, want in zip(field_names, list(rec)):
            if want is None:
                continue
            assert mine[name] == want, (i, name)
