"""Deterministic blockgroups-style polygon fixture (seed=42).

Mirrors the statistical shape of the reference test fixture
``tests/shapefiles/blockgroups.shp`` (663 polygons, multipart shapes,
dbf schema AREA/BKG_KEY/POP1990/... — see FIXTURES.md §1) plus one of
each golden polygon pathology from the reference test suite
(test_shapefile.py:216-436): holes, multipolygon-with-holes, nested
exteriors, duplicate-coord hole start, straight-line hole start,
orphaned hole, wrong-winding exteriors.  A handful of oversized dense
polygons provide join skew for salting tests.

Everything is generated with a seeded PRNG — no external data.
"""

from __future__ import annotations

import numpy as np

from pyshp_spark.kernels.rings import is_cw
from pyshp_spark.sources.shp_writer import write_dbf, write_shp

# blockgroups.shp extent (reference tests/shapefiles fixture)
BBOX = (-122.515, 37.653, -122.327, 37.863)
POLYGON = 5


def _star_ring(rng, cx, cy, r, n, cw=True):
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=n))
    rad = rng.uniform(0.55 * r, r, size=n)
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    if cw:
        ring = ring[::-1]
    return np.vstack([ring, ring[:1]])


def _rect_ring(x0, y0, x1, y1, cw=True):
    ring = np.array(
        [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]], dtype=np.float64
    )
    # as written: (x0,y0)->(x0,y1)->(x1,y1)->(x1,y0) is CW for y up
    if not cw:
        ring = ring[::-1]
    assert is_cw(ring) == cw
    return ring


def _pathology_shapes(x0, y0, s):
    """One shape per reference golden case, placed in a small box of side
    ~10*s anchored at (x0, y0).  Each shape = list of rings."""
    R = _rect_ring
    shapes = []
    # 1. single exterior, two holes
    shapes.append(
        [
            R(x0, y0, x0 + 10 * s, y0 + 10 * s, cw=True),
            R(x0 + 2 * s, y0 + 2 * s, x0 + 4 * s, y0 + 4 * s, cw=False),
            R(x0 + 6 * s, y0 + 6 * s, x0 + 8 * s, y0 + 8 * s, cw=False),
        ]
    )
    # 2. multipolygon with a hole in each part
    shapes.append(
        [
            R(x0, y0 + 12 * s, x0 + 5 * s, y0 + 17 * s, cw=True),
            R(x0 + 1 * s, y0 + 13 * s, x0 + 2 * s, y0 + 14 * s, cw=False),
            R(x0 + 6 * s, y0 + 12 * s, x0 + 11 * s, y0 + 17 * s, cw=True),
            R(x0 + 7 * s, y0 + 13 * s, x0 + 8 * s, y0 + 14 * s, cw=False),
        ]
    )
    # 3. nested exteriors with holes
    shapes.append(
        [
            R(x0 + 12 * s, y0, x0 + 22 * s, y0 + 10 * s, cw=True),
            R(x0 + 13 * s, y0 + 1 * s, x0 + 21 * s, y0 + 9 * s, cw=False),
            R(x0 + 14 * s, y0 + 2 * s, x0 + 20 * s, y0 + 8 * s, cw=True),
            R(x0 + 15 * s, y0 + 3 * s, x0 + 19 * s, y0 + 7 * s, cw=False),
        ]
    )
    # 4. hole with duplicate starting coords + straight-line start
    dup = np.array(
        [
            [x0 + 26 * s, y0 + 2 * s],
            [x0 + 26 * s, y0 + 2 * s],
            [x0 + 27 * s, y0 + 2 * s],
            [x0 + 28 * s, y0 + 2 * s],
            [x0 + 28 * s, y0 + 4 * s],
            [x0 + 26 * s, y0 + 4 * s],
            [x0 + 26 * s, y0 + 2 * s],
        ]
    )
    assert not is_cw(dup)
    shapes.append([R(x0 + 24 * s, y0, x0 + 34 * s, y0 + 10 * s, cw=True), dup])
    # 5. orphaned hole (outside its exterior) — becomes its own exterior
    shapes.append(
        [
            R(x0 + 36 * s, y0, x0 + 42 * s, y0 + 6 * s, cw=True),
            R(x0 + 44 * s, y0 + 1 * s, x0 + 46 * s, y0 + 3 * s, cw=False),
            R(x0 + 47 * s, y0, x0 + 52 * s, y0 + 6 * s, cw=True),
        ]
    )
    # 6. wrong-winding exteriors (all rings CCW -> treated as exteriors)
    shapes.append(
        [
            R(x0 + 54 * s, y0, x0 + 58 * s, y0 + 4 * s, cw=False),
            R(x0 + 60 * s, y0, x0 + 64 * s, y0 + 4 * s, cw=False),
        ]
    )
    return shapes


def polygon_fixture(n: int = 663, seed: int = 42):
    """Return (shapes, records, fields).

    shapes: list of list-of-rings (each ring a closed (k,2) float64
    array, CW exteriors / CCW holes).  records: aligned attribute rows
    [bkg_key, pop1990, area, medianrent].  fields: dbf specs.
    """
    rng = np.random.default_rng(seed)
    x0, y0, x1, y1 = BBOX
    w, h = x1 - x0, y1 - y0
    shapes: list[list[np.ndarray]] = []

    # pathologies live in the lower-left ~15% of the extent
    shapes += _pathology_shapes(x0 + 0.01 * w, y0 + 0.01 * h, s=0.002 * w)

    # dense skew shapes: large multipart polygons covering many cells
    for i in range(5):
        cx = x0 + (0.2 + 0.15 * i) * w
        cy = y0 + 0.8 * h
        rings = [_star_ring(rng, cx, cy, 0.12 * w, 60, cw=True)]
        for j in range(3):
            hx = cx + (j - 1) * 0.03 * w
            rings.append(_star_ring(rng, hx, cy, 0.008 * w, 10, cw=False))
        shapes.append(rings)

    # bulk: jittered star polygons on a grid; ~2% multipart, ~10% with a hole
    remaining = max(0, n - len(shapes))
    cols = int(np.ceil(np.sqrt(remaining * w / h)))
    rows_n = int(np.ceil(remaining / max(cols, 1)))
    k = 0
    for gy in range(rows_n):
        for gx in range(cols):
            if k >= remaining:
                break
            cx = x0 + (gx + 0.5) / cols * w + rng.uniform(-0.1, 0.1) * w / cols
            cy = y0 + (gy + 0.5) / rows_n * h + rng.uniform(-0.1, 0.1) * h / rows_n
            r = rng.uniform(0.25, 0.48) * min(w / cols, h / rows_n)
            npts = int(rng.integers(6, 40))
            rings = [_star_ring(rng, cx, cy, r, npts, cw=True)]
            u = rng.uniform()
            if u < 0.10:
                rings.append(_star_ring(rng, cx, cy, 0.25 * r, 6, cw=False))
            elif u < 0.12:
                rings.append(
                    _star_ring(rng, cx + 1.2 * r, cy, 0.5 * r, 8, cw=True)
                )
            shapes.append(rings)
            k += 1

    fields = [
        ("BKG_KEY", "C", 12, 0),
        ("POP1990", "N", 9, 0),
        ("AREA", "N", 18, 5),
        ("MEDIANRENT", "N", 4, 0),
    ]
    records = []
    for i in range(len(shapes)):
        records.append(
            [
                f"06075{i:07d}",
                int(rng.integers(100, 10_000)),
                float(np.round(rng.uniform(0.01, 5.0), 5)),
                None if rng.uniform() < 0.05 else int(rng.integers(200, 3000)),
            ]
        )
    return shapes, records, fields


def fixture_shapefile_bytes(n: int = 663, seed: int = 42):
    """Fixture rendered to real .shp/.shx/.dbf bytes (our writer), so
    both this engine and the reference reader open identical inputs."""
    shapes, records, fields = polygon_fixture(n=n, seed=seed)
    shp, shx = write_shp([(POLYGON, rings) for rings in shapes])
    dbf = write_dbf(fields, records)
    return shp, shx, dbf
