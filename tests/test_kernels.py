"""Geometry kernels vs the reference implementation (oracle).

The reference pyshp module-level functions (signed_area, is_cw,
ring_contains_point, ring_sample, organize_polygon_rings — reference
src/shapefile.py:816-1102) are imported read-only and used as the
ground truth on randomized and pathological inputs.
"""

import numpy as np
import pytest

from pyshp_spark.kernels import (
    is_cw,
    organize_polygon_rings,
    parse_wkb,
    points_in_rings_even_odd,
    ring_contains_point,
    ring_contains_points,
    ring_sample,
    signed_area,
    wkb_multipolygon,
    wkb_polygon,
    wkb_rings,
)
from pyshp_spark.kernels.rings import close_ring

RNG = np.random.default_rng(42)


def random_ring(rng, n=12, cx=0.0, cy=0.0, r=1.0, cw=True):
    """Simple star-convex closed ring (no self-intersections)."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=n))
    rad = rng.uniform(0.3 * r, r, size=n)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    ring = np.column_stack([xs, ys])  # CCW by construction
    if cw:
        ring = ring[::-1]
    return np.vstack([ring, ring[:1]])


class TestSignedArea:
    def test_matches_reference_random(self, ref_shapefile):
        for i in range(50):
            ring = random_ring(RNG, n=int(RNG.integers(3, 40)), cw=bool(i % 2))
            coords = [tuple(p) for p in ring]
            assert signed_area(ring) == pytest.approx(
                ref_shapefile.signed_area(coords), rel=1e-12, abs=1e-15
            )
            assert signed_area(ring, fast=True) == pytest.approx(
                ref_shapefile.signed_area(coords, fast=True), rel=1e-12, abs=1e-15
            )
            assert is_cw(ring) == ref_shapefile.is_cw(coords)

    def test_unit_square(self):
        sq = np.array([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]], dtype=float)
        assert signed_area(sq) == -1.0  # CW
        assert is_cw(sq)
        assert signed_area(sq[::-1]) == 1.0


class TestRingContainsPoint:
    def test_matches_reference_random(self, ref_shapefile):
        for i in range(20):
            ring = random_ring(RNG, n=int(RNG.integers(4, 60)), cw=True)
            coords = [tuple(p) for p in ring]
            px = RNG.uniform(-1.5, 1.5, size=200)
            py = RNG.uniform(-1.5, 1.5, size=200)
            mine = ring_contains_points(ring, px, py)
            ref = np.array(
                [ref_shapefile.ring_contains_point(coords, (x, y)) for x, y in zip(px, py)]
            )
            np.testing.assert_array_equal(mine, ref)

    def test_vertex_aligned_rays(self, ref_shapefile):
        # points whose y exactly equals vertex ys exercise the >= flag logic
        ring = np.array(
            [[0, 0], [4, 0], [4, 4], [2, 2], [0, 4], [0, 0]], dtype=float
        )
        coords = [tuple(p) for p in ring]
        pts = [(1, 2), (3, 2), (2, 3), (2, 1), (5, 0), (-1, 4), (2, 2), (0, 0), (4, 4)]
        for p in pts:
            assert ring_contains_point(ring, p) == ref_shapefile.ring_contains_point(
                coords, p
            ), p


class TestRingSample:
    def test_matches_reference(self, ref_shapefile):
        for i in range(30):
            cw = bool(i % 2)
            ring = random_ring(RNG, n=int(RNG.integers(4, 30)), cw=cw)
            coords = [tuple(p) for p in ring]
            assert ring_sample(ring, ccw=not cw) == pytest.approx(
                ref_shapefile.ring_sample(coords, ccw=not cw), rel=1e-12
            )

    def test_duplicate_and_straight_starts(self, ref_shapefile):
        # hole starting with duplicate coords / straight-line triplet
        # (pattern from reference test_shapefile.py:318-366 golden cases)
        ring = [(2, 2), (2, 2), (4, 2), (6, 2), (6, 6), (2, 6), (2, 2)]
        a = np.asarray(ring, dtype=float)
        assert ring_sample(a, ccw=True) == pytest.approx(
            ref_shapefile.ring_sample(ring, ccw=True)
        )
        # wrong-orientation request raises in both implementations
        with pytest.raises(Exception):
            ref_shapefile.ring_sample(ring, ccw=False)
        with pytest.raises(Exception):
            ring_sample(a, ccw=False)


def _ref_organize(ref_shapefile, rings):
    errs = {}
    out = ref_shapefile.organize_polygon_rings(rings, errs)
    return out, errs


def _norm(polys):
    return [
        [np.asarray(r, dtype=float)[:, :2].tolist() for r in poly] for poly in polys
    ]


class TestOrganizeRings:
    CASES = {
        "single_ext_two_holes": [
            [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],  # CW ext
            [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)],  # CCW hole
            [(6, 6), (8, 6), (8, 8), (6, 8), (6, 6)],  # CCW hole
        ],
        "multipolygon_holes": [
            [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],
            [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)],
            [(20, 0), (20, 10), (30, 10), (30, 0), (20, 0)],
            [(22, 2), (24, 2), (24, 4), (22, 4), (22, 2)],
        ],
        "nested_exteriors": [
            [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],
            [(1, 1), (9, 1), (9, 9), (1, 9), (1, 1)],  # hole of outer
            [(2, 2), (2, 8), (8, 8), (8, 2), (2, 2)],  # nested exterior
            [(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)],  # its hole
        ],
        "orphaned_hole": [
            [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],
            [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)],
            [(40, 40), (42, 40), (42, 42), (40, 42), (40, 40)],  # orphan, 2nd ext
            [(60, 60), (64, 60), (64, 64), (60, 64), (60, 60)],  # orphan hole
        ],
        "only_holes": [
            [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],  # CCW
            [(20, 0), (30, 0), (30, 10), (20, 10), (20, 0)],  # CCW
        ],
        "no_holes_multi": [
            [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],
            [(20, 0), (20, 10), (30, 10), (30, 0), (20, 0)],
        ],
    }

    @pytest.mark.parametrize("name", list(CASES))
    def test_matches_reference(self, ref_shapefile, name):
        rings = self.CASES[name]
        ref_polys, ref_errs = _ref_organize(ref_shapefile, rings)
        errs = {}
        mine = organize_polygon_rings([np.asarray(r, dtype=float) for r in rings], errs)
        assert _norm(mine) == _norm(ref_polys)
        assert errs == ref_errs

    def test_even_odd_equivalence(self, ref_shapefile):
        # even-odd over all rings == organized exterior-minus-holes membership
        for name, rings in self.CASES.items():
            arrs = [np.asarray(r, dtype=float) for r in rings]
            px = RNG.uniform(-2, 35, size=300)
            py = RNG.uniform(-2, 35, size=300)
            eo = points_in_rings_even_odd(arrs, px, py)
            polys, _ = _ref_organize(ref_shapefile, rings)
            ref = np.zeros(300, dtype=bool)
            for poly in polys:
                inside_ext = np.array(
                    [ref_shapefile.ring_contains_point(poly[0], (x, y)) for x, y in zip(px, py)]
                )
                for hole in poly[1:]:
                    inh = np.array(
                        [ref_shapefile.ring_contains_point(hole, (x, y)) for x, y in zip(px, py)]
                    )
                    inside_ext &= ~inh
                ref |= inside_ext
            np.testing.assert_array_equal(eo, ref, err_msg=name)


class TestWkb:
    def test_polygon_roundtrip(self):
        ext = close_ring(np.array([[0, 0], [0, 10], [10, 10], [10, 0]], dtype=float))
        hole = close_ring(np.array([[2, 2], [4, 2], [4, 4], [2, 4]], dtype=float))
        buf = wkb_polygon([ext, hole])
        gtype, rings = parse_wkb(buf)
        assert gtype == 3
        np.testing.assert_array_equal(rings[0], ext)
        np.testing.assert_array_equal(rings[1], hole)
        assert [r.tolist() for r in wkb_rings(buf)] == [ext.tolist(), hole.tolist()]

    def test_multipolygon_flatten(self):
        a = close_ring(np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=float))
        b = close_ring(np.array([[5, 5], [5, 6], [6, 6], [6, 5]], dtype=float))
        buf = wkb_multipolygon([[a], [b]])
        gtype, polys = parse_wkb(buf)
        assert gtype == 6
        assert len(polys) == 2
        assert len(wkb_rings(buf)) == 2
