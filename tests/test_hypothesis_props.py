"""Property-based tests (hypothesis), mirroring the reference's
hypothesis suite strategy (reference tests/hypothesis_tests.py):
write -> read round-trip invariants and kernel parity on randomized
geometry, with the reference as the oracle where it applies."""

import io

import numpy as np
from hypothesis import given, settings, strategies as st

from pyshp_spark.kernels.rings import (
    is_cw,
    pip_pairs,
    points_in_rings_even_odd,
    ring_contains_points,
    rings_to_edges,
    signed_area,
)
from pyshp_spark.kernels.wkb import parse_wkb, wkb_polygon, wkb_rings
from pyshp_spark.sources.shapefile import parse_dbf_bytes, parse_shp_bytes
from pyshp_spark.sources.shp_writer import write_dbf, write_shp

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def star_ring(draw, min_pts=3, max_pts=24):
    n = draw(st.integers(min_pts, max_pts))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    cx = draw(coord)
    cy = draw(coord)
    r = draw(st.floats(min_value=1e-3, max_value=1e3))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.4, 1.0, n) * r
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    if draw(st.booleans()):
        ring = ring[::-1]
    return np.vstack([ring, ring[:1]])


@settings(max_examples=40, deadline=None)
@given(star_ring())
def test_signed_area_parity(ring, ):
    import sys
    sys.path.insert(0, "/root/reference/src")
    import shapefile as ref

    coords = [tuple(p) for p in ring]
    assert np.isclose(
        signed_area(ring), ref.signed_area(coords), rtol=1e-9, atol=1e-6
    )
    assert is_cw(ring) == ref.is_cw(coords)


@settings(max_examples=25, deadline=None)
@given(star_ring(), st.integers(0, 2**31 - 1))
def test_ray_cast_parity(ring, seed):
    import sys
    sys.path.insert(0, "/root/reference/src")
    import shapefile as ref

    rng = np.random.default_rng(seed)
    xmin, ymin = ring.min(axis=0)
    xmax, ymax = ring.max(axis=0)
    pad_x = (xmax - xmin) * 0.3 + 1e-6
    pad_y = (ymax - ymin) * 0.3 + 1e-6
    px = rng.uniform(xmin - pad_x, xmax + pad_x, 50)
    py = rng.uniform(ymin - pad_y, ymax + pad_y, 50)
    mine = ring_contains_points(ring, px, py)
    coords = [tuple(p) for p in ring]
    want = np.array([ref.ring_contains_point(coords, (x, y)) for x, y in zip(px, py)])
    np.testing.assert_array_equal(mine, want)
    # pair kernel agrees with the per-ring kernel
    edges = rings_to_edges([ring])
    pair = pip_pairs([edges], np.zeros(50, dtype=np.int64), px, py)
    np.testing.assert_array_equal(pair, mine)


@settings(max_examples=25, deadline=None)
@given(star_ring())
def test_wkb_roundtrip(ring):
    buf = wkb_polygon([ring])
    gtype, rings = parse_wkb(buf)
    assert gtype == 3
    np.testing.assert_array_equal(rings[0], ring)
    np.testing.assert_array_equal(wkb_rings(buf)[0], ring)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=20))
def test_point_shapefile_roundtrip_through_reference(points):
    """Our writer -> reference reader AND our reader see the same points."""
    import sys
    sys.path.insert(0, "/root/reference/src")
    import shapefile as ref

    shp, shx = write_shp([(1, (x, y)) for x, y in points])
    r = ref.Reader(shp=io.BytesIO(shp), shx=io.BytesIO(shx))
    assert len(r) == len(points)
    for i, (x, y) in enumerate(points):
        assert r.shape(i).points[0] == (x, y)
    mine = parse_shp_bytes(shp)
    assert len(mine) == len(points)
    np.testing.assert_allclose(mine["xmin"], [p[0] for p in points], rtol=0)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(10**8), 10**8),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
                max_size=10,
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_dbf_roundtrip_through_reference(rows):
    import sys
    sys.path.insert(0, "/root/reference/src")
    import shapefile as ref

    fields = [("N0", "N", 12, 0), ("F3", "N", 18, 3), ("TXT", "C", 40, 0)]
    recs = [[n, round(f, 3), t] for n, f, t in rows]
    dbf = write_dbf(fields, recs)
    # reference reads our dbf
    r = ref.Reader(dbf=io.BytesIO(dbf))
    for i, (n, f, t) in enumerate(rows):
        rec = r.record(i)
        assert rec["N0"] == n
        assert abs(rec["F3"] - round(f, 3)) < 1e-9
        # dbf C fields byte-truncate at 40 and strip trailing pad chars
        assert rec["TXT"] == t.encode()[:40].decode("utf-8", "replace").rstrip("\x00 ")
    # our own reader agrees with the reference on every cell
    mine = parse_dbf_bytes(dbf)
    for i in range(len(rows)):
        rec = r.record(i)
        assert mine.iloc[i].N0 == rec["N0"]
        assert mine.iloc[i].F3 == rec["F3"]
        assert mine.iloc[i].TXT == rec["TXT"]


@settings(max_examples=15, deadline=None)
@given(st.lists(star_ring(), min_size=1, max_size=6), st.integers(0, 2**31 - 1))
def test_even_odd_symmetric_difference_property(rings, seed):
    """Even-odd membership equals xor of per-ring membership."""
    rng = np.random.default_rng(seed)
    allc = np.vstack(rings)
    px = rng.uniform(allc[:, 0].min(), allc[:, 0].max() + 1e-9, 80)
    py = rng.uniform(allc[:, 1].min(), allc[:, 1].max() + 1e-9, 80)
    combined = points_in_rings_even_odd(rings, px, py)
    xor = np.zeros(80, dtype=bool)
    for r in rings:
        xor ^= ring_contains_points(r, px, py)
    np.testing.assert_array_equal(combined, xor)


# ------------------------- round-2: encoding edge-case parity --------


@settings(max_examples=60, deadline=None)
@given(
    st.text(min_size=0, max_size=12),
    st.sampled_from(["utf-8", "utf-16-le", "utf-16-be", "latin-1"]),
    st.integers(0, 6),
)
def test_pad_byte_decode_recovery_parity(s, codec, n_pad):
    """Our C-field decoder must agree with the reference's
    _decode_C_or_M_field (sf.py:456-517) on arbitrary padded values."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    import warnings

    import shapefile as ref

    from pyshp_spark.sources.shapefile import _decode_text_field

    try:
        raw = s.encode(codec) + b" " * n_pad
    except UnicodeEncodeError:
        return
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            want = ref._decode_C_or_M_field(
                raw, encoding=codec, encodingErrors="strict", strict=False
            )
        except Exception:
            want = None
        try:
            got = _decode_text_field(raw, codec, "strict")
        except ValueError:
            got = None
    assert got == want, (raw, codec, got, want)


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=0, max_size=16), st.integers(1, 10))
def test_utf8_truncation_parity(s, size):
    """Writer truncation must match the reference exactly: plain cut for
    1-byte-per-code-point strings, _truncate_utf8_str otherwise."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    import shapefile as ref

    from pyshp_spark.sources.shp_writer import _encode_dbf_value

    encoded = s.encode("utf-8")
    if len(encoded) == len(s):
        want = encoded[:size]
    else:
        try:
            want, _ = ref._truncate_utf8_str(s, encoded, size)
        except ValueError:
            return  # reference gives up; ours raises too (checked below)
    got = _encode_dbf_value(s, "C", size, 0)
    assert got == want[:size].ljust(size, b" "), (s, size, got, want)
    got.decode("utf-8")  # always valid utf-8


# ---------------------------------------------------------------------------
# round-3 numeric kernels: batch hash, window shingles, fold cosines


@given(
    items=st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=200)
)
@settings(max_examples=60, deadline=None)
def test_hash64_vectorized_equals_scalar(items):
    from pyshp_spark.operators.dedup import _hash64, _hash64_np

    got = _hash64_np(items)
    assert [int(v) for v in got] == [_hash64(b) for b in items]


@given(
    docs=st.lists(
        st.lists(st.text(st.characters(min_codepoint=33, max_codepoint=300),
                         min_size=1, max_size=8), min_size=0, max_size=12),
        min_size=1, max_size=20,
    ),
    width=st.integers(2, 4),
)
@settings(max_examples=40, deadline=None)
def test_window_hashes_equal_scalar_shingle_rule(docs, width):
    """_window_hashes_np (flattened, vectorized) == the per-doc scalar
    rule: n>=w -> every w-window; 0<n<w -> one shingle over all tokens;
    n==0 -> none."""
    from pyshp_spark.operators.dedup import (
        _U64,
        _hash64,
        _hash64_np,
        _shingle_mults,
        _window_hashes_np,
    )

    mults = _shingle_mults(width)
    flat_tokens = [t.encode() for d in docs for t in d]
    th = _hash64_np(flat_tokens)
    counts = np.array([len(d) for d in docs], dtype=np.int64)
    out, sh_counts = _window_hashes_np(th, counts, width, mults)
    # scalar oracle
    want = []
    want_counts = []
    for d in docs:
        hs = [_hash64(t.encode()) for t in d]
        if not hs:
            want_counts.append(0)
            continue
        if len(hs) < width:
            want.append(sum(hs[j] * mults[j] for j in range(len(hs))) % _U64)
            want_counts.append(1)
        else:
            wins = [
                sum(hs[i + j] * mults[j] for j in range(width)) % _U64
                for i in range(len(hs) - width + 1)
            ]
            want.extend(wins)
            want_counts.append(len(wins))
    assert list(sh_counts) == want_counts
    assert [int(v) for v in out] == want


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 40),
    m=st.integers(1, 20),
    dim=st.integers(1, 48),
)
@settings(max_examples=40, deadline=None)
def test_fold_dots_match_sequential_fold(seed, n, m, dim):
    """The broadcast kernel's dot/norm folds must reproduce the exact
    left-fold accumulation of the Column expression (float64, one add
    per dimension in array order)."""
    from pyshp_spark.operators.similarity import _fold_dots, _fold_norms

    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, dim))
    b = rng.standard_normal((m, dim))
    dots = _fold_dots(a, b)
    for i in range(min(n, 5)):
        for j in range(min(m, 5)):
            acc = 0.0
            for d in range(dim):
                acc += a[i, d] * b[j, d]
            assert dots[i, j] == acc
    norms = _fold_norms(a)
    for i in range(min(n, 5)):
        acc = 0.0
        for d in range(dim):
            acc += a[i, d] * a[i, d]
        assert norms[i] == np.sqrt(acc)
