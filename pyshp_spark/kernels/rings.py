"""Vectorized (numpy) ring geometry kernels.

Semantics-compatible with the reference pyshp module-level kernels
(reference src/shapefile.py:816-1102) but implemented fresh on numpy
arrays so they run at Arrow-batch granularity inside pandas UDFs:

- ``signed_area`` / ``is_cw``: shoelace over a closed ring; negative
  signed area == clockwise == exterior ring (reference sf.py:816-840).
- ``ring_contains_points``: crossing-number (+X ray) point-in-ring test,
  Haines/MacMartin style, vectorized over a batch of query points.  The
  per-edge arithmetic mirrors the reference expression order
  (sf.py:872-914) so classifications agree bit-for-bit away from
  degenerate on-edge cases.
- ``ring_sample``: deterministic interior sample point via the first
  valid coordinate-triplet centroid (sf.py:921-968) — iteration order
  matters for hole-assignment parity and is reproduced exactly.
- ``organize_polygon_rings``: CW-exterior / CCW-hole grouping with
  bbox-prefilter -> point-in-ring refine -> smallest-|area| tie-break,
  orphaned-hole promotion (sf.py:977-1102).

Rings are ``float64 ndarray`` of shape (n, 2) (x, y columns); closed
rings repeat the first vertex at the end.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "signed_area",
    "is_cw",
    "ring_bbox",
    "ring_contains_points",
    "ring_contains_point",
    "ring_sample",
    "rewind",
    "organize_polygon_rings",
    "points_in_rings_even_odd",
    "close_ring",
]


def _as_xy(ring) -> np.ndarray:
    a = np.asarray(ring, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] < 2:
        raise ValueError(f"ring must be (n, >=2), got {a.shape}")
    return a[:, :2]


def close_ring(ring: np.ndarray) -> np.ndarray:
    """Append the first vertex if the ring is open (reference auto-close,
    sf.py:1135-1138)."""
    a = _as_xy(ring)
    if len(a) and not np.array_equal(a[0], a[-1]):
        a = np.vstack([a, a[:1]])
    return a


def rewind(ring) -> np.ndarray:
    """The ring in reversed vertex order — flips orientation (reference
    rewind, sf.py:843-845; used by its __geo_interface__ RFC-7946
    normalization, sf.py:1518-1556)."""
    return _as_xy(ring)[::-1].copy()


def signed_area(ring, fast: bool = False) -> float:
    """Signed area of a closed ring; >= 0 means counter-clockwise.

    With ``fast=True`` returns 2x the area (sign-only use).  Matches the
    reference formulation (sf.py:816-832): cyclic shoelace
    sum_{i=1..n-1} x_i * (y_{i+1} - y_{i-1}) with index n wrapping to 1,
    z/m ignored.
    """
    a = _as_xy(ring)
    n = len(a)
    if n < 3:
        return 0.0
    if n <= 96:
        # small rings: pure-python shoelace beats numpy call overhead
        # ~5x AND reproduces the reference's exact summation order
        xs = a[:, 0].tolist()
        ys = a[:, 1].tolist()
        xs.append(xs[1])
        ys.append(ys[1])
        area2 = sum(xs[i] * (ys[i + 1] - ys[i - 1]) for i in range(1, n))
        return area2 if fast else area2 / 2.0
    x = a[:, 0]
    y = a[:, 1]
    # wrap: y2[i] spans indices 1..n with n -> index 1 of the original
    y_next = np.concatenate([y[2:], y[1:2]])  # y_{i+1} for i = 1..n-1
    area2 = float(np.sum(x[1:] * (y_next - y[:-1])))
    return area2 if fast else area2 / 2.0


def is_cw(ring) -> bool:
    """True when the ring is clockwise (negative signed area)."""
    return signed_area(ring, fast=True) < 0


def ring_bbox(ring) -> tuple[float, float, float, float]:
    a = _as_xy(ring)
    return (
        float(a[:, 0].min()),
        float(a[:, 1].min()),
        float(a[:, 0].max()),
        float(a[:, 1].max()),
    )


def ring_contains_points(ring, px, py) -> np.ndarray:
    """Vectorized crossing-number point-in-ring test.

    ``ring``: (n,2) closed ring.  ``px``/``py``: 1-D arrays of query
    coordinates.  Returns a bool array.

    The edge test reproduces the reference kernel (sf.py:872-914): edges
    whose endpoint y-flags (y >= ty) differ may be crossed by the +X
    ray; if both endpoint x-flags (x >= tx) agree, the flag decides,
    otherwise the exact ray/edge intersection x is compared with >= tx.
    Expression order of the intersection is kept identical so float
    results agree with the reference bit-for-bit.
    """
    a = _as_xy(ring)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    npts = len(px)
    if len(a) < 2 or npts == 0:
        return np.zeros(npts, dtype=bool)

    x0 = a[:-1, 0][:, None]
    y0 = a[:-1, 1][:, None]
    x1 = a[1:, 0][:, None]
    y1 = a[1:, 1][:, None]

    inside = np.zeros(npts, dtype=bool)
    # chunk query points so the (edges x points) broadcast stays cache-sized
    chunk = max(1, int(4_000_000 / max(1, len(a))))
    for s in range(0, npts, chunk):
        tx = px[s : s + chunk][None, :]
        ty = py[s : s + chunk][None, :]
        yf0 = y0 >= ty
        yf1 = y1 >= ty
        straddle = yf0 != yf1
        xf0 = x0 >= tx
        xf1 = x1 >= tx
        same_side = xf0 == xf1
        easy = straddle & same_side & xf0
        hard = straddle & ~same_side
        if hard.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                # identical operation order to the reference intersection
                isect = x1 - (y1 - ty) * (x0 - x1) / (y0 - y1)
            hard = hard & (isect >= tx)
        crossings = easy.sum(axis=0) + hard.sum(axis=0)
        inside[s : s + chunk] = (crossings & 1).astype(bool)
    return inside


def ring_contains_point(ring, p) -> bool:
    """Scalar convenience wrapper over :func:`ring_contains_points`."""
    return bool(ring_contains_points(ring, [p[0]], [p[1]])[0])


class RingSamplingError(Exception):
    pass


def ring_sample(ring, ccw: bool = False) -> tuple[float, float]:
    """Deterministic interior point of a ring.

    Walks coordinate triplets in ring order (skipping duplicate coords),
    wrapping around by re-visiting the second coordinate, and returns the
    centroid of the first non-degenerate triplet whose orientation
    matches the ring's and whose centroid passes the point-in-ring test
    (reference sf.py:921-968 — the iteration order is part of the
    hole-assignment contract and is reproduced exactly).
    """
    a = _as_xy(ring)
    coords = [(float(x), float(y)) for x, y in a]
    triplet: list[tuple[float, float]] = []

    def seq():
        yield from coords
        yield coords[1]

    for p in seq():
        if p not in triplet:
            triplet.append(p)
        if len(triplet) == 3:
            (ax, ay), (bx, by), (cx, cy) = triplet
            straight = (ay - by) * (ax - cx) == (ay - cy) * (ax - bx)
            if not straight:
                tri = np.array(triplet + [triplet[0]], dtype=np.float64)
                tri_ccw = not is_cw(tri)
                if ccw == tri_ccw:
                    mx = (ax + bx + cx) / 3.0
                    my = (ay + by + cy) / 3.0
                    if ring_contains_point(a, (mx, my)):
                        return mx, my
            triplet.pop(0)
    raise RingSamplingError(f"unable to find a ring sample point in {len(coords)} coords")


def _first_ring_stats_scalar(ring) -> tuple:
    """(is_cw, |2A|, sx, sy) of one ring via the reference-parity scalar
    kernels — the exact path `first_ring_stats` falls back to."""
    cw = is_cw(ring)
    a2 = abs(signed_area(ring, fast=True))
    try:
        px, py = ring_sample(ring, ccw=not cw)
    except RingSamplingError:
        px = py = None
    return (cw, a2, px, py)


def first_ring_stats(rings_list: list) -> list:
    """(is_cw, |2A|, sample_x, sample_y) per shape for a BATCH of parsed
    ring lists (first ring of each; empty ring list -> all-None row).

    Fast path, fully vectorized across the batch, for the overwhelmingly
    common case — first ring has 3..96 vertices, no NaNs, its first
    three coordinates are pairwise distinct, and the FIRST candidate
    triplet of :func:`ring_sample` succeeds (non-degenerate, orientation
    matches, centroid inside).  Bit-exactness with the scalar path is
    by construction: the shoelace terms accumulate left-to-right per
    ring exactly like the small-ring python ``sum`` in
    :func:`signed_area` (a masked sequential loop over term index, NOT
    np.sum's pairwise tree), the triplet test replicates
    :func:`ring_sample`'s first iteration expression for expression,
    and containment counts crossings with :func:`ring_contains_points`'
    per-edge arithmetic.  Every shape that misses any gate falls back
    to the scalar kernels, so outputs are identical for ALL inputs —
    pinned by a randomized differential test."""
    n_items = len(rings_list)
    out: list = [None] * n_items
    fast_idx: list[int] = []
    fast_rings: list[np.ndarray] = []
    for i, rings in enumerate(rings_list):
        if not rings:
            out[i] = (None, None, None, None)
            continue
        a = _as_xy(rings[0])
        n = len(a)
        if 3 <= n <= 96 and not np.isnan(a).any():
            d01 = a[0, 0] != a[1, 0] or a[0, 1] != a[1, 1]
            d12 = a[1, 0] != a[2, 0] or a[1, 1] != a[2, 1]
            d02 = a[0, 0] != a[2, 0] or a[0, 1] != a[2, 1]
            if d01 and d12 and d02:
                fast_idx.append(i)
                fast_rings.append(a)
                continue
        out[i] = _first_ring_stats_scalar(rings[0])
    if not fast_rings:
        return out

    m = len(fast_rings)
    ns = np.fromiter((len(r) for r in fast_rings), dtype=np.int64, count=m)
    maxn = int(ns.max())
    # padded coords with the shoelace wrap slot: X[j, nj] = x[1]
    X = np.zeros((m, maxn + 1), dtype=np.float64)
    Y = np.zeros((m, maxn + 1), dtype=np.float64)
    for j, r in enumerate(fast_rings):
        nj = len(r)
        X[j, :nj] = r[:, 0]
        Y[j, :nj] = r[:, 1]
        X[j, nj] = r[1, 0]
        Y[j, nj] = r[1, 1]
    # sequential masked accumulation — same left-to-right term order as
    # signed_area's small-ring python sum (np.sum's pairwise tree would
    # diverge in the last bits for longer rings)
    acc = np.zeros(m, dtype=np.float64)
    for i in range(1, maxn):
        t = X[:, i] * (Y[:, i + 1] - Y[:, i - 1])
        acc = np.where(i < ns, acc + t, acc)
    cw = acc < 0.0
    a2 = np.abs(acc)

    ax, ay = X[:, 0], Y[:, 0]
    bx, by = X[:, 1], Y[:, 1]
    cx, cy = X[:, 2], Y[:, 2]
    straight = (ay - by) * (ax - cx) == (ay - cy) * (ax - bx)
    # signed_area of [t0,t1,t2,t0] in its exact sequential order
    s = bx * (cy - ay)
    s = s + cx * (ay - by)
    s = s + ax * (by - cy)
    tri_ccw = ~(s < 0.0)
    want_ccw = ~cw  # stats samples holes-side: ccw = not is_cw(ring)
    mx = (ax + bx + cx) / 3.0
    my = (ay + by + cy) / 3.0

    # centroid-in-own-ring: one flattened crossing pass over all edges
    flat = np.concatenate(fast_rings)[:, :2]
    ends = np.cumsum(ns)
    tot = int(ends[-1])
    is_last = np.zeros(tot, dtype=bool)
    is_last[ends - 1] = True
    e0 = np.flatnonzero(~is_last)
    ring_id = np.repeat(np.arange(m), ns - 1)
    x0, y0 = flat[e0, 0], flat[e0, 1]
    x1, y1 = flat[e0 + 1, 0], flat[e0 + 1, 1]
    tx, ty = mx[ring_id], my[ring_id]
    yf0 = y0 >= ty
    yf1 = y1 >= ty
    straddle = yf0 != yf1
    xf0 = x0 >= tx
    xf1 = x1 >= tx
    same_side = xf0 == xf1
    crossed = straddle & same_side & xf0
    hard = straddle & ~same_side
    if hard.any():
        with np.errstate(divide="ignore", invalid="ignore"):
            isect = x1 - (y1 - ty) * (x0 - x1) / (y0 - y1)
        crossed = crossed | (hard & (isect >= tx))
    crossings = np.bincount(
        ring_id, weights=crossed, minlength=m
    ).astype(np.int64)
    inside = (crossings & 1).astype(bool)

    ok = (~straight) & (tri_ccw == want_ccw) & inside
    for j, i in enumerate(fast_idx):
        if ok[j]:
            out[i] = (bool(cw[j]), float(a2[j]), float(mx[j]), float(my[j]))
        else:
            out[i] = _first_ring_stats_scalar(fast_rings[j])
    return out


def organize_polygon_rings(
    rings: list[np.ndarray], return_errors: dict | None = None
) -> list[list[np.ndarray]]:
    """Group a shape's rings into polygons ``[[exterior, hole, ...], ...]``.

    Reproduces the reference algorithm (sf.py:977-1102):

    1. classify by winding: CW -> exterior, CCW -> hole;
    2. single exterior: all holes attach to it;
    3. multiple exteriors: bbox-contains prefilter (strict inequalities,
       sf.py:864-869), then point-in-ring refine with a sampled hole
       interior point, then smallest-|2x-area| exterior wins for nested
       exteriors;
    4. orphaned holes promote to hole-less exteriors (+ error counter);
    5. no exteriors at all: treat every hole as an exterior (+ counter).
    """
    rings = [_as_xy(r) for r in rings]
    exteriors: list[np.ndarray] = []
    holes: list[np.ndarray] = []
    for r in rings:
        (exteriors if is_cw(r) else holes).append(r)

    if len(exteriors) == 1:
        return [[exteriors[0], *holes]]

    if len(exteriors) > 1:
        if not holes:
            return [[e] for e in exteriors]

        ext_bboxes = [ring_bbox(e) for e in exteriors]
        cand: dict[int, list[int]] = {}
        for hi, h in enumerate(holes):
            hxmin, hymin, hxmax, hymax = ring_bbox(h)
            cand[hi] = [
                ei
                for ei, (exmin, eymin, exmax, eymax) in enumerate(ext_bboxes)
                if exmin < hxmin and hxmax < exmax and eymin < hymin and hymax < eymax
            ]
        for hi, cands in cand.items():
            if len(cands) > 1:
                sample = ring_sample(holes[hi], ccw=not is_cw(holes[hi]))
                cand[hi] = [
                    ei
                    for ei in cands
                    if ring_contains_point(exteriors[ei], sample)
                ]
        for hi, cands in cand.items():
            if len(cands) > 1:
                cand[hi] = [
                    min(cands, key=lambda ei: abs(signed_area(exteriors[ei], fast=True)))
                ]

        orphan = [hi for hi, cands in cand.items() if not cands]
        polys = []
        for ei, e in enumerate(exteriors):
            poly = [e]
            poly += [holes[hi] for hi, cands in cand.items() if cands and cands[0] == ei]
            polys.append(poly)
        for hi in orphan:
            polys.append([holes[hi]])
        if orphan and return_errors is not None:
            return_errors["polygon_orphaned_holes"] = len(orphan)
        return polys

    # no exteriors: assume wrong winding, promote all holes
    if return_errors is not None:
        return_errors["polygon_only_holes"] = len(holes)
    return [[h] for h in holes]


def rings_to_edges(rings: list[np.ndarray]) -> np.ndarray:
    """Flatten a shape's rings into an (E, 4) edge array
    [x0, y0, x1, y1] — the precomputed form for :func:`pip_pairs`."""
    parts = []
    for r in rings:
        a = _as_xy(r)
        if len(a) >= 2:
            parts.append(np.hstack([a[:-1], a[1:]]))
    if not parts:
        return np.empty((0, 4), dtype=np.float64)
    return np.vstack(parts)


def stack_edges(edges_per_code: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """[(E_c,4) arrays] -> (all_edges (sumE,4), offsets (P+1,)).

    The flat form pickles as two buffers (vs one object per polygon) —
    this is what travels in Spark broadcast variables; a 20k-polygon
    set deserializes in ~ms instead of seconds per Python worker."""
    counts = np.array([len(e) for e in edges_per_code], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    all_edges = (
        np.vstack([e for e in edges_per_code if len(e)])
        if counts.sum()
        else np.empty((0, 4), dtype=np.float64)
    )
    return all_edges, offsets


def pip_pairs(
    edges_per_code: list[np.ndarray], codes: np.ndarray, px, py,
    chunk_edges: int = 32_768,
) -> np.ndarray:
    """Even-odd containment for heterogeneous (point, polygon) PAIRS —
    list-of-arrays convenience wrapper over :func:`pip_pairs_flat`."""
    all_edges, offsets = stack_edges(edges_per_code)
    return pip_pairs_flat(all_edges, offsets, codes, px, py, chunk_edges)


def pip_pairs_flat(
    all_edges: np.ndarray, offsets: np.ndarray, codes: np.ndarray, px, py,
    chunk_edges: int = 32_768,
) -> np.ndarray:
    """Even-odd containment for (point, polygon) pairs, fully vectorized.

    ``all_edges``/``offsets`` from :func:`stack_edges`; ``codes[i]`` is
    the polygon index of pair i; ``px/py`` the pair's point.  Flattens
    every pair into its polygon's edge rows (np.repeat indexing),
    evaluates the reference crossing test on all (pair, edge) rows at
    once, and segment-sums crossings per pair with np.bincount.
    Bit-for-bit the same per-edge arithmetic as
    :func:`ring_contains_points`.

    ``chunk_edges`` bounds the flattened (pair, edge) rows per inner
    step; the ~32k default keeps every temporary in L2 cache — on a
    32-core box this is both ~4x faster per core and the difference
    between DRAM-bandwidth-bound (no multi-core scaling) and
    compute-bound (near-linear scaling).
    """
    codes = np.asarray(codes, dtype=np.int64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=bool)
    counts = np.diff(offsets)
    inside = np.zeros(n, dtype=bool)

    pair_edge_counts = counts[codes]
    # chunk boundaries via searchsorted on the edge-count prefix sum
    # (no per-pair Python loop)
    cum = np.cumsum(pair_edge_counts)
    start = 0
    while start < n:
        base = cum[start - 1] if start else 0
        stop = int(np.searchsorted(cum, base + chunk_edges, side="right"))
        stop = max(stop, start + 1)  # always advance, even for huge polygons
        sl = slice(start, stop)
        cts = pair_edge_counts[sl]
        m = int(cts.sum())
        if m == 0:
            start = stop
            continue
        pair_idx = np.repeat(np.arange(stop - start), cts)
        # flattened edge index: polygon block start + within-block offset
        block_start = np.repeat(offsets[codes[sl]], cts)
        within = np.arange(m) - np.repeat(np.concatenate([[0], np.cumsum(cts)[:-1]]), cts)
        eidx = block_start + within
        e = all_edges[eidx]
        x0, y0, x1, y1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
        tx = px[sl][pair_idx]
        ty = py[sl][pair_idx]
        yf0 = y0 >= ty
        yf1 = y1 >= ty
        straddle = yf0 != yf1
        xf0 = x0 >= tx
        xf1 = x1 >= tx
        same = xf0 == xf1
        crossed = straddle & same & xf0
        hard = straddle & ~same
        if hard.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                isect = x1 - (y1 - ty) * (x0 - x1) / (y0 - y1)
            crossed = crossed | (hard & (isect >= tx))
        parity = np.bincount(pair_idx, weights=crossed, minlength=stop - start)
        inside[sl] = (parity.astype(np.int64) & 1).astype(bool)
        start = stop
    return inside


def points_in_rings_even_odd(rings: list[np.ndarray], px, py) -> np.ndarray:
    """Even-odd containment of points against ALL rings of a shape.

    For valid shapefile polygons (non-intersecting rings, holes nested in
    exteriors) summing the crossing parity over every ring is equivalent
    to "inside some exterior and not inside its holes" — the same answer
    the reference's organized-polygon containment gives, without needing
    ring organization on the hot join path.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    parity = np.zeros(len(px), dtype=np.int64)
    for r in rings:
        parity += ring_contains_points(r, px, py)
    return (parity & 1).astype(bool)
