"""Property-based tests (hypothesis) for the round-5 geometry kernels —
randomized invariants complementing the hand-computed goldens:

- convex hull: idempotent, contains every input point, area >= any
  triangle of input points;
- positive buffer: contains the original region, grows area by at least
  perimeter*d (the rim lower bound, exact for convex);
- erosion: never grows, is monotone in d, and drops to zero by the
  inradius bound.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from pda_spark.geo import kernels

# coordinate pool: well-spread floats, no NaN/inf, bounded so areas stay
# in float64 comfort
coord = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False)


@st.composite
def point_sets(draw, min_size=4, max_size=40):
    n = draw(st.integers(min_value=min_size, max_value=max_size))
    pts = [(draw(coord), draw(coord)) for _ in range(n)]
    return np.array(pts, dtype=np.float64)


@st.composite
def convex_polys(draw, min_v=3, max_v=12):
    """Random convex polygon: hull of a random point set (retry via
    filtering for degenerate hulls)."""
    pts = draw(point_sets(min_size=max_v, max_size=3 * max_v))
    ring = kernels.convex_hull(pts)
    # need a genuine polygon: at least a triangle with NON-SLIVER area
    # (near-degenerate slivers stress float tolerances, not geometry
    # semantics — the dedicated golden tests pin those separately)
    if len(ring) - 1 < min_v or abs(kernels.ring_area_signed(ring)) < 1.0:
        # fall back to a deterministic triangle offset by a drawn shift
        dx, dy = draw(coord), draw(coord)
        ring = np.array(
            [[dx, dy], [dx + 10, dy], [dx + 4, dy + 7], [dx, dy]], dtype=np.float64
        )
    return ring


@settings(max_examples=60, deadline=None)
@given(point_sets())
def test_hull_contains_inputs_and_is_idempotent(pts):
    ring = kernels.convex_hull(pts)
    if len(ring) - 1 < 3 or abs(kernels.ring_area_signed(ring)) < 1e-3:
        return  # (near-)collinear set: sliver float tolerances off-topic
    # hull of hull vertices is the same vertex set
    again = kernels.convex_hull(ring[:-1])
    assert {tuple(p) for p in again[:-1]} == {tuple(p) for p in ring[:-1]}
    # every input point is inside or on the hull (pad by tiny epsilon to
    # absorb the ray-cast's open boundary)
    grown = kernels.buffer_polys([[ring]], 1e-6)
    assert kernels.points_in_polygons(pts, grown).all()
    # CCW orientation: positive signed area
    assert kernels.ring_area_signed(ring) > 0


@settings(max_examples=40, deadline=None)
@given(convex_polys(), st.floats(min_value=0.05, max_value=5.0, allow_nan=False))
def test_buffer_grows_by_at_least_perimeter_rim(ring, d):
    a0 = abs(kernels.ring_area_signed(ring))
    per = float(np.sum(np.hypot(*(np.diff(ring, axis=0).T))))
    out = kernels.buffer_polys([[ring]], d)
    a1 = kernels.polygons_area(out)
    # convex dilation bounds: edges contribute exactly per*d; the corner
    # fans sum to a full turn, discretized between the inscribed 32-gon
    # (arc points only) and the true disc (the direct path's exact-normal
    # arc ENDPOINTS add small sagitta slivers above the 32-gon fraction)
    a32 = 0.5 * 32 * np.sin(2 * np.pi / 32)
    assert a1 >= a0 + per * d + a32 * d * d - 1e-6 * max(1.0, a1)
    assert a1 <= a0 + per * d + np.pi * d * d + 1e-6 * max(1.0, a1)
    # original vertices are strictly interior to the buffered region
    assert kernels.points_in_polygons(ring[:-1], out).all()


@settings(max_examples=40, deadline=None)
@given(convex_polys(), st.floats(min_value=0.05, max_value=3.0, allow_nan=False))
def test_erosion_never_grows_and_is_monotone(ring, d):
    a0 = abs(kernels.ring_area_signed(ring))
    e1 = kernels.erosion_area([[ring]], d)
    e2 = kernels.erosion_area([[ring]], 2 * d)
    assert -1e-9 <= e1 <= a0 + 1e-9
    assert e2 <= e1 + 1e-9
    # eroding past any inradius bound empties the polygon: the inradius
    # of a convex region is at most sqrt(area/pi) (disc maximizes area
    # for a given inradius)
    big = float(np.sqrt(a0 / np.pi)) + 1e-6
    assert abs(kernels.erosion_area([[ring]], big)) < 1e-6 * max(1.0, a0)
