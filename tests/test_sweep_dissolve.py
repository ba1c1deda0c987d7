"""Scanline kernel (geo.sweep) + non-convex/holed dissolve & coverage.

Covers the round-1 gaps: non-convex operands, polygons with holes, true
dissolved geometry output, >max_exact overlapping rings (the legacy
inclusion–exclusion cap), and driver-collect-free coverage."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pda_spark.geo import kernels, sweep, wkb
from pda_spark.operators import dissolve, tiling


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


L_SHAPE = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]], float)
U_SHAPE = np.array(
    [[0, 0], [3, 0], [3, 2], [2, 2], [2, 0.5], [1, 0.5], [1, 2], [0, 2], [0, 0]], float
)


# ------------------------------------------------------------ pure kernel


def test_sweep_union_known_shapes():
    assert sweep.union_area([[sq(0, 0, 1, 1)], [sq(0.5, 0.5, 1.5, 1.5)]]) == pytest.approx(1.75)
    assert sweep.union_area([[sq(0, 0, 1, 1)], [sq(2, 0, 3, 1)]]) == pytest.approx(2.0)
    assert sweep.union_area([[L_SHAPE]]) == pytest.approx(3.0)
    # polygon with hole: 16 - 4; plus a plug filling part of the hole
    outer, hole = sq(0, 0, 4, 4), sq(1, 1, 3, 3)
    assert sweep.union_area([[outer, hole]]) == pytest.approx(12.0)
    assert sweep.union_area([[outer, hole], [sq(1.5, 1.5, 2.5, 2.5)]]) == pytest.approx(13.0)


def test_sweep_matches_inclusion_exclusion_on_convex():
    rng = np.random.default_rng(3)
    for _ in range(5):
        rings = []
        for _ in range(8):
            cx, cy = rng.uniform(0, 5, 2)
            r = rng.uniform(0.3, 1.5)
            th = np.sort(rng.uniform(0, 2 * np.pi, 12))
            rings.append(np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)]))
        exact = dissolve.union_area_convex([wkb.close_ring(r) for r in rings])
        got = sweep.union_area([[r] for r in rings])
        assert got == pytest.approx(exact, rel=1e-12)


def test_sweep_intersect_union():
    assert sweep.intersect_union_area([[U_SHAPE]], [[sq(-1, 1, 4, 2)]]) == pytest.approx(2.0)
    outer, hole = sq(0, 0, 4, 4), sq(1, 1, 3, 3)
    # hole excluded from the intersection
    assert sweep.intersect_union_area([[outer, hole]], [[sq(0, 0, 2, 2)]]) == pytest.approx(3.0)
    assert sweep.intersect_union_area(
        [[outer, hole]], [[sq(1.5, 1.5, 2.5, 2.5)]]
    ) == pytest.approx(0.0)


def test_sweep_union_geometry_partitions_union():
    polys = [[L_SHAPE], [sq(0.5, 0.5, 1.5, 1.5)], [sq(2.5, 0, 3.5, 1)]]
    area, quads = sweep.union_geometry(polys)
    assert area == pytest.approx(3.25 + 1.0)
    # parts are non-overlapping and cover exactly the union
    assert sum(abs(kernels.ring_area_signed(q)) for q in quads) == pytest.approx(area, rel=1e-12)
    pts = np.array(
        [[x, y] for x in np.linspace(-0.3, 3.8, 30) for y in np.linspace(-0.3, 2.3, 24)]
    )
    src = np.zeros(len(pts), dtype=bool)
    for p in polys:
        src |= kernels.points_in_polygons(pts, [p])
    dis = kernels.points_in_polygons(pts, [[q] for q in quads])
    assert (src == dis).all()


def test_sweep_many_overlapping_rings_polynomial():
    """>22 overlapping rings: the legacy inclusion–exclusion path raises;
    the sweep kernel must give the exact answer cheaply. 40 concentric
    shifted squares whose union is computable in closed form."""
    rings = [sq(i * 0.1, 0, i * 0.1 + 1.0, 1.0) for i in range(40)]
    with pytest.raises(ValueError):
        dissolve.union_area_convex([wkb.close_ring(r) for r in rings])
    # union = bounding box [0, 4.9] x [0, 1]
    assert sweep.union_area([[r] for r in rings]) == pytest.approx(4.9)


def test_intersection_area_nonconvex_fallback():
    ga = wkb.decode(wkb.polygon([U_SHAPE]))
    gb = wkb.decode(wkb.polygon([L_SHAPE + np.array([0.5, 0.0])]))
    # neither convex: round 1 raised here; now exact via sweep
    got = kernels.intersection_area(ga, gb)
    brute = sweep.intersect_union_area([[U_SHAPE]], [[L_SHAPE + np.array([0.5, 0.0])]])
    assert got == pytest.approx(brute, rel=1e-12)
    assert got > 0


# ------------------------------------------------------- Spark operators


@pytest.fixture(scope="module")
def holed_world(spark):
    """Two featureclasses of non-convex / holed polygons + image boxes."""
    outer, hole = sq(0, 0, 4, 4), sq(1, 1, 3, 3)
    lc_rows = [
        ("urban", bytearray(wkb.polygon([outer, hole]))),
        ("urban", bytearray(wkb.polygon([L_SHAPE + np.array([5.0, 0.0])]))),
        ("water", bytearray(wkb.polygon([U_SHAPE + np.array([0.0, 5.0])]))),
    ]
    img_rows = [
        (1, bytearray(wkb.polygon([sq(0, 0, 2, 2)]))),       # hits urban ring part
        (2, bytearray(wkb.polygon([sq(5.2, 0.2, 6.2, 1.2)]))),  # hits the L
        (3, bytearray(wkb.polygon([sq(-1, 5.8, 4, 7.2)]))),  # hits the U arms
    ]
    lc = spark.createDataFrame(lc_rows, "featureclass string, geom binary")
    img = spark.createDataFrame(img_rows, "id int, geom binary")
    return lc, img


EXPECT_URBAN_AREA = 12.0 + 3.0          # holed square + L
EXPECT_WATER_AREA = 4.5                 # U


def test_dissolve_nonconvex_holes(spark, holed_world):
    lc, _ = holed_world
    rows = {r["featureclass"]: r for r in dissolve.dissolve(lc).collect()}
    assert rows["urban"]["union_area"] == pytest.approx(EXPECT_URBAN_AREA, rel=1e-12)
    assert rows["water"]["union_area"] == pytest.approx(EXPECT_WATER_AREA, rel=1e-12)
    # dissolved geometry covers exactly the union (PIP parity, hole stays open)
    g = wkb.decode(bytes(rows["urban"]["geom"]))
    assert kernels.area_planar(g) == pytest.approx(EXPECT_URBAN_AREA, rel=1e-12)
    pts = np.array([[2.0, 2.0], [0.5, 0.5], [6.0, 0.5], [5.5, 1.5], [2.0, 4.5]])
    got = kernels.points_in_polygons(pts, g.polygons())
    assert list(got) == [False, True, True, True, False]  # hole center excluded


def test_dissolve_cell_routed_matches(spark, holed_world):
    lc, _ = holed_world
    exact = {r["featureclass"]: r["union_area"] for r in dissolve.dissolve(lc).collect()}
    for res in (3, 6):
        cellr = dissolve.dissolve(lc, cells_res=res).collect()
        got = {r["featureclass"]: r["union_area"] for r in cellr}
        assert got.keys() == exact.keys()
        for k in exact:
            assert got[k] == pytest.approx(exact[k], rel=1e-9), f"{k} res={res}"
        # cell-routed geometry also partitions the union exactly
        for r in cellr:
            g = wkb.decode(bytes(r["geom"]))
            assert kernels.area_planar(g) == pytest.approx(exact[r["featureclass"]], rel=1e-9)


def test_dissolve_auto_routes_hot_key(spark):
    """Round-3 auto-routing: a hot key above the piece threshold must be
    dissolved via the cell-partitioned path (no single straggler task),
    with EXACT area parity against a numpy 1D interval-union oracle
    (boxes share one y-band, so union area = interval union x height)."""
    n = 6000
    i = np.arange(n)
    x0 = (i * 13 % 1000).astype(float)
    x1 = x0 + (i % 40) + 1.0
    rows = [("hot", bytearray(wkb.box(a, 0.0, b, 1.0))) for a, b in zip(x0, x1)]
    rows += [("cold", bytearray(wkb.box(float(j), 0.0, float(j) + 0.5, 1.0))) for j in range(10)]
    df = spark.createDataFrame(rows, "featureclass string, geom binary")

    # numpy oracle: 1D interval union of the hot key
    order = np.lexsort((x1, x0))
    area = 0.0
    cur0, cur1 = None, None
    for a, b in zip(x0[order], x1[order]):
        if cur0 is None or a > cur1:
            if cur0 is not None:
                area += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    area += cur1 - cur0

    out = dissolve.dissolve(df, cells_res="auto", route_threshold=1000)
    # the auto decision must have picked the cell path: two grouped
    # pandas stages (per-cell union + per-key merge) instead of one
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 2, "hot key was not cell-routed"
    got = {r["featureclass"]: r["union_area"] for r in out.collect()}
    assert got["hot"] == pytest.approx(area, rel=1e-12)
    assert got["cold"] == pytest.approx(5.0, rel=1e-12)

    # below the threshold the same input stays on the one-task path
    plan2 = (
        dissolve.dissolve(df, cells_res="auto", route_threshold=100_000)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan2.count("FlatMapGroupsInPandas") == 1


def test_union_area_by_cells_handles_holes(spark, holed_world):
    lc, _ = holed_world
    got = {r["key"]: r["union_area"] for r in tiling.union_area_by_cells(lc, res=6).collect()}
    assert got["urban"] == pytest.approx(EXPECT_URBAN_AREA, rel=1e-9)
    assert got["water"] == pytest.approx(EXPECT_WATER_AREA, rel=1e-9)


def test_coverage_nonconvex_no_driver_collect(spark, holed_world):
    lc, img = holed_world
    rows = {r["featureclass"]: r for r in dissolve.coverage(lc, img, res=4).collect()}
    # urban: img1 ∩ (holed sq) = 2x2 - 1x1 = 3 ; img2 ∩ L' = 0.8x1... compute:
    # L' = L+(5,0): img2 = sq(5.2,0.2,6.2,1.2) ∩ L' -> area:
    # L' covers [5,7]x[0,1] plus [5,6]x[1,2]; img2 ∩ [5.2,6.2]x[0.2,1] = 0.8
    # plus [5.2,6]x[1,1.2] = 0.16 -> 0.96
    num_urban = 3.0 + 0.96
    assert rows["urban"]["coverage_percentage"] == pytest.approx(
        round(100.0 * num_urban / EXPECT_URBAN_AREA, 3)
    )
    # water: U'=U+(0,5); img3 = sq(-1,5.8,4,7.2) covers U's arms above y=5.8:
    # arms [0,1]x[5.8,7] and [2,3]x[5.8,7] -> 2*1.2 = 2.4
    assert rows["water"]["coverage_percentage"] == pytest.approx(
        round(100.0 * 2.4 / EXPECT_WATER_AREA, 3)
    )
    # intersection geometry partitions the numerator
    g = wkb.decode(bytes(rows["urban"]["geom"]))
    assert kernels.area_planar(g) == pytest.approx(num_urban, rel=1e-9)


def test_coverage_res_invariant(spark, holed_world):
    lc, img = holed_world
    a = {r["featureclass"]: r["coverage_percentage"] for r in dissolve.coverage(lc, img, res=3).collect()}
    b = {r["featureclass"]: r["coverage_percentage"] for r in dissolve.coverage(lc, img, res=7).collect()}
    assert a == b


def test_coverage_no_matching_images_empty(spark, holed_world):
    lc, img = holed_world
    far = img.withColumn("geom", F.lit(bytearray(wkb.polygon([sq(50, 50, 51, 51)]))))
    assert dissolve.coverage(lc, far, res=4).count() == 0


def test_merged_boundary_shapes():
    """Round-3: merged-boundary output (PostGIS ST_UNION shape) — ring
    and vertex counts are minimal, area is shoelace-exact, holes attach
    to the right outer."""
    # L-union of two overlapping squares -> ONE ring, exactly 8 vertices
    polys = [
        [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)],
        [np.array([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]], float)],
    ]
    area, quads = sweep.union_geometry(polys)
    merged = sweep.merged_boundary_polygons(quads)
    assert len(merged) == 1 and len(merged[0]) == 1
    ring = merged[0][0]
    assert len(ring) - 1 == 8  # no collinear trapezoid slivers
    assert abs(kernels.ring_area_signed(ring)) == pytest.approx(28.0, rel=1e-12)

    # frame (square with hole): outer 4 vertices + hole 4 vertices
    frame = [
        [
            np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float),
            np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], float),
        ]
    ]
    a2, q2 = sweep.union_geometry(frame)
    m2 = sweep.merged_boundary_polygons(q2)
    assert len(m2) == 1 and len(m2[0]) == 2
    assert len(m2[0][0]) - 1 == 4 and len(m2[0][1]) - 1 == 4
    assert kernels.polygons_area(m2) == pytest.approx(84.0, rel=1e-12)

    # two disjoint squares -> two polygons, 4 vertices each
    two = [
        [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)],
        [np.array([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]], float)],
    ]
    _a3, q3 = sweep.union_geometry(two)
    m3 = sweep.merged_boundary_polygons(q3)
    assert sorted(len(p[0]) - 1 for p in m3) == [4, 4] and len(m3) == 2


def test_merged_boundary_random_property():
    """Random slanted triangles + boxes: merged output must preserve the
    exact union area (shoelace over polygons-with-holes) and agree with
    the trapezoid decomposition on a PIP probe grid."""
    rng = np.random.default_rng(3)
    polys = []
    for _ in range(12):
        cx, cy = rng.uniform(0, 10, 2)
        w, h = rng.uniform(0.5, 3.0, 2)
        polys.append([np.array([[cx, cy], [cx + w, cy], [cx + w, cy + h], [cx, cy + h], [cx, cy]])])
    for _ in range(8):
        p = rng.uniform(0, 10, (3, 2))
        if abs(kernels.ring_area_signed(np.vstack([p, p[:1]]))) < 0.2:
            continue
        polys.append([np.vstack([p, p[:1]])])
    area, quads = sweep.union_geometry(polys)
    merged = sweep.merged_boundary_polygons(quads)
    assert kernels.polygons_area(merged) == pytest.approx(area, rel=1e-9)
    # vertex economy: merged boundary has far fewer vertices than the quads
    n_quad_verts = sum(len(q) - 1 for q in quads)
    n_merged_verts = sum(len(r) - 1 for p in merged for r in p)
    assert n_merged_verts < n_quad_verts
    # PIP parity on a probe grid (strictly between boundaries a.s.)
    gx, gy = np.meshgrid(np.linspace(0.05, 10.05, 41), np.linspace(0.05, 10.05, 41))
    probes = np.column_stack([gx.ravel(), gy.ravel()])
    got = kernels.points_in_polygons(probes, merged)
    exp = kernels.points_in_polygons(probes, [[q] for q in quads])
    assert (got == exp).all()


def test_dissolve_output_is_merged(spark, holed_world):
    """dissolve() geometry is the merged-boundary multipolygon: the
    'urban' key (two overlapping holed shapes) must come back with a
    small ring count, not hundreds of trapezoid slivers."""
    lc, _ = holed_world
    rows = {r["featureclass"]: r for r in dissolve.dissolve(lc).collect()}
    g = wkb.decode(bytes(rows["urban"]["geom"]))
    n_rings = sum(len(rings) for rings in g.polygons())
    n_verts = sum(len(r) - 1 for rings in g.polygons() for r in rings)
    assert n_rings <= 6 and n_verts <= 60
    assert kernels.area_planar(g) == pytest.approx(EXPECT_URBAN_AREA, rel=1e-12)


def test_dissolve_cleanup_buffer_matches_reference_semantics(spark, holed_world):
    """Reference parity for ST_UNION(ST_BUFFER(ST_TRANSFORM(geom,3035),d))
    (app/query.py:158): each input is offset d metres BEFORE the union.
    With d=1km on degree-scale fixtures the rim is visible but small:
    area strictly grows, holes shrink but stay open, and a sub-2d gap
    between inputs is healed (the buffer's original GEOS-cleanup role)."""
    lc, _ = holed_world
    plain = {r["featureclass"]: r["union_area"] for r in dissolve.dissolve(lc).collect()}
    buffered = {
        r["featureclass"]: r
        for r in dissolve.dissolve(lc, cleanup_buffer_m=1000.0).collect()
    }
    for k in plain:
        grown = buffered[k]["union_area"]
        assert grown > plain[k]
        # 1 km on a ~1-degree-scale shape adds ~0.009 deg rim: well
        # under 20% growth, never a blow-up
        assert grown < plain[k] * 1.2
    # the urban hole (2x2 deg) survives a 1 km inward shrink
    g = wkb.decode(bytes(buffered["urban"]["geom"]))
    assert not kernels.points_in_polygons(np.array([[2.0, 2.0]]), g.polygons())[0]
    # gap healing: two squares 0.005 deg (~550 m) apart merge under a
    # 1 km buffer into ONE ring (buffer-then-union, not union-then-buffer)
    a = sq(0, 0, 1, 1)
    b = sq(1.005, 0, 2.005, 1)
    df = spark.createDataFrame(
        [("k", bytearray(wkb.polygon([a]))), ("k", bytearray(wkb.polygon([b])))],
        "featureclass string, geom binary",
    )
    healed = dissolve.dissolve(df, cleanup_buffer_m=1000.0).collect()[0]
    rings = wkb.decode(bytes(healed["geom"])).polygons()
    assert len(rings) == 1  # one merged polygon, gap closed
    unhealed = dissolve.dissolve(df).collect()[0]
    assert len(wkb.decode(bytes(unhealed["geom"])).polygons()) == 2
