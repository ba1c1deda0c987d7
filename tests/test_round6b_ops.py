"""Round-6 batch-2 operators: tile pyramid rollup, geohash encode,
edit-distance near-dup join, focal gradient, areal interpolation.

Each test verifies against an INDEPENDENT re-derivation (textbook
bisection geohash, brute-force levenshtein cross product, hand-computed
grids, conservation laws) — never the operator's own arithmetic.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pda_spark.functions import dedup, geo_udfs
from pda_spark.geo import cells as C
from pda_spark.geo import wkb as W
from pda_spark.operators import tiling


def _mk(res, ix, iy):
    return int(C.cell_id(res, np.asarray([ix]), np.asarray([iy]))[0])


# ------------------------------------------------------------ pyramid


def test_tile_pyramid_conservation_and_nesting(spark):
    """Every zoom level conserves the total; each parent tile's value is
    the sum of its (up to 4) children — the defining pyramid invariants,
    checked against an independent dict-based rollup."""
    res = 6
    rng = np.random.default_rng(11)
    ix = rng.integers(0, 1 << res, 300)
    iy = rng.integers(0, 1 << res, 300)
    v = rng.integers(1, 50, 300)
    agg = {}
    for a, b, w in zip(ix, iy, v):
        agg[(int(a), int(b))] = agg.get((int(a), int(b)), 0) + int(w)
    cnt = spark.createDataFrame(
        [(_mk(res, a, b), n) for (a, b), n in agg.items()], "cell long, n long"
    )
    out = tiling.tile_pyramid(cnt, res=res, min_res=2)
    rows = out.collect()
    total = sum(agg.values())
    by_zoom = {}
    got = {}
    for r in rows:
        by_zoom[r["zoom"]] = by_zoom.get(r["zoom"], 0) + r["n"]
        got[(r["zoom"], r["tx"], r["ty"])] = r["n"]
    assert sorted(by_zoom) == [2, 3, 4, 5, 6]
    assert all(s == total for s in by_zoom.values())
    # zoom == res reproduces the input table exactly
    for (a, b), n in agg.items():
        assert got[(res, a, b)] == n
    # independent rollup: shift in python
    for z in range(2, res):
        exp = {}
        for (a, b), n in agg.items():
            k = (z, a >> (res - z), b >> (res - z))
            exp[k] = exp.get(k, 0) + n
        assert {k: v for k, v in got.items() if k[0] == z} == exp
    # packed cell id decodes back to (tx, ty) at the right res
    for r in rows:
        assert r["cell"] == (r["zoom"] << 58) + (r["tx"] << 29) + r["ty"]


# ------------------------------------------------------------ geohash


def _geohash_ref(lon, lat, precision):
    """Textbook bisection geohash (independent algorithm: interval
    halving, not quantize-and-interleave)."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    out = []
    for i in range(precision):
        c = 0
        for b in bits[i * 5 : i * 5 + 5]:
            c = (c << 1) | b
        out.append(geo_udfs.GEOHASH_BASE32[c])
    return "".join(out)


def test_geohash_matches_textbook_bisection(spark):
    rng = np.random.default_rng(7)
    pts = [(i, float(lo), float(la)) for i, (lo, la) in enumerate(
        zip(rng.uniform(-180, 180, 150), rng.uniform(-90, 90, 150))
    )]
    # domain corners and the wrap edge (lon=180 / lat=90 clamp into the
    # last cell, which is exactly what always-take-the-right-half does)
    edge = [(900, -180.0, -90.0), (901, 180.0, 90.0), (902, 0.0, 0.0),
            (903, 179.999999, -89.999999), (904, -0.000001, 0.000001)]
    df = spark.createDataFrame(pts + edge, "i long, lon double, lat double")
    for prec in (2, 6, 8):
        got = {
            r["i"]: r["gh"]
            for r in df.select(
                "i", geo_udfs.geohash_expr(F.col("lon"), F.col("lat"), prec).alias("gh")
            ).collect()
        }
        for i, lon, lat in pts + edge:
            assert got[i] == _geohash_ref(lon, lat, prec), (i, lon, lat, prec)


def test_geohash_rejects_odd_precision(spark):
    with pytest.raises(ValueError):
        geo_udfs.geohash_expr(F.col("lon"), F.col("lat"), 5)
    with pytest.raises(ValueError):
        geo_udfs.geohash_sql("lon", "lat", 12)


def test_geohash_prefix_nesting(spark):
    """gh8 of a point always extends its gh6 — the multi-precision cells
    nest (the property prefix-range scans rely on)."""
    rng = np.random.default_rng(13)
    df = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in zip(
            rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200))],
        "lon double, lat double",
    )
    bad = df.select(
        geo_udfs.geohash_expr(F.col("lon"), F.col("lat"), 6).alias("g6"),
        geo_udfs.geohash_expr(F.col("lon"), F.col("lat"), 8).alias("g8"),
    ).filter(~F.col("g8").startswith(F.col("g6")))
    assert bad.count() == 0


# ------------------------------------------------------ edit distance


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_bruteforce_parity(spark):
    """Length-band blocking must reproduce the exhaustive cross product
    exactly — verified against a pure-python DP levenshtein at
    max_dist=2 over strings whose lengths straddle band boundaries."""
    rng = np.random.default_rng(3)
    strs = []
    for i in range(120):
        n = int(rng.integers(1, 9))
        strs.append((i, "".join(rng.choice(list("abc"), n))))
    df = spark.createDataFrame(strs, "sid long, s string")
    out = dedup.edit_distance_pairs(df, id_col="sid", str_col="s", max_dist=2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    exp = {}
    for i, (ia, sa) in enumerate(strs):
        for ib, sb in strs[i + 1 :]:
            d = _lev(sa, sb)
            if d <= 2:
                exp[(ia, ib)] = d
    assert got == exp
    assert exp, "fixture degenerate: no qualifying pairs"
    # pairs that cross a length band exist in the fixture (the case
    # blocking could lose)
    assert any(len(strs[a][1]) // 3 != len(strs[b][1]) // 3 for a, b in exp)
    # the hot-band salted plan must emit the identical pair set
    salted = dedup.edit_distance_pairs(df, id_col="sid", str_col="s", max_dist=2, salt_bands=3)
    got_salted = {(r["id_a"], r["id_b"]): r["dist"] for r in salted.collect()}
    assert got_salted == exp


# ------------------------------------------------------ focal gradient


def test_focal_gradient_hand_computed(spark):
    """Central differences on a hand grid: dzdx = v(east) - v(west),
    dzdy = v(north) - v(south), absent neighbors 0; only value-carrying
    cells are emitted; edge cells clip out-of-bounds neighbors."""
    res = 3
    cnt = spark.createDataFrame(
        [(_mk(res, 1, 1), 5), (_mk(res, 2, 1), 3), (_mk(res, 1, 2), 7),
         (_mk(res, 0, 0), 2)],
        "cell long, n long",
    )
    out = {r["cell"]: r for r in tiling.focal_gradient(cnt, res=res).collect()}
    r11 = out[_mk(res, 1, 1)]
    assert (r11["dzdx"], r11["dzdy"], r11["slope_sq"]) == (3 - 0, 7 - 0, 9 + 49)
    r21 = out[_mk(res, 2, 1)]
    assert (r21["dzdx"], r21["dzdy"]) == (0 - 5, 0)
    r12 = out[_mk(res, 1, 2)]
    assert (r12["dzdx"], r12["dzdy"]) == (0, 0 - 5)
    # corner donor: both out-of-bounds neighbors contribute nothing
    r00 = out[_mk(res, 0, 0)]
    assert (r00["dzdx"], r00["dzdy"]) == (0, 0)
    # (0,1) carries no value -> not emitted even though it has neighbors
    assert _mk(res, 0, 1) not in out
    assert set(out) == {_mk(res, 1, 1), _mk(res, 2, 1), _mk(res, 1, 2), _mk(res, 0, 0)}


# --------------------------------------------------- areal interpolate


def test_areal_interpolate_conservation(spark):
    """Weights per zone sum to 1 and contributions to the zone value
    (mass conservation); a zone with a hole excludes the hole's area;
    integer zone ids survive the internal string round-trip."""
    res = 4
    # zone 1: plain box; zone 2: box with a centered hole
    outer = np.array([[-40.0, 10.0], [20.0, 10.0], [20.0, 50.0], [-40.0, 50.0], [-40.0, 10.0]])
    hole = np.array([[-10.0, 25.0], [-10.0, 35.0], [0.0, 35.0], [0.0, 25.0], [-10.0, 25.0]])
    zones = spark.createDataFrame(
        [
            (1, 600.0, bytearray(W.box(-100.0, -40.0, -60.0, 0.0))),
            (2, 900.0, bytearray(W.polygon([outer, hole]))),
        ],
        "zid int, val double, geom binary",
    )
    out = tiling.areal_interpolate(zones, res=res, zone_id="zid", value_col="val", geom="geom")
    rows = out.collect()
    assert out.schema["zid"].dataType.simpleString() == "int"
    wsum = {1: 0.0, 2: 0.0}
    csum = {1: 0.0, 2: 0.0}
    for r in rows:
        assert 0.0 < r["weight"] <= 1.0
        wsum[r["zid"]] += r["weight"]
        csum[r["zid"]] += r["contribution"]
    assert wsum[1] == pytest.approx(1.0, abs=1e-9)
    assert wsum[2] == pytest.approx(1.0, abs=1e-9)
    assert csum[1] == pytest.approx(600.0, abs=1e-6)
    assert csum[2] == pytest.approx(900.0, abs=1e-6)
    # the hole is excluded: total overlap area = zone area (area_planar
    # of the holed polygon), so the hole's cells carry reduced weight —
    # cross-check one fully-inside-hole containment: no cell weight may
    # exceed cellarea / zonearea where zonearea excludes the hole
    cell_w = 360.0 / (1 << res)
    cell_h = 180.0 / (1 << res)
    zarea2 = (60.0 * 40.0) - (10.0 * 10.0)
    for r in rows:
        if r["zid"] == 2:
            assert r["weight"] <= cell_w * cell_h / zarea2 + 1e-9


# ------------------------------------------------------------ moran's I


def test_morans_i_checkerboard_negative_blocks_positive(spark):
    """Sign sanity on the two textbook patterns: a checkerboard (perfect
    dispersion) gives strongly negative I; two homogeneous blocks give
    positive I. Components cross-checked against a python O(m^2) loop."""
    res = 3

    def run(cells):
        df = spark.createDataFrame(
            [(_mk(res, a, b), v) for a, b, v in cells], "cell long, n long"
        )
        r = tiling.morans_i_components(df, res=res).collect()[0]
        # independent brute force
        m = len(cells)
        s = sum(v for _, _, v in cells)
        dev = {(a, b): m * v - s for a, b, v in cells}
        pairs = [
            (dev[i], dev[j])
            for i in dev
            for j in dev
            if i != j and abs(i[0] - j[0]) <= 1 and abs(i[1] - j[1]) <= 1
        ]
        num = sum(a * b for a, b in pairs)
        den = sum(d * d for d in dev.values())
        assert (r["m_cells"], r["w_pairs"], r["num_scaled"], r["den_scaled"]) == (
            m, len(pairs), num, den,
        )
        assert r["morans_i"] == pytest.approx((m * num) / (len(pairs) * den), abs=0)
        return r["morans_i"]

    # QUEEN contiguity: checkerboard diagonals are same-colored, so the
    # dispersion signal is diluted to ~-0.14 (rook-only would be near -1)
    checker = [(a, b, (a + b) % 2 * 10 + 1) for a in range(4) for b in range(4)]
    blocks = [(a, b, 10 if a < 2 else 1) for a in range(4) for b in range(4)]
    assert run(checker) < -0.05
    assert run(blocks) > 0.3


def test_morans_i_grid_edge_clipping(spark):
    """Cells on the grid border have fewer queen neighbors; W must count
    only in-bounds pairs (corner cell: 3 neighbors when occupied)."""
    res = 2  # 4x4 grid
    df = spark.createDataFrame(
        [(_mk(res, 0, 0), 5), (_mk(res, 0, 1), 2), (_mk(res, 1, 0), 3),
         (_mk(res, 1, 1), 4)],
        "cell long, n long",
    )
    r = tiling.morans_i_components(df, res=res).collect()[0]
    # all four cells are mutual queen neighbors: 4*3 directed pairs
    assert r["w_pairs"] == 12 and r["m_cells"] == 4


# ------------------------------------------------------ paragraph dedup


def test_dedup_paragraphs_first_occurrence(spark):
    """Cross-doc: the shared paragraph survives only in the lowest
    (doc_id, pos); within-doc repeats keep only the first; all-dup docs
    emit a NULL clean_text row; unique paragraphs always survive."""
    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared promo\nbeta"),
            (2, "shared promo\ngamma\ngamma"),
            (3, "shared promo"),
            (4, "delta\nalpha"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.dedup_paragraphs_global(docs).collect()}
    assert out[1]["clean_text"] == "alpha\nshared promo\nbeta"
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (3, 0)
    # doc 2: promo already owned by doc 1; second gamma is a within-doc dup
    assert out[2]["clean_text"] == "gamma"
    assert (out[2]["n_kept"], out[2]["n_removed"]) == (1, 2)
    # doc 3 is ALL duplicates -> row still present, NULL text
    assert out[3]["clean_text"] is None
    assert (out[3]["n_kept"], out[3]["n_removed"]) == (0, 1)
    # 'alpha' was first seen in doc 1 pos 0, so doc 4 loses it
    assert out[4]["clean_text"] == "delta"


# ------------------------------------------------------------- hilbert


def _xy2d_ref(res, x, y):
    """Independent python reference (classic xy2d loop)."""
    n = 1 << res
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_adjacency_bijectivity(spark):
    """The defining curve property: enumerating d = 0..n^2-1 walks the
    grid in UNIT steps (|dx|+|dy| == 1 between consecutive keys) and
    visits every cell exactly once. Z-order fails this (it jumps)."""
    res = 4
    n = 1 << res
    grid = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("gx"), F.pmod(F.col("id"), F.lit(n)).alias("gy")
    )
    rows = geo_udfs.hilbert_key(grid, "gx", "gy", res).collect()
    assert len({r["hilbert_d"] for r in rows}) == n * n
    inv = {r["hilbert_d"]: (r["gx"], r["gy"]) for r in rows}
    for k in range(n * n - 1):
        (x0, y0), (x1, y1) = inv[k], inv[k + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1, k
    # and matches the independent python reference
    for r in rows:
        assert r["hilbert_d"] == _xy2d_ref(res, r["gx"], r["gy"])


def test_hilbert_locality_beats_zorder_chunks(spark):
    """64-row chunks of the hilbert sort are 8x8 blocks (max side 7) AND
    every within-chunk step is a unit step; the z-order sort has equal
    bbox sides here but takes long jumps — hilbert's strict adjacency is
    what keeps range scans sequential."""
    n = 32
    res = 5
    grid = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("gx"), F.pmod(F.col("id"), F.lit(n)).alias("gy")
    )
    h = sorted(
        geo_udfs.hilbert_key(grid, "gx", "gy", res).collect(),
        key=lambda r: r["hilbert_d"],
    )
    worst = 0
    for i in range(0, len(h), 64):
        c = h[i : i + 64]
        xs = [r["gx"] for r in c]
        ys = [r["gy"] for r in c]
        worst = max(worst, max(max(xs) - min(xs), max(ys) - min(ys)))
    assert worst == 7
    jumps = [
        abs(b["gx"] - a["gx"]) + abs(b["gy"] - a["gy"]) for a, b in zip(h, h[1:])
    ]
    assert max(jumps) == 1
    z = sorted(
        grid.select("gx", "gy", geo_udfs.zorder_expr(F.col("gx"), F.col("gy")).alias("z")).collect(),
        key=lambda r: r["z"],
    )
    zjumps = [abs(b["gx"] - a["gx"]) + abs(b["gy"] - a["gy"]) for a, b in zip(z, z[1:])]
    assert max(zjumps) > 1  # the Z in Z-order


def test_hilbert_deep_res_linear_plan(spark):
    """res 16 (65536^2 grid): parity with the python reference — an
    exponentially-inlined projection chain could never execute 16
    levels, so passing here pins the linear-plan property."""
    rng = np.random.default_rng(21)
    res = 16
    n = 1 << res
    rows = [(int(a), int(b)) for a, b in zip(rng.integers(0, n, 40), rng.integers(0, n, 40))]
    df = spark.createDataFrame(rows, "gx long, gy long")
    got = {(r["gx"], r["gy"]): r["hilbert_d"] for r in geo_udfs.hilbert_key(df, "gx", "gy", res).collect()}
    for x, y in rows:
        assert got[(x, y)] == _xy2d_ref(res, x, y)


# ------------------------------------------------------ inverted index


def test_inverted_index_hand_fixture(spark):
    """Postings on a hand corpus: tf counts repeats, positions are
    0-based token offsets in order, df counts docs containing the term,
    whitespace runs collapse, case folds."""
    from pda_spark.functions import text as T

    docs = spark.createDataFrame(
        [(1, "the cat  sat on THE mat"), (2, "a cat\tand a dog"), (3, "mat")],
        "doc_id long, text string",
    )
    rows = {
        (r["term"], r["doc_id"]): r
        for r in T.inverted_index(docs).collect()
    }
    r = rows[("the", 1)]
    assert (r["tf"], r["df"], r["positions"]) == (2, 1, "0,4")
    assert (rows[("cat", 1)]["positions"], rows[("cat", 2)]["positions"]) == ("1", "1")
    assert rows[("cat", 1)]["df"] == 2
    assert rows[("mat", 3)] == rows[("mat", 3)]  # exists
    assert rows[("mat", 3)]["positions"] == "0" and rows[("mat", 3)]["df"] == 2
    assert rows[("a", 2)]["tf"] == 2 and rows[("a", 2)]["positions"] == "0,3"
    # no empty-string terms from the double space
    assert all(t for t, _ in rows)


# ------------------------------------------- round-6 review regressions


def test_pnm_comment_terminates_token():
    """A '#' comment immediately after a digit ends that token (the
    comment's newline is whitespace per the Netpbm spec) — the old
    tokenizer merged digits across the comment (round-6 review)."""
    from pda_spark.functions import multimodal as M

    px = np.arange(20, dtype=np.uint8).reshape(4, 5)
    payload = b"P5\n5#comment\n4 255\n" + px.tobytes()
    assert np.array_equal(M.decode_image(payload), px)


def test_bmp_color_palette_refused():
    """An 8-bit BMP with a non-grayscale palette must raise rather than
    silently return palette indices as gray values (round-6 review);
    the identity-grayscale palette our encoder writes still decodes."""
    from pda_spark.functions import multimodal as M

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    ok = bytearray(M.encode_bmp(gray))
    assert np.array_equal(M.decode_image(bytes(ok)), gray)
    bad = bytearray(ok)
    # palette starts at offset 54; make entry 1 a color (B!=G)
    bad[54 + 4] = 200
    with pytest.raises(ValueError, match="palette"):
        M.decode_image(bytes(bad))


def test_paragraph_dedup_literal_separator(spark):
    """sep is a literal, not a regex: '.' must split on dots only
    (round-6 review — F.split takes a Java regex)."""
    docs = spark.createDataFrame(
        [(1, "aa.bb"), (2, "bb.cc")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           dedup.dedup_paragraphs_global(docs, sep=".").collect()}
    assert out[1]["clean_text"] == "aa.bb"
    assert out[2]["clean_text"] == "cc" and out[2]["n_removed"] == 1


def test_kmeans_zero_norm_vector_excluded(spark):
    """A zero vector must not poison the fit with NaN: objective stays
    finite and centroids are driven by the nonzero vectors (round-6
    review)."""
    from pda_spark.functions import similarity as S

    rows = [(0, [0.0, 0.0, 0.0, 0.0])] + [
        (i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.5])
        for i in range(1, 13)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, history = S.kmeans_fit(df, n_centroids=3, n_iter=2, scale_bits=20)
    assert all(np.isfinite(h) for h in history)
    assert all(np.isfinite(v) for c in cents for v in c)


def test_udtf_shingle_rows_unique_views(spark):
    """Two shingle_rows calls on DIFFERENT inputs in one session must
    not clobber each other's input view (round-6 review: the fixed view
    name raced and leaked)."""
    from pda_spark.functions import udtfs as U

    a = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "zyxwvu")], "doc_id long, text string")
    ra = U.shingle_rows(a, k=6)
    rb = U.shingle_rows(b, k=6)
    assert [r["shingle"] for r in ra.collect()] == ["abcdef"]
    assert [r["shingle"] for r in rb.collect()] == ["zyxwvu"]
    # no leaked catalog entries
    assert not [v.name for v in spark.catalog.listTables() if v.name.startswith("_udtf_docs_in")]


# ---------------------------------------------------------- staypoints


def test_staypoints_chain_segmentation(spark):
    """Chain rule on a hand trajectory: a close chain forms one stay, a
    jump starts the next; singletons drop under min_events; integer
    centroid sums are exact centi-degrees."""
    import datetime as dt

    from pda_spark.operators import temporal

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3-point stay, jump, 2-point stay
        (1, 1, t0, 0.00, 0.0), (1, 2, t0 + dt.timedelta(minutes=1), 0.01, 0.0),
        (1, 3, t0 + dt.timedelta(minutes=2), 0.02, 0.0),
        (1, 4, t0 + dt.timedelta(minutes=3), 10.00, 10.0),
        (1, 5, t0 + dt.timedelta(minutes=4), 10.01, 10.0),
        # user 2: lone point -> filtered
        (2, 6, t0, 5.0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, lon double, lat double"
    )
    out = {(r["user_id"], r["stay_id"]): r for r in
           temporal.staypoints(df, max_gap_deg=0.5, min_events=2).collect()}
    assert set(out) == {(1, 1), (1, 2)}
    s1, s2 = out[(1, 1)], out[(1, 2)]
    assert s1["n_events"] == 3 and s2["n_events"] == 2
    assert (s1["sum_clon"], s1["sum_clat"]) == (0 + 1 + 2, 0)
    assert (s2["sum_clon"], s2["sum_clat"]) == (1000 + 1001, 2000)
    assert s1["end_us"] - s1["start_us"] == 120_000_000
    assert s2["start_us"] > s1["end_us"]


# ----------------------------------------------------- density clusters


def test_density_clusters_hand_grid(spark):
    """Two diagonal-linked blobs, one isolated dense cell, sub-threshold
    cells excluded; labels are component minima; singleton labels
    itself."""
    res = 4
    cells = [
        # blob A: (1,1),(2,2) touch diagonally (queen)
        (_mk(res, 1, 1), 10), (_mk(res, 2, 2), 12),
        # blob B: (8,8),(8,9)
        (_mk(res, 8, 8), 20), (_mk(res, 8, 9), 11),
        # isolated dense
        (_mk(res, 13, 2), 30),
        # sub-threshold: adjacent to blob A but NOT dense -> no bridge
        (_mk(res, 3, 3), 4),
    ]
    df = spark.createDataFrame(cells, "cell long, n long")
    out = {r["cell"]: r for r in
           tiling.density_clusters(df, res=res, min_pts=10).collect()}
    assert set(out) == {c for c, v in cells if v >= 10}
    a = min(_mk(res, 1, 1), _mk(res, 2, 2))
    b = min(_mk(res, 8, 8), _mk(res, 8, 9))
    assert out[_mk(res, 1, 1)]["cluster_id"] == a
    assert out[_mk(res, 2, 2)]["cluster_id"] == a
    assert out[_mk(res, 8, 8)]["cluster_id"] == b
    assert out[_mk(res, 8, 9)]["cluster_id"] == b
    assert out[_mk(res, 13, 2)]["cluster_id"] == _mk(res, 13, 2)
    # the sub-threshold cell must not merge A with anything
    assert out[_mk(res, 1, 1)]["cluster_id"] != b


# ------------------------------------------------------------ OD flows


def test_od_flows_hand_trajectory(spark):
    """Hand trajectory: dwell steps (same cell) emit nothing; each
    cross-cell step is one trip; flows aggregate across users."""
    import datetime as dt

    from pda_spark.operators import temporal

    res = 4
    # cell centers: pick lon/lat inside distinct res-4 cells
    def lonlat(ix, iy):
        return (-180.0 + (ix + 0.5) * 360.0 / 16, -90.0 + (iy + 0.5) * 180.0 / 16)

    A, B, Cc = lonlat(3, 3), lonlat(4, 3), lonlat(5, 5)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: A A B A  -> A->B, B->A
    for i, (lon, lat) in enumerate([A, A, B, A]):
        rows.append((1, i, t0 + dt.timedelta(minutes=i), lon, lat))
    # user 2: B C  -> B->C ; user 3: A B -> A->B (second A->B trip)
    rows.append((2, 10, t0, B[0], B[1]))
    rows.append((2, 11, t0 + dt.timedelta(minutes=1), Cc[0], Cc[1]))
    rows.append((3, 20, t0, A[0], A[1]))
    rows.append((3, 21, t0 + dt.timedelta(minutes=1), B[0], B[1]))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, lon double, lat double")
    out = {(r["o_cell"], r["d_cell"]): r["n_trips"]
           for r in temporal.od_flows(df, res=res).collect()}
    ca, cb, cc = _mk(res, 3, 3), _mk(res, 4, 3), _mk(res, 5, 5)
    assert out == {(ca, cb): 2, (cb, ca): 1, (cb, cc): 1}


# ------------------------------------------------------------ pagerank


def test_pagerank_matches_numpy_power_iteration(spark):
    """Variable-degree hand graph vs an independent numpy dense-matrix
    power iteration at textbook damping 0.85; dangling node (4) keeps
    rank but redistributes nothing; no-in-link node settles toward
    (1-d)."""
    from pda_spark.functions import graph

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # 4 dangling, 3 no-in
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    iters, d = 4, 0.85
    out = {r["id"]: r["rank"] for r in graph.pagerank(nodes, e, iters=iters, damping=d).collect()}

    import numpy as np

    deg = {0: 2, 1: 1, 2: 1, 3: 1}
    r = np.ones(5)
    for _ in range(iters):
        nxt = np.full(5, 1 - d)
        for u, v in edges:
            nxt[v] += d * r[u] / deg[u]
        r = nxt
    for i in range(5):
        assert abs(out[i] - r[i]) < 1e-12, (i, out[i], r[i])
    assert abs(out[3] - (1 - d)) < 1e-12  # no in-links: fixed at (1-d)


# ------------------------------------------------------------ mann-kendall


def test_mann_kendall_vs_bruteforce(spark):
    """Hand series per key vs an independent O(T^2) Python loop:
    monotone-up hits the n(n-1)/2 ceiling, monotone-down its negative,
    constant is 0, and a mixed series with ties matches the brute sum
    of sign(x_j - x_i)."""
    from pda_spark.operators import temporal

    series = {
        "up": [1, 2, 3, 5, 9],          # S = 10 = 5*4/2
        "down": [9, 7, 4, 2],           # S = -6
        "flat": [4, 4, 4, 4, 4, 4],     # S = 0
        "mixed": [3, 1, 4, 1, 5, 9, 2, 6],
    }
    rows = [(k, t, x) for k, xs in series.items() for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, t int, x int")
    out = {r["key"]: (r["n_t"], r["s_stat"])
           for r in temporal.mann_kendall_trend(df).collect()}

    def brute(xs):
        return sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(len(xs)) for j in range(i + 1, len(xs))
        )

    for k, xs in series.items():
        assert out[k] == (len(xs), brute(xs)), (k, out[k], brute(xs))
    assert out["up"][1] == 10 and out["down"][1] == -6 and out["flat"][1] == 0


def test_mann_kendall_singleton_key(spark):
    """A key with one observation has no pairs: the left join must keep
    it with s_stat coalesced to 0, not drop it."""
    from pda_spark.operators import temporal

    df = spark.createDataFrame([("solo", 0, 7)], "key string, t int, x int")
    assert temporal.mann_kendall_trend(df).collect()[0].asDict() == {
        "key": "solo", "n_t": 1, "s_stat": 0}


# ------------------------------------------------------------ co-occurrence


def test_term_cooccurrence_vs_bruteforce(spark):
    """Hand corpus vs an itertools re-derivation; the df ceiling drops
    the every-doc stopword ('the' has df=4, failing the 3/4 ceiling
    df*4 <= 3*N), and a repeated token within one doc counts once
    (distinct per-doc sets)."""
    from itertools import combinations

    from pda_spark.functions import text as T

    docs = [
        (1, "the cat sat sat on the mat"),
        (2, "the cat ate the fish"),
        (3, "the dog sat on the log"),
        (4, "the dog ate a bone"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["term_a"], r["term_b"]): (r["n_ab"], r["df_a"], r["df_b"])
           for r in T.term_cooccurrence(
               df, min_df=2, max_df_num=3, max_df_den=4,
               min_pair_num=1, min_pair_den=4).collect()}

    sets = {i: set(t.split()) for i, t in docs}
    n = len(docs)
    dfreq = {}
    for s in sets.values():
        for tok in s:
            dfreq[tok] = dfreq.get(tok, 0) + 1
    kept = {t for t, d in dfreq.items() if d >= 2 and d * 4 <= 3 * n}
    assert "the" not in kept and "cat" in kept  # ceiling bites, floor keeps
    pairs = {}
    for s in sets.values():
        for a, b in combinations(sorted(s & kept), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    expect = {p: (c, dfreq[p[0]], dfreq[p[1]])
              for p, c in pairs.items() if c * 4 >= 1 * n}
    assert out == expect and len(out) > 0
    assert all(a < b for a, b in out)  # unordered pairs emitted once


# ------------------------------------------------------------ getis-ord


def test_getis_ord_vs_textbook(spark):
    """Hand grid vs the unscaled textbook Gi* z-score computed in numpy
    ((wx - x_bar*W) / (S*sqrt((n*W - W^2)/(n-1))), S the population sd)
    — the operator's m^2-scaled integer components must cancel back to
    the same float; window membership (incl. self, grid edges) checked
    via the w_nbrs/wx_sum integers."""
    import math

    from pda_spark.operators import tiling

    res = 4
    # L-shaped occupied set with a hot corner; (0,0) sits on the grid edge
    cells = {(0, 0): 9, (0, 1): 7, (1, 0): 5, (3, 3): 1, (3, 4): 2, (8, 8): 4}
    rows = [(_mk(res, ix, iy), v) for (ix, iy), v in cells.items()]
    df = spark.createDataFrame(rows, "cell long, n long")
    out = {r["cell"]: r for r in tiling.getis_ord_components(df, res=res).collect()}
    assert len(out) == len(cells)

    m = len(cells)
    sx = sum(cells.values())
    sx2 = sum(v * v for v in cells.values())
    xbar = sx / m
    s_sd = math.sqrt(sx2 / m - xbar * xbar)
    for (ix, iy), v in cells.items():
        nb = [(jx, jy) for (jx, jy) in cells if abs(jx - ix) <= 1 and abs(jy - iy) <= 1]
        w = len(nb)
        wx = sum(cells[p] for p in nb)
        r = out[_mk(res, ix, iy)]
        assert (r["x"], r["w_nbrs"], r["wx_sum"]) == (v, w, wx)
        assert r["num_scaled"] == m * wx - sx * w
        expect = (wx - xbar * w) / (s_sd * math.sqrt((m * w - w * w) / (m - 1)))
        assert abs(r["gi_z"] - expect) < 1e-12, ((ix, iy), r["gi_z"], expect)
    # the isolated singleton (8,8) is its own whole window: W=1, wx=x
    r88 = out[_mk(res, 8, 8)]
    assert (r88["w_nbrs"], r88["wx_sum"]) == (1, 4)


def test_getis_ord_degenerate_window_null(spark):
    """Two adjacent occupied cells: each window covers ALL occupied
    cells, so B = m*W - W^2 = 0 and gi_z must be NULL (undefined), with
    the integer components still emitted."""
    from pda_spark.operators import tiling

    res = 4
    df = spark.createDataFrame(
        [(_mk(res, 5, 5), 3), (_mk(res, 5, 6), 8)], "cell long, n long"
    )
    rows = tiling.getis_ord_components(df, res=res).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["gi_z"] is None and r["w_nbrs"] == 2 and r["wx_sum"] == 11


# ------------------------------------------------------------ lm coverage


def test_lm_coverage_vs_bruteforce(spark):
    """Hand corpus vs a pure-Python re-derivation that re-implements the
    md5 split, the ratio-thresholded vocabulary, the train bigram set,
    and the per-held-out-doc counters independently; asserts both
    splits are non-empty and at least one OOV and one unseen bigram
    occur."""
    import hashlib
    from pda_spark.functions import text as T

    corpus = {
        1: "the cat sat on the mat",
        2: "the dog sat on a log",
        3: "a cat and a dog",
        4: "the rare quokka sat quietly",
        5: "dog eats the cat food",
        6: "cat naps on the mat",
        7: "a dog and the cat",
        8: "mat cat dog the a on",
        9: "the the the cat cat",
        10: "on a mat sat a dog",
        11: "zebra jumps over the cat",
        12: "the dog on the mat",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tok"], r["n_oov"], r["n_bigrams"], r["n_bg_unseen"])
           for r in T.lm_coverage(df, min_df=1, min_df_num=1, min_df_den=4).collect()}

    def is_train(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) % 100 < 80

    train = {i for i in corpus if is_train(i)}
    held = set(corpus) - train
    assert train and held and set(out) == held
    toks = {i: corpus[i].split() for i in corpus}
    dfreq = {}
    for i in train:
        for t in set(toks[i]):
            dfreq[t] = dfreq.get(t, 0) + 1
    vocab = {t for t, d in dfreq.items() if d * 4 >= len(train)}
    tr_bg = {(a, b) for i in train for a, b in zip(toks[i], toks[i][1:])}
    expect = {}
    for i in held:
        ts = toks[i]
        bgs = list(zip(ts, ts[1:]))
        expect[i] = (
            len(ts),
            sum(1 for t in ts if t not in vocab),
            len(bgs),
            sum(1 for b in bgs if b not in tr_bg),
        )
    assert out == expect
    assert any(v[1] > 0 for v in out.values())  # OOV exercised
    assert any(v[3] > 0 for v in out.values())  # unseen bigram exercised


# ------------------------------------------------------------ hll sketch


def test_hll_registers_vs_python(spark):
    """Register/rho assignment vs an independent hashlib re-derivation
    (top-8-bit register, leading-zero rank of the remaining 40 bits),
    and the estimate lands within 5 standard errors (1.04/sqrt(m)) of
    the true cardinality."""
    import hashlib

    from pda_spark.functions import sketch

    n = 5000
    ids = [f"item-{i}" for i in range(n)]
    df = spark.createDataFrame([(s,) for s in ids], "k string")
    regs = {r["register"]: r["max_rho"]
            for r in sketch.hll_registers(df, "k", p=8).collect()}

    expect = {}
    for s in ids:
        h = int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
        reg, v = h >> 40, h & ((1 << 40) - 1)
        rho = 41 if v == 0 else 41 - v.bit_length()
        expect[reg] = max(expect.get(reg, 0), rho)
    assert regs == expect

    est = sketch.hll_estimate(sketch.hll_registers(df, "k", p=8), p=8).collect()[0]
    rel = abs(est["estimate"] - n) / n
    assert rel < 5 * 1.04 / (256 ** 0.5), (est["estimate"], rel)
    assert est["n_occupied"] == len(expect)


def test_hll_merge_is_union(spark):
    """The defining HLL property: max-merging two register tables gives
    exactly the register table of the concatenated input — duplication
    across the halves is free."""
    from pyspark.sql import functions as F

    from pda_spark.functions import sketch

    a = spark.createDataFrame([(f"x-{i}",) for i in range(0, 700)], "k string")
    b = spark.createDataFrame([(f"x-{i}",) for i in range(300, 1000)], "k string")
    merged = (
        sketch.hll_registers(a, "k").unionAll(sketch.hll_registers(b, "k"))
        .groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    )
    whole = sketch.hll_registers(a.unionAll(b), "k")
    got = {r["register"]: r["max_rho"] for r in merged.collect()}
    want = {r["register"]: r["max_rho"] for r in whole.collect()}
    assert got == want


# ------------------------------------------------------------ hausdorff


def test_hausdorff_vs_scipy_style_bruteforce(spark):
    """Hand trajectories vs an independent O(n*m) Python double loop
    (the scipy.directed_hausdorff definition); asymmetric fixture makes
    h(A->B) != h(B->A) so the symmetric max is actually exercised, and
    a duplicated point shows set semantics."""
    from pda_spark.operators import temporal

    trajs = {
        1: [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (2.0, 0.0)],  # dup point
        2: [(0.0, 1.0), (1.0, 1.0)],
        3: [(10.0, 10.0), (11.0, 12.0), (9.5, 10.5)],
    }
    rows = [(k, x, y) for k, ps in trajs.items() for x, y in ps]
    pts = spark.createDataFrame(rows, "k long, x double, y double")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "key_a long, key_b long"
    )
    out = {(r["key_a"], r["key_b"]): r["hausdorff_sq"]
           for r in temporal.hausdorff_join(pts, pairs, key_col="k").collect()}

    def d2(p, q):
        return (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2

    def hdir(a, b):
        return max(min(d2(p, q) for q in b) for p in a)

    for ka, kb in [(1, 2), (1, 3), (2, 3)]:
        expect = max(hdir(trajs[ka], trajs[kb]), hdir(trajs[kb], trajs[ka]))
        assert out[(ka, kb)] == expect, ((ka, kb), out[(ka, kb)], expect)
    # directions genuinely differ for (1,2): (2,0) is 2+1 away from B,
    # while every B point is 1 away from A
    assert hdir(trajs[1], trajs[2]) != hdir(trajs[2], trajs[1])


# ------------------------------------------------------------ dbscan


def test_dbscan_vs_bruteforce(spark):
    """Hand point set vs an independent textbook DBSCAN (python sets +
    BFS closure): two chained clusters, a border point attached to the
    smaller-labelled cluster, and isolated noise. eps-grid blocking must
    reproduce the exact-distance result."""
    from pda_spark.operators import tiling

    pts = {
        # cluster A: 5-point eps-chain (eps=1.1, min_pts=3)
        1: (0.0, 0.0), 2: (1.0, 0.0), 3: (2.0, 0.0), 4: (1.0, 1.0), 5: (0.0, 1.0),
        # cluster B
        6: (10.0, 10.0), 7: (11.0, 10.0), 8: (10.0, 11.0), 9: (11.0, 11.0),
        # border of A: within eps of core 3 only, degree 2 < min_pts
        10: (3.0, 0.0),
        # noise
        11: (50.0, 50.0),
    }
    eps, min_pts = 1.1, 3
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x double, y double"
    )
    out = {r["id"]: (r["is_core"], r["cluster_id"])
           for r in tiling.dbscan(df, eps=eps, min_pts=min_pts).collect()}

    def d2(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

    nb = {i: {j for j in pts if d2(pts[i], pts[j]) <= eps * eps} for i in pts}
    cores = {i for i in pts if len(nb[i]) >= min_pts}
    lab = {}
    for c in sorted(cores):
        if c in lab:
            continue
        comp, stack = set(), [c]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(v for v in nb[u] if v in cores and v not in comp)
        for u in comp:
            lab[u] = min(comp)
    expect = {}
    for i in pts:
        if i in cores:
            expect[i] = (True, lab[i])
        else:
            near_cores = [lab[j] for j in nb[i] if j in cores]
            expect[i] = (False, min(near_cores) if near_cores else None)
    assert out == expect
    assert expect[10] == (False, 1) and expect[11] == (False, None)  # border+noise
    assert expect[1][1] != expect[6][1]  # two distinct clusters


# ------------------------------------------------------------ count-min


def test_cms_overestimate_and_merge(spark):
    """The two defining CMS properties against exact truth: every
    estimate >= the true count (never under), and union+re-sum of two
    half-stream sketches equals the whole-stream sketch. Also checks
    the never-seen item path (est can only come from collisions)."""
    from pyspark.sql import functions as F

    from pda_spark.functions import sketch

    stream = [f"k{i % 17}" for i in range(400)] + ["hot"] * 100
    df = spark.createDataFrame([(s,) for s in stream], "v string")
    cms = sketch.cms_build(df, "v", d=4, w=32)
    items = spark.createDataFrame(
        [(k,) for k in {*stream, "never-seen"}], "v string"
    )
    est = {r["item"]: r["est"]
           for r in sketch.cms_query(cms, items, "v", d=4, w=32).collect()}
    true = {}
    for s in stream:
        true[s] = true.get(s, 0) + 1
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    assert est["hot"] >= 100
    assert est["never-seen"] >= 0  # pure-collision path exercised

    a = spark.createDataFrame([(s,) for s in stream[:250]], "v string")
    b = spark.createDataFrame([(s,) for s in stream[250:]], "v string")
    merged = (
        sketch.cms_build(a, "v", d=4, w=32)
        .unionAll(sketch.cms_build(b, "v", d=4, w=32))
        .groupBy("hrow", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    got = {(r["hrow"], r["bucket"]): r["cnt"] for r in merged.collect()}
    want = {(r["hrow"], r["bucket"]): r["cnt"] for r in cms.collect()}
    assert got == want


# ------------------------------------------------------------ triangles


def test_triangle_counts_vs_bruteforce(spark):
    """Hand graph (two triangles sharing an edge + a pendant + a
    4-cycle with no triangle) vs itertools combinations; also feeds the
    operator directed/duplicated edges to check canonicalization."""
    from itertools import combinations

    from pda_spark.functions import graph

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4),   # triangles 123, 234
           (4, 5),                                    # pendant
           (6, 7), (7, 8), (8, 9), (9, 6)]            # square, no tri
    # present each edge messy: reversed + duplicated
    rows = und + [(b, a) for a, b in und] + und[:3]
    df = spark.createDataFrame(rows, "src long, dst long")
    out = {r["id"]: r["n_tri"] for r in graph.triangle_counts(df).collect()}

    nodes = {n for e in und for n in e}
    eset = {frozenset(e) for e in und}
    expect = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= eset:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    assert out == expect
    assert sum(out.values()) % 3 == 0 and sum(out.values()) // 3 == 2


# ------------------------------------------------------------ funnel


def test_funnel_vs_bruteforce(spark):
    """Hand event streams vs a Python earliest-cascade re-derivation:
    full completion, window-expired step, wrong-order events (purchase
    before click doesn't count), strictly-after semantics at equal
    timestamps, and a user with no step-1 event excluded."""
    from pda_spark.operators import temporal

    W = 100
    ev = [
        # u1 completes: view@10, click@20, purchase@30
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click inside window, purchase outside (10+100 < 200)
        (2, "view", 10), (2, "click", 50), (2, "purchase", 200),
        # u3: purchase BEFORE click -> level 2 only
        (3, "view", 10), (3, "purchase", 15), (3, "click", 40),
        # u4: click at exactly t1 -> NOT strictly after -> level 1
        (4, "view", 10), (4, "click", 10),
        # u5: no view at all -> excluded
        (5, "click", 5), (5, "purchase", 6),
        # u6: earliest-cascade pins t1=5 even though the later view@50
        # would admit completion -> this is the documented semantics
        (6, "view", 5), (6, "view", 50), (6, "click", 60), (6, "purchase", 300),
    ]
    df = spark.createDataFrame(ev, "user_id long, event_type string, ts_us long")
    out = {r["user_id"]: (r["t1"], r["t2"], r["t3"], r["funnel_level"])
           for r in temporal.funnel(df, ["view", "click", "purchase"], W).collect()}

    def cascade(rows):
        t1 = min((t for ty, t in rows if ty == "view"), default=None)
        if t1 is None:
            return None
        t2 = min((t for ty, t in rows if ty == "click" and t > t1 and t <= t1 + W),
                 default=None)
        t3 = None
        if t2 is not None:
            t3 = min((t for ty, t in rows if ty == "purchase" and t > t2 and t <= t1 + W),
                     default=None)
        lvl = 1 + (t2 is not None) + (t3 is not None)
        return (t1, t2, t3, lvl)

    expect = {}
    for u in {r[0] for r in ev}:
        c = cascade([(ty, t) for uu, ty, t in ev if uu == u])
        if c is not None:
            expect[u] = c
    assert out == expect
    assert out[1][3] == 3 and out[2][3] == 2 and out[3][3] == 2
    assert out[4][3] == 1 and 5 not in out
    assert out[6] == (5, 60, None, 2)  # cascade pins the EARLIEST t1


# ------------------------------------------------------------ retention


def test_cohort_retention_vs_bruteforce(spark):
    """Hand activity vs a dict re-derivation; two cohorts, gaps in the
    offset axis, dedup of multiple same-period events."""
    from pda_spark.operators import temporal

    P = 10
    ev = [(1, 1), (1, 2), (1, 12), (1, 35),          # cohort 0: active 0,1,3
          (2, 5), (2, 7),                            # cohort 0: active 0 only
          (3, 21), (3, 39), (3, 41)]                 # cohort 2: active 0,1,2
    df = spark.createDataFrame(ev, "user_id long, ts_us long")
    out = {(r["cohort_period"], r["offset"]): r["n_users"]
           for r in temporal.cohort_retention(df, period_us=P).collect()}
    expect = {(0, 0): 2, (0, 1): 1, (0, 3): 1, (2, 0): 1, (2, 1): 1, (2, 2): 1}
    assert out == expect


# ------------------------------------------------------------ skyline


def test_skyline_vs_bruteforce(spark):
    """Random-ish hand grid vs a double-loop dominance check; includes
    an exact-duplicate frontier point (both must survive — equal rows
    never dominate each other) and a mixed min/max criterion set.
    Partition-independence: the same set comes back at 1 and 8
    partitions (phase-1 local filtering is lossless)."""
    from pda_spark.operators import pareto

    rows = [(i, (i * 37) % 11, (i * 53) % 13, (i * 29) % 7) for i in range(60)]
    rows += [(100, 0, 12, 6), (101, 0, 12, 6)]  # duplicate frontier pts
    df = spark.createDataFrame(rows, "id long, cost int, perf int, cap int")

    def dominated(a, b):  # b dominates a?
        return (b[1] <= a[1] and b[2] >= a[2] and b[3] >= a[3]
                and (b[1] < a[1] or b[2] > a[2] or b[3] > a[3]))

    expect = {r[0] for r in rows if not any(dominated(r, o) for o in rows)}
    for parts in (1, 8):
        got = {r["id"] for r in pareto.skyline(
            df.repartition(parts), minimize=["cost"], maximize=["perf", "cap"]
        ).collect()}
        assert got == expect, (parts, got ^ expect)
    assert {100, 101} <= expect  # duplicates both on the frontier


# ------------------------------------------------------------ cusum


def test_cusum_vs_bruteforce(spark):
    """Hand series vs a Python re-derivation of dev_k = n*cum_k - k*S:
    a clean level shift locates the change point at the shift boundary;
    a tie (symmetric series) breaks to the SMALLEST t; a flat series
    has max_absdev 0."""
    from pda_spark.operators import timeseries

    series = {
        "shift": [2, 2, 2, 2, 8, 8, 8, 8],       # cp at the last low point
        "tie": [1, 0, 0, 1],                      # dev symmetric -> min t
        "flat": [5, 5, 5],
    }
    rows = [(k, t, x) for k, xs in series.items() for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, t int, x int")
    out = {r["key"]: (r["n_t"], r["total"], r["max_absdev"], r["cp_t"])
           for r in timeseries.cusum_changepoint(df).collect()}

    for k, xs in series.items():
        n, s = len(xs), sum(xs)
        devs = []
        cum = 0
        for i, x in enumerate(xs, start=1):
            cum += x
            devs.append(abs(n * cum - i * s))
        mx = max(devs)
        cp = devs.index(mx)  # first occurrence == smallest t
        assert out[k] == (n, s, mx, cp), (k, out[k], (n, s, mx, cp))
    assert out["shift"][3] == 3      # boundary before the level shift
    assert out["flat"][2] == 0
    assert out["tie"][3] == 0        # tie broken to earliest t


# ------------------------------------------------------------ profiling


def test_profile_table_vs_pandas(spark):
    """Mixed-type fixture with NULLs and duplicates vs pandas nunique/
    isna; doubles that format differently ('1.0' vs 1) must still count
    distinctly per engine-independent semantics."""
    from pda_spark.functions import profiling

    rows = [
        (1, 1.0, "a", None),
        (2, 1.0, "a", "x"),
        (3, None, "b", "x"),
        (3, 2.5, None, "y"),
        (4, 2.5, "b", None),
    ]
    df = spark.createDataFrame(rows, "i long, d double, s string, t string")
    out = {r["column"]: (r["n_rows"], r["n_null"], r["n_distinct"])
           for r in profiling.profile_table(df).collect()}
    assert out == {
        "i": (5, 0, 4),
        "d": (5, 1, 2),
        "s": (5, 1, 2),
        "t": (5, 2, 2),
    }
