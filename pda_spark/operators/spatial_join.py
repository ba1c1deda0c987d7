"""Cell-index spatial joins: the engine's replacement for PostGIS GiST.

Reference semantics being reproduced:
- image x land_cover ST_Intersects join (/root/reference/database/db.py:116-122,
  used at app/query.py:126-129)
- country x image ST_Intersects (db.py:219-224, app/query.py:47)
- city-buffer x image distance join (db.py:236-245, app/query.py:98)
- kNN (BASELINE north_star; absent in reference, generalizes the above)

Physical strategy (Spark-first):
1. COVER   — each polygon explodes to its covering cells at resolution R
             (arrays built in one Arrow UDF, exploded JVM-side); points map
             to exactly one cell (fully vectorized, no per-geometry loop).
2. JOIN    — plain equi-join on ``cell``. If one side is a dimension table
             (countries ~241 rows, land cover ~2.4k), it is broadcast,
             so the fact side never shuffles. Otherwise it's a shuffled
             hash join on an int64 key, range-partitionable and
             AQE-skew-splittable.
3. DEDUP   — polygon x polygon covers overlap in many cells; duplicate
             pairs are eliminated *without a shuffle* by the reference-point
             rule: a pair is emitted only by the cell that contains the
             top-left corner of the bbox-intersection of the two geometries
             (pure Catalyst arithmetic, codegen'd filter).
4. REFINE  — exact kernel predicate (vectorized PIP / intersects) as an
             Arrow UDF filter.

Skew: pass ``salt=k`` to split hot cells: the big side gets a random salt
in [0,k), the small side is replicated k times (explode of a literal
array). AQE skew-join is also on (session.py) as a safety net.

Scale notes (100 TB): the only shuffle in the whole join is step 2's
equi-join, and it disappears when the polygon side broadcasts. Resolution
R trades fan-out (cells/geometry) against refine selectivity; for web-page
points x country polygons R=6..8 keeps dimension fan-out < 100k rows while
making candidate lists small.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pda_spark.functions import geo_udfs
from pda_spark.geo import cells as C


def _salted(df: DataFrame, salt: int, side: str) -> DataFrame:
    if salt <= 1:
        return df
    if side == "big":
        return df.withColumn("_salt", (F.pmod(F.xxhash64(*df.columns), F.lit(salt))).cast("int"))
    return df.withColumn("_salt", F.explode(F.array([F.lit(i) for i in range(salt)])))


def points_in_polygons_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    point_geom: str = "geom",
    poly_geom: str = "geom",
    broadcast_polygons: bool = True,
    salt: int = 1,
    how: str = "inner",
    lonlat_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """ST_Contains/ST_Intersects join of a large point table against a
    polygon table. Columns of both inputs are preserved; clashing names
    must be disambiguated by the caller beforehand.

    ``lonlat_cols``: pass (lon, lat) column names if the point table
    already carries plain coordinates. Cell assignment and the bbox
    prefilter then run as pure Catalyst expressions and the exact PIP
    refine is the ONLY Python stage in the plan. This matters: every
    chained Arrow UDF adds a python worker per task (JVM->py->JVM hops),
    and deep UDF pipelines stop scaling with cores. Without lonlat_cols
    one combined UDF decodes WKB to (cell, lon, lat) in a single pass.
    """
    # tight cover is sound here: a point in a cell the polygon doesn't
    # touch cannot be inside the polygon.
    if lonlat_cols is not None:
        lon_c, lat_c = lonlat_cols
        pts = points.withColumns(
            {
                "_cell": geo_udfs.cell_of_xy_expr(F.col(lon_c), F.col(lat_c), res),
                "_plon": F.col(lon_c),
                "_plat": F.col(lat_c),
            }
        )
    else:
        pts = points.withColumn("_pc", geo_udfs.point_cell_lonlat(res)(F.col(point_geom)))
        pts = pts.withColumns(
            {"_cell": F.col("_pc.cell"), "_plon": F.col("_pc.lon"), "_plat": F.col("_pc.lat")}
        ).drop("_pc")
    pys = (
        polygons.withColumn("_pbb", geo_udfs.bbox_arr(F.col(poly_geom)))
        .withColumn("_cell", F.explode(geo_udfs.cover_cells(res, tight=True)(F.col(poly_geom))))
    )
    pts = _salted(pts, salt, "big")
    pys = _salted(pys, salt, "small")
    keys = ["_cell", "_salt"] if salt > 1 else ["_cell"]
    right = F.broadcast(pys) if broadcast_polygons else pys
    cand = pts.join(right, on=keys, how="inner")
    # JVM-side bbox prefilter (whole-stage codegen) — the Python refine
    # then sees only near-hit candidates.
    cand = cand.filter(
        F.col("_plon").between(F.col("_pbb")[0], F.col("_pbb")[2])
        & F.col("_plat").between(F.col("_pbb")[1], F.col("_pbb")[3])
    )
    refined = cand.filter(
        geo_udfs.point_in_polygon_lonlat(F.col("_plon"), F.col("_plat"), F.col(poly_geom))
    )
    drop = ["_cell", "_plon", "_plat", "_pbb"] + (["_salt"] if salt > 1 else [])
    return refined.drop(*drop)


def intersects_join(
    left: DataFrame,
    right: DataFrame,
    res: int = 6,
    left_geom: str = "geom",
    right_geom: str = "geom",
    broadcast_right: bool = True,
    salt: int = 1,
) -> DataFrame:
    """Polygon x polygon ST_Intersects join with shuffle-free pair dedup.

    Reproduces the reference's viewonly ST_Intersects relationships
    (db.py:116-122, 219-224). Both sides explode to covering cells; the
    reference-point rule keeps exactly one candidate per pair before the
    exact refine.
    """
    # NOTE: bbox (non-tight) covers are REQUIRED here: the reference-point
    # dedup keeps a pair only in the cell containing the SW corner of the
    # bbox intersection, and that cell is guaranteed to be in both covers
    # only for bbox covers. A tight cover could drop that cell and
    # silently lose the pair.
    lb, rb = "_lbb", "_rbb"
    lft = (
        left.withColumn(lb, geo_udfs.bbox_arr(F.col(left_geom)))
        .withColumn("_cell", F.explode(geo_udfs.cover_cells(res, tight=False)(F.col(left_geom))))
    )
    rgt = (
        right.withColumn(rb, geo_udfs.bbox_arr(F.col(right_geom)))
        .withColumn("_cell", F.explode(geo_udfs.cover_cells(res, tight=False)(F.col(right_geom))))
    )
    lft = _salted(lft, salt, "big")
    rgt = _salted(rgt, salt, "small")
    keys = ["_cell", "_salt"] if salt > 1 else ["_cell"]
    r = F.broadcast(rgt) if broadcast_right else rgt
    cand = lft.join(r, on=keys, how="inner")

    # reference-point dedup: keep the pair only in the cell holding the
    # SW corner of the bbox intersection (clamped into the intersection,
    # which is non-empty for any candidate sharing a cell).
    ref_lon = F.greatest(F.col(lb)[0], F.col(rb)[0])
    ref_lat = F.greatest(F.col(lb)[1], F.col(rb)[1])
    cand = cand.filter(F.col("_cell") == geo_udfs.cell_of_xy_expr(ref_lon, ref_lat, res))

    # JVM-side bbox-overlap prefilter: two geometries can share a cell
    # without their bboxes overlapping each other — reject those before
    # the Python refine (codegen'd comparisons on the bbox arrays).
    cand = cand.filter(
        (F.col(lb)[0] <= F.col(rb)[2])
        & (F.col(rb)[0] <= F.col(lb)[2])
        & (F.col(lb)[1] <= F.col(rb)[3])
        & (F.col(rb)[1] <= F.col(lb)[3])
    )
    refined = cand.filter(geo_udfs.intersects_pair(F.col(left_geom), F.col(right_geom)))
    drop = ["_cell", lb, rb] + (["_salt"] if salt > 1 else [])
    return refined.drop(*drop)


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 7,
    point_geom: str = "geom",
    query_geom: str = "qgeom",
    query_id: str = "query_id",
    max_ring: int = 4,
    metric: str = "meters",
    tiebreak: str | None = None,
    exact: bool = True,
    max_retries: int = 3,
) -> DataFrame:
    """k nearest points for each query point (BASELINE north_star).

    Strategy: H3-style ring expansion — each query joins candidate points
    in its cell neighbourhood (Chebyshev ring ``max_ring``), distances are
    computed in EPSG:3035 metres in one Arrow UDF, and a window
    ``row_number() over (partition by query_id order by dist)`` takes the
    top k (the reference has no kNN; SURVEY §2.3 J10).

    ``metric``: 'meters' (EPSG:3035 planar metres) or 'degrees' (planar
    lon/lat Euclidean — SQL-oracle-friendly). ``tiebreak`` optionally names
    a column for deterministic ordering among equal distances.

    ``max_ring`` seeds the candidate search; with ``exact=True`` (default)
    the result is verified per query — a kNN answer is only exact when k
    candidates were found AND the k-th distance is inside the ring's
    guaranteed radius (any point outside the Chebyshev ring is at least
    ``max_ring`` cell-steps away). Incomplete queries re-run with a 4x
    wider ring, up to ``max_retries`` times (a driver-side loop over an
    ever-smaller broadcast query set — bounded work at scale).
    """
    import numpy as np

    lat_step = 180.0 / (1 << res)
    lon_step = 360.0 / (1 << res)

    def ring_cells_udf(ring: int):
        @pandas_udf(T.StructType([
            T.StructField("cells", T.ArrayType(T.LongType())),
            T.StructField("guard", T.DoubleType()),
        ]))
        def _rc(geom: pd.Series) -> pd.DataFrame:
            from pda_spark.geo import wkb as W

            lon, lat = W.decode_points_vec([bytes(b) for b in geom])
            base = C.cell_of(lon, lat, res)
            cells_out = [[int(c) for c in C.ring(int(b), ring)] for b in base]
            # guaranteed radius: any point outside the Chebyshev ring is
            # >= ring cell-steps away in some axis. In degrees the lat
            # step is the binding one; in metres account for lon shrink
            # at the ring's extreme latitude.
            if metric == "degrees":
                guard = np.full(len(base), ring * lat_step)
            else:
                lat_ext = np.minimum(np.abs(lat) + ring * lat_step, 89.0)
                step_m = np.minimum(
                    lat_step * 110_574.0,
                    lon_step * 111_320.0 * np.cos(np.radians(lat_ext)),
                )
                guard = ring * step_m
            return pd.DataFrame({"cells": cells_out, "guard": guard})

        return _rc

    p = points.withColumn("_cell", geo_udfs.point_cell(res)(F.col(point_geom)))
    dist_udf = geo_udfs.distance_m() if metric == "meters" else geo_udfs.distance_deg()
    order = [F.col("dist_m").asc()]
    order.append(F.col(tiebreak).asc() if tiebreak else F.col(point_geom).asc())
    w = Window.partitionBy(query_id).orderBy(*order)

    def attempt(queries_df: DataFrame, ring: int) -> DataFrame:
        q = queries_df.withColumn("_rc", ring_cells_udf(ring)(F.col(query_geom)))
        q = q.withColumn("_guard", F.col("_rc.guard")).withColumn(
            "_cell", F.explode(F.col("_rc.cells"))
        ).drop("_rc")
        cand = p.join(F.broadcast(q), on="_cell", how="inner")
        cand = cand.withColumn("dist_m", dist_udf(F.col(point_geom), F.col(query_geom)))
        return (
            cand.withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
            .drop("_cell")
        )

    result = attempt(queries, max_ring)
    if not exact:
        return result.drop("_guard")

    ring = max_ring
    for _ in range(max_retries):
        # a query's answer is exact iff k candidates exist and the k-th
        # distance is within the ring's guaranteed radius
        stats = result.groupBy(query_id).agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("dist_m").alias("_kth"),
            F.first("_guard").alias("_g"),
        )
        incomplete = stats.filter((F.col("_n") < k) | (F.col("_kth") > F.col("_g")))
        bad_ids = [r[0] for r in incomplete.select(query_id).collect()]
        if not bad_ids:
            break
        ring *= 4
        redo = queries.filter(F.col(query_id).isin(bad_ids))
        fixed = attempt(redo, ring)
        result = result.filter(~F.col(query_id).isin(bad_ids)).unionByName(fixed)
    return result.drop("_guard")
