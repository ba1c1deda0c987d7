"""Geometric dissolve (ST_UNION GROUP BY) and coverage — custom UDAF work.

Reference:
- ``query_land_cover_geom_dissolved``: ST_UNION(geom) GROUP BY featureclass
  (/root/reference/app/query.py:195-213)
- coverage query: per-class dissolve + global image union + intersection
  area ratio (/root/reference/app/query.py:143-192)

Catalyst has no geometric UDAF, so dissolve runs as ``applyInPandas``
grouped-map over featureclass. Exactness: all areas are computed by
inclusion–exclusion over convex operands (intersections of convex sets
stay convex, so every term is an exact Sutherland–Hodgman clip). The
emitted union *geometry* is the multipolygon of the parts (consumers take
areas from the exact scalar, not the geometry).

Scale path (100 TB): exponential inclusion–exclusion is capped; beyond the
cap the tile/zonal operator (pda_spark.operators.tiling) computes the same
quantities cell-partitioned: clip every polygon to its covering cells
(box clips stay exact), aggregate per (key, cell) — bounded work per task,
one shuffle on (key, cell) — then sum per key. That is the partial/final
split of this UDAF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pda_spark.geo import kernels, wkb


def union_area_convex(rings: list[np.ndarray], max_exact: int = 22) -> float:
    """Exact area of the union of convex rings via inclusion–exclusion."""
    n = len(rings)
    if n == 0:
        return 0.0
    if n > max_exact:
        raise ValueError(f"{n} rings > max_exact={max_exact}: use the tiling path")
    total = 0.0

    def rec(start: int, current: np.ndarray, depth: int):
        nonlocal total
        total += ((-1) ** depth) * abs(kernels.ring_area_signed(current))
        for i in range(start, n):
            clipped = kernels.clip_convex(current, rings[i])
            if len(clipped):
                rec(i + 1, clipped, depth + 1)

    for i in range(n):
        rec(i + 1, wkb.close_ring(rings[i]), 0)
    return total


def _outer_rings(geom_bytes) -> list[np.ndarray]:
    return [p[0] for p in wkb.decode(bytes(geom_bytes)).polygons()]


DISSOLVE_SCHEMA = T.StructType(
    [
        T.StructField("featureclass", T.StringType()),
        T.StructField("geom", T.BinaryType()),
        T.StructField("union_area", T.DoubleType()),
    ]
)


def dissolve(land_cover: DataFrame, key: str = "featureclass", geom: str = "geom") -> DataFrame:
    """ST_UNION(geom) GROUP BY key. Returns (key, geom, union_area) where
    union_area is the exact planar (4326 deg^2) union area."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = [r for g in pdf[geom] for r in _outer_rings(g)]
        area = union_area_convex(rings)
        out_geom = wkb.multipolygon([[r] for r in rings])
        return pd.DataFrame(
            {"featureclass": [pdf[key].iloc[0]], "geom": [out_geom], "union_area": [area]}
        )

    return land_cover.groupBy(key).applyInPandas(fn, DISSOLVE_SCHEMA)


COVERAGE_SCHEMA = T.StructType(
    [
        T.StructField("featureclass", T.StringType()),
        T.StructField("geom", T.BinaryType()),
        T.StructField("coverage_percentage", T.DoubleType()),
    ]
)


def coverage(land_cover: DataFrame, images: DataFrame, key: str = "featureclass") -> DataFrame:
    """Reference coverage query (app/query.py:143-192): per featureclass,
    the fraction of the dissolved class geometry covered by the union of
    image footprints, as ``round(100 * ratio, 3)``.

    ``images`` must already carry the reference's filters. The image union
    never materializes: per class we compute
    area(union_ij(class_i ∩ img_j)) / area(union_i(class_i))
    by inclusion–exclusion over convex clips. Image footprints are
    broadcast to each class group (small after filters — the reference
    crossJoins two one-row aggregates, J7 in SURVEY §2.3).
    """
    img_rows = [bytes(r[0]) for r in images.select("geom").collect()]
    img_rings = [r for g in img_rows for r in _outer_rings(g)]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        class_rings = [r for g in pdf["geom"] for r in _outer_rings(g)]
        denom = union_area_convex(class_rings)
        pieces = []
        for cr in class_rings:
            for ir in img_rings:
                piece = kernels.clip_convex(cr, ir) if kernels.is_convex(ir) else kernels.clip_convex(ir, cr)
                if len(piece):
                    pieces.append(piece)
        if not pieces or denom == 0.0:
            return pd.DataFrame({"featureclass": [], "geom": [], "coverage_percentage": []})
        num = union_area_convex(pieces)
        out_geom = wkb.multipolygon([[p] for p in pieces])
        return pd.DataFrame(
            {
                "featureclass": [pdf[key].iloc[0]],
                "geom": [out_geom],
                "coverage_percentage": [round(100.0 * num / denom, 3)],
            }
        )

    return land_cover.groupBy(key).applyInPandas(fn, COVERAGE_SCHEMA)
