"""Raster <-> vector zonal operators: tile rasterization + cell-partitioned
exact union areas (BASELINE north_star: "performs raster<->vector zonal
joins by rasterizing land-cover classes to tile grids").

Two layers:

1. ``rasterize_polygons`` — polygons -> (key, tile) rows at a chosen
   resolution (tile ids are the engine's int64 cells). Tiles whose
   rectangle intersects the geometry are emitted; this is the raster side
   of a zonal join and a plain equi-join key against any tiled point /
   raster table.

2. ``union_area_by_cells`` — the SCALE path for the dissolve/coverage
   UDAF (operators/dissolve.py is exact but inclusion-exclusion is
   exponential in overlapping-ring count). Cells partition the plane, so
   area(union(polys)) == sum over cells of area(union(polys clipped to
   cell)). Clipping to a cell box is an exact Sutherland-Hodgman convex
   clip, each per-cell subproblem is small (bounded by local overlap
   density), and the whole computation is one explode + one grouped
   aggregation — the partial/final split of a geometric UDAF, with the
   shuffle keyed on (key, cell) so hot classes spread over many tasks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pda_spark.functions import geo_udfs
from pda_spark.geo import sweep, wkb


def rasterize_polygons(
    polygons: DataFrame,
    res: int,
    key: str = "featureclass",
    geom: str = "geom",
    tight: bool = True,
) -> DataFrame:
    """Polygons -> (key, tile) assignments at resolution ``res``.

    ``tight`` drops tiles that only touch the bbox, not the geometry
    (exact-clip test per cell, Arrow UDF). ``tight=False`` runs the
    bbox cover as ONE Arrow bbox decode + a codegen'd JVM fan-out —
    ~10x the tile throughput, and equal to tight for axis-aligned
    footprints. Output is deduplicated per (key, tile) — the zonal-join
    contract is 'this class covers this tile', not one row per source
    polygon.
    """
    if tight:
        cover = F.explode(geo_udfs.cover_cells(res, tight=True)(F.col(geom)))
        out = polygons.select(F.col(key).alias("key"), cover.alias("tile"))
    else:
        bb = geo_udfs.bbox_arr(F.col(geom))
        tmp = polygons.select(F.col(key).alias("key"), bb.alias("_bb"))
        cover = geo_udfs.cover_cells_bbox_expr(
            F.col("_bb")[0], F.col("_bb")[1], F.col("_bb")[2], F.col("_bb")[3], res
        )
        out = tmp.select("key", F.explode(cover).alias("tile"))
    return out.dropDuplicates(["key", "tile"])


def cluster_by_cell(df: DataFrame, cell_col: str = "tile", num_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort by cell id before writing (the north-star's
    'repartitionByRange on cell id'): output parquet files then hold
    disjoint, sorted cell ranges, so any downstream cell-range predicate
    prunes whole files via parquet min/max stats, and cell-keyed
    merge-joins read co-located data. Spatially adjacent cells share the
    int64 prefix (res<<58|ix<<29|iy), so ranges are also spatially
    coherent per x-stripe."""
    parts = [num_partitions] if num_partitions else []
    return df.repartitionByRange(*parts, F.col(cell_col)).sortWithinPartitions(cell_col)


def zonal_count_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int,
    key: str = "featureclass",
    poly_geom: str = "geom",
    point_tile: str = "tile",
) -> DataFrame:
    """Zonal statistics: per polygon-class count of tiled points. The
    raster side is broadcast when small; the point side never shuffles
    (pre-tiled fact table). Approximate by construction at coarse ``res``
    (tile granularity) — the exact path is points_in_polygons_join."""
    raster = rasterize_polygons(polygons, res, key=key, geom=poly_geom)
    return (
        points.join(F.broadcast(raster), points[point_tile] == raster["tile"], "inner")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("cell", T.LongType()),
        T.StructField("area", T.DoubleType()),
    ]
)


def union_area_by_cells(
    polygons: DataFrame,
    res: int,
    key: str = "featureclass",
    geom: str = "geom",
) -> DataFrame:
    """Exact planar union area per key, cell-partitioned (scale path for
    ST_UNION GROUP BY — see module docstring). Returns (key, union_area).

    Handles arbitrary simple polygons WITH holes (holes are clipped per
    cell alongside outer rings and subtracted by the scanline kernel's
    even-odd fill — round-1 dropped holes here). Per-cell cost is
    polynomial in local piece count (geo.sweep), so no density cap."""
    from pda_spark.operators.dissolve import cell_pieces

    pieces = cell_pieces(polygons, res, geom=geom, key_col=key)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = [wkb.decode(bytes(buf)).polygons()[0] for buf in pdf["piece"]]
        area = sweep.union_area(polys)
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "cell": [pdf["cell"].iloc[0]], "area": [area]}
        )

    partials = pieces.groupBy("key", "cell").applyInPandas(per_cell, _PARTIAL_SCHEMA)
    return partials.groupBy("key").agg(F.round(F.sum("area"), 12).alias("union_area"))


def focal_stats(
    cell_counts: DataFrame,
    res: int,
    cell_col: str = "cell",
    value_col: str = "n",
    radius: int = 1,
) -> DataFrame:
    """Focal (neighborhood) statistics over the cell grid — the raster
    smoothing / kernel-density primitive (GIS "focal sum/mean" over a
    (2r+1)^2 window). Input is an aggregated per-cell table; output is
    one row per cell that RECEIVES any contribution (support dilation),
    with the window sum, the in-bounds window cell count, and the mean.

    Spark-first shape: scatter-gather, not a spatial window — each donor
    cell explodes to its (2r+1)^2 recipients (pure Catalyst bit math on
    the int64 cell id: res<<58 | ix<<29 | iy), then ONE grouped sum.
    Cost is 9x rows through a map-side-combinable aggregate; no
    geometry, no Python, no per-cell loop — at 100 TB this is exactly a
    shuffle of the (already tiny) per-cell aggregate, never the raw
    points. Out-of-domain recipients (grid edge) are dropped; the mean
    divides by the count of in-bounds DONOR positions computed from the
    recipient's own coordinates, so edge cells average over their real
    window size.
    """
    n = 1 << res
    offsets = [(dx, dy) for dx in range(-radius, radius + 1)
               for dy in range(-radius, radius + 1)]
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx, dy in offsets])
    ).alias("o")
    ix = F.shiftright(F.col(cell_col), 29).bitwiseAND(F.lit((1 << 29) - 1))
    iy = F.col(cell_col).bitwiseAND(F.lit((1 << 29) - 1))
    donors = cell_counts.select(
        ix.alias("ix"), iy.alias("iy"), F.col(value_col).alias("_v")
    ).select("ix", "iy", "_v", off)
    scattered = donors.select(
        (F.col("ix") + F.col("o.dx")).alias("rix"),
        (F.col("iy") + F.col("o.dy")).alias("riy"),
        "_v",
    ).filter(
        (F.col("rix") >= 0) & (F.col("rix") < n)
        & (F.col("riy") >= 0) & (F.col("riy") < n)
    )
    agg = scattered.groupBy("rix", "riy").agg(F.sum("_v").alias("focal_sum"))
    # in-bounds window size from the recipient's own grid position
    win = (
        (F.least(F.col("rix") + radius, F.lit(n - 1)) - F.greatest(F.col("rix") - radius, F.lit(0)) + 1)
        * (F.least(F.col("riy") + radius, F.lit(n - 1)) - F.greatest(F.col("riy") - radius, F.lit(0)) + 1)
    )
    cell_out = (
        (F.lit(res).cast("long") * F.lit(1 << 58))
        + F.shiftleft(F.col("rix").cast("long"), 29)
        + F.col("riy").cast("long")
    )
    return agg.select(
        cell_out.alias(cell_col),
        F.col("focal_sum").cast("long").alias("focal_sum"),
        win.cast("long").alias("win_cells"),
        (F.col("focal_sum").cast("double") / win.cast("double")).alias("focal_mean"),
    )
