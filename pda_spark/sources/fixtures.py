"""Deterministic fixture worlds (no external data).

``golden_world`` reproduces the reference's integration fixture world
(/root/reference/tests/integration/database/test_db_i.py:48-151) with one
substitution: the reference loads ``tests/resources/germany.geojson``
(absent from the repo), so we synthesize a simplified convex-ish Germany
polygon that preserves every golden membership the reference tests assert:
it contains Berlin, intersects the fake_feature footprint, excludes the
NL-side border box (polygon_border_germany.geojson, lon 6.91-6.96 — the
real NL/DE border there is ~7.05E) and excludes the far city Bombo.

``scaled_world`` generates a seeded synthetic world of arbitrary size for
benchmarks: image footprints and land-cover polygons on a jittered grid
over Europe, plus cities and countries. Same schemas as the golden world.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from pda_spark import schemas
from pda_spark.geo import wkb

FAKE_FEATURE_RING = np.array(
    [
        (1.07935e-10, 60.15824184521428),
        (20.023127886233997, 60.15824184521428),
        (15.564234739500566, 50.16996707220397),
        (8.3899e-11, 50.16996707220397),
        (1.07935e-10, 60.15824184521428),
    ]
)

# tests/resources/polygon_border_germany.geojson (NL side of the border)
BORDER_RING = np.array(
    [
        (6.9127952664167935, 52.24492169470244),
        (6.9127952664167935, 52.20253412408073),
        (6.964691660078074, 52.20253412408073),
        (6.964691660078074, 52.24492169470244),
        (6.9127952664167935, 52.24492169470244),
    ]
)

# synthetic simplified Germany (see module docstring)
GERMANY_RING = np.array(
    [
        (8.5, 49.0),
        (13.0, 48.5),
        (15.0, 51.0),
        (14.5, 53.5),
        (11.0, 54.5),
        (8.0, 55.0),
        (7.2, 53.5),
        (7.05, 52.0),
        (8.5, 49.0),
    ]
)

BERLIN = (13.399602764700546, 52.523764522251156)  # fake_city_berlin.geojson
BOMBO = (32.533299524864844, 0.583299105614628)  # fake_cities.geojson

TS_GOLDEN = datetime(2022, 10, 1, 23, 55, 59)


def golden_world(spark: SparkSession) -> dict[str, DataFrame]:
    fake_poly = wkb.polygon([FAKE_FEATURE_RING])
    border_poly = wkb.polygon([BORDER_RING])
    germany = wkb.multipolygon([[GERMANY_RING]])

    from pda_spark.geo import kernels

    def centroid_of(poly_wkb: bytes) -> bytes:
        lon, lat = kernels.centroid_3035(wkb.decode(poly_wkb))
        return wkb.point(lon, lat)

    satellites = spark.createDataFrame([("s145", "Planetscope", 3.15)], schemas.SATELLITES)
    item_types = spark.createDataFrame([("PSScene", "s145")], schemas.ITEM_TYPES)
    asset_types = spark.createDataFrame([("analytic",)], schemas.ASSET_TYPES)
    items_assets = spark.createDataFrame([("PSScene", "analytic")], schemas.ITEMS_ASSETS)
    sat_images = spark.createDataFrame(
        [
            ("ss20221002", 95.0, 0.65, TS_GOLDEN, bytearray(fake_poly), bytearray(centroid_of(fake_poly)), "s145", "PSScene"),
            ("fake_not_in_bounds", 95.0, 0.65, TS_GOLDEN, bytearray(border_poly), bytearray(centroid_of(border_poly)), "s145", "PSScene"),
        ],
        schemas.SAT_IMAGES,
    )
    countries = spark.createDataFrame([("DEU", "Germany", bytearray(germany))], schemas.COUNTRIES)
    cities = spark.createDataFrame(
        [
            (1, "Bombo", None, bytearray(wkb.point(*BOMBO))),
            (2, "Berlin", "DEU", bytearray(wkb.point(*BERLIN))),
        ],
        schemas.CITIES,
    )
    land_cover = spark.createDataFrame(
        [(1, "fake_area", bytearray(fake_poly))], schemas.LAND_COVER_CLASSES
    )
    return {
        "satellites": satellites,
        "item_types": item_types,
        "asset_types": asset_types,
        "items_assets": items_assets,
        "sat_images": sat_images,
        "countries": countries,
        "cities": cities,
        "land_cover_classes": land_cover,
    }


SAT_NAMES = ["Planetscope", "Skysat", "Esa", "Usgs"]


def scaled_world(
    spark: SparkSession,
    n_images: int = 10_000,
    n_land_cover: int = 500,
    n_cities: int = 200,
    seed: int = 42,
    partitions: int | None = None,
    river_lines: bool = False,
) -> dict[str, DataFrame]:
    """Seeded synthetic world over Europe (lon -10..30, lat 40..62).

    Image footprints are small jittered quads (~0.2 deg); land-cover
    polygons are larger axis-aligned boxes (~0.5 deg) — both convex so
    exact coverage kernels apply. Distribution is intentionally skewed:
    ~20% of images cluster near (13.4, 52.5) to exercise salting.

    ``river_lines=True`` reproduces the reference's production land-cover
    shape: River/Lake classes become slanted polyline CENTERLINES
    (LineString WKB) instead of boxes, matching
    /root/reference/api_importer/clients/geojson_xyz.py:59-70 (rivers and
    lake centerlines are ingested as GeoJSON LineStrings; model
    database/db.py:248-253). Polygon-only consumers (dissolve, tiling)
    keep the default.
    """
    rng = np.random.default_rng(seed)

    def sample_lonlat(n):
        lon = rng.uniform(-10, 30, n)
        lat = rng.uniform(40, 62, n)
        hot = rng.random(n) < 0.2
        lon[hot] = 13.4 + rng.normal(0, 0.5, hot.sum())
        lat[hot] = 52.5 + rng.normal(0, 0.3, hot.sum())
        return lon, lat

    lon, lat = sample_lonlat(n_images)
    half = rng.uniform(0.05, 0.15, n_images)
    rows = []
    t0 = datetime(2022, 1, 1)
    for i in range(n_images):
        ring = np.array(
            [
                (lon[i] - half[i], lat[i] - half[i]),
                (lon[i] + half[i], lat[i] - half[i]),
                (lon[i] + half[i], lat[i] + half[i]),
                (lon[i] - half[i], lat[i] + half[i]),
                (lon[i] - half[i], lat[i] - half[i]),
            ]
        )
        poly = wkb.polygon([ring])
        rows.append(
            (
                f"img{i:08d}",
                float(np.round(rng.uniform(50, 100), 2)),
                float(np.round(rng.uniform(0, 1), 4)),
                t0 + timedelta(minutes=int(rng.integers(0, 525600))),
                bytearray(poly),
                bytearray(wkb.point(lon[i], lat[i])),
                f"s{int(rng.integers(0, 4))}",
                "PSScene",
            )
        )
    sat_images = spark.createDataFrame(rows, schemas.SAT_IMAGES)
    if partitions:
        sat_images = sat_images.repartition(partitions)

    lc_lon, lc_lat = sample_lonlat(n_land_cover)
    lc_half = rng.uniform(0.2, 0.5, n_land_cover)

    def lc_geom(i: int, cls: str) -> bytes:
        cx, cy, h = float(lc_lon[i]), float(lc_lat[i]), float(lc_half[i])
        if river_lines and cls in ("River", "Lake"):
            # slanted 4-vertex centerline meandering through the cell
            return wkb.linestring(
                np.array(
                    [
                        (cx - h, cy - h),
                        (cx - h / 3.0, cy + h / 2.0),
                        (cx + h / 3.0, cy - h / 4.0),
                        (cx + h, cy + h),
                    ]
                )
            )
        return wkb.box(cx - h, cy - h, cx + h, cy + h)

    lc_rows = [
        (i, cls, bytearray(lc_geom(i, cls)))
        for i, cls in ((i, ["Urban area", "River", "Lake", "Forest"][i % 4]) for i in range(n_land_cover))
    ]
    land_cover = spark.createDataFrame(lc_rows, schemas.LAND_COVER_CLASSES)

    c_lon, c_lat = sample_lonlat(n_cities)
    cities = spark.createDataFrame(
        [(i, f"city{i}", "DEU", bytearray(wkb.point(float(c_lon[i]), float(c_lat[i])))) for i in range(n_cities)],
        schemas.CITIES,
    )
    satellites = spark.createDataFrame(
        [(f"s{i}", SAT_NAMES[i], float(3.15 + i)) for i in range(4)], schemas.SATELLITES
    )
    countries = spark.createDataFrame(
        [("DEU", "Germany", bytearray(wkb.multipolygon([[GERMANY_RING]])))], schemas.COUNTRIES
    )
    return {
        "sat_images": sat_images,
        "land_cover_classes": land_cover,
        "cities": cities,
        "satellites": satellites,
        "countries": countries,
    }
