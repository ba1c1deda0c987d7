"""Golden-value parity with the reference integration suite.

Replicates /root/reference/tests/integration/app/test_query_i.py and
test_db_i.py over the synthesized golden fixture world
(pda_spark.sources.fixtures.golden_world). Filter parameters mirror the
reference tests: TOI 2022-09-01 .. 2022-12-01, cloud_cover <= 0.7,
country Germany.
"""

from datetime import datetime

import pytest

import pda_spark.plans.queries as Q
from pda_spark.sources.fixtures import golden_world

START = datetime(2022, 9, 1)
END = datetime(2022, 12, 1)
CC = 0.7
COUNTRY = "Germany"
ALL_SATS = ["Planetscope", "Skysat", "Esa", "Usgs"]


@pytest.fixture(scope="module")
def world(spark):
    w = golden_world(spark)
    for df in w.values():
        df.cache()
    return w


def test_all_countries(spark, world):
    # app/query.py:13-16: the 5th dashboard query — full country dim
    rows = Q.all_countries(world["countries"]).collect()
    assert len(rows) == world["countries"].count()
    names = [r["name"] for r in rows]
    assert names == sorted(names)


def test_distinct_satellite_names(spark, world):
    # test_query_i.py:12-28
    names = [r[0] for r in Q.distinct_satellite_names(world["satellites"]).collect()]
    assert names == ["Planetscope"]


@pytest.mark.parametrize(
    "sat_name,expected",
    [("Planetscope", 1), ("Skysat", 0), ("Esa", 0), ("Usgs", 0)],
)
def test_images_per_constellation(spark, world, sat_name, expected):
    # test_query_i.py:31-52 (golden per-constellation counts)
    df = Q.sat_images_with_filter(world, [sat_name], CC, START, END, COUNTRY)
    assert df.count() == expected


def test_golden_image_row(spark, world):
    # test_query_i.py:75-99 (full golden row)
    df = Q.sat_images_with_filter(world, ALL_SATS, CC, START, END, COUNTRY)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["id"] == "ss20221002"
    assert r["sat_id"] == "s145"
    assert r["clear_confidence_percent"] == 95.0
    assert r["cloud_cover"] == 0.65
    assert r["time_acquired"] == datetime(2022, 10, 1, 23, 55, 59)
    assert r["pixel_res"] == 3.15
    assert r["item_type_id"] == "PSScene"
    assert r["sat_name"] == "Planetscope"
    assert r["land_cover_class"] == ["fake_area"]
    # test_db_i.py:213-215 golden derived values
    assert r["lon"] == pytest.approx(8.804454520157185, abs=1e-12)
    assert r["lat"] == pytest.approx(55.474220203855445, abs=1e-12)
    assert r["area_sqkm"] == 1244037.118


def test_result_ids_unique(spark, world):
    # test_query_i.py:101-113 / app/query.py:70
    df = Q.sat_images_with_filter(world, ALL_SATS, CC, START, END, COUNTRY)
    ids = [r["id"] for r in df.select("id").collect()]
    assert len(ids) == len(set(ids))


def test_border_image_excluded(spark, world):
    # test_db_i.py:241-252 negative case: NL-side border image not in Germany
    df = Q.sat_images_with_filter(world, ALL_SATS, CC, START, END, COUNTRY)
    ids = [r["id"] for r in df.select("id").collect()]
    assert "fake_not_in_bounds" not in ids


def test_cities_only_berlin(spark, world):
    # test_query_i.py:55-72: Berlin's 30 km buffer intersects the image;
    # Bombo (no DEU iso, far away) is excluded
    df = Q.cities_with_filters(world, ALL_SATS, CC, START, END, COUNTRY)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "Berlin"
    assert rows[0]["id"] == 2
    assert rows[0]["total_images"] == 1


def test_land_cover_histogram(spark, world):
    # test_query_i.py:115-130: featureclass 'fake_area' -> total_images 1
    df = Q.land_cover_classes_with_filters(world, ALL_SATS, CC, START, END, COUNTRY)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["featureclass"] == "fake_area"
    assert rows[0]["total_images"] == 1


def test_coverage_full(spark, world):
    # app/query.py:143-192: land cover geom == image geom -> 100% coverage
    df = Q.land_cover_coverage(world, ALL_SATS, CC, START, END, COUNTRY)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["featureclass"] == "fake_area"
    assert rows[0]["coverage_percentage"] == pytest.approx(100.0, abs=1e-6)


def test_coverage_no_images(spark, world):
    # filters that exclude every image -> empty coverage result
    df = Q.land_cover_coverage(world, ["Skysat"], CC, START, END, COUNTRY)
    assert df.count() == 0


def test_dissolved(spark, world):
    # app/query.py:195-213
    df = Q.land_cover_geom_dissolved(world, COUNTRY)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["featureclass"] == "fake_area"
    from pda_spark.geo import kernels, wkb

    g = wkb.decode(bytes(rows[0]["geom"]))
    assert kernels.area_planar(g) == pytest.approx(rows[0]["union_area"])


def test_item_assets_junction(spark, world):
    # J8 N:M junction (test_db_i.py asset membership): PSScene -> [analytic]
    rows = Q.item_assets(world).collect()
    assert len(rows) == 1
    assert rows[0]["item_id"] == "PSScene"
    assert rows[0]["assets"] == ["analytic"]


def test_lat_lon_tuples(spark):
    # tests/unit/app/test_query_u.py:121-127 golden: [(-15.0452, 23.0235)]
    df = spark.createDataFrame([(23.0235, -15.0452)], ["lon", "lat"])
    assert Q.lat_lon_tuples(df) == [(-15.0452, 23.0235)]


def test_geojson_serialization(spark, world):
    # F9 (db.py:160-177): geometry -> GeoJSON string at the dashboard edge
    import json

    from pda_spark.functions import geo_udfs
    from pyspark.sql import functions as F

    row = world["sat_images"].select(geo_udfs.geojson_geometry(F.col("geom")).alias("gj")).head()
    gj = json.loads(row["gj"])
    assert gj["type"] == "Polygon"
    assert len(gj["coordinates"][0]) == 5


def test_geojson_feature_full(spark, world):
    """F9 complete: Feature dict shape matches the reference's geojson
    hybrid property (db.py:160-177) — id, geometry, and the full
    11-key property set."""
    import json

    df = Q.image_geojson_features(world, ALL_SATS, CC, START, END, COUNTRY)
    rows = df.collect()
    assert len(rows) == 1
    f = json.loads(rows[0]["feature"])
    assert f["type"] == "Feature"
    assert f["id"] == rows[0]["id"]
    assert f["geometry"]["type"] == "Polygon"
    props = f["properties"]
    assert set(props) >= {
        "id", "cloud_cover", "pixel_res", "time_acquired", "sat_id", "sat_name",
        "item_type_id", "srid", "area_sqkm", "land_cover_class", "asset_types",
    }
    assert props["id"] == f["id"]
    assert props["sat_name"] in ALL_SATS
    assert props["land_cover_class"] == ["fake_area"]
    assert props["asset_types"] == ["analytic"]
    assert len(props["time_acquired"]) == 10  # %Y-%m-%d


def test_time_filter_excludes(spark, world):
    # TOI entirely before acquisition -> empty (P4)
    df = Q.sat_images_with_filter(world, ALL_SATS, CC, datetime(2021, 1, 1), datetime(2021, 12, 31), COUNTRY)
    assert df.count() == 0


def test_cloud_cover_filter_excludes(spark, world):
    # cc threshold below the image's 0.65 -> empty (P5)
    df = Q.sat_images_with_filter(world, ALL_SATS, 0.5, START, END, COUNTRY)
    assert df.count() == 0
