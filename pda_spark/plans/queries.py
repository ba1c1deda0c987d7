"""The reference's five dashboard queries as lazy DataFrame plans.

Each function mirrors one ``@st.experimental_memo`` query in
/root/reference/app/query.py and takes the fixture-world dict produced by
pda_spark.sources.fixtures (or ingested tables with the same schemas).

Spark-first shape (SURVEY §3.1): the reference's N+1 lazy-relationship
loop (app/query.py:57-63 — one extra SQL statement per row per property)
collapses into a single DAG: broadcast dimension joins + one spatial join
+ ``collect_set``. Scalar country subqueries (J6) become a driver-side
one-row collect broadcast as a binary literal.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pda_spark.functions import geo_udfs
from pda_spark.operators import dissolve as dissolve_op
from pda_spark.operators import spatial_join


def all_countries(countries: DataFrame) -> DataFrame:
    """query_all_countries (app/query.py:13-16): the full country dim,
    ordered for determinism (the reference returns ORM rows)."""
    return countries.orderBy("name")


def distinct_satellite_names(satellites: DataFrame) -> DataFrame:
    """query_distinct_satellite_names (app/query.py:19-22): DISTINCT + sort."""
    return satellites.select("name").distinct().orderBy("name")


def item_assets(world: dict) -> DataFrame:
    """N:M junction join J8 (db.py:180-200): item_types x items_assets x
    asset_types -> (item_id, sat_id, sorted asset list)."""
    it = world["item_types"].select(F.col("id").alias("item_id"), "sat_id")
    ia = world["items_assets"]
    at = world["asset_types"].select(F.col("id").alias("asset_id"))
    return (
        it.join(F.broadcast(ia), on="item_id", how="left")
        .join(F.broadcast(at), on="asset_id", how="left")
        .groupBy("item_id", "sat_id")
        .agg(F.sort_array(F.collect_set("asset_id")).alias("assets"))
    )


def lat_lon_tuples(df: DataFrame) -> list[tuple[float, float]]:
    """get_lat_lon_from_images (app/query.py:25-28): [(lat, lon), ...] —
    a driver-edge helper, one collect at the very end."""
    return [(r["lat"], r["lon"]) for r in df.select("lat", "lon").collect()]


def _country_geom(countries: DataFrame, country_name: str) -> bytes:
    """Scalar subquery (J6): collect one row on the driver, broadcast as literal."""
    row = countries.filter(F.col("name") == country_name).select("geom", "iso").head()
    if row is None:
        raise ValueError(f"no such country: {country_name}")
    return bytes(row[0]), row[1]


def _filtered_images(
    world: dict,
    sat_names: list[str],
    cloud_cover: float,
    start_date: datetime,
    end_date: datetime,
    country_wkb: bytes,
) -> DataFrame:
    """Shared filter block (P2-P6 + J5): cc/time filters push to the scan;
    the satellite name IN-list runs as a broadcast semi join; the country
    intersect test is a vectorized-UDF map filter (no shuffle)."""
    images = world["sat_images"]
    sats = world["satellites"].filter(F.col("name").isin(sat_names)).select(F.col("id").alias("sat_id"))
    return (
        images.filter(
            (F.col("cloud_cover") <= F.lit(cloud_cover))
            & (F.col("time_acquired") >= F.lit(start_date))
            & (F.col("time_acquired") <= F.lit(end_date))
        )
        .join(F.broadcast(sats), on="sat_id", how="left_semi")
        .filter(geo_udfs.intersects_pair(F.col("geom"), F.lit(bytearray(country_wkb))))
    )


def sat_images_with_filter(
    world: dict,
    sat_names: list[str],
    cloud_cover: float,
    start_date: datetime,
    end_date: datetime,
    country_name: str,
) -> DataFrame:
    """query_sat_images_with_filter (app/query.py:31-71).

    Output columns match the reference GeoDataFrame: image columns plus
    land_cover_class (sorted array — the reference's ``list(set(...))`` is
    order-nondeterministic, we pin sorted order per SURVEY A5), lat, lon,
    area_sqkm, sat_name, pixel_res.
    """
    country_wkb, _ = _country_geom(world["countries"], country_name)
    images = _filtered_images(world, sat_names, cloud_cover, start_date, end_date, country_wkb)

    lc = world["land_cover_classes"].select(
        F.col("featureclass"), F.col("geom").alias("lc_geom")
    )
    pairs = spatial_join.intersects_join(
        images.select("id", "geom"), lc, res=6, left_geom="geom", right_geom="lc_geom"
    )
    lc_lists = pairs.groupBy("id").agg(
        F.sort_array(F.collect_set("featureclass")).alias("land_cover_class")
    )

    sats = world["satellites"].select(
        F.col("id").alias("sat_id"), F.col("name").alias("sat_name"), F.col("pixel_res")
    )
    return (
        images.dropDuplicates(["id"])  # GROUP BY pk (app/query.py:51)
        .join(F.broadcast(sats), on="sat_id", how="inner")
        .join(lc_lists, on="id", how="left")
        .withColumn("lon", geo_udfs.point_x(F.col("centroid")))
        .withColumn("lat", geo_udfs.point_y(F.col("centroid")))
        .withColumn("area_sqkm", geo_udfs.area_sqkm(F.col("geom")))
        .drop("centroid")
    )


def image_geojson_features(
    world: dict,
    sat_names: list[str],
    cloud_cover: float,
    start_date: datetime,
    end_date: datetime,
    country_name: str,
) -> DataFrame:
    """GeoJSON Feature per image with the reference's full property set
    (db.py:160-177: id, cloud_cover, pixel_res, time_acquired '%Y-%m-%d',
    sat_id, sat_name, item_type_id, srid, area_sqkm, land_cover_class,
    asset_types). The reference builds this per row via lazy ORM
    relationships (one query per property per row); here it's the same
    single DAG as sat_images_with_filter plus a broadcast asset join and
    a JVM-side JSON composition."""
    imgs = sat_images_with_filter(
        world, sat_names, cloud_cover, start_date, end_date, country_name
    )
    assets = item_assets(world).select(
        F.col("item_id").alias("item_type_id"), F.col("assets").alias("asset_types")
    )
    feat = imgs.join(F.broadcast(assets), on="item_type_id", how="left")
    props = F.struct(
        F.col("id"),
        F.col("cloud_cover"),
        F.col("pixel_res"),
        F.date_format("time_acquired", "yyyy-MM-dd").alias("time_acquired"),
        F.col("sat_id"),
        F.col("sat_name"),
        F.col("item_type_id"),
        F.lit(4326).alias("srid"),  # constant in the reference schema (db.py:68)
        F.col("area_sqkm"),
        F.col("land_cover_class"),
        F.col("asset_types"),
    )
    return feat.select(
        "id", geo_udfs.geojson_feature(F.col("geom"), F.col("id"), props).alias("feature")
    )


def cities_with_filters(
    world: dict,
    sat_names: list[str],
    cloud_cover: float,
    start_date: datetime,
    end_date: datetime,
    country_name: str,
) -> DataFrame:
    """query_cities_with_filters (app/query.py:77-110): city 30 km buffer
    (db.py:243-245) spatial-joined to filtered images, count per city."""
    country_wkb, country_iso = _country_geom(world["countries"], country_name)
    images = _filtered_images(world, sat_names, cloud_cover, start_date, end_date, country_wkb)

    cities = (
        world["cities"]
        .filter(F.col("country_iso") == country_iso)
        .withColumn("buffer_geom", geo_udfs.buffer_point(30_000.0)(F.col("geom")))
        .select(F.col("id").alias("city_id"), F.col("name").alias("city_name"), "buffer_geom")
    )
    pairs = spatial_join.intersects_join(
        images.select(F.col("id").alias("img_id"), "geom"),
        cities,
        res=6,
        left_geom="geom",
        right_geom="buffer_geom",
    )
    return (
        pairs.groupBy("city_id", "city_name", "buffer_geom")
        .agg(F.count("img_id").alias("total_images"))
        .select(
            F.col("city_id").alias("id"),
            F.col("city_name").alias("name"),
            F.col("buffer_geom").alias("geom"),
            "total_images",
        )
    )


def land_cover_classes_with_filters(
    world: dict,
    sat_names: list[str],
    cloud_cover: float,
    start_date: datetime,
    end_date: datetime,
    country_name: str,
) -> DataFrame:
    """query_land_cover_classes_with_filters (app/query.py:114-141):
    land-cover histogram — images per class (SURVEY A2, the test-pinned
    aggregation)."""
    country_wkb, _ = _country_geom(world["countries"], country_name)
    images = _filtered_images(world, sat_names, cloud_cover, start_date, end_date, country_wkb)

    lc = world["land_cover_classes"].select(
        F.col("id").alias("lc_id"), "featureclass", F.col("geom").alias("lc_geom")
    )
    pairs = spatial_join.intersects_join(
        images.select(F.col("id").alias("img_id"), "geom"),
        lc,
        res=6,
        left_geom="geom",
        right_geom="lc_geom",
    )
    return (
        pairs.groupBy("lc_id", "featureclass", "lc_geom")
        .agg(F.count("img_id").alias("total_images"))
        .select(F.col("lc_id").alias("id"), "featureclass", F.col("lc_geom").alias("geom"), "total_images")
    )


def land_cover_coverage(
    world: dict,
    sat_names: list[str],
    cloud_cover: float,
    start_date: datetime,
    end_date: datetime,
    country_name: str,
) -> DataFrame:
    """query_land_cover_classes_with_filters_image_coverage
    (app/query.py:143-192): per-class dissolve x image union -> coverage %."""
    country_wkb, _ = _country_geom(world["countries"], country_name)
    images = _filtered_images(world, sat_names, cloud_cover, start_date, end_date, country_wkb)
    lc = world["land_cover_classes"].filter(
        geo_udfs.intersects_pair(F.col("geom"), F.lit(bytearray(country_wkb)))
    )
    return dissolve_op.coverage(lc, images)


def land_cover_geom_dissolved(world: dict, country_name: str) -> DataFrame:
    """query_land_cover_geom_dissolved (app/query.py:195-213)."""
    country_wkb, _ = _country_geom(world["countries"], country_name)
    lc = world["land_cover_classes"].filter(
        geo_udfs.intersects_pair(F.col("geom"), F.lit(bytearray(country_wkb)))
    )
    return dissolve_op.dissolve(lc)
