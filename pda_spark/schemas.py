"""Explicit StructTypes for every engine table.

Mirrors the reference's fixed SQLAlchemy schema
(/root/reference/database/db.py:87-253) plus the BASELINE input_hint
web-corpus table. Geometry columns are WKB bytes (BinaryType, SRID 4326).
"""

from __future__ import annotations

from pyspark.sql import types as T

WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SATELLITES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("pixel_res", T.DoubleType(), True),
    ]
)

SAT_IMAGES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("clear_confidence_percent", T.DoubleType(), True),
        T.StructField("cloud_cover", T.DoubleType(), True),
        T.StructField("time_acquired", T.TimestampType(), True),
        T.StructField("geom", T.BinaryType(), True),
        T.StructField("centroid", T.BinaryType(), True),
        T.StructField("sat_id", T.StringType(), True),
        T.StructField("item_type_id", T.StringType(), True),
    ]
)

ITEM_TYPES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("sat_id", T.StringType(), True),
    ]
)

ASSET_TYPES = T.StructType([T.StructField("id", T.StringType(), False)])

ITEMS_ASSETS = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("asset_id", T.StringType(), False),
    ]
)

COUNTRIES = T.StructType(
    [
        T.StructField("iso", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("geom", T.BinaryType(), True),
    ]
)

CITIES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("country_iso", T.StringType(), True),
        T.StructField("geom", T.BinaryType(), True),
    ]
)

LAND_COVER_CLASSES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("featureclass", T.StringType(), True),
        T.StructField("geom", T.BinaryType(), True),
    ]
)
