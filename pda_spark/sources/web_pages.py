"""Deterministic synthetic Common-Crawl-style web-page corpus.

BASELINE.json input_hint mandates the engine's input table shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data is allowed, so this module synthesizes pages with a
seeded RNG: each page embeds

- a footprint GeoJSON feature in a ``<script type="application/geo+json">``
  block carrying the satellite-image metadata the reference parses from
  the Planet API JSON (/root/reference/api_importer/clients/data.py:212-234
  ``ImageDataFeature``): id, cloud_cover, clear_confidence_percent,
  satellite id/name/pixel_res, item type, acquisition timestamp;
- a geoparseable coordinate mention ("Located at <lat>, <lon>");
- filler prose.

The stored ``text`` column is exactly ``extract.extract_text(html)`` —
the per-row invariant (byte-identical extracted text per url) is verified
by re-running the extraction UDF and comparing byte-for-byte.

Generation is distributed: the driver plans ``spark.range(n)`` and pages
materialize inside ``mapInPandas`` (seeded per url hash, so content is a
pure function of the url — independent of partitioning/parallelism).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pda_spark import schemas

LANGS = ["en", "de", "fr", "nl", "es"]
SAT_DIMS = [
    ("s145", "Planetscope", 3.15),
    ("s201", "Skysat", 0.72),
    ("s300", "Esa", 10.0),
    ("s400", "Usgs", 30.0),
]
WORDS = (
    "satellite imagery footprint acquisition orbit sensor analytic scene "
    "cloud radiance swath nadir pass polygon coverage mosaic tile raster "
    "vector europe berlin river urban forest lake crawl archive page"
).split()

T0 = datetime(2022, 1, 1)


def page_for_index(i: int) -> tuple[str, datetime, bytes, str]:
    """Pure function index -> (url, warc_ts, html, lang). Seeded by index."""
    rng = np.random.default_rng(10_000_019 * (i + 1) + 42)
    url = f"https://crawl.example.org/scenes/{i:010d}"
    warc_ts = T0 + timedelta(seconds=int(rng.integers(0, 365 * 24 * 3600)))
    lang = LANGS[int(rng.integers(0, len(LANGS)))]

    sat = SAT_DIMS[int(rng.integers(0, len(SAT_DIMS)))]
    lon = float(rng.uniform(-10, 30))
    lat = float(rng.uniform(40, 62))
    if rng.random() < 0.2:  # hot cluster for skew realism
        lon, lat = 13.4 + float(rng.normal(0, 0.5)), 52.5 + float(rng.normal(0, 0.3))
    half = float(rng.uniform(0.05, 0.15))
    ring = [
        [lon - half, lat - half],
        [lon + half, lat - half],
        [lon + half, lat + half],
        [lon - half, lat + half],
        [lon - half, lat - half],
    ]
    acquired = T0 + timedelta(minutes=int(rng.integers(0, 525600)))
    feature = {
        "type": "Feature",
        "geometry": {"type": "Polygon", "coordinates": [ring]},
        "properties": {
            "id": f"img{i:010d}",
            "cloud_cover": round(float(rng.uniform(0, 1)), 4),
            "clear_confidence_percent": round(float(rng.uniform(50, 100)), 2),
            "satellite_id": sat[0],
            "provider": sat[1].lower(),
            "pixel_resolution": sat[2],
            "item_type": "PSScene",
            "acquired": acquired.strftime("%Y-%m-%dT%H:%M:%S"),
        },
    }
    n_words = int(rng.integers(20, 60))
    prose = " ".join(WORDS[int(w)] for w in rng.integers(0, len(WORDS), n_words))
    html = (
        f"<html><head><title>Scene {i}</title><style>body{{margin:0}}</style></head>"
        f"<body><h1>Scene {feature['properties']['id']}</h1>"
        f"<p>{prose}</p>"
        f'<script type="application/geo+json">{json.dumps(feature, separators=(",", ":"))}</script>'
        f"<p>Located at {lat:.6f}, {lon:.6f}.</p>"
        f"<footer>archived {warc_ts.isoformat()}</footer></body></html>"
    ).encode("utf-8")
    return url, warc_ts, html, lang


def corpus(spark: SparkSession, n_pages: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_pages`` pages."""
    from pda_spark.functions import extract

    base = spark.range(0, n_pages, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            rows = [page_for_index(int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "lang"])
            out["text"] = extract.extract_text_series(out["html"])
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    return base.mapInPandas(gen, schemas.WEB_PAGES)
