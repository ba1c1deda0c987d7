"""pda_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-implements the query and data-processing capabilities of
marcleerink/planet-data-analyzer (reference at /root/reference, PostGIS +
SQLAlchemy + Streamlit) as an idiomatic Spark engine:

- geometry at rest is WKB in ``BinaryType`` columns (SRID 4326),
- all geometry math runs in vectorized numpy kernels inside pandas/Arrow
  UDFs (no shapely/pyproj available in this environment — the kernels are
  written from scratch against the public Snyder/PROJ formulas),
- spatial joins use an H3-style hierarchical cell index (cover + explode +
  equi-join + refine),
- dissolve/union/coverage run exact convex kernels at small scale and a
  raster/tile zonal path at scale,
- the web-corpus front end ingests Common-Crawl-style pages
  ``(url, warc_ts, html, text, lang)`` and extracts footprints with
  deterministic Arrow UDFs (byte-identical text per url).
"""

__version__ = "0.1.0"
