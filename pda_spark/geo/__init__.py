from pda_spark.geo import cells, kernels, proj, wkb  # noqa: F401
