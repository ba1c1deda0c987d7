"""Round-6d operators: int8 scalar quantization (+ ANN composition)
and trajectory impossible-speed cleaning. Independent re-derivations
(numpy), never the operator's own arithmetic.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pda_spark.functions import geo_udfs, similarity


def _py_quant(vec):
    s = max(abs(x) for x in vec)
    if s == 0:
        return [0] * len(vec), 0.0
    return [
        int(max(min(np.floor(x * 127.0 / s + 0.5), 127), -127)) for x in vec
    ], s


def test_quantize_int8_vs_python(spark):
    vecs = [
        [0.5, -1.0, 0.25, 0.0],
        [0.0, 0.0, 0.0, 0.0],          # zero vector -> all zeros
        [3.0, 3.0, -3.0, 1.5],
        [-0.001, 0.0005, 0.00025, 0.0], # tiny magnitudes still span int8
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: (list(r.qvec), r.scale) for r in similarity.quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        want_q, want_s = _py_quant(v)
        assert got[i][0] == want_q, (i, got[i][0], want_q)
        assert got[i][1] == pytest.approx(want_s, abs=1e-15)
    # extremes hit exactly +-127
    assert max(got[2][0]) == 127 and min(got[2][0]) == -127


def test_quantize_composes_with_cosine_topk(spark):
    """Quantized vectors feed cosine_topk unchanged, and the quantized
    ranking approximates the float ranking (top-1 identical on a
    well-separated fixture)."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(3, 16))
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(6):
            rows.append((vid, [float(x) for x in base[c] + rng.normal(scale=0.05, size=16)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = similarity.quantize_int8(emb).select("vec_id", F.col("qvec").alias("embedding"))
    anchors = q.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    top = similarity.cosine_topk(q, anchors, k=6).collect()
    # the 6 nearest quantized vectors of anchor 0 are its own cluster
    assert {r.vec_id for r in top} == {0, 1, 2, 3, 4, 5}
    assert top[0].vec_id == 0 and top[0].cosine == 1.0


def test_speed_filter_flags_teleport(spark):
    """Hand-built trajectory: walking-speed fixes pass, a cross-ocean
    jump in one minute flags; tied timestamps are excluded."""
    from pyspark.sql import Window

    rows = [
        # user 1: ~111 m per 60 s (~1.85 m/s), then a 10-degree jump
        (1, 10, "2024-01-01 00:00:00", 0.0, 50.0),
        (1, 11, "2024-01-01 00:01:00", 0.0, 50.001),
        (1, 12, "2024-01-01 00:02:00", 10.0, 50.0),
        # user 2: tied timestamps -> excluded pair
        (2, 20, "2024-01-01 00:00:00", 1.0, 1.0),
        (2, 21, "2024-01-01 00:00:00", 2.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, lon double, lat double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = df.select(
        "user_id", "event_id", "lon", "lat",
        F.unix_micros("ts").alias("ts_us"),
    ).select(
        "*",
        F.lag("lon").over(w).alias("plon"),
        F.lag("lat").over(w).alias("plat"),
        F.lag("ts_us").over(w).alias("pts_us"),
    ).filter(F.col("pts_us").isNotNull() & (F.col("ts_us") > F.col("pts_us")))
    dist = geo_udfs.distance_geodesic_lonlat()(
        F.col("plon"), F.col("plat"), F.col("lon"), F.col("lat")
    )
    t = t.withColumn("speed", dist / ((F.col("ts_us") - F.col("pts_us")) / F.lit(1e6)))
    got = {r.event_id: r.speed for r in t.collect()}
    assert set(got) == {11, 12}  # user 2's tied pair excluded
    from pda_spark.geo import proj

    d1 = geo_udfs.haversine_m(0.0, 50.0, 0.0, 50.001, proj.RQ)
    d2 = geo_udfs.haversine_m(0.0, 50.001, 10.0, 50.0, proj.RQ)
    assert got[11] == pytest.approx(float(d1) / 60.0, rel=1e-12)
    assert got[12] == pytest.approx(float(d2) / 60.0, rel=1e-12)
    assert got[11] < 350.0 < got[12]
