"""Round-6c operators: Bloom filter, SimHash Hamming banded join,
nearest-segment snap (map matching), D8 flow direction, hard-negative
mining. Each test checks against an INDEPENDENT re-derivation
(brute-force numpy/python), never the operator's own arithmetic.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pda_spark.functions import sketch, similarity
from pda_spark.functions import dedup
from pda_spark.operators import spatial_join, tiling


# ------------------------------------------------------------- bloom


def _py_bloom_positions(value: str, k: int, m: int) -> set[int]:
    return {
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:12], 16) % m
        for i in range(k)
    }


def test_bloom_no_false_negatives_and_exact_bits(spark):
    """Every built key must probe present (the Bloom contract), and the
    bit table must equal the python md5 re-derivation exactly."""
    k, m = 3, 256
    vals = [f"key{i}" for i in range(60)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    bloom = sketch.bloom_build(df, "v", k=k, m=m)
    got_bits = {r.pos for r in bloom.collect()}
    want_bits = set()
    for v in vals:
        want_bits |= _py_bloom_positions(v, k, m)
    assert got_bits == want_bits

    probes = spark.createDataFrame([(v,) for v in vals + ["absent1", "absent2"]], "v string")
    res = {r.item: r.maybe_present for r in sketch.bloom_probe(bloom, probes, "v", k=k, m=m).collect()}
    assert all(res[v] == 1 for v in vals), "false negative!"
    for a in ("absent1", "absent2"):
        assert res[a] == (1 if _py_bloom_positions(a, k, m) <= want_bits else 0)


def test_bloom_probe_duplicate_items_no_false_negative(spark):
    """Duplicate probe values must still report present (the review
    finding: 2k matched rows failed the == k test — a false negative,
    the one error a Bloom filter must never make)."""
    k, m = 3, 128
    built = spark.createDataFrame([("x",), ("y",)], "v string")
    bloom = sketch.bloom_build(built, "v", k=k, m=m)
    probes = spark.createDataFrame([("x",), ("x",), ("z",)], "v string")
    res = {r.item: r.maybe_present for r in sketch.bloom_probe(bloom, probes, "v", k=k, m=m).collect()}
    assert res["x"] == 1


def test_bloom_mergeable_and_null_safe(spark):
    """Union-of-tables + distinct == build over the unioned input; NULLs
    are excluded and a NULL probe reports absent."""
    k, m = 4, 128
    a = spark.createDataFrame([("x1",), ("x2",), (None,)], "v string")
    b = spark.createDataFrame([("y1",), ("x1",)], "v string")
    merged = sketch.bloom_build(a, "v", k=k, m=m).union(
        sketch.bloom_build(b, "v", k=k, m=m)
    ).distinct()
    direct = sketch.bloom_build(a.union(b), "v", k=k, m=m)
    assert {r.pos for r in merged.collect()} == {r.pos for r in direct.collect()}
    assert not any(r.pos is None for r in direct.collect())
    probe = sketch.bloom_probe(direct, spark.createDataFrame([(None,)], "v string"), "v", k=k, m=m)
    assert probe.collect()[0].maybe_present == 0


# ----------------------------------------------------- simhash pairs


def test_simhash_neardup_pairs_vs_bruteforce(spark):
    """Banding must find EXACTLY the brute-force Hamming<=r pair set —
    completeness is the pigeonhole claim under test."""
    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),        # exact dup of 1
        (3, "alpha beta gamma epsilon"),      # near 1/2
        (4, "zeta eta theta iota kappa"),
        (5, "zeta eta theta iota lambda"),
        (6, "completely different words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_bits, r = 16, 3
    got = {
        (p.doc_a, p.doc_b): p.hamming
        for p in dedup.simhash_neardup_pairs(df, "doc_id", n_bits=n_bits, max_hamming=r, n_bands=4).collect()
    }
    sigs = {s.doc_id: s.simhash for s in dedup.simhash(df, "doc_id", n_bits=n_bits).collect()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= r:
                want[(a, b)] = h
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 0  # exact dups present at distance 0


def test_simhash_pairs_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.simhash_neardup_pairs(df, "doc_id", max_hamming=3, n_bands=2)  # pigeonhole violated
    with pytest.raises(ValueError):
        dedup.simhash_neardup_pairs(df, "doc_id", n_bits=8, n_bands=9)


# ------------------------------------------------------------- snap


def test_snap_to_segments_vs_bruteforce(spark):
    """Cell-blocked snap == brute-force numpy nearest segment within
    radius (checks cover completeness AND the clamped projection)."""
    rng = np.random.default_rng(7)
    n_pts, n_segs = 300, 12
    px = rng.uniform(-10, 10, n_pts)
    py = rng.uniform(40, 50, n_pts)
    sx0 = rng.uniform(-10, 10, n_segs)
    sy0 = rng.uniform(40, 50, n_segs)
    sx1 = sx0 + rng.uniform(-2, 2, n_segs)
    sy1 = sy0 + rng.uniform(-2, 2, n_segs)
    sy1[0], sx1[0] = sy0[0], sx0[0]  # one degenerate zero-length segment
    radius = 1.5

    pts = spark.createDataFrame(
        [(i, float(px[i]), float(py[i])) for i in range(n_pts)], "point_id long, lon double, lat double"
    )
    segs = spark.createDataFrame(
        [(j, float(sx0[j]), float(sy0[j]), float(sx1[j]), float(sy1[j])) for j in range(n_segs)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    got = {
        r.point_id: (r.seg_id, r.snap_t, r.snap_d2)
        for r in spatial_join.snap_to_segments(pts, segs, radius=radius, res=6).collect()
    }

    want = {}
    for i in range(n_pts):
        best = None
        for j in range(n_segs):
            ex, ey = sx1[j] - sx0[j], sy1[j] - sy0[j]
            len2 = ex * ex + ey * ey
            t = min(max(((px[i] - sx0[j]) * ex + (py[i] - sy0[j]) * ey) / len2, 0.0), 1.0) if len2 > 0 else 0.0
            dx, dy = px[i] - (sx0[j] + t * ex), py[i] - (sy0[j] + t * ey)
            d2 = dx * dx + dy * dy
            if d2 <= radius * radius and (best is None or (d2, j) < best[:2]):
                best = (d2, j, t)
        if best is not None:
            want[i] = best
    assert set(got) == set(want)
    for i, (d2, j, t) in want.items():
        gj, gt, gd2 = got[i]
        assert gj == j
        assert gd2 == pytest.approx(d2, abs=1e-12)
        assert gt == pytest.approx(t, abs=1e-12)


# --------------------------------------------------------------- D8


def _cell(res, ix, iy):
    return (res << 58) + (ix << 29) + iy


def test_d8_flow_direction_hand_grid(spark):
    """Hand-checked 3x3-ish grid: diagonal weighting (2*dc^2 vs dd^2),
    sink detection, nodata neighbors excluded, tiebreak to smallest
    code."""
    res = 6
    cells = [
        (5, 5, 10), (6, 5, 7), (6, 6, 4), (4, 4, 10), (2, 2, 3),
        (0, 0, 5), (1, 1, 5),
        # tiebreak trio: E and W of (20,20) both drop 4 -> equal keys,
        # smallest code (E=1) must win
        (20, 20, 9), (21, 20, 5), (19, 20, 5),
    ]
    df = spark.createDataFrame(
        [(_cell(res, ix, iy), v) for ix, iy, v in cells], "cell long, n long"
    )
    got = {(r.ix, r.iy): r.flow_dir for r in tiling.d8_flow_direction(df, res).collect()}
    assert got[(5, 5)] == 128   # NE drop 6 diag key 36 beats E drop 3 card key 18
    assert got[(6, 5)] == 64    # N(6,6)=4 is its only strictly lower neighbor
    assert got[(6, 6)] == 0     # lowest around -> sink
    assert got[(4, 4)] == 0     # NE neighbor equal (drop 0) -> sink (no flat flow)
    assert got[(2, 2)] == 0     # only neighbor is higher -> sink
    assert got[(0, 0)] == 0     # NE neighbor equal -> sink
    assert got[(1, 1)] == 128   # NE(2,2)=3 is lower; SW(0,0) equal
    assert got[(20, 20)] == 1   # E/W tie on key -> smallest code wins


def test_d8_flow_direction_exhaustive_bruteforce(spark):
    """Random sparse grid vs a python D8 re-derivation (occupied-only
    semantics, 2*dc^2-vs-dd^2 compare, smallest-code tiebreak)."""
    res = 6
    rng = np.random.default_rng(3)
    n = 1 << res
    pts = {(int(a), int(b)): int(v) for a, b, v in zip(
        rng.integers(0, 8, 120), rng.integers(0, 8, 120), rng.integers(1, 9, 120)
    )}
    df = spark.createDataFrame(
        [(_cell(res, ix, iy), v) for (ix, iy), v in pts.items()], "cell long, n long"
    )
    got = {(r.ix, r.iy): r.flow_dir for r in tiling.d8_flow_direction(df, res).collect()}
    arms = [(1, 0, 1, 2), (1, -1, 2, 1), (0, -1, 4, 2), (-1, -1, 8, 1),
            (-1, 0, 16, 2), (-1, 1, 32, 1), (0, 1, 64, 2), (1, 1, 128, 1)]
    for (ix, iy), v in pts.items():
        # max over (key, -code); the sentinel (0, 0, 0) is the sink
        cand = [(0, 0, 0)]
        for dx, dy, code, w in arms:
            nx, ny = ix + dx, iy + dy
            if 0 <= nx < n and 0 <= ny < n and (nx, ny) in pts and v - pts[(nx, ny)] > 0:
                d = v - pts[(nx, ny)]
                cand.append((d * d * w, -code, code))
        want = max(cand)[2]
        assert got[(ix, iy)] == want, ((ix, iy), v, got[(ix, iy)], want)


# ------------------------------------------------------ hard negatives


def test_hard_negatives_vs_bruteforce(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 8)).astype(float)
    labels = (np.arange(40) % 3).astype(int)
    rows = [(int(i), [float(x) for x in vecs[i]], int(labels[i])) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    anchors = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_embedding"),
        F.col("label").alias("a_label"),
    )
    got = similarity.hard_negatives(emb, anchors, k=2).collect()
    norms = np.linalg.norm(vecs, axis=1)
    for a in range(4):
        sims = vecs @ vecs[a] / (norms * norms[a])
        cand = [
            (round(float(sims[j]), 6), j)
            for j in range(40)
            if labels[j] != labels[a]
        ]
        cand.sort(key=lambda p: (-p[0], p[1]))
        want = cand[:2]
        mine = sorted(
            [(r.cosine, r.vec_id) for r in got if r.a_id == a],
            key=lambda p: (-p[0], p[1]),
        )
        assert [j for _, j in mine] == [j for _, j in want]
        for (gc, _), (wc, _) in zip(mine, want):
            assert gc == pytest.approx(wc, abs=2e-6)
        for r in got:
            if r.a_id == a:
                assert r.label != labels[a]
