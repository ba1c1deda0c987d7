"""Round-6e operators: D8 flow accumulation, winsorization, document
chunking. Independent re-derivations (python graph walk, numpy
percentile, string slicing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pda_spark.functions import profiling, text
from pda_spark.operators import tiling


def _cell(res, ix, iy):
    return (res << 58) + (ix << 29) + iy


ARMS = [(1, 0, 1, 2), (1, -1, 2, 1), (0, -1, 4, 2), (-1, -1, 8, 1),
        (-1, 0, 16, 2), (-1, 1, 32, 1), (0, 1, 64, 2), (1, 1, 128, 1)]
STEP = {1: (1, 0), 2: (1, -1), 4: (0, -1), 8: (-1, -1),
        16: (-1, 0), 32: (-1, 1), 64: (0, 1), 128: (1, 1)}


def _py_d8(pts, n):
    flow = {}
    for (ix, iy), v in pts.items():
        cand = [(0, 0, 0)]
        for dx, dy, code, w in ARMS:
            nx, ny = ix + dx, iy + dy
            if 0 <= nx < n and 0 <= ny < n and (nx, ny) in pts and v - pts[(nx, ny)] > 0:
                d = v - pts[(nx, ny)]
                cand.append((d * d * w, -code, code))
        flow[(ix, iy)] = max(cand)[2]
    return flow


def test_flow_accumulation_vs_python_walk(spark):
    """acc(c) == #cells whose full descent path hits c (self included),
    re-derived by walking every cell's parent chain in python."""
    res = 6
    rng = np.random.default_rng(9)
    n = 1 << res
    pts = {(int(a), int(b)): int(v) for a, b, v in zip(
        rng.integers(0, 10, 150), rng.integers(0, 10, 150), rng.integers(1, 12, 150)
    )}
    df = spark.createDataFrame(
        [(_cell(res, ix, iy), v) for (ix, iy), v in pts.items()], "cell long, n long"
    )
    got = {(r.ix, r.iy): (r.flow_dir, r.acc) for r in tiling.flow_accumulation(df, res).collect()}
    flow = _py_d8(pts, n)
    want = {c: 0 for c in pts}
    for c in pts:
        cur = c
        while True:
            want[cur] += 1
            code = flow[cur]
            if code == 0:
                break
            dx, dy = STEP[code]
            cur = (cur[0] + dx, cur[1] + dy)
    assert {c: a for c, (_, a) in got.items()} == want
    assert {c: f for c, (f, _) in got.items()} == flow
    # conservation: every cell contributes its own 1 exactly once per
    # path node; sinks absorb their whole basin
    assert sum(a for _, a in got.values()) == sum(want.values())


def test_flow_accumulation_chain(spark):
    """A strictly decreasing chain accumulates 1..k along the path."""
    res = 6
    vals = [(5, 5, 50), (6, 5, 40), (7, 5, 30), (8, 6, 20), (9, 7, 10)]
    df = spark.createDataFrame(
        [(_cell(res, ix, iy), v) for ix, iy, v in vals], "cell long, n long"
    )
    got = {(r.ix, r.iy): r.acc for r in tiling.flow_accumulation(df, res).collect()}
    assert got == {(5, 5): 1, (6, 5): 2, (7, 5): 3, (8, 6): 4, (9, 7): 5}


def test_winsorize_vs_numpy(spark):
    rng = np.random.default_rng(2)
    rows = []
    for g in ("a", "b"):
        for i, v in enumerate(rng.normal(100 if g == "a" else 500, 50, 40)):
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, "g string, v double")
    got = [(r.g, r.v, r.v_wins) for r in profiling.winsorize(df, "v", ["g"], 0.1, 0.9).collect()]
    pdf = {g: sorted(v for gg, v in rows if gg == g) for g in ("a", "b")}
    for g, v, w in got:
        lo = float(np.quantile(pdf[g], 0.1))  # numpy 'linear' == p*(n-1)
        hi = float(np.quantile(pdf[g], 0.9))
        assert w == pytest.approx(min(max(v, lo), hi), abs=1e-9)
    # clipping actually happened at both tails in each group
    for g in ("a", "b"):
        ws = [w for gg, _, w in got if gg == g]
        vs = [v for gg, v, _ in got if gg == g]
        assert min(ws) > min(vs) and max(ws) < max(vs)

    with pytest.raises(ValueError):
        profiling.winsorize(df, "v", ["g"], 0.9, 0.1)


def test_winsorize_null_group_and_null_value(spark):
    """Review findings: NULL group keys must not be silently dropped
    (null-safe join), and NULL values must stay NULL (greatest/least
    skip nulls and would invent a p05 measurement)."""
    rows = [("a", 1.0), ("a", 2.0), ("a", 100.0), ("a", None),
            (None, 5.0), (None, 6.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = profiling.winsorize(df, "v", ["g"], 0.25, 0.75).collect()
    assert len(out) == len(rows), "rows were silently dropped"
    null_group = sorted(r.v for r in out if r.g is None)
    assert null_group == [5.0, 6.0, 7.0]
    for r in out:
        if r.v is None:
            assert r.v_wins is None, "NULL value must stay NULL"


def test_chunk_text_vs_python(spark):
    docs = [
        (1, "abcdefghij" * 5),   # 50 chars
        (2, "short"),
        (3, ""),                 # empty doc -> one empty chunk
        (4, "x" * 16),           # exact multiple of step
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    chunk_chars, overlap = 16, 4
    step = chunk_chars - overlap
    got = {}
    for r in text.chunk_text(df, chunk_chars, overlap).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    for doc_id, t in docs:
        n = max(-(-(len(t) - overlap) // step), 1)
        want = [(k, t[k * step: k * step + chunk_chars]) for k in range(n)]
        assert sorted(got[doc_id]) == want, (doc_id, sorted(got[doc_id]), want)
    # overlap property: consecutive chunks share `overlap` chars
    chunks = [c for _, c in sorted(got[1])]
    for a, b in zip(chunks, chunks[1:]):
        assert a[-overlap:] == b[:overlap]

    with pytest.raises(ValueError):
        text.chunk_text(df, 10, 10)


def test_dedup_keep_best(spark):
    from pda_spark.functions import dedup

    rows = [
        ("u1", 1, 10), ("u1", 2, 30), ("u1", 3, 30),  # tie on len -> min id
        ("u2", 4, 5),
    ]
    df = spark.createDataFrame(rows, "url string, doc_id long, n long")
    best = dedup.dedup_keep_best(
        df, ["url"], [F.col("n").desc(), F.col("doc_id").asc()]
    ).collect()
    got = {r.url: r.doc_id for r in best}
    assert got == {"u1": 2, "u2": 4}
    assert len(best) == 2


def test_knox_counts_vs_bruteforce(spark):
    from pda_spark.operators import temporal

    rng = np.random.default_rng(17)
    n = 400
    x = rng.uniform(0, 5, n)
    y = rng.uniform(0, 5, n)
    t = rng.integers(0, 10**7, n)
    eps, tau = 0.8, 10**6
    df = spark.createDataFrame(
        [(i, float(x[i]), float(y[i]), int(t[i])) for i in range(n)],
        "id long, x double, y double, t_us long",
    )
    row = temporal.knox_counts(df, eps=eps, tau_us=tau).collect()[0]
    ns = nt = nb = 0
    for i in range(n):
        for j in range(i + 1, n):
            sp = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2 <= eps * eps
            tp = abs(int(t[i]) - int(t[j])) <= tau
            ns += sp
            nt += tp
            nb += sp and tp
    assert (row.n_points, row.n_pairs) == (n, n * (n - 1) // 2)
    assert (row.n_space, row.n_time, row.n_both) == (ns, nt, nb)
    assert row.n_both > 0 and row.n_space > row.n_both


def test_knox_validation_and_dedup_rn_preserved(spark):
    """Review findings: knox rejects degenerate eps/tau at the API
    boundary (not a mid-plan ANSI divide-by-zero); dedup_keep_best must
    not clobber a caller's own _rn column."""
    from pda_spark.functions import dedup
    from pda_spark.operators import temporal

    df = spark.createDataFrame([(1, 0.0, 0.0, 0)], "id long, x double, y double, t_us long")
    with pytest.raises(ValueError):
        temporal.knox_counts(df, eps=0.5, tau_us=0)
    with pytest.raises(ValueError):
        temporal.knox_counts(df, eps=0.0, tau_us=10)

    d2 = spark.createDataFrame([("u", 1, 10, 7), ("u", 2, 20, 8)], "url string, doc_id long, n long, _rn long")
    best = dedup.dedup_keep_best(d2, ["url"], [F.col("n").desc()]).collect()
    assert len(best) == 1 and best[0]._rn == 8, "caller's _rn column must survive"
