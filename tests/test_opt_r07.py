"""Round-7 optimization regression tests.

Every optimization that changed an operator's internals gets a focused
gate here, per the round rules. The heavyweight one is the cell-based
DBSCAN rewrite (tiling.dbscan): the textbook pair-level semantics must
survive the dense-cell contraction exactly — including eps-boundary
pairs, border tie-breaks, and cells that straddle blob boundaries.
"""

from __future__ import annotations

import random

import pytest


def _brute_dbscan(pts: dict, eps: float, min_pts: int):
    """Independent textbook DBSCAN over computed-float d2 <= eps^2."""
    nb = {
        i: {j for j in pts if (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= eps * eps}
        for i in pts
    }
    cores = {i for i in pts if len(nb[i]) >= min_pts}
    lab = {}
    for c in sorted(cores):
        if c in lab:
            continue
        comp, stack = set(), [c]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(v for v in nb[u] if v in cores and v not in comp)
        for u in comp:
            lab[u] = min(comp)
    expect = {}
    for i in pts:
        if i in cores:
            expect[i] = (True, lab[i])
        else:
            near = [lab[j] for j in nb[i] if j in cores]
            expect[i] = (False, min(near) if near else None)
    return expect


@pytest.mark.parametrize("seed,eps,min_pts", [(1, 0.3, 10), (2, 0.3, 4), (3, 1.0, 5)])
def test_dbscan_cells_random_vs_bruteforce(spark, seed, eps, min_pts):
    """Random blob+scatter sets (the q124 shape): dense cells, cell-
    straddling blobs, sparse borders and noise all at once. The cell-
    contraction path must be bit-identical to the pair-level brute
    force, including which points are core and every cluster label."""
    rng = random.Random(seed)
    pts = {}
    pid = 0
    # tight blobs — eps-cliques spanning multiple eps/sqrt(2) cells
    for b in range(8):
        cxy = (rng.randint(1, 20), rng.randint(1, 12))
        n = rng.randint(3, 40)
        for _ in range(n):
            pts[pid] = (
                cxy[0] + rng.randint(0, 20) / 100.0 - 0.1,
                cxy[1] + rng.randint(0, 20) / 100.0 - 0.1,
            )
            pid += 1
    # scatter — noise and occasional borders
    for _ in range(120):
        pts[pid] = (rng.uniform(0, 22), rng.uniform(0, 14))
        pid += 1

    from pda_spark.operators import tiling

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x double, y double"
    )
    out = {
        r["id"]: (r["is_core"], r["cluster_id"])
        for r in tiling.dbscan(df, eps=eps, min_pts=min_pts).collect()
    }
    expect = _brute_dbscan(pts, eps, min_pts)
    assert out == expect
    # the fixture really exercises all three classes
    kinds = {(c, l is not None) for c, l in expect.values()}
    assert (True, True) in kinds and (False, False) in kinds


def test_lsh_neardup_string_ids_and_zero_norms(spark):
    """Round-7 review regressions for the numpy LSH refine: (a) the
    output id columns keep the input id type (the exact path's
    contract — a hardcoded long schema broke string ids); (b) zero-norm
    vectors surface the same loud DIVIDE_BY_ZERO both paths always
    raised, instead of being silently dropped by a NaN pre-filter."""
    import numpy as np
    import pytest as _pytest

    from pda_spark.functions.similarity import cosine_neardup_pairs

    rng = np.random.default_rng(7)
    rows = [(f"v{i}", [float(x) for x in rng.standard_normal(64)]) for i in range(30)]
    rows.append(("v30", rows[0][1]))  # planted near-dup of v0
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    lsh = cosine_neardup_pairs(df, threshold=0.35, exact=False).collect()
    exact = cosine_neardup_pairs(df, threshold=0.35, exact=True).collect()
    assert ("v0", "v30") in {(r.id_a, r.id_b) for r in lsh}
    assert {(r.id_a, r.id_b, r.cosine) for r in lsh} <= {
        (r.id_a, r.id_b, r.cosine) for r in exact
    }

    zdf = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [0.0] * 64), (3, [1.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    for mode in (True, False):
        with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            cosine_neardup_pairs(zdf, threshold=0.35, exact=mode).collect()
