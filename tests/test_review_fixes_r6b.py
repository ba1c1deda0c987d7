"""Regression tests for the round-6b code-review findings (7 operator
defects in the q114-q132 batch). Each test reproduces the reviewed
failure scenario directly — NULL inputs, empty inputs, default
arguments, plan shape — not just the happy path the gates exercise.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import formatted_plan

from pda_spark.functions import profiling, sketch, text
from pda_spark.operators import pareto


# ------------------------------------------------------------ skyline


def test_skyline_phase1_not_serialized_by_coalesce(spark):
    """Phase 2 must gather via repartition(1) (a shuffle boundary), not
    coalesce(1): coalesce is a narrow dependency that fuses scan ->
    phase-1 kernel -> one task, running every local skyline serially."""
    df = spark.range(0, 400, 1, 8).select(
        (F.col("id") % 17).cast("double").alias("a"),
        (F.col("id") % 13).cast("double").alias("b"),
    )
    sky = pareto.skyline(df, minimize=["a"], maximize=["b"])
    plan = formatted_plan(sky)
    assert "Coalesce" not in plan, "phase-2 gather must not be a narrow coalesce"
    assert "Exchange" in plan, "phase boundary must be a shuffle"
    # correctness unchanged: the skyline set is unique
    rows = {(r.a, r.b) for r in sky.collect()}
    pdf = df.toPandas()
    expect = set()
    vals = list(zip(pdf.a, pdf.b))
    for x in vals:
        dominated = any(
            (y[0] <= x[0] and y[1] >= x[1]) and (y[0] < x[0] or y[1] > x[1])
            for y in vals
        )
        if not dominated:
            expect.add(x)
    assert rows == expect


# ---------------------------------------------------------------- HLL


def test_hll_registers_ignore_nulls(spark):
    """A nullable column must not emit a (NULL, NULL) register row, and
    the estimate must equal the sketch of the same non-NULL values."""
    vals = [(i % 50,) for i in range(200)]
    with_nulls = spark.createDataFrame(vals + [(None,)] * 25, "v int")
    without = spark.createDataFrame(vals, "v int")
    r1 = sketch.hll_registers(with_nulls, "v").toPandas()
    r2 = sketch.hll_registers(without, "v").toPandas()
    assert not r1.register.isna().any()
    assert not r1.max_rho.isna().any()
    key = lambda p: sorted(map(tuple, p.values.tolist()))
    assert key(r1) == key(r2)


def test_hll_estimate_empty_sketch_defined(spark):
    """The estimate of an empty relation is a defined number (~0), not
    NULL: s_scaled coalesces to 0 so the denominator stays finite."""
    empty = spark.createDataFrame([], "v int")
    est = sketch.hll_estimate(sketch.hll_registers(empty, "v")).collect()[0]
    assert est.n_occupied == 0
    assert est.s_scaled == 0
    assert est.estimate is not None
    # all-empty registers: alpha*m^2*2^(B+1) / (m*2^(B+1)) = alpha*m
    assert 0 < est.estimate < est.m_registers


# ---------------------------------------------------------------- CMS


def test_cms_null_values_excluded(spark):
    """NULLs must not occupy unqueryable (hrow, NULL) buckets: sketch
    mass equals the non-NULL count and a NULL probe estimates 0."""
    d, w = 4, 64
    data = [(i % 10,) for i in range(100)]
    df = spark.createDataFrame(data + [(None,)] * 30, "v int")
    cms = sketch.cms_build(df, "v", d=d, w=w)
    pdf = cms.toPandas()
    assert not pdf.bucket.isna().any()
    # each of the d hash rows holds exactly the 100 non-NULL occurrences
    assert pdf.groupby("hrow").cnt.sum().tolist() == [100] * d
    probes = spark.createDataFrame([(3,), (None,)], "item int")
    est = {r.item: r.est for r in sketch.cms_query(cms, probes, "item", d=d, w=w).collect()}
    assert est[3] >= 10  # CMS never undercounts
    assert est[None] == 0


# ------------------------------------------------- term co-occurrence


def test_term_cooccurrence_defaults_are_noop(spark):
    """Default thresholds must keep EVERY co-occurring pair; the old
    min_pair default (1/1) required a pair in every document."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "delta epsilon")],
        "doc_id long, text string",
    )
    pairs = {
        (r.term_a, r.term_b)
        for r in text.term_cooccurrence(docs).collect()
    }
    # no pair appears in all 3 docs -> old default returned {} here
    assert pairs == {("alpha", "beta"), ("alpha", "gamma"), ("delta", "epsilon")}


# ---------------------------------------------------------- profiling


def test_profile_table_single_scan(spark, tmp_path):
    """The melt must be one explode projection — one scan of the source
    — not a unionAll branch per column (n_cols re-scans at 100 TB)."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a", None), (2, None, 1.5), (2, "b", 2.5)], "k int, s string, x double"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    prof = profiling.profile_table(df)
    import re

    plan = formatted_plan(prof)
    # formatted explain prints each node in the tree AND a detail
    # section — count the numbered detail headers only
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, "profile must scan the table once"
    got = {r.column: (r.n_rows, r.n_null, r.n_distinct) for r in prof.collect()}
    assert got == {"k": (3, 0, 2), "s": (3, 1, 2), "x": (3, 1, 2)}


def test_profile_table_empty_input_reports_all_columns(spark):
    """An empty partition must still report one (column, 0, 0, 0) row
    per column — silence is the one thing a quality check can't do."""
    empty = spark.createDataFrame([], "k int, s string")
    got = {r.column: (r.n_rows, r.n_null, r.n_distinct) for r in profiling.profile_table(empty).collect()}
    assert got == {"k": (0, 0, 0), "s": (0, 0, 0)}
