"""Distributed data sketches, expressed relationally so they stay
mergeable, deterministic, and oracle-replayable.

Spark's own approx_count_distinct / percentile_approx are
implementation-defined (no cross-engine twin can replay them), so the
sketches here are built from first principles on portable primitives:
the md5 hex fold (``dedup.hex_to_long``) for hashing and bin()-length
bit math both engines share. Reference: the HyperLogLog construction of
Flajolet et al. 2007 (register = top p hash bits, rho = leading-zero
rank of the rest); the relational formulation — sketch AS a table,
merge AS max-groupBy — is the standard large-scale shape (e.g.
BigQuery/DataSketches HLL union semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pda_spark.functions.dedup import hex_to_long

_HASH_BITS = 48  # md5 hex fold width (12 hex chars, dedup.hex_to_long)


def hll_registers(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """HyperLogLog register table for the distinct count of ``col``:
    one row per OCCUPIED register, (register, max_rho). The register is
    the top ``p`` bits of the 48-bit md5 fold; rho is the position of
    the highest set bit of the remaining b = 48-p bits counted from the
    top (1..b, or b+1 when they are all zero) — computed as
    b - length(bin(v)) + 1, pure integer, identical in both engines.

    This IS the sketch, in relational form: the groupBy-max is
    map-side combinable, two sketches union by unioning the tables and
    re-running the same max — the property that makes HLL the 100 TB
    distinct-count tool (one pass, 2^p state, no shuffle of raw
    values). The estimator is left to the consumer (alpha_m * m^2 /
    (sum 2^-rho + empty registers)) — emitting integer registers
    instead of the float estimate keeps the operator order-independent
    and bit-exact (the q72/q109 discipline).
    """
    if not 2 <= p <= 16:
        raise ValueError(f"p must be in [2, 16], got {p}")
    b = _HASH_BITS - p
    # distinct-count semantics are over non-NULL values: md5(NULL) is
    # NULL and would emit a (NULL, NULL) register row that hll_estimate
    # counts in n_occupied but skips in the sum — silently biasing the
    # estimate. COUNT(DISTINCT) ignores NULLs; so do we.
    df = df.filter(F.col(col).isNotNull())
    h = hex_to_long(F.md5(F.col(col).cast("string")))
    v = h.bitwiseAND(F.lit((1 << b) - 1))
    rho = (
        F.when(v == F.lit(0), F.lit(b + 1))
        .otherwise(F.lit(b + 1) - F.length(F.bin(v)))
        .cast("long")
    )
    return (
        df.select(
            F.shiftright(h, b).alias("register"),
            rho.alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Assemble the HLL cardinality estimate from a register table —
    one row (m_registers, n_occupied, s_scaled, estimate). s_scaled =
    sum over occupied registers of 2^(B+1-rho) with B = 48-p (an
    integer: rho <= B+1), so sum(2^-rho) = s_scaled / 2^(B+1) exactly;
    empty registers contribute 2^0 each after scaling. The single float
    expression (alpha_m * m^2 * 2^(B+1)) / (s_scaled + empties*2^(B+1))
    is one division over exact integers — replayable anywhere. Uses the
    standard alpha_m = 0.7213/(1+1.079/m) (m >= 128); no small-range
    linear-counting correction (docstring contract — callers at tiny n
    should read n_occupied directly)."""
    m = 1 << p
    b1 = _HASH_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).cast("long").alias("n_occupied"),
        # shiftleft with a column shift amount needs the SQL form (the
        # python wrapper's numBits is int-only)
        # coalesce: an EMPTY register table (sketch of zero rows) sums
        # to NULL; 0 keeps the estimate defined (all-empty denominator).
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {b1} - max_rho)")),
            F.lit(0),
        )
        .cast("long")
        .alias("s_scaled"),
    )
    denom = (
        F.col("s_scaled") + (F.lit(m) - F.col("n_occupied")) * F.lit(1 << b1)
    ).cast("double")
    est = F.lit(alpha * m * m * float(1 << b1)) / denom
    return agg.select(
        F.lit(m).cast("long").alias("m_registers"),
        "n_occupied",
        "s_scaled",
        est.alias("estimate"),
    )


def cms_build(df: DataFrame, col: str, d: int = 4, w: int = 64) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a relational
    op: d independent hash rows x w counters, built as the table
    (hrow, bucket, cnt) — at most d*w rows regardless of input size.
    Hash i is the md5 fold of 'i:<value>' (the seed folded into the
    hashed string keeps every engine's md5 identical), bucket = hash
    mod w. Like ``hll_registers`` this IS the sketch in relational
    form: counters are one map-side-combinable grouped count, two
    sketches merge by unioning and re-summing, and the estimate
    (``cms_query``) never touches raw data again. All integers —
    order-independent and engine-exact."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2, got d={d} w={w}")
    rows = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("hrow")
    # NULLs hash to bucket NULL — rows cms_query's equi-join can never
    # match (and they break the d*w row bound). Frequency sketches count
    # non-NULL occurrences; a NULL probe in cms_query correctly yields
    # est=0 through the left join's coalesce.
    #
    # Count-by-value BEFORE hashing (round-6 perf): a frequency sketch
    # is only interesting when values repeat, so the integer groupBy
    # (map-side combinable) collapses the stream to its distinct values
    # and each value is md5-hashed d times ONCE instead of d times per
    # occurrence (q125 at sf0.1: 24M -> 4k md5 calls). Trade-off,
    # documented: this adds one value-keyed shuffle bounded by the
    # column's cardinality; for near-unique streams (where a CMS is
    # pointless anyway) the old shape's hash-everything was cheaper.
    counted = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    tagged = counted.select("_v", "_n", rows)
    bucket = F.pmod(
        hex_to_long(F.md5(F.concat(F.col("hrow").cast("string"), F.lit(":"), F.col("_v")))),
        F.lit(w),
    )
    return (
        tagged.select("hrow", bucket.alias("bucket"), "_n")
        .groupBy("hrow", "bucket")
        .agg(F.sum("_n").cast("long").alias("cnt"))
    )


def cms_query(cms: DataFrame, items: DataFrame, col: str, d: int = 4, w: int = 64) -> DataFrame:
    """Point-frequency estimates from a ``cms_build`` table: for each
    item, est = min over the d rows of the counter its hash lands in
    (0 when a row's counter is absent — the sketch table only stores
    touched buckets). The classic CMS guarantee holds: est >= true
    count, with overshoot bounded by collisions. One explode + one
    equi-join against the (tiny) sketch + one grouped min; the raw
    stream is never re-read — the point of a sketch at 100 TB."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("hrow")
    tagged = items.select(F.col(col).alias("item")).select(
        "item", F.col("item").cast("string").alias("_v"), rows
    )
    bucket = F.pmod(
        hex_to_long(F.md5(F.concat(F.col("hrow").cast("string"), F.lit(":"), F.col("_v")))),
        F.lit(w),
    )
    probes = tagged.select("item", "hrow", bucket.alias("bucket"))
    return (
        probes.join(F.broadcast(cms), ["hrow", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def bloom_build(df: DataFrame, col: str, k: int = 4, m: int = 1024) -> DataFrame:
    """Bloom filter as a relational op — the membership sibling of
    ``hll_registers`` (cardinality) and ``cms_build`` (frequency),
    completing the sketch family: one row per SET bit position, built
    from k independent md5-fold hashes per value (hash i = fold of
    'i:<value>' mod m, the exact ``cms_build`` seeding construction).

    Like the other two, the sketch IS the table: at most m rows
    regardless of input size, built by one explode + one DISTINCT
    (map-side combinable); two filters union by unioning the tables
    and re-distincting — the mergeability that makes a Bloom filter
    the 100 TB pre-join pruning tool (ship the bit table, not the
    keys). NULLs are excluded (membership is over non-NULL values;
    a NULL probe correctly reports absent)."""
    if k < 1 or m < 2:
        raise ValueError(f"need k >= 1, m >= 2, got k={k} m={m}")
    hashes = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("hidx")
    # Distinct-by-value BEFORE hashing (the cms_build round-6 trade,
    # same rationale): membership only sees each distinct value once,
    # so dedup first and hash k times per VALUE, not per occurrence.
    tagged = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias("_v"))
        .distinct()
        .select("_v", hashes)
    )
    pos = F.pmod(
        hex_to_long(F.md5(F.concat(F.col("hidx").cast("string"), F.lit(":"), F.col("_v")))),
        F.lit(m),
    )
    return tagged.select(pos.alias("pos")).distinct()


def bloom_probe(
    bloom: DataFrame, items: DataFrame, col: str, k: int = 4, m: int = 1024
) -> DataFrame:
    """Membership probes against a ``bloom_build`` bit table: an item is
    maybe-present iff ALL k of its bit positions are set (the classic
    no-false-negative / bounded-false-positive contract). One explode +
    one broadcast left join against the (tiny, <= m rows) bit table +
    one grouped count — matched == k means every bit hit. A NULL item
    hashes to NULL positions, joins nothing, and reports 0 (absent) —
    consistent with the build-side NULL exclusion. Probes are
    DISTINCT'd first (one output row per distinct item): duplicate
    probe values would otherwise contribute 2k matched rows and fail
    the == k test — a FALSE NEGATIVE, the one error a Bloom filter
    must never make."""
    hashes = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("hidx")
    tagged = (
        items.select(F.col(col).alias("item"))
        .distinct()
        .select("item", F.col("item").cast("string").alias("_v"), hashes)
    )
    pos = F.pmod(
        hex_to_long(F.md5(F.concat(F.col("hidx").cast("string"), F.lit(":"), F.col("_v")))),
        F.lit(m),
    )
    probes = tagged.select("item", pos.alias("pos"))
    return (
        probes.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), ["pos"], "left")
        .groupBy("item")
        .agg(
            F.when(F.count("_set") == F.lit(k), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("maybe_present")
        )
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    k: int = 4,
    m: int = 4096,
) -> DataFrame:
    """Inner equi-join with a Bloom-filter pre-prune on the fact side —
    THE 100 TB pre-join pattern the sketch family exists for: the dim
    keys' bit table (<= m bits) collapses to a constant-folded literal
    INT ARRAY baked into the fact-side filter, so pruning is pure
    whole-stage codegen (k element_at probes per row), touches the
    fact table in its scan stage, and ships nothing but the final
    survivors to the join. (A '0'/'1' string literal probed with
    substring() was 6x slower — 11.9 vs 1.8 s on the q160 shape;
    Catalyst folds the array to one Literal, substring on a long
    UTF8String constant does per-row work.) False positives are removed by the join itself; the Bloom
    no-false-negative guarantee makes the result provably IDENTICAL to
    the plain join — which is exactly what the q160 gate's plain-join
    oracle checks end-to-end.

    The bit table collect is edge-bounded by construction (<= m rows,
    default 4096 — the n_centroids-collect class, never data-sized).
    Join semantics: inner, on fact_key == dim_key; both key columns
    survive (Spark's different-name join keeps the pair)."""
    bits = {int(r["pos"]) for r in bloom_build(dim, dim_key, k=k, m=m).collect()}
    arrlit = F.lit([1 if i in bits else 0 for i in range(m)])
    probe = F.col(fact_key).cast("string")
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(
            hex_to_long(F.md5(F.concat(F.lit(f"{i}:"), probe))), F.lit(m)
        )
        cond = cond & (F.element_at(arrlit, (pos + 1).cast("int")) == 1)
    pruned = fact.filter(F.col(fact_key).isNotNull()).filter(cond)
    return pruned.join(F.broadcast(dim), pruned[fact_key] == dim[dim_key])


def cms_join_size(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two ``cms_build`` sketches
    over the join keys — the classic CMS inner-product estimator
    (Cormode & Muthukrishnan 2005, §4.2): for each hash row r,
    sum_b cnt_a[r,b] * cnt_b[r,b] upper-bounds |A join B| (every true
    key pair lands in the same bucket; collisions only ADD), and the
    estimate is the MIN over the hash rows BOTH sketches carry — the
    query-optimizer join-size oracle at 100 TB, computed from two d*w
    tables without touching either input again. The row universe is
    derived FROM the sketches (round-6 review: a caller-passed d
    larger than the build d made the old count-based absence check
    return 0, violating the upper-bound contract); a shared hash row
    with no shared buckets has inner product 0 — correctly: no key
    can be common. Exact integer arithmetic end-to-end. Returns a
    single row (est_join_size); two genuinely empty sketches estimate
    0."""
    rows_both = (
        cms_a.select("hrow").distinct().join(cms_b.select("hrow").distinct(), "hrow")
    )
    j = cms_a.alias("a").join(
        cms_b.alias("b"), ["hrow", "bucket"]
    )
    per_row = j.groupBy("hrow").agg(
        F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("_ip")
    )
    return (
        rows_both.join(per_row, "hrow", "left")
        .agg(
            F.coalesce(F.min(F.coalesce(F.col("_ip"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("est_join_size")
        )
    )
