"""Period-bucketed heat time series (reference app/maps.py:56-76).

The reference dashboard buckets image timestamps with a user-chosen grain
(``df.time_acquired.dt.to_period(period)`` with M/W/D/H/T), gap-fills the
bucket range (``pd.period_range``), and feeds per-bucket lat/lon to a
time-animated heatmap. Spark-first translation:

- bucket  = ``date_trunc(grain, ts)`` (pure Catalyst, codegen'd);
- gap fill = ``sequence(min_bucket, max_bucket, interval 1 <grain>)``
  exploded and left-joined (the J9 pattern, one tiny broadcast);
- heat stats ride as integer sums (``sum(floor(lat*100))``): per-row
  floor on identical doubles is engine-portable and integer sums are
  associative/order-independent — float mean would be partition-order
  dependent at scale. Consumers derive mean = sum / (100 * n).

Scale: one map-side-combinable aggregation on the bucket key; the gap
fill joins against a generated dimension of |range|/grain rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# pandas-style grain codes (reference uses M/W/D/H/T) -> date_trunc field
GRAINS = {"M": "month", "W": "week", "D": "day", "H": "hour", "T": "minute"}
_STEP = {"M": "interval 1 month", "W": "interval 7 day", "D": "interval 1 day",
         "H": "interval 1 hour", "T": "interval 1 minute"}
# month/week/day truncate to midnight -> DATE semantics; hour/minute keep time
_DATE_GRAINS = {"M", "W", "D"}


def time_bucket(ts_col, grain: str):
    """date_trunc with pandas-style grain code (M/W/D/H/T)."""
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {sorted(GRAINS)}, got {grain!r}")
    b = F.date_trunc(GRAINS[grain], ts_col)
    return F.to_date(b) if grain in _DATE_GRAINS else b


def heat_timeseries(
    df: DataFrame,
    grain: str = "D",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Gap-filled per-bucket event counts + heat centroids-as-integer-sums:
    (bucket, n_events, sum_lat_c, sum_lon_c) with empty buckets at 0."""
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {sorted(GRAINS)}, got {grain!r}")
    bucket = time_bucket(F.col(ts_col), grain)
    agg = df.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col(lat_col) * 100.0).cast("long")).alias("sum_lat_c"),
        F.sum(F.floor(F.col(lon_col) * 100.0).cast("long")).alias("sum_lon_c"),
    )
    bounds = df.agg(
        time_bucket(F.min(ts_col), grain).alias("lo"),
        time_bucket(F.max(ts_col), grain).alias("hi"),
    )
    buckets = bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, {_STEP[grain]})")).alias("bucket")
    )
    return buckets.join(agg, on="bucket", how="left").select(
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_lat_c", F.lit(0)).alias("sum_lat_c"),
        F.coalesce("sum_lon_c", F.lit(0)).alias("sum_lon_c"),
    )


def cusum_changepoint(
    series: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """CUSUM change-point statistic per key (Page 1954 / the
    mean-shift detector behind monitoring dashboards): with the series
    x_1..x_n in t-order, S = total, cum_k = running sum, the scaled
    deviation dev_k = n*cum_k - k*S (= n^2 * (mean-so-far deviation),
    INTEGER by construction — the q109 d_i trick applied to cumulative
    sums). The change point is the t with maximal |dev_k|, smallest t
    on ties (deterministic argmax via one max(struct)). Returns
    (key, n_t, total, max_absdev, cp_t).

    Shape: one window (cumsum + row_number) partitioned by key, one
    grouped max — the series shuffles once; integer-exact everywhere,
    so any engine replays it. t must be an integer (epoch day/period).

    Scale note: like q117's Mann-Kendall, this runs on per-(key, t)
    AGGREGATES (bounded bins), never raw events; headroom contract
    n * |cum| < 2^63."""
    base = series.select(
        F.col(key_col).alias("key"),
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    # windows over the RENAMED columns (the caller's names are gone)
    w = Window.partitionBy("key").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("key")
    cum = base.select(
        "key",
        "t",
        F.sum("x").over(w).alias("_cum"),
        F.row_number().over(Window.partitionBy("key").orderBy("t")).alias("_k"),
    )
    dev = cum.select(
        "key",
        "t",
        F.count(F.lit(1)).over(wall).alias("_n"),
        F.last("_cum").over(
            Window.partitionBy("key").orderBy("t").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_tot"),
        "_cum",
        "_k",
    )
    absdev = F.abs(F.col("_n") * F.col("_cum") - F.col("_k") * F.col("_tot"))
    picked = dev.groupBy("key").agg(
        F.max("_n").cast("long").alias("n_t"),
        F.max("_tot").cast("long").alias("total"),
        F.max(F.struct(absdev.alias("a"), (-F.col("t")).alias("nt"))).alias("_best"),
    )
    return picked.select(
        "key",
        "n_t",
        "total",
        F.col("_best.a").cast("long").alias("max_absdev"),
        (-F.col("_best.nt")).cast("long").alias("cp_t"),
    )


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 16,
) -> DataFrame:
    """Exponentially-weighted moving sum with DYADIC decay (alpha =
    1/2) over the last ``window`` rows per key:

        s_t = sum_{j=0..window-1}  x_{t-j} * 2^-j

    The decay rate is fixed at 1/2 BY DESIGN, not convenience: every
    weight 2^-j is an exact double, and when x is integer-valued with
    |x| < 2^(52 - window) every term AND every partial sum is exact
    (all terms are multiples of 2^-(window-1) well inside the
    53-bit mantissa) — so the float result is order-independent and
    engine-exact, where an arbitrary-alpha EWMA would accumulate
    rounding that no cross-engine oracle can replay. Callers needing
    other decays rescale time (decay 1/2 per k rows == decay 2^-1/k
    per row).

    One window pass, pure codegen: the sum unrolls to ``window``
    lag() terms (lag j weighted by 1/2^j, missing leading rows
    contribute 0), no join, no Python. The ordered window requires a
    unique (key, order) — the q68 analytic-window contract."""
    if not 1 <= window <= 48:
        raise ValueError(f"window must be in [1, 48], got {window}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    terms = [
        (F.coalesce(F.lag(F.col(value_col).cast("long"), j).over(w), F.lit(0))
         / F.lit(float(1 << j)))
        for j in range(window)
    ]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return df.withColumn("_ewma", s).select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("long").alias("x"),
        F.col("_ewma").alias("ewma"),
    )


def rolling_median(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 5,
) -> DataFrame:
    """Exact rolling median over the last ``window`` rows per key — the
    robust smoother (a rolling MEAN chases every outlier; the median
    ignores them until they are half the frame). Runs Spark's exact
    ``percentile`` as a windowed aggregate over a bounded ROWS frame:
    integer-valued inputs keep the even-count interpolation dyadic-
    exact (the q67/q151 discipline), so DuckDB's windowed
    quantile_cont replays it bit-for-bit. Requires a unique
    (key, order) — the q68 contract. Leading rows use the shorter
    available frame (standard SQL frame semantics, identical in both
    engines)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    # percentile runs over the SAME aliased cast('long') column the
    # result emits as x (ADVICE r06: interpolating value_col verbatim
    # into F.expr broke on non-identifier names, and a float-typed
    # input silently diverged from the integer-exact contract)
    d = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("long").alias("x"),
    )
    w = Window.partitionBy("key").orderBy("t").rowsBetween(-(window - 1), 0)
    return d.select(
        "key", "t", "x", F.round(F.expr("percentile(x, 0.5)").over(w), 6).alias("roll_med")
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build from a change
    log: per key, consecutive rows whose tracked attributes all equal
    the previous row's collapse into one VERSION; each version gets
    [valid_from_us, valid_to_us) (epoch MICROseconds, the q84 rule;
    open version -> NULL valid_to_us), a 1-based version number and an
    is_current flag — the standard warehouse dimension-history shape.

    Pure window composition, one shuffle on the key: change detection
    is a lag over (ts, tiebreak); version id is the running sum of
    change flags; the version interval is a grouped min + a lead.
    Equal-timestamp changes order by the tiebreak (callers pass the
    log's unique sequence column)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # null-safe per-attr change flags OR'd together (IS DISTINCT FROM —
    # a plain != is NULL against a NULL side and a coalesce over the
    # flags would pick the FIRST non-null, not ANY); the lag(ts)-is-null
    # term starts version 1 on each key's first row even when every
    # attribute is NULL there.
    any_changed = F.lag(ts_col).over(w).isNull()
    for c in attr_cols:
        any_changed = any_changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    changed = F.when(any_changed, F.lit(1)).otherwise(F.lit(0))
    seg = df.withColumn("_chg", changed).withColumn(
        "_ver", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ver = seg.groupBy(F.col(key_col).alias("key"), F.col("_ver").alias("version")).agg(
        F.min(us).alias("valid_from_us"),
        *[F.first(c).alias(c) for c in attr_cols],
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    w2 = Window.partitionBy("key").orderBy("version")
    return ver.select(
        "key",
        F.col("version").cast("long").alias("version"),
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        *attr_cols,
        "n_rows",
    ).withColumn("is_current", F.col("valid_to_us").isNull())


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key for IRREGULARLY sampled series —
    the sensor/billing metric a plain mean gets wrong (a value held
    for an hour must weigh 3600x one held for a second): step-function
    semantics, value holds from its timestamp until the next sample,
    twa = sum(x_i * (t_{i+1} - t_i)) / (t_last - t_first). Both sums
    are exact int64 — t is epoch MICROseconds (the q84 rule; a
    seconds-based variant hit the Spark-floors-vs-DuckDB-rounds cast
    divergence on fractional timestamps); overflow contract
    |x| * span_us < 2^63 per key (the q150 discipline); the emitted ``twa``
    is the one final division (round 6). Keys with a single sample
    (zero span) emit NULL twa. One window (lead) + one grouped
    aggregate; the last sample carries no weight — the standard
    right-open step convention."""
    base = df.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
        F.col(value_col).cast("long").alias("_x"),
    )
    w = Window.partitionBy("key").orderBy("_t", "_x")
    stepped = base.withColumn("_nxt", F.lead("_t").over(w))
    g = stepped.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col("_x") * (F.col("_nxt") - F.col("_t"))), F.lit(0))
        .cast("long")
        .alias("twa_num"),
        (F.max("_t") - F.min("_t")).cast("long").alias("twa_den"),
    )
    return g.select(
        "key",
        "n",
        "twa_num",
        "twa_den",
        F.round(
            F.when(
                F.col("twa_den") > 0,
                F.col("twa_num").cast("double") / F.col("twa_den").cast("double"),
            ),
            6,
        ).alias("twa"),
    )


def gaps_islands(
    df: DataFrame,
    key_col,
    seq_col: str,
) -> DataFrame:
    """Gaps-and-islands over an integer sequence per key (the SQL
    classic): maximal runs of CONSECUTIVE distinct values collapse to
    one row (key..., island_start, island_end, island_len) —
    consecutive active days, unbroken sensor sequences, contiguous id
    ranges. The rn-difference trick: within a key, seq - row_number()
    over (ORDER BY seq) is constant exactly on each island (both
    advance by 1 inside a run). Duplicates are collapsed FIRST
    (distinct) so a repeated day cannot break the arithmetic. One
    shuffle on the key; the window is per-key (the sessionize
    contract). ``key_col`` may be one name (emitted as ``key``, the
    original contract) or a LIST of names (composite keys, kept
    verbatim — the co-movement pair key; round-6 review folded that
    inline rn-difference copy back here)."""
    if isinstance(key_col, str):
        keys = ["key"]
        base = df.select(F.col(key_col).alias("key"), F.col(seq_col).cast("long").alias("seq"))
    else:
        keys = list(key_col)
        base = df.select(*keys, F.col(seq_col).cast("long").alias("seq"))
    d = base.distinct()
    w = Window.partitionBy(*keys).orderBy("seq")
    grp = d.withColumn("_g", F.col("seq") - F.row_number().over(w))
    return (
        grp.groupBy(*keys, "_g")
        .agg(
            F.min("seq").alias("island_start"),
            F.max("seq").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("island_len"),
        )
        .drop("_g")
    )


def interpolate_gaps(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation of missing (NULL) values per key over an
    integer time axis — the sensor gap-fill: a NULL at t between known
    samples (tp, vp) and (tn, vn) becomes
    vp + (vn - vp) * (t - tp) / (tn - tp); leading/trailing NULLs
    (no bracket on one side) stay NULL. The numerator products are
    exact int64 and the single division is the only float op, so both
    engines replay it bit-for-bit (round 6). One window pass each way;
    tp and vp are TWO windowed expressions over the same condition
    (``when(x is not null, t/x)`` + ignorenulls last) — they always
    come from the same row, so the pair stays consistent without a
    struct (and the oracle replays it with plain scalar windows).
    Requires unique (key, t) — the q68 contract."""
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(t_col).cast("long").alias("t"),
        F.col(value_col).cast("long").alias("x"),
    )
    wb = (
        Window.partitionBy("key")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the NEXT-known lookup runs as a RUNNING frame over descending t
    # (round-7): a (current row -> unbounded following) frame makes
    # Spark's window engine re-scan from each row to the partition end —
    # O(rows^2) per key (q169: 7.1 s at sf0.1, ~2000 rows/key; growing
    # quadratically with SF). last-non-null over unboundedPreceding..0
    # in DESC order is the same value with running O(rows) state; rows
    # with equal t cannot exist (unique (key, t) contract), so the two
    # orderings are exact mirrors.
    wf = (
        Window.partitionBy("key")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    kt = F.when(F.col("x").isNotNull(), F.col("t"))
    kv = F.when(F.col("x").isNotNull(), F.col("x"))
    s = (
        base.withColumn("_pt", F.last(kt, ignorenulls=True).over(wb))
        .withColumn("_pv", F.last(kv, ignorenulls=True).over(wb))
        .withColumn("_nt", F.last(kt, ignorenulls=True).over(wf))
        .withColumn("_nv", F.last(kv, ignorenulls=True).over(wf))
    )
    interp = F.col("_pv").cast("double") + (
        (F.col("_nv") - F.col("_pv")) * (F.col("t") - F.col("_pt"))
    ).cast("double") / (F.col("_nt") - F.col("_pt")).cast("double")
    filled = (
        F.when(F.col("x").isNotNull(), F.col("x").cast("double"))
        .when(
            F.col("_pt").isNotNull()
            & F.col("_nt").isNotNull()
            & (F.col("_nt") != F.col("_pt")),
            interp,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return s.select("key", "t", "x", F.round(filled, 6).alias("filled"))


def sax_symbols(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    frame: int = 4,
    breakpoints: tuple = (-1.0, 0.0, 1.0),
    alphabet: str = "abcd",
) -> DataFrame:
    """SAX symbolization (Lin et al. 2003 — the time-series-mining
    discretization behind motif/anomaly search): each key's series is
    cut into fixed-width frames, each frame reduces to its mean (PAA)
    and the mean maps to an alphabet symbol by fixed breakpoints; the
    per-key SAX WORD is the frame symbols in order. Determinism
    contract: integer values, so the PAA mean is one exact-int sum +
    one division; breakpoints are exact literals compared against that
    one quotient — both engines replay every compare. (Canonical SAX
    z-normalizes first — mean/stddev floats no oracle can replay;
    callers wanting it pre-scale with winsorize/mad stats instead.)
    Returns (key, n_frames, word). Partial trailing frames are
    DROPPED (standard PAA; a short frame's mean is not comparable).
    Requires unique (key, order) — the q68 contract."""
    if frame < 1:
        raise ValueError(f"frame must be >= 1, got {frame}")
    if len(alphabet) != len(breakpoints) + 1:
        raise ValueError("need len(alphabet) == len(breakpoints) + 1")
    w = Window.partitionBy(key_col).orderBy(order_col)
    rn = F.row_number().over(w) - F.lit(1)
    framed = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("x"),
        # integer floor division on longs (review: the float-divide-
        # then-cast detour contradicted the integer-exact contract)
        ((rn - F.pmod(rn, F.lit(frame))) / F.lit(frame)).cast("long").alias("_f"),
    )
    paa = (
        framed.groupBy("key", "_f")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("x").alias("_s"))
        .filter(F.col("_n") == F.lit(frame))
        .select(
            "key", "_f", (F.col("_s").cast("double") / F.lit(float(frame))).alias("_paa")
        )
    )
    sym = F.lit(alphabet[0])
    for i, b in enumerate(breakpoints):
        sym = F.when(F.col("_paa") >= F.lit(float(b)), F.lit(alphabet[i + 1])).otherwise(sym)
    lab = paa.withColumn("_sym", sym)
    return lab.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_f", "_sym"))), lambda s: s["_sym"]
            ),
            "",
        ).alias("word"),
    )


def sliding_distinct_count(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 10,
) -> DataFrame:
    """Exact distinct count over the last ``window`` rows per key —
    the sliding-uniqueness signal (distinct items a user touched in
    the last N events; a plain windowed count can't dedup and
    count(DISTINCT) OVER is unsupported in most engines): collect the
    frame as a list and count its distinct elements — deterministic
    because only the COUNT survives (list order never escapes).
    Bounded frame, so the per-row list is O(window). Requires unique
    (key, order) — the q68 contract."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(window - 1), 0)
    )
    return df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("t"),
        F.size(F.array_distinct(F.collect_list(F.col(value_col)).over(w)))
        .cast("long")
        .alias("n_distinct"),
    )
