"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design rule: everything that can stay JVM-side does (shingling, hashing,
grouping are built-in expressions); Python appears nowhere in these paths.
The portable base hash is ``md5`` (identical in Spark and DuckDB), folded
to a bigint via the first 12 hex chars, so the DuckDB oracles reproduce
signatures bit-for-bit.

Scale notes (100 TB): exact dedup is one hash-aggregate on a fingerprint
(map-side partial agg). MinHash/LSH is explode(shingles) -> per-doc agg
(one shuffle on doc id) -> band explode -> self-join on (band, band_hash)
— candidate pairs only, never the full n^2. Skewed bands (boilerplate
docs) salt like any hot key; dropDuplicates(pair) bounds re-verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pda_spark.functions.text import fingerprint

# Mersenne prime + deterministic affine coefficients for minhash
MINHASH_PRIME = (1 << 61) - 1


def minhash_coeffs(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MINHASH_PRIME - 1)), int(rng.integers(0, MINHASH_PRIME - 1)))
        for _ in range(n_hashes)
    ]


def hex_to_long(col: Column, n_hex: int = 12) -> Column:
    """First n hex chars of a hex string -> non-negative bigint (portable:
    DuckDB twin uses a positional polynomial over the same chars)."""
    return F.conv(F.substring(col, 1, n_hex), 16, 10).cast("long")


def shingle_hash(col: Column, hasher: str = "md5") -> Column:
    """Shingle -> bigint. ``md5`` (default) is the oracle-portable path
    (DuckDB replays the identical hex fold); ``xxhash64`` is the
    production path for non-oracle runs — one JVM hash call instead of
    md5+hex-conv, 64-bit (fewer collisions), not SQL-replayable
    (VERDICT r4 #5)."""
    if hasher == "xxhash64":
        return F.xxhash64(col)
    if hasher != "md5":
        raise ValueError(f"shingle_hash: unknown hasher {hasher!r}")
    return hex_to_long(F.md5(col))


def char_shingles(col_name: str, k: int = 5) -> Column:
    """Array of k-char shingles of normalized text (rolling window via
    transform(sequence(...)) — pure Catalyst, no UDF). Takes a column
    NAME so the whole expression stays one SQL string."""
    norm = f"regexp_replace(lower(trim({col_name})), '\\\\s+', ' ')"
    return F.expr(
        f"transform(sequence(1, greatest(length({norm}) - {k - 1}, 1)), i -> substring({norm}, i, {k}))"
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: keep one row per normalized-text fingerprint (the
    winner is the smallest id-ish first column for determinism)."""
    return df.withColumn("fp", fingerprint(F.col(text_col))).dropDuplicates(["fp"])


def duplicate_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact-dup histogram: fingerprint -> group size + member ids."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def doc_shingle_sets(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5,
    hasher: str = "md5",
) -> DataFrame:
    """(doc_id, sh: array<long>) — per-document DISTINCT hashed shingles
    computed entirely row-local (array_distinct + transform, whole-stage
    codegen): the per-doc dedup needs NO shuffle, unlike the previous
    explode -> dropDuplicates shape (one full exchange on (doc, h)).

    The normalized string is materialized in its OWN projection before
    the shingle transform: inlined, the regexp_replace chain re-ran once
    per array ELEMENT inside the lambda (~len(text) regex evaluations
    per doc — measured 4.2x slower on the q71 shape). _norm is
    referenced twice (length + per-element substring), which keeps
    CollapseProject from folding it back into the lambda."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    d = df.select(F.col(id_col).alias("doc_id"), norm.alias("_norm"))
    sh = F.expr(
        f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 1)),"
        f" i -> substring(_norm, i, {k}))"
    )
    d = d.select("doc_id", F.array_distinct(sh).alias("_s"))
    return d.select(
        "doc_id", F.transform("_s", lambda s: shingle_hash(s, hasher)).alias("sh")
    )


def doc_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5,
    hasher: str = "md5",
) -> DataFrame:
    """(id, shingle_hash) exploded, deduped per doc (row-local) — shared
    base for Jaccard and MinHash."""
    return doc_shingle_sets(df, id_col, text_col, k, hasher).select(
        "doc_id", F.explode("sh").alias("h")
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    hasher: str = "md5",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile train-test-overlap
    check): every training doc annotated with the number of DISTINCT
    k-gram shingles it shares with the evaluation set, plus a
    ``contaminated`` flag. Training pipelines drop or audit flagged docs
    before training so eval numbers stay honest.

    Scale shape (100 TB): the eval side is benchmarks — thousands of
    docs, not billions — so its distinct shingle-hash set broadcasts;
    the training side is one row-local shingling (no shuffle), one
    broadcast semi-ish join, one map-side-combinable count per doc, and
    a left join back to zero-fill. The training corpus is never
    shuffled on shingle.

    ``hasher``: 'md5' keeps the SQL-oracle-replayable fold; production
    runs pass 'xxhash64' (single JVM hash, 64-bit keyspace).
    """
    tr = doc_shingle_hashes(docs, id_col, text_col, k, hasher)
    ev = doc_shingle_hashes(eval_docs, id_col, text_col, k, hasher).select("h").distinct()
    hits = tr.join(F.broadcast(ev), on="h").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_shared_grams"),
        )
        .withColumn("contaminated", F.col("n_shared_grams") > 0)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard similarity >= threshold.

    Shuffle plan: explode -> dedup (1 shuffle), self-join on shingle hash
    (1 shuffle), pair-count agg (1 shuffle).

    ``max_doc_freq`` is the 100 TB safety valve: a shingle shared by d
    documents fans out to d^2 candidate pairs in the self-join, so one
    boilerplate shingle across 1M docs would create 10^12 candidates.
    Shingles with document frequency > max_doc_freq are dropped BEFORE the
    self-join (one extra map-side-combinable agg + a broadcast-able
    filter). Doc sizes (n_a/n_b) are computed before the cap, so
    reported Jaccard becomes a lower bound when the cap binds —
    boilerplate shingles add candidates but never decide near-duplicates.
    With max_doc_freq=None (default) the result is the exact Jaccard.
    """
    # doc sizes ride the exploded rows (one extra int per row), so the
    # final Jaccard needs NO size-lookup joins; the whole plan is:
    # codegen'd shingling -> [optional hot-shingle anti-join] ->
    # self-join on h -> one pair aggregation.
    sets = doc_shingle_sets(df, id_col, text_col, k)
    sh = sets.select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("h"))
    # Materialize the exploded shingle table once: the self-join
    # references it twice and the hot-shingle doc-frequency aggregate a
    # third time — without this the codegen'd shingling (the expensive
    # string leg) executes once per reference. localCheckpoint (lazy),
    # NOT persist: persisted blocks pin the cache manager until an
    # explicit unpersist, so repeated calls leak storage memory for the
    # session lifetime (ADVICE r3); checkpoint blocks are reclaimed by
    # the ContextCleaner when the plan goes out of scope. Trade-off:
    # checkpoint blocks truncate lineage, so a lost executor block fails
    # the query instead of recomputing — acceptable for an intra-query
    # scratch table (rerun the query); a long-lived 100 TB shingle index
    # would be persisted as a real TABLE, not an RDD cache.
    sh = sh.localCheckpoint(eager=False)
    if max_doc_freq is not None:
        # the HOT set (df > cap) is small by construction (boilerplate
        # only) -> broadcast anti-join; never materialize the rare set
        hot = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("h")
        )
        sh = sh.join(F.broadcast(hot), on="h", how="left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, on="h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def cdc_chunk_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 8,
    cut_prefix: str = "00",
) -> DataFrame:
    """Content-defined chunking (rolling-hash document fingerprinting):
    cut the normalized text wherever the hash of the ``window``-char
    rolling window starts with ``cut_prefix`` (P = 1/256 per position for
    a 2-hex prefix -> ~256-char average chunks), fingerprint each chunk.

    Partial-duplicate detection: shared chunks between documents survive
    insertions/deletions elsewhere because cut points depend only on
    LOCAL content — the property plain fixed-size shingling lacks.

    Pure Catalyst (sequence/filter/transform + md5 inside lambdas, no
    UDF): returns (doc_id, chunk_no, chunk_fp, chunk_len) — one
    map-side-only stage plus the explode; dedup/grouping downstream is a
    hash-agg on chunk_fp. Simplified FastCDC: no min/max chunk clamps
    (documented deviation; adjacent cut points may produce short chunks).

    The normalized text and the breakpoint array are materialized as
    intermediate columns on purpose: inlining them into the chunk lambda
    re-evaluates the per-position md5 scan on every reference —
    measured 42x slower at 4k chars, O(n^3)-ish growth.
    """
    import re as _re

    if not _re.fullmatch(r"[0-9a-f]+", cut_prefix):
        # md5 hex is lowercase: an uppercase/non-hex prefix would silently
        # never match and disable chunking entirely
        raise ValueError(f"cut_prefix must be lowercase hex, got {cut_prefix!r}")
    w = int(window)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')").alias("_t"),
    )
    # sequence starts at 1 (Spark's sequence(2, 1) would generate a
    # DESCENDING [2, 1]); position 1 is excluded in the filter so the
    # first breakpoint stays unique
    out = out.withColumn(
        "_bp",
        F.expr(
            f"concat(array(1), "
            f"filter(sequence(1, greatest(length(_t) - {w - 1}, 1)), "
            f"i -> i >= 2 AND substring(md5(substring(_t, i, {w})), 1, {len(cut_prefix)}) = '{cut_prefix}'), "
            f"array(length(_t) + 1))"
        ),
    )
    out = out.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(_bp) - 1), "
                "j -> substring(_t, element_at(_bp, j), element_at(_bp, j + 1) - element_at(_bp, j)))"
            )
        ).alias("chunk_no", "chunk"),
    )
    return out.select(
        "doc_id",
        "chunk_no",
        F.md5("chunk").alias("chunk_fp"),
        F.length("chunk").alias("chunk_len"),
    ).filter(F.col("chunk_len") > 0)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5, n_hashes: int = 16, seed: int = 42
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = min((a_i*h + b_i) mod P).

    One explode + one grouped aggregate; the n_hashes min-aggs fuse into a
    single hash-aggregate operator (partial map-side combine for free).
    """
    sh = doc_shingle_hashes(df, id_col, text_col, k)
    aggs = []
    for i, (ai, bi) in enumerate(minhash_coeffs(n_hashes, seed)):
        # (a*h + b) mod P in long arithmetic; h < 2^48 so a*h needs care:
        # fold with pmod twice to stay in range (a < P ~ 2^61 overflows —
        # use modular mult via two 32-bit halves is overkill here; instead
        # draw a < 2^12 so a*h < 2^60 fits long)
        aggs.append(F.min(F.pmod(F.lit(ai % 4096) * F.col("h") + F.lit(bi % (1 << 50)), F.lit(MINHASH_PRIME))).alias(f"mh_{i}"))
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become
    candidate near-dup pairs (shingle->minhash->band->bucket-join)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes, seed)
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh")) for b in range(bands)])
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    # Materialize the banded signatures once: the self-join references
    # `stacked` twice, and without this the whole shingle->minhash
    # pipeline (the expensive leg) executes once PER SIDE. localCheckpoint
    # (lazy), NOT persist — persisted blocks leak until an explicit
    # unpersist across repeated calls (ADVICE r3); checkpoint blocks are
    # ContextCleaner-reclaimed when the plan is dropped. Same lost-block
    # trade-off as the shingle table above (intra-query scratch).
    stacked = stacked.localCheckpoint(eager=False)
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, on=["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text", n_bits: int = 16) -> DataFrame:
    """SimHash over word tokens: bit j of the signature is the sign of the
    sum of (+1/-1) votes from each token's hash bit j. JVM-only: explode
    tokens, one grouped agg with n_bits fused sums."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("th", shingle_hash(F.col("tok")))
    aggs = [
        F.sum(F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"s_{j}")
        for j in range(n_bits)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    sig = None
    for j in range(n_bits):
        bit = F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return sums.withColumn("simhash", sig.cast("long")).select("doc_id", "simhash")


def substring_containment(
    corpus: DataFrame,
    snippets: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    snip_id_col: str = "snip_id",
    snip_text_col: str = "stext",
    k: int = 8,
) -> DataFrame:
    """Exact substring-containment search: all (snip_id, doc_id) pairs
    where the normalized snippet occurs verbatim inside the normalized
    document (quotation detection / eval-contamination at the exact-
    match level — the sharp twin of the shingle-overlap
    ``decontaminate``).

    Scale path (rare-shingle inverted index, the prefix-filter idiom
    from set-similarity joins): a snippet contained in a doc shares ALL
    its k-shingles with that doc, so its LOWEST-document-frequency
    shingle indexes exactly the candidate posting list. Build the
    corpus (doc, shingle-hash) posting table + per-hash df (one explode
    + one hash-agg — at 100 TB both are precomputed index artifacts,
    not per-query work), pick each snippet's rarest present shingle,
    join that single hash against the postings, and verify candidates
    with one JVM ``instr`` per (snippet, candidate). Hash collisions
    only ADD candidates (verify prunes); they never lose a true pair.
    Snippets shorter than k can't use the index and fall back to a
    broadcast scan (bounded: they are the degenerate queries).

    Returns (snip_id, doc_id) pairs, self-matches included."""
    norm = lambda c: F.regexp_replace(F.lower(F.trim(F.col(c))), r"\s+", " ")  # noqa: E731
    n_par = corpus.sparkSession.sparkContext.defaultParallelism
    # Normalized corpus: round-robined BEFORE normalization (a sub-4MB
    # corpus parquet scans as 2 splits, capping every downstream stage)
    # and checkpointed once — it feeds the df pass, the candidate pass,
    # the verify join and the short-snippet brute leg.
    from pda_spark.session import spread

    corp = (
        corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .transform(spread)
        .select("doc_id", norm("_t").alias("_ctext"))
        .localCheckpoint(eager=False)
    )
    snips = snippets.select(
        F.col(snip_id_col).alias("snip_id"), norm(snip_text_col).alias("_stext")
    )

    long_s = snips.filter(F.length("_stext") >= k)
    ssh = F.expr(
        f"transform(sequence(1, length(_stext) - {k - 1}), i -> xxhash64(substring(_stext, i, {k})))"
    )
    s_h = long_s.select("snip_id", F.explode(F.array_distinct(ssh)).alias("h"))

    sh = F.expr(
        f"transform(sequence(1, length(_ctext) - {k - 1}), i -> xxhash64(substring(_ctext, i, {k})))"
    )
    hash_stream = corp.filter(F.length("_ctext") >= k).select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("h")
    )
    # Round-7: the corpus posting table is never materialized. Only
    # SNIPPET shingle hashes can rank (df min is over shingles present
    # in the snippet), and only each snippet's RAREST hash probes — so
    # two STREAMED passes over the per-doc hash stream, each reduced
    # through a broadcast hash set, replace the round-6
    # localCheckpoint'ed 25M-row posting table (a templated corpus
    # keeps ~half of it snippet-relevant, so filtering before the
    # checkpoint was not enough — 13M rows materialized at sf1.0). df
    # values for surviving hashes are unchanged, so the rare choice —
    # and the verified output, which any probe shingle reproduces — are
    # identical.
    snip_hash = s_h.select("h").distinct()
    dfreq = (
        hash_stream.join(F.broadcast(snip_hash), "h")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    rare = (
        s_h.join(dfreq, "h")
        .groupBy("snip_id")
        .agg(F.min(F.struct("df", "h")).alias("_m"))
        .select("snip_id", F.col("_m.h").alias("h"))
        .localCheckpoint(eager=False)
    )
    cands = hash_stream.join(F.broadcast(rare), "h").select("snip_id", "doc_id")
    # Explicit partition counts on the verify join: it is instr-heavy
    # compute on few bytes, and AQE's size-based coalescing squeezed it
    # onto 2 tasks (measured 8.9 s for 2.8M candidates at sf1.0);
    # user-specified counts are exempt from coalescing.
    verified = (
        cands.repartition(n_par, "doc_id")
        .join(F.broadcast(long_s), "snip_id")
        .join(corp.repartition(n_par, "doc_id"), "doc_id")
        .filter(F.instr(F.col("_ctext"), F.col("_stext")) > 0)
        .select("snip_id", "doc_id")
    )

    # empty-after-normalization snippets are dropped, not matched-to-all
    # (instr(x, '') == 1 would pair them with every document)
    short_s = snips.filter((F.length("_stext") < k) & (F.length("_stext") > 0))
    brute = (
        corp.crossJoin(F.broadcast(short_s))
        .filter(F.instr(F.col("_ctext"), F.col("_stext")) > 0)
        .select("snip_id", "doc_id")
    )
    return verified.unionByName(brute)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    hasher: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-shingle, slide a window of ``w``
    consecutive hashes, keep the MINIMUM hash of each window, emit the
    distinct selected hashes per document. Guarantees every exact match
    of length >= k + w - 1 shares a fingerprint, with ~2/(w+1) density.

    Emitting distinct min VALUES (not positions) keeps the result
    independent of tie-position conventions, so a SQL window-min
    replays it exactly.

    Shape (round-7): the sliding window, the completeness filter and the
    per-doc distinct are all LOCAL to one document, so they run as array
    expressions over the per-doc shingle-hash array — zero shuffles
    (the round-6 version exploded ~3.5M shingle rows at sf1.0 into a
    corpus-wide window + a distinct, three shuffles of hash rows). The
    doc table is round-robined first so the hash work isn't capped by
    the sub-4MB parquet split count. Windows that would run past the
    last shingle are not complete windows — but a doc with fewer than w
    shingles keeps its single (truncated) window so every doc
    fingerprints to >= 1 hash."""
    if hasher == "md5":
        h_of = f"cast(conv(substring(md5(substring(_norm, i, {k})), 1, 12), 16, 10) as bigint)"
    elif hasher == "xxhash64":
        h_of = f"xxhash64(substring(_norm, i, {k}))"
    else:
        raise ValueError(f"winnow_fingerprints: unknown hasher {hasher!r}")

    from pda_spark.session import spread

    d = df.transform(spread).select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias("_norm"),
    )
    hs = f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 1)), i -> {h_of})"
    sel = (
        f"array_distinct(transform("
        f"  filter(sequence(0, size(_hs) - 1), p -> p <= size(_hs) - {w} OR p = 0),"
        f"  p -> array_min(slice(_hs, p + 1, {w}))))"
    )
    return (
        d.withColumn("_hs", F.expr(hs))
        .select("doc_id", F.explode(F.expr(sel)).alias("minh"))
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    salt_bands: int = 1,
) -> DataFrame:
    """Edit-distance near-duplicate pairs (fuzzy token/URL/title matching
    — the reference's archived learning scripts dedupe item titles by
    similarity; here it is a first-class join): all unordered pairs with
    levenshtein(a, b) <= max_dist, ids ordered id_a < id_b.

    Scale shape: never the n^2 cross product. Length-band blocking is
    LOSSLESS for edit distance (|len(a) - len(b)| <= d for any pair
    within distance d): each string lands in band floor(len / (d+1)) and
    probes its own and the next band, so every qualifying pair meets in
    at least one band. The candidate stream is verified IN PLACE (cheap
    length prune, then the JVM ``levenshtein`` expression — no Python
    anywhere), so only MATCHES reach the pair-dedup shuffle (a pair can
    meet in both bands); the quadratic candidate volume never shuffles.
    Real-world lengths cluster (titles, URLs), making one band hot:
    ``salt_bands=k`` splits each band's anchors into k hash buckets and
    replicates probes k ways, spreading a hot band over k join tasks at
    k-fold probe duplication — the standard hot-key salt, a parameter
    here because length skew is the COMMON case for this operator."""
    width = max_dist + 1
    strs = df.select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s")).withColumn(
        "_band", F.floor(F.length("_s") / width)
    )
    bands = F.array(F.col("_band"), F.col("_band") + 1)
    if salt_bands > 1:
        salts = F.array(*[F.lit(j) for j in range(salt_bands)])
        probes = strs.select(
            "_id", "_s",
            F.explode(
                F.flatten(
                    F.transform(
                        bands,
                        lambda b: F.transform(
                            salts, lambda j: F.struct(b.alias("b"), j.alias("j"))
                        ),
                    )
                )
            ).alias("_bj"),
        ).select("_id", "_s", F.col("_bj.b").alias("_b"), F.col("_bj.j").alias("_j"))
        anchors = strs.select(
            F.col("_id").alias("_id2"),
            F.col("_s").alias("_s2"),
            F.col("_band").alias("_b"),
            F.pmod(F.xxhash64("_id"), F.lit(salt_bands)).cast("int").alias("_j"),
        )
        join_keys = ["_b", "_j"]
    else:
        probes = strs.select("_id", "_s", F.explode(bands).alias("_b"))
        anchors = strs.select(
            F.col("_id").alias("_id2"), F.col("_s").alias("_s2"), F.col("_band").alias("_b")
        )
        join_keys = ["_b"]
    matched = (
        probes.join(anchors, join_keys)
        .filter(F.col("_id") != F.col("_id2"))
        # cheap prune first, DP verify second — both stream inside the
        # join task, BEFORE any shuffle
        .filter(F.abs(F.length("_s") - F.length("_s2")) <= max_dist)
        .filter(F.levenshtein("_s", "_s2") <= max_dist)
        .select(
            F.least("_id", "_id2").alias("id_a"),
            F.greatest("_id", "_id2").alias("id_b"),
            F.when(F.col("_id") < F.col("_id2"), F.col("_s")).otherwise(F.col("_s2")).alias("s_a"),
            F.when(F.col("_id") < F.col("_id2"), F.col("_s2")).otherwise(F.col("_s")).alias("s_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return matched.select(
        "id_a", "id_b", "s_a", "s_b", F.levenshtein("s_a", "s_b").alias("dist")
    )


def dedup_paragraphs_global(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Global first-occurrence paragraph deduplication (the RefinedWeb /
    C4-family corpus step the reference's archived learning scripts
    approximate per-item): every exact paragraph is kept only in the
    FIRST document that contains it — first by the total order
    (doc_id, position) — and dropped from every later one; surviving
    paragraphs reassemble in original order. Returns one row per input
    doc: (doc_id, clean_text, n_kept, n_removed); a doc whose every
    paragraph occurred earlier elsewhere emits clean_text NULL with
    n_kept 0 (the q75 all-boilerplate contract). Repeats WITHIN one doc
    dedupe too (only the lowest position survives) — the same rule,
    applied uniformly.

    Shape (100 TB): posexplode paragraphs -> one hash-aggregate
    min(struct(doc_id, pos)) per paragraph (map-side combinable; the
    shuffle carries one row per DISTINCT paragraph) -> equi-join back on
    the paragraph -> per-doc ordered reassembly via array_sort over
    (pos, para) structs (no window, no driver state). Boilerplate-heavy
    corpora make some paragraphs hot on the join key; the owner table is
    deduped so the join is skew-bounded by distinct-paragraph counts,
    and AQE's skew split handles the probe side."""
    import re as _re

    # sep is a LITERAL separator (it is also the concat_ws rejoin
    # string); F.split takes a Java regex, so escape metacharacters —
    # a caller passing '.' or '||' must not get per-character splits
    # (round-6 review)
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pos", "para"),
    )
    owners = paras.groupBy("para").agg(
        F.min(F.struct("doc_id", "pos")).alias("_first")
    )
    tagged = paras.join(owners, "para")
    is_kept = (F.col("doc_id") == F.col("_first.doc_id")) & (
        F.col("pos") == F.col("_first.pos")
    )
    out = tagged.groupBy("doc_id").agg(
        F.when(
            F.sum(is_kept.cast("int")) > 0,
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("pos", F.when(is_kept, F.col("para")).alias("para"))
                        )
                    ),
                    lambda x: x["para"],
                ),
            ),
        ).alias("clean_text"),
        F.sum(is_kept.cast("long")).cast("long").alias("n_kept"),
        F.sum((~is_kept).cast("long")).cast("long").alias("n_removed"),
    )
    return out.select("doc_id", "clean_text", "n_kept", "n_removed")



def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 16,
    max_hamming: int = 2,
    n_bands: int | None = None,
) -> DataFrame:
    """All document pairs whose SimHash fingerprints differ in at most
    ``max_hamming`` bits — the Hamming-radius near-dup join (Manku/
    Jain/Sarma WWW'07, the Google web-dedup construction), found WITHOUT
    the O(n^2) pair scan via pigeonhole banding: split the n_bits
    fingerprint into n_bands (default max_hamming+1) contiguous bands —
    two fingerprints within Hamming distance max_hamming MUST agree
    exactly on at least one band (pigeonhole: max_hamming flipped bits
    cannot touch all max_hamming+1 bands), so an equi-join on
    (band_idx, band_value) finds every true pair; exact
    ``bit_count(xor)`` verifies candidates.

    Scale notes (the q107 discipline): the verify filter is a single
    JVM bit_count per candidate and runs BEFORE the pair-dedup
    shuffle, so band collisions cost bit math, never a wide shuffle.
    Band width must grow with corpus size (bits/band ~ log2(n) keeps
    expected bucket size O(1)); at web scale use 64-bit fingerprints
    with 4 bands of 16 bits, not this gate's 16-bit demo split. A
    near-dup CLUSTER (many identical fingerprints) makes one hot band
    bucket — the bounded verify keeps that a volume problem, and
    banding on (band_idx, value) already spreads it n_bands ways.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b, each pair once.
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    if not 1 <= n_bands <= n_bits:
        raise ValueError(f"need 1 <= n_bands <= n_bits, got {n_bands}")
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"pigeonhole needs n_bands >= max_hamming+1 ({max_hamming + 1}), got {n_bands}"
        )
    sig = simhash(docs, id_col, text_col, n_bits)

    # contiguous band split; widths differ by at most 1
    base, extra = divmod(n_bits, n_bands)
    bands, off = [], 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        bands.append((i, off, (1 << width) - 1))
        off += width

    band_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("simhash"), o).bitwiseAND(F.lit(mask)).alias("val"),
                )
                for i, o, mask in bands
            ]
        )
    ).alias("_b")
    keyed = sig.select("doc_id", "simhash", band_col).select(
        "doc_id", "simhash", "_b.band", "_b.val"
    )
    left = keyed.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "val"
    )
    right = keyed.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "val"
    )
    cand = left.join(right, ["band", "val"]).filter(F.col("doc_a") < F.col("doc_b"))
    verified = cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    ).filter(F.col("hamming") <= F.lit(max_hamming))
    # a pair can meet in several agreeing bands -> one row per pair
    return verified.select("doc_a", "doc_b", "hamming").distinct()


def dedup_keep_best(
    df: DataFrame, key_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Keep exactly ONE row per key — the first under ``order_cols`` —
    the canonical-URL / best-version dedup step of web-corpus curation
    (after ``normalize_url``, keep the longest capture per URL; after
    near-dup clustering, keep the best member per cluster). Callers
    pass fully-directed sort columns (e.g. ``[F.col("n_chars").desc(),
    F.col("doc_id").asc()]``) — the final column must make the order
    total or the winner is nondeterministic.

    One window shuffle keyed on the dedup key. A pathologically hot key
    (one URL with millions of captures) serializes its partition — the
    mitigation is the q73 two-level pattern (pre-aggregate a per-bucket
    champion, then one tiny final window); at web-corpus key
    cardinality the plain window is the right default."""
    import uuid

    # collision-proof temp name: a caller's own _rn column must survive
    # (the round-6 UDTF unique-view lesson — never clobber fixed names)
    rn = f"_rn_{uuid.uuid4().hex[:8]}"
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def jaccard_join_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_words: int = 1,
) -> DataFrame:
    """Exact set-similarity self-join with PREFIX FILTERING (the
    AllPairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    ICDE'08): emit every unordered doc pair whose WORD-token Jaccard
    >= threshold_num/threshold_den, with the exact intersection and
    union sizes. Unlike the MinHash/LSH path (probabilistic) and
    ``ngram_jaccard_pairs`` (joins on EVERY shingle), candidates here
    come only from each doc's PREFIX — its p = s - ceil(t*s) + 1
    globally-rarest tokens — which is the published exact-join shape
    for web-scale corpora: two sets with Jaccard >= t MUST share a
    prefix token (pigeonhole on the (df, token) total order), so
    completeness is guaranteed while hot stop-words never generate
    candidates (they sort LAST and rarely enter any prefix).

    The global token order is (document-frequency asc, token asc).
    No global rank window is materialized: each doc just sorts its own
    tokens by the struct key — the order is total, which is all the
    pigeonhole needs. The threshold is a rational num/den so every
    filter is integer arithmetic (den*inter >= num*union), exact in
    both engines; the emitted ``jaccard`` is the one final division
    rounded to 6 (house float discipline).

    Scale shape: token df is one map-side-combinable count; the
    candidate join key is the prefix token (df-bounded by
    construction); the verify joins fetch the two sorted token arrays
    by doc id and intersect JVM-side (array_intersect) — a length
    filter (den*sa <= ... ) prunes before the array fetch. No Python
    stages, no O(n^2) scan."""
    t_num, t_den = int(threshold_num), int(threshold_den)
    if not (0 < t_num <= t_den):
        raise ValueError(f"need 0 < num <= den, got {t_num}/{t_den}")
    k = int(shingle_words)
    if k < 1:
        raise ValueError(f"shingle_words must be >= 1, got {k}")
    # ``shingle_words`` = 1 joins on plain word sets; k > 1 joins on
    # word k-gram (w-shingling) sets — the discriminative choice when
    # docs share a template vocabulary (word sets nearly coincide while
    # k-gram sets separate). Empty-token guard: split() emits '' around
    # leading/trailing separators.
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    if k == 1:
        shingled = F.array_distinct(words)
    else:
        shingled = F.when(
            F.size(words) >= F.lit(k),
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(words) - F.lit(k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(words, i, k)),
                )
            ),
        ).otherwise(F.expr("cast(array() as array<string>)"))
    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(shingled).alias("_tok")
    )
    df_counts = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    ranked = tok.join(df_counts, "_tok")
    per_doc = (
        ranked.groupBy("_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "_tok"))),
                lambda s: s["_tok"],
            ).alias("_toks")
        )
        .select(
            "_id",
            "_toks",
            F.size("_toks").alias("_s"),
            # prefix length p = s - ceil(t*s) + 1, integer ceil:
            # ceil(n*s/d) = (n*s + d - 1) div d
            (
                F.size("_toks")
                - F.expr(f"(({t_num} * size(_toks)) + {t_den} - 1) div {t_den}")
                + F.lit(1)
            ).alias("_p"),
        )
        .localCheckpoint(eager=False)
    )
    prefix = per_doc.select(
        "_id", "_s", F.explode(F.slice("_toks", 1, F.col("_p"))).alias("_ptok")
    )
    cand = (
        prefix.select(F.col("_id").alias("_a"), F.col("_s").alias("_sa"), "_ptok")
        .join(
            prefix.select(F.col("_id").alias("_b"), F.col("_s").alias("_sb"), "_ptok"),
            "_ptok",
        )
        .filter(F.col("_a") < F.col("_b"))
        # length filter: t*sa <= sb and t*sb <= sa (integer form)
        .filter(
            (F.lit(t_den) * F.col("_sb") >= F.lit(t_num) * F.col("_sa"))
            & (F.lit(t_den) * F.col("_sa") >= F.lit(t_num) * F.col("_sb"))
        )
        .select("_a", "_b")
        .dropDuplicates(["_a", "_b"])
    )
    verified = (
        cand.join(per_doc.select(F.col("_id").alias("_a"), F.col("_toks").alias("_ta")), "_a")
        .join(per_doc.select(F.col("_id").alias("_b"), F.col("_toks").alias("_tb")), "_b")
        .select(
            "_a",
            "_b",
            F.size(F.array_intersect("_ta", "_tb")).alias("inter"),
            (F.size("_ta") + F.size("_tb") - F.size(F.array_intersect("_ta", "_tb"))).alias(
                "uni"
            ),
        )
        .filter(F.lit(t_den) * F.col("inter") >= F.lit(t_num) * F.col("uni"))
    )
    return verified.select(
        F.col("_a").alias("id_a"),
        F.col("_b").alias("id_b"),
        F.col("inter").cast("long").alias("inter"),
        F.col("uni").cast("long").alias("uni"),
        F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard"),
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_ranges: int = 64,
) -> DataFrame:
    """Dense global 1-based row number over a total order WITHOUT a
    single-partition window — the distributed-rank recipe: (1)
    repartitionByRange on the order columns (range boundaries come
    from sampling, but the final ranks are invariant to where the
    boundaries land); (2) per-partition local row_number — a window
    PARTITIONED by spark_partition_id, so every partition ranks in
    parallel; (3) per-partition counts (a tiny aggregate) prefix-sum
    into offsets on the driver-sized pid table and broadcast-join
    back. Global rank = offset + local rank. The order must be made
    total by the caller (append a unique tiebreaker column), or ranks
    among equal keys follow the partition-internal order.

    This is the scale-correct substitute for
    ``row_number().over(Window.orderBy(...))`` — which funnels the
    whole table through ONE task — and the building block
    ``sorted_neighborhood_pairs`` blocks on."""
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint pins ONE materialization of the range exchange:
    # the counts branch and the local-rank branch below both read this
    # frame, and without the checkpoint their consistency hangs on
    # Spark's ReuseExchange collapsing two plan subtrees onto one
    # physical exchange — repartitionByRange SAMPLES its boundaries,
    # so two independent evaluations could disagree and offsets would
    # no longer match local ranks (round-6 review finding).
    ranged = (
        df.repartitionByRange(num_ranges, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wloc = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn("_lrank", F.row_number().over(wloc))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))).drop(
        "_n"
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_cols: list[str],
    window: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995, the
    classic record-linkage candidate generator): sort the table by a
    blocking key, emit every pair within ``window`` positions of each
    other. Complements the equality-style blockers (LSH bands, grid
    cells, length bands): a sliding window over a sort order catches
    near-miss keys that never collide on any exact bucket.

    The global sort rank comes from ``global_rank`` (range partition +
    parallel local windows + broadcast offsets — no single-task
    window), with ``id_col`` appended as the tiebreaker so the order
    is total and the output deterministic. Pair generation is an
    explode of the offsets 1..window plus one equi-join on the shifted
    rank — each qualifying pair meets exactly once (no dedup shuffle).
    Returns (id_a, id_b, rank_a, rank_b) with rank_a < rank_b."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    ranked = global_rank(
        df.select(F.col(id_col).alias("_id"), *[F.col(c) for c in sort_cols]),
        [*sort_cols, "_id"],
        rank_col="_rank",
    ).select("_id", "_rank")
    offs = F.explode(F.array(*[F.lit(j) for j in range(1, window + 1)])).alias("_j")
    left = ranked.select("_id", "_rank", offs).select(
        F.col("_id").alias("id_a"),
        F.col("_rank").alias("rank_a"),
        (F.col("_rank") + F.col("_j")).alias("_rank"),
    )
    return left.join(
        ranked.select(F.col("_id").alias("id_b"), F.col("_rank").alias("rank_b"), "_rank"),
        "_rank",
    ).select("id_a", "id_b", "rank_a", "rank_b")


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_ranges: int = 64,
) -> DataFrame:
    """Running total over a GLOBAL order without a single-partition
    window — ``global_rank``'s machinery generalized from counting to
    summing (rank is the cumsum of ones): range partition on the order
    columns (one pinned materialization — the ReuseExchange lesson),
    per-partition running sums in parallel windows, per-partition
    TOTALS prefix-summed on the driver-sized pid table and broadcast
    back. The order must be total (append a unique tiebreaker) and the
    values int64. Inclusive (each row's cumsum includes itself)."""
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_ranges, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wloc = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = ranged.withColumn("_lsum", F.sum(F.col(value_col).cast("long")).over(wloc))
    totals = ranged.groupBy("_pid").agg(
        F.sum(F.col(value_col).cast("long")).alias("_t")
    )
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_t").over(woff), F.lit(0))).drop(
        "_t"
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lsum")).cast("long"))
        .drop("_pid", "_lsum", "_off")
    )
