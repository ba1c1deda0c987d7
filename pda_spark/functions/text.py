"""Text-analysis operators for the training-data pipeline (documents table).

All hot-path expressions are Spark built-ins (JVM-side, whole-stage
codegen) — no Python at all. Each operator has an ANSI-SQL twin in
__spark_entry__.oracle_sql() runnable by DuckDB, so expressions are
restricted to constructs with identical semantics in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language-ID stopword sets (tiny n-gram/stopword heuristic; the point is
# the distributed shape, not linguistic quality)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish variant below)."""
    return F.size(F.split(F.trim(col), r"\s+"))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND punctuation
    boundaries (a cheap BPE stand-in that both engines can compute)."""
    return F.size(F.split(F.trim(col), r"[\s\p{Punct}]+"))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[.,;:!?'\"()\[\]-]", "")
    return F.round((F.length(col) - F.length(stripped)) / F.greatest(F.length(col), F.lit(1)), 6)


def stopword_count(col: Column, lang: str = "en") -> Column:
    words = "|".join(LANG_STOPWORDS[lang])
    # count occurrences via length-difference trick (portable to DuckDB,
    # which lacks a regexp_count with identical semantics)
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(rf"\b({words})\b"), F.lit(0)))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return F.round(stopword_count(col, lang) / F.greatest(token_count(col), F.lit(1)), 6)


def lang_scores(col: Column) -> list[Column]:
    return [stopword_count(col, lang).alias(f"score_{lang}") for lang in LANG_STOPWORDS]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring block: length / token / punctuation / stopword
    features, plus a composite quality flag (filter-style heuristic)."""
    c = F.col(text_col)
    out = (
        df.withColumn("n_chars_calc", char_count(c))
        .withColumn("n_tokens", token_count(c))
        .withColumn("n_tokens_bpe", bpe_ish_token_count(c))
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn("stopword_ratio_en", stopword_ratio(c, "en"))
        .withColumn(
            "mean_token_len",
            F.round(char_count(c) / F.greatest(token_count(c), F.lit(1)), 6),
        )
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("punct_ratio") <= 0.3)
        & (F.col("mean_token_len").between(2.0, 15.0)),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (deterministic, engine-portable; the rolling-hash variant lives in
    dedup.py shingles)."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID over the documents table."""
    c = F.col(text_col)
    scored = df.select("*", *lang_scores(c))
    score_cols = [f"score_{lang}" for lang in LANG_STOPWORDS]
    best = F.greatest(*[F.col(s) for s in score_cols])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_STOPWORDS:  # first-match tie-break, fixed order
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.withColumn("lang_pred", pred)


def repetition_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics per document: word count, the
    count of the most frequent word and of the most frequent word
    bigram, plus parts-per-million fractions. Docs dominated by one
    token or one phrase (boilerplate, keyword stuffing, template spam)
    get filtered on these in web-corpus curation.

    Shape (round-7): ZERO shuffles — the most-frequent-gram count per
    doc equals the longest equal-run in the SORTED gram array, so both
    metrics are per-row ``sort_array`` + ``aggregate`` expressions and
    the whole operator is one scan-and-project. The round-6 version
    exploded every unigram+bigram into a corpus-sized (doc, kind, gram)
    hash aggregate — two shuffles carrying every gram string (~10M rows
    at sf1.0) to compute what each row already knew locally. Bigrams
    come from zip_with over two slices of the split array; a null text
    yields no output row (explode-on-null semantics of the previous
    shape, preserved).
    """

    def _top_run(arr: str) -> str:
        # longest run of equal values in sort_array(arr) == count of the
        # most frequent value; single left-to-right fold, exact longs
        return (
            f"aggregate(sort_array({arr}), "
            "named_struct('p', cast(null as string), 'r', 0L, 'b', 0L), "
            "(a, x) -> named_struct("
            "  'p', x, "
            "  'r', IF(a.p <=> x, a.r + 1L, 1L), "
            "  'b', greatest(a.b, IF(a.p <=> x, a.r + 1L, 1L))), "
            "a -> a.b)"
        )

    c = F.col(text_col)
    words = F.split(F.lower(F.trim(c)), r"\s+")
    # round-robin the doc table first: the sub-4MB documents scan is 2
    # splits, and with the shuffles gone this whole operator would
    # otherwise run its per-row sort/fold work on 2 cores
    from pda_spark.session import spread

    base = (
        spread(df)
        .select(F.col(id_col).alias("doc_id"), words.alias("_w"))
        .filter(F.col("_w").isNotNull())
    )
    bigrams = (
        "zip_with(slice(_w, 1, greatest(size(_w) - 1, 0)),"
        "         slice(_w, 2, greatest(size(_w) - 1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    out = base.select(
        "doc_id",
        F.size("_w").cast("long").alias("n_words"),
        F.expr(_top_run("_w")).alias("top_word_count"),
        F.expr(_top_run(bigrams)).alias("top_bigram_count"),
    )
    return out.select(
        "*",
        F.floor(F.lit(1000000.0) * F.col("top_word_count") / F.col("n_words"))
        .cast("long")
        .alias("top_word_ppm"),
        F.floor(F.lit(1000000.0) * F.col("top_bigram_count") / F.col("n_words"))
        .cast("long")
        .alias("top_bigram_ppm"),
    )


def hash_split(id_col: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """Deterministic train/val/test assignment from a stable id hash
    (md5 folded to a bigint, mod 100) — the standard leakage-safe way to
    split a 100 TB corpus: no sampling state, no shuffle, stable under
    re-partitioning and re-runs, and near-dup cluster members can be
    routed by cluster_id instead of doc_id to keep leakage out of val."""
    from pda_spark.functions.dedup import hex_to_long

    bucket = F.pmod(hex_to_long(F.md5(id_col.cast("string"))), F.lit(100))
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL form for exact URL dedup: lowercase scheme+host,
    strip www. and the scheme's default port, drop the fragment, drop
    the query when it is purely tracking (``?utm_...``), strip a
    trailing slash. Every pattern is backreference-free and matches at
    most once, so Spark's replace-all and DuckDB's replace-first
    regexp_replace semantics coincide — the oracle runs the identical
    chain. (Mixed tracking+real query strings are left untouched:
    reordering/filtering individual params is beyond portable regex and
    out of scope.)"""
    u = F.regexp_replace(url, r"#.*$", "")              # fragment
    u = F.regexp_replace(u, r"\?utm_[^?]*$", "")        # all-tracking query
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(
        F.regexp_replace(host, r":80$", "")
    )
    rest = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([/?].*)?$", 1)
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(scheme, F.lit("://"), host, rest)


def url_host(url: Column) -> Column:
    """Registrable-ish host: lowercased authority, www. and port
    stripped (suffix-list precision is out of scope — deterministic and
    portable beats exhaustive here)."""
    h = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/:?#]+)", 1))
    return F.regexp_replace(h, r"^www\.", "")


def corpus_frequency_quality(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """Corpus-statistics quality signals (the CCNet/Gopher "how typical
    is this document" family, built portably without a language model):
    per document, the mean corpus frequency of its tokens and the share
    of tokens that are corpus-rare (count <= 2). Low mean frequency +
    high rare ratio flags gibberish/OCR noise; boilerplate sits at the
    other extreme. All arithmetic is integer sums with ONE explicit
    double division per signal, so a SQL oracle reproduces it exactly
    (no libm log, no avg() accumulation-order hazard).

    Scale shape (100 TB): one explode, one token-count aggregation
    (map-side combinable), one join token->count (the token dimension is
    zipfian — broadcast its head or let AQE pick), one per-doc
    aggregation. No driver state.
    """
    from pyspark.sql import functions as F

    # NO spread here (round-7 measured NON-fix): `toks` is consumed
    # twice (count agg + join probe), so a pre-explode round-robin
    # shuffles the full text payload and re-reads it per consumer —
    # A/B at sf1.0: spread 2.4 s vs unspread 1.7 s min-of-3.
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # `toks` is deliberately NOT materialized although two consumers
    # re-derive it (the count agg and the join probe): the leg is a
    # single codegen'd split+explode, and at corpus scale recomputing it
    # is far cheaper than writing the fully-exploded token table to the
    # block store (the opposite call from the shingle table in dedup.py,
    # where per-shingle md5 hashing makes recompute the expensive side).
    j = toks.join(cnt, on="tok")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.sum("c").cast("long").alias("sum_freq"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("mean_tok_freq"),
        (
            F.sum(F.when(F.col("c") <= 2, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("rare_tok_ratio"),
    )


def quota_sample_by_chars(
    docs, budget_per_lang: int, lang_col: str = "lang", n_buckets: int = 64
):
    """Per-language character-budget sampling — the data-mixture
    operator: keep a deterministic pseudo-random prefix of each
    language's documents whose cumulative size fits the budget (train a
    model on "20 GB per language" without materializing shuffles).
    Ordering is a portable integer hash of doc_id (Knuth multiplicative,
    BIGINT arithmetic), so the sample is stable under re-partitioning
    and reproducible in the SQL oracle. doc_id must be non-negative:
    the oracle's `%` is sign-preserving while Spark's pmod is not, so
    negative ids would order (and sample) differently per engine
    (ADVICE r4) — enforced with a raise_error guard inside the hash.

    Scale shape (VERDICT r4 #3): the running sum is a TWO-LEVEL cumsum,
    not one window partition per language (which would put all of a
    dominant language — English is ~half of a web corpus — into a
    single task). Buckets are contiguous RANGES of the hash domain
    (floor(h / width)), so the global per-language order (h, doc_id)
    equals (bucket, h, doc_id) and the result is bit-identical to the
    naive single-window form: per-(lang,bucket) char sums feed a tiny
    windowed exclusive-prefix (n_langs x n_buckets rows, broadcast back)
    and the heavy window runs per (lang, bucket) — a hot language
    spreads over n_buckets tasks.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    m = 2147483647
    # pmod-fold the id BEFORE the Knuth multiply: ids above ~3.47e9
    # would overflow BIGINT in the product under ANSI mode (Spark 4
    # default — same lesson as graph.py's fingerprint). Folded id
    # < 2^31 times 2654435761 < 2^63 always fits.
    ids = F.col("doc_id").cast("long")
    guarded = F.when(ids >= 0, ids).otherwise(
        F.raise_error(F.lit("quota_sample_by_chars: doc_id must be non-negative"))
    )
    h = F.pmod(
        F.pmod(guarded, F.lit(m)) * F.lit(2654435761).cast("long"),
        F.lit(m),
    )
    width = -(-m // n_buckets)  # ceil: bucket is monotone in h, ranges contiguous
    d = docs.withColumn("_h", h).withColumn(
        "_bkt", (F.col("_h") / F.lit(width)).cast("int")
    )
    bsum = d.groupBy(lang_col, "_bkt").agg(
        F.sum(F.col("n_chars").cast("long")).alias("_bchars")
    )
    # exclusive prefix over the (tiny) bucket dimension — rows here are
    # n_langs x n_buckets regardless of corpus size
    wprefix = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bsum.select(
        lang_col, "_bkt",
        F.coalesce(F.sum("_bchars").over(wprefix), F.lit(0)).alias("_offset"),
    )
    wlocal = (
        Window.partitionBy(lang_col, "_bkt")
        .orderBy(F.col("_h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        d.join(F.broadcast(offsets), on=[lang_col, "_bkt"])
        .withColumn(
            "cum_chars",
            F.col("_offset") + F.sum(F.col("n_chars").cast("long")).over(wlocal),
        )
        .drop("_h", "_bkt", "_offset")
    )
    return out.filter(F.col("cum_chars") <= budget_per_lang)


def bm25_term_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance per (document, query term) — the corpus search /
    retrieval scorer (Robertson/Lucene form):
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1), tf saturation with
    length normalization. Emits one row per matching (doc, term) rather
    than a per-doc sum so every output value is a pure scalar expression
    (no float accumulation-order hazard) and a SQL oracle replays the
    identical op sequence; callers aggregate per doc when ranking.

    Scale shape (100 TB): doc length is ``size(split(...))`` — a SCALAR
    expression, so the dl and N/avgdl legs never explode the token
    stream at all (plan-audited: the naive toks.groupBy(doc_id) shape
    cost two extra full-corpus explodes); the only explode legs are tf
    and its df re-derivation, and the query-term filter runs the moment
    tokens exist. N/avgdl is a broadcast one-row aggregate."""
    from pyspark.sql import functions as F

    toklen = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    dl = docs.select(
        F.col(id_col).alias("doc_id"), toklen.cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    score = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", score.alias("bm25"), "tf", "df", "dl")
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    n_buckets: int = 64,
) -> DataFrame:
    """Sequence packing — the concat-and-chunk batching step before
    training (GPT-style): documents are laid end-to-end in a
    deterministic pseudo-random order (Knuth hash of id, the
    quota-sampler's ordering) and cut into fixed ``context_len`` bins.
    Emits (doc_id, bin_id, bin_offset, n) where bin_id/bin_offset locate
    the document's FIRST unit in the packed stream — a doc crossing a
    bin boundary continues into the next bin (the standard
    packing-with-splits formulation; no padding waste, fill factor is
    exactly 1 except the final bin).

    Scale shape: the running sum reuses the two-level cumsum (contiguous
    hash-range buckets, see quota_sample_by_chars) so one window never
    holds the corpus; bin assignment is then pure arithmetic on the
    global offset. SQL-replayable exactly (integer sums + floor
    division)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    m = 2147483647
    ids = F.col(id_col).cast("long")
    guarded = F.when(ids >= 0, ids).otherwise(
        F.raise_error(F.lit("pack_sequences: doc_id must be non-negative"))
    )
    h = F.pmod(F.pmod(guarded, F.lit(m)) * F.lit(2654435761).cast("long"), F.lit(m))
    width = -(-m // n_buckets)
    d = docs.withColumn("_h", h).withColumn(
        "_bkt", (F.col("_h") / F.lit(width)).cast("int")
    )
    bsum = d.groupBy("_bkt").agg(F.sum(F.col(len_col).cast("long")).alias("_bchars"))
    wprefix = Window.orderBy(F.col("_bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bsum.select(
        "_bkt", F.coalesce(F.sum("_bchars").over(wprefix), F.lit(0)).alias("_offset")
    )
    wlocal = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_offset") + F.coalesce(
        F.sum(F.col(len_col).cast("long")).over(wlocal), F.lit(0)
    )
    return (
        d.join(F.broadcast(offsets), on="_bkt")
        .withColumn("_start", start)
        .select(
            id_col,
            # Integer floor division on longs (matches the DuckDB `//`
            # oracle exactly): double division would round the quotient
            # once cumulative offsets approach 2^53 chars.
            F.expr(f"_start div {int(context_len)}").alias("bin_id"),
            F.pmod(F.col("_start"), F.lit(context_len)).cast("long").alias("bin_offset"),
            F.col(len_col).cast("long").alias("n"),
        )
    )


def pii_scrub(col: Column) -> Column:
    """PII redaction for training corpora: emails, phone-like number
    runs, and IPv4 literals replaced with typed placeholder tokens (the
    standard pre-training scrub). Patterns are backreference-free and
    RE2/Java-compatible, and the DuckDB oracle applies the identical
    chain with the 'g' (replace-all) flag, so both engines rewrite
    byte-identically. Pure Catalyst — no Python."""
    c = F.regexp_replace(
        col, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    c = F.regexp_replace(c, r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>")
    c = F.regexp_replace(c, r"\+?\d[\d ()-]{7,}\d", "<PHONE>")
    return c


def pii_counts(col: Column) -> list[Column]:
    """Per-doc counts of each PII class (pre-scrub audit columns)."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), F.lit(0)))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(col, F.lit(r"\b(\d{1,3}\.){3}\d{1,3}\b"), F.lit(0)))
        .cast("long").alias("n_ips"),
    ]


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_frac: float = 0.5,
    n_docs: int | None = None,
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/Trafilatura corpus
    step): a line occurring in more than ``max_doc_frac`` of all
    documents (nav bars, cookie banners, copyright footers) is dropped
    from every document; remaining lines are reassembled in original
    order. Returns (doc_id, clean_text, n_lines_kept, n_lines_removed).
    Every input document has an output row: a doc whose EVERY line is
    boilerplate comes back with clean_text NULL and n_lines_kept 0
    (ADVICE r4 — the old kept.groupBy dropped such docs entirely).

    ``n_docs``: pass the known corpus size to keep the plan fully lazy;
    when None it is computed INSIDE the plan as a broadcast scalar (no
    eager .count() at operator-construction time, VERDICT r4 #7).

    Shape (100 TB): posexplode lines -> distinct (doc, line) ->
    line-frequency aggregate (map-side combinable; the hot-line set is
    tiny and broadcasts via AQE) -> anti-ish filter -> one per-doc
    reassembly aggregate. Order restoration is array_sort over
    (pos, line) structs — no window, no second shuffle beyond the
    per-doc group."""
    # NO spread here (the corpus_frequency_quality finding): `lines` is
    # consumed twice (frequency agg + the tagged join), so a pre-explode
    # round-robin would shuffle the text payload per consumer
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    freq = (
        lines.select("doc_id", "line").distinct()
        .groupBy("line").agg(F.count(F.lit(1)).alias("_df"))
    )
    tagged = lines.join(freq, on="line")
    if n_docs is None:
        # one-row aggregate, broadcast-crossJoined into the filter — the
        # same lazy-scalar shape q77 uses for its corpus total
        total = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
        tagged = tagged.crossJoin(F.broadcast(total))
        thresh = F.lit(max_doc_frac) * F.col("_n_docs")
    else:
        thresh = F.lit(max_doc_frac * n_docs)
    is_kept = F.col("_df") <= thresh
    # aggregate from ALL lines (kept ones enter the reassembly struct as
    # null, which array-of-struct sort keeps but concat_ws/transform
    # skip), so all-boilerplate docs still emit a row
    out = tagged.groupBy("doc_id").agg(
        F.when(
            F.sum(is_kept.cast("int")) > 0,
            # concat_ws skips null array elements — dropped lines become
            # null slots, mirroring the oracle's string_agg(CASE ...)
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                F.when(is_kept, F.col("line")).alias("line"),
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
            ),
        ).alias("clean_text"),
        F.sum(is_kept.cast("long")).cast("long").alias("n_lines_kept"),
        F.sum((~is_kept).cast("long")).cast("long").alias("n_lines_removed"),
    )
    return out.select("doc_id", "clean_text", "n_lines_kept", "n_lines_removed")


def tfidf_term_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """TF-IDF over the FULL vocabulary (no query-term list — the
    feature-extraction twin of the query-scoped ``bm25_term_scores``):
    one row per (doc, term) with tf, df and
    tfidf = tf * (ln((1 + N)/(1 + df)) + 1)   (sklearn smooth-idf form,
    never divides by zero, keeps terms present in every doc).

    Per-(doc, term) scalar rows sidestep float accumulation order (the
    q81 rule); callers needing doc vectors aggregate downstream. Output
    size is the distinct (doc, term) count — the same cardinality every
    inverted index carries, shuffled once on doc_id and once (tiny) on
    term. N is a broadcast one-row aggregate."""
    from pyspark.sql import functions as F

    # Round-7: tf is DOC-LOCAL, so per-doc (tok, tf) pairs come from
    # run-lengths over the sorted word array (the q52 sorted-runs trick
    # generalized from max-run to all runs) — the corpus-wide
    # (doc, tok) hash aggregate and its ~5M-token shuffle disappear;
    # only the ~2M distinct-pair rows it would have produced are ever
    # emitted. Requires unique doc ids (already this operator's
    # contract — and the oracle's, which groups by doc_id the same
    # way). The doc table is round-robined first (2-split scan cap);
    # the null-text filter mirrors the replaced explode-on-null
    # semantics EXPLICITLY — under legacy (non-ANSI) configs
    # size(NULL) = -1 would otherwise fabricate a (tok NULL, tf -1)
    # row per null doc (round-7 review).
    from pda_spark.session import spread

    base = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.sort_array(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_sw"),
    ).filter(F.col("_sw").isNotNull())
    runs = base.withColumn(
        "_b", F.expr("filter(sequence(0, size(_sw) - 1), p -> p = 0 OR _sw[p] != _sw[p - 1])")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(_b, (x, i) -> named_struct("
                "  'tok', _sw[x],"
                "  'tf', cast((IF(i + 1 < size(_b), _b[i + 1], size(_sw))) - x AS BIGINT)))"
            )
        ).alias("_e"),
    )
    tf = runs.select("doc_id", F.col("_e.tok").alias("tok"), F.col("_e.tf").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "tok", "tf", "df", (F.col("tf") * idf).alias("tfidf"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional inverted index (the retrieval-side counterpart of
    tfidf_term_scores / bm25: what a search backend actually serves):
    one posting row per (term, doc) with the term frequency and the
    ordered 0-based token positions, plus the term's document frequency
    on every row (denormalized — postings for one term are consumed
    together, so df rides along instead of a second lookup).

    Emitted as per-(term, doc) SCALAR rows (the q81 rule): positions are
    an array_join'd string, tf/df integer-exact, fully order-independent.

    Shape (100 TB): posexplode tokens -> ONE groupBy (term, doc) with
    collect_list(pos) (map-side combinable counts; the positions list is
    bounded by doc length) -> a window-free df via a second tiny
    aggregate over the (term, doc) table joined back on term. The raw
    corpus shuffles once, keyed (term, doc) — hot terms spread across
    docs; the df join is on the much smaller distinct-term table."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.array_join(F.array_sort(F.collect_list("pos")), ",").alias("positions"),
    )
    df_tab = postings.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return postings.join(df_tab, "term").select("term", "doc_id", "tf", "df", "positions")


def term_cooccurrence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_num: int = 1,
    max_df_den: int = 1,
    min_pair_num: int = 0,
    min_pair_den: int = 1,
) -> DataFrame:
    """Term co-occurrence matrix (the count side of PMI / word-vector
    features): one row per unordered term pair (term_a < term_b) that
    appears together in a document, with n_ab (co-document frequency)
    and each term's df — every emitted column an order-independent
    integer; callers compute PMI = log(n_ab * N / (df_a * df_b))
    downstream (the q72 one-division rule).

    Thresholds are integer ratios so they stay SF-robust and exact:
    keep terms with df >= min_df AND df * max_df_den <= max_df_num * N
    (the stopword cap — at corpus scale an every-doc term would pair
    with the whole vocabulary, so the df ceiling is the scale story,
    exactly the df-cap rule the L2 Jaccard join uses); keep pairs with
    n_ab * min_pair_den >= min_pair_num * N. Every threshold defaults
    to its NO-OP value (min_df=1, max_df 1/1, min_pair 0/1) — callers
    opt into each cut explicitly.

    Scale shape: per-doc DISTINCT term sets (one shuffle on doc),
    df-filtered, then a per-doc self-join — O(k^2) per doc where k is
    the capped per-doc vocabulary — and one map-side-combinable pair
    groupBy. Output is bounded by (kept vocabulary)^2 / 2."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).distinct()
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    kept = (
        dfreq.crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") * F.lit(max_df_den) <= F.lit(max_df_num) * F.col("n_docs"))
        )
        .select("tok", "df")
    )
    t = toks.join(kept, "tok")
    pairs = (
        t.select("doc_id", F.col("tok").alias("term_a"))
        .join(t.select("doc_id", F.col("tok").alias("term_b")), "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    out = (
        pairs.crossJoin(F.broadcast(n))
        .filter(F.col("n_ab") * F.lit(min_pair_den) >= F.lit(min_pair_num) * F.col("n_docs"))
        .join(kept.select(F.col("tok").alias("term_a"), F.col("df").alias("df_a")), "term_a")
        .join(kept.select(F.col("tok").alias("term_b"), F.col("df").alias("df_b")), "term_b")
    )
    return out.select("term_a", "term_b", "n_ab", "df_a", "df_b")


def lm_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    min_df_num: int = 0,
    min_df_den: int = 1,
    train_pct: int = 80,
) -> DataFrame:
    """N-gram language-model coverage stats per held-out document — the
    count-based perplexity proxy a training pipeline uses to filter
    low-quality / out-of-distribution text without a neural LM: a
    unigram vocabulary and a distinct-bigram table are built from the
    hash-split train partition (same md5-fold split as ``hash_split`` —
    leakage-safe, stable under repartitioning), then every held-out doc
    reports. Vocabulary admission is df >= min_df AND df * min_df_den
    >= min_df_num * n_train — the ratio leg is SF-robust (the q118
    integer-ratio discipline), so the same query drops the same
    relative-rarity tokens at every scale.

        n_tok        total tokens
        n_oov        tokens outside the train vocabulary
        n_bigrams    adjacent-token bigrams
        n_bg_unseen  bigrams never seen in train

    All four are order-independent integer counts (the q72 discipline:
    the consumer computes OOV-rate / coverage with its own divisions).

    Scale shape: vocab and bigram tables are plain aggregates of the
    train partition; the per-doc legs are explode -> equi-join on the
    token / (w1, w2) key -> one map-side-combinable grouped sum. No
    broadcast hint: a 100 TB corpus's bigram table is itself large, so
    the join strategy is left to AQE (broadcast at test SF, shuffle
    join at scale). Bigrams come from a transform over slice — the
    two-param lambda is (element, index) with a 0-based index, so
    ``toks[i + 1]`` is the successor (the q96 lambda gotcha, used
    deliberately here)."""
    from pda_spark.functions.dedup import hex_to_long

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
        (
            F.pmod(hex_to_long(F.md5(F.col(id_col).cast("string"))), F.lit(100))
            < F.lit(train_pct)
        ).alias("is_train"),
    )
    bg = F.expr(
        "transform(slice(toks, 1, size(toks) - 1), (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
    )
    tr = base.filter(F.col("is_train"))
    ho = base.filter(~F.col("is_train"))
    n_train = tr.agg(F.count(F.lit(1)).cast("long").alias("_ntr"))
    vocab = (
        tr.select("doc_id", F.explode("toks").alias("tok"))
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_train))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") * F.lit(min_df_den) >= F.lit(min_df_num) * F.col("_ntr"))
        )
        .select("tok", F.lit(1).alias("_inv"))
    )
    tr_bg = (
        tr.select(F.explode(bg).alias("b"))
        .select("b.w1", "b.w2")
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    uni = (
        ho.select("doc_id", F.explode("toks").alias("tok"))
        .join(vocab, "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
        )
    )
    bgs = (
        ho.select("doc_id", F.explode(bg).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
        .join(tr_bg, ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_bg_unseen"),
        )
    )
    return uni.join(bgs, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        "n_oov",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("n_bg_unseen", F.lit(0)).cast("long").alias("n_bg_unseen"),
    )


def chunk_text(
    docs: DataFrame,
    chunk_chars: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size document chunking with overlap — the RAG/embedding
    ingestion primitive (split every document into chunk_chars-char
    windows advancing by chunk_chars - overlap): one row per
    (doc, chunk_idx, chunk). Pure Catalyst — a sequence explode over
    n_chunks = max(ceil((len - overlap) / step), 1) and one substring
    per chunk; no Python, no shuffle (chunking is embarrassingly
    row-local, which is the whole 100 TB story). Every document emits
    at least one chunk (an empty doc emits its empty chunk — dropping
    rows silently is the q132 lesson); the final chunk is the short
    remainder."""
    if chunk_chars < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"need 0 <= overlap < chunk_chars, got {overlap}")
    step = chunk_chars - overlap
    # n_chunks = ceil((len - overlap) / step) via integer div, floored at 1
    n_chunks = F.greatest(
        F.expr(f"(CAST(length({text_col}) AS BIGINT) - {overlap} + {step - 1}) div {step}"),
        F.lit(1),
    )
    idx = F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx")
    out = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"), idx)
    chunk = F.expr(f"substring(_t, 1 + chunk_idx * {step}, {chunk_chars})")
    return out.select(
        "doc_id", F.col("chunk_idx").cast("long").alias("chunk_idx"), chunk.alias("chunk")
    )


def bpe_merge_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Subword tokenization by RANKED GREEDY MERGES — the BPE-encode
    step as a pure Catalyst expression chain, replacing the q20-class
    whitespace/regex token-count heuristics with real merge-table
    tokenization. Each word is exploded to space-separated characters,
    then every merge rule (l, r), in rank order, rewrites the
    TOKEN-ADJACENT pair ``l r`` -> ``lr`` across the word
    (non-overlapping, left-to-right — the semantics of ``replace()``
    in every engine, which is what makes this oracle-replayable;
    canonical BPE re-scans for the lowest-rank pair after every
    single merge and differs only on overlapping-pair corner cases —
    documented deviation). Token adjacency is enforced by SENTINEL
    SPACES: the spaced word is wrapped " a b c " and rules match
    " l r " with the delimiters included — a bare ``l r`` match would
    cross token boundaries (rule (e, r) on "o the r" would eat the
    trailing e OF "the"; round-6 review finding, regression-tested).
    Within a run of identical pairs ("a a a a" under rule (a, a))
    the consumed delimiter makes the pass merge pairs 1-2 and 3-4 the
    way replace() scans, leaving fewer merges than a re-scanning
    tokenizer — a conservative UNDER-merge, precisely defined and
    identical in both engines (second documented deviation).
    The merge table is an input (trained offline); tokens are the
    space-separated pieces that remain.

    Returns one row per doc: (doc_id, n_words, n_tokens, n_chars) —
    all exact integers; n_tokens strictly decreases as merges apply,
    n_tokens == n_chars with an empty merge table. Zero Python, zero
    shuffle beyond the final per-doc aggregate: explode + codegen'd
    replace chain + map-side-combinable sums."""
    for left, right in merges:
        if not left or not right or " " in left or " " in right:
            raise ValueError(f"bad merge pair ({left!r}, {right!r})")
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    # spread the 2-split documents scan before the explode (pure-JVM
    # stage; the exchange carries the docs once)
    from pda_spark.session import spread

    tok = df.transform(spread).select(
        F.col(id_col).alias("doc_id"), F.explode(words).alias("_w")
    )
    # Round-7: the char-split regexp + 20-replace chain is a pure
    # function of the word, so it runs once per DISTINCT word (the
    # vocabulary — bounded and tiny next to the instance stream: ~5M
    # word instances vs a few thousand distinct words at sf1.0) and the
    # per-doc sums weight each word's token count by its (doc, word)
    # instance count. Integer sums are order-independent, so the
    # grouped form is exactly the per-instance form. The vocab side of
    # the join is left unhinted: AQE broadcasts it when small, which is
    # the right call at any corpus size.
    wc = tok.groupBy("doc_id", "_w").agg(F.count(F.lit(1)).alias("_c"))
    # 'abc' -> ' a b c ' (space after every char + leading sentinel:
    # every token is then delimited by spaces on BOTH sides)
    spaced = F.concat(F.lit(" "), F.regexp_replace(F.col("_w"), "(.)", "$1 "))
    merged = spaced
    for left, right in merges:
        merged = F.replace(
            merged, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        )
    vocab = (
        wc.select("_w")
        .distinct()
        .select("_w", F.size(F.split(F.trim(merged), " ")).alias("_nt"))
    )
    return (
        wc.join(vocab, "_w")
        .groupBy("doc_id")
        .agg(
            F.sum("_c").cast("long").alias("n_words"),
            F.sum(F.col("_c") * F.col("_nt")).cast("long").alias("n_tokens"),
            F.sum(F.col("_c") * F.length("_w")).cast("long").alias("n_chars"),
        )
    )
