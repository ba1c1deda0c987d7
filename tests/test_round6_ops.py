"""Round-6 operators: UDTF shingles, substring containment, winnowing,
block-mean downsample, TF-IDF."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pda_spark.functions import dedup, multimodal, text, udtfs
from tests.conftest import formatted_plan


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "the QUICK   brown\tfox jumps over the lazy dog again"),
        (2, "completely different content with no overlap at all"),
        (3, "quick brown fox"),
        (4, "xy"),
        (5, None),
        (6, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- UDTF -----------------------------------------------------------------


def test_udtf_matches_char_shingles_twin(spark, docs):
    """The UDTF must emit the exact shingle multiset the pure-Catalyst
    char_shingles transform produces — same normalization, same
    truncated-tail semantics (q99's three-way-pin, engine side)."""
    d = docs.filter(F.col("text").isNotNull())
    via_udtf = udtfs.shingle_rows(d, k=5).select("doc_id", "shingle")
    via_expr = d.select(
        F.col("doc_id"), F.explode(dedup.char_shingles("text", k=5)).alias("shingle")
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_expr.collect()))
    assert a == b


def test_udtf_plan_is_arrow(spark, docs):
    plan = formatted_plan(udtfs.shingle_rows(docs, k=5))
    assert "ArrowEvalPythonUDTF" in plan, plan


def test_udtf_null_and_empty_text(spark, docs):
    out = udtfs.shingle_rows(docs, k=5)
    got = {r["doc_id"]: r for r in out.collect() if r["doc_id"] in (5, 6)}
    assert 5 not in got  # NULL text emits no rows
    # whitespace-only text normalizes to '' -> one empty shingle
    empties = out.filter(F.col("doc_id") == 6).collect()
    assert len(empties) == 1 and empties[0]["shingle"] == ""


# --- substring containment ------------------------------------------------


def test_substring_containment_matches_bruteforce(spark, docs):
    """Index path == exhaustive instr over the cross product, including
    multi-doc matches ('quick brown fox' occurs in docs 0, 1, 3)."""
    snips = spark.createDataFrame(
        [(100, "quick brown fox"), (101, "lazy dog"), (102, "zebra quartz")],
        "snip_id long, stext string",
    )
    corpus = docs.filter(F.col("text").isNotNull())
    got = {
        (r["snip_id"], r["doc_id"])
        for r in dedup.substring_containment(
            corpus, snips, k=8, snip_text_col="stext"
        ).collect()
    }
    norm = lambda s: " ".join(s.strip().lower().split())  # noqa: E731
    want = {
        (srow["snip_id"], drow["doc_id"])
        for srow in snips.collect()
        for drow in corpus.collect()
        if norm(srow["stext"]) in norm(drow["text"])
    }
    assert got == want
    assert (100, 0) in got and (100, 1) in got and (100, 3) in got
    assert not any(s == 102 for s, _ in got)


def test_substring_containment_short_snippet_brute_path(spark, docs):
    """Snippets shorter than k can't use the shingle index and must go
    through the broadcast scan; empty snippets match nothing."""
    snips = spark.createDataFrame(
        [(1, "fox"), (2, ""), (3, "  ")], "snip_id long, stext string"
    )
    corpus = docs.filter(F.col("text").isNotNull())
    got = {
        (r["snip_id"], r["doc_id"])
        for r in dedup.substring_containment(
            corpus, snips, k=8, snip_text_col="stext"
        ).collect()
    }
    assert {(1, 0), (1, 1), (1, 3)} <= got
    assert not any(s in (2, 3) for s, _ in got)


# --- winnowing ------------------------------------------------------------


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing guarantee: any common substring of length
    >= k + w - 1 yields at least one shared fingerprint; disjoint texts
    share none (k=5, w=4 -> guarantee length 8)."""
    common = "abcdefghij"  # length 10 >= 8
    rows = [
        (1, f"xxqq {common} zzyy"),
        (2, f"totally other prefix {common}"),
        (3, "nothing in the least similar 012345"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = dedup.winnow_fingerprints(df, k=5, w=4)
    by_doc = {
        did: {r["minh"] for r in rs}
        for did, rs in (
            (d, [r for r in fp.collect() if r["doc_id"] == d]) for d in (1, 2, 3)
        )
    }
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])


def test_winnowing_density_and_short_docs(spark):
    """Fingerprint count ~ 2/(w+1) of shingles for long docs; a doc
    shorter than one full window still emits exactly >= 1 fingerprint."""
    long_text = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, long_text), (2, "abc")], "doc_id long, text string"
    )
    fp = dedup.winnow_fingerprints(df, k=5, w=4)
    n_long = fp.filter(F.col("doc_id") == 1).count()
    m = len(" ".join(long_text.strip().lower().split())) - 4
    assert 0.1 * m < n_long < 0.8 * m
    assert fp.filter(F.col("doc_id") == 2).count() == 1


# --- block-mean downsample ------------------------------------------------


def test_downsample_block_mean_exact_rgb(spark):
    """6x4 RGB ramp -> 2x2 grid: exact integer block sums (checked
    against a direct numpy reduction) through REAL encoded bytes."""
    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    payload = multimodal.encode_bmp(px)
    media = spark.createDataFrame([("m1", bytearray(payload))], "media_id string, payload binary")
    out = {
        (r["by"], r["bx"]): (r["px_sum"], r["n_px"])
        for r in multimodal.downsample_block_mean(media, out_w=2, out_h=2).collect()
    }
    want = {}
    for by in range(2):
        for bx in range(2):
            blk = px.astype(np.int64)[by * 2 : by * 2 + 2, bx * 3 : bx * 3 + 3]
            want[(by, bx)] = (int(blk.sum()), blk.size)
    assert out == want


def test_downsample_block_mean_gray_and_nondivisible(spark):
    """5x3 grayscale PGM (non-divisible by the 2x2 grid): block extents
    vary (floor partition), every cell covered, totals conserved."""
    px = (np.arange(15, dtype=np.uint8) * 7).reshape(3, 5)
    media = spark.createDataFrame(
        [("g1", bytearray(multimodal.encode_ppm(px)))], "media_id string, payload binary"
    )
    rows = multimodal.downsample_block_mean(media, out_w=2, out_h=2).collect()
    assert len(rows) == 4
    assert sum(r["px_sum"] for r in rows) == int(px.astype(np.int64).sum())
    assert sum(r["n_px"] for r in rows) == 15


# --- tf-idf ---------------------------------------------------------------


def test_tfidf_known_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["tok"]): (r["tf"], r["df"], r["tfidf"])
        for r in text.tfidf_term_scores(df).collect()
    }
    assert out[(1, "a")][:2] == (2, 2)
    assert out[(3, "c")][:2] == (3, 2)
    assert out[(1, "b")][:2] == (1, 1)
    assert abs(out[(1, "a")][2] - 2 * (math.log(4 / 3) + 1)) < 1e-12
    assert abs(out[(1, "b")][2] - 1 * (math.log(4 / 2) + 1)) < 1e-12
    # tf-idf ordering: rarer term outweighs commoner at equal tf
    assert out[(1, "b")][2] > out[(2, "a")][2]
