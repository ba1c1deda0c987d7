"""Python UDTFs (SURVEY §2.10 — completes the UDF/UDAF/UDTF triad).

The reference's row-expanding steps (feature → asset rows,
``api_importer/importer.py``) are covered elsewhere by ``explode``;
this module provides the same expansion as a REAL Spark 4 Python UDTF
(``pyspark.sql.functions.udtf``, Arrow-optimized) so the engine's user
surface includes native table functions, not only scalar UDFs + UDAFs.

Scale note: the UDTF is the API-surface path. For the hot corpus path
the pure-Catalyst ``dedup.char_shingles`` transform (whole-stage
codegen, zero Python workers) remains the production idiom — the q99
gate pins BOTH to the same oracle so they cannot drift apart.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

# Mirrors dedup.char_shingles normalization EXACTLY, restricted to the
# ASCII whitespace class Java regex \s and DuckDB (RE2) \s agree on.
# Python's \s would additionally match unicode spaces (e.g. \xa0) that
# neither SQL engine folds — an ASCII-explicit class keeps all three
# engines bit-identical. trim()/.strip(' ') both strip ONLY ' '.
_WS = re.compile(r"[ \t\n\r\f\x0b]+")


def _normalize(text: str) -> str:
    return _WS.sub(" ", text.strip(" ").lower())


@udtf(returnType="pos int, shingle string", useArrow=True)
class ShingleUDTF:
    """Emit (pos, shingle) rows of the k-char rolling shingles of the
    normalized input — the UDTF twin of ``dedup.char_shingles``
    (identical semantics, including the single truncated shingle for
    texts shorter than k and the single empty shingle for empty text).
    ``pos`` is 1-based to match ``substring`` in both SQL engines."""

    def eval(self, text: str, k: int):  # noqa: D102 (Spark UDTF contract)
        if text is None:
            return
        norm = _normalize(text)
        for i in range(max(len(norm) - k + 1, 1)):
            yield i + 1, norm[i : i + k]


def register_udtfs(spark: SparkSession) -> None:
    """Idempotent session registration (``CREATE OR REPLACE`` semantics:
    Spark's udtf.register overwrites by name)."""
    spark.udtf.register("shingle_udtf", ShingleUDTF)


def shingle_rows(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 6) -> DataFrame:
    """(doc_id, pos, shingle) via a LATERAL join against the UDTF —
    the table-function form of the explode idiom. The input view name is
    unique per call (a fixed name leaked into the session catalog and
    raced concurrent calls — round-6 review); the view is dropped once
    the returned DataFrame is analyzed (spark.sql resolves eagerly, so
    the result survives the drop)."""
    import uuid

    spark = docs.sparkSession
    register_udtfs(spark)
    view = f"_udtf_docs_in_{uuid.uuid4().hex[:12]}"
    # round-robin the doc table first: the UDTF evals row-at-a-time in
    # the Python worker, and a sub-4MB parquet scan (2 splits) would cap
    # the whole LATERAL stage at 2 workers (round-7; q99 4.5 s -> the
    # exchange moves the docs once)
    from pda_spark.session import spread

    spread(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_txt"))) \
        .createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"SELECT d.doc_id, s.pos, s.shingle "
            f"FROM {view} d, LATERAL shingle_udtf(d._txt, {int(k)}) s"
        )
    finally:
        spark.catalog.dropTempView(view)
