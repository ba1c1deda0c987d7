"""Skyline (Pareto-frontier) operator — the multi-criteria 'best
trade-offs' query (Borzsony/Kossmann/Stocker 2001): keep every row not
DOMINATED by another (another row at-least-as-good in every criterion
and strictly better in one).

Distributed shape: the classic two-phase decomposition — a local
skyline per partition (a partition's dominated row is dominated
globally, and a global skyline row survives every local pass, so the
local filter is lossless), then one final pass over the union of local
skylines, which is tiny whenever the frontier is (frontier size grows
~log^(d-1) n for independent dims). Phase 1 never shuffles at all;
phase 2 moves only the local frontiers. The output SET is unique — no
algorithm or partitioning choice can change it — which is what makes
the operator gate-able cross-engine. Ties/duplicates: rows equal on
every criterion do not dominate each other, so all of them survive
(set semantics; matches the SQL NOT EXISTS formulation).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _skyline_kernel(pdf: pd.DataFrame, minimize: list[str], maximize: list[str]) -> pd.DataFrame:
    if pdf.empty:
        return pdf
    m = np.column_stack(
        [pdf[c].to_numpy(dtype=float) for c in minimize]
        + [-pdf[c].to_numpy(dtype=float) for c in maximize]
    )
    n = len(m)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if not keep[i]:
            # transitively safe to skip: i's dominator already removed
            # everything i dominates when IT was processed
            continue
        worse = (m >= m[i]).all(axis=1) & (m > m[i]).any(axis=1)
        keep &= ~worse
    return pdf[keep]


def skyline(df: DataFrame, minimize: list[str], maximize: list[str]) -> DataFrame:
    """Rows not dominated under (minimize ASC, maximize DESC) criteria.
    Criterion columns must be numeric and exactly representable as
    float64 (ints < 2^53 / doubles) — comparisons only, values are
    never rewritten, the surviving rows pass through byte-identical.

    Arrow-batched O(k^2) local kernel per phase (k = partition rows in
    phase 1, union-of-frontiers in phase 2); batches within a partition
    are accumulated first so each pass sees its whole input."""
    if not minimize and not maximize:
        raise ValueError("skyline needs at least one criterion column")

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if not b.empty]
        if chunks:
            yield _skyline_kernel(pd.concat(chunks, ignore_index=True), minimize, maximize)

    local = df.mapInPandas(per_partition, df.schema)
    # repartition(1), NOT coalesce(1): coalesce is a narrow dependency
    # that would fuse scan -> phase-1 kernel -> single task, serializing
    # phase 1 entirely. The shuffle boundary here moves only the tiny
    # local frontiers while phase 1 runs one kernel per input partition.
    return local.repartition(1).mapInPandas(per_partition, df.schema)
