"""Record-linkage scoring: Jaro-Winkler string similarity and
Fellegi-Sunter evidence weights.

Spark ships ``levenshtein`` and ``soundex`` but not Jaro-Winkler — the
de-facto standard comparator for person/organization names in entity
resolution. The implementation here follows the canonical definition
(Jaro matches within the half-max-length window, transposition count
from match-order disagreement, Winkler prefix bonus capped at 4 chars,
applied only above the 0.7 boost threshold) and is pinned against the
PUBLISHED reference vectors (MARTHA/MARHTA etc.) in
tests/test_llmops.py — independent ground truth, not self-agreement.

Scale: ``jw_score_pairs`` is an Arrow-batched pandas UDF (pure map;
zero shuffle). At 100 TB the comparator runs only on blocked candidate
pairs (soundex_blocking_stats / sorted_neighborhood_pairs produce
those), never all-pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaro(s1: str, s2: str) -> float:
    """Plain Jaro similarity in [0, 1]."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    window = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    """Jaro-Winkler: Jaro plus a common-prefix bonus (<= 4 chars,
    scaling factor ``p``), applied only when Jaro exceeds ``boost``."""
    j = jaro(s1, s2)
    if j <= boost:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * p * (1.0 - j)


def jw_score_pairs(
    df: DataFrame, col_a: str, col_b: str, out: str = "jw"
) -> DataFrame:
    """Append round(jaro_winkler(a, b), 9) as ``out`` — vectorized,
    map-only. A NULL on either side scores NULL (real linkage data has
    nullable name fields; scoring None==None as 1.0 would fabricate
    matches, and len(None) would kill the stage)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if (pd.isna(x) or pd.isna(y))
                else round(jaro_winkler(x, y), 9)
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    return df.withColumn(out, _jw(F.col(col_a), F.col(col_b)))
