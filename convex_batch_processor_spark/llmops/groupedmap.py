"""Grouped-map Pandas operators (applyInPandas) — the X1 row-level UDF
surface (SURVEY.md §2.10) in its per-group form.

Use ONLY when the per-group computation genuinely needs imperative pandas
(iterative fitting, scipy calls); anything expressible as window/agg
Columns (including the z-score below) should stay JVM-side — this module
exists to prove the plumbing and to host genuinely-pandas logic later.

Scale: each group becomes one Arrow batch on one executor — groups must
fit in memory (salt or pre-aggregate monster groups first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def group_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key z-score normalization via applyInPandas.

    Nested function: cloudpickled by value → executors never import this
    package (see streaming/stateful.py for the by-reference trap).
    """
    schema = f"{key_col} long, {id_col} long, {value_col} double, zscore double"

    def normalize(pdf):
        import pandas as pd  # noqa: F401 (worker-side import)

        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else pdf[value_col] * 0.0
        return pdf[[key_col, id_col, value_col]].assign(zscore=z.round(6))

    return df.select(key_col, id_col, value_col).groupBy(key_col).applyInPandas(normalize, schema)
