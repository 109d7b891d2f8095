"""Streaming sketch maintenance: Count-Min and HyperLogLog over
unbounded streams.

Sketches are ORDER-INDEPENDENT MERGES (counter sums, register maxes), so
Structured Streaming maintains them natively as stateful aggregations
with BOUNDED state — depth×width counter cells (CMS) or m registers per
group (HLL) — no matter how long the stream runs. This is the streaming
twin of llmops/sketches.py: the same md5-derived portable hash family,
the same cell/register layout, so a snapshot of the streaming state is
bit-identical to a batch-built sketch over the same rows (pinned by
tests/test_streaming_sketches.py).

Streams allow only ONE stateful aggregation per query, so the builders
here work from RAW rows (each occurrence updates the cells directly)
rather than pre-aggregated counts — same result, and exactly the
classical sketch update rule. Run with outputMode("complete"/"update");
at scale the state store holds ≤ depth×width (CMS) / groups×m (HLL)
rows, which is what makes these viable where a streaming exact
groupBy-term would grow without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..llmops.sketches import md5_int


def streaming_cms_cells(
    stream: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Maintain CMS counters over a stream: every arriving occurrence
    increments its depth cells; the result is the live (j, bucket,
    counter) sketch. State is ≤ depth×width rows forever."""
    cells = stream.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    (md5_int(F.col(term_col), j) % width).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("cell")
    )
    return (
        cells.select("cell.j", "cell.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def streaming_cms_windowed(
    stream: DataFrame,
    ts_col: str,
    term_col: str = "term",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Time-windowed CMS: one sketch per tumbling event-time window, with
    watermark-driven state EVICTION — the form an always-on pipeline
    runs, where an unwindowed sketch would conflate all of history and
    its state, while bounded, would never age out. State is
    (live windows) × depth × width cells; once the watermark passes a
    window, its cells finalize (append-mode emittable) and leave the
    store. Output: (win, j, bucket, counter)."""
    cells = stream.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window_duration).alias("win"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    (md5_int(F.col(term_col), j) % width).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("cell"),
    )
    return (
        cells.select("win", "cell.j", "cell.bucket")
        .groupBy("win", "j", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def streaming_hll_registers(
    stream: DataFrame,
    key_col: str,
    group_cols: list[str],
    b: int = 8,
) -> DataFrame:
    """Maintain HLL registers over a stream: per (group, bucket) the max
    leading-zero rank seen so far. State is ≤ groups × 2^b rows; the
    snapshot feeds the same estimate formula as the batch operator.

    Delegates to the batch builder — a max-aggregation is an allowed
    streaming stateful op, and sharing the expression guarantees the
    streaming state is bit-identical to a batch-built sketch (and
    MERGEABLE with one: llmops/sketches.py:hll_registers)."""
    from ..llmops.sketches import hll_registers

    return hll_registers(stream, key_col, group_cols, b)
