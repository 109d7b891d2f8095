"""Stream-stream event-time interval join.

The reference never correlates two streams (its two subsystems each
consume one logical stream), but a Spark-native engine at 100 TB needs
the canonical two-stream correlation: match each left event to right
events with the same key arriving within a bounded event-time interval
(errors→subsequent clicks, impressions→conversions, order→shipment).

Why the bounds matter at scale: a stream-stream join buffers BOTH sides
in state. The watermark plus the interval condition give Spark a proof of
when a buffered row can never match again, so state is evicted instead of
growing without bound — an unbounded-condition stream join is a memory
leak by construction. Spark requires the time-interval condition for
append-mode stream-stream joins for exactly this reason.

The same builder works on batch DataFrames (``withWatermark`` is a no-op
in batch), so tests compare the streaming run to the identical batch
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "2 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``key`` where ``right_ts`` falls in
    [left_ts, left_ts + upper]. Both sides are watermarked by
    ``watermark``; state for a row is dropped once the other side's
    watermark passes its interval. Timestamp columns must be named
    differently on the two sides (both appear in the output).

    Outer-join caveats (tested in tests/test_streaming_joins.py): the
    query's global watermark is the MIN across both input streams, so a
    stalled side pins unmatched rows in state; and null-side emission
    happens one micro-batch AFTER the watermark that finalizes it."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must have distinct names")
    # Spark's join-type parsing is case-insensitive and
    # underscore-insensitive; match it.
    semi_anti = how.lower().replace("_", "") in (
        "leftsemi", "semi", "leftanti", "anti",
    )
    shared = [
        c for c in left.columns if c != key and c in set(right.columns)
    ]
    if shared and not semi_anti:
        # the projection below emits both sides' columns verbatim; a shared
        # non-key name would build fine here but produce duplicate output
        # columns that fail far downstream (AMBIGUOUS_REFERENCE on the
        # first select/write) — fail fast at the join instead. Semi/anti
        # joins emit ONLY left-side columns, so shared names are harmless
        # there and the guard must not fire (ADVICE r8).
        raise ValueError(
            f"shared non-key column(s) {shared}: rename one side before the "
            "interval join (both sides' columns appear verbatim in the output)"
        )
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    joined = l.join(r, cond, how)
    # Semi/anti joins emit ONLY left-side columns — the coalesce/select
    # projection below references r-side columns that don't exist in
    # their output and would raise AnalysisException.
    if semi_anti:
        return joined
    # ONE surviving key column via coalesce, not drop(r.key): under
    # right/full outer, a right-only row has l.key NULL — dropping r.key
    # would emit it with no key at all, so the consumer couldn't tell
    # WHICH key went unmatched
    key_out = F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)
    l_cols = [F.col(f"l.{c}") for c in left.columns if c != key]
    r_cols = [F.col(f"r.{c}") for c in right.columns if c != key]
    return joined.select(key_out, *l_cols, *r_cols)
