"""Custom stateful streaming operators via applyInPandasWithState.

The reference's accumulator keeps per-batch running state (itemCount,
status) across micro-batches; the general Spark form of "user-defined
state evolved per key per epoch" is ``applyInPandasWithState``. This module
ships a per-key running aggregate operator in that form — the pattern any
custom stateful operator (rate trackers, dedup-within-stream, session
machines) follows.

Scale: state lives in the streaming state store (RocksDB/HDFS-backed on a
cluster), partitioned by key — the operator shuffles each micro-batch once
on the key, state never leaves executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, epoch_count long, total_count long, total_value double"
STATE_SCHEMA = "total_count long, total_value double"


def running_totals_per_key(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Stateful per-key running totals over a stream of (user_id, value).

    Each micro-batch emits one row per active key with the epoch's delta and
    the all-time totals — the streaming twin of
    ``groupBy(key).agg(count, sum)`` with monotonically growing state.

    The updater is a NESTED function on purpose: cloudpickle ships nested
    functions by value, so executor Python workers don't need this package
    importable (module-level functions are pickled by reference and break
    when the driver runs outside the repo root).
    """

    def update_running_totals(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        n = 0
        v = 0.0
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        total_n, total_v = state.get if state.exists else (0, 0.0)
        total_n += n
        total_v += v
        state.update((total_n, total_v))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "epoch_count": [n],
                "total_count": [total_n],
                "total_value": [round(total_v, 2)],
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update_running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
