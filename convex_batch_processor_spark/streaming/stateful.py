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

#: Sentinel for a NULL id (pandas surfaces it as NaN; int(NaN) would
#: kill the query). int64 MIN, not -1 (ADVICE r11): -1 is a plausible
#: producer id, so a genuine -1 would silently share identity and
#: tie-break order with NULL-id rows; no realistic id domain emits
#: int64 MIN, so the collision documented by the old contract cannot
#: occur in practice. Sorts FIRST among ids, preserving the NULLS
#: FIRST ordering the old -1 sentinel gave over non-negative domains.
NULL_ID_SENTINEL = -(1 << 63)


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


SESSION_OUTPUT_SCHEMA = (
    "user_id long, n_events long, t_start_us long, t_end_us long, session_value double"
)
SESSION_STATE_SCHEMA = "n long, t_start_us long, t_end_us long, value double"


def gap_sessions_per_key(
    stream: DataFrame,
    gap_ms: int,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session machine with EVENT-TIME TIMEOUT — the custom
    stateful form of ``session_window`` (and of the batch
    ``sessionize_events`` lag→running-sum query), for when the per-session
    logic outgrows an aggregate (e.g. emit-on-close side effects, custom
    merge rules).

    Semantics: a key's session extends while consecutive events are within
    ``gap_ms`` of each other. Sessions CLOSED by data inside a batch
    (an in-batch gap) emit immediately; the trailing open session is kept
    in the state store with ``setTimeoutTimestamp(last_event + gap)`` —
    when the WATERMARK passes that point, Spark invokes this function with
    ``state.hasTimedOut`` and no data, and the session emits exactly once.
    Callers must put ``withWatermark`` on the stream (event-time timeout
    requires it) and pass event time as epoch MICROS in a long column
    (keeps the updater free of pandas datetime dtype pitfalls).

    Scale: one shuffle per micro-batch on the key; state is one tiny row
    per OPEN session (closed sessions leave the store immediately) —
    bounded by concurrently-active keys, not history.
    """

    def update_sessions(key, pdfs, state):
        import pandas as pd

        (user_id,) = key

        def emit(n, s, e, v):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "t_start_us": [s],
                    "t_end_us": [e],
                    "session_value": [round(v, 2)],
                }
            )

        if state.hasTimedOut:
            n, s, e, v = state.get
            state.remove()
            yield emit(n, s, e, v)
            return

        events: list[tuple[int, float]] = []
        for pdf in pdfs:
            events.extend(
                zip(pdf[ts_us_col].astype("int64"), pdf[value_col].astype("float64"))
            )
        if not events:
            return
        events.sort()

        # Interval merge: the open session is ONE interval among the sorted
        # batch events — a cross-batch LATE event (within the watermark) more
        # than gap BEFORE the open session's earliest event must form its own
        # already-closed session, exactly as the batch sessionize twin splits
        # there. The old append-only loop merged ANY earlier event into the
        # open session (ts - end is negative, never > gap), silently bridging
        # arbitrary gaps. Merging intervals where start - prev_end <= gap
        # reproduces the twin's strictly-greater split rule; every merged
        # interval except the latest is closed (anything that could still
        # join it is later than these events, hence in the open tail).
        items = [(ts, ts, 1, val) for ts, val in events]  # (start, end, n, v)
        if state.exists:
            n0, s0, e0, v0 = state.get
            items.append((s0, e0, n0, v0))
        items.sort()
        merged = [items[0]]
        for s, e, n, v in items[1:]:
            ms, me, mn, mv = merged[-1]
            if s - me <= gap_ms * 1000:
                merged[-1] = (ms, max(me, e), mn + n, mv + v)
            else:
                merged.append((s, e, n, v))
        for s, e, n, v in merged[:-1]:
            yield emit(n, s, e, v)
        s, e, n, v = merged[-1]
        cur = (n, s, e, v)
        state.update(cur)
        # close when the watermark passes last-event + gap; the timeout
        # timestamp must be strictly beyond the current watermark
        timeout_ms = cur[2] // 1000 + gap_ms
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update_sessions,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


SCD2_OUTPUT_SCHEMA = (
    "user_id long, version long, state string, valid_from_us long, valid_to_us long"
)
SCD2_STATE_SCHEMA = "cur_state string, version long, since_us long, last_us long, last_seq long"


def scd2_closed_intervals_per_key(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    type_col: str = "event_type",
    seq_col: str = "event_id",
) -> DataFrame:
    """Streaming SCD type-2 maintenance: the incremental twin of the batch
    ``scd2_user_state`` query. Each key's open version lives in the state
    store as (state, version, since); every observed state CHANGE closes
    the previous version and emits its interval row exactly then — the
    closed-interval stream is append-only, so downstream can sink it
    straight into the history table the batch query would rebuild from
    scratch.

    Given the same events in the same per-key (ts, seq) order, the emitted
    rows are EXACTLY the batch query's ``is_current = false`` rows (the
    open version per key stays in state, unemitted — drain it with a final
    snapshot read if the stream ends). Events at or before the key's last
    processed (ts, seq) position are dropped (out-of-order arrivals older
    than already-closed history cannot retro-split intervals; bound
    staleness upstream with a watermark).

    Scale: one shuffle per micro-batch on the key; state is ONE tiny row
    per key regardless of history length (closed intervals leave
    immediately) — the batch rebuild holds the full event history, this
    holds the open version only.
    """

    def update_scd2(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        events: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            events.extend(
                zip(
                    pdf[ts_us_col].astype("int64"),
                    pdf[seq_col].astype("int64"),
                    pdf[type_col].astype("object"),
                )
            )
        if not events:
            return
        events.sort(key=lambda e: (e[0], e[1]))

        cur = state.get if state.exists else None  # (state, ver, since, last, seq)
        out: list[tuple[int, str, int, int]] = []  # (version, state, from, to)
        for ts, eid, et in events:
            if cur is not None and (ts, eid) <= (cur[3], cur[4]):
                continue  # at/before already-processed position: drop
            if cur is None:
                cur = (et, 1, ts, ts, eid)
            elif et != cur[0]:
                out.append((cur[1], cur[0], cur[2], ts))
                cur = (et, cur[1] + 1, ts, ts, eid)
            else:
                cur = (cur[0], cur[1], cur[2], ts, eid)
        state.update(cur)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "version": [o[0] for o in out],
                    "state": [o[1] for o in out],
                    "valid_from_us": [o[2] for o in out],
                    "valid_to_us": [o[3] for o in out],
                }
            )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update_scd2,
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CONTROL_OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, mean_before double, "
    "std_before double, zscore double, is_alert boolean"
)
CONTROL_STATE_SCHEMA = "n long, s double, s2 double"


def control_chart_per_key(
    stream: DataFrame,
    key_col: str = "user_id",
    z_threshold: float = 3.0,
    min_history: int = 5,
) -> DataFrame:
    """Streaming control chart: per key, each arriving value is scored
    against the running mean/std of everything that key sent BEFORE it
    (Welford-style sufficient statistics n, sum, sum-of-squares as
    state), emitting a z-score and an alert flag once at least
    ``min_history`` observations exist — the per-entity anomaly monitor
    (billing spikes, abusive clients, sensor faults) as a stateful
    streaming operator with O(1) state per key.

    Rows inside one micro-batch are processed in (event_id) order so
    replays with different batch boundaries score identically — the
    differential test splits the same input at several boundaries and
    asserts identical alerts.

    The updater is nested (cloudpickle by-value; see
    running_totals_per_key)."""

    def update_chart(key, pdfs, state):
        import math

        import pandas as pd

        (user_id,) = key
        n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
        rows = {k: [] for k in (
            "user_id", "event_id", "value", "mean_before",
            "std_before", "zscore", "is_alert",
        )}
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("event_id")
        for event_id, v in zip(pdf["event_id"], pdf["value"]):
            v = float(v) if v == v else 0.0  # NaN-safe: treat missing as 0
            if n >= min_history:
                mean = s / n
                var = max(0.0, (s2 / n) - (mean * mean))
                std = math.sqrt(var)
                z = 0.0 if std == 0.0 else (v - mean) / std
                rows["user_id"].append(int(user_id))
                rows["event_id"].append(int(event_id))
                rows["value"].append(v)
                rows["mean_before"].append(round(mean, 9))
                rows["std_before"].append(round(std, 9))
                rows["zscore"].append(round(z, 9))
                rows["is_alert"].append(abs(z) > z_threshold)
            n += 1
            s += v
            s2 += v * v
        state.update((n, s, s2))
        yield pd.DataFrame(rows)

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return stream.groupBy(key_col).applyInPandasWithState(
        update_chart,
        outputStructType=CONTROL_OUTPUT_SCHEMA,
        stateStructType=CONTROL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_GST.NoTimeout,
    )


BUCKET_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, allowed boolean, "
    "tokens_after double"
)
BUCKET_STATE_SCHEMA = "tokens double, last_us long"


def token_bucket_per_key(
    stream: DataFrame,
    key_col: str = "user_id",
    capacity: float = 5.0,
    refill_per_s: float = 1.0,
) -> DataFrame:
    """Streaming token-bucket rate limiter: each key's bucket holds up to
    ``capacity`` tokens, refilling at ``refill_per_s``; an event is
    admitted iff a full token is available (then spends it) — the
    standard admission-control primitive (API quotas, crawl politeness,
    ingestion back-pressure) as a stateful streaming operator with O(1)
    state per key.

    Refill is computed from EVENT TIME (integer microseconds), so the
    decision sequence depends only on the data: rows process in
    (event_id) order inside each batch, and as long as arrival
    preserves that order the admitted/rejected pattern is bit-identical
    however the stream is cut into micro-batches (same contract as
    control_chart_per_key, differentially tested).

    The updater is nested (cloudpickle by-value; see
    running_totals_per_key)."""

    def update_bucket(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        tokens, last_us = state.get if state.exists else (capacity, None)
        rows = {k: [] for k in (
            "user_id", "event_id", "ts_us", "allowed", "tokens_after",
        )}
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("event_id")
        for event_id, ts_us in zip(pdf["event_id"], pdf["ts_us"]):
            ts_us = int(ts_us)
            if last_us is not None and ts_us > last_us:
                tokens = min(
                    capacity, tokens + ((ts_us - last_us) / 1e6) * refill_per_s
                )
            last_us = ts_us if last_us is None else max(last_us, ts_us)
            # 1e-9 admission epsilon: fractional refills accumulate float
            # representation error, and an exact >= 1.0 flips admit/reject
            # at exact-rate traffic (e.g. 0.05s steps at 20 tokens/s);
            # still a pure function of the same floats, so the split-
            # invariance contract is unchanged
            allowed = tokens >= 1.0 - 1e-9
            if allowed:
                tokens -= 1.0
            rows["user_id"].append(int(user_id))
            rows["event_id"].append(int(event_id))
            rows["ts_us"].append(ts_us)
            rows["allowed"].append(allowed)
            rows["tokens_after"].append(round(tokens, 9))
        state.update((tokens, last_us if last_us is not None else -1))
        yield pd.DataFrame(rows)

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return stream.groupBy(key_col).applyInPandasWithState(
        update_bucket,
        outputStructType=BUCKET_OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_GST.NoTimeout,
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-within-horizon deduplication: drop rows
    whose ``keys`` were already seen within the watermark horizon — the
    ingest primitive for retried client pushes (the reference's addItems
    path redelivers whole batches on failure; lib.ts's insert loop relies
    on the caller not retrying — a Spark ingest MUST dedupe).

    Spark-first: this is the native ``dropDuplicatesWithinWatermark``
    (state per key is DROPPED once the watermark passes first-seen-ts +
    delay), not a custom operator. The bounded-state tradeoff is
    explicit: a duplicate arriving AFTER its original's state expired is
    re-emitted (at-least-once beyond the horizon), which is what keeps
    state O(keys-per-horizon) instead of O(all keys ever) — the same
    reasoning as the interval join's mandatory bounds. Use the batch
    anti-join (queries/dataflow) for full-history dedup.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


DEDUP_AUDIT_OUTPUT_SCHEMA = (
    "event_id long, first_user_id long, n_seen long, is_first boolean"
)
DEDUP_AUDIT_STATE_SCHEMA = "n_seen long, first_user_id long"


def dedup_audit_per_key(stream: DataFrame, key_col: str = "event_id") -> DataFrame:
    """Deduplication WITH an audit trail: per key, emit the first-seen
    row flagged ``is_first`` and, for every later duplicate, an audit row
    with the running duplicate count — the observability variant the
    native dropDuplicates cannot express (ingest monitors need dup RATES,
    not just survivors). Downstream keeps ``is_first`` rows as the deduped
    stream and aggregates the rest into redelivery metrics.

    State per key is (n_seen, first_user_id) — two longs, no timeout
    (callers that need bounded state compose the watermark variant
    above; this operator's contract is an exact all-time audit).

    Determinism: WITHIN an epoch the key's rows are sorted by user_id
    before counting (Arrow batch order is partition-order-dependent —
    the winner must not change when the source is split differently);
    ACROSS epochs, earlier epochs win by construction (streaming arrival
    order is the semantic, as in the token bucket). A NULL user_id still
    COUNTS as an arrival (the audit contract is exact) under
    NULL_ID_SENTINEL (int64 MIN — the same "no uid" sentinel the empty
    state uses) and sorts FIRST, matching the repo's pinned NULLS FIRST
    window ordering (pandas surfaces NULL as NaN; int(NaN) would
    otherwise crash the whole query, ADVICE r9). The sentinel sits
    outside every plausible id domain (ADVICE r11 retired the old -1,
    which a producer could legitimately emit), so no genuine id can
    alias it and any genuine id sorts after it.
    """

    def update_audit(key, pdfs, state):
        import pandas as pd

        (event_id,) = key
        rows = {"event_id": [], "first_user_id": [], "n_seen": [], "is_first": []}
        n_seen, first_uid = (
            state.get if state.exists else (0, NULL_ID_SENTINEL)
        )
        uids = sorted(
            NULL_ID_SENTINEL if pd.isna(u) else int(u)
            for pdf in pdfs for u in pdf["user_id"]
        )
        for uid in uids:
            n_seen += 1
            if n_seen == 1:
                first_uid = uid
            rows["event_id"].append(int(event_id))
            rows["first_user_id"].append(first_uid)
            rows["n_seen"].append(n_seen)
            rows["is_first"].append(n_seen == 1)
        state.update((n_seen, first_uid))
        yield pd.DataFrame(rows)

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return stream.groupBy(key_col).applyInPandasWithState(
        update_audit,
        outputStructType=DEDUP_AUDIT_OUTPUT_SCHEMA,
        stateStructType=DEDUP_AUDIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_GST.NoTimeout,
    )


TOPK_OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, admitted boolean, "
    "kth_value double, n_seen long"
)
TOPK_STATE_SCHEMA = "values array<double>, ids array<long>, n_seen long"


def topk_per_key_stream(
    stream: DataFrame, k: int = 3, key_col: str = "user_id"
) -> DataFrame:
    """Streaming exact top-k maintenance per key (leaderboard): for each
    arriving (key, event_id, value) row, emit whether it was ADMITTED to
    the key's current top-k (beats the current kth under the board's
    (value DESC, event_id ASC) total order, or the board not yet full)
    and the kth value after processing it — the
    alerting primitive ("new record entered the top 3") that a batch
    top-k (o2_topk_orders / topk_per_group) cannot express incrementally.
    Sibling: streaming/sketches.spacesaving_topk_per_key tracks the most
    FREQUENT items (approximate, count-based); this operator tracks the
    LARGEST values (exact, k-slot).

    Exactness: maintaining a k-slot board under inserts is exact — any
    row in the TRUE final top-k beats everything below the board's kth
    at its arrival time, so it is always admitted (evictions only drop
    rows that k better rows have already beaten). State per key is two
    k-slot arrays + a counter, O(k) — bounded regardless of stream
    length.

    Determinism: WITHIN an epoch a key's rows are processed in
    (ts, event_id) order (Arrow batch order is partition-order-dependent;
    the admitted/kth sequence must not change when the source is split
    differently); ACROSS epochs, arrival order is the semantic, as in
    the token bucket. Ties on value: the board's total order is
    (value DESC, event_id ASC), and admission compares against the kth
    under THAT order — a later arrival tying the kth's value admits iff
    its event_id is smaller, so the final board is exactly the batch
    top-k under the same order (admission by value alone would reject
    tied smaller-id rows the batch ordering includes). NULL values
    never admit (mapped to None before any compare)
    and count only in n_seen. NULL timestamps sort FIRST (the pinned
    NULLS FIRST ordering, via a min-timestamp sentinel — a raw tuple
    sort would leave NaT rows in partition order, silently breaking the
    split invariance); a NULL key's rows process as their own group and
    emit a NULL user_id. A NULL event_id maps to NULL_ID_SENTINEL
    (int64 MIN, the dedup_audit treatment — pandas surfaces it as NaN
    and int(NaN) would kill the query): the row still counts and can
    admit, sorting and tie-breaking before every genuine id; because
    the sentinel makes ids non-unique, the within-epoch sort adds value
    (NULLS FIRST via -inf) as the final key so two NULL-id arrivals
    tying on ts process in a partition-independent order. The sentinel
    sits outside every plausible id domain (ADVICE r11 retired the old
    -1, which a producer could legitimately emit), so a genuine id
    cannot silently share identity with NULL-id rows.
    """

    def update_topk(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        # a NULL key surfaces as None OR NaN depending on the Arrow path
        uid_out = None if pd.isna(user_id) else int(user_id)
        vals, ids, n_seen = (
            state.get if state.exists else ([], [], 0)
        )
        # state arrays arrive as numpy/list — normalize to python lists
        board = sorted(
            zip((float(v) for v in vals), (int(i) for i in ids)),
            key=lambda t: (-t[0], t[1]),
        )
        rows = {
            "user_id": [], "event_id": [], "value": [],
            "admitted": [], "kth_value": [], "n_seen": [],
        }
        arrivals = [
            # a NULL event_id surfaces as NaN; int(NaN) would crash the
            # query (the dedup_audit user_id lesson) — map to the same
            # -1 sentinel: it still counts in n_seen and can admit, and
            # value ties between two NULL-id rows resolve deterministic-
            # ally (equal sentinel ids never beat each other)
            (r.ts, NULL_ID_SENTINEL if pd.isna(r.event_id) else int(r.event_id),
             None if pd.isna(r.value) else float(r.value))
            for pdf in pdfs
            for r in pdf.itertuples(index=False)
        ]
        # sort on (ts NULLS FIRST, event_id, value NULLS FIRST): with the
        # NULL->-1 sentinel event_id is no longer unique, so two NULL-id
        # arrivals tying on ts would otherwise keep Arrow-batch order
        # (partition-order-dependent — the split-invariance breach this
        # sort exists to prevent); value breaks that tie via a -inf
        # sentinel (a raw None in the tuple would TypeError, a raw NaT
        # compares False both ways)
        arrivals.sort(
            key=lambda a: (
                pd.Timestamp.min if pd.isna(a[0]) else a[0],
                a[1],
                float("-inf") if a[2] is None else a[2],
            )
        )
        for _ts, eid, val in arrivals:
            n_seen += 1
            admitted = False
            if val is not None:
                if len(board) < k:
                    board.append((val, eid))
                    admitted = True
                else:
                    kv, ke = board[-1]
                    # beat the kth under the board's (value DESC,
                    # event_id ASC) total order — not value alone
                    if val > kv or (val == kv and eid < ke):
                        board.append((val, eid))
                        admitted = True
                if admitted:
                    board.sort(key=lambda t: (-t[0], t[1]))
                    del board[k:]
            kth = board[-1][0] if len(board) == k else None
            rows["user_id"].append(uid_out)
            rows["event_id"].append(eid)
            rows["value"].append(val)
            rows["admitted"].append(admitted)
            rows["kth_value"].append(kth)
            rows["n_seen"].append(n_seen)
        state.update(
            ([v for v, _ in board], [i for _, i in board], n_seen)
        )
        yield pd.DataFrame(rows)

    return stream.groupBy(key_col).applyInPandasWithState(
        update_topk,
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, event_id long, event_type string, ts timestamp, "
    "stage_after int, advanced boolean, n_seen long"
)
FUNNEL_STATE_SCHEMA = "reached_us array<long>, n_seen long"

#: the batch funnel_conversion stage order (queries/llm4.py)
FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_stage_stream(
    stream: DataFrame,
    stages: tuple = FUNNEL_STAGES,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming strict-order funnel progression per key: for each
    arriving (key, event_id, event_type, ts) row, advance the key's
    funnel iff the event is the NEXT stage in ``stages`` and its ts is
    strictly after the previously reached stage's ts (the batch
    funnel_conversion semantics, queries/llm4.py — greedy in-ts-order
    advancement reaches exactly the same stage as its MIN-per-stage
    CTEs, strict > included), and emit the stage after processing plus
    whether this row advanced it — the "user just converted" alerting
    primitive the batch funnel cannot express incrementally. State per
    key is the reached-stage timestamp list (at most |stages| epoch-
    micros longs) + a counter — O(|stages|), bounded forever.

    Determinism: WITHIN an epoch a key's rows process in
    (ts NULLS FIRST, event_id, event_type NULLS FIRST) order — event_id
    carries the int64-MIN NULL_ID_SENTINEL (the dedup_audit treatment;
    outside every plausible id domain, ADVICE r11) so it is
    not unique, and two NULL-id rows tying on ts must not fall back to
    Arrow batch order (the topk lesson); event_type is the final
    deterministic key (the only remaining varying column). ACROSS
    epochs, arrival order is the semantic. A NULL ts never advances any
    stage (mirrors the batch MIN ignoring NULLs; strict > against it is
    undefined) but still counts in n_seen; a NULL key's rows process as
    their own group and emit a NULL user_id; non-stage event types
    (signup, error) emit advanced = False.
    """
    stage_of = {s: i for i, s in enumerate(stages)}

    def update_funnel(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        uid_out = None if pd.isna(user_id) else int(user_id)
        reached_us, n_seen = state.get if state.exists else ([], 0)
        reached = [int(u) for u in reached_us]
        rows = {
            "user_id": [], "event_id": [], "event_type": [], "ts": [],
            "stage_after": [], "advanced": [], "n_seen": [],
        }
        arrivals = [
            (r.ts, NULL_ID_SENTINEL if pd.isna(r.event_id) else int(r.event_id),
             None if (isinstance(r.event_type, float) and pd.isna(r.event_type))
             or r.event_type is None else str(r.event_type))
            for pdf in pdfs
            for r in pdf.itertuples(index=False)
        ]
        arrivals.sort(
            key=lambda a: (
                pd.Timestamp.min if pd.isna(a[0]) else a[0],
                a[1],
                a[2] is not None,
                a[2] or "",
            )
        )
        for ts, eid, etype in arrivals:
            n_seen += 1
            advanced = False
            nxt = stage_of.get(etype)
            if (
                nxt is not None
                and nxt == len(reached)
                and not pd.isna(ts)
                and (not reached or ts.value // 1000 > reached[-1])
            ):
                reached.append(int(ts.value) // 1000)
                advanced = True
            rows["user_id"].append(uid_out)
            rows["event_id"].append(eid)
            rows["event_type"].append(etype)
            rows["ts"].append(None if pd.isna(ts) else ts)
            rows["stage_after"].append(len(reached))
            rows["advanced"].append(advanced)
            rows["n_seen"].append(n_seen)
        state.update((reached, n_seen))
        yield pd.DataFrame(rows)

    return stream.groupBy(key_col).applyInPandasWithState(
        update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
