"""Table iterator — chunked cursor-driven scans with a job state machine
(SURVEY.md §2.9 D10-D14; reference src/component/lib.ts:736-1132).

Reference semantics: start a job that repeatedly pulls a page via a user
``getNextBatch`` callback, hands it to ``processBatch``, persists cursor +
processedCount, rate-limits between chunks, retries failures with capped
exponential backoff (min(1000·2^n, 30000) ms, lib.ts:1059), honors
pause/resume/cancel between chunks, and fires ``onComplete`` at the end.

Spark design:
- **Cursor = ordered key range**, not an opaque token (Convex cursors are
  not reproducible; a sorted unique key is). A chunk is
  ``WHERE key > cursor ORDER BY key LIMIT n`` — with sorted/partitioned
  parquet this prunes to the row groups past the cursor (min/max stats), so
  chunk cost does not grow with table size. At 100 TB you'd additionally
  precompute range boundaries once (approxQuantile) instead of per-chunk
  TakeOrdered; both forms below.
- **Job state** lives in a JSON file per job (atomic rename) — the control
  plane is driver-side metadata exactly like streaming checkpoints; the
  data path stays fully distributed (the callback receives the chunk
  DataFrame, which it may write/aggregate cluster-wide; collecting is the
  callback's choice, mirroring the reference handing items arrays).
- **processBatch / getNextBatch / onComplete** are registry handle NAMES
  stored in the job state (function-handles-as-data, schema.ts:50-55).

The loop is cooperative: ``run(max_chunks=...)`` executes chunks until
done/paused/failed, so tests drive it deterministically without threads.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sources.registry import HandleRegistry, default_registry

STATUSES = ("pending", "running", "paused", "completed", "failed")


def backoff_ms(retry_count: int) -> int:
    """Capped exponential backoff: min(1000·2^n, 30000) (lib.ts:1050-1060).

    ``n`` is the post-increment retry count, starting at 1 — the first
    retry sleeps 2000 ms, matching the reference's ``newRetryCount``."""
    return int(min(1000 * math.pow(2, retry_count), 30000))


@dataclass
class IteratorJobState:
    """Persisted job row ≈ iteratorJobs table (schema.ts:37-62)."""

    job_id: str
    cursor: Any = None  # last processed key (exclusive lower bound)
    processed_count: int = 0
    status: str = "pending"
    retry_count: int = 0
    error_message: str | None = None
    created_at: float = field(default_factory=time.time)
    last_run_at: float | None = None
    # config (schema.ts:48-56)
    batch_size: int = 100
    delay_between_batches_s: float = 0.1  # default 100 ms (lib.ts:767)
    max_retries: int = 5  # default (lib.ts:983)
    process_batch: str = ""  # handle name
    on_complete: str | None = None  # handle name
    # precomputed key-range boundaries (the 100 TB cursor plan); when set,
    # cursor is an INDEX into these ranges instead of a key value
    range_bounds: list | None = None

    def to_dict(self) -> dict:
        d = self.__dict__.copy()
        d["cursor"] = _encode_key(d["cursor"])
        if d["range_bounds"] is not None:
            d["range_bounds"] = [_encode_key(v) for v in d["range_bounds"]]
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "IteratorJobState":
        obj = cls(job_id=d["job_id"])
        obj.__dict__.update(d)
        obj.cursor = _decode_key(obj.cursor)
        if obj.range_bounds is not None:
            obj.range_bounds = [_decode_key(v) for v in obj.range_bounds]
        return obj


def _encode_key(v):
    """JSON-safe tagged encoding for cursor/bound key values: the cursor
    is whatever Python value ``collect()`` returned for the key column
    (datetime for timestamp keys, Decimal for decimal keys, bytes for
    binary), and ``json.dump`` rejects all three — without this a
    timestamp-keyed job crashes on its FIRST progress save, AFTER the
    handle ran, and replays the chunk forever."""
    import base64
    import datetime as _dt
    import decimal as _dec

    if isinstance(v, _dt.datetime):
        return {"__key__": "datetime", "v": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"__key__": "date", "v": v.isoformat()}
    if isinstance(v, _dec.Decimal):
        return {"__key__": "decimal", "v": str(v)}
    if isinstance(v, (bytes, bytearray)):
        return {"__key__": "bytes", "v": base64.b64encode(bytes(v)).decode("ascii")}
    return v


def _decode_key(v):
    import base64
    import datetime as _dt
    import decimal as _dec

    if not (isinstance(v, dict) and "__key__" in v):
        return v
    kind, raw = v["__key__"], v["v"]
    if kind == "datetime":
        return _dt.datetime.fromisoformat(raw)
    if kind == "date":
        return _dt.date.fromisoformat(raw)
    if kind == "decimal":
        return _dec.Decimal(raw)
    if kind == "bytes":
        return base64.b64decode(raw)
    raise ValueError(f"unknown cursor encoding {kind!r}")


class JobStore:
    """Atomic JSON-file-per-job state store (the iteratorJobs table).

    Driver-local by design: job state is single-writer driver control
    state (the reference keeps it in its transactional store,
    lib.ts:898-945). On a cluster, point state_dir at a driver-attached
    volume; the data-plane (chunks, handles) never touches it."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, job_id: str) -> str:
        return os.path.join(self.state_dir, f"{job_id}.json")

    def exists(self, job_id: str) -> bool:
        return os.path.exists(self._path(job_id))

    def save(self, state: IteratorJobState) -> None:
        tmp = self._path(state.job_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state.to_dict(), f)
        os.replace(tmp, self._path(state.job_id))  # atomic: readers never see partial writes

    def load(self, job_id: str) -> IteratorJobState:
        with open(self._path(job_id)) as f:
            return IteratorJobState.from_dict(json.load(f))

    def delete(self, job_id: str) -> bool:
        """deleteIteratorJob (lib.ts:927-945): only terminal jobs."""
        if not self.exists(job_id):
            return False
        st = self.load(job_id)
        if st.status not in ("completed", "failed"):
            raise ValueError(f"cannot delete job in status {st.status!r}")
        os.remove(self._path(job_id))
        return True

    def list(self, status: str | None = None) -> list[IteratorJobState]:
        """listIteratorJobs (lib.ts:898-925): optional status filter."""
        out = []
        for fn in sorted(os.listdir(self.state_dir)):
            if fn.endswith(".json"):
                st = self.load(fn[:-5])
                if status is None or st.status == status:
                    out.append(st)
        return out


class TableIterator:
    """Drives chunked iteration over an ordered DataFrame with the
    reference's job lifecycle (start/pause/resume/cancel/status/run)."""

    def __init__(
        self,
        state_dir: str,
        source: DataFrame,
        key_col: str,
        registry: HandleRegistry | None = None,
        sleep_fn=time.sleep,  # injectable: tests pass a recorder, no wall-clock
    ):
        self.store = JobStore(state_dir)
        self.source = source
        self.key_col = key_col
        self.registry = registry or default_registry
        self.sleep_fn = sleep_fn

    # --- lifecycle mutations (lib.ts:736-945) -------------------------------

    def start(
        self,
        job_id: str,
        process_batch: str,
        batch_size: int = 100,
        delay_between_batches_s: float = 0.1,
        max_retries: int = 5,
        on_complete: str | None = None,
        plan_ranges: bool | None = None,
        num_chunks: int | None = None,
        validate_key: bool | str = True,
        validate_sample_fraction: float = 0.01,
    ) -> IteratorJobState:
        """startIteratorJob (lib.ts:736-782): duplicate-id reject + insert
        running job.

        ``plan_ranges`` is the 100 TB cursor strategy: compute chunk
        boundaries ONCE via approxQuantile (one cheap sampling pass), then
        every chunk is a pure range filter — row-group pruning on a sorted
        layout, no per-chunk TakeOrdered over the remainder of the table.
        Default ``None`` auto-enables it when the key column is numeric
        (approxQuantile's requirement); pass ``False`` to force the
        orderBy+limit cursor pager, which re-sorts the tail every chunk —
        fine at test scale, O(n·chunks) at cluster scale.

        ``validate_key`` guards the two properties that silently lose rows
        when violated — scoped to what each cursor strategy actually needs:

        - NULL keys are load-bearing in BOTH modes (a NULL never matches a
          range/page predicate; ``F.max`` ignores it, stalling the cursor).
          The check is ``count(1) vs count(key)`` — one map-side aggregate,
          no shuffle of data rows. Always run unless ``validate_key=False``.
        - Key UNIQUENESS only matters in cursor mode: the strict
          ``key > cursor`` page predicate skips duplicates that straddle a
          chunk boundary. Planned-range mode partitions the key space with
          inclusive bounds, so every duplicate lands in exactly one range —
          no check needed, which is why the default (planned) path costs no
          uniqueness pass at any scale. When cursor mode IS requested:
          ``validate_key=True`` runs an exact duplicate probe
          (``groupBy(key).count() > 1 LIMIT 1`` — partial aggregation means
          the shuffle carries one row per DISTINCT key, not an Expand of
          the table like ``countDistinct`` alongside ``count`` would);
          ``validate_key="sample"`` probes a ~1 % sample instead (cheap,
          but only catches heavily-duplicated keys — a clean sample proves
          little; use for very large cursor-mode sources where the exact
          probe is unwanted); ``validate_key=False`` skips (documented
          unique key, caller's responsibility).
        """
        if self.store.exists(job_id):
            raise ValueError(f"Iterator job with ID '{job_id}' already exists")
        if plan_ranges is None:
            ktype = self.source.schema[self.key_col].dataType.simpleString()
            plan_ranges = ktype in (
                "tinyint", "smallint", "int", "bigint", "float", "double"
            ) or ktype.startswith("decimal")
        key = F.col(self.key_col)
        n = None
        if validate_key:
            stats = self.source.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(key).alias("n_nonnull"),
            ).collect()[0]
            if stats["n_nonnull"] != stats["n"]:
                raise ValueError(
                    f"key column {self.key_col!r} has "
                    f"{stats['n'] - stats['n_nonnull']} NULLs — a NULL key can "
                    "never be paged past (cursor would stall); clean or choose "
                    "another key"
                )
            n = stats["n"]
            if not plan_ranges:
                probe = self.source.select(key.alias("k"))
                if validate_key == "sample":
                    probe = probe.sample(fraction=validate_sample_fraction, seed=7)
                dup = (
                    probe.groupBy("k")
                    .count()
                    .filter(F.col("count") > 1)
                    .limit(1)
                    .collect()
                )
                if dup:
                    raise ValueError(
                        f"key column {self.key_col!r} is not unique (e.g. key "
                        f"{dup[0]['k']!r} appears {dup[0]['count']} times) — a "
                        "duplicate key on a chunk boundary would be skipped by "
                        "the strict cursor predicate; use plan_ranges=True or "
                        "a unique key"
                    )
        bounds = None
        if plan_ranges:
            if num_chunks is None:
                if n is None:
                    n = self.source.count()
                num_chunks = max(1, -(-n // batch_size))
            probs = [i / num_chunks for i in range(1, num_chunks)]
            bounds = (
                self.source.stat.approxQuantile(self.key_col, probs, 0.001)
                if probs
                else []
            )
        st = IteratorJobState(
            job_id=job_id,
            status="running",
            cursor=0 if bounds is not None else None,
            batch_size=batch_size,
            delay_between_batches_s=delay_between_batches_s,
            max_retries=max_retries,
            process_batch=process_batch,
            on_complete=on_complete,
            range_bounds=bounds,
        )
        self.store.save(st)
        return st

    def _guarded_transition(self, job_id: str, expect: str, to: str, **patch) -> IteratorJobState:
        st = self.store.load(job_id)
        if st.status != expect:
            raise ValueError(f"job {job_id!r} is {st.status!r}, expected {expect!r}")
        st.status = to
        st.__dict__.update(patch)
        self.store.save(st)
        return st

    def pause(self, job_id: str) -> IteratorJobState:
        """pauseIterator (lib.ts:784-806): running → paused; takes effect at
        the next chunk boundary (cooperative, like the status guard at
        lib.ts:978-981)."""
        return self._guarded_transition(job_id, "running", "paused")

    def resume(self, job_id: str) -> IteratorJobState:
        """resumeIterator (lib.ts:808-833): paused → running, retry reset."""
        return self._guarded_transition(job_id, "paused", "running", retry_count=0)

    def cancel(self, job_id: str) -> IteratorJobState:
        """cancelIterator (lib.ts:835-858): mark failed 'Cancelled by user'."""
        st = self.store.load(job_id)
        if st.status not in ("running", "paused", "pending"):
            raise ValueError(f"cannot cancel job in status {st.status!r}")
        st.status = "failed"
        st.error_message = "Cancelled by user"
        self.store.save(st)
        return st

    def status(self, job_id: str) -> dict:
        """getIteratorStatus (lib.ts:860-896) projection."""
        st = self.store.load(job_id)
        return {
            "job_id": st.job_id,
            "status": st.status,
            "processed_count": st.processed_count,
            "cursor": st.cursor,
            "retry_count": st.retry_count,
            "error_message": st.error_message,
        }

    # --- the chunk loop (processNextBatch, lib.ts:968-1071) -----------------

    def _next_chunk(self, st: IteratorJobState) -> DataFrame:
        """getNextBatch default impl.

        Planned mode: cursor is a range index into the precomputed bounds —
        chunk = pure range filter (scan-prunable, no sort).
        Cursor mode: ordered key page past the cursor value — the filter
        pushes to the scan; orderBy+limit compiles to TakeOrderedAndProject.

        NULL keys are excluded in both modes (they cannot be paged past —
        ``key > cursor`` is never true and F.max skips them, stalling the
        cursor); ``start(validate_key=True)`` rejects them up front.
        """
        key = F.col(self.key_col)
        df = self.source.filter(key.isNotNull())
        if st.range_bounds is not None:
            idx = int(st.cursor or 0)
            bounds = st.range_bounds
            if idx > 0:
                df = df.filter(key > F.lit(bounds[idx - 1]))
            if idx < len(bounds):
                df = df.filter(key <= F.lit(bounds[idx]))
            return df
        if st.cursor is not None:
            df = df.filter(key > F.lit(st.cursor))
        return df.orderBy(key.asc()).limit(st.batch_size)

    def run(self, job_id: str, max_chunks: int | None = None) -> IteratorJobState:
        """Drive the job until completed/paused/failed (or max_chunks).

        Each iteration re-reads state (cooperative pause/cancel), processes
        one chunk through the registered handle, persists progress, sleeps
        the rate-limit delay, and applies capped-backoff retry on errors.
        """
        first = self.store.load(job_id)
        if first.status == "running":
            # fail fast on config errors: a typo'd handle name is not a
            # transient failure worth the backoff ladder (same pattern as
            # accumulator.flush_now)
            self.registry.resolve(first.process_batch)
            if first.on_complete:
                self.registry.resolve(first.on_complete)
        chunks = 0
        while max_chunks is None or chunks < max_chunks:
            st = self.store.load(job_id)
            if st.status != "running":  # pause/cancel guard (lib.ts:978-981)
                return st
            planned = st.range_bounds is not None
            if planned and int(st.cursor or 0) > len(st.range_bounds):
                return self._complete(st)
            # persist: the progress aggregate and the user handle both
            # consume the chunk — without caching, each would re-execute the
            # pager (two TakeOrdered scans of the remaining table per chunk)
            chunk = self._next_chunk(st).persist()
            try:
                rows = chunk.select(F.max(self.key_col).alias("mx"),
                                    F.count(F.lit(1)).alias("n")).collect()[0]
                n, max_key = rows["n"], rows["mx"]
                if n == 0 and not planned:
                    return self._complete(st)
                handle = self.registry.resolve(st.process_batch)
                if n > 0:
                    handle(chunk, st.cursor)
            except Exception as e:  # noqa: BLE001 — retry path (lib.ts:1046-1069)
                st = self.store.load(job_id)
                if st.status != "running":
                    # a pause/cancel that landed mid-chunk OWNS the status and
                    # its error_message — the failure path must honor the
                    # transition exactly like the success path below (never
                    # flip a paused job to 'failed' or scrub 'Cancelled by
                    # user' with the in-flight handle's exception)
                    return st
                st.retry_count += 1
                if st.retry_count >= st.max_retries:
                    st.status = "failed"
                    st.error_message = f"{type(e).__name__}: {e}"
                    self.store.save(st)
                    return st
                st.error_message = f"{type(e).__name__}: {e}"
                self.store.save(st)
                # post-increment count, matching newRetryCount in lib.ts:1050:
                # first retry sleeps 2000 ms
                self.sleep_fn(backoff_ms(st.retry_count) / 1000.0)
                chunks += 1
                continue
            finally:
                chunk.unpersist()
            # success: persist cursor/progress, reset retries (lib.ts:1073-1087)
            st = self.store.load(job_id)
            if planned:
                st.cursor = int(st.cursor or 0) + 1
            else:
                st.cursor = max_key
            st.processed_count += n
            if st.status == "running":
                # a cancel/pause that landed mid-chunk owns the status AND
                # its error_message ("Cancelled by user") — record the
                # chunk's real progress but never scrub the transition
                st.retry_count = 0
                st.error_message = None
            st.last_run_at = time.time()
            self.store.save(st)
            chunks += 1
            if planned:
                if st.cursor > len(st.range_bounds):
                    return self._complete(self.store.load(job_id))
            elif n < st.batch_size:
                return self._complete(self.store.load(job_id))
            self.sleep_fn(st.delay_between_batches_s)  # rate limit (lib.ts:1039-1043)
        return self.store.load(job_id)

    def _complete(self, st: IteratorJobState) -> IteratorJobState:
        """markJobCompleted + onComplete dispatch (lib.ts:1011-1031).

        Re-reads state first: a cooperative pause/cancel landing while the
        FINAL chunk was processing must win — completing over it would
        silently revert the user's transition and fire on_complete for a
        job they cancelled (the reference's status guard, lib.ts:978-981,
        applies to the completion transition too)."""
        st = self.store.load(st.job_id)
        if st.status != "running":
            return st
        st.status = "completed"
        self.store.save(st)
        if st.on_complete:
            try:
                self.registry.resolve(st.on_complete)(st.job_id, st.processed_count)
            except Exception as e:  # noqa: BLE001
                # the completion callback failed AFTER status was saved: left
                # alone, the signal is lost at-most-once (later runs see
                # 'completed' and never re-fire). Step back to 'running' with
                # the error recorded so the next run() re-enters _complete
                # and re-fires the handle — at-least-once, mirroring the
                # n==0 path where the same raise becomes a retry; bounded by
                # max_retries like any other handle failure.
                st = self.store.load(st.job_id)
                st.error_message = f"{type(e).__name__}: {e}"
                st.retry_count += 1
                st.status = (
                    "failed" if st.retry_count >= st.max_retries else "running"
                )
                self.store.save(st)
        return st
