"""Write-side helpers: partitioned layouts and compaction.

S7-S9 sink surface (SURVEY.md §2.1) beyond the streaming history table:
how the engine lays out OUTPUT data for 100 TB readers.

- ``write_partitioned``: hive-partitioned parquet (``col=value/`` dirs) —
  downstream readers get partition pruning for free. Choose low-cardinality
  partition columns (date, lang); high-cardinality keys would explode the
  file count.
- ``compact``: rewrite a directory to ~target file count — the maintenance
  pass that fixes small-file accumulation from streaming/appends (the
  batch analog of the reference's retention cleanup, lib.ts:671-692).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write (partition pruning for readers)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; partition columns come back as columns
    and filters on them prune directories before any file I/O."""
    return spark.read.parquet(path)


def compact(spark: SparkSession, path: str, target_files: int, out_path: str) -> None:
    """Coalesce a many-small-files dir into ~target_files larger files.

    Uses coalesce (no shuffle) — partition sizes may be uneven but no
    exchange is paid; use repartition when uniformity matters more than
    the shuffle cost."""
    spark.read.parquet(path).coalesce(target_files).write.mode("overwrite").parquet(out_path)


def compact_to_size(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    order_by: list[str] | None = None,
) -> int:
    """Size-aware compaction: measure the directory's actual bytes
    (Hadoop FS API — works on object stores) and rewrite to
    ``ceil(bytes / target_file_mb)`` files.

    ``order_by`` additionally range-partitions + sorts within partitions
    on those columns — clustering that lets readers' min/max file pruning
    skip files on the sort keys (poor-man's Z-order for one key chain).
    Without it, coalesce avoids the shuffle entirely.

    This is the maintenance pass for streaming sinks: the accumulator's
    history/output dirs accrete one file per epoch; at 100 TB the NameNode
    /object-store listing cost and the per-file open cost dominate reads
    until compaction. Do NOT point it at a live accumulator's staging dir:
    the checkpoint's source log tracks staged files by name, and rewriting
    them would re-admit the data as new offsets (duplicate delivery).

    Returns the number of output files requested.
    """
    import math

    from .. import fsutil

    total = fsutil.content_bytes(spark, path)
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if order_by:
        df = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(*order_by)
    else:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return n_files


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    patch: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> list:
    """MERGE-style upsert that rewrites ONLY the partitions containing
    patched keys (S10 at scale; reference patches single rows in place,
    lib.ts:527-532, 644-648).

    The round-trip alternative — full-outer-join + full table rewrite
    (``s10_state_upsert``) — is correct but rewrites 100 TB to patch a few
    rows. This is the ``replaceWhere`` shape on plain parquet:

      1. affected partitions = distinct ``partition_col`` values in the
         patch (small driver-side list; partitions are low-cardinality by
         layout contract)
      2. read ONLY those partitions (partition pruning: untouched
         partitions pay zero I/O)
      3. upsert within them: anti-join out patched keys, union the patch
      4. dynamic-partition-overwrite commits just the affected
         ``col=value/`` dirs — every other partition's files are untouched
         (byte-identical; asserted in tests/test_sinks.py)

    Contract: ``partition_col`` must be stable under the patch (a patch
    must not move a key to a different partition — same as Delta's
    replaceWhere). The patch must carry the full row schema including the
    partition column. On a transactional format (Delta/Iceberg, jars not
    in this image) steps 2-4 become a real MERGE with file skipping; the
    logical shape is identical.

    Returns the list of affected partition values.
    """
    affected = [r[0] for r in patch.select(partition_col).distinct().collect()]
    # NULL-safe membership: isin() is NULL (never true) for the NULL
    # partition, so its existing rows would be excluded from `cur` while
    # dynamic overwrite still rewrites __HIVE_DEFAULT_PARTITION__ with
    # only the patch rows — silently DELETING every unpatched null-
    # partition row
    non_null = [v for v in affected if v is not None]
    part_in = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if len(non_null) < len(affected):  # patch touches the NULL partition
        part_in = part_in | F.col(partition_col).isNull()
    cur = spark.read.parquet(path).filter(part_in)
    # NULL-SAFE anti-join on the merge keys: a bare column-name join never
    # matches NULL = NULL, so an existing NULL-key row would survive the
    # anti-join AND be re-added by the patch union — a silent duplicate
    # where MERGE semantics require replacement (the same NULL hazard the
    # partition membership above already guards)
    keys = patch.select(*key_cols).distinct()
    cond = None
    for k in key_cols:
        c = cur[k].eqNullSafe(keys[k])
        cond = c if cond is None else (cond & c)
    merged = cur.join(keys, cond, "left_anti").unionByName(patch)
    # break lineage: the write targets the same path the plan reads
    # (Spark rejects self-overwrite); on a cluster use a reliable
    # checkpoint dir or a transactional table format instead
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return affected


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table (``bucketBy`` requires saveAsTable).

    Both sides of a frequent equi-join written with the SAME bucket count
    and key join WITHOUT a shuffle exchange — the pre-shuffled layout is
    the biggest single lever for repeated 100 TB fact-fact joins.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def foreach_partition_push(df: DataFrame, make_handler, batch_size: int = 1000) -> None:
    """Push-style sink: deliver every row to an external consumer with
    partition-level parallelism — the batch form of the reference's
    ``processBatch`` callback dispatch (src/component/lib.ts:576-578,
    1002-1009), where the component hands item arrays to user code.

    ``make_handler()`` runs ON THE EXECUTOR once per partition and must
    return a callable taking a list of Rows (it can open a connection and
    close over it). Rows are delivered in chunks of ``batch_size`` — the
    analog of the reference's flush threshold — so a slow consumer never
    needs the whole partition in memory. ``make_handler`` must be
    picklable by value (define it as a nested/module-level function, no
    SparkSession/DataFrame captures).

    At scale this is the right shape for side-effect sinks (HTTP, queues,
    key-value stores): one connection per partition, bounded chunk
    buffers, and Spark task retries give at-least-once delivery per
    partition — consumers must be idempotent, exactly like the
    reference's at-least-once flush contract (lib.ts:694-710).
    """
    size = batch_size

    def run(it):
        handler = make_handler()
        buf = []
        for row in it:
            buf.append(row)
            if len(buf) >= size:
                handler(buf)
                buf = []
        if buf:
            handler(buf)

    df.foreachPartition(run)


# --- Z-order (Morton) layout -------------------------------------------------


def morton_interleave(xn, yn, bits: int = 8):
    """Morton (Z-order) code of two NORMALIZED non-negative int columns in
    [0, 2^bits): bit i of x lands at position 2i+1, bit i of y at 2i.
    Pure integer shifts/masks — exact and engine-portable.

    Z-ordering is the multi-column clustering trick (Delta OPTIMIZE
    ZORDER BY, Hudi, Iceberg sort orders): sorting by the interleaved code
    gives every contiguous file range a BOUNDED span in BOTH dimensions,
    so min/max file stats prune on either predicate — a plain sort only
    prunes its leading column."""
    xn = F.col(xn) if isinstance(xn, str) else xn
    yn = F.col(yn) if isinstance(yn, str) else yn
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = (
            code
            + F.shiftleft(F.shiftright(xn.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(yn.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return code


def morton_interleave_sql(x: str, y: str, bits: int = 8) -> str:
    """The same Morton code as DuckDB-SQL text (oracle twin of
    :func:`morton_interleave`)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_min: int,
    x_max: int,
    y_min: int,
    y_max: int,
    bits: int = 8,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Morton code of two columns: each
    dimension is min-max normalized to [0, 2^bits) with exact integer
    arithmetic, codes are range-partitioned (repartitionByRange = sample
    + range split, no global sort of rows within files needed for file
    stats) and sorted within partitions so parquet row-group stats are
    tight in BOTH dimensions.

    Pass the min/max bounds explicitly (from a prior 1-row agg or table
    stats) — computing them inline would add a scan; at 100 TB bounds
    come from the catalog."""
    span_x = max(x_max - x_min, 1)
    span_y = max(y_max - y_min, 1)
    top = (1 << bits) - 1
    # integer `div`, not double division + floor: beyond 2^53 the
    # long->double conversion drops low bits, and even below it a
    # correctly-rounded quotient can round UP across an integer boundary
    # where true floor-division would not (matches zorder_layout_stats)
    xn = F.expr(f"((CAST({x_col} AS BIGINT) - {x_min}) * {top}) div {span_x}")
    yn = F.expr(f"((CAST({y_col} AS BIGINT) - {y_min}) * {top}) div {span_y}")
    code = morton_interleave(xn, yn, bits).alias("_z")
    (
        df.select("*", code)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
