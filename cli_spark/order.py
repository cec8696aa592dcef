"""Deterministic global row numbering at scale (SURVEY.md §4 custom
machinery #3).

``row_number() OVER (ORDER BY ...)`` collapses to a single task — fine
for oracle-sized data, fatal at 100 TB. This helper computes the same
deterministic rank with the partition-offset technique:

    repartitionByRange(keys) → sortWithinPartitions(keys)
    → per-partition counts → cumulative offsets (driver-side, tiny)
    → rn = offset[pid] + local_index + 1

Determinism: rn(key) = |{k : k < key}| + 1 depends only on the total
order of the (unique) keys, not on where range boundaries land, so the
result is stable even though RangePartitioner samples boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def global_row_number(
    df: DataFrame, keys: list[str], rn_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Adds a deterministic 1-based global rank column ordered by `keys`
    (which must be unique per row). Two narrow passes, no global sort."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(k) for k in keys]
    )
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    # local index within partition (window partitioned by pid — parallel)
    wloc = W.partitionBy("_pid").orderBy(*[F.col(k) for k in keys])
    # persist: the counts job and the final plan must see the SAME pid
    # assignment (RangePartitioner samples boundaries per job otherwise)
    local = with_pid.withColumn("_lidx", F.row_number().over(wloc)).persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    mapping = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    # NOTE: `local` must stay persisted for the life of the returned
    # plan — NOT auto-released on GC. The offsets collected above are
    # baked into the plan; repartitionByRange + spark_partition_id
    # re-sample boundaries on recompute, so an unpersist-then-recompute
    # silently pairs new pids with stale offsets (wrong ranks).
    return (
        local.withColumn(rn_col, mapping[F.col("_pid")] + F.col("_lidx"))
        .drop("_pid", "_lidx")
    )


def global_prefix_sum(
    df: DataFrame,
    keys: list[str],
    val_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds a running total of ``val_col`` over the global order given by
    ``keys`` (unique per row) — the distributed replacement for
    ``SUM(v) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)``, which
    collapses to one task. Same partition-offset technique as
    :func:`global_row_number`: per-partition local cumsum + driver-side
    per-partition totals (tiny) → offset map."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(k) for k in keys]
    )
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    wloc = (
        W.partitionBy("_pid")
        .orderBy(*[F.col(k) for k in keys])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = with_pid.withColumn(
        "_lcum", F.sum(F.col(val_col).cast("long")).over(wloc)
    ).persist()
    totals = {
        r["_pid"]: r["tot"]
        for r in local.groupBy("_pid")
        .agg(F.sum(F.col(val_col).cast("long")).alias("tot"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    # same pinning contract as global_row_number: offsets are baked into
    # the plan against THIS pid assignment — never auto-release `local`
    return (
        local.withColumn(out_col, mapping[F.col("_pid")] + F.col("_lcum"))
        .drop("_pid", "_lcum")
    )
