"""Per-stage checkpoint manifests (SURVEY.md §2.4 A7, north rule
"resumable from checkpoint with per-partition lineage + metrics").

Each stage writes its output parquet under ``workdir/<stage>/data``,
then a ``manifest.json`` with per-partition row counts and a lineage
digest. The manifest is written LAST via write-to-temp + atomic rename
(SURVEY.md §7 hard part 5), so a present manifest ⟹ complete stage
output; resume skips any stage whose manifest exists.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_dir(workdir: str, stage: str) -> str:
    return os.path.join(workdir, stage)


def manifest_path(workdir: str, stage: str) -> str:
    return os.path.join(_stage_dir(workdir, stage), "manifest.json")


def data_path(workdir: str, stage: str) -> str:
    return os.path.join(_stage_dir(workdir, stage), "data")


def stage_metrics(df: DataFrame, lineage_cols: list[str] | None = None) -> dict:
    """Per-partition row counts + an order-insensitive lineage digest
    (xor-free: sum of 60-bit md5 ints mod 2^63 over the lineage columns)."""
    cols = lineage_cols or df.columns
    # 32-bit per-row digest: summing stays < 2^63 for ≤ 2^31 rows per
    # partition (ANSI overflow-safe).
    digest = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])), 1, 8),
        16,
        10,
    ).cast("long")
    per_part = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_digest", digest)
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"), F.sum("_digest").alias("digest_sum"))
        .collect()
    )
    return {
        "row_count": int(sum(r["rows"] for r in per_part)),
        "partitions": [
            {"partition": int(r["_pid"]), "rows": int(r["rows"]), "digest": int(r["digest_sum"])}
            for r in sorted(per_part, key=lambda r: r["_pid"])
        ],
    }


def is_complete(workdir: str, stage: str) -> bool:
    return os.path.exists(manifest_path(workdir, stage))


def write_stage(
    spark: SparkSession,
    workdir: str,
    stage: str,
    df: DataFrame,
    lineage_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Materialize a stage: parquet first, manifest last (atomic rename).
    Returns the re-read DataFrame (reading back truncates lineage — the
    batch analog of a streaming checkpoint)."""
    out = data_path(workdir, stage)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out)
    reread = spark.read.parquet(out)
    meta = {"stage": stage, **stage_metrics(reread, lineage_cols)}
    os.makedirs(_stage_dir(workdir, stage), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_stage_dir(workdir, stage), suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, manifest_path(workdir, stage))  # atomic commit point
    return reread


def run_stage(
    spark: SparkSession,
    workdir: str | None,
    stage: str,
    compute,
    lineage_cols: list[str] | None = None,
) -> DataFrame:
    """Resume-aware stage runner: with a workdir, skip recompute when the
    stage manifest exists; without one, run fully in-memory (bench path)."""
    if workdir is None:
        return compute()
    if is_complete(workdir, stage):
        return spark.read.parquet(data_path(workdir, stage))
    return write_stage(spark, workdir, stage, compute(), lineage_cols)


def read_manifest(workdir: str, stage: str) -> dict:
    with open(manifest_path(workdir, stage)) as fh:
        return json.load(fh)
