"""Shared helpers for the set-scale operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Widen partitioning before a CPU-heavy per-row stage.

    Parquet splits by byte ranges, so a file smaller than
    ``spark.sql.files.maxPartitionBytes`` arrives as ONE partition no
    matter how many cores the cluster has — and an expensive projection
    (minhash, simhash, feature extraction) then runs single-threaded.
    Round-robin repartition ONLY when the scan is narrower than the
    session's default parallelism; at real scale (inputs of many
    row-groups / many files) the input is already wider than the
    threshold, so the big-data path never pays the extra shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
