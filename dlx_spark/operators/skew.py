"""Skew-handling aggregation patterns.

AQE's skew-join splitting handles joins automatically (enabled in
``session.py``), but heavily-skewed AGGREGATIONS with expensive
per-group state (collect_set, exact distinct) still bottleneck on the
hot key's single reducer.  The two-stage salted pattern here spreads a
hot key over ``n_salts`` partial groups and merges — the classic remedy,
expressed declaratively so Catalyst still sees ordinary aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_group_count(df: DataFrame, key: str, n_salts: int = 32) -> DataFrame:
    """count(*) per key, skew-safe: stage 1 groups by (key, salt) with
    map-side combine; stage 2 merges the ≤ n_salts partials per key.
    Output: (key, n)."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").cast("long").alias("n"))


def salted_count_distinct(df: DataFrame, key: str, value: str,
                          n_salts: int = 32) -> DataFrame:
    """exact count(DISTINCT value) per key without routing every row of
    a hot key to one reducer: stage 1 dedups (key, salt-of-value, value)
    locally, stage 2 dedups (key, value), stage 3 counts.
    Output: (key, n_distinct)."""
    salted = df.select(key, F.col(value).alias("_v"),
                       F.pmod(F.hash(F.col(value)), F.lit(n_salts)).alias("_salt"))
    stage1 = salted.dropDuplicates([key, "_salt", "_v"])
    stage2 = stage1.dropDuplicates([key, "_v"])
    return stage2.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))


def salted_collect_set(df: DataFrame, key: str, value: str,
                       n_salts: int = 16) -> DataFrame:
    """collect_set(value) per key via per-salt partial sets merged with
    array_distinct(flatten(...)) — bounds any single task's state.
    Output: (key, values)."""
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(value)), F.lit(n_salts)))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.collect_set(value).alias("_vs")))
    return (partial.groupBy(key)
            .agg(F.array_distinct(F.flatten(F.collect_list("_vs"))).alias("values")))
