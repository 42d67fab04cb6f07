"""Salted-aggregation correctness: results equal the unsalted forms on
skewed data (one hot key dominating)."""

import pytest
from pyspark.sql import functions as F

from dlx_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' has 10k rows; 10 cold keys have 10 each
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 500).cast("string").alias("v"))
    cold = spark.range(100).select(
        F.concat(F.lit("cold"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").cast("string").alias("v"))
    return hot.unionAll(cold).repartition(8).cache()


def test_salted_group_count(spark, skewed):
    expected = {r["k"]: r["n"] for r in
                skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["k"]: r["n"] for r in skew.salted_group_count(skewed, "k").collect()}
    assert got == expected
    assert got["hot"] == 10_000


def test_salted_count_distinct(spark, skewed):
    expected = {r["k"]: r["n"] for r in
                skewed.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    got = {r["k"]: r["n_distinct"] for r in
           skew.salted_count_distinct(skewed, "k", "v").collect()}
    assert got == expected
    assert got["hot"] == 500


def test_salted_collect_set(spark, skewed):
    got = {r["k"]: sorted(r["values"]) for r in
           skew.salted_collect_set(skewed, "k", "v").collect()}
    expected = {r["k"]: sorted(r["vs"]) for r in
                skewed.groupBy("k").agg(F.collect_set("v").alias("vs")).collect()}
    assert got == expected
