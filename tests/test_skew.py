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


def test_salted_join(spark):
    from dlx_spark.operators.skew import salted_join
    # hot key 1 dominates the fact side
    fact = spark.createDataFrame(
        [(1, f"row{i}") for i in range(200)] + [(2, "only"), (3, "three")],
        "k long, payload string")
    dim = spark.createDataFrame([(1, "dim1"), (2, "dim2")], "k long, attr string")
    out = salted_join(fact, dim, "k").collect()
    assert len(out) == 201                      # 200 hot + 1; key 3 dropped
    assert all(r.attr == ("dim1" if r.k == 1 else "dim2") for r in out)
    # left join keeps unmatched fact rows
    left = salted_join(fact, dim, "k", how="left").collect()
    assert len(left) == 202
    assert [r.attr for r in left if r.k == 3] == [None]


def test_salted_join_rejects_outer(spark):
    import pytest
    from dlx_spark.operators.skew import salted_join
    fact = spark.createDataFrame([(1, "x")], "k long, payload string")
    dim = spark.createDataFrame([(1, "d")], "k long, attr string")
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")


@pytest.mark.slow
def test_lsh_bucket_cap_star_equivalence(spark):
    """Mega-bucket handling in LSH candidate generation: capped buckets
    emit a min-id star instead of the full m^2/2 expansion.  The star
    must yield EXACTLY the same connected components / survivors as the
    full expansion — only the pair count (the 100 TB cost) shrinks."""
    import random

    from dlx_spark.operators import dedup

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(300)]
    clone = " ".join(rng.sample(vocab, 30))
    rows = [(i, clone) for i in range(1, 61)]             # one mega-cluster
    rows += [(100 + i, " ".join(rng.sample(vocab, 30))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = dedup.minhash_near_duplicates(df, threshold=0.8)
    capped = dedup.minhash_near_duplicates(df, threshold=0.8, bucket_cap=8)
    n_full, n_capped = full.count(), capped.count()
    assert n_full >= 60 * 59 / 2                          # quadratic blow-up
    assert n_capped < n_full / 10                         # star stays linear

    def clusters(pairs):
        return {(r["id"], r["component"], r["is_survivor"])
                for r in dedup.dedup_clusters(pairs).collect()}
    assert clusters(capped) == clusters(full)

    # end-to-end dedup result identical too
    kept_full = sorted(r["doc_id"] for r in dedup.dedup_near(df, full).collect())
    kept_capped = sorted(r["doc_id"] for r in dedup.dedup_near(df, capped).collect())
    assert kept_capped == kept_full
    assert 1 in kept_full and 2 not in kept_full          # min id survives
