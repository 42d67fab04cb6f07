"""Storage-layout tests: bucketed joins must plan WITHOUT a shuffle on
the bucketed sides, and written ANN indexes must prune partitions at
the scan.  These assert the PLAN (the scale property), not just the
result values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dlx_spark.operators import bucketing, similarity


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a writable warehouse; the session fixture already
    # set one up under the test run's tmp dir via derby defaults
    return spark


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange") \
        - plan.count("ReusedExchange")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("b"))
    bucketing.write_bucketed(left, "t_left_bkt", "k", n_buckets=8)
    bucketing.write_bucketed(right, "t_right_bkt", "k", n_buckets=8)
    try:
        l = bucketing.read_table(spark, "t_left_bkt")
        r = bucketing.read_table(spark, "t_right_bkt")
        # keep the join sort-merge so the bucketed layout is what
        # satisfies the distribution (a broadcast would hide it)
        joined = l.hint("merge").join(r, "k")
        assert joined.count() == 10_000
        assert _exchanges(joined) == 0, "bucketed join must not shuffle"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left_bkt")
        spark.sql("DROP TABLE IF EXISTS t_right_bkt")


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join without bucketing shuffles both sides."""
    left = spark.range(0, 10_000).select(F.col("id").alias("k"))
    right = spark.range(0, 10_000).select(F.col("id").alias("k"))
    joined = left.hint("merge").join(right, "k")
    joined.count()
    assert _exchanges(joined) >= 2


def _vectors(spark):
    import math
    rows = []
    for c in range(4):
        for j in range(25):
            v = [0.0] * 8
            v[2 * c] = 1.0
            v[2 * c + 1] = 0.05 + 0.002 * j
            n = math.sqrt(sum(x * x for x in v))
            rows.append((c * 25 + j, [x / n for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_index_prunes_partitions_and_matches_exact(spark, tmp_path):
    vecs = _vectors(spark)
    path = str(tmp_path / "lsh_idx")
    bucketing.write_lsh_index(vecs, path, n_planes=6, dim=8)
    qvec = [r["embedding"] for r in vecs.filter(F.col("vec_id") == 0).collect()][0]

    probed = bucketing.probe_lsh_index(spark, path, qvec, k=5, n_planes=6,
                                       multiprobe_hamming=1)
    # partition pruning: the scan's partition filters mention bucket
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan.replace("\n", " ") or \
           "bucket#" in plan.split("PartitionFilters")[1][:200]
    got = [r["id"] for r in probed.collect()]
    exact = [r["id"] for r in similarity.cosine_topk(vecs, qvec, k=5).collect()]
    assert len(set(got) & set(exact)) >= 4   # clustered data: near-exact


def test_knn_join_lsh_index_matches_onthefly_and_prunes(spark, tmp_path):
    """Batch probe against the written index must equal the on-the-fly
    knn_join at hamming 0 (same planes), and its scan must be pruned by
    dynamic partition pruning from the broadcast probe side."""
    vecs = _vectors(spark)
    path = str(tmp_path / "lsh_idx_b")
    bucketing.write_lsh_index(vecs, path, n_planes=6, dim=8)

    probes = vecs.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding")

    got = bucketing.knn_join_lsh_index(
        spark, path, probes, k=3, n_planes=6, multiprobe_hamming=0, dim=8)
    want = similarity.knn_join(probes, vecs, k=3, n_planes=6, dim=8)
    g = {(r["probe_id"], r["corpus_id"], r["rank"]) for r in got.collect()}
    w = {(r["probe_id"], r["corpus_id"], r["rank"]) for r in want.collect()}
    assert g == w and len(g) > 0

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # multiprobe recall: hamming-1 probe must contain the exact best
    # neighbor for most probes (clustered data)
    got1 = bucketing.knn_join_lsh_index(
        spark, path, probes, k=3, n_planes=6, multiprobe_hamming=1, dim=8)
    hits = 0
    probes_rows = probes.collect()
    for r in probes_rows:
        exact = [x["id"] for x in similarity.cosine_topk(
            vecs, r["embedding"], k=1).collect()]
        mine = [x["corpus_id"] for x in got1.filter(
            F.col("probe_id") == r["vec_id"]).collect()]
        hits += int(exact[0] in mine)
    assert hits >= len(probes_rows) - 1


def test_ivf_index_prunes_partitions_and_matches_exact(spark, tmp_path):
    vecs = _vectors(spark)
    path = str(tmp_path / "ivf_idx")
    cents = similarity.ivf_centroids(vecs, n_centroids=4, seed=7)
    bucketing.write_ivf_index(vecs, path, cents)
    qvec = [r["embedding"] for r in vecs.filter(F.col("vec_id") == 0).collect()][0]

    probed = bucketing.probe_ivf_index(spark, path, cents, qvec, k=5, nprobe=1)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got = [r["id"] for r in probed.collect()]
    exact = [r["id"] for r in similarity.cosine_topk(vecs, qvec, k=5).collect()]
    assert len(set(got) & set(exact)) >= 4
