"""Recall-quality gates for the PRUNED approximate-ANN paths.

The driver oracle now hash-checks the exhaustive paths (lsh_topk's
bucketing via plane literals, ivf_topk_exhaustive at nprobe=n, the full
minhash/simhash pipelines).  What it cannot check is that the pruned
configurations stay USEFUL — on clustered data, pruning must keep most
of the true neighbors.  The driver's synthetic embeddings are near-
uniform random (LSH's adversarial worst case, recall is meaningless
there), so these tests plant deterministic clusters and assert recall
bounds against the exact brute force.
"""

from __future__ import annotations

import math

import pytest

from dlx_spark.operators import similarity, textstats


N_CLUSTERS = 5
PER_CLUSTER = 40
DIM = 16


def _clustered_vectors():
    """Deterministic clustered embeddings: cluster c's center is axis
    pair (2c, 2c+1); members are small fixed perturbations, so same-
    cluster cosine ~0.99 and cross-cluster ~0."""
    rows = []
    for c in range(N_CLUSTERS):
        for j in range(PER_CLUSTER):
            v = [0.0] * DIM
            v[(2 * c) % DIM] = 1.0
            v[(2 * c + 1) % DIM] = 0.05 + 0.002 * j   # deterministic jitter
            v[(2 * c + 3) % DIM] += 0.001 * ((j * 7) % 11)
            n = math.sqrt(sum(x * x for x in v))
            rows.append((c * PER_CLUSTER + j, [x / n for x in v], c))
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    return spark.createDataFrame(
        _clustered_vectors(), "vec_id long, embedding array<double>, label int")


def _query_vec():
    return _clustered_vectors()[0][1]          # member of cluster 0


def _exact_ids(clustered, k=10):
    return [r["id"] for r in
            similarity.cosine_topk(clustered, _query_vec(), k=k).collect()]


def test_lsh_topk_recall_on_clusters(clustered):
    exact = set(_exact_ids(clustered))
    got = {r["id"] for r in similarity.lsh_topk(
        clustered, _query_vec(), k=10, n_planes=8, multiprobe_hamming=1).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"lsh_topk recall {recall} on clustered data"


def test_ivf_topk_pruned_recall_on_clusters(clustered):
    exact = set(_exact_ids(clustered))
    got = {r["id"] for r in similarity.ivf_topk(
        clustered, _query_vec(), k=10, n_centroids=N_CLUSTERS, nprobe=2).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"ivf_topk (nprobe=2) recall {recall} on clustered data"


def test_knn_join_recall_on_clusters(spark, clustered):
    from pyspark.sql import Window, functions as F

    probes = clustered.filter(F.col("vec_id") < 10)
    got = {(r["probe_id"], r["corpus_id"]) for r in
           similarity.knn_join(probes, clustered, k=3, n_planes=4).collect()}

    l = probes.select(F.col("vec_id").alias("p"), F.col("embedding").alias("pv"))
    r_ = clustered.select(F.col("vec_id").alias("c"), F.col("embedding").alias("cv"))
    dot = ("aggregate(zip_with(pv, cv, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
           " (a, v) -> a + v)")
    j = (l.crossJoin(r_).filter(F.col("p") != F.col("c"))
         .withColumn("cos", F.expr(dot)))     # unit vectors: dot == cosine
    w = Window.partitionBy("p").orderBy(F.desc("cos"), F.asc("c"))
    exact = {(r["p"], r["c"]) for r in
             j.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= 3).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"knn_join recall {recall} on clustered data"


def test_winnowing_density_guarantee(spark):
    """Winnowing property: one fingerprint per window position means the
    sketch can never be empty and is bounded by the number of windows;
    identical texts must sketch identically (md5 hashing is seedless)."""
    text = " ".join(f"tok{i % 13}x{(i * 5) % 7}" for i in range(200))
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    rows = {r["id"]: list(r["fingerprint"])
            for r in textstats.fingerprint(df, window=8).collect()}
    assert rows[1] == rows[2]
    n_windows = 200 - 8 + 1
    assert 1 <= len(rows[1]) <= n_windows
    # density: winnowing with window w keeps ~2/(w+1) of positions;
    # dedup can only shrink it further — sanity-bound it loosely
    assert len(rows[1]) <= n_windows // 2


def test_ivf_drift_and_refresh_cycle(spark, tmp_path):
    """IVF index maintenance: vectors APPENDED with stale centroids
    (fast ingest) quantize a drifted distribution badly; a
    ``refresh_ivf_index`` retrain-and-rewrite restores pruned-probe
    recall, and a crash mid-swap is repaired by ``recover_ivf_index``."""
    from dlx_spark import fsio
    from dlx_spark.operators import bucketing

    rows = _clustered_vectors()
    initial = spark.createDataFrame(
        [r for r in rows if r[2] < 3],
        "vec_id long, embedding array<double>, label int")
    drifted = spark.createDataFrame(
        [r for r in rows if r[2] >= 3],
        "vec_id long, embedding array<double>, label int")
    combined = initial.unionByName(drifted)

    path = str(tmp_path / "ivf_idx")
    cents0 = similarity.ivf_centroids(initial, n_centroids=3, seed=7)
    bucketing.write_ivf_index(initial, path, cents0)
    # drift: clusters 3-4 arrive and are appended under the OLD quantizer
    bucketing.append_ivf_index(drifted, path, cents0)
    assert spark.read.parquet(path).count() == combined.count()

    q = rows[4 * PER_CLUSTER][1]               # member of drifted cluster 4
    exact = {r["id"] for r in
             similarity.cosine_topk(combined, q, k=10).collect()}

    # refresh: retrain on the current contents, one list per cluster
    cents1 = bucketing.refresh_ivf_index(spark, path, n_centroids=5, seed=7)
    got = {r["id"] for r in bucketing.probe_ivf_index(
        spark, path, cents1, q, k=10, nprobe=1).collect()}
    assert len(got & exact) / len(exact) >= 0.9
    # nothing lost in the rewrite
    assert spark.read.parquet(path).count() == combined.count()

    # crash window: live deleted, stage not yet renamed — recover
    # publishes the stage and probes see the full index again
    fsio.rename(spark, path, path + "__refresh", overwrite=True)
    bucketing.recover_ivf_index(spark, path)
    assert spark.read.parquet(path).count() == combined.count()
    got2 = {r["id"] for r in bucketing.probe_ivf_index(
        spark, path, cents1, q, k=10, nprobe=1).collect()}
    assert got2 == got
    # stale-stage variant: both present -> stage dropped, live intact
    (spark.read.parquet(path).limit(5).write.mode("overwrite")
     .parquet(path + "__refresh"))
    bucketing.recover_ivf_index(spark, path)
    assert not fsio.exists(spark, path + "__refresh")
    assert spark.read.parquet(path).count() == combined.count()


def test_cosine_near_duplicates_recall_on_clusters(clustered):
    """The LSH-blocked embedding pair operator vs exact all-pairs brute
    force: precision is exact by construction (every emitted pair is
    cosine-verified); recall on clustered data must stay high, and
    multiprobe must only widen it."""
    from pyspark.sql import functions as F

    got = similarity.cosine_near_duplicates(clustered, threshold=0.9,
                                            n_planes=6, dim=DIM)
    rows = got.collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert all(r["cosine"] >= 0.9 for r in rows)

    l = clustered.select(F.col("vec_id").alias("id_a"),
                         F.col("embedding").alias("pvec"))
    r = clustered.select(F.col("vec_id").alias("id_b"),
                         F.col("embedding").alias("cvec"))
    exact = {(x["id_a"], x["id_b"]) for x in
             (l.crossJoin(r).filter(F.col("id_a") < F.col("id_b"))
              .withColumn("cosine", similarity.pairwise_cosine_expr())
              .filter(F.col("cosine") >= 0.9)).collect()}
    assert pairs <= exact                      # exact precision
    assert len(pairs) / len(exact) >= 0.8      # high recall on clusters

    wide = {(r2["id_a"], r2["id_b"]) for r2 in
            similarity.cosine_near_duplicates(
                clustered, threshold=0.9, n_planes=6, dim=DIM,
                multiprobe_hamming=1).collect()}
    assert pairs <= wide <= exact
    assert len(wide) >= len(pairs)
