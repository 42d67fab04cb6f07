"""Crash-orphan reclaim: a driver killed between staging a managed
table's files and registering it in the catalog leaves a location with
no catalog entry.  Under the parquet backend's registration-last commit
rule that state is provably uncommitted, so every create path must
reclaim it instead of failing LOCATION_ALREADY_EXISTS forever (the
round-6 reproduced defect: stale ``spark-warehouse/t_*`` dirs from a
killed run bricked `DigestIndex.create`).

One test per index family plants the orphan for every table the family
creates, then asserts create + read-back is green.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dlx_spark import fsio, tableio
from dlx_spark.operators import bucketing
from dlx_spark.operators.dedup_index import (DigestIndex, EmbeddingIndex,
                                             MinHashIndex, SimHashIndex)


def _plant_orphan(spark, table: str) -> str:
    """Simulate a killed run: files at the managed location, no catalog
    entry."""
    loc = tableio.managed_location(spark, table)
    fsio.mkdirs(spark, loc)
    fsio.write_text(spark, fsio.join(loc, "part-00000.parquet"),
                    "torn remnant of a killed write")
    assert not spark.catalog.tableExists(table)
    return loc


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc number {i} with shared words alpha beta gamma "
                f"delta epsilon zeta token{i}") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [(i, [float((i * 7 + j * 3) % 13) for j in range(8)])
            for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_reclaim_unit(spark):
    """Direct contract: orphan removed (True); registered table
    untouched (False); absent location a no-op (False)."""
    loc = _plant_orphan(spark, "t_orph_unit")
    assert tableio.reclaim_orphan_location(spark, "t_orph_unit") is True
    assert not fsio.exists(spark, loc)
    assert tableio.reclaim_orphan_location(spark, "t_orph_unit") is False

    spark.range(3).write.saveAsTable("t_orph_live")
    try:
        assert tableio.reclaim_orphan_location(spark, "t_orph_live") is False
        assert spark.table("t_orph_live").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orph_live")


@pytest.mark.parametrize("family,suffixes", [
    ("digest", ["_digests", "_meta"]),
    ("minhash", ["_sigs", "_bands", "_meta"]),
    ("simhash", ["_fps", "_meta"]),
    ("embedding", ["_vecs", "_buckets", "_meta"]),
])
def test_index_create_reclaims_orphans(spark, docs, vecs, family, suffixes):
    name = f"t_orph_{family}"
    for sfx in suffixes:
        _plant_orphan(spark, name + sfx)
    try:
        if family == "digest":
            idx = DigestIndex.create(docs, name)
            assert spark.table(f"{name}_digests").count() > 0
        elif family == "minhash":
            idx = MinHashIndex.create(docs, name)
            assert spark.table(f"{name}_sigs").count() == 40
        elif family == "simhash":
            idx = SimHashIndex.create(docs, name)
            assert spark.table(f"{name}_fps").count() > 0
        else:
            idx = EmbeddingIndex.create(vecs, name)
            assert spark.table(f"{name}_vecs").count() == 40
        idx  # created green over every planted orphan
    finally:
        for sfx in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{sfx}")


def test_lsh_and_ivf_create_reclaim_orphans(spark, vecs):
    for name in ("t_orph_lsh", "t_orph_ivf"):
        _plant_orphan(spark, name)
    try:
        bucketing.write_lsh_index(vecs, "t_orph_lsh", n_planes=4)
        assert spark.table("t_orph_lsh").count() == 40
        centroids = np.array([[1.0] * 8, [5.0] * 8, [9.0] * 8])
        bucketing.write_ivf_index(vecs, "t_orph_ivf", centroids)
        assert spark.table("t_orph_ivf").count() == 40
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orph_lsh")
        spark.sql("DROP TABLE IF EXISTS t_orph_ivf")


def test_write_bucketed_reclaims_orphan(spark):
    _plant_orphan(spark, "t_orph_bkt")
    try:
        bucketing.write_bucketed(
            spark.range(100).select(F.col("id").alias("k")),
            "t_orph_bkt", "k", n_buckets=4)
        assert spark.table("t_orph_bkt").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orph_bkt")


def test_append_creates_over_orphan(spark):
    """An append against a catalog-absent table CREATES it, so it hits
    the same remnant — the backend reclaims there too."""
    _plant_orphan(spark, "t_orph_app")
    try:
        be = tableio.ParquetTableBackend()
        be.append(spark.range(10).select(F.col("id").alias("k")),
                  "t_orph_app", "k", 4)
        assert spark.table("t_orph_app").count() == 10
        # and a SECOND append onto the now-registered table appends
        be.append(spark.range(10).select(F.col("id").alias("k")),
                  "t_orph_app", "k", 4)
        assert spark.table("t_orph_app").count() == 20
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orph_app")
