"""Deterministic sharded export (operators/export.py): closed-form
assignment, one file per shard, bit-reproducible re-runs, and a
written-data manifest that certifies what landed."""

import glob

import pytest
from pyspark.sql import functions as F

from dlx_spark.operators import export


@pytest.fixture()
def corpus(spark):
    rows = [(i, f"text {i}", "en" if i % 3 else "fr") for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_assignment_is_partitioning_independent(spark, corpus):
    a = export.assign_shards(corpus, 16).select("doc_id", "shard")
    b = export.assign_shards(
        corpus.repartition(7).sortWithinPartitions("lang"), 16
    ).select("doc_id", "shard")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_assignment_range_and_spread(spark, corpus):
    shards = [r["shard"] for r in
              export.assign_shards(corpus, 8).select("shard").collect()]
    assert all(0 <= s < 8 for s in shards)
    assert len(set(shards)) == 8          # 200 keys land in every shard


def test_null_key_gets_null_shard(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b")], ["doc_id", "text"])
    rows = {r["text"]: r["shard"]
            for r in export.assign_shards(df, 4).collect()}
    assert rows["a"] is not None and rows["b"] is None


def test_export_one_file_per_shard(spark, corpus, tmp_path):
    path = str(tmp_path / "out")
    export.export_shards(corpus, path, n_shards=8)
    for d in glob.glob(f"{path}/shard=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d


def test_export_rerun_is_reproducible(spark, corpus, tmp_path):
    """Re-exporting from a differently-partitioned input yields the
    same manifest AND the same row sequence inside each shard file."""
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export.export_shards(corpus, p1, n_shards=4).collect()
    shuffled = corpus.repartition(13).sortWithinPartitions("text")
    m2 = export.export_shards(shuffled, p2, n_shards=4).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    for shard in range(4):
        f1 = glob.glob(f"{p1}/shard={shard}/*.parquet")
        f2 = glob.glob(f"{p2}/shard={shard}/*.parquet")
        r1 = spark.read.parquet(*f1).select("doc_id").collect()
        r2 = spark.read.parquet(*f2).select("doc_id").collect()
        assert [r["doc_id"] for r in r1] == [r["doc_id"] for r in r2]


def test_manifest_certifies_written_content(spark, corpus, tmp_path):
    """The returned manifest (from the re-read files) equals the
    manifest of the intended input — nothing lost or duplicated."""
    path = str(tmp_path / "out")
    written = export.export_shards(corpus, path, n_shards=4).collect()
    intended = export.shard_manifest(
        export.assign_shards(corpus, 4),
        ("doc_id", "text", "lang")).collect()
    assert sorted(map(tuple, written)) == sorted(map(tuple, intended))


def test_manifest_order_insensitive_but_content_sensitive(spark, corpus):
    sharded = export.assign_shards(corpus, 4)
    base = export.shard_manifest(sharded, ("doc_id", "text")).collect()
    reordered = export.shard_manifest(
        sharded.orderBy(F.desc("text")), ("doc_id", "text")).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, reordered))
    tampered = export.shard_manifest(
        sharded.withColumn("text", F.concat(F.col("text"), F.lit("!"))),
        ("doc_id", "text")).collect()
    assert sorted(map(tuple, tampered)) != sorted(map(tuple, base))


def test_manifest_null_sentinel_distinguishes_null_slots(spark):
    schema = "shard int, a string, b string"
    df1 = spark.createDataFrame([(0, None, "x")], schema)
    df2 = spark.createDataFrame([(0, "x", None)], schema)
    d1 = export.shard_manifest(df1, ("a", "b")).collect()[0]["content_xor"]
    d2 = export.shard_manifest(df2, ("a", "b")).collect()[0]["content_xor"]
    assert d1 != d2


def test_salt_gives_independent_assignment(spark, corpus):
    a = {r["doc_id"]: r["shard"]
         for r in export.assign_shards(corpus, 8, salt="s1").collect()}
    b = {r["doc_id"]: r["shard"]
         for r in export.assign_shards(corpus, 8, salt="s2").collect()}
    assert any(a[k] != b[k] for k in a)


def test_bad_args_rejected(spark, corpus):
    with pytest.raises(ValueError):
        export.shard_col("doc_id", 0)
    with pytest.raises(ValueError):
        export.shard_manifest(corpus, ())
    with pytest.raises(TypeError):
        export.assign_shards(corpus, 8, key_col=3)
