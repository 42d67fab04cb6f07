"""Deterministic sharded export — the training-data pipeline's last
stage: turn a prepared corpus into N reproducible shard files whose
assignment, intra-shard order, and content are all closed-form
functions of the data (never of partitioning, cluster size, or row
arrival order), so a re-run of the pipeline bit-reproduces the corpus
and any engine can re-derive which shard a record belongs to.

Scale design (100 TB):

- shard assignment is a pure JVM expression (md5 arithmetic, the same
  seeded family as ``sampling.sample_bucket``) — no shuffle, no state;
- the write shuffles ONCE, keyed by the shard id: every row of a shard
  lands in the same task (hash partitioning is per-key-deterministic),
  so ``partitionBy`` emits exactly one file per shard and
  ``sortWithinPartitions`` fixes the row order inside it;
- the manifest (per-shard row count + order-insensitive content
  digest) is one partial-agg-friendly groupBy, and is computed from
  the RE-READ written files — it certifies what landed on disk, not
  what the plan intended to write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dlx_spark.operators.dedup import _require_col_name

#: 15 hex chars = 60 bits — fits a signed 64-bit long on every engine
_HEX_DIGITS = 15


def _hash60(col: Column, salt: str = "") -> Column:
    """Signed-long 60-bit md5 hash of a column (engine-portable: DuckDB
    spells it CAST('0x' || substr(md5(x || salt), 1, 15) AS UBIGINT))."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))),
                    1, _HEX_DIGITS), 16, 10).cast("long")


def shard_col(key, n_shards: int, salt: str = "") -> Column:
    """The shard id a key falls in: hash60(key, salt) mod n_shards.
    Closed-form and row-independent, so assignment survives any
    repartitioning and can be recomputed by a different engine."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    col = key if isinstance(key, Column) else F.col(key)
    return F.pmod(_hash60(col, salt), F.lit(n_shards)).cast("int")


def assign_shards(df: DataFrame, n_shards: int = 64,
                  key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Input plus a deterministic ``shard`` column."""
    _require_col_name("key_col", key_col)
    return df.withColumn("shard", shard_col(key_col, n_shards, salt))


def shard_manifest(df: DataFrame, digest_cols: tuple[str, ...],
                   shard_col_name: str = "shard") -> DataFrame:
    """(shard, n_rows, content_xor, min_key, max_key): per-shard row
    count and an ORDER-INSENSITIVE content digest (xor of per-row
    60-bit hashes over ``digest_cols`` joined with ':'), plus the key
    range of the first digest column.  Two datasets with equal
    manifests hold the same multiset of rows per shard regardless of
    how either was partitioned or ordered."""
    if not digest_cols:
        raise ValueError("digest_cols must name at least one column")
    # NULLs get an explicit sentinel: concat_ws would silently skip
    # them, making (NULL,'x') and ('x',NULL) digest-equal
    row_h = _hash60(F.concat_ws(":", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
        for c in digest_cols]))
    key = F.col(digest_cols[0])
    return (df.groupBy(F.col(shard_col_name).alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.bit_xor(row_h).alias("content_xor"),
                 F.min(key).alias("min_key"),
                 F.max(key).alias("max_key")))


def export_shards(df: DataFrame, path: str, n_shards: int = 64,
                  key_col: str = "doc_id", salt: str = "",
                  sort_cols: tuple[str, ...] | None = None,
                  mode: str = "error") -> DataFrame:
    """Write the corpus as ``n_shards`` reproducible parquet shards
    under ``path`` (hive layout ``shard=K/``) and return the manifest
    of what was WRITTEN (re-read from disk).

    Reproducibility contract: shard membership comes from
    :func:`shard_col` (closed-form); each shard is exactly one file
    (one exchange keyed by shard id puts a shard's rows in one task);
    rows inside a shard are ordered by ``sort_cols`` (default: the
    shard key column) so a re-run from any input partitioning writes
    identical row sequences.
    """
    sort_cols = tuple(sort_cols) if sort_cols else (key_col,)
    sharded = assign_shards(df, n_shards, key_col, salt)
    (sharded
     .repartition(n_shards, "shard")
     .sortWithinPartitions("shard", *sort_cols)
     .write.partitionBy("shard").mode(mode).parquet(path))
    written = df.sparkSession.read.parquet(path)
    digest_cols = tuple(c for c in df.columns)
    return shard_manifest(written, digest_cols)
