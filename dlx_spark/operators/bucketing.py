"""Storage-layout operators: bucketed tables for shuffle-free joins and
partition-pruned ANN indexes.

The 100 TB playbook the rest of the engine assumes:

- ``write_bucketed`` / ``read_table`` — persist both sides of a
  recurring equi-join bucketed (and sort-within-bucket) on the join
  key.  Spark's bucketed scan then satisfies the join's distribution
  requirement from the LAYOUT, so the join plans with zero Exchange on
  the bucketed side(s) — the single biggest saving for a fact table
  that joins on the same key every day.
- ``write_lsh_index`` / ``probe_lsh_index`` — materialize the
  hyperplane-LSH bucket assignment partitioned BY BUCKET, so a top-k
  probe prunes to the multiprobe bucket set at the file listing (the
  scan never opens non-matching partitions).
- ``write_ivf_index`` / ``probe_ivf_index`` — same for IVF inverted
  lists: partitioned by ``list_id``, probes read nprobe/n_centroids of
  the data.

Bucketed tables use ``saveAsTable`` (bucket metadata lives in the
catalog); partitioned indexes are plain parquet paths.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from dlx_spark.operators import similarity


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   n_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` bucketed (and sorted) by ``key`` into the catalog.
    Joining two tables bucketed the same way on the same key plans with
    no Exchange; sorting within buckets additionally enables a
    zero-sort SortMergeJoin."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_lsh_index(df: DataFrame, path: str, n_planes: int = 8,
                    seed: int = 42, vec_col: str = "embedding",
                    id_col: str = "vec_id", dim: int | None = None) -> None:
    """Materialize the LSH bucket table partitioned by bucket: a probe
    filtering on ``bucket IN (...)`` prunes partitions at the listing —
    at 2^n_planes buckets, a hamming-1 multiprobe reads
    (n_planes+1)/2^n_planes of the data."""
    buckets = similarity.lsh_buckets(df, n_planes=n_planes, seed=seed,
                                     vec_col=vec_col, id_col=id_col, dim=dim)
    buckets.write.mode("overwrite").partitionBy("bucket").parquet(path)


def probe_lsh_index(spark: SparkSession, path: str, query: list[float],
                    k: int = 10, n_planes: int = 8, seed: int = 42,
                    multiprobe_hamming: int = 1) -> DataFrame:
    """Top-k over a written LSH index: compute the probe bucket set
    driver-side (hyperplanes are seeded), filter on the PARTITION column
    so only matching bucket directories are scanned, exact-rerank the
    survivors."""
    q = np.asarray(query, dtype=np.float64)
    planes = similarity.hyperplanes(len(q), n_planes, seed)
    qsig = 0
    for i, plane in enumerate(planes):
        if float(plane @ q) > 0:
            qsig |= 1 << i
    probe = {qsig}
    for _ in range(multiprobe_hamming):
        probe |= {s ^ (1 << i) for s in list(probe) for i in range(n_planes)}

    idx = spark.read.parquet(path).filter(F.col("bucket").isin(sorted(probe)))
    return (idx.select("id", similarity._cosine_expr("vec", [float(x) for x in q])
                       .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))


def write_ivf_index(df: DataFrame, path: str, centroids: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> None:
    """Materialize the IVF assignment partitioned by inverted list."""
    assigned = similarity.ivf_assign(df, centroids, vec_col=vec_col, id_col=id_col)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def probe_ivf_index(spark: SparkSession, path: str, centroids: np.ndarray,
                    query: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
    """Top-k over a written IVF index: rank centroids driver-side (a few
    KB), scan only the nprobe nearest list partitions, exact-rerank."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probe = [int(i) for i in np.argsort(-(cn @ qn))[:nprobe]]

    idx = spark.read.parquet(path).filter(F.col("list_id").isin(probe))
    return (idx.select("id", similarity._cosine_expr("vec", [float(x) for x in q])
                       .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))
