"""Delta Lake implementation of the ``tableio`` backend seam.

This is the backend the seam was DESIGNED for (tableio.py's module
docstring promises it): a table format with a real commit protocol
lifts the engine to multi-writer without touching any operator
call-site — the index classes (operators/dedup_index.py,
operators/bucketing.py) resolve the backend per call and never talk to
storage directly.

Mapping of the seam's contract onto Delta's public API (delta-spark):

- **Tables are path-based Delta tables** under ``<root>/<name>`` —
  no metastore dependency, same as ``VersionedTableBackend``; Delta's
  transaction log replaces our hand-rolled manifest protocol, so
  appends are multi-writer safe natively (Delta's optimistic commit)
  on any store with a configured LogStore.
- **Clustered layout**: Delta has no Hive bucketing, so ``write`` /
  ``append`` keep the bucket-key CLUSTERING (hash-repartition by key +
  sort within partitions — balanced, sorted files) without catalog
  bucket metadata, the exact trade the versioned backend documents;
  probes are broadcast joins so bucketed-join elision rarely bites.
- **``snapshot_token``** is the table's Delta version (an int), and
  **``replace``** is one transactional overwrite: Delta's
  ``mode("overwrite")`` commit swaps the content atomically and
  readers hold snapshots across it.  ``on_conflict="merge"`` carries
  rows that landed after the token by diffing the current snapshot
  against the token version (``versionAsOf`` time travel) — correct
  when the raced commits are APPENDS that commute with the rewrite
  (the compaction contract); ``"fail"`` raises ConcurrentWriteError.
  The token-check-to-commit window is a residual check-then-act (the
  Python API does not expose commit-level conflict injection), so
  content-TRANSFORMING rewrites keep the single-maintenance-writer
  contract; concurrent plain appends are safe throughout.
- **Provenance** rides in the overwrite commit's ``userMetadata``
  (Delta's documented commit annotation), keyed on the staged table's
  Delta table GUID (``DeltaTable.detail().id``) — regenerated whenever
  a stage is dropped and rebuilt, so ``replace_published`` can never
  mistake a NEW stage generation for an already-published one (the
  same rule the versioned backend enforces with its manifest uuid).
- **``recover_replace``** mirrors the versioned backend: a visible
  stage is complete by construction (Delta's commit is the publish),
  so recovery either re-runs the swap (no provenance found) or drops
  the redundant stage (provenance present).
- **Maintenance**: Delta brings its own OPTIMIZE/VACUUM; the seam's
  ``compact_segments`` analog is ``optimize`` below (bin-packing
  compaction via ``DeltaTable.optimize().executeCompaction()``).

Requires the ``delta-spark`` package and a session built with the
Delta extension (``dlx_spark.session.get_spark(delta=True)``); the
constructor fails fast with a clear error otherwise.  Contract
coverage: tests/test_tableio_contract.py parameterizes the shared
backend contract over parquet / versioned / delta, with the delta leg
skipping cleanly where the package is absent (this sandbox).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from dlx_spark import fsio
from dlx_spark.tableio import ConcurrentWriteError, ParquetTableBackend


class DeltaTableBackend(ParquetTableBackend):
    """Delta-Lake-backed tableio backend (see module docstring).
    Drop-in for ``tableio.set_backend``."""

    #: delta-spark major versions this backend's API usage was written
    #: against (DeltaTable.forPath/detail/optimize/history/alias-merge,
    #: userMetadata commit annotation, versionAsOf time travel — all
    #: stable across 3.x/4.x).  IMPORTANT HONESTY NOTE: delta-spark is
    #: absent from the build sandbox, so the delta leg of
    #: tests/test_tableio_contract.py has never executed there — this
    #: guard makes the FIRST real environment flag version drift loudly
    #: instead of failing deep inside a commit.
    SUPPORTED_DELTA_MAJORS = (3, 4)

    def __init__(self, root: str | None = None):
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "DeltaTableBackend needs the delta-spark package "
                "(pip install delta-spark) and a session built with "
                "dlx_spark.session.get_spark(delta=True)") from exc
        try:
            import importlib.metadata as _md
            version = _md.version("delta-spark")
            major = int(version.split(".")[0])
        except Exception:
            version, major = None, None
        if major is not None and major not in self.SUPPORTED_DELTA_MAJORS:
            import warnings
            warnings.warn(
                f"DeltaTableBackend was written against delta-spark "
                f"majors {self.SUPPORTED_DELTA_MAJORS} but found "
                f"{version}; the contract tests "
                f"(tests/test_tableio_contract.py, delta leg) have never "
                f"run in the build sandbox — run them against this "
                f"version before trusting multi-writer commits.",
                RuntimeWarning, stacklevel=2)
        self._root = root

    # ---------------------------------------------------------- paths

    def root(self, spark: SparkSession) -> str:
        if self._root is None:
            self._root = fsio.join(
                spark.conf.get("spark.sql.warehouse.dir"), "_delta")
        return self._root

    def _path(self, spark: SparkSession, table: str) -> str:
        if "/" in table:
            raise ValueError(f"{table!r}: table names, not paths")
        return fsio.join(self.root(spark), table)

    @staticmethod
    def _dt(spark: SparkSession, path: str):
        from delta.tables import DeltaTable
        return DeltaTable.forPath(spark, path)

    # ------------------------------------------- tableio interface

    def write(self, df: DataFrame, table: str, key: str,
              n_buckets: int) -> None:
        (self._aligned(df, key, n_buckets).sortWithinPartitions(key)
         .write.format("delta").mode("overwrite")
         .option("overwriteSchema", "true")
         .save(self._path(df.sparkSession, table)))

    def append(self, df: DataFrame, table: str, key: str,
               n_buckets: int) -> None:
        (self._aligned(df, key, n_buckets).sortWithinPartitions(key)
         .write.format("delta").mode("append")
         .save(self._path(df.sparkSession, table)))

    def write_plain(self, df: DataFrame, table: str) -> None:
        (df.write.format("delta").mode("overwrite")
         .option("overwriteSchema", "true")
         .save(self._path(df.sparkSession, table)))

    def write_partitioned(self, df: DataFrame, table: str,
                          partition_cols: list[str]) -> None:
        (self._clustered(df, partition_cols)
         .write.format("delta").mode("overwrite")
         .option("overwriteSchema", "true")
         .partitionBy(*partition_cols)
         .save(self._path(df.sparkSession, table)))

    def append_partitioned(self, df: DataFrame, table: str,
                           partition_cols: list[str]) -> None:
        (self._clustered(df, partition_cols)
         .write.format("delta").mode("append")
         .partitionBy(*partition_cols)
         .save(self._path(df.sparkSession, table)))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.format("delta").load(self._path(spark, table))

    def refresh(self, spark: SparkSession, table: str) -> None:
        """No-op: every Delta read resolves the latest snapshot from
        the transaction log; returned DataFrames are snapshots."""

    def exists(self, spark: SparkSession, table: str) -> bool:
        from delta.tables import DeltaTable
        return DeltaTable.isDeltaTable(spark, self._path(spark, table))

    def drop(self, spark: SparkSession, table: str) -> None:
        fsio.rmtree(spark, self._path(spark, table))

    # ------------------------------------------------ replace protocol

    def _version(self, spark: SparkSession, table: str) -> int:
        return int(self._dt(spark, self._path(spark, table))
                   .history(1).select("version").head()["version"])

    def _table_guid(self, spark: SparkSession, table: str) -> str:
        """Delta's table GUID — regenerated when the log directory is
        recreated, so it identifies a stage GENERATION the way the
        versioned backend's manifest uuid does."""
        return str(self._dt(spark, self._path(spark, table))
                   .detail().select("id").head()["id"])

    def snapshot_token(self, spark: SparkSession, table: str):
        """The table's Delta version as of now (None for no table)."""
        if not self.exists(spark, table):
            return None
        return self._version(spark, table)

    def replace(self, spark: SparkSession, table: str, staged: str,
                token=None, on_conflict: str = "merge") -> None:
        if on_conflict not in ("merge", "fail"):
            raise ValueError(f"on_conflict must be merge|fail, "
                             f"got {on_conflict!r}")
        staged_path = self._path(spark, staged)
        target_path = self._path(spark, table)
        content = spark.read.format("delta").load(staged_path)
        if token is not None and self.exists(spark, table):
            current = self._version(spark, table)
            if current != token:
                if on_conflict == "fail":
                    raise ConcurrentWriteError(
                        f"replace({table}): version advanced {token} -> "
                        f"{current} after the caller's snapshot — "
                        f"re-derive the stage and retry")
                # merge: rows the table gained since the token commute
                # with a compaction-class rewrite — carry them.  Sound
                # for APPEND-only racers (exceptAll diffs the snapshots
                # row-wise); content-transforming rewrites must use
                # "fail" (same contract as the versioned backend).
                gained = (spark.read.format("delta").load(target_path)
                          .exceptAll(spark.read.format("delta")
                                     .option("versionAsOf", token)
                                     .load(target_path)))
                content = content.unionByName(gained)
        provenance = json.dumps(
            {"source": staged, "id": self._table_guid(spark, staged)})
        (content.write.format("delta").mode("overwrite")
         .option("overwriteSchema", "true")
         .option("userMetadata", provenance)
         .save(target_path))
        self.drop(spark, staged)

    def replace_published(self, spark: SparkSession, table: str,
                          staged: str) -> bool:
        """True iff some commit of ``table`` carries provenance citing
        the stage's CURRENT table GUID — the swap landed and only the
        staged drop was lost (see the base-class docstring)."""
        if not (self.exists(spark, staged) and self.exists(spark, table)):
            return False
        want = json.dumps(
            {"source": staged, "id": self._table_guid(spark, staged)})
        hist = (self._dt(spark, self._path(spark, table)).history()
                .select("userMetadata")
                .filter(F.col("userMetadata") == want))
        return hist.head() is not None

    def recover_replace(self, spark: SparkSession, table: str,
                        staged: str) -> None:
        """A visible Delta stage is complete by construction (the
        transaction-log commit IS the publish), so: provenance found →
        drop the redundant stage; not found → re-run the swap."""
        if not self.exists(spark, staged):
            return
        if self.replace_published(spark, table, staged):
            self.drop(spark, staged)
            return
        self.replace(spark, table, staged)

    # --------------------------------------------------- maintenance

    def optimize(self, spark: SparkSession, table: str) -> None:
        """Bin-packing compaction — Delta's native OPTIMIZE, the
        ``compact_segments`` analog (no staged swap needed: the
        rewrite is one transactional commit)."""
        self._dt(spark, self._path(spark, table)) \
            .optimize().executeCompaction()

    def vacuum(self, spark: SparkSession, table: str,
               retention_hours: float = 168.0) -> None:
        """Delta's native VACUUM (per table — the log, not a shared
        segment pool, tracks reachability)."""
        self._dt(spark, self._path(spark, table)).vacuum(retention_hours)


class DeltaMergeTable:
    """``MergeOnReadTable``'s observable CONTRACT on the Delta backend
    for UNIQUE-KEY tables (the store's live / deleted-summary shape):
    one atomic MERGE per batch plays the appended-delta-segment role —
    Delta's own merge-on-read machinery (deletion vectors, log-tracked
    files) replaces the hand-rolled manifest precedence, so there is no
    resolution layer to manage and no broadcast-size gate to tune.

    Semantics matched to MergeOnReadTable.upsert (tableio_mor.py):

    - ``rows`` replace each touched key's row; keys absent insert.
    - ``tombstone_keys`` delete keys — but a key present in BOTH rows
      and tombstones keeps the ROW (MOR resolves a same-segment
      row+tombstone pair to the row; the store's callers tombstone
      every touched key and re-append survivors, relying on exactly
      this), so the delete source is tombstones ANTI-JOIN rows.
    - ``compact`` maps to Delta OPTIMIZE (bin-packing; returns 0 —
      Delta owns its file counts).
    - ``extra`` table metadata is out of scope here: the versioned
      backend's manifest ``extra`` carries the MARC store's geometry,
      which the Delta leg does not reimplement (TBLPROPERTIES would be
      the analog); the index/contract surface never needs it.

    MULTI-ROW-PER-KEY tables (the token index) are NOT covered: a
    single MERGE cannot replace a key's row-SET with one of different
    cardinality — that shape needs delete-then-append in one Delta
    transaction (the commitInfo-level API), documented out of scope
    until the Delta leg can execute (delta-spark is absent from the
    build sandbox; tests/test_tableio_contract.py's MOR-contract leg
    skips cleanly and lights up the moment it lands)."""

    def __init__(self, backend: DeltaTableBackend, table: str, key: str,
                 partition_cols: list[str] | None = None):
        self.backend = backend
        self.table = table
        self.key = key
        self.partition_cols = list(partition_cols or [])

    def exists(self, spark: SparkSession) -> bool:
        return self.backend.exists(spark, self.table)

    def overwrite(self, df: DataFrame, extra: dict | None = None) -> None:
        if self.partition_cols:
            self.backend.write_partitioned(df, self.table,
                                           self.partition_cols)
        else:
            self.backend.write_plain(df, self.table)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.backend.read(spark, self.table)

    def upsert(self, rows: DataFrame | None = None,
               tombstone_keys: DataFrame | None = None,
               extra: dict | None = None,
               expect_meta: dict | None = None,
               expect_create: bool = False) -> None:
        if rows is None and tombstone_keys is None:
            raise ValueError("upsert needs rows and/or tombstone_keys")
        spark = (rows if rows is not None else tombstone_keys).sparkSession
        if not self.exists(spark):
            if rows is None:
                return          # deletes against a table that never existed
            self.overwrite(rows, extra=extra)
            return
        from delta.tables import DeltaTable
        dt = DeltaTable.forPath(spark,
                                self.backend._path(spark, self.table))
        k = self.key
        if rows is not None:
            (dt.alias("t")
               .merge(rows.alias("s"), f"t.{k} = s.{k}")
               .whenMatchedUpdateAll()
               .whenNotMatchedInsertAll()
               .execute())
        if tombstone_keys is not None:
            stones = tombstone_keys.select(k)
            if rows is not None:
                # row-wins on overlap, matching MOR's same-segment rule
                stones = stones.join(rows.select(k), k, "left_anti")
            (dt.alias("t")
               .merge(stones.alias("s"), f"t.{k} = s.{k}")
               .whenMatchedDelete()
               .execute())

    def compact(self, spark: SparkSession) -> int:
        self.backend.optimize(spark, self.table)
        return 0

    def compact_deltas(self, spark: SparkSession) -> int:
        """Minor-compaction contract point (MergeOnReadTable's tiered
        fold).  Delta's OPTIMIZE is already incremental — it bin-packs
        small files without rewriting compacted ones — so the minor and
        full folds are the same operation here."""
        return self.compact(spark)
