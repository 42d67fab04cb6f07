"""Shared helpers for the set-scale operators."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Seconds-since-epoch as BIGINT for any temporal column.

    Spark 4 forbids a direct ``TIMESTAMP_NTZ -> BIGINT`` cast
    (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION), which is exactly what
    the driver's ``events.ts`` parquet column is.  A TIMESTAMP_NTZ
    input is measured as pure wall-clock seconds from the NTZ epoch
    (``timestampdiff`` on NTZ operands) — NOT routed through
    ``cast("timestamp")``, which would re-interpret the wall time in
    the session timezone and skew gap/tolerance/bucket arithmetic by an
    hour across DST transitions in non-UTC sessions.  TIMESTAMP keeps
    instant semantics; DATE/STRING take the standard session-tz cast.
    The ``typeof`` dispatch is constant-folded per plan, so there is no
    per-row branch.  Every piece of time arithmetic (sessionization
    gaps, as-of tolerance, range-join bucketing) goes through this one
    expression so neither case can regress in a single call site.
    """
    c = F.col(col) if isinstance(col, str) else col
    wall = F.timestamp_diff(
        "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"))
    return (F.when(F.typeof(c) == "timestamp_ntz", wall)
            .otherwise(c.cast("timestamp").cast("long")))

# logical-plan nodes that imply an exchange somewhere upstream; frames
# containing them are already as wide as spark.sql.shuffle.partitions,
# and (under AQE) converting them to an RDD would eagerly execute their
# shuffle stages — so spreading is both unnecessary and unsafe there
_WIDE_NODE = re.compile(
    r"(?m)^[\s:+-]*(?:Join|Aggregate|Window|Sort|Distinct|Deduplicate|"
    r"Repartition|RepartitionByExpression|Except|Intersect|GlobalLimit)\b")


def _narrow_scan_partitions(df: DataFrame) -> int | None:
    """Partition count if ``df`` is scan-rooted (projections / filters /
    unions over file sources), else None.

    ``df.rdd`` under AQE calls ``getFinalPhysicalPlan()``, which submits
    and awaits every exchange stage in the plan — double-executing the
    upstream pipeline when the real action later runs.  A pure scan has
    no exchange stages, so for scan-rooted plans the conversion stays
    lazy and the partition count is free to read.
    """
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None
    if _WIDE_NODE.search(plan):
        return None
    return df.rdd.getNumPartitions()


def spread_for_compute(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Widen partitioning before a CPU-heavy per-row stage.

    Parquet splits by byte ranges, so a file smaller than
    ``spark.sql.files.maxPartitionBytes`` arrives as ONE partition no
    matter how many cores the cluster has — and an expensive projection
    (minhash, simhash, feature extraction) then runs single-threaded.
    Round-robin repartition ONLY when the input is a file scan narrower
    than the session's default parallelism.  At real scale (many
    row-groups / many files) the scan is already wide, and post-shuffle
    frames are already ``spark.sql.shuffle.partitions`` wide — neither
    pays the extra shuffle.
    """
    # streaming frames have no RDD to inspect and re-partition per
    # micro-batch anyway — pass them through untouched (the stateless
    # operators compose with readStream sources)
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    nparts = _narrow_scan_partitions(df)
    if nparts is not None and nparts < target:
        return df.repartition(target)
    return df


# Mega-bucket caps are pure PERFORMANCE devices: a capped run and an
# uncapped run are equivalent for every consumer (connected components
# identical; pair-level output differs only in WHICH verified edges
# represent an over-cap cluster).  The capped plan, however, carries
# ~0.5-1 s of fixed stage overhead (sizing window/aggregate, branch
# union, final dedupe) that dominates at test/bench scale where a mega
# bucket is impossible anyway.  The bypass horizon: when the
# optimizer's size ESTIMATE of the pair-generation input is under this
# many bytes (≈15-20k compressed short documents at parquet scan
# sizes), the capped operators plan the uncapped formulation instead —
# no Spark job is fired for the decision (plan construction stays
# action-free; the number comes from Catalyst statistics), correctness
# is unaffected either way, and the worst case re-admitted below the
# horizon is bounded (~10^8 verified pairs if every row were
# identical).  Inputs with UNKNOWN statistics (e.g. driver-local
# relations report Long.MaxValue) never bypass — unknown size keeps
# the cap, the safe direction.  Callers pin capped behavior for
# property tests with ``auto_bypass_bytes=0``.
CAP_AUTO_BYPASS_BYTES = 2 << 20


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (bytes) — file sizes at the
    scan, heuristic propagation above it.  Driver-side metadata only:
    never fires a job."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def bypass_cap(df: DataFrame, cap, auto_bypass_bytes: int | None):
    """The cap actually in force for a pair-generation input: ``None``
    (uncapped plan) when the input's estimate is under the bypass
    horizon, else ``cap`` unchanged.  ``auto_bypass_bytes``: None =
    the default horizon, 0 = never bypass (pins capped behavior for
    tests), any other value = explicit horizon."""
    if cap is None:
        return None
    horizon = CAP_AUTO_BYPASS_BYTES if auto_bypass_bytes is None \
        else auto_bypass_bytes
    if not horizon:
        return cap
    try:
        small = estimated_bytes(df) <= int(horizon)
    except Exception:
        return cap
    return None if small else cap
