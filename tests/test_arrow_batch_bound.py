"""The Arrow byte bound for mapInPandas batches (guide §4.2, r12).

``get_spark`` sets ``spark.sql.execution.arrow.maxBytesPerBatch`` to
64 MiB so a batch of multi-MB media payloads cannot build a GiB-scale
ArrowRecordBatch in executor memory: Spark closes each batch when EITHER
the record cap (default 10k rows) or the byte cap is hit.  These tests
pin both directions — big rows split into small batches, narrow rows
keep their row-cap batches — through the same mapInPandas machinery the
multimodal operators use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

BATCH_PROBE_SCHEMA = StructType([
    StructField("batch_rows", IntegerType()),
    StructField("batch_bytes", LongType()),
])


def _batch_sizes(df):
    """One output row per Arrow batch the Python worker received:
    (rows in the batch, payload bytes in the batch)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "batch_rows": [len(pdf)],
                "batch_bytes": [int(pdf["payload"].map(
                    lambda b: len(b or b"")).sum())],
            })
    return df.mapInPandas(run, schema=BATCH_PROBE_SCHEMA)


def test_media_sized_rows_split_by_byte_bound(spark):
    """40 rows x 8 MB of payload = 320 MB: under the 64 MiB byte cap no
    batch may carry more than ~8 such rows, so the worker must see >= 5
    batches instead of one 320 MB batch."""
    cap = int(spark.conf.get("spark.sql.execution.arrow.maxBytesPerBatch"))
    assert cap == 64 * 1024 * 1024
    row_bytes = 8 * 1024 * 1024
    big = (spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.expr(f"cast(repeat('x', {row_bytes}) as binary)").alias("payload"))
        .coalesce(1))  # one partition: the split must come from the cap
    sizes = _batch_sizes(big).collect()
    assert sum(r.batch_rows for r in sizes) == 40
    assert len(sizes) >= 5, f"expected byte-capped batches, got {sizes}"
    # each batch closes when the cap is met, so one row of slack past it
    assert max(r.batch_bytes for r in sizes) <= cap + row_bytes


def test_narrow_rows_keep_record_cap_batches(spark):
    """Narrow rows stay on the 10k-record cap: the byte bound must not
    shrink ordinary text batches (which would cost vectorization)."""
    n = 25_000
    small = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr("cast('tiny' as binary)").alias("payload"))
        .coalesce(1))
    sizes = _batch_sizes(small).collect()
    assert sum(r.batch_rows for r in sizes) == n
    assert max(r.batch_rows for r in sizes) == 10_000
