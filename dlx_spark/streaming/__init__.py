"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY §2.7) — its incremental
machinery is commit-time maintenance of derived state on Python threads.
Here that becomes:

- ``incremental_commit_stream``: a file-source stream of JMARC JSONL
  batches driven through ``foreachBatch`` into a MarcStore commit — the
  deterministic replacement for the reference's thread families, and the
  natural shape for a change feed at scale (swap the file source for
  Kafka without touching the sink).
- event-time aggregations with watermarks (``hourly_counts``,
  ``sessionize``) over the generic events shape (ts, user_id, ...) —
  the streaming equivalents of the batch contract queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """File-source stream of event JSONL (one JSON object per line)."""
    schema = schema or "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    return spark.readStream.schema(schema).json(path)


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window with late-data watermark: the
    streaming form of the batch ``windowed_agg`` contract query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based) — the streaming form of the
    batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Streaming exact dedup: emit only the FIRST occurrence of each
    content digest ever seen on the stream — a custom stateful operator
    via ``applyInPandasWithState``.

    State is one (first_id, n_seen) pair per digest, held in the state
    store (enable the RocksDB provider at 100 TB so state spills off
    heap); duplicates arriving in any later micro-batch are dropped and
    counted.  The batch-side equivalent is ``operators.dedup.
    dedup_exact``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from dlx_spark.operators.dedup import normalized_text

    keyed = docs.select(F.col(id_col).alias("id"),
                        F.md5(normalized_text(F.col(text_col))).alias("digest"))

    def keep_first(key, pdfs, state):
        min_id, count = None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            count += len(pdf)
            m = int(pdf["id"].min())
            min_id = m if min_id is None or m < min_id else min_id
        if state.exists:
            first_id, n_seen = state.get
            state.update((first_id, n_seen + count))
        elif min_id is not None:
            state.update((min_id, count))
            yield pd.DataFrame({"digest": [key[0]], "id": [min_id]})

    return keyed.groupBy("digest").applyInPandasWithState(
        keep_first,
        outputStructType="digest string, id long",
        stateStructType="first_id long, n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id",
                  how: str = "left") -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream.  The static side re-resolves per micro-batch (so a refreshed
    dimension table is picked up) and broadcasts when small — the
    standard shape for decorating an event stream with slowly-changing
    reference data at any scale."""
    return events.join(F.broadcast(dim), on, how)


def incremental_commit_stream(spark: SparkSession, input_path: str, store,
                              record_type: str = "bib",
                              checkpoint: str | None = None):
    """Stream JMARC JSONL files into a MarcStore: each micro-batch is one
    deterministic commit (id assignment, validation, derived refresh,
    history append) — the reference's 4 commit-time thread families as a
    single exactly-once-per-batch pipeline.

    Returns the StreamingQuery; caller stops it."""
    checkpoint = checkpoint or f"{store.root}/_checkpoints/{record_type}"
    raw = spark.readStream.schema("value string").text(input_path)
    process_batch = make_commit_batch_fn(store, record_type, checkpoint)
    writer = (raw.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint)
              .trigger(availableNow=True))
    return writer.start()


def make_commit_batch_fn(store, record_type: str, checkpoint: str):
    """The foreachBatch function behind ``incremental_commit_stream``,
    exposed for direct testing of its replay semantics.

    foreachBatch is at-least-once: after a crash the last micro-batch
    replays with the SAME batch_id, and replaying a commit is NOT
    idempotent here (id-less rows would get fresh ids; history would
    double-append).  A (stream-instance, batch_id) ledger turns it
    exactly-once: skip batches already recorded, record AFTER the commit
    lands.  The stream instance is identified by the checkpoint path, so
    a NEW stream (fresh checkpoint, batch ids restarting at 0) is never
    confused with a replay.  Scale note: the ledger accretes one tiny
    file per batch — compact or swap for a transactional table when
    batch counts reach the many-thousands."""
    import hashlib
    import os

    from dlx_spark import schemas
    from dlx_spark.marc.record import Auth, Bib

    cls = Bib if record_type == "bib" else Auth
    stream_key = hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:16]
    commits_log = os.path.join(store.root, f"_stream_commits_{record_type}")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        if os.path.isdir(commits_log) and any(
                f.endswith(".parquet") for f in os.listdir(commits_log)):
            seen = (session.read.parquet(commits_log)
                    .filter((F.col("stream") == stream_key)
                            & (F.col("batch_id") == batch_id))
                    .limit(1).count())
            if seen:
                return

        # parse executor-side (same parser as read_jmarc_jsonl) and feed
        # the bulk commit_frame pipeline — the batch never funnels raw
        # lines or record rows through the driver, so micro-batch size
        # is bounded by the cluster, not driver memory
        import json

        def parse(line):
            line = (line or "").strip()
            if not line:
                return []
            return [cls(json.loads(line)).to_row()]

        rows = batch_df.rdd.flatMap(lambda r: parse(r["value"]))
        if not rows.isEmpty():
            nested = session.createDataFrame(rows, schema=schemas.MARC_INGEST)
            store.commit_frame(nested, record_type=record_type,
                               user=f"stream-batch-{batch_id}", auth_check=False)
        (session.createDataFrame([(stream_key, int(batch_id))],
                                 "stream string, batch_id long")
         .write.mode("append").parquet(commits_log))

    return process_batch
