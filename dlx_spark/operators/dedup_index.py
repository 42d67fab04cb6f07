"""Incremental dedup indexes: dedup a NEW batch against a persisted
corpus WITHOUT recomputing or rescanning the corpus text.

The 100 TB workflow this enables: a training corpus is built in daily
increments.  Re-running full-corpus dedup per increment re-shingles and
re-hashes everything ever ingested — O(corpus) compute per day.  These
indexes persist the corpus's dedup STATE instead:

- ``DigestIndex``     — one md5 digest per ingested document, stored as
                        a table bucketed by digest.  Exact dedup of a
                        batch is one anti-join whose bucketed side needs
                        no Exchange; the corpus text is never touched.
- ``SimHashIndex``    — the 64-bit fingerprints plus their 4×16-bit
                        pigeonhole band keys, persisted the same way;
                        probes find hamming-≤3 neighbors of a batch
                        against all history.
- ``MinHashIndex``    — the banded LSH keys (band, bucket, id) plus the
                        64-hash signatures (id, sig), both persisted.
                        Probing a batch computes signatures for the
                        BATCH ONLY (a map-only projection), broadcasts
                        its band keys into a map-side join against the
                        band table, and verifies candidates against the
                        signature table.  Per-increment cost: one
                        broadcast-join scan of the compact index tables
                        (signatures + bands are ~1-2 % of corpus text
                        bytes) with ZERO shuffle of index data, plus
                        work proportional to the batch.
- ``EmbeddingIndex``  — vectors with hyperplane-LSH bucket keys; probes
                        find cosine-≥threshold neighbors of a batch
                        against all history with exact-cosine
                        verification (the embedding-side analog of the
                        MinHash index).

All indexes are append-only: after a batch is deduped, its survivors'
state is appended (bucketed appends keep the layout), so tomorrow's
batch sees today's survivors.  Index parameters (hash family seed,
bands, shingle width...) are persisted in a ``*_meta`` table at create
time and re-read at probe/append time — a probe with mismatched
parameters would silently find nothing, so they are never re-specified
by callers.

The reference has no incremental machinery (its dedup is the per-commit
signature check, /root/reference/dlx/marc/__init__.py:2181-2182); this
is part of the engine's scale surface.  Correctness is anchored by
pytest equivalence: probing split corpora must produce exactly the
cross-partition subset of the (driver-oracled) full-corpus
``minhash_near_duplicates`` / ``dedup_exact`` results.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from dlx_spark import tableio
from dlx_spark.operators import common, dedup


def _be() -> "tableio.ParquetTableBackend":
    """The active table-commit backend (dlx_spark.tableio) — every
    catalog-table operation of the index classes routes through it, so
    a transactional table format (Delta/Iceberg) slots in via
    ``tableio.set_backend`` without touching any call-site here."""
    return tableio.get_backend()

# Probe-side broadcast gate: a daily-increment batch's band keys are a
# few MB and belong in a broadcast (zero shuffle of index data), but a
# backfill-sized batch would blow the driver/executor broadcast memory.
# Above this many band-key rows (~50-100 MB serialized) the probe falls
# back to a plain equi-join on (band, bucket): the index side is
# bucketed by bucket, so its layout already satisfies the join's
# distribution and only the batch side shuffles.
PROBE_BROADCAST_ROW_CAP = 2_000_000


def _compact_table(spark: SparkSession, table: str, key: str,
                   n_buckets: int, distinct: bool = False) -> None:
    """Rewrite a bucketed table into one file per bucket.

    Append-only indexes accrete one file per bucket per appended batch
    (a year of daily ingest = 365 × n_buckets files); this is the
    OPTIMIZE analog, and it is SHUFFLE-FREE: forcing a bucketed scan
    gives exactly one input partition per bucket (autoBucketedScan
    would otherwise split by file and an explicit repartition gets
    optimized away as redundant against the table's logical bucketing),
    so each write task holds one whole bucket and emits one file.  The
    swap is DROP + RENAME of a staged table; a crash between the two is
    repaired by ``_recover_compaction`` on next open (the staged table
    holds the full data either way).
    """
    tmp = f"{table}__compact"
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    # snapshot token BEFORE resolving the source: appends landing while
    # the compacted copy is written commute with compaction (their rows
    # are simply not compacted yet), and a transactional backend merges
    # them into the published version instead of dropping them
    token = _be().snapshot_token(spark, table)
    try:
        src = _be().read(spark, table)
        if distinct:
            # fold exact-duplicate rows (e.g. replayed band appends).
            # dropDuplicates shuffles by ALL columns, which would break
            # the task↔bucket alignment, so explicitly re-align on the
            # bucket key afterwards (this repartition is NOT redundant
            # here — the aggregate's output partitioning differs)
            src = src.dropDuplicates().repartition(n_buckets, F.col(key))
        _be().write(src, tmp, key, n_buckets)
    finally:
        spark.conf.set(conf, old)
    _be().replace(spark, table, tmp, token=token, on_conflict="merge")


def _recover_compaction(spark: SparkSession, table: str) -> None:
    """If a compaction crashed mid-replace, finish it (backend-specific;
    the parquet backend's DROP+RENAME window, a no-op for transactional
    formats)."""
    _be().recover_replace(spark, table, f"{table}__compact")


def _split_overcap(idx_rows: DataFrame, group_cols: list[str],
                   bucket_cap: int | None):
    """(small, big): the index key rows outside over-cap groups, and
    the broadcast over-cap group list (None when uncapped).  Over-cap
    groups are rare by construction, so ``big`` is tiny and the split
    costs one map-side-combined aggregate scan of the slim key table —
    the price of bounding the worst case.  That scan is the same cost
    class as the probe's candidate join (which also streams the full
    key table), so the cap roughly doubles the slim-table scan per
    probe rather than changing its asymptotics; callers probing a
    known-deduped index on a latency budget can pass
    ``bucket_cap=None`` to skip it."""
    if bucket_cap is None:
        return idx_rows, None
    big = F.broadcast(
        idx_rows.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > int(bucket_cap))
        .select(*group_cols))
    return idx_rows.join(big, group_cols, "left_anti"), big


def _chain_probe_pairs(mega_corpus: DataFrame, mega_batch: DataFrame,
                       group_cols: list[str]) -> DataFrame:
    """Linear-output candidate pairs for OVER-CAP probe groups — the
    corpus-side analog of the intra-batch mega-bucket chains
    (dedup.minhash_pairs_from_signatures / simhash_pairs_from_fingerprints)
    and the same shape as ``EmbeddingIndex``'s mega path: sort corpus
    and batch members of each over-cap group together in (pay, id)
    order and verify each batch row against the nearest corpus row on
    each side (however far — the ignorenulls scans skip interleaved
    batch rows) plus any corpus rows within CHAIN_WINDOW positions.
    Output is O(batch members × window), never
    O(|corpus group| × |batch group|).

    Inputs carry ``group_cols + (id, pay)`` where ``pay`` is the
    verification payload that also serves as the order key (minhash
    signature array / simhash fingerprint — near-identical payloads
    sort adjacent, the property the chain relies on; same
    approximation class as the intra-batch chains).  Returns
    ``(corpus_id, batch_id, pay_a, pay_b)`` pairs for the caller's
    verify expression."""
    from pyspark.sql import Window

    from dlx_spark.operators.similarity import CHAIN_WINDOW

    u = (mega_corpus.withColumn("is_corpus", F.lit(True))
         .unionByName(mega_batch.withColumn("is_corpus", F.lit(False))))
    w = Window.partitionBy(*group_cols).orderBy("pay", "id", "is_corpus")
    cstruct = F.when(F.col("is_corpus"),
                     F.struct(F.col("id").alias("cid"),
                              F.col("pay").alias("cpay")))
    neighbors = [
        F.last(cstruct, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        F.first(cstruct, ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)),
    ] + [F.lag(cstruct, k).over(w) for k in range(1, CHAIN_WINDOW + 1)] \
      + [F.lead(cstruct, k).over(w) for k in range(1, CHAIN_WINDOW + 1)]
    return (
        u.withColumn("_cands", F.array_compact(F.array(*neighbors)))
        .filter(~F.col("is_corpus"))
        .select(F.col("id").alias("batch_id"),
                F.col("pay").alias("pay_b"),
                F.explode("_cands").alias("_c"))
        .select(F.col("_c.cid").alias("corpus_id"), "batch_id",
                F.col("_c.cpay").alias("pay_a"), "pay_b")
        .distinct())


def _write_meta(spark: SparkSession, name: str, params: dict) -> None:
    _be().write_plain(
        spark.createDataFrame([(json.dumps(params),)], "params string"),
        f"{name}_meta")


def _read_meta(spark: SparkSession, name: str) -> dict:
    return json.loads(_be().read(spark, f"{name}_meta").first()["params"])


class DigestIndex:
    """Exact-dedup state: the distinct content digests of every ingested
    document, bucketed by digest so the per-batch anti-join plans with
    no Exchange on the index side."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        _recover_compaction(spark, f"{name}_digests")
        self.params = _read_meta(spark, name)

    def compact(self) -> None:
        _compact_table(self.spark, f"{self.name}_digests", "digest",
                       self.params["n_buckets"])

    @classmethod
    def create(cls, df: DataFrame, name: str, text_col: str = "text",
               id_col: str = "doc_id", n_buckets: int = 32) -> "DigestIndex":
        spark = df.sparkSession
        digests = (
            df.select(F.md5(dedup.normalized_text(F.col(text_col))).alias("digest"),
                      F.col(id_col).alias("id"))
            .groupBy("digest").agg(F.min("id").alias("keep_id"))
        )
        _be().write(digests, f"{name}_digests", "digest", n_buckets)
        _write_meta(spark, name, {"text_col": text_col, "id_col": id_col,
                                  "n_buckets": n_buckets})
        return cls(spark, name)

    def _batch_digests(self, batch: DataFrame) -> DataFrame:
        p = self.params
        return batch.withColumn(
            "digest", F.md5(dedup.normalized_text(F.col(p["text_col"]))))

    def _refresh(self) -> None:
        # appends may come from another session (a foreachBatch sink's
        # micro-batch session); see MinHashIndex._refresh
        _be().refresh(self.spark, f"{self.name}_digests")

    def filter_new(self, batch: DataFrame,
                   replay_safe: bool = False) -> DataFrame:
        """Batch rows whose content has never been ingested: drops rows
        matching the index (anti-join on digest — the bucketed index
        side satisfies the join's distribution from its layout, so only
        the small batch side shuffles), then keeps the min-id row per
        digest WITHIN the batch (same survivor rule as dedup_exact).

        ``replay_safe=True`` is the at-least-once stream mode: index
        rows whose ``keep_id`` IS one of this batch's own ids are
        ignored (a crashed prior attempt may have appended this very
        batch — matching against its own digests would wrongly empty
        the replay).  Requires doc ids unique across the stream's
        lifetime, like ``MinHashIndex.dedup_batch``."""
        p = self.params
        self._refresh()
        idx = _be().read(self.spark, f"{self.name}_digests")
        if replay_safe:
            own = batch.select(F.col(p["id_col"]).alias("keep_id"))
            idx = idx.join(own, "keep_id", "left_anti")
        fresh = self._batch_digests(batch).join(idx, "digest", "left_anti")
        keep = (fresh.groupBy("digest")
                .agg(F.min(F.col(p["id_col"])).alias("_kid")))
        return (fresh.join(keep, on=F.col(p["id_col"]) == F.col("_kid"), how="leftsemi")
                .drop("digest"))

    def append(self, batch_survivors: DataFrame,
               if_absent: bool = False) -> None:
        """Record a deduped batch's digests (append keeps the bucketed
        layout; Spark validates the bucket spec against the catalog).
        ``if_absent=True`` makes the append idempotent (digests already
        indexed are skipped) — required for at-least-once replays."""
        p = self.params
        digests = (self._batch_digests(batch_survivors)
                   .select("digest", F.col(p["id_col"]).alias("keep_id"))
                   .groupBy("digest").agg(F.min("keep_id").alias("keep_id")))
        if if_absent:
            self._refresh()
            existing = _be().read(self.spark,
                                  f"{self.name}_digests").select("digest")
            digests = digests.join(existing, "digest", "left_anti") \
                             .localCheckpoint(eager=True)
        _be().append(digests, f"{self.name}_digests", "digest",
                     p["n_buckets"])

    def dedup_batch(self, batch: DataFrame,
                    replay_safe: bool = False) -> DataFrame:
        """filter_new + append of the survivors, returning the clean
        batch.  (Materializes the survivors before appending so the
        returned frame does not re-run the anti-join against the
        just-appended state.)  ``replay_safe``: see ``filter_new`` —
        a replayed batch produces the SAME clean frame as its first
        attempt and leaves the index unchanged."""
        clean = self.filter_new(batch, replay_safe=replay_safe) \
                    .localCheckpoint(eager=True)
        self.append(clean, if_absent=replay_safe)
        return clean

    def drop(self) -> None:
        _be().drop(self.spark, f"{self.name}_digests")
        _be().drop(self.spark, f"{self.name}_meta")


class MinHashIndex:
    """Near-dedup state: persisted banded LSH keys + signatures.

    Tables:
      {name}_bands  (band int, bucket int, id long)  bucketed by bucket
      {name}_sigs   (id long, sig array<long>)       bucketed by id
      {name}_meta   (params json)

    Probe plan shape (the scale property, plan-asserted in
    tests/test_dedup_index.py): the batch's band keys are explicitly
    broadcast, so the band table streams map-side — no Exchange touches
    index data; the verify step joins only the (small) candidate id set
    against the signature table.  Corpus text is never read.
    """

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        for suffix in ("_sigs", "_bands"):
            _recover_compaction(spark, f"{name}{suffix}")
        self.params = _read_meta(spark, name)

    def compact(self) -> None:
        """Fold each index table to one file per bucket (run after every
        N appended batches — same cadence logic as the streaming commit
        ledger's self-compaction).  Band rows are deduplicated here: a
        crash between append()'s two writes can leave duplicate band
        keys (harmless to probe correctness, see append)."""
        _compact_table(self.spark, f"{self.name}_sigs", "id",
                       self.params["n_buckets"])
        _compact_table(self.spark, f"{self.name}_bands", "bucket",
                       self.params["n_buckets"], distinct=True)

    # -- construction -------------------------------------------------

    @classmethod
    def create(cls, df: DataFrame, name: str, text_col: str = "text",
               id_col: str = "doc_id", num_hashes: int = 64, bands: int = 16,
               shingle_n: int = 3, seed: int = 42,
               n_buckets: int = 32) -> "MinHashIndex":
        spark = df.sparkSession
        params = {"text_col": text_col, "id_col": id_col,
                  "num_hashes": num_hashes, "bands": bands,
                  "shingle_n": shingle_n, "seed": seed, "n_buckets": n_buckets}
        sigs = dedup.minhash_signatures(df, text_col, id_col, num_hashes,
                                        shingle_n, seed)
        # one pass computes signatures; bands derive from the stored sigs
        # (a cheap re-read of the compact table, not a re-shingle)
        _be().write(sigs, f"{name}_sigs", "id", n_buckets)
        stored = _be().read(spark, f"{name}_sigs")
        _be().write(dedup.band_buckets(stored, bands), f"{name}_bands",
                    "bucket", n_buckets)
        _write_meta(spark, name, params)
        return cls(spark, name)

    # -- read paths ----------------------------------------------------

    def _batch_sigs(self, batch: DataFrame) -> DataFrame:
        p = self.params
        return dedup.minhash_signatures(batch, p["text_col"], p["id_col"],
                                        p["num_hashes"], p["shingle_n"], p["seed"])

    def _refresh(self) -> None:
        # appends may come from another session (a foreachBatch sink's
        # micro-batch session); drop this session's cached file listing
        # so index reads always see the latest appended state
        for suffix in ("_sigs", "_bands"):
            _be().refresh(self.spark, f"{self.name}{suffix}")

    def probe(self, batch: DataFrame, threshold: float = 0.8,
              broadcast_row_cap: int | None = None,
              bucket_cap: int | None = 1000) -> DataFrame:
        """(corpus_id, batch_id, est_jaccard): near-duplicate links from
        each batch document to already-ingested documents.

        Exactly the cross-partition subset of what a full-corpus
        ``minhash_near_duplicates`` run would emit (same signatures,
        same banding, same verify rule) — pytest-locked equivalence.

        The batch's band keys broadcast only while they fit
        (``broadcast_row_cap`` rows, default PROBE_BROADCAST_ROW_CAP);
        a backfill-sized batch instead equi-joins on (band, bucket)
        against the bucketed index, shuffling the batch side only.
        Batch signatures are materialized via eager localCheckpoint
        (blocks reclaimed on GC — a per-micro-batch cache() here would
        accumulate for the stream's lifetime).

        ``bucket_cap`` (default 1000, ``None`` = uncapped) bounds the
        corpus×batch candidate join against over-cap index buckets,
        exactly like every other family path: the index normally holds
        dedup SURVIVORS (band buckets live in a ~2^64 key space, so
        concentration needs near-identical signature slices, which
        dedup removes), but an index built over an UN-deduped corpus,
        or probed below the threshold it was deduped at, can hold mega
        buckets — without the cap those make the candidate join
        O(|corpus bucket| × |batch bucket|).  Over-cap buckets emit
        chain-verified candidates in signature order instead
        (``_chain_probe_pairs``): linear output, and a true near-dup
        still finds its match because near-identical signatures sort
        adjacent."""
        bsigs = self._batch_sigs(batch).localCheckpoint(eager=True)
        return self._probe_with_sigs(bsigs, threshold, broadcast_row_cap,
                                     bucket_cap)

    def _probe_with_sigs(self, bsigs: DataFrame, threshold: float,
                         broadcast_row_cap: int | None = None,
                         bucket_cap: int | None = 1000) -> DataFrame:
        """Probe core over MATERIALIZED batch signatures — the reuse
        point for ``dedup_batch``, which computes the batch signatures
        once and feeds probe, intra-batch dedup, and the append from
        the same frame."""
        p = self.params
        cap = PROBE_BROADCAST_ROW_CAP if broadcast_row_cap is None \
            else broadcast_row_cap
        self._refresh()
        bbands = (dedup.band_buckets(bsigs, p["bands"])
                  .withColumnRenamed("id", "batch_id"))
        probe_keys = bbands
        if bsigs.count() * p["bands"] <= cap:
            probe_keys = F.broadcast(probe_keys)
        ibands = _be().read(self.spark, f"{self.name}_bands")
        isigs = _be().read(self.spark, f"{self.name}_sigs")
        small_ibands, big = _split_overcap(ibands, ["band", "bucket"],
                                           bucket_cap)

        cands = (small_ibands.join(probe_keys, ["band", "bucket"])
                 .select(F.col("id").alias("corpus_id"), "batch_id")
                 .distinct())
        verified = (
            cands
            .join(isigs.select(F.col("id").alias("corpus_id"),
                               F.col("sig").alias("sig_a")), "corpus_id")
            .join(bsigs.select(F.col("id").alias("batch_id"),
                               F.col("sig").alias("sig_b")), "batch_id")
            .withColumn("est_jaccard", common.cached_expr(dedup._EST_JACCARD))
            .filter(F.col("est_jaccard") >= threshold)
            .select("corpus_id", "batch_id", "est_jaccard")
        )
        if big is None:
            return verified
        mega_c = (ibands.join(big, ["band", "bucket"], "left_semi")
                  .join(isigs, "id")
                  .select("band", "bucket", "id",
                          F.col("sig").alias("pay")))
        mega_b = (bbands.join(big, ["band", "bucket"], "left_semi")
                  .join(bsigs.select(F.col("id").alias("batch_id"), "sig"),
                        "batch_id")
                  .select("band", "bucket",
                          F.col("batch_id").alias("id"),
                          F.col("sig").alias("pay")))
        chain = (
            _chain_probe_pairs(mega_c, mega_b, ["band", "bucket"])
            .select("corpus_id", "batch_id",
                    F.col("pay_a").alias("sig_a"),
                    F.col("pay_b").alias("sig_b"))
            .withColumn("est_jaccard", common.cached_expr(dedup._EST_JACCARD))
            .filter(F.col("est_jaccard") >= threshold)
            .select("corpus_id", "batch_id", "est_jaccard"))
        # a pair can surface on both paths (small bucket in one band,
        # over-cap in another); est_jaccard is a pure function of the
        # two signatures, so max() is just deduplication
        return (verified.unionByName(chain)
                .groupBy("corpus_id", "batch_id")
                .agg(F.max("est_jaccard").alias("est_jaccard")))

    # -- write paths ---------------------------------------------------

    def append(self, batch_survivors: DataFrame, if_absent: bool = False,
               sigs: DataFrame | None = None) -> None:
        """Append a deduped batch's signatures and band keys so later
        batches dedup against it.  Bucketed appends preserve the layout.
        ``sigs``: precomputed signatures of EXACTLY the survivor rows
        (skips re-shingling — ``dedup_batch`` passes them).

        ``if_absent=True`` makes the append idempotent (only ids not
        already indexed are added) — required for at-least-once stream
        sinks, where a crashed micro-batch replays its append.  The
        batch signatures are checkpointed before the first write so the
        anti-join is not re-evaluated against the just-updated table
        (which would silently empty the second write).

        Crash-safety across the two table writes: bands are written
        FIRST and the replay guard keys on the LAST-written table
        (_sigs).  A crash between the writes leaves band keys without
        signatures; the replay's anti-join still sees those ids as
        absent, so both writes re-run — at worst duplicating band rows,
        which probe() dedups (candidates pass through distinct()) and
        compact() physically drops.  The reverse order would lose the
        batch's band keys forever (the guard would see the sigs and
        skip), silently disabling dedup against those documents."""
        p = self.params
        if sigs is None:
            sigs = self._batch_sigs(batch_survivors)
        if if_absent:
            self._refresh()
            existing = _be().read(self.spark,
                                  f"{self.name}_sigs").select("id")
            sigs = sigs.join(existing, "id", "left_anti")
        sigs = sigs.localCheckpoint(eager=True)
        _be().append(dedup.band_buckets(sigs, p["bands"]),
                     f"{self.name}_bands", "bucket", p["n_buckets"])
        _be().append(sigs, f"{self.name}_sigs", "id", p["n_buckets"])

    def dedup_batch(self, batch: DataFrame, threshold: float = 0.8,
                    bucket_cap: int | None = 1000,
                    replay_safe: bool = False) -> DataFrame:
        """The per-increment near-dedup: drop batch docs near-duplicating
        the corpus (corpus always wins — it was ingested first), then
        near-dedup the remainder against ITSELF (min-id survivor per
        connected component, same rule as the full-corpus path), append
        the survivors' state, and return the clean batch.

        Greedy-prefix semantics: a batch doc is dropped only if it
        near-matches an appended SURVIVOR or a same-batch doc.  A
        full-corpus run's transitive closure can additionally drop docs
        linked only through earlier-DROPPED intermediates (chain-shaped
        clusters: A~B dropped, B~C but C!~A — C survives here, not
        there).  For star-shaped clusters (members all matching the
        survivor — the common shape for crawl dups) the two agree
        exactly; the pytest equivalence suite locks that case.

        ``replay_safe=True`` is the at-least-once stream mode: matches
        whose corpus side IS one of this batch's own ids are ignored (a
        crashed prior attempt may have appended this very batch), and
        the append is ``if_absent`` — so a replayed batch produces the
        SAME clean frame as its first attempt and leaves the index
        unchanged.

        ``bucket_cap`` defaults to 1000 (linear worst-case intra-batch
        pair expansion, all pairs verified — see
        ``minhash_near_duplicates``); pass ``None`` for the uncapped
        exact-w.r.t.-banding mode."""
        p = self.params
        id_col = p["id_col"]
        # ONE signature pass for the whole increment: probe, intra-batch
        # dedup, and the index append all reuse this materialized frame
        # (signatures are the dominant per-batch map cost — md5 over
        # every shingle × num_hashes; re-deriving a subset is a cheap
        # semi-join against the checkpointed blocks)
        bsigs = self._batch_sigs(batch).localCheckpoint(eager=True)
        vs_corpus = self._probe_with_sigs(bsigs, threshold,
                                          bucket_cap=bucket_cap)
        if replay_safe:
            own = batch.select(F.col(id_col).alias("corpus_id"))
            vs_corpus = vs_corpus.join(own, "corpus_id", "left_anti")
        vs_corpus = vs_corpus.select(F.col("batch_id").alias("_dup")).distinct()
        remaining = batch.join(vs_corpus, F.col(id_col) == F.col("_dup"), "left_anti")

        def _sigs_of(rows: DataFrame) -> DataFrame:
            return bsigs.join(rows.select(F.col(id_col).alias("id")),
                              "id", "left_semi")

        intra = dedup.minhash_pairs_from_signatures(
            _sigs_of(remaining), p["bands"], threshold, bucket_cap)
        clean = dedup.dedup_near(remaining, intra, id_col).localCheckpoint(eager=True)
        self.append(clean, if_absent=replay_safe, sigs=_sigs_of(clean))
        return clean

    def drop(self) -> None:
        for suffix in ("_bands", "_sigs", "_meta"):
            _be().drop(self.spark, f"{self.name}{suffix}")


class SimHashIndex:
    """Hamming-near-dup state: persisted 64-bit fingerprints plus their
    4×16-bit pigeonhole band keys (two fingerprints within hamming 3
    must agree on at least one band — dedup.simhash_near_duplicates'
    candidate rule, applied incrementally).

    Tables:
      {name}_fps    (id long, simhash long, band int, key long)  bucketed by key
      {name}_meta   (params json)

    One table (the fingerprint rides along with each band row — 4×8
    bytes of duplication buys the verify step a join-free plan): a probe
    computes the batch's fingerprints (pure JVM expression), broadcasts
    its band keys, and evaluates hamming distance directly on the
    joined rows.  Probe results are pytest-locked to equal the
    cross-partition subset of the full-corpus (oracle-green)
    ``simhash_near_duplicates``.
    """

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        _recover_compaction(spark, f"{name}_fps")
        self.params = _read_meta(spark, name)

    def compact(self) -> None:
        _compact_table(self.spark, f"{self.name}_fps", "key",
                       self.params["n_buckets"], distinct=True)

    @classmethod
    def create(cls, df: DataFrame, name: str, text_col: str = "text",
               id_col: str = "doc_id", n_buckets: int = 32) -> "SimHashIndex":
        spark = df.sparkSession
        _be().write(cls._banded_fps(df, text_col, id_col),
                    f"{name}_fps", "key", n_buckets)
        _write_meta(spark, name, {"text_col": text_col, "id_col": id_col,
                                  "n_buckets": n_buckets})
        return cls(spark, name)

    @classmethod
    def _banded_fps(cls, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        # dedup.simhash_band_keys is the single source of the candidate
        # rule, shared with the full-corpus self-join path
        return dedup.simhash_band_keys(
            dedup.simhash_fingerprints(df, text_col, id_col))

    def _refresh(self) -> None:
        _be().refresh(self.spark, f"{self.name}_fps")

    def probe(self, batch: DataFrame, max_hamming: int = 3,
              broadcast_row_cap: int | None = None,
              bucket_cap: int | None = 1000) -> DataFrame:
        """(corpus_id, batch_id, hamming): every batch doc within
        ``max_hamming`` of an already-ingested fingerprint.  Broadcast
        gating and eager materialization as in ``MinHashIndex.probe``;
        ``bucket_cap`` bounds over-cap corpus band buckets with
        chain-verified candidates in fingerprint order (see
        ``MinHashIndex.probe`` — same rationale, same kernel;
        ``None`` = uncapped)."""
        p = self.params
        bfps = (self._banded_fps(batch, p["text_col"], p["id_col"])
                .localCheckpoint(eager=True))
        return self._probe_with_fps(bfps, max_hamming, broadcast_row_cap,
                                    bucket_cap)

    def _probe_with_fps(self, bfps: DataFrame, max_hamming: int,
                        broadcast_row_cap: int | None = None,
                        bucket_cap: int | None = 1000) -> DataFrame:
        """Probe core over MATERIALIZED banded batch fingerprints."""
        dedup.check_simhash_hamming(max_hamming)
        cap = PROBE_BROADCAST_ROW_CAP if broadcast_row_cap is None \
            else broadcast_row_cap
        self._refresh()
        b = bfps.select(F.col("id").alias("batch_id"),
                        F.col("simhash").alias("fp_b"), "band", "key")
        probe_keys = b
        if bfps.count() <= cap:
            probe_keys = F.broadcast(probe_keys)
        idx = _be().read(self.spark, f"{self.name}_fps")
        small_idx, big = _split_overcap(idx, ["band", "key"], bucket_cap)

        hamming = F.bit_count(F.col("simhash").bitwiseXOR(F.col("fp_b")))
        verified = (
            small_idx.join(probe_keys, ["band", "key"])
            .withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select(F.col("id").alias("corpus_id"), "batch_id", "hamming")
            .distinct()
        )
        if big is None:
            return verified
        mega_c = (idx.join(big, ["band", "key"], "left_semi")
                  .select("band", "key", "id",
                          F.col("simhash").alias("pay")))
        mega_b = (b.join(big, ["band", "key"], "left_semi")
                  .select("band", "key",
                          F.col("batch_id").alias("id"),
                          F.col("fp_b").alias("pay")))
        chain = (
            _chain_probe_pairs(mega_c, mega_b, ["band", "key"])
            .withColumn("hamming", F.bit_count(
                F.col("pay_a").bitwiseXOR(F.col("pay_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("corpus_id", "batch_id", "hamming"))
        return (verified.unionByName(chain)
                .groupBy("corpus_id", "batch_id")
                .agg(F.min("hamming").alias("hamming")))

    def append(self, batch_survivors: DataFrame, if_absent: bool = False,
               banded_fps: DataFrame | None = None) -> None:
        """``banded_fps``: precomputed banded fingerprint rows of EXACTLY
        the survivor rows (skips the text aggregate — ``dedup_batch``
        passes them)."""
        p = self.params
        rows = (banded_fps if banded_fps is not None
                else self._banded_fps(batch_survivors, p["text_col"], p["id_col"]))
        if if_absent:
            self._refresh()
            existing = (_be().read(self.spark, f"{self.name}_fps")
                        .select("id").distinct())
            rows = rows.join(existing, "id", "left_anti")
        _be().append(rows, f"{self.name}_fps", "key", p["n_buckets"])

    def dedup_batch(self, batch: DataFrame, max_hamming: int = 3,
                    replay_safe: bool = False,
                    bucket_cap: int | None = 1000) -> DataFrame:
        """Drop batch docs within ``max_hamming`` of the corpus, then
        hamming-dedup the remainder against itself (min-id survivor per
        connected component), append survivors, return the clean batch.
        Greedy-prefix semantics vs a full-corpus run: see
        ``MinHashIndex.dedup_batch``.  ``bucket_cap`` bounds intra-batch
        mega-bucket expansion with verified chain edges (see
        ``simhash_pairs_from_fingerprints``); ``None`` = uncapped."""
        p = self.params
        id_col = p["id_col"]
        # ONE fingerprint pass for the whole increment (see
        # MinHashIndex.dedup_batch — same reuse rationale)
        bfps = (self._banded_fps(batch, p["text_col"], p["id_col"])
                .localCheckpoint(eager=True))
        vs_corpus = self._probe_with_fps(bfps, max_hamming,
                                         bucket_cap=bucket_cap)
        if replay_safe:
            own = batch.select(F.col(id_col).alias("corpus_id"))
            vs_corpus = vs_corpus.join(own, "corpus_id", "left_anti")
        drop = vs_corpus.select(F.col("batch_id").alias("_dup")).distinct()
        remaining = batch.join(drop, F.col(id_col) == F.col("_dup"), "left_anti")

        def _fps_of(rows: DataFrame) -> DataFrame:
            return bfps.join(rows.select(F.col(id_col).alias("id")),
                             "id", "left_semi")

        intra = dedup.simhash_pairs_from_fingerprints(
            _fps_of(remaining).select("id", "simhash").distinct(), max_hamming,
            bucket_cap)
        clean = dedup.dedup_near(remaining, intra, id_col).localCheckpoint(eager=True)
        self.append(clean, if_absent=replay_safe, banded_fps=_fps_of(clean))
        return clean

    def drop(self) -> None:
        for suffix in ("_fps", "_meta"):
            _be().drop(self.spark, f"{self.name}{suffix}")


class EmbeddingIndex:
    """Embedding-cosine near-dup state: persisted vectors with their
    banded hyperplane-LSH keys — the embedding-side member of the
    incremental index family (digest / minhash / simhash / embedding),
    laid out like ``MinHashIndex`` (slim key table + payload table, so
    vectors are stored ONCE regardless of the band count).

    Tables:
      {name}_vecs     (id long, vec array<...>, osig long)  bucketed by id
      {name}_buckets  (band int, bucket long, id long)      bucketed by bucket
      {name}_meta     (params json incl. the hyperplane family: n_planes,
                       bands, seed, dim — the planes themselves are
                       deterministic from these, never persisted; the
                       chain-ordering family derives from the same seed)

    A probe computes the batch's band keys map-side (pure JVM sign-bit
    expressions), broadcasts the batch side while it fits (size-gated
    like ``MinHashIndex.probe``), joins the slim bucket table, and
    verifies candidates with the exact cosine on the vectors joined
    back by id.  ``bucket_cap`` bounds mega-bucket candidate output:
    with only 2^n_planes buckets per band a dense embedding region
    concentrates in one bucket, and an uncapped corpus×batch join there
    is O(|corpus_bucket| × |batch_bucket|); over-cap buckets instead
    verify each batch vector against its nearest corpus neighbors in
    chain-ordering-signature order — linear output, and a true
    near-duplicate still finds a verified corpus match because
    near-identical vectors sort adjacent.  Probe results are
    pytest-locked to equal the cross-partition subset of the
    full-corpus ``similarity.cosine_near_duplicates`` run with the same
    family (exact equality below the cap; the capped path preserves the
    drop/keep decision).
    """

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        for suffix in ("_vecs", "_buckets"):
            _recover_compaction(spark, f"{name}{suffix}")
        self._recover_rebucket()
        if (_be().exists(spark, f"{name}_vecs")
                and not _be().exists(spark, f"{name}_buckets")):
            raise RuntimeError(
                f"index {name!r} uses the pre-round single-table layout "
                "((id, vec, bucket), no _buckets table) — rebuild it with "
                "EmbeddingIndex.create from the source vectors (the old "
                "layout stored no ordering signature, so it cannot be "
                "migrated in place)")
        self.params = _read_meta(spark, name)
        # meta written before the banded layout carries no bands key
        self.params.setdefault("bands", 1)

    def compact(self) -> None:
        _compact_table(self.spark, f"{self.name}_vecs", "id",
                       self.params["n_buckets"])
        _compact_table(self.spark, f"{self.name}_buckets", "bucket",
                       self.params["n_buckets"], distinct=True)

    def rebucket(self, n_planes: int | None = None,
                 bands: int | None = None) -> None:
        """Re-derive the band-key table from the stored vectors under a
        new hyperplane geometry — the maintenance op that keeps
        per-increment probe cost flat as the corpus grows.

        Per-batch probe candidates grow ∝ corpus / 2^n_planes (there
        are only that many buckets per band), so an index created for
        last quarter's corpus size gradually loses its pruning power.
        This rewrites ONLY the slim key table (the vectors are the
        payload table and are untouched), staged-then-swapped like
        compaction: the staged META table is the commit point — written
        last, so a crash beforehand leaves the live geometry fully
        consistent and the re-run starts over, while recovery on next
        open rolls a committed rebucket FORWARD (buckets swap, then
        meta swap) so probes never see mismatched planes-vs-keys."""
        from dlx_spark.operators import similarity

        p = dict(self.params)
        p["n_planes"] = int(n_planes or p["n_planes"])
        p["bands"] = int(bands or p["bands"])
        # a concurrent append lands keys under the OLD geometry; unlike
        # compaction those rows cannot be merged through the swap (they
        # would be silently unfindable under the new planes), so the
        # publish detects the conflict and fails the rebucket instead
        token = _be().snapshot_token(self.spark, f"{self.name}_buckets")
        vecs = _be().read(self.spark, f"{self.name}_vecs")
        keys = similarity.banded_lsh_keys(vecs, p["bands"], p["n_planes"],
                                          p["seed"], vec_col="vec",
                                          id_col="id", dim=p["dim"])
        _be().write(keys, f"{self.name}_buckets__rebucket", "bucket",
                    p["n_buckets"])
        # conflict check BEFORE the commit point: once the staged meta
        # exists, a crash rolls the rebucket FORWARD on reopen — so
        # refuse to arm the commit point if an append already landed
        # (the publish itself re-checks; this narrows the crash window
        # between a detected conflict and its stage cleanup)
        if _be().snapshot_token(self.spark, f"{self.name}_buckets") != token:
            _be().drop(self.spark, f"{self.name}_buckets__rebucket")
            raise tableio.ConcurrentWriteError(
                f"rebucket({self.name}): index was appended to while "
                f"re-keying — re-run rebucket")
        # intent: persist the snapshot token the staged keys were
        # derived from, so RECOVERY can re-run the same conflict check —
        # an append landing after this point (even followed by a crash)
        # is detected on reopen and the stage discarded instead of
        # rolled forward with the append's keys dropped.  On the
        # versioned backend the commit_section CLOSES the round-5
        # residual window; on the parquet backend the recovery-time
        # check is still check-then-act (token compare, then
        # DROP+RENAME), so an append landing inside that act is only
        # NARROWED out, not excluded — the single-writer contract is
        # what rules it out there
        _be().write_plain(
            self.spark.createDataFrame([(json.dumps(token),)],
                                       "token string"),
            f"{self.name}_rebucket_intent")
        # commit point: staged meta present => the new geometry WILL be
        # published (roll-forward); absent => staged keys are garbage
        _be().write_plain(
            self.spark.createDataFrame([(json.dumps(p),)], "params string"),
            f"{self.name}_meta__rebucket")
        try:
            self._recover_rebucket(buckets_token=token)
        except tableio.ConcurrentWriteError:
            # leave the live index exactly as the concurrent writer
            # sees it; the caller re-runs rebucket over the grown corpus
            self._drop_rebucket_stages()
            raise
        self.params = _read_meta(self.spark, self.name)

    def _drop_rebucket_stages(self) -> None:
        for t in (f"{self.name}_meta__rebucket",
                  f"{self.name}_buckets__rebucket",
                  f"{self.name}_rebucket_intent"):
            _be().drop(self.spark, t)

    def _recover_rebucket(self, buckets_token=None) -> None:
        """Finish (or discard) an interrupted ``rebucket``: a staged
        meta table means the swap was committed — publish keys then
        meta, in that order, so a crash mid-recovery re-enters here; a
        staged key table WITHOUT the meta commit point is a dead stage
        from a pre-commit crash and is dropped.

        ``buckets_token`` is only passed by the live ``rebucket`` call;
        the reopen-recovery path reads the token the crashed rebucket
        persisted in ``{name}_rebucket_intent`` and re-runs the SAME
        conflict-fail publish — an append that landed between the
        crashed run's conflict check and its crash is therefore
        detected on reopen and the stage DISCARDED (old geometry kept,
        the appended keys live), instead of rolled forward with those
        keys dropped.  A meta stage without an intent (pre-round-6
        crash state) replays tokenlessly — the crashed protocol owned
        the table under the old contract."""
        spark = self.spark
        meta_stage = f"{self.name}_meta__rebucket"
        keys_stage = f"{self.name}_buckets__rebucket"
        intent = f"{self.name}_rebucket_intent"
        if _be().exists(spark, meta_stage):
            token = buckets_token
            if token is None and _be().exists(spark, intent):
                token = json.loads(_be().read(spark, intent)
                                   .first()["token"])
            try:
                if _be().exists(spark, keys_stage):
                    if _be().replace_published(spark, f"{self.name}_buckets",
                                               keys_stage):
                        # the buckets swap already committed and only
                        # its staged drop was lost: replaying the
                        # conflict-checked replace here would count the
                        # published segments themselves as "gained"
                        # and wrongly fail — finish the cleanup and
                        # proceed to the meta swap
                        _be().drop(spark, keys_stage)
                    else:
                        _be().replace(spark, f"{self.name}_buckets",
                                      keys_stage, token=token,
                                      on_conflict="fail")
                _be().replace(spark, f"{self.name}_meta", meta_stage)
            except tableio.ConcurrentWriteError:
                if buckets_token is not None:
                    raise      # live rebucket: caller cleans and re-raises
                self._drop_rebucket_stages()
                return
            _be().drop(spark, intent)
        else:
            if _be().exists(spark, keys_stage):
                _be().drop(spark, keys_stage)
            _be().drop(spark, intent)

    @classmethod
    def create(cls, df: DataFrame, name: str, vec_col: str = "embedding",
               id_col: str = "vec_id", n_planes: int = 8, bands: int = 1,
               seed: int = 42, n_buckets: int = 32,
               dim: int | None = None) -> "EmbeddingIndex":
        from dlx_spark.operators import similarity

        spark = df.sparkSession
        if dim is None:
            head = df.select(vec_col).first()
            if head is None:
                raise ValueError("cannot infer dim from an empty frame — pass dim")
            dim = len(head[0])
        params = {"vec_col": vec_col, "id_col": id_col, "n_planes": n_planes,
                  "bands": bands, "seed": seed, "dim": dim,
                  "n_buckets": n_buckets}
        oplanes = similarity.order_planes(dim, seed)
        vrows = df.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("vec"),
                          similarity._order_sig_expr(vec_col, oplanes)
                          .alias("osig"))
        _be().write(vrows, f"{name}_vecs", "id", n_buckets)
        # band keys derive from the stored vectors (a cheap columnar
        # re-read, not a second pass over the source)
        stored = _be().read(spark, f"{name}_vecs")
        _be().write(similarity.banded_lsh_keys(stored, bands, n_planes, seed,
                                               vec_col="vec", id_col="id",
                                               dim=dim),
                    f"{name}_buckets", "bucket", n_buckets)
        _write_meta(spark, name, params)
        return cls(spark, name)

    def _batch_vecs(self, batch: DataFrame) -> DataFrame:
        """(id, vec, osig) rows of a batch — the ONE per-increment
        projection that probe, intra dedup, and append all reuse."""
        from dlx_spark.operators import similarity

        p = self.params
        oplanes = similarity.order_planes(p["dim"], p["seed"])
        return batch.select(F.col(p["id_col"]).alias("id"),
                            F.col(p["vec_col"]).alias("vec"),
                            similarity._order_sig_expr(p["vec_col"], oplanes)
                            .alias("osig"))

    def _band_keys(self, vecs: DataFrame) -> DataFrame:
        from dlx_spark.operators import similarity

        p = self.params
        return similarity.banded_lsh_keys(vecs, p["bands"], p["n_planes"],
                                          p["seed"], vec_col="vec",
                                          id_col="id", dim=p["dim"])

    def _refresh(self) -> None:
        for suffix in ("_vecs", "_buckets"):
            _be().refresh(self.spark, f"{self.name}{suffix}")

    def probe(self, batch: DataFrame, threshold: float = 0.9,
              multiprobe_hamming: int = 0,
              broadcast_row_cap: int | None = None,
              bucket_cap: int | None = 1000) -> DataFrame:
        """(corpus_id, batch_id, cosine): every batch vector whose exact
        cosine to an already-ingested vector clears ``threshold``, among
        LSH candidates.  Recall levers as in
        ``similarity.cosine_near_duplicates``: the index's ``bands``
        (fixed at create time) are the scale path;
        ``multiprobe_hamming`` is the single-band legacy knob.
        ``bucket_cap`` (default 1000, ``None`` = uncapped) bounds
        mega-bucket candidates via the nearest-in-order chain."""
        bvecs = self._batch_vecs(batch).localCheckpoint(eager=True)
        return self._probe_with_vecs(bvecs, threshold, multiprobe_hamming,
                                     broadcast_row_cap, bucket_cap)

    def _probe_with_vecs(self, bvecs: DataFrame, threshold: float,
                         multiprobe_hamming: int = 0,
                         broadcast_row_cap: int | None = None,
                         bucket_cap: int | None = 1000) -> DataFrame:
        from pyspark.sql import Window

        from dlx_spark.operators import similarity

        p = self.params
        cap = PROBE_BROADCAST_ROW_CAP if broadcast_row_cap is None \
            else broadcast_row_cap
        if p["bands"] > 1 and multiprobe_hamming:
            raise ValueError("multiprobe applies to single-band indexes; "
                             "this index uses bands for recall")
        self._refresh()
        bb = self._band_keys(bvecs)
        n_masks = 1
        probe_keys = bb.withColumnRenamed("id", "batch_id")
        if multiprobe_hamming:
            masks = similarity.multiprobe_masks(p["n_planes"],
                                                multiprobe_hamming)
            n_masks = len(masks)
            probe_keys = probe_keys.select(
                "batch_id", "band",
                F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m))
                                    for m in masks])).alias("bucket"))
        if bvecs.count() * p["bands"] * n_masks <= cap:
            probe_keys = F.broadcast(probe_keys)

        idxb = _be().read(self.spark, f"{self.name}_buckets")
        idxv = _be().read(self.spark, f"{self.name}_vecs")

        if bucket_cap is None:
            big = None
            small_idxb = idxb
        else:
            big = (idxb.groupBy("band", "bucket")
                   .agg(F.count(F.lit(1)).alias("_n"))
                   .filter(F.col("_n") > int(bucket_cap))
                   .select("band", "bucket"))
            small_idxb = idxb.join(F.broadcast(big), ["band", "bucket"],
                                   "left_anti")

        cands = (small_idxb.join(probe_keys, ["band", "bucket"])
                 .select(F.col("id").alias("corpus_id"), "batch_id")
                 .distinct())
        verified = (
            cands
            .join(idxv.select(F.col("id").alias("corpus_id"),
                              F.col("vec").alias("cvec")), "corpus_id")
            .join(bvecs.select(F.col("id").alias("batch_id"),
                               F.col("vec").alias("pvec")), "batch_id")
            .withColumn("cosine", similarity.pairwise_cosine_expr())
            .filter(F.col("cosine") >= threshold)
            .select("corpus_id", "batch_id", "cosine"))

        if big is not None:
            # mega-buckets: sort corpus + batch members together in
            # (osig, id) order; each batch vector is verified against
            # the nearest corpus row on each side (however far — the
            # ignorenulls scan skips interleaved batch rows) PLUS any
            # corpus rows within CHAIN_WINDOW union positions, so up to
            # a few closer-in-projection foreign corpus rows cannot
            # hide the true match.  Linear output; a true near-dup
            # sorts within ε of its match on the continuous projection.
            # (Multiprobe edges INTO a mega-bucket are dropped — the
            # m × probe-row expansion is the blow-up the cap prevents.)
            CW = similarity.CHAIN_WINDOW
            mega_c = (idxb.join(F.broadcast(big), ["band", "bucket"],
                                "left_semi")
                      .join(idxv, "id")
                      .select("band", "bucket", "id", "vec", "osig",
                              F.lit(True).alias("is_corpus")))
            mega_b = (bb.join(F.broadcast(big), ["band", "bucket"],
                              "left_semi")
                      .join(bvecs, "id")
                      .select("band", "bucket", "id", "vec", "osig",
                              F.lit(False).alias("is_corpus")))
            u = mega_c.unionByName(mega_b)
            w = Window.partitionBy("band", "bucket").orderBy(
                "osig", "id", "is_corpus")
            cstruct = F.when(F.col("is_corpus"),
                             F.struct(F.col("id").alias("cid"),
                                      F.col("vec").alias("cvec")))
            neighbors = [
                F.last(cstruct, ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)),
                F.first(cstruct, ignorenulls=True).over(
                    w.rowsBetween(1, Window.unboundedFollowing)),
            ] + [F.lag(cstruct, k).over(w) for k in range(1, CW + 1)] \
              + [F.lead(cstruct, k).over(w) for k in range(1, CW + 1)]
            chain = (
                u.withColumn("_cands", F.array_compact(F.array(*neighbors)))
                .filter(~F.col("is_corpus"))
                .select(F.col("id").alias("batch_id"),
                        F.col("vec").alias("pvec"),
                        F.explode("_cands").alias("c"))
                .select("batch_id", "pvec",
                        F.col("c.cid").alias("corpus_id"),
                        F.col("c.cvec").alias("cvec"))
                .distinct()
                .withColumn("cosine", similarity.pairwise_cosine_expr())
                .filter(F.col("cosine") >= threshold)
                .select("corpus_id", "batch_id", "cosine"))
            verified = verified.unionByName(chain)

        return (verified.groupBy("corpus_id", "batch_id")
                .agg(F.max("cosine").alias("cosine")))

    def append(self, batch_survivors: DataFrame, if_absent: bool = False,
               vecs: DataFrame | None = None) -> None:
        """``vecs``: precomputed (id, vec, osig) rows of EXACTLY the
        survivor rows (``dedup_batch`` passes them).

        Crash-safety across the two table writes mirrors
        ``MinHashIndex.append``: band keys are written FIRST and the
        replay guard keys on the LAST-written table (_vecs), so a crash
        between the writes at worst duplicates band rows (probe dedups
        candidates; compact physically drops them)."""
        p = self.params
        rows = vecs if vecs is not None else self._batch_vecs(batch_survivors)
        if if_absent:
            self._refresh()
            existing = _be().read(self.spark,
                                  f"{self.name}_vecs").select("id")
            rows = rows.join(existing, "id", "left_anti")
        rows = rows.localCheckpoint(eager=True)
        _be().append(self._band_keys(rows), f"{self.name}_buckets",
                     "bucket", p["n_buckets"])
        _be().append(rows, f"{self.name}_vecs", "id", p["n_buckets"])

    def dedup_batch(self, batch: DataFrame, threshold: float = 0.9,
                    multiprobe_hamming: int = 0,
                    replay_safe: bool = False,
                    bucket_cap: int | None = 1000) -> DataFrame:
        """Drop batch vectors near-duplicating the corpus (corpus wins),
        cosine-dedup the remainder against itself (min-id survivor per
        connected component), append survivors, return the clean batch.
        Greedy-prefix semantics and ``replay_safe`` contract as in
        ``MinHashIndex.dedup_batch``.  The intra-batch dedup runs the
        SAME candidate rule as the probe — bands, multiprobe neighbor
        expansion, and the mega-bucket cap all apply to both sides."""
        from dlx_spark.operators import similarity

        p = self.params
        id_col = p["id_col"]
        # ONE vector/ordering pass feeds probe, intra dedup, and append
        bvecs = self._batch_vecs(batch).localCheckpoint(eager=True)
        vs_corpus = self._probe_with_vecs(bvecs, threshold,
                                          multiprobe_hamming,
                                          bucket_cap=bucket_cap)
        if replay_safe:
            own = batch.select(F.col(id_col).alias("corpus_id"))
            vs_corpus = vs_corpus.join(own, "corpus_id", "left_anti")
        drop = vs_corpus.select(F.col("batch_id").alias("_dup")).distinct()
        remaining = batch.join(drop, F.col(id_col) == F.col("_dup"), "left_anti")

        def _vecs_of(rows: DataFrame) -> DataFrame:
            return bvecs.join(rows.select(F.col(id_col).alias("id")),
                              "id", "left_semi")

        rem = _vecs_of(remaining)
        masks = (similarity.multiprobe_masks(p["n_planes"],
                                             multiprobe_hamming)
                 if multiprobe_hamming else None)
        intra = (similarity.cosine_pairs_from_keys(
            self._band_keys(rem), rem, threshold, bucket_cap, masks)
            .select("id_a", "id_b"))
        clean = dedup.dedup_near(remaining, intra, id_col).localCheckpoint(eager=True)
        self.append(clean, if_absent=replay_safe, vecs=_vecs_of(clean))
        return clean

    def drop(self) -> None:
        for suffix in ("_vecs", "_buckets", "_meta"):
            _be().drop(self.spark, f"{self.name}{suffix}")
        # a crashed rebucket's stages/intent must not outlive the index
        self._drop_rebucket_stages()


class SegmentIndex:
    """Incremental corpus-level SEGMENT dedup state (the C4-style
    repeated-unit rule of ``spans.segment_dedup``, batched): the digest
    of every segment ever KEPT, bucketed by digest.

    Per-batch cost: segment the batch (map-only), one anti-join against
    the bucketed digest table (index side satisfies the join's
    distribution from its layout — only the batch shuffles), a
    batch-internal first-occurrence pick, and a bucketed append of the
    batch's kept digests.  The corpus text is never rescanned.

    Sequential equivalence anchor (pytest): feeding doc-id-ordered
    batches through ``dedup_batch`` produces exactly the full-corpus
    ``spans.segment_dedup`` output, because the global first-occurrence
    order (doc_id, seg_idx) is the batch arrival order."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        _recover_compaction(spark, f"{name}_segments")
        self.params = _read_meta(spark, name)

    def compact(self) -> None:
        _compact_table(self.spark, f"{self.name}_segments", "digest",
                       self.params["n_buckets"])

    @classmethod
    def create_empty(cls, spark: SparkSession, name: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     unit_words: int = 10, normalize: bool = True,
                     n_buckets: int = 32) -> "SegmentIndex":
        """An empty index: the stream-ingest shape, where every corpus
        batch (including the first) flows through ``dedup_batch``."""
        if unit_words < 1:
            raise ValueError("unit_words must be >= 1")
        empty = spark.createDataFrame(
            [], "digest string, keep_id long")
        _be().write(empty, f"{name}_segments", "digest", n_buckets)
        _write_meta(spark, name, {
            "text_col": text_col, "id_col": id_col,
            "unit_words": unit_words, "normalize": normalize,
            "n_buckets": n_buckets})
        return cls(spark, name)

    @classmethod
    def create(cls, df: DataFrame, name: str, text_col: str = "text",
               id_col: str = "doc_id", unit_words: int = 10,
               normalize: bool = True, n_buckets: int = 32) -> "SegmentIndex":
        """Index an existing corpus: every distinct segment digest with
        the id of the document whose copy was kept."""
        idx = cls.create_empty(df.sparkSession, name, text_col, id_col,
                               unit_words, normalize, n_buckets)
        from dlx_spark.operators import spans as _spans
        segs = _spans.word_segments(df, text_col, id_col, unit_words,
                                    normalize)
        digests = (segs
                   .select(F.md5("seg_text").alias("digest"),
                           F.col("doc_id").cast("long").alias("keep_id"))
                   .groupBy("digest").agg(F.min("keep_id").alias("keep_id")))
        _be().append(digests, f"{name}_segments", "digest", n_buckets)
        return idx

    def _batch_segments(self, batch: DataFrame) -> DataFrame:
        from dlx_spark.operators import spans as _spans
        p = self.params
        return _spans.word_segments(batch, p["text_col"], p["id_col"],
                                    p["unit_words"], p["normalize"]) \
                     .withColumn("digest", F.md5("seg_text"))

    def _refresh(self) -> None:
        _be().refresh(self.spark, f"{self.name}_segments")

    def _kept_and_rebuilt(self, batch: DataFrame,
                          replay_safe: bool) -> tuple[DataFrame, DataFrame]:
        from dlx_spark.operators import spans as _spans
        from pyspark.sql import Window
        p = self.params
        self._refresh()
        idx = _be().read(self.spark, f"{self.name}_segments")
        if replay_safe:
            own = batch.select(F.col(p["id_col"]).cast("long")
                               .alias("keep_id"))
            idx = idx.join(own, "keep_id", "left_anti")
        segs = self._batch_segments(batch)
        fresh = segs.join(idx.select("digest"), "digest", "left_anti")
        w = Window.partitionBy("digest").orderBy("doc_id", "seg_idx")
        kept = (fresh.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("doc_id", "seg_idx", "seg_text", "digest"))
        totals = _spans.segment_totals(batch, p["text_col"], p["id_col"],
                                       p["unit_words"], p["normalize"])
        return kept, _spans.rebuild_documents(
            kept.select("doc_id", "seg_idx", "seg_text"), totals)

    def filter_new(self, batch: DataFrame,
                   replay_safe: bool = False) -> DataFrame:
        """Rebuilt batch documents with every segment already in the
        index (or duplicated earlier in the batch) removed — same
        output schema as ``spans.segment_dedup``.  ``replay_safe``:
        index rows kept FROM this batch's own doc ids are ignored, so
        an at-least-once replay reproduces its first attempt."""
        _, rebuilt = self._kept_and_rebuilt(batch, replay_safe)
        return rebuilt

    def append_kept(self, kept_segments: DataFrame,
                    if_absent: bool = False) -> None:
        """Record kept segments' digests.  ``if_absent=True`` makes the
        append idempotent for at-least-once replays."""
        p = self.params
        digests = (kept_segments
                   .select("digest",
                           F.col("doc_id").cast("long").alias("keep_id"))
                   .groupBy("digest").agg(F.min("keep_id").alias("keep_id")))
        if if_absent:
            self._refresh()
            existing = _be().read(self.spark,
                                  f"{self.name}_segments").select("digest")
            digests = digests.join(existing, "digest", "left_anti") \
                             .localCheckpoint(eager=True)
        _be().append(digests, f"{self.name}_segments", "digest",
                     p["n_buckets"])

    def dedup_batch(self, batch: DataFrame,
                    replay_safe: bool = False) -> DataFrame:
        """filter_new + append of the batch's kept segment digests.
        The kept set is pinned (localCheckpoint) BEFORE the append so
        neither returned frame re-runs its anti-join against the
        just-appended state; the digests are appended from the kept
        SEGMENTS, never re-derived from the rebuilt text (re-splitting
        a rebuilt document would shift window alignment whenever a
        mid-document segment was cut)."""
        kept, rebuilt = self._kept_and_rebuilt(batch, replay_safe)
        kept = kept.localCheckpoint(eager=True)
        rebuilt = rebuilt.localCheckpoint(eager=True)
        self.append_kept(kept, if_absent=replay_safe)
        return rebuilt

    def drop(self) -> None:
        _be().drop(self.spark, f"{self.name}_segments")
        _be().drop(self.spark, f"{self.name}_meta")


class SpanIndex:
    """Incremental duplicated-SPAN cutting (the keep-first rule of
    ``spans.cut_duplicate_spans``, batched): the digest of every
    stride-1 k-word window ever seen, with its first (doc, pos)
    occurrence, bucketed by digest.

    Per-batch semantics (min_docs=2, keep_first — the Lee-et-al
    setting; other configurations have no incremental form because
    they need global distinct-doc counts):

    - a batch window whose digest is in the index is CUT (the first
      occurrence kept its copy in an earlier batch);
    - among fresh digests, a window content in >=2 distinct batch docs
      keeps only its (doc, pos)-first occurrence;
    - all fresh digests append with their first occurrence, so a
      FUTURE batch occurrence is cut even when today's was unique.

    Sequential equivalence (pytest): doc-id-ordered batches through
    ``dedup_batch`` emit exactly what a full-corpus
    ``cut_duplicate_spans(keep_first=True)`` would emit for those docs,
    because a window's global first occurrence is its first arrival.
    """

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        _recover_compaction(spark, f"{name}_windows")
        self.params = _read_meta(spark, name)

    def compact(self) -> None:
        _compact_table(self.spark, f"{self.name}_windows", "digest",
                       self.params["n_buckets"])

    @classmethod
    def create_empty(cls, spark: SparkSession, name: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     k: int = 15, normalize: bool = True,
                     n_buckets: int = 32) -> "SpanIndex":
        if k < 1:
            raise ValueError("k must be >= 1")
        empty = spark.createDataFrame(
            [], "digest string, keep_id long, keep_pos long")
        _be().write(empty, f"{name}_windows", "digest", n_buckets)
        _write_meta(spark, name, {
            "text_col": text_col, "id_col": id_col, "k": k,
            "normalize": normalize, "n_buckets": n_buckets})
        return cls(spark, name)

    @classmethod
    def create(cls, df: DataFrame, name: str, text_col: str = "text",
               id_col: str = "doc_id", k: int = 15,
               normalize: bool = True, n_buckets: int = 32) -> "SpanIndex":
        """Index an existing corpus's windows (first occurrences)."""
        idx = cls.create_empty(df.sparkSession, name, text_col, id_col,
                               k, normalize, n_buckets)
        from dlx_spark.operators import spans as _spans
        wins = _spans.word_windows(df, text_col, id_col, k, normalize)
        firsts = (wins.groupBy("digest")
                  .agg(F.min(F.struct("doc_id", "pos")).alias("_f"))
                  .select("digest",
                          F.col("_f.doc_id").cast("long").alias("keep_id"),
                          F.col("_f.pos").cast("long").alias("keep_pos")))
        _be().append(firsts, f"{name}_windows", "digest", n_buckets)
        return idx

    def _refresh(self) -> None:
        _be().refresh(self.spark, f"{self.name}_windows")

    def _cut_and_fresh(self, batch: DataFrame,
                       replay_safe: bool) -> tuple[DataFrame, DataFrame,
                                                   DataFrame, DataFrame]:
        from dlx_spark.operators import spans as _spans
        p = self.params
        self._refresh()
        idx = _be().read(self.spark, f"{self.name}_windows")
        if replay_safe:
            own = batch.select(F.col(p["id_col"]).cast("long")
                               .alias("keep_id"))
            idx = idx.join(own, "keep_id", "left_anti")
        base = _spans._doc_tokens(batch, p["text_col"], p["id_col"],
                                  p["normalize"])
        wins = _spans._windows_of(base, p["k"]).cache()

        hist_cut = wins.join(idx.select("digest"), "digest", "left_semi") \
                       .select("doc_id", "pos")
        fresh = wins.join(idx.select("digest"), "digest", "left_anti")
        grp = fresh.groupBy("digest").agg(
            F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"),
            F.min(F.struct("doc_id", "pos")).alias("_first"))
        intra_dup = grp.filter(F.col("_lo") != F.col("_hi")) \
                       .select("digest", "_first")
        intra_cut = (fresh.join(intra_dup, "digest")
                     .filter((F.col("doc_id") != F.col("_first.doc_id"))
                             | (F.col("pos") != F.col("_first.pos")))
                     .select("doc_id", "pos"))
        firsts = grp.select(
            "digest", F.col("_first.doc_id").cast("long").alias("keep_id"),
            F.col("_first.pos").cast("long").alias("keep_pos"))
        return base, hist_cut.unionByName(intra_cut), firsts, wins

    def filter_new(self, batch: DataFrame,
                   replay_safe: bool = False) -> DataFrame:
        """Batch docs with every historically- or batch-duplicated
        window cut (keep-first) — same output schema as
        ``spans.cut_duplicate_spans``.  Does not mutate the index."""
        from dlx_spark.operators import spans as _spans
        base, cuts, _, _wins = self._cut_and_fresh(batch, replay_safe)
        # the cache stays live here: the returned frame is lazy and
        # both its cut branches re-read the windows when materialized
        return _spans.apply_window_cuts(base, cuts, self.params["k"])

    def append_firsts(self, firsts: DataFrame,
                      if_absent: bool = False) -> None:
        """Record a batch's fresh window digests (first occurrences).
        ``if_absent=True`` makes replays idempotent."""
        p = self.params
        if if_absent:
            self._refresh()
            existing = _be().read(self.spark,
                                  f"{self.name}_windows").select("digest")
            firsts = firsts.join(existing, "digest", "left_anti") \
                           .localCheckpoint(eager=True)
        _be().append(firsts, f"{self.name}_windows", "digest",
                     p["n_buckets"])

    def dedup_batch(self, batch: DataFrame,
                    replay_safe: bool = False) -> DataFrame:
        """filter_new + append of the batch's fresh window digests,
        both pinned before the append so neither re-runs against the
        just-appended state."""
        from dlx_spark.operators import spans as _spans
        base, cuts, firsts, wins = self._cut_and_fresh(batch, replay_safe)
        firsts = firsts.localCheckpoint(eager=True)
        cleaned = _spans.apply_window_cuts(base, cuts, self.params["k"]) \
                        .localCheckpoint(eager=True)
        # both consumers are pinned — release the per-batch window cache
        # so a long-running ingest stream does not accumulate one cached
        # relation per micro-batch (the SemDeDup-append lesson)
        wins.unpersist()
        self.append_firsts(firsts, if_absent=replay_safe)
        return cleaned

    def drop(self) -> None:
        _be().drop(self.spark, f"{self.name}_windows")
        _be().drop(self.spark, f"{self.name}_meta")
