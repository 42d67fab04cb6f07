"""VersionedTableBackend: manifest-committed parquet tables — atomic
single-rename commits, snapshot-isolated readers, optimistic-concurrency
appends, provenance-proved replace recovery, time travel, vacuum.

This is the transactional implementation of the tableio seam the README
concurrency contract points to (the Delta-protocol stand-in on plain
parquet); every test here exercises the backend either directly or
through an unmodified index class from operators/dedup_index.py.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dlx_spark import fsio, tableio
from dlx_spark.tableio_versioned import VersionedTableBackend


@pytest.fixture
def be(tmp_path):
    return VersionedTableBackend(root=str(tmp_path / "vroot"))


def _df(spark, rows, schema="id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_write_read_roundtrip_and_clustered_segments(spark, be):
    df = _df(spark, [(i, f"doc {i}") for i in range(20)])
    be.write(df, "t1", "id", 4)
    got = sorted(r["id"] for r in be.read(spark, "t1").collect())
    assert got == list(range(20))
    assert be.exists(spark, "t1")
    # exactly one committed manifest; segment written clustered into
    # n_buckets files (hash-repartitioned by key)
    assert be.versions(spark, "t1") == [1]
    seg = be._read_manifest(spark, "t1", 1)["segments"][0]
    parts = [n for n in fsio.listdir(spark, be._data_dir(spark, seg))
             if n.startswith("part-")]
    assert len(parts) == 4


def test_append_and_snapshot_isolation(spark, be):
    be.write(_df(spark, [(1, "a"), (2, "b")]), "t2", "id", 2)
    snapshot = be.read(spark, "t2")        # resolved BEFORE the append
    be.append(_df(spark, [(3, "c")]), "t2", "id", 2)
    # the old DataFrame is pinned to version-1 segments
    assert snapshot.count() == 2
    assert be.read(spark, "t2").count() == 3
    assert be.versions(spark, "t2") == [1, 2]


def test_overwrite_keeps_old_reader_valid_and_time_travel(spark, be):
    be.write(_df(spark, [(1, "old")]), "t3", "id", 1)
    old_reader = be.read(spark, "t3")
    be.write(_df(spark, [(2, "new"), (3, "new")]), "t3", "id", 1)
    # reader across the overwrite: still the old rows, no dead files
    assert [r["id"] for r in old_reader.collect()] == [1]
    assert old_reader.count() == 1
    assert be.read(spark, "t3").count() == 2
    # time travel re-opens version 1 exactly
    assert [r["id"] for r in
            be.read_version(spark, "t3", 1).collect()] == [1]
    with pytest.raises(FileNotFoundError):
        be.read_version(spark, "t3", 99)


def test_commit_retries_after_losing_version_race(spark, be):
    """Optimistic concurrency: a competing writer's manifest landing
    first makes the commit re-read the head and take the next number —
    for appends, re-merging the fresh head's segment list."""
    be.write(_df(spark, [(1, "a")]), "t4", "id", 1)
    # simulate a concurrent append committing version 2 under us:
    # write its segment through the backend, then hand-commit a manifest
    other_seg = be._write_segment(spark, _df(spark, [(2, "b")]), "id", 1)
    m1 = be._read_manifest(spark, "t4", 1)
    fsio.write_text(spark, be._manifest_path(spark, "t4", 2), json.dumps(
        {**m1, "version": 2, "segments": m1["segments"] + [other_seg]}))
    be.append(_df(spark, [(3, "c")]), "t4", "id", 1)
    assert be.versions(spark, "t4") == [1, 2, 3]
    # the append merged onto the competing head: all three rows live
    assert sorted(r["id"] for r in be.read(spark, "t4").collect()) == [1, 2, 3]


def test_concurrent_appends_from_threads_lose_no_updates(spark, be):
    """The contract upgrade, exercised with REAL races: 8 threads
    appending to the same table concurrently (py4j releases the GIL on
    socket I/O, so commits genuinely interleave).  Optimistic retry
    must serialize them with no lost update: every thread's rows are in
    the final table and every commit got its own version."""
    import threading

    be.write(_df(spark, [(0, "base")]), "tc", "id", 2)
    errors = []

    def appender(i):
        try:
            be.append(_df(spark, [(i, f"thread {i}")]), "tc", "id", 2)
        except Exception as exc:  # surfaced after join
            errors.append((i, exc))

    threads = [threading.Thread(target=appender, args=(i,))
               for i in range(1, 9)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    got = sorted(r["id"] for r in be.read(spark, "tc").collect())
    assert got == list(range(9))
    assert be.versions(spark, "tc") == list(range(1, 10))


def test_torn_tmp_ignored_and_corrupt_manifest_raises(spark, be):
    be.write(_df(spark, [(1, "a")]), "t5", "id", 1)
    # a crashed writer leaves only an invisible tmp — reads unaffected
    fsio.write_text(spark, fsio.join(be._table_dir(spark, "t5"),
                                     ".tmp-dead.json"), "{ torn")
    assert be.read(spark, "t5").count() == 1
    assert be.versions(spark, "t5") == [1]
    # a torn COMMITTED manifest can only be external corruption: loud
    fsio.write_text(spark, be._manifest_path(spark, "t5", 2), "{ torn")
    with pytest.raises(ValueError, match="corrupt manifest"):
        be.read(spark, "t5")


def test_replace_is_atomic_and_recovery_is_provenance_proved(spark, be):
    be.write(_df(spark, [(1, "live")]), "t6", "id", 1)
    be.write(_df(spark, [(2, "staged"), (3, "staged")]), "t6__stage", "id", 1)
    stage_commit_id = be._latest(spark, "t6__stage")[1]["id"]
    live_reader = be.read(spark, "t6")
    be.replace(spark, "t6", "t6__stage")
    assert not be.exists(spark, "t6__stage")
    assert sorted(r["id"] for r in be.read(spark, "t6").collect()) == [2, 3]
    assert live_reader.count() == 1        # snapshot across the swap
    # provenance keys on the stage's unique commit id (NOT its version:
    # versions restart at 1 per stage generation)
    v, m = be._latest(spark, "t6")
    assert m["source"] == ["t6__stage", stage_commit_id]

    # crash BEFORE the swap commit: stage present, no provenance.  This
    # NEW stage generation also starts at version 1 — a version-keyed
    # provenance check would wrongly match the earlier swap and discard
    # the stage (the regression the commit-id fixes)
    be.write(_df(spark, [(4, "s2")]), "t6__stage", "id", 1)
    be.recover_replace(spark, "t6", "t6__stage")
    assert [r["id"] for r in be.read(spark, "t6").collect()] == [4]
    assert not be.exists(spark, "t6__stage")

    # crash AFTER the swap commit but before the stage drop, with a
    # later append already advancing the table: recovery must drop the
    # stage WITHOUT rolling back the append
    be.write(_df(spark, [(5, "s3")]), "t6__stage", "id", 1)
    sm = be._latest(spark, "t6__stage")[1]
    be._commit(spark, "t6", lambda latest: {
        **{k: sm[k] for k in ("segments", "key", "n_buckets", "schema")},
        "source": ["t6__stage", sm["id"]]})   # the swap commit, drop lost
    be.append(_df(spark, [(6, "later")]), "t6", "id", 1)
    be.recover_replace(spark, "t6", "t6__stage")
    assert not be.exists(spark, "t6__stage")
    assert sorted(r["id"] for r in be.read(spark, "t6").collect()) == [5, 6]


def test_replace_merges_concurrent_append_with_token(spark, be):
    """Compaction-class replace: an append landing between the caller's
    snapshot and the swap commit must survive the swap (merged into the
    new version), not be silently dropped."""
    be.write(_df(spark, [(1, "a"), (2, "b")]), "tm", "id", 1)
    token = be.snapshot_token(spark, "tm")
    staged = be.read(spark, "tm")          # the rewrite's source snapshot
    be.write(staged, "tm__stage", "id", 1)
    be.append(_df(spark, [(3, "concurrent")]), "tm", "id", 1)  # races in
    be.replace(spark, "tm", "tm__stage", token=token, on_conflict="merge")
    assert sorted(r["id"] for r in be.read(spark, "tm").collect()) == [1, 2, 3]


def test_replace_fail_mode_raises_on_concurrent_append(spark, be):
    from dlx_spark.tableio import ConcurrentWriteError

    be.write(_df(spark, [(1, "a")]), "tf", "id", 1)
    token = be.snapshot_token(spark, "tf")
    be.write(be.read(spark, "tf"), "tf__stage", "id", 1)
    be.append(_df(spark, [(2, "concurrent")]), "tf", "id", 1)
    with pytest.raises(ConcurrentWriteError):
        be.replace(spark, "tf", "tf__stage", token=token, on_conflict="fail")
    # table and stage untouched by the failed swap
    assert sorted(r["id"] for r in be.read(spark, "tf").collect()) == [1, 2]
    assert be.exists(spark, "tf__stage")


def test_compaction_keeps_append_racing_the_stage_build(spark, be):
    """End-to-end through _compact_table: an append that lands while
    the compacted copy is being written (injected via a backend hook on
    the stage write) is merged through the swap."""
    from dlx_spark.operators.dedup_index import _compact_table
    from dlx_spark.tableio_versioned import VersionedTableBackend

    class RacingBackend(VersionedTableBackend):
        def write(self, df, table, key, n_buckets):
            if table.endswith("__compact") and not getattr(
                    self, "_raced", False):
                self._raced = True
                self.append(_df(df.sparkSession, [(99, "raced")]),
                            "tr", key, n_buckets)
            super().write(df, table, key, n_buckets)

    rb = RacingBackend(root=be._root)
    rb.write(_df(spark, [(1, "a"), (1, "a"), (2, "b")]), "tr", "id", 2)
    tableio.set_backend(rb)
    try:
        _compact_table(spark, "tr", "id", 2, distinct=True)
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())
    got = sorted(r["id"] for r in rb.read(spark, "tr").collect())
    assert got == [1, 2, 99]   # dupes folded AND the raced row kept
    assert rb._raced


@pytest.mark.slow
def test_rebucket_conflict_fails_clean_on_concurrent_append(spark, be):
    """Appends do NOT commute with rebucket (their keys are under the
    old geometry): a racing append must fail the rebucket, leave the
    live index exactly as the appender sees it, and clean the stages."""
    import random

    from dlx_spark.operators.dedup_index import EmbeddingIndex
    from dlx_spark.tableio import ConcurrentWriteError
    from dlx_spark.tableio_versioned import VersionedTableBackend

    rng = random.Random(11)
    vecs = [[rng.gauss(0, 1) for _ in range(6)] for _ in range(20)]
    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    extra = spark.createDataFrame([(500, vecs[0])],
                                  "vec_id long, embedding array<double>")

    class RacingBackend(VersionedTableBackend):
        def write(self, df, table, key, n_buckets):
            super().write(df, table, key, n_buckets)
            if table.endswith("_buckets__rebucket") and not getattr(
                    self, "_raced", False):
                self._raced = True
                idx_live = EmbeddingIndex(df.sparkSession, "t_rbc")
                idx_live.append(extra)

    rb = RacingBackend(root=be._root)
    tableio.set_backend(rb)
    try:
        idx = EmbeddingIndex.create(corpus, "t_rbc", n_planes=4, dim=6)
        with pytest.raises(ConcurrentWriteError):
            idx.rebucket(n_planes=6)
        assert rb._raced
        # stages cleaned, live geometry unchanged, raced append present
        assert not rb.exists(spark, "t_rbc_buckets__rebucket")
        assert not rb.exists(spark, "t_rbc_meta__rebucket")
        reopened = EmbeddingIndex(spark, "t_rbc")
        assert reopened.params["n_planes"] == 4
        assert rb.read(spark, "t_rbc_vecs").count() == 21
        # the re-run (no race this time) succeeds
        reopened.rebucket(n_planes=6)
        assert EmbeddingIndex(spark, "t_rbc").params["n_planes"] == 6
        reopened.drop()
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())


def test_vacuum_completes_crashed_replace_instead_of_eating_provenance(
        spark, be):
    """A replace that committed its swap but crashed before dropping
    the stage, followed by an append and a vacuum: vacuum must not
    delete the swap-commit manifest (the only provenance) while the
    stage survives — it completes the crashed drop instead, so the next
    recover_replace is a no-op and the append is preserved."""
    be.write(_df(spark, [(1, "live")]), "tv", "id", 1)
    be.write(_df(spark, [(2, "staged")]), "tv__stage", "id", 1)
    sm = be._latest(spark, "tv__stage")[1]
    # the swap commit, with the stage drop lost to a crash
    be._commit(spark, "tv", lambda latest: {
        **{k: sm[k] for k in ("segments", "key", "n_buckets", "schema")},
        "source": ["tv__stage", sm["id"]]})
    be.append(_df(spark, [(3, "later")]), "tv", "id", 1)
    be.vacuum(spark, keep_last=1, min_age_seconds=0)
    # vacuum finished the crashed drop; recovery finds nothing to do
    assert not be.exists(spark, "tv__stage")
    be.recover_replace(spark, "tv", "tv__stage")
    assert sorted(r["id"] for r in be.read(spark, "tv").collect()) == [2, 3]


def test_vacuum_reclaims_unreferenced_segments(spark, be):
    be.write(_df(spark, [(1, "v1")]), "t7", "id", 1)
    be.write(_df(spark, [(2, "v2")]), "t7", "id", 1)
    seg_v1 = be._read_manifest(spark, "t7", 1)["segments"][0]
    assert fsio.exists(spark, be._data_dir(spark, seg_v1))
    # min_age_seconds=0: the writers-quiesced fast path (the default
    # retention horizon would keep these seconds-old segments alive)
    deleted = be.vacuum(spark, keep_last=1, min_age_seconds=0)
    assert seg_v1 in deleted
    assert not fsio.exists(spark, be._data_dir(spark, seg_v1))
    # current version unaffected; vacuumed version now a clear error
    assert [r["id"] for r in be.read(spark, "t7").collect()] == [2]
    with pytest.raises(FileNotFoundError):
        be.read_version(spark, "t7", 1)


def test_vacuum_keeps_segments_shared_via_replace(spark, be):
    """replace() re-points the target at the stage's segments; after the
    stage's manifests are dropped, vacuum must still see the segments as
    referenced (by the target) and keep them."""
    be.write(_df(spark, [(1, "live")]), "t8", "id", 1)
    be.write(_df(spark, [(2, "staged")]), "t8__stage", "id", 1)
    be.replace(spark, "t8", "t8__stage")
    be.vacuum(spark, keep_last=1, min_age_seconds=0)
    assert [r["id"] for r in be.read(spark, "t8").collect()] == [2]


def test_empty_dataframe_roundtrip(spark, be):
    df = _df(spark, [], "id long, text string").limit(0)
    be.write_plain(df, "t9")
    got = be.read(spark, "t9")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "text"]


def test_drop_and_exists(spark, be):
    be.write_plain(_df(spark, [(1, "a")]), "t10")
    assert be.exists(spark, "t10")
    be.drop(spark, "t10")
    assert not be.exists(spark, "t10")
    with pytest.raises(FileNotFoundError):
        be.read(spark, "t10")


@pytest.mark.slow
def test_minhash_index_end_to_end_on_versioned_backend(spark, be, tmp_path):
    """An unmodified MinHashIndex running entirely through the
    versioned backend — create, dedup_batch, append-on-survive, reopen,
    compact (exercises replace + recover seam) — must produce the same
    survivors as the default parquet backend."""
    from dlx_spark.operators.dedup_index import MinHashIndex

    corpus = _df(spark, [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "an entirely different document about spark internals"),
    ], "doc_id long, text string")
    batch = _df(spark, [
        (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
        (11, "novel content that matches nothing in the corpus"),
    ], "doc_id long, text string")

    def run(name):
        idx = MinHashIndex.create(corpus, name, n_buckets=2)
        clean = sorted(r["doc_id"] for r in
                       idx.dedup_batch(batch, threshold=0.7).collect())
        idx.compact()
        reopened = MinHashIndex(spark, name)
        # survivor 11 was appended: probing it again finds it present
        again = sorted(r["doc_id"] for r in
                       reopened.dedup_batch(batch, threshold=0.7).collect())
        idx.drop()
        return clean, again

    tableio.set_backend(be)
    try:
        versioned = run("t_v_mh")
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())
    plain = run("t_p_mh")
    assert versioned == plain == ([11], [])


@pytest.mark.slow
def test_embedding_index_rebucket_rollforward_on_versioned_backend(spark, be):
    """The most protocol-heavy index path — EmbeddingIndex rebucket's
    staged-keys + staged-meta commit point — through the versioned
    backend: probe results match the default backend exactly, and a
    crash after the meta commit rolls FORWARD on reopen."""
    import random

    from dlx_spark.operators.dedup_index import EmbeddingIndex

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(40)]
    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        [(100 + i, [x + 0.01 for x in base[i]]) for i in range(10)],
        "vec_id long, embedding array<double>")

    def probe_set(idx):
        return {(r["corpus_id"], r["batch_id"], round(r["cosine"], 6))
                for r in idx.probe(batch, threshold=0.95).collect()}

    tableio.set_backend(be)
    try:
        idx = EmbeddingIndex.create(corpus, "t_v_emb", n_planes=4, dim=8)
        got = probe_set(idx)
        # rebucket commits through replace(): provenance-proved swap
        idx.rebucket(n_planes=6, bands=2)
        assert idx.params["n_planes"] == 6 and idx.params["bands"] == 2
        rb = probe_set(EmbeddingIndex(spark, "t_v_emb"))
        assert rb >= got and len(got) >= 5  # banding only widens recall

        # crash AFTER the meta commit point: stage both tables through
        # the backend, then reopen — must roll forward (keys then meta)
        p_old = dict(idx.params)
        p_old["n_planes"], p_old["bands"] = 4, 1
        from dlx_spark.operators import similarity
        keys = similarity.banded_lsh_keys(
            be.read(spark, "t_v_emb_vecs"), 1, 4, p_old["seed"],
            vec_col="vec", id_col="id", dim=8)
        be.write(keys, "t_v_emb_buckets__rebucket", "bucket",
                 p_old["n_buckets"])
        be.write_plain(spark.createDataFrame(
            [(json.dumps(p_old),)], "params string"),
            "t_v_emb_meta__rebucket")
        rolled = EmbeddingIndex(spark, "t_v_emb")
        assert rolled.params["n_planes"] == 4 and rolled.params["bands"] == 1
        assert not be.exists(spark, "t_v_emb_meta__rebucket")
        assert not be.exists(spark, "t_v_emb_buckets__rebucket")
        assert probe_set(rolled) and probe_set(rolled) <= rb
        rolled.drop()
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())

    # cross-backend equivalence: same geometry, default backend
    idx_p = EmbeddingIndex.create(corpus, "t_p_emb", n_planes=4, dim=8)
    try:
        assert probe_set(idx_p) == got
    finally:
        idx_p.drop()


@pytest.mark.slow
def test_streaming_ingest_appends_through_versioned_backend(
        spark, be, tmp_path):
    """The exactly-once streaming ingest (foreachBatch ->
    MinHashIndex.dedup_batch) with the versioned backend installed:
    cross-batch dedup works, every micro-batch append lands as a
    manifest commit, and cross-session appends are visible WITHOUT a
    catalog refresh (reads resolve the latest manifest each time —
    the property the catalog backend needs refreshTable for)."""
    import json as jsonlib

    from dlx_spark.operators.dedup_index import MinHashIndex
    from dlx_spark.streaming import neardedup_ingest_stream

    corpus = _df(spark, [
        (i, f"corpus document number {i} " + " ".join(
            f"tok{i}_{j}" for j in range(20)))
        for i in range(20)
    ], "doc_id long, text string")

    tableio.set_backend(be)
    try:
        MinHashIndex.create(corpus, "t_v_stream", n_buckets=4)
        v_before = be.versions(spark, "t_v_stream_sigs")[-1]
        indir = tmp_path / "in"
        indir.mkdir()
        out = str(tmp_path / "clean")
        # batch 1: one clone of corpus doc 0 (dropped) + one new doc
        rows1 = [{"doc_id": 100, "text": corpus.collect()[0]["text"]},
                 {"doc_id": 101, "text": " ".join(
                     f"fresh{j}" for j in range(25))}]
        (indir / "b1.json").write_text(
            "\n".join(jsonlib.dumps(r) for r in rows1))
        q = neardedup_ingest_stream(
            spark, str(indir), "t_v_stream", out,
            str(tmp_path / "ckpt"), threshold=0.7)
        q.awaitTermination(120)
        clean1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert clean1 == {101}
        # batch 2: a clone of batch-1's survivor — cross-BATCH state
        rows2 = [{"doc_id": 200, "text": rows1[1]["text"]}]
        (indir / "b2.json").write_text(
            "\n".join(jsonlib.dumps(r) for r in rows2))
        q = neardedup_ingest_stream(
            spark, str(indir), "t_v_stream", out,
            str(tmp_path / "ckpt"), threshold=0.7)
        q.awaitTermination(120)
        clean2 = {r["doc_id"] for r in spark.read.parquet(out)
                  .filter(F.col("batch") == 1).collect()}
        assert clean2 == set()   # dropped against the appended survivor
        # each committed micro-batch appended exactly one version; no
        # refreshTable was ever issued (reads re-resolve manifests)
        assert be.versions(spark, "t_v_stream_sigs")[-1] > v_before
        idx = MinHashIndex(spark, "t_v_stream")
        assert be.read(spark, "t_v_stream_sigs").count() == 21  # 20 + 101
        idx.drop()
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())


def test_digest_index_recovery_path_on_versioned_backend(spark, be):
    """_recover_compaction through the versioned backend: a compaction
    whose stage committed but whose publish was lost is finished by
    provenance-checked recover_replace on the next open."""
    from dlx_spark.operators.dedup_index import (
        DigestIndex, _compact_table, _recover_compaction)

    corpus = _df(spark, [(1, "alpha beta"), (2, "gamma delta")],
                 "doc_id long, text string")
    tableio.set_backend(be)
    try:
        DigestIndex.create(corpus, "t_v_dg", n_buckets=2)
        # simulate the crash: stage the compacted copy but lose the swap
        src = be.read(spark, "t_v_dg_digests")
        be.write(src, "t_v_dg_digests__compact", "digest", 2)
        _recover_compaction(spark, "t_v_dg_digests")
        assert not be.exists(spark, "t_v_dg_digests__compact")
        idx = DigestIndex(spark, "t_v_dg")
        clean = sorted(r["doc_id"] for r in idx.dedup_batch(
            _df(spark, [(5, "alpha beta"), (6, "zeta")],
                "doc_id long, text string")).collect())
        assert clean == [6]
        # and a full normal compaction still works end-to-end
        _compact_table(spark, "t_v_dg_digests", "digest", 2)
        idx.drop()
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())


@pytest.mark.slow
def test_compact_segments_folds_append_history(spark, be):
    """The OPTIMIZE analog: appends accumulate one segment (and, for
    partitioned tables, one scan root) per commit; compact_segments
    folds them into one fresh segment through the same optimistic
    commit, merging any append that races the rewrite."""
    be.write_partitioned(_df(spark, [(1, "a")], "id long, part string"),
                         "t_cseg", ["part"])
    for i in range(2, 5):
        be.append_partitioned(_df(spark, [(i, "a" if i % 2 else "b")],
                                  "id long, part string"),
                              "t_cseg", ["part"])
    assert len(be.snapshot_token(spark, "t_cseg")) == 4
    folded = be.compact_segments(spark, "t_cseg")
    assert folded == 4
    assert len(be.snapshot_token(spark, "t_cseg")) == 1
    assert sorted(r["id"] for r in be.read(spark, "t_cseg").collect()) \
        == [1, 2, 3, 4]
    # idempotent: already compact -> no write, no new version
    v = be.versions(spark, "t_cseg")[-1]
    assert be.compact_segments(spark, "t_cseg") == 0
    assert be.versions(spark, "t_cseg")[-1] == v

    # racing append is merged through the swap (token carry)
    class RacingBackend(VersionedTableBackend):
        def write_partitioned(self, df, table, cols, **kwargs):
            if table.endswith("__compactseg") and not getattr(
                    self, "_raced", False):
                self._raced = True
                self.append_partitioned(
                    _df(df.sparkSession, [(99, "c")],
                        "id long, part string"), "t_cseg2", cols)
            super().write_partitioned(df, table, cols, **kwargs)

    rb = RacingBackend(root=be._root)
    rb.write_partitioned(_df(spark, [(1, "a")], "id long, part string"),
                         "t_cseg2", ["part"])
    rb.append_partitioned(_df(spark, [(2, "b")], "id long, part string"),
                          "t_cseg2", ["part"])
    assert rb.compact_segments(spark, "t_cseg2") == 2
    assert rb._raced
    assert sorted(r["id"] for r in rb.read(spark, "t_cseg2").collect()) \
        == [1, 2, 99]


def test_partition_pruning_survives_versioned_segments(spark, be):
    """The ANN layouts' scale property on this backend: a filter on the
    partition column must reach every per-segment scan as a partition
    filter (no full-index read), across an append history."""
    from dlx_spark import tableio
    from dlx_spark.operators import bucketing, similarity

    import numpy as np
    rng = np.random.RandomState(17)
    rows = [(i, rng.standard_normal(6).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(df, n_centroids=4, seed=17)
    tableio.set_backend(be)
    try:
        bucketing.write_ivf_index(df.limit(20), "t_v_prune", cents)
        bucketing.append_ivf_index(df, "t_v_prune", cents)
        probed = bucketing.probe_ivf_index(spark, "t_v_prune", cents,
                                           rows[0][1], k=3, nprobe=1)
        plan = probed._jdf.queryExecution().executedPlan().toString()
        # two segments -> two scans, each partition-filtered
        assert plan.count("PartitionFilters: [") >= 2
        assert "list_id" in plan.split("PartitionFilters")[1][:200]
        assert probed.count() > 0
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())


def test_vacuum_age_gates_superseded_manifests_and_compactseg_stages(
        spark, be):
    """Review fixes: (a) superseded manifests younger than the horizon
    survive vacuum — a concurrent committer that listed the old head
    must be able to read it and retry, not die on a vanished file;
    (b) an aged crashed compact_segments stage is dropped by vacuum
    (it is always re-derivable), freeing its segments."""
    be.write(_df(spark, [(1, "v1")]), "t_age", "id", 1)
    be.write(_df(spark, [(2, "v2")]), "t_age", "id", 1)
    be.vacuum(spark, keep_last=1)                 # default horizon
    # the superseded v1 manifest is young: still present and readable
    assert be.versions(spark, "t_age") == [1, 2]
    assert [r["id"] for r in be.read_version(spark, "t_age", 1)
            .collect()] == [1]
    # zero horizon: trimmed as before
    be.vacuum(spark, keep_last=1, min_age_seconds=0)
    assert be.versions(spark, "t_age") == [2]

    # crashed compact_segments stage: stage table exists, swap never
    # committed -> aged vacuum drops it and reclaims its segment
    be.write(_df(spark, [(1, "a")]), "t_cs", "id", 1)
    be.append(_df(spark, [(2, "b")]), "t_cs", "id", 1)
    be.write(be.read(spark, "t_cs"), "t_cs__compactseg", "id", 1)
    seg = be.snapshot_token(spark, "t_cs__compactseg")[0]
    be.vacuum(spark, keep_last=1)                 # young: stage kept
    assert be.exists(spark, "t_cs__compactseg")
    be.vacuum(spark, keep_last=1, min_age_seconds=0)
    assert not be.exists(spark, "t_cs__compactseg")
    assert not fsio.exists(spark, be._data_dir(spark, seg))
    # the live table is untouched
    assert sorted(r["id"] for r in be.read(spark, "t_cs").collect()) == [1, 2]


@pytest.mark.slow
def test_auto_compact_bounds_segment_count_on_append_heavy_ingest(
        spark, be):
    """The OPTIMIZE auto-trigger: with ``auto_compact_at=N``, an
    append-heavy history can never leave more than N segments behind —
    each threshold-crossing append folds the table inline, and the
    fold is invisible to correctness (same rows, same layout kind)."""
    ab = VersionedTableBackend(root=be._root, auto_compact_at=4)
    ab.write(_df(spark, [(0, "seed")]), "t_ac", "id", 2)
    for i in range(1, 11):
        ab.append(_df(spark, [(i, f"row {i}")]), "t_ac", "id", 2)
        assert len(ab.snapshot_token(spark, "t_ac")) <= 4
    assert ab.auto_compactions >= 2
    assert sorted(r["id"] for r in ab.read(spark, "t_ac").collect()) \
        == list(range(11))
    # partitioned layout: scan-root count is the read-amplification
    # axis there — same bound, layout preserved
    ab.write_partitioned(_df(spark, [(0, "a")], "id long, part string"),
                         "t_acp", ["part"])
    for i in range(1, 9):
        ab.append_partitioned(
            _df(spark, [(i, "a" if i % 2 else "b")],
                "id long, part string"), "t_acp", ["part"])
        assert len(ab.snapshot_token(spark, "t_acp")) <= 4
    manifest = ab._read_manifest(spark, "t_acp",
                                 ab.versions(spark, "t_acp")[-1])
    assert manifest["partition_cols"] == ["part"]
    assert sorted(r["id"] for r in ab.read(spark, "t_acp").collect()) \
        == list(range(9))
    # manual-only backend on the same table keeps accumulating (the
    # behavior auto_compact_at exists to bound)
    for i in range(11, 14):
        be.append(_df(spark, [(i, f"row {i}")]), "t_ac", "id", 2)
    assert len(be.snapshot_token(spark, "t_ac")) > 1


@pytest.mark.slow
def test_auto_compact_crash_between_stage_and_swap_loses_no_data(
        spark, be):
    """A crash inside the auto-triggered compaction — after the stage
    is written, before the swap commits — must (a) keep the appended
    rows durable (the append committed first), (b) leave the live
    table readable on its un-compacted head, and (c) be fully repaired
    by the existing machinery: vacuum clears the re-derivable stage,
    and the next threshold-crossing append re-triggers a clean fold."""

    class Crash(RuntimeError):
        pass

    class CrashyBackend(VersionedTableBackend):
        def replace(self, spark, table, staged, token=None,
                    on_conflict="merge"):
            if staged.endswith("__compactseg") and not getattr(
                    self, "_crashed", False):
                self._crashed = True
                raise Crash("simulated crash between stage and swap")
            super().replace(spark, table, staged, token=token,
                            on_conflict=on_conflict)

    cb = CrashyBackend(root=be._root, auto_compact_at=3)
    cb.write(_df(spark, [(0, "seed")]), "t_acc", "id", 2)
    cb.append(_df(spark, [(1, "one")]), "t_acc", "id", 2)
    with pytest.raises(Crash):
        cb.append(_df(spark, [(2, "two")]), "t_acc", "id", 2)
    # (a)+(b): the append that triggered the crash is durable; the
    # table reads fine on its 3-segment head; the stage is stranded
    assert sorted(r["id"] for r in cb.read(spark, "t_acc").collect()) \
        == [0, 1, 2]
    assert len(cb.snapshot_token(spark, "t_acc")) == 3
    assert cb.exists(spark, "t_acc__compactseg")
    # (c) vacuum clears the aged stage (always re-derivable)...
    cb.vacuum(spark, keep_last=1, min_age_seconds=0)
    assert not cb.exists(spark, "t_acc__compactseg")
    # ...and the next threshold-crossing append re-triggers a clean fold
    cb.append(_df(spark, [(3, "three")]), "t_acc", "id", 2)
    assert len(cb.snapshot_token(spark, "t_acc")) == 1
    assert sorted(r["id"] for r in cb.read(spark, "t_acc").collect()) \
        == [0, 1, 2, 3]


@pytest.mark.slow
def test_multisegment_ann_probes_never_full_scan(spark, be):
    """Executed-plan pins for the ANN layouts on a ≥3-segment versioned
    index (the round-7 verdict's ask — PLANS.md's prose claims, now
    assertions that FAIL on a regression to a full-index scan):

    - IVF probe (literal nprobe filter): every per-segment scan carries
      a non-empty list_id PartitionFilter — one pruned scan per
      segment, zero unfiltered branches;
    - LSH knn_join (dynamic probe-side keys): runtime dynamic partition
      pruning survives the versioned union-of-segments scan, and no
      branch scans unfiltered.
    """
    import numpy as np

    from dlx_spark.operators import bucketing, similarity

    rng = np.random.RandomState(17)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tableio.set_backend(be)
    try:
        # ---- IVF: 1 write + 3 appends = 4 segments
        cents = similarity.ivf_centroids(df, n_centroids=4, seed=17)
        bucketing.write_ivf_index(df.limit(20), "t_ms_ivf", cents)
        for j in range(3):
            bucketing.append_ivf_index(
                df.withColumn("vec_id", F.col("vec_id") + (j + 1) * 1000),
                "t_ms_ivf", cents)
        n_seg = len(be.snapshot_token(spark, "t_ms_ivf"))
        assert n_seg == 4
        probed = bucketing.probe_ivf_index(
            spark, "t_ms_ivf", cents, rows[0][1], k=3, nprobe=1)
        assert probed.count() > 0
        plan = probed._jdf.queryExecution().executedPlan().toString()
        # one partition-filtered scan per segment; a regression to a
        # full-index scan shows up as an EMPTY PartitionFilters list
        assert plan.count("PartitionFilters: [") == n_seg, plan[:1500]
        assert "PartitionFilters: []" not in plan
        for section in plan.split("PartitionFilters: [")[1:]:
            assert "list_id" in section[:200], section[:300]

        # ---- LSH: 1 write + 2 appends = 3 segments, dynamic probe keys
        bucketing.write_lsh_index(df.limit(20), "t_ms_lsh",
                                  n_planes=6, dim=8)
        for j in range(2):
            bucketing.append_lsh_index(
                df.withColumn("vec_id", F.col("vec_id") + (j + 1) * 1000),
                "t_ms_lsh", n_planes=6, dim=8)
        assert len(be.snapshot_token(spark, "t_ms_lsh")) == 3
        probes = df.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 9000).alias("vec_id"), "embedding")
        got = bucketing.knn_join_lsh_index(
            spark, "t_ms_lsh", probes, k=3, n_planes=6,
            multiprobe_hamming=0, dim=8)
        got.collect()
        plan2 = got._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan2.lower(), plan2[:1500]
        assert "PartitionFilters: []" not in plan2
        # appended rows are probeable (same seeded hyperplane family):
        # compare against on-the-fly knn over the SAME corpus the index
        # holds — limit(20) of the write + the two appended replicas
        corpus = df.limit(20).unionByName(
            df.withColumn("vec_id", F.col("vec_id") + 1000)).unionByName(
            df.withColumn("vec_id", F.col("vec_id") + 2000))
        want = similarity.knn_join(probes, corpus, k=3, n_planes=6, dim=8)
        g = {(r["probe_id"], r["corpus_id"], r["rank"])
             for r in got.collect()}
        w = {(r["probe_id"], r["corpus_id"], r["rank"])
             for r in want.collect()}
        assert g == w and len(g) > 0
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())


def test_compact_segments_preserves_extra_metadata(spark, tmp_path):
    """Folding a partitioned table must carry its 'extra' metadata into
    the published manifest — dropping it silently disabled e.g. the
    history table's pt pruning after the first auto-compaction."""
    from pyspark.sql import functions as F

    be = VersionedTableBackend(root=str(tmp_path / "wh_extra"))
    rows = (spark.range(8).select(F.col("id").alias("k"))
            .withColumn("pt", F.pmod("k", F.lit(4)).cast("int")))
    be.append_partitioned(rows, "t", ["pt"], extra={"n_buckets": 4})
    be.append_partitioned(rows, "t", ["pt"])
    assert be.compact_segments(spark, "t") == 2
    assert (be.latest_manifest(spark, "t").get("extra") or {}) \
        == {"n_buckets": 4}


@pytest.mark.slow
def test_auto_compact_prefers_suffix_fold_on_large_base(spark, be):
    """An append-heavy table whose base dwarfs its recent appends (the
    history-log shape) must auto-maintain by folding ONLY the appended
    suffix — segment 0 survives by id, never read or rewritten — while
    keeping the same segment-count bound and content."""
    ab = VersionedTableBackend(root=be._root, auto_compact_at=3)
    ab.write_partitioned(
        _df(spark, [(i, f"base {i}") for i in range(400)],
            "id long, part string").withColumn(
            "part", (F.col("id") % 2).cast("string")),
        "t_sfx", ["part"], sort_col="id")
    base_seg = ab.snapshot_token(spark, "t_sfx")[0]
    for i in range(400, 408):
        ab.append_partitioned(
            _df(spark, [(i, "a")], "id long, part string"),
            "t_sfx", ["part"], sort_col="id")
        assert len(ab.snapshot_token(spark, "t_sfx")) <= 3
    assert ab.auto_compactions_minor >= 2
    assert ab.snapshot_token(spark, "t_sfx")[0] == base_seg
    assert sorted(r["id"] for r in ab.read(spark, "t_sfx").collect()) \
        == list(range(408))
    # manifest still carries the advisory sort through suffix folds
    manifest = ab._read_manifest(spark, "t_sfx",
                                 ab.versions(spark, "t_sfx")[-1])
    assert manifest.get("sort_col") == "id"
    # the manual suffix fold squeezes the remainder to base + 1
    folded = ab.compact_segment_suffix(spark, "t_sfx")
    assert folded >= 0 and len(ab.snapshot_token(spark, "t_sfx")) <= 2
    assert ab.snapshot_token(spark, "t_sfx")[0] == base_seg


def test_compact_segment_suffix_aborts_on_replaced_list(spark, be):
    """A raced full rewrite invalidates suffix surgery: the fold must
    abort, leaving the rewrite's result standing."""
    be.write_plain(_df(spark, [(1, "a")]), "t_sfx_race")
    be.append(_df(spark, [(2, "b")]), "t_sfx_race", "id", 2)
    be.append(_df(spark, [(3, "c")]), "t_sfx_race", "id", 2)
    _, manifest = be._latest(spark, "t_sfx_race")
    token = list(manifest["segments"])
    df = be.segment_df(spark, manifest, 1).unionByName(
        be.segment_df(spark, manifest, 2))
    be.compact_segments(spark, "t_sfx_race")       # the raced rewrite
    assert not be.replace_segment_suffix(df, "t_sfx_race", token, keep=1)
    assert len(be.snapshot_token(spark, "t_sfx_race")) == 1
    assert sorted(r["id"] for r in
                  be.read(spark, "t_sfx_race").collect()) == [1, 2, 3]
