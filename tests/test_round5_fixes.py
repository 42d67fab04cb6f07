"""Round-5 hardening tests: the ADVICE findings (IVF rename-aside swap,
strict fsio.remove, legacy ledger-key acceptance) and the torn-marker
recovery claims (fsio.py module docstring) that previously had no test
behind them."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dlx_spark import fsio


# ---------------------------------------------------------------------------
# fsio.remove strict failure handling
# ---------------------------------------------------------------------------

def test_fsio_remove_raises_when_delete_fails_but_path_exists(spark, monkeypatch):
    """A filesystem whose delete() returns false while the path still
    exists (permission/lease failure) must raise, not report success."""

    class _StubFs:
        def delete(self, _p, _recursive):
            return False

        def exists(self, _p):
            return True

    monkeypatch.setattr(fsio, "_fs", lambda _s, _p: _StubFs())
    with pytest.raises(OSError):
        fsio.remove(spark, "/nonexistent/stub/marker", missing_ok=True)
    with pytest.raises(OSError):
        fsio.remove(spark, "/nonexistent/stub/marker", missing_ok=False)


def test_fsio_remove_missing_semantics_unchanged(spark, tmp_path):
    gone = str(tmp_path / "never_existed")
    assert fsio.remove(spark, gone, missing_ok=True) is False
    with pytest.raises(FileNotFoundError):
        fsio.remove(spark, gone, missing_ok=False)
    real = str(tmp_path / "real_marker")
    fsio.touch(spark, real)
    assert fsio.remove(spark, real) is True
    assert not fsio.exists(spark, real)


# ---------------------------------------------------------------------------
# IVF refresh publication through the shared tableio replace protocol
# ---------------------------------------------------------------------------
#
# Round 6 replaced the bespoke rename-aside + _STAGE_COMPLETE protocol
# with the backend seam's replace/recover_replace (the IVF index is now
# a partitioned catalog table).  The crash states collapse accordingly:
# a staged TABLE is visible only if its saveAsTable completed (catalog
# registration is the commit point), so recovery never has to reason
# about torn stages.


def _write_idx(spark, table, ids):
    (spark.createDataFrame([(int(i), [float(i)], 0) for i in ids],
                           "id long, vec array<double>, list_id int")
     .write.mode("overwrite").partitionBy("list_id").saveAsTable(table))


def _idx_ids(spark, table):
    return {r["id"] for r in spark.table(table).select("id").collect()}


@pytest.fixture(autouse=True)
def _drop_ivf_tables(spark):
    yield
    for t in ("t_r6_ivf", "t_r6_ivf__refresh", "t_r6_ivf2",
              "t_r6_ivf2__refresh", "t_r6_ivf3", "t_r6_ivf3__refresh",
              "t_r6_ivf5", "t_r6_ivf5__refresh"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_recover_ivf_pre_publish_crash_keeps_live(spark):
    """Stage complete, live intact: the crash predates the swap's DROP —
    the live index wins and the (re-derivable) stage is dropped."""
    from dlx_spark.operators import bucketing

    _write_idx(spark, "t_r6_ivf", [1, 2, 3])
    _write_idx(spark, "t_r6_ivf__refresh", [10, 11])
    bucketing.recover_ivf_index(spark, "t_r6_ivf")
    assert _idx_ids(spark, "t_r6_ivf") == {1, 2, 3}
    assert not spark.catalog.tableExists("t_r6_ivf__refresh")


def test_recover_ivf_mid_swap_crash_publishes_stage(spark):
    """Crash between the swap's DROP and RENAME: the staged table is
    the full post-image — recovery publishes it, INCLUDING the
    partition-metadata repair (the catalog keeps absolute partition
    locations across a rename; without the repair the recovered index
    reads as empty)."""
    from dlx_spark.operators import bucketing

    _write_idx(spark, "t_r6_ivf2__refresh", [10, 11, 12])
    bucketing.recover_ivf_index(spark, "t_r6_ivf2")
    assert _idx_ids(spark, "t_r6_ivf2") == {10, 11, 12}
    assert not spark.catalog.tableExists("t_r6_ivf2__refresh")
    # re-entrant: running recovery again is a no-op
    bucketing.recover_ivf_index(spark, "t_r6_ivf2")
    assert _idx_ids(spark, "t_r6_ivf2") == {10, 11, 12}


def test_torn_staged_write_is_invisible_to_recovery(spark):
    """The commit point claim itself: a staged write that died before
    its catalog registration leaves FILES but no TABLE — recovery sees
    nothing staged and leaves the live index untouched (the reason the
    bespoke _STAGE_COMPLETE marker is no longer needed)."""
    from dlx_spark.operators import bucketing

    _write_idx(spark, "t_r6_ivf3", [1, 2, 3])
    loc = str(spark.conf.get("spark.sql.warehouse.dir")).replace(
        "file:", "") + "/t_r6_ivf3__refresh"
    (spark.createDataFrame([(99, [9.0], 0)],
                           "id long, vec array<double>, list_id int")
     .write.mode("overwrite").partitionBy("list_id").parquet(loc))
    assert not spark.catalog.tableExists("t_r6_ivf3__refresh")
    bucketing.recover_ivf_index(spark, "t_r6_ivf3")
    assert _idx_ids(spark, "t_r6_ivf3") == {1, 2, 3}
    fsio.rmtree(spark, loc)


def test_refresh_ivf_swap_leaves_no_residue(spark):
    """A clean refresh ends with exactly the live table: no __refresh,
    contents preserved, probes see the new quantization."""
    from dlx_spark.operators import bucketing, similarity

    rng = np.random.RandomState(3)
    rows = [(i, (rng.standard_normal(8)).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(df, n_centroids=4, seed=3)
    bucketing.write_ivf_index(df, "t_r6_ivf5", cents)
    bucketing.refresh_ivf_index(spark, "t_r6_ivf5", n_centroids=4, seed=3)
    assert not spark.catalog.tableExists("t_r6_ivf5__refresh")
    assert len(_idx_ids(spark, "t_r6_ivf5")) == 60


@pytest.mark.slow
def test_refresh_ivf_fails_clean_on_concurrent_append(spark, tmp_path):
    """On the transactional backend, an append_ivf_index racing the
    refresh (its rows assigned under the OLD centroids) must fail the
    refresh via the snapshot-token conflict, leave the live index
    exactly as the appender sees it, and clean the stage — the upgrade
    over the old path protocol, which silently lost such appends."""
    from dlx_spark import tableio
    from dlx_spark.operators import bucketing, similarity
    from dlx_spark.tableio_versioned import VersionedTableBackend

    rng = np.random.RandomState(5)
    rows = [(i, (rng.standard_normal(6)).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    extra = spark.createDataFrame([(500, rows[0][1])],
                                  "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(df, n_centroids=3, seed=5)

    class RacingBackend(VersionedTableBackend):
        def write_partitioned(self, d, table, cols):
            super().write_partitioned(d, table, cols)
            if table.endswith("__refresh") and not getattr(
                    self, "_raced", False):
                self._raced = True
                bucketing.append_ivf_index(extra, "t_v_ivf_race", cents)

    rb = RacingBackend(root=str(tmp_path / "vroot"))
    tableio.set_backend(rb)
    try:
        bucketing.write_ivf_index(df, "t_v_ivf_race", cents)
        with pytest.raises(tableio.ConcurrentWriteError):
            bucketing.refresh_ivf_index(spark, "t_v_ivf_race",
                                        n_centroids=3, seed=5)
        assert rb._raced
        assert not rb.exists(spark, "t_v_ivf_race__refresh")
        assert rb.read(spark, "t_v_ivf_race").count() == 41  # append kept
        # the re-run (no race) succeeds over the grown index
        bucketing.refresh_ivf_index(spark, "t_v_ivf_race",
                                    n_centroids=3, seed=5)
        assert rb.read(spark, "t_v_ivf_race").count() == 41
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())


# ---------------------------------------------------------------------------
# Legacy ledger-key acceptance across the qualified-spelling upgrade
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_commit_stream_accepts_legacy_ledger_key(spark, tmp_path):
    """Ledger rows persisted before the fsio.qualified key change were
    keyed on os.path.abspath(checkpoint); a stream resuming across the
    upgrade must still recognize those batches as committed instead of
    re-committing a redelivered one."""
    from dlx_spark import streaming
    from dlx_spark.marc.store import MarcStore

    store = MarcStore(spark, str(tmp_path / "wh_legacy"))
    ck = str(tmp_path / "ck_legacy")
    doc = {"245": [{"indicators": [" ", " "],
                    "subfields": [{"code": "a", "value": "Legacy keyed"}]}]}
    batch = spark.createDataFrame([(json.dumps(doc),)], "value string")

    # simulate a pre-upgrade ledger: batch 0 committed under the legacy
    # abspath-keyed spelling (run_id is empty for direct-driven batches)
    legacy_key = hashlib.md5(
        f"{os.path.abspath(ck)}:".encode()).hexdigest()[:16]
    commits_log = fsio.join(store.root, "_stream_commits_bib")
    (spark.createDataFrame([(legacy_key, 0)], "stream string, batch_id long")
     .write.mode("append").parquet(commits_log))

    fn = streaming.make_commit_batch_fn(store, "bib", ck)
    fn(batch, 0)                       # redelivered batch 0: must be skipped
    assert store.bibs().count() == 0
    fn(batch, 1)                       # batch 1 is genuinely new: commits
    assert store.bibs().count() == 1


# ---------------------------------------------------------------------------
# Torn-marker recovery (fsio docstring claims, now tested)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_store_recover_tolerates_torn_dirty_marker(spark, tmp_path):
    """A truncated / garbage token-index dirty marker (the s3a
    torn-write window: rename is copy+delete, so a reader can see a
    prefix) must read as 'rebuild wholesale' — always safe — never
    crash recovery or corrupt committed state."""
    from dlx_spark.marc.record import Bib
    from dlx_spark.marc.store import MarcStore

    store = MarcStore(spark, str(tmp_path / "wh_torn"))
    store.commit(Bib({"_id": 7, "245": [{"indicators": [" ", " "],
                                         "subfields": [{"code": "a",
                                                        "value": "First"}]}]}))
    store.build_search_index("bib")
    assert store.bibs().count() == 1

    # truncated-JSON garbage where the marker should be
    fsio.write_text(spark, fsio.join(store.root, "_dirty_bibs_tokens.json"),
                    '{"base_segments": ["seg', )

    # a fresh store open runs _recover over the root; the torn marker
    # must neither crash it nor leave the index stale or the store torn
    store2 = MarcStore(spark, str(tmp_path / "wh_torn"))
    assert store2.bibs().count() == 1
    assert store2.get("bib", 7).get_value("245", "a") == "First"
    assert not fsio.exists(spark,
                           fsio.join(store.root, "_dirty_bibs_tokens.json"))
    assert [r["_id"] for r in
            store2.search("bib", "245__a:first").collect()] == [7]
    # committing through the reopened store still works
    store2.commit(Bib({"_id": 8, "245": [{"indicators": [" ", " "],
                                          "subfields": [{"code": "a",
                                                         "value": "Second"}]}]}))
    assert store2.bibs().count() == 2
    assert [r["_id"] for r in
            store2.search("bib", "245__a:second").collect()] == [8]


def test_dedup_index_meta_garbage_raises_clearly(spark, tmp_path):
    """_read_meta over a corrupted params payload must raise a clear
    parse error, never act on garbage parameters."""
    from dlx_spark.operators import dedup_index

    name = "torn_meta_idx"
    spark.createDataFrame([("{not json",)], "params string") \
        .write.mode("overwrite").saveAsTable(f"{name}_meta")
    try:
        with pytest.raises(ValueError):
            dedup_index._read_meta(spark, name)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_meta")


@pytest.mark.slow
def test_streaming_sink_tolerates_torn_attempt_marker(spark, tmp_path):
    """Sink attempt/committed markers are presence-only (touch files) —
    their CONTENT is never parsed, so a torn write can at worst leave a
    valid-but-garbage-bytes marker, which must drive the normal replay
    path (replay_safe dedup), not crash or drop data."""
    from dlx_spark.operators.dedup_index import MinHashIndex
    from dlx_spark import streaming

    docs = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "totally different content with its own words here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    MinHashIndex.create(df.limit(0), "torn_sink_idx", n_buckets=4)
    out = str(tmp_path / "torn_out")
    try:
        fn = streaming.make_neardedup_batch_fn("torn_sink_idx", out)
        run_dir = out + "/run=default"
        fsio.mkdirs(spark, run_dir)
        # garbage-content attempt marker from a "crashed" prior attempt
        # of THIS run: presence → replay mode; content must not matter
        fsio.write_text(spark, run_dir + "/_attempt_batch_0",
                        '{"files": ["part-trunc')
        fn(df, 0)
        got = spark.read.parquet(out)
        assert got.count() == 2
        assert fsio.exists(spark, run_dir + "/_committed_batch_0")
        assert not fsio.exists(spark, run_dir + "/_attempt_batch_0")
    finally:
        MinHashIndex(spark, "torn_sink_idx").drop()


def test_reader_during_ivf_refresh(spark, tmp_path):
    """Reader contract around refresh_ivf_index's rename-aside swap: a
    handle resolved BEFORE the refresh may fail (its file listing names
    renamed-away paths) or may still answer, but must never answer
    garbage; a FRESH read after the swap sees the complete re-assigned
    index (same ids, same vectors, new list layout)."""
    from dlx_spark.operators import bucketing, similarity

    rng = np.random.RandomState(9)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = "t_r6_idx_reader"
    cents = similarity.ivf_centroids(df, n_centroids=4, seed=9)
    try:
        bucketing.write_ivf_index(df, path, cents)

        before = spark.table(path)
        want = {r["id"] for r in before.select("id").collect()}
        assert want == set(range(80))

        bucketing.refresh_ivf_index(spark, path, n_centroids=4, seed=10)
        try:
            got_old = {r["id"] for r in before.select("id").collect()}
            assert got_old == want      # stale handle: right answer
        except Exception:
            pass                        # or a clean failure — never garbage
        fresh = {r["id"] for r in
                 spark.table(path).select("id").collect()}
        assert fresh == want
        assert not spark.catalog.tableExists(path + "__refresh")
    finally:
        for t in (path, path + "__refresh"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_table_backend_seam_routes_every_index_operation(spark):
    """The pluggable table-commit backend (dlx_spark.tableio): a
    recording subclass installed via set_backend must see EVERY catalog
    operation of an index create/probe/append/compact/drop cycle — no
    index call-site may reach saveAsTable/DROP TABLE directly — and the
    results through the recording backend equal the plain run."""
    from dlx_spark import tableio
    from dlx_spark.operators.dedup_index import DigestIndex

    class Recording(tableio.ParquetTableBackend):
        def __init__(self):
            self.calls = []

        def write(self, df, table, key, n_buckets):
            self.calls.append(("write", table))
            super().write(df, table, key, n_buckets)

        def write_plain(self, df, table):
            self.calls.append(("write_plain", table))
            super().write_plain(df, table)

        def append(self, df, table, key, n_buckets):
            self.calls.append(("append", table))
            super().append(df, table, key, n_buckets)

        def read(self, spark, table):
            self.calls.append(("read", table))
            return super().read(spark, table)

        def replace(self, spark, table, staged, **kw):
            # the seam's conflict-handling kwargs (token/on_conflict)
            # must pass through overriding backends
            self.calls.append(("replace", table))
            super().replace(spark, table, staged, **kw)

        def drop(self, spark, table):
            self.calls.append(("drop", table))
            super().drop(spark, table)

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta")],
        "doc_id long, text string")

    rec = Recording()
    tableio.set_backend(rec)
    try:
        idx = DigestIndex.create(docs, "t_seam_idx", n_buckets=2)
        clean = sorted(r["doc_id"] for r in
                       idx.dedup_batch(batch).collect())
        assert clean == [11]
        idx.compact()
        idx.drop()
    finally:
        tableio.set_backend(tableio.ParquetTableBackend())

    ops = {op for op, _ in rec.calls}
    assert {"write", "write_plain", "append", "read",
            "replace", "drop"} <= ops
    tables = {t for _, t in rec.calls}
    assert "t_seam_idx_digests" in tables and "t_seam_idx_meta" in tables


# ---------------------------------------------------------------------------
# Self-review fixes: re-entrant replace, banded probe defaults, legacy layouts
# ---------------------------------------------------------------------------

def test_tableio_replace_is_reentrant_after_drop_crash(spark):
    """A replace that crashed after its DROP but before the RENAME must
    be re-runnable by recovery: the second call cannot fail on the
    already-missing target table."""
    from dlx_spark import tableio

    be = tableio.ParquetTableBackend()
    df = spark.createDataFrame([(1,)], "x long")
    be.write_plain(df, "t_reent")
    be.write_plain(df, "t_reent__stage")
    spark.sql("DROP TABLE t_reent")          # simulate crash-after-DROP
    be.replace(spark, "t_reent", "t_reent__stage")   # recovery re-runs
    assert {r["x"] for r in be.read(spark, "t_reent").collect()} == {1}
    assert not be.exists(spark, "t_reent__stage")
    be.drop(spark, "t_reent")


def test_banded_probe_defaults_do_not_conflict(spark, tmp_path):
    """bands>1 with the DEFAULT multiprobe argument must work (the
    single-band convenience default resolves to 0 for banded layouts
    instead of raising)."""
    import numpy as np
    from dlx_spark.operators import bucketing

    rng = np.random.RandomState(5)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = "t_r6_banded_defaults"
    bucketing.write_lsh_index(df, path, n_planes=5, bands=3, dim=8)
    q = rows[0][1]
    got = bucketing.probe_lsh_index(spark, path, q, k=3, n_planes=5,
                                    bands=3).collect()
    assert rows[0][0] in {r["id"] for r in got}
    probes = df.limit(5)
    got2 = bucketing.knn_join_lsh_index(spark, path, probes, k=2,
                                        n_planes=5, bands=3, dim=8)
    assert got2.count() > 0
    # explicit multiprobe with bands>1 still refuses
    with pytest.raises(ValueError):
        bucketing.probe_lsh_index(spark, path, q, bands=3,
                                  multiprobe_hamming=1)
    spark.sql(f"DROP TABLE IF EXISTS {path}")


def test_legacy_single_band_lsh_index_still_probes(spark, tmp_path):
    """Indexes written by the pre-banding layout (no band column,
    partitioned by bucket only) keep working through both probes, and
    a banded probe against them raises a clear error."""
    import numpy as np
    from dlx_spark.operators import bucketing, similarity

    rng = np.random.RandomState(6)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = "t_r6_legacy_lsh"
    # the OLD layout: (id, bucket, vec) partitioned by bucket, no band
    (similarity.lsh_buckets(df, n_planes=5, dim=8)
     .write.mode("overwrite").partitionBy("bucket").saveAsTable(path))

    q = rows[0][1]
    got = bucketing.probe_lsh_index(spark, path, q, k=3, n_planes=5).collect()
    assert rows[0][0] in {r["id"] for r in got}
    got2 = bucketing.knn_join_lsh_index(spark, path, df.limit(5), k=2,
                                        n_planes=5, dim=8)
    assert got2.count() > 0
    with pytest.raises(ValueError):
        bucketing.probe_lsh_index(spark, path, q, n_planes=5, bands=2)
    spark.sql(f"DROP TABLE IF EXISTS {path}")


def test_embedding_index_legacy_layout_raises_clearly(spark):
    """Opening an EmbeddingIndex whose tables predate the two-table
    layout must raise a clear rebuild error, not probe a nonexistent
    buckets table."""
    from dlx_spark.operators.dedup_index import EmbeddingIndex, _write_meta

    spark.createDataFrame([(1, [1.0, 0.0], 3)],
                          "id long, vec array<double>, bucket long") \
        .write.mode("overwrite").saveAsTable("t_legacy_emb_vecs")
    _write_meta(spark, "t_legacy_emb",
                {"vec_col": "embedding", "id_col": "vec_id",
                 "n_planes": 8, "seed": 42, "dim": 2, "n_buckets": 32})
    try:
        with pytest.raises(RuntimeError, match="rebuild"):
            EmbeddingIndex(spark, "t_legacy_emb")
    finally:
        for t in ("t_legacy_emb_vecs", "t_legacy_emb_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
