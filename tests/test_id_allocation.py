"""CAS-serialized id allocation (r11).

The reference assigns fresh record ids from an atomic Mongo
incrementer; before r11 this engine derived them from the manifest's
``max_id`` hint with a read-then-commit shape, so two drivers could
read the same hint and stamp duplicate _ids onto all-new batches.
``_allocate_ids`` reserves the whole range inside the backend's commit
CAS instead — concurrent allocations observe each other's bumps on
retry and receive disjoint ranges (cross-process proof in
test_multiprocess_commit.py::test_two_driver_processes_disjoint_ids).
"""

from datetime import datetime

import pytest

from dlx_spark.marc import Auth, Bib
from dlx_spark.marc.store import MarcStore

T0 = datetime(2026, 1, 1, 12, 0, 0)
T1 = datetime(2026, 1, 2, 12, 0, 0)


@pytest.fixture
def store(spark, tmp_path, auth_docs, bib_docs):
    st = MarcStore(spark, str(tmp_path / "warehouse"))
    st.commit([Auth(d) for d in auth_docs], user="seeder", now=T0)
    idx = st.auth_index()
    st.commit([Bib(d, auth_index=idx) for d in bib_docs],
              user="seeder", now=T0)
    return st


def test_allocator_seeds_from_max_id_and_is_monotonic(store):
    # seeded store has bibs 1..2 -> first allocation starts at 3
    base = store._allocate_ids("bib", 3)
    assert base == 2                      # ids 3,4,5
    # subsequent allocations continue from the counter, never reusing
    assert store._allocate_ids("bib", 2) == 5     # ids 6,7
    # per-record-type counters are independent
    assert store._allocate_ids("auth", 1) == 2    # auths 1..2 -> id 3


def test_allocator_respects_floor_from_explicit_ids(store):
    # an explicit id far above the counter must push allocation past it
    base = store._allocate_ids("bib", 2, floor=1000)
    assert base == 1000                   # ids 1001,1002
    # and the counter itself moved: the next allocation stays above
    assert store._allocate_ids("bib", 1) == 1002


@pytest.mark.slow
def test_allocator_never_reuses_after_delete(store):
    store.delete("bib", 2, user="d", now=T1)
    rec = Bib().set("245", "a", "fresh", auth_control=False)
    ids = store.commit([rec], now=T1, auth_check=False)
    assert ids == [3]     # id 2 is deleted, never reassigned


@pytest.mark.slow
def test_commit_frame_null_ids_route_through_allocator(store, spark):
    from pyspark.sql import functions as F

    from dlx_spark import schemas

    df = spark.range(4).select(
        F.lit(None).cast("long").alias("_id"),
        F.lit(None).cast("string").alias("leader"),
        F.lit(None).cast(schemas.MARC["controlfields"].dataType)
         .alias("controlfields"),
        F.array(F.struct(
            F.lit("245").alias("tag"), F.lit(" ").alias("ind1"),
            F.lit(" ").alias("ind2"),
            F.array(F.struct(
                F.lit("a").alias("code"),
                F.concat(F.lit("Doc "), F.col("id")).alias("value"),
                F.lit(None).cast("long").alias("xref"))).alias("subfields"),
        )).alias("datafields"),
        F.lit(None).cast("timestamp").alias("created"),
        F.lit(None).cast("string").alias("created_user"),
        F.lit(None).cast("timestamp").alias("updated"),
        F.lit(None).cast("string").alias("user"),
        F.lit(None).cast("string").alias("basket"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast(schemas.MARC["words"].dataType).alias("words"),
    )
    n = store.commit_frame(df, "bib", user="ingest", now=T1,
                           auth_check=False)
    assert n == 4
    got = sorted(r["_id"] for r in store.bibs().select("_id").collect())
    assert got == [1, 2, 3, 4, 5, 6]
    # the counter advanced past the frame
    assert store._allocate_ids("bib", 1) == 6


def test_update_extra_creates_and_bumps_metadata_table(spark, tmp_path):
    from dlx_spark.tableio_versioned import VersionedTableBackend

    be = VersionedTableBackend(root=str(tmp_path / "v"))
    assert not be.exists(spark, "counter")
    got = be.update_extra(spark, "counter",
                          lambda head: {"n": (head or {}).get("n", 0) + 5})
    assert got == {"n": 5}
    assert be.exists(spark, "counter")
    assert be.latest_manifest(spark, "counter")["segments"] == []
    got = be.update_extra(spark, "counter",
                          lambda head: {"n": head["n"] + 5})
    assert got == {"n": 10}
