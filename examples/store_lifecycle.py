"""Operating the MARC warehouse over its whole lifecycle — runnable:

    python examples/store_lifecycle.py [workdir]

The maintenance story a production deployment runs, in order:

1.  bulk-ingest a corpus (pure-insert fast path: NULL ids)
2.  build the persisted search index (tag-partitioned token table)
    and the deleted-records summary (O(deleted-set) sweeps)
3.  daily-delta upserts + deletes — every derived table maintained
    O(batch) under write-ahead markers
4.  query across sessions (a FRESH store instance: no warm caches)
5.  compact (fold delta segments), rebucket (grow the modulus with
    the store), vacuum (reclaim superseded segments)
6.  crash-consistency: everything above re-converges on open

Reference workflow analog: dlx init_indexes + daily imports + Mongo
TTL/compact maintenance (dag-hammarskjold-library/dlx scripts/).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from dlx_spark import get_spark
    from dlx_spark.marc.record import Auth, Bib
    from dlx_spark.marc.store import MarcStore

    workdir = sys.argv[1] if len(sys.argv) > 1 else \
        tempfile.mkdtemp(prefix="dlx_store_lifecycle_")
    root = os.path.join(workdir, "wh")
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark("store-lifecycle", cpus=8)
    t0 = datetime(2026, 1, 1)

    # -- 1. bulk ingest ----------------------------------------------------
    store = MarcStore(spark, root)
    auths = [Auth().set("150", "a", f"Subject {i}", auth_control=False)
             for i in range(1, 11)]
    store.commit(auths, user="loader", now=t0)

    docs = []
    for i in range(200):
        b = Bib()
        b.set("245", "a", f"Annual report volume {i}", auth_control=False)
        b.set("269", "a", "2026-01-01", auth_control=False)
        docs.append(b)
    ids = store.commit(docs, user="loader", now=t0)
    print(f"ingested {len(ids)} bibs, max_id={store.max_id('bib')} "
          f"(manifest hint, no scan)")

    # -- 2. persisted derived tables --------------------------------------
    store.build_search_index("bib")      # the _index_{tag} analog
    store.build_deleted_summary("bib")   # O(deleted-set) date sweeps
    print("search index + deleted summary built")

    # -- 3. daily delta ----------------------------------------------------
    day2 = datetime(2026, 1, 2)
    edit = store.get("bib", ids[0])
    edit.set("245", "a", "Annual report volume 0 (revised)")
    store.commit([edit], user="editor", now=day2)
    store.delete("bib", ids[1], user="editor", now=day2)
    # every touched table committed O(batch): one delta segment each

    # -- 4. cross-session queries ------------------------------------------
    fresh = MarcStore(spark, root)       # new instance = fresh session
    hits = [r["_id"] for r in
            fresh.search("bib", "245__a:revised").collect()]
    assert hits == [ids[0]], hits
    deleted = [r["record_id"] for r in fresh.find_deleted("bib").collect()]
    assert deleted == [ids[1]], deleted
    page = fresh.search("bib", "245__a:annual", sort=["_id"],
                        limit=5).collect()
    assert len(page) == 5
    print(f"fresh session: indexed search -> {hits}, "
          f"deleted sweep -> {deleted}, page of 5 ok")

    # -- 5. maintenance ----------------------------------------------------
    store.compact("bib")                 # fold delta segments
    store.rebucket("bib", 32)            # scale the pt modulus
    reclaimed = store.vacuum(min_age_seconds=0)
    print(f"compacted, rebucketed to 32, vacuum reclaimed "
          f"{len(reclaimed)} superseded segments")

    # -- 6. everything still answers correctly ------------------------------
    again = MarcStore(spark, root)
    assert again.n_buckets("bib") == 32
    assert [r["_id"] for r in
            again.search("bib", "245__a:revised").collect()] == [ids[0]]
    assert again.find_deleted("bib").count() == 1
    assert again.get("bib", ids[2]).get_value("245", "a") \
        == "Annual report volume 2"
    assert len(again.history("bib", ids[0])) == 2
    print("post-maintenance reopen: search, sweep, point read, history OK")
    print(f"workdir: {workdir}")


if __name__ == "__main__":
    main()
