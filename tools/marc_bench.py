"""MARC-side throughput benchmark: generates N synthetic JMARC records,
then times the engine's derivation pipeline (text/words + logical
fields), the exploded-view build, a DSL query, and serialization.

Context: the reference's only published number is ≈15 minutes for a full
logical-fields + browse-index rebuild of its production MongoDB
(dlx/scripts/build_logical_fields.py:2-3).  This reports records/second
for the equivalent derivation on local[N].

Usage: python tools/marc_bench.py [n_records]
       python tools/marc_bench.py --store [n_records]
       python tools/marc_bench.py --query [n_records]
       python tools/marc_bench.py --cascade [n_bibs]
       python tools/marc_bench.py --ingest [n_records]

``--store`` (default 1,000,000 records) measures the full STORE
pipeline — the reference's hottest production path — not just the
derivation: ``commit_frame`` bulk ingest (id assignment, distributed
auth validation, headings join, history append, bucketed upsert), an
incremental upsert batch, the bucket-pruned point read, and
heading-change propagation (one auth heading edit recommitting every
attached bib through the same distributed pipeline).  The numbers land
in README's throughput table; the commit job's plan is dumped into
PLANS.md by tools/dump_plans.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dlx_spark import plans  # noqa: E402


WORDS = ("report security council climate change development human rights "
         "economic social affairs peacekeeping resolution assembly general "
         "committee session agenda international cooperation").split()


def synth_records_df(spark, n: int, xref_col=None):
    """Deterministic synthetic bibs: 6 fields incl. repeated tags and a
    linked 650 pointing at one of 1000 auths (or at ``xref_col`` — a
    Column over ``_id`` — when given, e.g. ``F.lit(1)`` to attach every
    bib to one auth for the cascade probe)."""
    from dlx_spark import schemas
    base = spark.range(1, n + 1).select(F.col("id").alias("_id"))

    def pick(i, k):
        return F.element_at(F.array(*[F.lit(w) for w in WORDS]),
                            (F.pmod(F.col("_id") * k + i, F.lit(len(WORDS))) + 1).cast("int"))

    def field(tag, *subs):
        return F.struct(
            F.lit(tag).alias("tag"), F.lit(" ").alias("ind1"), F.lit(" ").alias("ind2"),
            F.array(*[
                F.struct(F.lit(code).alias("code"), val.alias("value"),
                         xref.alias("xref") if xref is not None else F.lit(None).cast("long").alias("xref"))
                for code, val, xref in subs
            ]).alias("subfields"))

    title = F.concat_ws(" ", pick(1, 3), pick(2, 5), pick(3, 7), pick(4, 11))
    note1 = F.concat_ws(" ", pick(5, 13), pick(6, 17), pick(7, 19))
    note2 = F.concat_ws(" ", pick(8, 23), pick(9, 29))
    symbol = F.concat(F.lit("A/RES/"), F.col("_id").cast("string"))
    xref = (xref_col.cast("long") if xref_col is not None
            else (F.pmod(F.col("_id"), F.lit(1000)) + 1).cast("long"))

    df = base.select(
        "_id",
        F.lit("00000nam a2200000 a 4500").alias("leader"),
        F.array(F.struct(F.lit("008").alias("tag"), F.lit("controlfield").alias("value"))).alias("controlfields"),
        F.array(
            field("191", ("a", symbol, None)),
            field("245", ("a", title, None), ("b", note2, None)),
            field("520", ("a", note1, None)),
            field("520", ("a", note2, None)),
            F.struct(F.lit("650").alias("tag"), F.lit(" ").alias("ind1"), F.lit(" ").alias("ind2"),
                     F.array(F.struct(F.lit("a").alias("code"),
                                      F.concat(F.lit("Heading "), xref.cast("string")).alias("value"),
                                      xref.alias("xref"))).alias("subfields")),
        ).alias("datafields"),
        F.lit(None).cast("timestamp").alias("created"),
        F.lit(None).cast("string").alias("created_user"),
        F.lit(None).cast("timestamp").alias("updated"),
        F.lit(None).cast("string").alias("user"),
        F.lit(None).cast("string").alias("basket"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("array<string>").alias("words"),
    )
    return df


def synth_auths_df(spark, n_auths: int, see_also_col=None):
    """Deterministic auths: _id 1..n with a 150$a 'Heading i' — the
    targets of the bib generator's 650 xrefs.  ``see_also_col`` (a
    nullable-long Column over ``_id``) adds a 550 see-also field linked
    to that auth id where non-null — the auth→auth edge the cascade
    probe plants (550$a is authority-controlled by 150 per
    config.AUTHORITY_CONTROLLED['auth'])."""
    base = spark.range(1, n_auths + 1).select(F.col("id").alias("_id"))
    heading = F.concat(F.lit("Heading "), F.col("_id").cast("string"))
    f150 = F.struct(
        F.lit("150").alias("tag"), F.lit(" ").alias("ind1"),
        F.lit(" ").alias("ind2"),
        F.array(F.struct(F.lit("a").alias("code"),
                         heading.alias("value"),
                         F.lit(None).cast("long").alias("xref"))
                ).alias("subfields"))
    if see_also_col is None:
        datafields = F.array(f150)
    else:
        sa = see_also_col.cast("long")
        f550 = F.struct(
            F.lit("550").alias("tag"), F.lit(" ").alias("ind1"),
            F.lit(" ").alias("ind2"),
            F.array(F.struct(
                F.lit("a").alias("code"),
                F.concat(F.lit("Heading "), sa.cast("string")).alias("value"),
                sa.alias("xref"))).alias("subfields"))
        datafields = F.when(sa.isNotNull(),
                            F.array(f150, f550)).otherwise(F.array(f150))
    return base.select(
        "_id",
        F.lit("00000nz  a2200000n  4500").alias("leader"),
        F.array(F.struct(F.lit("008").alias("tag"),
                         F.lit("controlfield").alias("value"))
                ).alias("controlfields"),
        datafields.alias("datafields"),
        F.lit(None).cast("timestamp").alias("created"),
        F.lit(None).cast("string").alias("created_user"),
        F.lit(None).cast("timestamp").alias("updated"),
        F.lit(None).cast("string").alias("user"),
        F.lit(None).cast("string").alias("basket"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("array<string>").alias("words"),
    )


def store_main():
    """--store [n]: the MarcStore pipeline at scale (see module
    docstring).  1M records is ~16× the reference's production bib
    count; its published rebuild of logical fields alone takes ≈15 min
    (dlx/scripts/build_logical_fields.py:2-3)."""
    import tempfile

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from dlx_spark.marc.store import MarcStore
    from dlx_spark.session import get_spark

    spark = get_spark("marc_store_bench",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="dlx_marc_store_")
    timings = {}
    try:
        store = MarcStore(spark, root)

        t0 = time.time()
        store.commit_frame(synth_auths_df(spark, 1000), record_type="auth")
        timings["commit_1k_auths"] = round(time.time() - t0, 2)

        # bulk ingest with NULL _ids: exercises max_id, the
        # per-partition-offset id assignment, validation of every xref
        # against the auths table, the headings join on derive, history
        # append, and the bucketed upsert
        bibs = synth_records_df(spark, n).withColumn(
            "_id", F.lit(None).cast("long"))
        t0 = time.time()
        n_committed = store.commit_frame(bibs, record_type="bib")
        timings["commit_frame_bulk"] = round(time.time() - t0, 2)
        assert n_committed == n, (n_committed, n)

        # incremental upsert: 10k existing ids with changed titles —
        # the daily-delta shape (history gains a version per row).
        # Merge-on-read contract: this appends ONE delta segment, so
        # the wall time must stay FLAT as the store grows (run with
        # n=1M and n=4M to verify — the old bucket-rewrite layout
        # scaled it with store size, ~35% of a full rebuild for a 1%
        # batch).  Two batches: steady state, no table-creation edge.
        for wave in (1, 2):
            delta = synth_records_df(spark, 10_000)
            t0 = time.time()
            store.commit_frame(delta, record_type="bib")
            timings[f"commit_frame_10k_upsert_{wave}"] = round(
                time.time() - t0, 2)
        timings["commit_frame_10k_upsert"] = timings[
            "commit_frame_10k_upsert_2"]

        # pure-insert append (NULL ids): the all-new fast path — no
        # created-stamp join, no prev-id intersection, no history
        # version-base scan, so the wall must not grow with store size
        # (the dominant shape of appending new documents at 100 TB)
        fresh = synth_records_df(spark, 10_000).withColumn(
            "_id", F.lit(None).cast("long"))
        t0 = time.time()
        store.commit_frame(fresh, record_type="bib")
        timings["commit_frame_10k_new_append"] = round(time.time() - t0, 2)
        live_segments = len(store._live("bib").segments(spark))

        t0 = time.time()
        rec = store.get("bib", n // 2)
        timings["point_read_get"] = round(time.time() - t0, 2)
        assert rec is not None

        # id assignment cost per commit batch: the manifest's monotonic
        # max_id hint vs the live ∪ history scan it replaces (what a
        # pre-hint store pays; at 100 TB the scan is the whole store's
        # _id column plus the larger version log)
        t0 = time.time()
        hinted = store.max_id("bib")
        timings["max_id_hint"] = round(time.time() - t0, 3)
        t0 = time.time()
        scan_live = store.table("bib").agg(
            F.max("_id").alias("m")).first()["m"] or 0
        scan_hist = store.history_df("bib").agg(
            F.max("record_id").alias("m")).first()["m"] or 0
        timings["max_id_scan_equivalent"] = round(time.time() - t0, 2)
        assert hinted == max(scan_live, scan_hist), (hinted, scan_live,
                                                     scan_hist)

        # the amortized maintenance cost the O(batch) commits defer.
        # First the MINOR fold (compact_deltas: merge the accumulated
        # batch deltas into one, base segment untouched) — O(batches)
        # and must stay flat as the store grows; then the full fold,
        # the occasional O(store) deep-clean
        t0 = time.time()
        store.compact("bib", minor=True)
        timings["compact_bib_minor"] = round(time.time() - t0, 2)
        assert len(store._live("bib").segments(spark)) == 2
        t0 = time.time()
        assert store.get("bib", n // 4) is not None
        timings["point_read_get_after_minor_compact"] = round(
            time.time() - t0, 2)
        t0 = time.time()
        store.compact("bib")
        timings["compact_bib"] = round(time.time() - t0, 2)
        t0 = time.time()
        assert store.get("bib", n // 3) is not None
        timings["point_read_get_after_compact"] = round(time.time() - t0, 2)

        # rebucket: scale the bucket modulus with the store (16 buckets
        # at 4M ≈ the per-bucket bytes of 64 at 16M — the knob that
        # keeps point-read pruning constant as the store grows).  One
        # staged atomic rewrite; the point read after it proves the new
        # modulus prunes (wall roughly flat vs the 1M/16-bucket run).
        new_buckets = max(16, (n // 1_000_000) * 16) * 2
        t0 = time.time()
        store.rebucket("bib", new_buckets)
        timings[f"rebucket_to_{new_buckets}"] = round(time.time() - t0, 2)
        t0 = time.time()
        assert store.get("bib", n // 5) is not None
        timings["point_read_get_after_rebucket"] = round(time.time() - t0, 2)
        assert store.n_buckets("bib") == new_buckets

        # heading-change propagation: one auth heading edit recommits
        # every attached bib (n/1000 of them) through commit_frame
        auth = store.get("auth", 1)
        auth.set("150", "a", "Heading 1 renamed")
        t0 = time.time()
        store.commit([auth])
        timings["heading_change_propagation"] = round(time.time() - t0, 2)
        n_attached = n // 1000 + (1 if n % 1000 else 0)

        hist_rows = store.history_df("bib").count()
        print(json.dumps({
            "metric": "marc_store_pipeline",
            "n_records": n,
            "bulk_records_per_sec": round(
                n / timings["commit_frame_bulk"], 1),
            "attached_recommitted": n_attached,
            "history_rows": hist_rows,
            "live_segments_before_compact": live_segments,
            "timings_sec": timings,
        }))
    finally:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def ingest_main():
    """--ingest [n]: the reference's real ingest workflow — file →
    parse → commit — measured end-to-end.  Serializes n synthetic bibs
    to MRK and MARCXML files (distributed writers), then times the
    parallel parsers (sources/marc_io.py: Hadoop record-delimiter
    splits, executor-side parse, no driver pass) and one full
    ``read_mrk → commit_frame`` ingest into a fresh store.  Sanity
    asserts: the parse fans out across input splits (partition count
    tracks the file parts, never 1), and every record round-trips."""
    import tempfile

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from dlx_spark.marc.store import MarcStore
    from dlx_spark.session import get_spark
    from dlx_spark.sources import marc_io

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("marc_ingest_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="dlx_marc_ingest_")
    timings = {}
    try:
        bibs = synth_records_df(spark, n).repartition(cpus)
        mrk_path = os.path.join(root, "dump_mrk")
        xml_path = os.path.join(root, "dump_xml")
        t0 = time.time()
        marc_io.write_mrk(bibs, mrk_path)
        timings["write_mrk"] = round(time.time() - t0, 2)
        t0 = time.time()
        marc_io.write_marcxml(bibs, xml_path)
        timings["write_xml"] = round(time.time() - t0, 2)

        t0 = time.time()
        parsed_mrk = marc_io.read_mrk(spark, mrk_path)
        n_mrk = parsed_mrk.count()
        timings["parse_mrk"] = round(time.time() - t0, 2)
        n_parts = parsed_mrk.rdd.getNumPartitions()
        assert n_mrk == n, (n_mrk, n)
        assert n_parts >= min(8, cpus), f"parse collapsed to {n_parts} partitions"

        t0 = time.time()
        n_xml = marc_io.read_marcxml(spark, xml_path).count()
        timings["parse_xml"] = round(time.time() - t0, 2)
        assert n_xml == n, (n_xml, n)

        # end-to-end: parse feeds the store's distributed commit
        store = MarcStore(spark, os.path.join(root, "store"))
        store.commit_frame(synth_auths_df(spark, 1000), record_type="auth")
        t0 = time.time()
        n_committed = store.commit_frame(
            marc_io.read_mrk(spark, mrk_path), record_type="bib")
        timings["mrk_to_committed_store"] = round(time.time() - t0, 2)
        assert n_committed == n, (n_committed, n)

        print(json.dumps({
            "metric": "marc_file_ingest",
            "n_records": n,
            "mrk_parse_records_per_sec": round(n / timings["parse_mrk"], 1),
            "xml_parse_records_per_sec": round(n / timings["parse_xml"], 1),
            "file_to_store_records_per_sec": round(
                n / timings["mrk_to_committed_store"], 1),
            "parse_partitions": n_parts,
            "timings_sec": timings,
        }))
    finally:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def cascade_main():
    """--cascade [n_bibs]: multi-hop heading-change propagation at
    scale.  Topology: auth 1 (the root) is referenced by 100 other
    auths (550 see-also, xref→1), auth 1 itself references auth 2
    (550 xref→2 — making auths 1↔2 a CYCLE), and every one of the n
    bibs is 650-linked to auth 1.  One heading edit on the root then
    recommits the full attached set — n bibs + 100 mid auths + the
    cycle partner — in ONE distributed propagation batch.

    The loop guard is structural and exercised at depth ≥2 here: the
    recommitted auths go through commit_frame, which never propagates
    (the engine's analog of the reference's feedback guard,
    dlx/marc/__init__.py:1162-1165), so the 1↔2 cycle terminates and
    the mids' own attached bibs are — correctly — NOT recommitted
    (their cached 650 values denormalize the MIDS' headings, which did
    not change).  Semantics regression-tested at unit scale in
    tests/test_store.py::test_auth_cycle_propagation_terminates."""
    import tempfile

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from dlx_spark.marc.store import MarcStore
    from dlx_spark.session import get_spark

    spark = get_spark("marc_cascade_bench",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="dlx_marc_cascade_")
    timings = {}
    try:
        store = MarcStore(spark, root)
        see = (F.when((F.col("_id") >= 2) & (F.col("_id") <= 101),
                      F.lit(1))
               .when(F.col("_id") == 1, F.lit(2))
               .otherwise(F.lit(None)))
        t0 = time.time()
        store.commit_frame(synth_auths_df(spark, 1000, see_also_col=see),
                           record_type="auth")
        store.commit_frame(synth_records_df(spark, n, xref_col=F.lit(1)),
                           record_type="bib")
        timings["ingest"] = round(time.time() - t0, 2)

        r = store.get("auth", 1)
        r.set("150", "a", "Heading 1 renamed")
        t0 = time.time()
        store.commit([r])
        timings["cascade_propagation"] = round(time.time() - t0, 2)

        # verify: bibs + mid auths refreshed; mids' headings untouched
        mid_bib = store.get("bib", n // 2)
        assert mid_bib.get_value("650", "a") == "Heading 1 renamed"
        a2 = store.get("auth", 2)
        assert a2.get_value("550", "a") == "Heading 1 renamed"
        assert a2.get_value("150", "a") == "Heading 2"
        attached = n + 101                      # bibs + mids + partner
        print(json.dumps({
            "metric": "marc_cascade_propagation",
            "n_bibs": n,
            "attached_recommitted": attached,
            "cascade_sec": timings["cascade_propagation"],
            "attached_per_sec": round(
                attached / timings["cascade_propagation"], 1),
            "timings_sec": timings,
        }))
    finally:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def query_main():
    """--query [n]: the query DSL (``Query.from_string`` →
    ``MarcStore.search``) measured against an n-record store — the
    reference's primary user-facing READ path (dlx/marc/query.py:
    112-346).  Builds the same synthetic store as ``--store``, then
    times each query cold and warm: the first fielded-text query pays
    the tokenized-view build (the analog of the reference's persistent
    ``_index_{tag}`` collections, built here on demand and cached per
    record type); point-id queries exercise the pt-bucket partition
    pruning pinned in tests/test_marc_query_scale.py."""
    import tempfile

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from dlx_spark.marc.store import MarcStore
    from dlx_spark.session import get_spark

    spark = get_spark("marc_query_bench",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="dlx_marc_query_")
    try:
        store = MarcStore(spark, root)
        t0 = time.time()
        store.commit_frame(synth_auths_df(spark, 1000), record_type="auth")
        store.commit_frame(synth_records_df(spark, n), record_type="bib")
        build_sec = round(time.time() - t0, 2)

        queries = {
            # point reads: partition-pruned to 1 (resp. 2) of 16 buckets
            "id_point": f"id:{n // 2}",
            "id_or_ids": f"id:{n // 4} OR id:{n // 2}",
            # fielded text: stemmed containment over the tokenized view
            "fielded_text": "245__a:climate",
            "fielded_phrase": '245__a:"climate change"',
            # auth-controlled expansion: text matches heading values,
            # expands to every record linking the matching auths
            "xref_text_expansion": "650__a:heading",
            "xref_point": "xref:5",
            # derived-column predicate passes (no joins, no Python)
            "logical_field": "title:climate",
            "boolean_combo": "245__a:climate AND NOT 520__a:security",
            # bare free text: stemmed words-array containment — a
            # single pruned-column codegen scan (dlx/marc/query.py:
            # 698-751; deliberately NOT routed through the token index,
            # see parser.py's rationale — re-measured fresh-session
            # below to show it needs no index)
            "bare_text": "climate",
            "bare_text_negated": "climate -security",
        }
        results = {}
        for name, qs in queries.items():
            t0 = time.time()
            hits_cold = store.search("bib", qs).count()
            cold = time.time() - t0
            t0 = time.time()
            hits_warm = store.search("bib", qs).count()
            warm = time.time() - t0
            assert hits_cold == hits_warm
            results[name] = {"query": qs, "hits": hits_cold,
                             "cold_sec": round(cold, 2),
                             "warm_sec": round(warm, 3)}

        warm_total = sum(r["warm_sec"] for r in results.values())

        # pagination: the reference's find()-cursor modifiers.  An
        # orderBy+limit compiles to TakeOrderedAndProject (per-partition
        # top-k, merged on the driver — no global sort exchange); the
        # skip page adds the offset on top.  Both recorded with the
        # executed plan's verdict so a regression to a full sort is
        # visible in the JSON, not just slower.
        pagination = {}
        t0 = time.time()
        page = store.search("bib", "650__a:heading", sort=["_id"], limit=20)
        rows = page.collect()
        pagination["first_page_sec"] = round(time.time() - t0, 2)
        pagination["take_ordered"] = "TakeOrdered" in (
            page._jdf.queryExecution().executedPlan().toString())
        assert len(rows) == 20
        t0 = time.time()
        rows = store.search("bib", "650__a:heading", sort=["_id"],
                            skip=1000, limit=20).collect()
        pagination["skip_1k_page_sec"] = round(time.time() - t0, 2)
        assert len(rows) == 20

        # keyset cursor (r11): resume from ``_id > last`` instead of
        # skip=N.  The skip page is O(offset) — the cursor's deep page
        # costs the same as the first because the predicate reaches the
        # parquet scan (key-sorted segments -> row-group skipping);
        # recorded with the executed-plan verdict so a pushdown
        # regression is visible in the JSON
        deep = max(100, n // 10)
        pagination["skip_deep_offset"] = deep
        t0 = time.time()
        try:
            rows = store.search("bib", "650__a:heading", sort=["_id"],
                                skip=deep, limit=20).collect()
            pagination["skip_deep_page_sec"] = round(time.time() - t0, 2)
            last = int(rows[-1]["_id"])
        except Exception as exc:
            # the O(offset) cursor doesn't merely get slow at depth —
            # at 1M records a skip=100k page EXCEEDS
            # spark.driver.maxResultSize outright (TakeOrdered's reduce
            # ships up to skip+limit full records per partition to the
            # driver).  Recording the failure IS the measurement: deep
            # offset paging cannot run at scale, keyset can.
            pagination["skip_deep_page_sec"] = None
            pagination["skip_deep_error"] = (
                f"{type(exc).__name__}: {str(exc)[:200]}")
            # synthetic ids are dense and every bib links a 650, so the
            # deep-th matching id is ~deep — resume the cursor there
            last = deep
        t0 = time.time()
        kpage = store.search("bib", "650__a:heading", limit=20,
                             after_id=last)
        krows = kpage.collect()
        pagination["keyset_deep_page_sec"] = round(time.time() - t0, 2)
        pagination["keyset_pushed_to_scan"] = "GreaterThan(_id" in (
            kpage._jdf.queryExecution().executedPlan().toString())
        assert len(krows) == 20 and krows[0]["_id"] > last

        # history reads: per-record version chain (pt-pruned) and the
        # deleted-by-date sweep (aggregate over the whole log —
        # reference History.find_deleted, dlx/marc/__init__.py:2345-2384)
        history = {}
        for rid in (7, 11, 13):
            store.delete("bib", rid)
        t0 = time.time()
        versions = store.history("bib", n // 2)
        history["point_history_sec"] = round(time.time() - t0, 2)
        assert len(versions) >= 1
        t0 = time.time()
        n_deleted = store.find_deleted("bib").count()
        history["find_deleted_sec"] = round(time.time() - t0, 2)
        assert n_deleted == 3, n_deleted
        t0 = time.time()
        got = list(store.deleted_by_date(
            "bib", datetime(2000, 1, 1), datetime(2100, 1, 1)))
        history["deleted_by_date_sec"] = round(time.time() - t0, 2)
        assert got == [7, 11, 13], got

        # the persisted deleted-records summary: the sweep becomes an
        # O(deleted set) read instead of the full-log aggregate above
        t0 = time.time()
        store.build_deleted_summary("bib")
        history["summary_build_sec"] = round(time.time() - t0, 2)
        store.delete("bib", 17)          # O(batch) maintenance covered
        t0 = time.time()
        n_deleted = store.find_deleted("bib").count()
        history["find_deleted_summary_sec"] = round(time.time() - t0, 2)
        assert n_deleted == 4, n_deleted
        history["summary_plan_no_history_scan"] = "bib_history" not in \
            plans.simple_plan(store.find_deleted("bib"))

        # persisted search index: the cross-SESSION answer to the
        # one-time tokenized-view build the cold fielded_text number
        # pays above.  Build it, then simulate a fresh session (new
        # MarcStore instance = no cached context) and re-measure the
        # text query cold: with the index, "cold" is a parquet scan.
        t0 = time.time()
        store.build_search_index("bib")
        index_build_sec = round(time.time() - t0, 2)
        fresh = MarcStore(spark, root)
        t0 = time.time()
        hits = fresh.search("bib", "245__a:climate").count()
        indexed_cold = round(time.time() - t0, 2)
        assert hits == results["fielded_text"]["hits"]
        t0 = time.time()
        fresh.search("bib", "245__a:climate").count()
        indexed_warm = round(time.time() - t0, 3)

        # the matched-id semi-join against the base: a selective term's
        # id set is small, and AQE must demote the sort-merge LeftSemi
        # to a broadcast at runtime — recorded from the EXECUTED plan
        probe = fresh.search("bib", "245__a:climate")
        probe.count()
        executed = probe._jdf.queryExecution().executedPlan().toString()
        semi_broadcast = ("BroadcastHashJoin" in executed
                          and "LeftSemi" in executed)

        # bare text fresh-session: the words-column predicate needs no
        # session-built state, so even a cold session answers it as one
        # pruned-column scan (the evidence behind keeping it OFF the
        # token index — parser.py's rationale)
        t0 = time.time()
        bare_hits = fresh.search("bib", "climate").count()
        indexed_bare_cold = round(time.time() - t0, 2)
        assert bare_hits == results["bare_text"]["hits"]
        t0 = time.time()
        fresh.search("bib", "climate").count()
        indexed_bare_warm = round(time.time() - t0, 3)

        # what maintaining the index costs a writer: a 10k upsert with
        # the index live (the refresh is O(batch) — it re-tokenizes the
        # batch and anti-joins the touched buckets, never re-tokenizes
        # the store).  Compare against --store's index-free 10k upsert.
        delta = synth_records_df(spark, 10_000)
        t0 = time.time()
        fresh.commit_frame(delta, record_type="bib")
        upsert_with_index = round(time.time() - t0, 2)

        # targeted heading-staleness repair (r11): a non-propagating
        # auth heading edit flags the index with the CHANGED auth ids;
        # the next search pays an O(attached) refresh — compare
        # heading_repair_sec against index build_sec (what the pre-r11
        # full:True marker cost the next innocent search)
        edited = synth_auths_df(spark, 1000).filter(
            F.col("_id") == 5).withColumn("datafields", F.expr("""
            transform(datafields, f -> IF(f.tag = '150',
                named_struct('tag', f.tag, 'ind1', f.ind1,
                             'ind2', f.ind2,
                    'subfields', transform(f.subfields, s ->
                        named_struct('code', s.code,
                                     'value', 'Benchrenamed heading',
                                     'xref', s.xref))),
                f))"""))
        fresh.commit_frame(edited, record_type="auth", auth_check=False)
        attached = fresh.bibs().count() // 1000  # ~1/1000 link auth 5
        t0 = time.time()
        repair_hits = fresh.search("bib", "650__a:benchrenamed").count()
        heading_repair_sec = round(time.time() - t0, 2)
        assert repair_hits > 0

        print(json.dumps({
            "metric": "marc_query_dsl",
            "n_records": n,
            "store_build_sec": build_sec,
            "warm_queries_per_sec": round(len(results) / warm_total, 2),
            "queries": results,
            "pagination": pagination,
            "history": history,
            "persisted_index": {
                "build_sec": index_build_sec,
                "fielded_text_cold_sec_fresh_session": indexed_cold,
                "fielded_text_warm_sec": indexed_warm,
                "fielded_semi_join_broadcast_post_aqe": semi_broadcast,
                "bare_text_cold_sec_fresh_session": indexed_bare_cold,
                "bare_text_warm_sec": indexed_bare_warm,
                "upsert_10k_with_index_sec": upsert_with_index,
                "heading_repair_sec": heading_repair_sec,
                "heading_repair_attached_approx": attached,
                "heading_repair_hits": repair_hits,
            },
        }))
    finally:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--store":
        store_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--query":
        query_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--cascade":
        cascade_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--ingest":
        ingest_main()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from dlx_spark.session import get_spark
    from dlx_spark.marc import dataframe as mdf

    spark = get_spark("marc_bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    bibs = synth_records_df(spark, n).repartition(32).cache()
    bibs.count()  # materialize input off the clock

    timings = {}

    # warm codegen/JIT on a 100-record slice so the timing below measures
    # steady-state throughput (the regime that matters at scale), then
    # time the full derivation
    warm = mdf.derive_logical_fields(mdf.derive_text_words(bibs.limit(100)), "bib")
    warm.foreach(lambda r: None)

    t0 = time.time()
    derived = mdf.derive_text_words(bibs)
    derived = mdf.derive_logical_fields(derived, "bib")
    derived = derived.cache()
    derived.count()
    timings["derive_full"] = round(time.time() - t0, 2)

    t0 = time.time()
    ex = mdf.explode_subfields(bibs)
    n_subfields = ex.count()
    timings["explode_subfields"] = round(time.time() - t0, 2)

    t0 = time.time()
    from dlx_spark.marc import query as q
    pred = q.Text("climate change").compile()
    n_hits = derived.filter(pred).count()
    timings["text_query"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_uses = mdf.auth_use_counts(bibs).count()
    timings["auth_use_counts"] = round(time.time() - t0, 2)

    print(json.dumps({
        "metric": "marc_derivation_records_per_sec",
        "value": round(n / timings["derive_full"], 1),
        "unit": "records/sec",
        "n_records": n,
        "n_subfields": n_subfields,
        "text_query_hits": n_hits,
        "distinct_xrefs": n_uses,
        "timings_sec": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
