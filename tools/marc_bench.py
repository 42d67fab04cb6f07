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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


WORDS = ("report security council climate change development human rights "
         "economic social affairs peacekeeping resolution assembly general "
         "committee session agenda international cooperation").split()


def synth_records_df(spark, n: int):
    """Deterministic synthetic bibs: 6 fields incl. repeated tags and a
    linked 650 pointing at one of 1000 auths."""
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
    xref = (F.pmod(F.col("_id"), F.lit(1000)) + 1).cast("long")

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


def synth_auths_df(spark, n_auths: int):
    """Deterministic auths: _id 1..n with a 150$a 'Heading i' — the
    targets of the bib generator's 650 xrefs."""
    base = spark.range(1, n_auths + 1).select(F.col("id").alias("_id"))
    heading = F.concat(F.lit("Heading "), F.col("_id").cast("string"))
    return base.select(
        "_id",
        F.lit("00000nz  a2200000n  4500").alias("leader"),
        F.array(F.struct(F.lit("008").alias("tag"),
                         F.lit("controlfield").alias("value"))
                ).alias("controlfields"),
        F.array(F.struct(
            F.lit("150").alias("tag"), F.lit(" ").alias("ind1"),
            F.lit(" ").alias("ind2"),
            F.array(F.struct(F.lit("a").alias("code"),
                             heading.alias("value"),
                             F.lit(None).cast("long").alias("xref"))
                    ).alias("subfields"))).alias("datafields"),
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
        # the daily-delta shape (history gains a version per row)
        delta = synth_records_df(spark, 10_000)
        t0 = time.time()
        store.commit_frame(delta, record_type="bib")
        timings["commit_frame_10k_upsert"] = round(time.time() - t0, 2)

        t0 = time.time()
        rec = store.get("bib", n // 2)
        timings["point_read_get"] = round(time.time() - t0, 2)
        assert rec is not None

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
        print(json.dumps({
            "metric": "marc_query_dsl",
            "n_records": n,
            "store_build_sec": build_sec,
            "warm_queries_per_sec": round(len(results) / warm_total, 2),
            "queries": results,
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
