"""Scale probe: replicate the sf0.1 documents corpus N× (default 20×,
~100k docs) into a temp parquet directory and time the heavy pipeline
operators on it.  Prints one JSON line.

This is the linearity check behind the README throughput numbers: the
per-doc rates should hold (or improve, as fixed costs amortize) as the
corpus multiplier grows, because every stage is a partition-parallel
map or a key-bucketed join with no driver-side state.

Usage: python tools/scale_probe.py [multiplier]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import functions as F

    from dlx_spark import get_spark
    from dlx_spark.operators import chunking, dedup, textstats

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = None
    for i in range(mult):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        big = d if big is None else big.unionByName(d)

    workdir = tempfile.mkdtemp(prefix="dlx_spark_scale_")
    corpus_path = os.path.join(workdir, "docs")
    try:
        big.repartition(cpus).write.mode("overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        n = corpus.count()

        timings: dict[str, float] = {}

        t0 = time.time()
        dedup.minhash_signatures(corpus).agg(F.sum(F.expr("sig[0]"))).collect()
        timings["minhash_signatures"] = round(time.time() - t0, 2)

        t0 = time.time()
        n_pairs = dedup.minhash_near_duplicates(corpus).count()
        timings["minhash_lsh_full"] = round(time.time() - t0, 2)

        t0 = time.time()
        chunks = chunking.chunk_documents(corpus, 128, 16)
        # force the chunk_text slice/join to actually run — a bare
        # count() would prune the projection and time only the explode
        agg = chunks.agg(F.count(F.lit(1)).alias("n"),
                         F.sum(F.length("chunk_text"))).collect()[0]
        n_chunks = agg["n"]
        timings["chunking"] = round(time.time() - t0, 2)

        t0 = time.time()
        textstats.quality_score(corpus).agg(F.avg("quality")).collect()
        timings["quality_score"] = round(time.time() - t0, 2)

        print(json.dumps({
            "metric": "scale_probe",
            "n_docs": n,
            "multiplier": mult,
            "near_dup_pairs": n_pairs,
            "n_chunks": n_chunks,
            "sig_docs_per_sec": round(n / timings["minhash_signatures"]),
            "timings_sec": timings,
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
