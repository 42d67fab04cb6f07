"""Round-11 measurement harness (guide §1): per headline query,

- dump ``explain("formatted")`` to plans/r11/<query>_<tag>.txt
- time plan construction (Python call + analysis) separately from
  execution
- time execution against the noop sink (guide §1.4 — computes every
  column, no collect-side agg machinery) AND with bench.py's xxhash
  action (round-over-round comparability)

Usage: python tools/profile_queries.py <tag> [query ...]
(tag = "before" / "after"; default queries = the bench HEADLINE list)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import HEADLINE
    from dlx_spark import contract
    from dlx_spark.session import get_spark

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("dlx_spark_profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    # warm JVM + parquet footers
    contract.BENCH["count_filtered"](spark, sf_dir).collect()

    rows = []
    for name in names:
        fn = contract.BENCH[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # ---- plan construction + analysis (driver-side only)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.schema  # forces analysis
        t_plan = time.time() - t0
        # ---- plan dump (pre-execution, AQE isFinalPlan=false)
        txt = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        # ---- noop sink: warmup + 3 timed
        noop = []
        for _ in range(4):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(time.time() - t0)
        # ---- bench-compatible xxhash action: warmup + 3 timed
        xx = []
        for _ in range(4):
            t0 = time.time()
            d = fn(spark, sf_dir)
            d.agg(F.bit_xor(F.xxhash64(*d.columns))).collect()
            xx.append(time.time() - t0)
        nmed = sorted(noop[1:])[1]
        xmed = sorted(xx[1:])[1]
        rows.append((name, t_plan, noop[0], nmed, xx[0], xmed))
        print(f"{name:24s} plan={t_plan:6.3f}  noop_warm={noop[0]:6.3f} "
              f"noop_med={nmed:6.3f}  xx_warm={xx[0]:6.3f} xx_med={xmed:6.3f}",
              flush=True)
        spark.sparkContext.setJobDescription(None)

    print("\nname,plan_s,noop_warmup,noop_median,xx_warmup,xx_median")
    for r in rows:
        print("%s,%.3f,%.3f,%.3f,%.3f,%.3f" % r)
    total = sum(r[5] for r in rows)
    print(f"TOTAL xx_median: {total:.3f}s over {len(rows)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
