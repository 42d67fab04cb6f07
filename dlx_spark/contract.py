"""The driver-contract query battery.

One entry per operator category from SURVEY §2 plus the LLM-pipeline
operators, each expressed over the driver's synthetic tables
(``/root/testdata/sf*/``) so the DuckDB oracle can hash-check results.

Conventions (the driver sorts columns by name and hashes values):

- every computed column is aliased IDENTICALLY in the Spark query and
  the oracle SQL;
- floating aggregates are rounded (2–4 dp) on both sides so summation
  order cannot flip the hash;
- top-k queries carry total tiebreakers so the result SET is unique;
- operators whose semantics are not SQL-expressible (minhash-LSH,
  simhash, hyperplane-LSH ANN) have NO oracle entry → the driver records
  the weaker rows-only check, by design.

Each Spark query is written the way it should run at 100 TB: dimension
joins broadcast, aggregations partial-aggregation friendly, window
functions keyed by the natural partition key, scans projecting only the
needed columns (Catalyst prunes to the parquet reader).
"""

from __future__ import annotations

import weakref
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dlx_spark.operators import (
    asof, chunking, dedup, export, multimodal, redact, sampling, similarity,
    spans, textstats)
from dlx_spark.operators.common import (cached_expr, epoch_seconds,
                                        spread_for_compute)

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# English stopword markers shared by the lang/quality queries
_EN = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")
_FR = ("le", "la", "les", "de", "des", "et", "est", "dans", "pour", "que")

# DuckDB RE2 spells unicode escapes \x{..}; same ranges as
# tokenizer.PUNCT_CLASS_JAVA (used by the oracles that must reproduce
# normalized_text exactly)
_PUNCT_DUCK = ("[\\x{0020}-\\x{002f}\\x{003a}-\\x{0040}\\x{005b}-\\x{0060}"
               "\\x{007b}-\\x{007e}\\x{00a0}-\\x{00bf}\\x{2000}-\\x{206f}"
               "\\x{20a0}-\\x{20cf}]+")


#: per-(session, dir, table) memo of the LAZY reader frame.  This holds
#: only the unexecuted scan plan — no ``.cache()``, no rows: every
#: action over the returned frame still reads the parquet file.  What
#: it removes is the ~110 ms of file listing + footer/schema resolution
#: that EVERY ``spark.read.parquet`` call pays through py4j, which a
#: query referencing several tables would otherwise re-pay on each
#: construction (the 4-table multiway_join spent more time re-resolving
#: readers than executing).  Keyed by ``id(session)`` with a weakref
#: guard so a recycled id from a garbage-collected session can never
#: serve a stale frame.
_READERS: dict[tuple[int, str, str], tuple] = {}

#: growth bound for ``_READERS`` (r11 verdict): the weakref guard stops
#: staleness but not leakage — dead-session entries linger, and a
#:  long-lived process cycling many (session, sf_dir) keys would grow
#: the dict forever.  At the cap, sweep dead entries first; refuse new
#: inserts only if every entry is still live.
_READERS_MAX = 4096


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    hit = _READERS.get(key)
    if hit is not None and hit[0]() is spark:
        return hit[1]
    # the driver supplies its own SparkSession: pin UTC so timestamp
    # values agree with the UTC-naive DuckDB oracle regardless of the
    # host timezone (session-sticky, so setting it at reader build
    # covers every later use)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which the vectorized
        # parquet reader rejects; read nanos as long and truncate to
        # micros (exactly what DuckDB's reader does internally).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(cached_expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if len(_READERS) >= _READERS_MAX:
        dead = [k for k, v in _READERS.items() if v[0]() is None]
        for k in dead:
            del _READERS[k]
    if len(_READERS) < _READERS_MAX:
        _READERS[key] = (weakref.ref(spark), df)
    return df


def query(name: str, oracle: str | None = None):
    def deco(fn):
        Q[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# §2.1/§2.2 — scans, filters, predicates
# ---------------------------------------------------------------------------

@query("from_query_filter", """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45 AND l_discount > 0.05 AND l_returnflag = 'R'
""")
def from_query_filter(spark, sf):
    """MarcSet.from_query: predicate scan with projection pushdown
    (reference dlx/marc/__init__.py:78-128)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 45) & (F.col("l_discount") > 0.05)
                  & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query("from_ids", """
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders WHERE o_orderkey IN (1, 2, 3, 7, 32, 33, 34, 36, 38, 39)
""")
def from_ids(spark, sf):
    """MarcSet.from_ids: {_id: {$in: ids}} (dlx/marc/__init__.py:141-143)."""
    return (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderkey").isin([1, 2, 3, 7, 32, 33, 34, 36, 38, 39]))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


@query("sort_skip_limit", """
    SELECT p_partkey, p_name, p_retailprice
    FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10 OFFSET 5
""")
def sort_skip_limit(spark, sf):
    """sort/skip/limit kwargs (reference find passthrough,
    dlx/scripts/build_logical_fields.py:79)."""
    return (
        _t(spark, sf, "part")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .select("p_partkey", "p_name", "p_retailprice")
        .offset(5).limit(10)
    )


@query("count_filtered", """
    SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'
""")
def count_filtered(spark, sf):
    """MarcSet.count with filter (dlx/marc/__init__.py:330-351)."""
    return (_t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
            .agg(F.count(F.lit(1)).alias("cnt")))


@query("max_id", "SELECT max(o_orderkey) AS max_id FROM orders")
def max_id(spark, sf):
    """Marc.max_id (dlx/marc/__init__.py:474-483)."""
    return _t(spark, sf, "orders").agg(F.max("o_orderkey").alias("max_id"))


@query("distinct_values", "SELECT DISTINCT event_type FROM events")
def distinct_values(spark, sf):
    """distinct tag discovery (dlx/scripts/init_indexes.py:146-154)."""
    return _t(spark, sf, "events").select("event_type").distinct()


@query("date_range", """
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-02-01'
""")
def date_range(spark, sf):
    """audit-date range semantics (created/updated, query.py:363-372):
    ':' compiles to a [day, day+1) interval — same shape here."""
    return (
        _t(spark, sf, "orders")
        .filter((F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-02-01").cast("timestamp")))
        .select("o_orderkey", "o_orderdate")
    )


@query("regex_match", """
    SELECT doc_id FROM documents WHERE regexp_matches(text, '^key .*window')
""")
def regex_match(spark, sf):
    """DSL /regex/ value form (query.py:118-150)."""
    return (_t(spark, sf, "documents")
            .filter(F.col("text").rlike("^key .*window")).select("doc_id"))


@query("text_words_all", r"""
    SELECT doc_id FROM documents
    WHERE regexp_matches(text, '\bspark\b') AND regexp_matches(text, '\bquery\b')
""")
def text_words_all(spark, sf):
    """Text words-$all containment (query.py:698-751) — word-boundary
    match of every term."""
    return (
        _t(spark, sf, "documents")
        .filter(F.col("text").rlike(r"\bspark\b") & F.col("text").rlike(r"\bquery\b"))
        .select("doc_id")
    )


@query("text_negation", r"""
    SELECT doc_id FROM documents
    WHERE regexp_matches(text, '\bspark\b') AND NOT regexp_matches(text, '\bslow\b')
""")
def text_negation(spark, sf):
    """Text -word negation ($nin, query.py:727-734)."""
    return (
        _t(spark, sf, "documents")
        .filter(F.col("text").rlike(r"\bspark\b") & ~F.col("text").rlike(r"\bslow\b"))
        .select("doc_id")
    )


@query("text_phrase", """
    SELECT doc_id FROM documents WHERE text LIKE '%fast sort%'
""")
def text_phrase(spark, sf):
    '''Text "phrase" match (regex on padded text, query.py:736-741).'''
    return (_t(spark, sf, "documents")
            .filter(F.col("text").contains("fast sort")).select("doc_id"))


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------

@query("lookup_join", """
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity >= 49
""")
def lookup_join(spark, sf):
    """Linked.value resolution: the read-time xref equi-join against a
    dimension — broadcast hash join (dlx/marc/__init__.py:2698-2717)."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 49)
    part = _t(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "l_linenumber", "p_name", "p_brand")
    )


@query("exists_semijoin", """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""")
def exists_semijoin(spark, sf):
    """Auth.in_use / reverse xlookup as a semi-join
    (dlx/marc/__init__.py:2091-2141)."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    return (cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "leftsemi")
            .select("c_custkey", "c_name"))


@query("not_exists_antijoin", """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""")
def not_exists_antijoin(spark, sf):
    """Condition not_exists modifier as an anti-join (query.py:676-686):
    customers with no FINISHED order.  (Every customer has SOME order in
    the synthetic data, so the unconditioned anti-join selected zero
    rows at every SF and proved nothing.)"""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return (cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "leftanti")
            .select("c_custkey", "c_name"))


@query("multiway_join", """
    SELECT n.n_name AS nation, round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
""")
def multiway_join(spark, sf):
    """multi-hop dimension join (the $lookup aggregation analog,
    build_logical_fields.py:151-158), dims-first: the dimension chain
    customer ⋈ nation ⋈ region(ASIA) folds FIRST into one slim
    (custkey, nation-name) relation, and the fact table sees a single
    broadcast join.  Catalyst does not reorder this on its own (CBO
    join reordering is off by default), and the order matters twice:
    the broadcast build drops to the filtered region's customers
    (~1/5 here; at real scale broadcasting the UNFILTERED customer dim
    is the difference between a working plan and an OOM), and the fact
    rows touch one join instead of three (measured 0.80 s vs 0.99 s
    at sf0.1, identical results)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    dims = (c.join(n, c["c_nationkey"] == n["n_nationkey"])
             .join(r, n["n_regionkey"] == r["r_regionkey"])
             .select("c_custkey", "n_name"))
    return (
        o.join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# §2.4 — aggregation, windows, set ops
# ---------------------------------------------------------------------------

@query("rollup_agg", """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_agg(spark, sf):
    """hierarchical subtotal rollup: flag, (flag, status), and grand
    total in one pass — Spark expands the grouping sets before the same
    single partial-agg shuffle as a plain groupBy."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query("cumulative_share", """
    SELECT l_returnflag, l_linestatus, n,
           round(CAST(running AS DOUBLE) / total, 4) AS cum_share
    FROM (
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               sum(count(*)) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_linestatus
                                   ROWS UNBOUNDED PRECEDING) AS running,
               sum(count(*)) OVER (PARTITION BY l_returnflag) AS total
        FROM lineitem GROUP BY l_returnflag, l_linestatus)
""")
def cumulative_share(spark, sf):
    """running-total window over a pre-aggregated frame: the aggregate
    shrinks the data BEFORE the window, so the window sort touches a few
    rows per key, not the fact table."""
    li = _t(spark, sf, "lineitem")
    grouped = (li.groupBy("l_returnflag", "l_linestatus")
               .agg(F.count(F.lit(1)).alias("n")))
    w_run = (Window.partitionBy("l_returnflag").orderBy("l_linestatus")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy("l_returnflag")
    return grouped.select(
        "l_returnflag", "l_linestatus", "n",
        F.round(F.sum("n").over(w_run).cast("double") / F.sum("n").over(w_all), 4)
        .alias("cum_share"),
    )


@query("agg_summary", """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
""")
def agg_summary(spark, sf):
    """pricing-summary aggregate (TPC-H Q1 shape): map-side partial
    aggregation into a 6-group shuffle — the canonical scale-safe agg."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
             F.round(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
    )


@query("group_counts", """
    SELECT event_type, count(*) AS n, round(avg(value), 2) AS avg_value
    FROM events GROUP BY event_type
""")
def group_counts(spark, sf):
    """calculate_auth_use: unwind→group→count (build_logical_fields.py:
    218-252)."""
    return (_t(spark, sf, "events").groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 2).alias("avg_value")))


@query("latest_by_key", """
    SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
""")
def latest_by_key(spark, sf):
    """latest_by_identifier_language: top-1 per key window
    (dlx/file/__init__.py:295-304).

    r11 note (measured, then kept as-is): a ``max_by(struct, struct)``
    aggregate formulation was built and A/B-measured against this
    window — row-identical, but Spark plans struct-buffered max_by as
    SortAggregate (struct agg buffers are not hash-aggregable), so BOTH
    forms sort map-side and the medians tied (0.288 vs 0.280 s).  The
    window form already gets a partial ``WindowGroupLimit`` below the
    exchange (Spark 3.5+ rank-limit pushdown), so the shuffle carries
    ≤1 row per key per map partition — the aggregate shape bought
    nothing and was dropped."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@query("topk_per_group", """
    SELECT p_brand, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) WHERE rn <= 3
""")
def topk_per_group(spark, sf):
    """Auth.partial_lookup limit-k shape: top-k per group
    (dlx/marc/__init__.py:1995-2041)."""
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        _t(spark, sf, "part")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@query("setops_except", """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""")
def setops_except(spark, sf):
    """Diff / $nin set semantics (dlx/marc/__init__.py:2235-2282)."""
    o = _t(spark, sf, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op)  # EXCEPT (distinct) semantics


@query("setops_intersect", """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""")
def setops_intersect(spark, sf):
    o = _t(spark, sf, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@query("union_sets", """
    SELECT o_orderkey, 'big' AS bucket FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def union_sets(spark, sf):
    """History.from_query union-across-collections shape."""
    o = _t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", F.lit("big").alias("bucket"))
    urgent = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey", F.lit("urgent").alias("bucket")))
    return big.unionAll(urgent)


@query("pivot_counts", """
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders GROUP BY o_orderstatus
""")
def pivot_counts(spark, sf):
    """to_table pivot (dlx/marc/__init__.py:393-431) — explicit pivot
    values so no discovery pass is needed."""
    return (
        _t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
               ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
        .count()
        .na.fill(0)
        .withColumnsRenamed({"1-URGENT": "urgent", "2-HIGH": "high",
                             "3-MEDIUM": "medium", "4-NOT SPECIFIED": "not_specified",
                             "5-LOW": "low"})
    )


@query("json_extract", """
    SELECT event_type, round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_k
    FROM events GROUP BY event_type
""")
def json_extract(spark, sf):
    """from_json / dynamic-document field access (reference JMARC docs are
    schemaless JSON; here: JSON props column)."""
    return (
        _t(spark, sf, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 2).alias("avg_k"))
    )


@query("sessionization", """
    SELECT user_id, count(*) AS n_events,
           CAST(1 + sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM (
        SELECT user_id,
               date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
        FROM events)
    GROUP BY user_id
""")
def sessionization(spark, sf):
    """sessionization: gap > 30 min starts a new session — lag window +
    conditional sum (the batch equivalent of session_window streaming)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf, "events")
        .withColumn("gap_s", epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             (1 + F.sum(F.when(F.col("gap_s") > 1800, 1).otherwise(0))).alias("n_sessions"))
    )


@query("asof_join", """
    SELECT c.event_id, c.user_id, v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
""")
def asof_join_q(spark, sf):
    """backward as-of join (custom operator Spark lacks): each click
    matched to the user's latest view at-or-before it.  Union + one
    window pass — O(n log n) per key, single shuffle, no
    point-vs-candidate blowup (same algorithm as the generic
    operators/asof.py::asof_join, which this query's semantics are
    test-pinned against).

    r11: both sides come from the SAME events table, so the query fuses
    them into ONE scan with a derived side flag instead of the generic
    operator's two-scan union (guide §8 — use what the optimizer cannot
    see: Catalyst does not merge union branches over one file).  Plan
    diff: 2×Scan parquet → 1×Scan parquet — at 100 TB that halves the
    I/O of the whole query.  Semantics preserved exactly: views drop
    NULL ts / NULL user_id rows (SQL join semantics — they can never
    match), clicks keep theirs (left join keeps unmatched), and at
    equal ts the view sorts before the click so the match is inclusive
    — each branch identical to the generic operator's union arms."""
    ev = _t(spark, sf, "events")
    is_click = F.col("event_type") == "click"
    u = (ev.filter(is_click | (
            (F.col("event_type") == "view")
            & F.col("ts").isNotNull() & F.col("user_id").isNotNull()))
         .select("user_id", "ts", is_click.cast("int").alias("_side"),
                 "event_id"))
    w = (Window.partitionBy("user_id").orderBy("ts", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (u.withColumn(
                "_m", F.last(F.when(F.col("_side") == 0, F.col("ts")),
                             ignorenulls=True).over(w))
            .filter(F.col("_side") == 1)
            .select("event_id", "user_id", F.col("_m").alias("last_view_ts")))


@query("range_join", """
    WITH r AS (SELECT DISTINCT date_trunc('hour', ts) AS lo,
                      date_trunc('hour', ts) + INTERVAL 1 HOUR AS hi
               FROM events WHERE event_type = 'error')
    SELECT e.event_id, r.lo AS err_hour
    FROM events e JOIN r ON e.ts >= r.lo AND e.ts < r.hi
    WHERE e.event_type = 'purchase'
""")
def range_join_q(spark, sf):
    """point-in-range join via time-grain bucketing (equi-join on the
    bucket + residual interval filter — no nested-loop): purchases that
    happened inside an error hour (operators/asof.py)."""
    ev = _t(spark, sf, "events")
    ranges = (ev.filter(F.col("event_type") == "error")
              .select(F.date_trunc("hour", "ts").alias("lo")).distinct()
              .withColumn("hi", F.col("lo") + cached_expr("INTERVAL 1 HOUR")))
    points = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    out = asof.range_join(points, ranges, point_col="ts", bucket_seconds=3600)
    return out.select("event_id", F.col("lo").alias("err_hour"))


@query("windowed_agg", """
    SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts)
""")
def windowed_agg(spark, sf):
    """tumbling event-time window aggregate (streaming §2.7 batch
    equivalent)."""
    return (
        _t(spark, sf, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# LLM-pipeline operators (BASELINE.json north-star)
# ---------------------------------------------------------------------------

@query("dedup_exact", """
    SELECT md5(substr(text, 1, 30)) AS digest, count(*) AS n_dups,
           min(doc_id) AS keep_id
    FROM documents GROUP BY md5(substr(text, 1, 30)) HAVING count(*) > 1
""")
def dedup_exact(spark, sf):
    """exact dedup: hash-groupBy on a content digest (prefix-30 so the
    synthetic corpus actually contains collisions)."""
    docs = _t(spark, sf, "documents")
    return (
        docs.select("doc_id", F.md5(F.substring("text", 1, 30)).alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


@query("ngram_jaccard", """
    WITH prepared AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
               lang, CAST(floor(log2(len(string_split(text, ' ')) + 1)) AS INTEGER) AS blk_len,
               string_split(text, ' ')[1] AS blk_tok
        FROM documents)
    SELECT l.doc_id AS id_a, r.doc_id AS id_b,
           round(CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
                 / len(list_distinct(list_concat(l.toks, r.toks))), 4) AS jaccard
    FROM prepared l JOIN prepared r
      ON l.lang = r.lang AND l.blk_len = r.blk_len AND l.blk_tok = r.blk_tok
     AND l.doc_id < r.doc_id
    WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
          / len(list_distinct(list_concat(l.toks, r.toks))) >= 0.5
""")
def ngram_jaccard(spark, sf):
    """n-gram (word-set) Jaccard near-dup: blocked self-join + exact
    Jaccard ≥ 0.5.  Blocking keys (lang, log-length band, first token)
    keep the join linear-ish at scale.  The prepared relation feeds
    BOTH sides of the self-join: a lazy cache() halves the scan +
    double-split tokenization work (measured ~1.2× on the full query)
    without firing a job at plan-construction time — the same
    materialization convention as the minhash/simhash pipelines."""
    docs = _t(spark, sf, "documents")
    toks = F.array_distinct(F.split("text", " "))
    # spread the narrow single-split scan BEFORE the tokenize+cache so
    # (a) the one-off cache materialization parallelizes and (b) the
    # cached relation itself is as wide as the cores — the broadcast
    # join's PROBE side then runs one task per partition instead of
    # re-serializing the whole Jaccard verify through a single task
    # (guide §2.5 input-parallelism fix; a no-op on any wide scan)
    prepared = spread_for_compute(docs).select(
        F.col("doc_id"), toks.alias("toks"), F.col("lang"),
        F.floor(F.log2(F.size(F.split("text", " ")) + 1)).cast("int").alias("blk_len"),
        F.element_at(F.split("text", " "), 1).alias("blk_tok"),
    ).cache()
    l, r = prepared.alias("l"), prepared.alias("r")
    jac = (F.size(F.array_intersect(F.col("l.toks"), F.col("r.toks"))).cast("double")
           / F.size(F.array_union(F.col("l.toks"), F.col("r.toks"))))
    return (
        l.join(r, on=[F.col("l.lang") == F.col("r.lang"),
                      F.col("l.blk_len") == F.col("r.blk_len"),
                      F.col("l.blk_tok") == F.col("r.blk_tok"),
                      F.col("l.doc_id") < F.col("r.doc_id")])
        .filter(jac >= 0.5)
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"),
                F.round(jac, 4).alias("jaccard"))
    )


def _minhash_oracle(num_hashes: int = 64, bands: int = 16, seed: int = 42,
                    min_match: int = 32) -> str:
    """DuckDB SQL recomputing the ENTIRE minhash pipeline — shingles,
    md5 shingle hashes, the seeded (a,b) permutation family baked in as
    literals, banded candidate join, and the matching-position count —
    so signature generation and banding are both hash-checked.  The
    Spark side buckets on hash(slice(sig,...)); the oracle joins on the
    slice CONTENT, which is the same grouping (a murmur collision could
    only add a candidate, which the n_match filter then drops)."""
    import numpy as np

    p = dedup._MERSENNE
    rng = np.random.RandomState(seed)
    a = rng.randint(1, p, size=num_hashes).tolist()
    b = rng.randint(0, p, size=num_hashes).tolist()
    rows = num_hashes // bands
    sig_items = ", ".join(
        f"list_min(list_transform(xs, x -> ({ai} * (x % {p}) + {bi}) % {p}))"
        for ai, bi in zip(a, b))
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(regexp_replace(
                   lower(text), '{_PUNCT_DUCK}', ' ', 'g')), ' ') AS t
        FROM documents),
    sh AS (
        SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(t) - 2, 1)),
            i -> array_to_string(t[i:i+2], ' '))) AS shs
        FROM toks),
    xs AS (
        SELECT doc_id, list_transform(shs,
            s -> CAST('0x' || substr(md5(s), 1, 8) AS UBIGINT)::BIGINT) AS xs
        FROM sh),
    sig AS (SELECT doc_id, [{sig_items}] AS sig FROM xs),
    banded AS (
        SELECT doc_id, b, array_to_string(sig[b*{rows}+1:b*{rows}+{rows}], ',') AS key
        FROM sig, generate_series(0, {bands - 1}) g(b)),
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM banded l JOIN banded r
          ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id),
    m AS (
        SELECT id_a, id_b,
               len(list_filter(generate_series(1, {num_hashes}),
                               i -> sa.sig[i] = sb.sig[i])) AS n_match
        FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
                  JOIN sig sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b, CAST(n_match AS BIGINT) AS n_match
    FROM m WHERE n_match >= {min_match}
    """


@query("minhash_lsh", _minhash_oracle())
def minhash_lsh(spark, sf):
    """MinHash+LSH near-dup pairs (shingle → signature → banded buckets),
    fully oracle-checked: the seeded permutation family is baked into the
    oracle SQL as literals and the similarity is emitted as the integer
    matching-position count (64ths), so there is zero float-rounding
    exposure.  est_jaccard = n_match / 64.

    One-shuffle formulation (round 8): ``dedup.lsh_verified_pairs``
    carries signatures through the band explode, verifies inline, and
    dedups cross-band duplicates by first-colliding-band — replacing
    the candidates' ``distinct`` exchange plus two signature join-backs.
    Reproduced wall-clock gain on an idle box is modest (~1.05-1.2×);
    the win is STRUCTURAL and defended at the plan level
    (tests/test_plans.py pins the slim regime at ≤1 exchange — the
    distinct exchange is gone), because at cluster scale the join-backs
    would be two more shuffles."""
    docs = _t(spark, sf, "documents")
    # cache: the slim formulation references the signature relation three
    # times (band self-join + two verify joins) — same cache the previous
    # distinct-based pipeline carried
    sigs = dedup.minhash_signatures(docs).cache()
    return dedup.lsh_verified_pairs(sigs, bands=16, min_match=32)


def _simhash_oracle() -> str:
    """DuckDB SQL computing the EXACT same 64-bit simhash as
    operators.dedup.simhash64_udf (token hash = first 64 bits of md5 —
    chosen precisely so both engines agree bit-for-bit), then all pairs
    with hamming <= 3.  The Spark side's 4x16-bit banding provably never
    drops a hamming<=3 pair (pigeonhole), so the outputs are identical:
    fingerprinting, banding, and the hamming filter are all hash-checked.
    """
    pw = ", ".join(f"({i}, {1 << i}::UBIGINT)" for i in range(64))
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                          t -> t != '')) AS tok
        FROM documents),
    th AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT) AS h
        FROM toks),
    pw(i, p) AS (VALUES {pw}),
    bits AS (
        SELECT doc_id, i,
               SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM th, generate_series(0, 63) g(i)
        GROUP BY doc_id, i),
    fp AS (
        SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN p ELSE 0::UBIGINT END)
                            AS UBIGINT) AS fp
        FROM bits JOIN pw USING (i) GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """


@query("simhash", _simhash_oracle())
def simhash(spark, sf):
    """SimHash near-dup pairs (64-bit md5-token fingerprint, banded
    hamming join).  Fully oracle-checked: the oracle recomputes the
    fingerprints from scratch in SQL, so a regression anywhere in the
    UDF, the banding, or the hamming filter fails the hash.

    Runs the DEFAULT ``bucket_cap`` (round-5 verdict item: no more
    ``bucket_cap=None`` pin): at oracle/bench scale the small-input
    auto-bypass (``common.bypass_cap``) plans the uncapped formulation
    — bit-exact oracle parity AND no capped-stage overhead.  The
    bypass horizon is WIDENED here (not the operator default): an
    oracle row must stay pair-level-exact at ANY scale the SQL oracle
    itself can run, while the capped chain's different-but-equivalent
    representative pairs aren't SQL-expressible — its equivalence is
    property-locked in tests/test_property.py instead.  Production
    callers use the operator defaults, where the cap engages past
    ~2 MB."""
    from dlx_spark.operators import common

    docs = _t(spark, sf, "documents")
    # the row's pair-level SQL parity is only valid on the UNCAPPED
    # plan: if Catalyst's size estimate ever crosses the widened
    # horizon (bigger SF, stats-estimation change), the silent switch
    # to capped chain output would surface as a baffling hash mismatch
    # — fail fast with the real cause instead
    if common.bypass_cap(docs, 1000, 256 << 20) is not None:
        raise RuntimeError(
            f"simhash oracle row: input estimate "
            f"{common.estimated_bytes(docs)}B exceeds the 256MB bypass "
            f"horizon, so the bucket cap would engage and the capped "
            f"chain output cannot match the pair-exact SQL oracle — "
            f"widen auto_bypass_bytes here or shrink the SF")
    return dedup.simhash_near_duplicates(docs, max_hamming=3,
                                         auto_bypass_bytes=256 << 20) \
        .withColumn("hamming", F.col("hamming").cast("long"))


@query("cosine_topk", """
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cosine
    FROM embeddings
    ORDER BY list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC, vec_id
    LIMIT 10
""")
def cosine_topk(spark, sf):
    """brute-force cosine top-k: exact ANN baseline, JVM-side dot
    products, TakeOrdered top-k (no global sort).  The query vector is
    attached in-plan (broadcast cross join of the one matching row)
    instead of collected to the driver first — one Spark query instead
    of a fetch job plus the top-k job; the cosine arithmetic is
    unchanged."""
    emb = _t(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qv"))
    out = similarity.cosine_topk_from_row(emb, qrow, k=10)
    return out.select(F.col("id").alias("vec_id"), F.round("cosine", 4).alias("cosine"))


@query("embedding_neardup", """
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) AS cosine
    FROM embeddings l JOIN embeddings r
      ON l.label = r.label AND l.vec_id < r.vec_id
    WHERE list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) >= 0.35
""")
def embedding_neardup(spark, sf):
    """embedding-cosine near-dup pairs, blocked on the label column
    (both sides block identically, so the oracle matches; at 100 TB the
    blocking key becomes an LSH bucket — see operators.similarity).
    The 0.35 threshold is tuned to the synthetic corpus, whose random
    embeddings top out near cosine 0.5 — a production near-dup cut of
    0.95 selects nothing here and would leave this check vacuous."""
    emb = _t(spark, sf, "embeddings")
    l = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                   F.col("label").alias("lbl"))
    r = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                   F.col("label").alias("lbl"))
    dot = "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    nrm = lambda c: f"sqrt(aggregate({c}, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    cos = cached_expr(f"{dot} / (greatest({nrm('va')}, 1e-12) * greatest({nrm('vb')}, 1e-12))")
    return (
        l.join(r, on=[l["lbl"] == r["lbl"], F.col("id_a") < F.col("id_b")])
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


@query("token_count", """
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars
    FROM documents
""")
def token_count(spark, sf):
    """token counting (whitespace); the BPE-ish variant is
    textstats.bpe_ish_tokens (pytest-covered)."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@query("lang_scores", f"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> list_contains({list(_EN)}, t))) AS en_hits,
           len(list_filter(string_split(text, ' '), t -> list_contains({list(_FR)}, t))) AS fr_hits
    FROM documents
""")
def lang_scores(spark, sf):
    """language-ID marker-word scores (the argmax variant is
    textstats.language_id, pytest-covered)."""
    docs = _t(spark, sf, "documents")
    toks = F.split("text", " ")
    en = F.array(*[F.lit(m) for m in _EN])
    fr = F.array(*[F.lit(m) for m in _FR])
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.array_contains(en, t))).cast("long").alias("en_hits"),
        F.size(F.filter(toks, lambda t: F.array_contains(fr, t))).cast("long").alias("fr_hits"),
    )


@query("deterministic_sample", """
    SELECT doc_id, lang FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
""")
def deterministic_sample_q(spark, sf):
    """hash-keyed reproducible 10% sample: membership is a pure function
    of the key (stable across partitioning/engines — the oracle runs the
    identical predicate), unlike seed-based df.sample()."""
    docs = _t(spark, sf, "documents")
    return sampling.deterministic_sample(docs, 0.1).select("doc_id", "lang")


@query("stratified_sample", """
    SELECT doc_id, lang FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN '1999' WHEN 'de' THEN '8000' END
""")
def stratified_sample_q(spark, sf):
    """per-stratum deterministic sampling: keep 10% of English, 50% of
    German, drop other strata (the language-rebalancing primitive)."""
    docs = _t(spark, sf, "documents")
    return (sampling.stratified_sample(docs, {"en": 0.1, "de": 0.5})
            .select("doc_id", "lang"))


@query("repetition_ratio", """
    SELECT doc_id,
           round(1 - len(list_distinct(string_split(text, ' '))) /
                 CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE), 4)
             AS rep_ratio
    FROM documents
""")
def repetition_ratio_q(spark, sf):
    """within-document token repetition (boilerplate/spam signal).
    normalize=False = plain space split, the exact string_split the
    oracle runs (normalized tokenization is pytest-covered)."""
    docs = _t(spark, sf, "documents")
    return (textstats.repetition_ratio(docs, normalize=False)
            .select(F.col("id").alias("doc_id"), "rep_ratio"))


@query("idf_table", """
    SELECT token, CAST(count(*) AS BIGINT) AS df,
           round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / count(*)), 4) AS idf
    FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS token
          FROM documents)
    GROUP BY token
""")
def idf_table_q(spark, sf):
    """corpus document-frequency / IDF table: one explode of per-doc
    distinct tokens, partial-agg groupBy (shuffle carries (token,
    partial-count) only).  normalize=False mirrors the oracle's raw
    string_split."""
    docs = _t(spark, sf, "documents")
    return textstats.idf_table(docs, normalize=False)


@query("tfidf_topk", """
    WITH tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY doc_id, token
    ), idf AS (
        SELECT token,
               ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / count(*)) AS idf_raw
        FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS token
              FROM documents)
        GROUP BY token
    )
    SELECT doc_id, token, round(tf * idf_raw, 4) AS tfidf, CAST(rk AS BIGINT) AS rk
    FROM (SELECT tf.doc_id, tf.token, tf.tf, idf.idf_raw,
                 row_number() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf * idf.idf_raw DESC, tf.token) AS rk
          FROM tf JOIN idf USING (token))
    WHERE rk <= 3
""")
def tfidf_topk_q(spark, sf):
    """per-document top-3 tf·idf terms: two partial-agg shuffles +
    broadcast idf join + per-doc window (keyword extraction)."""
    docs = _t(spark, sf, "documents")
    return (textstats.tfidf_topk(docs, k=3, normalize=False)
            .select(F.col("id").alias("doc_id"), "token", "tfidf",
                    F.col("rk").cast("long").alias("rk")))


@query("quality_score", f"""
    SELECT doc_id, n_tokens,
           round(alpha / greatest(n_chars, 1), 4) AS alpha_ratio,
           round(stop_hits / CAST(greatest(n_tokens, 1) AS DOUBLE), 4) AS stop_ratio,
           round(tok_chars / CAST(greatest(n_tokens, 1) AS DOUBLE), 4) AS mean_word_len
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
               len(list_filter(string_split(text, ' '), t -> list_contains({list(_EN)}, t))) AS stop_hits,
               list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS tok_chars
        FROM documents)
""")
def quality_score(spark, sf):
    """document quality features: length, alpha ratio, stopword ratio,
    mean word length — all exact column arithmetic.  The scan is spread
    first: the regex/array arithmetic is the cost here, and a
    single-split file would otherwise run it all in one task."""
    docs = spread_for_compute(_t(spark, sf, "documents"))
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double")
    en = F.array(*[F.lit(m) for m in _EN])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(alpha / F.greatest(n_chars, F.lit(1)), 4).alias("alpha_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)).cast("double"), 4).alias("stop_ratio"),
        F.round(tok_chars / F.greatest(n_tokens, F.lit(1)).cast("double"), 4).alias("mean_word_len"),
    )


def _plane_lit_sql(plane) -> str:
    """A hyperplane as a DuckDB DOUBLE[] literal (full-precision reprs —
    both engines parse the same decimal to the same IEEE double)."""
    return "[" + ",".join(repr(float(x)) for x in plane) + "]"


def _sig_sql(n_planes: int, dim: int = 64, seed: int = 42,
             offset: int = 0, total: int | None = None) -> str:
    """DuckDB expression computing the SAME sign-bit hyperplane signature
    as operators.similarity._signature_expr: the planes are deterministic
    (seeded numpy), so they can be baked into the oracle as literals —
    making the LSH bucketing itself oracle-checkable.  ``offset``/
    ``total`` select a band's slice of a larger seeded family (the
    banded_lsh_keys layout: band i of r planes uses planes [i*r, (i+1)*r)
    of hyperplanes(dim, bands*r, seed), with band-local bit weights)."""
    planes = similarity.hyperplanes(dim, total or n_planes, seed)
    planes = planes[offset:offset + n_planes]
    bits = [
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_lit_sql(p)}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return " + ".join(bits)


@query("lsh_topk", f"""
    WITH sig AS (SELECT vec_id, embedding, ({_sig_sql(8)}) AS bucket FROM embeddings),
         q AS (SELECT embedding AS qv, bucket AS qb FROM sig WHERE vec_id = 0)
    SELECT s.vec_id,
           round(list_cosine_similarity(s.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cosine
    FROM sig s, q
    WHERE bit_count(xor(s.bucket, q.qb)) <= 1
    ORDER BY list_cosine_similarity(s.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, s.vec_id
    LIMIT 10
""")
def lsh_topk(spark, sf):
    """hyperplane-LSH approximate nearest neighbors: scans only buckets
    within hamming-1 of the query bucket (the 100 TB ANN path).  The
    seeded hyperplanes are baked into the oracle SQL as literals, so the
    bucketing AND the pruned top-k are both hash-checked — a signature
    or multiprobe regression now fails the oracle, not just a pytest."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    out = similarity.lsh_topk(emb, qvec, k=10, n_planes=8, multiprobe_hamming=1)
    return out.select(F.col("id").alias("vec_id"), F.round("cosine", 4).alias("cosine"))


@query("embedding_lsh_pairs", f"""
    WITH k AS (
      SELECT vec_id, embedding, 0 AS band,
             ({_sig_sql(6, offset=0, total=12)}) AS bucket FROM embeddings
      UNION ALL
      SELECT vec_id, embedding, 1 AS band,
             ({_sig_sql(6, offset=6, total=12)}) AS bucket FROM embeddings
    )
    SELECT id_a, id_b, round(max(cos), 4) AS cosine FROM (
      SELECT l.vec_id AS id_a, r.vec_id AS id_b,
             list_cosine_similarity(l.embedding::DOUBLE[],
                                    r.embedding::DOUBLE[]) AS cos
      FROM k l JOIN k r
        ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
    WHERE cos >= 0.35
    GROUP BY id_a, id_b
""")
def embedding_lsh_pairs(spark, sf):
    """LSH-blocked embedding near-dup pairs (similarity.
    cosine_near_duplicates, 2 bands × 6 planes): candidates from the
    banded hyperplane bucket join, every emitted pair verified by the
    exact cosine.  The seeded band signatures are baked into the oracle
    as plane literals, so the banding AND the blocked pair generation
    are hash-checked — the label-blocked ``embedding_neardup`` checks
    the verify kernel, this checks the real (LSH) blocking used at
    scale.  Uncapped (``bucket_cap=None``) for exactness w.r.t. the
    banding; the capped mode's chain equivalence is pytest-locked
    (tests/test_ann_quality.py).  The 0.35 threshold is tuned to the
    synthetic corpus like ``embedding_neardup``'s."""
    emb = _t(spark, sf, "embeddings")
    out = similarity.cosine_near_duplicates(emb, threshold=0.35, n_planes=6,
                                            bands=2, dim=64, bucket_cap=None)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


@query("ivf_topk")  # approximate ANN (k-means inverted lists) → rows-only
def ivf_topk(spark, sf):
    """IVF approximate nearest neighbors: seeded k-means coarse quantizer
    (trained on a bounded sample), Arrow-batched list assignment, probe
    limited to the nprobe nearest inverted lists.  At 100 TB the
    assignment table is written partitioned by list_id so this becomes a
    partition-pruned scan + exact rerank (exactness at nprobe=n is
    pytest-covered)."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    out = similarity.ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=2)
    return out.select(F.col("id").alias("vec_id"), F.round("cosine", 4).alias("cosine"))


@query("knn_join", f"""
    WITH sig AS (SELECT vec_id, embedding, ({_sig_sql(4)}) AS bucket FROM embeddings)
    SELECT probe_id, corpus_id, round(cos, 4) AS cosine, rank FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id,
               list_cosine_similarity(p.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_cosine_similarity(p.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                            c.vec_id) AS rank
        FROM sig p JOIN sig c ON p.bucket = c.bucket AND p.vec_id != c.vec_id
        WHERE p.vec_id < 20)
    WHERE rank <= 3
""")
def knn_join(spark, sf):
    """k-nearest-neighbors for every probe row via bucketed equi-join +
    per-probe top-k window.  The seeded hyperplane buckets are baked into
    the oracle as literals, so the candidate join is hash-checked too."""
    emb = _t(spark, sf, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    out = similarity.knn_join(probes, emb, k=3, n_planes=4, dim=64)
    return out.select("probe_id", "corpus_id", F.round("cosine", 4).alias("cosine"),
                      F.col("rank").cast("long").alias("rank"))


@query("fingerprint_minhash_sketch", f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(trim(regexp_replace(
                   lower(text), '{_PUNCT_DUCK}', ' ', 'g')), ' '),
                   x -> x != '') AS toks
        FROM documents),
    h AS (SELECT doc_id, list_transform(toks,
              tk -> CAST('0x' || substr(md5(tk), 1, 8) AS UBIGINT)::BIGINT) AS hs
          FROM t),
    fp AS (SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - 7, 1)),
               i -> list_min(hs[i:i+7]))) AS fps
           FROM h)
    SELECT doc_id AS id, CAST(len(fps) AS BIGINT) AS n_grams,
           list_min(fps) AS min_fp, list_max(fps) AS max_fp
    FROM fp
""")
def fingerprint_minhash_sketch(spark, sf):
    """document fingerprinting: winnowing sketch per doc.  The md5-based
    token hash makes the sketch engine-portable, so the oracle recomputes
    the winnowing (token hashes, sliding-window minima, dedup) from
    scratch in SQL and checks size + min/max of every doc's sketch."""
    docs = _t(spark, sf, "documents")
    fp = textstats.fingerprint(docs)
    return fp.select("id", F.size("fingerprint").cast("long").alias("n_grams"),
                     F.array_min("fingerprint").alias("min_fp"),
                     F.array_max("fingerprint").alias("max_fp"))


@query("multimodal_decode", """
    SELECT doc_id, 'image' AS kind,
           CAST(64 + octet_length(encode(text)) % 1984 AS INTEGER) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 1984 AS INTEGER) AS height,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
    FROM documents
""")
def multimodal_decode(spark, sf):
    """multimodal plumbing: binary payload → metadata via mapInPandas
    (decode kernel stubbed deterministically — see operators.multimodal)."""
    docs = _t(spark, sf, "documents")
    media = multimodal.synthetic_media(spark, docs)
    return multimodal.decode_metadata(media)


@query("median_metrics", """
    SELECT l_returnflag,
           floor(median(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) + 0.5) / 100
             AS median_price,
           floor(avg(l_quantity) * 100 + 0.5) / 100 AS avg_qty
    FROM lineitem GROUP BY l_returnflag
""")
def median_metrics(spark, sf):
    """exact interpolated median per group (both engines interpolate).

    The median is taken over integer CENTS so interpolation lands on an
    exact .0/.5 double, and 2-dp rounding is floor(x + 0.5) — engines
    disagree on round() for doubles exactly at the .005 boundary (Spark
    rounds the shortest decimal repr via BigDecimal, DuckDB rounds the
    scaled double), but floor on identical doubles is deterministic."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg((F.floor(F.median(cents) + F.lit(0.5)) / 100).alias("median_price"),
             (F.floor(F.avg("l_quantity") * 100 + F.lit(0.5)) / 100).alias("avg_qty"))
    )


@query("sql_passthrough", """
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS revenue
    FROM orders WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority
""")
def sql_passthrough(spark, sf):
    """from_aggregation analog (reference dlx/marc/__init__.py:130-139):
    the raw-SQL escape hatch — user-supplied SQL over registered views."""
    _t(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        FROM orders WHERE o_orderstatus <> 'P'
        GROUP BY o_orderpriority
    """)


@query("correlation", """
    SELECT round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(corr(l_discount, l_extendedprice), 4) AS disc_price_corr
    FROM lineitem
""")
def correlation(spark, sf):
    """numeric statistics surface: Pearson correlation."""
    return _t(spark, sf, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.corr("l_discount", "l_extendedprice"), 4).alias("disc_price_corr"),
    )


@query("chunk_documents", """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE len(list_filter(string_split(text, ' '), x -> x != '')) > 0),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks) - 8 - 1, 0) + 1, 56)) AS start
          FROM t)
    SELECT doc_id, CAST(start // 56 AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text,
           CAST(len(list_slice(toks, start + 1, start + 64)) AS BIGINT) AS n_tokens
    FROM s
""")
def chunk_documents_q(spark, sf):
    """overlapping token-window chunking (64-token windows, 8 overlap) —
    the pre-training/RAG corpus prep step; a pure flat-map, no shuffle.
    normalize=False = plain space split, exactly the oracle's."""
    docs = _t(spark, sf, "documents")
    return (chunking.chunk_documents(docs, chunk_tokens=64, overlap=8,
                                     normalize=False)
            .select(F.col("id").alias("doc_id"),
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    "chunk_text",
                    F.col("n_tokens").cast("long").alias("n_tokens")))


@query("unicode_nfc", """
    SELECT doc_id,
           nfc_normalize(text || ' cafe' || chr(769) || ' A' || chr(778)) AS norm_text,
           CAST(len(nfc_normalize(text || ' cafe' || chr(769) || ' A' || chr(778))) AS BIGINT)
             AS n_chars_nfc
    FROM documents
""")
def unicode_nfc(spark, sf):
    """Unicode NFC normalization (pandas-UDF unicodedata vs utf8proc):
    a decomposed suffix ('e'+combining acute, 'A'+combining ring) is
    appended in both engines so composition actually fires — the
    normalized text AND its shrunken char count must agree."""
    suffix = " cafe\u0301 A\u030a"   # decomposed, as the oracle builds it
    docs = _t(spark, sf, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(suffix)))
    out = textstats.normalize_unicode(docs)
    return out.select(F.col("id").alias("doc_id"), "norm_text",
                      F.length("norm_text").cast("long").alias("n_chars_nfc"))


@query("funnel", """
    WITH s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
           JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
           WHERE e.event_type = 'click' GROUP BY 1),
    s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
           JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t
           WHERE e.event_type = 'purchase' GROUP BY 1)
    SELECT 1 AS step, 'view' AS step_name,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
""")
def funnel_q(spark, sf):
    """ordered-funnel conversion (view → click → purchase): each step
    counts a user only when its first qualifying event falls strictly
    after the user's previous step — the event-analytics staple."""
    ev = _t(spark, sf, "events")
    return asof.funnel_counts(ev, ["view", "click", "purchase"])


@query("corpus_top_ngrams", """
    SELECT sh AS ngram, CAST(n_docs AS BIGINT) AS n_docs, CAST(rk AS BIGINT) AS rk
    FROM (SELECT sh, n_docs,
                 row_number() OVER (ORDER BY n_docs DESC, sh) AS rk
          FROM (SELECT sh, count(*) AS n_docs
                FROM (SELECT doc_id,
                             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                     FOR i IN range(1, greatest(len(t) - 3, 0) + 2)])) AS sh
                      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
                GROUP BY sh HAVING count(*) >= 2))
    WHERE rk <= 20
""")
def corpus_top_ngrams_q(spark, sf):
    """boilerplate mining: the 20 most document-frequent word 3-grams
    (verbatim n-grams shared across many docs are templates/chrome to
    strip before training)."""
    docs = _t(spark, sf, "documents")
    return (textstats.corpus_top_ngrams(docs, n=3, k=20, normalize=False)
            .select("ngram", F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("rk").cast("long").alias("rk")))


@query("char_entropy", """
    SELECT doc_id, round(entropy(ch), 3) AS char_entropy
    FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
    GROUP BY doc_id
""")
def char_entropy_q(spark, sf):
    """per-document character Shannon entropy (gibberish/noise signal):
    DuckDB's entropy() aggregate and the explicit -sum(p*log2(p)) must
    agree to 3 dp (coarse on purpose — the engines compute the same
    quantity through different float expressions)."""
    docs = _t(spark, sf, "documents")
    return (textstats.char_entropy(docs)
            .select(F.col("id").alias("doc_id"), "char_entropy"))


@query("pack_sequences")  # sequential bin packing → rows-only check
def pack_sequences_q(spark, sf):
    """token-budget sample packing over the chunked corpus: FFD bin
    packing inside hash shards (value-sharded applyInPandas groups, so
    the assignment is deterministic on any cluster layout).  Bin packing
    is not SQL-expressible → rows-only; its invariants are the
    oracle-checked `pack_validity` query."""
    chunks = chunking.chunk_documents(_t(spark, sf, "documents"),
                                      chunk_tokens=64, overlap=8,
                                      normalize=False)
    return (chunking.pack_sequences(chunks, budget=256, n_shards=16)
            .select("id", "chunk_id", "shard", "pack_id"))


@query("pack_validity", """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE len(list_filter(string_split(text, ' '), x -> x != '')) > 0),
    s AS (SELECT doc_id, unnest(range(0, greatest(len(toks) - 8 - 1, 0) + 1, 56)) AS start,
                 toks FROM t)
    SELECT CAST(0 AS BIGINT) AS n_overfull,
           CAST((SELECT count(*) FROM s) AS BIGINT) AS n_chunks
""")
def pack_validity_q(spark, sf):
    """The bin-packing invariants as an oracle-checkable query: every
    pack's token total fits the budget (n_overfull = 0) and every chunk
    is assigned to exactly one pack (n_chunks equals the chunk count the
    chunk_documents oracle independently derives).  The FFD assignment
    itself stays rows-only (`pack_sequences`); a packing regression —
    overfull packs, dropped or duplicated chunks — fails this hash."""
    chunks = chunking.chunk_documents(_t(spark, sf, "documents"),
                                      chunk_tokens=64, overlap=8,
                                      normalize=False)
    packed = chunking.pack_sequences(chunks, budget=256, n_shards=16)
    per_pack = (packed.groupBy("shard", "pack_id")
                .agg(F.sum("n_tokens").alias("tot"),
                     F.count(F.lit(1)).alias("n")))
    return per_pack.agg(
        F.sum(F.when(F.col("tot") > 256, 1).otherwise(0)).cast("long").alias("n_overfull"),
        F.sum("n").cast("long").alias("n_chunks"))


@query("mix_corpora", """
    SELECT doc_id, lang FROM documents
    WHERE lang = 'en'
      AND substring(md5(CAST(doc_id AS VARCHAR) || 'mix:0'), 1, 4) < '4000'
    UNION ALL
    SELECT doc_id, lang FROM documents WHERE lang <> 'en'
""")
def mix_corpora_q(spark, sf):
    """weighted corpus mixing: downsample the dominant English slice to
    25% and keep all other languages — the per-source-weight training
    mix, reproducible from (weights, salt) on any cluster layout.
    Each source salts with its index (independent draws); a keep-all
    source passes through unfiltered (NULL keys included)."""
    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    return sampling.mix_corpora([(en, 0.25), (rest, 1.0)])


@query("quantile_band", """
    SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
        FROM documents)
    WHERE pr >= 0.1 AND pr <= 0.9
""")
def quantile_band_q(spark, sf):
    """per-language quality-band filter: drop the shortest and longest
    10% tails by percent_rank — rank arithmetic is engine-exact where
    interpolated quantiles are not."""
    docs = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return sampling.quantile_band(docs, "n_chars", lo=0.1, hi=0.9, by="lang")


@query("contamination_pairs", """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                        FOR i IN range(1, greatest(len(t) - 3, 0) + 2)])) AS s
           FROM tok)
    SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM sh c JOIN sh b ON c.s = b.s
    WHERE c.doc_id % 97 != 0 AND b.doc_id % 97 = 0
    GROUP BY c.doc_id, b.doc_id
    HAVING count(*) >= 2
""")
def contamination_pairs(spark, sf):
    """benchmark decontamination: corpus docs sharing ≥2 distinct word
    3-grams with a held-out 'benchmark' slice (doc_id % 97 == 0).
    Shingle both sides, equi-join on the shingle string (tiny benchmark
    side broadcasts at scale), partial-agg count per pair."""
    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return (dedup.cross_corpus_overlap(corpus, bench, n=3, min_shared=2,
                                       normalize=False)
            .select("corpus_id", "bench_id",
                    F.col("n_shared").cast("long").alias("n_shared")))


# shared oracle CTE for the sub-document dedup family: one definition of
# "a document's token list", zero parity drift between the three queries
_SPANS_BASE_CTE = """
    base AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents WHERE length(trim(text)) > 0)"""


@query("segment_dedup_stats", f"""
    WITH {_SPANS_BASE_CTE},
    segs AS (
        SELECT doc_id, CAST(t.g AS BIGINT) AS seg_idx,
               array_to_string(w[CAST(t.g*10+1 AS BIGINT):CAST(t.g*10+10 AS BIGINT)], ' ') AS seg_text
        FROM base, unnest(generate_series(0, CAST(ceil(len(w)/10.0) AS BIGINT) - 1)) AS t(g)),
    ranked AS (
        SELECT doc_id, seg_idx, seg_text,
               row_number() OVER (PARTITION BY seg_text
                                  ORDER BY doc_id, seg_idx) AS rn
        FROM segs),
    kept AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               array_to_string(list(seg_text ORDER BY seg_idx), ' ') AS cleaned_text
        FROM ranked WHERE rn = 1 GROUP BY doc_id),
    totals AS (SELECT doc_id, CAST(ceil(len(w)/10.0) AS BIGINT) AS n_segments
               FROM base)
    SELECT t.doc_id, t.n_segments,
           coalesce(k.n_kept, 0) AS n_kept,
           md5(coalesce(k.cleaned_text, '')) AS cleaned_digest,
           CAST(CASE WHEN coalesce(k.cleaned_text, '') = '' THEN 0
                ELSE len(string_split(k.cleaned_text, ' ')) END AS BIGINT) AS n_words_kept
    FROM totals t LEFT JOIN kept k USING (doc_id)
""")
def segment_dedup_stats(spark, sf):
    """C4-style corpus-wide repeated-segment removal (spans.segment_dedup,
    arXiv:1910.10683 §2.2): 10-word disjoint segments, first occurrence
    in (doc, position) order survives, documents rebuilt from survivors.
    The md5 of the rebuilt text pins the full reconstruction through the
    driver's value hash."""
    docs = _t(spark, sf, "documents")
    out = spans.segment_dedup(docs, unit_words=10, normalize=False)
    return out.select("doc_id", "n_segments", "n_kept",
                      F.md5("cleaned_text").alias("cleaned_digest"),
                      "n_words_kept")


@query("dup_span_profile", f"""
    WITH {_SPANS_BASE_CTE},
    wins AS (
        SELECT doc_id, CAST(t.g AS BIGINT) AS pos,
               array_to_string(w[CAST(t.g+1 AS BIGINT):CAST(t.g+15 AS BIGINT)], ' ') AS wt
        FROM base, unnest(generate_series(0, len(w) - 15)) AS t(g)
        WHERE len(w) >= 15),
    dup AS (SELECT wt FROM wins GROUP BY wt
            HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos FROM wins
             WHERE wt IN (SELECT wt FROM dup)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                      OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 15
                    THEN 1 ELSE 0 END AS f
        FROM hits),
    sp AS (SELECT doc_id, pos,
                  sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
           FROM flagged),
    agg AS (SELECT doc_id, sid, max(pos) + 15 - min(pos) AS span_len
            FROM sp GROUP BY doc_id, sid),
    perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
                      CAST(sum(span_len) AS BIGINT) AS dup_words
               FROM agg GROUP BY doc_id),
    totals AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words FROM base)
    SELECT t.doc_id, t.n_words,
           coalesce(p.n_dup_spans, 0) AS n_dup_spans,
           coalesce(p.dup_words, 0) AS dup_words,
           round(coalesce(p.dup_words, 0) * 1.0 / t.n_words, 4) AS dup_fraction
    FROM totals t LEFT JOIN perdoc p USING (doc_id)
""")
def dup_span_profile(spark, sf):
    """Duplicated-substring profile (spans.duplicate_spans,
    arXiv:2107.06499): stride-1 15-word windows occurring in ≥2 distinct
    docs mark their positions; overlapping marks merge into maximal
    spans; per-doc duplicated-word fraction is the filtering signal."""
    docs = _t(spark, sf, "documents")
    return spans.duplicate_spans(docs, k=15, min_docs=2, normalize=False)


@query("span_cut_profile", f"""
    WITH {_SPANS_BASE_CTE},
    wins AS (
        SELECT doc_id, CAST(t.g AS BIGINT) AS pos,
               array_to_string(w[CAST(t.g+1 AS BIGINT):CAST(t.g+15 AS BIGINT)], ' ') AS wt
        FROM base, unnest(generate_series(0, len(w) - 15)) AS t(g)
        WHERE len(w) >= 15),
    dup AS (SELECT wt FROM wins GROUP BY wt
            HAVING count(DISTINCT doc_id) >= 2),
    marked AS (
        SELECT w.doc_id, w.pos FROM wins w
        WHERE w.wt IN (SELECT wt FROM dup)
        QUALIFY row_number() OVER (PARTITION BY w.wt
                                   ORDER BY w.doc_id, w.pos) > 1),
    cutpos AS (SELECT DISTINCT doc_id, CAST(t.g AS BIGINT) AS cut
               FROM marked, unnest(generate_series(pos, pos + 14)) AS t(g)),
    cuts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words_cut
             FROM cutpos GROUP BY doc_id),
    keptpos AS (
        SELECT b.doc_id, CAST(t.g AS BIGINT) AS i,
               b.w[CAST(t.g+1 AS BIGINT)] AS tok
        FROM base b, unnest(generate_series(0, len(b.w) - 1)) AS t(g)
        WHERE NOT EXISTS (SELECT 1 FROM cutpos cp
                          WHERE cp.doc_id = b.doc_id AND cp.cut = t.g)),
    cleaned AS (SELECT doc_id,
                       array_to_string(list(tok ORDER BY i), ' ') AS cleaned_text
                FROM keptpos GROUP BY doc_id)
    SELECT b.doc_id, CAST(len(b.w) AS BIGINT) AS n_words,
           coalesce(c.n_words_cut, 0) AS n_words_cut,
           md5(coalesce(cl.cleaned_text, '')) AS cleaned_digest
    FROM base b LEFT JOIN cuts c USING (doc_id)
    LEFT JOIN cleaned cl USING (doc_id)
""")
def span_cut_profile(spark, sf):
    """Destructive span dedup (spans.cut_duplicate_spans, keep_first):
    the first occurrence of each duplicated 15-word window keeps its
    text, later occurrences are cut; documents reassemble from the
    surviving positions (digest-pinned)."""
    docs = _t(spark, sf, "documents")
    out = spans.cut_duplicate_spans(docs, k=15, min_docs=2,
                                    keep_first=True, normalize=False)
    return out.select("doc_id", "n_words", "n_words_cut",
                      F.md5("cleaned_text").alias("cleaned_digest"))


# shared oracle CTE fragments: the ngram blocking/threshold logic and
# the component walk appear in several queries — one definition, zero
# parity drift between them
_NGRAM_PAIR_CTES = """
    prepared AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
               lang, CAST(floor(log2(len(string_split(text, ' ')) + 1)) AS INTEGER) AS blk_len,
               string_split(text, ' ')[1] AS blk_tok
        FROM documents),
    pairs AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b
        FROM prepared l JOIN prepared r
          ON l.lang = r.lang AND l.blk_len = r.blk_len AND l.blk_tok = r.blk_tok
         AND l.doc_id < r.doc_id
        WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(l.toks, r.toks))) >= 0.5)"""

_WALK_CTES = """
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    walk(id, comp) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, w.comp FROM edges e JOIN walk w ON w.id = e.b)"""


@query("dup_clusters", f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES}, {_WALK_CTES}
    SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(comp) AS BIGINT) AS component
    FROM walk GROUP BY id
""")
def dup_clusters(spark, sf):
    """duplicate CLUSTERS: transitive closure over the ngram-Jaccard
    pairs via iterative min-label propagation (the oracle walks the
    same graph with a recursive CTE).  Pairwise near-dup output alone
    can't pick survivors when A~B~C but A!~C."""
    pairs = ngram_jaccard(spark, sf).select("id_a", "id_b")
    comp = dedup.connected_components(pairs)
    return comp.select(F.col("id").cast("long").alias("doc_id"),
                       F.col("component").cast("long").alias("component"))


@query("dedup_survivors", f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES}, {_WALK_CTES},
    losers AS (SELECT id FROM (SELECT id, min(comp) AS component FROM walk GROUP BY id)
               WHERE id != component)
    SELECT d.doc_id, d.lang FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = d.doc_id)
""")
def dedup_survivors(spark, sf):
    """end-to-end near-dedup: the corpus minus every non-minimum member
    of each near-dup cluster (pairs → connected components → anti-join;
    the loser set is tiny and broadcasts, the corpus never shuffles)."""
    docs = _t(spark, sf, "documents")
    pairs = ngram_jaccard(spark, sf).select("id_a", "id_b")
    return dedup.dedup_near(docs, pairs).select("doc_id", "lang")


@query("leakage_safe_split", f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES}, {_WALK_CTES},
    comp AS (SELECT id, min(comp) AS component FROM walk GROUP BY id)
    SELECT d.doc_id,
           substring(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)
                         || 'split'), 1, 4) < '1999' AS is_holdout
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
""")
def leakage_safe_split_q(spark, sf):
    """near-dup-safe train/holdout split: membership hashed on the
    cluster representative so no duplicate pair straddles the boundary
    (the classic eval-contamination bug)."""
    docs = _t(spark, sf, "documents").select("doc_id")
    pairs = ngram_jaccard(spark, sf).select("id_a", "id_b")
    return (sampling.leakage_safe_split(docs, pairs, holdout=0.1)
            .select("doc_id", "is_holdout"))


def _pii_suffix_sql() -> str:
    return ("text || ' reach user' || CAST(doc_id AS VARCHAR) || "
            "'@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR) || "
            "'.7 ssn 123-45-6789 tel 555-0142'")


def _pii_oracle() -> str:
    # built from the SAME pattern list the operator applies, in the same
    # order, so the two engines can never drift
    sql_text = _pii_suffix_sql()
    counts = []
    for name, pat, rep in redact.PII_PATTERNS:
        counts.append(f"CAST(len(regexp_extract_all({sql_text}, '{pat}')) AS BIGINT)"
                      f" AS n_{name}")
        sql_text = f"regexp_replace({sql_text}, '{pat}', '{rep}', 'g')"
    return (f"SELECT doc_id, {sql_text} AS clean_text, {', '.join(counts)} "
            "FROM documents")


@query("redact_pii", _pii_oracle())
def redact_pii_q(spark, sf):
    """PII redaction (email → SSN → IPv4 → phone, sequential) with
    per-category counts.  Synthetic PII is appended deterministically
    from doc_id in both engines so every pattern actually fires."""
    docs = _t(spark, sf, "documents").withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" reach user"),
                 F.col("doc_id").cast("string"), F.lit("@example.com or 10.0."),
                 (F.col("doc_id") % 256).cast("string"),
                 F.lit(".7 ssn 123-45-6789 tel 555-0142")))
    return (redact.redact_pii(docs)
            .select(F.col("id").alias("doc_id"), "clean_text",
                    "n_email", "n_ssn", "n_ip", "n_phone"))


# ---------------------------------------------------------------------------
# ANN / sketch verification (oracles for the approximate operators)
# ---------------------------------------------------------------------------

# The true near-dup pair set by EXACT 3-word-shingle Jaccard >= 0.5 —
# the ground truth both approximate candidate generators must recover.
# Raw space tokens (no normalization) for engine parity.
_SHINGLE_PAIRS_ORACLE = """
    WITH prepared AS (
        SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
            i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        FROM documents)
    SELECT l.doc_id AS id_a, r.doc_id AS id_b,
           round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(l.sh, r.sh))), 4) AS jaccard
    FROM prepared l JOIN prepared r ON l.doc_id < r.doc_id
    WHERE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(l.sh, r.sh))) >= 0.5
"""


def _verify_pairs_exact(docs: DataFrame, cands: DataFrame) -> DataFrame:
    """Exact-shingle-Jaccard verification of candidate (id_a, id_b)
    pairs: the second stage of the candidates→verify near-dup pipeline.
    Only docs that appear in a candidate pair are shingled (semi-join
    pruning) — at corpus scale the candidate set is tiny, so the verify
    stage never rescans the full table.

    ``cands`` feeds THREE plan branches (the verify join's base plus
    both sides of the id union) and ``shingled`` feeds two (the a/b
    join sides) — materialize both so the candidate pipeline and the
    docs semi-join run once instead of 3×/2× (r12; the un-cached form
    re-ran the whole LSH band join per reference — 13 parquet scans for
    minhash_neardup's plan)."""
    cands = cands.cache()
    cand_ids = (cands.select(F.col("id_a").alias("doc_id"))
                .unionByName(cands.select(F.col("id_b").alias("doc_id")))
                .distinct())
    sh = F.array_distinct(cached_expr(
        "transform(sequence(0, greatest(size(split(text, ' ')) - 3, 0)),"
        " i -> array_join(slice(split(text, ' '), i + 1, 3), ' '))"))
    shingled = (docs.join(cand_ids, "doc_id", "left_semi")
                .select(F.col("doc_id"), sh.alias("sh")).cache())
    a = shingled.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
           / F.size(F.array_union("sh_a", "sh_b")))
    return (cands.join(a, "id_a").join(b, "id_b")
            .filter(jac >= 0.5)
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard")))


@query("minhash_lsh_verified", _SHINGLE_PAIRS_ORACLE)
def minhash_lsh_verified(spark, sf):
    """The full minhash near-dup pipeline, oracle-checked: LSH banded
    candidates (approximate) verified by exact shingle Jaccard >= 0.5.
    At J >= 0.85 (this corpus's near-dups) a 64-hash/16-band signature
    misses a pair with p < 1e-5, so the emitted set equals the exact
    all-pairs oracle — a banding or signature regression loses pairs
    and fails the hash, which the rows-only `minhash_lsh` check never
    caught."""
    docs = _t(spark, sf, "documents")
    # r12: the signature relation feeds both sides of the band self-join
    # — cache it (same justification as minhash_lsh's), and generate the
    # candidate set through lsh_verified_pairs' first-colliding-band
    # dedup instead of lsh_candidate_pairs + distinct: the emitted pair
    # set is identical (every band-colliding pair exactly once), but the
    # cross-band ``distinct`` exchange is gone.  min_match is None, so
    # no candidate is filtered — verification below stays the only gate.
    sigs = dedup.minhash_signatures(docs, normalize=False).cache()
    cands = dedup.lsh_verified_pairs(sigs, bands=16).select("id_a", "id_b")
    return _verify_pairs_exact(docs, cands)


@query("ivf_topk_exhaustive", """
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cosine
    FROM embeddings
    ORDER BY list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC, vec_id
    LIMIT 10
""")
def ivf_topk_exhaustive(spark, sf):
    """IVF with nprobe = n_centroids (scan every inverted list): the
    k-means training, Arrow-batched list assignment, and rerank must
    reproduce the exact brute-force top-k — oracle-checking the whole
    IVF machinery.  The pruned-nprobe path stays `ivf_topk` (recall
    bound pytest-covered)."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    out = similarity.ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=8)
    return out.select(F.col("id").alias("vec_id"), F.round("cosine", 4).alias("cosine"))


@query("approx_distinct_tokens", """
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
    SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS exact_n,
           true AS hll_within_5pct
    FROM tok GROUP BY lang ORDER BY lang
""")
def approx_distinct_tokens(spark, sf):
    """HyperLogLog distinct-token counts per language — the sketch every
    100 TB cardinality estimate uses (one pass, mergeable, no shuffle of
    raw values).  Sketches differ across engines, so the check is a
    property: the exact count must hash-match AND the HLL estimate must
    sit within its 5% error envelope (rsd=0.02 → drift fails the gate)."""
    tok = (_t(spark, sf, "documents")
           .select("lang", F.explode(F.split("text", " ")).alias("tok")))
    return (tok.groupBy("lang")
            .agg(F.count_distinct("tok").alias("exact_n"),
                 F.approx_count_distinct("tok", rsd=0.02).alias("hll_n"))
            .select("lang", F.col("exact_n").cast("long").alias("exact_n"),
                    (F.abs(F.col("hll_n") - F.col("exact_n"))
                     <= 0.05 * F.col("exact_n")).alias("hll_within_5pct"))
            .orderBy("lang"))


@query("approx_quantile_value", """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           true AS p50_ok, true AS p95_ok
    FROM events GROUP BY event_type ORDER BY event_type
""")
def approx_quantile_value(spark, sf):
    """Greenwald-Khanna quantile sketch per event type (the mergeable
    one-pass quantile every large-scale profile job uses).  Property
    check: the sketch's p50/p95 must land within the value range of
    ranks ±1% around the target rank, computed exactly in the same job
    (exact rank bounds via window; the oracle pins group counts and the
    two booleans)."""
    ev = _t(spark, sf, "events")
    approx = (ev.groupBy("event_type")
              .agg(F.percentile_approx("value", [0.5, 0.95], 10000).alias("q"),
                   F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("event_type").orderBy("value")
    # r12: the group count the rank bounds need is computable in the
    # SAME window partition (count over the unordered frame) — the
    # former join back to ``approx`` for ``n`` duplicated the whole
    # aggregate subtree (a third scan of events) and added a join
    # exchange; the window count shares the ranking exchange, and the
    # following groupBy reuses that partitioning too
    ranked = ev.select("event_type", "value", F.row_number().over(w).alias("rk"),
                       F.count(F.lit(1)).over(
                           Window.partitionBy("event_type")).alias("n"))
    bounds = (ranked
              .groupBy("event_type")
              .agg(*[F.min(F.when((F.col("rk") >= F.floor(q * F.col("n") - 0.01 * F.col("n")))
                                  & (F.col("rk") <= F.ceil(q * F.col("n") + 0.01 * F.col("n"))),
                                  F.col("value"))).alias(f"lo_{name}")
                     for q, name in [(0.5, "p50"), (0.95, "p95")]],
                   *[F.max(F.when((F.col("rk") >= F.floor(q * F.col("n") - 0.01 * F.col("n")))
                                  & (F.col("rk") <= F.ceil(q * F.col("n") + 0.01 * F.col("n"))),
                                  F.col("value"))).alias(f"hi_{name}")
                     for q, name in [(0.5, "p50"), (0.95, "p95")]]))
    return (approx.join(bounds, "event_type")
            .select("event_type", F.col("n").cast("long").alias("n"),
                    ((F.col("q")[0] >= F.col("lo_p50")) & (F.col("q")[0] <= F.col("hi_p50"))).alias("p50_ok"),
                    ((F.col("q")[1] >= F.col("lo_p95")) & (F.col("q")[1] <= F.col("hi_p95"))).alias("p95_ok"))
            .orderBy("event_type"))


@query("salted_group_counts", """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
""")
def salted_group_counts(spark, sf):
    """Skew-safe aggregation (operators/skew.py): two-stage salted
    count + salted exact-distinct, verified against the plain GROUP BY
    oracle — the salting must be a pure execution-strategy change with
    zero effect on results.  This is the pattern for hot keys whose
    single reducer would bottleneck a 100 TB aggregate."""
    from dlx_spark.operators import skew

    ev = _t(spark, sf, "events")
    counts = skew.salted_group_count(ev, "user_id")
    distinct = skew.salted_count_distinct(ev, "user_id", "event_type")
    return (counts.join(distinct, "user_id")
            .select("user_id", "n", F.col("n_distinct").alias("n_types")))


# GPT-2-style pretokenizer, ASCII classes only so the Java and RE2
# regex engines agree: contraction suffixes, space-prefixed letter runs,
# digit runs, punctuation runs, residual whitespace
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


@query("token_count_bpe", f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
    FROM documents
""")
def token_count_bpe(spark, sf):
    """BPE-style token counting: a GPT-2-ish pretokenizer regex (the
    standard proxy for LLM token budgets when the real tokenizer isn't
    on the cluster) next to the whitespace count.  regexp_count is pure
    JVM — no UDF in the hot path."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_PAT)).cast("long").alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"))


@query("oov_rate", """
    WITH tok AS (
        SELECT doc_id, t.tok FROM documents,
             unnest(string_split(text, ' ')) AS t(tok)
        WHERE t.tok != ''),
    vocab AS (
        SELECT tok FROM tok GROUP BY tok
        ORDER BY count(*) DESC, tok LIMIT 16)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE tok NOT IN (SELECT tok FROM vocab))
                AS BIGINT) AS n_oov
    FROM tok GROUP BY doc_id
""")
def oov_rate_q(spark, sf):
    """out-of-vocabulary profile (textstats.oov_rate): per document, the
    count of token occurrences outside the corpus's top-16 vocabulary —
    the frequency-filter quality signal per-doc stats can't see (it
    needs the corpus distribution).  Vocabulary tie-break is a total
    order (count desc, token asc), so the boundary is deterministic in
    both engines; counts, not a ratio, so there is no rounding
    surface."""
    docs = _t(spark, sf, "documents")
    out = textstats.oov_rate(docs, vocab_size=16)
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "n_oov")


#: SemDeDup prune threshold, tuned to the synthetic corpus like the
#: other embedding entries (embedding_lsh_pairs / embedding_neardup)
_SEMDEDUP_TAU = 0.35


@query("semdedup_survivors", f"""
    WITH sig AS (SELECT vec_id, embedding,
                        CAST({_sig_sql(6)} AS BIGINT) AS cluster
                 FROM embeddings)
    SELECT s.vec_id, s.cluster FROM sig s
    WHERE NOT EXISTS (
        SELECT 1 FROM sig u
        WHERE u.cluster = s.cluster AND u.vec_id < s.vec_id
          AND list_cosine_similarity(u.embedding::DOUBLE[],
                                     s.embedding::DOUBLE[])
              >= {_SEMDEDUP_TAU})
""")
def semdedup_survivors(spark, sf):
    """SemDeDup (similarity.semdedup, arXiv:2303.09540): cluster-scoped
    semantic dedup — a vector is pruned iff a lower-id vector in the
    SAME cluster sits at cosine ≥ τ (leader rule; all-pairs work is
    bounded per cluster, the method's whole point at 100 TB).  The
    oracle replays the hyperplane clustering from the baked plane
    literals and the prune rule as NOT EXISTS, so the clustering AND
    the prune are both hash-checked; the k-means-cluster variant (the
    paper's quantizer) is pytest-locked equivalent at 1 cluster and
    deterministic under the seeded trainer."""
    emb = _t(spark, sf, "embeddings")
    out = similarity.semdedup(emb, threshold=_SEMDEDUP_TAU,
                              method="hyperplane", n_clusters=64, dim=64)
    return out.select("vec_id",
                      F.col("cluster").cast("long").alias("cluster"))


# ---------------------------------------------------------------------------
# Driver-window consolidation
# ---------------------------------------------------------------------------
# The driver's correctness gate checks the FIRST 50 ``queries()`` entries;
# with 72 fine-grained queries, 22 (including the round-2 verification
# flagships) never got a driver-side row.  The merged queries below fold
# near-redundant basics into schema-aligned unions/joins of the SAME green
# building blocks — every Spark branch calls the original query function
# and every oracle wraps the original oracle SQL as a subquery, so the
# semantics checked are identical, just packed densely enough that the
# whole registry fits the 50-slot window (plus the two rows-only-by-design
# entries pinned to positions 51-52, each with an oracle-checked companion
# inside the window).  The fine-grained originals stay importable in
# ``BENCH`` for bench.py / plan tests / round-over-round comparability.


@query("text_semantics", f"""
    SELECT doc_id, 'regex' AS mode FROM ({ORACLE['regex_match']}) t1
    UNION ALL
    SELECT doc_id, 'words_all' AS mode FROM ({ORACLE['text_words_all']}) t2
    UNION ALL
    SELECT doc_id, 'negation' AS mode FROM ({ORACLE['text_negation']}) t3
    UNION ALL
    SELECT doc_id, 'phrase' AS mode FROM ({ORACLE['text_phrase']}) t4
""")
def text_semantics(spark, sf):
    """Text-search DSL semantics in one labeled union: /regex/ value
    form, words-$all containment, -word negation, "phrase" match
    (query.py:118-150, 698-751)."""
    return (
        regex_match(spark, sf).select("doc_id", F.lit("regex").alias("mode"))
        .unionAll(text_words_all(spark, sf).select("doc_id", F.lit("words_all").alias("mode")))
        .unionAll(text_negation(spark, sf).select("doc_id", F.lit("negation").alias("mode")))
        .unionAll(text_phrase(spark, sf).select("doc_id", F.lit("phrase").alias("mode")))
    )


@query("scalar_stats", f"""
    SELECT (SELECT cnt FROM ({ORACLE['count_filtered']}) t1) AS cnt,
           (SELECT max_id FROM ({ORACLE['max_id']}) t2) AS max_id,
           c.qty_price_corr, c.disc_price_corr
    FROM ({ORACLE['correlation']}) c
""")
def scalar_stats(spark, sf):
    """one-row scalar surface: filtered count (MarcSet.count), max id
    (Marc.max_id) and Pearson correlations, cross-joined into one row."""
    return (count_filtered(spark, sf)
            .crossJoin(max_id(spark, sf))
            .crossJoin(correlation(spark, sf)))


@query("setops_combined", f"""
    SELECT o_custkey, 'except' AS op FROM ({ORACLE['setops_except']}) t1
    UNION ALL
    SELECT o_custkey, 'intersect' AS op FROM ({ORACLE['setops_intersect']}) t2
""")
def setops_combined(spark, sf):
    """Diff / $nin set semantics: EXCEPT and INTERSECT branches labeled
    in one union (dlx/marc/__init__.py:2235-2282)."""
    return (
        setops_except(spark, sf).select("o_custkey", F.lit("except").alias("op"))
        .unionAll(setops_intersect(spark, sf).select("o_custkey", F.lit("intersect").alias("op")))
    )


@query("union_buckets", f"""
    SELECT o_orderkey, bucket FROM ({ORACLE['union_sets']}) t1
    UNION ALL
    SELECT o_orderkey, 'picked' AS bucket FROM orders
    WHERE o_orderkey IN (1, 2, 3, 7, 32, 33, 34, 36, 38, 39)
""")
def union_buckets(spark, sf):
    """union-across-collections plus the from_ids {_id: {$in: ids}}
    point-read shape as a third labeled branch."""
    picked = (_t(spark, sf, "orders")
              .filter(F.col("o_orderkey").isin([1, 2, 3, 7, 32, 33, 34, 36, 38, 39]))
              .select("o_orderkey", F.lit("picked").alias("bucket")))
    return union_sets(spark, sf).unionAll(picked)


@query("flag_status_stats", f"""
    SELECT 'rollup' AS mode, l_returnflag, l_linestatus, n, sum_qty AS val
    FROM ({ORACLE['rollup_agg']}) t1
    UNION ALL
    SELECT 'cum_share' AS mode, l_returnflag, l_linestatus, n, cum_share AS val
    FROM ({ORACLE['cumulative_share']}) t2
""")
def flag_status_stats(spark, sf):
    """hierarchical ROLLUP subtotals and the running-share window over
    the same pre-aggregated frame, labeled in one union."""
    roll = rollup_agg(spark, sf).select(
        F.lit("rollup").alias("mode"), "l_returnflag", "l_linestatus", "n",
        F.col("sum_qty").alias("val"))
    cum = cumulative_share(spark, sf).select(
        F.lit("cum_share").alias("mode"), "l_returnflag", "l_linestatus",
        F.col("n").cast("long").alias("n"), F.col("cum_share").alias("val"))
    return roll.unionAll(cum)


@query("group_profile", """
    SELECT event_type, count(*) AS n, round(avg(value), 2) AS avg_value,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_k
    FROM events GROUP BY event_type
""")
def group_profile(spark, sf):
    """calculate_auth_use group-count shape plus schemaless-JSON field
    extraction, one partial-agg pass (group_counts + json_extract)."""
    return (
        _t(spark, sf, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("value"), 2).alias("avg_value"),
             F.round(F.avg("k"), 2).alias("avg_k"))
    )


@query("token_stats", f"""
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
""")
def token_stats(spark, sf):
    """token counting: whitespace and GPT-2-ish BPE pretokenizer counts
    in one pure-JVM projection (token_count + token_count_bpe)."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.regexp_count("text", F.lit(_BPE_PAT)).cast("long").alias("n_bpe_tokens"))


@query("classifier_scores", """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents WHERE length(trim(text)) > 0),
    b AS (SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(t || 'clf'), 1, 15)
                           AS UBIGINT) % 4096 AS BIGINT) AS bucket
          FROM tok),
    w AS (SELECT doc_id,
                 ((CAST(CAST('0x' || substr(md5(CAST(bucket AS VARCHAR) || 'w'), 1, 15)
                             AS UBIGINT) % 2001 AS BIGINT) - 1000) / 1024.0) AS wt
          FROM b)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(wt), 4) + 0.0 AS clf_linear,
           round(1.0 / (1.0 + exp(-avg(wt))), 4) + 0.0 AS clf_score
    FROM w GROUP BY doc_id
""")
def classifier_scores(spark, sf):
    """fastText-style hashed linear classifier scoring
    (textstats.hashed_classifier_score): 4096 hashed-feature buckets,
    seeded engine-portable weights, per-doc mean weight + sigmoid —
    the quality-filter inference stage with the model as a broadcast
    (bucket, weight) dimension."""
    docs = _t(spark, sf, "documents")
    weights = textstats.seeded_classifier_weights(spark, 4096)
    out = textstats.hashed_classifier_score(docs, weights, 4096,
                                            normalize=False)
    # + 0.0 folds IEEE negative zero (round(-1e-5, 4) -> -0.0) into the
    # positive zero the oracle's identical normalization produces
    return out.select("doc_id", "n_tokens",
                      (F.round("clf_linear", 4) + 0.0).alias("clf_linear"),
                      (F.round("clf_score", 4) + 0.0).alias("clf_score"))


@query("lang_quality", f"""
    SELECT l.doc_id, l.en_hits, l.fr_hits, q.n_tokens, q.alpha_ratio,
           q.stop_ratio, q.mean_word_len, c.clf_linear, c.clf_score
    FROM ({ORACLE['lang_scores']}) l JOIN ({ORACLE['quality_score']}) q
      ON l.doc_id = q.doc_id
    JOIN ({ORACLE['classifier_scores']}) c ON l.doc_id = c.doc_id
""")
def lang_quality(spark, sf):
    """language-ID marker scores, quality features, and the hashed
    linear classifier's quality score in one per-doc frame
    (lang_scores + quality_score + classifier_scores, joined on
    doc_id)."""
    return (lang_scores(spark, sf)
            .join(quality_score(spark, sf), "doc_id")
            .join(classifier_scores(spark, sf)
                  .select("doc_id", "clf_linear", "clf_score"), "doc_id"))


@query("doc_profile", f"""
    SELECT r.doc_id, r.rep_ratio, e.char_entropy, u.norm_text, u.n_chars_nfc,
           o.n_tokens AS n_tokens_ws, o.n_oov
    FROM ({ORACLE['repetition_ratio']}) r
    JOIN ({ORACLE['char_entropy']}) e ON r.doc_id = e.doc_id
    JOIN ({ORACLE['unicode_nfc']}) u ON r.doc_id = u.doc_id
    JOIN ({ORACLE['oov_rate']}) o ON r.doc_id = o.doc_id
""")
def doc_profile(spark, sf):
    """per-document text profile: token repetition ratio, character
    Shannon entropy, NFC-normalized text, and the out-of-vocabulary
    counts against the corpus top-16 vocabulary, joined on doc_id
    (repetition_ratio + char_entropy + unicode_nfc + oov_rate)."""
    return (repetition_ratio_q(spark, sf)
            .join(char_entropy_q(spark, sf), "doc_id")
            .join(unicode_nfc(spark, sf), "doc_id")
            .join(oov_rate_q(spark, sf)
                  .withColumnRenamed("n_tokens", "n_tokens_ws"), "doc_id"))


@query("export_shard_stats", """
    WITH s AS (
        SELECT doc_id, lang,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'exp'), 1, 15)
                         AS UBIGINT) % 8 AS BIGINT) AS shard
        FROM documents)
    SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 15)
                             AS UBIGINT) AS BIGINT)) AS content_xor,
           min(doc_id) AS min_key, max(doc_id) AS max_key
    FROM s GROUP BY shard
""")
def export_shard_stats(spark, sf):
    """deterministic sharded export (export.assign_shards /
    shard_manifest): closed-form md5 shard assignment over the doc key
    + per-shard row count, order-insensitive xor content digest, and
    key range — the manifest any engine can re-derive to certify an
    exported corpus."""
    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    sharded = export.assign_shards(docs, n_shards=8, key_col="doc_id",
                                   salt="exp")
    return export.shard_manifest(sharded, ("doc_id", "lang")).select(
        F.col("shard").cast("long").alias("shard"),
        "n_rows", "content_xor", "min_key", "max_key")


@query("sample_splits", f"""
    SELECT doc_id, lang, 'uniform' AS strategy
    FROM ({ORACLE['deterministic_sample']}) t1
    UNION ALL
    SELECT doc_id, lang, 'stratified' AS strategy
    FROM ({ORACLE['stratified_sample']}) t2
    UNION ALL
    SELECT shard AS doc_id,
           CAST(n_rows AS VARCHAR) || ':' || CAST(content_xor AS VARCHAR)
             || ':' || CAST(min_key AS VARCHAR) || ':' || CAST(max_key AS VARCHAR) AS lang,
           'shards' AS strategy
    FROM ({ORACLE['export_shard_stats']}) t3
""")
def sample_splits(spark, sf):
    """hash-keyed reproducible sampling (uniform 10% + per-stratum
    {en: 10%, de: 50%}) and the deterministic-export shard manifest
    (stats packed into the string column), labeled in one union
    (deterministic_sample + stratified_sample + export_shard_stats)."""
    shards = export_shard_stats(spark, sf).select(
        F.col("shard").alias("doc_id"),
        F.concat_ws(":", "n_rows", "content_xor",
                    "min_key", "max_key").alias("lang"),
        F.lit("shards").alias("strategy"))
    return (
        deterministic_sample_q(spark, sf)
        .select("doc_id", "lang", F.lit("uniform").alias("strategy"))
        .unionAll(stratified_sample_q(spark, sf)
                  .select("doc_id", "lang", F.lit("stratified").alias("strategy")))
        .unionAll(shards)
    )


@query("mix_quantile", f"""
    SELECT doc_id, lang, 'mix' AS mode FROM ({ORACLE['mix_corpora']}) t1
    UNION ALL
    SELECT doc_id, lang, 'band' AS mode FROM ({ORACLE['quantile_band']}) t2
""")
def mix_quantile(spark, sf):
    """weighted corpus mixing and the per-language percent-rank quality
    band, labeled in one union (mix_corpora + quantile_band)."""
    return (
        mix_corpora_q(spark, sf).select("doc_id", "lang", F.lit("mix").alias("mode"))
        .unionAll(quantile_band_q(spark, sf)
                  .select("doc_id", "lang", F.lit("band").alias("mode")))
    )


@query("dup_cluster_survivors", f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES}, {_WALK_CTES},
    comp AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
    prio AS (SELECT d.doc_id,
                    row_number() OVER (PARTITION BY c.component
                                       ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
             FROM documents d JOIN comp c ON c.id = d.doc_id)
    SELECT d.doc_id, d.lang, CAST(c.component AS BIGINT) AS component,
           (c.component IS NULL OR d.doc_id = c.component) AS is_survivor,
           (p.rn IS NULL OR p.rn = 1) AS best_survivor
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    LEFT JOIN prio p ON p.doc_id = d.doc_id
""")
def dup_cluster_survivors(spark, sf):
    """near-dedup end-to-end with THREE artifacts cross-checked in one
    frame: connected-component labels from iterative min-label
    propagation, the min-id survivor flag computed independently by
    dedup_near's anti-join, and the QUALITY survivor flag from
    dedup_near_by_priority (keep the longest copy, ties to min id) —
    the oracle's recursive walk + windowed arg-max must agree with
    each, and min-id/quality rules must agree on unclustered docs."""
    docs = _t(spark, sf, "documents")
    pairs = ngram_jaccard(spark, sf).select("id_a", "id_b")
    # r12: run the iterative component-propagation loop ONCE and feed
    # the same labels to all three consumers — the min-id anti-join and
    # the quality anti-join previously each re-ran the whole loop
    # (3 multi-job iterations per construction).  The labels relation is
    # checkpointed by connected_components, so the three references
    # share one materialization; each consumer's own logic (anti-join,
    # winner choice) is unchanged.
    labels = dedup.connected_components(pairs)
    comp = labels.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"))
    surv = (dedup.dedup_near(docs, pairs, components=labels).select("doc_id")
            .withColumn("is_survivor", F.lit(True)))
    best = (dedup.dedup_near_by_priority(docs, pairs, "n_chars",
                                         components=labels)
            .select("doc_id").withColumn("best_survivor", F.lit(True)))
    return (docs.select("doc_id", "lang")
            .join(comp, "doc_id", "left")
            .join(surv, "doc_id", "left")
            .join(best, "doc_id", "left")
            .na.fill({"is_survivor": False, "best_survivor": False})
            .select("doc_id", "lang", "component", "is_survivor",
                    "best_survivor"))


@query("minhash_neardup", f"""
    SELECT id_a, id_b, CAST(n_match AS DOUBLE) AS score, 'candidates' AS stage
    FROM ({_minhash_oracle()}) t1
    UNION ALL
    SELECT id_a, id_b, jaccard AS score, 'verified' AS stage
    FROM ({_SHINGLE_PAIRS_ORACLE}) t2
""")
def minhash_neardup(spark, sf):
    """the full minhash near-dup pipeline in one labeled union:
    'candidates' = banded LSH pairs with their matching-position count
    (the seeded permutation family baked into the oracle as literals);
    'verified' = candidates confirmed by exact shingle Jaccard >= 0.5,
    which at this corpus's similarity level equals the exact all-pairs
    oracle (minhash_lsh + minhash_lsh_verified)."""
    cands = (minhash_lsh(spark, sf)
             .select("id_a", "id_b", F.col("n_match").cast("double").alias("score"),
                     F.lit("candidates").alias("stage")))
    verified = (minhash_lsh_verified(spark, sf)
                .select("id_a", "id_b", F.col("jaccard").alias("score"),
                        F.lit("verified").alias("stage")))
    return cands.unionAll(verified)


@query("cosine_sim", f"""
    SELECT CAST(0 AS BIGINT) AS id_a, vec_id AS id_b, cosine, 'topk' AS mode
    FROM ({ORACLE['cosine_topk']}) t1
    UNION ALL
    SELECT id_a, id_b, cosine, 'neardup' AS mode
    FROM ({ORACLE['embedding_neardup']}) t2
    UNION ALL
    SELECT id_a, id_b, cosine, 'lshpairs' AS mode
    FROM ({ORACLE['embedding_lsh_pairs']}) t3
    UNION ALL
    SELECT vec_id AS id_a, cluster AS id_b,
           CAST(NULL AS DOUBLE) AS cosine, 'semdedup' AS mode
    FROM ({ORACLE['semdedup_survivors']}) t4
""")
def cosine_sim(spark, sf):
    """embedding similarity surface in one labeled union: exact
    brute-force cosine top-k for query vec 0, label-blocked
    embedding-cosine near-dup pairs, banded-LSH-blocked near-dup
    pairs — the bucket-blocked pair generation actually used at scale —
    and the SemDeDup cluster-scoped prune survivors (id_a = vec_id,
    id_b = cluster) (cosine_topk + embedding_neardup +
    embedding_lsh_pairs + semdedup_survivors)."""
    topk = cosine_topk(spark, sf).select(
        F.lit(0).cast("long").alias("id_a"), F.col("vec_id").alias("id_b"),
        "cosine", F.lit("topk").alias("mode"))
    nd = embedding_neardup(spark, sf).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine", F.lit("neardup").alias("mode"))
    lsh = embedding_lsh_pairs(spark, sf).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine", F.lit("lshpairs").alias("mode"))
    sd = semdedup_survivors(spark, sf).select(
        F.col("vec_id").cast("long").alias("id_a"),
        F.col("cluster").cast("long").alias("id_b"),
        F.lit(None).cast("double").alias("cosine"),
        F.lit("semdedup").alias("mode"))
    return topk.unionAll(nd).unionAll(lsh).unionAll(sd)


@query("approx_sketches", f"""
    SELECT lang AS grp, exact_n AS n, hll_within_5pct AS ok_a, true AS ok_b,
           'hll_distinct' AS sketch
    FROM ({ORACLE['approx_distinct_tokens']}) t1
    UNION ALL
    SELECT event_type AS grp, n, p50_ok AS ok_a, p95_ok AS ok_b,
           'quantile' AS sketch
    FROM ({ORACLE['approx_quantile_value']}) t2
""")
def approx_sketches(spark, sf):
    """mergeable-sketch property checks in one labeled union: HLL
    distinct-token counts within the 5% envelope per language, and
    Greenwald-Khanna p50/p95 within exact rank bounds per event type
    (approx_distinct_tokens + approx_quantile_value)."""
    hll = approx_distinct_tokens(spark, sf).select(
        F.col("lang").alias("grp"), F.col("exact_n").alias("n"),
        F.col("hll_within_5pct").alias("ok_a"), F.lit(True).alias("ok_b"),
        F.lit("hll_distinct").alias("sketch"))
    qs = approx_quantile_value(spark, sf).select(
        F.col("event_type").alias("grp"), "n",
        F.col("p50_ok").alias("ok_a"), F.col("p95_ok").alias("ok_b"),
        F.lit("quantile").alias("sketch"))
    return hll.unionAll(qs)


@query("contamination", f"""
    SELECT CAST(corpus_id AS VARCHAR) || ':' || CAST(bench_id AS VARCHAR) AS k,
           n_shared AS n_a, CAST(NULL AS BIGINT) AS n_b,
           CAST(NULL AS BIGINT) AS n_c, CAST(NULL AS DOUBLE) AS frac,
           'pair' AS mode
    FROM ({ORACLE['contamination_pairs']}) t1
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) || ':' || cleaned_digest AS k,
           n_segments AS n_a, n_kept AS n_b, n_words_kept AS n_c,
           CAST(NULL AS DOUBLE) AS frac, 'segment' AS mode
    FROM ({ORACLE['segment_dedup_stats']}) t2
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) AS k,
           n_words AS n_a, n_dup_spans AS n_b, dup_words AS n_c,
           dup_fraction AS frac, 'span' AS mode
    FROM ({ORACLE['dup_span_profile']}) t3
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) || ':' || cleaned_digest AS k,
           n_words AS n_a, n_words_cut AS n_b, CAST(NULL AS BIGINT) AS n_c,
           CAST(NULL AS DOUBLE) AS frac, 'cut' AS mode
    FROM ({ORACLE['span_cut_profile']}) t4
""")
def contamination(spark, sf):
    """cross-document duplicated-text surface in one labeled union:
    benchmark decontamination pairs, C4-style repeated-segment removal
    (k = doc:cleaned-digest, so the rebuilt text is hash-pinned),
    the Lee-et-al duplicated-span profile, and the keep-first span cut
    (contamination_pairs + segment_dedup_stats + dup_span_profile +
    span_cut_profile)."""
    bigint_null = F.lit(None).cast("long")
    pair = contamination_pairs(spark, sf).select(
        F.concat_ws(":", "corpus_id", "bench_id").alias("k"),
        F.col("n_shared").alias("n_a"), bigint_null.alias("n_b"),
        bigint_null.alias("n_c"),
        F.lit(None).cast("double").alias("frac"),
        F.lit("pair").alias("mode"))
    seg = segment_dedup_stats(spark, sf).select(
        F.concat_ws(":", "doc_id", "cleaned_digest").alias("k"),
        F.col("n_segments").alias("n_a"), F.col("n_kept").alias("n_b"),
        F.col("n_words_kept").alias("n_c"),
        F.lit(None).cast("double").alias("frac"),
        F.lit("segment").alias("mode"))
    span = dup_span_profile(spark, sf).select(
        F.col("doc_id").cast("string").alias("k"),
        F.col("n_words").alias("n_a"), F.col("n_dup_spans").alias("n_b"),
        F.col("dup_words").alias("n_c"),
        F.col("dup_fraction").alias("frac"),
        F.lit("span").alias("mode"))
    cut = span_cut_profile(spark, sf).select(
        F.concat_ws(":", "doc_id", "cleaned_digest").alias("k"),
        F.col("n_words").alias("n_a"), F.col("n_words_cut").alias("n_b"),
        bigint_null.alias("n_c"),
        F.lit(None).cast("double").alias("frac"),
        F.lit("cut").alias("mode"))
    return pair.unionAll(seg).unionAll(span).unionAll(cut)


# ---------------------------------------------------------------------------
# Registry finalization
# ---------------------------------------------------------------------------
# BENCH keeps every query — fine-grained originals AND merged — addressable
# by name for bench.py, plan tests and tools; Q/ORACLE are rebuilt in the
# explicit driver order: 50 oracle-checked entries first (the driver's
# correctness window), then the two rows-only-by-design entries whose
# oracle-checked companions (ivf_topk_exhaustive, pack_validity) sit inside
# the window.

BENCH: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(Q)
BENCH_ORACLE: dict[str, str] = dict(ORACLE)

DRIVER_ORDER = [
    # §2.1/§2.2 scans + predicates
    "from_query_filter", "sort_skip_limit", "scalar_stats", "distinct_values",
    "date_range", "text_semantics",
    # §2.3 joins
    "lookup_join", "exists_semijoin", "not_exists_antijoin", "multiway_join",
    # §2.4 aggregation / windows / set ops
    "flag_status_stats", "agg_summary", "group_profile", "latest_by_key",
    "topk_per_group", "setops_combined", "union_buckets", "pivot_counts",
    # temporal
    "sessionization", "asof_join", "range_join", "windowed_agg",
    # dedup family
    "dedup_exact", "ngram_jaccard", "minhash_neardup", "simhash",
    "dup_cluster_survivors", "contamination",
    # similarity / ANN
    "cosine_sim", "lsh_topk", "knn_join", "ivf_topk_exhaustive",
    # text analysis
    "token_stats", "lang_quality", "doc_profile", "tfidf_topk",
    "fingerprint_minhash_sketch", "corpus_top_ngrams",
    # sampling / splits
    "sample_splits", "mix_quantile", "leakage_safe_split",
    # corpus prep
    "chunk_documents", "pack_validity", "redact_pii", "multimodal_decode",
    # stats / misc surfaces
    "median_metrics", "sql_passthrough", "funnel", "approx_sketches",
    "salted_group_counts",
    # rows-only by design (positions 51-52, outside the driver window;
    # companions ivf_topk_exhaustive / pack_validity are inside it)
    "ivf_topk", "pack_sequences",
]

assert len(DRIVER_ORDER) == 52, len(DRIVER_ORDER)
assert len(set(DRIVER_ORDER)) == 52
_missing = [n for n in DRIVER_ORDER if n not in BENCH]
assert not _missing, _missing
_unoracled = [n for n in DRIVER_ORDER[:50] if n not in BENCH_ORACLE]
assert not _unoracled, _unoracled

Q = {name: BENCH[name] for name in DRIVER_ORDER}
ORACLE = {name: BENCH_ORACLE[name] for name in DRIVER_ORDER
          if name in BENCH_ORACLE}


def entry_query(spark: SparkSession) -> DataFrame:
    """Flagship: the pricing-summary aggregate at sf0.001."""
    return agg_summary(spark, "/root/testdata/sf0.001")
