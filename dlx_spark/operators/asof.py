"""Temporal joins Spark lacks as built-ins: as-of (last-value) join and
point-in-range join.

Neither exists in the reference (its only join family is the authority
xref equi-join, SURVEY §2.3); these are the temporal primitives a
training-data/event pipeline needs.

Scale design:

- ``asof_join`` is O(n log n) per key via union + one window pass — one
  shuffle on the key columns, no point-vs-candidate blowup.  A naive
  join-then-max implementation is quadratic per key; this form survives
  a 100 TB event table (hot keys are a window-sort concern: pre-split
  pathological keys upstream if one user exceeds a partition).
- ``range_join`` buckets both sides on a time grain so the join is an
  equi-join on (key, bucket) with a residual predicate — linear in
  ranges × average-buckets-per-range instead of points × ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .common import epoch_seconds


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: list[str] | tuple[str, ...] = ("user_id",),
              suffix: str = "_matched",
              tolerance_seconds: int | None = None) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right[on] <= left[on]`` within the same ``by`` key (backward
    as-of; left join — unmatched rows keep NULLs).

    Right's columns (except ``by``) are appended, renamed with
    ``suffix`` wherever they collide with a left column name.
    ``tolerance_seconds`` drops matches older than the window.
    """
    by = list(by)
    lcols = [c for c in left.columns]
    rpay_cols = [c for c in right.columns if c not in by]
    out_names = {c: (c + suffix if c in lcols else c) for c in rpay_cols}

    rstruct = F.struct(*[F.col(c) for c in rpay_cols])
    # SQL semantics: NULL join keys never match, and a NULL right
    # timestamp can't satisfy right.ts <= left.ts — drop both kinds of
    # right row so the window can't pair them with probes.  (NULL-ts
    # LEFT rows sort nulls-first, before every right row, so they come
    # out unmatched without special handling.)
    right_nn = right.filter(F.col(on).isNotNull())
    for k in by:
        right_nn = right_nn.filter(F.col(k).isNotNull())
    r = right_nn.select(*by, F.col(on).alias("_t"), F.lit(0).alias("_side"),
                        rstruct.alias("_r"))
    null_r = F.lit(None).cast(r.schema["_r"].dataType)
    l = left.select(*by, F.col(on).alias("_t"), F.lit(1).alias("_side"),
                    null_r.alias("_r"), F.struct(*[F.col(c) for c in lcols]).alias("_l"))
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))

    # right rows sort before left rows at equal timestamps, so the match
    # is inclusive (right.ts == left.ts counts)
    w = (Window.partitionBy(*by).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l.select(*by, "_t", "_side", "_r", "_l").unionByName(
        r.select(*by, "_t", "_side", "_r", "_l"))
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)) \
               .filter(F.col("_side") == 1)

    m = F.col("_m")
    if tolerance_seconds is not None:
        in_window = epoch_seconds(m[on]) >= epoch_seconds(F.col("_t")) - tolerance_seconds
        m = F.when(m.isNotNull() & in_window, F.col("_m"))

    return matched.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[m[c].alias(out_names[c]) for c in rpay_cols],
    )


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel conversion: (step, step_name, n_users) — how many
    users performed each step strictly AFTER their previous step's
    first occurrence (view → click → purchase and the like).

    Multi-pass cascade: pass i joins step-i events to the users who
    reached step i-1 and takes the min qualifying timestamp — one
    partial-agg groupBy per step, each shuffle carrying one timestamp
    per surviving user.  Funnels are 3-5 steps deep, so the pass count
    is a small constant; each pass's survivor set only shrinks.

    Each step's survivor relation feeds TWO consumers — its own count
    row and the next step's join — so it is materialized (r12): the
    un-cached form re-ran step i's whole upstream cascade once per
    later consumer, compounding to 6 scans of ``events`` and 8
    exchanges for a 3-step funnel (now 3 scans — one per step — and
    one groupBy exchange per step).  The cached relation is one
    (user, ts) row per surviving user, shrinking per step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = None
    rows = []
    for i, step in enumerate(steps):
        ev = events.select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"),
                           F.col(type_col).alias("_ty")).filter(F.col("_ty") == step)
        if reached is not None:
            ev = ev.join(reached, "_u").filter(F.col("_ts") > F.col("_t")).drop("_t")
        reached = ev.groupBy("_u").agg(F.min("_ts").alias("_t"))
        if not events.isStreaming:
            reached = reached.cache()
        rows.append(reached.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
                    .select(F.lit(i + 1).alias("step"),
                            F.lit(step).alias("step_name"), "n_users"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def range_join(points: DataFrame, ranges: DataFrame, point_col: str = "ts",
               lo_col: str = "lo", hi_col: str = "hi",
               by: list[str] | tuple[str, ...] = (),
               bucket_seconds: int = 3600, how: str = "inner") -> DataFrame:
    """Join each point row to every range row with
    ``lo <= point < hi`` (plus equality on ``by`` keys).

    Both sides are bucketed on ``bucket_seconds`` grain — ranges explode
    to one row per covered bucket — so Catalyst executes an equi-join on
    (by, bucket) with the interval test as a residual filter, instead of
    a broadcast-nested-loop over every (point, range) pair.  Pick a
    grain near the median range length: too coarse → fat buckets, too
    fine → range blowup.
    """
    by = list(by)
    p = points.withColumn("_bucket", (epoch_seconds(point_col) / bucket_seconds).cast("long"))
    # single-hop bucket explode (r11): the former
    # withColumn/withColumn/drop chain paid three eager re-analyses per
    # construction for one generated column — identical logical result
    r = ranges.select("*", F.explode(F.sequence(
        (epoch_seconds(lo_col) / bucket_seconds).cast("long"),
        (epoch_seconds(hi_col) / bucket_seconds).cast("long"),
    )).alias("_bucket"))

    # the interval test is part of the JOIN CONDITION (not a post-join
    # filter) so outer joins keep their null-extended rows
    cond = [p["_bucket"] == r["_bucket"]]
    cond += [p[k] == r[k] for k in by]
    cond += [r[lo_col] <= p[point_col], p[point_col] < r[hi_col]]
    joined = p.join(r, cond, how)
    keep = [p[c] for c in points.columns] + \
           [r[c].alias(c if c not in points.columns else c + "_range")
            for c in ranges.columns if c not in by]
    return joined.select(*keep)
