"""Plan-inspection helpers: programmatic checks that a DataFrame's
physical plan has the shape we want at scale (pushdown reached the scan,
dimensions broadcast, no stray shuffles).  Used by tests and the perf
pass; on a real cluster these run as CI assertions so a plan regression
fails before it ships.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def simple_plan(df: DataFrame) -> str:
    """Full physical-plan text ('formatted' mode: scan details incl.
    complete PushedFilters/ReadSchema, untruncated)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def final_plan(df: DataFrame) -> str:
    """The EXECUTED physical plan, AQE-final: collects the DataFrame
    first so AdaptiveSparkPlan's runtime re-optimization (e.g. a
    sort-merge join demoted to broadcast once the built side's true
    size is known) has happened — the string a runtime join-strategy
    pin must inspect.  Only for test-scale frames (it materializes)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """The filters that reached the parquet reader."""
    plan = simple_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out += [f.strip() for f in m.group(1).split(",") if f.strip()]
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The pruned column sets actually read from parquet."""
    plan = simple_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^>]*>?)", plan)]


def _count_operator(df: DataFrame, name: str) -> int:
    # formatted mode shows each operator once in the tree and once in the
    # numbered details section; count the detail headers
    return len(re.findall(rf"\(\d+\) {name}\b", simple_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    return _count_operator(df, "BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return _count_operator(df, "SortMergeJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    return _count_operator(df, "Exchange")


def assert_scan_pruned(df: DataFrame, max_columns: int, table_hint: str = "") -> None:
    """Fail if any parquet scan reads more than ``max_columns`` columns."""
    for schema in read_schemas(df):
        ncols = schema.count(":")
        if ncols > max_columns:
            raise AssertionError(
                f"scan reads {ncols} columns (> {max_columns}) {table_hint}: {schema[:200]}")


def assert_no_sort_merge_join(df: DataFrame) -> None:
    if sort_merge_join_count(df) > 0:
        raise AssertionError("plan contains a SortMergeJoin where broadcast was expected:\n"
                             + simple_plan(df)[:2000])
