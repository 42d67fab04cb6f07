"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented SURVEY §2 / LLM-pipeline operator to a callable
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-
equivalent SQL for every entry except two: ``ivf_topk`` (pruned-probe
ANN — the full machinery is oracle-checked via ``ivf_topk_exhaustive``,
the pruned recall via pytest) and ``pack_sequences`` (sequential bin
packing — its invariants are oracle-checked via ``pack_validity``).
The approximate operators (minhash-LSH, simhash, hyperplane-LSH,
winnowing sketch) ARE oracle-checked: their seeded hash families are
engine-portable (md5) or baked into the oracle SQL as literals.

Implementations live in ``dlx_spark.contract``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dlx_spark import contract
    return contract.entry_query(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dlx_spark import contract
    return dict(contract.Q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from dlx_spark import contract
    return dict(contract.ORACLE)
