"""Shared fixtures: a session-scoped local SparkSession and the canonical
2-bib/2-auth record set described in FIXTURES.md (the reference's
universal test fixture, re-created from its documented shape)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dlx_spark.session import get_spark
    # keep local test parallelism modest; shuffle partitions low for tiny data
    spark = get_spark("dlx_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    _sweep_stale_warehouse(spark)
    yield spark


def _sweep_stale_warehouse(spark):
    """Make the suite immune to killed predecessors: the test session's
    catalog is in-memory, so at session START every directory under the
    warehouse is by definition an orphan of a prior (possibly kill -9'd)
    run — no live table can reference it.  Sweeping here means no test
    can inherit a LOCATION_ALREADY_EXISTS from a run that died mid-write
    (the ParquetTableBackend also self-heals per-create; this is the
    suite-level guarantee, covering appends and the versioned root).

    SINGLE-PROCESS ASSUMPTION: the sweep is only sound when this run is
    the warehouse's sole user.  Under pytest-xdist (or two concurrent
    runs in one checkout) a later-starting worker would delete the live
    tables of an in-flight sibling sharing cwd/spark-warehouse — so the
    sweep is skipped there, restoring the per-create self-heal as the
    only (still-correct) orphan defense."""
    if os.environ.get("PYTEST_XDIST_WORKER"):
        return
    from dlx_spark import fsio
    wh = spark.conf.get("spark.sql.warehouse.dir")
    for name in fsio.listdir(spark, wh):
        fsio.rmtree(spark, fsio.join(wh, name))


@pytest.fixture
def bib_docs():
    return [
        {
            "_id": 1,
            "000": ["leader"],
            "008": ["controlfield"],
            "245": [{"indicators": [" ", " "],
                     "subfields": [{"code": "a", "value": "This"},
                                   {"code": "b", "value": "is the"},
                                   {"code": "c", "value": "title"}]}],
            "520": [{"indicators": [" ", " "],
                     "subfields": [{"code": "a", "value": "Description"}]},
                    {"indicators": [" ", " "],
                     "subfields": [{"code": "a", "value": "Another description"},
                                   {"code": "a", "value": "Repeated subfield"}]}],
            "650": [{"indicators": [" ", " "],
                     "subfields": [{"code": "a", "xref": 1}]}],
            "710": [{"indicators": [" ", " "],
                     "subfields": [{"code": "a", "xref": 2}]}],
        },
        {
            "_id": 2,
            "000": ["leader"],
            "245": [{"indicators": [" ", " "],
                     "subfields": [{"code": "a", "value": "Another"},
                                   {"code": "b", "value": "is the"},
                                   {"code": "c", "value": "title"}]}],
            "650": [{"indicators": [" ", " "],
                     "subfields": [{"code": "a", "xref": 1}]}],
        },
    ]


@pytest.fixture
def auth_docs():
    return [
        {"_id": 1,
         "150": [{"indicators": [" ", " "],
                  "subfields": [{"code": "a", "value": "Header"}]}]},
        {"_id": 2,
         "110": [{"indicators": [" ", " "],
                  "subfields": [{"code": "a", "value": "Another header"}]}]},
    ]


@pytest.fixture
def auth_index(auth_docs):
    from dlx_spark.marc import AuthSet
    return AuthSet.from_dicts(auth_docs).build_index()


@pytest.fixture
def bibs(bib_docs, auth_index):
    from dlx_spark.marc import BibSet
    return BibSet.from_dicts(bib_docs, auth_index=auth_index)


@pytest.fixture
def auths(auth_docs):
    from dlx_spark.marc import AuthSet
    return AuthSet.from_dicts(auth_docs)


@pytest.fixture
def bibs_df(spark, bibs):
    return bibs.to_df(spark)


@pytest.fixture
def auths_df(spark, auths):
    return auths.to_df(spark)
