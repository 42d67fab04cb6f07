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
    yield spark


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
