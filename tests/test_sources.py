"""Distributed IO round-trip tests (MRK / MARCXML / JSONL files)."""

import pytest

from dlx_spark import sources
from dlx_spark.marc import dataframe as mdf


@pytest.fixture(scope="module")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("io")


@pytest.mark.slow
def test_mrk_file_roundtrip(spark, bibs, bibs_df, tmp_root):
    path = str(tmp_root / "bibs_mrk")
    sources.write_mrk(bibs_df, path)
    back = sources.read_mrk(spark, path)
    assert back.count() == 2
    ex = mdf.explode_subfields(back)
    rows = {(r.record_id, r.tag, r.code): (r.value, r.xref)
            for r in ex.collect()}
    assert rows[(1, "245", "a")] == ("This", None)
    # $0 captured back into xref on the auth-controlled 650$a
    assert rows[(1, "650", "a")][1] == 1
    assert rows[(1, "710", "a")][1] == 2


def test_xml_file_roundtrip(spark, bibs_df, tmp_root):
    path = str(tmp_root / "bibs_xml")
    sources.write_marcxml(bibs_df, path)
    back = sources.read_marcxml(spark, path)
    assert back.count() == 2
    ex = mdf.explode_subfields(back)
    rows = {(r.record_id, r.tag, r.code): (r.value, r.xref) for r in ex.collect()}
    assert rows[(2, "245", "a")] == ("Another", None)
    assert rows[(1, "650", "a")][1] == 1


def test_mrc_file_roundtrip(spark, bibs_df, tmp_root):
    path = str(tmp_root / "bibs_mrc")
    sources.write_mrc(bibs_df, path)
    back = sources.read_mrc(spark, path)
    assert back.count() == 2
    ex = mdf.explode_subfields(back)
    rows = {(r.record_id, r.tag, r.code): (r.value, r.xref) for r in ex.collect()}
    assert rows[(1, "245", "a")][0] == "This"
    assert rows[(2, "245", "a")][0] == "Another"
    # xrefs survive the mrc round trip via injected $0
    assert rows[(1, "650", "a")][1] == 1
    assert rows[(1, "710", "a")][1] == 2


def test_jsonl_roundtrip(spark, bibs_df, tmp_root):
    path = str(tmp_root / "bibs_jsonl")
    sources.write_jmarc_jsonl(bibs_df, path)
    back = sources.read_jmarc_jsonl(spark, path)
    assert back.count() == 2
    ids = sorted(r._id for r in back.select("_id").collect())
    assert ids == [1, 2]
