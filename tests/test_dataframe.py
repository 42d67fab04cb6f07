"""DataFrame transform tests against the canonical 2-bib/2-auth fixture."""

from pyspark.sql import functions as F

from dlx_spark.marc import dataframe as mdf

import pytest


def test_explode_subfields(spark, bibs_df):
    ex = mdf.explode_subfields(bibs_df)
    rows = {(r.record_id, r.tag, r.field_pos, r.code, r.sub_pos): (r.value, r.xref)
            for r in ex.collect()}
    assert rows[(1, "245", 0, "a", 0)] == ("This", None)
    assert rows[(1, "520", 0, "a", 0)] == ("Description", None)
    assert rows[(1, "520", 1, "a", 0)] == ("Another description", None)
    assert rows[(1, "520", 1, "a", 1)] == ("Repeated subfield", None)
    # linked subfields carry the resolved value as cache + the xref
    assert rows[(1, "650", 0, "a", 0)] == ("Header", 1)
    assert len([k for k in rows if k[0] == 2]) == 4  # 245 a,b,c + 650 a


def test_auth_headings(spark, auths_df):
    dim = mdf.auth_headings(auths_df)
    rows = {(r.auth_id, r.tag, r.code, r.lang): (r.value, r.norm) for r in dim.collect()}
    assert rows[(1, "150", "a", None)] == ("Header", "header")
    assert rows[(2, "110", "a", None)] == ("Another header", "another header")


@pytest.mark.slow
def test_resolve_values(spark, bibs_df, auths_df):
    dim = mdf.auth_headings(auths_df)
    resolved = mdf.resolve_values(bibs_df, dim)
    ex = mdf.explode_subfields(resolved)
    rows = {(r.record_id, r.tag, r.code): (r.value, r.xref)
            for r in ex.filter(F.col("tag").isin("650", "710")).collect()}
    assert rows[(1, "650", "a")] == ("Header", 1)
    assert rows[(1, "710", "a")] == ("Another header", 2)
    assert rows[(2, "650", "a")] == ("Header", 1)
    # resolution must preserve untouched fields and order
    r1 = resolved.filter(F.col("_id") == 1).select("datafields").first()[0]
    assert [f.tag for f in r1] == ["245", "520", "520", "650", "710"]
    assert [s.value for s in r1[1].subfields] == ["Description"]


def test_derive_text_words(spark, bibs_df, auths_df):
    dim = mdf.auth_headings(auths_df)
    out = mdf.derive_text_words(bibs_df, dim)
    r1 = out.filter(F.col("_id") == 1).select("text", "words").first()
    assert r1["text"].startswith(" ") and r1["text"].endswith(" ")
    assert "this is the title" in r1["text"]
    assert "header" in r1["text"]  # linked values resolved before derivation
    assert "titl" in r1["words"]
    assert "descript" in r1["words"]
    assert len(r1["words"]) == len(set(r1["words"]))


@pytest.mark.slow
def test_derive_logical_fields(spark, bibs_df, auths_df):
    dim = mdf.auth_headings(auths_df)
    out = mdf.derive_logical_fields(bibs_df, "bib", headings=dim)
    r1 = out.filter(F.col("_id") == 1).select("main_title", "title", "notes",
                                              "subject", "_record_type").first()
    assert list(r1["main_title"]) == ["This"]
    assert list(r1["title"]) == ["This is the"]
    assert list(r1["notes"]) == ["Description", "Another description Repeated subfield"]
    assert list(r1["subject"]) == ["Header"]
    assert list(r1["_record_type"]) == ["default", "bib"]
    r2 = out.filter(F.col("_id") == 2).select("main_title", "subject").first()
    assert list(r2["main_title"]) == ["Another"]
    assert list(r2["subject"]) == ["Header"]


def test_record_type_tagging(spark, bibs, auths_df):
    # a record with 089$b B22 is tagged as speech
    from dlx_spark.marc import Bib, BibSet
    doc = {"_id": 3, "089": [{"indicators": [" ", " "],
                              "subfields": [{"code": "b", "value": "B22"}]}]}
    df = BibSet.from_dicts([doc]).to_df(spark)
    out = mdf.derive_logical_fields(df, "bib")
    assert list(out.select("_record_type").first()[0]) == ["default", "bib", "speech"]


def test_auth_use_counts(spark, bibs_df):
    counts = {r.xref: r.bib_use_count for r in mdf.auth_use_counts(bibs_df).collect()}
    assert counts == {1: 2, 2: 1}


def test_in_use(spark, bibs_df):
    assert mdf.in_use(bibs_df, 1).count() == 2
    assert mdf.in_use(bibs_df, 2).count() == 1
    assert mdf.in_use(bibs_df, 99).count() == 0
