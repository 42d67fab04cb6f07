"""Record API tests mirroring the reference's addressing/auth semantics
(tests/test_marc.py patterns, re-derived from SURVEY §2.5)."""

import pytest

from dlx_spark.marc import (
    AmbiguousAuthValue,
    Auth,
    Bib,
    Diff,
    InvalidAuthValue,
    InvalidAuthXref,
)


def test_parse_and_get(bibs):
    recs = list(bibs)
    bib1 = recs[0]
    assert bib1.id == 1
    assert bib1.get_value("245", "a") == "This"
    assert bib1.get_value("245", "b") == "is the"
    assert bib1.get_values("245", "a", "b", "c") == ["This", "is the", "title"]
    assert bib1.get_value("000") == "leader"
    assert bib1.get_value("008") == "controlfield"


def test_repeated_tags_and_codes(bibs):
    bib1 = next(iter(bibs))
    assert bib1.get_value("520", "a", address=[0, 0]) == "Description"
    assert bib1.get_value("520", "a", address=[1, 0]) == "Another description"
    assert bib1.get_value("520", "a", address=[1, 1]) == "Repeated subfield"
    assert bib1.get_values("520", "a") == [
        "Description", "Another description", "Repeated subfield"]


def test_linked_value_resolution(bibs):
    bib1 = next(iter(bibs))
    # 650$a xref=1 resolves to auth 1's 150$a
    assert bib1.get_value("650", "a") == "Header"
    assert bib1.get_value("710", "a") == "Another header"
    assert bib1.get_xref("650", "a") == 1


def test_get_tags_and_xrefs(bibs):
    bib1 = next(iter(bibs))
    assert bib1.get_tags() == ["000", "008", "245", "520", "650", "710"]
    assert bib1.get_xrefs() == [1, 2]


def test_set_literal(bibs):
    bib1 = next(iter(bibs))
    bib1.set("245", "a", "Changed")
    assert bib1.get_value("245", "a") == "Changed"
    # append a new field instance
    bib1.set("245", "a", "Second", address=["+"])
    assert bib1.get_value("245", "a", address=[1, 0]) == "Second"


def test_set_auth_controlled_by_value(bibs, auth_index):
    bib1 = next(iter(bibs))
    bib1.set("650", "a", "Header")
    assert bib1.get_xref("650", "a") == 1
    with pytest.raises(InvalidAuthValue):
        bib1.set("650", "a", "No such heading")


def test_set_auth_controlled_by_xref(bibs):
    bib1 = next(iter(bibs))
    bib1.set("650", "a", 1)
    assert bib1.get_value("650", "a") == "Header"
    with pytest.raises(InvalidAuthXref):
        bib1.set("650", "a", 99)


def test_delete_field(bibs):
    bib1 = next(iter(bibs))
    bib1.delete_field("520", place=1)
    assert bib1.get_values("520", "a") == ["Description"]
    bib1.delete_fields("245")
    assert bib1.get_fields("245") == []


def test_validate(bibs):
    bib1 = next(iter(bibs))
    bib1.validate()
    bib1.fields[2].ind1 = "xx"  # 245
    with pytest.raises(ValueError):
        bib1.validate()


def test_to_dict_roundtrip(bib_docs, auth_index):
    bib = Bib(bib_docs[0], auth_index=auth_index)
    doc = bib.to_dict()
    assert doc["_id"] == 1
    assert doc["245"] == bib_docs[0]["245"]
    assert doc["650"] == [{"indicators": [" ", " "], "subfields": [{"code": "a", "xref": 1}]}]
    bib2 = Bib(doc, auth_index=auth_index)
    assert Diff(bib, bib2).a_only == []
    assert Diff(bib, bib2).b_only == []


def test_to_row_from_row_roundtrip(bib_docs, auth_index):
    bib = Bib(bib_docs[0], auth_index=auth_index)
    row = bib.to_row()
    assert row["_id"] == 1
    assert row["leader"] == "leader"
    back = Bib.from_row(row, auth_index=auth_index)
    assert back.get_value("245", "a") == "This"
    assert back.get_value("650", "a") == "Header"
    assert back.get_value("008") == "controlfield"


def test_auth_heading(auths):
    a1, a2 = list(auths)
    assert a1.heading_field.tag == "150"
    assert a1.heading_value("a") == "Header"
    assert a2.heading_field.tag == "110"


def test_logical_fields(bibs):
    bib1 = next(iter(bibs))
    lf = bib1.logical_fields()
    assert lf["main_title"] == ["This"]
    # 245 title group is 'abhnp' — $c is not part of the title logical field
    assert lf["title"] == ["This is the"]
    assert lf["notes"] == ["Description", "Another description Repeated subfield"]
    assert lf["subject"] == ["Header"]
    assert lf["_record_type"] == ["default", "bib"]


def test_text_and_words(bibs):
    bib1 = next(iter(bibs))
    text, words = bib1.text_and_words()
    assert text.startswith(" ") and text.endswith(" ")
    assert "this is the title" in text
    assert "titl" in words
    assert "descript" in words
    assert "header" in words  # resolved linked value included
    assert len(words) == len(set(words))


def test_diff(bib_docs, auth_index):
    a = Bib(bib_docs[0], auth_index=auth_index)
    b = Bib(bib_docs[1], auth_index=auth_index)
    d = Diff(a, b)
    a_only_tags = sorted({f.tag for f in d.a_only})
    assert a_only_tags == ["008", "245", "520", "710"]
    common_tags = sorted({f.tag for f in d.c})
    assert common_tags == ["000", "650"]
    assert d.different


def test_zmerge(bib_docs, auth_index):
    a = Bib(bib_docs[0], auth_index=auth_index)
    b = Bib(bib_docs[1], auth_index=auth_index)
    b.zmerge(a)
    # 245 kept from b; 520$a filled from a's first value only (zmerge
    # fills per (tag, code), it does not import repeated fields)
    assert b.get_value("245", "a") == "Another"
    assert b.get_values("520", "a") == ["Description"]
    assert b.get_value("008") == "controlfield"
    assert b.get_xref("710", "a") == 2


def test_xmerge():
    # mirrors the reference test scenario (tests/test_marc.py:690-703)
    bib1 = Bib().set("000", None, "leader").set("245", "a", "Title", auth_control=False)
    bib2 = Bib().set("000", None, "|eade|").set("269", "a", "Date", auth_control=False)
    bib1.zmerge(bib2)
    assert bib1.get_value("269", "a") == "Date"
    assert bib1.get_value("000") == "leader"

    bib2.set("269", "a", "New date", auth_control=False)
    bib1.xmerge(bib2, overwrite=False)
    assert bib1.get_value("269", "a") == "Date"
    bib1.xmerge(bib2, overwrite=True)
    assert bib1.get_value("269", "a") == "New date"


def test_bib_shortcuts(bib_docs, auth_index):
    bib = Bib(bib_docs[0], auth_index=auth_index)
    bib.set("191", "a", "A/RES/1", auth_control=False)
    bib.set("269", "a", "1999-12-31", auth_control=False)
    assert bib.symbol() == "A/RES/1"
    assert bib.title() == "This is the title"
    assert bib.date() == "1999-12-31"


def test_set_008(bib_docs, auth_index):
    bib = Bib(bib_docs[0], auth_index=auth_index)
    bib.set("269", "a", "1999-12-31", auth_control=False)
    bib.set_008(today="260813")
    v = bib.get_value("008")
    assert v[:6] == "260813"
    assert v[7:11] == "1999"
