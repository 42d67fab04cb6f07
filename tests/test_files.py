"""File store tests (reference tests/test_file.py patterns)."""

from datetime import datetime

import pytest

from dlx_spark.files import (
    FileExists,
    FileExistsIdentifierConflict,
    FileExistsLanguageConflict,
    FileStore,
    Identifier,
    encode_fn,
)

T0 = datetime(2026, 1, 1)
T1 = datetime(2026, 1, 2)


@pytest.fixture
def fstore(spark, tmp_path):
    return FileStore(spark, str(tmp_path / "files"))


def test_import_and_identity(fstore):
    row = fstore.import_from_binary(
        b"some data", identifiers=[Identifier("isbn", "x")],
        languages=["EN"], mimetype="text/plain", source="test", now=T0)
    assert row["_id"] == __import__("hashlib").md5(b"some data").hexdigest()
    assert row["size"] == 9
    assert fstore.from_id(row["_id"])["source"] == "test"


def test_conflict_rules(fstore):
    fstore.import_from_binary(b"same content", identifiers=[Identifier("isbn", "x")],
                              languages=["EN"], mimetype="text/plain",
                              source="test", now=T0)
    # exact repeat
    with pytest.raises(FileExists):
        fstore.import_from_binary(b"same content", identifiers=[Identifier("isbn", "x")],
                                  languages=["EN"], mimetype="text/plain",
                                  source="test", now=T1)
    # new identifier for same checksum
    with pytest.raises(FileExistsIdentifierConflict):
        fstore.import_from_binary(b"same content", identifiers=[Identifier("isbn", "y")],
                                  languages=["EN"], mimetype="text/plain",
                                  source="test", now=T1)
    # different language set
    with pytest.raises(FileExistsLanguageConflict):
        fstore.import_from_binary(b"same content", identifiers=[Identifier("isbn", "x")],
                                  languages=["EN", "FR"], mimetype="text/plain",
                                  source="test", now=T1)
    # overwrite bypasses the checks
    fstore.import_from_binary(b"same content", identifiers=[Identifier("isbn", "y")],
                              languages=["FR"], mimetype="text/plain",
                              source="test", overwrite=True, now=T1)
    assert fstore.df().count() == 1


def test_find_by_identifier_case_insensitive(fstore):
    fstore.import_from_binary(b"doc1", identifiers=[Identifier("symbol", "A/RES/1")],
                              languages=["EN"], mimetype="text/plain",
                              source="test", now=T0)
    out = fstore.find_by_identifier(Identifier("symbol", "a/res/1")).collect()
    assert len(out) == 1
    assert fstore.find_by_identifier(Identifier("symbol", "a/res/1"),
                                     case_insensitive=False).count() == 0


def test_latest_by_identifier_language(fstore):
    fstore.import_from_binary(b"v1", identifiers=[Identifier("symbol", "A/1")],
                              languages=["EN"], mimetype="t", source="s", now=T0)
    fstore.import_from_binary(b"v2", identifiers=[Identifier("symbol", "A/1")],
                              languages=["EN"], mimetype="t", source="s", now=T1)
    latest = fstore.latest_by_identifier_language(Identifier("symbol", "A/1"), "EN")
    assert latest["timestamp"] == T1

    per_key = fstore.latest_per_identifier_language().collect()
    assert len(per_key) == 1
    assert per_key[0]["timestamp"] == T1


def test_find_by_date(fstore):
    fstore.import_from_binary(b"old", identifiers=[Identifier("i", "1")],
                              languages=["EN"], mimetype="t", source="s", now=T0)
    fstore.import_from_binary(b"new", identifiers=[Identifier("i", "2")],
                              languages=["EN"], mimetype="t", source="s", now=T1)
    assert fstore.find_by_date(T0, T1).count() == 1
    assert fstore.find_by_date(T0).count() == 2


def test_encode_fn():
    assert encode_fn(["A/RES/1"], ["en"], "pdf") == "A_RES_1-EN.pdf"
    assert encode_fn("S [2020]*x:y;z", "fr", "txt") == "S_^2020^!x#y%z-FR.txt"
    with pytest.raises(AssertionError):
        encode_fn(["x"], ["zz"], "pdf")
