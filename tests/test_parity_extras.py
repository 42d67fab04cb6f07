"""Parity extras: partial lookup, revert, deleted-by-date, bib files
join, language-translated headings."""

from datetime import datetime

import pytest

from dlx_spark.marc import Auth, Bib
from dlx_spark.marc import dataframe as mdf

T0, T1, T2 = datetime(2026, 1, 1), datetime(2026, 2, 1), datetime(2026, 3, 1)


def test_partial_lookup(spark, auths_df):
    dim = mdf.auth_headings(auths_df)
    out = mdf.partial_lookup(dim, "head").collect()
    assert {r.auth_id for r in out} == {1, 2}
    out = mdf.partial_lookup(dim, "ANOTHER").collect()
    assert [r.auth_id for r in out] == [2]
    assert mdf.partial_lookup(dim, "zzz").count() == 0


@pytest.mark.slow
def test_from_aggregation(spark, bibs_df, auth_index):
    from dlx_spark.marc import BibSet
    # DataFrame form: arbitrary-pipeline escape hatch
    ms = BibSet.from_aggregation(bibs_df.filter("_id = 2"), auth_index=auth_index)
    assert [r.id for r in ms] == [2]
    # SQL form against a registered view
    bibs_df.createOrReplaceTempView("bibs_v")
    ms2 = BibSet.from_aggregation("SELECT * FROM bibs_v WHERE _id = 1",
                                  spark=spark, auth_index=auth_index)
    assert [r.id for r in ms2] == [1]
    with pytest.raises(ValueError, match="spark session required"):
        BibSet.from_aggregation("SELECT 1")


def test_auth_index_build_from_set(auths):
    # AuthSet.build_index is the Auth.build_cache analog: every heading
    # subfield resolvable without further lookups
    idx = auths.build_index()
    assert idx.lookup(1, "a") == "Header"
    assert idx.lookup(2, "a") == "Another header"
    assert idx.lookup(999, "a") is None
    assert idx.xlookup("150", "a", "Header") == [1]


def test_language_translated_heading(auth_docs):
    # auth 150 heading with French translation in tag 993
    doc = {
        "_id": 9,
        "150": [{"indicators": [" ", " "],
                 "subfields": [{"code": "a", "value": "Human rights"}]}],
        "993": [{"indicators": [" ", " "],
                 "subfields": [{"code": "a", "value": "Droits de l'homme"}]}],
    }
    auth = Auth(doc)
    assert auth.heading_value("a") == "Human rights"
    assert auth.heading_value("a", "fr") == "Droits de l'homme"
    assert auth.heading_value("a", "zz") is None


def test_translated_get_value():
    from dlx_spark.marc.record import AuthIndex
    idx = AuthIndex()
    idx.add(Auth({
        "_id": 9,
        "150": [{"indicators": [" ", " "],
                 "subfields": [{"code": "a", "value": "Human rights"}]}],
        "993": [{"indicators": [" ", " "],
                 "subfields": [{"code": "a", "value": "Droits de l'homme"}]}],
    }))
    bib = Bib({"_id": 1, "650": [{"indicators": [" ", " "],
                                  "subfields": [{"code": "a", "xref": 9}]}]},
              auth_index=idx)
    assert bib.get_value("650", "a") == "Human rights"
    assert bib.get_value("650", "a", language="fr") == "Droits de l'homme"


def test_auth_headings_language_rows(spark):
    from dlx_spark.marc import AuthSet
    docs = [{
        "_id": 9,
        "150": [{"indicators": [" ", " "],
                 "subfields": [{"code": "a", "value": "Human rights"}]}],
        "994": [{"indicators": [" ", " "],
                 "subfields": [{"code": "a", "value": "Derechos humanos"}]}],
    }]
    df = AuthSet.from_dicts(docs).to_df(spark)
    dim = mdf.auth_headings(df)
    rows = {(r.lang): r.value for r in dim.collect()}
    assert rows[None] == "Human rights"
    assert rows["es"] == "Derechos humanos"


@pytest.mark.slow
def test_revert(spark, tmp_path, auth_docs, bib_docs):
    from dlx_spark.marc.store import MarcStore
    st = MarcStore(spark, str(tmp_path / "wh"))
    st.commit([Auth(d) for d in auth_docs], now=T0)
    idx = st.auth_index()
    st.commit([Bib(bib_docs[0], auth_index=idx)], now=T0)

    b = st.get("bib", 1)
    b.set("245", "a", "v2 title", auth_control=False)
    st.commit([b], now=T1)
    assert st.get("bib", 1).get_value("245", "a") == "v2 title"

    st.revert("bib", 1, version=1, now=T2)
    assert st.get("bib", 1).get_value("245", "a") == "This"
    assert len(st.history("bib", 1)) == 3  # revert is itself a version
    with pytest.raises(Exception, match="no version"):
        st.revert("bib", 1, version=99)


@pytest.mark.slow
def test_find_deleted_by_date(spark, tmp_path, bib_docs):
    from dlx_spark.marc.store import MarcStore
    st = MarcStore(spark, str(tmp_path / "wh2"))
    recs = []
    for d in bib_docs:
        d = dict(d)
        d.pop("650", None), d.pop("710", None)
        recs.append(Bib(d))
    st.commit(recs, now=T0)
    st.delete("bib", 1, now=T1)
    st.delete("bib", 2, now=T2)
    assert st.find_deleted("bib").count() == 2
    assert [r.record_id for r in st.find_deleted("bib", date_from=T2).collect()] == [2]
    assert [r.record_id for r in st.find_deleted("bib", date_to=T2).collect()] == [1]


@pytest.mark.slow
def test_bib_files(spark, tmp_path):
    from dlx_spark.files import FileStore, Identifier
    from dlx_spark.marc import BibSet

    fstore = FileStore(spark, str(tmp_path / "files"))
    fstore.import_from_binary(b"old pdf", identifiers=[Identifier("symbol", "A/RES/1")],
                              languages=["EN"], mimetype="application/pdf",
                              source="s", now=T0)
    fstore.import_from_binary(b"new pdf", identifiers=[Identifier("symbol", "A/RES/1")],
                              languages=["EN"], mimetype="application/pdf",
                              source="s", now=T1)
    fstore.import_from_binary(b"fr pdf", identifiers=[Identifier("symbol", "A/RES/1")],
                              languages=["FR"], mimetype="application/pdf",
                              source="s", now=T0)

    docs = [{"_id": 1, "191": [{"indicators": [" ", " "],
                                "subfields": [{"code": "a", "value": "A/RES/1"}]}]}]
    bibs_df = BibSet.from_dicts(docs).to_df(spark)

    out = {(r.language): r for r in fstore.bib_files(bibs_df).collect()}
    assert out["EN"].timestamp == T1  # latest EN wins
    assert out["FR"].timestamp == T0
    only_fr = fstore.bib_files(bibs_df, language="FR").collect()
    assert len(only_fr) == 1


def test_natural_sort_key(spark):
    from dlx_spark.functions.tokenizer import natural_sort_key
    df = spark.createDataFrame(
        [("A/RES/10",), ("A/RES/2",), ("A/RES/1",), ("B/1",), ("a/res/3",)],
        "symbol string")
    ordered = [r.symbol for r in
               df.orderBy(natural_sort_key("symbol")).collect()]
    # numericOrdering: 1 < 2 < 3 < 10, case-insensitive
    assert ordered == ["A/RES/1", "A/RES/2", "a/res/3", "A/RES/10", "B/1"]


def test_import_from_url(spark, tmp_path):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from dlx_spark.files import FileStore, Identifier

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"url content payload")
        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        fstore = FileStore(spark, str(tmp_path / "files_url"))
        row = fstore.import_from_url(
            f"http://127.0.0.1:{srv.server_port}/f.bin",
            identifiers=[Identifier("isbn", "u1")], languages=["EN"],
            mimetype="application/octet-stream", source="url", now=T0)
        assert row["size"] == len(b"url content payload")
        assert fstore.from_id(row["_id"]) is not None
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_update_auth_use_counts(spark, tmp_path, auth_docs, bib_docs):
    from dlx_spark.marc.store import MarcStore
    st = MarcStore(spark, str(tmp_path / "wh3"))
    st.commit([Auth(d) for d in auth_docs], now=T0)
    idx = st.auth_index()
    st.commit([Bib(d, auth_index=idx) for d in bib_docs], now=T0)
    counts = {r.auth_id: r.bib_use_count for r in st.update_auth_use_counts().collect()}
    assert counts == {1: 2, 2: 1}


# --- deprecated matcher shims + auth facade (reference parity round 2) ---

@pytest.mark.slow
def test_deprecated_matcher_shims(spark, bibs_df, auth_index):
    import warnings
    from dlx_spark.marc import Bib
    from dlx_spark.marc.query import Condition

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rec = Bib.match_id(bibs_df, 1, auth_index=auth_index)
        assert rec.id == 1
        recs = list(Bib.match_ids(bibs_df, 1, 2, auth_index=auth_index))
        assert sorted(r.id for r in recs) == [1, 2]
        found = list(Bib.find(bibs_df, Condition("245", {"a": "This"}),
                              auth_index=auth_index))
        assert [r.id for r in found] == [1]
        one = Bib.find_one(bibs_df, Condition("245", {"a": "This"}),
                           auth_index=auth_index)
        assert one.id == 1
        depr = [x for x in w if issubclass(x.category, DeprecationWarning)
                and "deprecated" in str(x.message)]
        assert len(depr) >= 4    # one per shim call


def test_subfield_is_linked():
    from dlx_spark.marc.record import Linked, Literal, Subfield
    assert Linked.is_linked() is True
    assert Literal.is_linked() is False
    assert Subfield.is_linked() is False


@pytest.mark.slow
def test_auth_facade_in_use_and_list_attached(spark, tmp_path, auth_docs, bib_docs):
    from dlx_spark.marc import Auth, Bib
    from dlx_spark.marc.store import MarcStore

    store = MarcStore(spark, str(tmp_path / "wh_facade"))
    store.commit([Auth(d) for d in auth_docs], user="s")
    idx = store.auth_index()
    store.commit([Bib(d, auth_index=idx) for d in bib_docs], user="s")

    a1 = store.get("auth", 1)
    assert a1.in_use(store) == 2                      # both bibs use auth 1
    assert a1.in_use(store, usage_type="bib") == 2
    assert a1.in_use(store, usage_type="auth") == 0
    attached = a1.list_attached(store, "bib")
    assert sorted(r.id for r in attached) == [1, 2]

    # build_cache returns the memoized index
    assert Auth.build_cache(store) is store.auth_index()

    # partial_lookup resolves through the bib field's source tag
    pairs = Auth.partial_lookup(store.headings(), "650", "a", "head",
                                record_type="bib")
    assert (("Header", 1) in pairs) or any(x == 1 for _, x in pairs)


@pytest.mark.slow
def test_deleted_by_date_generator(spark, tmp_path, auth_docs, bib_docs):
    from datetime import datetime
    from dlx_spark.marc import Auth, Bib
    from dlx_spark.marc.store import MarcStore

    t0 = datetime(2026, 1, 1)
    t1 = datetime(2026, 1, 5)
    store = MarcStore(spark, str(tmp_path / "wh_dbd"))
    store.commit([Auth(d) for d in auth_docs], user="s", now=t0)
    idx = store.auth_index()
    store.commit([Bib(d, auth_index=idx) for d in bib_docs], user="s", now=t0)
    store.delete("bib", 2, user="d", now=t1)
    assert list(store.deleted_by_date("bib", datetime(2026, 1, 4))) == [2]
    assert list(store.deleted_by_date("bib", datetime(2026, 1, 6))) == []


@pytest.mark.slow
def test_bib_files_facade(spark, tmp_path, auth_docs, bib_docs):
    from dlx_spark.files import FileStore, Identifier
    from dlx_spark.marc import Bib

    fs = FileStore(spark, str(tmp_path / "files_facade"))
    fs.import_from_binary(b"doc-en", identifiers=[Identifier("symbol", "A/1")],
                          languages=["EN"], mimetype="text/plain", source="t")
    fs.import_from_binary(b"doc-fr", identifiers=[Identifier("symbol", "A/1")],
                          languages=["FR"], mimetype="text/plain", source="t")

    bib = Bib({"_id": 9, "191": [{"indicators": [" ", " "],
                                  "subfields": [{"code": "a", "value": "A/1"}]}]})
    uris = bib.files(fs)
    assert len(uris) == 2
    assert bib.file(fs, "EN") is not None
    assert bib.file(fs, "ES") is None


@pytest.mark.slow
def test_auth_deleted_subfield_sequence(spark, tmp_path):
    """Reference regression sequence (tests/test_marc.py:1148-1159): an
    auth loses a heading subfield, recommits, and an attached bib then
    updates — formerly an error in the reference; must stay clean."""
    from dlx_spark.marc import Auth, Bib
    from dlx_spark.marc.query import Query
    from dlx_spark.marc.store import MarcStore

    store = MarcStore(spark, str(tmp_path / "wh_delsub"))
    auth = Auth().set("110", "a", "will NOT be deleted", auth_control=False) \
                 .set("110", "z", "will be deleted", auth_control=False)
    store.commit([auth])
    idx = store.auth_index()
    bib = Bib(auth_index=idx).set("710", "a", auth.id).set("710", "z", auth.id)
    store.commit([bib])

    auth2 = store.get("auth", auth.id)
    auth2.heading_field.delete_subfield("z")
    store.commit([auth2])
    bib2 = store.get("bib", bib.id)
    bib2.set("999", "a", "updated", auth_control=False)
    store.commit([bib2])            # must not raise

    q = Query.from_string('710:"will not be deleted"')
    assert q is not None


@pytest.mark.slow
def test_non_controlled_linked_subfield(spark, tmp_path):
    """Reference tests/test_marc.py:1161-1180: a Linked subfield on a
    NON-auth-controlled code resolves to no value and fails validation.
    Divergence (documented): the reference's Mongo round trip silently
    DROPS the null-valued subfield; here the xref is preserved on an
    unvalidated commit — data is never silently lost."""
    import pytest as _pytest

    from dlx_spark import config
    from dlx_spark.marc import Auth, Bib
    from dlx_spark.marc.record import Datafield, Linked
    from dlx_spark.marc.store import MarcStore

    assert config.is_authority_controlled("bib", "710", "9") is False

    store = MarcStore(spark, str(tmp_path / "wh_nonauth"))
    a = Auth().set("110", "a", "Corp name", auth_control=False)
    store.commit([a])
    idx = store.auth_index()

    bib = Bib(auth_index=idx)
    bib.fields.append(Datafield("710", " ", " ",
                                [Linked("a", a.id, auth_index=idx),
                                 Linked("9", a.id, auth_index=idx)], "bib"))
    assert bib.get_value("710", "a")
    assert not bib.get_value("710", "9")       # no heading $9 -> no value

    store.commit([bib], auth_check=False)      # unvalidated commit works
    back = store.get("bib", bib.id)
    assert back.get_field("710") is not None

    from dlx_spark.marc.store import InvalidNonAuthField
    with _pytest.raises(InvalidNonAuthField):
        store.commit([store.get("bib", bib.id)], auth_check=True)


def test_xml_encoding_non_ascii():
    """Reference tests/test_marc.py:811-817: non-ASCII survives to_xml."""
    from dlx_spark.marc import Bib

    bib = Bib().set("245", "a", "Title with an é", auth_control=False)
    xml = bib.to_xml(write_id=False)
    assert "Title with an é" in xml
