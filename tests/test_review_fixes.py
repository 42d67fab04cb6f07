"""Regression tests for the code-review findings: OR-NOT semantics,
Vietnamese folding parity, phrase scrubbing, namespaced MARCXML, clear
compile() error, code-gated xref expansion, regex on controlled codes,
batch file import."""

from datetime import datetime

import pytest

T0, T1 = datetime(2026, 1, 1), datetime(2026, 1, 2)
from pyspark.sql import functions as F

from dlx_spark.marc import Bib, BibSet
from dlx_spark.marc import query as q


@pytest.mark.slow
def test_or_with_not_text_member(spark, bibs_df, auths_df, auth_index):
    from dlx_spark.marc import dataframe as mdf
    from dlx_spark.marc.parser import QueryContext, execute_query, parse_query_string
    headings = mdf.auth_headings(auths_df)
    derived = mdf.derive_text_words(bibs_df, headings)
    ctx = QueryContext(derived, "bib", auth_index=auth_index, headings=headings)
    # NOT 520__a:description ∪ 245__a:Another = {2} ∪ {2} = {2}
    query = parse_query_string("245__a:Another OR NOT 520__a:description",
                               record_type="bib", auth_index=auth_index)
    ids = sorted(r._id for r in execute_query(query, ctx).select("_id").collect())
    assert ids == [2]


def test_scrub_col_matches_python_scrub_vietnamese(spark):
    from dlx_spark.functions.tokenizer import scrub, scrub_col
    samples = ["Việt Nam", "São Tomé", "Côte d'Ivoire", "Plzeň", "İstanbul",
               "Nguyễn Thị Minh Khai", "Ħal Għaxaq"]
    df = spark.createDataFrame([(s,) for s in samples], "v string")
    jvm = [r.n for r in df.select(scrub_col(F.col("v")).alias("n")).collect()]
    py = [scrub(s) for s in samples]
    assert jvm == py


def test_condition_matches_vietnamese(spark, auth_index):
    docs = [{"_id": 5, "245": [{"indicators": [" ", " "],
                                "subfields": [{"code": "a", "value": "Việt Nam report"}]}]}]
    df = BibSet.from_dicts(docs).to_df(spark)
    pred = q.Condition("245", {"a": "Việt Nam report"}).compile(auth_index)
    assert df.filter(pred).count() == 1
    pred2 = q.Condition("245", {"a": "viet nam report"}).compile(auth_index)
    assert df.filter(pred2).count() == 1


def test_phrase_matches_punctuated_value(spark, auth_index):
    from dlx_spark.marc import dataframe as mdf
    from dlx_spark.marc.parser import QueryContext, execute_query, parse_query_string
    docs = [{"_id": 7, "520": [{"indicators": [" ", " "],
                                "subfields": [{"code": "a",
                                               "value": "right to self-determination of peoples"}]}]}]
    df = BibSet.from_dicts(docs).to_df(spark)
    ctx = QueryContext(df, "bib", auth_index=auth_index)
    query = parse_query_string('520__a:"self determination"', record_type="bib",
                               auth_index=auth_index)
    ids = [r._id for r in execute_query(query, ctx).select("_id").collect()]
    assert ids == [7]


def test_namespaced_marcxml_reader(spark, tmp_path):
    from dlx_spark import sources
    xml = ('<marc:collection xmlns:marc="http://www.loc.gov/MARC21/slim">'
           '<marc:record><marc:controlfield tag="001">31</marc:controlfield>'
           '<marc:datafield tag="245" ind1=" " ind2=" ">'
           '<marc:subfield code="a">Namespaced title</marc:subfield>'
           '</marc:datafield></marc:record>'
           '<marc:record><marc:controlfield tag="001">32</marc:controlfield>'
           '<marc:datafield tag="245" ind1=" " ind2=" ">'
           '<marc:subfield code="a">Second one</marc:subfield>'
           '</marc:datafield></marc:record></marc:collection>')
    p = tmp_path / "ns.xml"
    p.write_text(xml)
    df = sources.read_marcxml(spark, str(p))
    rows = {r._id for r in df.select("_id").collect()}
    assert rows == {31, 32}


def test_fielded_text_compile_raises_clearly(auth_index):
    from dlx_spark.marc.parser import parse_query_string
    query = parse_query_string("245__a:sometext", record_type="bib",
                               auth_index=auth_index)
    with pytest.raises(NotImplementedError, match="execute_query"):
        query.compile(auth_index)


@pytest.mark.slow
def test_xref_expansion_gated_by_code(spark, auth_index):
    """Fielded text on an UNcontrolled code of a controlled tag must not
    pull in records linked by xref (reference query.py:208-212)."""
    from dlx_spark.marc import dataframe as mdf
    from dlx_spark.marc.parser import QueryContext, execute_query, parse_query_string
    from dlx_spark.marc import AuthSet
    auths = AuthSet.from_dicts([
        {"_id": 1, "191": [{"indicators": [" ", " "],
                            "subfields": [{"code": "a", "value": "report"}]}]}])
    idx = auths.build_index()
    docs = [
        # literal 991$z match
        {"_id": 1, "991": [{"indicators": [" ", " "],
                            "subfields": [{"code": "z", "value": "report"}]}]},
        # xref link only (991$a controlled); $z doesn't match
        {"_id": 2, "991": [{"indicators": [" ", " "],
                            "subfields": [{"code": "a", "xref": 1}]}]},
    ]
    df = BibSet.from_dicts(docs, auth_index=idx).to_df(spark)
    ctx = QueryContext(df, "bib", auth_index=idx)
    query = parse_query_string("991__z:report", record_type="bib", auth_index=idx)
    ids = sorted(r._id for r in execute_query(query, ctx).select("_id").collect())
    assert ids == [1]  # record 2 must NOT appear
    # the controlled code DOES expand
    query2 = parse_query_string("991__a:report", record_type="bib", auth_index=idx)
    ids2 = sorted(r._id for r in execute_query(query2, ctx).select("_id").collect())
    assert 2 in ids2


def test_condition_regex_on_controlled_code(spark, bibs_df, auth_index):
    pred = q.Condition("650", {"a": q.Regex("^Head")}, record_type="bib").compile(auth_index)
    ids = sorted(r._id for r in bibs_df.filter(pred).select("_id").collect())
    assert ids == [1, 2]
    pred2 = q.Condition("650", {"a": q.Regex("^head", "i")}, record_type="bib").compile(auth_index)
    assert bibs_df.filter(pred2).count() == 2
    pred3 = q.Condition("650", {"a": q.Regex("^nomatch")}, record_type="bib").compile(auth_index)
    assert bibs_df.filter(pred3).count() == 0


@pytest.mark.slow
def test_file_import_batch(spark, tmp_path):
    from dlx_spark.files import FileExists, FileStore, Identifier
    fs = FileStore(spark, str(tmp_path / "fb"))
    items = [
        {"data": f"content {i}".encode(), "identifiers": [Identifier("isbn", str(i))],
         "languages": ["EN"], "mimetype": "t", "source": "batch"}
        for i in range(20)
    ]
    rows = fs.import_batch(items, now=datetime(2026, 1, 1))
    assert len(rows) == 20
    assert fs.df().count() == 20
    # duplicate inside a batch -> atomic failure
    with pytest.raises(FileExists):
        fs.import_batch([
            {"data": b"dup", "identifiers": [Identifier("i", "1")], "languages": ["EN"],
             "mimetype": "t", "source": "b"},
            {"data": b"dup", "identifiers": [Identifier("i", "1")], "languages": ["EN"],
             "mimetype": "t", "source": "b"},
        ])
    assert fs.df().count() == 20  # nothing written


@pytest.mark.slow
def test_store_auth_index_memoized(spark, tmp_path, auth_docs):
    from dlx_spark.marc import Auth
    from dlx_spark.marc.store import MarcStore
    st = MarcStore(spark, str(tmp_path / "whm"))
    st.commit([Auth(d) for d in auth_docs], now=datetime(2026, 1, 1))
    idx1 = st.auth_index()
    assert st.auth_index() is idx1          # memoized
    # commit keeps the cache coherent incrementally
    a3 = Auth({"_id": 3, "150": [{"indicators": [" ", " "],
                                  "subfields": [{"code": "a", "value": "Third"}]}]})
    st.commit([a3], now=datetime(2026, 1, 2))
    assert st.auth_index().lookup(3, "a") == "Third"
    # delete invalidates
    st.delete("auth", 3, now=datetime(2026, 1, 3))
    assert st.auth_index().lookup(3, "a") is None


def test_not_condition_with_literal_subfields(spark, auth_index):
    """NULL-poisoning: records with literal (xref=NULL) subfields must
    still match NOT conditions (three-valued-logic fix)."""
    docs = [
        {"_id": 1, "650": [{"indicators": [" ", " "],
                            "subfields": [{"code": "a", "xref": 1}]}]},
        {"_id": 2, "650": [{"indicators": [" ", " "],
                            "subfields": [{"code": "a", "value": "Local heading"}]}]},
        {"_id": 3, "245": [{"indicators": [" ", " "],
                            "subfields": [{"code": "a", "value": "No 650 at all"}]}]},
    ]
    df = BibSet.from_dicts(docs, auth_index=auth_index).to_df(spark)
    pred = q.Condition("650", {"a": "Header"}, record_type="bib",
                       modifier="not").compile(auth_index)
    ids = sorted(r._id for r in df.filter(pred).select("_id").collect())
    assert ids == [2, 3]
    # NOT xref: keeps literal-only records too
    from dlx_spark.marc.parser import parse_query_string
    pred2 = parse_query_string("NOT xref:99", record_type="bib",
                               auth_index=auth_index).compile(auth_index)
    assert df.filter(pred2).count() == 3


def test_wildcard_case_insensitive(spark, bibs_df, auth_index):
    from dlx_spark.marc import dataframe as mdf
    from dlx_spark.marc.parser import QueryContext, execute_query, parse_query_string
    ctx = QueryContext(bibs_df, "bib", auth_index=auth_index)
    query = parse_query_string("245__a:this*", record_type="bib",
                               auth_index=auth_index)
    ids = sorted(r._id for r in execute_query(query, ctx).select("_id").collect())
    assert ids == [1]  # 'This' matches lowercase wildcard (reference 'i' flag)


@pytest.mark.slow
def test_commit_failure_keeps_index_coherent(spark, tmp_path, auth_docs):
    from dlx_spark.marc import Auth
    from dlx_spark.marc.record import Datafield, Linked
    from dlx_spark.marc.store import MarcStore
    st = MarcStore(spark, str(tmp_path / "whf"))
    st.commit([Auth(d) for d in auth_docs], now=T0)

    bad = Auth({"_id": 1, "150": [{"indicators": [" ", " "],
                                   "subfields": [{"code": "a", "value": "New heading"}]}]})
    bad.fields.append(Datafield("550", " ", " ", [Linked("a", 999)], "auth"))
    with pytest.raises(Exception):
        st.commit([bad], now=T1)
    # index must reflect the TABLE (old heading), not the failed commit
    assert st.auth_index().lookup(1, "a") == "Header"


@pytest.mark.slow
def test_controlfield_only_record_keeps_empty_datafields(spark):
    from dlx_spark.marc import dataframe as mdf
    docs = [{"_id": 11, "008": ["controlfield only"]}]
    df = BibSet.from_dicts(docs).to_df(spark)
    dim_docs = [{"_id": 1, "150": [{"indicators": [" ", " "],
                                    "subfields": [{"code": "a", "value": "H"}]}]}]
    from dlx_spark.marc import AuthSet
    headings = mdf.auth_headings(AuthSet.from_dicts(dim_docs).to_df(spark))
    out = mdf.resolve_values(df, headings).first()
    assert out["datafields"] == []          # not NULL
    # and NOT-queries still see the record
    pred = q.Condition("650", {"a": "x"}, modifier="not").compile(None)
    assert mdf.resolve_values(df, headings).filter(pred).count() == 1


def test_logical_field_other_record_type_matches_nothing(spark, bibs_df, auth_index):
    from dlx_spark.marc.parser import QueryContext, execute_query, parse_query_string
    ctx = QueryContext(bibs_df, "bib", auth_index=auth_index)
    # 'thesaurus' is auth-only: must return empty, not AnalysisException
    query = parse_query_string("thesaurus:anything", record_type="bib",
                               auth_index=auth_index)
    assert execute_query(query, ctx).count() == 0


def test_import_batch_validates_before_upload(spark, tmp_path):
    from dlx_spark.files import FileExists, FileStore, Identifier
    uploaded = []
    fs = FileStore(spark, str(tmp_path / "fbv"),
                   uploader=lambda d, c, m: uploaded.append(c) or True)
    fs.import_from_binary(b"existing", identifiers=[Identifier("i", "0")],
                          languages=["EN"], mimetype="t", source="s",
                          now=datetime(2026, 1, 1))
    uploaded.clear()
    with pytest.raises(FileExists):
        fs.import_batch([
            {"data": b"fresh one", "identifiers": [Identifier("i", "1")],
             "languages": ["EN"], "mimetype": "t", "source": "s"},
            {"data": b"existing", "identifiers": [Identifier("i", "0")],
             "languages": ["EN"], "mimetype": "t", "source": "s"},
        ])
    assert uploaded == []  # nothing uploaded before the conflict surfaced


def test_every_contract_query_is_oracle_checked_or_whitelisted():
    """Coverage invariant: every queries() entry must have a DuckDB
    oracle; rows-only checks are reserved for the two genuinely
    non-SQL-expressible operators, each of which carries an
    oracle-checked companion (ivf_topk -> ivf_topk_exhaustive,
    pack_sequences -> pack_validity).  A new query added without an
    oracle fails here instead of silently weakening the gate."""
    from dlx_spark import contract

    rows_only_allowed = {"ivf_topk", "pack_sequences"}
    missing = set(contract.Q) - set(contract.ORACLE) - rows_only_allowed
    assert not missing, f"queries without oracle or whitelist entry: {sorted(missing)}"
    # same invariant over the full fine-grained battery behind the
    # merged driver entries
    missing = set(contract.BENCH) - set(contract.BENCH_ORACLE) - rows_only_allowed
    assert not missing, f"BENCH queries without oracle: {sorted(missing)}"
    # the whitelisted ops' companions must exist and be oracle-checked
    assert "ivf_topk_exhaustive" in contract.ORACLE
    assert "pack_validity" in contract.ORACLE


def test_driver_window_covers_every_oracle():
    """The driver's correctness gate checks the FIRST 50 queries() \
    entries.  Lock the registry to exactly 50 oracle-checked entries \
    followed by the two rows-only-by-design ones, so every oracle gets \
    a driver-side green row and nothing silently falls outside the \
    window again (round-2 verdict item #1)."""
    from dlx_spark import contract

    names = list(contract.Q)
    assert len(names) == 52
    in_window, outside = names[:50], names[50:]
    assert all(n in contract.ORACLE for n in in_window), \
        [n for n in in_window if n not in contract.ORACLE]
    assert outside == ["ivf_topk", "pack_sequences"]
    # oracle_sql() must expose exactly the in-window oracles
    assert set(contract.ORACLE) == set(in_window)


def test_bench_headline_set_is_frozen():
    """bench.py's headline set is the round-over-round comparability
    contract: the driver compares BENCH_r{N} totals across rounds, so
    adding/removing/reordering queries would silently change what the
    total measures.  New operators get scale evidence via
    tools/scale_probe.py instead."""
    import bench

    assert bench.HEADLINE == [
        "agg_summary", "multiway_join", "lookup_join", "latest_by_key",
        "topk_per_group", "sessionization", "asof_join", "range_join",
        "windowed_agg", "dedup_exact", "ngram_jaccard", "minhash_lsh",
        "simhash", "cosine_topk", "token_count", "quality_score",
        "multimodal_decode", "chunk_documents", "redact_pii",
    ]
