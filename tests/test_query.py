"""Query DSL predicate tests — result parity with the reference query
semantics (tests/test_marc.py query section patterns)."""

import pytest

from dlx_spark.marc import query as q
from dlx_spark.marc import dataframe as mdf


def ids(df, pred):
    return sorted(r._id for r in df.filter(pred).select("_id").collect())


@pytest.mark.slow
def test_condition_literal(spark, bibs_df, auth_index):
    pred = q.Condition("245", {"a": "This"}).compile(auth_index)
    assert ids(bibs_df, pred) == [1]
    pred = q.Condition("245", {"b": "is the"}).compile(auth_index)
    assert ids(bibs_df, pred) == [1, 2]
    pred = q.Condition("245", {"a": "This", "b": "is the"}).compile(auth_index)
    assert ids(bibs_df, pred) == [1]
    pred = q.Condition("245", {"a": "nope"}).compile(auth_index)
    assert ids(bibs_df, pred) == []


def test_condition_collation(spark, bibs_df, auth_index):
    # strength-1 collation: case/diacritic-insensitive equality
    pred = q.Condition("245", {"a": "this"}).compile(auth_index)
    assert ids(bibs_df, pred) == [1]
    pred = q.Condition("245", {"a": "THÍS"}).compile(auth_index)
    assert ids(bibs_df, pred) == [1]


def test_condition_auth_controlled(spark, bibs_df, auth_index):
    # 650$a is auth-controlled: value resolves via auth 150 headings
    pred = q.Condition("650", {"a": "Header"}, record_type="bib").compile(auth_index)
    assert ids(bibs_df, pred) == [1, 2]
    pred = q.Condition("710", {"a": "Another header"}, record_type="bib").compile(auth_index)
    assert ids(bibs_df, pred) == [1]
    pred = q.Condition("650", {"a": "No such"}, record_type="bib").compile(auth_index)
    assert ids(bibs_df, pred) == []
    # int value = xref directly
    pred = q.Condition("650", {"a": 1}, record_type="bib").compile(auth_index)
    assert ids(bibs_df, pred) == [1, 2]


def test_condition_modifiers(spark, bibs_df, auth_index):
    pred = q.Condition("710", modifier="exists").compile(auth_index)
    assert ids(bibs_df, pred) == [1]
    pred = q.Condition("710", modifier="not_exists").compile(auth_index)
    assert ids(bibs_df, pred) == [2]
    pred = q.Condition("245", {"a": "This"}, modifier="not").compile(auth_index)
    assert ids(bibs_df, pred) == [2]
    with pytest.raises(Exception):
        q.Condition("245", modifier="bogus")


def test_or(spark, bibs_df, auth_index):
    pred = q.Or(q.Condition("245", {"a": "This"}),
                q.Condition("245", {"a": "Another"})).compile(auth_index)
    assert ids(bibs_df, pred) == [1, 2]


def test_tag_only(spark, bibs_df, auth_index):
    pred = q.TagOnly("245", "title", record_type="bib").compile(auth_index)
    assert ids(bibs_df, pred) == [1, 2]
    # auth-controlled tag: matches via xref expansion
    pred = q.TagOnly("650", "Header", record_type="bib").compile(auth_index)
    assert ids(bibs_df, pred) == [1, 2]
    pred = q.TagOnly("650", "Header", record_type="bib", modifier="not").compile(auth_index)
    assert ids(bibs_df, pred) == []


@pytest.mark.slow
def test_text(spark, bibs_df, auths_df, auth_index):
    dim = mdf.auth_headings(auths_df)
    derived = mdf.derive_text_words(bibs_df, dim)

    assert ids(derived, q.Text("description").compile()) == [1]
    assert ids(derived, q.Text("title").compile()) == [1, 2]
    # stemming: 'titles' stems to 'titl' like 'title'
    assert ids(derived, q.Text("titles").compile()) == [1, 2]
    # negation
    assert ids(derived, q.Text("title -description").compile()) == [2]
    with pytest.raises(Exception):
        q.Text("-only -negations").compile()
    # phrase
    assert ids(derived, q.Text('"is the title"').compile()) == [1, 2]
    assert ids(derived, q.Text('"the is title"').compile()) == []
    # wildcard
    assert ids(derived, q.Text("descr*").compile()) == [1]
    # stopwords ignored
    assert ids(derived, q.Text("the title").compile()) == [1, 2]


def test_query_and(spark, bibs_df, auth_index):
    query = q.Query(q.Condition("245", {"b": "is the"}),
                    q.Condition("710", modifier="exists"))
    assert ids(bibs_df, query.compile(auth_index)) == [1]


def test_query_via_marcset(spark, bibs_df, auth_index):
    from dlx_spark.marc import BibSet
    result = BibSet.from_query(bibs_df, q.Condition("245", {"a": "This"}),
                               auth_index=auth_index)
    assert result.count == 1
    rec = next(iter(result))
    assert rec.get_value("245", "a") == "This"
