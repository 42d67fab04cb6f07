"""Heading-dimension broadcast gate (r11, VERDICT task 2).

``resolve_values`` / ``subfield_token_rows`` / the parser's auth
expansion force-broadcast the heading dimension — correct while it is
dimension-sized, a driver-OOM cliff once translations multiply a 5M-row
auth table.  ``MarcStore.headings_hint()`` gates the forced hint on a
footer-only auths row estimate (the same shape as
``MergeOnReadTable.BROADCAST_MAX_DELTA_ROWS``); above the ceiling the
joins run unhinted and AQE picks the strategy, with identical results.
"""

from datetime import datetime

import pytest

from dlx_spark.marc import Auth, Bib
from dlx_spark.marc import dataframe as mdf
from dlx_spark.marc.store import MarcStore

T0 = datetime(2026, 1, 1, 12, 0, 0)


@pytest.fixture
def store(spark, tmp_path, auth_docs, bib_docs):
    st = MarcStore(spark, str(tmp_path / "warehouse"))
    st.commit([Auth(d) for d in auth_docs], user="seeder", now=T0)
    idx = st.auth_index()
    st.commit([Bib(d, auth_index=idx) for d in bib_docs],
              user="seeder", now=T0)
    return st


def _analyzed(df):
    return df._jdf.queryExecution().analyzed().toString()


def _rows(df):
    return sorted(map(tuple, df.select(
        "record_id", "tag", "code", "value").collect()))


@pytest.mark.slow
def test_hint_present_and_absent_identical_results(store):
    assert store.headings_hint() is True
    hinted = mdf.subfield_token_rows(store.bibs(), "bib",
                                     headings=store.headings())
    unhinted = mdf.subfield_token_rows(store.bibs(), "bib",
                                       headings=store.headings(),
                                       hint=False)
    # the config-sized language dim keeps its (justified) hint either
    # way; the DIMENSION hint is the one the gate must drop
    assert (_analyzed(hinted).count("ResolvedHint")
            == _analyzed(unhinted).count("ResolvedHint") + 1)
    assert _rows(hinted) == _rows(unhinted)

    # resolve_values: same gate, same results
    r_hint = mdf.resolve_values(store.bibs(), store.headings())
    r_none = mdf.resolve_values(store.bibs(), store.headings(), hint=False)
    assert (_analyzed(r_hint).count("ResolvedHint")
            == _analyzed(r_none).count("ResolvedHint") + 1)
    a = sorted(r["_id"] for r in r_hint.select("_id").collect())
    b = sorted(r["_id"] for r in r_none.select("_id").collect())
    assert a == b


@pytest.mark.slow
def test_gate_flips_on_ceiling_and_search_stays_correct(store):
    # baseline (hinted) search answers
    want_text = sorted(r["_id"] for r in
                       store.search("bib", "650__a:header").collect())
    assert want_text, "fixture must have auth-linked 650s"

    # force the gate off: ceiling below the store's auth count
    store.HEADINGS_BROADCAST_MAX_AUTHS = 0
    store._headings_hint_memo = None
    assert store.headings_hint() is False
    store._invalidate_query_contexts()
    got = sorted(r["_id"] for r in
                 store.search("bib", "650__a:header").collect())
    assert got == want_text

    # the gated context's token derive carries no forced hint
    ctx = store._query_context("bib")
    assert ctx.headings_hint is False

    # commit still works gated (derive_text_words path) and re-derives
    # identical search columns
    rec = store.get("bib", 1)
    rec.set("245", "a", "Gated commit", auth_control=False)
    store.commit([rec], user="g", auth_check=False)
    assert "gated" in store.get("bib", 1).text


def test_estimate_memo_invalidated_by_auth_writes(store):
    assert store.headings_hint() is True
    assert store._headings_hint_memo is True
    # lower the ceiling: the memoized True must NOT survive an auth
    # write (the write may itself re-derive the memo on demand — what
    # matters is that it re-evaluates against the current table)
    store.HEADINGS_BROADCAST_MAX_AUTHS = 0
    a = store.get("auth", 1)
    a.set("100", "a", "Touched")
    store.commit([a], user="e", update_attached=False)
    assert store.headings_hint() is False
