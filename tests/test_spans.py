"""Unit tests for corpus-level segment/span dedup (operators/spans.py):
C4-style repeated-segment removal and Lee-et-al duplicated-span
profiling, pinned on hand-computed micro-corpora."""

import pytest

from dlx_spark.operators import spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------

def test_segment_dedup_first_occurrence_wins_across_docs(spark):
    df = _docs(spark, [
        (1, "a b c d e f"),        # segs: "a b c", "d e f"
        (2, "a b c x y z"),        # "a b c" duplicates doc 1 seg 0
        (3, "a b c"),              # fully deduplicated away
    ])
    out = {r["doc_id"]: r for r in
           spans.segment_dedup(df, unit_words=3, normalize=False).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["cleaned_text"] == "a b c d e f"
    assert out[2]["n_kept"] == 1 and out[2]["cleaned_text"] == "x y z"
    assert out[3]["n_kept"] == 0 and out[3]["cleaned_text"] == ""
    assert out[3]["n_words_kept"] == 0 and out[3]["n_segments"] == 1


def test_segment_dedup_within_doc_repeat_keeps_first(spark):
    df = _docs(spark, [(1, "a b c a b c a b")])
    row = spans.segment_dedup(df, unit_words=3, normalize=False).collect()[0]
    # segments: "a b c"(0), "a b c"(1) -> cut, "a b"(2, short tail)
    assert row["n_segments"] == 3 and row["n_kept"] == 2
    assert row["cleaned_text"] == "a b c a b"
    assert row["n_words_kept"] == 5


def test_segment_dedup_normalize_folds_case_and_punct(spark):
    df = _docs(spark, [(1, "Alpha, Beta! Gamma"), (2, "alpha beta gamma")])
    out = {r["doc_id"]: r for r in
           spans.segment_dedup(df, unit_words=3).collect()}
    # normalized segments collide; doc 1 (earlier id) keeps its copy
    assert out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == 0


def test_segment_dedup_skips_whitespace_only_docs(spark):
    df = _docs(spark, [(1, "a b"), (2, "   "), (3, "")])
    rows = spans.segment_dedup(df, unit_words=2, normalize=False).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_segment_dedup_rejects_bad_unit():
    with pytest.raises(ValueError):
        spans.segment_dedup(None, unit_words=0)


# ---------------------------------------------------------------------------
# duplicate_spans
# ---------------------------------------------------------------------------

def test_duplicate_spans_overlapping_windows_merge(spark):
    df = _docs(spark, [
        (1, "p q r s t u"),
        (2, "p q r s t x"),
    ])
    out = {r["doc_id"]: r for r in
           spans.duplicate_spans(df, k=3, normalize=False).collect()}
    # shared windows at pos 0,1,2 merge into one span of 5 words
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["dup_words"] == 5
        assert out[d]["dup_fraction"] == pytest.approx(round(5 / 6, 4))


def test_duplicate_spans_adjacent_merge_and_gap_split(spark):
    df = _docs(spark, [
        (4, "m m m n n n"),        # shared windows at pos 0 and 3: adjacent
        (5, "m m m q n n n"),      # shared windows at pos 0 and 4: gapped
    ])
    out = {r["doc_id"]: r for r in
           spans.duplicate_spans(df, k=3, normalize=False).collect()}
    assert out[4]["n_dup_spans"] == 1 and out[4]["dup_words"] == 6
    assert out[4]["dup_fraction"] == 1.0
    assert out[5]["n_dup_spans"] == 2 and out[5]["dup_words"] == 6
    assert out[5]["dup_fraction"] == pytest.approx(round(6 / 7, 4))


def test_duplicate_spans_short_docs_report_zero(spark):
    df = _docs(spark, [(1, "p q"), (2, "p q r s"), (3, "p q r s")])
    out = {r["doc_id"]: r for r in
           spans.duplicate_spans(df, k=3, normalize=False).collect()}
    assert out[1]["n_dup_spans"] == 0 and out[1]["dup_fraction"] == 0.0
    assert out[2]["dup_words"] == 4 and out[3]["dup_words"] == 4


def test_duplicate_spans_within_doc_repeat_not_counted(spark):
    # "a b c" repeats inside doc 1 only: no second DOC contains it
    df = _docs(spark, [(1, "a b c z a b c"), (2, "q r s t u")])
    out = {r["doc_id"]: r for r in
           spans.duplicate_spans(df, k=3, min_docs=2,
                                 normalize=False).collect()}
    assert out[1]["n_dup_spans"] == 0
    assert out[2]["n_dup_spans"] == 0


def test_duplicate_spans_min_docs_three_uses_distinct_count(spark):
    """min_docs>2 exercises the count_distinct branch: a window shared
    by only two docs no longer qualifies."""
    df = _docs(spark, [
        (1, "p q r s"), (2, "p q r t"), (3, "p q r u"),   # "p q r" in 3 docs
        (4, "x y z w"), (5, "x y z v"),                   # "x y z" in 2 docs
    ])
    out = {r["doc_id"]: r for r in
           spans.duplicate_spans(df, k=3, min_docs=3,
                                 normalize=False).collect()}
    assert out[1]["dup_words"] == 3 and out[3]["dup_words"] == 3
    assert out[4]["dup_words"] == 0 and out[5]["dup_words"] == 0
    cut = {r["doc_id"]: r for r in
           spans.cut_duplicate_spans(df, k=3, min_docs=3,
                                     normalize=False).collect()}
    assert cut[1]["n_words_cut"] == 0          # first occurrence kept
    assert cut[2]["n_words_cut"] == 3 and cut[3]["n_words_cut"] == 3
    assert cut[4]["n_words_cut"] == 0


def test_duplicate_spans_rejects_min_docs_below_two():
    with pytest.raises(ValueError):
        spans.duplicate_spans(None, min_docs=1)


# ---------------------------------------------------------------------------
# cut_duplicate_spans
# ---------------------------------------------------------------------------

def test_cut_keep_first_preserves_earliest_copy(spark):
    df = _docs(spark, [
        (1, "p q r s t"),
        (2, "z p q r y"),
    ])
    out = {r["doc_id"]: r for r in
           spans.cut_duplicate_spans(df, k=3, normalize=False).collect()}
    assert out[1]["n_words_cut"] == 0
    assert out[1]["cleaned_text"] == "p q r s t"
    assert out[2]["n_words_cut"] == 3
    assert out[2]["cleaned_text"] == "z y"


def test_cut_everywhere_when_keep_first_disabled(spark):
    df = _docs(spark, [
        (1, "p q r s t"),
        (2, "z p q r y"),
    ])
    out = {r["doc_id"]: r for r in
           spans.cut_duplicate_spans(df, k=3, keep_first=False,
                                     normalize=False).collect()}
    assert out[1]["cleaned_text"] == "s t" and out[1]["n_words_cut"] == 3
    assert out[2]["cleaned_text"] == "z y"


def test_cut_overlapping_cut_positions_counted_once(spark):
    df = _docs(spark, [
        (1, "p q r s t u"),
        (2, "p q r s t x"),
    ])
    out = {r["doc_id"]: r for r in
           spans.cut_duplicate_spans(df, k=3, normalize=False).collect()}
    # doc 2 loses the merged 5-position span exactly once
    assert out[1]["n_words_cut"] == 0
    assert out[2]["n_words_cut"] == 5
    assert out[2]["cleaned_text"] == "x"


def test_cut_text_survives_somewhere_with_keep_first(spark):
    """keep_first guarantees every duplicated window's content still
    exists in at least one cleaned document."""
    df = _docs(spark, [
        (1, "h i j k l"),
        (2, "h i j k l"),
        (3, "h i j z z"),
    ])
    out = spans.cut_duplicate_spans(df, k=3, normalize=False).collect()
    cleaned = {r["doc_id"]: r["cleaned_text"] for r in out}
    assert cleaned[1] == "h i j k l"     # first copy intact
    assert cleaned[2] == ""              # later full dup fully cut
    assert cleaned[3] == "z z"


# ---------------------------------------------------------------------------
# consistency between the profile and the cut
# ---------------------------------------------------------------------------

def test_profile_and_cut_agree_on_marked_positions(spark):
    """cut(keep_first=False) removes exactly the positions
    duplicate_spans reports as duplicated (same windows, same merge)."""
    df = _docs(spark, [
        (1, "p q r s t u"),
        (2, "p q r s t x"),
        (3, "u v w x y z"),
    ])
    prof = {r["doc_id"]: r for r in
            spans.duplicate_spans(df, k=3, normalize=False).collect()}
    cut = {r["doc_id"]: r for r in
           spans.cut_duplicate_spans(df, k=3, keep_first=False,
                                     normalize=False).collect()}
    for d in (1, 2, 3):
        assert prof[d]["dup_words"] == cut[d]["n_words_cut"]


# ---------------------------------------------------------------------------
# quality-aware near-dedup survivor rule (dedup.dedup_near_by_priority)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_dedup_near_by_priority_keeps_best_copy(spark):
    from dlx_spark.operators import dedup
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, "x", 5.0), (3, "x", 1.0),   # cluster {1,2,3}
         (7, "y", 0.5), (8, "y", 0.5),                  # tie -> min id
         (9, "z", None), (10, "z", 0.1),                # NULL loses
         (42, "solo", 9.9)],                            # in no pair
        "doc_id long, text string, quality double")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 10)], "id_a long, id_b long")
    got = sorted(r["doc_id"] for r in dedup.dedup_near_by_priority(
        df, pairs, "quality").collect())
    assert got == [2, 7, 10, 42]
    # baseline rule would keep min ids instead
    base = sorted(r["doc_id"] for r in dedup.dedup_near(df, pairs).collect())
    assert base == [1, 7, 9, 42]


# ---------------------------------------------------------------------------
# randomized model equivalence: tiny alphabet forces heavy collisions
# ---------------------------------------------------------------------------

def _model_segment_dedup(rows, unit):
    import math
    seen, out = set(), {}
    for doc_id, text in sorted(rows):
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            continue
        n = math.ceil(len(toks) / unit)
        kept = []
        for i in range(n):
            seg = " ".join(toks[i * unit:(i + 1) * unit])
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        cleaned = " ".join(kept)
        out[doc_id] = (n, len(kept), cleaned,
                       len(cleaned.split(" ")) if cleaned else 0)
    return out


def _model_dup_spans(rows, k):
    wins: dict[str, set] = {}
    toks_of = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            continue
        toks_of[doc_id] = toks
        for pos in range(len(toks) - k + 1):
            wins.setdefault(" ".join(toks[pos:pos + k]), set()).add(doc_id)
    dup = {wt for wt, docs in wins.items() if len(docs) >= 2}
    out = {}
    for doc_id, toks in toks_of.items():
        hits = [p for p in range(len(toks) - k + 1)
                if " ".join(toks[p:p + k]) in dup]
        spans_, last_end = [], None
        for p in hits:
            if last_end is None or p > last_end:
                spans_.append([p, p + k])
            else:
                spans_[-1][1] = max(spans_[-1][1], p + k)
            last_end = spans_[-1][1]
        dw = sum(e - s for s, e in spans_)
        out[doc_id] = (len(toks), len(spans_), dw,
                       round(dw / len(toks), 4))
    return out


@pytest.mark.slow
def test_segment_dedup_matches_python_model_on_random_corpora(spark):
    import random
    for seed in range(6):
        rng = random.Random(seed)
        unit = rng.randint(1, 4)
        rows = [(i, " ".join(rng.choice("ab c".split() + ["d"])
                             for _ in range(rng.randint(0, 12))))
                for i in range(rng.randint(2, 25))]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_segments"], r["n_kept"],
                             r["cleaned_text"], r["n_words_kept"])
               for r in spans.segment_dedup(
                   df, unit_words=unit, normalize=False).collect()}
        want = _model_segment_dedup(rows, unit)
        assert got == want, f"seed={seed} unit={unit}"


@pytest.mark.slow
def test_duplicate_spans_matches_python_model_on_random_corpora(spark):
    import random
    for seed in range(6):
        rng = random.Random(100 + seed)
        k = rng.randint(1, 3)
        rows = [(i, " ".join(rng.choice(["a", "b", "c"])
                             for _ in range(rng.randint(1, 12))))
                for i in range(rng.randint(2, 20))]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_words"], r["n_dup_spans"],
                             r["dup_words"], r["dup_fraction"])
               for r in spans.duplicate_spans(
                   df, k=k, normalize=False).collect()}
        want = _model_dup_spans(rows, k)
        assert got == want, f"seed={seed} k={k}"


# ---------------------------------------------------------------------------
# hashed linear classifier scoring (textstats.hashed_classifier_score)
# ---------------------------------------------------------------------------

def _py_hash60(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_classifier_score_matches_python_model(spark):
    from dlx_spark.operators import textstats
    rows = [(1, "a b c"), (2, "a a"), (3, "zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_b = 64
    weights = textstats.seeded_classifier_weights(spark, n_b)
    got = {r["doc_id"]: r for r in textstats.hashed_classifier_score(
        df, weights, n_b, bias=0.25, normalize=False).collect()}

    def w_of(tok):
        b = _py_hash60(tok + "clf") % n_b
        return ((_py_hash60(str(b) + "w") % 2001) - 1000) / 1024.0

    import math
    for doc_id, text in rows:
        toks = text.split()
        lin = sum(w_of(t) for t in toks) / len(toks) + 0.25
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["clf_linear"] == pytest.approx(lin)
        assert got[doc_id]["clf_score"] == pytest.approx(
            1 / (1 + math.exp(-lin)))


def test_classifier_unseen_buckets_score_zero(spark):
    from dlx_spark.operators import textstats
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    empty_weights = spark.createDataFrame([], "bucket long, weight double")
    row = textstats.hashed_classifier_score(
        df, empty_weights, 16, normalize=False).collect()[0]
    assert row["clf_linear"] == 0.0 and row["clf_score"] == 0.5


def test_classifier_broadcast_gate_preserves_results(spark, monkeypatch):
    """Above the gate the forced broadcast hint is dropped but results
    are identical (the engine-wide size-gate contract)."""
    from dlx_spark.operators import textstats
    df = spark.createDataFrame(
        [(i, f"t{i} t{i+1} common") for i in range(30)],
        "doc_id long, text string")
    weights = textstats.seeded_classifier_weights(spark, 128)
    hinted = sorted(map(tuple, textstats.hashed_classifier_score(
        df, weights, 128, normalize=False).collect()))
    monkeypatch.setattr(textstats, "CLASSIFIER_BROADCAST_MAX_ROWS", 0)
    unhinted = sorted(map(tuple, textstats.hashed_classifier_score(
        df, weights, 128, normalize=False).collect()))
    assert hinted == unhinted
