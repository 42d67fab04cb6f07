"""Corpus-level segment and duplicated-span deduplication.

Two operators from the published training-data-curation playbook that
the document-level shingle/minhash family in ``dedup.py`` does not
cover — both act BELOW document granularity, across the whole corpus:

- ``segment_dedup`` — C4-style repeated-unit removal (Raffel et al.,
  arXiv:1910.10683 §2.2 discards all but one occurrence of any
  three-sentence span corpus-wide), adapted to fixed word-window
  segments: the corpus keeps exactly ONE copy of every distinct
  segment (first occurrence in (doc, position) order wins), later
  copies are cut, and each document's text is reconstructed from its
  surviving segments.
- ``duplicate_spans`` — suffix-array-style duplicated-substring
  profiling (Lee et al., arXiv:2107.06499) approximated with stride-1
  k-word window hashing: a window whose content appears in at least
  ``min_docs`` distinct documents marks its k positions duplicated;
  overlapping/adjacent marks merge into maximal spans per document,
  yielding the per-document duplicated-text fraction used as a
  filtering signal.

Scale design (100 TB):

- window/segment generation is a pure JVM flat map (split → sequence →
  posexplode → slice → array_join) — no Python worker, no shuffle;
- ``segment_dedup`` decides winners with ONE exchange keyed by the
  segment digest: a row_number window per digest ordered by
  (doc, position).  Each digest group is one duplicate set — tiny in
  real corpora — so the per-key sort is O(dup-set), and carrying the
  segment text through this single exchange is what lets
  reconstruction avoid a second pass over the corpus.  Reconstruction
  itself is a groupBy on the document id (linear, AQE-coalesced), and
  per-document totals are computed map-side from the scan (no extra
  shuffle);
- ``duplicate_spans`` finds duplicated window contents with a single
  partial-aggregation-friendly groupBy on the window digest
  (count_distinct(doc) combines map-side, so the stride-1 window
  stream shrinks before the exchange), joins the duplicated-digest set
  back WITHOUT a broadcast hint (the dup set scales with corpus
  redundancy, exactly the unconditional-broadcast cliff
  tableio_mor.BROADCAST_MAX_DELTA_ROWS exists to avoid — AQE picks
  broadcast when the set is genuinely small), and merges intervals
  with per-document window functions whose partitions are
  document-sized.

Neither operator collects to the driver.
"""

from __future__ import annotations

from dlx_spark.operators.common import cached_expr
from pyspark.sql import DataFrame, Window, functions as F

from dlx_spark.operators.dedup import _require_col_name
from dlx_spark.operators.textstats import tokens_col


def _doc_tokens(df: DataFrame, text_col: str, id_col: str,
                normalize: bool) -> DataFrame:
    """(doc_id, _toks) for documents with at least one token.

    ``normalize=True`` routes through the engine-wide ``tokens_col``
    normalization (lower + punctuation collapse + empty-token drop);
    ``normalize=False`` is the engine-parity plain single-space split
    used by the oracle-checked contract queries, where the corpus is
    already normalized.  Whitespace-only documents emit nothing either
    way (they have no segments/windows and no reconstructable text).
    """
    _require_col_name("text_col", text_col)
    _require_col_name("id_col", id_col)
    toks = (tokens_col(F.col(text_col)) if normalize
            else F.split(F.col(text_col), " "))
    return (df
            .filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
            .filter(F.size("_toks") > 0))


def word_segments(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", unit_words: int = 10,
                  normalize: bool = True) -> DataFrame:
    """(doc_id, seg_idx, seg_text): the disjoint ``unit_words``-token
    segments of every document (final segment may be shorter).  Pure
    JVM flat map — the shared unit for :func:`segment_dedup` and the
    incremental ``SegmentIndex``, so batch and full-corpus paths can
    never disagree on segmentation."""
    if unit_words < 1:
        raise ValueError("unit_words must be >= 1")
    base = _doc_tokens(df, text_col, id_col, normalize)
    return base.select(
        "doc_id",
        F.posexplode(cached_expr(
            f"sequence(0, size(_toks) - 1, {unit_words})"
        )).alias("seg_idx", "_start"),
        "_toks",
    ).select(
        "doc_id", "seg_idx",
        F.array_join(
            cached_expr(f"slice(_toks, _start + 1, {unit_words})"), " "
        ).alias("seg_text"),
    )


def rebuild_documents(kept_segments: DataFrame,
                      totals: DataFrame) -> DataFrame:
    """Reassemble (doc_id, n_segments, n_kept, cleaned_text,
    n_words_kept) from surviving segments + per-doc totals (every doc
    in ``totals`` appears, fully-cut ones with empty text)."""
    rebuilt = kept_segments.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg_text"))),
                lambda s: s["seg_text"]),
            " ").alias("cleaned_text"),
    )
    out = totals.join(rebuilt, "doc_id", "left")
    cleaned = F.coalesce(F.col("cleaned_text"), F.lit(""))
    return out.select(
        "doc_id", "n_segments",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        cleaned.alias("cleaned_text"),
        F.when(cleaned == "", F.lit(0))
         .otherwise(F.size(F.split(cleaned, " ")))
         .cast("long").alias("n_words_kept"),
    )


def segment_totals(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", unit_words: int = 10,
                   normalize: bool = True) -> DataFrame:
    """(doc_id, n_segments) computed map-side off the scan."""
    base = _doc_tokens(df, text_col, id_col, normalize)
    return base.select(
        "doc_id",
        F.ceil(F.size("_toks") / F.lit(unit_words)).alias("n_segments"))


def segment_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", unit_words: int = 10,
                  normalize: bool = True) -> DataFrame:
    """Corpus-wide exact removal of repeated word-window segments.

    Documents are cut into disjoint segments of ``unit_words`` tokens
    (the final segment may be shorter).  Across the WHOLE corpus, only
    the first occurrence of each distinct segment content survives —
    ordered by (doc_id, segment index), so earlier documents win and
    within one document the earlier copy wins.  This is the C4 repeated
    three-sentence-span rule with fixed word windows as the unit.

    Returns one row per input document (even fully-deduplicated ones):
    ``(doc_id, n_segments, n_kept, cleaned_text, n_words_kept)`` where
    ``cleaned_text`` is the document rebuilt from its surviving
    segments in order ('' when nothing survived).
    """
    segs = word_segments(df, text_col, id_col, unit_words, normalize)

    # One exchange: digest-keyed first-occurrence choice.  Groups are
    # duplicate sets (usually size 1), so the per-key sort is trivial;
    # the segment text rides along so reconstruction needs no re-scan.
    w = Window.partitionBy(F.md5("seg_text")).orderBy("doc_id", "seg_idx")
    kept = (segs
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1))

    # Per-document totals come straight off the scan — no shuffle.
    totals = segment_totals(df, text_col, id_col, unit_words, normalize)
    return rebuild_documents(kept, totals)


def _dup_digests(wins: DataFrame, min_docs: int) -> DataFrame:
    """Digests of window contents occurring in >= min_docs distinct
    documents.  For the default min_docs=2 the distinct-doc test is just
    min(doc_id) != max(doc_id) — two longs of partial-aggregation state
    per digest per mapper instead of a distinct-set, which matters when
    the stride-1 window stream is the size of the corpus."""
    if min_docs == 2:
        return (wins.groupBy("digest")
                .agg(F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"))
                .filter(F.col("_lo") != F.col("_hi"))
                .select("digest"))
    return (wins.groupBy("digest")
            .agg(F.count_distinct("doc_id").alias("_nd"))
            .filter(F.col("_nd") >= min_docs)
            .select("digest"))


def duplicate_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 15,
                    min_docs: int = 2,
                    normalize: bool = True) -> DataFrame:
    """Per-document duplicated-substring profile via k-word windows.

    Every stride-1 window of ``k`` tokens is hashed; a window content
    occurring in >= ``min_docs`` DISTINCT documents marks its ``k``
    positions as duplicated in every document that contains it.
    Overlapping or exactly-adjacent marked windows merge into maximal
    spans (contiguous duplicated text is one span, as a suffix-array
    match would report it).

    Returns one row per input document:
    ``(doc_id, n_words, n_dup_spans, dup_words, dup_fraction)`` with
    ``dup_fraction = dup_words / n_words`` rounded to 4 dp — the
    filtering signal of Lee et al.'s dedup study.  Documents shorter
    than ``k`` words have no windows and report zeros.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (a window trivially "
                         "occurs in its own document)")
    base = _doc_tokens(df, text_col, id_col, normalize)

    # Stride-1 windows; cached because the duplicated-digest aggregate
    # and the position join both consume it (the ngram_jaccard
    # materialization convention — lazy, no job at plan time).
    wins = _windows_of(base, k).cache()

    hits = wins.join(_dup_digests(wins, min_docs), "digest") \
               .select("doc_id", "pos")

    # Classic interval merge: fixed width k means the running maximum
    # of span ends is lag(pos) + k, so a new span starts exactly when
    # pos > lag(pos) + k (equality = adjacent = same contiguous text).
    order = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(order)
    flagged = hits.withColumn(
        "_new", F.when(prev.isNull() | (F.col("pos") > prev + k), 1)
                 .otherwise(0))
    spans = (flagged
             .withColumn("_sid", F.sum("_new").over(order))
             .groupBy("doc_id", "_sid")
             .agg((F.max("pos") + k - F.min("pos")).alias("_len")))
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("_len").alias("dup_words"))

    totals = base.select(
        "doc_id", F.size("_toks").cast("long").alias("n_words"))
    out = totals.join(perdoc, "doc_id", "left")
    dup_words = F.coalesce(F.col("dup_words"), F.lit(0)).cast("long")
    return out.select(
        "doc_id", "n_words",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long")
         .alias("n_dup_spans"),
        dup_words.alias("dup_words"),
        F.round(dup_words / F.col("n_words"), 4).alias("dup_fraction"),
    )


def cut_duplicate_spans(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 15,
                        min_docs: int = 2, keep_first: bool = True,
                        normalize: bool = True) -> DataFrame:
    """Remove duplicated spans from document text (the destructive
    companion to :func:`duplicate_spans`).

    With ``keep_first=True`` (Lee et al.'s setting) the FIRST document
    containing a duplicated window — in (doc_id, position) order —
    keeps its copy; only later occurrences are cut, so every piece of
    text survives somewhere in the corpus.  With ``keep_first=False``
    every duplicated position is cut everywhere (the aggressive
    contamination-scrub variant).

    Returns ``(doc_id, n_words, n_words_cut, cleaned_text)`` for every
    input document; ``cleaned_text`` is the token sequence with marked
    positions removed (interior gaps close up — downstream consumers
    that need exact offsets should use :func:`duplicate_spans`).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = _doc_tokens(df, text_col, id_col, normalize)
    wins = _windows_of(base, k).cache()

    if min_docs == 2:
        grp = wins.groupBy("digest").agg(
            F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"),
            F.min(F.struct("doc_id", "pos")).alias("_first"))
        dup = grp.filter(F.col("_lo") != F.col("_hi")) \
                 .select("digest", "_first")
    else:
        grp = wins.groupBy("digest").agg(
            F.count_distinct("doc_id").alias("_nd"),
            F.min(F.struct("doc_id", "pos")).alias("_first"))
        dup = grp.filter(F.col("_nd") >= min_docs).select("digest", "_first")

    marked = wins.join(dup, "digest")
    if keep_first:
        marked = marked.filter(
            (F.col("doc_id") != F.col("_first.doc_id"))
            | (F.col("pos") != F.col("_first.pos")))
    return apply_window_cuts(base, marked.select("doc_id", "pos"), k)


def _windows_of(base: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, digest): stride-1 k-token window digests over a
    (doc_id, _toks) frame — the shared unit for the batch operators and
    the incremental ``SpanIndex`` (one definition, no drift)."""
    return base.filter(F.size("_toks") >= k).select(
        "doc_id",
        F.posexplode(cached_expr(f"sequence(0, size(_toks) - {k})"))
         .alias("pos", "_start"),
        "_toks",
    ).select(
        "doc_id", F.col("pos").cast("long").alias("pos"),
        F.md5(F.array_join(
            cached_expr(f"slice(_toks, _start + 1, {k})"), " ")).alias("digest"),
    )


def word_windows(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 15,
                 normalize: bool = True) -> DataFrame:
    """Public form of the stride-1 window digests (see
    :func:`_windows_of`), from raw documents."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return _windows_of(_doc_tokens(df, text_col, id_col, normalize), k)


def apply_window_cuts(base: DataFrame, marked: DataFrame,
                      k: int) -> DataFrame:
    """Cut every token covered by a marked window start (doc_id, pos)
    and rebuild the text: expand each mark to its k positions, dedupe
    overlaps, drop those slots, close the gaps.  Returns
    (doc_id, n_words, n_words_cut, cleaned_text) for every doc in
    ``base`` — unmarked docs pass through uncut."""
    cut_pos = (marked
               .select("doc_id", F.explode(
                   F.sequence(F.col("pos"),
                              F.col("pos") + F.lit(k - 1))).alias("cut"))
               .distinct())
    cuts = cut_pos.groupBy("doc_id").agg(
        F.collect_set("cut").alias("_cuts"))

    joined = base.join(cuts, "doc_id", "left")
    cuts_arr = F.coalesce(F.col("_cuts"),
                          F.array().cast("array<bigint>"))
    # array_except preserves first-array order, so the surviving token
    # positions stay sorted and the text reassembles in place.
    kept_idx = F.array_except(
        F.sequence(F.lit(0).cast("long"),
                   F.size("_toks").cast("long") - 1), cuts_arr)
    return joined.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_words"),
        F.coalesce(F.size("_cuts"), F.lit(0)).cast("long")
         .alias("n_words_cut"),
        F.array_join(
            F.transform(kept_idx,
                        lambda i: F.element_at(F.col("_toks"),
                                               (i + 1).cast("int"))),
            " ").alias("cleaned_text"),
    )
