"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  All pure JVM column expressions (codegen-
friendly, no Python in the hot path) so they hold at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from dlx_spark.operators.common import cached_expr
from pyspark.sql import Column, DataFrame, functions as F

from dlx_spark.functions.tokenizer import PUNCT_CLASS_JAVA
from dlx_spark.operators.dedup import normalized_text

# the punctuation class escaped for embedding inside a SQL string literal
_PUNCT_SQL = PUNCT_CLASS_JAVA.replace("\\", "\\\\") + "+"

# Tiny per-language marker-word lists for the n-gram/stopword language
# heuristic.  Deliberately minimal and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "dans", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "es", "en", "que", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
}


def tokens_col(col: Column) -> Column:
    """Whitespace/punctuation tokens of normalized text."""
    return F.filter(F.split(normalized_text(col), " "), lambda t: t != "")


def bpe_ish_tokens(col_name: str) -> Column:
    """A BPE-ish token proxy: alphabetic runs, single digits, and single
    symbols — the way byte-pair encoders fragment text.  One regexp
    extraction, JVM-side.  Takes a column NAME (embedded in SQL)."""
    return cached_expr(
        rf"regexp_extract_all(lower({col_name}), '[a-z]+|[0-9]|[^a-z0-9\\s]', 0)"
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_chars): whitespace token count + char count."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(tokens_col(F.col(text_col))).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def repetition_ratio(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", normalize: bool = True) -> DataFrame:
    """(id, rep_ratio): fraction of tokens that are repeats of an
    earlier token — the Gopher-style within-document repetition signal
    (high values flag boilerplate/spam).  Pure map, no shuffle.

    ``normalize=False`` tokenizes by plain single-space split (exactly
    SQL ``string_split(text, ' ')``) for engine-parity checks."""
    toks = (tokens_col(F.col(text_col)) if normalize
            else F.split(F.col(text_col), " "))
    return df.select(
        F.col(id_col).alias("id"),
        F.round(1 - F.size(F.array_distinct(toks)) /
                F.greatest(F.size(toks), F.lit(1)), 4).alias("rep_ratio"),
    )


def idf_table(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", n_docs: int | None = None,
              normalize: bool = True, rounded: bool = True) -> DataFrame:
    """(token, df, idf): document frequency and ln(N/df) per token.

    One explode of per-document DISTINCT tokens (so a token counts once
    per doc) and one partial-agg-friendly groupBy — the shuffle carries
    (token, partial count) only.  ``n_docs`` short-circuits the count
    when the caller already knows N (at 100 TB, pass it).
    ``normalize=False``: plain single-space split for engine parity.
    ``rounded=False`` keeps idf at full precision for downstream math
    (tf·idf rounds once, after the product)."""
    n = n_docs if n_docs is not None else df.count()
    toks = (tokens_col(F.col(text_col)) if normalize
            else F.split(F.col(text_col), " "))
    idf = F.log(F.lit(float(n)) / F.col("df"))
    return (
        df.select(F.explode(F.array_distinct(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("idf", F.round(idf, 4) if rounded else idf)
    )


def tfidf_topk(df: DataFrame, k: int = 3, text_col: str = "text",
               id_col: str = "doc_id", n_docs: int | None = None,
               normalize: bool = True) -> DataFrame:
    """(id, token, tfidf, rk): each document's top-k most salient terms
    by tf·idf — keyword extraction for corpus triage.

    Two partial-agg shuffles (term frequency, document frequency), a
    broadcast join of the idf table (vocabulary-sized, small), and a
    per-document top-k window.  Ties break on token so the result set is
    deterministic."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    toks = (tokens_col(F.col(text_col)) if normalize
            else F.split(F.col(text_col), " "))
    n = n_docs if n_docs is not None else df.count()
    tf = (df.select(F.col(id_col).alias("id"), F.explode(toks).alias("token"))
          .groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf")))
    # unrounded idf: rounding happens once, after the tf·idf product
    idf = idf_table(df, text_col, id_col, n_docs=n, normalize=normalize,
                    rounded=False).select("token", F.col("idf").alias("idf_raw"))
    w = Window.partitionBy("id").orderBy(
        F.desc(F.col("tf") * F.col("idf_raw")), F.asc("token"))
    return (
        tf.join(broadcast(idf), "token")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "token",
                F.round(F.col("tf") * F.col("idf_raw"), 4).alias("tfidf"), "rk")
    )


def corpus_top_ngrams(df: DataFrame, n: int = 3, k: int = 20,
                      text_col: str = "text", id_col: str = "doc_id",
                      min_docs: int = 2, normalize: bool = True) -> DataFrame:
    """(ngram, n_docs, rk): the corpus's k most document-frequent word
    n-grams — template/boilerplate mining (an n-gram shared verbatim by
    many documents is navigation chrome, license text, or a scraper
    artifact, and a candidate for stripping before training).

    Distinct n-grams per doc (flat map) → partial-agg count by n-gram →
    global top-k.  The shuffle carries (ngram, partial count); the
    top-k is a TakeOrdered, not a full sort.  Ties break on the n-gram
    string so the result set is unique."""
    from pyspark.sql import Window

    from dlx_spark.operators.dedup import word_shingle_strings

    counts = (word_shingle_strings(df, text_col, id_col, n, normalize)
              .groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
              .filter(F.col("n_docs") >= min_docs))
    w = Window.orderBy(F.desc("n_docs"), F.asc("sh"))
    return (counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(F.col("sh").alias("ngram"), "n_docs", "rk"))


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, char_entropy): Shannon entropy (bits) of the per-document
    character distribution — low entropy flags repetitive/gibberish
    boilerplate, very high entropy flags binary-ish noise; a standard
    corpus-quality signal alongside quality_score.

    explode chars → partial-agg (id, ch) counts → windowed total →
    -Σ p·log2 p.  Both shuffles carry (id, ch, count) rows only — at
    100 TB the shuffle is ~charset-size rows per document, tiny next
    to the text itself.
    """
    from pyspark.sql import Window

    chars = df.select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.col(text_col), "")).alias("ch"))
    counts = chars.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("n"))
    p = F.col("n") / F.sum("n").over(Window.partitionBy("id"))
    # 3 dp, not 4: the oracle's entropy() computes the same quantity
    # through a different float expression, so the doubles differ by
    # ulps — coarser rounding shrinks the half-way-boundary hit rate
    return (counts.withColumn("_p", p)
            .groupBy("id")
            .agg(F.round(-F.sum(F.col("_p") * F.log2("_p")), 3)
                 .alias("char_entropy")))


def normalize_unicode(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", form: str = "NFC") -> DataFrame:
    """(id, norm_text): Unicode-normalize text (default NFC) via an
    Arrow-batched pandas UDF — Spark has no built-in normalizer.

    Run this BEFORE hashing/dedup/shingling in multilingual corpora:
    canonically-equal strings ('é' composed vs 'e'+combining accent)
    are byte-different and would never collide in an exact or minhash
    dedup pass.  Pure map, no shuffle; Python's unicodedata NFC agrees
    byte-for-byte with utf8proc (DuckDB), so the op is oracle-checkable.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None
                     else unicodedata.normalize(form, t))

    return df.select(F.col(id_col).alias("id"),
                     norm(F.col(text_col)).alias("norm_text"))


def language_scores(col: Column) -> list[tuple[str, Column]]:
    toks = tokens_col(col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        out.append((lang, score))
    return out


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred, lang_score): argmax of marker-word hits.
    Deterministic tie-break: higher score wins, then language code order."""
    scores = language_scores(F.col(text_col))
    pairs = F.array(*[F.struct(s.alias("score"), F.lit(lang).alias("lang"))
                      for lang, s in scores])
    best = F.array_max(F.filter(pairs, lambda p: p["score"] > 0))
    return df.select(
        F.col(id_col).alias("id"),
        F.coalesce(best["lang"], F.lit("und")).alias("lang_pred"),
        F.coalesce(best["score"], F.lit(0)).alias("lang_score"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document-quality features + composite score in [0, 1]:
    length band, alpha ratio, punctuation ratio, stopword presence,
    mean word length band.  All ratios are exact column arithmetic."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", ""))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(
        F.array(*[F.lit(m) for m in LANG_MARKERS["en"]]), t)))

    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    mean_word_len = (F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
                     / F.greatest(n_tokens, F.lit(1)))

    len_band = F.when((n_tokens >= 5) & (n_tokens <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    wl_band = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (0.3 * len_band + 0.3 * alpha_ratio + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
             + 0.1 * (1 - F.least(punct_ratio * 10, F.lit(1.0))) + 0.1 * wl_band)

    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(score, 4).alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum 32-bit hash over
    each sliding window of token hashes, distinct.  (id, fingerprint:
    array<bigint>).  Pure projection — robust to small edits, usable as a
    near-dup sketch or for substring-level matching.

    Token hash = first 32 bits of md5 (via conv), not Spark's murmur
    ``hash()`` — md5 exists identically in every engine, so the whole
    sketch is oracle-checkable cross-engine."""
    toks = tokens_col(F.col(text_col))
    tok_hash = "t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)"
    return df.select(
        F.col(id_col).alias("id"),
        F.array_sort(F.array_distinct(cached_expr(f"""
            transform(
                sequence(0, greatest(size(filter(split(trim(regexp_replace(lower({text_col}),
                    '{_PUNCT_SQL}', ' ')), ' '), t -> t != '')) - {window}, 0)),
                i -> array_min(transform(
                    slice(filter(split(trim(regexp_replace(lower({text_col}),
                        '{_PUNCT_SQL}', ' ')), ' '), t -> t != ''), i + 1, {window}),
                    {tok_hash})))
        """))).alias("fingerprint"),
    )


def corpus_vocabulary(df: DataFrame, vocab_size: int = 1024,
                      text_col: str = "text") -> DataFrame:
    """The corpus's top-``vocab_size`` whitespace tokens by total
    occurrence count — (tok, n) — ties broken by token (total order, so
    the vocabulary is deterministic across runs and engines).  One
    explode + partial-aggregated groupBy + TakeOrdered(V): the token
    shuffle carries (tok, partial-count) pairs, never documents, and
    the result is dimension-sized by construction (broadcast it)."""
    tok = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    return (tok.filter(F.col("tok") != "")
            .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("tok"))
            .limit(int(vocab_size)))


def oov_rate(df: DataFrame, vocab_size: int = 1024,
             text_col: str = "text", id_col: str = "doc_id",
             vocabulary: DataFrame | None = None) -> DataFrame:
    """Out-of-vocabulary profile per document: (id, n_tokens, n_oov)
    where ``n_oov`` counts token OCCURRENCES outside the corpus's
    top-``vocab_size`` vocabulary — the classic frequency-filter signal
    (a high OOV share marks gibberish, boilerplate codes, or
    wrong-language text that per-doc stats like entropy miss because
    they never see the corpus distribution).  Counts, not a ratio, so
    the result is exact (no cross-engine rounding surface); derive
    ``n_oov / n_tokens`` downstream.

    Pass ``vocabulary`` (from ``corpus_vocabulary``, persisted) to skip
    the corpus pass — the 100 TB path trains the vocabulary once per
    corpus snapshot.  Plan shape: the vocabulary is dimension-sized and
    broadcast into a map-side left-semi mark; the only full-data
    shuffle is the per-doc re-aggregation."""
    vocab = (vocabulary if vocabulary is not None
             else corpus_vocabulary(df, vocab_size, text_col))
    tok = df.select(F.col(id_col).alias("id"),
                    F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    marked = (tok.filter(F.col("tok") != "")
              .join(F.broadcast(vocab.select("tok")
                                .withColumn("_in_vocab", F.lit(1))),
                    "tok", "left"))
    return (marked.groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.count(F.when(F.col("_in_vocab").isNull(), 1))
                  .alias("n_oov")))


# ---------------------------------------------------------------------------
# Hashed linear classifier scoring (fastText-style quality filter)
# ---------------------------------------------------------------------------

#: above this many weight rows the forced broadcast is dropped and
#: Spark's size-based planning decides — the engine-wide gate rationale
#: (tableio_mor.BROADCAST_MAX_DELTA_ROWS, the store's heading gate): a
#: classifier dimension is normally 10^5-10^6 buckets and belongs in a
#: broadcast, but an unbounded caller-provided table must not be forced
#: into driver memory.
CLASSIFIER_BROADCAST_MAX_ROWS = 8_000_000


def hashed_token_bucket(col: Column, n_buckets: int,
                        salt: str = "clf") -> Column:
    """The hashed-features bucket of a token: md5-based 60-bit hash mod
    ``n_buckets`` — closed-form and engine-portable (the fastText /
    sklearn HashingVectorizer trick, with the engine's seeded md5
    family so a DuckDB oracle reproduces it exactly)."""
    from dlx_spark.operators.export import _hash60
    return F.pmod(_hash60(col, salt), F.lit(n_buckets)).cast("long")


def seeded_classifier_weights(spark, n_buckets: int,
                              seed: str = "w") -> DataFrame:
    """Deterministic demo/test weights over every bucket:
    weight(b) = ((hash60(b || seed) mod 2001) - 1000) / 1024 ∈ (-1, 1).
    Engine-portable, so oracle SQL can inline the same closed form.
    The divisor is 1024, NOT a round 1000: k/1024 is an exact binary
    fraction, so every partial sum in the classifier's mean is exact
    and the result is independent of accumulation order — a /1000
    variant measurably flips 4-dp roundings between Spark's and
    DuckDB's summation orders.  Production use passes a real trained
    weights table instead."""
    from dlx_spark.operators.export import _hash60
    return spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket"),
        (((_hash60(F.col("id"), seed) % 2001) - 1000) / 1024.0)
        .alias("weight"))


def hashed_classifier_score(df: DataFrame, weights: DataFrame,
                            n_buckets: int, text_col: str = "text",
                            id_col: str = "doc_id", bias: float = 0.0,
                            salt: str = "clf",
                            normalize: bool = True) -> DataFrame:
    """fastText-style linear classifier INFERENCE — the quality-filter
    scoring stage of CCNet/LLaMA-era data pipelines, with the trained
    model shipped as a (bucket, weight) table:

        linear(doc) = bias + mean over tokens of weight[bucket(token)]
        score(doc)  = sigmoid(linear)

    Unseen buckets contribute weight 0 (left join).  Pure JVM: hashing
    is a codegen expression, the weights dimension joins broadcast
    (size-gated at ``CLASSIFIER_BROADCAST_MAX_ROWS``), and the per-doc
    mean is one partial-agg groupBy — no Python worker, one shuffle.

    Returns (doc_id, n_tokens, clf_linear, clf_score); documents with
    no token emit nothing (no tokens to score)."""
    toks = (tokens_col(F.col(text_col)) if normalize
            else F.split(F.col(text_col), " "))
    exploded = (df
                .filter(F.length(F.trim(F.col(text_col))) > 0)
                .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
                .filter(F.size("_toks") > 0)
                .select("doc_id", F.explode("_toks").alias("_tok"))
                .withColumn("bucket",
                            hashed_token_bucket(F.col("_tok"), n_buckets,
                                                salt)))
    w = weights.select(F.col("bucket").cast("long").alias("bucket"),
                       F.col("weight").cast("double").alias("weight"))
    if w.limit(CLASSIFIER_BROADCAST_MAX_ROWS + 1).count() \
            <= CLASSIFIER_BROADCAST_MAX_ROWS:
        w = F.broadcast(w)
    scored = exploded.join(w, "bucket", "left")
    linear = (F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
              / F.count(F.lit(1)) + F.lit(bias))
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        linear.alias("clf_linear"))
    return out.select(
        "doc_id", "n_tokens", "clf_linear",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("clf_linear"))))
        .alias("clf_score"))
