"""Reproducible sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — a
repartition, AQE re-plan, or file-split change reshuffles which rows are
picked.  These operators hash a KEY column instead, so membership is a
pure function of the row (same result on any cluster layout, any engine
— the DuckDB oracle evaluates the identical predicate), which is what
dataset reproducibility and holdout-set stability require.

Mechanics: the first 4 hex chars of md5(key || salt) are uniform over
[0, 65536); fixed-width hex compares lexicographically = numerically, so
``hex < format(floor(fraction * 65536), '04x')`` selects a stable
pseudo-random ``fraction`` of keys.  Everything is JVM-side expressions
— a pure map, no shuffle, fully pushdown-compatible.
"""

from __future__ import annotations

from dlx_spark.operators.common import cached_expr
from pyspark.sql import Column, DataFrame, functions as F


def sample_bucket(key: str | Column, salt: str = "") -> Column:
    """The [0, 65536) hash bucket a key falls in, as 4 hex chars.
    ``key`` may be a column name or a Column expression."""
    col = key if isinstance(key, Column) else F.col(key)
    return F.substring(
        F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 4)


def _threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cells = int(fraction * 65536)
    # fraction 1.0 would format as the 5-char '10000', which sorts BELOW
    # 4-char hex strings; 'zzzz' sorts above every hex string instead
    return "zzzz" if cells >= 65536 else format(cells, "04x")


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep a stable ``fraction`` of rows keyed by ``key_col``.
    Change ``salt`` to draw an independent sample (e.g. train vs
    holdout splits: disjoint salts, no overlap bookkeeping).
    ``fraction >= 1.0`` keeps EVERY row, including NULL-keyed ones
    (a NULL key hashes to NULL and would otherwise be dropped)."""
    if fraction >= 1.0:
        _threshold(fraction)                    # still validates range
        return df
    return df.filter(sample_bucket(key_col, salt) < F.lit(_threshold(fraction)))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", key_col: str = "doc_id",
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages).  Strata missing from ``fractions`` are dropped."""
    thr = F.lit(None).cast("string")
    for stratum, fraction in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(_threshold(fraction))).otherwise(thr)
    return df.filter(sample_bucket(key_col, salt) < thr)


def mix_corpora(sources: list[tuple[DataFrame, float]],
                key_col: str = "doc_id", salt: str = "mix") -> DataFrame:
    """Weighted training-data mixture: keep a deterministic hash-keyed
    ``fraction`` of each source corpus and union the survivors — the
    data-mixing step that turns per-source weights into one training
    corpus.  Fractions are per-source keep rates (not normalized
    shares); all sources must share a schema.  Deterministic on any
    partitioning/cluster layout, so a mix is exactly reproducible from
    (weights, salt) — re-running the pipeline yields the same corpus.
    Each source draws with its own salt (``salt:index``) so keep
    decisions are independent across sources — overlapping sources get
    a true mixture, not nested samples of each other.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one (df, fraction) source")
    parts = [deterministic_sample(df, fraction, key_col, f"{salt}:{i}")
             for i, (df, fraction) in enumerate(sources)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def leakage_safe_split(df: DataFrame, pairs: DataFrame, holdout: float = 0.1,
                       id_col: str = "doc_id", salt: str = "split",
                       id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Train/holdout split that cannot leak near-duplicates across the
    boundary: every near-dup cluster (connected component of ``pairs``)
    lands wholly on one side, because membership is hashed on the
    cluster REPRESENTATIVE (component min id) rather than the document
    id.  Unpaired documents hash on their own id.  Adds ``is_holdout``.

    A plain per-document split puts ~2·p·(1-p) of each duplicate pair
    across the boundary — the classic eval-contamination bug this
    operator exists to prevent.  One broadcast-sized left join (the
    component table covers only paired docs); the corpus never shuffles.
    """
    from dlx_spark.operators.dedup import connected_components

    # underscore temp names, referenced from the comp side only, so a
    # caller's own 'component' column can't collide or be dropped
    comp = connected_components(pairs, id_a, id_b).select(
        F.col("id").alias("_lss_id"), F.col("component").alias("_lss_comp"))
    joined = df.join(comp, F.col(id_col) == F.col("_lss_id"), "left")
    rep = F.coalesce(F.col("_lss_comp"), F.col(id_col))
    return (joined
            .withColumn("is_holdout",
                        sample_bucket(rep, salt) < F.lit(_threshold(holdout)))
            .drop("_lss_id", "_lss_comp"))


def quantile_band(df: DataFrame, metric_col: str, lo: float = 0.05,
                  hi: float = 0.95, by: str | None = None) -> DataFrame:
    """Keep rows whose ``metric_col`` falls in the [lo, hi] quantile
    band, optionally per ``by`` stratum — the standard quality-filter
    step (drop the worst AND the suspiciously-best tails).

    Uses percent_rank, not interpolated quantiles: (rank-1)/(n-1) is
    exact integer arithmetic over a sort, so every engine computes the
    identical cut (interpolated quantile_cont differs across engines in
    float rounding).  NULL metrics are pinned NULLS LAST (SQL-standard
    ascending default) — Spark's asc default is NULLS FIRST, which
    would silently shift every rank.  One shuffle on the stratum key;
    at 100 TB prefer stratifying (``by=``) so each partition sorts only
    its stratum — a global band over a whole corpus needs a global sort
    and is better served by approx_percentile thresholds computed once.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(by) if by is not None
         else Window.partitionBy(F.lit(1)))
    pr = F.percent_rank().over(w.orderBy(F.col(metric_col).asc_nulls_last()))
    return (df.withColumn("_pr", pr)
            .filter((F.col("_pr") >= lo) & (F.col("_pr") <= hi))
            .drop("_pr"))


def _ngram_hashes(df: DataFrame, n: int, text_col: str, id_col: str,
                  normalize: bool) -> DataFrame:
    """(id, gram: bigint) — one row per distinct word n-gram, hashed to
    60 bits (first 15 hex chars of md5: engine-portable like the
    shingle hash in operators.dedup, and 60 bits keeps the accidental-
    collision rate negligible at corpus×benchmark scale where 32 bits
    would manufacture false contamination hits).  Documents shorter
    than ``n`` tokens contribute their full token span as one gram, so
    a short benchmark prompt still decontaminates its exact matches.
    Empty/whitespace-only (or normalized-to-empty) text contributes NO
    grams: without the guard, ``split('')`` yields ``['']`` and a
    single degenerate benchmark row would share the md5('') gram with
    every empty-text corpus doc — silently deleting the whole
    empty-text slice of a crawl as 'contamination'."""
    from dlx_spark.operators.dedup import normalized_text

    toks = (normalized_text(F.col(text_col)) if normalize
            else F.col(text_col))
    return (df.select(F.col(id_col).alias("id"),
                      F.filter(F.split(toks, " "),
                               lambda t: t != "").alias("toks"))
            .select("id", F.explode(cached_expr(f"""
                CASE WHEN size(toks) = 0 THEN array()
                ELSE array_distinct(transform(
                    sequence(0, greatest(size(toks) - {n}, 0)),
                    i -> cast(conv(substring(
                             md5(array_join(slice(toks, i + 1, {n}), ' ')),
                             1, 15), 16, 10) as bigint)))
                END""")).alias("gram")))


def contaminated_ids(corpus: DataFrame, benchmark: DataFrame, n: int = 13,
                     text_col: str = "text", id_col: str = "doc_id",
                     bench_text_col: str = "text",
                     normalize: bool = True) -> DataFrame:
    """Corpus ids sharing at least one word ``n``-gram with the
    benchmark set — the standard train-test decontamination rule
    (13-gram overlap, as published in the GPT-3 appendix-C /
    Llama-style data pipelines).

    Scale shape: the benchmark side (eval sets: thousands of rows)
    folds to a distinct gram table; the corpus side explodes its grams
    as a pure projection and LEFT SEMI joins against an EXPLICIT
    broadcast of the benchmark grams, so the corpus never shuffles,
    and the distinct at the end runs on the (small) contaminated-id
    set only.  Asymmetric
    by design: this is containment of benchmark text in corpus docs,
    not near-duplication — a one-line quote of an eval question inside
    a long document is a hit that no Jaccard-style dedup would catch."""
    bench = (_ngram_hashes(
        benchmark.withColumn("_bid", F.monotonically_increasing_id()),
        n, bench_text_col, "_bid", normalize)
        .select("gram").distinct())
    grams = _ngram_hashes(corpus, n, text_col, id_col, normalize)
    # explicit broadcast: post-aggregate size estimates are heuristic,
    # and if Catalyst guessed past the autoBroadcast threshold the
    # corpus-side gram explosion would shuffle IN FULL — the exact
    # scale failure this join's shape exists to avoid.  Eval sets are
    # bounded-small by construction, so forcing the hint is safe.
    return (grams.join(F.broadcast(bench), "gram", "left_semi")
            .select(F.col("id").alias(id_col)).distinct())


def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text", normalize: bool = True,
                  mark_only: bool = False) -> DataFrame:
    """Remove (or, with ``mark_only``, flag as ``contaminated``) every
    corpus document containing a word ``n``-gram from ``benchmark`` —
    see ``contaminated_ids`` for the rule and the scale shape.  The
    final anti-join (or mark join) keys on the contaminated-id set,
    which is benchmark-sized, so it broadcasts."""
    bad = contaminated_ids(corpus, benchmark, n, text_col, id_col,
                           bench_text_col, normalize)
    if mark_only:
        marked = bad.withColumn("contaminated", F.lit(True))
        return (corpus.join(F.broadcast(marked), id_col, "left")
                .withColumn("contaminated",
                            F.coalesce("contaminated", F.lit(False))))
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
