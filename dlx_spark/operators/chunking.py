"""Document chunking: split long documents into overlapping token
windows — the standard pre-training / RAG corpus preparation step.

Pure JVM column expressions (split → sequence of window starts →
posexplode → slice/array_join), so chunking is a flat map with no
shuffle and no Python in the hot path; it holds at 100 TB.
"""

from __future__ import annotations

from dlx_spark.operators.common import cached_expr
from pyspark.sql import DataFrame, functions as F

from dlx_spark.operators.textstats import tokens_col


def chunk_documents(df: DataFrame, chunk_tokens: int = 128, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id",
                    normalize: bool = True) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens): overlapping token windows.

    Window starts advance by ``chunk_tokens - overlap``; a start is only
    emitted while more than ``overlap`` tokens remain, so no chunk is
    fully contained in its predecessor.  ``chunk_id`` is the 0-based
    window ordinal within the document.  Documents with no non-empty
    token (empty/NULL/whitespace-only text) emit no chunks at all —
    phantom empty chunks would otherwise pollute token accounting
    downstream.  ``normalize=False`` tokenizes by plain single-space
    split for engine-parity checks.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = (tokens_col(F.col(text_col)) if normalize
            else F.split(F.col(text_col), " "))
    with_starts = df.select(
        F.col(id_col).alias("id"), toks.alias("_toks"),
    ).filter(
        F.size(F.filter(F.col("_toks"), lambda t: t != "")) > 0
    ).select(
        "id", "_toks",
        F.posexplode(cached_expr(
            f"sequence(0, greatest(size(_toks) - {overlap} - 1, 0), {step})"
        )).alias("chunk_id", "_start"),
    )
    chunk = cached_expr(f"slice(_toks, _start + 1, {chunk_tokens})")
    return with_starts.select(
        "id", "chunk_id",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


def pack_sequences(df: DataFrame, budget: int = 2048,
                   len_col: str = "n_tokens",
                   key_cols: tuple[str, ...] = ("id", "chunk_id"),
                   n_shards: int = 64) -> DataFrame:
    """Token-budget sequence packing (the pre-training "sample packing"
    step): assign every chunk to a pack so each pack's total
    ``len_col`` stays ≤ ``budget``.  Output = input columns plus
    (shard, pack_id); the global pack key is (shard, pack_id).

    Rows are sharded by a hash of ``key_cols`` (a VALUE property, not a
    partition property, so results are deterministic on any cluster
    layout), then each shard is packed independently with best-fit-
    decreasing inside one applyInPandas group (capacity-sorted bisect:
    O(n log n) per shard, same 11/9 quality bound as first-fit).
    Sharding is what makes packing scale: bin packing is inherently
    sequential, but packing quality only needs enough rows per shard to
    mix lengths, so shards are embarrassingly parallel.  Oversized rows
    (> budget) get a pack of their own rather than erroring.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    for reserved in ("shard", "pack_id"):
        if reserved in df.columns:
            raise ValueError(f"input already has a '{reserved}' column — "
                             "rename it before packing")
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    key_expr = F.concat_ws("\x00", *[F.col(c).cast("string") for c in key_cols])
    with_shard = df.withColumn("shard", F.pmod(F.xxhash64(key_expr), F.lit(n_shards)))
    # build a NEW StructType: StructType.add mutates in place, which
    # would corrupt with_shard's own resolved schema
    out_schema = StructType(list(with_shard.schema.fields)
                            + [StructField("pack_id", LongType())])
    sort_keys = [len_col, *key_cols]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        from bisect import bisect_left, insort

        pdf = pdf.sort_values(sort_keys, ascending=[False] + [True] * len(key_cols),
                              kind="mergesort").reset_index(drop=True)
        open_bins: list[tuple[int, int]] = []   # sorted (capacity, bin_id)
        n_bins = 0
        ids = []
        for length in pdf[len_col]:
            length = int(length)
            # best fit: the tightest bin that still holds this row
            # (smallest bin_id breaks capacity ties → deterministic)
            i = bisect_left(open_bins, (length, -1))
            if i < len(open_bins):
                cap, b = open_bins.pop(i)
                if cap > length:                # full bins close for good
                    insort(open_bins, (cap - length, b))
                ids.append(b)
            else:
                cap = max(budget - length, 0)
                if cap > 0:
                    insort(open_bins, (cap, n_bins))
                ids.append(n_bins)
                n_bins += 1
        pdf["pack_id"] = pd.Series(ids, dtype="int64")
        return pdf

    return with_shard.groupBy("shard").applyInPandas(pack, schema=out_schema)
