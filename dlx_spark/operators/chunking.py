"""Document chunking: split long documents into overlapping token
windows — the standard pre-training / RAG corpus preparation step.

Pure JVM column expressions (split → sequence of window starts →
posexplode → slice/array_join), so chunking is a flat map with no
shuffle and no Python in the hot path; it holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dlx_spark.operators.textstats import tokens_col


def chunk_documents(df: DataFrame, chunk_tokens: int = 128, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id",
                    normalize: bool = True) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens): overlapping token windows.

    Window starts advance by ``chunk_tokens - overlap``; a start is only
    emitted while more than ``overlap`` tokens remain, so no chunk is
    fully contained in its predecessor.  ``chunk_id`` is the 0-based
    window ordinal within the document.  ``normalize=False`` tokenizes
    by plain single-space split for engine-parity checks.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = (tokens_col(F.col(text_col)) if normalize
            else F.split(F.col(text_col), " "))
    with_starts = df.select(
        F.col(id_col).alias("id"), toks.alias("_toks"),
    ).select(
        "id", "_toks",
        F.posexplode(F.expr(
            f"sequence(0, greatest(size(_toks) - {overlap} - 1, 0), {step})"
        )).alias("chunk_id", "_start"),
    )
    chunk = F.expr(f"slice(_toks, _start + 1, {chunk_tokens})")
    return with_starts.select(
        "id", "chunk_id",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )
