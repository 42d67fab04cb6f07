"""Set-scale operators: deduplication, similarity search, text analysis,
multimodal plumbing — the large-scale training-data-pipeline surface
built on the same tokenizer/join machinery as the MARC engine."""

from dlx_spark.operators import (  # noqa: F401
    asof, bucketing, chunking, dedup, dedup_index, multimodal, redact,
    sampling, similarity, skew, textstats)
