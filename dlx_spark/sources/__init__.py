"""Distributed readers/writers for the record formats."""

from dlx_spark.sources.marc_io import (  # noqa: F401
    read_jmarc_jsonl,
    read_mrc,
    read_mrk,
    read_marcxml,
    write_jmarc_jsonl,
    write_mrc,
    write_mrk,
    write_marcxml,
)
