"""Import MARC data from a file into the warehouse (reference
``dlx/scripts/marc_import.py``).

Usage::

    python -m dlx_spark.scripts.marc_import --store /path/to/warehouse \
        --type bib --format mrk --file records.mrk [--skip_auth_check]
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser


def get_args(argv=None):
    parser = ArgumentParser(prog="marc-import",
                            description="Import MARC data from file into the warehouse")
    parser.add_argument("--store", required=True, help="Warehouse root directory")
    parser.add_argument("--type", required=True, choices=["bib", "auth"])
    parser.add_argument("--format", required=True, choices=["mrk", "xml", "jsonl"])
    parser.add_argument("--file", required=True, help="Path to input file")
    parser.add_argument("--skip_auth_check", action="store_true",
                        help="Don't enforce auth control on import")
    parser.add_argument("--user", default="import")
    return parser.parse_args(argv)


def run(argv=None) -> int:
    args = get_args(argv)

    from dlx_spark.session import get_spark
    from dlx_spark.marc.store import MarcStore
    from dlx_spark.sources import marc_io

    spark = get_spark("marc-import")
    store = MarcStore(spark, args.store)

    # distributed end-to-end: executor-side parse (file splits fan out
    # across the cluster) into nested rows, then the bulk commit_frame
    # pipeline — record rows never materialize on the driver
    reader = {"mrk": marc_io.read_mrk, "xml": marc_io.read_marcxml,
              "jsonl": marc_io.read_jmarc_jsonl}[args.format]
    df = reader(spark, args.file, record_type=args.type)
    n = store.commit_frame(df, record_type=args.type, user=args.user,
                           auth_check=not args.skip_auth_check)
    print(f"imported {n} {args.type} records")
    return 0


if __name__ == "__main__":
    sys.exit(run())
