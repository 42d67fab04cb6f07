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
    from dlx_spark.marc import AuthSet, BibSet
    from dlx_spark.marc.store import MarcStore

    spark = get_spark("marc-import")
    store = MarcStore(spark, args.store)
    idx = store.auth_index()
    cls = BibSet if args.type == "bib" else AuthSet

    text = open(args.file, "r", encoding="utf8").read()
    if args.format == "mrk":
        recordset = cls.from_mrk(text, auth_control=not args.skip_auth_check,
                                 auth_index=idx)
    elif args.format == "xml":
        recordset = cls.from_xml(text, auth_control=not args.skip_auth_check,
                                 auth_index=idx)
    else:
        import json
        docs = [json.loads(line) for line in text.splitlines() if line.strip()]
        recordset = cls.from_dicts(docs, auth_index=idx)

    records = list(recordset)
    ids = store.commit(records, user=args.user,
                       auth_check=not args.skip_auth_check)
    print(f"imported {len(ids)} {args.type} records: {ids[:10]}{'...' if len(ids) > 10 else ''}")
    return 0


if __name__ == "__main__":
    sys.exit(run())
