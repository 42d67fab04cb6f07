"""Convert an Excel record sheet to MARC serializations (reference
``dlx/scripts/excel_marc.py``): read records from a spreadsheet, fill
missing fields from a defaults sheet, splice the 049$a / 041$a language
codes into 008, and serialize to mrk/xml/mrc.

No database flags — input file in, serialization out.  (The reference
script's ``record.merge(defaults)`` call doesn't match its own
``merge(*, user, losing_record)`` signature — a latent bug; the
intended fill-missing-from-defaults semantics are ``xmerge`` here.)

Usage::

    python -m dlx_spark.scripts.excel_marc --file records.xlsx \
        --type bib --format mrk [--defaults defaults.xlsx] [--check FIELD]
        [--out out.mrk]
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser
from datetime import datetime, timezone


def get_args(argv=None):
    parser = ArgumentParser(prog="excel-marc")
    parser.add_argument("--file", required=True)
    parser.add_argument("--type", required=True, choices=["bib", "auth"])
    parser.add_argument("--format", required=True, choices=["mrc", "mrk", "xml"])
    parser.add_argument("--check", help="field check passed to from_excel")
    parser.add_argument("--out")
    parser.add_argument("--defaults", help="Excel sheet whose first record "
                        "fills missing fields in every imported record")
    return parser.parse_args(argv)


def run(argv=None) -> int:
    args = get_args(argv)

    from dlx_spark.marc import AuthSet, BibSet

    cls = BibSet if args.type == "bib" else AuthSet
    data = cls.from_excel(args.file, auth_control=False,
                          field_check=args.check)

    if args.defaults:
        defaults = list(cls.from_excel(args.defaults,
                                       auth_control=False))[0]
        today = datetime.now(timezone.utc).strftime("%y%m%d")
        for record in data:
            record.xmerge(defaults, overwrite=False)
            # splice language/cataloging codes into 008 (reference
            # excel_marc.py:33-43): chars 15-17 <- 049$a, 35-37 <- 041$a
            _008 = (record.get_value("008") or "").ljust(40, "|")
            _008 = (_008[0:15]
                    + (record.get_value("049", "a") or "").ljust(3, "|")[:3]
                    + _008[18:35]
                    + (record.get_value("041", "a") or "")[0:3].ljust(3, "|")
                    + _008[38:40])
            record.set("008", None, _008)
            record.set_008(today)

    out = getattr(data, f"to_{args.format}")()
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(out)
    else:
        sys.stdout.write(out)
    return 0


if __name__ == "__main__":
    sys.exit(run())
