"""Merge two authority records (reference ``dlx/scripts/auth_merge.py``):
rewrites every reference losing→gaining across bibs and auths, drops
duplicate fields, deletes the losing auth — one batch, no polling.

Usage::

    python -m dlx_spark.scripts.auth_merge --store /path/to/warehouse \
        --gaining 1 --losing 2 [--user admin]
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser


def run(argv=None) -> int:
    parser = ArgumentParser(prog="auth-merge")
    parser.add_argument("--store", required=True)
    parser.add_argument("--gaining", type=int, required=True)
    parser.add_argument("--losing", type=int, required=True)
    parser.add_argument("--user", default="admin")
    args = parser.parse_args(argv)

    from dlx_spark.session import get_spark
    from dlx_spark.marc.store import MarcStore

    spark = get_spark("auth-merge")
    store = MarcStore(spark, args.store)
    store.merge(gaining_id=args.gaining, losing_id=args.losing, user=args.user)
    print(f"merged auth {args.losing} into {args.gaining}")
    return 0


if __name__ == "__main__":
    sys.exit(run())
