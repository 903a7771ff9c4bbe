#!/usr/bin/env python
"""Run any driver-contract registry query from spark-submit.

spark-submit --py-files dist/dstlr_spark.zip jobs/query.py \
    --name kg_mentions --sf-dir /root/testdata/sf0.1 \
    [--output /path/out] [--show 20] [--list]

This is the "a reference user can run every query they run today"
surface: every oracle-gated registry operator — ``--list`` prints the
live count and names (KG construction + cleaning,
dedup, similarity/ANN, curation, sketches, text stats, relational,
streaming twins, tokenizer) behind one CLI. ``--output`` writes
parquet; otherwise the first ``--show`` rows print.
"""

from __future__ import annotations

import argparse
import sys

from dstlr_spark.session import get_spark, ship_package


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name")
    p.add_argument("--sf-dir")
    p.add_argument("--output")
    p.add_argument("--show", type=int, default=20)
    p.add_argument("--list", action="store_true")
    p.add_argument(
        "--explain", action="store_true",
        help="print the formatted physical plan instead of executing",
    )
    args = p.parse_args()

    from dstlr_spark.queries import all_queries

    qs = all_queries()
    if args.list:
        for name in qs:
            print(name)
        return 0
    if not args.name or not args.sf_dir:
        p.error("--name and --sf-dir are required unless --list")
    if args.name not in qs:
        close = [n for n in qs if args.name in n]
        p.error(f"unknown query {args.name!r}; close matches: {close[:8]}")

    spark = get_spark(f"dstlr-query-{args.name}")
    ship_package(spark)
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        spark.stop()
        return 0
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"query {args.name}: {spark.read.parquet(args.output).count()} rows -> {args.output}")
    else:
        df.show(args.show, truncate=False)
        print(f"query {args.name}: {df.count()} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
