#!/usr/bin/env python
"""Per-query isolation harness for the optimization round (guide §1).

NOT the driver bench — ``bench.py`` is frozen for measurement. This
tool times individual registry queries with the same session config and
count() methodology as bench.py, optionally through the noop sink
(computes every column, guide §1.4), and can dump
``.explain("formatted")`` for plan-diff evidence in plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--noop] \
      [--explain OUTDIR] [--suffix TAG] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="noop-sink write instead of count()")
    ap.add_argument("--explain", default=None, help="dir to write <query>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="plan")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from dstlr_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    import __spark_entry__ as entry

    entry._ensure_workers_can_import(spark)
    from dstlr_spark.queries import all_queries

    qs = all_queries()
    out: dict[str, object] = {}
    for name in args.queries:
        assert name in qs, f"unknown query {name!r}"
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.explain:
            plan = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            Path(args.explain).mkdir(parents=True, exist_ok=True)
            p = Path(args.explain) / f"{name}_{args.suffix}.txt"
            p.write_text(plan)
            print(f"wrote {p}", file=sys.stderr)
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = None
            else:
                n = df.count()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(samples), "samples": samples, "rows": n}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "cpus": cpus, "noop": args.noop, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
