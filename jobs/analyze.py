#!/usr/bin/env python
"""Corpus/event analytics job: the release-report tables in one pass.

spark-submit --py-files dist/dstlr_spark.zip jobs/analyze.py \
    --sf-dir /root/testdata/sf0.1 --output /path/report

Emits four parquet tables a dataset release ships:
  datacard/    per-language volumes, dup rate, chars/token
               (corpus_datacard semantics)
  quantiles/   histogram-sketch P50/P95/P99 over lineitem quantity
               (agg_quantile_hist semantics)
  anomalies/   per-type 3σ event outliers, exact integer arithmetic
               (events_anomaly semantics)
  funnel/      view→click→purchase conversion counts (events_funnel)

Every table is produced by the same oracle-gated operators the driver
value-checks — this job is their composition, not a re-implementation.
"""

from __future__ import annotations

import argparse

from dstlr_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    spark = get_spark("dstlr-analyze")
    from dstlr_spark.queries.curation import (
        q_corpus_datacard,
        q_events_anomaly,
        q_events_funnel,
        q_quantile_hist,
    )

    reports = {
        "datacard": q_corpus_datacard,
        "quantiles": q_quantile_hist,
        "anomalies": q_events_anomaly,
        "funnel": q_events_funnel,
    }
    for name, fn in reports.items():
        fn(spark, args.sf_dir).write.mode("overwrite").parquet(
            f"{args.output}/{name}"
        )
    counts = {
        name: spark.read.parquet(f"{args.output}/{name}").count()
        for name in reports
    }
    print("analyze done:", " ".join(f"{k}={v}" for k, v in counts.items()))
    spark.stop()


if __name__ == "__main__":
    main()
