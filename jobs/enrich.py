#!/usr/bin/env python
"""Job 2 — enrich: linked entities → ground-truth Fact triples
(reference EnrichTriples; SPARQL tiers replaced by local dimensions).

spark-submit --py-files dist/dstlr_spark.zip jobs/enrich.py \
    --triples /path/triples --facts /path/facts \
    --mapping /path/property_relation.csv --output /path/ground_truth
"""

from __future__ import annotations

import argparse

from dstlr_spark.operators.enrich import enrich_triples
from dstlr_spark.schemas import PROPERTY_RELATION_SCHEMA
from dstlr_spark.session import get_spark
from dstlr_spark.sources.io import read_table


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True)
    p.add_argument("--facts", required=True)
    p.add_argument("--mapping", required=True, help="wikidata.csv-shaped CSV")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    spark = get_spark("dstlr-enrich")
    triples = read_table(spark, args.triples)
    facts = read_table(spark, args.facts)
    mapping = spark.read.csv(args.mapping, header=True, schema=PROPERTY_RELATION_SCHEMA)
    enrich_triples(triples, facts, mapping).write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
