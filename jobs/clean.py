#!/usr/bin/env python
"""Job 4 — clean: data-cleaning subgraph queries (reference CleanTriples
+ the README Cypher queries) over the graph tables.

spark-submit --py-files dist/dstlr_spark.zip jobs/clean.py \
    --graph /path/graph --query inconsistent \
    --relation ORG_CITY_OF_HEADQUARTERS --output /path/dirty
"""

from __future__ import annotations

import argparse

from dstlr_spark.operators.clean import (
    inconsistent_information,
    missing_information,
    supporting_information,
)
from dstlr_spark.session import get_spark
from dstlr_spark.sources.io import write_text_sink

_QUERIES = {
    "supporting": supporting_information,
    "inconsistent": inconsistent_information,
    "missing": missing_information,
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", required=True)
    p.add_argument("--query", choices=sorted(_QUERIES), required=True)
    p.add_argument("--relation", default=None)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    spark = get_spark("dstlr-clean")
    graph = {
        name: spark.read.parquet(f"{args.graph}/{name}")
        for name in (
            "mention_nodes", "mentions_edges", "links_to", "relation_edges",
            "fact_edges", "entity_nodes",
        )
    }
    result = _QUERIES[args.query](graph, args.relation)
    write_text_sink(result, args.output)  # K4 dirty-tuple text sink
    spark.stop()


if __name__ == "__main__":
    main()
