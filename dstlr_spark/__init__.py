"""dstlr_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the dstlr reference pipeline
(`/root/reference`, Scala/CoreNLP/Solr/Neo4j) as idiomatic PySpark:
DataFrame/SQL transforms optimized by Catalyst, Arrow-vectorized pandas
UDFs only where built-ins cannot express the semantics, partitioned
columnar node/edge tables instead of a graph database.

Pipeline (see SURVEY.md):
    transcripts --assemble--> documents --extract--> triples
        --link--> LINKS_TO edges --enrich--> ground-truth facts
        --canonicalize--> canonical entity ids
        --materialize--> mentions/links/relations/facts/entities tables
        --clean queries--> supporting / inconsistent / missing reports
"""

__version__ = "0.1.0"
