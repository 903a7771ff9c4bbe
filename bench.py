#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs the engine's flagship queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and reports
per-query wall seconds plus pipeline throughput (docs/s, triples/s —
the reference's own metric, ExtractTriples.scala:140).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from dstlr_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    # workers must import dstlr_spark regardless of the invoking cwd
    import __spark_entry__ as _entry_mod

    _entry_mod._ensure_workers_can_import(spark)

    from dstlr_spark.operators.clean import supporting_information
    from dstlr_spark.queries.doc_kg import _documents, _kg
    from dstlr_spark.queries import all_queries

    timings: dict[str, float] = {}
    counters: dict[str, int] = {}

    def timed(name: str, fn, repeats: int = 3):
        """Best-of-N: the first run pays whole-stage-codegen JIT (a fresh
        JVM cost a long-lived cluster never sees) and host steal load
        fluctuates ±30%+, so best-of-3 keeps noise from masquerading as
        regressions (the r2 +48% on dedup_minhash_pairs lesson)."""
        best, out = None, None
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        return out

    # q1: full KG pipeline — the flagship: fused single-pass extraction
    # (mentions + relations + links in ONE Arrow stage, zero shuffles)
    from dstlr_spark.operators.extract import extract_bag_fused
    from dstlr_spark.queries.doc_kg import COOCCUR_WINDOW, _aliases, _gazetteer

    docs = _documents(spark, sf_dir).repartition(max(cpus, 8))
    n_docs = docs.count()

    def run_pipeline():
        return extract_bag_fused(
            docs, _gazetteer(spark), _aliases(spark), COOCCUR_WINDOW, 10_000
        ).count()

    n_triples = timed("kg_pipeline", run_pipeline)

    # q2: graph materialize + supporting-information join chain
    def run_clean():
        kg = _kg(spark, sf_dir)
        n = supporting_information(kg.graph()).count()
        kg.unpersist()
        return n

    counters["supporting_rows"] = timed("kg_clean_supporting", run_clean)

    # q2b: reference-shaped end-to-end (transcripts → assemble → PATTERN
    # annotator → link → triples) on a seeded transcript corpus — the
    # doc/s + triple/s the reference's own instrumentation prints
    # (ExtractTriples.scala:140); our annotator is deterministic, so this
    # measures the pipeline, not a model
    from dstlr_spark.operators.assembly import assemble_documents
    from dstlr_spark.operators.extract import extract_triples_pattern
    from dstlr_spark.sources.fixtures import alias_dict
    from dstlr_spark.sources.transcripts import generate_transcripts

    n_convs = max(200, int(2000 * (sf / 0.1))) if sf > 0 else 500
    transcripts = generate_transcripts(spark, n_convs=n_convs).persist()
    n_convs_real = transcripts.select("conv_id").distinct().count()
    ref_aliases = alias_dict(spark)

    def pattern_e2e():
        docs = assemble_documents(transcripts).repartition(max(cpus, 8))
        # fused in-annotator linking: ONE annotator pass for mentions +
        # relations + LINKS_TO (the union-with-link_mentions shape runs
        # the annotator stage twice)
        return extract_triples_pattern(docs, alias_dict=ref_aliases).count()

    counters["pattern_triples"] = timed("kg_pattern_e2e", pattern_e2e)
    counters["pattern_convs"] = n_convs_real
    transcripts.unpersist()

    # q3: assembly round-trip (shred + reassemble the corpus)
    qs = all_queries()
    counters["assembly_rows"] = timed(
        "kg_assembly_roundtrip", lambda: qs["kg_assembly_roundtrip"](spark, sf_dir).count()
    )

    # registered non-KG headline queries — names asserted against the
    # registry so a rename can't silently drop a benchmark
    for name in (
        "dedup_minhash_pairs",
        "sim_topk_cosine",
        "text_quality_score",
        "dedup_embedding_neardup",  # LSH-bucketed two-stage (r2 rewrite)
        "sim_kmeans_iters",
        "kg_entity_pagerank",
        "curate_decision",  # composite keep/drop verdict — one scan, no shuffle
        "curate_decontaminate",  # eval-gram broadcast vs staged posting list
        "rel_bilateral_trade",  # Q7 shape: fact shuffles + broadcast dims
        "curate_lm_surprisal",  # bigram-LM train + held-out scoring joins
        "conv_sessionize",  # conv-partitioned windows + session hash agg
        "kg_triple_temporal",  # mention→turn attribution + 2-sided linking
        "conv_sft_pairs",  # transcript → (prompt, response) training pairs
        "kg_ppr_anchored",  # sparse-frontier personalized PageRank
        "sim_hard_negatives",  # label-filtered contrastive mining
        "events_scd2",  # CDC change-compression + validity intervals
        "mm_phash_groups",  # decode + in-stage aHash + key aggregate
    ):
        assert name in qs, f"headline query {name!r} missing from registry"
        counters[f"{name}_rows"] = timed(
            name, lambda n=name: qs[n](spark, sf_dir).count()
        )

    # The cross-round comparator is PINNED to the round-3 headline set:
    # growing the headline total with each round's additions made r4's
    # 17-query total read as a regression when the shared-13 subtotal
    # had actually improved (r4 verdict finding #4). `value` is the
    # comparator total; round additions are timed and reported in their
    # own block, never folded into the comparator.
    COMPARATOR = (
        "kg_pipeline",
        "kg_clean_supporting",
        "kg_pattern_e2e",
        "kg_assembly_roundtrip",
        "dedup_minhash_pairs",
        "sim_topk_cosine",
        "text_quality_score",
        "dedup_embedding_neardup",
        "sim_kmeans_iters",
        "kg_entity_pagerank",
        "curate_decision",
        "curate_decontaminate",
        "rel_bilateral_trade",
    )
    missing = [q for q in COMPARATOR if q not in timings]
    assert not missing, f"comparator queries not timed: {missing}"
    total = round(sum(timings[q] for q in COMPARATOR), 3)
    additions = {q: t for q, t in timings.items() if q not in COMPARATOR}
    pipeline_sec = timings["kg_pipeline"]
    pat_sec = timings.get("kg_pattern_e2e")
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "comparator_queries": list(COMPARATOR),
        "additions_this_round": additions,
        "additions_total": round(sum(additions.values()), 3),
        "queries": timings,
        "n_registry_queries": len(qs),
        "sf": sf,
        "cpus": cpus,
        "docs": n_docs,
        "triples": n_triples,
        "docs_per_sec": round(n_docs / pipeline_sec, 1) if pipeline_sec else None,
        "triples_per_sec": round(n_triples / pipeline_sec, 1) if pipeline_sec else None,
        "pattern_convs": counters.get("pattern_convs"),
        "pattern_docs_per_sec": (
            round(counters["pattern_convs"] / pat_sec, 1) if pat_sec else None
        ),
        "pattern_triples_per_sec": (
            round(counters["pattern_triples"] / pat_sec, 1) if pat_sec else None
        ),
    }
    result["deltas_vs_prev"] = _deltas_vs_prev(timings)
    spark.stop()
    print(json.dumps(result))


def _deltas_vs_prev(timings: dict[str, float]) -> dict:
    """Per-query regression view vs the newest BENCH_r{N}.json the driver
    recorded: positive delta = slower than last round."""
    import re

    here = Path(__file__).resolve().parent
    rounds = sorted(
        (int(m.group(1)), p)
        for p in here.glob("BENCH_r*.json")
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", p.name))
    )
    if not rounds:
        return {"prev_round": None}
    n, path = rounds[-1]
    try:
        rec = json.loads(path.read_text())
        # the driver wraps our JSON line under "parsed"
        prev = rec.get("parsed", rec).get("queries", {})
    except (OSError, json.JSONDecodeError, AttributeError):
        return {"prev_round": None}
    return {
        "prev_round": n,
        **{
            q: round(t - prev[q], 3)
            for q, t in timings.items()
            if q in prev
        },
    }


if __name__ == "__main__":
    main()
