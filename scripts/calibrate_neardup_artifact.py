#!/usr/bin/env python
"""Regenerate the checked near-dup LSH calibration artifact.

The production config (NEARDUP_PROD_BITS / NEARDUP_PROD_TABLES) is
justified by an offline calibration against the test corpus
(``calibrate_neardup``). That justification is corpus-coupled: if the
driver regenerates ``/root/testdata`` with different embeddings, the
recall pin could quietly rest on stale evidence. This script freezes
the calibration outcome — corpus stats + the cheapest complete config —
into ``tests/artifacts/neardup_calibration.json``; the paired test
re-derives the same facts from the live corpus and fails LOUDLY (with
the command to re-run) on any drift.

Usage: python scripts/calibrate_neardup_artifact.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ARTIFACT = Path(__file__).resolve().parents[1] / "tests" / "artifacts" / (
    "neardup_calibration.json"
)


def corpus_facts(sf_dir: str) -> dict:
    """Same quantized load as tests/test_similarity_recall._load —
    floor(embedding · QUANT), rows ordered by vec_id."""
    import duckdb
    import numpy as np

    from dstlr_spark.queries.similarity import (
        NEARDUP_PROD_TAU_PPM,
        QUANT,
        calibrate_neardup,
    )

    rows = duckdb.sql(
        f"select vec_id, embedding from '{sf_dir}/embeddings.parquet' "
        "order by vec_id"
    ).fetchall()
    q = np.array(
        [np.floor(np.array(r[1], dtype=np.float64) * QUANT) for r in rows]
    ).astype(np.int64)
    norms = (q * q).sum(1).astype(np.float64)
    ppm = np.floor(
        (q @ q.T) / (np.sqrt(norms)[:, None] * np.sqrt(norms)[None, :]) * 1e6
    ).astype(np.int64)
    qual = int(np.triu(ppm >= NEARDUP_PROD_TAU_PPM, 1).sum())
    configs = calibrate_neardup(
        q, NEARDUP_PROD_TAU_PPM, bits_options=(12,), max_tables=8
    )
    return {
        "sf_dir": sf_dir,
        "n_vectors": int(len(q)),
        "prod_tau_ppm": NEARDUP_PROD_TAU_PPM,
        "qualifying_pairs_at_prod_tau": qual,
        "cheapest_complete_config": configs[0] if configs else None,
    }


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    facts = corpus_facts(sf_dir)
    ARTIFACT.parent.mkdir(parents=True, exist_ok=True)
    ARTIFACT.write_text(json.dumps(facts, indent=2) + "\n")
    print(f"wrote {ARTIFACT}:\n{json.dumps(facts, indent=2)}")
