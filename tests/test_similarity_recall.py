"""Recall pin for the LSH-bucketed embedding near-dup.

The driver oracle for ``dedup_embedding_neardup`` is the EXACT all-pairs
threshold join; the shipped Spark plan generates candidates per LSH
(table, bucket). Those only agree when bucket recall of qualifying pairs
is total — which is a *deterministic* property of the fixed corpora and
the deterministic splitmix64 planes. This test recomputes both sides in
numpy (exact integer math, same quantization) and asserts:

- zero missed pairs at every sf the driver/bench touch, and
- a ≥2-table collision margin, so a single marginal bucket flip cannot
  silently break the oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from dstlr_spark.queries.similarity import (
    DIM,
    NEARDUP_BITS,
    NEARDUP_TABLES,
    NEARDUP_TAU_PPM,
    QUANT,
    _neardup_plane,
)


def _load(sf_dir: str):
    import duckdb

    rows = duckdb.sql(
        f"select vec_id, embedding from '{sf_dir}/embeddings.parquet' order by vec_id"
    ).fetchall()
    q = np.array(
        [np.floor(np.array(r[1], dtype=np.float64) * QUANT) for r in rows]
    ).astype(np.int64)
    return q


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_neardup_lsh_recall_is_total_with_margin(sf):
    q = _load(f"/root/testdata/sf{sf}")
    n = len(q)
    norms = (q * q).sum(1)
    dots = q @ q.T
    denom = np.sqrt(norms[:, None].astype(np.float64)) * np.sqrt(
        norms[None, :].astype(np.float64)
    )
    ppm = np.floor(dots / denom * 1e6).astype(np.int64)
    iu = np.triu_indices(n, 1)
    qualifying = ppm[iu] >= NEARDUP_TAU_PPM
    assert qualifying.sum() > 0  # the pin is vacuous otherwise

    planes = np.array(
        [
            [_neardup_plane(t, j) for j in range(NEARDUP_BITS)]
            for t in range(NEARDUP_TABLES)
        ],
        dtype=np.int64,
    )
    signs = np.einsum("tbd,nd->tbn", planes, q) >= 0
    buckets = np.zeros((NEARDUP_TABLES, n), dtype=np.int64)
    for j in range(NEARDUP_BITS):
        buckets += signs[:, j, :].astype(np.int64) << j
    hits = np.zeros(iu[0].shape, dtype=np.int32)
    for t in range(NEARDUP_TABLES):
        hits += buckets[t][iu[0]] == buckets[t][iu[1]]
    assert int((qualifying & (hits == 0)).sum()) == 0  # total recall
    assert int(hits[qualifying].min()) >= 2  # margin: no single-flip fragility


def test_neardup_planes_are_independent_across_tables():
    """Guard against regressing to a small shared lattice: distinct
    (t, j) seeds must yield distinct planes."""
    seen = {
        tuple(_neardup_plane(t, j))
        for t in range(NEARDUP_TABLES)
        for j in range(NEARDUP_BITS)
    }
    assert len(seen) == NEARDUP_TABLES * NEARDUP_BITS
