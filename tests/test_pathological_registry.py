"""Registry-wide pathological-input survival: every driver-contract
query must EXECUTE (not necessarily emit rows) on a corpus of nulls,
empties, unicode, digit-runs, zero embeddings, and null event fields.

Real 100 TB corpora contain all of these; ANSI mode turns an unguarded
ratio into a job-killing DIVIDE_BY_ZERO, an Arrow batch with a None
payload kills the stage, a zero vector breaks every cosine. Found and
fixed this way: curate_decision (empty-doc DIV), synth_media (null
payloads), _emb_build (zero-norm vectors), q_entity_pagerank
(driver-side // on an empty vertex set)."""

from __future__ import annotations

import datetime
import random

import pytest


@pytest.fixture(scope="module")
def patho_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("patho_sf"))
    docs = [
        (0, None, None, "s", None),
        (1, "", "en", "s", 0),
        (2, "x", "en", "s", 1),
        (3, "héllo wörld 模型 🚀 the of", "zh", "s", 20),
        (4, "a" * 5000, "en", "s", 5000),
        (5, "1234567890 999 000", "en", "s", 18),
        (6, "the the the the the", "en", "s", 19),
        (7, "normal words appear here with the of and to in tokens " * 3,
         "en", "s", 150),
        (97, "shared gram alpha beta gamma delta", "en", "s", 30),
        (194, "shared gram alpha beta gamma delta epsilon", "en", "s", 40),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    random.seed(7)
    emb = [(0, [0.0] * 64, 0)] + [
        (i, [random.uniform(-1, 1) for _ in range(64)], i % 3)
        for i in range(1, 60)
    ]
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")

    ts = datetime.datetime(2024, 1, 1)
    ev = [
        (0, None, 1, "view", 1.0, None),
        (1, ts, None, "click", None, "{}"),
        (2, ts + datetime.timedelta(hours=1), 1, None, 2.0, "{}"),
        (3, ts + datetime.timedelta(hours=2), 1, "purchase", 3.0, "{}"),
        (4, ts + datetime.timedelta(days=1), 2, "view", 1.0, "{}"),
        (5, ts + datetime.timedelta(days=1, hours=1), 2, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(50)
        all_null = spark.createDataFrame(
            [tuple(None for _ in df.schema)], df.schema
        )
        df.unionByName(all_null).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_registry_query_survives_pathological_corpus(spark, patho_dir):
    import __spark_entry__ as em

    failures = []
    for name, fn in em.queries().items():
        try:
            fn(spark, patho_dir).count()
        except Exception as e:  # noqa: BLE001 — we want the full census
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, failures


def test_repetition_handles_one_long_repetitive_doc_fast(spark, tmp_path):
    """Round-3 regression: the old distinct×filter top-2-gram loop was
    O(distinct × n) comparisons inside a single task — a 200k-token
    repetitive doc (50k distinct 2-grams) meant ~10^10 comparisons and
    a multi-minute stall. The sorted-run-length rewrite finishes the
    same doc in seconds, with the exact expected counts."""
    import time

    from dstlr_spark.queries.textstats import q_repetition

    n_tokens = 200_000
    # 50k distinct tokens cycled 4× → every 2-gram occurs exactly 4
    # times except the wrap-around grams; top multiplicity is 4.
    vocab = 50_000
    text = " ".join(f"w{i % vocab}" for i in range(n_tokens))
    d = str(tmp_path / "bigdoc")
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")

    t0 = time.monotonic()
    row = q_repetition(spark, d).collect()[0]
    elapsed = time.monotonic() - t0
    assert row["n_2grams"] == n_tokens - 1
    assert row["top_2gram_count"] == 4
    assert elapsed < 60, elapsed
