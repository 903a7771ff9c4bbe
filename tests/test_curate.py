"""End-to-end curation job: documents → sampled/deduped/filtered docs +
context chunks, with each stage's effect observable."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_curate_pipeline_end_to_end(spark, tmp_path):
    from jobs.curate import curate

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    # plant an exact duplicate and a pathological stopword doc
    extra = spark.createDataFrame(
        [("zzz-dup", base.first()["text"]), ("zzz-stop", "the of and the to in the")],
        "doc_id string, text string",
    )
    inp = str(tmp_path / "docs")
    base.unionByName(extra).write.parquet(inp)

    # sample everything (threshold 'g' > any md5 hex) to test downstream stages
    curated, chunks = curate(spark, inp, "g", max_stop_ratio_ppm=500_000)
    docs = {r["doc_id"]: r["n_tokens"] for r in curated.collect()}

    assert "zzz-stop" not in docs          # quality filter
    first_id = base.first()["doc_id"]
    # exact dedup: the planted duplicate loses to the smaller doc_id
    assert ("zzz-dup" in docs) != (first_id in docs) or "zzz-dup" not in docs

    ch = chunks.collect()
    assert len(ch) > len(docs) * 0  # chunks exist
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every curated doc chunks; chunk 0 prefixes the doc text
    assert set(by_doc) == set(docs)
    texts = {r["doc_id"]: r["text"] for r in spark.read.parquet(inp).collect()}
    for d, rows in list(by_doc.items())[:20]:
        c0 = next(r["chunk_text"] for r in rows if r["chunk_idx"] == 0)
        assert texts[d].startswith(c0.split(" ")[0])
        assert texts[d].startswith(c0) or len(c0.split(" ")) == 64


def test_curate_repetition_filter(spark, tmp_path):
    """Stage 4b: a loopy doc (one 2-gram repeated throughout) is dropped
    at a tight dup-2gram bound and kept at the permissive default."""
    from jobs.curate import curate

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    extra = spark.createDataFrame(
        [("zzz-loop", "spam " * 49 + "spam")], "doc_id string, text string"
    )
    inp = str(tmp_path / "docs")
    base.unionByName(extra).write.parquet(inp)

    kept_default, _ = curate(spark, inp, "g", 1_000_000)
    assert "zzz-loop" in {r["doc_id"] for r in kept_default.collect()}

    kept_tight, _ = curate(spark, inp, "g", 1_000_000, max_dup_2gram_ppm=500_000)
    ids = {r["doc_id"] for r in kept_tight.collect()}
    assert "zzz-loop" not in ids
    assert len(ids) > 0  # normal word-salad docs survive the bound


def test_curate_deterministic_sample(spark, tmp_path):
    from jobs.curate import curate

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    inp = str(tmp_path / "docs")
    base.write.parquet(inp)
    hex10 = "1" + "9" * 31
    a, _ = curate(spark, inp, hex10, 1_000_000)
    b, _ = curate(spark, inp, hex10, 1_000_000)
    ra = sorted(r["doc_id"] for r in a.collect())
    rb = sorted(r["doc_id"] for r in b.collect())
    assert ra == rb and 0 < len(ra) < base.count()  # ≈10%, stable


def test_curate_pii_and_decontamination_stages(spark, tmp_path):
    """Stage 0 redacts before hashing (the planted email never reaches
    the output); stage 3c drops the doc that collides with the eval
    gram set and leaves the rest untouched."""
    from jobs.curate import curate

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    extra = spark.createDataFrame(
        [("zzz-pii", "contact me at leak@example.com for the the of and secret")],
        "doc_id string, text string",
    )
    inp = str(tmp_path / "docs")
    base.unionByName(extra).write.parquet(inp)

    # eval grams = the 13-token grams (the job's production n) of one
    # corpus doc → that doc is contaminated by construction; word-salad
    # neighbors are not (13-grams don't background-collide)
    victim = (
        base.where(F.size(F.split("text", " ")) >= 13).orderBy("doc_id").first()
    )
    victim_toks = victim["text"].split(" ")
    grams = [
        " ".join(victim_toks[i : i + 13]) for i in range(len(victim_toks) - 12)
    ]
    eval_grams = spark.createDataFrame([(g,) for g in grams], "shingle string")

    curated, _ = curate(
        spark, inp, "g", 1_000_000, scrub_pii=True, eval_grams=eval_grams
    )
    out = {r["doc_id"]: r["text"] for r in curated.select("doc_id", "text").collect()}
    assert victim["doc_id"] not in out          # decontaminated
    assert "zzz-pii" in out
    assert "leak@example.com" not in out["zzz-pii"]
    assert "<EMAIL>" in out["zzz-pii"]

    # without the flags both docs survive
    curated_plain, _ = curate(spark, inp, "g", 1_000_000)
    plain = {r["doc_id"] for r in curated_plain.select("doc_id").collect()}
    assert victim["doc_id"] in plain and "zzz-pii" in plain


def test_analyze_job_report_tables(spark, tmp_path):
    """jobs/analyze.py: the four release-report tables materialize with
    the same row shapes their oracle-gated operators produce."""
    import os
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "jobs/analyze.py", "--sf-dir",
         "/root/testdata/sf0.001", "--output", str(tmp_path / "report")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "analyze done:" in out.stdout
    card = spark.read.parquet(str(tmp_path / "report/datacard"))
    assert card.count() > 0 and "n_exact_dups" in card.columns
    q = spark.read.parquet(str(tmp_path / "report/quantiles"))
    assert {r["quantile_pct"] for r in q.collect()} == {50, 95, 99}


def test_query_cli_runs_any_registry_query(tmp_path):
    """jobs/query.py: the one-CLI surface over the whole registry —
    --list enumerates every gated query; running one writes parquet."""
    import os
    import subprocess
    import sys

    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    listed = subprocess.run(
        [sys.executable, "jobs/query.py", "--list"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert listed.returncode == 0
    names = listed.stdout.split()
    assert len(names) >= 93 and "kg_mentions" in names

    out = subprocess.run(
        [sys.executable, "jobs/query.py", "--name", "text_token_stats",
         "--sf-dir", "/root/testdata/sf0.001",
         "--output", str(tmp_path / "out")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "text_token_stats: 500 rows" in out.stdout
