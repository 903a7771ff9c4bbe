"""Curation-layer operators (queries/curation.py): PII scrub,
decontamination, composite decision, tf-idf, HLL registers, funnel,
retention. Value equivalence vs DuckDB is exercised by
scripts/check_oracles.py; these pin semantics and plan shapes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pii_scrub_counts_and_redaction(spark):
    from dstlr_spark.queries.curation import PII_EMAIL, PII_IPV4, PII_NUMBER

    df = spark.createDataFrame(
        [("1", "mail a@b.com or c.d+x@e.org via 10.0.0.1 port 8080"),
         ("2", "no pii at all")],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).alias("e"),
            F.size(F.regexp_extract_all("text", F.lit(PII_IPV4), 0)).alias("i"),
            F.size(F.regexp_extract_all("text", F.lit(PII_NUMBER), 0)).alias("n"),
        ).collect()
    }
    assert (out["1"]["e"], out["1"]["i"]) == (2, 1)
    assert out["1"]["n"] >= 1  # the port digits (IP digits consumed first? no —
    # counts are over the RAW text, so all digit runs count)
    assert (out["2"]["e"], out["2"]["i"], out["2"]["n"]) == (0, 0, 0)

    # redaction order email → ip → number, byte-exact
    red = "mail <EMAIL> or <EMAIL> via <IP> port <NUM>"
    expected_md5 = hashlib.md5(red.encode()).hexdigest()
    row = (
        df.where(F.col("doc_id") == "1")
        .select(
            F.md5(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
                        PII_IPV4, "<IP>",
                    ),
                    PII_NUMBER, "<NUM>",
                )
            ).alias("m")
        )
        .head()
    )
    assert row["m"] == expected_md5


def test_curation_decision_exercises_both_branches(spark):
    from dstlr_spark.queries.curation import q_curation_decision

    rows = q_curation_decision(spark, SF_DIR).collect()
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert kept and dropped, "bounds must split the corpus, not rubber-stamp it"
    assert all(r["reason_mask"] == 0 for r in kept)
    assert all(r["reason_mask"] > 0 for r in dropped)


def test_decontaminate_broadcasts_eval_side_and_reuses_staged_shingles(spark):
    from dstlr_spark.queries.curation import EVAL_SPLIT_MOD, q_decontaminate

    df = q_decontaminate(spark, SF_DIR)
    plan = _plan(spark, df)
    assert "BroadcastHashJoin" in plan  # eval gram set broadcast
    assert "ExistingRDD" in plan  # staged shingle posting list reused
    # eval docs never appear as training-side hits
    ids = [int(r["doc_id"]) for r in df.collect()]
    assert ids and all(i % EVAL_SPLIT_MOD != 0 for i in ids)


def test_tfidf_topk_bounded_and_deterministic(spark):
    from dstlr_spark.queries.curation import TFIDF_TOPK, q_tfidf_topk

    rows = q_tfidf_topk(spark, SF_DIR)
    per_doc = (
        rows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("k")).collect()
    )
    assert per_doc and all(r["k"] <= TFIDF_TOPK for r in per_doc)
    a = sorted(map(tuple, rows.collect()))
    b = sorted(map(tuple, q_tfidf_topk(spark, SF_DIR).collect()))
    assert a == b  # deterministic tie-break (score desc, token asc)


def test_hll_registers_estimate_tracks_exact_distinct(spark):
    from dstlr_spark.queries.curation import hll_estimate, q_hll_registers

    regs = [(r["bucket"], r["max_rho"]) for r in q_hll_registers(spark, SF_DIR).collect()]
    assert all(0 <= b < 256 and rho >= 1 for b, rho in regs)
    est = hll_estimate(regs)
    exact = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert abs(est - exact) / exact < 0.25, (est, exact)


def test_hll_estimate_above_linear_counting_regime(spark):
    """Pin the estimator OUTSIDE the linear-counting branch (n ≫ 2.5·m):
    the round-3 nibble-rho bug returned ~4% of truth at n = 20,000 and
    the sf0.001 pin (n ≈ 35 distinct) never left the masking branch.
    HLL std error with m = 256 is 1.04/√256 ≈ 6.5%; allow 3σ."""
    from dstlr_spark.queries.curation import (
        HLL_BUCKETS,
        hll_estimate,
        hll_registers_of_tokens,
    )

    n = 20_000
    assert n > 2.5 * HLL_BUCKETS
    tok = spark.range(n).select(
        F.concat(F.lit("tok_"), F.col("id").cast("string")).alias("token")
    )
    regs = [
        (r["bucket"], r["max_rho"])
        for r in hll_registers_of_tokens(tok).collect()
    ]
    est = hll_estimate(regs)
    assert abs(est - n) / n < 0.20, (est, n)


def test_funnel_is_monotone_and_retention_has_day_zero(spark):
    from dstlr_spark.queries.curation import q_events_funnel, q_events_retention

    stages = {r["stage"]: r["n_users"] for r in q_events_funnel(spark, SF_DIR).collect()}
    assert set(stages) == {1, 2, 3}
    assert stages[1] >= stages[2] >= stages[3] > 0

    ret = q_events_retention(spark, SF_DIR).collect()
    assert all(r["day_offset"] >= 0 for r in ret)
    cohorts = {r["cohort"] for r in ret}
    day0 = {r["cohort"] for r in ret if r["day_offset"] == 0}
    assert cohorts == day0  # every cohort is active on its first day


def test_bloom_bits_membership_and_fpr(spark):
    """The bloom bit set accepts every eval gram (no false negatives,
    by construction) and its measured false-positive rate on absent
    probes tracks the (set_bits/M)^K prediction."""
    import hashlib

    from dstlr_spark.queries.curation import (
        BLOOM_K,
        EVAL_SPLIT_MOD,
        bloom_m_for,
        q_bloom_bits,
    )
    from dstlr_spark.queries.dedup import _staged_shingles

    n_grams = (
        _staged_shingles(spark, SF_DIR)
        .where((F.col("doc_id").cast("long") % EVAL_SPLIT_MOD) == 0)
        .select("shingle")
        .distinct()
        .count()
    )
    m = bloom_m_for(n_grams)
    bits = {r["bit_pos"] for r in q_bloom_bits(spark, SF_DIR).collect()}
    assert bits and max(bits) < m and min(bits) >= 0
    # auto-sizing invariant: the filter can never be saturated
    assert len(bits) / m < 0.5, (len(bits), m)

    def positions(gram: str):
        return [
            int(hashlib.md5(f"b{i}|{gram}".encode()).hexdigest()[:8], 16) % m
            for i in range(BLOOM_K)
        ]

    probes = [f"absent gram number {i}" for i in range(2000)]
    fp = sum(1 for g in probes if all(p in bits for p in positions(g)))
    predicted = (len(bits) / m) ** BLOOM_K
    assert fp / len(probes) < max(0.05, 4 * predicted), (fp, predicted)


def test_bloom_autosize_survives_250k_grams(spark):
    """The round-3 saturation probe: 250k distinct grams through a
    fixed M = 4096 filter set every bit (all-pass). With bloom_m_for
    sizing, the fill ratio stays under the e^(-K/15) design point and
    the filter keeps discriminating."""
    from dstlr_spark.queries.curation import bloom_m_for, bloom_bit_positions

    n = 250_000
    m = bloom_m_for(n)
    assert m >= 15 * n
    ev = spark.range(n).select(
        F.concat(F.lit("gram "), F.col("id").cast("string")).alias("shingle")
    )
    set_bits = bloom_bit_positions(ev, m).count()
    fill = set_bits / m
    assert fill < 0.25, (set_bits, m)  # design point ≈ 0.18
    predicted_fpr = fill ** 3
    assert predicted_fpr < 0.02, predicted_fpr


def test_curation_decision_survives_pathological_docs(spark, tmp_path):
    """Null and empty text must produce a deterministic DROP verdict
    (too_short), never a null verdict or an ANSI DIVIDE_BY_ZERO."""
    from dstlr_spark.queries.curation import REASON_TOO_SHORT, q_curation_decision

    df = spark.createDataFrame(
        [("a", None), ("b", ""), ("c", "one"),
         ("d", "the of and to in " * 20)],
        "doc_id string, text string",
    )
    p = str(tmp_path / "documents.parquet")
    df.write.parquet(p)
    rows = {r["doc_id"]: r for r in q_curation_decision(spark, str(tmp_path)).collect()}
    assert len(rows) == 4
    for did in ("a", "b", "c"):
        assert rows[did]["keep"] is False
        assert rows[did]["reason_mask"] & REASON_TOO_SHORT
    assert rows["d"]["keep"] in (True, False)  # computed, not null


def test_zorder_buckets_bound_both_dimensions(spark):
    """Z-order locality: every file bucket confines BOTH dimensions to
    a 2^(BITS-2)-wide block (top 2 bits of each dim fixed by the top 4
    z bits) — the property that makes per-file min/max stats prune on
    either predicate."""
    from dstlr_spark.queries.relational import ZORDER_BITS, q_events_zorder

    rows = q_events_zorder(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 1, "sf corpus must spread over multiple buckets"
    block = 1 << (ZORDER_BITS - 2)
    for r in rows:
        assert r["max_user"] - r["min_user"] < block, r
        assert r["max_day"] - r["min_day"] < block, r
    assert sum(r["n_events"] for r in rows) == (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(
            "ts IS NOT NULL AND user_id IS NOT NULL AND user_id >= 0 "
            "AND CAST(CAST(ts AS TIMESTAMP) AS LONG) >= 0"
        )
        .count()
    )


def test_cms_estimate_bounds(spark):
    """Count-min guarantees: estimate(token) ≥ true count for every
    token, and total overcount respects the e/W bound in expectation
    (checked loosely: the top-frequency token's estimate is within
    N·e/W of truth)."""
    import math
    from collections import Counter

    from dstlr_spark.queries.curation import CMS_W, cms_estimate, q_cms_counters

    sf = "/root/testdata/sf0.001"
    counters = {
        (r["row"], r["col"]): r["n"] for r in q_cms_counters(spark, sf).collect()
    }
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
        if r["text"]
    ]
    truth = Counter(t for txt in texts for t in txt.split(" ") if t)
    n_total = sum(truth.values())
    slack = math.e / CMS_W * n_total
    for tok, true_n in truth.most_common(30):
        est = cms_estimate(counters, tok)
        assert est >= true_n, (tok, est, true_n)
        assert est <= true_n + 3 * slack, (tok, est, true_n, slack)


def test_token_budget_mid_band_cut_is_doc_id_ordered(spark, tmp_path):
    """All docs share one quality score (single band), so the budget cut
    lands mid-band and the kept set is decided purely by the intra-band
    doc_id ordering — the exact case the band decomposition must get
    right. Pinned against a pure-Python global cumsum."""
    # identical text → identical score; doc_ids chosen to make
    # lexicographic order differ from numeric order ("10" < "9")
    text = "alpha beta gamma delta epsilon zeta"
    ids = [str(i) for i in range(3, 13)]
    df = spark.createDataFrame(
        [(i, text, "en", len(text)) for i in ids],
        "doc_id string, text string, lang string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from dstlr_spark.queries.curation import q_token_budget

    got = {
        r["doc_id"]: (r["cum_tokens"], r["kept"])
        for r in q_token_budget(spark, str(tmp_path)).collect()
    }
    n_toks = len(text.split(" "))
    total = n_toks * len(ids)
    cum, want = 0, {}
    for d in sorted(ids):  # same score → global order is doc_id asc
        cum += n_toks
        want[d] = (cum, int(cum <= total // 2))
    assert got == want
    # the cut really is mid-band: some kept, some dropped
    kept = {d for d, (_, k) in got.items() if k}
    assert 0 < len(kept) < len(ids)


def test_lm_surprisal_ranks_unseen_text_above_in_domain(spark, tmp_path):
    """Held-out docs made of train-frequent bigrams must score strictly
    below docs made of never-seen tokens; only did % 10 == 0 docs are
    scored; surprisal is non-negative by the add-one construction."""
    from dstlr_spark.queries.curation import q_lm_surprisal

    train = [(str(i), "the cat sat on the mat " * 5) for i in range(1, 10)]
    heldout = [("10", "the cat sat on the mat"), ("20", "zq xv qqj wpl zq kfg")]
    df = spark.createDataFrame(train + heldout, "doc_id string, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in q_lm_surprisal(spark, str(tmp_path)).collect()}
    assert set(rows) == {"10", "20"}  # the held-out tenth only
    assert rows["10"]["avg_surprisal_ppm"] < rows["20"]["avg_surprisal_ppm"]
    assert all(r["sum_surprisal"] >= 0 for r in rows.values())


def test_blocklist_hard_drops_and_soft_threshold(spark, tmp_path):
    """Any hard hit drops the doc regardless of share; soft hits drop
    only past the ppm threshold; clean docs keep. Corpus-level: both
    verdicts must occur on the synthetic docs."""
    from dstlr_spark.queries.curation import (
        BLOCKLIST_SOFT_MAX_PPM,
        q_blocklist,
    )

    df = spark.createDataFrame(
        [("1", "clean text only here"),
         ("2", "dup " + "clean text " * 50),       # hard hit, tiny share
         ("3", "slow " * 9 + "ok " * 91),          # soft 9% > 7% cap
         ("4", "slow " + "ok " * 99)],             # soft 1% ≤ cap
        "doc_id string, text string",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in q_blocklist(spark, str(tmp_path)).collect()}
    assert rows["1"]["keep"] == 1 and rows["1"]["n_hard"] == 0
    assert rows["2"]["keep"] == 0 and rows["2"]["n_hard"] == 1
    assert rows["3"]["keep"] == 0
    assert rows["3"]["soft_share_ppm"] > BLOCKLIST_SOFT_MAX_PPM
    assert rows["4"]["keep"] == 1
    assert rows["4"]["soft_share_ppm"] <= BLOCKLIST_SOFT_MAX_PPM

    both = q_blocklist(spark, SF_DIR).groupBy("keep").count().collect()
    assert {r["keep"] for r in both} == {0, 1}, "corpus must split"


def test_events_scd2_suppresses_noops_and_chains_intervals(spark, tmp_path):
    """Hand CDC stream: A,A,B,A for user 1 → versions A/B/A (the
    middle no-op A is suppressed); intervals chain exactly (each
    valid_to = the next version's valid_from) and only the last is
    current. User 2's single event is version 1 and current; a
    NULL-user and a NULL-ts record are dropped, and a NULL state
    counts as a real state change (IS DISTINCT FROM semantics)."""
    import datetime

    from dstlr_spark.queries.relational import q_events_scd2

    t0 = datetime.datetime(2024, 1, 1)

    def at(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        (1, at(0), 1, "A", 1.0, "{}"),
        (2, at(10), 1, "A", 1.0, "{}"),   # no-op: suppressed
        (3, at(20), 1, "B", 1.0, "{}"),
        (4, at(30), 1, "A", 1.0, "{}"),   # back to A: NEW version
        (5, at(0), 2, "X", 1.0, "{}"),
        (6, at(5), 2, None, 1.0, "{}"),   # NULL state: a change
        (7, at(0), None, "A", 1.0, "{}"),  # keyless: dropped
        (8, None, 3, "A", 1.0, "{}"),      # timeless: dropped
    ]
    d = str(tmp_path / "scd")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")

    out = sorted(
        q_events_scd2(spark, d).collect(),
        key=lambda r: (r.user_id, r.version),
    )
    u1 = [r for r in out if r.user_id == 1]
    assert [(r.version, r.state, r.is_current) for r in u1] == [
        (1, "A", 0), (2, "B", 0), (3, "A", 1)
    ]
    # intervals chain: each close equals the next open; last is open
    assert [r.valid_to for r in u1[:-1]] == [r.valid_from for r in u1[1:]]
    assert u1[-1].valid_to is None
    u2 = [r for r in out if r.user_id == 2]
    assert [(r.version, r.state, r.is_current) for r in u2] == [
        (1, "X", 0), (2, None, 1)
    ]
    assert {r.user_id for r in out} == {1, 2}  # null key/ts rows dropped
