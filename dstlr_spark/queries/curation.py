"""Corpus-curation operators over ``documents`` / ``events`` — the
pipeline-decision layer a training-data build runs AFTER the per-doc
signals (textstats) and BEFORE dedup: benchmark decontamination, PII
detection/redaction, a composite keep/drop verdict, TF-IDF keyword
ranking, the mergeable-sketch family (HLL registers = distinct, Bloom
bits = membership, count-min counters = frequency, fixed-width
histogram = quantiles), a per-language data card, and the classic
product-analytics shapes (funnel, cohort retention, exact-integer 3σ
anomalies) over ``events``.

Everything is pure Column expressions (zero Python UDFs) with a DuckDB
oracle; all ratios use exact integer arithmetic (ppm via integer DIV)
so the gate compare is engine-exact — see textstats.q_quality_score
for why fixed-decimal rounding is not portable.

Scale notes (100 TB):
- decontamination joins the corpus shingle posting list against the
  EVAL-side shingle set, which is benchmark-sized (thousands of docs,
  millions of grams — broadcastable); the corpus side is the staged
  posting list shared with the whole dedup module, so adding
  decontamination to a curation run adds zero extra document scans.
- PII / decision / tfidf are embarrassingly parallel map work plus (for
  tfidf) one vocabulary-sized aggregate that broadcasts back.
- the HLL register sketch is the canonical mergeable-sketch shape:
  per-partition partial max per register, one 256-row reduce — the
  same plan Spark uses for approx_count_distinct, but with a portable
  md5-derived register function so DuckDB reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dstlr_spark.queries import _memo
from dstlr_spark.queries.dedup import _SHINGLES_SQL, _staged_shingles
from dstlr_spark.queries.textstats import QUALITY_SCORE_SQL, quality_base_sql

# --- decontamination ---------------------------------------------------------

# Deterministic stand-in for a held-out benchmark: every 97th doc. At
# real scale the eval side is an external benchmark table; the plan
# shape (tiny side broadcast against the corpus posting list) is
# identical.
EVAL_SPLIT_MOD = 97
CONTAM_MIN_HITS = 2  # ≥2 distinct shared n-grams → contaminated


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by n-gram collision (the GPT-3 /
    Llama recipe: a training doc sharing enough distinct n-grams with
    any eval doc is flagged). Reuses the staged 3-gram shingle posting
    list from the dedup module (one corpus scan for both surfaces);
    the eval-side gram set is broadcast — at 100 TB the corpus side
    never shuffles for this, it streams map-side against the benchmark
    gram dictionary.

    GATE-VS-PRODUCTION KNOB: n=3 here deliberately rides the dedup
    shingles so the gate exercises the join on a corpus where
    collisions actually occur (word salad background-matches 94% of
    docs at n=3 — measured at sf0.1). The production recipe is n=13
    (jobs/curate.py's decontamination stage default), where only true
    overlaps collide; same plan shape, different gram length."""
    sh = _staged_shingles(spark, sf_dir)
    is_eval = (F.col("doc_id").cast("long") % EVAL_SPLIT_MOD) == 0
    eval_grams = sh.where(is_eval).select("shingle").distinct()
    hits = (
        sh.where(~is_eval)
        .join(F.broadcast(eval_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return hits.select(
        "doc_id",
        "n_shared_grams",
        (F.col("n_shared_grams") >= CONTAM_MIN_HITS).alias("contaminated"),
    )


# --- PII detection / redaction ----------------------------------------------

# Pattern dialect note: these regexes are valid AND equivalent in Java
# (Spark) and RE2 (DuckDB) — no backrefs, no lookaround. Redaction
# applies them in a fixed order (email → ipv4 → number) so both
# engines produce byte-identical redacted text.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_NUMBER = r"[0-9]+"


def redact_pii(col) -> F.Column:
    """The byte-exact ordered redaction (email → ipv4 → number) — ONE
    definition shared by the gated query and the curate job, because
    the order is load-bearing for oracle md5 parity."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_NUMBER,
        "<NUM>",
    )


#: two-tier blocklist (the C4 badwords shape): any HARD hit drops the
#: document; SOFT hits drop it only past a token-share threshold.
#: Terms chosen from the synthetic vocabulary so both verdicts occur:
#: 'dup' is the planted near-dup marker (rare, ~5% of docs), the soft
#: tier is common corpus noise. Production swaps in the real lists.
BLOCKLIST_HARD: tuple[str, ...] = ("dup",)
BLOCKLIST_SOFT: tuple[str, ...] = ("slow", "big")
BLOCKLIST_SOFT_MAX_PPM = 70_000  # soft share above 7% → drop


def q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering: per-document hard/soft blocklist hit
    counts, the soft token share in floor ppm, and the keep verdict
    (int 1/0) — the C4-style badwords gate every web-scale curation
    pipeline runs before anything model-based.

    Map-only: both tiers are token-membership filters inside one
    higher-order ``filter`` over the already-split token array (no
    join — the lists are query constants; a 10⁵-term production list
    becomes a broadcast join against exploded tokens, same verdict
    semantics). All-integer output, identical floor-div ppm in both
    engines; nothing shuffles, so the operator scales with the scan."""
    hard = ", ".join(f"'{t}'" for t in BLOCKLIST_HARD)
    soft = ", ".join(f"'{t}'" for t in BLOCKLIST_SOFT)
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.split("text", " ").alias("toks"),
        )
    )
    d = d.select(
        "doc_id",
        F.expr(f"size(filter(toks, x -> x IN ({hard})))")
        .cast("long")
        .alias("n_hard"),
        F.expr(f"size(filter(toks, x -> x IN ({soft})))")
        .cast("long")
        .alias("n_soft"),
        F.expr("size(toks)").cast("long").alias("n_toks"),
    )
    return d.select(
        "doc_id",
        "n_hard",
        "n_soft",
        F.expr("n_soft * 1000000 DIV greatest(n_toks, 1)").alias(
            "soft_share_ppm"
        ),
        F.expr(
            "CAST(CASE WHEN n_hard = 0 AND n_soft * 1000000"
            f" DIV greatest(n_toks, 1) <= {BLOCKLIST_SOFT_MAX_PPM}"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("keep"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: per-doc match counts for email /
    IPv4 / digit-run patterns and the md5 of the redacted text
    (placeholders ``<EMAIL>``/``<IP>``/``<NUM>``). Pure JVM-side regex
    — the hot path of a scrub stage is exactly this shape; a model-
    based NER scrubber slots in as a mapInPandas stage behind the same
    schema."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    red = redact_pii(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_IPV4), 0)).alias("n_ipv4"),
        F.size(F.regexp_extract_all("text", F.lit(PII_NUMBER), 0)).alias("n_numbers"),
        F.md5(red).alias("redacted_md5"),
    )


# --- composite curation decision --------------------------------------------

# Gopher-style keep/drop bounds (Rae et al. 2021 app. A shapes; bounds
# tuned to the synthetic corpus so both branches are exercised).
MIN_TOKENS = 40
MAX_TOKENS = 100_000
MEAN_TOKLEN_PPM_MIN = 3_000_000  # mean token length ≥ 3 chars
MEAN_TOKLEN_PPM_MAX = 10_000_000  # ≤ 10 chars
STOP_RATIO_PPM_MIN = 10_000  # ≥1% stopword mass
DIGIT_RATIO_PPM_MAX = 200_000  # ≤20% digit chars

REASON_TOO_SHORT = 1
REASON_TOO_LONG = 2
REASON_TOKLEN = 4
REASON_STOPWORDS = 8
REASON_DIGITS = 16

from dstlr_spark.queries.textstats import (  # one definition, no drift
    QUALITY_SCORE_EXPR,
    QUALITY_SCORE_SQL,
    STOPWORDS as _SW,
    quality_base,
    quality_base_sql,
)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampler — the operator that EXECUTES
    the ``curate_domain_mix`` rebalancing table instead of just
    printing it: per source, keep a document iff
    ``conv(md5(doc_id)[0:8], 16, 10) % 1e6 < keep_ppm`` where keep_ppm
    is the domain-mix equalization weight capped at 1,000,000. The
    hash rank is a pure function of doc_id, so the SAME documents are
    kept on every run, every executor, and every engine — resumable
    sampling with no RNG state, and the DuckDB oracle re-derives the
    exact kept set. Output is dimension-sized: per-source target vs
    achieved keep rate plus kept token mass. (The ~1.6% modulo bias of
    16^8 % 1e6 is identical in both engines and irrelevant to the
    rebalancing purpose; documented, not hidden.)

    Scale shape: the rates frame is source-dimension-sized and
    broadcast; the corpus pays one scan + one source-keyed hash
    aggregate (map-side partials carry it). Nothing corpus-scale
    shuffles, and the sampler composes as a WHERE clause upstream of
    any other operator."""
    rates = q_domain_mix(spark, sf_dir).select(
        "source",
        F.expr("least(1000000L, mix_weight_ppm)").alias("keep_ppm"),
    )
    h_ppm = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT) % 1000000"
    )
    n_toks = F.when(
        F.col("text").isNotNull(),
        F.size(F.split(F.col("text"), " ")).cast("long"),
    )
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id").isNotNull())
        .select("source", h_ppm.alias("h_ppm"), n_toks.alias("n_toks"))
    )
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "keep_ppm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr("CAST(h_ppm < keep_ppm AS LONG)")).alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("h_ppm") < F.col("keep_ppm"), F.col("n_toks"))),
                F.lit(0).cast("long"),
            ).alias("kept_tokens"),
        )
        .select(
            "source",
            "keep_ppm",
            "n_docs",
            "n_kept",
            "kept_tokens",
            F.expr("n_kept * 1000000 DIV greatest(n_docs, 1)").alias(
                "achieved_ppm"
            ),
        )
    )


def q_curation_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite filter verdict: every heuristic filter evaluated
    in ONE pass over the corpus, reported as a reason bitmask + keep
    flag. This is the operator a 100 TB curation run actually executes
    — one scan, one map stage, no shuffle; the per-signal queries in
    textstats are its debugging views."""
    from dstlr_spark.plans.partitioning import fan_out

    # fan_out: single-row-group input; the decision frame is one pure
    # map stage, so scan parallelism IS query parallelism here
    d = fan_out(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
    )
    return curation_decision_frame(d)


def curation_decision_frame(d: DataFrame) -> DataFrame:
    """Operator form of the verdict over any (doc_id, text) frame —
    STATELESS column expressions, so it applies unchanged to a
    Structured Streaming source (the filter-on-ingest path,
    ``stream_curate_decision``)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("long")
    # null text coalesces to 0 tokens/chars (→ too_short, never a null
    # verdict); every ratio guards its divisor — ANSI mode turns an
    # unguarded DIV on an empty doc into a job-killing DIVIDE_BY_ZERO
    base = d.select(
        "doc_id",
        F.coalesce(n, F.lit(0)).alias("n_tokens"),
        F.coalesce(F.length("text").cast("long") - (n - 1), F.lit(0)).alias("tok_chars"),
        F.coalesce(
            F.size(F.filter(toks, lambda t: t.isin(_SW))).cast("long"), F.lit(0)
        ).alias("n_stop"),
        F.coalesce(
            (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", "")))
            .cast("long"),
            F.lit(0),
        ).alias("n_digit_chars"),
        F.coalesce(F.length("text").cast("long"), F.lit(0)).alias("n_chars"),
    )
    mean_len_ppm = F.expr(
        "CASE WHEN n_tokens = 0 THEN 0 ELSE (tok_chars * 1000000L) DIV n_tokens END"
    )
    stop_ppm = F.expr(
        "CASE WHEN n_tokens = 0 THEN 0 ELSE (n_stop * 1000000L) DIV n_tokens END"
    )
    digit_ppm = F.expr(
        "CASE WHEN n_chars = 0 THEN 0 ELSE (n_digit_chars * 1000000L) DIV n_chars END"
    )
    mask = (
        F.when(F.col("n_tokens") < MIN_TOKENS, REASON_TOO_SHORT).otherwise(0)
        + F.when(F.col("n_tokens") > MAX_TOKENS, REASON_TOO_LONG).otherwise(0)
        + F.when(
            (mean_len_ppm < MEAN_TOKLEN_PPM_MIN)
            | (mean_len_ppm > MEAN_TOKLEN_PPM_MAX),
            REASON_TOKLEN,
        ).otherwise(0)
        + F.when(stop_ppm < STOP_RATIO_PPM_MIN, REASON_STOPWORDS).otherwise(0)
        + F.when(digit_ppm > DIGIT_RATIO_PPM_MAX, REASON_DIGITS).otherwise(0)
    )
    return base.select(
        "doc_id", mask.cast("int").alias("reason_mask"),
        (mask == 0).alias("keep"),
    )


# --- TF-IDF top-k keywords ---------------------------------------------------

TFIDF_TOPK = 3


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-k keywords by an exact-integer tf/df score
    (``tf * 1e6 DIV df`` — monotone in tf·idf for ranking purposes;
    true log-idf is float and not bit-portable across engines, see the
    module docstring). Ties break on token ascending, so the top-k set
    is fully deterministic.

    Plan shape: one explode → one vocabulary aggregate (df) that joins
    back (vocabulary ≪ corpus at 100 TB: AQE broadcasts it) → per-doc
    window over each doc's own tokens only (partition key doc_id, no
    global sort)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf already has exactly one row per distinct (doc, token) — derive
    # df from it rather than re-scanning and re-exploding the corpus
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "token").select(
        "doc_id", "token", "tf", "df",
        F.expr("(tf * 1000000L) DIV df").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


# --- HLL-style register sketch ----------------------------------------------

HLL_BUCKETS = 256  # 2 hex nibbles of md5 → register index


def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token cardinality sketch as 256 HLL registers:
    register = first byte of md5(token), rho = (leading zero BITS of
    the next 14 hex nibbles = a 56-bit integer) + 1, register value =
    max rho. rho MUST be bit-geometric (P[rho ≥ k] = 2^-(k-1)) for the
    standard base-2 estimator in ``hll_estimate`` to apply — a nibble
    count is base-16 geometric and collapses the estimate ~20× outside
    the linear-counting regime. Computed portably in both engines as
    ``57 - bitlength(w)`` via ``bin()`` (both engines render positive
    integers without leading zeros; w = 0 → rho = 57). Deliberately
    REGISTERS, not the float estimate: the registers are the mergeable
    state (groupBy-max commutes with partitioning — the same partial-
    aggregate plan as approx_count_distinct), integer-exact in both
    engines; the harmonic-mean estimate is a driver-side epilogue
    (``hll_estimate`` below, pinned against exact distinct in tests at
    BOTH the linear-counting and the raw-estimator cardinality regime)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    tok = d.select(F.explode(F.split("text", " ")).alias("token")).distinct()
    return hll_registers_of_tokens(tok)


def hll_registers_of_tokens(tok: DataFrame) -> DataFrame:
    """(bucket, max_rho) registers from a distinct ``token`` column —
    shared by the gated query and the high-cardinality pinning test."""
    h = tok.select(F.md5("token").alias("h"))
    w = F.conv(F.substring("h", 3, 14), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(57)).otherwise(F.lit(57) - F.length(F.bin(w)))
    return (
        h.select(
            F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], m: int = HLL_BUCKETS) -> float:
    """Driver-side HLL estimate from (bucket, max_rho) rows (Flajolet
    et al. 2007, with the small-range linear-counting correction)."""
    import math

    reg = dict(registers)
    z = sum(2.0 ** -reg.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / z
    zeros = sum(1 for b in range(m) if b not in reg)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


# --- Bloom filter over eval grams -------------------------------------------

BLOOM_M = 4096  # MINIMUM bits — actual M auto-sizes to the gram count
BLOOM_K = 3  # hash functions (md5 with salted prefixes b0|/b1|/b2|)
BLOOM_BITS_PER_KEY = 15  # m ≥ 15·n → fill ≈ 1-e^(-K/15) ≈ 18%, FPR ≈ 0.6%


def bloom_m_for(n_grams: int) -> int:
    """Filter size for ``n_grams`` keys: next power of two ≥ 15·n
    (min ``BLOOM_M``). Power of two keeps the mod cheap and the sizing
    deterministic; 15 bits/key holds FPR under ~0.6% at K = 3. Exact
    integer math (1 << bitlen(x-1)) — NO float log2, so the Spark side
    and the oracle's ``1 << length(bin(15·n - 1))`` agree bit-for-bit.
    This is the round-3 saturation fix: a fixed M = 4096 silently
    degraded to ~58% FPR at sf0.1's 2,397 eval grams and to all-pass at
    the 250k-gram probe; sizing from n makes saturation impossible by
    construction instead of a prose rule."""
    x = max(BLOOM_M, BLOOM_BITS_PER_KEY * max(int(n_grams), 1))
    return 1 << (x - 1).bit_length()


def bloom_bit_positions(ev: DataFrame, m: int) -> DataFrame:
    """DISTINCT set-bit positions of the Bloom filter over the
    ``shingle`` column of ``ev`` — the mergeable OR state. All K salted
    positions in ONE pass over the gram set (a K-way union would
    rescan it per hash function)."""
    positions = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"b{i}|"), "shingle")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % m
            ).cast("int")
            for i in range(BLOOM_K)
        ]
    )
    return ev.select(F.explode(positions).alias("bit_pos")).distinct()


def q_bloom_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter of the eval-split gram set, materialized as its set
    bit positions — the 100 TB decontamination shape: when the exact
    eval-gram dictionary outgrows a broadcast, ship this bit set (KB,
    not GB) and let the corpus stream map-side through it, with the
    exact join (``curate_decontaminate``) confirming only the survivors.
    Portable hash family: position_i = md5('b{i}|' ‖ gram) first 8 hex
    nibbles mod M — integer-exact in both engines; the distinct-bit
    output is the mergeable OR of per-partition partial filters. M is
    AUTO-SIZED to the eval-gram count (``bloom_m_for``) — the count is
    one cheap job over the (small by construction) eval split, and the
    oracle derives the identical M in pure SQL from the same count."""
    # memoized stage, not an ad-hoc persist: the frame is consumed
    # twice (the sizing count + the bit build), and repeated query
    # construction (gate sweeps, plan lints) must reuse ONE owned
    # cache entry instead of leaking a new pinned frame per call
    ev = _memo.staged(
        spark,
        ("bloom_eval_grams", sf_dir),
        lambda: _staged_shingles(spark, sf_dir)
        .where((F.col("doc_id").cast("long") % EVAL_SPLIT_MOD) == 0)
        .select("shingle")
        .distinct(),
    )
    m = bloom_m_for(ev.count())
    return bloom_bit_positions(ev, m)


# --- count-min sketch --------------------------------------------------------

CMS_W = 512  # counters per row
CMS_D = 3  # hash rows (salted md5 family, like the Bloom filter)


def q_cms_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus tokens: the frequency-estimation
    sketch that completes the family (HLL = distinct, Bloom =
    membership, histogram = quantiles, CMS = point frequency). State =
    D×W counters, mergeable by cell-wise SUM (one hash aggregate —
    partial sums combine map-side); estimate(token) =
    min over d of counter[d][hash_d(token)], always ≥ truth (pinned in
    tests together with the ε = e/W overcount bound). Same portable
    salted-md5 hash family as ``q_bloom_bits``."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    tok = d.select(F.explode(F.split("text", " ")).alias("token")).where(
        F.length("token") > 0
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"c{i}|"), "token")), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % CMS_W
                ).cast("int").alias("col"),
            )
            for i in range(CMS_D)
        ]
    )
    return (
        tok.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(counters: dict[tuple[int, int], int], token: str) -> int:
    """Driver-side point estimate from collected (row, col) → n."""
    import hashlib

    return min(
        counters.get(
            (i, int(hashlib.md5(f"c{i}|{token}".encode()).hexdigest()[:8], 16) % CMS_W),
            0,
        )
        for i in range(CMS_D)
    )


# --- histogram quantile sketch ----------------------------------------------

QHIST_BUCKET_WIDTH = 5  # lineitem quantity ∈ [1, 50] → 10 buckets
QHIST_QUANTILES = (50, 95, 99)


def q_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile sketch over lineitem quantity: the
    fixed-width-bucket counts ARE the mergeable state (per-partition
    partial counts + one tiny reduce, like the HLL registers), and each
    requested quantile reports its bucket's lower bound — the
    deterministic, integer-exact cousin of percentile_approx whose
    error bound is the bucket width. At 100 TB the sketch is the only
    way to answer P99 without a global sort; the exact twin
    (``rel_quantity_percentiles``) is its small-scale oracle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_quantity").cast("long")).alias("qty")
    )
    hist = (
        li.select(F.expr(f"qty DIV {QHIST_BUCKET_WIDTH}").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # cumulative counts via a theta self-join on the BUCKET-COUNT-sized
    # frame (B = value_range/width, a constant — O(B²) driver-scale
    # work, never corpus-scale; the scalable stage is the hash-agg
    # histogram above). A window here would be a single-partition sort.
    a, b = hist.alias("a"), hist.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.bucket") <= F.col("a.bucket"))
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.sum(F.col("b.n")).alias("cum"))
    )
    total = hist.agg(F.sum("n").alias("total"))
    cum = cum.join(F.broadcast(total), F.lit(True))
    out = None
    for q in QHIST_QUANTILES:
        row = (
            cum.where(F.col("cum") * 100 >= F.col("total") * q)
            .orderBy("bucket")
            .limit(1)
            .select(
                F.lit(q).alias("quantile_pct"),
                (F.col("bucket") * QHIST_BUCKET_WIDTH).alias("value_lower_bound"),
                F.col("cum").alias("rank_at_bucket"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- corpus data card --------------------------------------------------------


def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: per-language corpus statistics a training-data
    release ships — doc/token/char volumes, exact-dup rate, and the
    curation keep rate — composed from the same expressions the
    individual operators gate (decision verdict, exact dedup, token
    stats) in ONE pass + one hash aggregate keyed on language.

    Integer-exact everywhere; at 100 TB this is the cheapest query in
    the module (map + one tiny agg) yet the one every consumer reads
    first."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "lang"
    )
    toks = F.split(F.col("text"), " ")
    per_doc = d.select(
        "lang",
        F.coalesce(F.size(toks).cast("long"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.length("text").cast("long"), F.lit(0)).alias("n_chars"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_hash"),
    )
    # redundant-copy arithmetic: docs minus distinct text hashes per
    # language = number of exact-duplicate copies beyond each canonical
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("text_hash").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.count_distinct("text_hash")).alias("n_exact_dups"),
        F.expr("(sum(n_chars) * 1000000L) DIV greatest(sum(n_tokens), 1L)").alias(
            "chars_per_token_ppm"
        ),
        F.min("n_tokens").alias("min_doc_tokens"),
        F.max("n_tokens").alias("max_doc_tokens"),
    )


# --- events: funnel + retention ---------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user converts a stage
    only with an event strictly after their previous stage's first
    conversion. Three small per-user aggregates chained by broadcast-
    able joins (each level shrinks); the counts union at the end.
    At 100 TB the per-user min-aggregates are the only shuffles, all
    on the same key — one exchange reused across stages."""
    e = _events(spark, sf_dir)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    # scalar aggregates (no groupBy): an EMPTY stage must still emit its
    # row with n_users = 0, exactly like the oracle's SELECT COUNT(*) —
    # a groupBy on literals would emit zero rows for an empty frame
    def stage_count(df, stage: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage).alias("stage"), F.lit(name).alias("stage_name"), "n_users"
        )

    return (
        stage_count(v, 1, "view")
        .unionByName(stage_count(c, 2, "click"))
        .unionByName(stage_count(p, 3, "purchase"))
    )


ANOMALY_SIGMA = 3  # flag |value − mean| > 3σ within the event type


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    counts): for every consecutive event pair in a user's timeline,
    count (from_type → to_type) and its ppm share of all transitions
    leaving from_type — the behavioral-drift / bot-detection table
    (a user stream whose transition mass collapses onto one edge is a
    scripted client), and the events-side twin of
    ``conv_role_transitions``.

    Scale shape: ONE user-partitioned lag window (per-user state only —
    the sessionization budget), one pair-keyed hash aggregate, one
    dimension-scale (|event_types|²) marginal join. Deterministic
    ordering: (ts, event_id) — the id breaks timestamp ties
    identically in both engines."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.withColumn("from_type", F.lag("event_type").over(w)).where(
        F.col("from_type").isNotNull()
    )
    pair = t.groupBy(
        "from_type", F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    tot = pair.groupBy("from_type").agg(F.sum("n_transitions").alias("tot"))
    return pair.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("n_transitions * 1000000 DIV tot").cast("long").alias(
            "from_share_ppm"
        ),
    )


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical QC: per-event-type 3σ outlier flags with EXACT
    integer arithmetic — no float mean/stddev anywhere. With v in
    cents, n rows, s = Σv, ss = Σv²:

        |v − s/n| > σ·√(ss/n − (s/n)²)   ⟺   (n·v − s)² > σ²·(n·ss − s²)

    both sides exact BIGINTs, so Spark and DuckDB agree bit-for-bit
    where float z-scores would drift. The shape is one hash aggregate
    (type-keyed moments, broadcast back) + a map-side predicate — the
    same plan at 100 TB, with the moments mergeable across partitions
    (sum/sum-of-squares are the canonical distributive aggregates).
    Overflow is LOUD, not silent: ANSI mode errors if n·ss exceeds
    BIGINT — at that scale route the moments through DECIMAL(38,0)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    v = F.floor(F.col("value") * 100).cast("long")
    base = ev.select("event_id", "event_type", v.alias("v_cents"))
    mom = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_cents").alias("s"),
        F.sum(F.col("v_cents") * F.col("v_cents")).alias("ss"),
    )
    joined = base.join(F.broadcast(mom), "event_type")
    dev = F.col("n") * F.col("v_cents") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        joined.where(dev * dev > F.lit(ANOMALY_SIGMA * ANOMALY_SIGMA) * var_n2)
        .select("event_id", "event_type", "v_cents")
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen date; for each
    (cohort, day-offset) the count of distinct active users. Two
    aggregates on user_id (same exchange) + a date diff — all integer/
    date arithmetic, engine-exact."""
    e = _events(spark, sf_dir)
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    return (
        e.join(first, "user_id")
        .select(
            "user_id", "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort")).alias("day_offset"),
        )
        .groupBy("cohort", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            F.col("cohort").cast("string").alias("cohort"), "day_offset", "n_active"
        )
    )


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) corpus composition + rebalancing weight —
    the data-mixing table every pre-training run is configured from:
    for each ``source``, its doc count, token count, token share in
    ppm, and the sampling weight (ppm) that would equalize the mix
    toward a uniform per-source target, capped at 10× so a tiny domain
    can never be oversampled into degeneracy. All floor-div integer
    ppm — bit-identical across engines.

    Scale shape: one source-keyed hash aggregate over the corpus (the
    only shuffle; map-side partials do the heavy lifting since sources
    ≪ docs), then a broadcast of the 1-row totals frame. The output is
    dimension-sized (one row per source)."""
    # null text → null token count (skipped by SUM) — EXPLICITLY, not
    # via size(null), whose -1/NULL result is a legacy-config coin flip
    n_toks = F.when(
        F.col("text").isNotNull(),
        F.size(F.split(F.col("text"), " ")).cast("long"),
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", n_toks.alias("n_toks")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_toks"), F.lit(0).cast("long")).alias("n_tokens"),
    )
    # 1-row scalar broadcast; audited under _ALLOWED_SCALAR_BROADCAST
    # in tests/test_plans.py
    totals = per.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("n_tokens * 1000000 DIV greatest(total_tokens, 1)").alias(
            "token_share_ppm"
        ),
        F.expr(
            "least(10000000, (1000000 DIV n_sources) * 1000000"
            " DIV greatest(n_tokens * 1000000 DIV greatest(total_tokens, 1), 1))"
        ).alias("mix_weight_ppm"),
    )


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling weights, α = 1/2 — the
    multilingual/multi-domain rebalancing rule (XLM-R / mT5 style):
    w_d ∝ n_tokens_d^α flattens the mix toward small domains without
    the hard uniform target of ``curate_domain_mix``'s capped weights.

    Cross-engine exactness without floats in the OUTPUT: n^(1/2) is the
    integer sqrt — ``FLOOR(SQRT(CAST(n AS DOUBLE)))``. IEEE-754 sqrt is
    correctly rounded in both engines (and exact on perfect squares),
    so the floor is bit-identical for counts < 2^52; the weight is then
    an all-integer floor-div ppm over the integer sqrt total (a 1-row
    broadcast, audited under _ALLOWED_SCALAR_BROADCAST).

    Scale shape: identical to ``curate_domain_mix`` — one source-keyed
    hash aggregate (map-side partials carry it; sources ≪ docs), then a
    broadcast 1-row totals frame; output is dimension-sized."""
    n_toks = F.when(
        F.col("text").isNotNull(),
        F.size(F.split(F.col("text"), " ")).cast("long"),
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", n_toks.alias("n_toks")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_toks"), F.lit(0).cast("long")).alias("n_tokens"),
    )
    per = per.withColumn(
        "sqrt_tokens",
        F.expr("CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"),
    )
    totals = per.agg(
        F.sum("n_tokens").alias("tot_toks"),
        F.sum("sqrt_tokens").alias("tot_sqrt"),
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        "sqrt_tokens",
        F.expr("n_tokens * 1000000 DIV greatest(tot_toks, 1)").alias(
            "raw_share_ppm"
        ),
        F.expr("sqrt_tokens * 1000000 DIV greatest(tot_sqrt, 1)").alias(
            "temp_weight_ppm"
        ),
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget — keep the highest-quality
    documents (by the `text_quality_score` composite, ties broken by
    doc_id) until half the corpus' tokens are spent. The global
    quality-ordered running token sum every budgeted pre-training run
    needs, WITHOUT a global single-partition window:

      1. coarse score bands (score DIV 100000) — a bounded dimension
         (the composite is a ppm sum, so ≲ a few hundred bands);
      2. tokens-before-band via a triangular self-join on the BAND
         frame (dimension², not corpus²);
      3. intra-band running sums via a window PARTITIONED by band
         (parallel, skew bounded by band width);
      4. global cumsum = before-band + intra-band — exact, because
         band is monotone in score (floor-div), so band order extends
         score order and equal scores never straddle bands.

    The 1-row totals broadcast is audited under
    _ALLOWED_SCALAR_BROADCAST; kept is 1/0 int (cross-engine bool-free).
    """
    d = (
        quality_base(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("text").isNotNull())
            .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        )
        .select("doc_id", "n_tokens", F.expr(QUALITY_SCORE_EXPR).alias("score"))
        .withColumn("band", F.expr("score DIV 100000L"))
    )
    # stage the DIMENSION-sized band table: totals/before derive from
    # it, so the corpus is scanned exactly twice (band build + the main
    # probe) instead of four times — the remaining 2-scan shape is the
    # deliberate scan-vs-stage tradeoff (staging the per-doc frame
    # itself would be an Iceberg stage table at 100 TB)
    bands = _memo.staged(
        spark,
        ("token_budget_bands", sf_dir),
        lambda: d.groupBy("band").agg(F.sum("n_tokens").alias("band_tokens")),
    )
    total = bands.agg(F.sum("band_tokens").alias("total_tokens"))
    hi = bands.select(
        F.col("band").alias("hband"), F.col("band_tokens").alias("htokens")
    )
    before = (
        bands.join(hi, F.col("hband") > F.col("band"), "left")
        .groupBy("band")
        .agg(F.coalesce(F.sum("htokens"), F.lit(0).cast("long")).alias("before_band"))
    )
    w = (
        Window.partitionBy("band")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(before), "band")
        .withColumn("intra", F.sum("n_tokens").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "score",
            "n_tokens",
            F.expr("before_band + intra").alias("cum_tokens"),
            F.expr(
                "CAST(before_band + intra <= total_tokens DIV 2 AS INT)"
            ).alias("kept"),
        )
    )


LM_SPLIT_MOD = 10  # train = 9/10 of the corpus, score the held-out tenth


def q_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bigram LM surprisal scoring — the perplexity-filter shape
    (CCNet / Gopher style: train a cheap LM on an in-domain split,
    rank candidate documents by how surprising the LM finds them;
    high-surprisal docs are boilerplate/garbage candidates).

    Everything is exact integer math so the oracle hashes identically:
    per-bigram surprisal is the add-one-smoothed ratio in INTEGER
    log2 via bit lengths (both engines render ``bin(x)`` of a positive
    int without leading zeros — the same invariant the HLL rho uses):

        surprisal(w1, w2) = bitlen(c(w1·) + V) - bitlen(c(w1 w2) + 1)

    with ``c(w1·)`` the train count of w1 in bigram-PREFIX position,
    ``V`` the train prefix vocabulary, so unseen-prefix bigrams score
    bitlen(V) - 1 (≈ log2 of uniform) and frequent pairs ≈ 0. The doc
    score is the ppm-scaled mean over its bigrams.

    Scale shape: the LM is ONE hash aggregate over exploded train
    bigrams (map-side partials; Zipf head combines in-map), the prefix
    table a second; scoring is two hash equi-joins on (w1[, w2]) — the
    frequent-pair skew is bounded because both join SIDES are keyed on
    the same Zipf distribution and AQE splits oversized partitions.
    No windows, no driver loops; the 1-row V frame is a scalar
    broadcast (audited under _ALLOWED_SCALAR_BROADCAST)."""
    from dstlr_spark.plans.partitioning import fan_out

    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # fan_out the RAW read: placed after the projection, the split +
    # slice map work would compute below the exchange in one task
    base = (
        fan_out(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        .where(F.col("text").isNotNull() & (n >= 2))
        .select(
            F.col("doc_id").cast("long").alias("did"),
            F.slice(toks, 1, n - 1).alias("w1s"),
            F.slice(toks, 2, n - 1).alias("w2s"),
        )
    )
    pairs = base.select(
        "did",
        F.explode(F.arrays_zip(F.col("w1s").alias("w1"), F.col("w2s").alias("w2"))).alias("p"),
    ).select("did", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    train = pairs.where(F.col("did") % LM_SPLIT_MOD != 0)
    bigram_lm = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    prefix_lm = train.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = prefix_lm.agg(F.count(F.lit(1)).cast("long").alias("v"))

    scored = (
        pairs.where(F.col("did") % LM_SPLIT_MOD == 0)
        .join(prefix_lm, "w1", "left")
        .join(bigram_lm, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "did",
            (
                F.length(F.bin(F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")))
                - F.length(F.bin(F.coalesce(F.col("c12"), F.lit(0)) + 1))
            )
            .cast("long")
            .alias("s"),
        )
    )
    return scored.groupBy("did").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("s").alias("sum_surprisal"),
        F.expr("sum(s) * 1000000 DIV count(1)").alias("avg_surprisal_ppm"),
    ).select(
        F.col("did").cast("string").alias("doc_id"),
        "n_bigrams",
        "sum_surprisal",
        "avg_surprisal_ppm",
    )


# --- DSIR importance-resampling weights --------------------------------------

DSIR_BUCKETS = 4096  # hashed n-gram feature buckets (paper uses 10^4)
DSIR_TARGET_MOD = 10  # target "domain sample" = every 10th doc; raw = rest


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023) weights: score every RAW document by how much more likely
    its hashed-n-gram features are under the TARGET domain's
    bag-of-ngrams model than under the raw corpus's own —
    ``log w = Σ_f count(f) · [log p_target(f) − log p_raw(f)]`` —
    the importance weight the paper then Gumbel-resamples by. Here the
    target domain is a deterministic held-out tenth of the corpus (at
    production scale it is Wikipedia/books — the machinery is
    identical; the downstream resample is ``curate_token_budget``'s
    job).

    Features are unigrams + bigrams hashed into ``DSIR_BUCKETS``
    buckets. The log-probabilities are quantized to INTEGER log2 via
    bit lengths (the HLL-rho / LM-surprisal invariant: both engines
    render ``bin()`` of a positive int without leading zeros), with
    add-one smoothing, so both engines hash identically:

        s(b) = bitlen(c_t(b)+1) − bitlen(c_r(b)+1)
             + bitlen(T_r+B) − bitlen(T_t+B)

    and ``dsir_logw = Σ_occurrences s(bucket)``. No ppm average is
    emitted: the sum can be negative, where Spark's ``DIV`` (truncate)
    and DuckDB's ``//`` (floor) disagree.

    Scale shape: TWO hash aggregates over exploded grams (map-side
    partials; the bucket table is ``DSIR_BUCKETS`` rows), one broadcast
    of that bucket-score table back onto the gram stream, one final
    doc-keyed aggregate. The n-gram arrays come from the O(n·k)
    ``ngrams`` builder. Nothing shuffles more than once per stage and
    no join side exceeds dictionary scale."""
    from dstlr_spark.functions.text import ngrams

    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select(
            F.col("doc_id").cast("long").alias("did"),
            F.concat(
                toks,
                F.when(n >= 2, ngrams(toks, 2)).otherwise(
                    F.array().cast("array<string>")
                ),
            ).alias("grams"),
        )
    )
    feats = base.select("did", F.explode("grams").alias("g")).select(
        "did",
        (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long") % DSIR_BUCKETS)
        .alias("b"),
    )
    is_target = F.col("did") % DSIR_TARGET_MOD == 0
    counts = feats.groupBy("b").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(~is_target, 1).otherwise(0)).cast("long").alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").cast("long").alias("tt"), F.sum("cr").cast("long").alias("tr")
    )
    score = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.length(F.bin(F.col("ct") + 1))
            - F.length(F.bin(F.col("cr") + 1))
            + F.length(F.bin(F.col("tr") + F.lit(DSIR_BUCKETS)))
            - F.length(F.bin(F.col("tt") + F.lit(DSIR_BUCKETS)))
        )
        .cast("long")
        .alias("s"),
    )
    return (
        feats.where(~is_target)
        .join(F.broadcast(score), "b")
        .groupBy("did")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("s").alias("dsir_logw"),
        )
        .select(
            F.col("did").cast("string").alias("doc_id"), "n_feats", "dsir_logw"
        )
    )


# --- Naive-Bayes quality classifier ------------------------------------------

NB_HQ_THRESHOLD = 4_800_000  # composite-quality label cut (~57/43 at this sf)
NB_SPLIT_MOD = 3  # train = docs with did % 3 != 0, score the held-out third


def q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-tokens Naive-Bayes quality classifier — the
    fastText-style quality-classifier shape of LLM data pipelines
    (GPT-3 / LLaMA style: distill expensive or heuristic quality
    labels into a cheap n-gram classifier, then score the whole
    corpus). Labels come from the SHARED composite quality score
    (one definition, textstats.quality_base — the formula must not
    fork); train/score split is deterministic by doc id.

    All log-probabilities are quantized to INTEGER log2 via bit
    lengths (the HLL-rho / LM-surprisal / DSIR invariant), add-one
    smoothed, so both engines hash identically:

        nb_score = Σ_tok [bitlen(c⁺(t)+1) − bitlen(c⁻(t)+1)
                          + bitlen(T⁻+V) − bitlen(T⁺+V)]
                 + bitlen(N⁺) − bitlen(N⁻)

    with c± per-class token counts, T± class totals, V train
    vocabulary, N± class doc counts (the prior). pred_hq = score ≥ 0;
    true_hq rides along so the gate row doubles as a confusion-matrix
    artifact.

    Scale shape: ONE hash aggregate builds the model (vocabulary-sized,
    map-side partials over the Zipf head), broadcast back onto the
    token stream (Zipf-skewed join key, but the build side is the
    dictionary — broadcast hash join, no shuffle of the stream), one
    1-row totals scalar attach, one doc-keyed aggregate. The same plan
    at any corpus size; only the dictionary grows, and it grows
    sublinearly (Heaps' law)."""
    from dstlr_spark.queries.textstats import QUALITY_SCORE_EXPR, quality_base

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    labels = quality_base(docs).select(
        F.col("doc_id").cast("long").alias("did"),
        (F.expr(QUALITY_SCORE_EXPR) >= NB_HQ_THRESHOLD).alias("hq"),
    )
    toks = docs.select(
        F.col("doc_id").cast("long").alias("did"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    tr = toks.where(F.col("did") % NB_SPLIT_MOD != 0).join(labels, "did")
    tok_counts = tr.groupBy("tok").agg(
        F.sum(F.when(F.col("hq"), 1).otherwise(0)).cast("long").alias("cpos"),
        F.sum(F.when(~F.col("hq"), 1).otherwise(0)).cast("long").alias("cneg"),
    )
    doc_counts = (
        labels.where(F.col("did") % NB_SPLIT_MOD != 0)
        .agg(
            F.sum(F.when(F.col("hq"), 1).otherwise(0)).cast("long").alias("npos"),
            F.sum(F.when(~F.col("hq"), 1).otherwise(0)).cast("long").alias("nneg"),
        )
    )
    totals = (
        tok_counts.agg(
            F.sum("cpos").cast("long").alias("tpos"),
            F.sum("cneg").cast("long").alias("tneg"),
            F.count(F.lit(1)).cast("long").alias("v"),
        )
        .crossJoin(F.broadcast(doc_counts))
    )
    scored = (
        toks.where(F.col("did") % NB_SPLIT_MOD == 0)
        .join(tok_counts, "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "did",
            (
                F.length(F.bin(F.coalesce(F.col("cpos"), F.lit(0)) + 1))
                - F.length(F.bin(F.coalesce(F.col("cneg"), F.lit(0)) + 1))
                + F.length(F.bin(F.col("tneg") + F.col("v")))
                - F.length(F.bin(F.col("tpos") + F.col("v")))
            )
            .cast("long")
            .alias("s"),
            (F.length(F.bin("npos")) - F.length(F.bin("nneg")))
            .cast("long")
            .alias("prior"),
        )
    )
    ag = scored.groupBy("did", "prior").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.sum("s").alias("sum_s"),
    )
    return (
        ag.join(labels.withColumnRenamed("hq", "true_hq"), "did")
        .select(
            F.col("did").cast("string").alias("doc_id"),
            "n_toks",
            (F.col("sum_s") + F.col("prior")).alias("nb_score"),
            ((F.col("sum_s") + F.col("prior")) >= 0).alias("pred_hq"),
            "true_hq",
        )
    )


# --- registry ----------------------------------------------------------------

QUERIES = {
    # never-gated queries lead the module (gate-truncation insurance)
    "curate_dsir_weights": q_dsir_weights,
    "curate_nb_quality": q_nb_quality,
    "curate_lm_surprisal": q_lm_surprisal,
    "curate_token_budget": q_token_budget,
    "curate_domain_mix": q_domain_mix,
    "curate_mix_temperature": q_mix_temperature,
    "curate_decontaminate": q_decontaminate,
    "curate_pii_scrub": q_pii_scrub,
    "curate_blocklist": q_blocklist,
    "curate_decision": q_curation_decision,
    "text_tfidf_topk": q_tfidf_topk,
    "agg_hll_registers": q_hll_registers,
    "agg_bloom_bits": q_bloom_bits,
    "agg_cms_counters": q_cms_counters,
    "corpus_datacard": q_corpus_datacard,
    "agg_quantile_hist": q_quantile_hist,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_anomaly": q_events_anomaly,
    "events_transitions": q_events_transitions,
    # round-5 TAIL addition (registry position > the driver's ~50-row
    # window by construction, so it cannot displace the 33 never-gated
    # queries this round's freeze protects; it is part of the round-6
    # gate head)
    "curate_stratified_sample": q_stratified_sample,
}

ORACLES = {
    "curate_dsir_weights": f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS s
  FROM documents WHERE text IS NOT NULL),
g AS (
  SELECT did, tk[i] AS g
  FROM (SELECT did, tk, unnest(range(1, s + 1)) AS i FROM t) z
  UNION ALL
  SELECT did, tk[i] || ' ' || tk[i + 1] AS g
  FROM (SELECT did, tk, unnest(range(1, s)) AS i FROM t) z),
f AS (
  SELECT did,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {DSIR_BUCKETS} AS b
  FROM g),
cnt AS (
  SELECT b,
         CAST(SUM(CASE WHEN did % {DSIR_TARGET_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN did % {DSIR_TARGET_MOD} <> 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS cr
  FROM f GROUP BY b),
tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
               CAST(SUM(cr) AS BIGINT) AS tr FROM cnt),
sc AS (
  SELECT b,
         CAST(length(bin(ct + 1)) - length(bin(cr + 1))
              + length(bin(tr + {DSIR_BUCKETS}))
              - length(bin(tt + {DSIR_BUCKETS})) AS BIGINT) AS s
  FROM cnt, tot)
SELECT CAST(f.did AS VARCHAR) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(sc.s) AS BIGINT) AS dsir_logw
FROM f JOIN sc ON sc.b = f.b
WHERE f.did % {DSIR_TARGET_MOD} <> 0
GROUP BY f.did""",
    "curate_nb_quality": f"""
WITH b AS ({quality_base_sql("WHERE text IS NOT NULL")}),
lab AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         ({QUALITY_SCORE_SQL}) >= {NB_HQ_THRESHOLD} AS hq
  FROM b),
tk AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL),
tr AS (
  SELECT tk.tok, lab.hq FROM tk JOIN lab ON lab.did = tk.did
  WHERE tk.did % {NB_SPLIT_MOD} <> 0),
tc AS (
  SELECT tok,
         CAST(SUM(CASE WHEN hq THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
         CAST(SUM(CASE WHEN hq THEN 0 ELSE 1 END) AS BIGINT) AS cneg
  FROM tr GROUP BY tok),
dc AS (
  SELECT CAST(SUM(CASE WHEN hq THEN 1 ELSE 0 END) AS BIGINT) AS npos,
         CAST(SUM(CASE WHEN hq THEN 0 ELSE 1 END) AS BIGINT) AS nneg
  FROM lab WHERE did % {NB_SPLIT_MOD} <> 0),
tot AS (
  SELECT CAST(SUM(cpos) AS BIGINT) AS tpos,
         CAST(SUM(cneg) AS BIGINT) AS tneg,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM tc),
sc AS (
  SELECT tk.did,
         CAST(length(bin(COALESCE(tc.cpos, 0) + 1))
            - length(bin(COALESCE(tc.cneg, 0) + 1))
            + length(bin(tot.tneg + tot.v))
            - length(bin(tot.tpos + tot.v)) AS BIGINT) AS s,
         CAST(length(bin(dc.npos)) - length(bin(dc.nneg)) AS BIGINT) AS prior
  FROM tk LEFT JOIN tc ON tc.tok = tk.tok
  CROSS JOIN tot CROSS JOIN dc
  WHERE tk.did % {NB_SPLIT_MOD} = 0),
ag AS (
  SELECT did, prior, CAST(COUNT(*) AS BIGINT) AS n_toks,
         CAST(SUM(s) AS BIGINT) AS sum_s
  FROM sc GROUP BY did, prior)
SELECT CAST(ag.did AS VARCHAR) AS doc_id, ag.n_toks,
       CAST(ag.sum_s + ag.prior AS BIGINT) AS nb_score,
       (ag.sum_s + ag.prior) >= 0 AS pred_hq,
       lab.hq AS true_hq
FROM ag JOIN lab ON lab.did = ag.did""",
    "curate_lm_surprisal": f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS s
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
p AS (
  SELECT did, tk[i] AS w1, tk[i + 1] AS w2
  FROM (SELECT did, tk, unnest(range(1, s)) AS i FROM t) z),
tr AS (SELECT w1, w2 FROM p WHERE did % {LM_SPLIT_MOD} <> 0),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM tr GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM tr GROUP BY w1),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
sc AS (
  SELECT p.did,
         CAST(length(bin(COALESCE(c1.c1, 0) + v.v))
            - length(bin(COALESCE(c12.c12, 0) + 1)) AS BIGINT) AS s
  FROM p
  LEFT JOIN c1 ON c1.w1 = p.w1
  LEFT JOIN c12 ON c12.w1 = p.w1 AND c12.w2 = p.w2
  CROSS JOIN v
  WHERE p.did % {LM_SPLIT_MOD} = 0)
SELECT CAST(did AS VARCHAR) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(s) AS BIGINT) AS sum_surprisal,
       CAST(SUM(s) * 1000000 // COUNT(*) AS BIGINT) AS avg_surprisal_ppm
FROM sc GROUP BY did""",
    # global quality-ordered cumsum directly (DuckDB pays the single
    # sort; the Spark side's band decomposition must equal it exactly)
    "curate_token_budget": f"""
WITH s AS ({quality_base_sql("WHERE text IS NOT NULL")}),
q AS (
  SELECT doc_id, n_tokens, {QUALITY_SCORE_SQL} AS score
  FROM s),
t AS (SELECT SUM(n_tokens) AS total_tokens FROM q),
c AS (
  SELECT doc_id, score, n_tokens,
         SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM q)
SELECT doc_id, CAST(score AS BIGINT) AS score, n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens,
       CAST(cum <= (SELECT total_tokens FROM t) // 2 AS INT) AS kept
FROM c""",
    "curate_domain_mix": """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_sources FROM per)
SELECT source, n_docs, n_tokens,
       CAST((n_tokens * 1000000) // GREATEST(total_tokens, 1) AS BIGINT)
         AS token_share_ppm,
       CAST(LEAST(10000000,
            ((1000000 // n_sources) * 1000000)
            // GREATEST((n_tokens * 1000000) // GREATEST(total_tokens, 1), 1))
         AS BIGINT) AS mix_weight_ppm
FROM per, tot""",
    "curate_mix_temperature": """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
sq AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS sqrt_tokens
  FROM per),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_toks,
               CAST(SUM(sqrt_tokens) AS BIGINT) AS tot_sqrt FROM sq)
SELECT source, n_docs, n_tokens, sqrt_tokens,
       CAST((n_tokens * 1000000) // GREATEST(tot_toks, 1) AS BIGINT)
         AS raw_share_ppm,
       CAST((sqrt_tokens * 1000000) // GREATEST(tot_sqrt, 1) AS BIGINT)
         AS temp_weight_ppm
FROM sq, tot""",
    "curate_decontaminate": f"""
WITH sh AS ({_SHINGLES_SQL}),
ev AS (SELECT DISTINCT shingle FROM sh
       WHERE CAST(doc_id AS BIGINT) % {EVAL_SPLIT_MOD} = 0)
SELECT s.doc_id,
       COUNT(*) AS n_shared_grams,
       COUNT(*) >= {CONTAM_MIN_HITS} AS contaminated
FROM sh s JOIN ev USING (shingle)
WHERE CAST(s.doc_id AS BIGINT) % {EVAL_SPLIT_MOD} <> 0
GROUP BY s.doc_id""",
    "curate_blocklist": f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL),
c AS (
  SELECT doc_id,
         CAST(len(list_filter(toks,
              x -> x IN ({", ".join(f"'{t}'" for t in BLOCKLIST_HARD)})))
           AS BIGINT) AS n_hard,
         CAST(len(list_filter(toks,
              x -> x IN ({", ".join(f"'{t}'" for t in BLOCKLIST_SOFT)})))
           AS BIGINT) AS n_soft,
         CAST(len(toks) AS BIGINT) AS n_toks
  FROM d)
SELECT doc_id, n_hard, n_soft,
       CAST(n_soft * 1000000 // GREATEST(n_toks, 1) AS BIGINT)
           AS soft_share_ppm,
       CAST(CASE WHEN n_hard = 0 AND n_soft * 1000000
                      // GREATEST(n_toks, 1) <= {BLOCKLIST_SOFT_MAX_PPM}
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM c""",
    "curate_pii_scrub": f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{PII_NUMBER}')) AS n_numbers,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_IPV4}', '<IP>', 'g'),
           '{PII_NUMBER}', '<NUM>', 'g')) AS redacted_md5
FROM documents""",
    "curate_decision": f"""
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         COALESCE(len(string_split(text, ' '))::BIGINT, 0) AS n_tokens,
         COALESCE(length(text)::BIGINT - (len(string_split(text, ' '))::BIGINT - 1),
                  0) AS tok_chars,
         COALESCE(len(list_filter(string_split(text, ' '),
             t -> t IN ({", ".join(f"'{w}'" for w in _SW)})))::BIGINT, 0) AS n_stop,
         COALESCE((length(text)
                   - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT,
                  0) AS n_digit_chars,
         COALESCE(length(text)::BIGINT, 0) AS n_chars
  FROM documents),
ratios AS (
  SELECT doc_id, n_tokens, n_chars,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE (tok_chars * 1000000) // n_tokens END AS mean_len_ppm,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE (n_stop * 1000000) // n_tokens END AS stop_ppm,
         CASE WHEN n_chars = 0 THEN 0
              ELSE (n_digit_chars * 1000000) // n_chars END AS digit_ppm
  FROM base),
mask AS (
  SELECT doc_id,
         (CASE WHEN n_tokens < {MIN_TOKENS} THEN {REASON_TOO_SHORT} ELSE 0 END
          + CASE WHEN n_tokens > {MAX_TOKENS} THEN {REASON_TOO_LONG} ELSE 0 END
          + CASE WHEN mean_len_ppm < {MEAN_TOKLEN_PPM_MIN}
                   OR mean_len_ppm > {MEAN_TOKLEN_PPM_MAX}
                 THEN {REASON_TOKLEN} ELSE 0 END
          + CASE WHEN stop_ppm < {STOP_RATIO_PPM_MIN}
                 THEN {REASON_STOPWORDS} ELSE 0 END
          + CASE WHEN digit_ppm > {DIGIT_RATIO_PPM_MAX}
                 THEN {REASON_DIGITS} ELSE 0 END)::INT AS reason_mask
  FROM ratios)
SELECT doc_id, reason_mask, reason_mask = 0 AS keep FROM mask""",
    "text_tfidf_topk": f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM toks) z
       GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df, (tf.tf * 1000000) // df.df AS score
  FROM tf JOIN df USING (token)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token ASC) AS rank
  FROM scored)
SELECT doc_id, token, tf, df, score, rank FROM ranked WHERE rank <= {TFIDF_TOPK}""",
    "agg_hll_registers": """
WITH tok AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents),
h AS (SELECT md5(token) AS h FROM tok),
w AS (SELECT h, ('0x' || substr(h, 3, 14))::BIGINT AS w FROM h)
SELECT CAST(('0x' || substr(h, 1, 2)) AS INT) AS bucket,
       MAX(CASE WHEN w = 0 THEN 57 ELSE 57 - length(bin(w)) END)::INT AS max_rho
FROM w
GROUP BY 1""",
    "agg_bloom_bits": f"""
WITH sh AS ({_SHINGLES_SQL}),
ev AS (SELECT DISTINCT shingle FROM sh
       WHERE CAST(doc_id AS BIGINT) % {EVAL_SPLIT_MOD} = 0),
msz AS (SELECT 1::BIGINT << length(bin(
          GREATEST({BLOOM_M}, {BLOOM_BITS_PER_KEY} * GREATEST(COUNT(*), 1)) - 1
        )) AS m FROM ev),
pos AS (
  {" UNION ALL ".join(
      f"SELECT CAST((('0x' || substr(md5('b{i}|' || shingle), 1, 8))::BIGINT "
      f"% (SELECT m FROM msz)) AS INT) AS bit_pos FROM ev"
      for i in range(BLOOM_K))})
SELECT DISTINCT bit_pos FROM pos""",
    "agg_cms_counters": f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tk AS (SELECT token FROM tok WHERE len(token) > 0),
cells AS (
  {" UNION ALL ".join(
      f"SELECT {i} AS row, CAST((('0x' || substr(md5('c{i}|' || token), 1, 8))::BIGINT "
      f"% {CMS_W}) AS INT) AS col FROM tk"
      for i in range(CMS_D))})
SELECT row, col, COUNT(*) AS n FROM cells GROUP BY row, col""",
    "agg_quantile_hist": f"""
WITH h AS (
  SELECT CAST(l_quantity AS BIGINT) // {QHIST_BUCKET_WIDTH} AS bucket, COUNT(*) AS n
  FROM lineitem GROUP BY 1),
c AS (
  SELECT bucket,
         CAST(SUM(n) OVER (ORDER BY bucket) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM h)
{" UNION ALL ".join(
    f'''(SELECT {q} AS quantile_pct,
          bucket * {QHIST_BUCKET_WIDTH} AS value_lower_bound,
          cum AS rank_at_bucket
        FROM c WHERE cum * 100 >= total * {q} ORDER BY bucket LIMIT 1)'''
    for q in QHIST_QUANTILES)}""",
    "corpus_datacard": """
WITH per_doc AS (
  SELECT lang,
         COALESCE(len(string_split(text, ' '))::BIGINT, 0) AS n_tokens,
         COALESCE(length(text)::BIGINT, 0) AS n_chars,
         md5(COALESCE(text, '')) AS text_hash
  FROM documents)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT text_hash) AS n_unique_texts,
       COUNT(*) - COUNT(DISTINCT text_hash) AS n_exact_dups,
       CAST((SUM(n_chars) * 1000000) // GREATEST(SUM(n_tokens), 1) AS BIGINT)
         AS chars_per_token_ppm,
       MIN(n_tokens) AS min_doc_tokens,
       MAX(n_tokens) AS max_doc_tokens
FROM per_doc
GROUP BY lang""",
    "events_funnel": """
WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id)
SELECT 1 AS stage, 'view' AS stage_name, COUNT(*) AS n_users FROM v
UNION ALL
SELECT 2, 'click', COUNT(*) FROM c
UNION ALL
SELECT 3, 'purchase', COUNT(*) FROM p""",
    "events_anomaly": f"""
WITH base AS (
  SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS v_cents
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL),
mom AS (
  SELECT event_type, COUNT(*)::BIGINT AS n, SUM(v_cents)::BIGINT AS s,
         SUM(v_cents * v_cents)::BIGINT AS ss
  FROM base GROUP BY event_type)
SELECT event_id, b.event_type, v_cents
FROM base b JOIN mom m ON b.event_type = m.event_type
WHERE (m.n * b.v_cents - m.s) * (m.n * b.v_cents - m.s)
      > {ANOMALY_SIGMA * ANOMALY_SIGMA} * (m.n * m.ss - m.s * m.s)""",
    "events_retention": """
WITH first AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
               FROM events GROUP BY user_id)
SELECT CAST(cohort AS VARCHAR) AS cohort,
       datediff('day', cohort, CAST(e.ts AS DATE)) AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN first USING (user_id)
GROUP BY 1, 2""",
    "events_transitions": """
WITH t AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events),
pair AS (
  SELECT from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM t WHERE from_type IS NOT NULL
  GROUP BY from_type, event_type),
tot AS (SELECT from_type, SUM(n_transitions) AS tot
        FROM pair GROUP BY from_type)
SELECT p.from_type, p.to_type, p.n_transitions,
       CAST(p.n_transitions * 1000000 // t.tot AS BIGINT) AS from_share_ppm
FROM pair p JOIN tot t ON t.from_type = p.from_type""",
    # rates CTE = curate_domain_mix's oracle verbatim; the hash rank is
    # the first 8 md5 hex nibbles of the doc_id string, mod 1e6 — the
    # exact arithmetic the Spark side runs
    "curate_stratified_sample": """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_sources FROM per),
rates AS (
  SELECT source, n_docs,
         LEAST(1000000,
               CAST(LEAST(10000000,
                    ((1000000 // n_sources) * 1000000)
                    // GREATEST((n_tokens * 1000000)
                                // GREATEST(total_tokens, 1), 1))
                 AS BIGINT)) AS keep_ppm
  FROM per, tot),
d AS (
  SELECT source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS h_ppm,
         CASE WHEN text IS NOT NULL
              THEN CAST(len(string_split(text, ' ')) AS BIGINT) END AS n_toks
  FROM documents WHERE doc_id IS NOT NULL)
SELECT d.source, r.keep_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.h_ppm < r.keep_ppm THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN d.h_ppm < r.keep_ppm THEN d.n_toks END), 0)
         AS BIGINT) AS kept_tokens,
       CAST(SUM(CASE WHEN d.h_ppm < r.keep_ppm THEN 1 ELSE 0 END) * 1000000
            // GREATEST(COUNT(*), 1) AS BIGINT) AS achieved_ppm
FROM d JOIN rates r ON r.source = d.source
GROUP BY d.source, r.keep_ppm""",
}
