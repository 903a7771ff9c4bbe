"""Seeded fuzz: the Python annotator twins and the Column implementations
agree on adversarial unicode/punctuation inputs (one batched Spark call,
500 random strings)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dstlr_spark.functions.text import lemma_key, stable_mention_id, utf8_truncate_1024
from dstlr_spark.operators.extract import _lemma_key_py, _stable_id_py

_ALPHABET = (
    list("abcXYZ019 ") + list(".?,:;'\"!") + list("日本語áéßø€") + ["  ", "\t"]
)


def _random_strings(n=500, seed=1234):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 40)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(k)))
    return out


def test_lemma_key_fuzz(spark):
    samples = [s for s in _random_strings() if s.strip()]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["k"] for r in df.select(lemma_key("s").alias("k")).collect()]
    want = [_lemma_key_py(s) for s in samples]
    mismatches = [(s, g, w) for s, g, w in zip(samples, got, want) if g != w]
    assert not mismatches, mismatches[:3]


def test_stable_id_fuzz(spark):
    samples = _random_strings(200, seed=99)
    df = spark.createDataFrame([(f"d{i}", s) for i, s in enumerate(samples)],
                               "d string, s string")
    got = [r["m"] for r in df.select(stable_mention_id("d", "s").alias("m")).collect()]
    want = [_stable_id_py(f"d{i}", s) for i, s in enumerate(samples)]
    assert got == want


def test_utf8_truncate_fuzz(spark):
    samples = [s * 80 for s in _random_strings(100, seed=7)]  # force long strings
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["t"] for r in df.select(utf8_truncate_1024("s").alias("t")).collect()]
    for orig, t in zip(samples, got):
        b = t.encode("utf-8")
        assert len(b) <= 1024
        assert orig.startswith(t)  # truncation is a prefix, never mangled
        if len(orig.encode("utf-8")) <= 1024:
            assert t == orig


def test_utf8_truncate_gated_lockstep(spark):
    """The gated (JVM fast-path) variant is value-identical to the pandas
    UDF on short ASCII, boundary-length, and multibyte-long inputs."""
    from dstlr_spark.functions.text import utf8_truncate_1024_gated

    cases = [
        "short",
        "a" * 256,            # gate boundary: stays JVM-side
        "a" * 257,            # just past the gate, still ≤1024 bytes
        "a" * 2000,           # long ASCII → truncated to 1024
        "日" * 600,            # 1800 bytes of 3-byte chars → code-point-safe cut
        "",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    gated = [r["t"] for r in df.select(utf8_truncate_1024_gated("s").alias("t")).collect()]
    plain = [r["t"] for r in df.select(utf8_truncate_1024("s").alias("t")).collect()]
    assert gated == plain
    assert gated[3] == "a" * 1024


def test_lemma_rules_three_way_lockstep(spark):
    """C2 lemma rules: Python, Spark column, and DuckDB SQL must agree
    exactly — the oracle recomputes mention keys independently."""
    import duckdb

    from dstlr_spark.functions.text import lemma_token, lemma_token_py, lemma_token_sql

    words = [
        "companies", "company", "tables", "queries", "boxes", "classes",
        "churches", "children", "men", "people", "does", "goes", "houses",
        "was", "this", "its", "as", "yes", "gas", "miss", "bus", "lens",
        "James", "Paris", "Apple", "USA", "1960s", "ties", "cities",
        "indices", "criteria", "scan", "scans", "sorts", "windows", "",
        "日本語", "x", "ss",
    ]
    py = [lemma_token_py(w) for w in words]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    sp = [r["l"] for r in df.select(lemma_token(F.col("w")).alias("l")).collect()]
    values = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    du = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {lemma_token_sql('w')} FROM (VALUES {values}) AS t(i, w) ORDER BY i"
        ).fetchall()
    ]
    assert py == sp == du
    # spot checks: the gap C2 exists to close
    m = dict(zip(words, py))
    assert m["companies"] == "company" and m["tables"] == "table"
    assert m["queries"] == "query" and m["boxes"] == "box"
    assert m["James"] == "James" and m["Paris"] == "Paris"  # proper nouns kept
    assert m["was"] == "was" and m["this"] == "this"  # stopword-ish guarded


def test_lemma_rules_lockstep_fuzz(spark):
    """Seeded-random token fuzz across the three lemma implementations —
    catches regex/boundary divergence the fixed word list misses."""
    import random

    import duckdb

    from dstlr_spark.functions.text import lemma_token, lemma_token_py, lemma_token_sql

    rng = random.Random(20260816)
    alphabet = "abcdefghijklmnopqrsxyz"
    words = []
    for _ in range(250):
        n = rng.randint(1, 9)
        w = "".join(rng.choice(alphabet) for _ in range(n))
        if rng.random() < 0.3:
            w += rng.choice(["s", "es", "ies", "ss", "us", "is"])
        if rng.random() < 0.15:
            w = w.capitalize()
        if rng.random() < 0.1:
            w += str(rng.randint(0, 99))
        words.append(w)
    words = sorted(set(words))

    py = [lemma_token_py(w) for w in words]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    sp = [r["l"] for r in df.select(lemma_token(F.col("w")).alias("l")).collect()]
    values = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    du = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {lemma_token_sql('w')} FROM (VALUES {values}) AS t(i, w) ORDER BY i"
        ).fetchall()
    ]
    assert py == sp == du


def test_winnow_fingerprints_survive_local_edits(spark):
    """The winnowing guarantee: a single-token edit changes only the
    fingerprints of windows overlapping the edit, so near-identical
    documents keep high fingerprint overlap while unrelated documents
    share (essentially) none — the property that makes rolling-hash
    fingerprints a near-dup prefilter where a whole-document hash fails."""
    import random

    from pyspark.sql import functions as F

    from dstlr_spark.queries.textstats import _winnow_fps, _winnow_grams

    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(200)]
    edited = list(words)
    edited[100] = "EDITED"
    unrelated = [f"u{rng.randrange(500)}" for _ in range(200)]
    df = spark.createDataFrame(
        [("orig", " ".join(words)), ("edit", " ".join(edited)),
         ("other", " ".join(unrelated))],
        "doc_id string, text string",
    )
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", _winnow_fps(_winnow_grams(F.col("text"))).alias("fps")
        ).collect()
    }
    jacc = lambda a, b: len(a & b) / len(a | b)
    assert jacc(fps["orig"], fps["edit"]) > 0.8
    assert jacc(fps["orig"], fps["other"]) < 0.05
