"""Scalar text functions (SURVEY.md §2.7 C1-C12).

Every function here returns a Column built from pyspark.sql.functions —
JVM-side, whole-stage-codegen'd, no Python in the hot path. The lone
unavoidable Python step (UTF-8 byte truncation, C9) is an Arrow-batched
pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: POS-tag-punctuation class the reference drops from lemma keys
#: (ExtractTriples.scala:192). We apply it to surface tokens.
PUNCT_RE = r"[.?,:;'\"!]"


def normalize_relation_name(col: Column | str) -> Column:
    """``per:city_of_birth`` → ``PER_CITY_OF_BIRTH``
    (reference: replaceAll(":","_").toUpperCase, ExtractTriples.scala:222)."""
    return F.upper(F.regexp_replace(F.col(col) if isinstance(col, str) else col, ":", "_"))


def lemma_key(col: Column | str) -> Column:
    """Mention identity key ≈ reference ``toLemmaString``
    (ExtractTriples.scala:190-195): tokens minus pure-punctuation tokens,
    with trailing punctuation stripped, space-joined.

    Our deterministic annotator has no statistical lemmatizer; the key is
    the punctuation-normalized surface form, which is a pure function —
    exactly what X5's content-addressed ids need.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, r"\s+")
    cleaned = F.transform(toks, lambda t: F.regexp_replace(t, PUNCT_RE, ""))
    nonempty = F.filter(cleaned, lambda t: t != "")
    return F.array_join(nonempty, " ")


def stable_mention_id(doc: Column | str, key: Column | str) -> Column:
    """Deterministic per-document mention id (SURVEY.md X5/C11).

    The reference assigns ``UUID.randomUUID()`` per new lemma key within a
    document (ExtractTriples.scala:73,102) — nondeterministic and
    non-resumable. We use a content-addressed surrogate
    ``md5(doc ‖ 0x1f ‖ lemma_key)``: same identity semantics (one id per
    distinct key per doc), reproducible across retries and resume. md5 is
    chosen over sha1 because the DuckDB correctness oracle must reproduce
    ids bit-for-bit and DuckDB ships md5 but not sha1.
    """
    d = F.col(doc) if isinstance(doc, str) else doc
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat_ws("\x1f", d, k))


def reformat_sparql_date(col: Column | str) -> Column:
    """``yyyy-MM-dd'T'HH:mm:ss'Z'`` → ``yyyy-MM-dd`` (C6,
    EnrichTriples.scala:57-58,67). Non-date values pass through unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
    return F.when(parsed.isNotNull(), F.date_format(parsed, "yyyy-MM-dd")).otherwise(c)


def span_index_label(begin: Column | str, end: Column | str) -> Column:
    """``"begin-end"`` index label (C10, LoadTriples.scala:67)."""
    b = F.col(begin) if isinstance(begin, str) else begin
    e = F.col(end) if isinstance(end, str) else end
    return F.concat_ws("-", b.cast("string"), e.cast("string"))


@F.pandas_udf(T.StringType())
def utf8_truncate_1024(s: pd.Series) -> pd.Series:
    """Cap a string at 1024 UTF-8 **bytes** (C9, LoadTriples.scala:16-17,55-59).

    The reference byte-slices and can split a multi-byte code point; we
    decode with errors='ignore' so the result is always valid UTF-8 —
    a documented, deliberate divergence (SURVEY.md C9).
    """
    return s.map(
        lambda x: x
        if x is None or len(x.encode("utf-8")) <= 1024
        else x.encode("utf-8")[:1024].decode("utf-8", "ignore")
    )


def utf8_truncate_1024_gated(col: Column | str) -> Column:
    """C9 with a JVM fast path: a string of ≤256 characters can never
    exceed 1024 UTF-8 bytes (≤4 bytes per code point), so >99.99% of
    spans skip the Arrow round-trip entirely and stay inside whole-stage
    codegen; only rare long spans pay the pandas UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) <= 256, c).otherwise(utf8_truncate_1024(c))


def max_sentence_tokens(contents: Column | str) -> Column:
    """Longest-sentence token count for the F3 cost guard
    (ExtractTriples.scala:66): sentences split on terminal punctuation +
    whitespace, tokens on whitespace. Pure column expressions."""
    c = F.col(contents) if isinstance(contents, str) else contents
    sentences = F.split(c, r"(?<=[.?!])\s+")
    counts = F.transform(
        sentences, lambda s: F.size(F.filter(F.split(F.trim(s), r"\s+"), lambda t: t != ""))
    )
    return F.coalesce(F.array_max(counts), F.lit(0))
