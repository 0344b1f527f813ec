"""Text analysis for training-data pipelines — all JVM-side builtins.

Token counting (whitespace + word-regex), document fingerprinting,
language-ID heuristic, quality scoring. Every function returns integral or
string outputs so results are bit-stable across engines (the DuckDB oracle
hashes values; float division is kept out or floored to integers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ["the", "and", "a", "of", "to"]


def ws_token_count(text: Column) -> Column:
    """Whitespace token count. Empty / whitespace-only text counts 0 —
    split('') yields [''] and the naive size() reported empty docs as
    1-token docs to every downstream filter."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def word_token_count(text: Column) -> Column:
    """BPE-ish word/punct token count: word runs OR single non-space chars."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def occurrences(text: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences of a literal substring."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def normalize_text(text: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def stopword_hits(text: Column, stopwords: list[str] | None = None) -> Column:
    """Total occurrences of padded stopwords in the normalized text.

    Whitespace runs normalize to TWO spaces (not one) so consecutive
    repeats each keep their own padding: under single spaces the
    non-overlapping count of ' the ' in ' the the the ' is 2, not 3 —
    the first match consumes the shared middle space, undercounting
    repetitious text (and skewing lang_id votes on short docs). The
    DuckDB oracles mirror the same double-space normalization."""
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", "  "),
        F.lit(" "),
    )
    total = F.lit(0)
    for w in stopwords or STOPWORDS_EN:
        total = total + occurrences(norm, f" {w} ")
    return total


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features (integral): chars, tokens, stopwords, score.

    score = permille of stopword tokens + permille of length in [50,2000]
    band — a simple, deterministic stand-in for a trained quality model.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = ws_token_count(text)
    n_stop = stopword_hits(text)
    # greatest(.,1): an empty doc has 0 tokens now — the permille is 0,
    # not a division error (ANSI mode) or a fake 1-token doc
    stop_permille = F.floor(
        F.lit(1000) * n_stop / F.greatest(n_tokens, F.lit(1))
    ).cast("bigint")
    len_ok = ((n_chars >= 50) & (n_chars <= 2000)).cast("bigint")
    score = stop_permille + F.lit(1000) * len_ok
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars_f"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_stop.cast("bigint").alias("n_stopwords"),
        score.alias("quality_score"),
    )


# --- PII redaction -----------------------------------------------------
#
# Pattern order matters: email is redacted first (its local part may contain
# digits/dots that would otherwise be nibbled by the number-shaped patterns),
# then SSN (3-2-4) before phone (3-3-4) — the two never overlap thanks to the
# \b anchors, but a fixed order keeps the redacted text deterministic.
# Patterns are kept to the Java-regex ∩ RE2 dialect (no backrefs, no
# lookaround) so the same strings run verbatim in Spark and the DuckDB
# oracle. Reference analogue: DBImport's per-column anonymization at import
# time (import_operations.py:1383-1395); here generalized to in-text PII.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]


def redact_pii(text: Column) -> Column:
    """Redact all PII_PATTERNS classes, applied in declaration order."""
    red = text
    for _name, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return red


def pii_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII counts (per class, on the ORIGINAL text) + a fingerprint
    of the fully redacted text. All JVM-side regex — scales as a pure
    projection, no shuffle."""
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint").alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]
    return df.select(F.col(id_col), *counts, F.md5(redact_pii(text)).alias("red_fp"))


def repetition_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition-quality signals, integral permilles.

    Per doc: token count, distinct-token ratio, top-token frequency share,
    and top-bigram frequency share — the classic "repetitious document"
    filters for training corpora. Shape at scale: explode → two hash
    aggregations with map-side partial combine (shuffle keys (doc, token)
    then doc), one doc-keyed join; no window over the full corpus, no
    driver-side state.
    """
    idc = F.col(id_col)
    toks = df.select(idc, F.split(normalize_text(F.col(text_col)), " ").alias("t"))
    tok = toks.select(idc, F.explode("t").alias("w"))
    tc = tok.groupBy(id_col, "w").count()
    agg = tc.groupBy(id_col).agg(
        F.sum("count").alias("n"), F.count("*").alias("d"), F.max("count").alias("m")
    )
    bigrams = toks.select(
        idc,
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i])) "
                "ELSE array() END"
            )
        ).alias("b"),
    )
    bc = bigrams.groupBy(id_col, "b").count()
    bagg = bc.groupBy(id_col).agg(F.sum("count").alias("bn"), F.max("count").alias("bm"))
    return agg.join(bagg, id_col, "left").select(
        idc,
        F.col("n").cast("bigint").alias("n_tokens"),
        F.floor(F.lit(1000) * F.col("d") / F.col("n")).cast("bigint").alias("distinct_permille"),
        F.floor(F.lit(1000) * F.col("m") / F.col("n")).cast("bigint").alias("top_token_permille"),
        F.coalesce(
            F.floor(F.lit(1000) * F.col("bm") / F.col("bn")), F.lit(0)
        ).cast("bigint").alias("top_bigram_permille"),
    )


LANG_MARKERS: dict[str, list[str]] = {
    # padded-word markers; scored by total occurrences, ties broken by order
    "en": ["the", "and"],
    "de": ["der", "und"],
    "es": ["el", "los"],
    "fr": ["le", "et"],
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram/stopword language-ID heuristic.

    CJK characters dominate; otherwise the language whose marker stopwords
    occur most (ties: first in LANG_MARKERS order); 'und' (undetermined)
    when nothing fires.
    """
    text = F.col(text_col)
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0
    scores = [
        (lang, stopword_hits(text, markers)) for lang, markers in LANG_MARKERS.items()
    ]
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:  # first-wins on ties ⇒ iterate, keep strict >
        best = F.when(score > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(score > best_score, score).otherwise(best_score)
    pred = F.when(has_cjk, F.lit("zh")).otherwise(best)
    return df.select(F.col(id_col), pred.alias("lang_pred"))
