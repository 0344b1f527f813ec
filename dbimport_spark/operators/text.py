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
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


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
    """Total occurrences of padded stopwords in the normalized text."""
    norm = F.concat(F.lit(" "), normalize_text(text), F.lit(" "))
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
    stop_permille = F.floor(F.lit(1000) * n_stop / n_tokens).cast("bigint")
    len_ok = ((n_chars >= 50) & (n_chars <= 2000)).cast("bigint")
    score = stop_permille + F.lit(1000) * len_ok
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars_f"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_stop.cast("bigint").alias("n_stopwords"),
        score.alias("quality_score"),
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
