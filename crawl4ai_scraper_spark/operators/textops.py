"""Text-analysis operators over a document table — native Column builders.

Scale notes: every function here is a pure Column expression — no shuffle, no
UDF, fully pipelined inside whole-stage codegen; at 100 TB these run at scan
speed. Stopword lists are tiny literals (broadcast-free).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic mini stopword lists (ordered; the CASE chain below must use
# the same order as the SQL oracle for tie-breaking).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}
LANG_ORDER = ["en", "de", "fr", "es"]

# BPE-ish token regex: letter runs | digit runs | single non-space symbol.
BPE_TOKEN_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.split(F.trim(text), "\\s+")


def token_count_ws(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish tokens — letters / digits / punctuation pieces."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RX), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(text: Column) -> Column:
    """Heuristic language-ID: most stopword hits wins, ties resolved in
    LANG_ORDER; zero hits everywhere → 'und'. Same CASE chain as the SQL
    oracle so results hash-match."""
    s = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    return (
        F.when(
            (s["en"] > 0) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
            F.lit("en"),
        )
        .when((s["de"] > 0) & (s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when((s["fr"] > 0) & (s["fr"] >= s["es"]), F.lit("fr"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9\\s]"), 0))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length saturation, stopword ratio, low
    punctuation density — rounded to 4dp for cross-engine hash stability."""
    n_tok = token_count_ws(text).cast("double")
    sw = stopword_hits(text, "en").cast("double")
    punct = punct_count(text).cast("double")
    len_part = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    sw_part = F.least(F.lit(1.0), F.lit(4.0) * sw / F.greatest(n_tok, F.lit(1.0)))
    punct_part = F.greatest(F.lit(0.0), F.lit(1.0) - punct / F.greatest(n_tok, F.lit(1.0)))
    return F.round(F.lit(0.4) * len_part + F.lit(0.3) * sw_part + F.lit(0.3) * punct_part, 4)


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the whitespace-collapsed, lowercased
    first-100-char prefix — the reference's extracted-part dedup key
    (selector_utils.py:199-210, O-31) promoted to a document operator."""
    norm = F.substring(F.regexp_replace(F.lower(text), "\\s+", " "), 1, 100)
    return F.md5(norm)
