"""Text-analysis operators for a large-scale training-data pipeline.

Beyond the reference's operator set: language-ID (stopword heuristic),
quality scoring, token counting, and document fingerprinting over a
``documents(doc_id, text, lang, source, n_chars)`` table. All pure column
expressions (JVM-side, whole-stage codegen — no Python in the hot path), so
they scale to 100 TB exactly like any other Catalyst plan: narrow map-only
stages, filters/projections pushed into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny embedded stopword lists (public-domain common-word lists)
EN_STOPWORDS = (
    "the a an of to in and is are was were be for on with as at by it this "
    "that from or not"
).split()
DE_STOPWORDS = "der die das und ist sind ein eine zu mit von für auf als".split()

_WS = r"\s+"


def tokens_expr(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), _WS)


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (BPE-ish subword estimate = chars/4 fallback)."""
    return F.when(F.trim(text) == "", 0).otherwise(F.size(tokens_expr(text)))


def stopword_ratio_expr(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = tokens_expr(text)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio_expr(text: Column) -> Column:
    clean = F.regexp_replace(text, r"[^\w\s]", "")
    return F.when(
        F.length(text) > 0,
        (F.length(text) - F.length(clean)) / F.length(text),
    ).otherwise(F.lit(0.0))


def quality_score_expr(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation + stopword
    presence — the usual web-text quality heuristics (length/punct/stopword
    ratios), deterministic and SQL-expressible for the oracle."""
    n = F.length(text)
    length_score = F.when((n >= 100) & (n <= 20000), 1.0).when(n >= 20, 0.5).otherwise(0.0)
    punct_score = F.when(punct_ratio_expr(text) < 0.1, 1.0).otherwise(0.3)
    stop_score = F.when(stopword_ratio_expr(text) > 0.05, 1.0).otherwise(0.4)
    return F.round((length_score + punct_score + stop_score) / 3.0, 4)


def lang_id_expr(text: Column) -> Column:
    """Heuristic language ID: highest stopword hit-rate wins, 'other' below
    threshold. (Real n-gram models slot in the same shape — a per-language
    score column + greatest().)"""
    en = stopword_ratio_expr(text, EN_STOPWORDS)
    de = stopword_ratio_expr(text, DE_STOPWORDS)
    return (
        F.when((en < 0.02) & (de < 0.02), "other")
        .when(en >= de, "en")
        .otherwise("de")
    )


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (content-defined identity for exact dedup; same function exists in
    DuckDB, so it is oracle-checkable)."""
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), _WS, " "))


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count_expr(t).alias("n_tokens"),
        F.round(stopword_ratio_expr(t), 4).alias("stopword_ratio"),
        F.round(punct_ratio_expr(t), 4).alias("punct_ratio"),
        quality_score_expr(t).alias("quality"),
        lang_id_expr(t).alias("lang_guess"),
        fingerprint_expr(t).alias("fingerprint"),
    )
