"""Gopher-style document quality filtering (Rae et al. 2021, App. A1.1).

The published rule set every large-scale pretraining pipeline applies before
model-based quality classifiers: word-count bounds, mean-word-length bounds,
symbol-to-word ratio, bullet-/ellipsis-line fractions, alphabetic-word
fraction, and a required-stopword floor. Everything here is built-in-function
expressions (whole-stage codegen, no Python, no shuffle) — at 100 TB this is
a map-only pass that runs at scan speed.

Regex patterns are restricted to syntax Java regex (Spark) and RE2 (DuckDB
and most scan engines) interpret identically — no lookaround, no
backreferences, ``(?m)`` anchors only — so the DuckDB oracle twin replays
the exact rule evaluation.

Reference analog: none (the reference ingests MovieLens ratings as-is,
``pipeline.py:31-41``); this is north-star LLM-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.canonical import round6
from mlops_pipelines_featurestore_gcp_spark.functions.text import tokens
from mlops_pipelines_featurestore_gcp_spark.operators.dedup import _spread

# The Gopher rule constants (published values).
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_REQUIRED_STOPWORDS = 2

# Gopher's required-stopword list.
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# "#" or ellipsis (ASCII "..." or U+2026) — the Gopher symbol set.
SYMBOL_RE = r"#|\.\.\.|…"
# Line starts with optional indent then a bullet marker. [ \t]* (not \s*)
# so the indent cannot swallow newlines and claim the next line's bullet.
BULLET_LINE_RE = r"(?m)^[ \t]*[-*•]"
# Line ends with an ellipsis. The optional \r keeps Java and RE2 agreeing
# on CRLF text: Java's multiline $ matches before the full \r\n unit (the
# \r? then matches empty), RE2's $ matches only before \n (the \r? consumes
# the \r) — both count the same lines either way.
ELLIPSIS_LINE_RE = r"(?m)(\.\.\.|…)\r?$"
# A token containing at least one ASCII letter, matched against the
# double-space-joined padded token string (same trick as
# ``functions.text.stopword_hits``: two separator spaces let adjacent
# tokens each consume one).
ALPHA_WORD_RE = r" [^ ]*[A-Za-z][^ ]* "


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def gopher_filters(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Gopher rule evaluation → features + per-rule flags + keep.

    One row-local select over the corpus: metrics, the seven rule booleans
    (as int for cross-engine hash stability), and the conjunction ``keep``.
    Ratios that feed a threshold are single int/int IEEE divisions, so any
    engine computing the same integers decides every rule identically.
    """
    df = _spread(df)
    text = F.col(text_col)
    toks = tokens(text)
    n_words = F.size(toks).cast("long")
    safe_words = F.greatest(n_words, F.lit(1))
    mean_len = F.length(F.concat_ws("", toks)) / safe_words
    n_lines = F.size(F.split(text, "\n")).cast("long")
    safe_lines = F.greatest(n_lines, F.lit(1))
    padded = F.concat(F.lit(" "), F.concat_ws("  ", toks), F.lit(" "))

    symbol_ratio = _count(text, SYMBOL_RE) / safe_words
    bullet_frac = _count(text, BULLET_LINE_RE) / safe_lines
    ellipsis_frac = _count(text, ELLIPSIS_LINE_RE) / safe_lines
    alpha_frac = _count(padded, ALPHA_WORD_RE) / safe_words
    lower_toks = tokens(F.lower(text))
    n_req = sum(
        F.array_contains(lower_toks, w).cast("int") for w in REQUIRED_STOPWORDS
    ).cast("long")

    rules = {
        "pass_word_count": (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS),
        "pass_mean_word_len": (mean_len >= MIN_MEAN_WORD_LEN) & (mean_len <= MAX_MEAN_WORD_LEN),
        "pass_symbol_ratio": symbol_ratio <= MAX_SYMBOL_RATIO,
        "pass_bullet_lines": bullet_frac < MAX_BULLET_LINE_FRAC,
        "pass_ellipsis_lines": ellipsis_frac < MAX_ELLIPSIS_LINE_FRAC,
        "pass_alpha_words": alpha_frac > MIN_ALPHA_WORD_FRAC,
        "pass_stopwords": n_req >= MIN_REQUIRED_STOPWORDS,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        round6(mean_len).alias("mean_word_len"),
        round6(symbol_ratio).alias("symbol_ratio"),
        round6(bullet_frac).alias("bullet_line_frac"),
        round6(ellipsis_frac).alias("ellipsis_line_frac"),
        round6(alpha_frac).alias("alpha_word_frac"),
        n_req.alias("n_required_stopwords"),
        *[c.cast("int").alias(name) for name, c in rules.items()],
        keep.cast("int").alias("keep"),
    )


def apply_gopher_filter(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Rows of ``df`` surviving every Gopher rule — the filter form of
    :func:`gopher_filters` for pipeline composition (``prepare_corpus``
    callers that want the rules as a pre-dedup gate)."""
    flags = gopher_filters(df, id_col, text_col).select(id_col, "keep")
    return df.join(flags.where(F.col("keep") == 1).drop("keep"), id_col)
