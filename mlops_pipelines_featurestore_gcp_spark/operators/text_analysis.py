"""Text analysis: language ID, quality scoring, token counting — the
per-document statistics a training-data pipeline filters on.

Everything is built-in-function expressions (whole-stage codegen; no Python
in the hot path). Ratios are int/int divisions → bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import BPE_TOKEN_RE, STOPWORDS, normalize, stopword_hits, tokens
from mlops_pipelines_featurestore_gcp_spark.operators.dedup import _spread

PUNCT_RE = r"[.,!?;:]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics.

    n_tokens: whitespace tokens; n_bpe_tokens: BPE-ish pre-tokenizer count
    (words + punctuation); n_uniq_tokens; avg_token_len.
    """
    df = _spread(df)
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
        # sum(len(tok)) == len(concat of toks) — a codegen built-in, not a
        # CodegenFallback aggregate() lambda
        (
            F.length(F.concat_ws("", toks)).cast("long")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality features + a composite score.

    The score mixes length saturation, stopword presence, lexical diversity
    and punctuation density — the standard cheap pre-filters applied before
    expensive model-based quality classifiers.
    """
    df = _spread(df)
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_RE), 0))
    n_stop = stopword_hits(toks, "en")
    uniq_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_char, F.lit(1))
    length_term = F.least(n_tok, F.lit(100)) / F.lit(100.0)
    score = F.round(
        length_term * 0.4 + stop_ratio * 0.2 + uniq_ratio * 0.3 + (1.0 - punct_ratio) * 0.1, 6
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        score.alias("quality"),
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token statistics + quality features in ONE row-local pass.

    The union of ``token_stats`` and ``quality_score`` columns computed from a
    single scan — at corpus scale the text column is read once, not twice,
    and there is no join to reconcile the two projections.
    """
    df = _spread(df)
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_RE), 0))
    n_stop = stopword_hits(toks, "en")
    uniq_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_char, F.lit(1))
    length_term = F.least(n_tok, F.lit(100)) / F.lit(100.0)
    score = F.round(
        length_term * 0.4 + stop_ratio * 0.2 + uniq_ratio * 0.3 + (1.0 - punct_ratio) * 0.1, 6
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
        (
            F.length(F.concat_ws("", toks)).cast("long")
            / F.greatest(n_tok, F.lit(1))
        ).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        score.alias("quality"),
    )


def _lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_hits(toks, lang) for lang in STOPWORDS}


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic → (id, lang_pred, lang_hits).

    Scores each language by stopword hits on the token stream; argmax with a
    fixed precedence order (en > es > fr > de) for ties; 'und' when no
    stopword hits at all. Deterministic, engine-reproducible.
    """
    df = _spread(df)
    toks = tokens(normalize(F.col(text_col)))
    scores = _lang_scores(toks)
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in STOPWORDS:  # dict order = precedence order
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_hits"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, *, k: int = 8, sketch_size: int = 4) -> DataFrame:
    """Document fingerprint: bottom-s sketch of rolling k-gram hashes.

    Slides a k-char window over the normalized text (the rolling-hash pass),
    hashes every gram with the codegen polynomial char fold, and keeps the
    ``sketch_size`` smallest distinct values — a bottom-s sketch: an
    order/permutation-stable fingerprint whose overlap estimates resemblance,
    robust to small edits (unlike the exact-dedup md5 of the whole text).

    Plan shape mirrors the MinHash signature pass (the profiled-fast one):
    explode positions → poly_char_hash — all whole-stage codegen — then ONE
    partial-combined groupBy per doc. Every position row of a doc stays in
    its input partition, so the map-side combine collapses to one row per
    doc before the exchange. (The previous form — an md5-per-shingle
    ``transform`` lambda — ran interpreted: Spark HOFs are CodegenFallback,
    profiled ~18× slower at sf0.1.)

    Docs shorter than ``k`` keep their row: empty sketch, NULL fp_min.
    """
    from mlops_pipelines_featurestore_gcp_spark.functions.text import normalize, poly_char_hash
    from mlops_pipelines_featurestore_gcp_spark.operators.dedup import MINHASH_PRIME

    nt = normalize(F.col(text_col))
    pos = _spread(df).select(F.col(id_col), nt.alias("__nt")).select(
        F.col(id_col),
        "__nt",
        F.explode_outer(
            F.when(
                F.length("__nt") >= k,
                F.sequence(F.lit(1), F.length("__nt") - (k - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__i"),
    )
    h = F.when(
        F.col("__i").isNotNull(),
        poly_char_hash(F.col("__nt"), F.col("__i"), k, MINHASH_PRIME),
    )
    sketched = (
        pos.select(F.col(id_col), h.alias("__h"))
        .groupBy(id_col)
        .agg(F.slice(F.sort_array(F.collect_set("__h")), 1, sketch_size).alias("fp_sketch"))
    )
    return sketched.select(
        F.col(id_col),
        "fp_sketch",
        F.get("fp_sketch", 0).alias("fp_min"),
    )
