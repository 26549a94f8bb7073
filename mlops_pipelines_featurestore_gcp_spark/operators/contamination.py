"""Benchmark-contamination detection: word-n-gram overlap between a
candidate training corpus and an evaluation (benchmark) set.

The published decontamination recipe (GPT-3 appendix C / PaLM / Llama data
cards all describe variants): build the set of word n-grams appearing in
any benchmark document, then flag training documents whose n-grams hit
that set. At 100 TB the asymmetry is the whole design: the benchmark side
is small (eval suites are MBs, not TBs) so its distinct-gram set
broadcasts, and the corpus side never shuffles for the probe — grams are
generated map-side (row-local ``transform`` + ``explode``), the broadcast
hash join probes in the same stage, and the only exchange is the final
per-document aggregate on the corpus' own id key.

Grams are joined as strings here so the DuckDB oracle is bit-identical; a
production run would hash grams to int64 first (``functions.text.md5_long``)
to cut probe-side width — same plan shape, smaller rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import normalize, tokens, word_ngrams


def _distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Per-document DISTINCT word n-grams of normalized text → (id, gram).

    array_distinct runs row-local BEFORE the explode, so duplicate grams
    inside one document never reach the join.
    """
    grams = F.array_distinct(word_ngrams(tokens(normalize(F.col(text_col))), n))
    return df.select(F.col(id_col), F.explode(grams).alias("gram"))


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Flag corpus documents sharing word ``n``-grams with the benchmark.

    Returns one row per corpus document that produced at least one n-gram:
    ``(id_col, n_grams, n_hits, contamination_frac)`` where ``n_grams`` is
    the document's distinct-gram count, ``n_hits`` how many of those occur
    anywhere in the benchmark, and ``contamination_frac = n_hits/n_grams``
    (rounded to 6 digits). Callers decide the drop threshold — the operator
    reports evidence, it doesn't destroy rows.
    """
    bench_grams = (
        _distinct_grams(benchmark, id_col, bench_text_col or text_col, n)
        .select("gram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus_grams = _distinct_grams(corpus, id_col, text_col, n)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("__hit").alias("n_hits"),
            F.round(F.count("__hit") / F.count("*"), 6).alias("contamination_frac"),
        )
    )
