"""Benchmark-contamination detection: word-n-gram overlap between a
candidate training corpus and an evaluation (benchmark) set.

The published decontamination recipe (GPT-3 appendix C / PaLM / Llama data
cards all describe variants): build the set of word n-grams appearing in
any benchmark document, then flag training documents whose n-grams hit
that set. At 100 TB the asymmetry is the whole design: the benchmark side
is small (eval suites are MBs, not TBs) so its distinct-gram set
broadcasts, and the corpus side never shuffles for the probe — grams are
generated map-side and the broadcast hash join probes in the same stage.
The only exchange is the final per-document distinct-aggregate on the
corpus' own id key.

Gram construction is the codegen explode pattern (positions →
``slice`` + ``concat_ws``), NOT a ``transform`` lambda — Spark's
higher-order functions are CodegenFallback and run interpreted (profiled
4.7× slower on this exact pass at sf0.1; same lesson as
``text_analysis.doc_fingerprint``). Per-document gram dedup happens in the
aggregate (``count_distinct``), which map-side-combines before the
exchange, so shuffle volume equals the distinct (doc, gram) pairs — the
same bytes an explicit pre-distinct would move, one stage earlier.

Grams are joined as strings here so the DuckDB oracle is bit-identical; a
production run would hash grams to int64 first (``functions.text.md5_long``)
to cut probe-side width — same plan shape, smaller rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.canonical import round6

from mlops_pipelines_featurestore_gcp_spark.operators.dedup import gram_rows as _grams


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
        _grams(benchmark, id_col, bench_text_col or text_col, n)
        .select("gram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # Distinct (doc, gram) FIRST, then plain counts: two count_distinct
    # aggregates would plan an Expand that doubles every gram row through
    # the shuffle, and the broadcast probe would run on raw positional
    # grams instead of the (smaller) deduped set. The distinct's partial
    # combine also shrinks the only wide shuffle.
    per_doc = (
        _grams(corpus, id_col, text_col, n)
        .select(id_col, "gram")
        .distinct()
        .join(F.broadcast(bench_grams), "gram", "left")
    )
    return per_doc.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.count("__hit").alias("n_hits"),
        round6(F.count("__hit") / F.count("*")).alias("contamination_frac"),
    )
