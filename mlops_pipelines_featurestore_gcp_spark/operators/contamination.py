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
``text_analysis.doc_fingerprint``). Per-document gram dedup is an explicit
pre-``distinct`` (map-side combined) feeding plain ``count`` aggregates —
two ``count_distinct`` in one agg would plan an Expand that doubles every
gram row through the shuffle, and deduping first also shrinks the
broadcast probe's input.

When the benchmark side is itself large (corpus-vs-corpus checks, giant
eval suites), ``bloom_contamination`` swaps the exact broadcast gram set
for a distributed Bloom filter: fixed ``m``-bit memory regardless of gram
count, no false negatives, tunable false-positive rate — the standard
two-tier recipe (bloom prefilter, exact verify of the survivors).

Grams are hashed to 60-bit md5 longs before the distinct/join (round 5):
an 8-byte key instead of a ~40-byte 5-token string shrinks the broadcast
table, the probe hash table, AND the corpus side's one wide shuffle ~5×.
A 60-bit collision would need ~2³⁰ distinct grams to reach even-odds
(birthday bound) and merely nudges one doc's hit count; the DuckDB oracle
replays the identical md5 fold so differential parity is exact either
way. ``hash_grams=False`` restores string keys for debugging overlap
content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.canonical import round6
from mlops_pipelines_featurestore_gcp_spark.functions.text import md5_long

from mlops_pipelines_featurestore_gcp_spark.operators.dedup import gram_rows as _grams


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    bench_text_col: str | None = None,
    hash_grams: bool = True,
) -> DataFrame:
    """Flag corpus documents sharing word ``n``-grams with the benchmark.

    Returns one row per corpus document that produced at least one n-gram:
    ``(id_col, n_grams, n_hits, contamination_frac)`` where ``n_grams`` is
    the document's distinct-gram count, ``n_hits`` how many of those occur
    anywhere in the benchmark, and ``contamination_frac = n_hits/n_grams``
    (rounded to 6 digits). Callers decide the drop threshold — the operator
    reports evidence, it doesn't destroy rows.
    """
    key = md5_long(F.col("gram"), bits=60) if hash_grams else F.col("gram")
    bench_grams = (
        _grams(benchmark, id_col, bench_text_col or text_col, n)
        .select(key.alias("__g"))
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
        .select(id_col, key.alias("__g"))
        .distinct()
        .join(F.broadcast(bench_grams), "__g", "left")
    )
    return per_doc.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.count("__hit").alias("n_hits"),
        round6(F.count("__hit") / F.count("*")).alias("contamination_frac"),
    )


def _bloom_positions(gram, *, m_bits: int, k: int):
    """k bit positions for a gram: xxhash64 with k seeds (JVM codegen —
    the probe side must reproduce these bit-for-bit, so no Python hashing
    anywhere)."""
    return [F.pmod(F.xxhash64(gram, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def build_gram_bloom(
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    m_bits: int = 1 << 23,
    k: int = 4,
) -> DataFrame:
    """Distributed Bloom filter over the benchmark's word n-grams.

    One aggregate builds it: explode each gram's ``k`` bit positions,
    group by 64-bit word index, fold masks with ``bit_or`` (associative →
    map-side combined; the shuffle carries at most ``m_bits/64`` rows no
    matter how many grams went in). Returns ``(word long, bits long)`` —
    ≤ m/64 rows, broadcastable at ANY benchmark size; persist it next to
    the corpus for reuse across decontamination runs.

    Sizing: fpr ≈ (1 − e^(−k·g/m))^k for g distinct grams; the default
    8M bits / k=4 gives ~2% at one million grams.
    """
    pos = (
        _grams(benchmark, id_col, text_col, n)
        .select(F.explode(F.array(*_bloom_positions(F.col("gram"), m_bits=m_bits, k=k))).alias("idx"))
    )
    return (
        pos.select(
            (F.col("idx") / 64).cast("long").alias("word"),
            # SQL shiftleft: the PySpark helper only takes a literal shift
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(idx, 64) AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_contamination(
    corpus: DataFrame,
    bloom: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    m_bits: int = 1 << 23,
    k: int = 4,
) -> DataFrame:
    """Contamination evidence against a Bloom filter from
    :func:`build_gram_bloom` (same ``m_bits``/``k``!).

    A gram "might hit" iff ALL ``k`` probed bits are set — Bloom semantics:
    every truly-contaminated gram is flagged (no false negatives; the exact
    check on survivors stays cheap because survivors are rare), plus an
    ~fpr sliver of clean grams. Plan: distinct (doc, gram) → explode k
    probe words → broadcast join the (tiny, fixed-size) filter → per-gram
    all-bits-set fold → per-doc counts. The corpus side stays map-side
    except the two keyed aggregates on its own keys.

    Output: (id, n_grams, n_maybe_hits, maybe_frac) — a SUPERSET of
    ``contamination_check``'s hits, asserted in tests.
    """
    per_doc = _grams(corpus, id_col, text_col, n).select(id_col, "gram").distinct()
    probes = per_doc.select(
        id_col,
        "gram",
        F.posexplode(F.array(*_bloom_positions(F.col("gram"), m_bits=m_bits, k=k))).alias("pi", "idx"),
    ).select(
        id_col,
        "gram",
        "pi",
        (F.col("idx") / 64).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(idx, 64) AS INT))").alias("mask"),
    )
    checked = probes.join(F.broadcast(bloom), "word", "left").withColumn(
        "bit_set", (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).cast("int")
    )
    gram_hits = checked.groupBy(id_col, "gram").agg(
        (F.sum("bit_set") == F.lit(k)).cast("int").alias("maybe_hit")
    )
    return gram_hits.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum("maybe_hit").cast("long").alias("n_maybe_hits"),
        round6(F.sum("maybe_hit") / F.count("*")).alias("maybe_frac"),
    )
