"""Count-min-sketch heavy hitters — the third sketch family beside
q32's HyperLogLog (distinct counts) and Greenwald-Khanna (quantiles).

At 100 TB "what are the most frequent tokens/domains/keys and roughly
how frequent" must not require a full exact frequency table: count-min
is a fixed (w=⌈e/ε⌉ × d=⌈ln 1/δ⌉) counter grid, merged associatively
across partitions, with the classic one-sided guarantee —

  true_count ≤ estimate ≤ true_count + ε·N   (w.p. ≥ 1−δ)

The NEVER-undercounts side is deterministic (not probabilistic), which
makes it a hash-exact contract flag; the overcount band holds w.p.
1−δ per item and is checked against the published ε·N bound.

Spark's `DataFrame.stat.countMinSketch` runs the sketch build as a
distributed treeAggregate (counter-grid partials merged map-side); only
the KB-sized grid returns to the driver — same driver-state budget as
the BPE vocabulary table (corpus-independent). Estimates for the k
report rows are then driver-side lookups into that grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters_cms(
    df: DataFrame,
    col: str | Column,
    *,
    k: int = 20,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Top-``k`` exact frequencies cross-checked against a count-min sketch.

    Returns one row per top-k item (exact count desc, item asc — a total
    deterministic order): ``(item, n_exact, no_undercount,
    within_eps_band)`` where ``no_undercount = (cms_estimate >= n_exact)``
    (CMS's deterministic guarantee) and ``within_eps_band =
    (cms_estimate <= n_exact + eps * N)`` (the 1−δ bound, ~50× headroom
    at the default ε for any realistically-skewed distribution). The raw
    CMS estimate feeds the two flags but is NOT emitted: its exact value
    depends on the JVM sketch's internal hashing, which no SQL oracle can
    replay — the flags are the portable contract (ADVICE r5).

    The exact top-k is ONE hash aggregate + top-k (the operator exists to
    VERIFY the sketch; a production pipeline would publish the sketch and
    skip the exact pass, or keep both while the exact side still fits).
    """
    c = F.col(col) if isinstance(col, str) else col
    # items are string-cast up front: the sketch hashes whatever type it
    # aggregates, and a driver-side estimateCount(py4j-boxed int) would
    # hash DIFFERENTLY than the JVM long the aggregate saw — casting once
    # makes build and probe hash identically for any input column type.
    # Lazy checkpoint: the exact top-k and the sketch aggregate both read
    # the materialized token rows — one corpus tokenize instead of two
    # (ADVICE r5; was three before N folded into the sketch pass below).
    items = (
        df.select(c.cast("string").alias("item"))
        .where(F.col("item").isNotNull())
        .localCheckpoint(eager=False)
    )
    exact = (
        items.groupBy("item")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("item").asc())
        .limit(k)
    )
    # Spark 4 exposes CMS as the SQL aggregate (the grid partials merge
    # map-side); the serialized grid comes back as binary and deserializes
    # through the JVM sketch class for driver-side point lookups. N rides
    # in the SAME aggregate — one pass, not a separate count() job.
    blob, n_total = items.agg(
        F.count_min_sketch(
            "item", F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("s"),
        F.count("*").alias("n"),
    ).head()
    spark = df.sparkSession
    bais = spark._jvm.java.io.ByteArrayInputStream(bytes(blob))
    sketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    rows = [
        (r["item"], int(r["n_exact"]), int(sketch.estimateCount(r["item"])))
        for r in exact.collect()  # k rows — report-sized, not data-sized
    ]
    out = spark.createDataFrame(rows, "item string, n_exact long, n_cms long")
    band = F.lit(float(eps)) * F.lit(float(n_total))
    return out.select(
        "item",
        "n_exact",
        (F.col("n_cms") >= F.col("n_exact")).cast("int").alias("no_undercount"),
        (F.col("n_cms") <= F.col("n_exact") + band).cast("int").alias("within_eps_band"),
    )
