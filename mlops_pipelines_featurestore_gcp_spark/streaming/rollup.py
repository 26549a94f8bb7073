"""Continuous aggregates: hypertable-style incrementally-maintained
time-bucket rollups (the TimescaleDB continuous-aggregate shape on plain
parquet + Spark).

A full `groupBy(bucket).agg(...)` over 100 TB per refresh is the thing this
replaces. The store keeps PARTIAL aggregate state — count, sum, min, max —
per (time bucket, key), partitioned by bucket on disk. A refresh:

1. partial-aggregates ONLY the incoming batch (map-side combine; the
   batch's rows never join the historical table);
2. reads ONLY the stored partials for the buckets the batch touches
   (partition pruning on disk — untouched history is never opened);
3. merges (partials are associative: count+count, sum+sum, min(min),
   max(max)) and dynamic-partition-overwrites just those buckets.

Cost ∝ batch size + touched-bucket state, never table size. Finalization
(avg = sum/count) happens at READ time, so the stored state stays
mergeable — the classic partial-aggregate contract, the same one Spark's
own map-side combine relies on.

Exactly-once: ``refresh`` records the batch id high-water mark and skips
replays (Structured Streaming re-delivers a failed micro-batch under the
SAME id — merging partials twice would double-count, the additive-state
failure mode append/recompute sinks don't have). ``rollup_sink`` wires
this into ``writeStream.foreachBatch``.

Cascades compose: a day-grain ``ContinuousAggregate`` can ``refresh`` from
the hour-grain store's partials (sum-of-sums), never from raw data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_rollup_meta.json"


class ContinuousAggregate:
    """Incrementally-maintained rollup of ``value_col`` per (bucket, keys).

    ``bucket_width`` is in the units of the numeric ``time_col`` (pass
    ``unix_micros(ts)`` upstream, same convention as the session/funnel
    operators).
    """

    def __init__(
        self,
        path: str,
        *,
        time_col: str,
        value_col: str,
        keys: list[str],
        bucket_width: int,
    ) -> None:
        self.path = path
        self.time_col = time_col
        self.value_col = value_col
        self.keys = list(keys)
        self.bucket_width = int(bucket_width)

    # --- state layout -----------------------------------------------------
    def _partials(self, df: DataFrame) -> DataFrame:
        bucket = (F.floor(F.col(self.time_col) / F.lit(self.bucket_width))).cast("long")
        return (
            df.withColumn("bucket", bucket)
            .groupBy("bucket", *self.keys)
            .agg(
                F.count(self.value_col).alias("p_count"),
                # DECIMAL partials: refresh order / batch boundaries must not
                # change the stored state (double sums are order-dependent in
                # the low bits; decimal addition is exact) — the property that
                # makes incremental == full-recompute bit-for-bit, and lets a
                # SQL oracle replay the rollup with one GROUP BY
                F.sum(F.col(self.value_col).cast("decimal(18,6)")).cast("decimal(18,6)").alias("p_sum"),
                F.min(self.value_col).alias("p_min"),
                F.max(self.value_col).alias("p_max"),
            )
        )

    def _merge(self, parts: DataFrame) -> DataFrame:
        return parts.groupBy("bucket", *self.keys).agg(
            F.sum("p_count").alias("p_count"),
            # decimal sum widens precision; narrow back so the state schema
            # is stable across refreshes
            F.sum("p_sum").cast("decimal(18,6)").alias("p_sum"),
            F.min("p_min").alias("p_min"),
            F.max("p_max").alias("p_max"),
        )

    def _last_batch(self) -> int:
        meta = os.path.join(self.path, _META)
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f)["last_batch_id"]
        return -1

    def _record_batch(self, batch_id: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, _META), "w") as f:
            json.dump({"last_batch_id": batch_id}, f)

    # --- API ----------------------------------------------------------------
    def refresh(self, batch: DataFrame, *, batch_id: int = 0) -> None:
        """Merge a batch into the rollup; replay-safe via the batch-id
        high-water mark (partials are additive — merging a re-delivered
        batch twice would double-count)."""
        if batch_id <= self._last_batch():
            return
        spark = batch.sparkSession
        incoming = self._partials(batch)
        store = os.path.join(self.path, "state")
        if os.path.isdir(store) and any(
            e.startswith("bucket=") for e in os.listdir(store)
        ):
            touched = [r["bucket"] for r in incoming.select("bucket").distinct().collect()]
            existing = spark.read.parquet(store).where(F.col("bucket").isin(touched))
            merged = self._merge(existing.unionByName(incoming))
        else:
            merged = incoming
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy("bucket").parquet(store)
        self._record_batch(batch_id)

    def read(self, spark: SparkSession) -> DataFrame:
        """Finalized rollup: (bucket, keys..., n, total, vmin, vmax, vavg).
        Bucket-range filters prune partitions at the file level."""
        st = spark.read.parquet(os.path.join(self.path, "state"))
        total = F.col("p_sum").cast("double")
        return st.select(
            "bucket",
            *self.keys,
            F.col("p_count").alias("n"),
            total.alias("total"),
            F.col("p_min").alias("vmin"),
            F.col("p_max").alias("vmax"),
            (total / F.col("p_count")).alias("vavg"),
        )

    def cascade_into(self, coarser: "ContinuousAggregate", spark: SparkSession, *, batch_id: int = 0) -> None:
        """Refresh a coarser-grain rollup FROM this store's partials
        (sum-of-sums / min-of-mins) — raw data is never re-read. The
        coarser bucket width must be a multiple of this one's."""
        if coarser.bucket_width % self.bucket_width != 0:
            raise ValueError(
                f"coarser width {coarser.bucket_width} is not a multiple of {self.bucket_width}"
            )
        st = spark.read.parquet(os.path.join(self.path, "state"))
        ratio = coarser.bucket_width // self.bucket_width
        rebucketed = st.withColumn(
            "bucket", F.floor(F.col("bucket") / F.lit(ratio)).cast("long")
        )
        merged = self._merge(rebucketed)
        if batch_id <= coarser._last_batch():
            return
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(coarser.path, "state")
        )
        coarser._record_batch(batch_id)


def rollup_sink(
    stream: DataFrame,
    agg: ContinuousAggregate,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Maintain the continuous aggregate from a stream: each micro-batch
    merges its partials under its batch id (replay-idempotent)."""

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        agg.refresh(batch_df, batch_id=batch_id)

    writer = stream.writeStream.foreachBatch(_refresh).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
