"""Keyed upsert (merge) sink over hash-bucket-partitioned parquet.

Plain parquet has no MERGE: the naive upsert reads the WHOLE table, unions
the batch, dedups, and rewrites everything — a full-table write per batch,
unusable at 100 TB. This module stores the table partitioned by a stable
hash bucket of the key (``bucket=hash(key) % n``), so an incoming batch
only touches the buckets its keys land in:

  1. bucket the incoming batch (narrow projection),
  2. read ONLY those buckets of the existing table (partition pruning —
     the other ``n - |touched|`` buckets are never opened),
  3. latest-wins per key inside the union (version column, then tie-break),
  4. dynamic-partition-overwrite the touched buckets atomically.

Per-batch cost is proportional to |touched buckets| ≈ batch key spread,
not table size. A retried/replayed batch recomputes the identical bucket
contents and overwrites the same partitions — idempotent, the same
exactly-once construction as ``log_loop``'s ``_batch`` sink (reference's
at-least-once append path: ``logger/main.py:107-150`` has no such guard).

Use standalone for batch CDC-style merges, or as the ``foreachBatch``
body of a streaming write (``upsert_sink``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BUCKET = "__kbucket"


def _bucketed(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    # non-negative stable hash: Murmur3 is fixed across Spark versions and
    # machines, so bucket layout survives restarts and cluster moves
    return df.withColumn(_BUCKET, F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))


def upsert_batch(
    table_path: str,
    batch: DataFrame,
    *,
    key: str,
    version_col: str,
    n_buckets: int = 64,
) -> None:
    """Merge ``batch`` into the keyed table at ``table_path``.

    Latest ``version_col`` wins per key (existing row kept when the batch
    carries an older version — late/replayed data cannot regress a key).
    """
    spark = batch.sparkSession
    incoming = _bucketed(batch, key, n_buckets)
    touched = [r[_BUCKET] for r in incoming.select(_BUCKET).distinct().collect()]
    if not touched:
        return
    if os.path.isdir(table_path) and any(
        e.startswith(f"{_BUCKET}=") for e in os.listdir(table_path)
    ):
        existing = (
            # mergeSchema: batches may EVOLVE the schema (new columns);
            # untouched buckets keep their old files and read as NULL for
            # columns they predate — plain parquet schema evolution
            spark.read.option("basePath", table_path)
            .option("mergeSchema", "true")
            .parquet(table_path)
            .where(F.col(_BUCKET).isin(touched))  # partition-pruned read
        )
        # allowMissingColumns both ways: a batch can add columns the table
        # lacks, and late replays can lack columns the table gained
        merged = existing.unionByName(incoming, allowMissingColumns=True)
    else:
        merged = incoming
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # The merge plan reads the same path it overwrites: eagerly materialize
    # first, or a task retry mid-replacement would re-read partially
    # rewritten buckets (same barrier as rollup._write_state).
    latest = latest.localCheckpoint(eager=True)
    # dynamic overwrite replaces exactly the touched bucket partitions;
    # untouched buckets' files are never rewritten (or read). One shuffle
    # output per bucket keeps each rewritten dir at a single file
    # (self-compacting — without this every merge leaves one shard per
    # contributing shuffle partition and small files accumulate)
    (
        latest.repartition(F.col(_BUCKET))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BUCKET)
        .parquet(table_path)
    )


def read_upsert_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Current state of the upsert table (one row per key); mergeSchema so
    buckets untouched since a schema evolution still read (as NULLs)."""
    return spark.read.option("mergeSchema", "true").parquet(table_path).drop(_BUCKET)


def upsert_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    *,
    key: str,
    version_col: str,
    n_buckets: int = 64,
    available_now: bool = True,
):
    """Attach the upsert merge as a ``foreachBatch`` streaming sink.

    Batch replay after a crash re-runs ``upsert_batch`` for the same
    micro-batch; latest-wins plus dynamic overwrite make the rerun converge
    to the identical table state (idempotent effect, exactly-once result).
    """

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        upsert_batch(table_path, batch_df, key=key, version_col=version_col, n_buckets=n_buckets)

    writer = stream.writeStream.foreachBatch(_merge).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
