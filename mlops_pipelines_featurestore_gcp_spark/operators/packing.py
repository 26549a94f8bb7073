"""Sequence packing: lay a corpus out as fixed-token training sequences.

After chunking/sampling, a training pipeline concatenates documents into a
token stream and cuts it into fixed-length sequences (the "packing" step
that keeps GPU batches dense). At 100 TB a single global concatenation
order is the anti-pattern — it needs a total order (one-task sort). This
operator shards the corpus first: each document is hash-assigned to one of
``shards`` independent streams, and packing runs per shard.

Scale posture: ONE shuffle (the window partitioned by ``shard``); within a
shard the sort key is tiny (hash, id, token count — no text moves). The
caller sizes ``shards`` to the cluster (one shard ≈ one task's worth of
metadata rows); shards are independent, so packing parallelism is exactly
``shards``. All decisions are md5-hash-deterministic — reruns, retried
tasks, and the SQL oracle (plans/llm_data.py t08) reproduce the identical
layout, and growing the corpus never perturbs an existing shard's relative
order (new docs splice in at hash positions, as in a diffable dataset
version).

No reference analogue (the reference trains on fixed-shape MovieLens
vectors — ``trainer_component.py`` consumes bounded trajectories); this is
part of the LLM-corpus surface the driver contract adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import tokens


def md5_long(col, salt: str, nhex: int = 8):
    """First ``nhex`` hex digits of md5(salt|col) as a non-negative long —
    the engine-portable deterministic hash shared with the sampling and
    dedup families (DuckDB replays it with substr(md5(..)))."""
    s = F.concat(F.lit(salt), F.lit("|"), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, nhex), 16, 10).cast("long")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    seq_tokens: int = 512,
    shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign every non-empty document a position in a packed token stream.

    Each doc lands in shard ``md5(salt|id) % shards``; within its shard the
    stream order is the same md5 value (ties broken by id). ``seq_offset``
    is the doc's first-token offset in the shard's concatenated stream,
    ``seq_id`` the fixed-size training sequence that offset falls in, and
    ``pos_in_seq`` the offset within that sequence (a doc may straddle a
    sequence boundary; the downstream batch former splits it — standard
    packed-pretraining semantics).

    Output grain: one row per document with tokens —
    ``(id_col, shard, n_tokens, seq_offset, seq_id, pos_in_seq)``.
    """
    if seq_tokens <= 0:
        raise ValueError(f"seq_tokens must be positive, got {seq_tokens}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    idc = F.col(id_col)
    h = md5_long(idc, salt)
    counted = (
        df.select(
            idc,
            F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
            F.pmod(h, F.lit(shards)).cast("long").alias("shard"),
            h.alias("__h"),
        )
        .where(F.col("n_tokens") > 0)
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("seq_offset")
    return counted.select(id_col, "shard", "n_tokens", offset).select(
        id_col,
        "shard",
        "n_tokens",
        "seq_offset",
        (F.col("seq_offset") / seq_tokens).cast("long").alias("seq_id"),
        (F.col("seq_offset") % seq_tokens).alias("pos_in_seq"),
    )
