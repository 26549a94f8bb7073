"""Document chunking: split long documents into overlapping token windows.

The standard pre-tokenization step of a training-data / RAG pipeline: a
100 TB corpus of arbitrarily long documents becomes a relation of
bounded-size chunks that downstream batch formation (and context-window
packing) can treat as units.

Everything is built-in array expressions (split → sequence → slice →
concat_ws) inside whole-stage codegen — the explode is map-side only, so
chunking adds ZERO shuffles: each output chunk row is produced in the
partition that read its document. Chunk counts grow the row count by
~n_tokens/stride per document, which parquet scan parallelism already
absorbs (the operator never widens a partition by more than the document
size itself).

No reference analogue (the reference feeds fixed-shape MovieLens vectors;
``generator_component.py:122-137`` builds bounded trajectories) — this is
part of the LLM-corpus surface the driver contract adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token windows of ``chunk_tokens``
    tokens advancing by ``chunk_tokens - overlap`` (so consecutive chunks
    share ``overlap`` tokens).

    Window starts are 0, stride, 2·stride, … for every start < max(n_tokens
    - overlap, 1): each emitted chunk contains at least one token not
    covered by the previous chunk, and the final (possibly ragged) window
    always reaches the end of the document. Documents with zero tokens
    produce zero chunks.

    Output grain: one row per (document, chunk): ``(id_col, chunk_idx,
    chunk_start, chunk_text, n_chunk_tokens)``.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # Largest useful start is the biggest multiple of stride strictly below
    # max(n - overlap, 1); sequence() is inclusive so the bound is that
    # value minus one. n == 0 short-circuits to no chunks.
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), F.greatest(n - F.lit(overlap + 1), F.lit(0)), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return (
        df.select(F.col(id_col), toks.alias("__toks"), F.explode(starts).alias("__start"))
        .select(
            F.col(id_col),
            (F.col("__start") / stride).cast("long").alias("chunk_idx"),
            F.col("__start").cast("long").alias("chunk_start"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
        )
    )
