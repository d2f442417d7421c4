"""Document chunking: split long documents into overlapping token
windows — the complement of ``ops.packing`` (packing merges short docs
up to a budget; chunking splits long ones down to it). The standard
preprocessing step for context-bounded training and retrieval
indexing.

Zero-shuffle design: tokenize once (whitespace tokens, the regex-free
``ops.text.ws_tokens``), generate window start offsets with
``sequence``, slice with ``F.slice`` and re-join — all JVM built-ins in
one projection, then one ``explode``. No UDFs, no Python in the hot
path; every expression is mirrored by a DuckDB list-lambda oracle
(``chunk_sql``) so chunk boundaries are engine-independent facts.

Chunk grid: starts at 0, stride = chunk_tokens - overlap_tokens; the
LAST window is the only one allowed to be shorter than ``chunk_tokens``
(no look-back re-alignment — deterministic forward grid, same contract
as fixed-size byte chunking). A document with <= chunk_tokens tokens
yields exactly one chunk equal to itself (modulo whitespace
normalization to single spaces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.text import ws_tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    keep_cols: bool = False,
) -> DataFrame:
    """One row per (document, chunk): (id [, passthrough], chunk_idx,
    chunk_start — 0-based token offset, n_chunk_tokens, chunk_text).

    ``overlap_tokens`` of trailing context repeat at the head of the
    next chunk. Empty/whitespace-only documents yield one empty chunk
    (chunk_idx 0, empty text) — dropping rows silently would break
    join-back invariants.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    passthrough = [c for c in df.columns if keep_cols and c not in (id_col, text_col)]
    toked = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        ws_tokens(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    # last start = stride * floor(max(n-overlap-1, 0) / stride): the final
    # window begins at the last grid point that still adds >= 1 new token
    last_start = F.lit(stride) * F.floor(
        F.greatest(n - F.lit(overlap_tokens) - 1, F.lit(0)) / F.lit(stride)
    ).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), last_start, F.lit(stride).cast("long"))
    chunks = toked.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        toks,
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_tokens)
    return chunks.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
) -> str:
    """DuckDB oracle reproducing :func:`chunk_documents` exactly
    (list slices are 1-based and end-inclusive; ``generate_series`` is
    end-inclusive like Spark's ``sequence``)."""
    stride = chunk_tokens - overlap_tokens
    toks = (
        f"list_filter(string_split_regex({text_col}, '\\s+'), x -> x <> '')"
    )
    return f"""
    WITH tk AS (SELECT {id_col}, {toks} AS t FROM ({source_sql})),
    st AS (
        SELECT {id_col}, t,
               generate_series(
                   0,
                   {stride} * CAST(floor(greatest(len(t) - {overlap_tokens} - 1, 0) / {stride}) AS BIGINT),
                   {stride}) AS starts
        FROM tk),
    ex AS (
        SELECT {id_col}, t,
               CAST(unnest(starts) AS BIGINT) AS chunk_start,
               CAST(generate_subscripts(starts, 1) - 1 AS BIGINT) AS chunk_idx
        FROM st)
    SELECT {id_col}, chunk_idx, chunk_start,
           CAST(len(t[chunk_start + 1 : chunk_start + {chunk_tokens}]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(t[chunk_start + 1 : chunk_start + {chunk_tokens}], ' ') AS chunk_text
    FROM ex
    """
