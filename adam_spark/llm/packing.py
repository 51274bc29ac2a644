"""Sequence packing: lay documents into fixed-length training contexts.

Models the standard pretraining data layout — concatenate documents in
a deterministic order and chunk the token stream into ``context_len``
windows (documents may straddle window boundaries; attention masking
handles the seams downstream). Returns, for every document, where its
tokens land: the starting context, the offset inside it, and how many
contexts it spans.

Scale design: packing runs WITHIN strata (a source/shard column), so
the cumulative-sum window partitions by a real key and parallelizes —
a global ``Window.orderBy`` without ``partitionBy`` would collapse the
whole corpus into one task, the classic window scale-killer this module
exists to avoid. Cross-stratum layout needs no coordination: contexts
are numbered per stratum (pack identity = (stratum, pack_index)). All
arithmetic is exact integers — no float ever appears, so results are
engine- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    context_len: int,
    strata_col: str,
    id_col: str = "doc_id",
    n_tokens: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    Documents order by ``id_col`` inside each stratum; ``n_tokens``
    defaults to the whitespace token count of ``text_col``. Output per
    document: (id, stratum, n_tokens, start_pack, start_offset,
    end_pack) where ``start_pack = floor(tokens_before / context_len)``,
    ``start_offset = tokens_before mod context_len`` and ``end_pack``
    is the context holding the document's last token (empty documents
    collapse to ``end_pack = start_pack``).
    """
    if n_tokens is None:
        from .dedup import token_count

        n_tokens = token_count(F.col(text_col))
    w = (
        Window.partitionBy("stratum")
        .orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).alias("stratum"),
        n_tokens.cast("long").alias("n_tokens"),
    ).withColumn("tokens_before", before)
    # `div`, not floor(a / b): Divide casts to DOUBLE, which rounds
    # cumulative counts past 2^53 — div stays on exact longs (counts are
    # non-negative, so div == floor here)
    ctx = int(context_len)
    return out.select(
        "id",
        "stratum",
        "n_tokens",
        F.expr(f"tokens_before div {ctx}").cast("long").alias("start_pack"),
        (F.col("tokens_before") % F.lit(ctx)).cast("long").alias("start_offset"),
        F.expr(f"(tokens_before + greatest(n_tokens - 1, 0L)) div {ctx}")
        .cast("long")
        .alias("end_pack"),
    )
