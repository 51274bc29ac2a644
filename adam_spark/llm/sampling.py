"""Deterministic, engine-reproducible sampling for training-data
pipelines.

Spark's ``df.sample`` is seed-stable only for a fixed partition layout —
repartition the input and the sample changes. These operators derive
randomness from a content hash instead, so the same row is selected no
matter how the data is partitioned, which executor sees it, or which
engine runs the query (md5 hex is identical in Spark and DuckDB):

- :func:`hash_sample` — Bernoulli(fraction) by hash threshold: a pure
  narrow filter, zero shuffle, trivially parallel at 100 TB. The
  standard "hold out p% of the corpus, reproducibly, forever" tool.
- :func:`train_test_split` — the same primitive routed into named
  splits instead of dropped rows.
- :func:`stratified_sample` — exactly ``k`` rows per stratum, chosen by
  hash order (a deterministic shuffle-free lottery per stratum, then a
  per-stratum window rank). One shuffle on the stratum key; a heavily
  skewed stratum bottlenecks its own partition, which is acceptable
  because the output is capped at k rows per stratum — for quota
  sampling from a handful of giant sources, prefer :func:`hash_sample`
  with per-source fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash domain: first 7 hex digits of md5 → uniform on [0, 16^7)
_HASH_SPACE = 16**7


def _unit_hash(key: Column, seed: str) -> Column:
    """Uniform integer in [0, 16^7) from md5(seed || key) — identical
    in any engine with a standard md5. NULL keys hash via a sentinel so
    a sample at fraction 1.0 keeps every row and hash_sample /
    train_test_split route nullable keys identically."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.coalesce(key.cast("string"), F.lit("\x00null")))),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hashed key falls
    below ``fraction`` of the hash space. Partition-layout independent;
    re-running on re-sharded data returns the identical row set."""
    threshold = int(fraction * _HASH_SPACE)
    return df.where(_unit_hash(F.col(key_col), seed) < F.lit(threshold))


def train_test_split(
    df: DataFrame,
    test_fraction: float,
    key_col: str,
    seed: str = "s0",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'test' (hash below the fraction) or 'train'.

    One extra column, no shuffle, no row loss; downstream filters prune
    either split at the scan when written partitioned by ``split_col``.
    """
    threshold = int(test_fraction * _HASH_SPACE)
    return df.withColumn(
        split_col,
        F.when(_unit_hash(F.col(key_col), seed) < F.lit(threshold), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
    seed: str = "s0",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, selected by hash order.

    The hash is the lottery ticket: rank rows within each stratum by
    (hashed key, key) and keep the first ``k``. Deterministic under any
    partitioning; the key tiebreak makes the selection total even on
    hash collisions.
    """
    h = _unit_hash(F.col(key_col), seed)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.lit(k))
        .drop("__rk")
    )


def sample_to_mixture(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "mix0",
) -> DataFrame:
    """Quota-sample a corpus to a target per-source token MIXTURE.

    ``weights`` gives the desired mixture proportions (normalized
    internally); each source's acceptance fraction is
    ``min(1, target_tokens / available_tokens)`` where ``target =
    token_budget · w_s / Σw`` — the standard data-mixing step that
    turns "we want 50% web / 30% books / 20% code" into a reproducible
    document sample. Selection reuses the content-hash Bernoulli
    primitive, so the sampled set is independent of partition layout
    and engine. Sources absent from ``weights`` are dropped; a source
    whose available tokens fall short of its target keeps everything
    (fraction capped at 1 — resampling/up-weighting is a training-time
    concern, not a corpus transform). Token-less documents in a kept
    source pass the same per-document lottery.

    Returns the sampled rows with two audit columns: ``__n_tokens``
    and ``accept_frac``. Scale shape: one small per-source aggregate
    (O(sources) rows) broadcast-joined back onto the stream, then a
    narrow hash filter — no corpus-sized shuffle anywhere.
    """
    from adam_spark.llm.dedup import token_count

    if not weights or token_budget <= 0:
        raise ValueError("need non-empty weights and a positive token_budget")
    wsum = float(sum(weights.values()))
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w) / wsum) for s, w in sorted(weights.items())],
        f"{source_col} string, __w double",
    )
    # count-only: the codegen'd regexp form (see dedup.token_count) —
    # this operator tokenizes the corpus twice (avail aggregate + the
    # per-row audit column), so the cheaper count pays double
    ntok = token_count(F.col(text_col)).cast("long")
    avail = (
        df.select(F.col(source_col), ntok.alias("__nt"))
        .groupBy(source_col)
        .agg(F.sum("__nt").alias("__avail"))
    )
    fr = wdf.join(avail, source_col).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.when(
                F.col("__avail") > 0,
                F.col("__w") * F.lit(float(token_budget)) / F.col("__avail"),
            ).otherwise(F.lit(1.0)),
        ).alias("accept_frac"),
    )
    return (
        df.withColumn("__n_tokens", ntok)
        .join(F.broadcast(fr), source_col)
        .where(
            _unit_hash(F.col(key_col), seed).cast("double")
            < F.col("accept_frac") * F.lit(float(_HASH_SPACE))
        )
    )
