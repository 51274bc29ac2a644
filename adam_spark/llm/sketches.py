"""Mergeable frequency sketches for corpus-scale term statistics.

A Count-Min sketch summarizes an unbounded token stream in O(width ×
depth) integers with a one-sided error guarantee (estimates never
undercount; overcount ≤ εN with probability 1−δ for width = e/ε,
depth = ln 1/δ). Expressed Spark-first, the sketch IS a tiny DataFrame
of (row, bucket, count): building it is one map-side-combined groupBy
whose key space is depth·width regardless of corpus size — the partial
aggregates on every executor are themselves count-min sketches being
merged, which is exactly how the sketch is meant to distribute.

Every hash is md5-derived (identical in any engine), so sketch
contents, estimates, and heavy-hitter sets have exact DuckDB oracles —
approximation here is a property of the ALGORITHM, not of the engine
run, and is therefore still hash-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _bucket(token: Column, j: Column, width: int, seed: str) -> Column:
    """Deterministic bucket for hash row ``j``: md5(seed·j·token) mod width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), j.cast("string"), F.lit("|"), token)),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Build a Count-Min sketch over a column of items (one count per
    row). Returns the sketch as (j, bucket, n) — depth·width rows at
    most, independent of input size. The groupBy key space is tiny, so
    map-side partial aggregation reduces each partition to ≤ depth·width
    counters before anything shuffles: the shuffle cost is
    O(partitions · depth · width), never O(corpus)."""
    e = df.select(
        F.col(col).alias("t"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    return (
        e.where(F.col("t").isNotNull())
        .groupBy("j", _bucket(F.col("t"), F.col("j"), width, seed).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Point-estimate counts for a frame of candidate items: min over
    the depth hash rows — never below the true count. The sketch is
    depth·width rows, so it broadcasts; estimation is a broadcast join
    plus a groupBy on the candidate key."""
    e = items.select(
        F.col(col).alias("t"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    keyed = e.select(
        "t", "j", _bucket(F.col("t"), F.col("j"), width, seed).alias("bucket")
    )
    return (
        keyed.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("t")
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Items whose estimated frequency is ≥ ``min_count``.

    One-sided guarantee: every true heavy hitter is returned (estimates
    never undercount); collisions may add false positives, bounded by
    the ε = e/width overcount. Candidates are the input's distinct
    items — at corpus scale substitute any cheaper candidate source
    (e.g. per-partition top-k) without touching the sketch math.
    """
    sk = count_min_sketch(df, col, width, depth, seed)
    cand = df.select(F.col(col).alias(col)).where(F.col(col).isNotNull()).distinct()
    return (
        cms_estimate(sk, cand, col, width, depth, seed)
        .where(F.col("est") >= F.lit(int(min_count)))
        .select(F.col("t").alias(col), "est")
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
    seed: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter over a column of items, packed 32 bits per
    row: returns (word, bits) with ``word = position // 32`` — at most
    ``num_bits / 32`` rows however many items went in. Like the
    Count-Min sketch, the per-partition partial aggregates (bit_or) are
    themselves Bloom filters being unioned, so the build is one
    map-side-combined groupBy with an O(num_bits) shuffle ceiling.

    The scale story: :mod:`adam_spark.llm.decontaminate` broadcasts the
    benchmark's raw n-gram set, fine for real eval sets; when the
    blocklist side grows past broadcast range (regression-test suites,
    copyrighted-text corpora), the Bloom filter is the fixed-size
    membership proxy — false positives at the standard
    (1−e^{−kn/m})^k rate, never false negatives. md5 hashing makes the
    filter bit-identical in any engine, so even its false positives
    are oracle-checkable.
    """
    from pyspark.storagelevel import StorageLevel

    e = df.select(
        F.col(col).alias("t"),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("j"),
    ).where(F.col("t").isNotNull())
    pos = _bucket(F.col("t"), F.col("j"), num_bits, seed)
    out = (
        e.select((pos / 32).cast("long").alias("word"), (pos % 32).alias("b"))
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(1L, cast(b as int)))").alias("bits"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # eager: bloom_contains references the filter once per hash row —
    # unpersisted, each of those k broadcast joins would recompute the
    # build scan; the materialized table is <= num_bits/32 rows
    out.count()
    return out


def bloom_contains(
    bloom: DataFrame,
    items: DataFrame,
    col: str,
    num_bits: int,
    num_hashes: int = 5,
    seed: str = "bloom",
) -> DataFrame:
    """Membership probe: all input columns plus ``maybe_present``
    (true iff every one of the item's ``num_hashes`` bits is set — no
    false negatives), one output row per input row.

    The plan is ``num_hashes`` consecutive BROADCAST joins of the
    packed filter — a pure narrow pipeline with no shuffle at all (an
    earlier explode→groupBy formulation shuffled the probe stream ×k;
    at corpus scale the k small hash-table lookups are free while that
    shuffle was the whole cost)."""
    in_cols = items.columns
    out = items
    checks = []
    for j in range(num_hashes):
        pos = _bucket(F.col(col), F.lit(j), num_bits, seed)
        out = (
            out.withColumn(f"__p{j}", pos)
            .withColumn(f"__w{j}", (F.col(f"__p{j}") / 32).cast("long"))
            .withColumn(
                f"__m{j}", F.expr(f"shiftleft(1L, cast(__p{j} % 32 as int))")
            )
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word").alias(f"__w{j}"),
                        F.col("bits").alias(f"__b{j}"),
                    )
                ),
                f"__w{j}",
                "left",
            )
        )
        checks.append(
            F.col(f"__b{j}").isNotNull()
            & (F.col(f"__b{j}").bitwiseAND(F.col(f"__m{j}")) == F.col(f"__m{j}"))
        )
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return out.select(*in_cols, cond.alias("maybe_present"))
