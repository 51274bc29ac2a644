"""Quality-score operators: binning and indel left-normalization.

- ``bin_quality_scores``: remap Phred scores into user bins
  (reference: ds/read/BinQualities.scala:112-203,
  AlignmentDataset.binQualityScores:1752-1774). Implemented as a pure
  string ``translate`` — the bin map compiles to a 94-char translation
  table once on the driver, so the hot path is one JVM translate per
  read, no per-base logic at all.
- ``left_normalize_indels``: shift single indels left per
  NormalizationUtils.leftAlignIndel (AlignmentDataset.scala:1777-1803)
  — a per-read CIGAR rewrite, done in an Arrow-batched pandas UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from adam_spark.functions.cigar import left_align_indel

PHRED_OFFSET = 33
MAX_PHRED = 93  # '~' - '!'


@dataclass(frozen=True)
class QualityScoreBin:
    """[low, high) → value, mirroring the reference's QualityScoreBin
    (ds/read/BinQualities.scala:59-110)."""

    low: int
    high: int
    value: int

    @staticmethod
    def parse(text: str) -> "QualityScoreBin":
        low, high, value = (int(x) for x in text.split(","))
        return QualityScoreBin(low, high, value)


def _validate_bins(bins: list[QualityScoreBin]) -> None:
    """Bins must be non-overlapping (BinQualities.scala validation)."""
    for b in bins:
        if not (0 <= b.low < b.high <= MAX_PHRED + 1):
            raise ValueError(f"bin {b} out of Phred range [0, {MAX_PHRED}]")
        if not (b.low <= b.value < b.high):
            # the reference requires the new score to fall inside the bin
            raise ValueError(f"bin value {b.value} outside [{b.low}, {b.high})")
    s = sorted(bins, key=lambda b: b.low)
    for a, b in zip(s, s[1:]):
        if a.high > b.low:
            raise ValueError(f"bins {a} and {b} overlap")


def quality_translate_table(
    bins: list[QualityScoreBin] | list[str],
) -> tuple[str, str, str]:
    """Validated (src, dst, uncovered) character tables for
    ``F.translate`` — the driver-side compilation step shared by the
    flat and nested (fragment) binning paths. ``uncovered`` holds the
    Phred chars no bin covers; a read containing one raises at runtime
    (the reference's "fell into no bins" IllegalStateException,
    BinQualities.scala:196-199)."""
    parsed = [QualityScoreBin.parse(b) if isinstance(b, str) else b for b in bins]
    if not parsed:
        raise ValueError("no quality score bins provided")
    _validate_bins(parsed)
    src_chars, dst_chars, uncovered = [], [], []
    for phred in range(MAX_PHRED + 1):
        covering = [b for b in parsed if b.low <= phred < b.high]
        if not covering:
            uncovered.append(chr(phred + PHRED_OFFSET))
        elif phred != covering[0].value:
            src_chars.append(chr(phred + PHRED_OFFSET))
            dst_chars.append(chr(covering[0].value + PHRED_OFFSET))
    return "".join(src_chars), "".join(dst_chars), "".join(uncovered)


def _binned_qual_expr(col: Column, src: str, dst: str, uncovered: str) -> Column:
    out = F.translate(col, src, dst) if src else col
    if uncovered:
        n_bad = F.length(col) - F.length(F.translate(col, uncovered, ""))
        out = F.when(
            F.coalesce(n_bad, F.lit(0)) > 0,
            F.raise_error(
                F.concat(
                    F.lit("quality score fell into no bins: "), col
                )
            ),
        ).otherwise(out)
    return out


def bin_quality_scores(
    df: DataFrame, bins: list[QualityScoreBin] | list[str], column: str = "qualityScores"
) -> DataFrame:
    """Remap every quality char through the bin table via translate();
    null quality strings pass through, scores outside every bin raise
    (BinQualities.scala binQualities semantics)."""
    src, dst, uncovered = quality_translate_table(bins)
    if not src and not uncovered:
        return df
    return df.withColumn(
        column, _binned_qual_expr(F.col(column), src, dst, uncovered)
    )


def bin_fragment_quality_scores(
    df: DataFrame, bins: list[QualityScoreBin] | list[str]
) -> DataFrame:
    """FragmentDataset.binQualityScores (FragmentDataset.scala — nested
    variant of AlignmentDataset.binQualityScores:1752-1774): rewrite
    each nested read's quality string. translate() is per-character, so
    it distributes over the ``alignments`` array unchanged."""
    src, dst, uncovered = quality_translate_table(bins)
    if not src and not uncovered:
        return df
    return df.withColumn(
        "alignments",
        F.transform(
            F.col("alignments"),
            lambda a: a.withField(
                "qualityScores",
                _binned_qual_expr(a["qualityScores"], src, dst, uncovered),
            ),
        ),
    )


def left_normalize_indels(df: DataFrame) -> DataFrame:
    """Left-align single indels in mapped reads' CIGARs."""

    @F.pandas_udf(StringType())
    def _left_align(
        cigar: pd.Series, sequence: pd.Series, md: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                left_align_indel(c, s, m)
                if isinstance(c, str) and isinstance(s, str)
                else c
                for c, s, m in zip(cigar, sequence, md)
            ]
        )

    return df.withColumn(
        "cigar",
        F.when(
            F.col("readMapped") & F.col("cigar").isNotNull(),
            _left_align(F.col("cigar"), F.col("sequence"), F.col("mismatchingPositions")),
        ).otherwise(F.col("cigar")),
    )
