"""Base-quality score recalibration (BQSR).

Two-pass algorithm mirroring the reference
(ds/read/recalibration/BaseQualityRecalibration.scala:58-370 + 7 files):

Pass 1 (observe): for every usable base of every canonical read
(mapped, primary, non-duplicate, mapq>0 and defined — shouldIncludeRead
:119-130), emit the error covariates (readGroup, reported quality,
sequencer cycle, dinucleotide) and whether the base mismatches the
reference (from the MD tag), skipping known-SNP sites and N bases.
Covariate arrays are computed per READ in an Arrow-batched pandas UDF
(cigar+MD walk, numpy-free string ops), then exploded and aggregated
JVM-side: ``groupBy(covariates).agg(count, sum(mismatch), sum(p_err))``
— a partial-aggregated shuffle whose output is tiny (≈ #rg × 94 quals ×
cycles × 16 dinucs).

Table inversion (driver): the hierarchical GATK walk
(RecalibrationTable.scala:25-172): per-readGroup global delta, then
per-quality delta, then cycle+dinuc extras deltas, all on
Laplace-smoothed ("rule of succession", Observation.scala:61-64) error
estimates; corrected log-p bounded to [maxQ=50, 0].

Pass 2 (apply): broadcast the inverted table (a plain dict) and rewrite
quality strings per read in a pandas UDF; bases below
``min_acceptable_quality`` keep their original score
(Recalibrator.scala:60-79).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from adam_spark.functions.cigar import aligned_pairs, parse_cigar, walk_md

_COMPLEMENT = str.maketrans("ACGTN", "TGCAN")
PHRED_OFFSET = 33
MAX_QUAL = 50


def _cycles(length: int, negative_strand: bool, read_in_fragment: int) -> list[int]:
    """CycleCovariate.scala:27-70: first-of-pair positive, second
    negative; negative-strand reads count from the far end."""
    if not negative_strand:
        init, inc = (1, 1) if read_in_fragment == 0 else (-1, -1)
    else:
        init, inc = (length, -1) if read_in_fragment == 0 else (-length, 1)
    return [init + i * inc for i in range(length)]


def _dinucs(sequence: str, negative_strand: bool) -> list[str]:
    """DinucCovariate.scala:27-110: pair (previous, current) in
    sequencer order; 'NN' at the first sequenced base or around Ns."""
    seq = sequence.upper()
    n = len(seq)
    out = ["NN"] * n
    if negative_strand:
        comp = seq.translate(_COMPLEMENT)
        for i in range(n - 1):
            p, c = comp[i + 1], comp[i]
            out[i] = p + c if (p != "N" and c != "N") else "NN"
    else:
        for i in range(1, n):
            p, c = seq[i - 1], seq[i]
            out[i] = p + c if (p != "N" and c != "N") else "NN"
    return out


_OBS_SCHEMA = StructType(
    [
        StructField("offsets", ArrayType(IntegerType()), True),
        StructField("refpos", ArrayType(StringType()), True),  # "ref:pos" keys
        StructField("mismatch", ArrayType(IntegerType()), True),  # 0/1
        StructField("cycles", ArrayType(IntegerType()), True),
        StructField("dinucs", ArrayType(StringType()), True),
    ]
)


def _observe_read(
    ref_name: str,
    start,
    cigar: str,
    md: str,
    sequence: str,
    negative_strand: bool,
    read_in_fragment: int,
):
    """Per-read covariate extraction: usable aligned bases only
    (computeResiduesToInclude:146-300 — M/=/X bases included, I/S/D/N
    excluded, N bases excluded)."""
    pairs = aligned_pairs(cigar, int(start))
    walk = walk_md(md or "")
    mismatch_aligned = set(walk.mismatch_aligned)
    cycles = _cycles(len(sequence), negative_strand, read_in_fragment or 0)
    dinucs = _dinucs(sequence, negative_strand)
    offsets, refpos, mism, cyc, din = [], [], [], [], []
    for aligned_idx, ab in enumerate(pairs):
        base = sequence[ab.read_idx].upper()
        if base == "N":
            continue
        offsets.append(ab.read_idx)
        refpos.append(f"{ref_name}:{ab.ref_pos}")
        mism.append(1 if aligned_idx in mismatch_aligned else 0)
        cyc.append(cycles[ab.read_idx])
        din.append(dinucs[ab.read_idx])
    return offsets, refpos, mism, cyc, din


def _usable(df: DataFrame) -> F.Column:
    # primacy: when the flag is unpopulated, DERIVE it from the
    # secondary/supplementary flags (a bare coalesce-to-True would admit
    # secondary alignments and double-count their bases as evidence).
    # MD required: without it a read observes as 100% matching, which
    # systematically underestimates error rates (the reference only
    # observes MD-defined reads).
    def opt(name: str) -> F.Column:
        # partial frames (projected inputs) may lack the flag columns
        return F.col(name) if name in df.columns else F.lit(None).cast("boolean")

    primary = F.coalesce(
        opt("primaryAlignment"),
        ~(
            F.coalesce(opt("secondaryAlignment"), F.lit(False))
            | F.coalesce(opt("supplementaryAlignment"), F.lit(False))
        ),
    )
    return (
        F.col("readMapped")
        & primary
        & ~F.coalesce(F.col("duplicateRead"), F.lit(False))
        & (F.coalesce(F.col("mappingQuality"), F.lit(0)) > 0)
        & F.col("qualityScores").isNotNull()
        & F.col("cigar").isNotNull()
        & F.col("sequence").isNotNull()
        & F.col("mismatchingPositions").isNotNull()
    )


def observe_covariates(
    df: DataFrame, known_snps: DataFrame | None = None
) -> DataFrame:
    """Pass 1: per-base covariate observations, aggregated.

    Returns columns (readGroupId, quality:int, cycle, dinuc,
    total, mismatches, expectedErrors).
    """

    @F.pandas_udf(_OBS_SCHEMA)
    def _obs(
        ref: pd.Series,
        start: pd.Series,
        cigar: pd.Series,
        md: pd.Series,
        seq: pd.Series,
        neg: pd.Series,
        rif: pd.Series,
    ) -> pd.DataFrame:
        rows = [
            _observe_read(r, s, c, m, q, bool(n), int(f) if pd.notna(f) else 0)
            for r, s, c, m, q, n, f in zip(ref, start, cigar, md, seq, neg, rif)
        ]
        return pd.DataFrame(
            rows, columns=["offsets", "refpos", "mismatch", "cycles", "dinucs"]
        )

    base = df.where(_usable(df)).select(
        F.col("readGroupId"),
        F.col("qualityScores"),
        _obs(
            F.col("referenceName"),
            F.col("start"),
            F.col("cigar"),
            F.col("mismatchingPositions"),
            F.col("sequence"),
            F.coalesce(F.col("readNegativeStrand"), F.lit(False)),
            F.coalesce(F.col("readInFragment"), F.lit(0)),
        ).alias("o"),
    )
    per_base = base.select(
        "readGroupId",
        "qualityScores",
        F.arrays_zip(
            F.col("o.offsets").alias("off"),
            F.col("o.refpos").alias("rp"),
            F.col("o.mismatch").alias("mm"),
            F.col("o.cycles").alias("cy"),
            F.col("o.dinucs").alias("dn"),
        ).alias("z"),
    ).select(
        "readGroupId",
        "qualityScores",
        F.explode("z").alias("b"),
    ).select(
        "readGroupId",
        (F.ascii(F.substring(F.col("qualityScores"), F.col("b.off") + 1, 1)) - PHRED_OFFSET).alias(
            "quality"
        ),
        F.col("b.rp").alias("refpos"),
        F.col("b.mm").alias("mismatch"),
        F.col("b.cy").alias("cycle"),
        F.col("b.dn").alias("dinuc"),
    )
    if known_snps is not None:
        snp_keys = known_snps.select(
            F.concat_ws(":", F.col("referenceName"), F.col("start")).alias("refpos")
        ).distinct()
        per_base = per_base.join(F.broadcast(snp_keys), "refpos", "left_anti")
    return (
        per_base.groupBy("readGroupId", "quality", "cycle", "dinuc")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum("mismatch").alias("mismatches"),
            F.sum(F.pow(F.lit(10.0), -F.col("quality") / 10.0)).alias("expectedErrors"),
        )
    )


def build_recalibration_table(observations: list[dict]) -> dict:
    """Invert the observation table (driver-side;
    RecalibrationTable.scala:25-172). Input rows are dicts with keys
    readGroupId/quality/cycle/dinuc/total/mismatches/expectedErrors.
    Returns {(rg, qual, cycle, dinuc): newQualInt}."""

    def bayes(mm: float, total: float) -> float:
        return (1.0 + mm) / (2.0 + total)

    # aggregate the hierarchy levels
    glob: dict = {}
    byq: dict = {}
    bycycle: dict = {}
    bydinuc: dict = {}
    for o in observations:
        rg = o["readGroupId"]
        q, cy, dn = o["quality"], o["cycle"], o["dinuc"]
        t, mm, ee = o["total"], o["mismatches"], o["expectedErrors"]
        for key, d in (
            (rg, glob),
            ((rg, q), byq),
            ((rg, q, cy), bycycle),
            ((rg, q, dn), bydinuc),
        ):
            cur = d.get(key, (0.0, 0.0, 0.0))
            d[key] = (cur[0] + t, cur[1] + mm, cur[2] + ee)

    max_log_p = math.log(10.0 ** (-MAX_QUAL / 10.0))
    table: dict = {}
    for o in observations:
        rg, q, cy, dn = o["readGroupId"], o["quality"], o["cycle"], o["dinuc"]
        gt, gmm, gee = glob[rg]
        global_delta = math.log(bayes(gmm, gt)) - math.log(max(gee / gt, 1e-30))
        residue = math.log(10.0 ** (-q / 10.0)) if q > 0 else math.log(0.75)
        qt, qmm, _ = byq[(rg, q)]
        quality_delta = math.log(bayes(qmm, qt)) - (residue + global_delta)
        offset = residue + global_delta + quality_delta
        ct, cmm, _ = bycycle[(rg, q, cy)]
        dt, dmm, _ = bydinuc[(rg, q, dn)]
        extras = (math.log(bayes(cmm, ct)) - offset) + (math.log(bayes(dmm, dt)) - offset)
        corrected = min(0.0, max(max_log_p, offset + extras))
        phred = int(round(-10.0 * math.log10(math.exp(corrected))))
        table[(rg, q, cy, dn)] = min(phred, MAX_QUAL)
    return table


def recalibrate_base_qualities(
    df: DataFrame,
    known_snps: DataFrame | None = None,
    min_acceptable_quality: int = 5,
    sampling_fraction: float | None = None,
    sampling_seed: int | None = None,
) -> DataFrame:
    """Full BQSR: observe → invert → rewrite quality strings.

    Mirrors AlignmentDataset.recalibrateBaseQualities; the original
    qualities are preserved in ``originalQualityScores``.
    ``sampling_fraction``/``sampling_seed`` observe covariates on a
    Bernoulli sample of the reads instead of every read (the
    TransformAlignments.scala:343-344 knobs) — the observation pass at
    100 TB dominates BQSR cost and the table converges long before full
    coverage; EVERY read is still rewritten against the sampled table.
    """
    observed = df
    if sampling_fraction is not None:
        observed = (
            df.sample(fraction=sampling_fraction, seed=sampling_seed)
            if sampling_seed is not None
            else df.sample(fraction=sampling_fraction)
        )
    obs = [r.asDict() for r in observe_covariates(observed, known_snps).collect()]
    table = build_recalibration_table(obs)
    sc = df.sparkSession.sparkContext
    btable = sc.broadcast(table)
    min_char = min_acceptable_quality + PHRED_OFFSET

    @F.pandas_udf(StringType())
    def _recal(
        quals: pd.Series,
        rg: pd.Series,
        cigar: pd.Series,
        md: pd.Series,
        seq: pd.Series,
        start: pd.Series,
        neg: pd.Series,
        rif: pd.Series,
        ref: pd.Series,
    ) -> pd.Series:
        tab = btable.value
        out = []
        for q, g, c, m, s, st, n, f, r in zip(
            quals, rg, cigar, md, seq, start, neg, rif, ref
        ):
            # the surrounding F.when(usable, ...) does NOT stop the UDF
            # from evaluating on non-usable rows — Arrow runs it over the
            # whole batch, so a null start (unmapped read with a kept
            # CIGAR) must bail here, not crash the task
            if (
                not isinstance(q, str)
                or not isinstance(c, str)
                or not isinstance(s, str)
                or pd.isna(st)
            ):
                out.append(q)
                continue
            offsets, _, _, cyc, din = _observe_read(
                r, st, c, m, s, bool(n), int(f) if pd.notna(f) else 0
            )
            chars = list(q)
            for off, cy, dn in zip(offsets, cyc, din):
                if ord(q[off]) < min_char:
                    continue
                new = tab.get((g, ord(q[off]) - PHRED_OFFSET, cy, dn))
                if new is not None:
                    chars[off] = chr(new + PHRED_OFFSET)
            out.append("".join(chars))
        return pd.Series(out)

    usable = _usable(df)
    new_quals = _recal(
        F.col("qualityScores"),
        F.col("readGroupId"),
        F.col("cigar"),
        F.col("mismatchingPositions"),
        F.col("sequence"),
        F.col("start"),
        F.coalesce(F.col("readNegativeStrand"), F.lit(False)),
        F.coalesce(F.col("readInFragment"), F.lit(0)),
        F.col("referenceName"),
    )
    return df.withColumn(
        "originalQualityScores",
        F.when(usable, F.col("qualityScores")).otherwise(F.col("originalQualityScores")),
    ).withColumn(
        "qualityScores", F.when(usable, new_quals).otherwise(F.col("qualityScores"))
    )


def observation_table_csv(observations: list[dict]) -> str:
    """GATK-compatible CSV of the covariate table
    (ObservationTable.toCSV, ObservationTable.scala:37-51): one row per
    covariate bin with total/mismatch counts and the Laplace-smoothed
    empirical quality."""
    lines = ["ReadGroup,ReportedQ,CycleStart,Dinuc,TotalCount,MismatchCount,EmpiricalQ"]
    for o in sorted(
        observations,
        key=lambda r: (str(r["readGroupId"]), r["quality"], r["cycle"], r["dinuc"]),
    ):
        emp = -10.0 * math.log10((1.0 + o["mismatches"]) / (2.0 + o["total"]))
        lines.append(
            f'{o["readGroupId"]},{o["quality"]},{o["cycle"]},{o["dinuc"]},'
            f'{o["total"]},{o["mismatches"]},{int(round(emp))}'
        )
    return "\n".join(lines)
