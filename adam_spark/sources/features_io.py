"""Feature text formats: BED, GTF, GFF3, NarrowPeak, IntervalList.

Loaders are pure DataFrame text pipelines (spark.read.text → split /
regexp column expressions), mirroring the reference's per-line parsers
(ds/feature/FeatureParser.scala, 411 LoC; loaders ADAMContext.scala:
3181-3280; savers FeatureDataset.scala:784-933). Coordinate
conventions preserved exactly: BED/NarrowPeak are 0-based half-open on
disk (pass-through); GTF/GFF3/IntervalList are 1-based closed on disk
(start−1 on load, +1 on save).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from adam_spark import schemas
from adam_spark.core.genomic_frame import GenomicFrame
from adam_spark.core.metadata import GenomicMetadata


def _conform(df: DataFrame) -> DataFrame:
    """Project onto the canonical FEATURE schema (missing cols → null)."""
    return schemas.conform(df, schemas.FEATURE)


def _strand(col):
    return (
        F.when(col == "+", "FORWARD")
        .when(col == "-", "REVERSE")
        .when(col == ".", "INDEPENDENT")
        .otherwise(F.lit(None).cast("string"))
    )


def _strand_out(col):
    return (
        F.when(col == "FORWARD", "+")
        .when(col == "REVERSE", "-")
        .when(col == "INDEPENDENT", ".")
        .otherwise(".")
    )


# --- BED ------------------------------------------------------------------
def load_bed(spark: SparkSession, path: str) -> GenomicFrame:
    """BED3..BED12 (reference: FeatureParser BEDParser; 0-based half-open)."""
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("#")
        & ~F.col("value").startswith("track")
        & ~F.col("value").startswith("browser")
        & (F.length(F.trim(F.col("value"))) > 0)
    )
    t = F.split(F.col("value"), "\t")
    df = lines.select(
        F.try_element_at(t, F.lit(1)).alias("referenceName"),
        F.try_element_at(t, F.lit(2)).try_cast("long").alias("start"),
        F.try_element_at(t, F.lit(3)).try_cast("long").alias("end"),
        F.try_element_at(t, F.lit(4)).alias("name"),
        F.when(F.try_element_at(t, F.lit(5)) == ".", None)
        .otherwise(F.try_element_at(t, F.lit(5)))
        .try_cast("double")
        .alias("score"),
        _strand(F.try_element_at(t, F.lit(6))).alias("strand"),
        F.when(
            F.size(t) >= 12,
            # BED12 (ADAMContextSuite "Can read a BED 12 file"): block
            # structure joins the display fields in attributes
            F.map_from_arrays(
                F.array(
                    F.lit("thickStart"), F.lit("thickEnd"), F.lit("itemRgb"),
                    F.lit("blockCount"), F.lit("blockSizes"), F.lit("blockStarts"),
                ),
                F.array(*[F.try_element_at(t, F.lit(i)) for i in range(7, 13)]),
            ),
        )
        .otherwise(
            F.when(
                F.size(t) >= 9,
                F.map_from_arrays(
                    F.array(F.lit("thickStart"), F.lit("thickEnd"), F.lit("itemRgb")),
                    F.array(F.try_element_at(t, F.lit(7)), F.try_element_at(t, F.lit(8)), F.try_element_at(t, F.lit(9))),
                ),
            )
        )
        .alias("attributes"),
    )
    return GenomicFrame(_conform(df), GenomicMetadata(kind="feature"))


def save_bed(gf: GenomicFrame, path: str, single_file: bool = False) -> None:
    """BED6 by default; rows whose attributes carry the BED12 block
    fields re-emit all 12 columns (FeatureDatasetSuite 'round trip
    BED12 format')."""
    a = F.col("attributes")

    def _attr(k: str) -> Column:
        return F.try_element_at(a, F.lit(k))

    bed6 = F.concat_ws(
        "\t",
        F.col("referenceName"),
        F.col("start").cast("string"),
        F.col("end").cast("string"),
        F.coalesce(F.col("name"), F.lit(".")),
        F.coalesce(F.col("score").cast("string"), F.lit(".")),
        _strand_out(F.col("strand")),
    )
    has12 = a.isNotNull() & _attr("blockCount").isNotNull()
    bed12 = F.concat_ws(
        "\t",
        bed6,
        F.coalesce(_attr("thickStart"), F.col("start").cast("string")),
        F.coalesce(_attr("thickEnd"), F.col("end").cast("string")),
        F.coalesce(_attr("itemRgb"), F.lit("0")),
        _attr("blockCount"),
        F.coalesce(_attr("blockSizes"), F.lit(".")),
        F.coalesce(_attr("blockStarts"), F.lit(".")),
    )
    df = _conform(gf.df).select(
        F.when(has12, bed12).otherwise(bed6).alias("value")
    )
    (df.coalesce(1) if single_file else df).write.text(path)


# --- NarrowPeak -----------------------------------------------------------
def load_narrowpeak(spark: SparkSession, path: str) -> GenomicFrame:
    """ENCODE narrowPeak (BED6+4; reference: NarrowPeakParser)."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    t = F.split(F.col("value"), "\t")
    df = lines.select(
        F.try_element_at(t, F.lit(1)).alias("referenceName"),
        F.try_element_at(t, F.lit(2)).try_cast("long").alias("start"),
        F.try_element_at(t, F.lit(3)).try_cast("long").alias("end"),
        F.try_element_at(t, F.lit(4)).alias("name"),
        F.try_element_at(t, F.lit(5)).try_cast("double").alias("score"),
        _strand(F.try_element_at(t, F.lit(6))).alias("strand"),
        F.map_from_arrays(
            F.array(F.lit("signalValue"), F.lit("pValue"), F.lit("qValue"), F.lit("peak")),
            F.array(
                F.try_element_at(t, F.lit(7)), F.try_element_at(t, F.lit(8)), F.try_element_at(t, F.lit(9)), F.try_element_at(t, F.lit(10))
            ),
        ).alias("attributes"),
    )
    return GenomicFrame(_conform(df), GenomicMetadata(kind="feature"))


def save_narrowpeak(gf: GenomicFrame, path: str, single_file: bool = False) -> None:
    a = F.col("attributes")
    df = _conform(gf.df).select(
        F.concat_ws(
            "\t",
            F.col("referenceName"),
            F.col("start").cast("string"),
            F.col("end").cast("string"),
            F.coalesce(F.col("name"), F.lit(".")),
            F.coalesce(F.col("score").try_cast("long").cast("string"), F.lit("0")),
            _strand_out(F.col("strand")),
            F.coalesce(a.getItem("signalValue"), F.lit("0")),
            F.coalesce(a.getItem("pValue"), F.lit("-1")),
            F.coalesce(a.getItem("qValue"), F.lit("-1")),
            F.coalesce(a.getItem("peak"), F.lit("-1")),
        ).alias("value")
    )
    (df.coalesce(1) if single_file else df).write.text(path)


# --- GTF / GFF3 -----------------------------------------------------------
_GFF_COLS = [
    ("referenceName", 1, "string"),
    ("source", 2, "string"),
    ("featureType", 3, "string"),
]


def _gxf_base(spark: SparkSession, path: str):
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("#")
        & (F.length(F.trim("value")) > 0)
        # GFF3 files may embed a ##FASTA section (headers + sequence
        # lines, no tabs) — only 9-field records are features
        # (FeatureDatasetSuite "ignore FASTA sequence in GFF3 file")
        & (F.size(F.split(F.col("value"), "\t")) >= 8)
    )
    t = F.split(F.col("value"), "\t")
    return lines, t


def _dotnull(c):
    return F.when(c == ".", None).otherwise(c)


def load_gtf(spark: SparkSession, path: str) -> GenomicFrame:
    """GTF2 with `key "value";` attributes (reference: GTFParser);
    1-based closed → 0-based half-open."""
    lines, t = _gxf_base(spark, path)
    attrs = F.try_element_at(t, F.lit(9))
    # gene_id "g1"; transcript_id "t1"; → map
    pairs = F.expr(
        r"""map_from_entries(
          transform(
            filter(split(try_element_at(split(value, '\t'), 9), ';'), x -> length(trim(x)) > 0),
            x -> struct(
              trim(regexp_extract(x, '^\\s*(\\S+)\\s+', 1)) as k,
              regexp_extract(x, '"([^"]*)"', 1) as v)))"""
    )
    df = lines.select(
        F.try_element_at(t, F.lit(1)).alias("referenceName"),
        _dotnull(F.try_element_at(t, F.lit(2))).alias("source"),
        _dotnull(F.try_element_at(t, F.lit(3))).alias("featureType"),
        (F.try_element_at(t, F.lit(4)).try_cast("long") - 1).alias("start"),
        F.try_element_at(t, F.lit(5)).try_cast("long").alias("end"),
        _dotnull(F.try_element_at(t, F.lit(6))).try_cast("double").alias("score"),
        _strand(F.try_element_at(t, F.lit(7))).alias("strand"),
        _dotnull(F.try_element_at(t, F.lit(8))).try_cast("int").alias("frame"),
        pairs.alias("attributes"),
    )
    df = (
        df.withColumn("geneId", F.col("attributes").getItem("gene_id"))
        .withColumn("transcriptId", F.col("attributes").getItem("transcript_id"))
        .withColumn("exonId", F.col("attributes").getItem("exon_id"))
    )
    return GenomicFrame(_conform(df), GenomicMetadata(kind="feature"))


def save_gtf(gf: GenomicFrame, path: str, single_file: bool = False) -> None:
    attr = F.concat_ws(
        "; ",
        F.when(F.col("geneId").isNotNull(), F.concat(F.lit('gene_id "'), F.col("geneId"), F.lit('"'))),
        F.when(
            F.col("transcriptId").isNotNull(),
            F.concat(F.lit('transcript_id "'), F.col("transcriptId"), F.lit('"')),
        ),
    )
    df = _conform(gf.df).select(
        F.concat_ws(
            "\t",
            F.col("referenceName"),
            F.coalesce(F.col("source"), F.lit(".")),
            F.coalesce(F.col("featureType"), F.lit(".")),
            (F.col("start") + 1).cast("string"),
            F.col("end").cast("string"),
            F.coalesce(F.col("score").cast("string"), F.lit(".")),
            _strand_out(F.col("strand")),
            F.coalesce(F.col("frame").cast("string"), F.lit(".")),
            attr,
        ).alias("value")
    )
    (df.coalesce(1) if single_file else df).write.text(path)


def load_gff3(spark: SparkSession, path: str) -> GenomicFrame:
    """GFF3 with `key=value;` attributes (reference: GFF3Parser)."""
    lines, t = _gxf_base(spark, path)
    attrs_col = F.try_element_at(t, F.lit(9))
    amap = F.expr(
        r"""map_from_entries(
          transform(
            filter(split(try_element_at(split(value, '\t'), 9), ';'), x -> instr(x, '=') > 0),
            x -> struct(
              trim(try_element_at(split(x, '='), 1)) as k,
              trim(try_element_at(split(x, '='), 2)) as v)))"""
    )
    df = lines.select(
        F.try_element_at(t, F.lit(1)).alias("referenceName"),
        _dotnull(F.try_element_at(t, F.lit(2))).alias("source"),
        _dotnull(F.try_element_at(t, F.lit(3))).alias("featureType"),
        (F.try_element_at(t, F.lit(4)).try_cast("long") - 1).alias("start"),
        F.try_element_at(t, F.lit(5)).try_cast("long").alias("end"),
        _dotnull(F.try_element_at(t, F.lit(6))).try_cast("double").alias("score"),
        _strand(F.try_element_at(t, F.lit(7))).alias("strand"),
        _dotnull(F.try_element_at(t, F.lit(8))).try_cast("int").alias("phase"),
        amap.alias("attributes"),
    )
    df = (
        df.withColumn("featureId", F.col("attributes").getItem("ID"))
        .withColumn("name", F.col("attributes").getItem("Name"))
        .withColumn(
            "parentIds",
            F.when(
                F.col("attributes").getItem("Parent").isNotNull(),
                F.split(F.col("attributes").getItem("Parent"), ","),
            ),
        )
    )
    return GenomicFrame(_conform(df), GenomicMetadata(kind="feature"))


def save_gff3(gf: GenomicFrame, path: str, single_file: bool = False) -> None:
    attr = F.concat_ws(
        ";",
        F.when(F.col("featureId").isNotNull(), F.concat(F.lit("ID="), F.col("featureId"))),
        F.when(F.col("name").isNotNull(), F.concat(F.lit("Name="), F.col("name"))),
        F.when(
            (F.col("parentIds").isNotNull()) & (F.size("parentIds") > 0),
            F.concat(F.lit("Parent="), F.concat_ws(",", F.col("parentIds"))),
        ),
    )
    df = _conform(gf.df).select(
        F.concat_ws(
            "\t",
            F.col("referenceName"),
            F.coalesce(F.col("source"), F.lit(".")),
            F.coalesce(F.col("featureType"), F.lit(".")),
            (F.col("start") + 1).cast("string"),
            F.col("end").cast("string"),
            F.coalesce(F.col("score").cast("string"), F.lit(".")),
            _strand_out(F.col("strand")),
            F.coalesce(F.col("phase").cast("string"), F.lit(".")),
            attr,
        ).alias("value")
    )
    (df.coalesce(1) if single_file else df).write.text(path)


# --- IntervalList ---------------------------------------------------------
def load_interval_list(spark: SparkSession, path: str) -> GenomicFrame:
    """Picard interval_list: @-header (SAM dict) + 5 columns, 1-based
    closed (reference: IntervalListParser)."""
    raw = spark.read.text(path)
    lines = raw.where(~F.col("value").startswith("@") & (F.length(F.trim("value")) > 0))
    t = F.split(F.col("value"), "\t")
    df = lines.select(
        F.try_element_at(t, F.lit(1)).alias("referenceName"),
        (F.try_element_at(t, F.lit(2)).try_cast("long") - 1).alias("start"),
        F.try_element_at(t, F.lit(3)).try_cast("long").alias("end"),
        _strand(F.try_element_at(t, F.lit(4))).alias("strand"),
        F.try_element_at(t, F.lit(5)).alias("name"),
    )
    # header → sequence dictionary (driver-side; header is small)
    from adam_spark.core.metadata import Reference, SequenceDictionary

    hdr = [
        r["value"]
        for r in raw.where(F.col("value").startswith("@SQ")).collect()
    ]
    refs = []
    for line in hdr:
        fields = dict(
            kv.split(":", 1) for kv in line.split("\t")[1:] if ":" in kv
        )
        if "SN" in fields:
            refs.append(
                Reference(name=fields["SN"], length=int(fields["LN"]) if "LN" in fields else None)
            )
    meta = GenomicMetadata(references=SequenceDictionary(refs), kind="feature")
    return GenomicFrame(_conform(df), meta)


def save_interval_list(gf: GenomicFrame, path: str, single_file: bool = True) -> None:
    header_lines = [
        "@HD\tVN:1.6\tSO:coordinate",
        *(
            f"@SQ\tSN:{r.name}\tLN:{r.length}"
            for r in gf.meta.references.references
            if r.length is not None
        ),
    ]
    df = _conform(gf.df).select(
        F.concat_ws(
            "\t",
            F.col("referenceName"),
            (F.col("start") + 1).cast("string"),
            F.col("end").cast("string"),
            _strand_out(F.col("strand")),
            F.coalesce(F.col("name"), F.lit(".")),
        ).alias("value")
    )
    hdr_df = gf.df.sparkSession.createDataFrame([(h,) for h in header_lines], "value string")
    out = (
        hdr_df.select(F.lit(0).alias("__o"), "value")
        .unionByName(df.select(F.lit(1).alias("__o"), "value"))
        .coalesce(1)
        .sortWithinPartitions("__o")
        .select("value")
    )
    out.write.text(path)
