"""SAM text format: load/save as a DataFrame pipeline.

The reference ingests SAM/BAM/CRAM via hadoop-bam (ADAMContext.loadBam
:2041-2111) and exports via htsjdk (AlignmentDataset.saveAsSam
:810-997). This engine parses SAM text relationally (this module) and
implements BAM natively in `sources/bam.py` (pure-Python BGZF + record
codec sharing this module's column mapping); CRAM needs reference-
based codecs not present here and stays external. The header
(@SQ/@RG/@PG) maps to the metadata sidecar both ways.

Flag decoding follows the SAM spec bit-for-bit (matches the boolean
columns the reference's AlignmentConverter sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adam_spark import schemas
from adam_spark.core.genomic_frame import GenomicFrame
from adam_spark.core.metadata import (
    GenomicMetadata,
    ReadGroup,
    Reference,
    SequenceDictionary,
)
from adam_spark.operators.filters import sam_flags


def _ref_len(col_name: str):
    """Reference-consumed length of a CIGAR column (M/D/N/=/X ops)."""
    return F.aggregate(
        F.expr(
            f"transform(regexp_extract_all({col_name}, '(\\\\d+)[MDN=X]', 1), x -> cast(x as long))"
        ),
        F.lit(0).try_cast("long"),
        lambda a, v: a + v,
    )


def fill_read_group_sample_id(df: DataFrame, meta) -> DataFrame:
    """Resolve ``readGroupSampleId`` from the header's read-group
    dictionary (@RG SM), matching AlignmentConverter.scala:221
    setReadGroupSampleId(recordGroup.getSample). The dictionary is
    driver-sized, so the lookup is a literal CASE — no join. Reads
    with no RG (or an RG without SM) stay null."""
    pairs = [(g.id, g.sampleId) for g in meta.read_groups if g.sampleId is not None]
    if not pairs or "readGroupId" not in df.columns:
        return df
    expr = None
    for rg_id, sample in pairs:
        cond = F.col("readGroupId") == F.lit(rg_id)
        expr = F.when(cond, F.lit(sample)) if expr is None else expr.when(cond, F.lit(sample))
    return df.withColumn(
        "readGroupSampleId", F.coalesce(F.col("readGroupSampleId"), expr)
    )


def _aligned_with_meta(
    raw: DataFrame, header_lines, stringency: str = "SILENT"
) -> tuple:
    """(alignments df, metadata) for a raw SAM-lines frame + header
    lines — the shared assembly used by the BAM/CRAM decoders so every
    binary loader also resolves readGroupSampleId from @RG SM.
    ``stringency`` governs malformed header lines exactly as in
    ``load_sam`` (htsjdk applies ValidationStringency to BAM headers
    too)."""
    meta = header_metadata_from_lines(header_lines, stringency)
    return fill_read_group_sample_id(sam_lines_to_alignments(raw), meta), meta


def _header_lines_driver(path: str) -> list[str] | None:
    """Each file's leading '@' lines, streamed DRIVER-SIDE — O(header
    bytes) instead of the full distributed scan+filter pass (htsjdk
    reads SAM headers the same way before any job runs). Returns None
    when the driver cannot open the path (non-local filesystem) so the
    caller falls back to the distributed collect."""
    import glob as _glob
    import gzip as _gzip
    import os as _os

    if _os.path.isdir(path):
        entries = sorted(_glob.glob(_os.path.join(path, "*")))
    else:
        entries = sorted(_glob.glob(path)) or [path]
    files = [p for p in entries if _os.path.isfile(p)]
    if not files:
        return None
    lines: list[str] = []
    try:
        for p in files:
            opener = _gzip.open if p.endswith(".gz") else open
            with opener(p, "rt") as f:
                for line in f:
                    if not line.startswith("@"):
                        break
                    lines.append(line.rstrip("\n"))
    except OSError:
        return None
    return lines


def load_sam(
    spark: SparkSession, path: str, stringency: str = "SILENT"
) -> GenomicFrame:
    raw = spark.read.text(path)
    hdr = _header_lines_driver(path)
    meta = (
        header_metadata_from_lines(hdr, stringency)
        if hdr is not None
        else _header_metadata(raw, stringency)
    )
    df = fill_read_group_sample_id(sam_lines_to_alignments(raw), meta)
    return GenomicFrame(df, meta)


def sam_lines_to_alignments(raw: DataFrame) -> DataFrame:
    """Parse a DataFrame of raw SAM text lines (column ``value``) into
    ALIGNMENT rows. Works on batch AND streaming DataFrames — the
    parse is stateless per line."""
    body = raw.where(~F.col("value").startswith("@") & (F.length(F.trim("value")) > 0))
    t = F.split(F.col("value"), "\t")

    mapped = F.col("flag").bitwiseAND(F.lit(0x4)) == 0
    parsed = body.select(
        F.try_element_at(t, F.lit(1)).alias("readName"),
        F.try_element_at(t, F.lit(2)).try_cast("int").alias("flag"),
        F.when(F.try_element_at(t, F.lit(3)) == "*", None).otherwise(F.try_element_at(t, F.lit(3))).alias("rname"),
        F.try_element_at(t, F.lit(4)).try_cast("long").alias("pos1"),
        F.try_element_at(t, F.lit(5)).try_cast("int").alias("mapq"),
        F.when(F.try_element_at(t, F.lit(6)) == "*", None).otherwise(F.try_element_at(t, F.lit(6))).alias("cigar"),
        F.try_element_at(t, F.lit(7)).alias("rnext"),
        F.try_element_at(t, F.lit(8)).try_cast("long").alias("pnext1"),
        F.try_element_at(t, F.lit(9)).try_cast("long").alias("tlen"),
        F.when(F.try_element_at(t, F.lit(10)) == "*", None).otherwise(F.try_element_at(t, F.lit(10))).alias("sequence"),
        F.when(F.try_element_at(t, F.lit(11)) == "*", None).otherwise(F.try_element_at(t, F.lit(11))).alias(
            "qualityScores"
        ),
        F.when(
            F.size(t) > 11,
            F.map_from_entries(
                F.transform(
                    F.slice(t, 12, 10_000),
                    # TAG:TYPE:VALUE → key=TAG, value="TYPE:VALUE"
                    lambda x: F.struct(
                        F.substring_index(x, ":", 1).alias("k"),
                        F.substring(x, 4, 1_000_000).alias("v"),
                    ),
                )
            ),
        ).alias("attributes"),
    )
    b = lambda bit: F.col("flag").bitwiseAND(F.lit(bit)) != 0  # noqa: E731
    df = parsed.select(
        F.when(b(0x4), None).otherwise(F.col("rname")).alias("referenceName"),
        F.when(b(0x4) | (F.col("pos1") == 0), None)
        .otherwise(F.col("pos1") - 1)
        .alias("start"),
        F.when(b(0x4) | (F.col("pos1") == 0), None)
        .otherwise(F.col("pos1") - 1 + _ref_len("cigar"))
        .alias("end"),
        F.when(b(0x4), None).otherwise(F.col("mapq")).alias("mappingQuality"),
        "readName",
        "sequence",
        "qualityScores",
        "cigar",
        b(0x1).alias("readPaired"),
        b(0x2).alias("properPair"),
        (~b(0x4)).alias("readMapped"),
        F.when(b(0x1), ~b(0x8)).otherwise(F.lit(None).cast("boolean")).alias("mateMapped"),
        b(0x200).alias("failedVendorQualityChecks"),
        b(0x400).alias("duplicateRead"),
        b(0x10).alias("readNegativeStrand"),
        F.when(b(0x1), b(0x20)).otherwise(F.lit(None).cast("boolean")).alias(
            "mateNegativeStrand"
        ),
        (~b(0x100) & ~b(0x800)).alias("primaryAlignment"),
        b(0x100).alias("secondaryAlignment"),
        b(0x800).alias("supplementaryAlignment"),
        # attribute values carry their "TYPE:" prefix; the typed columns
        # hold the bare value
        F.substring(F.col("attributes").getItem("MD"), 3, 1_000_000).alias(
            "mismatchingPositions"
        ),
        F.substring(F.col("attributes").getItem("RG"), 3, 1_000_000).alias("readGroupId"),
        # realignment provenance tags (AlignmentConverter.scala: OP is
        # 1-based on disk, OC/OQ verbatim)
        (
            F.substring(F.col("attributes").getItem("OP"), 3, 1_000_000).try_cast("long")
            - 1
        ).alias("originalStart"),
        F.substring(F.col("attributes").getItem("OC"), 3, 1_000_000).alias(
            "originalCigar"
        ),
        F.substring(F.col("attributes").getItem("OQ"), 3, 1_000_000).alias(
            "originalQualityScores"
        ),
        # htsjdk semantics (AlignmentConverter.scala:159-168): mate
        # fields are set whenever RNEXT resolves to a real reference —
        # INDEPENDENT of the mate-unmapped flag, so a placed unmapped
        # mate keeps its mate reference/position (samtools-flagstat's
        # crossChromosome counters depend on this; pinned against
        # NA12878.sam in tests/test_reference_goldens.py)
        F.when(
            (F.col("rnext") != "*") & (F.col("pnext1") > 0), F.col("pnext1") - 1
        ).alias("mateAlignmentStart"),
        F.when(
            F.col("rnext") == "=",
            F.when(F.col("rname") != "*", F.col("rname")),
        )
        .when(F.col("rnext") != "*", F.col("rnext"))
        .alias("mateReferenceName"),
        F.when(F.col("tlen") != 0, F.col("tlen")).alias("insertSize"),
        F.when(b(0x40), 0).when(b(0x80), 1).otherwise(0).alias("readInFragment"),
        "attributes",
    )
    return schemas.conform(df, schemas.ALIGNMENT)


def _header_metadata(raw: DataFrame, stringency: str = "SILENT") -> GenomicMetadata:
    hdr = [r["value"] for r in raw.where(F.col("value").startswith("@")).collect()]
    return header_metadata_from_lines(hdr, stringency)


def header_metadata_from_lines(
    hdr: list[str], stringency: str = "SILENT"
) -> GenomicMetadata:
    """@SQ/@RG header lines → GenomicMetadata (shared by SAM and the
    distributed BAM scan, which parses the header driver-side).

    ``stringency`` governs malformed header lines (@SQ without SN, or a
    non-integer LN — ADAMContextSuite "bad header" cases): STRICT
    raises, LENIENT warns and skips the bad field, SILENT skips."""
    import sys as _sys

    def _bad(msg: str) -> None:
        if stringency == "STRICT":
            raise ValueError(msg)
        if stringency == "LENIENT":
            print(f"warning: {msg}", file=_sys.stderr)

    refs, rgs = [], []
    for line in hdr:
        parts = line.split("\t")
        fields = dict(kv.split(":", 1) for kv in parts[1:] if ":" in kv)
        if parts[0] == "@SQ":
            if "SN" not in fields:
                _bad(f"@SQ header line without SN: {line!r}")
                continue
            length = None
            if "LN" in fields:
                try:
                    length = int(fields["LN"])
                except ValueError:
                    _bad(f"@SQ header line with non-integer LN: {line!r}")
            refs.append(
                Reference(
                    name=fields["SN"],
                    length=length,
                    md5=fields.get("M5"),
                )
            )
        elif parts[0] == "@RG" and "ID" in fields:
            pi = fields.get("PI")
            try:
                pi = int(pi) if pi is not None else None
            except ValueError:
                _bad(f"@RG header line with non-integer PI: {line!r}")
                pi = None
            dt = fields.get("DT")
            epoch = None
            if dt:
                try:
                    from datetime import datetime, timezone

                    epoch = int(
                        datetime.fromisoformat(dt)
                        .replace(tzinfo=timezone.utc)
                        .timestamp()
                    )
                except ValueError:
                    _bad(f"@RG header line with unparseable DT: {line!r}")
            rgs.append(
                ReadGroup(
                    id=fields["ID"],
                    sampleId=fields.get("SM"),
                    library=fields.get("LB"),
                    platform=fields.get("PL"),
                    platformUnit=fields.get("PU"),
                    sequencingCenter=fields.get("CN"),
                    description=fields.get("DS"),
                    runDateEpoch=epoch,
                    flowOrder=fields.get("FO"),
                    keySequence=fields.get("KS"),
                    predictedMedianInsertSize=pi,
                )
            )
    return GenomicMetadata(
        references=SequenceDictionary(refs), read_groups=rgs, kind="alignment"
    )


def sam_body_lines(df: DataFrame) -> DataFrame:
    """ALIGNMENT rows → one-column (``value``) SAM body lines,
    including optional tags: MD/RG re-emitted from their typed columns
    (authoritative — operators update them), every other attribute
    passed through as TAG:TYPE:VALUE."""
    df = schemas.conform(df, schemas.ALIGNMENT)
    flags = sam_flags(df)
    # typed-column-backed tags, rendered from their authoritative
    # columns (operators update those, not the raw map values)
    typed = {
        "MD": F.when(
            F.col("mismatchingPositions").isNotNull(),
            F.concat(F.lit("MD:Z:"), F.col("mismatchingPositions")),
        ),
        "RG": F.when(
            F.col("readGroupId").isNotNull(),
            F.concat(F.lit("RG:Z:"), F.col("readGroupId")),
        ),
        # AlignmentConverterSuite 'testing the fields in a converted ADAM
        # Read': originalStart 12 emits OP:i:13; OC/OQ verbatim
        "OP": F.when(
            F.col("originalStart").isNotNull(),
            F.concat(F.lit("OP:i:"), (F.col("originalStart") + 1).cast("string")),
        ),
        "OC": F.when(
            F.col("originalCigar").isNotNull(),
            F.concat(F.lit("OC:Z:"), F.col("originalCigar")),
        ),
        "OQ": F.when(
            F.col("originalQualityScores").isNotNull(),
            F.concat(F.lit("OQ:Z:"), F.col("originalQualityScores")),
        ),
    }
    attrs = F.coalesce(F.col("attributes"), F.lit(None).cast("map<string,string>"))
    # tags emit in the map's stored order (the loader keeps file order),
    # with the typed columns substituted IN PLACE — a load→save cycle is
    # byte-stable against third-party files (pinned vs ordered.sam /
    # sorted.sam in tests/test_reference_goldens.py); a typed tag the
    # map never carried (e.g. freshly computed MD) appends at the end
    in_place = F.transform(
        F.map_entries(attrs),
        lambda e: F.when(e["key"] == "MD", typed["MD"])
        .when(e["key"] == "RG", typed["RG"])
        .when(e["key"] == "OP", typed["OP"])
        .when(e["key"] == "OC", typed["OC"])
        .when(e["key"] == "OQ", typed["OQ"])
        .otherwise(F.concat(e["key"], F.lit(":"), e["value"])),
    )
    appended = [
        F.when(~F.coalesce(F.map_contains_key(attrs, tag), F.lit(False)), expr)
        for tag, expr in typed.items()
    ]
    other_tags = F.array_join(
        F.filter(
            F.concat(
                F.coalesce(in_place, F.array().cast("array<string>")),
                F.array(*appended),
            ),
            lambda x: x.isNotNull(),
        ),
        "\t",
    )
    line = F.concat_ws(
        "\t",
        F.coalesce(F.col("readName"), F.lit("*")),
        flags.cast("string"),
        F.coalesce(F.col("referenceName"), F.lit("*")),
        F.coalesce((F.col("start") + 1).cast("string"), F.lit("0")),
        F.coalesce(F.col("mappingQuality").cast("string"), F.lit("0")),
        F.coalesce(F.col("cigar"), F.lit("*")),
        F.coalesce(
            F.when(
                # isNotNull guard: null==null under eqNullSafe would emit
                # RNEXT '=' with RNAME '*' for unmapped unpaired reads
                F.col("mateReferenceName").isNotNull()
                & F.col("mateReferenceName").eqNullSafe(F.col("referenceName")),
                F.lit("="),
            ).otherwise(F.col("mateReferenceName")),
            F.lit("*"),
        ),
        F.coalesce((F.col("mateAlignmentStart") + 1).cast("string"), F.lit("0")),
        F.coalesce(F.col("insertSize").cast("string"), F.lit("0")),
        F.coalesce(F.col("sequence"), F.lit("*")),
        F.coalesce(F.col("qualityScores"), F.lit("*")),
        F.when(other_tags != "", other_tags),
    ).alias("value")
    return df.select(line)


def sam_header_lines(
    meta: GenomicMetadata,
    pg_line: str | None = None,
    sort_order: str = "unsorted",
) -> list[str]:
    """``pg_line``: optional ``@PG`` program record appended after the
    read groups (the reference writes one per run unless ``-disable_pg``
    — TransformAlignments.scala:188). ``sort_order`` lands in the @HD
    SO field (saveAsSam isSorted → "coordinate",
    AlignmentDataset.scala:691-700).

    @SQ attribute order (SN, LN, M5 upper-cased, UR, SP) and @RG
    attribute order (SM, CN, DS, DT, FO, KS, LB, PI, PL, PU) follow the
    reference's htsjdk-record insertion order
    (SequenceDictionary.scala:353-373, ReadGroupDictionary.scala:302-
    320) — byte-pinned against ordered.sam/sorted.sam in
    tests/test_reference_goldens.py."""
    header = [f"@HD\tVN:1.6\tSO:{sort_order}"]
    for r in meta.references.references:
        sq = f"@SQ\tSN:{r.name}" + (f"\tLN:{r.length}" if r.length else "")
        if r.md5 is not None:
            sq += f"\tM5:{r.md5.upper()}"
        if r.url is not None:
            sq += f"\tUR:{r.url}"
        if r.species is not None:
            sq += f"\tSP:{r.species}"
        header.append(sq)
    for g in meta.read_groups:
        rg = f"@RG\tID:{g.id}"
        for tag, val in (
            ("SM", g.sampleId), ("CN", g.sequencingCenter),
            ("DS", g.description),
        ):
            if val is not None:
                rg += f"\t{tag}:{val}"
        if g.runDateEpoch is not None:
            from datetime import datetime, timezone

            rg += "\tDT:" + datetime.fromtimestamp(
                g.runDateEpoch, tz=timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
        for tag, val in (
            ("FO", g.flowOrder), ("KS", g.keySequence), ("LB", g.library),
            ("PI", g.predictedMedianInsertSize), ("PL", g.platform),
            ("PU", g.platformUnit),
        ):
            if val is not None:
                rg += f"\t{tag}:{val}"
        header.append(rg)
    if pg_line:
        header.append(pg_line)
    return header


def save_sam(
    gf: GenomicFrame,
    path: str,
    single_file: bool = True,
    pg_line: str | None = None,
    is_sorted: bool = False,
    sort_order: str | None = None,
) -> None:
    """Alignments → SAM text with reconstructed flags + header.
    ``sort_order`` overrides the ``is_sorted`` shorthand — the
    reference's saveAsSam sortOrder param (e.g. "queryname" after
    sortByReadName; byte-pinned against readname_sorted.sam)."""
    df = schemas.conform(gf.df, schemas.ALIGNMENT)
    body = sam_body_lines(df)
    header = sam_header_lines(
        gf.meta, pg_line=pg_line,
        sort_order=sort_order or ("coordinate" if is_sorted else "unsorted"),
    )
    from adam_spark.sources.merge import local_lines_df, write_text_single_file

    if single_file:
        # distributed render + FileMerger concat with the header
        # prepended (the reference's -single shape)
        write_text_single_file(body, path, header_lines=header)
        return
    hdr_df = local_lines_df(df.sparkSession, [(h,) for h in header], "value string")
    out = (
        hdr_df.select(F.lit(0).alias("__o"), "value")
        .unionByName(body.select(F.lit(1).alias("__o"), "value"))
    )
    out.select("value").write.text(path)
