"""Round-trip tests for text-format sources (SAM, BED/GTF/GFF3/NarrowPeak/
IntervalList), mirroring the reference's load→save→reload equivalence suites
(AlignmentDatasetSuite.scala:313, FeatureDatasetSuite round trips)."""

from __future__ import annotations

from pyspark.sql import functions as F

from adam_spark.sources import features_io, sam


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_sam_round_trip(spark, fixtures, tmp_path):
    gf = fixtures.alignments()
    out = str(tmp_path / "out.sam")
    sam.save_sam(gf, out)
    back = sam.load_sam(spark, out)

    cols = [
        "readName",
        "referenceName",
        "start",
        "end",
        "mappingQuality",
        "cigar",
        "sequence",
        "qualityScores",
        "readPaired",
        "readMapped",
        "readNegativeStrand",
        "duplicateRead",
        "readInFragment",
    ]
    assert _rows(back.df, *cols) == _rows(gf.df, *cols)
    # header metadata survives
    assert [r.name for r in back.meta.references.references] == [
        r.name for r in gf.meta.references.references
    ]
    assert sorted(g.id for g in back.meta.read_groups) == ["rg1", "rg2"]


def test_sam_end_from_cigar(spark, tmp_path):
    """end = start + reference-consumed cigar length (M/D/N/=/X)."""
    lines = [
        "@SQ\tSN:chr1\tLN:1000",
        "r1\t0\tchr1\t11\t60\t10M2D5M3I7M\t*\t0\t0\t" + "A" * 25 + "\t" + "I" * 25,
    ]
    p = tmp_path / "t.sam"
    p.write_text("\n".join(lines) + "\n")
    row = sam.load_sam(spark, str(p)).df.collect()[0]
    assert row["start"] == 10
    assert row["end"] == 10 + (10 + 2 + 5 + 7)
    assert row["readMapped"] is True


def test_bed_round_trip(spark, fixtures, tmp_path):
    gf = fixtures.features()
    out = str(tmp_path / "out.bed")
    features_io.save_bed(gf, out)
    back = features_io.load_bed(spark, str(out))
    cols = ["referenceName", "start", "end", "score", "strand"]
    assert _rows(back.df, *cols) == _rows(gf.df, *cols)


def test_gtf_round_trip(spark, fixtures, tmp_path):
    gf = fixtures.features()
    out = str(tmp_path / "out.gtf")
    features_io.save_gtf(gf, out)
    back = features_io.load_gtf(spark, str(out))
    cols = ["referenceName", "start", "end", "featureType", "geneId", "strand"]
    assert _rows(back.df, *cols) == _rows(gf.df, *cols)


def test_gff3_round_trip(spark, fixtures, tmp_path):
    gf = fixtures.features()
    out = str(tmp_path / "out.gff3")
    features_io.save_gff3(gf, out)
    back = features_io.load_gff3(spark, str(out))
    cols = ["referenceName", "start", "end", "featureType", "featureId", "strand"]
    assert _rows(back.df, *cols) == _rows(gf.df, *cols)
    # Parent= lists survive
    n_parents = gf.df.where(F.size("parentIds") > 0).count()
    assert back.df.where(F.size("parentIds") > 0).count() == n_parents


def test_narrowpeak_round_trip(spark, fixtures, tmp_path):
    gf = fixtures.features()
    out = str(tmp_path / "out.narrowPeak")
    features_io.save_narrowpeak(gf, out)
    back = features_io.load_narrowpeak(spark, str(out))
    cols = ["referenceName", "start", "end", "strand"]
    assert _rows(back.df, *cols) == _rows(gf.df, *cols)


def test_interval_list_round_trip(spark, fixtures, tmp_path):
    gf = fixtures.features()
    out = str(tmp_path / "out.interval_list")
    features_io.save_interval_list(gf, out)
    back = features_io.load_interval_list(spark, str(out))
    cols = ["referenceName", "start", "end", "strand"]
    assert _rows(back.df, *cols) == _rows(gf.df, *cols)
    # @SQ header → sequence dictionary
    assert [r.name for r in back.meta.references.references] == ["chr1", "chr2", "chrM"]


def test_gtf_coordinate_convention(spark, tmp_path):
    """GTF is 1-based closed on disk; internal is 0-based half-open."""
    p = tmp_path / "t.gtf"
    p.write_text('chr1\tsrc\tgene\t101\t200\t.\t+\t.\tgene_id "g1";\n')
    row = features_io.load_gtf(spark, str(p)).df.collect()[0]
    assert (row["start"], row["end"]) == (100, 200)
    assert row["geneId"] == "g1"
    assert row["strand"] == "FORWARD"


def test_gzipped_text_loads(spark, tmp_path):
    """Extension dispatch strips .gz (FileExtensions.scala isGzip) and
    Spark's text reader decompresses transparently — gzipped FASTQ and
    BED load identically to their plain forms."""
    import gzip

    from adam_spark import context as ctx

    fq = tmp_path / "reads.fq.gz"
    with gzip.open(fq, "wt") as fh:
        fh.write("@r1\nACGT\n+\nIIII\n@r2\nTTTT\n+\nJJJJ\n")
    gf = ctx.load_alignments(spark, str(fq))
    rows = {r["readName"]: r["sequence"] for r in gf.df.collect()}
    assert rows == {"r1": "ACGT", "r2": "TTTT"}

    bed = tmp_path / "feats.bed.gz"
    with gzip.open(bed, "wt") as fh:
        fh.write("chr1\t10\t20\tf1\t5.0\t+\nchr2\t5\t9\tf2\t1.0\t-\n")
    fgf = ctx.load_features(spark, str(bed))
    assert fgf.df.count() == 2
    assert {r["referenceName"] for r in fgf.df.collect()} == {"chr1", "chr2"}


def test_bed12_blocks(spark, tmp_path):
    """BED12 block columns land in attributes (ADAMContextSuite
    'Can read a BED 12 file')."""
    from adam_spark.sources.features_io import load_bed

    bed = tmp_path / "b12.bed"
    bed.write_text(
        "chr1\t100\t500\tgene1\t0\t+\t120\t480\t255,0,0\t2\t100,100\t0,300\n"
        "chr1\t10\t20\tthin\t5\t-\n"
    )
    rows = {r["name"]: r for r in load_bed(spark, str(bed)).df.collect()}
    a = rows["gene1"]["attributes"]
    assert a["blockCount"] == "2"
    assert a["blockSizes"] == "100,100"
    assert a["blockStarts"] == "0,300"
    assert a["thickStart"] == "120" and a["itemRgb"] == "255,0,0"
    assert rows["thin"]["attributes"] is None


def test_sam_bad_header_stringency(spark, tmp_path):
    """ADAMContextSuite 'bad header with lenient validation' /
    'strict stringency should fail': a non-integer LN loads leniently
    (length dropped) and raises under STRICT."""
    import pytest as _pytest

    from adam_spark.sources.sam import load_sam

    p = tmp_path / "bad.sam"
    p.write_text(
        "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:notanumber\n"
        "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII\n"
    )
    gf = load_sam(spark, str(p), stringency="LENIENT")
    assert gf.df.count() == 1
    assert gf.meta.references["chr1"].length is None
    with _pytest.raises(ValueError):
        load_sam(spark, str(p), stringency="STRICT")


def test_fastq_no_bases(spark, tmp_path):
    """ADAMContextSuite 'load FASTQ with no bases': empty sequence and
    quality lines keep the 4-line grouping and load as empty-sequence
    reads."""
    from adam_spark.sources.fastq import load_unpaired_fastq

    p = tmp_path / "nb.fq"
    p.write_text("@empty1\n\n+\n\n@ok\nACGT\n+\nIIII\n")
    rows = {r["name"]: r for r in load_unpaired_fastq(spark, str(p)).df.collect()}
    assert set(rows) == {"empty1", "ok"}
    assert rows["empty1"]["length"] == 0
    assert rows["ok"]["sequence"] == "ACGT"


def test_fastq_resync_quality_line_at_shard_start(spark, tmp_path):
    """FastqRecordReader.positionAtFirstRecord look-ahead
    (FastqRecordReader.java:270-300): a truncated shard whose FIRST
    line is a quality string beginning with '@' (Phred 31) must not be
    mistaken for a record boundary — the reference reads ahead and,
    seeing the next line start with '@', anchors on THAT line
    instead."""
    from adam_spark.sources.fastq import load_unpaired_fastq

    p = tmp_path / "trunc.fq"
    # '@AAAA' is the orphaned quality line of a record whose first
    # three lines were cut off by the shard boundary
    p.write_text("@AAAA\n@r2\nACGT\n+\nIIII\n@r3\nTTTT\n+\nJJJJ\n")
    rows = {r["name"]: r for r in load_unpaired_fastq(spark, str(p)).df.collect()}
    assert set(rows) == {"r2", "r3"}
    assert rows["r2"]["sequence"] == "ACGT"
    assert rows["r3"]["qualityScores"] == "JJJJ"

    # candidate accepted only when line+2 starts with '+': a shard
    # starting at a quality '@' line deeper in the record is skipped
    q = tmp_path / "trunc2.fq"
    q.write_text("@AAAA\nGGGG\n+\nIIII\n@r9\nCCCC\n+\nKKKK\n")
    # '@AAAA' here LOOKS like a full record (next line not '@', line+2
    # is '+') — indistinguishable from a real record, accepted, exactly
    # as the reference would
    names = {r["name"] for r in load_unpaired_fastq(spark, str(q)).df.collect()}
    assert names == {"AAAA", "r9"}


def test_bed12_roundtrip_and_gff3_fasta_section(spark, tmp_path):
    """FeatureDatasetSuite 'round trip BED12 format' + 'ignore FASTA
    sequence in GFF3 file'."""
    from adam_spark.sources.features_io import load_bed, load_gff3, save_bed

    bed = tmp_path / "in12.bed"
    line = "chr1\t100\t500\tg1\t5.0\t+\t120\t480\t255,0,0\t2\t100,100\t0,300"
    bed.write_text(line + "\nchr2\t5\t9\tthin\t1.0\t-\n")
    gf = load_bed(spark, str(bed))
    out = str(tmp_path / "out.bed")
    save_bed(gf, out, single_file=True)
    import os as _os
    text = "".join(
        open(_os.path.join(out, f)).read()
        for f in sorted(_os.listdir(out)) if f.startswith("part-")
    )
    assert line in text
    assert "chr2\t5\t9\tthin\t1.0\t-" in text
    back = load_bed(spark, out)
    r = {x["name"]: x for x in back.df.collect()}
    assert r["g1"]["attributes"]["blockStarts"] == "0,300"

    gff = tmp_path / "f.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\tsrc\tgene\t1\t100\t.\t+\t.\tID=g1\n"
        "##FASTA\n>chr1\nACGTACGT\nACGT\n"
    )
    rows = load_gff3(spark, str(gff)).df.collect()
    assert len(rows) == 1 and rows[0]["referenceName"] == "chr1"


def test_read_group_full_field_roundtrip(spark, tmp_path):
    """ReadGroupDictionarySuite 'round trip a record with all
    attributes set': every @RG field survives SAM save -> load."""
    from adam_spark.sources.sam import load_sam, save_sam

    p = tmp_path / "rg.sam"
    p.write_text(
        "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n"
        "@RG\tID:rg1\tSM:s1\tLB:lib1\tPL:ILLUMINA\tPU:unit1\tCN:center\t"
        "DS:my group\tFO:ACGT\tKS:TTT\tPI:350\tDT:2020-01-02T00:00:00\n"
        "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII\tRG:Z:rg1\n"
    )
    gf = load_sam(spark, str(p))
    g = gf.meta.read_groups[0]
    assert (g.platformUnit, g.sequencingCenter) == ("unit1", "center")
    assert g.description == "my group"
    assert (g.flowOrder, g.keySequence) == ("ACGT", "TTT")
    assert g.predictedMedianInsertSize == 350
    assert g.runDateEpoch == 1577923200
    out = str(tmp_path / "out.sam")
    save_sam(gf, out)
    g2 = load_sam(spark, out).meta.read_groups[0]
    assert g2 == g


def test_interval_list_sp_header_with_space(spark, tmp_path):
    """FeatureDatasetSuite 'allow space in IntervalList SP header
    value': tab-delimited header fields keep internal spaces."""
    from adam_spark.sources.features_io import load_interval_list

    p = tmp_path / "t.interval_list"
    p.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:chr1\tLN:1000\tSP:Homo sapiens\tAS:GRCh38 p14\n"
        "chr1\t11\t20\t+\tr1\n"
    )
    gf = load_interval_list(spark, str(p))
    assert gf.meta.references["chr1"].length == 1000
    r = gf.df.collect()[0]
    assert (r["start"], r["end"]) == (10, 20)


def _single_part(out_dir):
    import os

    part = [f for f in sorted(os.listdir(out_dir)) if f.startswith("part-")][0]
    return open(os.path.join(out_dir, part)).read()


def test_gff3_round_trip_attribute_complete(spark, tmp_path):
    """FeatureDatasetSuite 'round trip GFF3 format' (:221-255) widened to
    every typed field Features.gatherAttributes emits
    (Features.scala:188-212): single-file saves start with the
    ##gff-version 3.2.1 pragma (GFF3HeaderWriter.scala:28), the first
    gene's attributes re-emit as ID;Name;<remaining>, and a fully loaded
    feature (Target/Gap/Derives_from/Is_circular/exon_id/sampleId/
    Alias*/Note*/Parent/Dbxref/Ontology_term/custom) survives the
    save->load cycle field-exact with a textually idempotent second save."""
    from adam_spark.sources.features_io import GFF3_HEADER, load_gff3, save_gff3

    p = tmp_path / "dvl1_shape.gff3"
    p.write_text(
        "##gff-version 3\n"
        "##sequence-region 1 1 248956422\n"
        "\n"
        "1\tEnsembl\tgene\t1331314\t1335306\t.\t+\t.\t"
        "ID=ENSG0001;Name=ENSG0001;biotype=protein_coding\n"
        "1\tEnsembl\ttranscript\t1331314\t1335306\t.\t+\t.\t"
        "ID=ENST0001;Name=ENST0001;Parent=ENSG0001;biotype=protein_coding\n"
        "1\thavana\texon\t1331314\t1331500\t.\t+\t.\t"
        "ID=ENSE0001;Parent=ENST0001,ENST0002;exon_id=ENSE0001;"
        "Dbxref=EMBL:AA816246;Ontology_term=SO:0000147;Alias=ex1;Alias=ex1b;"
        "Note=first exon;Target=EST23 1 187;Gap=M187;Derives_from=ENST0009;"
        "Is_circular=false;sampleId=s1;custom=x=y\n"
    )
    gf = load_gff3(spark, str(p))
    r = {x["featureId"]: x for x in gf.df.collect()}["ENSE0001"]
    # Parent stays one comma-joined entry: the reference never splits on
    # ',' (Features.scala:156 appends entry._2 verbatim)
    assert r["parentIds"] == ["ENST0001,ENST0002"]
    assert r["aliases"] == ["ex1", "ex1b"] and r["notes"] == ["first exon"]
    assert r["dbxrefs"] == ["EMBL:AA816246"]
    assert r["ontologyTerms"] == ["SO:0000147"]
    assert (r["target"], r["gap"], r["derivesFrom"]) == ("EST23 1 187", "M187", "ENST0009")
    assert r["circular"] is False and r["sampleId"] == "s1"
    assert r["exonId"] == "ENSE0001"
    # '=' inside a value survives the first-'=' split
    assert dict(r["attributes"]) == {"custom": "x=y"}

    out = str(tmp_path / "out.gff3")
    save_gff3(gf, out, single_file=True)
    lines = _single_part(out).splitlines()
    assert lines[0] == GFF3_HEADER
    gene = [l for l in lines if "\tgene\t" in l][0]
    assert gene.split("\t")[8] == "ID=ENSG0001;Name=ENSG0001;biotype=protein_coding"

    back = load_gff3(spark, out)
    assert sorted(map(tuple, gf.df.collect())) == sorted(map(tuple, back.df.collect()))
    out2 = str(tmp_path / "out2.gff3")
    save_gff3(back, out2, single_file=True)
    assert _single_part(out) == _single_part(out2)


def test_gtf_round_trip_attribute_complete(spark, tmp_path):
    """FeatureDatasetSuite 'round trip GTF format' (:114-147): typed
    gene_id/transcript_id lead the attribute column, the remaining
    attributes map follows sorted by key (the suite pins gene_biotype,
    gene_name, gene_source in that order), and reload is field-exact."""
    from adam_spark.sources.features_io import load_gtf, save_gtf

    p = tmp_path / "ens_shape.gtf"
    p.write_text(
        '1\tpseudogene\tgene\t11869\t14412\t.\t+\t.\t'
        'gene_id "ENSGX"; gene_name "DDX11L1"; gene_source "ensembl_havana"; '
        'gene_biotype "pseudogene";\n'
        '1\tprocessed_transcript\ttranscript\t11869\t14409\t.\t+\t.\t'
        'gene_id "ENSGX"; transcript_id "ENSTX"; gene_name "DDX11L1"; '
        'gene_source "ensembl_havana"; gene_biotype "pseudogene"; '
        'transcript_name "DDX11L1-002"; transcript_source "havana";\n'
    )
    gf = load_gtf(spark, str(p))
    out = str(tmp_path / "out.gtf")
    save_gtf(gf, out, single_file=True)
    gene = [l for l in _single_part(out).splitlines() if "\tgene\t" in l][0]
    cols = gene.split("\t")
    assert cols[:8] == ["1", "pseudogene", "gene", "11869", "14412", ".", "+", "."]
    attrs = [a.strip() for a in cols[8].split(";")]
    assert attrs == [
        'gene_id "ENSGX"',
        'gene_biotype "pseudogene"',
        'gene_name "DDX11L1"',
        'gene_source "ensembl_havana"',
    ]
    back = load_gtf(spark, out)
    assert sorted(map(tuple, gf.df.collect())) == sorted(map(tuple, back.df.collect()))


def test_cross_format_saves_and_name_of(spark, tmp_path):
    """FeatureDatasetSuite 'save GFF3 as GTF/BED/IntervalList/NarrowPeak
    format' (:185-220): features loaded from GFF3 re-save to every other
    text format with count parity; lossy formats name rows via
    Features.nameOf (:216-229) — name, else ID, else the typed id for
    gene/transcript/exon, else featureType, else 'sequence_feature'."""
    from adam_spark.core.metadata import GenomicMetadata, Reference, SequenceDictionary
    from adam_spark.sources.features_io import (
        load_bed,
        load_gff3,
        load_gtf,
        load_interval_list,
        load_narrowpeak,
        save_bed,
        save_gtf,
        save_interval_list,
        save_narrowpeak,
    )

    gff = tmp_path / "in.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "1\tEnsembl\tgene\t11\t100\t.\t+\t.\tID=ENSG01;biotype=x\n"
        "1\tEnsembl\ttranscript\t11\t100\t.\t+\t.\ttranscript_id=ENST01\n"
        "1\tEnsembl\texon\t11\t50\t.\t+\t.\texon_id=ENSE01\n"
        "1\tEnsembl\tCDS\t11\t50\t.\t+\t.\tx=y\n"
        "1\tEnsembl\t.\t11\t50\t.\t+\t.\tx=y\n"
    )
    gf = load_gff3(spark, str(gff))
    gf.meta = GenomicMetadata(
        references=SequenceDictionary([Reference(name="1", length=1000)]),
        kind="feature",
    )
    n = gf.df.count()

    out = str(tmp_path / "o.gtf")
    save_gtf(gf, out)
    assert load_gtf(spark, out).df.count() == n

    out = str(tmp_path / "o.bed")
    save_bed(gf, out)
    bed = load_bed(spark, out)
    assert bed.df.count() == n
    # nameOf fallback chain on the BED name column
    names = {r["name"] for r in bed.df.collect()}
    assert names == {"ENSG01", "ENST01", "ENSE01", "CDS", "sequence_feature"}

    out = str(tmp_path / "o.interval_list")
    save_interval_list(gf, out)
    assert load_interval_list(spark, out).df.count() == n

    out = str(tmp_path / "o.narrowPeak")
    save_narrowpeak(gf, out)
    assert load_narrowpeak(spark, out).df.count() == n


def test_gff3_randomized_attribute_round_trip(spark, tmp_path):
    """Randomized feature rows (seeded) with arbitrary combinations of
    the sixteen typed fields + residual attributes survive a GFF3
    save->load cycle field-exact, and a second save is byte-identical
    (the gather/assign pair is a true inverse on the GFF3-expressible
    value space — no ';', '=', tabs or newlines in values, the same
    limitation the reference's unescaped toGff3 has)."""
    import random

    from adam_spark import schemas
    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.core.metadata import GenomicMetadata
    from adam_spark.sources.features_io import load_gff3, save_gff3

    rng = random.Random(8)
    alphabet = "abcdefgHIJKLM_.:%+0123 "

    def word(must=False):
        if not must and rng.random() < 0.4:
            return None
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9))).strip() or "x"

    rows = []
    for i in range(25):
        rows.append(
            {
                "referenceName": f"chr{rng.randint(1, 3)}",
                "start": i * 100,
                "end": i * 100 + rng.randint(1, 99),
                "source": word(),
                "featureType": rng.choice(["gene", "exon", "transcript", None]),
                "strand": rng.choice(["FORWARD", "REVERSE", "INDEPENDENT"]),
                "score": rng.choice([None, float(rng.randint(0, 1000))]),
                "phase": rng.choice([None, 0, 1, 2]),
                "featureId": word(),
                "name": word(),
                "target": word(),
                "gap": word(),
                "derivesFrom": word(),
                "geneId": word(),
                "transcriptId": word(),
                "exonId": word(),
                "proteinId": word(),
                "sampleId": word(),
                "circular": rng.choice([None, True, False]),
                "aliases": [word(True) for _ in range(rng.randint(0, 2))] or None,
                "notes": [word(True) for _ in range(rng.randint(0, 2))] or None,
                "parentIds": [word(True) for _ in range(rng.randint(0, 2))] or None,
                "dbxrefs": [f"DB:{word(True)}" for _ in range(rng.randint(0, 2))] or None,
                "ontologyTerms": [f"SO:{rng.randint(1, 999)}" for _ in range(rng.randint(0, 2))] or None,
                "attributes": {
                    f"k{j}": word(True) for j in range(rng.randint(0, 3))
                } or None,
            }
        )
    gf = GenomicFrame(
        schemas.conform(spark.createDataFrame(rows), schemas.FEATURE),
        GenomicMetadata(kind="feature"),
    )
    out = str(tmp_path / "rand.gff3")
    save_gff3(gf, out, single_file=True)
    back = load_gff3(spark, out)

    def key(r):
        return (r["referenceName"], r["start"], r["end"])

    want = {key(r): r for r in gf.df.collect()}
    got = {key(r): r for r in back.df.collect()}
    assert set(want) == set(got)
    for k, w in want.items():
        g = got[k]
        for f in schemas.FEATURE.fieldNames():
            if f == "frame":
                continue  # GFF3 carries phase, not frame
            assert g[f] == w[f], (k, f, w[f], g[f])

    out2 = str(tmp_path / "rand2.gff3")
    save_gff3(back, out2, single_file=True)
    assert _single_part(out) == _single_part(out2)


def test_save_ucsc_bed_score_interpolation(spark, tmp_path):
    """FeatureDatasetSuite 'save to UCSC BED format' (:373-391): scores
    clamp to [min, max] then map linearly to 0..1000 ints
    (Features.interpolateScore); missing scores write the missing
    value."""
    from adam_spark import schemas
    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.core.metadata import GenomicMetadata
    from adam_spark.sources.features_io import save_ucsc_bed

    rows = [
        {"referenceName": "1", "start": 1331345, "end": 1331536,
         "name": "106624", "score": 13.53, "strand": "FORWARD"},
        {"referenceName": "1", "start": 10, "end": 20, "name": "over",
         "score": 999.0, "strand": "FORWARD"},     # clamps to max → 1000
        {"referenceName": "1", "start": 30, "end": 40, "name": "miss",
         "score": None, "strand": "FORWARD"},       # missing → 0
    ]
    gf = GenomicFrame(
        schemas.conform(spark.createDataFrame(rows), schemas.FEATURE),
        GenomicMetadata(kind="feature"),
    )
    out = str(tmp_path / "ucsc.bed")
    save_ucsc_bed(gf, out, minimum_score=0.0, maximum_score=200.0, single_file=True)
    lines = {l.split("\t")[3]: l.split("\t") for l in _single_part(out).splitlines()}
    assert lines["106624"][:6] == ["1", "1331345", "1331536", "106624", "67", "+"]
    assert lines["over"][4] == "1000"
    assert lines["miss"][4] == "0"


def test_read_group_sample_id_filled_from_header(spark, tmp_path):
    """readGroupSampleId resolves from @RG SM on load
    (AlignmentConverter.scala:221 setReadGroupSampleId) — including
    through the binary BAM path; reads without an RG stay null."""
    from adam_spark.sources.bam import load_bam, save_bam
    from adam_spark.sources.sam import load_sam

    p = tmp_path / "x.sam"
    p.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n"
        "@RG\tID:rg1\tSM:s1\n@RG\tID:rg2\tSM:s2\n"
        "a\t0\tchr1\t100\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1\n"
        "b\t0\tchr1\t200\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg2\n"
        "c\t0\tchr1\t300\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\n"
    )
    gf = load_sam(spark, str(p))
    rows = {r["readName"]: r["readGroupSampleId"] for r in gf.df.collect()}
    assert rows == {"a": "s1", "b": "s2", "c": None}
    bam = str(tmp_path / "x.bam")
    save_bam(gf, bam)
    rows2 = {
        r["readName"]: r["readGroupSampleId"]
        for r in load_bam(spark, bam).df.collect()
    }
    assert rows2 == rows
