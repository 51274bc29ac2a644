"""Slice operators + GenomicFrame operator-binding tests
(reference: FlankSlicesSuite, SliceDatasetSuite extract cases)."""

from adam_spark import GenomicFrame, GenomicMetadata
from adam_spark.operators import slices as sl


def _slices(spark, seq="AAAACCCCGGGGTTTT", step=4, name="chr1"):
    rows = []
    n = (len(seq) + step - 1) // step
    for i in range(n):
        s = i * step
        e = min(s + step, len(seq))
        rows.append((name, seq[s:e], s, e, i, n, len(seq)))
    return spark.createDataFrame(
        rows, "name string, sequence string, start long, end long, index int, slices int, totalLength long"
    )


def test_flank_adjacent(spark):
    df = sl.flank_adjacent_slices(_slices(spark), flank=2)
    rows = {r["index"]: r for r in df.collect()}
    # middle slice: head from prev tail, tail from next head
    assert rows[1]["sequence"] == "AA" + "CCCC" + "GG"
    assert rows[1]["start"] == 2 and rows[1]["end"] == 10
    # first slice: no predecessor
    assert rows[0]["sequence"] == "AAAA" + "CC"
    assert rows[0]["start"] == 0 and rows[0]["end"] == 6
    # last slice: no successor
    assert rows[3]["sequence"] == "GG" + "TTTT"
    assert rows[3]["end"] == 16


def test_flank_skips_non_adjacent(spark):
    rows = [("chr1", "AAAA", 0, 4, 0, 2, 20), ("chr1", "GGGG", 10, 14, 1, 2, 20)]
    df = spark.createDataFrame(
        rows, "name string, sequence string, start long, end long, index int, slices int, totalLength long"
    )
    got = {r["index"]: r["sequence"] for r in sl.flank_adjacent_slices(df, 2).collect()}
    assert got == {0: "AAAA", 1: "GGGG"}  # gap → no stitching


def test_extract_region(spark):
    df = _slices(spark)
    out = sl.extract_region(df, "chr1", 2, 11).collect()
    assert len(out) == 1
    assert out[0]["sequence"] == "AACCCCGGG"
    assert out[0]["start"] == 2 and out[0]["end"] == 11


def test_extract_regions_batch(spark):
    df = _slices(spark)
    out = {
        (r["name"], r["start"]): r["sequence"]
        for r in sl.extract_regions(df, [("chr1", 0, 4), ("chr1", 6, 14)]).collect()
    }
    assert out == {("chr1", 0): "AAAA", ("chr1", 6): "CCGGGGTT"}


def test_genomic_frame_bindings(spark):
    rows = [
        ("chr1", 10, 20, "a"),
        ("chr1", 15, 25, "b"),
        ("chr2", 10, 20, "c"),
    ]
    l = GenomicFrame(
        spark.createDataFrame(rows, "referenceName string, start long, end long, id string"),
        GenomicMetadata(kind="feature"),
    )
    r = GenomicFrame(
        spark.createDataFrame(
            [("chr1", 18, 30, "x")], "referenceName string, start long, end long, rid string"
        ),
        GenomicMetadata(kind="feature"),
    )
    j = l.region_join(r)
    got = {(row["id"], row["rid"]) for row in j.df.collect()}
    assert got == {("a", "x"), ("b", "x")}
    jb = l.broadcast_region_join(r, group="left")
    assert jb.df.count() == 2  # a and b matched, grouped
    sorted_gf = l.sort_lexicographically()
    assert [r["id"] for r in sorted_gf.df.collect()] == ["a", "b", "c"]


def test_reassemble_read_pairs(spark):
    from adam_spark.operators.conversions import reassemble_read_pairs

    r1 = spark.createDataFrame(
        [("a", "ACGT"), ("b", "TTTT"), ("orphan", "GG")], "readName string, sequence string"
    )
    r2 = spark.createDataFrame([("a", "CCCC"), ("b", "AAAA")], "readName string, sequence string")
    out = reassemble_read_pairs(r1, r2)
    rows = out.collect()
    assert len(rows) == 4  # orphan dropped (no mate)
    assert all(r["readPaired"] for r in rows)
    assert {(r["readName"], r["readInFragment"]) for r in rows} == {
        ("a", 0), ("a", 1), ("b", 0), ("b", 1),
    }


def test_slices_to_sequences_and_reads(spark, tmp_path):
    """SliceDatasetSuite 'convert slices to sequences' / 'to reads':
    each slice projects to its own record, quality columns null."""
    from adam_spark.operators.conversions import (
        slices_to_reads,
        slices_to_sequences,
    )
    from adam_spark.sources.fasta import load_fasta_slices

    fa = tmp_path / "s.fa"
    fa.write_text(">chrA\n" + "ACGT" * 6 + "\n")
    slices = load_fasta_slices(spark, str(fa), 10).df
    seqs = slices_to_sequences(slices).collect()
    assert [len(r["sequence"]) for r in sorted(seqs, key=lambda r: -r["length"])] == [10, 10, 4]
    assert all(r["name"] == "chrA" for r in seqs)
    reads = slices_to_reads(slices).collect()
    assert len(reads) == 3
    assert all(r["qualityScores"] is None for r in reads)
