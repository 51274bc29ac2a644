"""TwoBit + indexed FASTA random-access tests (reference:
TwoBitFileSuite, IndexedFastaFileSuite)."""

import random

from adam_spark.sources.reference_file import (
    IndexedFastaFile,
    TwoBitFile,
    load_reference_file,
    write_2bit,
)


def test_2bit_roundtrip(tmp_path):
    random.seed(1)
    seqs = {
        "chr1": "".join(random.choice("ACGT") for _ in range(997)),
        "chr2": "ACGT" * 10 + "N" * 13 + "TTTT" + "N" * 3,
        "chrM": "A",
    }
    p = str(tmp_path / "ref.2bit")
    write_2bit(seqs, p)
    tb = TwoBitFile(p)
    assert set(tb.names()) == set(seqs)
    for name, seq in seqs.items():
        assert tb.length(name) == len(seq)
        assert tb.extract(name, 0, len(seq)) == seq, name
    # random slices
    for _ in range(50):
        s = random.randint(0, 900)
        e = s + random.randint(1, 90)
        assert tb.extract("chr1", s, e) == seqs["chr1"][s:e]
    # N-block boundaries
    assert tb.extract("chr2", 38, 46) == seqs["chr2"][38:46]
    # clamping
    assert tb.extract("chrM", 0, 100) == "A"
    assert tb.extract("chr1", 990, 990) == ""


def test_indexed_fasta(tmp_path):
    random.seed(2)
    seq1 = "".join(random.choice("ACGT") for _ in range(250))
    seq2 = "".join(random.choice("ACGT") for _ in range(61))
    p = tmp_path / "ref.fa"
    lines = [">chr1 description"]
    lines += [seq1[i : i + 60] for i in range(0, len(seq1), 60)]
    lines += [">chr2"]
    lines += [seq2[i : i + 60] for i in range(0, len(seq2), 60)]
    p.write_text("\n".join(lines) + "\n")

    fa = IndexedFastaFile(str(p))  # builds its own index (no .fai)
    assert fa.length("chr1") == 250 and fa.length("chr2") == 61
    assert fa.extract("chr1", 0, 250) == seq1
    assert fa.extract("chr2", 0, 61) == seq2
    for _ in range(30):
        s = random.randint(0, 240)
        e = s + random.randint(1, 10)
        assert fa.extract("chr1", s, e) == seq1[s:e]
    # spans line boundaries
    assert fa.extract("chr1", 55, 125) == seq1[55:125]


def test_fai_file_used(tmp_path):
    p = tmp_path / "ref.fa"
    p.write_text(">c1\nACGTACGT\nACGT\n")
    # samtools-style fai: name, length, offset, linebases, linewidth
    (tmp_path / "ref.fa.fai").write_text("c1\t12\t4\t8\t9\n")
    fa = IndexedFastaFile(str(p))
    assert fa.extract("c1", 0, 12) == "ACGTACGTACGT"
    assert fa.extract("c1", 6, 10) == "GTAC"


def test_dispatch_and_broadcast_dict(tmp_path):
    seqs = {"c": "ACGTTGCA"}
    p = str(tmp_path / "x.2bit")
    write_2bit(seqs, p)
    rf = load_reference_file(p)
    assert rf.to_dict() == seqs


def test_md_tagging_with_2bit(spark, tmp_path):
    """The reference-file readers plug into MD tagging."""
    from adam_spark.operators.md_tagging import compute_mismatching_positions

    genome = {"chr1": "AAAACCCCGGGGTTTT"}
    p = str(tmp_path / "g.2bit")
    write_2bit(genome, p)
    tb = load_reference_file(p)
    df = spark.createDataFrame(
        [("chr1", 0, 8, "r1", "AAGACCCC", "8M", True)],
        "referenceName string, start long, end long, readName string, sequence string, cigar string, readMapped boolean",
    ).withColumn("mismatchingPositions", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(None).cast("string"))
    out = compute_mismatching_positions(df, tb.to_dict())
    assert out.collect()[0]["mismatchingPositions"] == "2A5"


def test_2bit_mask_blocks(tmp_path):
    """TwoBitFileSuite 'correctly return masked sequences': lowercase
    input runs round-trip as mask blocks; default extract stays
    uppercase, masked=True restores the soft-masked case, N blocks
    win over masking."""
    from adam_spark.sources.reference_file import TwoBitFile, write_2bit

    p = str(tmp_path / "m.2bit")
    write_2bit({"chrM": "ACGTacgtNNNNacGT"}, p)
    tb = TwoBitFile(p)
    assert tb.extract("chrM", 0, 16) == "ACGTACGTNNNNACGT"
    assert tb.extract("chrM", 0, 16, masked=True) == "ACGTacgtNNNNacGT"
    assert tb.extract("chrM", 2, 7, masked=True) == "GTacg"
