"""Indel realignment tests (reference: RealignIndelsSuite,
IndelRealignmentTargetSuite — artificial reads around a known indel
get realigned onto the consensus)."""

import pytest

from adam_spark.operators import realignment as ra

REF = "AAAAACCCCCGGGGGTTTTTACGTACGTACGTAAAACCCCGGGG"  # 44 bp reference


def _read(name, start, seq, cigar, md, mapq=40):
    return dict(
        referenceName="chr1",
        start=start,
        end=start + ra.cigar_reference_length(cigar),
        readName=name,
        sequence=seq,
        qualityScores="I" * len(seq),
        cigar=cigar,
        readMapped=True,
        mismatchingPositions=md,
        mappingQuality=mapq,
        duplicateRead=False,
        primaryAlignment=True,
    )


SCHEMA = (
    "referenceName string, start long, end long, readName string, sequence string, "
    "qualityScores string, cigar string, readMapped boolean, mismatchingPositions string, "
    "mappingQuality int, duplicateRead boolean, primaryAlignment boolean"
)


def _df(spark, rows):
    return spark.createDataFrame([tuple(r.values()) for r in rows], SCHEMA)


def test_read_evidence_extraction(spark):
    """IndelRealignmentTarget.apply semantics (reference
    IndelRealignmentTarget.scala:84-120): exactly-one-indel reads seed
    a target; mismatch-only and multi-indel reads contribute NOTHING
    (their empty targets are filtered before merging)."""
    # single deletion: target read range = the read span
    t = ra.find_realignment_targets(
        _df(spark, [_read("a", 100, "ACGTACGT", "4M2D4M", "4^CC4")])
    ).collect()
    assert [(r["start"], r["end"]) for r in t] == [(100, 110)]
    # single insertion
    t = ra.find_realignment_targets(
        _df(spark, [_read("b", 100, "ACGTACGT", "4M2I2M", "6")])
    ).collect()
    assert [(r["start"], r["end"]) for r in t] == [(100, 106)]
    # mismatch-only: no target
    assert ra.find_realignment_targets(
        _df(spark, [_read("c", 100, "ACGTACGT", "8M", "3G4")])
    ).count() == 0
    # two indels: no target
    assert ra.find_realignment_targets(
        _df(spark, [_read("d", 100, "ACGTACGT", "2M2D4M2D2M", "2^CC4^GG2")])
    ).count() == 0


def test_find_targets_merging(spark):
    rows = [
        _read("a", 10, "ACGTACGT", "4M2D4M", "4^CC4"),
        _read("b", 12, "ACGTACGT", "2M2D6M", "2^CC6"),  # same deletion
        _read("c", 30, "ACGTACGT", "8M", "8"),  # clean
    ]
    t = ra.find_realignment_targets(_df(spark, rows)).collect()
    assert len(t) == 1
    # the merged target spans the HULL of the contributing READ ranges
    # (RealignmentTargetFinder merge semantics; the clean read adds
    # nothing)
    assert t[0]["referenceName"] == "chr1" and t[0]["start"] == 10 and t[0]["end"] == 22


def test_local_reference_and_consensus():
    rows = [
        _read("a", 0, "AAAAACCCCC", "10M", "10"),
        _read("b", 10, "GGGGGTTTTT", "10M", "10"),
    ]
    ref = ra._local_reference(rows, 0, 20)
    assert ref == "AAAAACCCCCGGGGGTTTTT"
    cons = ra._consensus_candidates([_read("c", 2, "AAACC", "3M2D2M", "3^CC2")], 0, 10)
    assert cons == [(5, "D", 2, "")]


def test_sweep():
    import numpy as np

    seq = b"ACGT"
    quals = np.array([30, 30, 30, 30])
    score, off = ra._sweep(seq, quals, b"TTACGTTT", 999)
    assert score == 0 and off == 2
    # no better placement than original score 0 → -1
    score, off = ra._sweep(seq, quals, b"GGGGGGGG", 0)
    assert off == -1 and score == 0


def test_realign_shifts_mismatched_reads(spark):
    """Reads carrying a 2-bp deletion + reads aligned WITHOUT the
    deletion (showing mismatches) get pulled onto the consensus."""
    # true sample: REF with positions 20..22 deleted ("AC" removed at 20)
    # covering reads over REF[10:30]:
    donor = REF[:20] + REF[22:]
    rows = []
    # 3 reads that were aligned WITH the deletion in their cigar (all
    # genuinely straddle the deletion point at reference coord 20)
    for i, st in enumerate((12, 13, 14)):
        seq = donor[st : st + 10]
        before = 20 - st
        cig = f"{before}M2D{10 - before}M"
        md = f"{before}^{REF[20:22]}{10 - before}"
        rows.append(_read(f"del{i}", st, seq, cig, md))
    # 2 reads aligned naively as 10M (no deletion) — they show mismatches;
    # their true placements fit inside the read-derived local reference
    for i, st in enumerate((11, 13)):
        seq = donor[st : st + 10]
        ref_slice = REF[st : st + 10]
        from adam_spark.functions.cigar import md_from_reference

        md, nmm = md_from_reference("10M", seq, ref_slice)
        assert nmm > 0
        rows.append(_read(f"mis{i}", st, seq, "10M", md))
    df = _df(spark, rows)
    out = ra.realign_indels(df, lod_threshold=0.5)
    got = {r["readName"]: r for r in out.collect()}
    assert len(got) == 5
    # the naive reads must now carry the deletion and higher mapq
    for nm in ("mis0", "mis1"):
        assert "2D" in got[nm]["cigar"], got[nm]["cigar"]
        assert got[nm]["mappingQuality"] == 50
        # MD recomputed against the original reference: deletion bases AC
        assert "^AC" in got[nm]["mismatchingPositions"]
    # deletion-carrying reads keep the deletion in their alignment
    for nm in ("del0", "del1", "del2"):
        assert "2D" in got[nm]["cigar"]


def test_realign_leaves_clean_reads_alone(spark):
    rows = [
        _read("a", 0, REF[0:10], "10M", "10"),
        _read("b", 5, REF[5:15], "10M", "10"),
        _read("c", 10, REF[10:20], "10M", "10"),
    ]
    out = ra.realign_indels(_df(spark, rows))
    got = {r["readName"]: r for r in out.collect()}
    assert len(got) == 3
    assert all(got[n]["cigar"] == "10M" and got[n]["mappingQuality"] == 40 for n in got)


def test_smith_waterman_reference_suite_cases():
    """Mirrors SmithWatermanSuite.scala's end-to-end expectations."""
    assert ra.smith_waterman("AAAA", "AAAA", 1.0, 0.0, -1.0, -1.0)[0] == "4M"
    assert ra.smith_waterman("ACATGA", "ACGA", 1.0, 0.0, -0.333, -0.333)[0] == "2M2I2M"
    assert (
        ra.smith_waterman(
            "ATTAGACTACTTAATATACAGATTTACCCCAATAGA",
            "ATTAGACTACTTAATATACAGAATTACCCCAATAGA",
            1.0, 0.0, -0.333, -0.333,
        )[0]
        == "36M"
    )
    assert (
        ra.smith_waterman(
            "ATTAGACTACTTAATATACAGATTTACCCCAATAGA",
            "ATTAGACTACTTAATATACAGATACCCCAATAGA",
            1.0, 0.0, -0.333, -0.333,
        )[0]
        == "22M2I12M"
    )


def test_known_indels_table():
    rows = [
        dict(referenceName="chr1", start=19, referenceAllele="ACG", alternateAllele="A"),
        dict(referenceName="chr1", start=30, referenceAllele="A", alternateAllele="ATT"),
        dict(referenceName="chr1", start=40, referenceAllele="C", alternateAllele="G"),  # SNP: skipped
    ]
    t = ra.known_indels_table(rows)
    assert t == {"chr1": [(20, "D", 2, ""), (31, "I", 2, "TT")]}


def _naive_deletion_reads(read_len=10, starts=(11, 13, 14, 16)):
    """Reads from a donor carrying a 2-bp deletion at REF[20:22], ALL
    aligned naively as pure-M (no read shows the deletion in its cigar,
    so the from-reads generator has no indel evidence)."""
    from adam_spark.functions.cigar import md_from_reference

    donor = REF[:20] + REF[22:]
    rows = []
    for i, st in enumerate(starts):
        seq = donor[st : st + read_len]
        md, nmm = md_from_reference(f"{read_len}M", seq, REF[st : st + read_len])
        assert nmm > 0, "fixture read must show mismatches when aligned naively"
        rows.append(_read(f"n{i}", st, seq, f"{read_len}M", md))
    return rows


def test_knowns_consensus_rescues_unobserved_indel(spark):
    """RealignIndelsSuite 'using knowns' scenario: no read carries the
    indel in its CIGAR, so the reads model finds nothing — the known
    variant supplies the consensus."""
    rows = _naive_deletion_reads()
    df = _df(spark, rows)

    # reads model: stuck — no indel evidence, nothing to realign onto
    base = {r["readName"]: r for r in ra.realign_indels(df, lod_threshold=0.5).collect()}
    assert all("D" not in base[n]["cigar"] for n in base)

    knowns = spark.createDataFrame(
        [("chr1", 19, REF[19:22], REF[19])],
        "referenceName string, start long, referenceAllele string, alternateAllele string",
    )
    out = ra.realign_indels(df, lod_threshold=0.5, known_indels=knowns)
    got = {r["readName"]: r for r in out.collect()}
    assert len(got) == len(rows)
    rescued = [n for n in got if "2D" in got[n]["cigar"]]
    assert len(rescued) >= 2, {n: got[n]["cigar"] for n in got}
    for n in rescued:
        assert got[n]["mappingQuality"] == 50
        assert "^AC" in got[n]["mismatchingPositions"]


def test_sw_consensus_rescues_unobserved_indel(spark):
    """ConsensusGeneratorFromSmithWaterman: local SW realignment
    consolidates the mismatch runs into a deletion block no read's
    original CIGAR contained."""
    rows = _naive_deletion_reads(read_len=12, starts=(10, 12, 14, 15))
    df = _df(spark, rows)
    # reference target semantics: a mismatch-only pile produces NO
    # targets, so the default run is a no-op — the SW generator only
    # reprocesses reads within a target group. Supply the region as an
    # explicit target (the targetsToAdd mechanism) to isolate SW.
    base = {r["readName"]: r for r in ra.realign_indels(df, lod_threshold=0.5).collect()}
    assert all("D" not in base[n]["cigar"] for n in base)

    targets = spark.createDataFrame(
        [("chr1", 10, 27)], "referenceName string, start long, end long"
    )
    out = ra.realign_indels(
        df, lod_threshold=0.5, consensus_model="sw", targets=targets
    )
    got = {r["readName"]: r for r in out.collect()}
    assert len(got) == len(rows)
    rescued = [n for n in got if "2D" in got[n]["cigar"]]
    assert len(rescued) >= 2, {n: got[n]["cigar"] for n in got}


def test_unmapped_reads_pass_through(spark):
    """Unmapped / coordinate-less reads must survive realign_indels
    unchanged (bin-explode on null coordinates silently dropped them)."""
    from adam_spark.operators.realignment import realign_indels
    from adam_spark.schemas import ALIGNMENT, conform

    rows = [
        {"readName": "mapped", "readMapped": True, "referenceName": "c1",
         "start": 100, "end": 110, "cigar": "10M", "sequence": "ACGTACGTAC",
         "qualityScores": "IIIIIIIIII", "mismatchingPositions": "10"},
        {"readName": "unmapped", "readMapped": False, "sequence": "TTTT"},
        {"readName": "nullcoords", "readMapped": True, "referenceName": "c1",
         "sequence": "GGGG"},
    ]
    df = conform(spark.createDataFrame(rows), ALIGNMENT)
    out = {r["readName"] for r in realign_indels(df).collect()}
    assert out == {"mapped", "unmapped", "nullcoords"}


def test_new_cigar_read_starting_inside_insertion():
    """A read whose sweep offset lands strictly inside an insertion
    anchors at the insertion position, not offset - n."""
    from adam_spark.operators.realignment import _new_cigar

    start, cigar = _new_cigar(5, 11, (10, "I", 3, "TTT"), 1000)
    assert (start, cigar) == (1010, "2I3M")
    # read fully right of the insertion: shift by n
    start, cigar = _new_cigar(5, 13, (10, "I", 3, "TTT"), 1000)
    assert (start, cigar) == (1010, "5M")
    # read fully left: untouched
    start, cigar = _new_cigar(5, 2, (10, "I", 3, "TTT"), 1000)
    assert (start, cigar) == (1002, "5M")


def test_realigned_soft_clips_preserved():
    """Soft clips survive realignment (unclip_reads=False default): the
    clipped bases stay S and the aligned core is what moves."""
    from adam_spark.operators.realignment import realign_group

    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"  # 32bp local ref at 1000
    # evidence read carrying a deletion at local pos 10 (2bp)
    rows = []
    for i, name in enumerate(["e1", "e2"]):
        rows.append({
            "readName": name, "readMapped": True, "referenceName": "c1",
            "start": 1000 + i, "end": 1000 + i + 18,
            "cigar": "8M2D8M" if i == 0 else "7M2D9M",
            "sequence": (ref[i:8] + ref[10:18]) if i == 0 else (ref[1:8] + ref[10:19]),
            "qualityScores": "I" * 16,
            "mismatchingPositions": f"{8 - i}^{ref[8:10]}{8 + i}",
        })
    # a soft-clipped read whose core matches the deletion allele
    core = ref[4:8] + ref[10:16]
    rows.append({
        "readName": "clipped", "readMapped": True, "referenceName": "c1",
        "start": 1004, "end": 1004 + 10, "cigar": f"3S{len(core)}M",
        "sequence": "TTT" + core, "qualityScores": "I" * (3 + len(core)),
        "mismatchingPositions": None,
    })
    out = {r["readName"]: r for r in realign_group(rows, 0.0, 30)}
    c = out["clipped"]
    assert c["cigar"].startswith("3S"), c["cigar"]
    # exactly the leading clip survives; the core is M/D only
    assert "S" not in c["cigar"][2:], c["cigar"]
    assert len(c["sequence"]) == 13  # sequence itself is untouched


def test_apply_consensus_reference_suite_cases():
    """ConsensusSuite.scala:25-52 vectors mapped onto _apply_consensus
    (pos is target-relative; the reference passes absolute regions —
    consensus at 10 inside a target starting at 5 → local pos 5+1 for
    the post-anchor insertion, local span 5..10 for the deletion)."""
    # insertion of TCGA after absolute position 10 in a target 5..16
    # ("AAAAAAAAAA" → "AAAAAATCGAAAAA")
    assert ra._apply_consensus("AAAAAAAAAA", (6, "I", 4, "TCGA")) == "AAAAAATCGAAAAA"
    # deletion of the 10..16 span from target 5..16 ("AAAAATTTTT" → "AAAAA")
    assert ra._apply_consensus("AAAAATTTTT", (5, "D", 5, "")) == "AAAAA"
    # empty consensus (zero-length op) returns the reference
    assert ra._apply_consensus("AAAAAAAAAAAAA", (0, "D", 0, "")) == "AAAAAAAAAAAAA"
    assert ra._apply_consensus("AAAAAAAAAAAAA", (0, "I", 0, "")) == "AAAAAAAAAAAAA"


def test_union_consensus_model(spark):
    """ConsensusGenerator.union (UnionConsensusGenerator.scala:38-56):
    candidates from BOTH the known-indel table and the observed reads,
    deduplicated — a read set whose indel evidence misses the known
    event still realigns against it, and vice versa."""
    from adam_spark.operators.realignment import _known_consensus, realign_group

    # reads: 10 clean 10M reads over [0,20) reconstructing the reference,
    # plus two reads carrying a 2bp deletion observed in the reads
    rows = []
    for i in range(8):
        st = i
        rows.append(
            {
                "readName": f"c{i}", "referenceName": "1", "start": st,
                "end": st + 10, "cigar": "10M", "sequence": "ACGTACGTAC",
                "qualityScores": "I" * 10, "mismatchingPositions": "10",
                "readMapped": True,
            }
        )
    known = {"1": [(5, "D", 2, "")]}
    obs_only = realign_group(list(rows), 5.0, 30, consensus_model="reads")
    union_out = realign_group(
        list(rows), 5.0, 30, consensus_model="union", known_table=known
    )
    # both paths return one row per input; union path must not crash and
    # must consider the known deletion candidate
    assert len(obs_only) == len(rows) and len(union_out) == len(rows)
    # the union candidate list contains the known event even though the
    # reads show no indel evidence
    cands = _known_consensus(known, "1", 0, 20, 10)
    assert cands == [(5, "D", 2, "")]
