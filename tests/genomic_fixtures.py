"""Deterministic synthetic genomic fixtures (FIXTURES.md).

Genome: chr1 (100_000), chr2 (50_000), chrM (16_000). Seeded RNG; every
table is generated once per test session and cached.
"""

from __future__ import annotations

import random

from adam_spark import schemas
from adam_spark.core.genomic_frame import GenomicFrame
from adam_spark.core.metadata import (
    GenomicMetadata,
    ReadGroup,
    Reference,
    Sample,
    SequenceDictionary,
)

CONTIGS = [("chr1", 100_000), ("chr2", 50_000), ("chrM", 16_000)]
_CIGAR_SHAPES = ["100M", "50M2I48M", "30S70M", "50M2D50M"]


def _aligned_len(cigar: str) -> int:
    """Reference-consumed length of a cigar (M/D/N/=/X consume)."""
    total, num = 0, ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            if ch in "MDN=X":
                total += int(num)
            num = ""
    return total


def make_sequence_dictionary() -> SequenceDictionary:
    return SequenceDictionary(
        [Reference(name=n, length=ln, index=i, md5=f"md5{i:02x}") for i, (n, ln) in enumerate(CONTIGS)]
    )


def make_metadata(kind: str) -> GenomicMetadata:
    return GenomicMetadata(
        references=make_sequence_dictionary(),
        read_groups=[
            ReadGroup(id="rg1", sampleId="sampleA", library="lib1", platform="ILLUMINA"),
            ReadGroup(id="rg2", sampleId="sampleB", library=None, platform="ILLUMINA"),
        ],
        samples=[Sample(id="sampleA"), Sample(id="sampleB")],
        kind=kind,
    )


def gen_alignments(n_pairs: int = 500, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for k in range(n_pairs):
        name = f"read{k}"
        rg = "rg1" if rng.random() < 0.6 else "rg2"
        sample = "sampleA" if rg == "rg1" else "sampleB"
        unmapped_pair = rng.random() < 0.05
        contig, clen = CONTIGS[rng.randrange(3)]
        # force shared 5' positions for duplicate-marking groups
        if k % 50 < 6:
            start0 = 1000 + (k % 50) // 2 * 500
            contig, clen = CONTIGS[0]
        else:
            start0 = rng.randrange(0, clen - 400)
        for rif in (0, 1):
            cigar = rng.choice(_CIGAR_SHAPES)
            alen = _aligned_len(cigar)
            seqlen = sum(
                int(x) for x in __import__("re").findall(r"(\d+)[MIS=X]", cigar)
            )
            seq = "".join(rng.choice("ACGT") for _ in range(seqlen))
            qual = "".join(chr(33 + rng.randrange(10, 41)) for _ in range(seqlen))
            start = start0 + rif * 150
            mapped = not unmapped_pair
            neg = rif == 1
            rows.append(
                {
                    "referenceName": contig if mapped else None,
                    "start": start if mapped else None,
                    "end": (start + alen) if mapped else None,
                    "mappingQuality": rng.randrange(0, 61) if mapped else None,
                    "readName": name,
                    "sequence": seq,
                    "qualityScores": qual,
                    "cigar": cigar if mapped else None,
                    "readPaired": True,
                    "properPair": mapped,
                    "readMapped": mapped,
                    "mateMapped": mapped,
                    "failedVendorQualityChecks": rng.random() < 0.02,
                    "duplicateRead": False,
                    "readNegativeStrand": neg,
                    "mateNegativeStrand": not neg,
                    "primaryAlignment": mapped,
                    "secondaryAlignment": False,
                    "supplementaryAlignment": False,
                    "mismatchingPositions": str(alen) if mapped else None,
                    "readGroupId": rg,
                    "readGroupSampleId": sample,
                    "mateAlignmentStart": (start0 + (1 - rif) * 150) if mapped else None,
                    "mateReferenceName": contig if mapped else None,
                    "insertSize": 150 if mapped else None,
                    "readInFragment": rif,
                    "attributes": {"XS": "i:25"} if rng.random() < 0.3 else {},
                }
            )
    return rows


def gen_features(n: int = 200, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    fid = 0
    while len(rows) < n:
        contig, clen = CONTIGS[rng.randrange(3)]
        gstart = rng.randrange(0, clen - 5000)
        glen = rng.randrange(1000, 5000)
        gene = f"gene{fid}"
        rows.append(
            {
                "featureId": f"f{fid}",
                "featureType": "gene",
                "referenceName": contig,
                "start": gstart,
                "end": gstart + glen,
                "strand": rng.choice(["FORWARD", "REVERSE"]),
                "score": round(rng.random() * 1000, 2),
                "geneId": gene,
                "parentIds": [],
                "attributes": {},
            }
        )
        fid += 1
        t_start, t_len = gstart + 100, glen - 200
        rows.append(
            {
                "featureId": f"f{fid}",
                "featureType": "transcript",
                "referenceName": contig,
                "start": t_start,
                "end": t_start + t_len,
                "strand": rows[-1]["strand"],
                "score": None,
                "geneId": gene,
                "transcriptId": f"tx{fid}",
                "parentIds": [gene],
                "attributes": {},
            }
        )
        fid += 1
        for e in range(rng.randrange(1, 4)):
            if len(rows) >= n:
                break
            estart = t_start + e * (t_len // 3)
            rows.append(
                {
                    "featureId": f"f{fid}",
                    "featureType": "exon",
                    "referenceName": contig,
                    "start": estart,
                    "end": estart + max(50, t_len // 4),
                    "strand": rows[-1]["strand"],
                    "score": None,
                    "geneId": gene,
                    "transcriptId": f"tx{fid - 1 - e}",
                    "exonId": f"ex{fid}",
                    "parentIds": [f"tx{fid - 1 - e}"],
                    "attributes": {},
                }
            )
            fid += 1
    return rows[:n]


def gen_coverage(seed: int = 11) -> list[dict]:
    """Adjacent runs with equal counts — collapse/flatten targets."""
    rng = random.Random(seed)
    rows = []
    for sample in ["sampleA", "sampleB", None]:
        for contig, _clen in CONTIGS[:2]:
            pos = 100
            for _ in range(30):
                width = rng.randrange(1, 40)
                count = float(rng.randrange(1, 5))
                # sometimes emit per-base rows of an equal-count run
                if rng.random() < 0.5:
                    for p in range(pos, pos + min(width, 5)):
                        rows.append(
                            {
                                "referenceName": contig,
                                "start": p,
                                "end": p + 1,
                                "count": count,
                                "optSampleId": sample,
                            }
                        )
                    pos += min(width, 5)
                else:
                    rows.append(
                        {
                            "referenceName": contig,
                            "start": pos,
                            "end": pos + width,
                            "count": count,
                            "optSampleId": sample,
                        }
                    )
                    pos += width
                if rng.random() < 0.3:
                    pos += rng.randrange(1, 20)  # gap → collapse must not merge
    return rows


class GenomicFixtures:
    def __init__(self, spark):
        self.spark = spark
        self._cache = {}

    def _frame(self, key, gen, schema, kind) -> GenomicFrame:
        if key not in self._cache:
            df = self.spark.createDataFrame(gen(), schema=schema).cache()
            df.count()
            self._cache[key] = GenomicFrame(df, make_metadata(kind))
        return self._cache[key]

    def alignments(self) -> GenomicFrame:
        return self._frame("alignments", gen_alignments, schemas.ALIGNMENT, "alignment")

    def features(self) -> GenomicFrame:
        return self._frame("features", gen_features, schemas.FEATURE, "feature")

    def coverage(self) -> GenomicFrame:
        return self._frame("coverage", gen_coverage, schemas.COVERAGE, "coverage")
