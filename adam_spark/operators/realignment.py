"""Local indel realignment.

Mirrors the reference's RealignIndels pipeline
(ds/read/realignment/RealignIndels.scala:35-745,
RealignmentTargetFinder.scala:27-126, algorithms/consensus/*):

1. **Target finding** — candidate regions from per-read evidence
   (indel reference spans from the CIGAR, mismatch positions from the
   MD tag), merged when overlapping, dropped when longer than
   ``max_target_size``. Evidence extraction is one Arrow-batched UDF
   per read; interval merging is the relational run-length pattern
   (window cummax over per-contig start order).
2. **Read→target mapping** — broadcast overlap join; a read overlapping
   several targets goes to the LEFTMOST (the reference's
   TargetOrdering choice, RealignIndels.scala:79-125).
3. **Per-target realignment** — ``groupBy(target).applyInPandas``:
   reconstruct the local reference from the reads' MD tags
   (getReferenceFromReads), generate consensus sequences from observed
   indels (ConsensusGeneratorFromReads), cap at
   ``max_consensus_number`` by observation frequency, sweep every read
   over every consensus for its minimum quality-weighted mismatch sum
   (sweepReadOverReferenceForQuality:617-651 — numpy sliding-window
   vectorized here), pick the best consensus, and only if the LOD
   improvement ``(before-after)/10`` exceeds ``lod_threshold`` rewrite
   start/end/CIGAR/MD and bump mappingQuality by 10
   (realignTargetGroup:278-440).

Skew note (RealignIndels.scala:126-180): groups are keyed by target id;
empty-target reads bypass the shuffle entirely (union after), which is
the dominant volume — matching the reference's no-op spreading intent.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from adam_spark.functions.cigar import (
    aligned_pairs,
    cigar_reference_length,
    md_from_reference,
    parse_cigar,
    reference_from_read,
    walk_md,
)

PHRED_OFFSET = 33


# --------------------------------------------------------------------------
# 1. target finding
# --------------------------------------------------------------------------

_EVIDENCE_SCHEMA = StructType(
    [
        StructField("tstarts", ArrayType(LongType()), True),
        StructField("tends", ArrayType(LongType()), True),
    ]
)


def _read_evidence(cigar: str, md: str, start: int, max_indel_size: int):
    """Candidate target intervals from one read (IndelRealignmentTarget
    semantics: the indel's reference span; mismatch point targets)."""
    starts, ends = [], []
    ref_pos = start
    for n, op in parse_cigar(cigar):
        if op == "I":
            starts.append(ref_pos)
            ends.append(ref_pos + 1)
        elif op == "D":
            if n <= max_indel_size:
                starts.append(ref_pos)
                ends.append(ref_pos + n)
            ref_pos += n
        elif op in "M=X":
            ref_pos += n
        elif op == "N":
            ref_pos += n
    if md:
        pairs = aligned_pairs(cigar, start)
        for aligned_idx in walk_md(md).mismatch_aligned:
            if aligned_idx < len(pairs):
                p = pairs[aligned_idx].ref_pos
                starts.append(p)
                ends.append(p + 1)
    return starts, ends


def find_realignment_targets(
    reads: DataFrame,
    max_indel_size: int = 500,
    max_target_size: int = 3000,
) -> DataFrame:
    """(referenceName, start, end) merged target regions."""

    @F.pandas_udf(_EVIDENCE_SCHEMA)
    def _ev(cigar: pd.Series, md: pd.Series, start: pd.Series) -> pd.DataFrame:
        rows = [
            _read_evidence(c, m if isinstance(m, str) else None, int(s), max_indel_size)
            if isinstance(c, str)
            else ([], [])
            for c, m, s in zip(cigar, md, start)
        ]
        return pd.DataFrame(rows, columns=["tstarts", "tends"])

    ev = (
        reads.where(F.col("readMapped") & F.col("cigar").isNotNull())
        .select(
            "referenceName",
            _ev(F.col("cigar"), F.col("mismatchingPositions"), F.col("start")).alias("e"),
        )
        .select(
            "referenceName",
            F.explode(F.arrays_zip(F.col("e.tstarts").alias("s"), F.col("e.tends").alias("t"))).alias("z"),
        )
        .select(
            "referenceName",
            F.col("z.s").alias("start"),
            F.col("z.t").alias("end"),
        )
        .distinct()
    )
    # merge overlapping intervals: run-length grouping per contig
    w = Window.partitionBy("referenceName").orderBy("start", "end")
    merged = (
        ev.withColumn(
            "maxend",
            F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "newgrp",
            F.when(F.col("maxend").isNull() | (F.col("start") > F.col("maxend")), 1).otherwise(0),
        )
        .withColumn("grp", F.sum("newgrp").over(w))
        .groupBy("referenceName", "grp")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .where((F.col("end") - F.col("start")) <= max_target_size)
        .select("referenceName", "start", "end")
    )
    return merged


# --------------------------------------------------------------------------
# 3. per-target realignment kernel (pure python/numpy, runs in applyInPandas)
# --------------------------------------------------------------------------


def _local_reference(rows: list[dict], ref_start: int, ref_end: int) -> str:
    """Reconstruct the reference over [ref_start, ref_end) from the
    reads' MD tags (getReferenceFromReads semantics)."""
    buf = np.full(ref_end - ref_start, ord("N"), dtype=np.uint8)
    for r in rows:
        md = r.get("mismatchingPositions")
        if not md:
            continue
        try:
            ref = reference_from_read(r["cigar"], md, r["sequence"])
        except Exception:
            continue
        off = int(r["start"]) - ref_start
        seg = np.frombuffer(ref.encode(), dtype=np.uint8)
        lo = max(0, off)
        hi = min(len(buf), off + len(seg))
        if hi > lo:
            buf[lo:hi] = seg[lo - off : hi - off]
    return buf.tobytes().decode()


def _consensus_candidates(rows: list[dict], ref_start: int, max_n: int):
    """Observed-indel consensus set: (pos_in_ref, op, length, bases),
    capped by frequency (ConsensusGeneratorFromReads + cap logic)."""
    seen: Counter = Counter()
    for r in rows:
        cig = parse_cigar(r["cigar"])
        indels = [(i, n, op) for i, (n, op) in enumerate(cig) if op in "ID"]
        if len(indels) != 1:
            continue
        idx, n, op = indels[0]
        ref_off = int(r["start"]) - ref_start
        read_off = 0
        for j, (m, o) in enumerate(cig):
            if j == idx:
                break
            if o in "M=X":
                ref_off += m
                read_off += m
            elif o in "IS":
                read_off += m
            elif o in "DN":
                ref_off += m
        if op == "I":
            bases = r["sequence"][read_off : read_off + n]
            seen[(ref_off, "I", n, bases)] += 1
        else:
            seen[(ref_off, "D", n, "")] += 1
    return [c for c, _ in seen.most_common(max_n)]


def _apply_consensus(ref: str, cons) -> str:
    pos, op, n, bases = cons
    if pos < 0 or pos > len(ref):
        return ref
    if op == "I":
        return ref[:pos] + bases + ref[pos:]
    return ref[:pos] + ref[pos + n :]


def _sweep(seq: bytes, quals: np.ndarray, consensus: bytes, original: int):
    """Min quality-weighted mismatch sum over all offsets
    (sweepReadOverReferenceForQuality): returns (score, offset) with
    offset −1 when no placement beats the original score."""
    L, C = len(seq), len(consensus)
    if C < L:
        return original, -1
    cons = np.frombuffer(consensus, dtype=np.uint8)
    read = np.frombuffer(seq, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(cons, L)
    mism = windows != read
    scores = (mism * quals).sum(axis=1)
    best = int(scores.argmin())
    if scores[best] <= original:
        return int(scores[best]), best
    return original, -1


def _mismatch_quality(r: dict, ref: str, ref_start: int) -> int:
    """Quality-weighted mismatches of the read at its current alignment
    (sumMismatchQuality over aligned bases)."""
    total = 0
    seq = r["sequence"]
    quals = r.get("qualityScores") or ""
    for ab in aligned_pairs(r["cigar"], int(r["start"])):
        p = ab.ref_pos - ref_start
        if 0 <= p < len(ref) and seq[ab.read_idx].upper() != ref[p].upper():
            total += (ord(quals[ab.read_idx]) - PHRED_OFFSET) if ab.read_idx < len(quals) else 30
    return total


def _new_cigar(read_len: int, offset: int, cons, ref_start: int):
    """Start + CIGAR for a read placed at ``offset`` in the consensus
    (cigarAndCoordinates semantics, simplified to untrimmed reads)."""
    pos, op, n, _ = cons
    if op == "I":
        ins_start, ins_end = pos, pos + n
        read_start_c, read_end_c = offset, offset + read_len
        if read_start_c >= ins_end:
            return ref_start + offset - n, f"{read_len}M"
        if read_end_c <= ins_start:
            return ref_start + offset, f"{read_len}M"
        before = max(0, ins_start - read_start_c)
        inside = min(read_end_c, ins_end) - max(read_start_c, ins_start)
        after = read_len - before - inside
        parts = []
        if before:
            parts.append(f"{before}M")
        if inside:
            parts.append(f"{inside}I")
        if after:
            parts.append(f"{after}M")
        start = ref_start + offset if read_start_c < ins_start else ref_start + offset - n
        return start, "".join(parts)
    else:  # deletion
        del_pos = pos
        read_start_c, read_end_c = offset, offset + read_len
        if read_end_c <= del_pos or read_start_c >= del_pos:
            # read does not span the deletion point in consensus coords:
            # plain match, shifted when right of the deletion
            start = ref_start + offset + (n if read_start_c >= del_pos else 0)
            return start, f"{read_len}M"
        before = del_pos - read_start_c
        after = read_len - before
        return ref_start + offset, f"{before}M{n}D{after}M"


def realign_group(
    rows: list[dict],
    lod_threshold: float,
    max_consensus_number: int,
    unclip_reads: bool = False,
) -> list[dict]:
    """Realign one target group; returns the (possibly rewritten) rows."""
    mapped = [r for r in rows if r.get("readMapped") and r.get("cigar") and r.get("sequence")]
    if len(mapped) < 2:
        return rows
    ref_start = min(int(r["start"]) for r in mapped)
    ref_end = max(int(r["end"]) for r in mapped)
    if ref_end - ref_start > 100_000:
        return rows
    ref = _local_reference(mapped, ref_start, ref_end)
    consensus = _consensus_candidates(mapped, ref_start, max_consensus_number)
    if not consensus:
        return rows

    before = [_mismatch_quality(r, ref, ref_start) for r in mapped]
    total_before = sum(before)

    quals_arr = [
        np.array(
            [ord(c) - PHRED_OFFSET for c in (r.get("qualityScores") or "")], dtype=np.int64
        )
        if r.get("qualityScores")
        else np.full(len(r["sequence"]), 30, dtype=np.int64)
        for r in mapped
    ]
    seqs = [r["sequence"].upper().encode() for r in mapped]

    best = None  # (total, cons, offsets)
    for cons in consensus:
        cseq = _apply_consensus(ref, cons).upper().encode()
        total = 0
        offsets = []
        for i, r in enumerate(mapped):
            score, off = _sweep(seqs[i], quals_arr[i], cseq, before[i])
            total += score
            offsets.append(off)
        if best is None or total < best[0]:
            best = (total, cons, offsets)

    total_after, cons, offsets = best
    lod = (total_before - total_after) / 10.0
    if lod <= lod_threshold:
        return rows

    out = []
    for i, r in enumerate(mapped):
        off = offsets[i]
        if off == -1:
            out.append(r)
            continue
        new_start, new_cigar = _new_cigar(len(r["sequence"]), off, cons, ref_start)
        new_end = new_start + cigar_reference_length(new_cigar)
        if new_end <= new_start:
            out.append(r)
            continue
        r2 = dict(r)
        r2["start"] = new_start
        r2["end"] = new_end
        r2["cigar"] = new_cigar
        r2["mappingQuality"] = (r.get("mappingQuality") or 0) + 10
        # recompute MD against the ORIGINAL reference at the new position
        ref_off = new_start - ref_start
        ref_len = cigar_reference_length(new_cigar)
        if 0 <= ref_off and ref_off + ref_len <= len(ref):
            md, _ = md_from_reference(new_cigar, r["sequence"], ref[ref_off : ref_off + ref_len])
            r2["mismatchingPositions"] = md
        out.append(r2)
    mapped_ids = {id(r) for r in mapped}
    out.extend(r for r in rows if id(r) not in mapped_ids)
    return out


# --------------------------------------------------------------------------
# 2. + orchestration
# --------------------------------------------------------------------------


def realign_indels(
    reads: DataFrame,
    targets: DataFrame | None = None,
    lod_threshold: float = 5.0,
    max_consensus_number: int = 30,
    max_indel_size: int = 500,
    max_target_size: int = 3000,
    max_reads_per_target: int = 20_000,
) -> DataFrame:
    """AlignmentDataset.realignIndels as a DataFrame operator."""
    if targets is None:
        targets = find_realignment_targets(reads, max_indel_size, max_target_size)
    t = targets.select(
        F.col("referenceName").alias("__t_ref"),
        F.col("start").alias("__t_start"),
        F.col("end").alias("__t_end"),
    ).withColumn(
        "__t_id",
        F.concat_ws(":", F.col("__t_ref"), F.col("__t_start"), F.col("__t_end")),
    )
    # Bin both sides so the read→target mapping compiles to a
    # BroadcastHashJoin on (referenceName, bin) instead of a broadcast
    # nested loop — the DataFrame analogue of the reference's broadcast
    # binary search (RealignIndels.scala:79-180): per read, probe only
    # the targets in its bins, not the whole target list. Reads
    # straddling a bin boundary appear once per bin; the leftmost-
    # target row_number below collapses them back to one row.
    from adam_spark.operators.region_join import _bins

    bin_size = max(max_target_size, 1)
    reads_keyed = reads.withColumn(
        "__row_id", F.monotonically_increasing_id()
    ).withColumn(
        "__bin", F.explode(_bins(F.col("start"), F.col("end"), bin_size))
    )
    t_binned = t.withColumn(
        "__bin", F.explode(_bins(F.col("__t_start"), F.col("__t_end"), bin_size))
    )
    joined = reads_keyed.join(
        F.broadcast(t_binned),
        (F.col("referenceName") == F.col("__t_ref"))
        & (reads_keyed["__bin"] == t_binned["__bin"])
        & (F.col("start") < F.col("__t_end"))
        & (F.col("__t_start") < F.col("end")),
        "left",
    ).drop("__bin")
    # leftmost target per read (TargetOrdering); also collapses the
    # per-bin duplicates of both matched pairs and unmatched reads
    order_w = Window.partitionBy("__row_id").orderBy(
        F.col("__t_start").asc_nulls_last()
    )
    joined = (
        joined.withColumn("__rn", F.row_number().over(order_w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    with_target = joined.where(F.col("__t_id").isNotNull()).drop(
        "__t_ref", "__t_start", "__t_end", "__row_id"
    )
    without_target = joined.where(F.col("__t_id").isNull()).drop(
        "__t_ref", "__t_start", "__t_end", "__t_id", "__row_id"
    )

    out_schema = reads.schema

    def _realign(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["__t_id"])
        rows = pdf.to_dict("records")
        rows = [
            {k: (None if (not isinstance(v, (str, list, dict, bytes)) and pd.isna(v)) else v) for k, v in r.items()}
            for r in rows
        ]
        if len(rows) > max_reads_per_target:
            result = rows
        else:
            result = realign_group(rows, lod_threshold, max_consensus_number)
        return pd.DataFrame(result, columns=[f.name for f in out_schema.fields], dtype=object).where(
            lambda d: pd.notna(d), None
        )

    realigned = with_target.groupBy("__t_id").applyInPandas(_realign, schema=out_schema)
    return realigned.unionByName(without_target.select([f.name for f in out_schema.fields]))
