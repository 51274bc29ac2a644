"""Shard merging: concatenate a sharded text/SAM/VCF output directory
into one file.

Mirrors util/FileMerger.scala:35-238 + the MergeShards CLI
(adam-cli/MergeShards.scala): driver-side filesystem concat of
``part-*`` shards in lexicographic order, with an optional header file
prepended — the post-step after a sharded ``save_*`` when a single
interchange file is required. Buffered copy, never loads a shard fully
into memory.
"""

from __future__ import annotations

import glob
import os
import shutil


def local_lines_df(spark, rows: list, schema: str):
    """One-PARTITION DataFrame from a small driver-side row list (the
    header-lines branch of the single-file savers).

    ``spark.createDataFrame`` slices local data into defaultParallelism
    partitions; reading those slices through a downstream
    ``coalesce(1)`` costs ~100 ms PER SLICE inside the collapsed task
    (measured round 11: a 46-row header DataFrame added ~4 s of fixed
    cost to EVERY single-file VCF/SAM/GFF3 save on local[32]). One
    explicit slice keeps the header a single cheap parent partition."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def write_text_single_file(body_df, path: str, header_lines: list[str] | None = None) -> dict:
    """Single-file text save, the reference ``-single`` shape
    (util/FileMerger.scala:35): the body renders and writes
    DISTRIBUTED — one text shard per partition, no shuffle, partition
    order preserved — and the driver streams the shards (header first)
    into ``<path>/part-00000``. Replaces the former
    ``coalesce(1)`` single-task render+write: at 100 TB the
    render/convert work stays on the executors and only the final
    sequential concat is driver I/O, exactly like the reference's
    FileMerger. Byte-identical to the coalesce shape: concatenating
    part files in name order IS the coalesced partition order.

    ``body_df`` must have a ``value`` string column; ``header_lines``
    (no trailing newlines) prepend before the first shard."""
    import tempfile

    shard_dir = path + ".__shards"
    body_df.select("value").write.mode("overwrite").text(shard_dir)
    hdr_path = None
    if header_lines:
        fd = tempfile.NamedTemporaryFile(
            "w", dir=os.path.dirname(os.path.abspath(path)) or ".",
            suffix=".hdr", delete=False,
        )
        fd.write("".join(h + "\n" for h in header_lines))
        fd.close()
        hdr_path = fd.name
    try:
        os.makedirs(path, exist_ok=True)
        # overwrite semantics must cover STALE shards: the merged output
        # is only part-00000, but a previous multi-shard save at this
        # path may have left part-00001+ which directory-globbing
        # readers would pick up as duplicate rows
        for stale in glob.glob(os.path.join(path, "part-*")) + glob.glob(
            os.path.join(path, "_SUCCESS")
        ):
            os.remove(stale)
        out_part = os.path.join(path, "part-00000")
        try:
            n = merge_shards(shard_dir, out_part, header_path=hdr_path)
        except FileNotFoundError:
            # an empty frame writes no shards; the file is header-only
            n = 0
            with open(out_part, "wb") as out:
                if hdr_path:
                    with open(hdr_path, "rb") as hf:
                        shutil.copyfileobj(hf, out)
        open(os.path.join(path, "_SUCCESS"), "w").close()
        return {"shards": n}
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
        if hdr_path:
            os.remove(hdr_path)


def _merge_parallelism() -> int:
    """Copy threads for the final concat. The reference routes merges
    through ParallelFileMerger ONLY on HDFS (FileMerger.scala:86's
    ``isHdfs`` gate) because a local filesystem streams a sequential
    append faster than competing positioned writes (measured here:
    sequential 1.4 GB/s page-cached vs parallel thrashing) — while a
    distributed store parallelizes them. Local default is therefore
    SEQUENTIAL (0); deployments on parallel-capable storage opt in with
    ``ADAM_SPARK_MERGE_PARALLELISM=<threads>``."""
    try:
        return max(0, int(os.environ.get("ADAM_SPARK_MERGE_PARALLELISM", "0")))
    except ValueError:
        return 0


def concat_files_parallel(
    output_path: str,
    parts: list[str],
    header_blob: bytes = b"",
    eof_blob: bytes = b"",
    buffer_size: int = 4 * 1024 * 1024,
    parallel: bool | None = None,
) -> list[int]:
    """Concatenate ``parts`` (in list order) into ``output_path`` —
    the reference's FileMerger/ParallelFileMerger pair
    (util/FileMerger.scala:75, ParallelFileMerger.scala:34): part sizes
    are known up front, so each part's output offset is a prefix sum
    and the copies are independent positioned writes that CAN run in
    parallel. ``parallel=None`` (default) consults
    ``ADAM_SPARK_MERGE_PARALLELISM`` — sequential streaming unless the
    deployment opts in, mirroring the reference's isHdfs gate;
    ``parallel=False`` forces the sequential byte-copy (the
    ``-disable_fast_concat`` path). Returns each part's output byte
    offset (callers use them to prefix-shift index manifests)."""
    threads = _merge_parallelism() if parallel is None else (8 if parallel else 0)
    sizes = [os.path.getsize(p) for p in parts]
    offsets: list[int] = []
    pos = len(header_blob)
    for s in sizes:
        offsets.append(pos)
        pos += s
    total = pos + len(eof_blob)

    if threads > 1 and len(parts) > 1:
        with open(output_path, "wb") as f:
            f.truncate(total)
            if header_blob:
                f.write(header_blob)
            if eof_blob:
                f.seek(pos)
                f.write(eof_blob)

        def _copy(part: str, off: int) -> None:
            with open(output_path, "r+b") as out, open(part, "rb") as src:
                out.seek(off)
                shutil.copyfileobj(src, out, buffer_size)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(threads, len(parts))) as ex:
            # list() propagates the first copy error
            list(ex.map(_copy, parts, offsets))
    else:
        with open(output_path, "wb") as f:
            f.write(header_blob)
            for part in parts:
                with open(part, "rb") as src:
                    shutil.copyfileobj(src, f, buffer_size)
            f.write(eof_blob)
    return offsets


def merge_shards(
    shard_dir: str,
    output_path: str,
    header_path: str | None = None,
    buffer_size: int | None = None,
    write_empty_gzip_at_eof: bool = False,
    write_cram_eof: bool = False,
    parallel: bool | None = None,
) -> int:
    """Concatenate ``part-*`` files under ``shard_dir`` into
    ``output_path``. Returns the number of shards merged.

    Copies go through :func:`concat_files_parallel` — sequential
    streaming by default, parallel positioned writes when the
    deployment opts in via ``ADAM_SPARK_MERGE_PARALLELISM`` (the
    reference's isHdfs-gated ParallelFileMerger); ``parallel=False``
    forces the sequential byte-copy the CLI's ``-disable_fast_concat``
    selects. ``write_empty_gzip_at_eof`` appends the 28-byte BGZF
    empty-block terminator (MergeShards.scala:37
    -write_empty_GZIP_at_eof — the marker BAM readers use to detect a
    complete file); ``write_cram_eof`` appends the CRAM EOF container
    (MergeShards.scala:41 -write_cram_eof)."""
    if not buffer_size:
        buffer_size = 4 * 1024 * 1024
    shards = sorted(
        p
        for p in glob.glob(os.path.join(shard_dir, "part-*"))
        if not p.endswith((".crc", "_SUCCESS"))
    )
    if not shards:
        raise FileNotFoundError(f"no part-* shards under {shard_dir}")
    header_blob = b""
    if header_path:
        with open(header_path, "rb") as hf:
            header_blob = hf.read()
    eof_blob = b""
    if write_empty_gzip_at_eof:
        from adam_spark.sources.bam import _BGZF_EOF

        eof_blob = _BGZF_EOF
    if write_cram_eof:
        from adam_spark.sources.cram import cram_eof_bytes

        eof_blob = cram_eof_bytes()
    concat_files_parallel(
        output_path, shards, header_blob, eof_blob, buffer_size, parallel
    )
    return len(shards)
