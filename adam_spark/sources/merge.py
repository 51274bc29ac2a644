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


def merge_shards(
    shard_dir: str,
    output_path: str,
    header_path: str | None = None,
    buffer_size: int | None = None,
    write_empty_gzip_at_eof: bool = False,
    write_cram_eof: bool = False,
) -> int:
    """Concatenate ``part-*`` files under ``shard_dir`` into
    ``output_path``. Returns the number of shards merged.

    ``write_empty_gzip_at_eof`` appends the 28-byte BGZF empty-block
    terminator (MergeShards.scala:37 -write_empty_GZIP_at_eof — the
    marker BAM readers use to detect a complete file);
    ``write_cram_eof`` appends the CRAM EOF container
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
    with open(output_path, "wb") as out:
        if header_path:
            with open(header_path, "rb") as hf:
                shutil.copyfileobj(hf, out, buffer_size)
        for p in shards:
            with open(p, "rb") as fh:
                shutil.copyfileobj(fh, out, buffer_size)
        if write_empty_gzip_at_eof:
            from adam_spark.sources.bam import _BGZF_EOF

            out.write(_BGZF_EOF)
        if write_cram_eof:
            from adam_spark.sources.cram import cram_eof_bytes

            out.write(cram_eof_bytes())
    return len(shards)
