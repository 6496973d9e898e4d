"""Per-partition lineage manifest: checkpoint/resume for encode runs.

Each encode task writes ``<out_dir>/_manifest/<partition_id>.json`` atomically
right after its partition file lands (tmp + rename locally, single PUT on
object stores — fsio.write_text_atomic). A record carries the lineage the
north rule requires: partition id, per-stream codec choices, page counts,
bytes in/out, crc32.

Resume = ``completed_ids(out_dir)`` → skip those partitions before encoding.
This is a plain set filter, not a join (SURVEY.md §7.1 step 7). The driver can
consolidate records with ``finalize(out_dir)`` into one ``manifest.json``.

``out_dir`` may be a plain local path or any ``pyarrow.fs`` URI (file://,
s3://, gs://) — the whole manifest lifecycle goes through fsio, the
``io.ReadSeeker``/``io.Writer`` abstraction role of the reference
(/root/reference/file_reader.go:32, file_writer.go:46).

The reference has no checkpointing at all (/root/reference/TODO.md, a crash
loses the open row group) — this layer is our addition for 100 TB runs.
"""

from __future__ import annotations

import json
import zlib

from ..sources import fsio


def manifest_dir(out_dir: str) -> str:
    return fsio.join(out_dir, "_manifest")


def record_path(out_dir: str, partition_id: str) -> str:
    return fsio.join(manifest_dir(out_dir), f"{partition_id}.json")


def write_record(out_dir: str, record: dict) -> str:
    path = record_path(out_dir, record["partition_id"])
    fsio.write_text_atomic(path, json.dumps(record))
    return path


def load_records(out_dir: str) -> list[dict]:
    paths = fsio.list_files(manifest_dir(out_dir), ".json")

    def _read(path: str):
        try:
            return json.loads(fsio.read_bytes(path))
        except (json.JSONDecodeError, UnicodeDecodeError, OSError):
            # A torn record (crash mid-rename without fsync on old kernels)
            # means that one partition re-encodes; it must not brick resume.
            # UnicodeDecodeError included: torn bytes are rarely valid UTF-8.
            return None
    if len(paths) <= 8:
        recs = [_read(p) for p in paths]
    else:
        # object stores: one GET per record — overlap them (same rationale
        # as decode_dataset's _parallel_prune)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, len(paths))) as ex:
            recs = list(ex.map(_read, paths))
    return [r for r in recs if r is not None]


def drop_covered(records: list[dict]) -> list[dict]:
    """Drop records a compaction has absorbed (another LIVE record lists
    their id in ``covers``). A crash between writing the merged record and
    retiring the old ones leaves both listed; reading both would duplicate
    every absorbed row. The merged record only claims its covers while its
    file exists, so this never hides rows."""
    covered: set[str] = set()
    for r in records:
        if r.get("covers") and r.get("path") and fsio.exists(r["path"]):
            covered.update(r["covers"])
    return [r for r in records if r["partition_id"] not in covered]


def completed_ids(out_dir: str, verify_crc: bool = False) -> set[str]:
    """Partition ids whose file exists (optionally crc-verified) — skip these.

    Includes ids a compaction absorbed (the record's ``covers`` list): the
    merged file provably contains those logical partitions' rows, so a
    resume must treat them as complete — without this, a resume re-run
    after ``compact_partitions`` re-encoded every group and silently
    duplicated all rows.

    ``verify_crc=True`` is a REPAIR pass: a record whose file fails its
    crc is RETIRED (record deleted; the corrupt file left for forensics as
    an fsck-visible orphan) — without the retirement, the re-encoded
    replacements stayed hidden behind the corrupt merge's ``covers`` in
    drop_covered and the repair was unreachable."""
    records = load_records(out_dir)
    paths = [r.get("path") for r in records]

    def _ok(pr):
        path, rec = pr
        if not path or not fsio.exists(path):
            return False
        if verify_crc:
            return (zlib.crc32(fsio.read_bytes(path)) & 0xFFFFFFFF) == rec.get("crc32")
        return True
    pairs = list(zip(paths, records))
    if len(pairs) <= 8 or verify_crc:  # crc reads whole files: keep serial
        flags = [_ok(p) for p in pairs]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, len(pairs))) as ex:
            flags = list(ex.map(_ok, pairs))
    done = set()
    for (path, rec), ok in zip(pairs, flags):
        if ok:
            done.add(rec["partition_id"])
            done.update(rec.get("covers") or ())
        elif verify_crc and path and fsio.exists(path):
            # crc failure on a live record: retire it so drop_covered stops
            # routing reads (and hiding re-encodes) through the corrupt file
            fsio.delete_file(record_path(out_dir, rec["partition_id"]))
    return done


def finalize(out_dir: str) -> dict:
    """Consolidate records into manifest.json; returns run totals.
    Covered (compaction-absorbed) records are excluded — counting both the
    merge and its absorbed originals would double every absorbed row."""
    records = drop_covered(load_records(out_dir))
    totals = {
        "partitions": len(records),
        "num_rows": sum(r["num_rows"] for r in records),
        "bytes_in": sum(r["bytes_in"] for r in records),
        "bytes_out": sum(r["bytes_out"] for r in records),
    }
    doc = {"totals": totals, "partitions": records}
    fsio.write_text_atomic(fsio.join(out_dir, "manifest.json"), json.dumps(doc))
    return totals
