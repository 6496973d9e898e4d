"""Per-partition lineage manifest: checkpoint/resume for encode runs.

Each encode task writes ``<out_dir>/_manifest/<partition_id>.json`` atomically
right after its partition file lands (tmp + rename, same discipline as the
partition itself). A record carries the lineage the north rule requires:
partition id, per-stream codec choices, page counts, bytes in/out, crc32.

Resume = ``completed_ids(out_dir)`` → skip those partitions before encoding.
This is a plain set filter, not a join (SURVEY.md §7.1 step 7). The driver can
consolidate records with ``finalize(out_dir)`` into one ``manifest.json``.

The reference has no checkpointing at all (/root/reference/TODO.md, a crash
loses the open row group) — this layer is our addition for 100 TB runs.
"""

from __future__ import annotations

import json
import os
import zlib


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def record_path(out_dir: str, partition_id: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"{partition_id}.json")


def write_record(out_dir: str, record: dict) -> str:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = record_path(out_dir, record["partition_id"])
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_records(out_dir: str) -> list[dict]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
            except (json.JSONDecodeError, OSError):
                # A torn record (crash mid-rename without fsync on old kernels)
                # means that one partition re-encodes; it must not brick resume.
                continue
    return out


def completed_ids(out_dir: str, verify_crc: bool = False) -> set[str]:
    """Partition ids whose file exists (optionally crc-verified) — skip these."""
    done = set()
    for rec in load_records(out_dir):
        path = rec.get("path")
        if not path or not os.path.exists(path):
            continue
        if verify_crc:
            with open(path, "rb") as f:
                if (zlib.crc32(f.read()) & 0xFFFFFFFF) != rec.get("crc32"):
                    continue
        done.add(rec["partition_id"])
    return done


def finalize(out_dir: str) -> dict:
    """Consolidate records into manifest.json; returns run totals."""
    records = load_records(out_dir)
    totals = {
        "partitions": len(records),
        "num_rows": sum(r["num_rows"] for r in records),
        "bytes_in": sum(r["bytes_in"] for r in records),
        "bytes_out": sum(r["bytes_out"] for r in records),
    }
    doc = {"totals": totals, "partitions": records}
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return totals
