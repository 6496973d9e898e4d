"""Compaction: merge small same-key partition files up to a target size.

Completes the shuffle-free keyed layout (:func:`encode.encode_partitioned`):
that path writes one file per (key, batch), so low-frequency keys leave a
tail of small files. Compaction plans driver-side over the manifest (metadata
only), then each merge group is one Ray task: decode the small files, concat,
re-encode as one partition, write the new manifest record, and only then
retire the old records + files — a crash mid-compaction leaves both the old
(still-listed) and new (unlisted or listed) states readable, never a loss.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..sources import fsio
from ..sources.columns import EncodeConfig
from ..sources.partfile import read_partition, read_partition_footer
from ..stages.codec import EncodeStage
from ..state import manifest as mf


def plan_compaction(out_dir: str, target_bytes: int = 128 << 20, min_group: int = 2,
                    max_group_files: int = 64) -> list[list[dict]]:
    """Groups of small same-key partition records to merge (driver, metadata only).

    Groups close at ANY bound — ``target_bytes`` of compressed payload,
    ``max_group_files`` members, or the DECODED size (lineage ``bytes_in``)
    reaching half the encode task's memory cap — so a key with thousands of
    tiny files splits into many parallel merge tasks instead of one
    straggler group (VERDICT r2 #9: 52.9 s single-group compact under
    load), and a highly-compressible group (tokens at >32:1) can never
    concat past the 4 GiB encode batch cap mid-merge."""
    from ..stages.codec import EncodeStage

    max_group_decoded = EncodeStage.DEFAULT_MAX_BATCH_BYTES // 2
    by_key: dict[str, list[dict]] = {}
    for rec in mf.drop_covered(mf.load_records(out_dir)):
        if rec.get("bytes_out", 0) >= target_bytes:
            continue
        by_key.setdefault(rec.get("key", ""), []).append(rec)
    groups = []
    for key, recs in by_key.items():
        recs.sort(key=lambda r: r["bytes_out"])
        cur, size, size_in = [], 0, 0
        for r in recs:
            cur.append(r)
            size += r["bytes_out"]
            size_in += r.get("bytes_in", r["bytes_out"])
            if (size >= target_bytes or len(cur) >= max_group_files
                    or size_in >= max_group_decoded):
                groups.append(cur)
                cur, size, size_in = [], 0, 0
        if len(cur) >= min_group:
            groups.append(cur)
    return groups


def compact_partitions(out_dir: str, target_bytes: int = 128 << 20,
                       config: EncodeConfig | None = None, concurrency=None,
                       max_group_files: int = 64) -> dict:
    """Run the compaction plan; returns {"groups": n, "merged_files": m}.

    First finishes any retirement a previous compaction crashed out of:
    records (and their files) that a live merged record ``covers`` are
    deleted — they are fully contained in the merge, and leaving them
    would double-read every absorbed row."""
    recs = mf.load_records(out_dir)
    live = {r["partition_id"] for r in mf.drop_covered(recs)}
    for r in recs:
        if r["partition_id"] not in live:
            fsio.delete_file(mf.record_path(out_dir, r["partition_id"]))
            if r.get("path"):
                fsio.delete_file(r["path"])
    groups = plan_compaction(out_dir, target_bytes, max_group_files=max_group_files)
    if not groups:
        return {"groups": 0, "merged_files": 0}
    cfg = config
    if cfg is None:
        # inherit Bloom columns from the run being compacted: a default
        # config would silently strip the filters from merged partitions
        # and eq_filter pruning would degrade to stats-only on them
        footer = read_partition_footer(groups[0][0]["path"])
        bc = tuple(footer.get("blooms") or ())
        cfg = EncodeConfig(bloom_columns=bc) if bc else EncodeConfig()

    class CompactStage(EncodeStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            import json

            out_rows = []
            for spec in batch.column("group").to_pylist():
                recs = json.loads(spec)
                tables = [read_partition(r["path"]) for r in recs]
                merged = pa.concat_tables(tables)
                new = EncodeStage.__call__(self, merged, tag=recs[0].get("key"))
                # record which LOGICAL partition ids this merge absorbed
                # (propagating ids a previous compaction already absorbed):
                # resume keys on the original deterministic ids (e.g.
                # "<key>-<salt>"), and compaction renames partitions to
                # content hashes — without `covers`, a resume re-run after
                # compaction re-encoded every group and silently DUPLICATED
                # all rows. A merge group is bounded by half the encode
                # batch cap (plan_compaction), so the re-encode never
                # self-splits and `new` is a single record.
                covers = sorted({i for r in recs
                                 for i in ([r["partition_id"]]
                                           + list(r.get("covers") or []))})
                for pid in new.column("partition_id").to_pylist():
                    rec_path = mf.record_path(self.out_dir, pid)
                    rec = json.loads(fsio.read_bytes(rec_path))
                    rec["covers"] = covers
                    mf.write_record(self.out_dir, rec)
                out_rows.append(new)
                # retire old records + files only after the new one is durable
                for r in recs:
                    fsio.delete_file(mf.record_path(self.out_dir, r["partition_id"]))
                    fsio.delete_file(r["path"])
            return pa.concat_tables(out_rows)

    import json

    items = rd.from_items([{"group": json.dumps(g)} for g in groups])
    from .encode import _default_concurrency

    lo, hi = _default_concurrency()
    def compact_batch(batch: pa.Table) -> pa.Table:
        return CompactStage(out_dir, cfg)(batch)

    # task pool (no actor startup; one task per merge group)
    items.map_batches(compact_batch, batch_format="pyarrow", batch_size=1).materialize()
    return {"groups": len(groups), "merged_files": sum(len(g) for g in groups)}
