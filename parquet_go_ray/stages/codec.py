"""Encode/decode stages for Ray Data ``map_batches`` actor pools.

EncodeStage is a callable CLASS: constructed once per actor, so per-actor
state (config, selector tables) is amortized across batches — the Ray-native
home of the reference's chunk-writer state (/root/reference/chunk_writer.go).
Batches arrive as zero-copy Arrow tables; each batch becomes one partition
file + one manifest/lineage row.

Determinism under Ray retries: the partition id is a blake2b hash of the
*encoded* body, a pure function of (batch content, config) — a retried task
rewrites the same file with the same id (SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..sources import fsio
from ..sources.columns import EncodeConfig
from ..sources.partfile import encode_table, read_partition
from ..state import manifest as mf


def partition_id_for(body: bytes) -> str:
    return hashlib.blake2b(body, digest_size=12).hexdigest()


class EncodeStage:
    """pa.Table batch -> one partition file per cap-sized slice; emits one
    lineage row per partition.

    ``max_batch_bytes`` is the encode-side twin of DecodeStage's declared-size
    cap (the reference's alloc.go role). An oversized batch SELF-SPLITS
    (VERDICT r3 #4): row-order-preserving binary slicing (zero-copy,
    pyarrow slice nbytes is offset-aware) until every piece fits, then each
    piece becomes its own partition — the Ray-native analogue of the
    reference's incremental ~1 MiB page flush as rows accumulate
    (/root/reference/data_store.go:156-184). Only a SINGLE ROW larger than
    the cap still fails fast (nothing can split it)."""

    DEFAULT_MAX_BATCH_BYTES = 4 << 30

    def __init__(self, out_dir: str, config: EncodeConfig | None = None,
                 max_batch_bytes: int | None = DEFAULT_MAX_BATCH_BYTES):
        self.out_dir = out_dir
        self.config = config or EncodeConfig()
        self.max_batch_bytes = max_batch_bytes
        fsio.makedirs(out_dir)

    def _split(self, batch: pa.Table) -> list[pa.Table]:
        if not self.max_batch_bytes or batch.nbytes <= self.max_batch_bytes:
            return [batch]
        out: list[pa.Table] = []
        stack = [batch]
        while stack:
            t = stack.pop()
            if t.nbytes <= self.max_batch_bytes:
                out.append(t)
            elif t.num_rows <= 1:
                raise ValueError(
                    f"encode row declares {t.nbytes} Arrow bytes, over the "
                    f"{self.max_batch_bytes}-byte task cap — a single row "
                    "cannot be split; raise max_batch_bytes")
            else:
                mid = t.num_rows // 2
                stack.append(t.slice(mid))      # popped after the first half:
                stack.append(t.slice(0, mid))   # output preserves row order
        return out

    def __call__(self, batch: pa.Table, tag: str | None = None) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({k: pa.array([], type=t) for k, t in _LINEAGE_SCHEMA})
        rows = [self._encode_one(piece, tag) for piece in self._split(batch)]
        return pa.concat_tables(rows) if len(rows) > 1 else rows[0]

    def _encode_one(self, batch: pa.Table, tag: str | None) -> pa.Table:
        body, lineage = encode_table(batch, self.config)
        pid = partition_id_for(body)
        path = fsio.join(self.out_dir, f"part-{pid}.rdpg")
        if not fsio.exists(path):  # idempotent under retries
            fsio.write_bytes_atomic(path, body)
        lineage["partition_id"] = pid
        lineage["path"] = path
        if tag is not None:
            lineage["key"] = tag
        mf.write_record(self.out_dir, lineage)
        return _lineage_table(lineage)


_LINEAGE_SCHEMA = [
    ("partition_id", pa.string()),
    ("path", pa.string()),
    ("num_rows", pa.int64()),
    ("bytes_in", pa.int64()),
    ("bytes_out", pa.int64()),
    ("crc32", pa.int64()),
    ("codecs", pa.string()),
]


def _lineage_table(lineage: dict) -> pa.Table:
    import json

    return pa.table(
        {
            "partition_id": [lineage["partition_id"]],
            "path": [lineage["path"]],
            "num_rows": [lineage["num_rows"]],
            "bytes_in": [lineage["bytes_in"]],
            "bytes_out": [lineage["bytes_out"]],
            "crc32": [lineage["crc32"]],
            "codecs": [json.dumps(lineage["codecs"])],
        }
    )


class DecodeStage:
    """Batch of {path} rows -> decoded rows (one partition file per input row).

    ``max_partition_bytes`` is the role of the reference's
    ``WithMaximumMemorySize`` alloc tracker (/root/reference/alloc.go:10-89):
    a partition whose DECLARED decompressed size exceeds the cap fails fast
    with a clear error instead of OOM-killing the worker mid-decode. Ray's
    streaming backpressure bounds concurrent batches; this bounds the one
    batch no backpressure can split."""

    DEFAULT_MAX_PARTITION_BYTES = 4 << 30

    def __init__(self, columns: list[str] | None = None,
                 max_partition_bytes: int | None = DEFAULT_MAX_PARTITION_BYTES):
        self.columns = columns
        self.max_partition_bytes = max_partition_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        if self.max_partition_bytes:
            from ..sources.partfile import read_partition_footer

            for p in paths:
                footer = read_partition_footer(p)
                usize = sum(
                    s.get("decoded_bytes") or sum(pg["usize"] for pg in s["pages"])
                    for s in footer["streams"]
                )
                if usize > self.max_partition_bytes:
                    raise ValueError(
                        f"partition {p} declares {usize} decompressed bytes, over the "
                        f"{self.max_partition_bytes}-byte task cap — re-shard it "
                        f"(compact with a smaller target or re-encode with smaller batches)"
                    )
        tables = [read_partition(p, self.columns) for p in paths]
        if not tables:
            raise ValueError("DecodeStage got an empty path batch")
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]
