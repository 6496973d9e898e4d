"""Encode / decode pipelines over Ray Data.

Ray-Data-first equivalents of the reference's write path
(/root/reference/file_writer.go: NewFileWriter → AddData* → Close) and read
path (file_reader.go: NextRow*), re-expressed as streaming Dataset stages:

  read_parquet → map_batches(EncodeStage)  → lineage Dataset (tiny)
  from_items(partition paths) → map_batches(DecodeStage) → rows Dataset

Three partitioning strategies (measured head-to-head in BENCH/BASELINE.md):
  * ``encode_dataset`` — stateless: each incoming block becomes one partition
    (partition id = content hash; idempotent under retries). Fastest wall
    clock; mixed-key streams compress worst.
  * ``encode_grouped`` — groupby-on-source with explicit salting: a driver
    pre-pass counts rows per source, hot sources are split into
    ceil(source_bytes / target_partition_bytes) salt buckets, cold sources
    coalesce into one — the skew strategy the north rule mandates. Grouping
    rows by source also makes per-partition dictionaries denser, directly
    shrinking the dictionary pages (SURVEY.md §4.3). Partition ids are
    ``<source>-<salt>``: deterministic by key, so resume skips completed
    groups *before* any encode work. Best compression; pays one full
    all-to-all exchange.
  * ``encode_partitioned`` (+ ``compact.compact_partitions``) — batch-local
    key split, no shuffle: ~the stateless throughput at ~the grouped
    compression; the 100 TB default.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..sources import fsio
from ..sources.columns import EncodeConfig
from ..functions.colhash import stable_hash
from ..sources.partfile import write_partition
from ..stages.codec import DecodeStage, EncodeStage, _lineage_table
from ..state import manifest as mf

DEFAULT_TARGET_PARTITION_BYTES = 128 << 20  # reference row-group default (split.go:26)


def key_tag(val) -> str:
    """Canonical manifest tag for a partition-key value. Null keys get a
    reserved token (``pc.equal`` against a null scalar would otherwise
    filter their rows away silently); everything else is ``str(val)``,
    escaped so no real value can collide with the reserved token: a value
    whose str() starts with ``__`` gains one leading ``_`` (escaped tags
    start ``___``, unescaped ones never start ``__``, and ``__null__``
    matches neither — injective, so a literal '__null__' source value and
    the null partition keep distinct tags/paths instead of the second
    group silently overwriting the first's partition file).
    Shared by the encode tags and ``decode_dataset(keys=...)`` pruning, so
    a caller can pass ``keys={None}`` to point-look-up the null partition."""
    if val is None:
        return "__null__"
    s = str(val)
    return "_" + s if s.startswith("__") else s


def _default_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds. Fixed-size pools deadlock when two
    pools are chained on one node (each reserves all CPUs); autoscaling
    (min 1) pools always make progress and ramp up under queue pressure."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, ncpu))


def encode_dataset(
    ds: rd.Dataset,
    out_dir: str,
    config: EncodeConfig | None = None,
    *,
    batch_rows: int | None = 64 * 1024,
    concurrency=None,
) -> rd.Dataset:
    """Stateless encode: one partition per batch. Returns the lineage Dataset.

    Runs as a TASK pool by default so Ray Data fuses it with the upstream
    read — the uncompressed batch never round-trips through the object store
    (measured 2x wall-clock at 8 CPUs; the encode stage has no per-actor
    state worth an actor pool, its config is a tiny dataclass). Pass
    ``concurrency`` to force an actor pool instead."""
    cfg = config or EncodeConfig()
    if concurrency is None:
        def encode_batch(batch: pa.Table) -> pa.Table:
            return EncodeStage(out_dir, cfg)(batch)

        return ds.map_batches(
            encode_batch,
            batch_format="pyarrow",
            batch_size=batch_rows,
            zero_copy_batch=True,
        )
    return ds.map_batches(
        EncodeStage,
        fn_constructor_args=(out_dir, cfg),
        batch_format="pyarrow",
        batch_size=batch_rows,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def plan_salts(
    ds: rd.Dataset,
    key: str,
    target_partition_bytes: int = DEFAULT_TARGET_PARTITION_BYTES,
) -> dict[str, int]:
    """Driver pre-pass: rows-per-key → salt fan-out per key (>=1).

    Small result (one row per key); the per-key byte estimate uses the
    dataset-wide mean row size.
    """
    counts = {r[key]: r["count()"] for r in ds.groupby(key).count().take_all()}
    total_rows = sum(counts.values()) or 1
    row_bytes = (ds.size_bytes() or total_rows) / total_rows
    return {
        k: max(1, int(np.ceil(c * row_bytes / target_partition_bytes))) for k, c in counts.items()
    }


def encode_grouped(
    ds: rd.Dataset,
    out_dir: str,
    key: str = "source",
    config: EncodeConfig | None = None,
    *,
    salt_col: str = "doc_id",
    target_partition_bytes: int = DEFAULT_TARGET_PARTITION_BYTES,
    resume: bool = True,
    max_group_bytes: int | None = None,
) -> rd.Dataset:
    """Salted groupby-on-``key`` encode with deterministic partition ids.

    The shuffle: one ``groupby([key, salt]).map_groups`` — a single all-to-all
    exchange; everything else is embarrassingly parallel. Skew is handled by
    the salt fan-out from :func:`plan_salts`; resume by the manifest id set.
    """
    cfg = config or EncodeConfig()
    group_cap = max_group_bytes or EncodeStage.DEFAULT_MAX_BATCH_BYTES

    def add_ktag(batch: pa.Table) -> pa.Table:
        # group on the string TAG, not the raw key: Ray's groupby sort
        # raises on null keys, while key_tag gives nulls their reserved
        # token. Per-unique python key_tag keeps exact str(value) parity
        # with decode_dataset(keys=...) for every key type.
        d = batch.column(key).combine_chunks().dictionary_encode()
        tags = pa.array([key_tag(v) for v in d.dictionary.to_pylist()],
                        pa.string())
        col = tags.take(d.indices) if len(d) else pa.array([], pa.string())
        import pyarrow.compute as pc

        return batch.append_column("__ktag", pc.fill_null(col, key_tag(None)))

    ds = ds.map_batches(add_ktag, batch_format="pyarrow", zero_copy_batch=True)
    salts = plan_salts(ds, "__ktag", target_partition_bytes)
    done = mf.completed_ids(out_dir) if resume else set()
    # Resume is only sound against the SAME input: partition ids are
    # '<key>-<salt>' and the salt assignment is hash(id) % fan(key), so if
    # rows were added/removed since the interrupted run the fan-out changes
    # and a "completed" id now denotes a DIFFERENT row set — skipping it
    # would silently mis-assign rows. The plan is recorded beside the
    # manifest and must match before any completed id is honored.
    import json as _json

    # salts keys are ALREADY tags (plan_salts ran on __ktag) — re-escaping
    # them through key_tag would double-escape "__"-prefixed keys and break
    # resume against plans recorded by the raw-key grouping
    plan_doc = {"key": key,
                "salts": {str(k): int(v) for k, v in salts.items()}}
    plan_path = fsio.join(out_dir, "_salt_plan.json")
    if done and fsio.exists(plan_path):
        prev = _json.loads(fsio.read_bytes(plan_path))
        if prev != plan_doc:
            raise ValueError(
                "encode_grouped resume: the salt plan changed since the "
                "interrupted run (input rows were added or removed), so "
                "'<key>-<salt>' partition ids no longer denote the same row "
                "sets — resuming would silently mis-assign rows. Encode the "
                "changed input into a fresh directory (or pass resume=False "
                "after clearing this one).")
    fsio.write_text_atomic(plan_path, _json.dumps(plan_doc))

    def _fs_tag(tag: str) -> str:
        # filesystem-safe deterministic filename fragment: percent-encode
        # outside [A-Za-z0-9._~-] (bijective — a '/' in a key value must not
        # create a stray subdirectory decode_dataset never globs), cap the
        # length by hashing the tail (NAME_MAX). Plain alnum tags — every
        # normal layout — are unchanged, so existing manifests resume as-is.
        import hashlib
        from urllib.parse import quote

        q = quote(tag, safe="._-")
        if len(q) > 96:
            q = q[:64] + "~" + hashlib.blake2b(
                tag.encode(), digest_size=8).hexdigest()
        return q

    def add_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k_arr = pc.index_in(batch.column("__ktag"), pa.array(list(salts)))
        if k_arr.null_count:
            # every tag is in salts by construction (plan_salts ran on the
            # tagged dataset); a miss means the input changed under us
            raise ValueError(
                "encode_grouped: key tag not in the salt plan — the input "
                "changed between planning and encoding")
        k = np.asarray(k_arr).astype(np.int64)
        fan = np.array(list(salts.values()), dtype=np.int64)[k]
        if salt_col in batch.column_names:
            h = _stable_hash(batch.column(salt_col))
        else:
            h = np.arange(batch.num_rows, dtype=np.int64)
        salt = (h % np.maximum(fan, 1)).astype(np.int64)
        return batch.append_column("__salt", pa.array(salt))

    def encode_group(group: pa.Table) -> pa.Table:
        tag = group.column("__ktag")[0].as_py()
        salt = group.column("__salt")[0].as_py()
        pid = f"{_fs_tag(tag)}-{salt:04d}"
        if pid in done:
            return _lineage_table(
                {"partition_id": pid, "path": fsio.join(out_dir, f"part-{pid}.rdpg"),
                 "num_rows": group.num_rows, "bytes_in": 0, "bytes_out": 0, "crc32": 0,
                 "codecs": {}}
            )
        body_table = group.drop_columns(["__salt", "__ktag"])
        if body_table.nbytes > group_cap:
            # the salt plan sized fan-out from the MEAN row size; a hot key
            # with far-larger rows can land a group past the encode cap —
            # fail fast with the remedy instead of OOMing the worker
            raise ValueError(
                f"encode_grouped: group '{pid}' holds {body_table.nbytes} "
                f"Arrow bytes, over the {group_cap}"
                f"-byte encode cap — lower target_partition_bytes (its rows "
                f"are much larger than the dataset mean)")
        lineage = write_partition(body_table, fsio.join(out_dir, f"part-{pid}.rdpg"), cfg)
        lineage["partition_id"] = pid
        lineage["key"] = tag  # decode_dataset(keys=...) prunes on this
        mf.write_record(out_dir, lineage)
        return _lineage_table(lineage)

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    return salted.groupby(["__ktag", "__salt"]).map_groups(encode_group, batch_format="pyarrow")


def encode_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key: str = "source",
    config: EncodeConfig | None = None,
    *,
    batch_rows: int | None = None,
    concurrency=None,
) -> rd.Dataset:
    """Shuffle-free keyed layout: split each batch by ``key`` locally and write
    one partition file per (key, batch) — no all-to-all exchange at all.

    Compared to :func:`encode_grouped` (true groupby shuffle): same per-file
    key purity (so dictionary pages stay dense), ~the stateless pipeline's
    throughput, but more files per key (one per batch a key appears in —
    compact later if the tail matters). This is the 100 TB default: the
    measured groupby shuffle costs ~20x the encode itself, while batch-local
    splitting costs nothing (SURVEY.md §4.3 discusses why key-pure files
    compress better).
    """
    cfg = config or EncodeConfig()

    class SplitEncode(EncodeStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            parts = []
            keys = batch.column(key)
            for val in pc.unique(keys):
                if not val.is_valid:
                    # pc.equal(keys, null) is all-null -> filter drops the
                    # rows SILENTLY; route null keys to their own partition
                    mask, tag = pc.is_null(keys), key_tag(None)
                else:
                    mask, tag = pc.equal(keys, val), key_tag(val.as_py())
                parts.append(EncodeStage.__call__(
                    self, batch.filter(mask), tag=tag))
            return pa.concat_tables(parts) if parts else EncodeStage.__call__(self, batch)

    if concurrency is None:
        # task pool: fuses with the read (see encode_dataset)
        def split_encode(batch: pa.Table) -> pa.Table:
            return SplitEncode(out_dir, cfg)(batch)

        return ds.map_batches(
            split_encode,
            batch_format="pyarrow",
            batch_size=batch_rows,
            zero_copy_batch=True,
        )
    return ds.map_batches(
        SplitEncode,
        fn_constructor_args=(out_dir, cfg),
        batch_format="pyarrow",
        batch_size=batch_rows,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def _stable_hash(col: pa.ChunkedArray) -> np.ndarray:
    """Deterministic per-row int64 hash (moved to functions/colhash.py so
    leaf layers — the bloom filters — share it; kept here as the
    long-standing import point for bench/tests)."""
    return stable_hash(col)


def _parallel_prune(paths: list[str], keep) -> list[str]:
    """Apply a per-partition keep(path) predicate with an I/O thread pool.

    Pruning reads footers (ranged tail reads) and bloom blobs — pure I/O;
    a serial driver loop over a 100k-partition layout would take minutes
    before any decode work starts. Order is preserved; predicate
    exceptions propagate (a corrupt footer/bloom must fail the read, not
    vanish into a worker thread)."""
    if len(paths) <= 4:
        return [p for p in paths if keep(p)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(32, len(paths))) as ex:
        flags = list(ex.map(keep, paths))
    return [p for p, f in zip(paths, flags) if f]


def decode_dataset(
    out_dir: str,
    columns: list[str] | None = None,
    *,
    stats_filter: dict[str, tuple] | None = None,
    eq_filter: dict | None = None,
    keys: set | list | None = None,
    concurrency=None,
) -> rd.Dataset:
    """Read back an encoded run as a streaming Dataset of decoded rows.

    ``stats_filter={"col": (lo, hi)}`` prunes whole partitions whose footer
    [min,max] range cannot intersect — the row-group skip of the reference
    (/root/reference/file_reader.go:275-277) at partition granularity. It is
    an optimization only; callers still apply the exact row filter.

    ``eq_filter={"col": value_or_values}`` prunes for equality point
    lookups: partitions are skipped when the footer [min,max] cannot hold
    any queried value, AND — when the run was encoded with
    ``EncodeConfig(bloom_columns=(...,))`` — when the partition's
    split-block Bloom filter (sources/bloom.py) proves every queried value
    absent. On high-cardinality columns (doc_id over a shuffled corpus)
    stats never prune but the Bloom does — the point-lookup path at
    100 TB. Same contract as stats_filter: optimization only.

    ``keys`` prunes by the manifest's partition key (encode_partitioned /
    encode_grouped tag): only partitions whose ``key`` record field is in the
    set are decoded — metadata-only, no file opened for skipped partitions
    (the point-lookup path for keyed layouts, e.g. IVF inverted lists).
    """
    # reconcile an interrupted compaction: records absorbed by a live merged
    # record are stale — reading them alongside the merge would duplicate
    # every absorbed row (the crash window between the merged record landing
    # and the old ones being retired)
    records = mf.drop_covered(mf.load_records(out_dir))
    if keys is not None:
        if not records:
            raise ValueError(
                f"decode_dataset(keys=...): no manifest records under "
                f"{out_dir} — key pruning needs the manifest; decoding "
                f"everything instead would silently drop the point-lookup "
                f"contract")
        keyed = [r for r in records if "key" in r]
        if not keyed:
            raise ValueError(
                f"decode_dataset(keys=...): the manifest under {out_dir} "
                f"has no keyed records — the run was not written by "
                f"encode_grouped/encode_partitioned; key pruning would "
                f"silently return nothing")
        # membership on the RECORD's tag, never on str(r.get('key')):
        # records without a key stringified to 'None' and collided with a
        # legitimate 'None' key value
        keyset = {key_tag(k) for k in keys}
        records = [r for r in keyed if str(r["key"]) in keyset]
        if not records:
            return rd.from_items([])  # no partition carries a requested key
    if records:
        paths = sorted({r["path"] for r in records})
    else:
        paths = fsio.list_files(out_dir, ".rdpg")
        if not paths and fsio.is_local(out_dir) and not os.path.isdir(
                fsio._local_path(out_dir)):
            # a nonexistent LOCAL directory is a caller error (typo, failed
            # mount), not an empty run — returning 0 rows would hide it.
            # Object-store URIs stay silent: "missing prefix" and "no
            # objects" are indistinguishable there.
            raise ValueError(
                f"decode_dataset: {out_dir!r} does not exist")
    if stats_filter is not None and not hasattr(stats_filter, "items"):
        raise TypeError(
            f"stats_filter must be a mapping {{column: (lo, hi)}}, got "
            f"{type(stats_filter).__name__} — e.g. "
            f"stats_filter={{'doc_id': (0, None)}} for doc_id >= 0")
    if eq_filter is not None and not hasattr(eq_filter, "items"):
        raise TypeError(
            f"eq_filter must be a mapping {{column: value_or_values}}, "
            f"got {type(eq_filter).__name__}")
    if stats_filter or eq_filter:
        from ..sources import bloom as _bloom
        from ..sources.partfile import read_dictionary_page, read_partition_footer

        # normalize each eq filter to a pyarrow array + a hoisted pylist
        # (rebuilding them inside the per-partition predicate once cost a
        # list conversion per partition per column)
        queries: dict = {}
        qvals: dict = {}
        for col, vals in (eq_filter or {}).items():
            if isinstance(vals, (pa.Array, pa.ChunkedArray)):
                arr = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            elif isinstance(vals, (list, tuple, set, frozenset, np.ndarray)):
                arr = pa.array(list(vals) if isinstance(vals, (set, frozenset)) else vals)
            else:
                arr = pa.array([vals])
            if arr.null_count:
                raise ValueError(f"eq_filter[{col!r}]: null query values")
            queries[col] = arr
            qvals[col] = arr.to_pylist()

        checked_names = False

        def keep(p: str) -> bool:
            # ONE footer read serves the stats ranges, the eq envelopes,
            # the bloom probes, and the dict-page membership test
            nonlocal checked_names
            footer = read_partition_footer(p)
            metas = {s["path"]: s for s in footer["streams"]}
            blooms = footer.get("blooms") or {}
            if not checked_names:
                # a typo'd column would otherwise silently no-op and decode
                # the full run (same discipline as the column_codecs check)
                missing = sorted(set(queries) - set(metas) - set(blooms))
                if missing:
                    raise ValueError(
                        f"eq_filter: no such column(s) {missing}; "
                        f"available: {sorted(metas)}")
                checked_names = True
            for col, (lo, hi) in (stats_filter or {}).items():
                st = (metas.get(col) or {}).get("stats") or {}
                if st.get("min") is None:
                    continue  # no stats -> cannot prune
                if (hi is not None and st["min"] > hi) or (lo is not None and st["max"] < lo):
                    return False
            for col, arr in queries.items():
                st = (metas.get(col) or {}).get("stats") or {}
                if st.get("min") is not None:
                    if all(v < st["min"] or v > st["max"] for v in qvals[col]):
                        return False
                b = blooms.get(col)
                if b is not None:
                    blob = fsio.read_range(p, b["offset"], b["size"])
                    if b.get("crc32") is not None and (
                            zlib.crc32(bytes(blob)) & 0xFFFFFFFF) != b["crc32"]:
                        # a corrupt bloom LIES (false negative = silently
                        # dropped rows); fail loudly like a corrupt page
                        raise ValueError(
                            f"CRC mismatch on {p} bloom[{col}]")
                    if not _bloom.maybe_contains(blob, arr).any():
                        return False
                elif (metas.get(col) or {}).get("dict"):
                    # dictionary-encoded stream: the dict page IS the
                    # partition's exact distinct set — membership pruning
                    # with zero false positives, one ranged read, no bloom
                    # needed (the reference exploits the same property for
                    # distinct stats, type_dict.go:127-129)
                    dvals = read_dictionary_page(p, col)
                    if dvals is not None:
                        import pyarrow.compute as pc

                        dv = (pa.array(dvals) if not isinstance(
                            dvals, (pa.Array, pa.ChunkedArray)) else dvals)
                        try:
                            hit = pc.is_in(arr, value_set=dv.cast(arr.type))
                        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                            continue  # incomparable repr: cannot prune
                        if not pc.any(hit).as_py():
                            return False
            return True

        paths = _parallel_prune(paths, keep)
    lo, hi = _default_concurrency()
    conc_hi = (concurrency[1] if isinstance(concurrency, tuple) else concurrency) or hi
    # several files per task when there are many small partitions
    per_task = min(16, max(1, len(paths) // max(4 * conc_hi, 1)))
    items = rd.from_items([{"path": p} for p in paths])
    if concurrency is None:
        # task pool: no actor startup, and downstream consumers fuse with it
        def decode_batch(batch: pa.Table) -> pa.Table:
            return DecodeStage(columns)(batch)

        return items.map_batches(decode_batch, batch_format="pyarrow", batch_size=per_task)
    return items.map_batches(
        DecodeStage,
        fn_constructor_args=(columns,),
        batch_format="pyarrow",
        batch_size=per_task,
        concurrency=concurrency,
    )


def point_lookup(
    out_dir: str,
    column: str,
    values,
    columns: list[str] | None = None,
) -> pa.Table:
    """Exact equality lookup over an encoded run: partition pruning
    (footer stats + Bloom + dictionary-page membership, see
    ``decode_dataset(eq_filter=...)``) followed by the exact row filter.
    Returns the matching rows as ONE pa.Table — point lookups are small by
    contract; for large result sets use ``decode_dataset(eq_filter=...)``
    and keep streaming."""
    import pyarrow.compute as pc

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        vset = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    elif isinstance(values, (list, tuple, set, frozenset, np.ndarray)):
        vset = pa.array(sorted(values) if isinstance(values, (set, frozenset)) else list(values))
    else:
        vset = pa.array([values])
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys([*columns, column]))
    ds = decode_dataset(out_dir, columns=read_cols,
                        eq_filter={column: vset})
    parts, schema = [], None
    for b in ds.iter_batches(batch_format="pyarrow"):
        schema = schema or b.schema
        f = b.filter(pc.is_in(b.column(column), value_set=vset))
        if f.num_rows:
            parts.append(f)
    if parts:
        out = pa.concat_tables(parts)
    elif schema is not None:
        out = pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in schema], schema=schema)
    else:  # every partition pruned: schema from any manifest-listed file
        recs = mf.drop_covered(mf.load_records(out_dir))
        if not recs:
            raise ValueError(f"point_lookup: no partitions under {out_dir}")
        from ..sources.partfile import read_partition

        t0 = read_partition(recs[0]["path"], columns=read_cols)
        out = t0.slice(0, 0)
    if columns is not None:
        out = out.select(columns)
    return out


def encode_dataset_to_parquet(
    ds: rd.Dataset,
    out_dir: str,
    *,
    compression: str | None = "snappy",
    column_encoding: dict[str, str] | None = None,
    batch_rows: int | None = 64 * 1024,
    row_group_rows: int | None = 16 * 1024,
    concurrency=None,
) -> rd.Dataset:
    """Ray-scale sink emitting REAL Parquet partition files whose pages are
    produced by OUR encoders (sources/parquet_compat.py) — the drop-in role of
    the reference's FileWriter for users who need standard .parquet output,
    with the same content-hash partition ids + lineage manifest as the .rdpg
    path. Any parquet reader (pyarrow, DuckDB, Spark, parquet-go itself)
    consumes the output."""
    import hashlib

    from ..sources.parquet_compat import write_parquet_with_our_kernels

    class ParquetEncodeStage:
        def __init__(self):
            fsio.makedirs(out_dir)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import tempfile

            # stage locally (the parquet writer wants a seekable file), then
            # one atomic publish through fsio — URI-capable
            with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as tf:
                tmp_name = tf.name
            try:
                write_parquet_with_our_kernels(batch, tmp_name, compression=compression,
                                               column_encoding=column_encoding,
                                               row_group_rows=row_group_rows)
                with open(tmp_name, "rb") as f:
                    body = f.read()
            finally:  # a writer error must not leak the staging file
                if os.path.exists(tmp_name):
                    os.remove(tmp_name)
            pid = hashlib.blake2b(body, digest_size=12).hexdigest()
            path = fsio.join(out_dir, f"part-{pid}.parquet")
            fsio.write_bytes_atomic(path, body)
            lineage = {
                "partition_id": pid, "path": path, "num_rows": batch.num_rows,
                "bytes_in": batch.nbytes, "bytes_out": len(body),
                "codecs": dict(column_encoding or {}), "pages": {},
                "crc32": 0,
            }
            mf.write_record(out_dir, lineage)
            from ..stages.codec import _lineage_table

            return _lineage_table(lineage)

    if concurrency is None:
        lo, hi = _default_concurrency()
        concurrency = max(2, hi - 2)
    return ds.map_batches(
        ParquetEncodeStage,
        batch_format="pyarrow",
        batch_size=batch_rows,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
