"""Command-line tools mirroring the reference's cmd/ utilities.

  cat/head   print rows            (cmd/parquet-tool/cmds/readfile.go:16-45)
  meta       schema + per-stream codec/page layout (readfile.go:111-142)
  rowcount   footer-only count     (cmd/parquet-tool/cmds/rowcount.go)
  split      re-shard a parquet file into N-byte partitions (split.go:31-117)
  csv2parquet  typed CSV -> encoded partitions (cmd/csv2parquet/main.go)
  encode/decode  parquet <-> our partition format

Usage: python -m parquet_go_ray.cli <cmd> [...args]
Each command owns its Ray session (guarded init), per the driver contract.
"""

from __future__ import annotations

import argparse
import base64
import json


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_head(args):
    from .sources.partfile import read_partition

    if args.path.endswith(".rdpg"):
        t = read_partition(args.path)
        print(t.slice(0, args.n).to_pandas().to_string())
    else:
        import pyarrow.parquet as pq

        print(pq.read_table(args.path).slice(0, args.n).to_pandas().to_string())


def cmd_cat(args):
    """Dump every row as JSON lines (parquet-tool cat role, cmds/cat.go)."""
    import json

    from .sources.partfile import read_partition

    if args.path.endswith(".rdpg"):
        t = read_partition(args.path)
    else:
        import pyarrow.parquet as pq

        t = pq.read_table(args.path)
    for row in t.to_pylist():
        print(json.dumps(row, default=str))


def cmd_schema(args):
    """Print the schema in the textual DSL (parquet-tool schema role)."""
    import pyarrow as pa

    from .functions.schema_dsl import from_arrow_schema, print_schema
    from .sources.partfile import read_footer

    path = args.path
    parts = _dir_partitions(path)
    if parts:
        path = parts[0]  # a run dir: every partition shares one schema
    if path.endswith(".rdpg"):
        with open(path, "rb") as f:
            footer = read_footer(f.read())
        schema = pa.ipc.read_schema(pa.BufferReader(base64.b64decode(footer["schema_ipc"])))
    else:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    print(print_schema(from_arrow_schema(schema)))


def _dir_partitions(path: str) -> list[str]:
    """All .rdpg partitions under a run directory (sorted), [] otherwise."""
    import os

    if not os.path.isdir(path):
        return []
    return sorted(os.path.join(path, n) for n in os.listdir(path)
                  if n.endswith(".rdpg"))


def cmd_meta(args):
    import os

    from .sources.partfile import read_footer

    if os.path.isdir(args.path):
        # a run DIRECTORY: per-partition summaries (meta of each file in
        # turn would drown the terminal; -- point at one .rdpg for pages)
        parts = _dir_partitions(args.path)
        if not parts:
            raise SystemExit(f"meta: no .rdpg partitions under {args.path}")
        total = 0
        for p in parts:
            with open(p, "rb") as f:
                footer = read_footer(f.read())
            total += footer["num_rows"]
            print(f"{os.path.basename(p):<44} rows={footer['num_rows']:<9} "
                  f"streams={len(footer['streams'])}")
        print(f"total rows: {total} across {len(parts)} partitions")
        return
    with open(args.path, "rb") as f:
        footer = read_footer(f.read())
    import pyarrow as pa

    schema = pa.ipc.read_schema(pa.BufferReader(base64.b64decode(footer["schema_ipc"])))
    print(f"rows: {footer['num_rows']}")
    if footer.get("blooms"):
        bl = ", ".join(f"{c} ({b['size']} B)" for c, b in footer["blooms"].items())
        print(f"bloom filters: {bl}")
    if footer.get("kv_metadata"):
        print("metadata:")
        for k, v in sorted(footer["kv_metadata"].items()):
            print(f"  {k} = {v}")
    print("schema:")
    for line in str(schema).splitlines():
        print("  " + line)
    print("streams:")
    for s in footer["streams"]:
        dict_note = f" dict({s['dict']['num_values']})" if s.get("dict") else ""
        print(
            f"  {s['path']:<30} {s['kind']:<9} {s['codec']:<16} {s['compression']:<7} "
            f"pages={len(s['pages'])}{dict_note} values={s['num_values']}"
        )


def cmd_fsck(args):
    """Verify a run directory against its manifest: per-partition CRC over
    the file bytes, plus missing-file / orphan-file / stale-(compaction-
    absorbed) record detection. Exit 0 only when every live record's file
    exists and matches its recorded crc32 — the operational bitrot check a
    100 TB layout needs before trusting a resume or a decode."""
    import os
    import zlib

    from .sources import fsio
    from .state import manifest as mf

    records = mf.load_records(args.path)
    if not records:
        raise SystemExit(f"fsck: no manifest records under {args.path}")
    live = {r["partition_id"] for r in mf.drop_covered(records)}
    listed_paths, bad = set(), 0
    report = {"ok": 0, "corrupt": [], "missing": [], "stale": 0, "orphans": []}
    for r in records:
        if r["partition_id"] not in live:
            report["stale"] += 1  # absorbed by a compaction; reconciled reads skip it
            continue
        p = r.get("path", "")
        listed_paths.add(os.path.basename(p))
        if not p or not fsio.exists(p):
            report["missing"].append(r["partition_id"]); bad += 1
            continue
        crc = zlib.crc32(fsio.read_bytes(p)) & 0xFFFFFFFF
        if crc != r.get("crc32"):
            report["corrupt"].append(r["partition_id"]); bad += 1
        else:
            report["ok"] += 1
    for p in fsio.list_files(args.path, ".rdpg"):
        if os.path.basename(p) not in listed_paths:
            report["orphans"].append(os.path.basename(p))
    print(json.dumps(report))
    if bad:
        raise SystemExit(1)


def _tail_footer(f, magic: bytes) -> bytes:
    """Seek-read ONLY the footer of an open binary file laid out as
    ``magic ... footer <u32 footer_len> magic`` — rowcount on a multi-GB
    file must not read the whole file into memory."""
    import os

    size = f.seek(0, os.SEEK_END)
    tail = len(magic) + 4
    if size < 2 * len(magic) + 4:
        raise ValueError("file too short for a footer")
    f.seek(0)
    if f.read(len(magic)) != magic:
        raise ValueError("bad leading magic")
    f.seek(size - tail)
    flen = int.from_bytes(f.read(4), "little")
    if f.read(len(magic)) != magic:
        raise ValueError("bad trailing magic")
    if flen > size - tail - len(magic):
        raise ValueError("footer length exceeds file size")
    f.seek(size - tail - flen)
    return f.read(flen)


def cmd_rowcount(args):
    if args.path.endswith(".rdpg"):
        import json

        from .sources.partfile import MAGIC

        with open(args.path, "rb") as f:
            print(json.loads(_tail_footer(f, MAGIC))["num_rows"])
    elif args.path.endswith(".parquet"):
        # footer-only, our own thrift reader (the reference's `parquet-tool
        # rowcount` shape, cmd/parquet-tool) — FileMetaData field 3
        from .sources.parquet_compat import MAGIC, CompactReader

        with open(args.path, "rb") as f:
            print(CompactReader(_tail_footer(f, MAGIC), 0).read_struct()[3])
    else:
        import os

        from .state import manifest as mf

        records = mf.load_records(args.path)
        if not records and not os.path.isdir(args.path):
            # a missing run directory printed 0 and exited 0 — hide-the-typo
            raise SystemExit(f"rowcount: {args.path} does not exist")
        print(sum(r["num_rows"] for r in records))


def cmd_split(args):
    _ray_session()
    import ray.data as rd

    from .pipelines.encode import encode_dataset
    from .state import manifest as mf

    ds = rd.read_parquet(args.input)
    rows = ds.count()
    size = ds.size_bytes()
    batch_rows = max(1, int(rows * args.size / max(size, 1)))
    encode_dataset(ds, args.out, batch_rows=batch_rows).materialize()
    totals = mf.finalize(args.out)
    print(json.dumps(totals))


def cmd_encode(args):
    _ray_session()
    import ray.data as rd

    from .pipelines.encode import encode_dataset, encode_grouped
    from .sources.columns import EncodeConfig
    from .state import manifest as mf

    ds = rd.read_parquet(args.input)
    cfg = EncodeConfig(mode=args.mode, compression=args.compression,
                       bloom_columns=tuple(args.bloom.split(","))
                       if args.bloom else ())
    if args.group_by:
        encode_grouped(ds, args.out, key=args.group_by, config=cfg).materialize()
    else:
        encode_dataset(ds, args.out, cfg).materialize()
    print(json.dumps(mf.finalize(args.out)))


def cmd_decode(args):
    _ray_session()
    from .pipelines.encode import decode_dataset

    ds = decode_dataset(args.input, columns=args.columns.split(",") if args.columns else None)
    ds.write_parquet(args.out)
    print(json.dumps({"rows": ds.count(), "out": args.out}))


def cmd_dedup(args):
    """Near-dedup a parquet corpus end-to-end (candidates -> verify ->
    connected components -> canonical keep-set) and write the survivors."""
    _ray_session()
    import ray.data as rd

    from .ops.cluster import dedup_near

    ds = rd.read_parquet(args.input)
    # --threshold means different things per method: Jaccard for minhash,
    # cosine tau for embedding; simhash buckets on Hamming distance and
    # takes no threshold at all (forwarding one would TypeError).
    kw = {}
    if args.method == "minhash":
        kw["threshold"] = args.threshold
    elif args.method == "embedding":
        kw["tau"] = args.threshold
        kw["vec_col"] = args.vec_col
    out = dedup_near(ds, method=args.method, id_col=args.id_col,
                     text_col=args.text_col, **kw)
    out.write_parquet(args.out)
    kept = out.count()
    print(json.dumps({"rows_kept": kept, "out": args.out}))


def cmd_dedup_substrings(args):
    """Exact substring dedup (Lee et al. 2022): remove every duplicated
    >=k-token span from all but its first occurrence."""
    _ray_session()
    import ray.data as rd

    from .ops.substring import dedup_substrings

    ds = rd.read_parquet(args.input)
    out = dedup_substrings(ds, k=args.k, tokens_col=args.tokens_col,
                           id_col=args.id_col, mode=args.mode)
    out.write_parquet(args.out)
    stats = {"rows": out.count(), "out": args.out}
    if args.mode == "remove":
        stats["tokens_removed"] = int(out.sum("n_removed") or 0)
    print(json.dumps(stats))


def cmd_sample(args):
    """Stratified (data-mixture) sampling: --rates src0=0.1,src1=1.0 ..."""
    _ray_session()
    import ray.data as rd

    from .ops.text import stratified_sample

    rates = {}
    for part in (args.rates or "").split(","):
        if part:
            k, v = part.split("=")
            rates[k] = float(v)
    ds = rd.read_parquet(args.input)
    out = stratified_sample(ds, rates, key_col=args.key_col,
                            id_col=args.id_col, salt=args.salt,
                            default_rate=args.default_rate)
    out.write_parquet(args.out)
    print(json.dumps({"rows_kept": out.count(), "out": args.out}))


def cmd_pack(args):
    """Pack a token table (id-sorted parquet with a list<int> column) into
    fixed-length training sequences."""
    _ray_session()
    import ray.data as rd

    from .ops.text import pack_token_sequences

    ds = rd.read_parquet(args.input)
    out = pack_token_sequences(ds, seq_len=args.seq_len, id_col=args.id_col,
                               tokens_col=args.tokens_col,
                               drop_last=args.drop_last)
    out.write_parquet(args.out)
    print(json.dumps({"sequences": out.count(), "seq_len": args.seq_len,
                      "out": args.out}))


def cmd_bpe(args):
    """Train a byte-level BPE tokenizer on a text column and tokenize the
    corpus: writes the tokenized table (bpe_ids list<int32> + n_bpe) and a
    sidecar vocab parquet (token_id, token_bytes, left, right)."""
    _ray_session()
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from .ops.bpe import apply_bpe, train_bpe

    ds = rd.read_parquet(args.input)
    model = train_bpe(ds, num_merges=args.merges, text_col=args.text_col,
                      min_count=args.min_count)
    out = apply_bpe(ds, model, text_col=args.text_col)
    out.write_parquet(args.out)
    m = model.merges
    vocab = pa.table({
        "token_id": pa.array(np.arange(model.vocab_size, dtype=np.int32)),
        "token_bytes": pa.array(model.token_bytes, pa.binary()),
        "left": pa.array(np.concatenate([np.full(256, -1, np.int32), m[:, 0]])),
        "right": pa.array(np.concatenate([np.full(256, -1, np.int32), m[:, 1]])),
    })
    pq.write_table(vocab, args.vocab)
    if args.model:
        model.save(args.model)  # reusable: BpeModel.load() in later jobs
    print(json.dumps({"vocab_size": model.vocab_size,
                      "merges": int(len(model.merges)),
                      "out": args.out, "vocab": args.vocab,
                      "model": args.model}))


def cmd_csv2parquet(args):
    """Typed CSV ingest: -type col=int64,col2=string like the reference's
    csv2parquet type hints (cmd/csv2parquet/main.go:367-435)."""
    _ray_session()
    import pyarrow as pa
    import ray.data as rd

    from .pipelines.encode import encode_dataset
    from .state import manifest as mf

    hints = _parse_type_hints(args.types)
    ds = rd.read_csv(args.input)
    if hints:
        def cast(batch: pa.Table) -> pa.Table:
            fields = [
                pa.field(f.name, hints.get(f.name, f.type)) for f in batch.schema
            ]
            return batch.cast(pa.schema(fields))

        ds = ds.map_batches(cast, batch_format="pyarrow")
    encode_dataset(ds, args.out).materialize()
    print(json.dumps(mf.finalize(args.out)))


def cmd_lookup(args):
    """Point lookup over an encoded run: Bloom/stats/dict-page partition
    pruning + exact row filter; prints matching rows as JSON lines."""
    _ray_session()
    import json as _json

    from .pipelines.encode import point_lookup

    vals = []
    for v in args.values.split(","):
        try:
            vals.append(int(v))
        except ValueError:
            vals.append(v)
    t = point_lookup(args.path, args.col,
                     vals if len(vals) > 1 else vals[0],
                     columns=args.columns.split(",") if args.columns else None)
    for row in t.to_pylist():
        print(_json.dumps(row, default=str))


def cmd_jsonl2parquet(args):
    """Typed JSON-Lines ingest — the LLM-corpus sibling of csv2parquet
    (documents usually arrive as .jsonl): ray.data.read_json streams the
    lines, optional --types casts match csv2parquet's hint syntax, and the
    full codec stack + lineage manifest applies."""
    _ray_session()
    import pyarrow as pa
    import ray.data as rd

    from .pipelines.encode import encode_dataset
    from .state import manifest as mf

    hints = _parse_type_hints(args.types)
    ds = rd.read_json(args.input)
    if hints:
        def cast(batch: pa.Table) -> pa.Table:
            fields = [
                pa.field(f.name, hints.get(f.name, f.type)) for f in batch.schema
            ]
            return batch.cast(pa.schema(fields))

        ds = ds.map_batches(cast, batch_format="pyarrow")
    encode_dataset(ds, args.out).materialize()
    print(json.dumps(mf.finalize(args.out)))


def _parse_type_hints(spec_text):
    import pyarrow as pa

    type_map = {
        "boolean": pa.bool_(), "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
        "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(),
        "uint64": pa.uint64(), "float": pa.float32(), "double": pa.float64(),
        "bytes": pa.binary(), "string": pa.string(), "json": pa.string(),
    }
    hints = {}
    for spec in (spec_text or "").split(","):
        if "=" in spec:
            col, t = spec.split("=", 1)
            hints[col] = type_map[t]
    return hints


def _byte_size(text):
    """argparse type: human byte sizes ("128MB", "1.5GiB", plain ints)."""
    from .functions.timeutil import parse_byte_size

    return parse_byte_size(text)


def main(argv=None):
    p = argparse.ArgumentParser(prog="parquet_go_ray.cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("head"); s.add_argument("path"); s.add_argument("-n", type=int, default=10); s.set_defaults(fn=cmd_head)
    s = sub.add_parser("meta"); s.add_argument("path"); s.set_defaults(fn=cmd_meta)
    s = sub.add_parser("cat"); s.add_argument("path"); s.set_defaults(fn=cmd_cat)
    s = sub.add_parser("schema"); s.add_argument("path"); s.set_defaults(fn=cmd_schema)
    s = sub.add_parser("rowcount"); s.add_argument("path"); s.set_defaults(fn=cmd_rowcount)
    s = sub.add_parser("fsck"); s.add_argument("path"); s.set_defaults(fn=cmd_fsck)
    s = sub.add_parser("split"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--size", type=_byte_size, default=128 << 20); s.set_defaults(fn=cmd_split)
    s = sub.add_parser("encode"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--mode", default="extended"); s.add_argument("--compression", default="snappy"); s.add_argument("--group-by"); s.add_argument("--bloom", help="comma-separated columns to build split-block Bloom filters for (point-lookup pruning)"); s.set_defaults(fn=cmd_encode)
    s = sub.add_parser("decode"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--columns"); s.set_defaults(fn=cmd_decode)
    s = sub.add_parser("csv2parquet"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--types"); s.set_defaults(fn=cmd_csv2parquet)
    s = sub.add_parser("jsonl2parquet"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--types"); s.set_defaults(fn=cmd_jsonl2parquet)
    s = sub.add_parser("lookup"); s.add_argument("path"); s.add_argument("--col", required=True); s.add_argument("--values", required=True, help="comma-separated; ints auto-detected"); s.add_argument("--columns"); s.set_defaults(fn=cmd_lookup)
    s = sub.add_parser("dedup"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--method", default="minhash", choices=["minhash", "simhash", "embedding"]); s.add_argument("--id-col", default="doc_id"); s.add_argument("--text-col", default="text"); s.add_argument("--vec-col", default="embedding"); s.add_argument("--threshold", type=float, default=0.7); s.set_defaults(fn=cmd_dedup)
    s = sub.add_parser("dedup-substrings"); s.add_argument("input"); s.add_argument("out"); s.add_argument("-k", type=int, default=50); s.add_argument("--tokens-col", default="tokens"); s.add_argument("--id-col", default="doc_id"); s.add_argument("--mode", default="remove", choices=["remove", "flag"]); s.set_defaults(fn=cmd_dedup_substrings)
    s = sub.add_parser("sample"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--rates", required=True); s.add_argument("--key-col", default="source"); s.add_argument("--id-col", default="doc_id"); s.add_argument("--salt", type=int, default=0); s.add_argument("--default-rate", type=float, default=1.0); s.set_defaults(fn=cmd_sample)
    s = sub.add_parser("pack"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--seq-len", type=int, default=2048); s.add_argument("--id-col", default="doc_id"); s.add_argument("--tokens-col", default="tokens"); s.add_argument("--drop-last", action="store_true"); s.set_defaults(fn=cmd_pack)
    s = sub.add_parser("bpe"); s.add_argument("input"); s.add_argument("out"); s.add_argument("--vocab", required=True); s.add_argument("--merges", type=int, default=512); s.add_argument("--text-col", default="text"); s.add_argument("--min-count", type=int, default=1); s.add_argument("--model", default=None, help="also save the reusable model blob (BpeModel.load)"); s.set_defaults(fn=cmd_bpe)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
