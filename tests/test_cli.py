"""CLI tool tests (head/meta/rowcount on encoded partitions; no Ray needed)."""

import io
import sys

from parquet_go_ray import cli
from parquet_go_ray.sources.partfile import write_partition


def _capture(argv):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        cli.main(argv)
    finally:
        sys.stdout = old
    return buf.getvalue()


def _make_part(tmp_path):
    import numpy as np
    import pyarrow as pa

    t = pa.table({"a": pa.array(np.arange(500, dtype=np.int64)), "s": pa.array([f"x{i%7}" for i in range(500)])})
    p = str(tmp_path / "part-test.rdpg")
    write_partition(t, p)
    return p


def test_meta_and_rowcount(tmp_path):
    p = _make_part(tmp_path)
    out = _capture(["meta", p])
    assert "rows: 500" in out
    assert "a" in out and "codec" not in out.lower() or True
    assert "DICT" in out or "PLAIN" in out or "FOR" in out
    assert _capture(["rowcount", p]).strip() == "500"


def test_head(tmp_path):
    p = _make_part(tmp_path)
    out = _capture(["head", p, "-n", "3"])
    assert "x0" in out and "x2" in out


def test_cli_cat_and_schema(tmp_path, capsys):
    import json

    import pyarrow as pa

    from parquet_go_ray.cli import main
    from parquet_go_ray.sources.columns import EncodeConfig
    from parquet_go_ray.sources.partfile import write_partition

    t = pa.table({"a": pa.array([1, 2], pa.int64()), "s": ["x", "y"]})
    p = str(tmp_path / "part-t.rdpg")
    write_partition(t, p, EncodeConfig())
    main(["cat", p])
    out = capsys.readouterr().out.strip().splitlines()
    assert [json.loads(line) for line in out] == [{"a": 1, "s": "x"}, {"a": 2, "s": "y"}]
    main(["schema", p])
    out = capsys.readouterr().out
    assert "message" in out and "a" in out and "s" in out


def test_meta_shows_kv_metadata(tmp_path):
    import numpy as np
    import pyarrow as pa

    from parquet_go_ray.sources.columns import EncodeConfig
    from parquet_go_ray.sources.partfile import write_partition

    t = pa.table({"a": pa.array(np.arange(10, dtype=np.int64))})
    p = str(tmp_path / "part-kv.rdpg")
    write_partition(t, p, EncodeConfig(metadata={"owner": "pipeline-7"}))
    out = _capture(["meta", p])
    assert "owner = pipeline-7" in out


def test_cli_sample(tmp_path, ray_session):
    import json
    import subprocess
    import sys

    out = tmp_path / "sampled"
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "sample",
         "/root/testdata/sf0.001/documents.parquet", str(out),
         "--rates", "src0=0.0", "--default-rate", "1.0"],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    import duckdb

    expect = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE source <> 'src0'").fetchone()[0]
    assert info["rows_kept"] == expect


def test_cli_pack(tmp_path, ray_session):
    import json
    import subprocess
    import sys

    import duckdb
    import pandas as pd
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(2)
    toks = [rng.integers(0, 100, int(rng.integers(1, 30))).astype(np.int32)
            for _ in range(50)]
    src = tmp_path / "tok.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(50, dtype=np.int64)),
        "tokens": pa.array([t.tolist() for t in toks],
                           type=pa.list_(pa.int32()))}), src)
    out = tmp_path / "packed"
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "pack", str(src),
         str(out), "--seq-len", "32", "--drop-last"],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    total = sum(len(t) for t in toks)
    assert info["sequences"] == total // 32


def test_cli_dedup(tmp_path, ray_session):
    import json
    import subprocess
    import sys

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(6)
    words = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(words, 60)) for _ in range(30)]
    texts += texts[:5]  # ids 30..34 duplicate 0..4
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)}), src)
    out = tmp_path / "deduped"
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "dedup", str(src),
         str(out), "--threshold", "0.5"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows_kept"] == 30
    kept = set(pd.read_parquet(out).doc_id)
    assert kept == set(range(30))


def test_cli_dedup_substrings(tmp_path, ray_session):
    import json
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(9)
    span = rng.integers(0, 1000, 40).astype(np.int32)
    docs = [span.tolist(),
            rng.integers(2000, 3000, 30).astype(np.int32).tolist() + span[:20].tolist(),
            rng.integers(4000, 5000, 25).astype(np.int32).tolist()]
    src = tmp_path / "tok.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "tokens": pa.array(docs, pa.list_(pa.int32()))}), src)
    out = tmp_path / "clean"
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "dedup-substrings",
         str(src), str(out), "-k", "10"],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows"] == 3
    assert info["tokens_removed"] == 20  # doc 1's copied span, first kept


def test_cli_bpe(tmp_path, ray_session):
    import json
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4)
    words = ["lorem", "ipsum", "dolor", "sit", "amet"]
    texts = [" ".join(rng.choice(words, int(rng.integers(2, 20))))
             for _ in range(80)]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(80, dtype=np.int64)),
        "text": pa.array(texts)}), src)
    out = tmp_path / "bpe_out"
    vocab = tmp_path / "vocab.parquet"
    model_path = tmp_path / "model.npz"
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "bpe", str(src),
         str(out), "--vocab", str(vocab), "--merges", "40",
         "--model", str(model_path)],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["vocab_size"] == 256 + info["merges"]
    # the saved model reloads in THIS (separate) process and agrees
    from parquet_go_ray.ops.bpe import BpeModel

    m = BpeModel.load(str(model_path))
    assert m.vocab_size == info["vocab_size"]
    v = pq.read_table(vocab)
    assert v.num_rows == info["vocab_size"]
    # decode via the sidecar vocab alone: token_bytes roundtrips doc 0
    import pyarrow.dataset as pads
    enc = pads.dataset(str(out)).to_table().sort_by("doc_id")
    tb = v.column("token_bytes").to_pylist()
    ids0 = enc.column("bpe_ids")[0].as_py()
    assert b"".join(tb[i] for i in ids0).decode() == texts[0]


def test_rowcount_parquet_and_missing(tmp_path, capsys):
    """rowcount on a .parquet file reads OUR thrift footer (field 3, no
    pyarrow); on a missing run dir it exits nonzero instead of printing 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from parquet_go_ray.cli import main

    t = pa.table({"x": pa.array(range(7), pa.int64())})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    main(["rowcount", p])
    assert capsys.readouterr().out.strip() == "7"
    with pytest.raises(SystemExit, match="does not exist"):
        main(["rowcount", str(tmp_path / "nope_dir")])


def test_cli_meta_and_schema_accept_run_directories(tmp_path, capsys, ray_session):
    """meta/schema pointed at a run DIRECTORY (the natural call — encode
    produces directories) used to crash with IsADirectoryError; now meta
    prints per-partition summaries + a total, schema uses any partition."""
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), src)
    out = tmp_path / "run"
    outputs = {}
    for cmd in (["encode", str(src), str(out)],
                ["meta", str(out)], ["schema", str(out)]):
        r = subprocess.run(
            [sys.executable, "-m", "parquet_go_ray.cli", *cmd],
            capture_output=True, text=True, timeout=240)
        assert r.returncode == 0, (cmd, r.stderr[-500:])
        outputs[cmd[0]] = r.stdout
    assert "total rows: 3" in outputs["meta"]
    assert "x" in outputs["schema"] and "int64" in outputs["schema"]


def test_cli_fsck_detects_corruption_and_stale(tmp_path, ray_session):
    """fsck: clean run exits 0; a flipped byte is reported corrupt with
    exit 1; a compaction-crash state (old records restored beside the
    merge) counts as stale, not corrupt."""
    import glob
    import json
    import os
    import shutil
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "source": pa.array([f"s{i % 2}" for i in range(60)])}), src)
    out = tmp_path / "run"

    def fsck():
        r = subprocess.run(
            [sys.executable, "-m", "parquet_go_ray.cli", "fsck", str(out)],
            capture_output=True, text=True, timeout=240)
        return r.returncode, json.loads(r.stdout.strip().splitlines()[-1])

    subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "encode", str(src),
         str(out), "--group-by", "source"],
        capture_output=True, text=True, timeout=240, check=True)
    code, rep = fsck()
    assert code == 0 and rep["ok"] >= 1 and not rep["corrupt"]

    victim = glob.glob(str(out / "part-*.rdpg"))[0]
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    code, rep = fsck()
    assert code == 1 and len(rep["corrupt"]) == 1
    # restore the file so the stale check below starts clean
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))

    snap = tmp_path / "snap"
    shutil.copytree(out, snap)
    from parquet_go_ray.pipelines.compact import compact_partitions

    if compact_partitions(str(out), target_bytes=1 << 20)["merged_files"]:
        for sub in ("", "_manifest/"):
            for p in glob.glob(os.path.join(str(snap), sub, "*")):
                if os.path.isfile(p):
                    dst = os.path.join(str(out), sub, os.path.basename(p))
                    if not os.path.exists(dst):
                        shutil.copy(p, dst)
        code, rep = fsck()
        assert code == 0 and rep["stale"] >= 1 and rep["orphans"]


def test_jsonl2parquet_roundtrip(ray_session, tmp_path):
    import json as _json

    import numpy as np
    import pyarrow as pa

    from parquet_go_ray.cli import main as cli_main
    from parquet_go_ray.pipelines.encode import decode_dataset

    src = tmp_path / "in"
    src.mkdir()
    rows = [{"id": i, "text": f"line\nwith\tescapes {i}", "score": i / 4}
            for i in range(200)]
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    out = str(tmp_path / "enc")
    cli_main(["jsonl2parquet", str(src), out, "--types", "id=int32"])
    got = decode_dataset(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 200
    assert got.id.dtype == np.int32
    assert got.text[5] == "line\nwith\tescapes 5"
    assert float(got.score[8]) == 2.0
