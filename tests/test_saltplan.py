import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parquet_go_ray.pipelines.encode import encode_grouped, decode_dataset


def _table(n):
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "source": pa.array([f"s{i % 2}" for i in range(n)]),
                     "text": pa.array(["x" * 100] * n)})


def test_resume_same_input_ok(ray_session, tmp_path):
    out = str(tmp_path / "r")
    t = _table(2000)
    encode_grouped(rd.from_arrow(t), out, key="source",
                   target_partition_bytes=32 * 1024).materialize()
    # same input resumes cleanly (all groups skip)
    lin = encode_grouped(rd.from_arrow(t), out, key="source",
                         target_partition_bytes=32 * 1024).to_pandas()
    assert lin.bytes_out.sum() == 0  # everything skipped
    assert decode_dataset(out).count() == 2000


def test_resume_changed_input_raises(ray_session, tmp_path):
    out = str(tmp_path / "r2")
    encode_grouped(rd.from_arrow(_table(2000)), out, key="source",
                   target_partition_bytes=32 * 1024).materialize()
    # grown input -> different fan-out -> resume must refuse, not mis-assign
    with pytest.raises(Exception, match="salt plan changed"):
        encode_grouped(rd.from_arrow(_table(6000)), out, key="source",
                       target_partition_bytes=32 * 1024).materialize()
    # resume=False into a fresh dir is the documented path
    out2 = str(tmp_path / "r3")
    encode_grouped(rd.from_arrow(_table(6000)), out2, key="source",
                   target_partition_bytes=32 * 1024, resume=False).materialize()
    assert decode_dataset(out2).count() == 6000
