"""Token-table fixture: determinism, strata coverage, full pipeline roundtrip."""

import numpy as np
import pyarrow as pa

from parquet_go_ray.sources.columns import EncodeConfig
from parquet_go_ray.sources.fixtures import SOURCES, token_table_shard
from parquet_go_ray.sources.partfile import decode_table, encode_table


def test_deterministic():
    a = token_table_shard(2000, shard=3)
    b = token_table_shard(2000, shard=3)
    assert a.equals(b)
    c = token_table_shard(2000, shard=4)
    assert not a.equals(c)


def test_schema_and_invariants():
    t = token_table_shard(5000, shard=0)
    assert t.schema.names == ["doc_id", "tokens", "n_tok", "source"]
    assert t.column("tokens").type == pa.list_(pa.int32())
    n_tok = t.column("n_tok").to_numpy()
    lens = np.array([len(x) for x in t.column("tokens").to_pylist()])
    np.testing.assert_array_equal(n_tok, lens)
    assert (lens == 0).any(), "fixture must include empty token lists"
    srcs = set(t.column("source").to_pylist())
    assert {"web", "low_card", "sorted", "constant"} <= srcs


def test_roundtrip_both_modes():
    t = token_table_shard(3000, shard=1)
    for mode in ("extended", "reference"):
        blob, lineage = encode_table(t, EncodeConfig(mode=mode))
        out = decode_table(blob)
        assert out.column("tokens").combine_chunks().equals(t.column("tokens").combine_chunks()), mode
        assert out.column("doc_id").combine_chunks().equals(t.column("doc_id").combine_chunks()), mode
    # extended mode must not be larger than reference mode
    b_ext, _ = encode_table(t, EncodeConfig(mode="extended"))
    b_ref, _ = encode_table(t, EncodeConfig(mode="reference"))
    assert len(b_ext) <= len(b_ref) * 1.02
