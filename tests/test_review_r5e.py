"""Round-5 fifth review batch (text / window / substring ops), pinned."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def test_pack_tokens_zero_length_docs_no_duplicate_seqs(ray_session):
    # a zero-token doc's degenerate fragment could emit a DUPLICATE all-pad
    # row for a sequence another block assembles for real
    from parquet_go_ray.ops.text import pack_token_sequences

    t = pa.table({
        "doc_id": pa.array(np.arange(8, dtype=np.int64)),
        "tokens": pa.array([[1, 2, 3], [], [4, 5], [], [6], [7, 8, 9, 10],
                            [], [11, 12]], pa.list_(pa.int64())),
    })
    out = pa.concat_tables(list(
        pack_token_sequences(rd.from_arrow(t).repartition(4), seq_len=4)
        .iter_batches(batch_format="pyarrow")))
    seqs = out.column("seq_id").to_pylist()
    assert len(seqs) == len(set(seqs)), "duplicate seq_id rows"
    flat = [x for row in out.column("tokens").to_pylist() for x in row]
    toks = [x for x in flat if x != 0]
    assert sorted(toks) == list(range(1, 13))


def test_substring_flag_counts_exact_with_trailing_empty_doc(ray_session):
    from parquet_go_ray.ops.substring import dedup_substrings

    # doc 1 repeats doc 0's 6-gram run; doc 2 is empty and sits LAST in the
    # batch — the clipped reduceat credited doc 1's final token to it
    base = list(range(100, 150))
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "tokens": pa.array([base, base, []], pa.list_(pa.int64())),
    })
    out = pa.concat_tables(list(
        dedup_substrings(rd.from_arrow(t), k=10, mode="flag")
        .iter_batches(batch_format="pyarrow"))).sort_by("doc_id")
    n_dup = dict(zip(out.column("doc_id").to_pylist(),
                     out.column("n_dup_tokens").to_pylist()))
    assert n_dup[2] == 0
    assert n_dup[0] + n_dup[1] == 50  # the duplicated copy fully counted
    assert max(n_dup[0], n_dup[1]) == 50  # exactly one doc flagged in full


def test_pack_sequences_two_empty_blocks_ok(ray_session):
    from parquet_go_ray.ops.text import pack_sequences

    t = pa.table({"doc_id": pa.array(np.arange(10, dtype=np.int64)),
                  "n_tok": pa.array([5] * 10, pa.int64())})
    ds = rd.from_arrow(t).repartition(4).filter(lambda r: r["doc_id"] < 3)
    # several blocks are now empty; the duplicate-fingerprint guard must
    # not fire on their shared degenerate fp
    out = pack_sequences(ds, seq_len=8).to_pandas()
    assert len(out) == 3


def test_lang_id_null_text_is_unknown(ray_session):
    from parquet_go_ray.ops.text import LangId

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["the quick brown fox and the dog",
                                    None, ""])})
    out = LangId()(t)
    preds = out.column("lang_pred").to_pylist()
    assert preds[1] == "unknown" and preds[2] == "unknown"
    assert preds[0] != "unknown"


def test_split_and_sample_reject_null_ids(ray_session):
    from parquet_go_ray.ops.text import stratified_sample, train_val_split

    t = pa.table({"doc_id": pa.array([1, None], pa.int64()),
                  "source": pa.array(["a", "a"])})
    with pytest.raises(Exception, match="null doc_id"):
        train_val_split(rd.from_arrow(t)).count()
    with pytest.raises(Exception, match="null doc_id"):
        stratified_sample(rd.from_arrow(t), rates={"a": 0.5}).count()


def test_stratified_rate_not_truncated_a_basis_point():
    from parquet_go_ray.ops.text import stratified_sample  # noqa: F401
    # 0.57 * 10_000 is 5699.999... in binary; int() dropped bucket 5699
    assert round(0.57 * 10_000) == 5700


def test_char_lm_rejects_unimplemented_order():
    from parquet_go_ray.ops.text import train_char_lm

    with pytest.raises(ValueError, match="only order=3"):
        train_char_lm(["abc"], order=5)
