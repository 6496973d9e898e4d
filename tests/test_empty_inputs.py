"""Empty-corpus robustness sweep: every major op must return a typed empty
result (never crash) on a zero-row input — the degenerate case every
scheduled production pipeline eventually feeds it (an empty shard, a filter
that matched nothing, a day with no events). Round-5 finds: semantic_dedup
(ADVICE r4) and dedup_exact both crashed here; the rest held."""
import pyarrow as pa
import ray.data as rd


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "source": pa.array([], pa.string())}))


def _toks():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "tokens": pa.array([], pa.list_(pa.int32())),
        "n_tok": pa.array([], pa.int32())}))


def _embs():
    return rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))


def _events():
    return rd.from_arrow(pa.table({
        "key": pa.array([], pa.string()),
        "ts_us": pa.array([], pa.int64()),
        "value": pa.array([], pa.float64())}))


def test_dedup_exact_empty(ray_session):
    from parquet_go_ray.ops.dedup import dedup_exact

    r = dedup_exact(_docs())
    assert r.count() == 0
    assert set(r.schema().names) == {"doc_id", "dup_count"}


def test_dedup_candidates_and_near_empty(ray_session):
    from parquet_go_ray.ops.cluster import dedup_near
    from parquet_go_ray.ops.dedup import (embedding_neardup_lsh,
                                          minhash_candidate_pairs)

    assert minhash_candidate_pairs(_docs()).count() == 0
    assert dedup_near(_docs(), method="minhash").count() == 0
    assert dedup_near(_docs(), method="simhash").count() == 0
    assert dedup_near(_embs(), method="embedding", id_col="vec_id").count() == 0
    assert embedding_neardup_lsh(_embs(), tau=0.9).count() == 0


def test_semantic_dedup_empty(ray_session):
    from parquet_go_ray.ops.cluster import semantic_dedup

    assert semantic_dedup(_embs(), tau=0.9).count() == 0


def test_text_ops_empty(ray_session):
    from parquet_go_ray.ops.bpe import train_bpe
    from parquet_go_ray.ops.shuffle import deterministic_shuffle_rank
    from parquet_go_ray.ops.text import (build_vocab, pack_sequences,
                                         pack_token_sequences)

    assert train_bpe(_docs(), num_merges=8).vocab_size == 256
    assert pack_sequences(_toks()).count() == 0
    assert pack_token_sequences(_toks()).count() == 0
    assert build_vocab(_docs()).count() == 0
    assert deterministic_shuffle_rank(_docs(), seed=1).count() == 0


def test_windows_and_sketches_empty(ray_session):
    from parquet_go_ray.ops.sketch import heavy_hitters
    from parquet_go_ray.ops.substring import dedup_substrings
    from parquet_go_ray.ops.window import session_windows, tumbling_window

    assert session_windows(_events()).count() == 0
    assert tumbling_window(_events(), width_us=10).count() == 0
    assert len(heavy_hitters(_docs(), "source", k=4)) == 0
    assert dedup_substrings(_toks(), k=10).count() == 0


def test_dedup_exact_null_text_matches_sql(ray_session):
    """Null content is one distinct GROUP BY group. Two stacked bugs used
    to break this: pandas groupby dropped null keys (dropna default), and
    _attach_text told pair rows from text rows by the attached value's
    NULLness, misclassifying genuinely-null texts and dropping their pairs
    (null hashes like "", so null texts always reach the verify pass when
    an empty text exists)."""
    from parquet_go_ray.ops.dedup import dedup_exact

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([None, None, "ok", "", "ok"], pa.string())})
    got = sorted(dedup_exact(rd.from_arrow(t)).to_pandas()
                 .itertuples(index=False))
    assert [(r[0], r[1]) for r in got] == [(1, 2), (3, 2), (4, 1)]


def test_join_null_keys_match_sql(ray_session):
    """SQL semantics: NULL never equals NULL. broadcast_join used to
    index_in-match null probe keys to a null build key (inner-joining rows
    SQL drops); asof/range rode an UNDEFINED NaN->int64 cast for null
    timestamps (platform-dependent — 0 would silently match a real row)."""
    import pytest

    from parquet_go_ray.ops.join import (asof_join_broadcast, broadcast_join,
                                         range_join_broadcast)

    L = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 2, None], pa.int64()),
        "lv": pa.array([10, 20, 30, 40], pa.int64())}))
    R = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                  "rv": pa.array([100, 200, 300], pa.int64())})
    inner = broadcast_join(L, R, on="k").to_pandas()
    assert inner.to_dict("records") == [{"k": 1, "lv": 10, "rv": 100}]
    left = broadcast_join(L, R, on="k", how="left").to_pandas().sort_values("lv")
    assert left.rv.notna().tolist() == [True, False, False, False]

    ts = rd.from_arrow(pa.table({
        "ts": pa.array([5, None, 15], pa.int64()),
        "lv": pa.array([1, 2, 3], pa.int64())}))
    D = pa.table({"dts": pa.array([0, 10], pa.int64()),
                  "dv": pa.array([100, 200], pa.int64())})
    asof = asof_join_broadcast(ts, D, ts_col="ts",
                               dim_ts_col="dts").to_pandas().sort_values("lv")
    assert asof.dv.tolist()[0] == 100 and pa.compute.is_null(
        pa.array(asof.dv)).to_pylist() == [False, True, False]

    RNG = pa.table({"lo": pa.array([0, 10], pa.int64()),
                    "hi": pa.array([9, 20], pa.int64()),
                    "rv": pa.array([7, 8], pa.int64())})
    rj = range_join_broadcast(ts, RNG, value_col="ts", lo_col="lo",
                              hi_col="hi").to_pandas().sort_values("lv")
    assert rj.rv.notna().tolist() == [True, False, True]
    with pytest.raises(ValueError, match="null-free"):
        range_join_broadcast(ts, pa.table({
            "lo": pa.array([None], pa.int64()),
            "hi": pa.array([5], pa.int64()),
            "rv": pa.array([1], pa.int64())}),
            value_col="ts", lo_col="lo", hi_col="hi")


def test_approx_distinct_ignores_nulls(ray_session):
    """SQL count(distinct) semantics: nulls are not a value. The HLL used
    to hash nulls (like ""), counting an all-null column as ~1 distinct
    and conflating null with a genuinely empty string."""
    from parquet_go_ray.ops.sketch import approx_distinct

    nulls = rd.from_arrow(pa.table({"x": pa.array([None] * 3, pa.string())}))
    assert approx_distinct(nulls, "x") == 0.0
    mixed = rd.from_arrow(pa.table(
        {"x": pa.array(["a", None, "", "a"], pa.string())}))
    assert round(approx_distinct(mixed, "x")) == 2
