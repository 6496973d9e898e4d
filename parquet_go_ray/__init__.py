"""parquet_go_ray — a Ray-Data-native per-column lightweight-compression engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
fraugster/parquet-go: per-column encoding (PLAIN, RLE/bit-packed hybrid,
RLE_DICTIONARY, DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY),
plus the north-star additions (FSST-style string compression,
frame-of-reference + delta), a codec auto-selector replicating parquet-go's
decision rules (reference: /root/reference/chunk_writer.go:174-209,
type_dict.go:91-133), and Ray Data pipelines (map_batches over zero-copy Arrow,
actor pools for stateful codec state, salted groupby-on-source partitioning,
per-partition lineage manifests for resume).

Layout:
  functions/  pure numpy/pyarrow codec kernels + scalar helpers (no Ray)
  sources/    partition file format (writer/reader) + manifest I/O
  stages/     map_batches stage callables (encode/decode actors, text ops)
  pipelines/  end-to-end Ray Data pipelines (encode, decode, dedup, knn, ...)
  state/      codec selection state, lineage records, checkpoint/resume
  ops/        training-data operators (dedup, similarity, text analysis,
              multimodal plumbing)
"""

__version__ = "0.1.0"
