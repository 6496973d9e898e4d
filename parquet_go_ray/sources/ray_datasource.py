"""Idiomatic Ray Data integration: a FileBasedDatasource for .rdpg files.

``read_rdpg(paths)`` gives the full Ray Data source experience — parallel
file reads, streaming execution, column projection pushed into the decoder —
as an alternative to :func:`pipelines.encode.decode_dataset` (which is
manifest-driven). Public API modeled on ray.data's own file datasources.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource

from .partfile import decode_table


class RdpgDatasource(FileBasedDatasource):
    """Reads our partition files; one file -> one block."""

    _FILE_EXTENSIONS = ["rdpg"]

    def __init__(self, paths, columns: list[str] | None = None, **file_based_datasource_kwargs):
        file_based_datasource_kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
        super().__init__(paths, **file_based_datasource_kwargs)
        self._columns = columns

    def _read_stream(self, f: "pa.NativeFile", path: str):
        blob = f.readall()
        yield decode_table(blob, self._columns)


def read_rdpg(paths, columns: list[str] | None = None, **kwargs):
    """ray.data.read_* -style entry point for encoded partition directories/files."""
    import ray.data as rd

    return rd.read_datasource(RdpgDatasource(paths, columns=columns), **kwargs)
