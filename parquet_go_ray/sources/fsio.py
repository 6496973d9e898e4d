"""URI-aware filesystem IO for .rdpg partitions and the lineage manifest.

The abstraction role of the reference's ``io.ReadSeeker`` / ``io.Writer``
surfaces (/root/reference/file_reader.go:32, file_writer.go:46): every read,
write, list and delete on partition files and manifest records goes through
this module, so the engine runs unchanged over plain local paths,
``file://`` URIs, and object-store URIs (``s3://``, ``gs://`` — any scheme
``pyarrow.fs.FileSystem.from_uri`` resolves). At 100 TB the corpus lives in
object storage; local-disk-only ``open()`` calls would gate the engine to one
box.

Atomic-visibility discipline (the resume path relies on "a partially-written
partition never looks committed"):
  * local filesystems: tmp file + ``os.replace`` (optionally fsync) — the
    reference's own discipline;
  * object stores: a direct single PUT — the object becomes visible only
    when the upload completes, so an interrupted write never surfaces a
    torn file (rename does not exist there; copy+delete would be slower and
    LESS atomic).

Local paths keep native ``open()`` fast paths — no pyarrow stream overhead
on the hot single-box benchmark path.
"""

from __future__ import annotations

import os
import posixpath


def _split_uri(path: str) -> tuple[str | None, str]:
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return scheme, rest
    return None, path


def is_uri(path: str) -> bool:
    return "://" in path


def is_local(path: str) -> bool:
    scheme, _ = _split_uri(path)
    return scheme is None or scheme == "file"


def resolve(path: str):
    """-> (pyarrow.fs.FileSystem, fs-internal path). Import deferred so the
    local fast paths never pay for it."""
    from pyarrow import fs as pafs

    if is_uri(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _local_path(path: str) -> str:
    """Strip a file:// scheme; callers must have checked is_local()."""
    scheme, rest = _split_uri(path)
    return rest if scheme == "file" else path


def join(base: str, *parts: str) -> str:
    if is_uri(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def basename(path: str) -> str:
    return posixpath.basename(_split_uri(path)[1])


def makedirs(path: str) -> None:
    if is_local(path):
        os.makedirs(_local_path(path) or ".", exist_ok=True)
        return
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)  # no-op namespace on object stores


def exists(path: str) -> bool:
    if is_local(path):
        return os.path.exists(_local_path(path))
    from pyarrow import fs as pafs

    fs, p = resolve(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def file_size(path: str) -> int:
    if is_local(path):
        return os.path.getsize(_local_path(path))
    from pyarrow import fs as pafs

    fs, p = resolve(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        # size is None for NotFound entries — callers doing min(size, n)
        # would die with an opaque TypeError instead of a clean not-found
        raise FileNotFoundError(path)
    return info.size


def read_bytes(path: str) -> bytes:
    if is_local(path):
        with open(_local_path(path), "rb") as f:
            return f.read()
    fs, p = resolve(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def read_range(path: str, offset: int, size: int) -> bytes:
    """Random-access read — footer-only / dictionary-page-only reads must not
    pull the whole object (the reference's ReadSeeker role)."""
    if is_local(path):
        with open(_local_path(path), "rb") as f:
            f.seek(offset)
            return f.read(size)
    fs, p = resolve(path)
    with fs.open_input_file(p) as f:
        f.seek(offset)
        return f.read(size)


def read_tail(path: str, nbytes: int) -> tuple[bytes, int]:
    """-> (last min(nbytes, size) bytes, total size). One ranged read."""
    size = file_size(path)
    tail = min(size, nbytes)
    return read_range(path, size - tail, tail), size


def write_bytes_atomic(path: str, data, *, fsync: bool = False) -> None:
    """All-or-nothing write: tmp+rename locally, single PUT on object stores."""
    if is_local(path):
        p = _local_path(path)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        # pid alone is not unique enough: a zombie retry on shared storage
        # (or two threads in one process) must never interleave into one
        # tmp file and publish a torn partition
        import uuid

        tmp = f"{p}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            if fsync:
                f.flush()
                os.fsync(f.fileno())
        os.replace(tmp, p)
        return
    fs, p = resolve(path)
    parent = posixpath.dirname(p)
    if parent:
        fs.create_dir(parent, recursive=True)  # namespace no-op on object stores
    with fs.open_output_stream(p) as f:
        f.write(bytes(data) if not isinstance(data, (bytes, bytearray, memoryview)) else data)


def write_text_atomic(path: str, text: str) -> None:
    write_bytes_atomic(path, text.encode(), fsync=is_local(path))


def delete_file(path: str, missing_ok: bool = True) -> None:
    if is_local(path):
        p = _local_path(path)
        if missing_ok and not os.path.exists(p):
            return
        os.remove(p)
        return
    fs, p = resolve(path)
    if missing_ok and not exists(path):
        return
    fs.delete_file(p)


def list_files(dir_path: str, suffix: str = "") -> list[str]:
    """Non-recursive file listing, full paths in the caller's addressing
    (URI in -> URI out). Missing directory -> []."""
    if is_local(dir_path):
        d = _local_path(dir_path)
        if not os.path.isdir(d):
            return []
        # files only, like the object-store branch's FileType.File filter —
        # a subdirectory named like a partition must not reach the readers
        names = [n for n in os.listdir(d)
                 if n.endswith(suffix) and os.path.isfile(os.path.join(d, n))]
        return sorted(join(dir_path, n) for n in names)
    from pyarrow import fs as pafs

    fs, p = resolve(dir_path)
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    out = []
    for info in fs.get_file_info(sel):
        if info.type == pafs.FileType.File and info.path.endswith(suffix):
            # rebuild under the CALLER's base: info.path loses the URI
            # authority (hdfs://host:9000/x -> /x), so scheme+info.path
            # resolved a DIFFERENT filesystem for authority-bearing URIs
            out.append(join(dir_path, basename(info.path)))
    return sorted(out)
