"""Any-filesystem driver-side IO.

The reference routes every driver-side read/write — taxonomy dmp files,
``@list`` indirection, kreport/taxonSet/kmer_distrib writers, report
glob-reads — through the Hadoop FileSystem API
(src/main/scala/com/jnpersson/kmers/HDFSUtil.scala:76-98), so the same
CLI invocation works on file://, s3://, hdfs:// or gs:// locations.
This module is the PySpark-side equivalent: pyarrow.fs resolution of a
path-or-URI to a (filesystem, fs-local path) pair plus the handful of
text/list helpers the rest of the package needs. Executor-side ranged
reads already use the same resolution (sources/fasta.py).

Bare paths (no scheme) resolve to the local filesystem, so local runs
behave exactly as before.
"""

from __future__ import annotations

import posixpath

from pyarrow import fs as pafs


def any_fs(path: str) -> tuple["pafs.FileSystem", str]:
    """Resolve a path or URI to (pyarrow filesystem, fs-local path).

    Handles bare local paths plus any pyarrow-supported URI scheme
    (file://, s3://, hdfs://, gs://) — the any-Hadoop-FS contract of
    the reference (HDFSUtil.scala:76-98).
    """
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def read_text(path: str, encoding: str = "utf-8") -> str:
    """Read a whole text file from any filesystem."""
    filesystem, p = any_fs(path)
    with filesystem.open_input_stream(p) as fh:
        return fh.read().decode(encoding)


def read_lines(path: str, encoding: str = "utf-8") -> list[str]:
    """Read a text file as a list of lines (no trailing newlines)."""
    return read_text(path, encoding).splitlines()


def write_text(path: str, text: str, encoding: str = "utf-8") -> None:
    """Write a whole text file to any filesystem (overwrites)."""
    filesystem, p = any_fs(path)
    with filesystem.open_output_stream(p) as fh:
        fh.write(text.encode(encoding))


def exists(path: str) -> bool:
    filesystem, p = any_fs(path)
    return filesystem.get_file_info(p).type != pafs.FileType.NotFound


def list_dir(path: str, prefix: str | None = None) -> list[str]:
    """Non-recursive children of a directory, as full paths in the
    caller's original scheme, sorted by name. ``prefix`` filters on the
    base name (the any-FS replacement for ``glob('sample=*')``)."""
    filesystem, p = any_fs(path)
    infos = filesystem.get_file_info(pafs.FileSelector(p, recursive=False))
    # Children come back as fs-local paths; re-attach the caller's scheme
    # from the URI itself (suffix-matching `path.endswith(p)` breaks when
    # from_uri normalizes, e.g. a trailing slash in 's3://bucket/dir/').
    scheme_prefix = path.split("://", 1)[0] + "://" if "://" in path else ""
    out = []
    for info in sorted(infos, key=lambda i: i.path):
        base = posixpath.basename(info.path.rstrip("/"))
        if prefix is not None and not base.startswith(prefix):
            continue
        out.append(scheme_prefix + info.path)
    return out
