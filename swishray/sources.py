"""Input sources beyond Parquet pages tables (§2.1 parity).

  * read_swish_stream — the Swish-e ``-S prog`` aggregator protocol
    (header lines + body; parser.c:2050-2216 / buf_to_head
    parser.c:1767-1846): Content-Length, Content-Location,
    Content-Type, Parser-Type, Encoding, Last-Modified. Streams of
    documents from any upstream program become pages rows.
  * read_filelist — file of paths with '#'-comments and blank lines
    skipped (swish_io_is_skippable_line, io.c:275-297), each path read
    as a document body.
  * read_directory — recursive walk, dotfiles skipped
    (swish_parse_directory, parser.c:2352-2447), as a Ray datasource
    via read_binary_files.
"""

from __future__ import annotations

import os
from typing import Any, Iterator

import pyarrow as pa

_HEADER_KEYS = {
    "content-length": "size",
    "content-location": "url",
    "path-name": "url",             # deprecated alias (parser.c:1922)
    "content-type": "mime",
    "parser-type": "parser",
    "document-type": "parser",      # deprecated alias (parser.c:1936)
    "encoding": "encoding",
    "charset": "encoding",
    "last-modified": "mtime",
    "last-mtime": "mtime",          # deprecated alias (parser.c:1896)
}


def iter_swish_stream(data: bytes) -> Iterator[dict]:
    """Parse a -S prog byte stream into document dicts."""
    pos = 0
    n = len(data)
    while pos < n:
        headers: dict[str, str] = {}
        # header lines until a blank line (>=2 headers required,
        # parser.c:2071-2073)
        while True:
            nl = data.find(b"\n", pos)
            if nl < 0:
                return
            line = data[pos:nl].strip()
            pos = nl + 1
            if not line:
                if len(headers) >= 2:
                    break
                if headers:
                    raise ValueError(
                        "Not enough header lines reading from filehandle")
                continue
            if b":" not in line:
                raise ValueError(f"bad header line: {line!r}")
            key, _, val = line.partition(b":")
            k = key.decode("latin-1").strip().lower()
            field = _HEADER_KEYS.get(k)
            if field:
                headers[field] = val.decode("latin-1").strip()
        if "size" not in headers:
            # the reference requires Content-Length (parser.c:2075-2078);
            # defaulting to 0 would silently re-parse the body as headers
            raise ValueError(
                "missing Content-Length header in -S prog stream block")
        size = int(headers["size"])
        body = data[pos:pos + size]
        pos += size
        yield {
            "url": headers.get("url", ""),
            "html": body,
            "mime": headers.get("mime"),
            "parser": headers.get("parser"),
            "encoding": headers.get("encoding"),
            "mtime": int(headers["mtime"]) if "mtime" in headers else 0,
        }


def swish_stream_table(data: bytes) -> pa.Table:
    rows = list(iter_swish_stream(data))
    return pa.table({
        "url": pa.array([r["url"] for r in rows], type=pa.string()),
        "html": pa.array([r["html"] for r in rows], type=pa.binary()),
        "mime": pa.array([r["mime"] for r in rows], type=pa.string()),
        "parser": pa.array([r["parser"] for r in rows], type=pa.string()),
        "encoding": pa.array([r["encoding"] for r in rows],
                             type=pa.string()),
        "mtime": pa.array([r["mtime"] for r in rows], type=pa.int64()),
        "text": pa.array([""] * len(rows), type=pa.string()),
        "lang": pa.array([""] * len(rows), type=pa.string()),
    })


def read_swish_stream(path: str) -> Any:
    """Dataset of pages rows from one -S prog stream file. For many
    stream files, union the datasets (the aggregator seam scales by
    running one stream per shard)."""
    import ray.data as rd
    with open(path, "rb") as f:
        return rd.from_arrow(swish_stream_table(f.read()))


def is_skippable_line(line: str) -> bool:
    """swish_io_is_skippable_line (io.c:275-297)."""
    s = line.strip()
    return not s or s.startswith("#")


def read_filelist(path: str) -> Any:
    """Dataset of pages rows for every operable path in a filelist."""
    import ray.data as rd
    with open(path) as f:
        paths = [ln.strip() for ln in f if not is_skippable_line(ln)]
    base = os.path.dirname(os.path.abspath(path))
    paths = [p if os.path.isabs(p) else os.path.join(base, p)
             for p in paths]
    ds = rd.read_binary_files(paths, include_paths=True)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("path"),
            "html": batch.column("bytes"),
            "text": pa.array([""] * batch.num_rows, type=pa.string()),
            "lang": pa.array([""] * batch.num_rows, type=pa.string()),
        })
    return ds.map_batches(shape, batch_format="pyarrow")


def read_directory(dir_path: str, follow_symlinks: bool = True) -> Any:
    """Recursive directory source, dotfiles skipped (parser.c:2352)."""
    import ray.data as rd
    paths = []
    for root, dirs, files in os.walk(dir_path,
                                     followlinks=follow_symlinks):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for f in files:
            if not f.startswith("."):
                paths.append(os.path.join(root, f))
    ds = rd.read_binary_files(sorted(paths), include_paths=True)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("path"),
            "html": batch.column("bytes"),
            "text": pa.array([""] * batch.num_rows, type=pa.string()),
            "lang": pa.array([""] * batch.num_rows, type=pa.string()),
        })
    return ds.map_batches(shape, batch_format="pyarrow")
