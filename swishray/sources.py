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


# -- WARC (ISO 28500) -------------------------------------------------

def build_warc_bytes(records: "list[tuple[str, bytes]]",
                     gzip_members: bool = False) -> bytes:
    """Serialize (url, html_body) pairs as WARC/1.0 response records
    with an HTTP/1.1 payload — the Common-Crawl-shaped layout. With
    ``gzip_members=True`` each record is its own gzip member
    (the .warc.gz convention, so readers can split at member
    boundaries). Deterministic (fixed date, no uuids) so tests and
    oracle queries can rebuild expectations exactly."""
    import gzip as _gz
    out = []
    for url, body in records:
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body)
        rec = ("WARC/1.0\r\n"
               "WARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               "WARC-Date: 2024-01-01T00:00:00Z\r\n"
               "Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode() \
            + http + b"\r\n\r\n"
        out.append(_gz.compress(rec, mtime=0) if gzip_members else rec)
    return b"".join(out)


def iter_warc_records(data: bytes,
                      types: tuple = ("response",)) -> Iterator[dict]:
    """Parse a WARC/1.0 byte stream (plain or multi-member gzip) into
    dicts: url, warc_type, date, http_status, mime, html (the HTTP
    payload body; raw record block for non-HTTP payloads). Framing is
    strict Content-Length like the -S prog parser above."""
    if data[:2] == b"\x1f\x8b":
        import gzip as _gz
        data = _gz.decompress(data)   # concatenated members supported
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] in (b"\r\n",) :
            pos += 2
        if pos >= n:
            return
        end = data.find(b"\r\n\r\n", pos)
        if end < 0:
            return
        head = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not head or not head[0].startswith("WARC/"):
            raise ValueError(f"bad WARC header at offset {pos}")
        hdrs = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs.get("content-length", "0"))
        payload = data[end + 4:end + 4 + clen]
        pos = end + 4 + clen
        wtype = hdrs.get("warc-type", "")
        if wtype not in types:
            continue
        rec = {
            "url": hdrs.get("warc-target-uri", ""),
            "warc_type": wtype,
            "date": hdrs.get("warc-date", ""),
            "http_status": None,
            "mime": None,
            "html": payload,
        }
        if hdrs.get("content-type", "").startswith("application/http"):
            hend = payload.find(b"\r\n\r\n")
            if hend >= 0:
                hlines = payload[:hend].decode(
                    "utf-8", "replace").split("\r\n")
                try:
                    rec["http_status"] = int(hlines[0].split()[1])
                except (IndexError, ValueError):
                    pass
                for line in hlines[1:]:
                    k, _, v = line.partition(":")
                    if k.strip().lower() == "content-type":
                        rec["mime"] = v.strip().split(";")[0].strip()
                rec["html"] = payload[hend + 4:]
        yield rec


def warc_table(data: bytes, types: tuple = ("response",)) -> pa.Table:
    rows = list(iter_warc_records(data, types))
    return pa.table({
        "url": pa.array([r["url"] for r in rows], type=pa.string()),
        "html": pa.array([r["html"] for r in rows], type=pa.binary()),
        "mime": pa.array([r["mime"] for r in rows], type=pa.string()),
        "http_status": pa.array([r["http_status"] for r in rows],
                                type=pa.int32()),
        "warc_date": pa.array([r["date"] for r in rows],
                              type=pa.string()),
        "text": pa.array([""] * len(rows), type=pa.string()),
        "lang": pa.array([""] * len(rows), type=pa.string()),
    })


def read_warc(paths: "str | list[str]",
              types: tuple = ("response",)) -> Any:
    """Dataset of pages rows from WARC file(s) (.warc or .warc.gz).

    Scale shape: one input file = one task (read_binary_files), the
    Common Crawl sharding unit (~1 GB/file) — a 100-TB crawl is ~100k
    files fanned out across the cluster; no driver-side parsing. Each
    task flat-maps its file into page rows; downstream repartition()
    if per-file record counts are skewed."""
    import ray.data as rd
    ds = rd.read_binary_files(paths)

    def explode(batch: pa.Table) -> pa.Table:
        tables = [warc_table(b, types)
                  for b in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else warc_table(b"")
    return ds.map_batches(explode, batch_format="pyarrow")


def write_warc(ds: Any, out_dir: str, url_col: str = "url",
               body_col: str = "html",
               gzip_members: bool = True) -> "pa.Table":
    """Distributed WARC sink: each block becomes one
    ``part-<digest>.warc[.gz]`` file (Common Crawl's sharding unit in
    reverse) -> manifest table ``(path, n_records)``.

    Scale/retry shape: files are content-addressed (md5 of the
    serialized bytes) and written tmp+atomic-rename, so a retried
    task rewrites the SAME file instead of duplicating records, and
    a re-run over identical input is a no-op.  No driver-side bytes;
    the returned manifest is one tiny row per written file."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    def w(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        urls = pc.cast(batch.column(url_col), pa.string()).to_pylist()
        bodies = [b if isinstance(b, bytes)
                  else (b or "").encode()
                  for b in batch.column(body_col).to_pylist()]
        data = build_warc_bytes(list(zip(urls, bodies)),
                                gzip_members=gzip_members)
        name = f"part-{hashlib.md5(data).hexdigest()[:16]}{ext}"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({
            "path": pa.array([name], pa.string()),
            "n_records": pa.array([batch.num_rows], pa.int64())})

    # consume the manifest eagerly — the caller's contract is "files
    # exist when this returns"
    out = ds.map_batches(w, batch_format="pyarrow")
    rows = out.take_all()
    return pa.table({
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "n_records": pa.array([r["n_records"] for r in rows],
                              pa.int64())})
