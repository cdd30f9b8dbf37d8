"""WARC — the actual Common-Crawl container format, dependency-free.

Closes the last ingest seam: the engine's pages table (`url, warc_ts,
html, ...`) can now be produced straight from `.warc` / `.warc.gz` dumps
instead of pre-staged parquet. ISO 28500 subset: WARC/1.0 records,
`response` records carry an `application/http; msgtype=response` block
whose body is the page HTML; `warcinfo` / `request` / `metadata` records
are skipped. `.warc.gz` follows the real Common-Crawl layout — ONE GZIP
MEMBER PER RECORD, concatenated — which stdlib zlib/gzip decodes as a
multi-member stream.

Scale shape: a WARC file is the shard unit (CC ships ~1 GiB files); the
reader is `ray.data.read_binary_files` -> one parse task per file, so a
crawl segment's files fan out across the cluster and the pages rows
stream into the same extraction pipeline the parquet path uses
(`pipelines/linkgraph.py` consumes the resulting Dataset unchanged).
The writer is the inverse map — one shard per input block — used by the
round-trip tests and as an export sink.

Reference parity note: this is an IO encoding seam like the reference's
text InputFormatter (`sources/formatters.py`) — verified by byte-exact
round-trip pytest rather than a SQL oracle.
"""
from __future__ import annotations

import datetime
import gzip
import io
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _warc_date(ts: datetime.datetime) -> str:
    if ts.microsecond:
        return ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> datetime.datetime:
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return datetime.datetime.strptime(s, fmt)


def _record(headers: list[tuple[str, str]], content: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode("utf-8") + _CRLF
    head += f"Content-Length: {len(content)}".encode() + _CRLF + _CRLF
    return head + content + _SEP


def encode_warc(
    urls: list[str],
    timestamps: list[datetime.datetime],
    htmls: list[bytes],
    gzip_records: bool = True,
    shard_id: str = "",
) -> bytes:
    """Rows -> one WARC shard: a warcinfo record then one response record
    per page. With `gzip_records` each record is its own gzip member (the
    Common-Crawl `.warc.gz` layout)."""
    recs = [
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, 'info' + shard_id)}>"),
                ("Content-Type", "application/warc-fields"),
            ],
            b"software: graphlite_ray\r\n",
        )
    ]
    for u, ts, html in zip(urls, timestamps, htmls):
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=UTF-8" + _CRLF
            + f"Content-Length: {len(html)}".encode() + _CRLF + _CRLF
            + html
        )
        recs.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", u),
                    ("WARC-Date", _warc_date(ts)),
                    ("WARC-Record-ID", f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, u)}>"),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    if gzip_records:
        return b"".join(gzip.compress(r) for r in recs)
    return b"".join(recs)


def decode_warc(payload: bytes) -> list[tuple[str, datetime.datetime, bytes]]:
    """One WARC shard (plain or multi-member gzip) -> [(url, ts, html)]
    from its response records. Raises ValueError on malformed records."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)  # multi-member: stdlib loops
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        while pos < n and payload[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not payload.startswith(b"WARC/", pos):
            raise ValueError(f"corrupt WARC: expected record header at byte {pos}")
        hend = payload.find(_SEP, pos)
        if hend < 0:
            raise ValueError("corrupt WARC: unterminated record headers")
        headers: dict[str, str] = {}
        for line in payload[pos:hend].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("corrupt WARC: missing/invalid Content-Length")
        content = payload[hend + 4 : hend + 4 + clen]
        if len(content) != clen:
            raise ValueError("corrupt WARC: truncated record content")
        pos = hend + 4 + clen
        if headers.get("warc-type") == "response":
            if "warc-target-uri" not in headers or "warc-date" not in headers:
                raise ValueError("corrupt WARC: response lacks URI/date")
            body_at = content.find(_SEP)
            html = content[body_at + 4 :] if body_at >= 0 else b""
            out.append(
                (
                    headers["warc-target-uri"],
                    _parse_warc_date(headers["warc-date"]),
                    html,
                )
            )
    return out


# ------------------------------------------------------------ Ray stages


def read_warc_pages(paths: str | list[str]) -> "ray.data.Dataset":
    """WARC file(s)/dir -> Dataset (url:string, warc_ts:timestamp[us],
    html:binary). One parse task per file — the Common-Crawl shard unit;
    feed the result straight into `pages_to_edge_urls` / `prepare_edges`-
    style pipelines."""

    def _parse(batch: dict) -> pa.Table:
        urls: list[str] = []
        tss: list[datetime.datetime] = []
        htmls: list[bytes] = []
        for payload in batch["bytes"]:
            for u, ts, html in decode_warc(bytes(payload)):
                urls.append(u)
                tss.append(ts)
                htmls.append(html)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ray.data.read_binary_files(paths).map_batches(
        _parse, batch_size=1, batch_format="numpy"
    )


def write_warc(
    ds: "ray.data.Dataset", out_dir: str, gzip_records: bool = True
) -> pd.DataFrame:
    """Dataset (url, warc_ts, html) -> one .warc[.gz] shard per block,
    distributed; returns the (path, n_records) manifest. Shard names are
    uuid4 (an export sink, not a resumable checkpoint — re-running writes
    fresh shards)."""
    from graphlite_ray.state import storage

    storage.makedirs(out_dir)
    ext = "warc.gz" if gzip_records else "warc"

    def _write(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        tss = [ts.as_py() for ts in t["warc_ts"]]
        htmls = [bytes(h.as_py()) for h in t["html"]]
        name = f"part-{uuid.uuid4().hex[:12]}.{ext}"
        blob = encode_warc(urls, tss, htmls, gzip_records, shard_id=name)
        path = storage.join(out_dir, name)
        fs, p = storage.resolve(path)
        with fs.open_output_stream(p) as f:
            f.write(blob)
        return pa.table(
            {"path": pa.array([path]), "n_records": pa.array([len(urls)], pa.int64())}
        )

    parts = ds.map_batches(_write, batch_format="pyarrow", batch_size=None)
    return parts.to_pandas()
