"""Pluggable Input/OutputFormatter protocol (reference-parity seam).

The reference lets a job subclass ``InputFormatter`` — parse text edge
shards whose first two lines are vertex/edge counts, then user-parsed edge
lines (`include/InputFormatter.h:74-144`,
`example/PageRankVertex.cc:40-105`) — and ``OutputFormatter`` — render
per-vertex results into text lines (`include/OutputFormatter.h:65-91`,
the example's ``"%lld: %f\\n"``). Here the same seam is two small
batch-level protocols wired into Ray Data stages:

  ``InputFormatter.parse_edges(lines) -> (src, dst[, weight]) pa.Table``,
  invoked once per shard FILE inside a distributed map (the reader strips
  ``formatter.header_lines`` header lines and hands them to
  ``parse_header`` for shard metadata);
  ``OutputFormatter.format_batch(rows) -> (line:string) pa.Table``, a
  plain ``map_batches`` stage.

``map_batches`` remains the idiomatic escape hatch for arbitrary
encodings; this protocol exists so a ported GraphLite job keeps its custom
text formats byte-for-byte (round-trip tested against the reference's own
tinygraph input contract and output line format).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphlite_ray.state import storage


class InputFormatter:
    """Subclass and override ``parse_edges`` (and optionally
    ``parse_header`` / ``header_lines``) for a custom text edge encoding."""

    header_lines: int = 2  # reference contract: vertex count, edge count

    def parse_header(self, header: list[str]) -> dict:
        """Shard metadata from the header lines (reference
        getVertexNum/getEdgeNum analog)."""
        return {}

    def parse_edges(self, lines: list[str]) -> pa.Table:
        """Non-header lines of ONE shard -> (src:int64, dst:int64
        [, weight:float64]) table."""
        raise NotImplementedError


class ReferenceEdgeListInput(InputFormatter):
    """The reference example's format: ``"src dst"`` per line, whitespace
    separated (`example/PageRankVertex.cc:76-82` sscanf \"%lld %lld\");
    the weighted variant reads a third float column."""

    def __init__(self, weighted: bool = False):
        self.weighted = weighted

    def parse_header(self, header: list[str]) -> dict:
        return {"n_vertices": int(header[0]), "n_edges": int(header[1])}

    def parse_edges(self, lines: list[str]) -> pa.Table:
        if not lines:
            cols = {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            if self.weighted:
                cols["weight"] = pa.array([], pa.float64())
            return pa.table(cols)
        parts = pd.Series(lines).str.split(expand=True)
        cols = {
            "src": parts[0].astype("int64").to_numpy(),
            "dst": parts[1].astype("int64").to_numpy(),
        }
        if self.weighted:
            cols["weight"] = parts[2].astype("float64").to_numpy()
        return pa.table(cols)


def read_edge_shards(
    path_or_paths, formatter: InputFormatter | None = None
) -> "ray.data.Dataset":
    """Reference-format text shard set -> streaming edge Dataset. Each
    shard file is parsed by ONE distributed task (the reference worker
    reads exactly its own shard, `engine/Worker.cc:29-57`); headers are
    validated against the parsed edge count when the formatter reports
    one."""
    formatter = formatter or ReferenceEdgeListInput()
    if isinstance(path_or_paths, str):
        if storage.isdir(path_or_paths):
            names = sorted(storage.listdir(path_or_paths))
            paths = [storage.join(path_or_paths, n) for n in names]
        else:
            paths = [path_or_paths]
    else:
        paths = list(path_or_paths)

    def _load(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["path"].to_pylist():
            lines = [
                ln for ln in storage.read_text(p).splitlines() if ln.strip()
            ]
            if len(lines) < formatter.header_lines:
                raise ValueError(
                    f"{p}: shard has {len(lines)} non-blank lines, fewer "
                    f"than the {formatter.header_lines} header lines the "
                    f"format requires (empty/truncated shard?)"
                )
            hdr = formatter.parse_header(lines[: formatter.header_lines])
            t = formatter.parse_edges(lines[formatter.header_lines :])
            n_declared = hdr.get("n_edges")
            if n_declared is not None and n_declared != t.num_rows:
                raise ValueError(
                    f"{p}: header declares {n_declared} edges, parsed {t.num_rows}"
                )
            outs.append(t)
        return pa.concat_tables(outs) if outs else formatter.parse_edges([])

    return ray.data.from_items([{"path": p} for p in paths]).map_batches(
        _load, batch_format="pyarrow"
    )


class OutputFormatter:
    """Subclass and override ``format_batch`` for a custom output line
    encoding."""

    def format_batch(self, t: pa.Table) -> pa.Table:
        """(vertex_id, value, ...) rows -> (line:string) table."""
        raise NotImplementedError


class ReferenceOutput(OutputFormatter):
    """The reference example's ``"%lld: %f"`` line format
    (`example/PageRankVertex.cc:106-119`)."""

    def format_batch(self, t: pa.Table) -> pa.Table:
        vids = t["vertex_id"].to_pylist()
        vals = t["value"].to_pylist()
        return pa.table(
            {"line": pa.array([f"{v}: {x:f}" for v, x in zip(vids, vals)], pa.string())}
        )


def format_output(
    scores: "ray.data.Dataset", formatter: OutputFormatter | None = None
) -> "ray.data.Dataset":
    """Result rows -> Dataset of output lines via the formatter stage."""
    formatter = formatter or ReferenceOutput()
    return scores.map_batches(formatter.format_batch, batch_format="pyarrow")


def write_formatted(
    scores: "ray.data.Dataset",
    out_dir: str,
    formatter: OutputFormatter | None = None,
) -> pd.DataFrame:
    """Render + write result lines as text shards (one file per block,
    written by the task that formatted it — distributed; the tiny
    (path, n_lines) manifest is the only driver traffic).

    Idempotent twice over: stale `part-*.txt` from a previous run are
    cleared first (a re-run replaces, never appends), and after execution
    any file NOT in the returned manifest is deleted — so a Ray task retry
    that wrote twice leaves exactly one file (the attempt whose manifest
    row won). Shard names carry a per-attempt nonce + content hash, which
    also keeps two DISTINCT blocks that happen to render identical text as
    two files (pure content-hash names silently merged them — a duplicate-
    row dataset lost rows while the manifest counted both; ADVICE r3)."""
    import hashlib
    import uuid

    storage.makedirs(out_dir)
    for name in storage.listdir(out_dir):
        if name.startswith("part-") and name.endswith(".txt"):
            fs, p = storage.resolve(storage.join(out_dir, name))
            fs.delete_file(p)

    def _write(t: pa.Table) -> pa.Table:
        body = "\n".join(t["line"].to_pylist())
        data = body + ("\n" if body else "")
        h = hashlib.blake2b(data.encode(), digest_size=8).hexdigest()
        name = f"part-{uuid.uuid4().hex[:8]}-{h}.txt"
        storage.write_text(storage.join(out_dir, name), data)
        return pa.table({"path": pa.array([name]), "n_lines": pa.array([t.num_rows])})

    manifest = (
        format_output(scores, formatter)
        .map_batches(_write, batch_format="pyarrow")
        .to_pandas()
    )
    keep = set(manifest["path"]) if len(manifest) else set()
    for name in storage.listdir(out_dir):
        if name.startswith("part-") and name.endswith(".txt") and name not in keep:
            fs, p = storage.resolve(storage.join(out_dir, name))
            fs.delete_file(p)
    return manifest
