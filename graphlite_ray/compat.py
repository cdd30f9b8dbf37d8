"""Per-vertex compatibility shim: the reference's exact user API surface.

GraphLite users write `Vertex<V,E,M>::compute(MessageIterator*)` called
once per active vertex per superstep (`include/Vertex.h:122-136`,
`engine/Worker.cc:839-859` in the reference). `PerVertexProgram` offers the
same mental model in Python — subclass, implement `compute(v)`, use the
same helper names (`getSuperstep`, `getValue`, `mutableValue` (via
`setValue`), `getOutEdgeIterator` -> `out_edges`, `sendMessageTo`,
`sendMessageToAllNeighbors`, `voteToHalt`, `getAggrGlobal`,
`accumulateAggr`) — wrapped onto the vectorized partition API.

This is a MIGRATION/COMPAT path: it runs a Python loop per vertex, which
is exactly what the vectorized built-ins exist to avoid (SURVEY.md §2.2
M1). Use it to port an existing GraphLite program verbatim, validate
against the vectorized implementation, then vectorize.
"""

from __future__ import annotations

import numpy as np

from graphlite_ray.programs import AggregatorSpec, ComputeOut, Ctx, Inbox, VertexProgram
from graphlite_ray.state.csr import CSRShard


class Message:
    """One raw delivered message (combiner="none"): the analog of the
    reference's message node exposing the sender
    (`include/GenericLinkIterator.h:43-50`, `include/Vertex.h:68-79`)."""

    __slots__ = ("value", "src")

    def __init__(self, value, src: int):
        self.value = value
        self.src = src

    def getValue(self):
        return self.value

    def getSrc(self) -> int:
        return self.src


class VertexView:
    """The per-vertex handle passed to `compute` — mirrors the reference
    `Vertex` helpers (`include/Vertex.h:163-255`)."""

    __slots__ = ("_prog", "_shard", "_values", "_i", "_ctx", "_msgs", "halted")

    def __init__(self, prog, shard, values, i, ctx, msgs):
        self._prog = prog
        self._shard = shard
        self._values = values
        self._i = i
        self._ctx = ctx
        self._msgs = msgs
        self.halted = False

    def getSuperstep(self) -> int:
        return self._ctx.superstep

    def getVertexId(self) -> int:
        return int(self._shard.vids[self._i])

    def getValue(self):
        return self._values[self._i]

    def setValue(self, v) -> None:  # reference: *mutableValue() = v
        self._values[self._i] = v

    def messages(self):
        """MessageIterator analog: iterate this superstep's messages.
        With combiner="none" each item is a `Message` (`.getValue()`,
        `.getSrc()` — one item PER SENT MESSAGE, parallel edges included);
        with a combiner it is the combined plain value."""
        return iter(self._msgs)

    def out_edges(self) -> np.ndarray:
        """getOutEdgeIterator analog: global dst ids of this vertex's
        out-edges (CSR row slice)."""
        s, e = self._shard.indptr[self._i], self._shard.indptr[self._i + 1]
        return self._shard.indices[s:e]

    def getOutEdgeCount(self) -> int:
        return int(self._shard.out_deg[self._i])

    def out_edge_values(self) -> np.ndarray | None:
        """OutEdgeIterator.getValue() analog: this vertex's per-edge
        weights (None on unweighted graphs)."""
        if self._shard.edge_weights is None:
            return None
        s, e = self._shard.indptr[self._i], self._shard.indptr[self._i + 1]
        return self._shard.edge_weights[s:e]

    def sendMessageTo(self, dst: int, value) -> None:
        self._prog._out_dst.append(dst)
        self._prog._out_val.append(value)
        self._prog._out_src.append(self.getVertexId())

    def sendMessageToAllNeighbors(self, value) -> None:
        for d in self.out_edges():
            self.sendMessageTo(int(d), value)

    def voteToHalt(self) -> None:
        self.halted = True

    def getAggrGlobal(self, name: str):
        return self._ctx.aggr_global.get(name)

    def accumulateAggr(self, name: str, value) -> None:
        spec = self._prog.aggregators()[name]
        cur = self._prog._aggr_local.get(name, spec.init)
        self._prog._aggr_local[name] = spec.merge(cur, value)


class PerVertexProgram(VertexProgram):
    """Subclass and implement `compute(self, v: VertexView)`."""

    # "sum" combines on delivery (fast path); set combiner = "none" for the
    # reference's raw one-item-per-message delivery with `Message.getSrc()`
    combiner = "sum"

    def compute_vertex(self, v: VertexView) -> None:
        raise NotImplementedError

    def init_value(self, vid: int):
        return 0.0

    def init_values(self, shard: CSRShard) -> np.ndarray:
        return np.array(
            [self.init_value(int(v)) for v in shard.vids], dtype=self.value_dtype
        )

    def compute(self, ctx: Ctx, shard, values, active, inbox: Inbox):
        self._out_dst: list[int] = []
        self._out_val: list = []
        self._out_src: list[int] = []
        self._aggr_local: dict = {}
        per_vertex_msgs: dict[int, list] = {}
        if not inbox.empty:
            if self.combiner == "none" and inbox.src is not None:
                # raw delivery: Message objects carrying the sender id
                for i, s, val in zip(
                    inbox.idx.tolist(), inbox.src.tolist(), inbox.val.tolist()
                ):
                    per_vertex_msgs.setdefault(i, []).append(Message(val, s))
            else:
                for i, val in zip(inbox.idx.tolist(), inbox.val.tolist()):
                    per_vertex_msgs.setdefault(i, []).append(val)
        halted = np.zeros(shard.n, bool)
        for i in np.flatnonzero(active):
            v = VertexView(self, shard, values, int(i), ctx, per_vertex_msgs.get(int(i), []))
            self.compute_vertex(v)
            halted[i] = v.halted
        out = ComputeOut(
            halted=halted,
            aggr=dict(self._aggr_local),
            sent=len(self._out_dst),
        )
        if self._out_dst:
            out.out_dst = np.array(self._out_dst, np.int64)
            out.out_val = np.array(self._out_val)
            if self.combiner == "none":
                out.out_src = np.array(self._out_src, np.int64)
        return out


class PageRankPerVertex(PerVertexProgram):
    """Line-for-line port of the reference example's compute()
    (`example/PageRankVertex.cc:145-172`) onto the shim — used in tests to
    prove the shim reproduces the vectorized engine's results exactly."""

    name = "pagerank_pervertex"
    combiner = "sum"

    def aggregators(self):
        return {"delta": AggregatorSpec(init=0.0, op="sum")}

    def init_value(self, vid):
        return 0.0

    def compute_vertex(self, v: VertexView) -> None:
        if v.getSuperstep() == 0:
            val = 1.0
        else:
            if v.getSuperstep() >= 2 and v.getAggrGlobal("delta") < 1e-6:
                v.voteToHalt()
                return
            s = 0.0
            for m in v.messages():
                s += m
            val = 0.15 + 0.85 * s
            v.accumulateAggr("delta", abs(v.getValue() - val))
        v.setValue(val)
        n = v.getOutEdgeCount()
        if n > 0:
            v.sendMessageToAllNeighbors(val / n)
