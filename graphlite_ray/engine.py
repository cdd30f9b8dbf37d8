"""BSP superstep driver: the Ray-native analog of the reference master
(`engine/Master.cc:390-455`), minus all hand-rolled transport.

The driver loop IS the superstep barrier (C1): every iteration issues one
`step` call per partition actor, and collecting the per-partition metadata
(`ray.get` on the first return object only — message payloads are routed as
object refs, never fetched by the driver) is the synchronization point.
Per-superstep it:

  - merges aggregator partials into globals that become visible to
    `compute()` in the NEXT superstep (reference `engine/Master.cc:354-366`
    merge + `MW.nextss_start` broadcast; the ss k -> k+1 visibility
    off-by-one of `example/PageRankVertex.cc:152-157`),
  - sums the built-in counters (computed / sent / recv / active — the
    analog of `WM.curss_finish.proto:8-20`),
  - evaluates termination rule C4: user master hook OR
    (active == 0 AND sent == 0) (`engine/Master.cc:429-431`),
  - optionally checkpoints every partition + writes an atomic JSON lineage
    manifest (superstep, per-partition metrics, aggregators, config hash) —
    the north rule's resumability, absent in the reference (SURVEY.md §4).

Scale notes: the driver handles only O(P) refs + O(P) small dicts per
superstep; message data moves partition-to-partition through the object
store. P is chosen independently of node count; actors reserve
``min(1, (total_cpus - 2) / P)`` CPUs — fractional so a small test
session (4 CPUs, P=8) cannot deadlock on actor placement, with 2 CPUs of
reservation headroom so a P >= cores run never starves the driver loop
(measured: without it the P=32-on-32-cores superstep floor tripled).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data

from graphlite_ray.programs import VertexProgram
from graphlite_ray.state import storage
from graphlite_ray.state.csr import load_graph_meta
from graphlite_ray.worker import PartitionWorker

ENGINE_VERSION = "1"


@dataclass
class BSPResult:
    final_superstep: int
    supersteps_run: int
    halted: bool
    ckpt_dir: str
    metrics: list[dict] = field(default_factory=list)   # per-superstep totals
    aggr_history: list[dict] = field(default_factory=list)

    def values(self) -> "ray.data.Dataset":
        """Final per-vertex values as a Ray Data dataset
        (vertex_id:int64, value, active:bool) read from the final
        checkpoint — the analog of the reference OutputFormatter walk
        (`engine/OutputFormatter.cc:34-61`), but a streaming source."""
        d = storage.join(self.ckpt_dir, f"ss_{self.final_superstep}")
        # endswith filter: a worker killed mid-checkpoint leaves atomic-write
        # temps ('values_pN.parquet.tmp.<pid>') that must never be read back
        names = [
            f
            for f in storage.listdir(d)
            if f.startswith("values_p") and f.endswith(".parquet")
        ]
        fs, dpath = storage.resolve(d)
        files = sorted(f"{dpath.rstrip('/')}/{n}" for n in names)
        return ray.data.read_parquet(files, filesystem=fs)

    @property
    def total_messages(self) -> int:
        return sum(m["sent"] for m in self.metrics)


def _manifest_path(ckpt_dir: str, ss: int) -> str:
    return storage.join(ckpt_dir, f"manifest_ss{ss}.json")


def config_hash(program: VertexProgram, graph_dir: str, graph_meta: dict) -> str:
    """Identity of a run: program name + params + graph. A manifest whose
    hash mismatches the current run (e.g. same ckpt_dir, different SSSP
    source or edge weights) is never resumed from — it would silently
    return the previous run's results."""
    import hashlib

    params = {
        k: v
        for k, v in sorted(vars(program).items())
        if isinstance(v, (int, float, str, bool, type(None)))
    }
    blob = json.dumps(
        {
            "engine_version": ENGINE_VERSION,
            "program": program.name,
            "combiner": program.combiner,
            "symmetrize": bool(program.symmetrize),
            "params": params,
            "graph_dir": graph_dir,
            "graph_meta": graph_meta,
        },
        sort_keys=True,
    )
    return hashlib.blake2b(blob.encode(), digest_size=8).hexdigest()


def latest_checkpoint(ckpt_dir: str, expect_hash: str | None = None) -> dict | None:
    """Newest COMPLETE superstep manifest, or None (FIXTURES.md F6).
    With `expect_hash`, manifests from a different run configuration are
    ignored (pre-hash manifests never match and are likewise skipped)."""
    if not storage.isdir(ckpt_dir):
        return None
    best = None
    for f in storage.listdir(ckpt_dir):
        if f.startswith("manifest_ss") and f.endswith(".json"):
            m = storage.read_json(storage.join(ckpt_dir, f))
            if not m.get("complete"):
                continue
            if expect_hash is not None and m.get("config_hash") != expect_hash:
                continue
            if best is None or m["superstep"] > best["superstep"]:
                best = m
    return best


def resolve_routing(routing: str) -> str:
    """"auto" -> "grouped" on a single-node cluster (P plasma objects per
    superstep, zero-copy fan-out) / "per_dest" on multi-node (P^2 objects,
    each shipped to exactly one consumer node — no network amplification).
    See worker.py's routing docstring for the measured tradeoff."""
    if routing != "auto":
        return routing
    try:
        alive = sum(1 for n in ray.nodes() if n.get("Alive"))
    except Exception:
        alive = 1
    return "grouped" if alive <= 1 else "per_dest"


def run_bsp(
    program: VertexProgram,
    graph_dir: str,
    ckpt_dir: str,
    max_supersteps: int = 200,
    ckpt_every: int = 0,
    resume: bool = False,
    routing: str = "auto",
) -> BSPResult:
    """Run a vertex program over pre-built CSR shards to termination.

    ``ckpt_every=0`` checkpoints only at termination (the final values are
    always persisted — they are the result). ``resume=True`` restarts from
    the latest complete manifest: values + active mask + in-flight messages
    are reloaded per partition and the loop continues at the next superstep,
    bit-identical to an uninterrupted run (tested).

    ``routing`` selects the message-exchange layout ("auto" | "grouped" |
    "per_dest"); results are bit-identical across layouts (tested) — only
    the object-store traffic pattern differs (worker.py docstring).

    Fault tolerance: an actor death mid-superstep (node loss analog) is
    caught, all actors are recreated, and the run continues from the latest
    complete checkpoint (or superstep 0 if none — set ``ckpt_every`` to
    bound re-work), up to ``actor_restarts`` times. The reference hangs or
    dies in this case (SURVEY.md §4 retries row).
    """
    program.master_init(load_graph_meta(graph_dir))  # Graph::init analog
    actor_restarts = 2
    attempt = 0
    while True:
        try:
            result = _run_bsp_attempt(
                program,
                graph_dir,
                ckpt_dir,
                max_supersteps=max_supersteps,
                ckpt_every=ckpt_every,
                resume=resume or attempt > 0,
                routing=resolve_routing(routing),
            )
            program.master_term(result)  # Graph::term analog
            return result
        except ray.exceptions.RayActorError:
            attempt += 1
            if attempt > actor_restarts:
                raise


def _run_bsp_attempt(
    program: VertexProgram,
    graph_dir: str,
    ckpt_dir: str,
    max_supersteps: int,
    ckpt_every: int,
    resume: bool,
    routing: str = "grouped",
) -> BSPResult:
    meta = load_graph_meta(graph_dir)
    P = int(meta["P"])
    storage.makedirs(ckpt_dir)

    if program.max_supersteps is not None:
        max_supersteps = min(max_supersteps, program.max_supersteps)

    specs = program.aggregators()
    aggr_global = {k: s.init for k, s in specs.items()}
    start_ss = 0
    use_restored = False
    result = BSPResult(final_superstep=-1, supersteps_run=0, halted=False, ckpt_dir=ckpt_dir)

    cfg_hash = config_hash(program, graph_dir, meta)
    restore_from = None
    if resume:
        m = latest_checkpoint(ckpt_dir, expect_hash=cfg_hash)
        if m is not None:
            if m.get("halted"):  # already complete: no actors needed
                result.final_superstep = m["superstep"]
                result.halted = True
                # final aggregator state (decoded) so history-bearing
                # aggregators (e.g. the neighborhood `hist`) survive the
                # early return exactly like a fresh run's last superstep
                result.aggr_history = [
                    {
                        k: (specs[k].from_json(v) if k in specs else v)
                        for k, v in m.get("aggr_global", {}).items()
                    }
                ]
                return result
            restore_from = m

    total_cpus = ray.cluster_resources().get("CPU", P) or P
    # leave 2 CPUs of reservation headroom: when P >= total CPUs a full
    # reservation starves the driver loop and every non-BSP Ray task, and
    # the superstep barrier floor triples (measured at P=32 on 32 cpus:
    # 150 -> 52 ms/superstep, 100k-page end-to-end 41 -> 14 s)
    headroom = 2.0 if total_cpus > 4 else 0.0
    actor_cpus = min(1.0, max(0.01, (float(total_cpus) - headroom) / max(1, P)))
    Actor = ray.remote(num_cpus=actor_cpus)(PartitionWorker)
    workers = [
        Actor.remote(p, P, graph_dir, program, meta["n_vertices"], routing=routing)
        for p in range(P)
    ]
    ray.get([w.ready.remote() for w in workers])  # surface load errors early

    try:
        return _superstep_loop(
            program, workers, meta, specs, aggr_global, start_ss, use_restored,
            restore_from, max_supersteps, ckpt_every, ckpt_dir, graph_dir, result,
            cfg_hash, routing,
        )
    finally:
        # free actor CPU reservations (state is checkpointed); also runs on
        # actor-death so a retry starts with a clean slate
        for w in workers:
            ray.kill(w, no_restart=True)


def _superstep_loop(
    program, workers, meta, specs, aggr_global, start_ss, use_restored,
    restore_from, max_supersteps, ckpt_every, ckpt_dir, graph_dir, result,
    cfg_hash, routing="grouped",
) -> BSPResult:
    P = len(workers)
    per_dest = routing == "per_dest"
    if restore_from is not None:
        ray.get([w.restore.remote(restore_from["superstep"], ckpt_dir) for w in workers])
        aggr_global = {
            k: (specs[k].from_json(v) if k in specs else v)
            for k, v in restore_from["aggr_global"].items()
        }
        start_ss = restore_from["superstep"] + 1
        use_restored = True

    # grouped:  msgs[i] = ref of producer i's grouped object (dict dest->block)
    # per_dest: msgs[i][j] = ref of producer i's block FOR consumer j
    msgs: list = [[None] * P for _ in range(P)] if per_dest else [None] * P
    n_ret = 1 + (P if per_dest else 1)
    halted = False
    ss = start_ss - 1
    for ss in range(start_ss, max_supersteps):
        t0 = time.perf_counter()
        refs = []
        for j, w in enumerate(workers):
            if use_restored:
                incoming = [None] * P
            elif per_dest:
                # each per-dest object ref goes to exactly ONE consumer
                incoming = [msgs[i][j] for i in range(P)]
            else:
                incoming = msgs
            refs.append(
                w.step.options(num_returns=n_ret).remote(
                    ss, aggr_global, *incoming, use_restored=use_restored
                )
            )
        use_restored = False
        metas = ray.get([r[0] for r in refs])
        msgs = [refs[i][1:] for i in range(P)] if per_dest else [refs[i][1] for i in range(P)]

        totals = {
            k: int(sum(m[k] for m in metas))
            for k in ("computed", "sent", "recv", "active_end")
        }
        totals["superstep"] = ss
        totals["wall_s"] = time.perf_counter() - t0
        totals["max_part_wall_s"] = max(m["wall_s"] for m in metas)
        aggr_next = {}
        for k, spec in specs.items():
            v = spec.init
            for m in metas:
                v = spec.merge(v, m["aggr"].get(k, spec.init))
            aggr_next[k] = v
        result.metrics.append(totals)
        result.aggr_history.append(aggr_next)

        halted = program.master_halt(ss, aggr_next, totals) or (
            totals["active_end"] == 0 and totals["sent"] == 0
        )
        aggr_global = aggr_next
        result.supersteps_run += 1

        if halted or (ckpt_every and (ss + 1) % ckpt_every == 0) or ss + 1 == max_supersteps:
            part_stats = ray.get([w.checkpoint.remote(ss, ckpt_dir) for w in workers])
            manifest = {
                "engine_version": ENGINE_VERSION,
                "config_hash": cfg_hash,
                "program": program.name,
                "graph_dir": graph_dir,
                "graph_meta": meta,
                "superstep": ss,
                "halted": halted,
                "aggr_global": {
                    k: (specs[k].to_json(v) if k in specs else v)
                    for k, v in aggr_global.items()
                },
                "totals": totals,
                "per_partition": part_stats,
                "parent_superstep": start_ss - 1 if ss == start_ss else ss - 1,
                "complete": True,
            }
            storage.write_json_atomic(manifest, _manifest_path(ckpt_dir, ss))

        if halted:
            break

    result.final_superstep = ss
    result.halted = halted
    return result
