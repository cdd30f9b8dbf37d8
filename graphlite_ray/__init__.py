"""graphlite_ray — a from-scratch, Ray-Data-native link-graph analytics engine.

Re-expresses the capabilities of the GraphLite reference (a C++ Pregel/BSP
vertex-program engine, see /root/reference/GraphLite-0.20 and SURVEY.md) as
idiomatic Ray Data pipelines:

- web-page Parquet tables -> vectorized text/link extraction (`stages.extract`)
- url -> int64 id assignment (`ids`)
- hash-partitioned CSR shards built with Dataset groupby (`state.csr`)
- an iterative BSP superstep runtime on a stateful partition-actor pool
  (`engine`, `worker`) with producer-side message combining, aggregators,
  vote-to-halt / reactivation semantics, per-partition checkpoints + lineage
  (`state.checkpoint`)
- built-in vertex programs: PageRank, connected components, label
  propagation (`programs`) and a dataset-pipeline triangle counter
  (`pipelines.triangles`)
- large-scale training-data operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis,
  multimodal plumbing (`stages.*`)

No code is copied from the reference; semantics derive from SURVEY.md's
clean-room analysis (citations into the reference are given per module).
"""

__version__ = "0.1.0"
