"""owlcrawler_ray — a Ray-Data-native rebuild of the capabilities of
fmpwizard/owlcrawler (reference at /root/reference, read-only).

Not a port: the reference's NATS-queue + CouchDB architecture is replaced by
ray.data.Dataset pipelines (map_batches over zero-copy Arrow batches), actor
pools for the stateful pieces (URL-seen set, frontier, politeness, robots),
and a partitioned columnar sink (Lance when available, Parquet otherwise).

Layout:
  functions/   pure, vectorizable kernels (parse, ids, codecs, text analysis)
  sources/     corpus generation + readers (the sandbox "web")
  stages/      map_batches stage callables (fetch, extract, decode)
  state/       actor-pool state (seen set, frontier, politeness, robots)
  pipelines/   driver-side orchestration (crawl loop, queries, oracle)
  sinks/       table stores (parquet/lance), checkpoint manifests
"""

__version__ = "0.1.0"
