"""commoncrawl_ray — a Ray-Data-native re-crawl / web-data engine.

Re-expresses the capabilities of the classic Common Crawl support library
(reference: /root/reference, commoncrawl/commoncrawl — Java/Hadoop/native)
as Ray Data pipelines over Arrow batches:

- ``functions/``  pure, golden-tested kernels (fingerprints, URL canon,
  header/charset/mime parsing, sketches) — the parity core.
- ``sources/``    deterministic synthetic page universe + parquet IO.
- ``stages/``     ``map_batches`` stages (parse/extract, URL pipeline,
  link extraction, dedup, similarity, text analysis, multimodal).
- ``state/``      actor-pool state (partitioned URL-seen bloom+exact set,
  per-host politeness, robots cache).
- ``pipelines/``  the epoch crawl loop w/ checkpoint+resume, the
  single-process oracle crawler, analytics and query registry.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
