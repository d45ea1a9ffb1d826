"""jobscrawler_spark — a PySpark-native URL-frontier + fetch scheduler.

A from-scratch re-realization of the capabilities of 0JCRG0/JobsCrawler
(reference at /root/reference, read-only) as a distributed crawl engine:

- URL canonicalization + xxhash64 sharding (pure Catalyst expressions)
- sharded exact URL-seen set with per-shard bloom prefilters
- per-host politeness budgets + robots.txt gate + priority-queue frontier
- batched fetch rounds (mapInPandas, Arrow-vectorized) landing
  image+caption rows into a snapshot-logged parquet table layer
- per-partition lineage + metrics, checkpointed resumability
- the reference's parse strategies / cleaning chain / location tagging
  re-expressed as DataFrame transformations
- training-data pipeline operators: dedup (exact/minhash/simhash/jaccard),
  embedding similarity search, text quality/lang-id/fingerprinting.

Everything here derives from public knowledge only (Apache Spark APIs,
the reference repo's observable behavior, published crawl/dedup papers).
"""

__version__ = "0.1.0"
