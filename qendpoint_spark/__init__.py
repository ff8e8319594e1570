"""qendpoint_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of qEndpoint's HDT bulk-loading path
(reference: hmottestad/qEndpoint, surveyed in SURVEY.md) on the Spark
DataFrame API:

- triple extraction from Common-Crawl-style web pages (Arrow-vectorized
  pandas UDFs; no per-row Python),
- HDT-style four-section dictionary (SH/S/O/P) with contiguous global IDs
  assigned by a distributed sort + partition-offset rank (the scalable
  zipWithIndex idiom) instead of the reference's single-threaded counter
  (qendpoint-core CompressFourSectionDictionary.java:88-133),
- ID-encoded triple tables materialized in SPO and OPS sort order
  (the reference's BitmapTriples + FOQ index,
  WriteBitmapTriples.java:202-309 / BitmapTriples.java:730-917),
- entity linking against a broadcast alias dictionary, IRI
  canonicalization via large-star/small-star connected components,
- k-way dataset merge (HDTCat/KCat analog, KCatImpl.java:370-420),
- checkpointed, resumable stages with per-partition lineage rows
  (MergeRunnable.markRestartStepCompleted analog).

Everything is DataFrame-first: sorting/merging/dedup/joins are Catalyst
built-ins; custom code is limited to section-offset ID arithmetic,
partition-offset ranking, extraction UDFs, and the CC loop.
"""

__version__ = "0.1.0"
