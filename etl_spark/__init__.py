"""etl_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Binlog-style change-event tailer feeding transactional lake-table upserts
over a source-code corpus keyed by (repo, path), with commit-ordered
last-write-wins dedup, monotonic per-partition high-watermarks, additive
schema evolution, exactly-once batch-id fencing, and salted repartitioning
on hot repos.  All row transforms are vectorized (JVM codegen or
Arrow/pandas UDFs) — zero per-row Python.

Built from scratch against the north rule in BASELINE.json (the reference
checkout at /root/reference was empty at survey time — see SURVEY.md §0);
no reference code exists to cite.
"""

__version__ = "0.1.0"

from etl_spark.config import get_spark, stop_spark  # noqa: F401
