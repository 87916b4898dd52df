"""nqs_console_flink_window_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference Flink console
(``sunjiyongtc0/nqs-console-flink-window``).

The reference is a Flink 1.12 DataStream topology (Kafka -> validate/parse ->
dimension enrich -> protocol metric derivation -> perceived-quality score ->
10 s count-or-time windows -> ClickHouse).  This package re-expresses every
capability Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
broadcast joins instead of Redis cache-aside lookups, higher-order array
functions instead of per-record JSON loops, a compiled Column-expression
scoring engine instead of reflection, Structured Streaming micro-batches
instead of a custom count-or-time trigger, and partitioned columnar writes
with window-function dedup instead of ReplacingMergeTree.

Layout
------
- ``session``    SparkSession factory tuned for analytic workloads
- ``schemas``    StructType declarations (topics, protocols, dimensions)
- ``functions``  scalar/aggregate expression builders (scoring, time buckets,
                 text, vectors)
- ``operators``  DataFrame -> DataFrame operators (parse, enrich, derive,
                 explode, dedup, similarity, windows, multimodal)
- ``sources``    batch + streaming readers
- ``sinks``      partitioned/dedup writers
- ``plans``      the named query registry consumed by ``__spark_entry__.py``
- ``streaming``  the three reference job topologies as unified
                 batch/streaming pipelines
"""

__version__ = "0.1.0"
