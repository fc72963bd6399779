"""kamu_cli_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kamu-data/kamu-cli (Open Data Fabric).

Datasets are append-only, hash-chained event streams stored as Parquet
slices; derivative datasets are produced by deterministic, replayable SQL
transforms. This package re-expresses those semantics Spark-first:
DataFrame/SQL declarative plans optimized by Catalyst, CDC merge
strategies as join/aggregate compositions, incremental transforms driven
by offset intervals, and large-scale training-data operators (dedup,
similarity search, text analysis) designed for 100 TB workloads.

Reference behavior studied from kamu-cli (see SURVEY.md); all code here
is an original Spark-first implementation.
"""

from kamu_cli_spark.vocab import DatasetVocabulary, OperationType

__version__ = "0.1.0"

__all__ = ["DatasetVocabulary", "OperationType", "__version__"]
