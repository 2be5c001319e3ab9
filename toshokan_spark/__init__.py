"""toshokan_spark — a PySpark-native log-search / analytics engine.

A from-scratch re-design (NOT a port) of the capability surface of
``tontinton/toshokan`` (a Rust log-search engine on object storage):
schema-configured JSON ingestion (batch + streaming) -> immutable
Parquet segments on a filesystem/object-store path -> file-based
manifest catalog -> full-text / range / boolean top-k search ->
compaction -> index lifecycle.  Everything executes on Spark
DataFrames so Catalyst/Tungsten own the physical plan.

Beyond the reference's surface this package also ships the operators a
large-scale (100 TB) training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
approximate similarity search, text analysis (lang-id, quality,
tokens, fingerprints) and multimodal column plumbing.

Reference parity citations use ``file:line`` into ``/root/reference``.
"""

from toshokan_spark.config import IndexConfig, FieldConfig
from toshokan_spark.catalog import FsCatalog

__all__ = ["IndexConfig", "FieldConfig", "FsCatalog"]
__version__ = "0.1.0"
