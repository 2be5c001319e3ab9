"""Beyond-reference operators for large-scale training-data pipelines:
deduplication, similarity search, text analysis, multimodal columns.

The reference has none of these (SURVEY §2.8 — no joins, no aggs);
they are the driver-mandated extensions (BASELINE.json north_star)
and are designed operator-by-operator for 100 TB inputs.
"""

from toshokan_spark.operators import dedup, similarity, text, multimodal  # noqa: F401
