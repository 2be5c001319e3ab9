"""Column-expression building blocks (all JVM-side unless noted)."""

from toshokan_spark.functions.tokenizers import tokenize
from toshokan_spark.functions.ip import ip_normalize, ip_sort_key, ip_literal_key
from toshokan_spark.functions.datetime_ import parse_datetime, epoch_any_to_timestamp

__all__ = [
    "tokenize",
    "ip_normalize",
    "ip_sort_key",
    "ip_literal_key",
    "parse_datetime",
    "epoch_any_to_timestamp",
]
