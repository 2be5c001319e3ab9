"""Newline-delimited JSON sources.

`/root/reference/src/commands/sources/buf_source.rs:17-49`: one
document per line, from a file path or stdin (`sources/mod.rs:46-63`
picks by prefix). We read with ``spark.read.text`` (NOT
``spark.read.json``) so the schema-driven coercions in ingest.py keep
full control over types; text splits are parallel per HDFS/S3 block,
so a single 1 TB JSONL file still fans out across the cluster.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Lines DataFrame (column ``value``) from file/glob/directory."""
    return spark.read.text(path)


def read_stdin(spark: SparkSession) -> DataFrame:
    """stdin source (`buf_source.rs:25-28`): driver-side read — stdin
    is inherently single-process; parallelize immediately after."""
    lines = [(l.rstrip("\n"),) for l in sys.stdin if l.strip()]
    return spark.createDataFrame(lines, "value string")
