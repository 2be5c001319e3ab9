"""Schema-driven ingestion: raw JSON lines -> typed DataFrame.

Replicates the reference's per-document parse pipeline
(`/root/reference/src/commands/index.rs:95-192`,
`src/commands/field_parser.rs:78-190`) as a single declarative
projection — one `from_json` + per-field coercion expressions — so
Catalyst/Tungsten own execution and the whole thing is one narrow map
stage at any scale (no shuffle, no Python in the hot path except the
opt-in ip/en_stem helpers).

Semantics preserved:

* per-type coercions of SURVEY §1.3 (parse_string numbers/bools with
  the exact 4..5-char trimmed case-insensitive bool rule,
  `field_parser.rs:121-141`; epoch-magnitude datetimes; IPv6-mapped
  IPs)
* unclaimed top-level keys -> ``_dynamic`` map
  (`src/commands/index.rs:143-159`)
* a document with any unparseable *present* field value is skipped,
  not failed (`index.rs:150-156`) — permissive ingest; callers can
  also collect the rejects.

Deviation (documented): with ``parse_string: false`` the reference
rejects JSON *strings* for number fields; after raw-leaf extraction
the original JSON type is erased, so we enforce strictness only for
``boolean`` (where the golden tests exercise it) and accept numeric
strings for numbers. Superset acceptance, never wrong values.

Index shadow columns (the engine's "inverted index", SURVEY §1.2):

* ``__tokens__<field>``  array<string> of analyzed tokens for every
  indexed text field — term queries become ``array_contains``
* ``__ipkey__<field>``   decimal(39,0) numeric key for ip fields —
  range queries compare numerically
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from toshokan_spark.config import DYNAMIC_FIELD_NAME, FieldConfig, IndexConfig
from toshokan_spark.functions.datetime_ import parse_datetime
from toshokan_spark.functions.ip import ip_sort_key
from toshokan_spark.functions.tokenizers import tokenize

TOKENS_PREFIX = "__tokens__"
IPKEY_PREFIX = "__ipkey__"
REJECT_COL = "__reject"


def tokens_col(field_name: str) -> str:
    return f"{TOKENS_PREFIX}{field_name}"


def ipkey_col(field_name: str) -> str:
    return f"{IPKEY_PREFIX}{field_name}"


def is_internal(col_name: str) -> bool:
    return col_name.startswith("__")


# ---------------------------------------------------------------------------
# raw extraction schema: the declared shape with all leaves as strings
# ---------------------------------------------------------------------------

def _raw_type(fc: FieldConfig) -> T.DataType:
    if fc.type == "static_object":
        inner: T.DataType = T.StructType(
            [T.StructField(f.name, _raw_type(f), True) for f in fc.fields]
        )
    elif fc.type == "dynamic_object":
        inner = T.MapType(T.StringType(), T.StringType())
    else:
        inner = T.StringType()
    return T.ArrayType(inner) if fc.array else inner


def raw_schema(config: IndexConfig) -> T.StructType:
    return T.StructType([T.StructField(f.name, _raw_type(f), True) for f in config.fields])


# ---------------------------------------------------------------------------
# coercion: raw leaf -> typed value, plus "present but unparseable" flag
# ---------------------------------------------------------------------------

def _coerce_scalar(fc: FieldConfig, raw: Column) -> Column:
    if fc.type == "text":
        return raw
    if fc.type == "number":
        target = "double" if fc.number_type == "f64" else "long"
        return raw.try_cast(target)
    if fc.type == "boolean":
        t = F.trim(raw)
        return (
            F.when(F.length(t).between(4, 5) & (F.lower(t) == "true"), F.lit(True))
            .when(F.length(t).between(4, 5) & (F.lower(t) == "false"), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    if fc.type == "datetime":
        return parse_datetime(raw, fc.formats)
    if fc.type == "ip":
        # keep the original textual form for output parity (golden F4
        # prints "192.168.0.1"); the numeric key lives in the shadow col
        return raw
    raise AssertionError(fc.type)


def _coerce(fc: FieldConfig, raw: Column) -> Column:
    """Typed value of one field from its raw (string-leaf) extraction."""
    if fc.type == "dynamic_object":
        return raw  # already map<string,string>
    if fc.type == "static_object":
        def struct_of(raw_struct: Column) -> Column:
            return F.struct(
                *[
                    _coerce(child, raw_struct.getField(child.name)).alias(child.name)
                    for child in fc.fields
                ]
            )

        return struct_of(raw)  # array-of-static_object rejected at config
    if fc.array:
        return F.transform(raw, lambda e: _coerce_scalar(fc, e))
    return _coerce_scalar(fc, raw)


def _bad(fc: FieldConfig, raw: Column, typed: Column) -> Column:
    """True when the value is present but failed to parse -> the whole
    document is skipped (`index.rs:150-156`)."""
    if fc.type == "dynamic_object":
        return F.lit(False)
    if fc.type == "static_object":
        parts = [
            _bad(child, raw.getField(child.name), typed.getField(child.name))
            for child in fc.fields
        ]
        out = F.lit(False)
        for p in parts:
            out = out | p
        return out
    if fc.type == "text":
        return F.lit(False)
    if fc.array:
        return F.exists(raw, lambda e: e.isNotNull() & _coerce_scalar(fc, e).isNull())
    return raw.isNotNull() & typed.isNull()


# ---------------------------------------------------------------------------
# the full projection
# ---------------------------------------------------------------------------

def ingest_projection(
    lines: DataFrame,
    config: IndexConfig,
    value_col: str = "value",
    keep_rejects: bool = False,
) -> DataFrame:
    """raw JSON-lines DataFrame -> typed index DataFrame.

    One narrow stage: parse JSON twice (typed raw-leaf struct + a
    map<string,string> for the dynamic remainder), coerce, tokenize.
    """
    v = F.col(value_col)
    raw = F.from_json(v, raw_schema(config)).alias("__raw")
    # map<string,variant> -> to_json keeps the *exact* raw JSON text of
    # every value (strings stay quoted), so the _dynamic splice at
    # output time reproduces original JSON types byte-for-byte
    allmap = F.transform_values(
        F.from_json(v, "map<string,variant>"), lambda k, val: F.to_json(val)
    ).alias("__all")

    df = lines.select(v.alias(value_col)).withColumns({"__raw": raw, "__all": allmap})

    declared = [f.name for f in config.fields]
    cols: dict[str, Column] = {}
    bads: list[Column] = []
    for fc in config.fields:
        rawf = F.col("__raw").getField(fc.name)
        typed = _coerce(fc, rawf)
        # null out the whole field when the raw key was absent (struct
        # coercion would otherwise produce a struct of nulls)
        cols[fc.name] = F.when(rawf.isNull(), F.lit(None).cast(fc.spark_type())).otherwise(typed)
        bads.append(_bad(fc, rawf, typed))

    # _dynamic remainder: every key not claimed by the schema
    # (`src/commands/index.rs:143-159`)
    cols[DYNAMIC_FIELD_NAME] = F.map_filter(
        F.col("__all"), lambda k, _: ~k.isin(*declared) if declared else F.lit(True)
    )

    # malformed JSON line (both parses null while text non-empty)
    bad_line = F.col("__all").isNull() & (F.length(F.trim(v)) > 0)
    reject = bad_line
    for b in bads:
        reject = reject | b

    out = df.withColumns(cols).withColumn(REJECT_COL, F.coalesce(reject, F.lit(False)))
    out = out.drop("__raw", "__all", value_col)

    # index shadow columns
    shadows: dict[str, Column] = {}
    for fc in config.fields:
        if fc.type == "text" and fc.indexed:
            base = F.col(fc.name)
            if fc.array:
                shadows[tokens_col(fc.name)] = F.array_distinct(
                    F.flatten(F.transform(base, lambda e: tokenize(e, fc.tokenizer)))
                )
            else:
                shadows[tokens_col(fc.name)] = tokenize(base, fc.tokenizer)
        if fc.type == "ip":
            base = F.col(fc.name)
            if fc.array:
                shadows[ipkey_col(fc.name)] = F.transform(base, ip_sort_key)
            else:
                shadows[ipkey_col(fc.name)] = ip_sort_key(base)
    if shadows:
        out = out.withColumns(shadows)

    if not keep_rejects:
        out = out.filter(~F.col(REJECT_COL)).drop(REJECT_COL)
    return out


def ingest_jsonl(
    spark, path: str, config: IndexConfig, keep_rejects: bool = False
) -> DataFrame:
    """Batch JSONL file source (`src/commands/sources/buf_source.rs:17-49`)."""
    return ingest_projection(spark.read.text(path), config, keep_rejects=keep_rejects)
