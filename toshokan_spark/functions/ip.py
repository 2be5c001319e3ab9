"""IP field support.

The reference parses IPv4/IPv6 strings and normalizes IPv4 to the
IPv6-mapped form (`/root/reference/src/commands/field_parser.rs:154-161`),
so that range queries compare numerically in a single 128-bit space
(golden test: `something:[190.0.0.1 TO 195.200.10.1]` matches
``192.168.0.1`` — `tests/config.rs:75-91`).

Spark has no uint128, so each ip field gets a shadow sort-key column
of **fixed-width 32-char lowercase hex strings** (lexicographic order
== numeric order at constant width; decimal128 was rejected because
it tops out at 38 digits, one short of 2^128-1) computed at ingest by
an Arrow-batched pandas UDF; range/equality predicates compile
against the key column, output shows the original string form (the
golden outputs print ``192.168.0.1``, not ``::ffff:192.168.0.1``).

Array ip fields get their keys from :func:`ip_sort_key_array` — a
pandas UDF over the whole ``array<string>`` — because Spark rejects a
Python UDF inside a higher-order-function lambda
(UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF).
"""

from __future__ import annotations

import ipaddress
from typing import Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

#: the 128-bit key is a fixed-width 32-char lowercase hex string:
#: lexicographic order == numeric order at constant width, and it
#: round-trips through Parquet/Arrow (decimal128 tops out at 38
#: digits, one short of 2^128-1)
IP_KEY_TYPE = StringType()


def _key(ip_str: Optional[str]) -> Optional[str]:
    if ip_str is None:
        return None
    try:
        addr = ipaddress.ip_address(ip_str.strip())
    except ValueError:
        return None
    if isinstance(addr, ipaddress.IPv4Address):
        # IPv6-mapped IPv4: ::ffff:a.b.c.d  (field_parser.rs:154-161)
        return format(0xFFFF00000000 + int(addr), "032x")
    return format(int(addr), "032x")


@F.pandas_udf(IP_KEY_TYPE)
def _ip_key_udf(s: pd.Series) -> pd.Series:
    return s.map(_key)


@F.pandas_udf(StringType())
def _ip_norm_udf(s: pd.Series) -> pd.Series:
    def norm(v):
        if v is None:
            return None
        try:
            return str(ipaddress.ip_address(v.strip()))
        except ValueError:
            return None

    return s.map(norm)


@F.pandas_udf(ArrayType(StringType()))
def _ip_key_arr_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda lst: None if lst is None else [_key(x) for x in lst]
    )


def ip_sort_key(col: Column) -> Column:
    """128-bit key (32-char hex string) for an IP string column."""
    return _ip_key_udf(col)


def ip_sort_key_array(col: Column) -> Column:
    """Elementwise keys for an ``array<string>`` IP column (whole-array
    pandas UDF — see module docstring for why not transform+UDF)."""
    return _ip_key_arr_udf(col)


def ip_normalize(col: Column) -> Column:
    """Canonical display string (compressed IPv6 / dotted IPv4)."""
    return _ip_norm_udf(col)


def ip_literal_key(ip_str: str) -> str:
    """Driver-side: hex key of a query literal (raises on bad IP)."""
    addr = ipaddress.ip_address(ip_str.strip())
    if isinstance(addr, ipaddress.IPv4Address):
        return format(0xFFFF00000000 + int(addr), "032x")
    return format(int(addr), "032x")
