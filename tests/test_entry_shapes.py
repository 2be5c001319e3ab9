"""Driver-compatibility gate on every ``queries()`` entry's OUTPUT
SHAPE: the driver canonicalizes results with a pandas ``sort_values``
over raw column values, which crashes (``unhashable type: 'list'``)
on any Array/Map/Struct-typed column. Round 6 shipped two entries
(`normalize_embeddings`, `quantize_embeddings`) returning raw vector
columns; the local oracle harness stringified them and reported green
while the driver recorded ``err`` rows. This test makes that class of
failure impossible to ship: building each entry's DataFrame (lazy —
no job runs) and checking the schema is enough.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_no_entry_returns_complex_typed_columns(spark):
    import __spark_entry__ as entry
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name, fn in entry.queries().items():
        sdf = fn(spark, SF_DIR)
        bad = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "entries return columns the driver's pandas canon cannot sort "
        f"(explode to scalar rows instead): {offenders}"
    )


def test_every_entry_has_an_oracle():
    """Completeness in CI, not only in tools/check_oracle.py: an
    entry without an oracle_sql twin silently downgrades to a
    rows-only driver record — that must be a loud, deliberate choice
    (ROWS_ONLY_OK in the tool), never an accident."""
    import __spark_entry__ as entry
    from tools.check_oracle import ROWS_ONLY_OK

    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert not (oracles - qs), f"orphan oracles: {sorted(oracles - qs)}"
    missing = qs - oracles - ROWS_ONLY_OK
    assert not missing, f"entries without a value oracle: {sorted(missing)}"
