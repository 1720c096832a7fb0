"""Registry-wide output-schema invariants (VERDICT r9 task 2).

The r9 driver board regressed 50/50 -> 47/50 on exactly the three queries
whose OUTPUT schema carried DECIMAL(38,0): the driver's result
canonicalization renders Spark DecimalType differently from DuckDB's
HUGEINT even when the values are bit-exact (confirmed r5 q_kmeans_cells,
re-confirmed r9 with three data points).  Raw TimestampType has the same
cross-engine rendering hazard (timezone/precision) and is banned by the
queries.py module convention since round 1.

This test builds every declared query's DataFrame (lazy — plan analysis
only where possible; fixture-writing queries do their bounded setup) at
sf0.001 and asserts NO DecimalType and NO TimestampType anywhere in the
output schema, including nested inside arrays/structs/maps.  DECIMAL is
fine as an internal accumulator; it must narrow to BIGINT or a canonical
digit string before the SELECT that the driver sees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from java_etl_bi_generator_spark.queries import registry

# No exceptions: a query that genuinely needs >int64 output emits the
# canonical decimal-digit string (q_kendall_tau, q_table_checksum) —
# identical in both engines at any scale.  Add entries here only with a
# matching-oracle-type justification.
ALLOWLIST: dict[str, str] = {}


def _banned(dt: T.DataType, path: str) -> list[str]:
    hits = []
    if isinstance(dt, T.DecimalType):
        hits.append(f"{path}: {dt.simpleString()}")
    if isinstance(dt, T.TimestampType):
        hits.append(f"{path}: timestamp")
    if isinstance(dt, T.ArrayType):
        hits += _banned(dt.elementType, path + "[]")
    if isinstance(dt, T.MapType):
        hits += _banned(dt.keyType, path + ".key")
        hits += _banned(dt.valueType, path + ".value")
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            hits += _banned(f.dataType, f"{path}.{f.name}")
    return hits


@pytest.mark.slow  # full-registry schema walk (~5.6 min); round-close suite only
def test_no_decimal_or_timestamp_outputs(spark, sf_dir):
    failures = []
    errors = []
    for name, fn in sorted(registry().items()):
        if name in ALLOWLIST:
            continue
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # surface builder errors, don't mask them
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        for field in schema.fields:
            hits = _banned(field.dataType, field.name)
            if hits:
                failures.append(f"{name}: " + "; ".join(hits))
    assert not errors, "\n".join(errors)
    assert not failures, (
        "DecimalType/TimestampType found in driver-visible output "
        "schemas (narrow to BIGINT or canonical string — see queries.py "
        "module docstring):\n" + "\n".join(failures)
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
