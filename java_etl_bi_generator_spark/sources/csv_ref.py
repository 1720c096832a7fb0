"""The reference's CSV dialect as Spark reader/writer options.

Reference (file:line cites into /root/reference):
- read : ``;`` delimiter, header row, per-field whitespace trim, ISO-8859-1
  (FullETLGenerator.java:20, 31-35, 61-62, 142-143).
- write: same delimiter/encoding, header printed first
  (FullETLGenerator.java:36-38, 63-66, 68-71, 145-150).

Spark's CSV source is distributed and splittable; at 100 TB the read
parallelizes per file-split and Catalyst pushes column pruning into the
parse (only requested columns are materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

REFERENCE_CSV_OPTIONS = {
    "sep": ";",
    "header": "true",
    "encoding": "ISO-8859-1",
    "ignoreLeadingWhiteSpace": "true",
    "ignoreTrailingWhiteSpace": "true",
}

# Write side adds the Commons-CSV CSVFormat.DEFAULT record separator:
# CRLF (Commons-CSV `CRLF = "\r\n"` is DEFAULT's recordSeparator), which
# the reference inherits unchanged (FullETLGenerator.java:36-38).  Kept
# out of the read options — Spark's Hadoop line reader already accepts
# \n, \r\n and \r on input, and pinning lineSep there would reject plain
# \n sources the reference reads fine.
REFERENCE_CSV_WRITE_OPTIONS = {
    **REFERENCE_CSV_OPTIONS,
    "lineSep": "\r\n",
}


def read_reference_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read with the reference dialect.

    Pass an explicit schema for determinism (the reference resolves columns
    by header name at runtime and keeps everything a string until a parse
    point — an all-``string`` schema reproduces that exactly).
    """
    reader = spark.read.options(**REFERENCE_CSV_OPTIONS)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_reference_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write with the reference dialect (one directory of part files —
    distributed write; the reference's single-file stream does not scale).
    Byte-exact to the reference stream: ``;`` fields, ISO-8859-1 bytes,
    CRLF after every record including the last (Commons-CSV
    CSVFormat.DEFAULT via FullETLGenerator.java:36-38, 63-66)."""
    df.write.options(**REFERENCE_CSV_WRITE_OPTIONS).mode(mode).csv(path)
