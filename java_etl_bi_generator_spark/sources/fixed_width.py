"""Fixed-width text source/sink — the other flat-file format government
datasets (the reference's domain: ANEEL/Brazilian public data) commonly
ship alongside `;`-delimited CSV: every column occupies a fixed byte
range of the line, no delimiter at all.

Spark has no fixed-width reader; both directions compose from built-ins
and stay fully codegen (no UDF):

- write: each column rendered with ``rpad``/``lpad`` to its declared
  width and concatenated into one line column → ``text`` sink.
- read:  ``spark.read.text`` → one ``substring`` + ``trim`` +
  ``try_cast`` per column spec (ANSI-safe on malformed fields).

The parse is position-based, so predicate pushdown applies only after
parsing — at scale, land fixed-width once and convert to parquet (the
same advice as for the reference CSV).  Declared limits of the FORMAT
(not of this reader), all enforced or normalized loudly:

- values must fit their declared width (write raises on overflow);
- string values must not contain line terminators (write raises —
  an embedded newline would silently split the physical row);
- strings must not carry LEADING/TRAILING spaces (trim on read would
  eat them);
- NULL and empty string are INDISTINGUISHABLE on the wire (both render
  as all spaces); this reader normalizes both to NULL on read, for
  every type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

ColSpec = tuple[str, int, str]  # (name, width, spark type)


def write_fixed_width(
    df: DataFrame, path: str, specs: list[ColSpec]
) -> None:
    """Write ``df`` as fixed-width lines per ``specs`` (order defines the
    layout).  Numeric columns right-align (lpad), strings left-align
    (rpad); a value wider than its field raises at write time rather
    than silently corrupting every later column's offsets."""
    parts = []
    for name, width, typ in specs:
        s = F.col(name).cast("string")
        rendered = (
            F.rpad(F.coalesce(s, F.lit("")), width, " ")
            if typ == "string"
            else F.lpad(F.coalesce(s, F.lit("")), width, " ")
        )
        # lpad/rpad TRUNCATE overlong input, and an embedded newline
        # would split the physical row — both become loud write errors
        bad = (F.length(s) > width) | s.contains("\n") | s.contains("\r")
        parts.append(
            F.when(bad, F.raise_error(
                F.concat(
                    F.lit(f"fixed-width overflow or line terminator in "
                          f"column {name} (width {width}): "),
                    s,
                )
            )).otherwise(rendered)
        )
    df.select(F.concat(*parts).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def read_fixed_width(
    spark: SparkSession, path: str, specs: list[ColSpec]
) -> DataFrame:
    """Read fixed-width lines back into typed columns per ``specs``."""
    lines = spark.read.text(path)
    cols = []
    pos = 1  # substring is 1-based
    for name, width, typ in specs:
        raw = F.nullif(
            F.trim(F.substring(F.col("value"), pos, width)), F.lit("")
        )
        c = raw if typ == "string" else raw.try_cast(typ)
        cols.append(c.alias(name))
        pos += width
    return lines.select(*cols)
