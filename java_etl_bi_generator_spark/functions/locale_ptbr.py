"""pt-BR locale parse/format expressions.

Reference semantics reproduced (file:line cites into /root/reference):

- ``parse_ptbr_decimal``  — FullETLGenerator.java:232-239 (``parseDouble``):
  strip ``.`` thousands separators, ``,`` -> ``.``, null/empty/malformed
  -> ``0.0`` (never an exception — PERMISSIVE semantics).
- ``format_ptbr_decimal`` — FullETLGenerator.java:173-175
  (``String.format(Locale.GERMAN, "%.2f", x)``): 2 decimal places, comma
  decimal separator, no thousands grouping.
- ``null_or_empty_default`` — FullETLGenerator.java:206-209: null or empty
  string -> a default label (``"N/A"`` in the reference).

All are composed built-ins (regexp_replace / try_cast / format_string), so
they stay inside Catalyst codegen — important at 100 TB; a Python UDF here
would serialize every row through the Python worker.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def null_or_empty_default(c: Column | str, default: str = "N/A") -> Column:
    """Null or (trimmed) empty string -> ``default``; else the value."""
    c = _col(c)
    return F.when(c.isNull() | (F.trim(c) == ""), F.lit(default)).otherwise(c)


def parse_ptbr_decimal(c: Column | str) -> Column:
    """``"1.234,56"`` -> 1234.56 (double); null/empty/malformed -> 0.0.

    ``try_cast`` (not ``cast``) because Spark 4 runs ANSI mode by default and
    a plain cast would throw on malformed input; the reference swallows the
    parse failure into 0.0 instead.
    """
    c = _col(c)
    normalized = F.regexp_replace(F.regexp_replace(F.trim(c), r"\.", ""), ",", ".")
    return F.coalesce(normalized.try_cast("double"), F.lit(0.0))


def format_ptbr_decimal(c: Column | str, decimals: int = 2) -> Column:
    """Double -> ``"1234,56"`` — fixed decimals, comma separator, no grouping."""
    c = _col(c)
    return F.regexp_replace(F.format_string(f"%.{decimals}f", c), r"\.", ",")
