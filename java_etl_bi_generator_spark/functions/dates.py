"""Date expressions reproducing the reference's lenient parse and pt-BR
calendar attribute derivations.

Reference semantics (file:line cites into /root/reference):

- ``parse_date_lenient`` — FullETLGenerator.java:241-248 (``parseDate``):
  take ``substring(0, 10)``, parse ISO ``yyyy-MM-dd``; shorter/malformed
  -> null.
- ``date_key``           — FullETLGenerator.java:250-254 (``parseDateKey``):
  ``yyyyMMdd`` as int; unparseable -> ``0`` (not null, not -1).
- ``month_name_ptbr`` / ``dow_name_ptbr`` — FullETLGenerator.java:183,
  197, 199: ``getDisplayName(TextStyle.FULL, new Locale("pt","BR"))``.
  Spark's ``date_format`` renders in one session-fixed locale, so the pt-BR
  names are pinned literal lookup tables (``element_at`` over an array
  literal — constant-folded, codegen-able, cluster-locale-independent).
- ``quarter_label``      — FullETLGenerator.java:190, 200: ``"T" + quarter``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# java.time.Month.getDisplayName(FULL, pt-BR), index 1..12
MONTH_NAMES_PTBR = (
    "janeiro", "fevereiro", "março", "abril", "maio", "junho",
    "julho", "agosto", "setembro", "outubro", "novembro", "dezembro",
)
# Indexed by Spark dayofweek() (1=Sunday..7=Saturday);
# java.time.DayOfWeek.getDisplayName(FULL, pt-BR) values.
DOW_NAMES_PTBR = (
    "domingo", "segunda-feira", "terça-feira", "quarta-feira",
    "quinta-feira", "sexta-feira", "sábado",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_date_lenient(c: Column | str) -> Column:
    """First 10 chars as ISO date; malformed/short -> null (never throws)."""
    c = _col(c)
    return F.call_function(
        "try_to_date", F.substring(c, 1, 10), F.lit("yyyy-MM-dd")
    )


def date_key(c: Column | str) -> Column:
    """Date/timestamp -> yyyyMMdd int; null -> 0."""
    c = _col(c)
    return F.coalesce(
        F.date_format(c, "yyyyMMdd").cast("int"), F.lit(0)
    ).alias("date_key")


def month_name_ptbr(c: Column | str) -> Column:
    c = _col(c)
    return F.element_at(F.array(*[F.lit(m) for m in MONTH_NAMES_PTBR]), F.month(c))


def dow_name_ptbr(c: Column | str) -> Column:
    c = _col(c)
    return F.element_at(F.array(*[F.lit(d) for d in DOW_NAMES_PTBR]), F.dayofweek(c))


def quarter_label(c: Column | str) -> Column:
    """Quarter rendered as ``T1``..``T4`` (reference: ``"T" + ((month-1)/3+1)``)."""
    c = _col(c)
    return F.concat(F.lit("T"), F.quarter(c).cast("string"))
