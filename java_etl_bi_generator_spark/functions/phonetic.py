"""Phonetic coding for record-linkage blocking — single-sourced across
engines (the mediahex / resample idiom): the letter→digit map and the
collapse/strip pipeline below generate BOTH the Spark Column expression
and the DuckDB SQL text, so the cross-engine hash match is by
construction.

The code implemented is SIMPLIFIED AMERICAN SOUNDEX: letters map to
the classic digit classes (b,f,p,v→1 c,g,j,k,q,s,x,z→2 d,t→3 l→4
m,n→5 r→6), vowels and h/w/y map to 0, adjacent duplicate digits
collapse, zeros are stripped, and the result is the first letter plus
three digits (zero-padded).  The one refinement deliberately omitted is
h/w TRANSPARENCY (classic Soundex collapses duplicates *through* h/w:
"ashcraft"→A261; here h/w act as separators like vowels: →A226) —
RE2-based engines (DuckDB) have no backreferences, so the transparent
collapse cannot be expressed portably; for blocking purposes the
simplified code is equally selective.  Documented divergence, pinned by
tests/test_functions.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# letter -> digit class (index = alphabet position); 0 = vowel/h/w/y
SOUNDEX_FROM = "abcdefghijklmnopqrstuvwxyz"
SOUNDEX_TO = "01230120022455012623010202"

_DIGITS = "123456"


def soundex_col(c: Column | str) -> Column:
    """Simplified-Soundex code of a lowercase-alpha string Column."""
    col = F.col(c) if isinstance(c, str) else c
    coded = F.translate(F.lower(col), SOUNDEX_FROM, SOUNDEX_TO)
    for d in _DIGITS:
        coded = F.regexp_replace(coded, d + "{2,}", d)
    tail = F.regexp_replace(F.substring(coded, 2, 1000), "0", "")
    return F.concat(
        F.upper(F.substring(col, 1, 1)),
        F.rpad(F.substring(tail, 1, 3), 3, "0"),
    )


def soundex_sql(expr: str) -> str:
    """The identical pipeline as DuckDB SQL text."""
    coded = f"translate(lower({expr}), '{SOUNDEX_FROM}', '{SOUNDEX_TO}')"
    for d in _DIGITS:
        coded = f"regexp_replace({coded}, '{d}{{2,}}', '{d}', 'g')"
    tail = f"regexp_replace(substr({coded}, 2), '0', '', 'g')"
    return (
        f"(upper(substr({expr}, 1, 1)) || rpad(substr({tail}, 1, 3),"
        f" 3, '0'))"
    )
