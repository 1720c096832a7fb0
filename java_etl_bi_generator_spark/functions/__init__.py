"""Expression library — every helper is a pure ``Column`` expression
(whole-stage-codegen-able, zero Python UDFs), mirroring the reference's six
private static helpers (FullETLGenerator.java:206-254) plus the text/vector
functions the LLM-pipeline operators need.
"""

from .locale_ptbr import (
    format_ptbr_decimal,
    null_or_empty_default,
    parse_ptbr_decimal,
)
from .dates import (
    date_key,
    dow_name_ptbr,
    month_name_ptbr,
    parse_date_lenient,
    quarter_label,
)
from .text import (
    composite_key,
    punct_count,
    quality_score,
    stopword_count,
    stopword_count_of,
    token_count,
    token_count_of,
    tokens,
    word_shingles,
)
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "format_ptbr_decimal",
    "null_or_empty_default",
    "parse_ptbr_decimal",
    "date_key",
    "dow_name_ptbr",
    "month_name_ptbr",
    "parse_date_lenient",
    "quarter_label",
    "composite_key",
    "punct_count",
    "quality_score",
    "stopword_count",
    "stopword_count_of",
    "token_count",
    "token_count_of",
    "tokens",
    "word_shingles",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
