"""Shared literals for the Fellegi-Sunter record-linkage scorer.

Field-level m/u probabilities are PINNED model parameters (like the
logistic weights in queries._churn_z): m = P(field agrees | records
match), u = P(field agrees | records don't).  Both the Spark query and
the DuckDB oracle import ``fs_weights`` so the log-odds literals — and
therefore every pair's match weight — are bit-identical by construction.

Reference: Fellegi & Sunter (1969), "A Theory for Record Linkage" —
agreement on field i contributes log2(m_i/u_i), disagreement
log2((1-m_i)/(1-u_i)); the pair's match weight is the sum.
"""

from __future__ import annotations

import math

#: (field, m, u) — u reflects the field's chance-agreement rate in the
#: part table (≈ 1/#distinct), m the assumed quality of true duplicates.
FS_FIELDS: list[tuple[str, float, float]] = [
    ("size", 0.90, 0.02),
    ("name_adj", 0.92, 0.05),
    ("name_noun", 0.95, 0.05),
    ("ptype", 0.93, 0.167),
]


def fs_weights() -> list[tuple[str, float, float]]:
    """[(field, agree_weight, disagree_weight)] with log-odds computed
    once here — identical floats on both engines."""
    return [
        (f, math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))
        for f, m, u in FS_FIELDS
    ]
