#!/usr/bin/env python
"""Privacy/governance release audit on this engine (north-star surface) —
the checks a data-release pipeline runs before publishing a customer
extract, composed from the declared governance family:

  1. masking        (q_mask_pii: digit redaction, sha-256 pseudonyms,
                     balance generalization — what actually ships)
  2. k-anonymity    (q_kanonymity_audit: equivalence classes of the
                     (nation, balance-bucket) quasi-identifier below
                     k=5, and how many individuals they expose)
  3. l-diversity    (q_ldiversity_audit: classes whose members share
                     too few SENSITIVE values — the size-k class that
                     still leaks because everyone in it is one segment)
  4. t-closeness    (q_tcloseness_audit: classes whose sensitive
                     DISTRIBUTION deviates from the table's by total-
                     variation distance — the skewness attack that
                     survives both k and l)

Each layer catches what the previous one admits, which is why a release
gate runs all three audits, not the strongest-sounding one.

Run::

    python examples/privacy_audit.py [sf_dir]

Everything is a DataFrame plan over the declared queries; the audits
aggregate to class grain (bounded: nations × buckets), so nothing
data-sized ever reaches the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402


def report(spark, sf_dir: str) -> dict[str, int]:
    qs = registry()
    out: dict[str, int] = {}

    masked = qs["q_mask_pii"](spark, sf_dir)
    n_masked = masked.count()
    sample = masked.orderBy("c_custkey").limit(3).collect()
    print(f"\nMasked extract: {n_masked} rows; first rows ship as:")
    for r in sample:
        print(f"  {r['masked_name']:22s} pseudonym={r['pseudonym']} "
              f"balance~{r['acctbal_bucket']}")
    out["masked_rows"] = n_masked

    ka = qs["q_kanonymity_audit"](spark, sf_dir).collect()[0]
    print(f"\nk-anonymity (k=5): {ka['n_classes']} QI classes, "
          f"{ka['n_small_classes']} below k exposing "
          f"{ka['n_exposed']} individuals")
    out["k_small_classes"] = ka["n_small_classes"]

    ld = qs["q_ldiversity_audit"](spark, sf_dir)
    viol = ld.filter(F.col("meets_l") == 0).orderBy(
        "n_sensitive", F.col("class_size").desc()
    )
    n_viol = viol.count()
    print(f"\nl-diversity (l=3): {n_viol} classes below l; worst:")
    for r in viol.limit(3).collect():
        print(f"  nation={r['qi_nation']} bucket={r['qi_bucket']}: "
              f"{r['class_size']} members, only {r['n_sensitive']} "
              f"segment(s)")
    out["l_violations"] = n_viol

    tc = qs["q_tcloseness_audit"](spark, sf_dir)
    breaches = tc.filter(F.col("breaches_t") == 1).orderBy(
        F.col("tvd").desc(), "qi_nation", "qi_bucket"
    )
    n_breach = breaches.count()
    print(f"\nt-closeness (t=0.2): {n_breach} classes breach; worst:")
    for r in breaches.limit(3).collect():
        print(f"  nation={r['qi_nation']} bucket={r['qi_bucket']}: "
              f"TVD={r['tvd']:.4f} over {r['class_size']} members")
    out["t_breaches"] = n_breach

    verdict = "HOLD" if (ka["n_small_classes"] or n_viol or n_breach) else "SHIP"
    print(f"\nRelease gate: {verdict} (small-k={ka['n_small_classes']}, "
          f"low-l={n_viol}, t-breaches={n_breach})")
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report(get_spark(app_name="privacy-audit"), sf)
