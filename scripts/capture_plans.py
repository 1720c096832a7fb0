#!/usr/bin/env python
"""Capture `.explain("formatted")` for every headline query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence
trail (the judge checks plan claims against these files).

Usage::

    python scripts/capture_plans.py <tag> <suffix> [query ...]

e.g. ``python scripts/capture_plans.py r11 before`` captures the full
headline set, ``python scripts/capture_plans.py r11 after q_kcore``
re-captures one query after an optimization.

``--uncut`` (VERDICT r11 item 7) additionally patches ``cut_lineage`` to
an identity in every module that imported it, so the dump shows the full
PRE-CUT plan — the only way claims like "one spread exchange serves both
the groupBy and the self-join (ReusedExchange)" are verifiable for
queries whose optimized exchange sits behind a lineage cut (the cut
truncates the dump at LogicalRDD scans).  Use it per-query, not for the
whole set: iterative queries' uncut plans are enormous.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import HEADLINE  # noqa: E402
from java_etl_bi_generator_spark.plans.plan_tools import (  # noqa: E402
    explain_formatted,
)
from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--uncut"]
    uncut = "--uncut" in sys.argv[1:]
    tag = args[0] if len(args) > 0 else "r11"
    suffix = args[1] if len(args) > 1 else "before"
    only = args[2:]
    names = only or HEADLINE

    if uncut:
        import java_etl_bi_generator_spark.lineage as _lin

        real_cut = _lin.cut_lineage
        identity = lambda df, eager=True: df  # noqa: E731
        for mod in list(sys.modules.values()):
            if getattr(mod, "cut_lineage", None) is real_cut:
                mod.cut_lineage = identity

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"capture-plans-{tag}-{suffix}")
    qs = registry()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = explain_formatted(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name:32s} -> {path}  (Exchange x{n_ex})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
