#!/usr/bin/env python
"""Model-evaluation report on this engine (north-star surface) — the
full readout an ML platform runs after scoring a customer base, composed
from the declared evaluation family (every statistic exact-integer or
fixed-IEEE, so this report is reproducible bit-for-bit across reruns and
cluster sizes):

  1. scores             (q_ml_score_inference — fixed-weight logistic
                         fused into codegen, no UDF/model server)
  2. discrimination     (q_auc_exact — tie-corrected Mann-Whitney AUC in
                         pure bigint arithmetic; q_auc_by_segment — the
                         per-slice fairness view)
  3. calibration        (q_score_calibration — reliability diagram on
                         distributed score deciles)
  4. targeting value    (q_gains_lift — cumulative-gains/lift table:
                         what does mailing the top decile capture?)
  5. uncertainty        (q_bootstrap_ci — Poisson-bootstrap 95% CI on
                         mean order value, one pass, 41 replicates)
  6. cohort contrast    (q_ttest_welch — per-segment Welch t: do urgent
                         orders carry different value?)

Run::

    python examples/model_evaluation.py [sf_dir]

Every step is a DataFrame plan over declared queries; only decile- and
segment-grain rows reach the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402


def report(spark, sf_dir: str) -> dict:
    qs = registry()
    out: dict = {}

    auc = qs["q_auc_exact"](spark, sf_dir).collect()[0]
    print(
        f"Global AUC: {auc['auc']:.4f} "
        f"({auc['n_pos']} pos / {auc['n_neg']} neg)"
    )
    out["auc"] = auc["auc"]

    seg = qs["q_auc_by_segment"](spark, sf_dir).orderBy("segment").collect()
    print("\nAUC by segment (fairness/drift slice):")
    for r in seg:
        print(f"  {r['segment']:<12} {r['auc']:.4f}")
    out["segments"] = len(seg)

    cal = (
        qs["q_score_calibration"](spark, sf_dir).orderBy("decile").collect()
    )
    print("\nReliability diagram (score decile -> observed rate):")
    for r in cal:
        print(
            f"  d{r['decile']:>2}: mean_score={r['mean_score']:.4f} "
            f"observed={r['observed_rate']:.4f} (n={r['n_customers']})"
        )
    out["calibration_deciles"] = len(cal)

    gains = qs["q_gains_lift"](spark, sf_dir).orderBy("decile").collect()
    print("\nCumulative gains / lift:")
    for r in gains:
        print(
            f"  d{r['decile']:>2}: capture={r['capture_pct']:6.1%} "
            f"lift={r['lift']:.3f} (n={r['n_customers']})"
        )
    out["top_decile_lift"] = gains[0]["lift"]

    ci = qs["q_bootstrap_ci"](spark, sf_dir).collect()[0]
    print(
        f"\nMean order value: {ci['mean_value']:.2f} "
        f"[{ci['ci_lo']:.2f}, {ci['ci_hi']:.2f}] "
        f"(Poisson-bootstrap 95% CI, n={ci['n_orders']})"
    )
    out["ci_width"] = ci["ci_hi"] - ci["ci_lo"]

    tt = qs["q_ttest_welch"](spark, sf_dir).orderBy("segment").collect()
    print("\nUrgent-vs-routine order value per segment (Welch t):")
    for r in tt:
        print(
            f"  {r['segment']:<12} t={r['t_stat']:+.3f} "
            f"df={r['welch_df']:.1f} "
            f"({r['mean_urgent']:.0f} vs {r['mean_routine']:.0f})"
        )
    out["ttest_segments"] = len(tt)
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report(get_spark(app_name="model-evaluation"), sf)
