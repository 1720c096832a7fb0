#!/usr/bin/env python
"""Time-series health report on this engine (north-star surface) — the
diagnostics a demand-forecasting pipeline runs before fitting anything,
composed from the declared time-series family:

  1. seasonality     (q_autocorr: lag-1..7 ACF ladder — a lag-7 spike
                      says "same weekday moves together")
  2. co-movement     (q_rolling_corr: 30-day volume↔revenue Pearson —
                      is volume still driving revenue?)
  3. gaps            (q_gap_fill_interpolate: densified hourly grid,
                      linear interpolation, gap census per type)
  4. level shifts    (q_cusum_changepoint: cumulative-sum drift scan)
  5. outliers        (q_anomaly_zscore: 3σ scan from exact power sums)
  6. smoothing       (q_exp_smoothing: the baseline the forecast
                      inherits)

Run::

    python examples/timeseries_report.py [sf_dir]

Everything is a DataFrame plan over the declared queries; the report
collects only day-/type-/lag-grain rows to the driver.
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

    acf = qs["q_autocorr"](spark, sf_dir).orderBy("k").collect()
    print("\nAutocorrelation (daily order counts):")
    for r in acf:
        bar = "#" * max(0, int(abs(r["acf"] or 0) * 40))
        print(f"  lag {r['k']}: {r['acf'] if r['acf'] is not None else float('nan'):+.4f} {bar}")
    peak = max(acf, key=lambda r: abs(r["acf"] or 0))
    print(f"  strongest: lag {peak['k']} -> "
          f"{'weekly seasonality' if peak['k'] == 7 else 'short-range memory'}")
    out["acf_lags"] = len(acf)

    rc = qs["q_rolling_corr"](spark, sf_dir)
    stats = rc.filter(F.col("corr_30d").isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("corr_30d").alias("lo"),
        F.avg("corr_30d").alias("mean"),
        F.max("corr_30d").alias("hi"),
    ).collect()[0]
    print(f"\n30-day volume-revenue correlation over {stats['n']} windows: "
          f"min {stats['lo']:+.4f}, mean {stats['mean']:+.4f}, "
          f"max {stats['hi']:+.4f}")
    out["corr_windows"] = stats["n"]

    gaps = (
        qs["q_gap_fill_interpolate"](spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("hours"),
            F.sum("is_gap").alias("gaps"),
        )
        .orderBy("event_type")
        .collect()
    )
    print("\nHourly grid per event type (gaps filled by interpolation):")
    for r in gaps:
        print(f"  {r['event_type']:12s} {r['hours']:6d} hours, "
              f"{r['gaps']:5d} interpolated")
    out["gap_types"] = len(gaps)

    cp = qs["q_cusum_changepoint"](spark, sf_dir).collect()
    print(f"\nCUSUM level-shift scan: {len(cp)} row(s)")
    out["cusum_rows"] = len(cp)

    an = qs["q_anomaly_zscore"](spark, sf_dir)
    n_anom = an.count()
    print(f"3-sigma outlier scan: {n_anom} flagged rows")
    out["anomalies"] = n_anom

    sm = qs["q_exp_smoothing"](spark, sf_dir)
    n_sm = sm.count()
    print(f"Exponential smoothing baseline: {n_sm} points")
    out["smoothed_points"] = n_sm
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report(get_spark(app_name="timeseries-report"), sf)
