#!/usr/bin/env python
"""Per-stage profile of one (or more) registry queries — guide §1's
empirical loop without the interactive UI: run the query via the noop
sink in a fresh session with the UI enabled, then read the REST API
(/api/v1) for per-stage wall time, shuffle bytes, input bytes and task
counts, printed slowest-first.

Usage::

    python scripts/profile_query.py q_kcore [q_pagerank ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_query.py q_kcore
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402


def get_spark_with_ui(app_name: str) -> SparkSession:
    """session.py's configuration, with the UI forced on for /api/v1."""
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark(app_name=app_name)
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit(
            "Spark UI is disabled in this session — profile_query.py needs "
            "a fresh python process (the session factory honors "
            "SPARK_GRAFT_UI=1 only at JVM launch)"
        )
    return spark


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> int:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_query.py q_name [q_name ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark_with_ui("profile-query")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    qs = registry()

    for name in names:
        # warm codegen/JIT so the measured run is steady-state
        try:
            qs[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass
        before_jobs = {j["jobId"] for j in rest(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in before_jobs]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        rows = []
        for sid in stage_ids:
            try:
                st = rest(base, f"/stages/{sid}")[0]
            except Exception:
                continue
            dur = (st.get("executorRunTime") or 0) / 1000.0
            rows.append(
                (
                    dur,
                    sid,
                    st.get("numCompleteTasks", 0),
                    (st.get("inputBytes") or 0) / 1e6,
                    (st.get("shuffleReadBytes") or 0) / 1e6,
                    (st.get("shuffleWriteBytes") or 0) / 1e6,
                    (st.get("name") or "")[:80],
                )
            )
        rows.sort(reverse=True)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"{len(rows)} stages (executorRunTime = cpu-sec summed over tasks)")
        print(f"{'cpu-s':>8} {'stage':>6} {'tasks':>6} {'in MB':>8} "
              f"{'shRd MB':>8} {'shWr MB':>8}  name")
        for dur, sid, nt, inb, srd, swr, nm in rows[:14]:
            print(f"{dur:8.2f} {sid:6d} {nt:6d} {inb:8.1f} {srd:8.1f} "
                  f"{swr:8.1f}  {nm}")

        # SQL-tab equivalent: per-operator metrics of the executions this
        # query ran (the noop save plus any eager-checkpoint jobs).
        try:
            sqls = rest(base, "/sql?details=true&planDescription=false&length=500")
        except Exception as e:  # endpoint shape varies across versions
            print(f"  (sql endpoint unavailable: {e})")
            sqls = []
        import re as _re

        def _ms(v: str) -> float:
            """Parse a metric value like '1.2 s', '345 ms', 'total (min, med, max...)\n1.2 s (...)' to seconds."""
            first = v.split("(")[0].strip().split("\n")[0].strip()
            m = _re.match(r"([\d.,]+)\s*(ms|s|m|h)?", first)
            if not m:
                return 0.0
            x = float(m.group(1).replace(",", ""))
            unit = m.group(2) or "ms"
            return x * {"ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}[unit]

        for ex in sqls:
            if ex.get("status") == "RUNNING":
                continue
            nodes = ex.get("nodes") or []
            if not nodes:
                continue
            hot = []
            for nd in nodes:
                t = 0.0
                info = []
                for mt in nd.get("metrics") or []:
                    mn = mt.get("name", "")
                    mv = mt.get("value", "")
                    if "time" in mn or "duration" in mn:
                        t = max(t, _ms(mv))
                    if mn in ("number of output rows", "shuffle bytes written",
                              "data size"):
                        info.append(f"{mn.split()[-1]}={mv.split()[0]}")
                hot.append((t, nd.get("nodeId"), nd.get("nodeName"), " ".join(info)))
            hot.sort(reverse=True)
            dur_s = (ex.get("duration") or 0) / 1000.0
            if dur_s < 0.2:
                continue
            print(f"  -- execution {ex.get('id')} ({dur_s:.2f}s): hottest operators")
            for t, nid, nn, info in hot[:10]:
                if t <= 0.01:
                    continue
                print(f"     {t:8.2f}s  [{nid}] {nn}  {info}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
