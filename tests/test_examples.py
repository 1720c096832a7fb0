"""Smoke-run every examples/ script end to end (subprocess, sf0.001) — the
runnable artifacts in the README must not rot."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

# Each example runs in its own spark-submit subprocess (~25 s each,
# ~7 min for the file) — round-close suite only (VERDICT r11 item 2).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "script,args",
    [
        ("siga_etl.py", []),
        ("corpus_curation.py", ["/root/testdata/sf0.001"]),
        ("training_data_prep.py", ["/root/testdata/sf0.001"]),
        ("customer_analytics.py", ["/root/testdata/sf0.001"]),
        ("incremental_ingest.py", ["20000"]),
        ("graph_analytics.py", ["/root/testdata/sf0.001"]),
        ("drift_monitoring.py", ["/root/testdata/sf0.001"]),
        ("privacy_audit.py", ["/root/testdata/sf0.001"]),
        ("dp_release.py", ["/root/testdata/sf0.001"]),
        ("timeseries_report.py", ["/root/testdata/sf0.001"]),
        ("retrieval_eval.py", ["/root/testdata/sf0.001"]),
        ("stats_diagnostics.py", ["/root/testdata/sf0.001"]),
        ("model_evaluation.py", ["/root/testdata/sf0.001"]),
        ("preference_modeling.py", ["/root/testdata/sf0.001"]),
        ("llm_corpus_pipeline.py", ["/root/testdata/sf0.001"]),
        ("sql_shell.py",
         ["SELECT count(*) AS n FROM lineitem", "/root/testdata/sf0.001"]),
    ],
)
def test_example_runs_clean(script, args):
    out_dir = tempfile.mkdtemp(prefix=f"example_{script.split('.')[0]}_")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args, out_dir],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
