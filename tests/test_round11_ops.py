"""Behavioral pins for the round-11 additions.

Parity (value-hash vs DuckDB) is covered by check_parity.py / the driver;
these tests pin the SEMANTIC claims each docstring makes, at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from java_etl_bi_generator_spark.queries import registry


def test_probe_set_is_count_bounded(spark, sf_dir):
    """VERDICT r10 #1 pin: the probe-keyed BFS family's seed set is a
    COUNT-bounded top-k (never the data-linear %100 rule), determinate
    under re-evaluation, and made of real graph hubs."""
    from java_etl_bi_generator_spark.queries import (
        PROBE_CAP,
        _copurchase_sym,
        _hub_probes,
    )

    sym = _copurchase_sym(spark, sf_dir)
    probes = _hub_probes(sym)
    rows = probes.collect()
    assert 0 < len(rows) <= PROBE_CAP
    ids = sorted(r["probe"] for r in rows)
    assert len(set(ids)) == len(ids)
    # deterministic: a second evaluation yields the identical set
    assert sorted(r["probe"] for r in probes.collect()) == ids
    # they are the TOP-degree nodes: every probe's degree >= the
    # (cap+1)-th highest degree in the full degree table
    deg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("src").asc())
        .collect()
    )
    if len(deg) > PROBE_CAP:
        cutoff = deg[PROBE_CAP]["deg"]
        probe_degs = {r["src"]: r["deg"] for r in deg}
        assert all(probe_degs[i] >= cutoff for i in ids)


def test_probe_keyed_queries_bounded_output(spark, sf_dir):
    """The two probe-keyed BFS queries emit at most PROBE_CAP probes —
    the output grain itself certifies the state bound held."""
    from java_etl_bi_generator_spark.queries import PROBE_CAP

    reg = registry()
    h = reg["q_harmonic_centrality"](spark, sf_dir).collect()
    assert 0 < len(h) <= PROBE_CAP
    pc = reg["q_graph_path_counts"](spark, sf_dir)
    n_probes = pc.select("probe").distinct().count()
    assert 0 < n_probes <= PROBE_CAP
