#!/usr/bin/env python
"""Run arbitrary SQL over the engine's catalog — the migration path for a
reference user's existing queries: every fixture table is registered as a
temp view (`register_views`, the same normalization choke point every
declared query reads through), then any statement runs through Catalyst
with the full optimizer surface (pushdown, AQE, broadcast selection).

Run::

    python examples/sql_shell.py "SELECT ... FROM lineitem ..." [sf_dir]
    python examples/sql_shell.py path/to/query.sql [sf_dir]

Default sf_dir: /root/testdata/sf0.01.  Prints up to 50 rows plus the
row count; a trailing `EXPLAIN` argument prints the physical plan
instead (how users verify their migrated query kept its pushdown).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_etl_bi_generator_spark.catalog import register_views
from java_etl_bi_generator_spark.session import get_spark


def run(sql: str, sf_dir: str, explain: bool = False) -> int:
    spark = get_spark(app_name="sql_shell")
    register_views(spark, sf_dir)
    df = spark.sql(sql)
    if explain:
        df.explain("formatted")
        return 0
    # bounded driver memory for arbitrary result sizes: cache the result,
    # render 50 rows, count from the cached blocks (a full collect()
    # would pull every row of a migrated heavy query into the driver)
    df.persist()
    try:
        df.show(50, truncate=False)
        n = df.count()
    finally:
        df.unpersist()
    print(f"({n} rows)")
    return n


def main() -> None:
    args = sys.argv[1:]
    # trailing EXPLAIN works with or without an explicit sf_dir
    explain = bool(args) and args[-1].upper() == "EXPLAIN"
    if explain:
        args = args[:-1]
    if not args:
        print(__doc__)
        raise SystemExit(2)
    sql = open(args[0]).read() if os.path.exists(args[0]) else args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    run(sql, sf_dir, explain)


if __name__ == "__main__":
    main()
