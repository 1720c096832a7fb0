"""Synthetic TPC-H-shaped star generator — the relational twin of the
events/documents/embeddings generators: arbitrary-volume fixture tables
in the driver testdata's exact schemas and value pools, derived entirely
from JVM-side column expressions (``xxhash64`` + ``pmod``) over
``spark.range``.  No Python worker, no input storage; 60M lineitem rows
generate in seconds and scale with executor count.

Unlike the splitmix sources this one does NOT need cross-engine
reproducibility (it feeds scale probes, not oracles), so it uses the
built-in 64-bit hash — but it IS deterministic per (table, row), so any
probe run sees identical data.

Referential integrity by construction: keys are dense ranges; every
foreign key is ``pmod(hash, parent_count)``; lineitem rows are
``lines_per_order`` per order via integer division of the row index —
joins behave like the fixture's (every line matches exactly one order,
every order one customer, ...).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

_SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_TYPES = ["ECONOMY", "STANDARD", "PROMO", "LARGE", "SMALL", "MEDIUM"]
# part names mirror the fixture's "<adjective> <noun>" shape — fuzzy/ER
# operators behave like they do on real data (a "Part#<n>" scheme makes
# every name within edit distance of every other and degenerates the
# blocked levenshtein join into an all-pairs match)
_ADJ = ["small", "red", "blue", "hot", "large", "green", "dim", "pale",
        "dark", "cold", "light", "soft"]
_NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "washer",
         "spring", "lever", "valve", "pin", "cap"]
_BASE_DATE = "1995-01-01"
_DATE_SPAN = 2400  # days -> dates span 1995-01-01 .. 2001-07-29


def _h(salt: int) -> F.Column:
    """Deterministic 64-bit row hash for spark.range's id column."""
    return F.xxhash64(F.col("id"), F.lit(salt))


def _pm(salt: int, m) -> F.Column:
    return F.pmod(_h(salt), F.lit(m))


def _pick(salt: int, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_pm(salt, len(values)) + 1).cast("int"))


def _date(salt: int) -> F.Column:
    return F.date_add(F.lit(_BASE_DATE).cast("date"), _pm(salt, _DATE_SPAN).cast("int")).cast("timestamp")


def generate_star(
    spark: SparkSession,
    out_dir: str,
    num_orders: int,
    lines_per_order: int = 4,
    num_customers: int | None = None,
    num_parts: int | None = None,
    num_suppliers: int | None = None,
    partitions: int = 32,
) -> None:
    """Write region/nation/customer/supplier/part/orders/lineitem parquet
    into ``out_dir`` in the driver-fixture schemas."""
    num_customers = num_customers or max(100, num_orders // 10)
    num_parts = num_parts or max(200, num_orders // 15)
    num_suppliers = num_suppliers or max(10, num_orders // 150)

    def rng(n, parts=partitions):
        return spark.range(0, n, 1, parts)

    region = rng(5, 1).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(
            F.array(*[F.lit(r) for r in _REGIONS]), (F.col("id") + 1).cast("int")
        ).alias("r_name"),
    )
    # mirror the fixture: NATION_i, region = i % 5
    nation = rng(25, 1).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    customer = rng(num_customers).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        _pm(10, 25).cast("int").alias("c_nationkey"),
        (_pm(11, 1_000_000) / 100.0 - 1000.0).alias("c_acctbal"),
        _pick(12, _SEGMENTS).alias("c_mktsegment"),
    )
    supplier = rng(num_suppliers).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        _pm(20, 25).cast("int").alias("s_nationkey"),
        (_pm(21, 1_000_000) / 100.0 - 1000.0).alias("s_acctbal"),
    )
    part = rng(num_parts).select(
        F.col("id").alias("p_partkey"),
        F.concat(_pick(34, _ADJ), F.lit(" "), _pick(35, _NOUN)).alias("p_name"),
        F.concat(F.lit("Brand#"), _pm(30, 25)).alias("p_brand"),
        _pick(31, _TYPES).alias("p_type"),
        (_pm(32, 50) + 1).cast("int").alias("p_size"),
        (_pm(33, 200_000) / 100.0 + 1.0).alias("p_retailprice"),
    )
    orders = rng(num_orders).select(
        F.col("id").alias("o_orderkey"),
        _pm(40, num_customers).alias("o_custkey"),
        _pick(41, ["O", "F", "P"]).alias("o_orderstatus"),
        (_pm(42, 40_000_000) / 100.0 + 1000.0).alias("o_totalprice"),
        _date(43).alias("o_orderdate"),
        _pick(44, _PRIORITIES).alias("o_orderpriority"),
    )
    lineitem = rng(num_orders * lines_per_order).select(
        (F.col("id") / lines_per_order).cast("bigint").alias("l_orderkey"),
        _pm(50, num_parts).alias("l_partkey"),
        _pm(51, num_suppliers).alias("l_suppkey"),
        (F.col("id") % lines_per_order + 1).cast("int").alias("l_linenumber"),
        (_pm(52, 50) + 1).cast("double").alias("l_quantity"),
        (_pm(53, 10_000_000) / 100.0 + 1.0).alias("l_extendedprice"),
        (_pm(54, 11) / 100.0).alias("l_discount"),
        (_pm(55, 9) / 100.0).alias("l_tax"),
        _pick(56, ["A", "N", "R"]).alias("l_returnflag"),
        _pick(57, ["O", "F"]).alias("l_linestatus"),
        _date(58).alias("l_shipdate"),
    )
    for name, df in [
        ("region", region), ("nation", nation), ("customer", customer),
        ("supplier", supplier), ("part", part), ("orders", orders),
        ("lineitem", lineitem),
    ]:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
