"""PySpark-native analytics engine with the capabilities of
``plhnnathan/java-etl-bi-generator`` (reference: a single-process Java 17
star-schema ETL, ``src/FullETLGenerator.java``), rebuilt Spark-first.

Everything is expressed as declarative DataFrame / Spark SQL plans so that
Catalyst + Tungsten + AQE pick physical strategies (broadcast vs shuffle,
codegen, skew handling).  No row-at-a-time Python UDFs on hot paths.

Modules
-------
- ``session``    : SparkSession factory tuned for batch analytics.
- ``catalog``    : table loading over a directory of parquet files.
- ``functions``  : quirk-preserving expression library (pt-BR locale parse /
                   format, lenient dates, composite keys) — pure Column
                   expressions, fully codegen-able.
- ``sources``    : CSV (reference dialect), parquet, JDBC, multimodal binary.
- ``operators``  : star-schema toolkit, dedup family, similarity search.
- ``streaming``  : event-time windows (batch + Structured Streaming).
"""

__version__ = "0.1.0"
