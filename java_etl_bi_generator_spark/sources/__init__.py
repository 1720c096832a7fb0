"""Sources / sinks: the reference CSV dialect, parquet, JDBC passthrough,
and the multimodal binary-column source."""

from .csv_ref import read_reference_csv, write_reference_csv

__all__ = ["read_reference_csv", "write_reference_csv"]
